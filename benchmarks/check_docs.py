#!/usr/bin/env python
"""Front-page drift guard (VERDICT r3 item 5: round 2's README numbers
survived two rounds of fresher committed artifacts).

Every headline number in README.md is declared here next to the
committed results-JSON value it must match; the script re-extracts each
from the README text and fails on mismatch. Run directly or via
``tests/test_aux.py::test_readme_numbers_match_committed_results``.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "benchmarks", "results")


def _load(name):
    with open(os.path.join(RESULTS, name)) as f:
        return json.load(f)


def _get(d, path):
    for p in path.split("."):
        d = d[int(p)] if isinstance(d, list) else d[p]
    return d


def check_readme() -> list:
    """-> list of failure strings (empty = clean)."""
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    import glob

    # pin README's headline to the bench artifact README ITSELF cites
    # (`BENCH_r{N}.json`) — so a newer driver-recorded artifact never
    # fails the guard until README is updated to quote it, and README
    # can never quote a live run that has no committed artifact. The
    # citation is read from the headline row itself (the line carrying
    # "examples/s/chip") so an incidental mention of an older artifact
    # elsewhere in README cannot redirect validation.
    cited = None
    for line in readme.splitlines():
        m = re.search(r"BENCH_r(\d+)\.json", line)
        if m and "examples/s/chip" in line:
            cited = m.group(0)
            break
        if m and cited is None:
            cited = m.group(0)
    if cited:
        bench_path = os.path.join(ROOT, cited)
    else:  # fall back to the newest artifact
        bench_path = sorted(glob.glob(os.path.join(ROOT,
                                                   "BENCH_r*.json")))[-1]
    with open(bench_path) as f:
        bench = json.load(f)

    kernels = _load("kernels_tpu.json")
    for row in kernels.get("topk", []):
        # derived fields the README quotes: q/s (in thousands) and the
        # flash-vs-blockwise-exact ratio
        if row.get("flash_f32_gated_ms"):
            row["flash_f32_gated_qps_k"] = (
                row["q_batch"] / row["flash_f32_gated_ms"])  # ms -> k q/s
            if row.get("xla_blockwise_exact_ms"):
                row["flash_vs_blockwise"] = (
                    row["xla_blockwise_exact_ms"] / row["flash_f32_gated_ms"])

    sources = {
        "bench": bench["parsed"],
        "tf": _load("tf_reference_cpu.json"),
        "serve": _load("serving_c3d.json"),
        "scale": _load("scale.json"),
        "kernels": kernels,
    }

    # (human label, README regex with ONE capture group, source.path,
    #  scale factor applied to the JSON value, relative tolerance)
    CLAIMS = [
        ("training ex/s", r"([\d.]+)M examples/s/chip",
         "bench.value", 1e-6, 0.01),
        ("step ms", r"([\d.]+) ms/step", "bench.extras.step_time_ms",
         1, 0.01),
        ("vs TF multiple", r"\*\*(\d+)×\*\* the self-measured",
         "bench.vs_baseline", 1, 0.01),
        ("TF CPU ex/s", r"\(([\d.]+)k ex/s", "tf.examples_per_s_cpu",
         1e-3, 0.01),
        ("approx topk q/s", r"([\d.]+)k queries/s \(blockwise bf16",
         "scale.chip.topk_approx_queries_per_s", 1e-3, 0.01),
        ("int8 topk q/s", r"([\d.]+)k q/s on an \*\*int8",
         "scale.chip.topk_int8_queries_per_s", 1e-3, 0.01),
        ("int8 recall", r"\(recall ([\d.]+),",
         "scale.chip.topk_int8_recall_at_k", 1, 0.01),
        ("exact flash topk ms", r"exact search at ([\d.]+)k q/s via the "
         r"flash", "kernels.topk.1.flash_f32_gated_qps_k", 1, 0.02),
        ("exact flash speedup", r"\(([\d.]+)× the blockwise-exact scan",
         "kernels.topk.1.flash_vs_blockwise", 1, 0.03),
        ("lookup ids/s", r"(\d+)M ids/s through",
         "scale.chip.lookup_ids_per_s", 1e-6, 0.01),
        ("sparse train ex/s", r"([\d.]+)M examples/s on a 6M-row",
         "scale.train.examples_per_s_sparse", 1e-6, 0.01),
        ("sparse speedup", r"\*\*([\d.]+)×\*\* over dense updates",
         "scale.train.speedup_sparse_vs_dense", 1, 0.01),
        ("lazy-adam ex/s", r"lazy-Adam sparse updates run ([\d.]+)M ex/s",
         "scale.train.examples_per_s_adam_sparse", 1e-6, 0.01),
        ("lazy-adam speedup", r"\*\*([\d.]+)×\*\* over dense Adam",
         "scale.train.speedup_adam_sparse_vs_dense", 1, 0.01),
        ("serve aio QPS", r"\*\*([\d,]+) QPS / p95 [\d.]+ ms\*\* "
         r"retrieval-only", "serve.http_aio.qps", 1, 0.01),
        ("serve aio p95", r"\*\*[\d,]+ QPS / p95 ([\d.]+) ms\*\* "
         r"retrieval-only", "serve.http_aio.p95_ms", 1, 0.01),
        ("serve aio rerank QPS", r"\*\*([\d,]+) QPS / p95 [\d.]+ ms\*\* "
         r"with rerank-200", "serve.http_aio_rerank200.qps", 1, 0.01),
        ("serve aio rerank p95", r"\*\*[\d,]+ QPS / p95 ([\d.]+) ms\*\* "
         r"with rerank-200", "serve.http_aio_rerank200.p95_ms", 1, 0.01),
        ("serve threaded-mb QPS", r"to clear it: ([\d,]+) QPS / p95 "
         r"[\d.]+ ms retrieval-only", "serve.http_1worker_microbatch.qps",
         1, 0.01),
        ("serve threaded-mb p95", r"to clear it: [\d,]+ QPS / p95 "
         r"([\d.]+) ms retrieval-only", "serve.http_1worker_microbatch.p95_ms",
         1, 0.01),
        ("serve threaded-mb rerank QPS", r"and ([\d,]+) QPS / p95 [\d.]+ ms "
         r"rerank;", "serve.http_1worker_rerank200_microbatch.qps", 1, 0.01),
        ("serve nomicrobatch QPS", r"does (\d+) QPS / p95 [\d.]+ ms "
         r"\(retrieval", "serve.http_single.qps", 1, 0.01),
        ("serve nomicrobatch p95", r"does \d+ QPS / p95 ([\d.]+) ms "
         r"\(retrieval", "serve.http_single.p95_ms", 1, 0.01),
    ]

    failures = []

    # the advertised test count (README layout block) vs a live
    # collection — the number that drifted rounds 2-3
    m = re.search(r"tests/\s+(\d+) tests", readme)
    if m:
        import subprocess

        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only",
             "-q"], capture_output=True, text=True, cwd=ROOT, timeout=120,
        ).stdout
        mc = re.search(r"(\d+) tests collected", out)
        if mc and mc.group(1) != m.group(1):
            failures.append(
                f"test count: README says {m.group(1)}, collection "
                f"says {mc.group(1)}")

    for label, pattern, path, scale, rtol in CLAIMS:
        m = re.search(pattern, readme)
        if not m:
            failures.append(f"{label}: pattern {pattern!r} not found in "
                            "README.md")
            continue
        claimed = float(m.group(1).replace(",", ""))
        src, _, p = path.partition(".")
        actual = float(_get(sources[src], p)) * scale
        # the README may round what the JSON stores precisely: accept
        # agreement at the precision the README states
        decimals = len(m.group(1).partition(".")[2])
        rounded = round(actual, decimals)
        if abs(claimed - rounded) > rtol * max(abs(rounded), 1e-9):
            failures.append(
                f"{label}: README says {claimed}, committed artifact "
                f"({path}) says {actual:.4g}")
    return failures


def main() -> int:
    failures = check_readme()
    for f in failures:
        print(f"DRIFT: {f}")
    print(json.dumps({"checked": "README.md", "failures": len(failures)}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
