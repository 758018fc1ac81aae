#!/usr/bin/env python
"""Large-catalog END-TO-END HTTP serving bench (VERDICT r4 item 2).

Every committed serving QPS number before round 5 was on the trained
3,883-item MovieLens bundle; the large-catalog machinery — the device
backend's ``approx_max_k`` dispatch past 1M items and the int8+refine
catalog — was benched only at the scorer layer (``scale.json`` "chip").
This bench closes that gap: it synthesizes a REAL inference bundle with
an N-item catalog (trained-shape params with random weights — HTTP
throughput depends on catalog scale and the serving stack, not on what
the weights converged to), then drives the SAME HTTP benches the
3,883-item rows came from (``serve_bench.bench_http`` in-process
threaded transport, ``bench_multiworker`` out-of-process asyncio
transport) against it, at each scale.

This is the end-to-end answer to the reference's FAISS flat index
(``app/recommendation_service.py:72``), evaluated against the
reference's serving bar (<50 ms p95 / ~1k QPS, ``app/README.md:145-146``)
at the catalog sizes where FAISS-vs-exact actually matters.

  python benchmarks/serve_large_bench.py --items 1000000
  python benchmarks/serve_large_bench.py --items 8000000 --skip_aio

Writes/merges benchmarks/results/serving_large_catalog.json keyed by
catalog size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serve_bench import bench_http, bench_multiworker, bench_service  # noqa: E402

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results",
    "serving_large_catalog.json",
)


def _phase(msg: str) -> None:
    print(f"[serve_large +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def make_bundle(out_dir: str, n_items: int, n_users: int, dim: int) -> str:
    """Synthesize a servable inference bundle with an n_items catalog."""
    import jax

    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.models.multitask import MultiTaskModel
    from recsys_tpu.retrieval.scorer import RetrievalIndex
    from recsys_tpu.train.checkpoint import save_inference_bundle

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=dim, mixed_precision=True),
        train=TrainConfig(batch_size=4096, epochs=1),
        eval=EvalConfig(topk=(10,)),
    )
    _phase(f"init {n_users}x{n_items} dim={dim} params")
    params = MultiTaskModel.init(
        jax.random.PRNGKey(0), cfg.model, n_users, n_items)
    params = jax.device_get(params)
    _phase("materialize item embeddings (batched item-tower forward)")
    index = RetrievalIndex.build(
        params["towers"], cfg.model, n_items,
        item_raw_ids=np.arange(1, n_items + 1, dtype=np.int64),
    )
    _phase("write bundle (vocabs/encoder/index npz)")
    save_inference_bundle(
        out_dir,
        params["towers"],
        cfg,
        user_raw_ids=np.arange(1, n_users + 1, dtype=np.int64),
        item_raw_ids=np.arange(1, n_items + 1, dtype=np.int64),
        index=index,
        full_params=params,
    )
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--requests", type=int, default=2000)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--bundle_dir", default="")
    ap.add_argument("--skip_aio", action="store_true",
                    help="skip the out-of-process asyncio rows (second "
                         "process re-loads the catalog onto the chip — "
                         "skip when HBM cannot hold two copies)")
    ap.add_argument("--skip_int8", action="store_true")
    ap.add_argument("--int8_only", action="store_true",
                    help="run ONLY the int8 leg (own process): at 8M "
                         "items the f32 service's normalized catalog "
                         "(4 GB) plus the int8 variant exceed one "
                         "chip's HBM in a single process — measured "
                         "RESOURCE_EXHAUSTED; rows merge per scale")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.WARNING)

    bundle_dir = args.bundle_dir or f"/tmp/large_bundle_{args.items}"
    if not os.path.exists(os.path.join(bundle_dir, "index.npz")):
        make_bundle(bundle_dir, args.items, args.users, args.dim)

    from recsys_tpu.serve.service import RecommendationService

    rows = {
        "catalog_items": args.items,
        "dim": args.dim,
        "reference_claims": {"p95_ms": 50, "qps": 1000},
    }

    user_ids = np.arange(1, min(args.users, 4096) + 1)
    import jax

    rows["platform"] = jax.devices()[0].platform
    if args.int8_only:
        rows.pop("reference_claims", None)  # keep the f32 run's copy
        _phase("int8 catalog variant (own process)")
        svc8 = RecommendationService(
            bundle_dir, backend="device", int8_catalog=True).load()
        for u in user_ids[:8]:
            svc8.recommend(int(u), args.k)
        from recsys_tpu.serve.batcher import MicroBatcher

        with MicroBatcher(svc8, max_batch=256) as mb8:
            rows["http_microbatch_int8"] = bench_http(
                svc8, user_ids, args.requests, args.clients, args.k,
                batcher=mb8)
        _write(args.items, rows)
        return 0

    _phase("load service (device backend)")
    service = RecommendationService(bundle_dir, backend="device").load()
    for u in user_ids[:8]:
        service.recommend(int(u), args.k)  # jit warm (approx path >1M)
    rows["resolved_backend"] = service._resolved_backend()
    rows["approx_active"] = bool(
        service.approx_search_threshold
        and args.items > service.approx_search_threshold)
    # device-compute floor: one batched scoring call, timed per query.
    # Over this bench host's remote tunnel every dispatch pays ~25 ms
    # of RPC latency, which bounds ALL single-request rows below; this
    # leg isolates what the chip itself does per query — the number a
    # co-located deployment's microbatched QPS is set by.
    _phase("batched device-compute floor")
    import time as _time

    for bq in (256, 2048):
        ids = [int(u) for u in user_ids[:bq]]
        service.recommend_batch(ids, args.k)  # warm
        t0 = _time.perf_counter()
        reps = 5
        for _ in range(reps):
            service.recommend_batch(ids, args.k)
        dt = (_time.perf_counter() - t0) / reps
        rows[f"batch{bq}_ms_per_query"] = round(dt / bq * 1e3, 4)
        rows[f"batch{bq}_queries_per_s"] = round(bq / dt, 1)

    _phase("service-layer floor")
    rows["service_single"] = bench_service(
        service, user_ids, max(args.requests // 2, 500), args.k)
    _phase("HTTP threaded in-process")
    rows["http_single"] = bench_http(
        service, user_ids, args.requests, args.clients, args.k)
    from recsys_tpu.serve.batcher import MicroBatcher

    _phase("HTTP threaded + microbatch")
    with MicroBatcher(service, max_batch=256) as mb:
        rows["http_microbatch"] = bench_http(
            service, user_ids, args.requests, args.clients, args.k,
            batcher=mb)

    if not args.skip_int8:
        _phase("int8 catalog variant")
        svc8 = RecommendationService(
            bundle_dir, backend="device", int8_catalog=True).load()
        for u in user_ids[:8]:
            svc8.recommend(int(u), args.k)
        with MicroBatcher(svc8, max_batch=256) as mb8:
            rows["http_microbatch_int8"] = bench_http(
                svc8, user_ids, args.requests, args.clients, args.k,
                batcher=mb8)
        del svc8

    if not args.skip_aio:
        # release this process's device catalog before the server
        # process loads its own copy
        del service
        _phase("asyncio transport, out-of-process")
        rows["http_aio"] = bench_multiworker(
            bundle_dir, max(args.requests * 4, 8000), args.k, workers=1,
            client_procs=2, client_threads=8, server="asyncio")

    _write(args.items, rows)
    return 0


def _write(items: int, rows: dict) -> None:
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    # merge per scale so partial re-runs (e.g. adding the compute-floor
    # legs or the own-process int8 leg) keep previously committed rows
    merged = existing.get(str(items), {})
    merged.update(rows)
    existing[str(items)] = merged
    with open(RESULTS, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    sys.exit(main())
