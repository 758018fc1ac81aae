#!/usr/bin/env python
"""Serving CLI (replaces ``uvicorn main:app`` / ``app/start_api.sh``).

Usage:
  python scripts/serve.py --model_dir outputs/models/experiment_001/serving \
      [--host 0.0.0.0] [--port 8000] [--stub]
"""

import os
import sys

# allow running straight from a checkout: python scripts/<name>.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging


def main(argv=None) -> int:
    import sys as _sys

    ap = argparse.ArgumentParser(description="Serve recommendations over HTTP")
    ap.add_argument("--model_dir", default="outputs/models/experiment_001/serving")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--stub", action="store_true",
                    help="serve the model-free stub service (degraded mode)")
    ap.add_argument("--rerank_candidates", type=int, default=0,
                    help="two-stage serving: retrieve this many candidates "
                         "and rerank with the DCN CTR head (0 = retrieval "
                         "only, the reference contract; needs model.npz)")
    ap.add_argument("--rerank_ctr_weight", type=float, default=0.25,
                    help="weight of the CTR logit in the rerank score "
                         "(0.25 is the ctr-only offline optimum; use 0.1 "
                         "WITH --rerank_rating_weight 0.25 — the measured "
                         "joint winner, rerank_weight_sweep.json)")
    ap.add_argument("--rerank_rating_weight", type=float, default=0.0,
                    help="weight of the trained rating head in the rerank "
                         "score (measured winner 0.25 with ctr weight 0.1: "
                         "+2.1%% recall@10 over ctr-only; at ctr weight "
                         "0.25 the rating head HURTS — set the pair "
                         "together)")
    ap.add_argument("--workers", type=int, default=1,
                    help="forked SO_REUSEPORT serving processes (use with "
                         "the host-side scoring backend; >1 sidesteps the GIL)")
    ap.add_argument("--microbatch", type=int, default=0,
                    help="dynamic micro-batching: coalesce concurrent "
                         "/recommend requests into one batched scoring call "
                         "of up to this many users (0 = off)")
    ap.add_argument("--microbatch_wait_ms", type=float, default=0.0,
                    help="hold the first request of a micro-batch this long "
                         "to let the batch grow (0 = drain-what's-there)")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "device", "native", "sharded",
                             "exported"],
                    help="scoring backend: jitted on-device, mesh-sharded "
                         "catalog (multi-chip), host C++ top-k, the AOT "
                         "jax.export artifact (<model_dir>/retrieve.hlo), "
                         "or auto")
    ap.add_argument("--int8_catalog", action="store_true",
                    help="serve from an int8-quantized catalog (4x less "
                         "HBM; device backend adds an exact f32 refine)")
    ap.add_argument("--allow_reload", action="store_true",
                    help="enable POST /admin/reload: atomically hot-swap "
                         "a retrained bundle from --model_dir without "
                         "restarting (unauthenticated - trusted networks "
                         "only)")
    ap.add_argument("--server", default="threaded",
                    choices=["threaded", "asyncio"],
                    help="HTTP transport: the stdlib threaded server "
                         "(default; thread per connection + optional "
                         "micro-batcher thread) or the single-event-loop "
                         "asyncio frontend (serve/aio.py: no thread "
                         "convoy, loop-native /recommend coalescing — "
                         "always on; --microbatch/--microbatch_wait_ms "
                         "set its batch bound/linger)")
    args = ap.parse_args(argv)

    if args.workers > 1:
        # Single-threaded BLAS per worker, set BEFORE numpy loads
        # (recsys_tpu imports happen below): OpenBLAS's spin-waiting
        # pool threads fight across worker processes on few cores.
        # With one worker the default pool is kept — the rerank matmul
        # uses every core.
        for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                   "MKL_NUM_THREADS"):
            os.environ.setdefault(_v, "1")

    if args.workers == 1:
        # sub-ms GIL-bound request handling + many keep-alive handler
        # threads: a shorter switch interval cuts the GIL-convoy tail
        # latency (see Api._compute_lock in serve/app.py). With >1
        # worker processes on few cores the extra switching only feeds
        # the cross-process preemption convoy, so leave the default.
        _sys.setswitchinterval(0.0005)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s: %(message)s")

    from recsys_tpu.serve.app import serve_forever

    serve_forever(args.model_dir, args.host, args.port,
                  workers=args.workers, stub=args.stub,
                  rerank_candidates=args.rerank_candidates,
                  rerank_ctr_weight=args.rerank_ctr_weight,
                  rerank_rating_weight=args.rerank_rating_weight,
                  microbatch=args.microbatch,
                  microbatch_wait_ms=args.microbatch_wait_ms,
                  backend=args.backend, int8_catalog=args.int8_catalog,
                  allow_reload=args.allow_reload, server=args.server)
    return 0


if __name__ == "__main__":
    sys.exit(main())
