"""Benchmark: training throughput (examples/s/chip) on MovieLens-1M scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the SELF-MEASURED reference-equivalent TF/Keras run on this
container's CPU — 49,447 examples/s
(``benchmarks/tf_reference_baseline.py`` with the reference CLI
defaults; ``benchmarks/results/tf_reference_cpu.json``). Revision
history of the denominator, most-honest-wins: round 1 inferred ~13,300
ex/s from the reference's only published wall-clock figure
(``QUICK_START.md:53``); round 2 measured 22,138 on a contended host;
round 3 re-measured 49,447 on an idle host and takes THAT (a 2.2×
stricter denominator). ``vs_baseline`` = our examples/s/chip / 49,447.

Run: python bench.py [--steps N] [--batch B] [--dim D] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_EXAMPLES_PER_S = 49_447.0  # measured, see docstring
BENCH_BUNDLE = "data/processed/bench_bundle.npz"


def get_bundle(num_ratings: int) -> dict:
    from recsys_tpu.data import preprocessing as prep

    if os.path.exists(BENCH_BUNDLE):
        b = prep.load_bundle(BENCH_BUNDLE)
        if len(b["train/user_id"]) >= 0.7 * num_ratings:
            return b
    raw_dir = (
        "data/raw" if os.path.exists("data/raw/movies.dat")
        else "/root/reference/data/raw"
    )
    bundle = prep.run(
        raw_dir, BENCH_BUNDLE, synthetic_ratings=num_ratings, synthetic_seed=1
    )
    return bundle


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--ratings", type=int, default=1_000_209)
    ap.add_argument("--quick", action="store_true", help="tiny run for smoke")
    args = ap.parse_args()
    if args.quick:
        args.ratings, args.steps, args.batch = 100_000, 20, 1024

    import jax
    import jax.numpy as jnp

    from recsys_tpu.config import EvalConfig, ModelConfig, RecsysConfig, TrainConfig
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.data.pipeline import Batcher
    from recsys_tpu.models import losses
    from recsys_tpu.train.trainer import Trainer

    bundle = get_bundle(args.ratings)
    n_users = int(bundle["meta/n_users"])
    n_items = int(bundle["meta/n_movies"])

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=args.dim, mixed_precision=True),
        train=TrainConfig(batch_size=args.batch, epochs=1),
        eval=EvalConfig(topk=(10,)),
    )
    ctx = make_mesh(model_parallel=1)
    trainer = Trainer(cfg, output_dir="/tmp/bench_run", mesh_ctx=ctx)

    state = trainer.init_state(n_users, n_items, seed=0)
    trainer._state_for_shape = state
    class_weights = losses.balanced_class_weights(bundle["train/y_implicit"])

    pop = np.bincount(bundle["train/movie_id"], minlength=n_items).astype(np.float32)
    log_q = np.log(np.maximum(pop, 0.5) / len(bundle["train/movie_id"])).astype(np.float32)

    batcher = Batcher(bundle, "train", args.batch, seed=0)
    batches = []
    it = batcher.epoch(0)
    for _ in range(args.steps):
        try:
            b = next(it)
        except StopIteration:
            it = batcher.epoch(1)
            b = next(it)
        batches.append({**b, "log_q": log_q[b["movie_id"]]})

    # Device-resident timing: the production training mode is one
    # lax.scan per epoch (TrainConfig.device_resident_data), so the
    # honest per-step number is measured the same way — batches staged
    # on device once, all steps in ONE dispatch, completion forced by
    # reading the last step's loss back to the host. A per-step Python
    # dispatch loop over the remote-TPU tunnel measures the tunnel, and
    # block_until_ready alone returns early through the relay.
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(ctx.mesh, P(None, ctx.data_axis))
    stacked = {
        k: jax.device_put(np.stack([b[k] for b in batches]), data_sh)
        for k in batches[0]
    }
    step_core = trainer._step_core(class_weights, False)

    @jax.jit
    def run_steps(state, data):
        def body(s, b):
            s2, m = step_core(s, b)
            return s2, m["loss"]
        return jax.lax.scan(body, state, data)

    state, step_losses = run_steps(state, stacked)  # compile + warm
    float(step_losses[-1])
    t0 = time.perf_counter()
    state, step_losses = run_steps(state, stacked)
    final_loss = float(step_losses[-1])  # host readback = true completion
    dt = time.perf_counter() - t0
    metrics = {"loss": final_loss}

    # ---- retrieval QPS (secondary headline, BASELINE.json) ----------
    from recsys_tpu.models.towers import TwoTower
    from recsys_tpu.retrieval.scorer import materialize_item_embeddings, topk_scores

    params_host = state.params
    item_embs = materialize_item_embeddings(
        jax.tree.map(lambda x: x, params_host["towers"]), cfg.model, n_items
    )
    q_batch = 4096
    uids = jnp.arange(q_batch, dtype=jnp.int32) % n_users
    u_emb = TwoTower.user_embed(params_host["towers"], uids, cfg.model)
    reps = 200

    @jax.jit
    def topk_reps(u_emb, item_embs):
        def body(c, i):
            # perturb the queries so XLA can't hoist the loop-invariant
            # score+topk out of the scan
            s, idx = topk_scores(u_emb + i * 1e-9, item_embs, 10)
            return c + s[0, 0], None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))[0]

    float(topk_reps(u_emb, item_embs))  # compile + warm
    t0 = time.perf_counter()
    float(topk_reps(u_emb, item_embs))  # readback = true completion
    qps = reps * q_batch / (time.perf_counter() - t0)

    n_chips = jax.device_count()
    examples_per_s = args.steps * args.batch / dt
    per_chip = examples_per_s / n_chips
    result = {
        "metric": "train_examples_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_EXAMPLES_PER_S, 2),
        "extras": {
            "platform": jax.devices()[0].platform,
            "n_chips": n_chips,
            "batch": args.batch,
            "embedding_dim": args.dim,
            "steps_timed": args.steps,
            "step_time_ms": round(1000 * dt / args.steps, 3),
            "final_loss": float(np.asarray(metrics["loss"])),
            "retrieval_qps_batched": round(qps, 1),
            "catalog_items": n_items,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
