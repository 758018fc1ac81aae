#!/usr/bin/env python
"""Cross-batch-negatives ablation: global vs per-replica in-batch
softmax under data parallelism (SURVEY §7.3; VERDICT r1 missing #1
"record the recall effect").

Trains the same small retrieval config twice on the forced 8-device CPU
mesh (data=8) — once with ``TrainConfig.global_negatives=True`` (the
candidate set spans the global batch: B·8−1 negatives per positive) and
once with ``False`` (per-replica [B/8, B/8] softmax, the reference's
tfrs-under-MirroredStrategy semantics) — and records recall@k of both.

Run: JAX_PLATFORMS=cpu python benchmarks/negatives_ablation.py
Writes benchmarks/results/negatives_ablation.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    if len(jax.devices()) < 8 or jax.devices()[0].platform != "cpu":
        import jax.extend.backend as jeb

        jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    from bench import get_bundle
    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.train.trainer import Trainer

    bundle = get_bundle(300_000)
    out = {"mesh": "data=8", "platform": "cpu", "batch": 1024}
    for glob in (True, False):
        cfg = RecsysConfig(
            model=ModelConfig(embedding_dim=32, cross_layers=1,
                              dropout_rate=0.0, mixed_precision=False),
            train=TrainConfig(batch_size=1024, epochs=4, learning_rate=5e-3,
                              global_negatives=glob, keep_checkpoints=1),
            eval=EvalConfig(topk=(10, 50), eval_batch_size=4096,
                            score_norm="dot"),
        )
        ctx = make_mesh(model_parallel=1)
        t0 = time.time()
        tr = Trainer(cfg, output_dir=f"/tmp/negs_ablation_{glob}",
                     mesh_ctx=ctx)
        rep = tr.train(bundle)
        key = "global" if glob else "per_replica"
        out[f"{key}_recall@10"] = round(rep["recall@10"], 6)
        out[f"{key}_recall@50"] = round(rep["recall@50"], 6)
        out[f"{key}_wall_s"] = round(time.time() - t0, 1)
        print(key, {k: v for k, v in rep.items() if "recall" in k}, flush=True)
    out["recall10_lift_global_over_per_replica"] = round(
        out["global_recall@10"] / max(out["per_replica_recall@10"], 1e-9), 3
    )
    path = "benchmarks/results/negatives_ablation.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    sys.exit(main())
