#!/usr/bin/env python
"""Training CLI (flag parity with the reference ``scripts/train.py:39-192``
plus the mesh/topology flags a TPU build needs).

Reference flags kept (same names, same defaults where the reference CLI
defines them — the dataclass/CLI default mismatches of SURVEY §5.6 are
resolved in favor of the CLI, which is what users actually ran):
  --data --output_dir --embedding_dim --cross_layers --batch_size
  --epochs --learning_rate --negative_sampling --num_hard_negatives
  --num_random_negatives --ctr_weight --rating_weight
  --distributed_strategy --use_wandb

New (TPU): --model_parallel --embedding_sharding --lookup_strategy
  --resume --bf16 --global_negatives/--per_replica_negatives
  --eval_sample --use_dense_features --use_side_features
"""

import os
import sys

# allow running straight from a checkout: python scripts/<name>.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging


def build_config(args):
    from recsys_tpu.config import (
        DataConfig, EvalConfig, MeshConfig, ModelConfig, RecsysConfig, TrainConfig,
    )

    dense = 0
    if args.use_dense_features:
        from recsys_tpu.data.features import FeatureEngineer

        n_user_side = 3 if args.use_side_features else 0
        n_item_side = 1 if args.use_side_features else 0
        dense = FeatureEngineer.n_features(
            n_user_side=n_user_side, n_item_side=n_item_side
        )
    elif args.use_side_features:
        raise SystemExit("--use_side_features requires --use_dense_features")
    return RecsysConfig(
        model=ModelConfig(
            embedding_dim=args.embedding_dim,
            cross_layers=args.cross_layers,
            ctr_weight=args.ctr_weight,
            rating_weight=args.rating_weight,
            mixed_precision=args.bf16,
            dense_features=dense,
            softmax_temperature=args.softmax_temperature,
            use_flash_ce={"auto": "auto", "xla": False, "flash": True,
                          "chunked": "chunked"}[args.retrieval_loss],
        ),
        data=DataConfig(
            processed_path=args.data,
            negative_sampling=args.negative_sampling,
            num_hard_negatives=args.num_hard_negatives,
            num_random_negatives=args.num_random_negatives,
            mined_from=getattr(args, "mined_from", ""),
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            epochs=args.epochs,
            resume=args.resume,
            seed=args.seed,
            global_negatives=args.global_negatives,
        ),
        mesh=MeshConfig(
            model_axis=args.model_parallel,
            embedding_sharding=args.embedding_sharding,
            lookup_strategy=args.lookup_strategy,
        ),
        eval=EvalConfig(eval_sample=args.eval_sample),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train the TPU recsys model")
    # default: DataConfig.processed_path (the config dataclass is the
    # single source of truth for the preprocessed-bundle location)
    from recsys_tpu.config import DataConfig as _DC

    ap.add_argument("--data", default=_DC().processed_path,
                    help="preprocessed bundle (.npz)")
    ap.add_argument("--output_dir", default="outputs/models/experiment_001")
    # reference CLI defaults (scripts/train.py:60-125)
    ap.add_argument("--embedding_dim", type=int, default=64)
    ap.add_argument("--cross_layers", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--negative_sampling", default="random",
                    choices=["random", "hard", "mixed", "mined"])
    ap.add_argument("--mined_from", default="",
                    help="trained serving-bundle dir to mine TRUE hard "
                         "negatives from (negative_sampling=mined)")
    ap.add_argument("--num_hard_negatives", type=int, default=20)
    ap.add_argument("--num_random_negatives", type=int, default=30)
    ap.add_argument("--ctr_weight", type=float, default=0.2)
    ap.add_argument("--rating_weight", type=float, default=0.2)
    ap.add_argument("--distributed_strategy", default="mesh",
                    choices=["none", "mirrored", "multi_worker", "mesh"],
                    help="accepted for compat; everything maps to the mesh runtime")
    ap.add_argument("--use_wandb", action="store_true")
    # TPU-native flags
    ap.add_argument("--model_parallel", type=int, default=1,
                    help="size of the model mesh axis (embedding-row shards)")
    ap.add_argument("--embedding_sharding", default="replicated",
                    choices=["replicated", "rows"])
    ap.add_argument("--lookup_strategy", default="xla",
                    choices=["xla", "psum", "a2a"],
                    help="how row-sharded tables are read in the train "
                         "step: xla = GSPMD-partitioned gather, psum/a2a "
                         "= explicit shard_map collective lookup "
                         "(embed/table.py)")
    ap.add_argument("--global_negatives", action="store_true", default=True,
                    help="in-batch softmax candidates span the GLOBAL "
                         "batch under data parallelism (default; more "
                         "negatives per positive)")
    ap.add_argument("--per_replica_negatives", dest="global_negatives",
                    action="store_false",
                    help="per-replica [B_local, B_local] softmax — exact "
                         "parity with the reference's tfrs Retrieval "
                         "under MirroredStrategy (src/models.py:116,137)")
    ap.add_argument("--use_side_features", action="store_true",
                    help="merge the MovieLens demographic side tables "
                         "(gender/age/occupation + movie year) into the "
                         "engineered features (the external-feature merge "
                         "of src/data_processing.py:243-258); requires "
                         "--use_dense_features")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--eval_sample", type=int, default=0,
                    help="0 = full-split eval; N = reference-style sampled eval")
    ap.add_argument("--use_dense_features", action="store_true",
                    help="feed the engineered feature set into the DCN "
                         "ranking input (the reference computes these "
                         "features but never trains on them)")
    ap.add_argument("--softmax_temperature", type=float, default=1.0,
                    help="retrieval in-batch softmax temperature")
    ap.add_argument("--retrieval_loss", default="auto",
                    choices=["auto", "xla", "flash", "chunked"],
                    help="retrieval-loss implementation: 'auto' (default) "
                         "picks dense XLA while the logits matrix fits "
                         "model.retrieval_logits_cap_gb and the "
                         "non-materializing path (flash Pallas on TPU, "
                         "chunked scan elsewhere) above it; the others "
                         "force a path (warned when in a losing regime)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    dest="overrides",
                    help="dotted config override for any field, e.g. "
                         "--set train.sparse_table_updates=true "
                         "--set model.dropout_rate=0.3 (JSON-parsed values)")
    args = ap.parse_args(argv)

    from recsys_tpu.utils.metrics_io import setup_logging

    setup_logging()
    logger = logging.getLogger("train")

    from recsys_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    cfg = build_config(args)
    if args.overrides:
        import json as _json

        parsed = {}
        for kv in args.overrides:
            if "=" not in kv:
                ap.error(f"--set expects KEY=VALUE, got {kv!r}")
            k, v = kv.split("=", 1)
            lowered = v.strip().lower()
            if lowered in ("true", "false"):
                parsed[k] = lowered == "true"
            elif lowered in ("none", "null"):
                parsed[k] = None
            else:
                try:
                    parsed[k] = _json.loads(v)
                except _json.JSONDecodeError:
                    parsed[k] = v  # bare string
        cfg = cfg.replace(**parsed)
    logger.info("config:\n%s", cfg.to_json())

    from recsys_tpu.data.preprocessing import load_bundle
    from recsys_tpu.train.trainer import Trainer

    bundle = load_bundle(args.data)

    wandb_run = None
    if args.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(project="recsys-tpu", config=cfg.to_dict())
        except ImportError:
            logger.warning("wandb not installed; continuing without it")

    try:
        trainer = Trainer(cfg, output_dir=args.output_dir)
        report = trainer.train(bundle)
        logger.info("final metrics: %s", report)
        # per-epoch + final W&B logging happens inside MetricWriter
        # (src/trainer.py:173-174,218-219 parity); nothing to add here
        return 0
    except KeyboardInterrupt:
        logger.warning("interrupted by user")
        return 130
    finally:
        if wandb_run is not None:
            wandb_run.finish()


if __name__ == "__main__":
    sys.exit(main())
