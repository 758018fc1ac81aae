#!/usr/bin/env python
"""Preprocessing CLI (parity: ``scripts/preprocess.py`` +
``src/preprocessing.py:225-235`` of the reference).

Usage:
  python scripts/preprocess.py --data_dir data/raw --output data/processed/processed_data.npz
"""

import os
import sys

# allow running straight from a checkout: python scripts/<name>.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging


def main(argv=None) -> int:
    # defaults come from DataConfig so the config dataclass is the single
    # source of truth for data paths/sizes (no dead config fields)
    from recsys_tpu.config import DataConfig

    dc = DataConfig()
    ap = argparse.ArgumentParser(description="Preprocess MovieLens-1M data")
    ap.add_argument("--data_dir", default=dc.data_dir,
                    help="directory with ratings.dat/movies.dat/users.dat")
    ap.add_argument("--output", default=dc.processed_path,
                    help="output bundle path (.npz)")
    ap.add_argument("--implicit_threshold", type=float,
                    default=dc.implicit_threshold,
                    help="rating >= threshold defines the positive label")
    ap.add_argument("--synthetic_ratings", type=int,
                    default=dc.synthetic_num_ratings,
                    help="synthesize N ratings when ratings.dat is absent")
    ap.add_argument("--synthetic_seed", type=int, default=dc.synthetic_seed)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    from recsys_tpu.data.preprocessing import run

    run(
        args.data_dir,
        args.output,
        implicit_threshold=args.implicit_threshold,
        synthetic_ratings=args.synthetic_ratings,
        synthetic_seed=args.synthetic_seed,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
