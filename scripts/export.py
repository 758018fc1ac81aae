#!/usr/bin/env python
"""Export the serving retrieve path as one AOT StableHLO artifact
(jax.export — the deployment analogue of the reference's
``encoder.keras`` + ``faiss.idx`` pair, in a single file with the
trained weights and catalog baked in).

Usage:
  python scripts/export.py --model_dir outputs/.../serving \
      --output outputs/.../serving/retrieve.hlo [--k 10]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import logging


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="AOT-export the retrieve path")
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--output", default=None,
                    help="default: <model_dir>/retrieve.hlo")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s: %(message)s")

    from recsys_tpu.serve.export import export_retrieve

    out = args.output or os.path.join(args.model_dir, "retrieve.hlo")
    meta = export_retrieve(args.model_dir, out, k=args.k)
    print(json.dumps(meta, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
