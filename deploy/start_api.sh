#!/usr/bin/env bash
# Preflight + start (parity: app/start_api.sh — dependency and model
# checks before launching the server).
set -euo pipefail

MODEL_DIR="${MODEL_DIR:-outputs/models/experiment_001/serving}"
HOST="${HOST:-0.0.0.0}"
PORT="${PORT:-8000}"

if ! python -c "import jax, numpy" 2>/dev/null; then
    echo "ERROR: jax/numpy not installed (pip install jax numpy)" >&2
    exit 1
fi

if [ ! -f "${MODEL_DIR}/encoder.npz" ]; then
    echo "WARNING: no trained model at ${MODEL_DIR} — serving will answer 503s" >&2
    echo "         (train one: python scripts/train.py --data <bundle.npz>)" >&2
fi

exec python scripts/serve.py --model_dir "${MODEL_DIR}" --host "${HOST}" --port "${PORT}"
