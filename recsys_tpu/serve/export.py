"""Ahead-of-time export of the serving path (the SavedModel analogue).

The reference deploys by shipping ``encoder.keras`` + ``faiss.idx`` and
re-instantiating Python model classes at startup
(``app/recommendation_service.py:34-59``). The TPU-native analogue is a
**serialized StableHLO artifact** via ``jax.export``: the whole
retrieve path — user-tower MLP -> L2 normalize -> catalog matmul ->
``lax.top_k`` — traced once with the trained parameters and the
materialized item catalog baked in as constants, serialized to one
file, and callable on any host with a JAX runtime (no recsys_tpu model
code, no retracing, no weight files).

* batch dimension is symbolic — one artifact serves any query batch;
* exported for both ``cpu`` and ``tpu`` lowering platforms, so the same
  artifact runs in a CPU canary and on the serving TPU;
* ``k`` is fixed at export time (top-k shape must be static).

Usage::

    python scripts/export.py --model_dir <bundle> --output retrieve.hlo
    fn = load_exported("retrieve.hlo")          # any process, later
    scores, item_idx = fn(user_dense_ids)       # [B] int32 -> [B,k] x2
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from recsys_tpu.config import RecsysConfig
from recsys_tpu.models.towers import TwoTower
from recsys_tpu.retrieval.scorer import RetrievalIndex, l2_normalize
from recsys_tpu.train.checkpoint import load_encoder_params

logger = logging.getLogger(__name__)

# lowering targets baked into every artifact: a CPU canary can execute
# the same bytes the serving TPU runs
_PLATFORMS = ("cpu", "tpu")

# bundle files whose contents are baked into the artifact as constants
# (weights + catalog) or shape its calling convention (config)
_FINGERPRINT_FILES = ("encoder.npz", "index.npz", "config.json")


def bundle_fingerprint(model_dir: str) -> str:
    """Content hash of the bundle files the artifact bakes in. Stamped
    into the export metadata and re-verified at serving load: if the
    bundle is retrained/rebuilt without re-exporting ``retrieve.hlo``,
    the stale artifact would silently serve old weights (and, when the
    catalog order changed, WRONG item ids) while ``/model/info`` reports
    the new bundle's version."""
    import hashlib

    h = hashlib.sha256()
    for name in _FINGERPRINT_FILES:
        path = os.path.join(model_dir, name)
        h.update(name.encode())
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                h.update(chunk)
    return h.hexdigest()


def build_retrieve_fn(model_dir: str, k: int = 10) -> Callable:
    """The full retrieve closure (ids -> scores, item indices) with
    trained params + catalog as constants."""
    cfg = RecsysConfig.load(os.path.join(model_dir, "config.json"))
    # constants must stay HOST numpy: export-time lowering embeds every
    # closed-over array as a constant, and fetching device-resident
    # constants stalls indefinitely when the device is a remote-tunneled
    # TPU (observed: export hung >9 min with jnp constants, 13 s with
    # numpy). np.asarray also makes the trace device-independent.
    params = jax.tree.map(np.asarray, load_encoder_params(model_dir))
    index = RetrievalIndex.load(os.path.join(model_dir, "index.npz"))
    items = np.asarray(index.item_embeddings_np)
    if index.normalize:
        items = items / np.maximum(
            np.linalg.norm(items, axis=-1, keepdims=True), 1e-12
        )
    items_t = np.ascontiguousarray(items.T)

    def retrieve(user_dense_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        u = TwoTower.user_embed(params, user_dense_ids, cfg.model)
        if index.normalize:
            u = l2_normalize(u)
        scores = jnp.dot(u, items_t, preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, k)

    return retrieve


def export_retrieve(model_dir: str, out_path: str, k: int = 10) -> dict:
    """Serialize the retrieve path to ``out_path``; returns metadata
    (also written next to the artifact as ``<out_path>.json``)."""
    retrieve = build_retrieve_fn(model_dir, k=k)
    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    exported = jax_export.export(
        jax.jit(retrieve), platforms=_PLATFORMS
    )(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    meta = {
        "k": k,
        "model_dir": model_dir,
        "platforms": list(_PLATFORMS),
        "calling_convention": "user_dense_ids[int32, b] -> "
                              "(scores[f32, b, k], item_idx[int32, b, k])",
        "bytes": len(blob),
        "source_fingerprint": bundle_fingerprint(model_dir),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    logger.info("exported retrieve(k=%d) -> %s (%d bytes)",
                k, out_path, len(blob))
    return meta


def load_exported(path: str) -> Callable:
    """Rehydrate an exported artifact into a jitted callable — needs
    only the JAX runtime, none of this package's model code."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    # one jit wrapper for the lifetime of the loaded artifact — built
    # inside fn it would be recreated (empty executable cache) per call
    call = jax.jit(exported.call)

    def fn(user_dense_ids) -> Tuple[np.ndarray, np.ndarray]:
        ids = jnp.asarray(user_dense_ids, jnp.int32)
        s, i = call(ids)
        return np.asarray(s), np.asarray(i)

    return fn
