"""Distributed checkpointing + resume (SURVEY §5.4).

The reference has save-best only (`ModelCheckpoint`, ``src/trainer.py:166``)
and **no resume path** — training always restarts from scratch. Here:

* Orbax-backed sharded checkpoints (each host writes its shards of
  row-sharded embedding tables) when available, npz fallback otherwise,
* ``save(step)`` / ``restore_latest()`` / keep-N rotation,
* a separate **inference bundle** (encoder params + vocabs + config +
  materialized item embeddings) replacing the reference's
  ``encoder.keras`` + ``vocabs.json`` + ``faiss.idx`` + ``item_map.json``
  artifact set (``src/trainer.py:228-248``).
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

try:
    import orbax.checkpoint as ocp

    _ORBAX = True
except ImportError:  # pragma: no cover
    _ORBAX = False


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


class CheckpointManager:
    """step-indexed checkpoints under ``<dir>/ckpt_<step>`` with keep-N
    rotation and a ``best`` alias."""

    def __init__(self, directory: str, keep: int = 3, use_orbax: bool = _ORBAX):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        self.use_orbax = use_orbax and _ORBAX
        if jax.process_index() == 0:
            os.makedirs(self.directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}")

    def save(self, step: int, state: Dict[str, Any], metrics: Optional[Dict] = None,
             is_best: bool = False) -> str:
        path = self._path(step)
        if self.use_orbax:
            ckptr = ocp.StandardCheckpointer()
            if jax.process_count() > 1:
                # multi-host: every process participates in the save
                # (Orbax coordinates sharded writes), but only one may
                # clear a stale directory — and everyone must wait for
                # it before writing (shared-filesystem race otherwise)
                from jax.experimental import multihost_utils

                if jax.process_index() == 0 and os.path.exists(path):
                    shutil.rmtree(path)
                multihost_utils.sync_global_devices(f"ckpt_clear_{step}")
            elif os.path.exists(path):
                shutil.rmtree(path)
            ckptr.save(path, state)
            ckptr.wait_until_finished()
        elif jax.process_index() == 0:  # npz fallback: replicated state
            os.makedirs(path, exist_ok=True)
            np.savez(os.path.join(path, "state.npz"), **_flatten(state))
        if jax.process_index() == 0:
            if metrics is not None:
                with open(os.path.join(path, "metrics.json"), "w") as f:
                    json.dump({k: float(v) for k, v in metrics.items()}, f)
            if is_best:
                with open(os.path.join(self.directory, "best"), "w") as f:
                    f.write(str(step))
            self._rotate()
        return path

    def _rotate(self) -> None:
        steps = sorted(self.all_steps())
        best = self.best_step()
        for s in steps[: max(0, len(steps) - self.keep)]:
            if s != best:
                shutil.rmtree(self._path(s), ignore_errors=True)

    def all_steps(self):
        if not os.path.isdir(self.directory):
            return []
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def best_step(self) -> Optional[int]:
        p = os.path.join(self.directory, "best")
        if os.path.exists(p):
            with open(p) as f:
                s = int(f.read().strip())
            if os.path.isdir(self._path(s)):
                return s
        return None

    def restore(self, step: int, like: Optional[Dict] = None) -> Dict:
        path = self._path(step)
        if self.use_orbax:
            ckptr = ocp.StandardCheckpointer()
            if like is not None:
                target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
                return ckptr.restore(path, target=target)
            return ckptr.restore(path)
        with np.load(os.path.join(path, "state.npz")) as z:
            return _unflatten({k: z[k] for k in z.files})

    def restore_latest(self, like: Optional[Dict] = None) -> Optional[Tuple[int, Dict]]:
        steps = self.all_steps()
        if not steps:
            return None
        s = steps[-1]
        return s, self.restore(s, like)

    def restore_best(self, like: Optional[Dict] = None) -> Optional[Tuple[int, Dict]]:
        s = self.best_step()
        if s is None:
            return self.restore_latest(like)
        return s, self.restore(s, like)


def save_inference_bundle(
    output_dir: str,
    tower_params: Dict,
    config,
    user_raw_ids: np.ndarray,
    item_raw_ids: np.ndarray,
    index=None,
    full_params: Dict = None,
    feature_state: Dict = None,
) -> None:
    """Write the serving artifact set:

    * ``encoder.npz``  — two-tower params        (was ``encoder.keras``)
    * ``vocabs.json``  — raw user/item id lists  (parity, ``src/trainer.py:231-232``)
    * ``config.json``  — run config              (parity, ``src/trainer.py:233``)
    * ``index.npz``    — RetrievalIndex          (was ``faiss.idx`` + ``item_map.json``)
    * ``model.npz``    — FULL model params (towers + DCN + heads) when
      given, enabling the two-stage retrieve→rerank serving path
      (the reference ships only ``best_model.keras``, which its primary
      service never reranks with)
    * ``features.npz`` — fitted ``FeatureEngineer`` state when the model
      consumes engineered dense features (``ModelConfig.dense_features``),
      so serving-time rerank computes the identical features
    """
    if jax.process_index() != 0:
        return
    os.makedirs(output_dir, exist_ok=True)
    np.savez(os.path.join(output_dir, "encoder.npz"), **_flatten(tower_params))
    if full_params is not None:
        np.savez(os.path.join(output_dir, "model.npz"), **_flatten(full_params))
    if feature_state is not None:
        np.savez(os.path.join(output_dir, "features.npz"), **feature_state)
    with open(os.path.join(output_dir, "vocabs.json"), "w") as f:
        json.dump(
            {
                "users": [int(u) for u in user_raw_ids],
                "items": [int(i) for i in item_raw_ids],
            },
            f,
        )
    config.save(os.path.join(output_dir, "config.json"))
    if index is not None:
        index.save(os.path.join(output_dir, "index.npz"))
    logger.info("inference bundle -> %s", output_dir)


def load_encoder_params(output_dir: str) -> Dict:
    with np.load(os.path.join(output_dir, "encoder.npz")) as z:
        return _unflatten({k: z[k] for k in z.files})


def load_model_params(output_dir: str) -> Dict:
    """Full-model params for the rerank serving path; None if the
    bundle predates ``model.npz``."""
    path = os.path.join(output_dir, "model.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def load_feature_engineer(output_dir: str):
    """Fitted ``FeatureEngineer`` from the bundle; None when the model
    does not use dense features."""
    path = os.path.join(output_dir, "features.npz")
    if not os.path.exists(path):
        return None
    from recsys_tpu.data.features import FeatureEngineer

    with np.load(path) as z:
        return FeatureEngineer.from_state({k: z[k] for k in z.files})
