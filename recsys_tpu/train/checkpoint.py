"""Distributed checkpointing + resume (SURVEY §5.4).

The reference has save-best only (`ModelCheckpoint`, ``src/trainer.py:166``)
and **no resume path** — training always restarts from scratch. Here:

* Orbax-backed sharded checkpoints (each host writes its shards of
  row-sharded embedding tables) when available, npz fallback otherwise,
* ``save(step)`` / ``restore_latest()`` / keep-N rotation,
* **async saves** (``async_save=True``): the device→host snapshot is
  taken synchronously (safe with donated step buffers — the next step
  mutates the device state immediately), then the disk write runs in
  the background while training continues; ``wait()`` finalizes the
  commit, the ``metrics.json``/``best`` sidecars, and keep-N rotation.
  Both backends commit atomically (Orbax tmp-dir rename; the npz
  fallback writes ``<path>.tmp`` then ``os.replace``), so a crash
  mid-write never leaves a half checkpoint that ``restore_latest``
  would pick up. Async is single-process only — multi-host saves stay
  synchronous; the multi-host save/restore path itself (cooperative
  Orbax save + ``--resume`` across 2 real processes, epoch-2
  trajectory parity with an uninterrupted run) is audited by
  ``tests/test_multihost.py::test_two_process_checkpoint_resume``,
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
    elif tree is None:
        # empty pytree leaves (e.g. TrainState.extras when the negative
        # cache is off): np.asarray(None) is a dtype=object array that
        # np.load refuses to read back (allow_pickle=False) — skip;
        # restore reconstructs the field from the NamedTuple default
        pass
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
    rotation, a ``best`` alias, and optional background (async) saves."""

    def __init__(self, directory: str, keep: int = 3, use_orbax: bool = _ORBAX,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        self.use_orbax = use_orbax and _ORBAX
        # async is single-process only: the multi-host path needs every
        # process at the commit barrier, which the trainer's call sites
        # do not guarantee mid-epoch
        self.async_save = async_save and jax.process_count() == 1
        self._async_ckptr = None  # lazily-built ocp.AsyncCheckpointer
        self._pending: Optional[Tuple[int, Optional[Dict], bool, Any]] = None
        if jax.process_index() == 0:
            os.makedirs(self.directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}")

    def save(self, step: int, state: Dict[str, Any], metrics: Optional[Dict] = None,
             is_best: bool = False) -> str:
        self.wait()  # at most one write in flight
        path = self._path(step)
        if self.use_orbax:
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
            if self.async_save:
                if self._async_ckptr is None:
                    self._async_ckptr = ocp.AsyncCheckpointer(
                        ocp.StandardCheckpointHandler()
                    )
                # device→host snapshot happens inside save() before it
                # returns; only the disk write is backgrounded, so the
                # trainer may immediately mutate (donated) device state
                self._async_ckptr.save(path, args=ocp.args.StandardSave(state))
                self._pending = (step, metrics, is_best,
                                 self._async_ckptr.wait_until_finished)
                return path
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, state)
            ckptr.wait_until_finished()
        elif jax.process_index() == 0:  # npz fallback: replicated state
            flat = _flatten(state)  # host copy NOW (donation safety)
            if self.async_save:
                import threading

                def _write():
                    tmp = path + ".tmp"
                    if os.path.exists(tmp):
                        shutil.rmtree(tmp)
                    os.makedirs(tmp)
                    np.savez(os.path.join(tmp, "state.npz"), **flat)
                    if os.path.exists(path):
                        shutil.rmtree(path)
                    os.replace(tmp, path)  # atomic commit

                t = threading.Thread(target=_write, daemon=True)
                t.start()
                self._pending = (step, metrics, is_best, t.join)
                return path
            os.makedirs(path, exist_ok=True)
            np.savez(os.path.join(path, "state.npz"), **flat)
        self._finalize(step, metrics, is_best)
        return path

    def _finalize(self, step: int, metrics: Optional[Dict], is_best: bool) -> None:
        """Post-commit sidecars + rotation (process 0 only)."""
        if jax.process_index() != 0:
            return
        path = self._path(step)
        if metrics is not None:
            with open(os.path.join(path, "metrics.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)
        if is_best:
            with open(os.path.join(self.directory, "best"), "w") as f:
                f.write(str(step))
        self._rotate()

    def wait(self) -> None:
        """Block until any in-flight async save has committed, then
        write its sidecars and rotate. No-op when nothing is pending."""
        if self._pending is None:
            return
        step, metrics, is_best, waiter = self._pending
        self._pending = None
        waiter()
        self._finalize(step, metrics, is_best)

    def close(self) -> None:
        self.wait()
        if self._async_ckptr is not None:
            self._async_ckptr.close()
            self._async_ckptr = None

    def _rotate(self) -> None:
        steps = sorted(self.all_steps())
        best = self.best_step()
        for s in steps[: max(0, len(steps) - self.keep)]:
            if s != best:
                shutil.rmtree(self._path(s), ignore_errors=True)

    def all_steps(self):
        # a pending async save must land before listing (wait() is a
        # no-op during the post-commit rotation pass — _pending is
        # cleared before _finalize runs)
        self.wait()
        if not os.path.isdir(self.directory):
            return []
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def best_step(self) -> Optional[int]:
        self.wait()  # the ``best`` alias is written post-commit
        p = os.path.join(self.directory, "best")
        if os.path.exists(p):
            with open(p) as f:
                s = int(f.read().strip())
            if os.path.isdir(self._path(s)):
                return s
        return None

    def restore(self, step: int, like: Optional[Dict] = None) -> Dict:
        self.wait()
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
