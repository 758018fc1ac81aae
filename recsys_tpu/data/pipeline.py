"""Batched, host-sharded, deterministic input pipeline.

Replaces the reference's ``tf.data`` pipeline
(``src/trainer.py:95-117``: shuffle(50000).batch(B).prefetch) with a
numpy-columnar batcher designed for jit-compiled SPMD training:

* **static shapes** — every batch is exactly ``batch_size`` rows (the
  tail is dropped for train / padded+masked for eval), so the jitted
  step compiles once;
* **full-permutation shuffle** per epoch (strictly stronger than the
  reference's 50k shuffle buffer) from a counter-based seed, so the
  global batch order is identical on every host — the multi-host
  determinism requirement of SURVEY §7.3;
* **per-host slicing** — each process materializes only its
  ``1/process_count`` slice of every global batch, in mesh-data-axis
  order, ready for ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence

import numpy as np

TRAIN_COLS = ("user_id", "movie_id", "rating", "y_implicit")


class Batcher:
    """Deterministic epoch iterator over a preprocessing-bundle split."""

    def __init__(
        self,
        bundle: Dict[str, np.ndarray],
        split: str = "train",
        batch_size: int = 2048,
        seed: int = 42,
        columns: Sequence[str] = TRAIN_COLS,
        shuffle: bool = True,
        drop_remainder: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.columns = tuple(columns)
        self.data = {c: np.ascontiguousarray(bundle[f"{split}/{c}"]) for c in self.columns}
        self.n = len(next(iter(self.data.values())))
        if batch_size % process_count:
            raise ValueError("batch_size must divide by process_count")
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.process_index = process_index
        self.process_count = process_count

    @property
    def steps_per_epoch(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield this host's slice of each global batch. A ``mask``
        column marks real rows when padding (eval tails).

        The per-step row gather — the streaming path's host hot op —
        runs through the threaded C++ ``gather_batch``
        (``native/native.cpp``) when the library is available; ctypes
        releases the GIL during the call, so the gather parallelizes
        across cores and overlaps the asynchronously-dispatched device
        step. NumPy fancy indexing is the exact-equivalent fallback.
        Only this host's slice of the global batch is materialized."""
        from recsys_tpu.utils.native import gather_batch, native_available

        use_native = native_available()
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch_idx)).permutation(self.n)
        else:
            order = np.arange(self.n)
        local = self.batch_size // self.process_count
        lo_off = self.process_index * local
        for step in range(self.steps_per_epoch):
            idx = order[step * self.batch_size : (step + 1) * self.batch_size]
            mask = None
            if not self.drop_remainder:
                # always emit a mask so every batch has one pytree
                # structure (single jit compilation)
                pad = self.batch_size - len(idx)
                mask = np.concatenate(
                    [np.ones(len(idx), np.float32), np.zeros(pad, np.float32)]
                )
                if pad:
                    idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
            sl_idx = idx[lo_off:lo_off + local]
            if use_native:
                batch = gather_batch(self.data, sl_idx)
            else:
                batch = {c: self.data[c][sl_idx] for c in self.columns}
            if mask is not None:
                batch["mask"] = mask[lo_off:lo_off + local]
            yield batch

    def __iter__(self):
        return self.epoch(0)
