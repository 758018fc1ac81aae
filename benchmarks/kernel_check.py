#!/usr/bin/env python
"""On-device kernel equivalence check.

The pytest suite validates the Pallas kernels in interpret mode on the
CPU mesh; this script runs the REAL Mosaic lowerings on whatever
accelerator is live and checks them against the XLA reference paths:

* fused DCN cross (fwd + VJP)        vs models.dcn XLA recurrence
* flash in-batch softmax CE (+grads) vs losses.in_batch_softmax
* blockwise approx top-k recall      vs exact dense top-k
* sparse adagrad rows                vs dense adagrad on touched rows

Prints one JSON line per check and exits nonzero on any failure.
Run: python benchmarks/kernel_check.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    failures = 0

    def report(name, ok, detail=""):
        nonlocal failures
        failures += not ok
        print(json.dumps({"check": name, "ok": bool(ok), "detail": detail,
                          "platform": jax.devices()[0].platform}))

    rng = np.random.default_rng(0)

    # ---- fused DCN cross --------------------------------------------
    from recsys_tpu.ops.pallas.dcn_cross import (
        dcn_cross_fused, dcn_cross_reference,
    )

    n, d, layers = 1024, 256, 3
    x0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.1)
    got = np.asarray(dcn_cross_fused(x0, w, b))
    want = np.asarray(dcn_cross_reference(x0, w, b))
    err = float(np.max(np.abs(got - want)))
    report("dcn_cross_fused fwd", err < 1e-3, f"max_err={err:.2e}")
    g = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ga = jax.grad(lambda *a: jnp.sum(dcn_cross_fused(*a) * g), argnums=(0, 1, 2))(x0, w, b)
    gr = jax.grad(lambda *a: jnp.sum(dcn_cross_reference(*a) * g), argnums=(0, 1, 2))(x0, w, b)
    err = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
              for x, y in zip(ga, gr))
    report("dcn_cross_fused vjp", err < 5e-2, f"max_err={err:.2e}")

    # ---- flash CE ----------------------------------------------------
    from recsys_tpu.models import losses as L
    from recsys_tpu.ops.pallas.flash_ce import in_batch_softmax_flash

    bsz, dim = 1024, 128
    u = jnp.asarray(rng.normal(size=(bsz, dim)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.normal(size=(bsz, dim)).astype(np.float32) * 0.2)
    ids = jnp.asarray(rng.integers(0, bsz // 2, bsz).astype(np.int32))
    logq = jnp.asarray(rng.normal(size=bsz).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=bsz).astype(np.float32) * 0.1)

    def flash(u, v):
        return in_batch_softmax_flash(u, v, item_ids=ids, log_q=logq, item_bias=bias)

    def ref(u, v):
        return L.in_batch_softmax(u, v, item_ids=ids, log_q=logq, item_bias=bias)

    lf, lr = float(flash(u, v)), float(ref(u, v))
    report("flash_ce fwd", abs(lf - lr) < 1e-3, f"{lf:.5f} vs {lr:.5f}")
    gf = jax.grad(lambda a, b: flash(a, b), argnums=(0, 1))(u, v)
    gr = jax.grad(lambda a, b: ref(a, b), argnums=(0, 1))(u, v)
    err = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
              for x, y in zip(gf, gr))
    report("flash_ce vjp", err < 1e-3, f"max_err={err:.2e}")

    # ---- blockwise approx top-k --------------------------------------
    from recsys_tpu.ops.topk import blockwise_topk
    from recsys_tpu.retrieval.scorer import topk_scores

    nq, ni, k = 64, 200_000, 10
    q = jnp.asarray(rng.normal(size=(nq, dim)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(ni, dim)).astype(np.float32))
    _, i_apx = blockwise_topk(q, items, k=k, block_size=50_000, approx=True)
    _, i_ref = topk_scores(q, items, k)
    recall = float(np.mean([
        len(set(np.asarray(a)) & set(np.asarray(b))) / k
        for a, b in zip(np.asarray(i_apx), np.asarray(i_ref))
    ]))
    report("blockwise approx top-k", recall >= 0.95, f"recall@{k}={recall:.4f}")

    # ---- sparse adagrad rows -----------------------------------------
    from recsys_tpu.train.optimizer import sparse_adagrad_rows

    V, D, B = 500, 16, 128
    table = rng.normal(size=(V, D)).astype(np.float32)
    accum = np.full((V, D), 0.1, np.float32)
    ids = rng.integers(0, 20, B).astype(np.int32)  # heavy duplication
    grads = rng.normal(size=(B, D)).astype(np.float32)
    lr = jnp.float32(0.1)
    t_sp, a_sp = sparse_adagrad_rows(
        jnp.asarray(table), jnp.asarray(accum), jnp.asarray(ids),
        jnp.asarray(grads), lr)
    dense_g = np.zeros((V, D), np.float32)
    np.add.at(dense_g, ids, grads)
    a_dn = accum + dense_g ** 2
    t_dn = table - 0.1 * dense_g / (np.sqrt(a_dn) + 1e-7)
    err = max(float(np.max(np.abs(np.asarray(t_sp) - t_dn))),
              float(np.max(np.abs(np.asarray(a_sp) - a_dn))))
    report("sparse_adagrad_rows", err < 1e-4, f"max_err={err:.2e}")

    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
