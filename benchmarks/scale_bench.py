#!/usr/bin/env python
"""Scaled synthetic workload bench — BASELINE.json configs[4].

The reference tops out at MovieLens-1M with fully replicated
``keras.layers.Embedding`` tables and a host-side FAISS flat index; it
has no story for ID tables that exceed one accelerator. This bench
exercises the TPU-native answer at two scales:

* ``--mode chip`` (one real TPU): a giant single-chip table (default
  16M rows x dim 128 = 8.2 GB HBM) — embedding-lookup throughput
  (ids/s) and blockwise top-k serving over a multi-million-item
  catalog streamed in HBM-friendly blocks (``ops/topk.blockwise_topk``).
* ``--mode mesh`` (8-device CPU mesh, the multi-chip stand-in): a
  TRUE 100M-row table row-sharded over the ``model`` axis, comparing
  the three lookup strategies (XLA-partitioned gather, masked+psum,
  capacity-bucketed all-to-all — ``embed/table.py``) plus the sharded
  top-k (per-shard ``lax.top_k`` + merge) and the ppermute-ring top-k
  (``ops/topk.make_ring_topk``) over a row-sharded catalog.

Timing uses one ``lax.scan`` dispatch with a forced host readback (see
``bench.py`` — ``block_until_ready`` returns early through the remote
relay) and per-iteration input perturbation so XLA cannot hoist the
loop body.

Writes ``benchmarks/results/scale.json``. Run:
  python benchmarks/scale_bench.py --mode chip
  JAX_PLATFORMS=cpu python benchmarks/scale_bench.py --mode mesh
(the mesh mode forces an 8-device CPU pool itself if needed)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "scale.json"
)


def _phase(msg: str) -> None:
    """Per-phase progress line (VERDICT r3 item 1: a watcher must be able
    to tell init from compile from step on a slow host)."""
    print(f"[scale_bench +{time.perf_counter() - _T0:8.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _force_cpu_mesh(n_devices: int) -> None:
    from recsys_tpu.parallel.mesh import force_virtual_cpu_devices

    force_virtual_cpu_devices(n_devices)


def timed_scan(fn, carry, reps: int, *args):
    """Time ``reps`` applications of ``fn(carry, i, *args)`` inside ONE
    dispatched lax.scan; readback of the reduced output forces true
    completion. Device arrays MUST be passed via ``*args`` — a closure
    capture becomes an HLO constant and is shipped through the remote
    compile service (HTTP 413 on multi-GB tables)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c, *a):
        def body(c, i):
            return fn(c, i, *a), None

        return jax.lax.scan(body, c, jnp.arange(reps))[0]

    out = run(carry, *args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # warm
    t0 = time.perf_counter()
    out = run(carry, *args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps


def bench_chip(rows: int, dim: int, batch: int, catalog: int, k: int,
               q_batch: int, reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from recsys_tpu.ops.topk import blockwise_topk

    print(f"[chip] building {rows}x{dim} table...", file=sys.stderr, flush=True)
    key = jax.random.key(0, impl="rbg")
    table = jax.random.normal(key, (rows, dim), jnp.float32)
    jax.block_until_ready(table)
    ids0 = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, rows, jnp.int32)

    print("[chip] table ready; lookup bench...", file=sys.stderr, flush=True)

    def lookup_fn(c, i, table, ids0):
        ids = (ids0 + i) % rows
        emb = jnp.take(table, ids, axis=0)
        return c + emb[0, 0]

    dt_lookup = timed_scan(lookup_fn, jnp.float32(0), reps, table, ids0)

    # blockwise streaming top-k over a huge catalog (long-context
    # analogue, SURVEY §5.7): queries vs `catalog` items in blocks
    print("[chip] lookup done; topk bench...", file=sys.stderr, flush=True)
    items = table[:catalog]
    q0 = jax.random.normal(jax.random.PRNGKey(2), (q_batch, dim), jnp.float32)

    def topk_fn(c, i, q0, items):
        s, idx = blockwise_topk(q0 + i * 1e-9, items, k=k, block_size=65536)
        return c + s[0, 0]

    dt_topk = timed_scan(topk_fn, jnp.float32(0), max(reps // 4, 2), q0, items)

    def topk_approx_fn(c, i, q0, items):
        s, idx = blockwise_topk(
            q0 + i * 1e-9, items, k=k, block_size=500_000, approx=True
        )
        return c + s[0, 0]

    dt_topk_approx = timed_scan(
        topk_approx_fn, jnp.float32(0), max(reps // 2, 4), q0, items)

    # int8-quantized catalog (4x less HBM; MXU int8 path). The exact
    # reference for the recall check is computed FIRST, then the f32
    # table/catalog are freed — int8 serving would not keep them in HBM,
    # and the 16M-row table + 8M-item catalog + int8 copy together
    # exhaust a v5e's 16 GB.
    import numpy as np

    from recsys_tpu.ops.topk import blockwise_topk_int8, quantize_rows

    from recsys_tpu.retrieval.scorer import l2_normalize

    _, i_ex = blockwise_topk(q0[:256], items, k=k, block_size=65536)
    i_ex = np.asarray(i_ex)
    # the f32 paths above score cosine (normalize=True): quantize the
    # L2-normalized rows so the int8 ranking is the same contract
    iq, isc = jax.jit(lambda x: quantize_rows(l2_normalize(x)))(items)
    q0 = jax.jit(l2_normalize)(q0)
    jax.block_until_ready((iq, isc, q0))
    table.delete()
    items.delete()

    def topk_int8_fn(c, i, q0, iq, isc):
        s, idx = blockwise_topk_int8(
            q0 + i * 1e-9, iq, isc, k, block_size=500_000, approx=True
        )
        return c + s[0, 0]

    dt_topk_int8 = timed_scan(
        topk_int8_fn, jnp.float32(0), max(reps // 2, 4), q0, iq, isc)
    _, i_i8 = blockwise_topk_int8(q0[:256], iq, isc, k, block_size=500_000)
    i_i8 = np.asarray(i_i8)
    int8_recall = float(np.mean(
        [len(set(i_i8[r]) & set(i_ex[r])) / k for r in range(i_ex.shape[0])]
    ))

    return {
        "mode": "chip",
        "platform": jax.devices()[0].platform,
        "table_rows": rows,
        "dim": dim,
        "table_gb": round(rows * dim * 4 / 2**30, 2),
        "lookup_batch": batch,
        "lookup_ids_per_s": round(batch / dt_lookup, 1),
        "lookup_ms": round(dt_lookup * 1e3, 3),
        "catalog_items": catalog,
        "topk_k": k,
        "topk_query_batch": q_batch,
        "topk_queries_per_s": round(q_batch / dt_topk, 1),
        "topk_ms": round(dt_topk * 1e3, 3),
        "topk_item_scores_per_s": round(q_batch * catalog / dt_topk, 1),
        "topk_approx_queries_per_s": round(q_batch / dt_topk_approx, 1),
        "topk_approx_ms": round(dt_topk_approx * 1e3, 3),
        "topk_approx_item_scores_per_s": round(
            q_batch * catalog / dt_topk_approx, 1),
        "topk_int8_queries_per_s": round(q_batch / dt_topk_int8, 1),
        "topk_int8_ms": round(dt_topk_int8 * 1e3, 3),
        "topk_int8_recall_at_k": round(int8_recall, 4),
        "catalog_int8_gb": round(catalog * (dim + 4) / 2**30, 2),
    }


def bench_mesh(rows: int, dim: int, batch: int, catalog: int, k: int,
               q_batch: int, reps: int, n_devices: int,
               lookup_only: bool = False) -> dict:
    _force_cpu_mesh(n_devices)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recsys_tpu.embed.table import (
        make_sharded_lookup_a2a, make_sharded_lookup_psum,
    )
    from recsys_tpu.ops.topk import make_ring_topk
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.retrieval.scorer import make_sharded_topk

    ctx = make_mesh(model_parallel=n_devices, devices=jax.devices()[:n_devices])
    rows_sh = NamedSharding(ctx.mesh, P(ctx.model_axis, None))
    rep = NamedSharding(ctx.mesh, P())

    assert rows % n_devices == 0
    # materialize the sharded table ON the mesh (host never holds it
    # whole) — a true 100M x dim table. Hashed-iota fill: RNG draws for
    # 1.6B elements dominate the bench setup on the CPU mesh and the
    # values are irrelevant to lookup/top-k throughput.
    print(f"[mesh] building {rows}x{dim} sharded table...",
          file=sys.stderr, flush=True)

    def hashed_fill(n_rows, c1, c2):
        def fill(_):
            i = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, dim), 0)
            j = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, dim), 1)
            h = (i * jnp.uint32(c1) + j * jnp.uint32(c2)) >> 9
            t = h.astype(jnp.float32) / jnp.float32(2**23) - 1.0
            return jax.lax.with_sharding_constraint(t, rows_sh)

        with ctx.mesh:
            return jax.jit(fill, out_shardings=rows_sh)(0)

    table = hashed_fill(rows, 2654435761, 40503)
    jax.block_until_ready(table)
    print("[mesh] table ready", file=sys.stderr, flush=True)

    ids0 = jax.device_put(
        np.random.default_rng(1).integers(0, rows, batch).astype(np.int32), rep
    )

    results = {}
    # 1) XLA-partitioned gather (the trainer's default row-sharded path)
    def xla_fn(c, i, table, ids0):
        emb = jnp.take(table, (ids0 + i) % rows, axis=0)
        return c + emb[0, 0]

    results["xla_partitioned"] = timed_scan(
        xla_fn, jnp.float32(0), reps, table, ids0)
    print("[mesh] xla_partitioned done", file=sys.stderr, flush=True)

    # 2) masked-gather + psum
    psum_lookup = make_sharded_lookup_psum(ctx)

    def psum_fn(c, i, table, ids0):
        emb = psum_lookup(table, (ids0 + i) % rows)
        return c + emb[0, 0]

    results["psum"] = timed_scan(psum_fn, jnp.float32(0), reps, table, ids0)
    print("[mesh] psum done", file=sys.stderr, flush=True)

    # 3) capacity-bucketed all-to-all
    cap = int(2.0 * batch / n_devices)
    a2a_lookup = make_sharded_lookup_a2a(ctx, capacity=cap)

    def a2a_fn(c, i, table, ids0):
        emb, overflow = a2a_lookup(table, (ids0 + i) % rows)
        return c + emb[0, 0] + overflow.astype(jnp.float32) * 0.0

    results["all_to_all"] = timed_scan(a2a_fn, jnp.float32(0), reps, table, ids0)
    print("[mesh] all_to_all done", file=sys.stderr, flush=True)

    base = {
        "mode": "mesh",
        "platform": jax.devices()[0].platform,
        "n_devices": n_devices,
        "table_rows": rows,
        "dim": dim,
        "table_gb": round(rows * dim * 4 / 2**30, 2),
        "rows_per_shard": rows // n_devices,
        "lookup_batch": batch,
        "a2a_capacity_per_shard": cap,
        "lookup_ids_per_s": {
            name: round(batch / dt, 1)
            for name, dt in results.items()
            if name in ("xla_partitioned", "psum", "all_to_all")
        },
        "lookup_ms": {
            name: round(dt * 1e3, 3)
            for name, dt in results.items()
            if name in ("xla_partitioned", "psum", "all_to_all")
        },
    }
    if lookup_only:
        # refresh only the lookup rows, merging over the section's
        # existing top-k rows (the catalog phase's 8-virtual-device
        # all-gather starves the 2-core host's collective rendezvous
        # under contention — the top-k paths are untouched by lookup
        # changes, so their committed rows stand) — but ONLY when this
        # run's shape matches the section the top-k rows were measured
        # on; otherwise inheriting them would re-label committed
        # numbers with a configuration they never ran at
        existing = {}
        if os.path.exists(RESULTS):
            with open(RESULTS) as f:
                existing = json.load(f).get("mesh", {})
        compat = all(
            existing.get(k) == base[k]
            for k in ("table_rows", "dim", "n_devices")
        )
        if not compat and existing:
            print("[mesh] --lookup_only shape differs from the "
                  "committed section; dropping its top-k rows instead "
                  "of mislabeling them", file=sys.stderr, flush=True)
            existing = {}
        merged = {**existing, **base}
        merged["lookup_refreshed_standalone"] = True
        return merged

    # sharded top-k over a row-sharded catalog. Built directly at
    # [catalog, dim] with the rows sharding — slicing the 100M-row
    # sharded table concentrates the slice on shard 0 and the reshard
    # dominates the whole bench (36 s for 800k rows measured).
    print("[mesh] building catalog...", file=sys.stderr, flush=True)

    catalog_emb = hashed_fill(catalog, 2246822519, 3266489917)
    jax.block_until_ready(catalog_emb)
    q0 = jax.device_put(
        np.random.default_rng(2).normal(size=(q_batch, dim)).astype(np.float32),
        rep,
    )
    sharded_topk = make_sharded_topk(ctx, k=k)

    def stk_fn(c, i, q0, catalog_emb):
        s, idx = sharded_topk(q0 + i * 1e-9, catalog_emb)
        return c + s[0, 0]

    results["sharded_topk"] = timed_scan(
        stk_fn, jnp.float32(0), max(reps // 4, 2), q0, catalog_emb)
    print("[mesh] sharded_topk done", file=sys.stderr, flush=True)

    ring_topk = make_ring_topk(ctx, k=k)

    def ring_fn(c, i, q0, catalog_emb):
        s, idx = ring_topk(q0 + i * 1e-9, catalog_emb)
        return c + s[0, 0]

    results["ring_topk"] = timed_scan(
        ring_fn, jnp.float32(0), max(reps // 4, 2), q0, catalog_emb)

    return {
        **base,
        "catalog_items": catalog,
        "topk_k": k,
        "topk_query_batch": q_batch,
        "topk_queries_per_s": {
            name: round(q_batch / results[name], 1)
            for name in ("sharded_topk", "ring_topk")
        },
    }


def bench_train(n_users: int, n_items: int, dim: int, batch: int,
                reps: int) -> dict:
    """Giant-table TRAIN step, sparse vs dense embedding updates
    (``TrainConfig.sparse_table_updates``) on the full multi-task model."""
    import jax
    import jax.numpy as jnp
    import functools

    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    batch_np = {
        "user_id": rng.integers(0, n_users, batch).astype(np.int32),
        "movie_id": rng.integers(0, n_items, batch).astype(np.int32),
        "rating": rng.uniform(1, 5, batch).astype(np.float32),
        "y_implicit": (rng.random(batch) > 0.4).astype(np.float32),
        "log_q": np.full(batch, -np.log(n_items), np.float32),
    }
    placed = {k: jax.device_put(v) for k, v in batch_np.items()}
    out = {}
    # adagrad sparse/dense (the original rows) + adam sparse/dense
    # (round 4: lazy-Adam makes the tuned Adam recipe viable on giant
    # tables — dense adam additionally pays 2 moment tensors of
    # full-table traffic per step)
    for opt_name, sparse in (("adagrad", True), ("adagrad", False),
                             ("adam", True), ("adam", False)):
        cfg = RecsysConfig(
            model=ModelConfig(embedding_dim=dim, mixed_precision=True,
                              dropout_rate=0.2),
            train=TrainConfig(batch_size=batch, epochs=1,
                              optimizer=opt_name,
                              sparse_table_updates=sparse,
                              donate_state=False),
            eval=EvalConfig(topk=(10,)),
        )
        ctx = make_mesh(model_parallel=1)
        tr = Trainer(cfg, output_dir="/tmp/scale_train", mesh_ctx=ctx)
        state = tr.init_state(n_users, n_items, seed=0)
        jax.block_until_ready(state.params["towers"]["user_table"])
        tr._state_for_shape = state
        step_fn = tr._step_core((1.3, 0.8), False)
        n = reps if sparse else max(reps // 5, 4)

        @functools.partial(jax.jit, donate_argnums=0)
        def rep(st):
            def body(s, _):
                s2, m = step_fn(s, dict(placed))
                return s2, m["loss"]
            s, ls = jax.lax.scan(body, st, jnp.arange(n))
            return s, ls[-1]

        s2, last = rep(state)
        _ = float(last)
        t0 = time.perf_counter()
        s2, last = rep(s2)
        _ = float(last)
        dt = (time.perf_counter() - t0) / n
        key = "sparse" if sparse else "dense"
        if opt_name != "adagrad":
            key = f"{opt_name}_{key}"
        out[f"step_ms_{key}"] = round(dt * 1e3, 3)
        out[f"examples_per_s_{key}"] = round(batch / dt, 1)
        del s2, state
    out.update({
        "mode": "train",
        "platform": jax.devices()[0].platform,
        "n_users": n_users,
        "n_items": n_items,
        "dim": dim,
        "tables_gb": round((n_users + n_items) * dim * 4 / 2**30, 2),
        "batch": batch,
        "speedup_sparse_vs_dense": round(
            out["step_ms_dense"] / out["step_ms_sparse"], 1),
        "speedup_adam_sparse_vs_dense": round(
            out["step_ms_adam_dense"] / out["step_ms_adam_sparse"], 1),
    })
    return out


def bench_a2a_overhead(rows: int, dim: int, batch: int,
                       reps: int) -> dict:
    """Single-chip cost of the a2a lookup's bucketing machinery
    (VERDICT r4 weak #5: it was never measured on hardware).

    The claim that capacity-bucketed all-to-all beats masked+psum on a
    real multi-chip mesh rests on DESIGN §3.1's bytes-moved model (the
    8-device CPU stand-in inverts the ranking — `scale.json` "mesh").
    The part that IS measurable on one chip: run the full production
    lookup bodies (`embed/table.py`) on a degenerate data=1 x model=1
    mesh of the real TPU, where both collectives are on-chip no-ops —
    what remains is each strategy's per-shard compute machinery:

    * plain     — `jnp.take` (the no-machinery floor)
    * psum      — masked local take + psum
    * a2a       — stable sort by owner + capacity binning + two
                  all-to-all reshapes + scatter-back (+ overflow count)

    `a2a_machinery_us` (a2a minus plain) is the fixed per-step tax the
    bucketing adds; DESIGN §3.1's bytes model then gives the shard
    count / batch size where the a2a's bandwidth advantage
    (capacity*D vs n_shards*B*D psum bytes) pays for it."""
    import jax
    import jax.numpy as jnp

    from recsys_tpu.embed.table import (
        a2a_capacity, make_sharded_lookup_a2a, make_sharded_lookup_psum,
    )
    from recsys_tpu.parallel.mesh import make_mesh

    ctx = make_mesh(model_parallel=1)
    key = jax.random.key(0, impl="rbg")
    table = jax.random.normal(key, (rows, dim), jnp.float32)
    jax.block_until_ready(table)
    ids0 = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, rows,
                              jnp.int32)
    out = {}

    def plain_fn(c, i, table, ids0):
        emb = jnp.take(table, (ids0 + i) % rows, axis=0)
        return c + emb[0, 0]

    out["plain_ms"] = round(
        timed_scan(plain_fn, jnp.float32(0), reps, table, ids0) * 1e3, 4)

    psum = make_sharded_lookup_psum(ctx)

    def psum_fn(c, i, table, ids0):
        emb = psum(table, (ids0 + i) % rows)
        return c + emb[0, 0]

    out["psum_ms"] = round(
        timed_scan(psum_fn, jnp.float32(0), reps, table, ids0) * 1e3, 4)

    for factor in (1.0, 2.0):
        cap = a2a_capacity(batch, ctx.n_model, factor)
        a2a = make_sharded_lookup_a2a(ctx, cap)

        def a2a_fn(c, i, table, ids0):
            emb, ovf = a2a(table, (ids0 + i) % rows)
            return c + emb[0, 0] + ovf.astype(jnp.float32)

        tag = str(factor).replace(".", "_")
        out[f"a2a_ms_cap{tag}"] = round(
            timed_scan(a2a_fn, jnp.float32(0), reps, table, ids0) * 1e3, 4)

    # the train-step-relevant cost: forward + the gather transpose
    # (scatter-add) backward, a2a vs plain
    cap = a2a_capacity(batch, ctx.n_model, 1.25)
    a2a = make_sharded_lookup_a2a(ctx, cap)

    def plain_grad_fn(c, i, table, ids0):
        ids = (ids0 + i) % rows
        g = jax.grad(lambda t: jnp.take(t, ids, axis=0).sum())(table)
        return c + g[0, 0]

    def a2a_grad_fn(c, i, table, ids0):
        ids = (ids0 + i) % rows
        g = jax.grad(lambda t: a2a(t, ids)[0].sum())(table)
        return c + g[0, 0]

    g_reps = max(reps // 2, 4)
    out["plain_fwdbwd_ms"] = round(
        timed_scan(plain_grad_fn, jnp.float32(0), g_reps, table, ids0)
        * 1e3, 4)
    out["a2a_fwdbwd_ms"] = round(
        timed_scan(a2a_grad_fn, jnp.float32(0), g_reps, table, ids0)
        * 1e3, 4)

    out.update({
        "mode": "a2a_overhead",
        "platform": jax.devices()[0].platform,
        "rows": rows, "dim": dim, "batch": batch,
        "a2a_machinery_us": round(
            (out["a2a_ms_cap1_0"] - out["plain_ms"]) * 1e3, 1),
        "a2a_machinery_fwdbwd_us": round(
            (out["a2a_fwdbwd_ms"] - out["plain_fwdbwd_ms"]) * 1e3, 1),
        "note": ("degenerate 1-device mesh: collectives are on-chip "
                 "no-ops; deltas vs plain isolate each strategy's "
                 "bucketing/masking compute. Cross-shard bytes ride "
                 "DESIGN §3.1's model."),
    })
    return out


def bench_train_streaming(dim: int, batch: int, reps: int) -> dict:
    """Streaming input path on the chip (VERDICT r4 item 1). The
    streaming path is the ONLY input path multi-host training can take
    (``trainer.py``: the device-resident path builds process-local
    arrays and is gated to ``process_count() == 1``), and before round
    5 its throughput had never been committed. Measures, at the
    flagship config (B=4096, dim 128, MovieLens-1M-scale bundle):

    * the cost split — host gather (Batcher + C++ ``gather_batch``),
      host->device transfer (device_put + readback barrier), and the
      compiled step alone (scan-timed, the headline basis);
    * end-to-end streaming examples/s at chunk K=1 (per-step, the old
      behavior) and the ``stream_chunk_steps`` coalescing ladder —
      the production loop's own ``_prefetch`` + prepare + dispatch.

    The reference's analogue is its tf.data feed
    (``src/trainer.py:113-117``); its measured CPU training throughput
    is 49,447 ex/s (``tf_reference_cpu.json``)."""
    import jax
    import jax.numpy as jnp

    from bench import get_bundle
    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.data.pipeline import Batcher
    from recsys_tpu.models import losses
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.parallel.sharding import shard_batch, shard_batch_chunk
    from recsys_tpu.train.trainer import Trainer, _prefetch

    _phase("loading flagship bundle")
    bundle = get_bundle(1_000_209)
    n_users = int(bundle["meta/n_users"])
    n_items = int(bundle["meta/n_movies"])
    pop = np.bincount(bundle["train/movie_id"], minlength=n_items).astype(np.float32)
    log_q = np.log(np.maximum(pop, 0.5) / len(bundle["train/movie_id"])).astype(np.float32)

    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=dim, mixed_precision=True),
        train=TrainConfig(batch_size=batch, epochs=1),
        eval=EvalConfig(topk=(10,)),
    )
    ctx = make_mesh(model_parallel=1)
    tr = Trainer(cfg, output_dir="/tmp/stream_bench", mesh_ctx=ctx)
    state = tr.init_state(n_users, n_items, seed=0)
    tr._state_for_shape = state
    class_weights = losses.balanced_class_weights(bundle["train/y_implicit"])

    batcher = Batcher(bundle, "train", batch, seed=0)

    def prepare(b):
        return {**b, "log_q": log_q[b["movie_id"]]}

    out = {}

    # ---- split leg 1: host gather only ------------------------------
    _phase("host gather")
    it = batcher.epoch(0)
    for _ in range(3):  # warm the page cache / native lib
        prepare(next(it))
    t0 = time.perf_counter()
    n_g = min(reps * 4, batcher.steps_per_epoch - 3)
    for _ in range(n_g):
        prepare(next(it))
    out["host_gather_ms_per_batch"] = round(
        (time.perf_counter() - t0) / n_g * 1e3, 3)

    # ---- split leg 2: host->device transfer (incl. dispatch +
    # readback barrier — over a remote-tunneled TPU the RPC round trip
    # IS the cost being measured) --------------------------------------
    _phase("transfer")
    bat = prepare(next(batcher.epoch(1)))
    placed = shard_batch(ctx, bat)
    _ = np.asarray(placed["user_id"][:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        placed = shard_batch(ctx, bat)
        _ = np.asarray(placed["user_id"][:1])  # force the round trip
    out["transfer_ms_per_batch"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3)
    out["batch_bytes"] = int(sum(np.asarray(v).nbytes for v in bat.values()))

    # ---- split leg 3: compiled step alone (scan-timed on staged
    # data — the device-resident headline's basis) --------------------
    _phase("step only")
    step_core = tr._step_core(class_weights, False)
    n_step_reps = max(reps * 4, 50)

    def body(s, i, b):
        s2, m = step_core(s, {k: v for k, v in b.items()})
        return s2, None

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def run_steps(st, b):
        def sbody(s, i):
            s2, m = step_core(s, b)
            return s2, m["loss"]
        s, ls = jax.lax.scan(sbody, st, jnp.arange(n_step_reps))
        return s, ls[-1]

    st2, last = run_steps(state, placed)
    _ = float(last)
    t0 = time.perf_counter()
    st2, last = run_steps(st2, placed)
    _ = float(last)
    out["step_only_ms"] = round(
        (time.perf_counter() - t0) / n_step_reps * 1e3, 3)
    del st2

    # ---- end-to-end streaming ladder --------------------------------
    state = tr.init_state(n_users, n_items, seed=0)
    tr._state_for_shape = state
    train_step = tr.make_train_step(class_weights, prepare(next(batcher.epoch(0))), False)

    import itertools

    def _epochs(start):
        return itertools.chain.from_iterable(
            batcher.epoch(e) for e in itertools.count(start))

    def run_stream_k1(st, n_batches, epoch0):
        def _prep(b):
            return shard_batch(ctx, prepare(b))
        n = 0
        metrics = None
        for pb in _prefetch(_epochs(epoch0), _prep):
            st, metrics = train_step(st, pb)
            n += 1
            if n >= n_batches:
                break
        _ = jax.device_get(metrics)  # completion barrier
        return st, n

    _phase("stream K=1 warm")
    state, _ = run_stream_k1(state, 3, 2)
    n_b = max(reps, 100)
    _phase(f"stream K=1 x{n_b}")
    t0 = time.perf_counter()
    state, n_done = run_stream_k1(state, n_b, 3)
    dt = time.perf_counter() - t0
    out["stream_k1_ms_per_step"] = round(dt / n_done * 1e3, 3)
    out["stream_k1_examples_per_s"] = round(n_done * batch / dt, 1)

    for K in (8, 32, 64, 128):
        train_chunk = tr.make_train_chunk(class_weights, prepare(next(batcher.epoch(0))), False, K)

        def _grouped(it):
            buf = []
            for b in it:
                buf.append(prepare(b))
                if len(buf) == K:
                    yield buf
                    buf = []

        def _prep_chunk(group):
            stacked = {k: np.stack([b[k] for b in group])
                       for k in group[0]}
            return shard_batch_chunk(ctx, stacked)

        def run_stream_chunk(st, n_chunks, epoch0):
            n = 0
            metrics = None
            for pc in _prefetch(_grouped(_epochs(epoch0)), _prep_chunk):
                st, metrics = train_chunk(st, pc)
                n += 1
                if n >= n_chunks:
                    break
            _ = jax.device_get(metrics)
            return st, n

        # split leg: stack + transfer + readback of one [K, B] chunk
        group = list(itertools.islice(_grouped(batcher.epoch(1)), 1))[0]
        pc = _prep_chunk(group)
        _ = np.asarray(pc["user_id"][0, :1])
        t0 = time.perf_counter()
        for _i in range(10):
            pc = _prep_chunk(group)
            _ = np.asarray(pc["user_id"][0, :1])
        out[f"chunk_k{K}_transfer_ms"] = round(
            (time.perf_counter() - t0) / 10 * 1e3, 3)

        _phase(f"stream K={K} warm")
        state, _ = run_stream_chunk(state, 2, 3)
        n_c = max(n_b // K, 8)
        _phase(f"stream K={K} x{n_c} chunks")
        t0 = time.perf_counter()
        state, n_done = run_stream_chunk(state, n_c, 5)
        dt = time.perf_counter() - t0
        out[f"stream_k{K}_ms_per_step"] = round(dt / (n_done * K) * 1e3, 3)
        out[f"stream_k{K}_examples_per_s"] = round(n_done * K * batch / dt, 1)

    out.update({
        "mode": "train_streaming",
        "platform": jax.devices()[0].platform,
        "n_users": n_users,
        "n_items": n_items,
        "dim": dim,
        "batch": batch,
        "steps_per_epoch": batcher.steps_per_epoch,
        "note": (
            "end-to-end streaming loop (production _prefetch + prepare "
            "+ dispatch); device-resident headline basis is step_only_ms"
        ),
    })
    return out


def bench_efficiency(n_devices: int, dim: int, batch_per_dev: int,
                     reps: int, n_users: int = 1_000_000,
                     n_items: int = 100_000) -> dict:
    """One-command scaling-efficiency harness (VERDICT r4 item 7;
    BASELINE north star: >=80% scaling efficiency at 8 chips).

    STRONG-scaling measurement of the flagship data-parallel train
    step: examples/s on a 1-device mesh vs an ``n_devices`` data-axis
    mesh at the SAME GLOBAL batch (the flagship B), on the same device
    type. ``efficiency = (exps_N / exps_1) / N``. Strong scaling is the
    right frame here because the retrieval loss uses global in-batch
    negatives: per-device work is B_local x B_global, so growing the
    global batch with N (weak scaling) grows total FLOPs ~N^2 and no
    hardware could score 100%.

    On this environment only the CPU stand-in can hold N>1 devices, so
    committed rows here are FUNCTIONAL evidence (labeled
    ``functional_only: true``); the day real multi-chip hardware is
    attached, ``python benchmarks/scale_bench.py --mode efficiency
    --n_devices 8`` is the whole procedure — commit the resulting row
    next to this one (docs/OPERATIONS.md "Scaling efficiency").
    """
    import jax

    if n_devices > len(jax.devices()):
        _force_cpu_mesh(n_devices)
        import jax  # noqa: F811 — backend swapped

    import functools

    import jax.numpy as jnp

    from recsys_tpu.config import (
        EvalConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    out = {}
    for n in (1, n_devices):
        batch = batch_per_dev  # global batch fixed: strong scaling
        batch_np = {
            "user_id": rng.integers(0, n_users, batch).astype(np.int32),
            "movie_id": rng.integers(0, n_items, batch).astype(np.int32),
            "rating": rng.uniform(1, 5, batch).astype(np.float32),
            "y_implicit": (rng.random(batch) > 0.4).astype(np.float32),
            "log_q": np.full(batch, -np.log(n_items), np.float32),
        }
        cfg = RecsysConfig(
            model=ModelConfig(embedding_dim=dim, mixed_precision=True,
                              dropout_rate=0.2),
            train=TrainConfig(batch_size=batch, epochs=1,
                              donate_state=False),
            eval=EvalConfig(topk=(10,)),
        )
        ctx = make_mesh(model_parallel=1, data_parallel=n,
                        devices=jax.devices()[:n])
        tr = Trainer(cfg, output_dir="/tmp/eff_bench", mesh_ctx=ctx)
        state = tr.init_state(n_users, n_items, seed=0)
        jax.block_until_ready(state.params["towers"]["user_table"])
        tr._state_for_shape = state
        from recsys_tpu.parallel.sharding import shard_batch

        placed = shard_batch(ctx, batch_np)
        step_fn = tr._step_core((1.3, 0.8), False)

        @functools.partial(jax.jit, donate_argnums=0)
        def rep(st, b):
            def body(s, _):
                s2, m = step_fn(s, dict(b))
                return s2, m["loss"]
            s, ls = jax.lax.scan(body, st, jnp.arange(reps))
            return s, ls[-1]

        _phase(f"devices={n}: compile + warm")
        s2, last = rep(state, placed)
        _ = float(last)
        t0 = time.perf_counter()
        s2, last = rep(s2, placed)
        _ = float(last)
        dt = (time.perf_counter() - t0) / reps
        out[f"step_ms_{n}dev"] = round(dt * 1e3, 3)
        out[f"examples_per_s_{n}dev"] = round(batch / dt, 1)
        _phase(f"devices={n}: {out[f'examples_per_s_{n}dev']:.0f} ex/s")
        del s2, state

    eff = out[f"examples_per_s_{n_devices}dev"] / (
        n_devices * out["examples_per_s_1dev"])  # speedup / N
    out.update({
        "mode": "efficiency",
        "platform": jax.devices()[0].platform,
        "functional_only": jax.devices()[0].platform != "tpu",
        "n_devices": n_devices,
        "global_batch": batch_per_dev,
        "dim": dim,
        "n_users": n_users,
        "n_items": n_items,
        "scaling_efficiency": round(eff, 4),
        "north_star": 0.80,
        "meets_north_star": bool(eff >= 0.80),
    })
    return out


def bench_mesh_train(n_users: int, n_items: int, dim: int, batch: int,
                     reps: int, strategies=None, mode: str = "mesh_train",
                     assert_clean: bool = False) -> dict:
    """Full multi-task TRAIN step over the (data x model) mesh with
    row-sharded tables, comparing the three lookup strategies INSIDE the
    gradient step (``MeshConfig.lookup_strategy``): the GSPMD-partitioned
    gather vs the explicit psum and all-to-all shard_map bodies. On the
    8-device CPU mesh this is a functional scale demonstration (the
    VERDICT r1 item-1 'a2a-backed steps on a sharded table'); on a real
    slice the same code path is the flagship multi-chip layout."""
    import functools

    import jax
    import jax.numpy as jnp

    from recsys_tpu.config import (
        EvalConfig, MeshConfig, ModelConfig, RecsysConfig, TrainConfig,
    )
    from recsys_tpu.parallel.mesh import make_mesh
    from recsys_tpu.parallel.sharding import shard_batch
    from recsys_tpu.train.trainer import Trainer

    n_devices = 8
    if len(jax.devices()) < n_devices:
        _force_cpu_mesh(n_devices)
        import jax  # noqa: F811 — re-import after backend swap

    rng = np.random.default_rng(0)
    batch_np = {
        "user_id": rng.integers(0, n_users, batch).astype(np.int32),
        "movie_id": rng.integers(0, n_items, batch).astype(np.int32),
        "rating": rng.uniform(1, 5, batch).astype(np.float32),
        "y_implicit": (rng.random(batch) > 0.4).astype(np.float32),
        "log_q": np.full(batch, -np.log(n_items), np.float32),
    }
    out = {}
    if strategies is None:
        strategies = (("xla", False), ("psum", False),
                      ("a2a", False), ("a2a", True))
    _phase(f"{mode}: tables {n_users:,}+{n_items:,} rows x dim {dim} "
           f"({(n_users + n_items) * dim * 4 / 2**30:.1f} GB fp32), "
           f"batch {batch}, strategies {strategies}")
    for strategy, sparse in strategies:
        ctx = make_mesh(model_parallel=2, devices=jax.devices()[:n_devices])
        cfg = RecsysConfig(
            model=ModelConfig(embedding_dim=dim, dropout_rate=0.0,
                              mixed_precision=False),
            # donate at the 100M scale: without donation the step keeps
            # input AND output state live — 2 x ~53 GB of replicated
            # sharded tables on the single-host CPU mesh stand-in, which
            # the OOM killer ends at 126 GB (measured, round 4). The
            # production trainer donates by default too.
            train=TrainConfig(batch_size=batch, epochs=1,
                              donate_state=assert_clean,
                              global_negatives=True,
                              sparse_table_updates=sparse),
            mesh=MeshConfig(model_axis=2, embedding_sharding="rows",
                            lookup_strategy=strategy),
            eval=EvalConfig(topk=(10,)),
        )
        tag = f"{strategy}_sparse" if sparse else strategy
        tr = Trainer(cfg, output_dir="/tmp/scale_mesh_train", mesh_ctx=ctx)
        _phase(f"[{tag}] init_state (sharded table init; slow on a CPU "
               "mesh — threefry over every table element)...")
        state = tr.init_state(n_users, n_items, seed=0)
        jax.block_until_ready(state.params)
        _phase(f"[{tag}] init done; compiling train step...")
        tr._state_for_shape = state
        step = tr.make_train_step(
            class_weights=(1.3, 0.8), example_batch=batch_np,
            use_explicit_negs=False,
        )
        placed = shard_batch(ctx, batch_np)
        state, metrics = step(state, placed)  # compile + first step
        jax.block_until_ready(state.params)
        _phase(f"[{tag}] compile + first step done; timing {reps} steps...")
        t0 = time.perf_counter()
        for r in range(reps):
            state, metrics = step(state, placed)
            if assert_clean:  # 100M mode: per-step liveness > async queueing
                jax.block_until_ready(metrics["loss"])
                _phase(f"[{tag}] step {r + 1}/{reps}")
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / reps
        out[f"step_ms_{tag}"] = round(dt * 1e3, 3)
        out[f"examples_per_s_{tag}"] = round(batch / dt, 1)
        loss = float(np.asarray(metrics["loss"]))
        out[f"loss_{tag}"] = round(loss, 5)
        if strategy == "a2a":
            overflow = float(np.asarray(metrics.get("lookup_overflow", 0.0)))
            out["lookup_overflow"] = overflow
        if assert_clean:
            # configs[4] end-to-end functional claim: the sharded-table
            # TRAIN step must be numerically healthy at full scale
            assert np.isfinite(loss), f"non-finite loss under {tag}"
            if strategy == "a2a":
                assert overflow == 0.0, (
                    f"a2a lookup overflowed ({overflow} ids/step) — raise "
                    "lookup_capacity_factor")
        del state
    out.update({
        "mode": mode,
        "platform": jax.devices()[0].platform,
        "mesh": "data=4 x model=2",
        "n_users": n_users,
        "n_items": n_items,
        "dim": dim,
        "batch": batch,
        "tables_gb": round((n_users + n_items) * dim * 4 / 2**30, 2),
        "wall_clock_s": round(time.perf_counter() - _T0, 1),
    })
    _phase(f"{mode} complete")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["chip", "mesh", "train", "mesh_train",
                                       "mesh_train_100m", "train_streaming",
                                       "efficiency", "a2a_overhead"],
                    required=True)
    ap.add_argument("--rows", type=int, default=0, help="table rows (0 = mode default)")
    ap.add_argument("--dim", type=int, default=0)
    ap.add_argument("--batch", type=int, default=1 << 20)
    ap.add_argument("--catalog", type=int, default=0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--q_batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--lookup_only", action="store_true",
                    help="mesh mode: refresh only the lookup-strategy "
                         "rows, merging over the section's committed "
                         "top-k rows (the catalog phase's collectives "
                         "can starve a contended 2-core host)")
    args = ap.parse_args()

    if args.mode == "chip":
        rows = args.rows or 16_000_000
        dim = args.dim or 128
        catalog = args.catalog or 8_000_000
        res = bench_chip(rows, dim, args.batch, catalog, args.k,
                         args.q_batch, args.reps)
    elif args.mode == "train":
        rows = args.rows or 4_000_000
        dim = args.dim or 64
        res = bench_train(rows, rows // 2, dim, min(args.batch, 4096),
                          max(args.reps, 100))
    elif args.mode == "train_streaming":
        res = bench_train_streaming(args.dim or 128, min(args.batch, 4096),
                                    max(args.reps, 20))
    elif args.mode == "a2a_overhead":
        res = bench_a2a_overhead(args.rows or 1_000_000, args.dim or 128,
                                 min(args.batch, 4096),
                                 max(args.reps, 50))
    elif args.mode == "efficiency":
        res = bench_efficiency(args.n_devices, args.dim or 128,
                               min(args.batch, 4096), max(args.reps, 20),
                               n_users=args.rows or 1_000_000,
                               n_items=(args.rows or 1_000_000) // 10)
    elif args.mode == "mesh_train":
        rows = args.rows or 4_000_000
        dim = args.dim or 32
        res = bench_mesh_train(rows, rows // 2, dim,
                               min(args.batch, 2048), args.reps)
    elif args.mode == "mesh_train_100m":
        # BASELINE.json configs[4] run END-TO-END, not piecewise
        # (VERDICT r2 item 5): a TRUE 100M-row user table (+10M items)
        # row-sharded over the model axis, trained with the production
        # large-table step (sparse touched-rows updates through the a2a
        # collective lookup). Wall-clock on the CPU stand-in is a
        # functional number; the asserts (finite loss, zero lookup
        # overflow) are the claim.
        rows = args.rows or 100_000_000
        dim = args.dim or 16
        res = bench_mesh_train(rows, 10_000_000, dim,
                               min(args.batch, 2048), max(args.reps, 2),
                               strategies=(("a2a", True),),
                               mode="mesh_train_100m", assert_clean=True)
    else:
        rows = args.rows or 100_000_000
        dim = args.dim or 16
        catalog = args.catalog or 8_000_000
        res = bench_mesh(rows, dim, args.batch, catalog, args.k,
                         args.q_batch, args.reps, args.n_devices,
                         lookup_only=args.lookup_only)

    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    existing = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    existing[res["mode"]] = res
    with open(RESULTS, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
