"""Loss library: in-batch sampled softmax, explicit sampled softmax,
weighted BCE, MSE, balanced class weights.

Parity with ``MultiTaskModel.compute_loss`` (``src/models.py:133-148``):
total = retrieval_weight * in_batch_softmax
      + rating_weight    * MSE(rating)
      + ctr_weight       * weighted_BCE(y_implicit)
with per-sample CTR class weights ``tf.where(y==1, w1, w0)``
(``src/models.py:139-145``) computed "balanced" the sklearn way
(``src/trainer.py:139-146``): w_c = n / (n_classes * n_c).
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# warn once per (setting, regime) pair — the loss is re-traced per
# shape/jit and warnings.warn's own dedup keys on source line only
_REGIME_WARNED: set = set()


# On-TPU full-train-step crossover (kernels_tpu.json
# "train_step_flash", v5e, dim 128, fwd+bwd+adagrad): XLA wins at
# B=4k square (4.00 vs 4.64 ms), flash wins from 8k up (6.33 vs 6.70
# at 8k, widening to 64.2 vs 88.4 at 64k; at 128k only flash runs).
_FLASH_MIN_CANDIDATES = 8192


def resolve_retrieval_loss(
    setting, b_local: int, n_candidates: int, platform: str,
    cap_gb: float = 8.0,
) -> str:
    """Pick the retrieval-loss implementation for the (static) shape
    regime: ``"xla"`` (dense [B, n_cand] logits — in_batch_softmax),
    ``"flash"`` (Pallas online-softmax kernel) or ``"chunked"``
    (lax.scan online-softmax — the non-TPU flash equivalent).

    ``setting`` is ``ModelConfig.use_flash_ce``: ``"auto"`` (default)
    encodes the measured regime map (kernels_tpu.json, v5e dim 128):

    * TPU: flash from ``_FLASH_MIN_CANDIDATES`` (=8k) candidates up —
      the FULL train step is faster there (1.06-1.38x through B=64k,
      and past ``cap_gb`` of bf16 logits it is the only path that
      runs at all); dense XLA below (flash's fixed kernel overhead
      loses at B=4k).
    * non-TPU: dense XLA while the bf16 logits fit ``cap_gb``, the
      chunked scan above (flash's non-TPU fallbacks materialize).

    True/False/"chunked" force a path, with a trace-time warning when
    the forced path is in its measured losing regime.
    """
    logits_gb = b_local * n_candidates * 2 / 2**30  # bf16 footprint
    fits = logits_gb <= cap_gb
    flash_wins = platform == "tpu" and n_candidates >= _FLASH_MIN_CANDIDATES

    def _warn(msg):
        key = (repr(setting), fits, flash_wins, platform)
        if key not in _REGIME_WARNED:
            _REGIME_WARNED.add(key)
            warnings.warn(msg, stacklevel=3)

    if setting is True:
        if fits and not flash_wins:
            _warn(
                f"use_flash_ce=True at [{b_local}, {n_candidates}] "
                "logits: the dense XLA path is measured faster below "
                f"{_FLASH_MIN_CANDIDATES} candidates (kernels_tpu.json "
                "train_step_flash: 4.00 vs 4.64 ms full step at B=4k) — "
                "use_flash_ce='auto' picks the winner per shape.")
        return "flash"
    if setting == "chunked":
        return "chunked"
    if setting is False:
        if not fits:
            _warn(
                f"use_flash_ce=False with a [{b_local}, {n_candidates}] "
                f"logits matrix ({logits_gb:.1f} GB bf16 > cap {cap_gb} "
                "GB): the dense XLA path materializes this in HBM and is "
                "expected to OOM (kernels_tpu.json: B=128k square OOMs at "
                "every dtype on 16 GB) — use_flash_ce='auto' would take "
                "the non-materializing path.")
        elif flash_wins:
            _warn(
                f"use_flash_ce=False at [{b_local}, {n_candidates}] "
                "logits on TPU: the flash kernel is measured faster for "
                f"the full train step from {_FLASH_MIN_CANDIDATES} "
                "candidates up (kernels_tpu.json train_step_flash; e.g. "
                "22.3 vs 27.9 ms at B=32k) — use_flash_ce='auto' would "
                "take it.")
        return "xla"
    # "auto"
    if flash_wins:
        return "flash"
    if fits:
        return "xla"
    return "flash" if platform == "tpu" else "chunked"


def in_batch_softmax(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    item_ids: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    mask: Optional[jnp.ndarray] = None,
    log_q: Optional[jnp.ndarray] = None,
    item_bias: Optional[jnp.ndarray] = None,
    logits_dtype=None,
    extra_candidates=None,
) -> jnp.ndarray:
    """In-batch sampled-softmax retrieval loss.

    The jittable equivalent of ``tfrs.tasks.Retrieval`` used at
    ``src/models.py:116,137``: logits = U @ V^T over the batch, label =
    the diagonal. With ``axis_name`` set, negatives come from the
    **global** batch (item embeddings all-gathered over the data axis —
    cross-batch negatives, the per-replica/global choice of SURVEY §7.3).
    ``item_ids`` enables accidental-hit masking (duplicate items in the
    batch scored as negatives get -inf, except the true column).

    ``log_q`` ([B], the log sampling probability of each in-batch
    candidate, i.e. its empirical train frequency) enables the logQ
    sampling-bias correction of sampled softmax (Yi et al. 2019;
    also what TFRS does when given ``candidate_sampling_probability``):
    corrected logits = logits - log_q, so the model learns the true
    conditional P(item|user) instead of the popularity-debiased ratio
    P(item|user)/P(item). Without it, top-k against a popularity-skewed
    ground truth is systematically handicapped.

    ``extra_candidates``: optional ``(emb [N, D], ids [N], corr [N])``
    of ADDITIONAL negative columns appended to the candidate axis —
    the cross-batch negative cache of CBNS (Wang et al. 2021,
    arXiv:2110.15154): embeddings of recent batches' items reused as
    negatives at zero tower cost. ``corr`` is their column correction
    (item_bias - log_q at cache time; -1e9 marks empty slots, which
    then contribute exp(-inf)=0 to the softmax). Cached copies of a
    row's positive item are excluded by the accidental-hit mask (their
    ids match ``item_ids``), so requires ``item_ids`` when masking is
    wanted. Positives always live in the first (in-batch) segment.
    """
    b = user_emb.shape[0]
    if axis_name is None:
        candidates, cand_ids, cand_logq, cand_bias, diag = (
            item_emb, item_ids, log_q, item_bias, jnp.arange(b)
        )
    else:
        candidates = lax.all_gather(item_emb, axis_name, axis=0, tiled=True)
        cand_ids = (
            lax.all_gather(item_ids, axis_name, axis=0, tiled=True)
            if item_ids is not None else None
        )
        cand_logq = (
            lax.all_gather(log_q, axis_name, axis=0, tiled=True)
            if log_q is not None else None
        )
        cand_bias = (
            lax.all_gather(item_bias, axis_name, axis=0, tiled=True)
            if item_bias is not None else None
        )
        diag = jnp.arange(b) + lax.axis_index(axis_name) * b
    if extra_candidates is not None:
        x_emb, x_ids, x_corr = extra_candidates
        # fold the batch block's separate bias/logq columns and the
        # cache block's combined corr into ONE correction vector
        base_corr = jnp.zeros((candidates.shape[0],), jnp.float32)
        if cand_bias is not None:
            base_corr = base_corr + cand_bias
        if cand_logq is not None:
            base_corr = base_corr - cand_logq
        corr_full = jnp.concatenate([base_corr, x_corr.astype(jnp.float32)])
        candidates = jnp.concatenate(
            [candidates, lax.stop_gradient(x_emb).astype(candidates.dtype)]
        )
        if cand_ids is not None:
            cand_ids = jnp.concatenate([cand_ids, x_ids])
        cand_bias, cand_logq = corr_full, None  # single fused column add
    # logits_dtype=bfloat16 halves the HBM traffic of the [B, B] matrix
    # (the train-step bottleneck at B=4096: the step is memory-bound on
    # these logits, not MXU-bound); reductions still accumulate in f32
    acc_t = logits_dtype or jnp.float32
    logits = jnp.dot(user_emb, candidates.T, preferred_element_type=acc_t)
    if cand_bias is not None:
        logits = logits + cand_bias.astype(acc_t)[None, :]
    if cand_logq is not None:
        logits = logits - cand_logq.astype(acc_t)[None, :]
    if cand_ids is not None and item_ids is not None:
        # accidental-hit masking without materializing a one-hot label
        # matrix (a [B, B] fp32 one_hot is ~1 GB of HBM traffic at
        # B=16k): duplicate-item columns are -inf'd except the column
        # that IS the row's positive.
        dup = item_ids[:, None] == cand_ids[None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        accidental = dup & (col != diag[:, None])
        logits = jnp.where(accidental, -1e9, logits)
    # CE against the diagonal label: logsumexp - positive logit (no
    # one_hot / labels multiply). The positive logit is recomputed as a
    # row-wise dot instead of take_along_axis(logits, diag): the gather
    # (and its scatter transpose in backward) each re-traverse the
    # [B, B] matrix — 42 us/step at B=4096 on a v5e chip vs ~3 us for
    # the [B, d] multiply-reduce. Gradients are identical (pos IS
    # logits[i, diag[i]] mathematically).
    pos = jnp.sum(
        user_emb.astype(jnp.float32) * item_emb.astype(jnp.float32), axis=-1
    )
    if item_bias is not None:
        pos = pos + item_bias
    if log_q is not None:
        pos = pos - log_q
    if logits.dtype == jnp.bfloat16:
        # hand-rolled logsumexp: the subtract/exp read bf16 and fuse
        # into an f32-accumulating reduction — no f32 [B, B] ever
        # materializes in HBM
        m = jnp.max(logits, axis=-1)
        s = jnp.sum(
            jnp.exp((logits - m[:, None]).astype(jnp.float32)),
            axis=-1, dtype=jnp.float32,
        )
        lse = jnp.log(s) + m.astype(jnp.float32)
    else:
        lse = jax.nn.logsumexp(logits, axis=-1)
    ce = lse - pos
    if mask is not None:
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(ce)


def in_batch_softmax_chunked(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    item_ids: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    mask: Optional[jnp.ndarray] = None,
    log_q: Optional[jnp.ndarray] = None,
    item_bias: Optional[jnp.ndarray] = None,
    chunk_size: int = 4096,
    extra_candidates=None,
) -> jnp.ndarray:
    """Flash-style in-batch softmax CE: candidates are scanned in
    chunks with an online logsumexp, so the [B, n_cand] logits matrix
    is never materialized in HBM (at B=16k that matrix is ~1 GB fp32
    and dominates the step time). The chunk body is
    ``jax.checkpoint``-ed: the backward pass recomputes per-chunk
    logits instead of saving them — the same compute/memory trade as
    flash attention.

    This is the production non-materializing path on NON-TPU backends
    (the ``"auto"`` retrieval-loss policy routes here when the logits
    matrix is over the materialization cap and there is no Pallas
    flash kernel — VERDICT r3 item 3); on TPU the flash kernel beats
    it 1.49x at B=128k (kernels_tpu.json).

    Semantics identical to :func:`in_batch_softmax` incl. the global-
    negatives scope: with ``axis_name`` set (inside shard_map), the
    candidate set is the item block all-gathered over that axis and
    the positive column of local row i is ``axis_index * B + i``.
    LogQ correction, item bias and accidental-hit masking all apply.

    ``extra_candidates`` ((emb [N, D], ids [N], corr [N]) — the CBNS
    cache, same contract as :func:`in_batch_softmax`) appends N extra
    negative columns AFTER the in-batch block; they are padded to a
    chunk multiple with corr=-1e9 empty slots (exp(-inf)=0), so the
    cache composes with the non-materializing path — the memory-bound
    regime that motivates CBNS in the first place.
    """
    b, d = user_emb.shape

    col_corr = jnp.zeros((b,), jnp.float32)
    if item_bias is not None:
        col_corr = col_corr + item_bias
    if log_q is not None:
        col_corr = col_corr - log_q

    if axis_name is None:
        candidates, cand_ids, cand_corr = item_emb, item_ids, col_corr
        diag = jnp.arange(b)
    else:
        candidates = lax.all_gather(item_emb, axis_name, axis=0, tiled=True)
        cand_ids = (
            lax.all_gather(item_ids, axis_name, axis=0, tiled=True)
            if item_ids is not None else None
        )
        cand_corr = lax.all_gather(col_corr, axis_name, axis=0, tiled=True)
        diag = jnp.arange(b) + lax.axis_index(axis_name) * b

    if extra_candidates is not None:
        x_emb, x_ids, x_corr = extra_candidates
        n_x = x_emb.shape[0]
        total = candidates.shape[0] + n_x
        pad = (-total) % min(chunk_size, total)
        candidates = jnp.concatenate([
            candidates, x_emb.astype(candidates.dtype),
            jnp.zeros((pad, d), candidates.dtype)])
        cand_corr = jnp.concatenate([
            cand_corr, x_corr.astype(jnp.float32),
            jnp.full((pad,), -1e9, jnp.float32)])
        if cand_ids is not None:
            # pad ids with -1: never equal to a real (>=0) item id —
            # padded columns are excluded by their -1e9 corr alone
            cand_ids = jnp.concatenate([
                cand_ids, x_ids, jnp.full((pad,), -1, x_ids.dtype)])

    n_cand = candidates.shape[0]
    chunk_size = min(chunk_size, n_cand)
    assert n_cand % chunk_size == 0, (n_cand, chunk_size)
    n_chunks = n_cand // chunk_size

    v_chunks = candidates.reshape(n_chunks, chunk_size, d)
    corr_chunks = cand_corr.reshape(n_chunks, chunk_size)
    ids_chunks = (
        cand_ids.reshape(n_chunks, chunk_size) if cand_ids is not None else
        jnp.zeros((n_chunks, chunk_size), jnp.int32)
    )

    @jax.checkpoint
    def chunk_fn(carry, inp):
        lse = carry
        c_idx, v_c, corr_c, ids_c = inp
        s = jnp.dot(user_emb, v_c.T, preferred_element_type=jnp.float32)
        s = s + corr_c[None, :]
        col = c_idx * chunk_size + jnp.arange(chunk_size)
        if item_ids is not None:
            # duplicate-item columns are -inf'd except the row's own
            # positive column (which stays in the logsumexp)
            dup = item_ids[:, None] == ids_c[None, :]
            accidental = dup & (col[None, :] != diag[:, None])
            s = jnp.where(accidental, -1e9, s)
        return jnp.logaddexp(lse, jax.nn.logsumexp(s, axis=-1)), None

    init_lse = jnp.full((b,), -jnp.inf)
    if axis_name is not None:
        # under a check_vma shard_map the body's output carry varies
        # over the mesh axis (it mixes in the gathered candidates);
        # the constant init must be declared varying too
        init_lse = jax.lax.pcast(init_lse, axis_name, to="varying")
    lse, _ = jax.lax.scan(
        chunk_fn, init_lse,
        (jnp.arange(n_chunks), v_chunks, corr_chunks, ids_chunks),
    )
    # the positive logit as a row-wise dot instead of a per-chunk
    # take_along_axis — mathematically pos IS logits[i, diag[i]]
    # (incl. the corrections), same trick as in_batch_softmax
    pos = jnp.sum(
        user_emb.astype(jnp.float32) * item_emb.astype(jnp.float32), axis=-1
    ) + col_corr
    ce = lse - pos
    if mask is not None:
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(ce)


def sampled_softmax_explicit(
    user_emb: jnp.ndarray,
    pos_item_emb: jnp.ndarray,
    neg_item_embs: jnp.ndarray,
) -> jnp.ndarray:
    """Explicit-negatives retrieval loss: softmax over [pos | K negs]
    per row. The trained counterpart of the reference's never-invoked
    ``NegativeSampler`` path (``src/data_processing.py:282-337``)."""
    pos = jnp.sum(user_emb * pos_item_emb, axis=-1, keepdims=True)
    neg = jnp.einsum("bd,bkd->bk", user_emb, neg_item_embs)
    logits = jnp.concatenate([pos, neg], axis=-1)
    return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[:, 0])


def mse(pred: jnp.ndarray, target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    sq = jnp.square(pred - target)
    if mask is not None:
        return jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(sq)


def weighted_bce_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    pos_weight: float = 1.0,
    neg_weight: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Per-sample class-weighted sigmoid cross-entropy (numerically
    stable on logits — the reference applies BCE on post-sigmoid
    probabilities, ``src/models.py:120,143``).

    Normalization is by the weight sum (a weighted mean). Under an
    explicit shard_map step that normalization must span the GLOBAL
    batch — per-shard pos/neg mixes differ, so a pmean of per-shard
    weighted means is a slightly different objective than the GSPMD
    full-batch loss. ``axis_name`` makes the denominator the pmean'd
    weight sum: pmean over shards of the returned value then equals
    the exact global weighted mean, and since the weights depend only
    on labels (not params) the trainer's pmean-of-grads stays the
    exact gradient."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    w = jnp.where(labels >= 0.5, pos_weight, neg_weight)
    if mask is not None:
        w = w * mask
    w_sum = jnp.sum(w)
    if axis_name is not None:
        w_sum = lax.pmean(w_sum, axis_name)
    return jnp.sum(per * w) / jnp.maximum(w_sum, 1e-6)


def balanced_class_weights(y: jnp.ndarray) -> Tuple[float, float]:
    """sklearn ``compute_class_weight('balanced')`` parity
    (``src/trainer.py:140-144``): w_c = n / (2 * n_c). Host-side numpy
    is fine — runs once per training job."""
    import numpy as np

    y = np.asarray(y)
    n = len(y)
    n_pos = max(float((y >= 0.5).sum()), 1.0)
    n_neg = max(float(n - n_pos), 1.0)
    return n / (2.0 * n_pos), n / (2.0 * n_neg)


def auc(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """ROC-AUC via the rank-sum (Mann-Whitney) statistic — jittable,
    O(n log n). Required by BASELINE.json; absent from the reference."""
    order = jnp.argsort(scores)
    ranks = jnp.empty_like(scores).at[order].set(
        jnp.arange(1, scores.shape[0] + 1, dtype=scores.dtype)
    )
    pos = labels >= 0.5
    n_pos = jnp.sum(pos)
    n_neg = scores.shape[0] - n_pos
    rank_sum = jnp.sum(jnp.where(pos, ranks, 0.0))
    a = (rank_sum - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos == 0) | (n_neg == 0), 0.5, a)
