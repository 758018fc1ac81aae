"""Frozen, JSON-round-trippable configuration for the whole framework.

Capability parity with the reference's single ``ModelConfig`` dataclass
(``src/config.py:9-61``) plus the mesh/topology fields a multi-host TPU
build needs (reference has none — its only distribution knob is
``distributed_strategy`` at ``src/config.py:47``).

Deliberate resolutions of reference inconsistencies (SURVEY §5.6):

* ``implicit_threshold`` — the reference uses ``rating >= 4`` at
  preprocessing (``src/preprocessing.py:100``) but ``rating >= 3`` as a
  fallback inside the trainer (``src/trainer.py:106``). Here it is ONE
  config field, default 4.0, used everywhere.
* ``dropout_rate`` — plumbed but never applied in the reference
  (``src/models.py:18-29``). Here it is actually applied in the DCN deep
  MLP and tower MLPs during training.
* ``warmup_steps`` — dead in the reference (``src/config.py:30``);
  implemented here as linear LR warmup into the exponential decay.
* ``mixed_precision`` — a dead flag in the reference (``src/config.py:46``,
  the real switch lives in the CLI ``scripts/train.py:31-36``); here it
  selects bfloat16 compute for the towers/DCN (params stay fp32).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _freeze(value: Any) -> Any:
    if isinstance(value, list):
        return tuple(_freeze(v) for v in value)
    if isinstance(value, dict):
        return {k: _freeze(v) for k, v in value.items()}
    return value


@dataclass(frozen=True)
class ModelConfig:
    """Architecture knobs. Defaults follow the reference dataclass
    (``src/config.py:12-27``) rather than its CLI (which disagrees —
    SURVEY §5.6 records the mismatches)."""

    embedding_dim: int = 128
    user_tower_dims: Tuple[int, ...] = (256, 128, 64)
    item_tower_dims: Tuple[int, ...] = (256, 128, 64)
    cross_layers: int = 3
    dnn_dims: Tuple[int, ...] = (256, 128)
    dropout_rate: float = 0.2
    l2_reg: float = 1e-4
    # Multi-task loss weights (src/config.py:41-44)
    retrieval_weight: float = 1.0
    ctr_weight: float = 2.0
    rating_weight: float = 0.2
    # weight of the explicit-negatives softmax ADDED to the in-batch
    # loss when data.negative_sampling requests explicit negatives.
    # Swept in negatives_mined.json: at 1.0 index-mined negatives cost
    # -25..-35% recall@10 (false-negative pressure); the sweep's best
    # arm keeps this small
    explicit_negatives_weight: float = 1.0
    # bfloat16 compute in towers/DCN (params remain fp32)
    mixed_precision: bool = True
    # keep the in-batch-softmax [B, B] logits in bfloat16 (reductions
    # still accumulate f32). The step is HBM-bound on this matrix at
    # large B: measured on a v5e chip, 1.46x faster at B=16k (5.97 vs
    # 8.72 ms/step, and faster than the flash-CE Pallas kernel's 7.17)
    # but slightly SLOWER at B=4096 where the f32 pipeline still fits
    # the cache-resident fusion. "auto" (default) enables it at
    # B >= 8192; True/False force it.
    bf16_retrieval_logits: Any = "auto"
    # residual connection around each tower MLP (out = emb + MLP(emb)).
    # Design divergence from the reference (plain MLP, src/models.py:70-77):
    # lets the id embedding reach the score directly, which materially
    # speeds up factorization learning under in-batch softmax.
    tower_residual: bool = True
    # run the DCN cross stack through the fused Pallas kernel
    # (ops/pallas/dcn_cross.py). A REFERENCE kernel: across several
    # clean v5e reruns the fused kernel and XLA's own fusion of the
    # rank-1 recurrence are within run-to-run noise of each other
    # (winners flip at the ~0.1-0.3 ms level on ~1.4 ms shapes;
    # kernels_tpu.json "dcn" rows) — with no measured win, False keeps
    # the simpler path. Equivalence-tested vs XLA; interpret on CPU.
    use_pallas_dcn: bool = False
    # Retrieval-loss implementation policy ("auto" | True | False |
    # "chunked"; losses.resolve_retrieval_loss). The measured regime
    # map (v5e, dim 128 — kernels_tpu.json "train_step_flash", FULL
    # fwd+bwd+adagrad step, round 4 with the fused flash backward):
    # XLA wins at B=4k square (3.9 vs 4.2 ms); flash wins from 8k
    # candidates up (6.2 vs 6.6 at 8k, 22.1 vs 27.9 at 32k, 64.2 vs
    # 88.3 at 64k) and at B>=128k NO logits matrix fits 16 GB HBM at
    # any dtype — only flash runs (217.0 ms full step, 604k
    # examples/s with the fused backward admitted at 128k square;
    # kernel-level 3.33x over the chunked-scan XLA equivalent). The
    # round-4 kernel microbench agrees ("flash_ce" rows: flash
    # 1.9-44.7 ms vs bf16-XLA 2.2-64.8 across 8k-64k — the old
    # pre-fused-backward rows that ranked XLA ahead are superseded).
    # "auto" (default): on TPU,
    # flash from 8192 candidates; below, dense XLA. Off-TPU: dense XLA
    # while the bf16 logits fit retrieval_logits_cap_gb, chunked
    # lax.scan (losses.in_batch_softmax_chunked) above. The flash
    # kernel (ops/pallas/flash_ce.py) never materializes the logits
    # and composes with global_negatives via the rectangular
    # all-gathered-candidates form. True/False/"chunked" force a path
    # — with a trace-time warning when the forced path is in its
    # measured losing regime.
    # NOTE on numerics: the flash path's bf16 policy
    # (bf16_retrieval_logits="auto", n_cand >= 8192) casts the U/V
    # EMBEDDING operands to bfloat16 (all reductions stay fp32 inside
    # the kernel) — stronger than the XLA path's bf16, which only
    # holds the logits accumulator in bf16. Equivalence at that scale
    # is tested with bf16-appropriate tolerances
    # (tests/test_flash_ce.py::test_flash_bf16_auto_threshold).
    use_flash_ce: Any = "auto"
    # The materialization cap the "auto" policy keys on: the dense XLA
    # path is used while B_local * n_candidates bf16 bytes fit under
    # this. 8 GiB = the largest measured-working dense regime on a
    # 16 GiB v5e (B=64k square); lower it on smaller-HBM parts or to
    # force the non-materializing path earlier (tests use this).
    retrieval_logits_cap_gb: float = 8.0
    # Width of the engineered dense-feature vector concatenated into the
    # DCN ranking input (x0 = [user_emb | item_emb | dense]). 0 = ids
    # only (reference parity: its DataProcessor computes ~29 features
    # that never reach the model, SURVEY §7.3 "parity traps"). Set to
    # ``data.features.FeatureEngineer.n_features()`` to train the
    # ranking heads on the full engineered set; the fitted feature state
    # ships in the inference bundle so serving-time rerank sees the
    # exact training-time features (no train/serve skew).
    dense_features: int = 0
    # Retrieval softmax temperature: user embeddings are scaled by 1/T
    # inside the in-batch softmax only. T < 1 sharpens the training
    # distribution; rankings at serving are unaffected (uniform score
    # scale). 1.0 = reference parity (tfrs.tasks.Retrieval has none).
    softmax_temperature: float = 1.0
    # Ablation switches for the two retrieval-loss upgrades over the
    # reference's plain tfrs.tasks.Retrieval() (logq_correction is the
    # third, in TrainConfig): the learned per-item softmax bias column,
    # and -inf masking of accidental duplicate-item hits in the in-batch
    # candidates. Defaults on; turned off together (with logQ) they
    # reproduce the reference's exact loss — the quality-attribution
    # ablation BASELINE.md reports (VERDICT r2 item 2).
    use_item_bias: bool = True
    accidental_hit_mask: bool = True

    def __post_init__(self):
        object.__setattr__(self, "user_tower_dims", tuple(self.user_tower_dims))
        object.__setattr__(self, "item_tower_dims", tuple(self.item_tower_dims))
        object.__setattr__(self, "dnn_dims", tuple(self.dnn_dims))


@dataclass(frozen=True)
class DataConfig:
    """Data/preprocessing knobs (reference: ``src/preprocessing.py``,
    ``src/data_processing.py``)."""

    data_dir: str = "data/raw"
    processed_path: str = "data/processed/processed_data.npz"
    # rating >= implicit_threshold defines the positive CTR label
    implicit_threshold: float = 4.0
    # temporal split fractions (src/preprocessing.py:71-78)
    train_frac: float = 0.8
    val_frac: float = 0.1
    # negative sampling (src/config.py:33-40); note the reference trains
    # with in-batch negatives only — explicit sampling is a real option here
    # "mined" (round 5) = TRUE hard negatives from a trained index —
    # each user's top-scoring seen-filtered items re-sampled per step
    # (+ a uniform-random tail), the upgrade over the reference's
    # popularity-"hard" notion. Needs mined_from (a trained serving
    # bundle to mine with) or a caller-injected trainer.mined_table.
    # Two-phase recipe + measured ablation: benchmarks/negatives_mined.py.
    negative_sampling: str = "random"  # random | hard | mixed | mined
    num_hard_negatives: int = 5
    num_random_negatives: int = 10
    mined_from: str = ""  # serving-bundle dir to mine hard negatives from
    mined_pool_size: int = 50  # per-user mined pool M (sampled per step)
    # skip the index's top-N ranks when mining: rank-0 mining pushes
    # down the user's actual held-out next items (false negatives) —
    # measured -35% recall@10; skipping the head is the standard
    # mitigation (negatives_mined.json has the three-arm ablation)
    mined_skip_top: int = 10
    # synthetic generator (reference's ratings.dat is a stripped LFS blob)
    synthetic_num_ratings: int = 1_000_209
    synthetic_seed: int = 1

    def __post_init__(self):
        if self.negative_sampling not in ("random", "hard", "mixed", "mined"):
            raise ValueError(
                f"negative_sampling must be random|hard|mixed|mined, "
                f"got {self.negative_sampling!r}"
            )


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs (reference: ``src/config.py:28-32`` +
    optimizer wiring at ``src/trainer.py:157-163``)."""

    batch_size: int = 2048
    learning_rate: float = 1e-3
    # Separate LR for the ranking stack (DCN + rating/CTR heads); the
    # retrieval side (tables/towers) keeps learning_rate. The reference
    # declares this split (src/config.py:28-29) but compiles ONE
    # optimizer and never uses it — so the default here is None (single
    # LR, the behavior the reference actually ran); set e.g. 1e-4 to
    # activate the split (optimizer.ranking_lr_scale).
    learning_rate_ranking: Optional[float] = None
    epochs: int = 20
    warmup_steps: int = 0
    # ExponentialDecay(lr, decay_steps=1000, rate=0.96, staircase) parity
    lr_decay_steps: int = 1000
    lr_decay_rate: float = 0.96
    lr_staircase: bool = True
    clipnorm: float = 1.0
    optimizer: str = "adagrad"
    # EarlyStopping(patience=20, restore_best) parity (src/trainer.py:166)
    early_stop_patience: int = 20
    # what early stopping monitors: "val_loss" (reference parity,
    # src/trainer.py:166) or "val_recall@10" (better aligned with
    # retrieval quality — val loss can diverge from memorization while
    # masked recall still improves)
    early_stop_metric: str = "val_loss"
    # run a sampled retrieval eval every N epochs (0 = only at the end);
    # required when early_stop_metric is recall-based
    eval_every_epochs: int = 0
    # (the reference's tf.data shuffle(50000) buffer has no analogue
    # here: both data paths do a FULL permutation per epoch — strictly
    # better shuffling — so no buffer-size knob exists)
    seed: int = 42
    use_class_weights: bool = True  # balanced CTR class weights (src/trainer.py:139-146)
    # logQ sampling-bias correction for in-batch softmax (Yi et al. 2019;
    # TFRS candidate_sampling_probability analogue). The reference's plain
    # tfrs.tasks.Retrieval() omits it; it materially lifts top-k recall
    # against popularity-skewed ground truth.
    logq_correction: bool = True
    # Scope of the in-batch softmax negatives under data parallelism
    # (SURVEY §7.3 "per-replica vs global"). True (default) = candidates
    # span the GLOBAL batch — the natural jit/GSPMD semantics (the whole
    # [B, B] logits matrix is computed sharded) and the better-quality
    # option (B·n_data-1 negatives per positive). False = per-replica
    # [B_local, B_local] softmax, exact parity with the reference's
    # tfrs.tasks.Retrieval under MirroredStrategy
    # (/root/reference/src/models.py:116,137), run as an explicit
    # shard_map step. Irrelevant when the data axis has one device.
    global_negatives: bool = True
    # mid-epoch checkpoint cadence for the STREAMING data path (long
    # epochs over huge splits); 0 = per-epoch only. The device-resident
    # path compiles a whole epoch into one lax.scan call, so per-epoch
    # is its natural (and only) granularity.
    checkpoint_every_steps: int = 0
    keep_checkpoints: int = 3
    # background (async) checkpoint writes: the host snapshot is taken
    # synchronously, the disk write overlaps the next training steps,
    # and both backends commit atomically (see train/checkpoint.py).
    # Auto-disabled under multi-host (process_count > 1), where saves
    # stay synchronous.
    async_checkpoint: bool = True
    resume: bool = False
    log_every_steps: int = 50
    donate_state: bool = True
    # Device-resident data path: the whole train split lives on device
    # and an epoch is ONE compiled lax.scan (on-device shuffle + gather
    # per step). Removes all per-step host->device transfers — the
    # difference between ~13k and ~2.8M examples/s over a remote TPU
    # tunnel. Falls back to the streaming path when the split exceeds
    # device_data_limit_mb or when explicit negative sampling is on
    # (host-side sampler).
    device_resident_data: bool = True
    device_data_limit_mb: int = 2048
    profile: bool = False  # jax.profiler trace capture around a training window
    # Streaming-path transfer coalescing: stack K consecutive batches
    # into ONE [K, B, ...] host->device transfer and run the K train
    # steps in one compiled lax.scan dispatch. The streaming path is
    # the ONLY input path multi-host training can take
    # (device-resident is single-controller by construction), and its
    # per-step cost is dominated by dispatch+transfer latency, not
    # bandwidth — coalescing amortizes that latency over K steps.
    # 1 = per-step streaming (old behavior). Math is unchanged: the
    # scan applies the same per-step update in batch order (parity
    # tested in test_trainer.py). Measured split and the K sweep on
    # the v5e chip live in benchmarks/results/scale.json
    # "train_streaming" (flagship config, B=4096, dim 128).
    stream_chunk_steps: int = 32
    # Sparse embedding-table updates: gradients and adagrad updates
    # touch only the B rows a batch references (duplicates combined to
    # match dense scatter-add semantics exactly) instead of
    # materializing a dense [V, D] gradient + updating all V rows.
    # O(B·D) instead of O(V·D) per step — required at configs[4]-scale
    # tables (a dense step on a 16M x 128 table moves ~24 GB of HBM
    # traffic in the optimizer alone; measured 13.1x on a 6M-row-table
    # model). On tiny tables the sort/segment/scatter overhead loses
    # (~0.46 ms at B=4096), so "auto" (default) picks sparse only when
    # the tables exceed ~32M elements (the measured crossover on v5e).
    # With optimizer="adagrad" the sparse step is BIT-EXACT to the
    # dense one (adagrad has no per-step decay on untouched slots);
    # with optimizer="adam" it runs LAZY-Adam semantics (round 4,
    # optimizer.sparse_lazy_adam_combined — untouched rows keep
    # un-decayed moments and receive no momentum tail, TF-LazyAdam
    # parity; a documented divergence from dense Adam that makes the
    # tuned Adam recipe usable on giant tables). Ignored for the
    # explicit-negatives path. Values: "auto" | True | False.
    sparse_table_updates: Any = "auto"
    # Cross-batch negative cache (CBNS, Wang et al. 2021,
    # arXiv:2110.15154 — retrieved-paper technique): a FIFO of the last
    # N item embeddings (+ their ids and bias-logq corrections) from
    # previous steps is appended to the in-batch softmax candidate axis
    # as extra negatives — the N cached columns cost no tower compute
    # (reused, stop-gradient'd, slightly stale; the per-step FIFO
    # refresh pays one extra item-tower forward of the batch).
    # 0 = off (reference parity and the right default at the flagship
    # batch size). MEASURED, both regimes on this catalog
    # (benchmarks/results/negatives_cache.json): at B=4096 over 3,883
    # items every item is already a near-every-step in-batch negative
    # and the stale copies HURT (recall@10 ratio 0.946 at 4B cache /
    # 0.921 at 16B); at B=256 — the B << catalog regime CBNS targets,
    # where a step sees <7% of the catalog — a 16B cache HELPS +9.2%
    # (0.01251 -> 0.01366). Enable when your batch covers little of
    # your catalog.)
    # Must be a multiple of the global batch size. Composes with every
    # step family (round 5): the GSPMD step, the explicit a2a/psum
    # SPMD step with row-sharded tables (the giant-catalog regime CBNS
    # actually targets — trajectory-parity-tested in
    # test_negative_cache.py::test_cache_composes_with_spmd_a2a_step),
    # sparse touched-rows updates, and the non-materializing chunked
    # loss (cache columns ride the candidate scan). The one rejected
    # combination is per-replica negative scope (global_negatives=False
    # on a multi-device data axis): a shared global cache would
    # silently widen the deliberately-restricted candidate set.
    negative_cache: int = 0
    # jax_debug_nans: every jitted computation re-runs eagerly on NaN
    # so the faulting primitive is named (SURVEY §5.2)
    debug_nans: bool = False
    # graceful preemption (SURVEY §5.3): on SIGTERM/SIGUSR1 (the TPU-pod
    # maintenance warning) finish the running epoch, checkpoint, and
    # return {"preempted": True, ...}; --resume continues from there
    checkpoint_on_preemption: bool = True
    # every N epochs, checksum the nominally replicated params on every
    # data-axis device and raise on drift — the TPU-native analogue of
    # race detection (replica desync from a bad collective or RNG leak);
    # 0 = off (utils/debug.py)
    replication_check_every_epochs: int = 0
    # Dropout-mask PRNG: "rbg" uses the hardware RngBitGenerator
    # (threefry mask generation alone is ~45% of a B=4096 step on a
    # v5e chip; rbg recovers it — 0.93 -> 0.53 ms/step measured).
    # Still fully deterministic per (seed, step); set "threefry" for
    # the splittable crypto-strength stream.
    dropout_rng_impl: str = "rbg"


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh topology. Axes: ``data`` (batch/DP) × ``model``
    (embedding-row & item-catalog sharding). The reference's analogue is
    ``distributed_strategy`` (``src/config.py:47``) which only supports
    single-host mirrored DP."""

    data_axis: int = -1  # -1 = all remaining devices
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")
    # how embedding tables are laid out: replicated | rows
    embedding_sharding: str = "replicated"
    # How row-sharded tables are read inside the train step (only
    # meaningful with embedding_sharding="rows" and model_axis > 1):
    #   "xla"  — jnp.take under jit; XLA's SPMD partitioner emits the
    #            collective gather (zero code, good baseline),
    #   "psum" — explicit shard_map step: masked local gather + psum of
    #            [B, D] over the model axis (bandwidth-optimal small B),
    #   "a2a"  — explicit shard_map step: ids bucketed by owner shard
    #            into fixed-capacity bins (sortless counting-rank as
    #            of r5 — bucketing machinery measured at 40 µs/step
    #            fwd at B=4096, scale.json "a2a_overhead"), exchanged
    #            with lax.all_to_all, gathered locally, exchanged
    #            back — each id moves ONCE, the recommended choice for
    #            row-sharded production tables (DESIGN §3.1 crossover)
    #            (embed/table.py lookup bodies; equivalence-tested vs
    #            the replicated path in tests/test_trainer_spmd.py).
    lookup_strategy: str = "xla"
    # headroom factor sizing the fixed per-(shard->shard) bucket of the
    # a2a exchange: capacity = ceil(factor * B_local / n_shards)
    # (uniform ids fill 1/n_shards of each bucket; skew needs slack —
    # overflowing ids are served a zero row and counted in the step
    # metrics as "lookup_overflow")
    lookup_capacity_factor: float = 2.0

    def __post_init__(self):
        if self.embedding_sharding not in ("replicated", "rows"):
            raise ValueError(
                f"embedding_sharding must be replicated|rows, got {self.embedding_sharding!r}"
            )
        if self.lookup_strategy not in ("xla", "psum", "a2a"):
            raise ValueError(
                f"lookup_strategy must be xla|psum|a2a, got {self.lookup_strategy!r}"
            )


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation knobs (reference: ``src/trainer.py:195-219``,
    ``src/config.py:45``)."""

    topk: Tuple[int, ...] = (5, 10, 20, 50)
    # reference samples <=1000 val rows (src/trainer.py:200); 0 = full set
    eval_sample: int = 0
    eval_batch_size: int = 4096
    # score against items the user has already interacted with? The
    # reference does not filter seen items; keep parity by default.
    filter_seen: bool = False
    # "cosine" = L2-normalized dot (reference FAISS parity, SURVEY §3.4);
    # "dot" = raw dot + item bias — the principled ranking when training
    # with logQ correction (score estimates log P(item|user) directly).
    score_norm: str = "cosine"

    def __post_init__(self):
        object.__setattr__(self, "topk", tuple(self.topk))
        if self.score_norm not in ("cosine", "dot"):
            raise ValueError(f"score_norm must be cosine|dot, got {self.score_norm!r}")


@dataclass(frozen=True)
class RecsysConfig:
    """Top-level bundle, JSON round-trippable via :meth:`to_dict` /
    :meth:`from_dict` (parity with ``ModelConfig.to_dict``,
    ``src/config.py:59-61`` and the ``config.json`` artifact contract,
    ``src/trainer.py:233-234``)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    # ---- serialization -------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent, default=list)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "RecsysConfig":
        sections = {}
        for f in dataclasses.fields(cls):
            sub_cls = {
                "model": ModelConfig,
                "data": DataConfig,
                "train": TrainConfig,
                "mesh": MeshConfig,
                "eval": EvalConfig,
            }[f.name]
            sub = d.get(f.name, {})
            known = {sf.name for sf in dataclasses.fields(sub_cls)}
            kwargs = {k: _freeze(v) for k, v in sub.items() if k in known}
            sections[f.name] = sub_cls(**kwargs)
        return cls(**sections)

    @classmethod
    def from_json(cls, s: str) -> "RecsysConfig":
        return cls.from_dict(json.loads(s))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "RecsysConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    def replace(self, **sections: Any) -> "RecsysConfig":
        """Return a copy with whole sections or dotted overrides replaced.

        ``cfg.replace(model=cfg.model, **{"train.epochs": 5})`` style —
        dotted keys overlay individual fields (the CLI uses this)."""
        plain = {k: v for k, v in sections.items() if "." not in k}
        dotted = {k: v for k, v in sections.items() if "." in k}
        out = dataclasses.replace(self, **plain) if plain else self
        if dotted:
            d = out.to_dict()
            for key, value in dotted.items():
                sec, name = key.split(".", 1)
                if sec not in d or name not in d[sec]:
                    raise KeyError(f"unknown config field {key!r}")
                d[sec][name] = value
            out = RecsysConfig.from_dict(d)
        return out
