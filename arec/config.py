"""Config system — the rebuild of the reference's per-script `tf.app.flags`.

The reference defines dozens of flags per run script (SURVEY.md §5 "Config /
flag system"); here the canonical set is one frozen dataclass per concern,
serialized alongside checkpoints, with CLI overrides (see arec/cli/).

The 5 graded configs of BASELINE.json:6-12 are checked in under configs/.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection + vocabulary policy (ref flags: --dataset, --raw_data,
    --data_dir, --item_vocab_size, --vocab_min_thresh, --user_sample)."""

    dataset: str = "synthetic"  # {synthetic, ml1m, xing}
    raw_dir: str = ""           # directory with raw CSV dumps
    data_dir: str = "_data"     # prepared-artifact cache
    item_vocab_size: int = 0    # 0 = unlimited; else truncate to top-N by freq
    vocab_min_thresh: int = 2   # min occurrences before an attr value gets an id
    user_sample: float = 1.0    # subsample fraction of users
    min_timestamp: int = 0      # drop interactions before this time (the
                                # ref's --after40-style temporal filter)
    # synthetic generator knobs (test/bench only)
    syn_users: int = 2000
    syn_items: int = 1500
    syn_interactions: int = 60000
    syn_seed: int = 0
    syn_mulhot_degree: int = 0  # >0 → the VECTORIZED big-cardinality
                                # generator (XING-true-scale rehearsals:
                                # per-entity Python loops cost minutes at
                                # U=1.5M) with ~this mean mulhot degree on
                                # both sides; 0 = legacy small generator
                                # (bit-identical to round-1/2 datasets)
    syn_tag_vocab: int = 0      # mulhot tag vocab for the big generator
                                # (0 → 4096; pick > dense_vocab_threshold
                                # so the gather/exchange path is exercised)


@dataclass(frozen=True)
class ModelConfig:
    """Model family + architecture (ref flags: --size, --num_layers, --L,
    --use_concat, --nonlinear, --keep_prob)."""

    model: str = "mf"           # {mf, lstm}
    dim: int = 64               # embedding size (ref: --size)
    use_attributes: bool = True # False → ID-only embeddings (configs 1 & 3)
    fusion: str = "concat"      # {concat, sum} (ref: --use_concat)
    nonlinear: bool = False     # extra tanh MLP layer inside fusion
    keep_prob: float = 1.0      # dropout keep probability
    # sequence model only
    cell: str = "lstm"          # {lstm, gru}
    num_layers: int = 1
    max_seq_len: int = 30       # ref: --L; scan segment length
    train_segments: int = 1     # history length trained per example =
                                # train_segments · max_seq_len: the scan runs
                                # in carried-(h,c) segments of max_seq_len
                                # with per-segment rematerialization, so
                                # activation memory stays O(B·max_seq_len)
                                # (SURVEY.md §5 "Long-context": temporal
                                # pipelining, not SP). 1 = reference behavior.
    use_pallas_scan: bool = True  # Pallas fused-gate scan vs lax.scan reference
    concat_user: bool = False   # prepend/add user embedding to each seq input
    tie_output: bool = False    # reuse fused item encoder as the output table
    dense_vocab_threshold: int = 512  # fields with vocab ≤ this use the
                                # multihot-matmul (MXU) lookup fast path


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + schedule (ref flags: --batch_size, --learning_rate,
    --learning_rate_decay_factor, --n_epoch, --steps_per_checkpoint, --loss,
    --num_sampled)."""

    batch_size: int = 64        # GLOBAL batch size (split across data shards)
    learning_rate: float = 0.1
    lr_decay: float = 0.95      # applied on valid-loss plateau
    optimizer: str = "adagrad"  # {adagrad, sgd, adam}
    n_epoch: int = 10
    steps_per_checkpoint: int = 200
    save_every_evals: int = 1   # save a checkpoint on every Nth periodic
                                # eval event (steps_per_checkpoint sets the
                                # EVAL cadence; the reference coupled eval
                                # and save — tf.train.Saver every
                                # --steps_per_checkpoint). >1 decouples
                                # them: at XING scale one save costs
                                # 90–200 s over the tunnel (BASELINE.md
                                # round 4) while one approx eval costs
                                # ~10 s, so dense Recall curves need not
                                # pay a save per point. The final
                                # checkpoint is always written; resume
                                # simply restarts from the last SAVED
                                # eval point (exact, as before).
    loss: str = "ce"            # {ce, warp, bpr, mw, bbpr}; lstm: {ce, mce}
    num_sampled: int = 256      # negatives per step (shared across batch)
    sampler: str = "log_uniform"  # {log_uniform, uniform, pop} negative
                                # sampler; "pop" = empirical popularity^α
                                # over train item counts (TF1
                                # fixed_unigram_candidate_sampler analog).
                                # Applies to every sampled-negative loss
                                # (ce, warp, bpr — asserted by
                                # tests/test_losses.py sampler-honored
                                # test); mw/bbpr use in-batch positives as
                                # negatives and draw nothing, so this knob
                                # does not apply to them.
    sampler_power: float = 1.0  # α distortion for sampler="pop"
    batch_ht: bool = False      # loss=mw|bbpr only: Horvitz–Thompson-
                                # correct the in-batch proposal (batch
                                # positives are popularity-distributed, not
                                # uniform — the same bias the round-4 WARP
                                # fix closed for sampled losses). Default
                                # off = AAAI'18 paper-faithful estimator;
                                # see losses.py _ht_weights + BASELINE.md
                                # round-4 anchors. No effect on other
                                # losses.
    seed: int = 0
    eval_topk: int = 30         # Recall@30 is the graded metric (BASELINE.json:2)
    eval_batch_size: int = 256  # rows per eval dispatch. Round-4 A/B at
                                # V=1.3M (tools/ab_eval_serve.py,
                                # interleaved): 2121/2161/2196 users/s at
                                # 256/1024/2048 — exact eval is
                                # score+top_k-bound, NOT dispatch-bound, so
                                # batch size is a ~3% knob; the real eval
                                # cost lever is eval_recall_target (~17x).
    eval_max_batches: int = 0   # 0 = sweep every held-out row; else cap the
                                # periodic eval to this many batches per
                                # host (a uniform strided subsample — the
                                # final/reported eval should use 0)
    eval_recall_target: float = 1.0  # <1 opts periodic eval into the
                                # approx_max_k selection (~17× at V=1.3M,
                                # measured); the graded metric stays at the
                                # exact default. Round-5 correction of the
                                # earlier bit-identity claim: on CONVERGED
                                # V=1.3M checkpoints the 0.95-target
                                # top-30 overlaps exact by ~94% (0.2% of
                                # score mass) and the measured Recall@30
                                # under-read is ~1% relative — report
                                # converged metrics via the
                                # exact-subsample confirm protocol
                                # (tools/eval_ckpt.py; BASELINE.md
                                # round-5 agreement section)
    serve_score_mem_mb: int = 512  # serving-path score-chunk memory budget
                                # (retrieval re-reads the item matrix once
                                # per query chunk, so a bigger budget cuts
                                # passes: 2048 measured +20% approx qps at
                                # V=1.3M over f32 latents — BASELINE.md
                                # round 3 — and +14% over the round-4
                                # bf16-at-rest default (49.7k→56.9k,
                                # tools/ab_eval_serve.py --score-mem);
                                # raise it when serving HBM headroom allows)
    serve_recall_target: float = 1.0  # recommend-mode selection: 1.0 = exact
                                # top-k; <1 = approx_max_k serving mode
                                # (~10x qps at V=300k, ~25x at V=1.3M).
                                # Measured on converged V=1.3M params
                                # (round 5): ~94% top-30 overlap with
                                # exact, 0.19% mean score-mass gap, and
                                # the dial QUANTIZES (0.95/0.98/0.99
                                # identical at that shape) — the choice
                                # is effectively binary. Training eval is
                                # always exact regardless.
    serve_latents_dtype: str = "compute"  # {compute, float32} residency of
                                # the eval/serving all-item latent matrix.
                                # "compute" pre-casts it to compute_dtype
                                # once per evaluate()/recommend()/
                                # Recommender startup — scoring is BIT-
                                # IDENTICAL (the top-k sweep already casts
                                # to compute_dtype inside the jit; this
                                # only moves the cast out of the per-call
                                # path) and at bf16 halves the matrix's
                                # HBM residency (V=1.3M·d128: 665→333 MB
                                # per serving process). Measured A/B at
                                # V=1.3M (tools/ab_eval_serve.py
                                # --latents-dtype, interleaved): approx95
                                # qps 42.9k→44.7k (+4.1%), exact flat, ids
                                # bitwise equal — BASELINE.md round 4.
                                # "float32" = the losing legacy residency.
    async_ckpt: bool = False    # periodic checkpoint saves return after
                                # orbax's device→host snapshot and finalize
                                # on a background thread — training
                                # continues during the directory write
                                # (XING-scale state: 1.27 GB, 195 s
                                # blocking-save over the tunnel; measured
                                # dispatch/drain split in BASELINE.md
                                # round 4). Restore, the final save, and
                                # the train-end step check drain first, so
                                # semantics are unchanged; default off =
                                # every save durable before the next step
                                # (the reference's tf.train.Saver
                                # behavior).
    train_dir: str = "_train"
    max_steps: int = 0          # 0 = unlimited (epoch-bounded); else hard cap
    compute_dtype: str = "bfloat16"  # matmul input dtype; params stay fp32
    act_dtype: str = "float32"  # {float32, bfloat16} TRAIN-path activation
                                # dtype: bfloat16 halves the HBM traffic of
                                # every batch-side intermediate between the
                                # table gathers and the loss (the round-3
                                # closing profile's top busy-time lever);
                                # tables/grads/optimizer stay f32 and
                                # eval/serving always encode f32. A/B +
                                # converged-recall anchors in BASELINE.md
                                # (round 4).
    sparse_update: bool = False # touched-rows-only table updates (big-vocab
                                # fast path; single-device, adagrad/sgd)
    compact_table_grads: bool = False  # sort+unique request ids per lookup
                                # so table-grad scatters see collision-free
                                # sorted indices (engine.make_compact_lookup)
                                # — single-device dense path; A/B'd per
                                # shape in BASELINE.md
    tensorboard: bool = False   # also stream step metrics to a TensorBoard
                                # event file under train_dir/tb (torch
                                # SummaryWriter; JSONL stays the primary log)
    steps_per_dispatch: int = 1 # K optimizer steps per device dispatch
                                # (lax.scan inside one jit) — amortizes
                                # host→device launch latency; step-for-step
                                # identical to K=1 (same per-step rng/order).
                                # steps_per_checkpoint must be a multiple.

    def __post_init__(self):
        # fail-loud on enum typos that would otherwise silently select a
        # legacy/losing path (e.g. serve_latents_dtype="bf16" falling
        # through to the float32 residency — advisor round 4)
        if self.serve_latents_dtype not in ("compute", "float32"):
            raise ValueError(
                f"train.serve_latents_dtype must be 'compute' or 'float32', "
                f"got {self.serve_latents_dtype!r}")
        if self.act_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"train.act_dtype must be 'float32' or 'bfloat16', "
                f"got {self.act_dtype!r}")


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh + sharding strategy (new vs reference — SURVEY.md §2.3).

    Axes: ("data", "model"). Batch is sharded over "data"; embedding tables
    are row-sharded over "model"; dense params are replicated. data=model=1
    degrades to the single-device path.
    """

    data: int = 1
    model: int = 1
    lookup: str = "alltoall"    # {alltoall, gspmd}: explicit shard_map exchange
                                # vs XLA-chosen collectives
    capacity_factor: float = 0.0  # per-destination-shard bucket slack for the
                                  # all-to-all exchange. ONLY 0.0 (bucket = n,
                                  # the full local request count) is
                                  # overflow-proof for arbitrary id skew: any
                                  # factor f>0 gives C = ceil(n*f/T) slots per
                                  # destination and a skewed batch can
                                  # overflow one owner's bucket (f=1.0 zeroed
                                  # 39% of zipf(1.3) lookups on a (2,4) mesh —
                                  # tests/test_sharded.py::
                                  # test_capacity_overflow_regression). f>0
                                  # trades comm volume for that risk; overflow
                                  # is counted (exchange_drops) and surfaced
                                  # in step metrics, never silent.
    dedup: bool = True          # unique-ids-per-step before the exchange
                                # (SURVEY.md §7 step 5); gradient rows are
                                # segment-summed per unique id BEFORE the
                                # reverse all-to-all, and the owner-side
                                # scatter sees collision-free indices.
    row_shard: str = "shuffle"  # {shuffle, contiguous}: row→shard placement.
                                # "contiguous" (owner = row // rows_per) puts
                                # every hot frequency-ranked id on shard 0;
                                # "shuffle" applies a fixed seeded permutation
                                # to gather-region rows so hot rows spread
                                # ~uniformly across shards (mesh-shape
                                # independent, so checkpoints restore across
                                # mesh shapes). Contiguous is kept as the
                                # differential-testing oracle.


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ---- serialization ----------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)
        return Config(
            data=DataConfig(**raw.get("data", {})),
            model=ModelConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
            mesh=MeshConfig(**raw.get("mesh", {})),
        )

    def replace(self, **sections: Any) -> "Config":
        return dataclasses.replace(self, **sections)

    def override(self, dotted: dict[str, Any]) -> "Config":
        """Apply {"train.batch_size": 128}-style CLI overrides."""
        sections: dict[str, dict[str, Any]] = {}
        for key, value in dotted.items():
            sec, _, name = key.partition(".")
            if not name:
                raise ValueError(f"override key must be section.field: {key!r}")
            sections.setdefault(sec, {})[name] = value
        out = self
        for sec, fields in sections.items():
            cur = getattr(out, sec)
            coerced = {}
            for name, value in fields.items():
                if not hasattr(cur, name):
                    raise ValueError(f"unknown config field {sec}.{name}")
                want = type(getattr(cur, name))
                if isinstance(value, str) and want is not str:
                    value = want(json.loads(value)) if want is bool else want(value)
                coerced[name] = value
            out = dataclasses.replace(out, **{sec: dataclasses.replace(cur, **coerced)})
        return out
