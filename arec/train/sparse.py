"""Sparse (touched-rows-only) embedding updates — production big-vocab path.

The dense train step (arec/train/step.py) materializes full-table gradient
cotangents and runs the optimizer over every table row each step. That is
mathematically identical to TF1's sparse IndexedSlices updates but costs
O(vocab·D) HBM traffic per step — fine at ML-1M scale, ruinous at XING scale
(~1.5M users × D). This module rebuilds the step so per-step cost is
O(touched rows · D):

  1. The candidate set is drawn FIRST (losses accept pre-drawn `sampled`),
     so every table row the step will touch is known up front.
  2. Per fused table, the touched gather-row ids are deduped to a static-
     shape sorted-unique vector (`engine.unique_rows`); the dense small-
     vocab prefix (EncoderSpec.layout_fields puts it first) is always
     touched and handled densely — it is tiny.
  3. The loss is differentiated w.r.t. SUBSET tables
     [prefix ++ table[uids]] (`engine.build_subset`); encode runs unchanged
     through `engine.make_subset_lookup`. No full-table cotangent is ever
     materialized.
  4. Adagrad/SGD are applied manually to exactly those rows; every
     non-table parameter goes through the stock optax path.
  5. For Adagrad, each table is stored PACKED as [V, 2D]: param rows in
     [:, :D], accumulator rows in [:, D:]. TPU row scatter/gather cost is
     descriptor(row)-bound, not byte-bound (measured: a [33k, 256]-row
     scatter is FASTER than [33k, 64]), so packing halves the per-step
     scatter+gather count. Eval paths read through `unpack_params`.

Semantics match the dense step exactly (same negatives, same Adagrad math —
optax.scale_by_rss with initial_accumulator_value/eps defaults); verified by
tests/test_sparse.py step-for-step parity.

No counterpart in the reference (single-device TF1 relied on IndexedSlices);
this is the TPU-native equivalent of what its `tf.train.Saver`-era stack got
from sparse Variable updates (SURVEY.md §7 "Sparse-grad correctness").
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from arec.losses.sampling import draw
from arec.models import mf as mf_mod
from arec.models import seq as seq_mod
from arec.tables.engine import (
    FUSED, build_subset, gather_row_ids, make_subset_lookup, subset_pos_map,
    unique_rows,
)
from arec.train.step import TrainState

ADAGRAD_INIT_ACCUM = 0.1   # optax.adagrad defaults — parity with dense path
ADAGRAD_EPS = 1e-7

# MF losses that consume sampled negatives (and hence whose touched-row set
# must include the pre-drawn candidate ids). mw/bbpr use in-batch positives
# as shared negatives — nothing is drawn for them. The full supported table
# is guarded loudly in the step factories below.
MF_SAMPLED_LOSSES = ("ce", "warp", "bpr")
MF_BATCH_LOSSES = ("mw", "bbpr")


# ---------------------------------------------------------------------------
# Nested-dict path helpers (params are plain dict pytrees)
# ---------------------------------------------------------------------------

def get_path(tree: dict, path: tuple[str, ...]):
    for k in path:
        tree = tree[k]
    return tree


def set_path(tree: dict, path: tuple[str, ...], value):
    """Copy-on-write set: returns a new tree sharing untouched subtrees."""
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: set_path(tree[path[0]], path[1:], value)}


@dataclass(frozen=True)
class SparseTableSpec:
    """One sparsely-updated table: where it lives and its dense prefix."""
    role: str                  # lookup_fns key: {"user", "item", "out"}
    path: tuple[str, ...]      # into the params pytree
    prefix: int                # dense-region rows (0 for plain tables)


# ---------------------------------------------------------------------------
# Manual per-row optimizers (mirror optax.scale_by_rss / sgd exactly)
# ---------------------------------------------------------------------------

def _adagrad_rows(p_rows, a_rows, g_rows, lr):
    a_new = a_rows + g_rows * g_rows
    inv = jnp.where(a_new > 0, 1.0 / (jnp.sqrt(a_new) + ADAGRAD_EPS), 0.0)
    return p_rows - lr * g_rows * inv, a_new


def _row_indices(uids, prefix: int):
    """[prefix-ids ++ uids] — still sorted+unique (the fused layout puts
    the dense prefix FIRST, so every gather-region uid is ≥ prefix)."""
    if not prefix:
        return uids
    return jnp.concatenate(
        [jnp.arange(prefix, dtype=uids.dtype), uids])


def _apply_packed_adagrad(packed, sub_packed, g_sub, uids, prefix, lr):
    """One in-place (donated) update of the touched PACKED rows: the new
    (param, accum) halves are computed from the already-gathered subset
    rows, so the write-back is a single row scatter per table.

    The dense prefix rides the SAME scatter (not a dynamic_update_slice):
    XLA fused DUS+scatter into a full-table pass — the xplane trace of the
    XING-scale step showed the two table updates costing 6.5+4.8 ms/step
    (~a 2.7 GB whole-table read+write) for only ~14k touched rows."""
    d = packed.shape[1] // 2
    p_new, a_new = _adagrad_rows(sub_packed[:, :d], sub_packed[:, d:],
                                 g_sub, lr)
    new_rows = jnp.concatenate([p_new, a_new], axis=1)
    idx = _row_indices(uids, prefix)
    if idx.shape[0]:
        packed = packed.at[idx].set(
            new_rows, mode="drop",
            unique_indices=True, indices_are_sorted=True)
    return packed


def _apply_sgd(table, g_sub, uids, prefix, lr):
    idx = _row_indices(uids, prefix)
    if idx.shape[0]:
        table = table.at[idx].add(
            -lr * g_sub, mode="drop",
            unique_indices=True, indices_are_sorted=True)
    return table


# ---------------------------------------------------------------------------
# Family-specific touched-row collection
# ---------------------------------------------------------------------------

def _mf_tables(spec, user_dev, item_dev, batch, neg_ids):
    """Per-role (spec, touched gather-row ids, total rows, unique bound).
    The bound (engine.gather_unique_bound) statically caps the sorted-
    unique vector so every touched-rows op is sized by what CAN be unique,
    not by the raw id count."""
    from arec.tables.engine import gather_unique_bound
    cand = jnp.concatenate([batch["pos_item"], neg_ids])
    nb = batch["user"].shape[0]
    return [
        (SparseTableSpec("user", ("user", "tables", FUSED),
                         spec.user.dense_region_rows),
         gather_row_ids(spec.user, user_dev, batch["user"]),
         spec.user.total_rows,
         gather_unique_bound(spec.user, nb)),
        (SparseTableSpec("item", ("item", "tables", FUSED),
                         spec.item.dense_region_rows),
         gather_row_ids(spec.item, item_dev, cand),
         spec.item.total_rows,
         gather_unique_bound(spec.item, cand.shape[0])),
    ]


def _seq_tables(spec, user_dev, item_dev, batch, neg_ids):
    """Sequence-family counterpart of _mf_tables (same 4-tuple)."""
    from arec.tables.engine import gather_unique_bound
    in_ids = batch["inputs"].reshape(-1)
    tgt = batch["targets"].reshape(-1)
    if spec.tie_output:
        in_ids = jnp.concatenate([in_ids, tgt, neg_ids])
    out = [
        (SparseTableSpec("item", ("item_in", "tables", FUSED),
                         spec.item_in.dense_region_rows),
         gather_row_ids(spec.item_in, item_dev, in_ids),
         spec.item_in.total_rows,
         gather_unique_bound(spec.item_in, in_ids.shape[0])),
    ]
    if spec.user is not None:
        out.append((SparseTableSpec("user", ("user", "tables", FUSED),
                                    spec.user.dense_region_rows),
                    gather_row_ids(spec.user, user_dev, batch["user"]),
                    spec.user.total_rows,
                    gather_unique_bound(spec.user, batch["user"].shape[0])))
    if not spec.tie_output:
        n_out = tgt.shape[0] + neg_ids.shape[0]
        out.append((SparseTableSpec("out", ("item_out",), 0),
                    jnp.concatenate([tgt, neg_ids]),
                    spec.vocab + 1,
                    min(n_out, spec.vocab + 1)))
    return out


# ---------------------------------------------------------------------------
# State + step factory
# ---------------------------------------------------------------------------

def table_paths(is_seq: bool, spec) -> list[tuple[str, ...]]:
    if not is_seq:
        return [("user", "tables", FUSED), ("item", "tables", FUSED)]
    paths = [("item_in", "tables", FUSED)]
    if spec.user is not None:
        paths.append(("user", "tables", FUSED))
    if not spec.tie_output:
        paths.append(("item_out",))
    return paths


def init_sparse_state(params, paths: list[tuple[str, ...]],
                      rest_opt: optax.GradientTransformation,
                      optimizer: str) -> TrainState:
    """Adagrad tables are packed [V, 2D] (see module docstring); opt_state
    holds only the rest-tree optax state."""
    rest = _strip_tables(params, paths)
    if optimizer == "adagrad":
        params = pack_tables(params, paths)
    return TrainState(
        params=params,
        opt_state={"rest": rest_opt.init(rest)},
        lr_scale=jnp.asarray(1.0, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )


def _strip_tables(params, paths):
    """Replace table leaves with tiny placeholders so the rest-optimizer
    carries no real table state (shape (1,1), not (0,0) — orbax refuses
    zero-size arrays at checkpoint time)."""
    out = params
    for p in paths:
        out = set_path(out, p, jnp.zeros((1, 1), jnp.float32))
    return out


def pack_tables(params, paths):
    """[V, D] param tables → [V, 2D] packed (param ++ Adagrad accum)."""
    out = params
    for p in paths:
        t = get_path(params, p)
        out = set_path(out, p, jnp.concatenate(
            [t, jnp.full_like(t, ADAGRAD_INIT_ACCUM)], axis=1))
    return out


def unpack_params(params, paths):
    """Packed sparse-mode params → plain param tree (for eval paths,
    recommend, and cross-mode comparisons)."""
    out = params
    for p in paths:
        t = get_path(params, p)
        out = set_path(out, p, t[:, : t.shape[1] // 2])
    return out


def check_sparse_loss(is_seq: bool, spec) -> bool:
    """Validate spec.loss for the sparse paths at factory time (LOUDLY —
    the round-3 verdict found unsupported combos corrupting gradients
    silently). Returns whether the loss consumes sampled negatives."""
    if is_seq:
        # seq losses (ce/mce) always train against sampled negatives;
        # SeqSpec construction already rejects anything else (seq.py)
        return True
    if spec.loss in MF_SAMPLED_LOSSES:
        return True
    if spec.loss in MF_BATCH_LOSSES:
        return False
    raise ValueError(
        f"sparse_update supports mf losses "
        f"{MF_SAMPLED_LOSSES + MF_BATCH_LOSSES}, not {spec.loss!r}")


def make_sparse_step_core(
    is_seq: bool,
    spec,
    user_dev,
    item_dev,
    rest_opt: optax.GradientTransformation,
    base_lr: float,
    optimizer: str,
    pop=None,                    # (cdf, probs) — sampler="pop" proposal
) -> Callable:
    """Un-jitted step(state, batch, rng) -> (state, metrics), parity-
    equal to arec.train.step.make_step_core but with O(touched·D) table
    updates. Single-device path (the mesh path keeps dense updates — its
    tables are already sharded V/T per chip). Jitted by
    make_sparse_train_step; K-step-scanned by make_sparse_multi_step."""
    if optimizer not in ("adagrad", "sgd"):
        raise ValueError(
            f"sparse_update supports adagrad/sgd, not {optimizer!r}")
    needs_neg = check_sparse_loss(is_seq, spec)
    collect = _seq_tables if is_seq else _mf_tables
    loss_mod = seq_mod.seq_loss if is_seq else None
    vocab = (spec.vocab if is_seq else spec.item.schema.num_entities)
    paths = table_paths(is_seq, spec)

    def step(state: TrainState, batch, rng):
        from arec.train.step import split_devs
        batch, devs = split_devs(batch)
        # attribute maps as jit arguments when the caller attaches DEVS_KEY
        # (Trainer dispatch); fall back to the factory closures otherwise
        idev = devs["item"] if devs else item_dev
        udev = devs.get("user") if devs else user_dev
        params = state.params
        lr = base_lr * state.lr_scale

        # 1. pre-draw negatives (same rng protocol as the losses: the loss
        # splits rng into (r_drop, r_neg) itself; passing `sampled` makes
        # its own r_neg draw unused, so negatives match the dense step).
        # In-batch losses (mw/bbpr) draw nothing — their negatives are the
        # batch positives, already in the touched set.
        if needs_neg:
            _, r_neg = jax.random.split(rng)
            sampled = draw(r_neg, spec.num_sampled, vocab, spec.sampler,
                           pop)
            neg_ids = sampled[0]
        else:
            sampled = None
            neg_ids = jnp.zeros((0,), jnp.int32)

        # 2. touched rows per table (static shapes; sentinel-padded unique)
        specs = collect(spec, udev, idev, batch, neg_ids)
        uids = {s.role: unique_rows(ids, total, cap=bound)
                for s, ids, total, bound in specs}

        # 3. loss over subset tables (O(1) position-map lookups). With
        # packed Adagrad the subset gather brings param+accum halves in
        # ONE row gather; the loss sees only the param half.
        packed = optimizer == "adagrad"
        sub_full = {s.role: build_subset(get_path(params, s.path),
                                         uids[s.role], s.prefix)
                    for s, *_ in specs}
        if packed:
            subs = {role: f[:, : f.shape[1] // 2]
                    for role, f in sub_full.items()}
        else:
            subs = sub_full
        lookup_fns = {
            s.role: make_subset_lookup(
                subset_pos_map(uids[s.role], total, s.prefix), s.prefix)
            for s, _, total, _ in specs if uids[s.role].shape[0]}
        rest = _strip_tables(params, paths)
        by_role = {s.role: s for s, *_ in specs}

        def loss_f(subs, rest):
            p = rest
            for role, sub in subs.items():
                p = set_path(p, by_role[role].path, sub)
            if is_seq:
                # time-major: this step is single-device only, so the
                # sharding-locality caveat of the mesh path doesn't apply
                return seq_mod.seq_loss(p, spec, idev, udev, batch,
                                        rng, lookup_fns=lookup_fns,
                                        sampled=sampled, time_major=True,
                                        pop=pop)
            return mf_mod.mf_loss(p, spec, udev, idev, batch, rng,
                                  lookup_fns=lookup_fns, sampled=sampled,
                                  pop=pop)

        loss, (g_subs, g_rest) = jax.value_and_grad(
            loss_f, argnums=(0, 1))(subs, rest)

        # 4a. rest of the params: stock optax (lr via injected hyperparam)
        opt_state = state.opt_state
        rest_state = opt_state["rest"]
        rest_state.hyperparams["learning_rate"] = lr
        updates, rest_state = rest_opt.update(g_rest, rest_state, rest)
        new_rest = optax.apply_updates(rest, updates)

        # 4b. tables: manual touched-rows update (one scatter per table)
        new_params = new_rest
        for s, *_ in specs:
            table = get_path(params, s.path)
            if packed:
                table = _apply_packed_adagrad(
                    table, sub_full[s.role], g_subs[s.role], uids[s.role],
                    s.prefix, lr)
            else:
                table = _apply_sgd(table, g_subs[s.role], uids[s.role],
                                   s.prefix, lr)
            new_params = set_path(new_params, s.path, table)

        new_state = TrainState(
            params=new_params,
            opt_state={"rest": rest_state},
            lr_scale=state.lr_scale,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "lr": lr}

    return step


def make_sparse_train_step(*args, **kwargs) -> Callable:
    """Jitted single sparse step (see make_sparse_step_core)."""
    return jax.jit(make_sparse_step_core(*args, **kwargs),
                   donate_argnums=(0,))


def make_sparse_multi_step(*args, **kwargs) -> Callable:
    """K sparse steps per dispatch (steps_per_dispatch > 1): one lax.scan
    over the sparse core — same launch-latency amortization as
    arec.train.step.make_multi_step, step-for-step identical to K single
    sparse steps (same rng protocol, same touched-row updates)."""
    from arec.train.step import scan_multi
    return jax.jit(scan_multi(make_sparse_step_core(*args, **kwargs)),
                   donate_argnums=(0,))
