"""Sparse (touched-rows-only) embedding updates ON THE MESH.

Closes SURVEY.md §7 hard part #1 at scale. The dense mesh step
(Trainer._make_sharded_step) differentiates the loss w.r.t. the row-sharded
table itself; because the table shard enters the lookup shard_map unvarying
over "data", its cotangent is a DENSE [Vp/T, W] psum over the data axis
every step (arec/tables/sharded.py docstring) — at XING scale (V≈1.3M,
dim 128) that is ~166 MB of mostly-zero gradient all-reduced per table per
step, plus a dense optimizer pass. This module rebuilds the mesh step so
per-step table cost is O(touched rows · W) in compute AND comm:

  1. Per data shard, the candidate set is pre-drawn and every touched
     gather-row id is known up front (same structure as the single-device
     sparse path, arec/train/sparse.py — whose helpers are reused here).
  2. Touched ids are deduped per data shard (engine.unique_rows), then the
     SUBSET rows [dense prefix ++ touched] are fetched through the
     all-to-all exchange, T-way-split + all_gathered over "model" — comm
     O(touched · W), never O(V).
  3. The loss is differentiated w.r.t. the SUBSET table only
     (engine.make_subset_lookup position maps); no full-table cotangent is
     ever materialized.
  4. The subset gradient rides a REVERSE exchange back to the owner shards:
     each model column sends its 1/T slice of (stored row id, grad row),
     bucketed by owner, through one all_to_all over "model"; owners
     all_gather the received slabs over "data" (so every data replica of a
     table shard applies the identical update), segment-sum colliding rows,
     and apply Adagrad/SGD to EXACTLY those rows (packed [Vp/T, 2W] storage
     — param and accumulator halves move in one gather + one scatter, as in
     arec/train/sparse.py).

Semantics match the dense mesh step exactly at keep_prob=1 (same
negatives via the pre-drawn `sampled`, same Adagrad math); verified
step-for-step in tests/test_sparse_mesh.py. With dropout the masks are
drawn per data shard (rng folded with the data axis index), which is
statistically equivalent but not bitwise-parity with the GSPMD dense path.

The dense mesh step remains the differential-testing oracle behind
TrainConfig.sparse_update=False (CLAUDE.md convention).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arec.dist.specs import DATA_AXIS, TABLE_AXIS
from arec.losses.sampling import draw
from arec.models import mf as mf_mod
from arec.models import seq as seq_mod
from arec.tables.engine import (
    make_subset_lookup, subset_pos_map, unique_rows,
)
from arec.tables.layout import RowPerm
from arec.tables.sharded import _dedup_ids, _exchange_lookup
from arec.train.sparse import (
    _adagrad_rows, _mf_tables, _seq_tables, _strip_tables, check_sparse_loss,
    get_path, set_path, table_paths,
)
from arec.train.step import TrainState, scan_multi


def _stored_ids(uids_nat, total_rows: int, vp: int, perm: RowPerm | None):
    """Natural unique row ids (sentinel = total_rows) → STORED row ids with
    sentinel = vp (rows_per·T): OOB for the exchange's owner bucketing, so
    sentinel slots are dropped instead of aliasing a real row (RowPerm maps
    ids < prefix+r only — a sentinel pushed through it would land on a real
    gather row)."""
    if perm is None:
        return jnp.where(uids_nat < total_rows, uids_nat, vp)
    return jnp.where(uids_nat < total_rows, perm.apply_ids(uids_nat), vp)


def _subset_exchange_gather(table_shard, stored_ids):
    """[n] stored row ids (replicated over "model" within a data row) →
    [n] subset rows, fetched via the owner exchange. T-way split: model
    column m exchanges only slice m of the (padded) request list, then the
    slices are all_gathered back over "model" — comm O(n·W/T) per hop
    instead of a redundant full-list exchange per column."""
    t = jax.lax.axis_size(TABLE_AXIS)
    n = stored_ids.shape[0]
    if n == 0:   # 0-size collectives hang the remote TPU compiler
        return jnp.zeros((0, table_shard.shape[1]), table_shard.dtype)
    n_pad = -(-n // t) * t
    vp = table_shard.shape[0] * t
    ids_p = jnp.full((n_pad,), vp, stored_ids.dtype).at[:n].set(stored_ids)
    chunk = n_pad // t
    me = jax.lax.axis_index(TABLE_AXIS)
    mine = jax.lax.dynamic_slice(ids_p, (me * chunk,), (chunk,))
    rows = _exchange_lookup(table_shard, mine, 0.0, dedup=False)
    full = jax.lax.all_gather(rows, TABLE_AXIS, axis=0, tiled=True)
    return full[:n]


def _bucket_payload(ids, payload, num_shards: int, rows_per: int):
    """(stored ids [n], payload [n, W]) → per-owner send buffers
    (send_local [T, C], send_pay [T, C, W]) with C = n (overflow-proof: one
    sender can address one owner with its whole list). Sentinel ids
    (≥ num_shards·rows_per) fall in an OOB owner group and are dropped.
    Empty send slots carry local id = rows_per (OOB on the receiver — no
    separate validity plane crosses the wire) and a zero payload. Same
    sort + rank-in-group scheme as arec.tables.sharded._bucket_by_owner,
    plus the payload scatter."""
    n = ids.shape[0]
    owner = ids // rows_per
    local = ids % rows_per
    order = jnp.argsort(owner, stable=True)
    so = owner[order]
    rank = jnp.arange(n) - jnp.searchsorted(so, so, side="left")
    send_local = jnp.full((num_shards, n), rows_per, jnp.int32)
    send_pay = jnp.zeros((num_shards, n, payload.shape[1]), payload.dtype)
    send_local = send_local.at[so, rank].set(local[order].astype(jnp.int32),
                                             mode="drop")
    send_pay = send_pay.at[so, rank].set(payload[order], mode="drop")
    return send_local, send_pay


def _scatter_rows_update(table_shard, stored_ids, g_rows, lr: jnp.ndarray,
                         optimizer: str):
    """Apply the touched-rows update for ONE table shard, inside shard_map.

    stored_ids [n] / g_rows [n, W] are this device's view of the FULL
    per-data-shard touched set (identical across the data row's model
    columns; already scaled to global-loss gradients). Each model column
    sends its 1/T slice through the reverse exchange; owners all_gather
    over "data", segment-sum colliding rows, and run the optimizer on
    exactly the received rows. Comm per device: O(touched·W/T) over
    "model" + O(touched·W) over "data"."""
    t = jax.lax.axis_size(TABLE_AXIS)
    rows_per = table_shard.shape[0]
    vp = rows_per * t
    w = g_rows.shape[1]
    n = stored_ids.shape[0]
    if n == 0:   # 0-size collectives hang the remote TPU compiler
        return table_shard
    n_pad = -(-n // t) * t
    ids_p = jnp.full((n_pad,), vp, stored_ids.dtype).at[:n].set(stored_ids)
    g_p = jnp.zeros((n_pad, w), g_rows.dtype).at[:n].set(g_rows)
    chunk = n_pad // t
    me = jax.lax.axis_index(TABLE_AXIS)
    my_ids = jax.lax.dynamic_slice(ids_p, (me * chunk,), (chunk,))
    my_g = jax.lax.dynamic_slice(g_p, (me * chunk, 0), (chunk, w))

    send_local, send_g = _bucket_payload(my_ids, my_g, t, rows_per)
    loc = jax.lax.all_to_all(send_local, TABLE_AXIS, 0, 0)
    g_r = jax.lax.all_to_all(send_g, TABLE_AXIS, 0, 0)

    # every data replica of this table shard must apply the SAME update:
    # gather ALL data shards' contributions (touched rows only — this
    # all_gather of O(touched·W) is what replaces the dense [Vp/T, W] psum)
    loc_all = jax.lax.all_gather(loc, DATA_AXIS, axis=0, tiled=True)
    g_all = jax.lax.all_gather(g_r, DATA_AXIS, axis=0, tiled=True)
    flat_ids = loc_all.reshape(-1)
    flat_g = g_all.reshape(-1, w)

    # segment-sum colliding rows BEFORE the optimizer (Adagrad accumulates
    # the squared TOTAL row gradient, not per-contribution squares)
    uloc, valid_u, inv = _dedup_ids(flat_ids)
    uloc = jnp.where(valid_u, uloc, rows_per)   # pad slots → OOB (drop)
    gsum = jnp.zeros((flat_ids.shape[0], w), flat_g.dtype).at[inv].add(flat_g)

    if optimizer == "adagrad":
        d = table_shard.shape[1] // 2
        rows = table_shard.at[uloc].get(mode="fill", fill_value=0,
                                        indices_are_sorted=True)
        p_new, a_new = _adagrad_rows(rows[:, :d], rows[:, d:], gsum, lr)
        new_rows = jnp.concatenate([p_new, a_new], axis=1)
        return table_shard.at[uloc].set(new_rows, mode="drop",
                                        unique_indices=True,
                                        indices_are_sorted=True)
    return table_shard.at[uloc].add(-lr * gsum, mode="drop",
                                    unique_indices=True,
                                    indices_are_sorted=True)


def sparse_mesh_state_pspecs(state: TrainState):
    """PartitionSpec pytree for the sparse-mesh TrainState: packed tables
    row-sharded P("model", None); everything else (rest params, the
    rest-optimizer state with its (1,1) table placeholders, scalars)
    replicated."""
    from arec.dist.specs import param_pspecs
    return TrainState(
        params=param_pspecs(state.params),
        opt_state=jax.tree_util.tree_map(lambda _: P(), state.opt_state),
        lr_scale=P(), step=P())


def sparse_mesh_state_shardings(mesh: Mesh, state: TrainState):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), sparse_mesh_state_pspecs(state),
        is_leaf=lambda x: isinstance(x, P))


def make_sparse_mesh_step_core(
    mesh: Mesh,
    is_seq: bool,
    spec,
    user_dev,
    item_dev,
    rest_opt: optax.GradientTransformation,
    base_lr: float,
    optimizer: str,
    pop=None,
    perms: dict[str, RowPerm] | None = None,
) -> Callable:
    """Un-jitted step(state, batch, rng) -> (state, metrics): the whole
    train step in ONE shard_map over ("data","model") — per-device code is
    the single-device sparse step with the subset gather and the row update
    replaced by the exchanges above. Jit (with donation) via
    make_sparse_mesh_step; K-scan via make_sparse_mesh_multi_step."""
    if optimizer not in ("adagrad", "sgd"):
        raise ValueError(
            f"sparse_update supports adagrad/sgd, not {optimizer!r}")
    needs_neg = check_sparse_loss(is_seq, spec)
    perms = perms or {}
    collect = _seq_tables if is_seq else _mf_tables
    vocab = (spec.vocab if is_seq else spec.item.schema.num_entities)
    paths = table_paths(is_seq, spec)
    packed = optimizer == "adagrad"

    def device_step(state: TrainState, batch, rng):
        from arec.train.step import split_devs
        batch, devs = split_devs(batch)
        idev = devs["item"] if devs else item_dev
        udev = devs.get("user") if devs else user_dev
        params = state.params
        lr = base_lr * state.lr_scale

        # 1. pre-drawn candidates: replicated rng → identical negatives on
        # every device, exactly like the GSPMD dense path. In-batch losses
        # (mw/bbpr) draw nothing — see arec/train/sparse.py.
        if needs_neg:
            _, r_neg = jax.random.split(rng)
            sampled = draw(r_neg, spec.num_sampled, vocab, spec.sampler,
                           pop)
            neg_ids = sampled[0]
        else:
            sampled = None
            neg_ids = jnp.zeros((0,), jnp.int32)

        # 2. touched rows per table, per DATA shard
        specs = collect(spec, udev, idev, batch, neg_ids)
        uids = {s.role: unique_rows(ids, total, cap=bound)
                for s, ids, total, bound in specs}

        # 3. subset rows through the exchange ([dense prefix ++ touched])
        sub_full, req_stored, by_role, totals = {}, {}, {}, {}
        for s, _, total, _ in specs:
            by_role[s.role], totals[s.role] = s, total
            table = get_path(params, s.path)
            vp = table.shape[0] * jax.lax.axis_size(TABLE_AXIS)
            stored = _stored_ids(uids[s.role], total, vp, perms.get(s.role))
            if s.prefix:
                stored = jnp.concatenate(
                    [jnp.arange(s.prefix, dtype=stored.dtype), stored])
            req_stored[s.role] = stored
            sub_full[s.role] = _subset_exchange_gather(table, stored)
        subs = ({r: f[:, : f.shape[1] // 2] for r, f in sub_full.items()}
                if packed else sub_full)
        lookup_fns = {
            s.role: make_subset_lookup(
                subset_pos_map(uids[s.role], total, s.prefix), s.prefix)
            for s, _, total, _ in specs if uids[s.role].shape[0]}
        rest = _strip_tables(params, paths)

        # 4. loss over the subsets; dropout rng decorrelated per data shard
        # (negatives stay shared — they were pre-drawn from the unfolded
        # key). For the in-batch losses (mw/bbpr) the candidate set must be
        # the GLOBAL batch, matching the dense GSPMD path's logical [B, B]
        # score matrix: each data shard encodes its LOCAL positives (their
        # rows are in its touched set) and all_gathers the latents over
        # "data" — the all_gather transpose (psum_scatter) then routes each
        # shard's cross-batch gradient contribution back to the owner's
        # subset cotangent, which the reverse row exchange already sums
        # over "data". Correct because MF batch shards are equal-sized, so
        # the loss `scale` below is the same constant on every device.
        rng_dev = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def gather_cands(ids, v, b):
            off = jax.lax.axis_index(DATA_AXIS) * ids.shape[0]
            g = partial(jax.lax.all_gather, axis_name=DATA_AXIS,
                        axis=0, tiled=True)
            return g(ids), g(v), g(b), off

        def loss_f(subs, rest):
            p = rest
            for role, sub in subs.items():
                p = set_path(p, by_role[role].path, sub)
            if is_seq:
                return seq_mod.seq_loss(p, spec, idev, udev, batch,
                                        rng_dev, lookup_fns=lookup_fns,
                                        sampled=sampled, time_major=True,
                                        pop=pop)
            return mf_mod.mf_loss(p, spec, udev, idev, batch,
                                  rng_dev, lookup_fns=lookup_fns,
                                  sampled=sampled, pop=pop,
                                  gather_cands=(None if needs_neg
                                                else gather_cands))

        loss, (g_subs, g_rest) = jax.value_and_grad(
            loss_f, argnums=(0, 1))(subs, rest)
        # exact global reduction: the per-device loss is a WEIGHTED mean
        # (seq: over valid positions — sum(ce·mask)/sum(mask); mf: over the
        # local batch), so the global loss is Σ_d w_d·mean_d / Σ_d w_d and
        # each device's gradient contribution carries weight w_d/W — NOT
        # 1/n_data, which is only right when every shard has equal weight
        # (caught by the LSTM parity test: shards see different pad counts)
        if is_seq:
            w = jnp.sum(batch["mask"]).astype(jnp.float32)
        else:
            w = jnp.float32(batch["user"].shape[0])
        scale = w / jax.lax.psum(w, DATA_AXIS)
        # (the model axis carries identical replicas; the pmean over it is
        # an identity that also marks values replicated)
        loss = jax.lax.pmean(jax.lax.psum(loss * scale, DATA_AXIS),
                             TABLE_AXIS)
        g_rest = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(jax.lax.psum(g * scale, DATA_AXIS),
                                    TABLE_AXIS), g_rest)

        # 5a. rest of the params: stock optax
        rest_state = state.opt_state["rest"]
        rest_state.hyperparams["learning_rate"] = lr
        updates, rest_state = rest_opt.update(g_rest, rest_state, rest)
        new_rest = optax.apply_updates(rest, updates)

        # 5b. tables: reverse exchange + touched-rows optimizer
        new_params = new_rest
        for s, *_ in specs:
            g = g_subs[s.role] * scale      # local-mean → global-mean grads
            table = get_path(params, s.path)
            table = _scatter_rows_update(table, req_stored[s.role], g, lr,
                                         optimizer)
            new_params = set_path(new_params, s.path, table)

        new_state = TrainState(
            params=new_params,
            opt_state={"rest": rest_state},
            lr_scale=state.lr_scale,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "lr": lr}

    def wrap(state: TrainState, batch, rng):
        from arec.dist.specs import DEVS_KEY
        st_specs = sparse_mesh_state_pspecs(state)
        b_specs = {k: jax.tree_util.tree_map(
            (lambda leaf: P()) if k == DEVS_KEY else
            (lambda leaf: P(DATA_AXIS, *([None] * (leaf.ndim - 1)))), v)
            for k, v in batch.items()}
        # check_vma=False: the checker cannot statically infer that the
        # updated table shards are data-replicated — they are, because every
        # data replica all_gathers the SAME contribution set over "data"
        # before applying the (deterministic) row update; the step-for-step
        # parity test against the dense GSPMD path verifies it dynamically
        # (tests/test_sparse_mesh.py)
        return shard_map(
            device_step, mesh=mesh,
            in_specs=(st_specs, b_specs, P()),
            out_specs=(st_specs, {"loss": P(), "lr": P()}),
            check_vma=False,
        )(state, batch, rng)

    return wrap


def make_sparse_mesh_step(mesh, *args, **kwargs) -> Callable:
    state_sh = kwargs.pop("state_shardings", None)
    core = make_sparse_mesh_step_core(mesh, *args, **kwargs)
    return jax.jit(core, donate_argnums=(0,),
                   **({"in_shardings": (state_sh, None, None),
                       "out_shardings": (state_sh, None)}
                      if state_sh is not None else {}))


def make_sparse_mesh_multi_step(mesh, *args, **kwargs) -> Callable:
    """K sparse-mesh steps per dispatch: lax.scan over the shard_map'd
    core — same launch-latency amortization as every other path, step-for-
    step identical to K single steps."""
    state_sh = kwargs.pop("state_shardings", None)
    core = make_sparse_mesh_step_core(mesh, *args, **kwargs)
    return jax.jit(scan_multi(core), donate_argnums=(0,),
                   **({"in_shardings": (state_sh, None, None),
                       "out_shardings": (state_sh, None)}
                      if state_sh is not None else {}))
