"""Sparse (touched-rows) table updates ON THE MESH (arec/train/sparse_mesh):
step-for-step parity against the dense GSPMD mesh path — the differential
oracle per the repo convention — plus comm accounting showing the dense
[Vp/T, W] table-cotangent all-reduce is gone (SURVEY.md §7 hard part #1
at scale)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from arec.train.loop import Trainer
from arec.train.sparse import table_paths, unpack_params


def _cfg(tmp_path, sparse, model="mf", row_shard="contiguous", k=1,
         mesh=(2, 4), loss="ce", batch_ht=False):
    return Config(
        data=DataConfig(dataset="synthetic", data_dir=str(tmp_path / "d"),
                        syn_users=300, syn_items=250, syn_interactions=8000),
        model=ModelConfig(model=model, dim=16, use_attributes=True,
                          max_seq_len=8, use_pallas_scan=False),
        train=TrainConfig(batch_size=64, num_sampled=32, n_epoch=1, loss=loss,
                          steps_per_checkpoint=1000, sparse_update=sparse,
                          steps_per_dispatch=k, compute_dtype="float32",
                          batch_ht=batch_ht,
                          train_dir=str(tmp_path / f"t_{sparse}_{model}")),
        mesh=MeshConfig(data=mesh[0], model=mesh[1], lookup="alltoall",
                        row_shard=row_shard),
    )


def _params_of(tr):
    p = tr.state.params
    if tr.sparse and tr.cfg.train.optimizer == "adagrad":
        p = unpack_params(p, table_paths(tr.is_seq, tr.spec))
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(p)]


@pytest.mark.parametrize("model,row_shard,mesh",
                         [("mf", "contiguous", (2, 4)),
                          ("mf", "shuffle", (2, 4)),
                          ("mf", "shuffle", (4, 2)),
                          ("lstm", "contiguous", (2, 4)),
                          ("lstm", "shuffle", (2, 4))])
def test_sparse_mesh_matches_dense_mesh(tmp_path, model, row_shard, mesh):
    """Same batches, same rng → same losses and same final params as the
    dense GSPMD mesh step (keep_prob=1 ⇒ exact semantics match)."""
    td = Trainer(_cfg(tmp_path, False, model, row_shard, mesh=mesh))
    ts = Trainer(_cfg(tmp_path, True, model, row_shard, mesh=mesh))

    sd, ss = td.state, ts.state
    for i, b in zip(range(4), td._batches(0)):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        rng = jax.random.fold_in(jax.random.key(777), i)
        sd, md = td.step_fn(sd, jb, rng)
        ss, ms = ts.step_fn(ss, jb, rng)
        np.testing.assert_allclose(float(md["loss"]), float(ms["loss"]),
                                   rtol=1e-5, atol=1e-6)
    td.state, ts.state = sd, ss
    for a, b in zip(_params_of(td), _params_of(ts)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # eval rides the shared sharded path on the unpacked params
    np.testing.assert_allclose(td.evaluate(), ts.evaluate(), atol=1e-9)


# whole MF loss table on the mesh (round-3 verdict: the sparse×{warp,bpr}
# subset/redraw mismatch silently corrupted gradients under the default
# sampler; mw/bbpr additionally need the GLOBAL in-batch candidate set —
# per-shard batches would silently shrink the negative pool vs the dense
# GSPMD oracle's logical [B, B] score matrix)
@pytest.mark.parametrize("loss,batch_ht", [
    ("warp", False), ("bpr", False), ("mw", False), ("bbpr", False),
    # round-4 HT-corrected in-batch proposal: pop_probs lookups ride the
    # GLOBAL gathered candidate ids inside shard_map — parity must hold
    ("mw", True), ("bbpr", True)])
def test_sparse_mesh_losses_match_dense_mesh(tmp_path, loss, batch_ht):
    td = Trainer(_cfg(tmp_path, False, loss=loss, row_shard="shuffle",
                      batch_ht=batch_ht))
    ts = Trainer(_cfg(tmp_path, True, loss=loss, row_shard="shuffle",
                      batch_ht=batch_ht))
    sd, ss = td.state, ts.state
    for i, b in zip(range(3), td._batches(0)):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        rng = jax.random.fold_in(jax.random.key(777), i)
        sd, md = td.step_fn(sd, jb, rng)
        ss, ms = ts.step_fn(ss, jb, rng)
        np.testing.assert_allclose(float(md["loss"]), float(ms["loss"]),
                                   rtol=1e-5, atol=1e-6)
    td.state, ts.state = sd, ss
    for a, b in zip(_params_of(td), _params_of(ts)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sparse_mesh_multi_step_matches_single(tmp_path):
    """K-dispatch (lax.scan over the shard_map'd core) == K single steps."""
    t1 = Trainer(_cfg(tmp_path, True, k=1))
    t3 = Trainer(_cfg(tmp_path, True, k=4))
    batches = [b for _, b in zip(range(4), t1._batches(0))]
    s1 = t1.state
    base = jax.random.key(777)
    for i, b in enumerate(batches):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        s1, _ = t1.step_fn(s1, jb, jax.random.fold_in(base, i))
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in batches[0]}
    rngs = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(4))
    s3, ms = t3.multi_step_fn(t3.state, stacked, rngs)
    assert ms["loss"].shape == (4,)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def _collective_bytes(step_fn, state, batch, rng):
    """Max operand bytes over the collective ops (all-reduce / all-gather /
    all-to-all / collective-permute) in the compiled HLO."""
    hlo = jax.jit(step_fn).lower(state, batch, rng).compile().as_text()
    widths = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1,
              "u8": 1, "pred": 1, "f64": 8, "s64": 8}
    sizes = []
    for line in hlo.splitlines():
        m = re.search(r"=\s*(.*?)\s+"
                      r"(all-reduce|all-gather|all-to-all|"
                      r"collective-permute)\(", line)
        if not m:
            continue
        total = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            if dt not in widths:
                continue
            d = [int(x) for x in dims.split(",") if x]
            total += int(np.prod(d)) * widths[dt] if d else widths[dt]
        sizes.append(total)
    return max(sizes, default=0)


def test_sparse_mesh_comm_is_touched_rows_not_vocab(tmp_path):
    """At production vocab the dense mesh step all-reduces a dense table
    cotangent (O(V/T·W) bytes per step); the sparse-mesh step's largest
    collective must be O(touched·W) — orders of magnitude smaller."""
    from arec.data.schema import AttributeData, EntitySchema
    from arec.models.mf import MFSpec
    from arec.tables.engine import EncoderSpec

    V, NU, D, B = 200_000, 100_000, 32, 256
    us = EntitySchema("user", NU, (EntitySchema.id_field("user", NU),))
    its = EntitySchema("item", V, (EntitySchema.id_field("item", V),))

    # building through the Trainer would prep a huge synthetic dataset; use
    # the step factories directly at the big-V shape instead
    from arec.dist.mesh import make_mesh
    from arec.dist.specs import param_pspecs, shardings
    from arec.models.mf import init_mf
    from arec.tables.engine import attrs_to_device
    from arec.tables.sharded import make_sharded_lookup
    from arec.train.loop import _pad_params_tables
    from arec.train.sparse import init_sparse_state
    from arec.train.sparse_mesh import (
        make_sparse_mesh_step_core, sparse_mesh_state_shardings,
    )
    from arec.train.step import init_state, make_optimizer, make_step_core

    mesh = make_mesh(2, 4)
    spec = MFSpec(user=EncoderSpec(us, D), item=EncoderSpec(its, D,
                                                            with_bias=True),
                  num_sampled=256, compute_dtype="float32")
    ua = AttributeData(us, AttributeData.id_identity(us))
    ia = AttributeData(its, AttributeData.id_identity(its))
    udev = attrs_to_device(ua, spec.user)
    idev = attrs_to_device(ia, spec.item)
    params = init_mf(jax.random.key(0), spec)
    params = _pad_params_tables(params, 4)
    opt = make_optimizer("adagrad", 0.3)

    rng_np = np.random.default_rng(0)
    batch = {"user": jnp.asarray(rng_np.integers(0, NU, B, dtype=np.int32)),
             "pos_item": jnp.asarray(rng_np.integers(0, V, B,
                                                     dtype=np.int32))}
    rng = jax.random.key(1)

    # dense mesh step (the oracle): GSPMD jit over the exchange lookup
    lookup = make_sharded_lookup(mesh, 0.0, dedup=True)
    from arec.models.mf import mf_loss
    dense_core = make_step_core(
        lambda p, b, r: mf_loss(p, spec, udev, idev, b, r, lookup,
                                mesh=mesh),
        opt, 0.3, with_grad_norm=False)
    psh = shardings(mesh, param_pspecs(params))
    dstate = init_state(params, opt)
    dstate = dstate._replace(params=jax.device_put(params, psh))
    dense_bytes = _collective_bytes(dense_core, dstate, batch, rng)

    sstate = init_sparse_state(params, table_paths(False, spec), opt,
                               "adagrad")
    ssh = sparse_mesh_state_shardings(mesh, sstate)
    sstate = jax.device_put(sstate, ssh)
    sparse_core = make_sparse_mesh_step_core(
        mesh, False, spec, udev, idev, opt, 0.3, "adagrad")
    sparse_bytes = _collective_bytes(sparse_core, sstate, batch, rng)

    # dense: ≥ the full item-table cotangent shard [Vp/T, D+1] in f32
    vp = -(-V // 4) * 4
    assert dense_bytes >= vp // 4 * (D + 1) * 4, dense_bytes
    # sparse: touched rows only — orders of magnitude below the table shard
    touched = B + B + 256 + 8          # users + positives + negatives + pad
    assert sparse_bytes <= 8 * touched * (D + 1) * 4, (
        f"sparse-mesh largest collective {sparse_bytes}B exceeds the "
        f"touched-rows bound")
    assert sparse_bytes * 20 < dense_bytes, (sparse_bytes, dense_bytes)


def test_sparse_mesh_trainer_end_to_end(tmp_path):
    """Through Trainer.train(): checkpoints (packed, canonical layout),
    eval, and a restore round-trip onto the SINGLE-DEVICE sparse path
    (cross-mode checkpoint portability)."""
    cfg = _cfg(tmp_path, True, row_shard="shuffle")
    cfg = Config(data=cfg.data, model=cfg.model,
                 train=TrainConfig(**{**cfg.train.__dict__,
                                      "max_steps": 10,
                                      "steps_per_checkpoint": 5}),
                 mesh=cfg.mesh)
    tr = Trainer(cfg)
    out = tr.train()
    assert out["steps"] == 10
    assert np.isfinite(out["recall_at_k"])

    # restore the mesh-written checkpoint in a single-device sparse run:
    # canonical (natural-layout, packed) params must round-trip EXACTLY
    sd_cfg = Config(data=cfg.data, model=cfg.model, train=cfg.train,
                    mesh=MeshConfig(data=1, model=1))
    tr2 = Trainer(sd_cfg)
    assert int(tr2.state.step) == 10
    canon = unpack_params(tr._canonical_state(tr.state).params,
                          table_paths(False, tr.spec))
    for a, b in zip(jax.tree_util.tree_leaves(canon), _params_of(tr2)):
        a, b = np.asarray(a), np.asarray(b)
        n = min(a.shape[0], b.shape[0])     # mesh row padding
        np.testing.assert_array_equal(a[:n], b[:n])
    # recall agrees up to FP-epsilon top-k tie flips between the mesh and
    # single-device encode paths (params are identical — asserted above)
    r1, r2 = tr.evaluate(), tr2.evaluate()
    assert abs(r1 - r2) <= 2 / 250, (r1, r2)
