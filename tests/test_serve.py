"""arec.serve.Recommender — the standing ad-hoc serving layer.

Golden check: for the dataset's own eval users with their own seen lists,
the serving layer must reproduce the CLI recommend() lists exactly (same
params, same item matrix, same top-k path — only the request plumbing
differs)."""

import numpy as np
import pytest

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.serve import Recommender
from arec.train.loop import Trainer


def _cfg(tmp_path, model):
    return Config(
        data=DataConfig(dataset="synthetic", data_dir=str(tmp_path / "d"),
                        syn_users=300, syn_items=250, syn_interactions=8000),
        model=ModelConfig(model=model, dim=16, use_attributes=False,
                          max_seq_len=8, use_pallas_scan=False),
        train=TrainConfig(batch_size=64, num_sampled=32, n_epoch=1,
                          steps_per_checkpoint=500,
                          train_dir=str(tmp_path / f"t_{model}")),
    )


def _seen_lists(ds, users):
    return [[int(x) for x in row if x >= 0] for row in ds.seen_items[users]]


def test_refuses_untrained(tmp_path):
    with pytest.raises(FileNotFoundError):
        Recommender(_cfg(tmp_path, "mf"))


def test_mf_for_users_matches_recommend(tmp_path):
    cfg = _cfg(tmp_path, "mf")
    tr = Trainer(cfg)
    tr.train()
    rows = dict(tr.recommend())

    rec = Recommender(cfg, serve_batch=32)   # default slab: no truncation
    users = list(rows)
    ids = rec.for_users(users, seen=_seen_lists(tr.ds, users))
    assert ids.shape == (len(users), cfg.train.eval_topk)
    for u, row in zip(users, ids):
        assert row.tolist() == rows[u], u
    # seen exclusion holds for ad-hoc requests too
    for u, row in zip(users, ids):
        assert not set(row.tolist()) & set(_seen_lists(tr.ds, [u])[0])
    # empty request list is a no-op, not a crash
    assert rec.for_users([]).shape == (0, cfg.train.eval_topk)


def test_lstm_from_histories_matches_recommend(tmp_path):
    cfg = _cfg(tmp_path, "lstm")
    tr = Trainer(cfg)
    tr.train()
    rows = dict(tr.recommend())

    rec = Recommender(cfg, serve_batch=32)
    users = list(rows)
    L = tr.spec.pack_len
    hists = [[int(x) for x in tr.ds.hist_items[u][: tr.ds.hist_lengths[u]]]
             [-L:] for u in users]
    ids = rec.from_histories(hists, seen=_seen_lists(tr.ds, users))
    assert ids.shape == (len(users), cfg.train.eval_topk)
    for u, row in zip(users, ids):
        assert row.tolist() == rows[u], u


def test_mesh_serving_matches_recommend(tmp_path):
    """Serving on a (2,4) mesh rides the sharded exact top-k merge and
    must still reproduce recommend() (which runs the same path)."""
    from arec.config import MeshConfig
    cfg = _cfg(tmp_path, "mf")
    cfg = Config(data=cfg.data, model=cfg.model, train=cfg.train,
                 mesh=MeshConfig(data=2, model=4, lookup="alltoall"))
    tr = Trainer(cfg)
    tr.train()
    rows = dict(tr.recommend())
    rec = Recommender(cfg, serve_batch=32)
    users = list(rows)[:48]
    ids = rec.for_users(users, seen=_seen_lists(tr.ds, users))
    for u, row in zip(users, ids):
        assert row.tolist() == rows[u], u


def test_serve_only_state_matches_training(tmp_path):
    """Trainer(serve_only=True) shapes its restore target with
    jax.eval_shape over the SAME construction path as training; any drift
    between the two (tree structure, shapes, dtypes) breaks restore. Guard
    all three state layouts: dense, sparse-packed, mesh."""
    import jax

    from arec.config import MeshConfig

    variants = [
        _cfg(tmp_path, "mf"),
        Config(**{**_cfg(tmp_path, "mf").__dict__,
                  "train": TrainConfig(**{
                      **_cfg(tmp_path, "mf").train.__dict__,
                      "sparse_update": True})}),
        Config(**{**_cfg(tmp_path, "lstm").__dict__,
                  "mesh": MeshConfig(data=2, model=4, lookup="alltoall")}),
    ]
    for cfg in variants:
        full = Trainer(cfg)
        shaped = Trainer(cfg, serve_only=True)
        a = jax.tree_util.tree_structure(full.state)
        b = jax.tree_util.tree_structure(shaped.state)
        assert a == b, cfg
        for x, y in zip(jax.tree_util.tree_leaves(full.state),
                        jax.tree_util.tree_leaves(shaped.state)):
            assert tuple(x.shape) == tuple(y.shape), (x.shape, y.shape)
            assert x.dtype == y.dtype, (x.dtype, y.dtype)


def test_long_history_never_served_seen_items(tmp_path):
    """Regression for the old seen_width=32 default: a request whose
    seen/history list exceeds any fixed slab must STILL never be served an
    already-interacted item — the default slab sizes itself to the call."""
    cfg = _cfg(tmp_path, "lstm")
    tr = Trainer(cfg)
    tr.train()
    rec = Recommender(cfg)                    # defaults only
    # a 70-item history (> the old 32-wide slab), ids cycled over the vocab
    long_hist = [int(x % tr.ds.num_items) for x in range(3, 3 + 70)]
    out = rec.from_histories([long_hist])     # history = exclusion list
    assert not set(out[0].tolist()) & set(long_hist)
    # MF family: explicit long seen list, default slab
    cfg2 = _cfg(tmp_path, "mf")
    tr2 = Trainer(cfg2)
    tr2.train()
    rec2 = Recommender(cfg2)
    out2 = rec2.for_users([1], seen=[long_hist])
    assert not set(out2[0].tolist()) & set(long_hist)
    # explicit narrow width keeps the MOST RECENT ids (consistent direction)
    rec3 = Recommender(cfg2, seen_width=8)
    out3 = rec3.for_users([1], seen=[long_hist])
    assert not set(out3[0].tolist()) & set(long_hist[-8:])


def test_lstm_long_history_segments(tmp_path):
    """Histories longer than one segment go through the carried-state
    segmented scan; result must equal serving the same history through a
    single long request (exactness of temporal pipelining)."""
    cfg = _cfg(tmp_path, "lstm")
    tr = Trainer(cfg)
    tr.train()
    rec = Recommender(cfg, serve_batch=4, seen_width=4)
    h = [int(x) for x in tr.ds.hist_items[0][: tr.ds.hist_lengths[0]]]
    long = (h * 4)[: 3 * tr.spec.max_seq_len - 2]    # 3 segments, ragged
    out = rec.from_histories([long, long[:5]], seen=[[], []])
    assert out.shape == (2, cfg.train.eval_topk)
    out2 = rec.from_histories([long, long[:5]], seen=[[], []])
    assert np.array_equal(out, out2)                 # deterministic


@pytest.mark.parametrize("sparse", [False, True])
def test_refresh_follows_training(tmp_path, sparse):
    """refresh() (round 5): a standing Recommender picks up the newest
    checkpoint in place — outputs must match a FRESHLY BUILT Recommender
    on the new checkpoint, the serving jit entry must be reused (no
    recompile), and refresh with no newer checkpoint is a no-op returning
    False. Covers the dense and the sparse-packed (unpack-on-restore)
    state layouts."""
    from dataclasses import replace
    cfg = _cfg(tmp_path, "mf")
    cfg = replace(cfg, train=replace(cfg.train, sparse_update=sparse,
                                     train_dir=str(tmp_path / f"r{sparse}")))
    Trainer(cfg).train()
    rec = Recommender(cfg, serve_batch=16)
    users = list(range(0, 40, 2))
    seen = _seen_lists(rec._trainer.ds, users)
    rec.for_users(users, seen=seen)          # warm the serve jit
    assert rec.refresh() is False            # latest ckpt already served

    # train on (fresh Trainer restores + resumes to epoch 2)
    cfg2 = replace(cfg, train=replace(cfg.train, n_epoch=2))
    tr2 = Trainer(cfg2)
    tr2.train()
    final_step = int(tr2.state.step)

    step_fn_before = rec._step
    assert rec.refresh() is True
    assert rec._restored_step == final_step
    assert rec._step is step_fn_before       # jit entry reused, no rebuild
    after = rec.for_users(users, seen=seen)
    fresh = Recommender(cfg, serve_batch=16).for_users(users, seen=seen)
    assert (after == fresh).all()


def test_refresh_on_mesh(tmp_path):
    """refresh() through the sharded restore path: abstract re-targeting
    must keep the mesh state shardings (restore_latest → _maybe_restore →
    tree_put_replicated) and the sharded serve step must be reused."""
    from dataclasses import replace

    from arec.config import MeshConfig
    cfg = _cfg(tmp_path, "mf")
    cfg = Config(data=cfg.data, model=cfg.model, train=cfg.train,
                 mesh=MeshConfig(data=2, model=4, lookup="alltoall"))
    Trainer(cfg).train()
    rec = Recommender(cfg, serve_batch=16)
    users = list(range(0, 32, 2))
    seen = _seen_lists(rec._trainer.ds, users)
    rec.for_users(users, seen=seen)
    cfg2 = Config(data=cfg.data, model=cfg.model,
                  train=replace(cfg.train, n_epoch=2), mesh=cfg.mesh)
    Trainer(cfg2).train()
    assert rec.refresh() is True
    after = rec.for_users(users, seen=seen)
    fresh = Recommender(cfg, serve_batch=16).for_users(users, seen=seen)
    assert (after == fresh).all()


def test_serve_cli_loop(tmp_path):
    """`python -m arec.serve` line protocol (round 5): responses must
    match direct API calls, commands work, bad lines answer !err without
    killing the loop, !quit ends it, and main() boots from a config file."""
    import io

    import arec.serve as serve_mod

    cfg = _cfg(tmp_path, "mf")
    Trainer(cfg).train()
    rec = Recommender(cfg)
    inp = io.StringIO("3\n5\t7,9\n!step\nbogus line\n!refresh\n!quit\n99\n")
    out = io.StringIO()
    assert serve_mod._serve_loop(rec, inp, out) == 0
    lines = out.getvalue().strip().split("\n")
    assert lines[0] == "3\t" + ",".join(
        map(str, rec.for_users([3])[0].tolist()))
    assert lines[1] == "5\t" + ",".join(
        map(str, rec.for_users([5], seen=[[7, 9]])[0].tolist()))
    assert 7 not in [int(x) for x in lines[1].split("\t")[1].split(",")]
    assert lines[2] == f"!ok step {rec._restored_step}"
    assert lines[3].startswith("!err")
    assert lines[4] == f"!ok current step {rec._restored_step}"
    assert len(lines) == 5                     # nothing served after !quit

    # sequence family: a history line is both input and exclusion list
    cfg2 = _cfg(tmp_path, "lstm")
    Trainer(cfg2).train()
    rec2 = Recommender(cfg2)
    out2 = io.StringIO()
    assert serve_mod._serve_loop(rec2, io.StringIO("4,8,15\n"), out2) == 0
    got = out2.getvalue().strip()
    want = rec2.from_histories([[4, 8, 15]])[0].tolist()
    assert got == "4,8,15\t" + ",".join(map(str, want))
    assert not {4, 8, 15} & {int(x) for x in got.split("\t")[1].split(",")}

    # main(): boots from a config file, greets, serves, quits
    cfile = tmp_path / "serve_cfg.json"
    cfile.write_text(cfg.to_json())
    out3 = io.StringIO()
    rc = serve_mod.main(["--config", str(cfile)],
                        inp=io.StringIO("3\n!quit\n"), out=out3)
    assert rc == 0
    l3 = out3.getvalue().strip().split("\n")
    assert l3[0].startswith("!ok serving")
    assert l3[1] == lines[0]


def test_serve_latents_dtype_parity(tmp_path):
    """serve_latents_dtype="compute" (bf16-at-rest item matrix, the
    measured round-4 default) must serve BIT-IDENTICAL ids to the legacy
    f32 residency — the top-k sweep casts to compute_dtype either way,
    this knob only moves the cast out of the per-call path. Covers
    evaluate() too (same _item_latents)."""
    from dataclasses import replace
    cfg = _cfg(tmp_path, "mf")
    tr = Trainer(cfg)
    tr.train()
    users = list(range(0, 60, 3))
    seen = _seen_lists(tr.ds, users)
    out = {}
    ev = {}
    for mode in ("compute", "float32"):
        c = replace(cfg, train=replace(cfg.train, serve_latents_dtype=mode))
        t2 = Trainer(c, serve_only=True)
        ev[mode] = t2.evaluate()
        out[mode] = Recommender(c, serve_batch=16).for_users(
            users, seen=seen)
    assert (out["compute"] == out["float32"]).all()
    assert ev["compute"] == ev["float32"]
