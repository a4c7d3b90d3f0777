"""Checkpoint round-trip + config serialization + CLI parsing
(SURVEY.md §5 "Checkpoint / resume", "Config / flag system")."""

import jax
import jax.numpy as jnp
import numpy as np

from arec.cli.main import load_config, parse_args
from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.train.checkpoint import Checkpointer, abstract_like
from arec.train.step import init_state, make_optimizer


def _tiny_state():
    params = {"tables": {"a": jnp.arange(12.0).reshape(6, 2)},
              "bias": jnp.ones((3,))}
    opt = make_optimizer("adagrad", 0.1)
    return opt, init_state(params, opt)


def test_checkpoint_roundtrip(tmp_path):
    opt, state = _tiny_state()
    ck = Checkpointer(str(tmp_path))
    ck.save(5, state, {"epoch": 2}, "{}")
    assert ck.latest_step() == 5
    got = ck.restore(abstract_like(state))
    assert got is not None
    restored, data_pos, cfg_json = got
    assert data_pos["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_keeps_latest(tmp_path):
    opt, state = _tiny_state()
    ck = Checkpointer(str(tmp_path), keep=2)
    for step in (1, 2, 3, 4):
        ck.save(step, state._replace(step=jnp.asarray(step, jnp.int32)),
                {"epoch": 0}, "{}")
    assert ck.latest_step() == 4
    restored, _, _ = ck.restore(abstract_like(state))
    assert int(restored.step) == 4


def test_config_json_roundtrip():
    cfg = Config(
        data=DataConfig(dataset="ml1m", item_vocab_size=100),
        model=ModelConfig(model="lstm", dim=48, cell="gru"),
        train=TrainConfig(loss="warp", num_sampled=99),
    )
    back = Config.from_json(cfg.to_json())
    assert back == cfg


def test_config_override_coercion():
    cfg = Config()
    out = cfg.override({"train.batch_size": "128", "model.dim": "32",
                        "data.user_sample": "0.5", "mesh.lookup": "gspmd"})
    assert out.train.batch_size == 128
    assert out.model.dim == 32
    assert abs(out.data.user_sample - 0.5) < 1e-9
    assert out.mesh.lookup == "gspmd"


def test_config_override_bool():
    out = Config().override({"model.use_attributes": "false"})
    assert out.model.use_attributes is False


def test_config_rejects_enum_typos():
    """serve_latents_dtype / act_dtype typos must fail at construction,
    not silently select a legacy path (advisor round 4)."""
    import pytest
    with pytest.raises(ValueError, match="serve_latents_dtype"):
        TrainConfig(serve_latents_dtype="bf16")
    with pytest.raises(ValueError, match="serve_latents_dtype"):
        Config().override({"train.serve_latents_dtype": "Compute"})
    with pytest.raises(ValueError, match="act_dtype"):
        TrainConfig(act_dtype="fp32")


def test_batch_ht_rejected_on_inapplicable_loss(tmp_path):
    """train.batch_ht only corrects the in-batch losses; on any other
    model/loss combination the Trainer must raise instead of silently
    ignoring the flag (advisor round 4)."""
    import pytest

    from arec.train.loop import Trainer
    cfg = Config(
        data=DataConfig(dataset="synthetic", data_dir=str(tmp_path / "d"),
                        syn_users=200, syn_items=150, syn_interactions=4000),
        model=ModelConfig(model="lstm", dim=16, use_attributes=False,
                          max_seq_len=8, use_pallas_scan=False),
        train=TrainConfig(batch_size=32, num_sampled=16, batch_ht=True,
                          loss="ce", train_dir=str(tmp_path / "t")),
    )
    with pytest.raises(ValueError, match="batch_ht"):
        Trainer(cfg)


def test_save_every_evals_decouples_save_cadence(tmp_path):
    """steps_per_checkpoint is the EVAL cadence; train.save_every_evals>1
    saves only every Nth eval event plus the final checkpoint (round 5 —
    at XING scale a save costs 90-200 s over the tunnel, an approx eval
    ~10 s, so dense recall curves must not pay a save per point)."""
    import json
    import os

    from arec.train.loop import Trainer
    cfg = Config(
        data=DataConfig(dataset="synthetic", data_dir=str(tmp_path / "d"),
                        syn_users=200, syn_items=150, syn_interactions=4000),
        model=ModelConfig(model="mf", dim=16, use_attributes=False),
        train=TrainConfig(batch_size=32, num_sampled=16, n_epoch=1,
                          max_steps=50, steps_per_checkpoint=10,
                          save_every_evals=3,
                          train_dir=str(tmp_path / "t")),
    )
    Trainer(cfg).train()
    saved = sorted(int(d) for d in os.listdir(tmp_path / "t" / "ckpt")
                   if d.isdigit())
    assert saved == [30, 50]     # every 3rd eval (step 30) + final (50)
    evals = [json.loads(line)["step"]
             for line in open(tmp_path / "t" / "metrics.jsonl")
             if "recall_at_k" in json.loads(line)]
    assert evals[:5] == [10, 20, 30, 40, 50]   # eval cadence unchanged


def test_cli_parse_and_load(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(Config().to_json())
    args = parse_args(["--config", str(p), "--set", "train.batch_size=32",
                       "--recommend", "--out", "x.tsv"])
    cfg = load_config(args)
    assert cfg.train.batch_size == 32
    assert args.recommend and args.out == "x.tsv"


def test_restore_across_mesh_shapes(tmp_path):
    """SURVEY.md §5: "restore onto a possibly different mesh shape via
    resharding". Tables are row-padded per mesh model-axis size, so the
    saved row counts differ between mesh shapes; the checkpointer must
    adapt (slice/zero-pad axis 0) and re-lay-out onto the new mesh."""
    from arec.config import MeshConfig
    from arec.tables.engine import FUSED
    from arec.train.loop import Trainer

    def cfg(mesh_data, mesh_model):
        return Config(
            data=DataConfig(syn_users=121, syn_items=93,
                            syn_interactions=2400,
                            data_dir=str(tmp_path / "data")),
            model=ModelConfig(model="mf", dim=8),
            train=TrainConfig(batch_size=32, n_epoch=2, max_steps=25,
                              steps_per_checkpoint=25,
                              compute_dtype="float32",
                              train_dir=str(tmp_path / "train")),
            mesh=MeshConfig(data=mesh_data, model=mesh_model),
        )

    t_a = Trainer(cfg(2, 2))
    t_a.train()  # checkpoints at step 25 (== max_steps)
    tab_a = np.asarray(t_a.state.params["item"]["tables"][FUSED])

    for mesh_data, mesh_model in ((1, 1), (1, 4)):
        t_b = Trainer(cfg(mesh_data, mesh_model))
        assert int(t_b.state.step) == 25, "checkpoint must restore"
        tab_b = np.asarray(t_b.state.params["item"]["tables"][FUSED])
        if mesh_model == 4:
            # rows ≡ 2 (mod 4) here, so padding genuinely differs: the
            # adaptation path (slice/zero-pad axis 0) must be exercised
            assert tab_a.shape[0] != tab_b.shape[0], (
                f"test vacuous: pick row counts where padding differs "
                f"({tab_a.shape} vs {tab_b.shape})")
        n = min(tab_a.shape[0], tab_b.shape[0])
        np.testing.assert_allclose(tab_a[:n], tab_b[:n], rtol=1e-6,
                                   atol=1e-7)
        # grown pad rows are zero; restored state must drive further steps
        if tab_b.shape[0] > n:
            np.testing.assert_array_equal(tab_b[n:], 0.0)
        batch = {k: jnp.asarray(v) for k, v in
                 next(iter(t_a._batches(0))).items()}
        state2, m = t_b.step_fn(t_b.state, batch, jax.random.key(9))
        assert np.isfinite(float(m["loss"]))


def test_resume_is_exact(tmp_path):
    """A run interrupted at a checkpoint and resumed must produce exactly
    the same parameters as an uninterrupted run: per-step rng is a pure
    function of the global step, and the checkpoint's step-in-epoch
    fast-forwards the deterministic iterator (SURVEY.md §5)."""
    from arec.train.loop import Trainer

    def cfg(train_dir, max_steps):
        return Config(
            data=DataConfig(syn_users=120, syn_items=90,
                            syn_interactions=2400,
                            data_dir=str(tmp_path / "data")),
            model=ModelConfig(model="mf", dim=8),
            train=TrainConfig(batch_size=32, n_epoch=2, max_steps=max_steps,
                              steps_per_checkpoint=25,
                              compute_dtype="float32",
                              train_dir=str(train_dir)),
        )

    # uninterrupted: 60 steps (crosses an epoch boundary at 2400/32=75/epoch)
    t_full = Trainer(cfg(tmp_path / "full", 60))
    t_full.train()

    # interrupted at the step-50 checkpoint, then resumed to 60
    t_a = Trainer(cfg(tmp_path / "resume", 50))
    t_a.train()
    t_b = Trainer(cfg(tmp_path / "resume", 60))
    assert int(t_b.state.step) == 50  # restored mid-epoch
    t_b.train()

    for pf, pr in zip(jax.tree_util.tree_leaves(t_full.state.params),
                      jax.tree_util.tree_leaves(t_b.state.params)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                                   rtol=1e-6, atol=1e-7)


def test_resume_restores_plateau_state(tmp_path):
    """Resuming from a MID-WINDOW (tail) checkpoint must reproduce the
    uninterrupted run's plateau-decay decisions: prev_loss and the open
    loss window ride the checkpoint metadata. Interrupt at step 30 (the
    tail checkpoint, 5 steps into the 25-step window) and resume to 75;
    the resumed run's next checkpoint at 50 then averages steps 26-50
    exactly like the uninterrupted run, so lr_scale and params match."""
    from arec.train.loop import Trainer

    def cfg(train_dir, max_steps):
        return Config(
            data=DataConfig(syn_users=120, syn_items=90,
                            syn_interactions=2400,
                            data_dir=str(tmp_path / "data")),
            model=ModelConfig(model="mf", dim=8),
            train=TrainConfig(batch_size=32, n_epoch=2, max_steps=max_steps,
                              steps_per_checkpoint=25, lr_decay=0.5,
                              compute_dtype="float32",
                              train_dir=str(train_dir)),
        )

    t_full = Trainer(cfg(tmp_path / "full", 75))
    t_full.train()

    t_a = Trainer(cfg(tmp_path / "resume", 30))   # tail ckpt mid-window
    t_a.train()
    t_b = Trainer(cfg(tmp_path / "resume", 75))
    assert int(t_b.state.step) == 30
    # the open window (steps 26-30) and prev_loss (mean of 1-25) restored
    assert len(t_b._resume_window) == 5
    assert t_b._resume_prev_loss is not None
    t_b.train()

    np.testing.assert_allclose(float(t_full.state.lr_scale),
                               float(t_b.state.lr_scale), rtol=0, atol=0)
    for pf, pr in zip(jax.tree_util.tree_leaves(t_full.state.params),
                      jax.tree_util.tree_leaves(t_b.state.params)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                                   rtol=1e-6, atol=1e-7)


def test_abstract_like_always_has_concrete_sharding():
    """With sharding=None leaves, orbax falls back to the sharding FILE in
    the checkpoint, which names the saving job's devices — restoring a
    TPU-written checkpoint in a CPU process then fails. abstract_like must
    therefore default every leaf to a concrete local sharding."""
    import jax

    from arec.train.checkpoint import abstract_like
    from arec.train.step import init_state, make_optimizer

    opt = make_optimizer("adagrad", 0.1)
    state = init_state({"t": jnp.zeros((4, 3))}, opt)
    abstract = abstract_like(state)
    for leaf in jax.tree_util.tree_leaves(
            abstract, is_leaf=lambda x: hasattr(x, "sharding")):
        assert getattr(leaf, "sharding", None) is not None


def test_async_ckpt_parity_and_resume(tmp_path):
    """train.async_ckpt: saves finalize on orbax's background thread but
    drain points (restore, final save, step check) make the semantics
    byte-identical to the synchronous default — same final params as a
    sync twin, and an interrupted async run resumes exactly."""
    from arec.train.loop import Trainer

    def cfg(train_dir, max_steps, async_ckpt):
        return Config(
            data=DataConfig(syn_users=120, syn_items=90,
                            syn_interactions=2400,
                            data_dir=str(tmp_path / "data")),
            model=ModelConfig(model="mf", dim=8),
            train=TrainConfig(batch_size=32, n_epoch=2, max_steps=max_steps,
                              steps_per_checkpoint=25,
                              compute_dtype="float32",
                              async_ckpt=async_ckpt,
                              train_dir=str(train_dir)),
        )

    t_sync = Trainer(cfg(tmp_path / "sync", 60, False))
    t_sync.train()
    t_async = Trainer(cfg(tmp_path / "async", 60, True))
    t_async.train()
    for a, b in zip(jax.tree_util.tree_leaves(t_sync.state.params),
                    jax.tree_util.tree_leaves(t_async.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the final (drained) checkpoint restores to the same step
    t_r = Trainer(cfg(tmp_path / "async", 60, True))
    assert int(t_r.state.step) == 60
    # interrupted async run resumes exactly against the sync twin
    t_a = Trainer(cfg(tmp_path / "resume_a", 50, True))
    t_a.train()
    t_b = Trainer(cfg(tmp_path / "resume_a", 60, True))
    assert int(t_b.state.step) == 50
    t_b.train()
    for a, b in zip(jax.tree_util.tree_leaves(t_sync.state.params),
                    jax.tree_util.tree_leaves(t_b.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
