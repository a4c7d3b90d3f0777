"""Round-3 verdict repro: sparse_update × {warp,bpr} under sampler=log_uniform
must match the dense oracle exactly (it silently diverged before the round-4
fix — max param delta 0.155 after ONE step). Run on CPU.

Usage: python tools/repro_sparse_loss.py
Prints max param delta per (loss, sampler); exits nonzero on any mismatch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.dataset import mf_batches
from arec.data.io import load_or_prepare
from arec.models import mf as mf_mod
from arec.tables.engine import attrs_to_device
from arec.train.sparse import (
    init_sparse_state, make_sparse_train_step, table_paths, unpack_params,
)
from arec.train.step import init_state, make_optimizer, make_train_step

fail = False
for loss in ("ce", "warp", "bpr", "mw", "bbpr"):
    for sampler in ("log_uniform", "uniform"):
        cfg = Config(
            data=DataConfig(syn_users=300, syn_items=2000,
                            syn_interactions=6000,
                            data_dir="/tmp/repro_sparse_data"),
            model=ModelConfig(model="mf", dim=16, use_attributes=True,
                              dense_vocab_threshold=0),
            train=TrainConfig(batch_size=64, num_sampled=128, loss=loss,
                              sampler=sampler, compute_dtype="float32",
                              learning_rate=0.2),
        )
        ds = load_or_prepare(cfg.data)
        spec = mf_mod.MFSpec.from_config(cfg, ds.user_schema, ds.item_schema)
        params = mf_mod.init_mf(jax.random.key(0), spec)
        user_dev = attrs_to_device(
            ds.user_attrs.restrict(spec.user.schema), spec.user)
        item_dev = attrs_to_device(
            ds.item_attrs.restrict(spec.item.schema), spec.item)
        opt = make_optimizer("adagrad", cfg.train.learning_rate)

        dense_step = make_train_step(
            lambda p, b, r: mf_mod.mf_loss(p, spec, user_dev, item_dev, b, r),
            opt, cfg.train.learning_rate, donate=False)
        d_state = init_state(params, opt)
        sparse_step = make_sparse_train_step(
            False, spec, user_dev, item_dev, opt, cfg.train.learning_rate,
            "adagrad")
        s_state = init_sparse_state(params, table_paths(False, spec), opt,
                                    "adagrad")

        batch = next(iter(mf_batches(ds, cfg.train.batch_size, 0, 0)))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        rng = jax.random.key(7)
        d_state, dm = dense_step(d_state, jb, rng)
        s_state, sm = sparse_step(s_state, jb, rng)
        sp = unpack_params(s_state.params, table_paths(False, spec))
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), d_state.params, sp)
        mx = max(jax.tree_util.tree_leaves(deltas))
        ok = mx < 1e-6
        fail |= not ok
        print(f"loss={loss:5s} sampler={sampler:12s} "
              f"dense={float(dm['loss']):.6f} sparse={float(sm['loss']):.6f} "
              f"max_param_delta={mx:.3e} {'OK' if ok else 'FAIL'}")

sys.exit(1 if fail else 0)
