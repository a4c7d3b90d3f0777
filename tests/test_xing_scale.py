"""Scaled-down rehearsal of the XING-true-scale path (configs/
syn_xing_full.json): the SAME code path — big-generator prep (deg-12
mulhot over a gather-vocab), sparse-mesh training, sharded eval, serving —
at 1/100 cardinality so CI covers what the real-chip rehearsal runs
(BASELINE.md "XING-true-scale rehearsal")."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from arec.config import Config
from arec.train.loop import Trainer

CFG_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "syn_xing_full.json")


def _scaled_cfg(tmp_path):
    cfg = Config.from_json(open(CFG_PATH).read())
    return cfg.override({
        "data.syn_users": 15000, "data.syn_items": 13000,
        "data.syn_interactions": 120000, "data.syn_tag_vocab": 1024,
        "data.data_dir": str(tmp_path / "d"),
        "train.batch_size": 256, "train.num_sampled": 256,
        "train.max_steps": 16, "train.steps_per_checkpoint": 8,
        "train.train_dir": str(tmp_path / "t"),
    })


def test_syn_xing_full_config_scaled_end_to_end(tmp_path):
    cfg = _scaled_cfg(tmp_path)
    assert cfg.train.sparse_update and cfg.mesh.model == 4
    tr = Trainer(cfg)
    # the deg-12 tag field must ride the GATHER path (vocab > threshold),
    # which is what makes this a faithful XING rehearsal
    assert any(f.name == "user_tags" and f.vocab_size == 1024
               for f in tr.spec.user.schema.fields)
    assert tr.spec.user.gather_mulhot_fields, "tags fell into the dense map"
    out = tr.train()
    assert out["steps"] == 16
    assert np.isfinite(out["recall_at_k"])

    # serving at the same scale (exact + approx selection)
    from arec.serve import Recommender
    rec = Recommender(cfg, serve_batch=64)
    ids = rec.for_users([1, 2, 3])
    assert ids.shape == (3, cfg.train.eval_topk)
    cfg_a = cfg.override({"train.serve_recall_target": "0.95"})
    rec_a = Recommender(cfg_a, serve_batch=64)
    ids_a = rec_a.for_users([1, 2, 3])
    assert ids_a.shape == (3, cfg.train.eval_topk)
