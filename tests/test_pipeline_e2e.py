"""Full-pipeline rehearsals on reference-format RAW fixtures: raw dump →
prep → schema → Trainer → eval → recommend → serve, through the exact
config shapes of the graded c2 (attr MF on ML-1M) and c4 (attr LSTM on
XING) runs. The real dumps are absent in this environment (BASELINE.md
"Evidence status"); these lock the ENTIRE path a real dump would take, so
pointing data.raw_dir at the true files is the only remaining variable.
"""

import numpy as np
import pytest

from arec.config import Config, DataConfig, ModelConfig, TrainConfig
from arec.data.io import load_or_prepare
from arec.serve import Recommender
from arec.train.loop import Trainer

from tests.test_prep import ml1m_raw, xing_raw  # noqa: F401  (fixtures)


def _train_cfg(model, raw_dir, dataset, tmp_path, **model_kw):
    return Config(
        data=DataConfig(dataset=dataset, raw_dir=raw_dir,
                        data_dir=str(tmp_path / "art"), vocab_min_thresh=1),
        model=ModelConfig(model=model, dim=16, use_attributes=True,
                          max_seq_len=8, use_pallas_scan=False, **model_kw),
        train=TrainConfig(batch_size=16, num_sampled=8, n_epoch=2,
                          steps_per_checkpoint=100, eval_topk=5,
                          train_dir=str(tmp_path / "t")),
    )


def test_ml1m_raw_to_serving(ml1m_raw, tmp_path):  # noqa: F811
    """c2 shape: attribute-aware hybrid MF on ML-1M-format raw files."""
    cfg = _train_cfg("mf", ml1m_raw, "ml1m", tmp_path)
    ds = load_or_prepare(cfg.data)
    assert ds.num_users > 0 and ds.num_items > 0
    tr = Trainer(cfg)
    out = tr.train()
    assert np.isfinite(out["recall_at_k"])
    rows = tr.recommend(out_path=str(tmp_path / "sub.tsv"))
    assert rows and all(len(r[1]) == cfg.train.eval_topk for r in rows)
    # ad-hoc serving against the same artifacts
    rec = Recommender(cfg, serve_batch=8)
    ids = rec.for_users([0, 1, 2])
    assert ids.shape == (3, cfg.train.eval_topk)
    assert (ids < ds.num_items).all() and (ids >= 0).all()


def test_xing_raw_to_serving(xing_raw, tmp_path):  # noqa: F811
    """c4 shape: attribute-aware LSTM sequence model on XING-format raw
    files (type filter, dedupe, temporal split, cat+mulhot both sides)."""
    cfg = _train_cfg("lstm", xing_raw, "xing", tmp_path)
    ds = load_or_prepare(cfg.data)
    assert ds.num_users > 0 and ds.num_items > 0
    tr = Trainer(cfg)
    out = tr.train()
    assert np.isfinite(out["recall_at_k"])
    rows = tr.recommend()
    assert rows and all(len(r[1]) == cfg.train.eval_topk for r in rows)
    rec = Recommender(cfg, serve_batch=8)
    ids = rec.from_histories([[0, 1], [2]])
    assert ids.shape == (2, cfg.train.eval_topk)
    assert (ids < ds.num_items).all() and (ids >= 0).all()
