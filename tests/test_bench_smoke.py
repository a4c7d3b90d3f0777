"""Smoke the bench_all harness sections tiny on CPU: guards the harness
against API drift (a with_bias regression in the directly-constructed
bigvocab specs once broke bench_mf_bigvocab without any test noticing)."""

import sys

import pytest


@pytest.fixture(scope="module")
def bench_all():
    import bench_all as ba
    return ba


def test_bigvocab_sections_run_tiny(bench_all):
    from arec.train.step import make_optimizer
    opt = make_optimizer("adagrad", 0.3)
    out = []
    bench_all.bench_mf_bigvocab(out, opt, nu=500, ni=300, batch=64, iters=2)
    opt = make_optimizer("adagrad", 0.3)
    bench_all.bench_lstm_bigvocab(out, opt, ni=300, batch=16, iters=2)
    metrics = {r["metric"] for r in out}
    assert metrics == {
        "mf_bigvocab_dense_examples_per_s_per_chip",
        "mf_bigvocab_sparse_examples_per_s_per_chip",
        "lstm_bigvocab_dense_seqs_per_s_per_chip",
        "lstm_bigvocab_sparse_seqs_per_s_per_chip",
    }, metrics
    assert all(r["value"] > 0 for r in out)
