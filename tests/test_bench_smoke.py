"""Smoke the bench_all harness sections tiny on CPU: guards the harness
against API drift (a with_bias regression in the directly-constructed
bigvocab specs once broke bench_mf_bigvocab without any test noticing)."""

import sys

import pytest


@pytest.fixture(scope="module")
def bench_all():
    import bench_all as ba
    return ba


def test_flagship_sections_run_tiny(bench_all, tmp_path):
    """The mf/lstm sections now K-scan their dispatches (_stack_ring /
    _ms_last / make_multi_step plumbing); smoke them tiny so API drift in
    that path can't ship unnoticed."""
    from arec.config import DataConfig
    from arec.data.io import load_or_prepare
    from arec.train.step import make_optimizer

    ds = load_or_prepare(DataConfig(
        dataset="synthetic", data_dir=str(tmp_path),
        syn_users=300, syn_items=200, syn_interactions=6000))
    out = []
    bench_all.bench_mf(out, ds, make_optimizer("adagrad", 0.3),
                       batch=64, iters=2, num_sampled=32, kdisp=2)
    bench_all.bench_lstm(out, ds, make_optimizer("adagrad", 0.3),
                         batch=16, seq_len=8, iters=2, num_sampled=32,
                         kdisp=2, use_pallas=False)
    metrics = [r["metric"] for r in out]
    assert metrics == ["mf_train_examples_per_s_per_chip",
                       "lstm_train_examples_per_s_per_chip",
                       "lstm_train_positions_per_s_per_chip"], metrics
    assert all(r["value"] > 0 for r in out)
    assert "K2" in out[0]["config"] and "K2" in out[1]["config"]


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


def test_serve_section_runs_tiny(bench_all, tmp_path):
    """The round-5 serve section: builds+caches a checkpoint, restores a
    Recommender, measures for_users qps. Smoke tiny on CPU — then a
    SECOND call must reuse the cached checkpoint (no retraining)."""
    import os
    out = []
    kw = dict(nu=300, ni=250, n_inter=6000, mulhot_degree=0,
              serve_batch=16, iters=2,
              train_dir=str(tmp_path / "t"), data_dir=str(tmp_path / "d"))
    bench_all.bench_serve(out, **kw)
    assert out[0]["metric"] == "serve_approx95_qps"
    assert out[0]["value"] > 0
    ckpts = set(os.listdir(tmp_path / "t" / "ckpt"))
    bench_all.bench_serve(out, **kw)          # cached: restore only
    assert set(os.listdir(tmp_path / "t" / "ckpt")) == ckpts
    assert out[1]["value"] > 0


def test_check_floors_gates_serve_metric(bench_all, tmp_path):
    """An injected serve-path regression must fail `--check` through both
    gates (VERDICT r4 task 4 'done' criterion)."""
    import json
    fp = tmp_path / "floors.json"
    rfp = tmp_path / "ratio_floors.json"
    fp.write_text(json.dumps(
        {"serve_approx95_qps": {"floor": 15000.0, "best": 45000.0}}))
    rfp.write_text(json.dumps({"serve_approx95_qps": {"floor": 100.0}}))
    ok = [{"metric": "serve_approx95_qps", "value": 40000.0,
           "ref_rate": 400.0, "ratio": 100.0}]
    assert bench_all.check_floors(ok, str(fp),
                                  ratio_floors_path=str(rfp)) == []
    # padding/jit-cache regression in calm weather: absolute gate still
    # passes (14k > 0.8·15k fails actually) — use 16k to isolate the ratio
    reg = [{"metric": "serve_approx95_qps", "value": 16000.0,
            "ref_rate": 400.0, "ratio": 40.0}]
    fails = bench_all.check_floors(reg, str(fp),
                                   ratio_floors_path=str(rfp))
    assert len(fails) == 1 and "ratio" in fails[0]
    # absolute cliff fails the absolute gate too
    cliff = [{"metric": "serve_approx95_qps", "value": 4000.0,
              "ref_rate": 400.0, "ratio": 10.0}]
    assert len(bench_all.check_floors(cliff, str(fp),
                                      ratio_floors_path=str(rfp))) == 2


def test_check_floors_gate(bench_all, tmp_path):
    """bench_all --check semantics: >20% below floor fails, within passes,
    unknown metrics are ignored, missing floors file reports itself."""
    import json
    fp = tmp_path / "floors.json"
    fp.write_text(json.dumps({
        "_note": "test",
        "m_a": {"floor": 100.0, "best": 300.0, "n_runs": 3},
        "m_b": {"floor": 50.0, "best": 150.0, "n_runs": 2},
    }))
    out = [{"metric": "m_a", "value": 85.0},     # within 20% of floor: ok
           {"metric": "m_b", "value": 39.0},     # 22% below floor: fail
           {"metric": "unknown", "value": 1.0}]  # no floor: ignored
    fails = bench_all.check_floors(out, str(fp))
    assert len(fails) == 1 and "m_b" in fails[0]
    assert bench_all.check_floors(out[:1], str(fp)) == []
    assert bench_all.check_floors(out, str(tmp_path / "nope.json"))


def test_check_floors_ratio_gate(bench_all, tmp_path):
    """The weather-normalized ratio gate (VERDICT r3 weak #4): a genuine
    ~1.3x code regression fails the ratio gate even when the absolute
    best/3 floor still passes (tunnel-weather slack); a weather slowdown
    scaling metric AND ref together does not."""
    import json
    fp = tmp_path / "floors.json"
    rfp = tmp_path / "ratio_floors.json"
    # best/3 floor = 100 (best 300); ratio floor recorded at best ratio 3.0
    fp.write_text(json.dumps({"m": {"floor": 100.0, "best": 300.0}}))
    rfp.write_text(json.dumps({"m": {"floor": 3.0}}))

    # healthy run, calm weather: value 300, ref 100 → ratio 3.0
    ok = [{"metric": "m", "value": 300.0, "ref_rate": 100.0, "ratio": 3.0}]
    assert bench_all.check_floors(ok, str(fp),
                                  ratio_floors_path=str(rfp)) == []
    # 1.3x CODE regression in calm weather: value 230 passes the absolute
    # gate (230 > 0.8*100) but ratio 2.3 < 0.8*3.0 → FAIL
    reg = [{"metric": "m", "value": 230.0, "ref_rate": 100.0, "ratio": 2.3}]
    fails = bench_all.check_floors(reg, str(fp), ratio_floors_path=str(rfp))
    assert len(fails) == 1 and "ratio" in fails[0]
    # 2x tunnel-weather slowdown scales BOTH: value 150, ref 50 → ratio 3.0
    # passes the ratio gate (and the loose absolute gate)
    weather = [{"metric": "m", "value": 150.0, "ref_rate": 50.0,
                "ratio": 3.0}]
    assert bench_all.check_floors(weather, str(fp),
                                  ratio_floors_path=str(rfp)) == []
    # records without a ratio (e.g. CPU smoke) skip the ratio gate
    plain = [{"metric": "m", "value": 300.0}]
    assert bench_all.check_floors(plain, str(fp),
                                  ratio_floors_path=str(rfp)) == []
    # ratio measured against a DIFFERENT ref kind than the floor: skipped
    # (different populations — round-5 matmul→topk transition safety)
    rfp2 = tmp_path / "ratio_floors2.json"
    rfp2.write_text(json.dumps({"m": {"floor": 3.0, "ref_kind": "topk"}}))
    crossref = [{"metric": "m", "value": 300.0, "ref_rate": 100.0,
                 "ratio": 1.0}]   # ratio vs matmul; floor is vs topk
    assert bench_all.check_floors(crossref, str(fp),
                                  ratio_floors_path=str(rfp2)) == []
    matched = [{"metric": "m", "value": 300.0, "ref_rate": 100.0,
                "ratio": 1.0, "ref_kind": "topk"}]
    assert len(bench_all.check_floors(matched, str(fp),
                                      ratio_floors_path=str(rfp2))) == 1


def test_update_ratio_floors_provenance():
    """tools/update_ratio_floors.py (round 5): floor = MEDIAN of the
    canonical history for the metric's current ref kind (robust to
    ref-collapse outliers in either direction — the mf_train 1.43x
    inflated-ratio finding); spread > 1.25 is flagged as ref-workload
    decorrelation; a ref change re-records from the new population."""
    import sys
    sys.path.insert(0, "tools")
    from update_ratio_floors import build_floors

    history = {"m": ("matmul", [3.0, 3.2, 2.5]),
               "fresh": ("matmul", [7.0])}
    old = {"_note": "x", "m": {"floor": 3.5, "n_runs": 3},
           "legacy_only": {"floor": 9.0, "n_runs": 2}}
    floors, flagged = build_floors(history, old)
    assert floors["m"]["floor"] == 3.0          # median — the stale 3.5
    assert floors["m"]["n_runs"] == 3           # floor does not persist
    assert floors["m"]["ratio_min"] == 2.5
    assert floors["m"]["ratio_max"] == 3.2
    assert floors["m"]["spread"] == round(3.2 / 2.5, 3)
    assert "m" in flagged                        # 1.28 > 1.25 decorrelation
    assert floors["fresh"]["floor"] == 7.0       # single run = its median
    assert floors["legacy_only"]["floor"] == 9.0  # kept without history
    # an inflated-ratio outlier (ref collapse) cannot poison the floor
    poisoned, _ = build_floors(
        {"m": ("matmul", [3.0, 3.1, 2.9, 5.1])}, old)
    assert poisoned["m"]["floor"] == round((3.0 + 3.1) / 2, 3)
    # a REF CHANGE re-records from the new-ref population only (the
    # round-5 matmul→topk switch): the old floor must not carry over
    switched, _ = build_floors({"m": ("topk", [120.0, 110.0])}, old)
    assert switched["m"]["floor"] == 115.0
    assert switched["m"]["ref_kind"] == "topk"
    assert switched["m"]["n_runs"] == 2


def test_canonical_ratios_uses_current_ref_population(tmp_path):
    """canonical_ratios: a metric's population is the ratios against its
    CURRENT (latest) ref kind; older-ref and non-canonical records are
    excluded."""
    import json
    import sys
    sys.path.insert(0, "tools")
    from update_ratio_floors import canonical_ratios

    p = tmp_path / "runs.jsonl"
    rows = [
        {"metric": "m", "ratio": 300.0, "kdisp": 64},               # matmul
        {"metric": "m", "ratio": 310.0, "kdisp": 8},                # not canon
        {"metric": "m", "ratio": 100.0, "kdisp": 64, "ref_kind": "topk"},
        {"metric": "m", "ratio": 110.0, "kdisp": 64, "ref_kind": "topk"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    got = canonical_ratios(str(p))
    assert got["m"] == ("topk", [100.0, 110.0])


def test_check_forces_canonical_invocation_shape():
    """--check must not gate a --quick/odd-kdisp run against floors
    recorded at K64/full iters (round-4 finding: every gate failed
    spuriously at K8-quick while the graded bench sat at its record)."""
    import bench_all
    # mismatched shapes are forced to canonical
    assert bench_all.canonicalize_for_check(True, True, 8, 10) == (
        False, 64, 50, True)
    assert bench_all.canonicalize_for_check(True, False, 8, 50) == (
        False, 64, 50, True)
    # already canonical: untouched
    assert bench_all.canonicalize_for_check(True, False, 64, 50) == (
        False, 64, 50, False)
    # no --check: measurement runs keep whatever the user asked for
    assert bench_all.canonicalize_for_check(False, True, 8, 10) == (
        True, 8, 10, False)
