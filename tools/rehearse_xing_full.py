"""XING-true-scale rehearsal (BASELINE.md round-3): U=1.5M, V=1.3M,
deg-12 mulhot tags over a 4096 gather-vocab, dim 128 — the real c4/c5
cardinalities, measured instead of asserted.

Modes:
  python tools/rehearse_xing_full.py --tpu        # real chip, single dev:
      prep timing, sparse vs dense train throughput, peak HBM, eval rate +
      recall (capped batches), retrieval qps exact+approx @ V=1.3M,
      checkpoint size/time
  AREC_FAKE_DEVICES=8 python tools/rehearse_xing_full.py --mesh-cpu
      # (2,4) fake mesh at FULL cardinality: sparse-mesh steps execute,
      # exchange + touched-rows updates at scale (few steps, no eval)

One JSON line per measurement; run ONE TPU process at a time under
`timeout`, unbuffered (CLAUDE.md measurement discipline)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_fake = int(os.environ.get("AREC_FAKE_DEVICES", "0"))
if _fake > 1:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={_fake}")
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from arec.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from arec.config import Config  # noqa: E402

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "syn_xing_full.json")


def rec(**kw):
    kw["t"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    if "--small" not in sys.argv and jax.default_backend() == "tpu":
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_RUNS.jsonl"),
                "a") as f:
            f.write(json.dumps(kw) + "\n")


def hbm_peak_gb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 2**30, 3)
    except Exception:
        return None


def _prep(cfg):
    from arec.data.io import load_or_prepare
    t0 = time.time()
    ds = load_or_prepare(cfg.data)
    rec(metric="xing_full_prep_s", value=round(time.time() - t0, 1),
        users=ds.num_users, items=ds.num_items,
        interactions=int(len(ds.train_users)),
        seen_width=int(ds.seen_items.shape[1]),
        hist_width=int(ds.hist_items.shape[1]),
        valid_rows=int(len(ds.valid_users)))
    return ds


def _bench_train(tr, label, n_dispatch=8, warmup=2):
    """Median-of-windows over K-dispatch blocks through the Trainer's own
    step functions."""
    K = tr.dispatch_k
    base = jax.random.key(123)
    blocks, cur = [], []
    for b in tr._batches(0):
        cur.append({k: jnp.asarray(v) for k, v in b.items()})
        if len(cur) == K:
            # Trainer staging attaches the attribute maps under DEVS_KEY so
            # they enter the jit as arguments (raw batches here reproduced
            # the closure-constant 413 at full scale)
            blocks.append(tr._stage_stacked(cur) if K > 1
                          else tr._stage_batch(cur[0]))
            cur = []
        if len(blocks) == 2:
            break
    step = 0
    state = tr.state
    fn = tr.multi_step_fn if K > 1 else tr.step_fn
    def run(st, blk, s0):
        if K > 1:
            rngs = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(s0, s0 + K))
            return fn(st, blk, rngs)
        return fn(st, blk, jax.random.fold_in(base, s0))
    for w in range(warmup):
        state, m = run(state, blocks[w % 2], step); step += K
    lv = m["loss"][-1] if K > 1 else m["loss"]
    assert np.isfinite(float(lv)), float(lv)   # readback sync (lazy dispatch)
    jax.block_until_ready(state.params)
    times = []
    for w in range(n_dispatch):
        t0 = time.perf_counter()
        state, m = run(state, blocks[w % 2], step); step += K
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    prof = None
    for i, a in enumerate(sys.argv):
        if a == "--profile" and i + 1 < len(sys.argv):
            prof = sys.argv[i + 1]
    if prof:
        with jax.profiler.trace(prof):
            state, m = run(state, blocks[0], step); step += K
            jax.block_until_ready(state.params)
        rec(metric=f"xing_full_{label}_trace", dir=prof)
    bsz = tr.cfg.train.batch_size
    c = tr.cfg
    rec(metric=f"xing_full_{label}_examples_per_s_per_chip",
        value=round(bsz * K / med / max(jax.local_device_count(), 1), 1),
        unit="examples/s/chip", step_ms=round(med / K * 1e3, 2),
        config=f"U{c.data.syn_users} V{c.data.syn_items} "
               f"dim{c.model.dim} S{c.train.num_sampled} batch{bsz} K{K}",
        peak_hbm_gb=hbm_peak_gb())
    tr.state = state
    return state


def _bench_eval(tr, max_batches=200):
    from arec.data.dataset import eval_batches
    fam = "lstm_" if tr.is_seq else ""
    L = tr.spec.pack_len if tr.is_seq else 0
    params = tr._eval_params()
    t0 = time.time()
    v, b = tr._item_latents(params)
    v, b = jax.block_until_ready((v, b))
    rec(metric=f"xing_full_{fam}item_latents_s",
        value=round(time.time() - t0, 2))
    step = tr._eval_step(tr.cfg.train.eval_topk)
    hits = total = 0.0
    n = 0
    t0 = time.time()
    for batch in eval_batches(tr.ds, 256, max_seq_len=L):
        jb, seen = tr._stage_eval(batch, tr.ds.seen_items[batch["user"]])
        h, t = step(params, v, b, jb, seen)
        hits += float(h); total += float(t); n += 1
        if n == 1:
            t0 = time.time()   # drop the compile from the rate
        if n >= max_batches:
            break
    dt = time.time() - t0
    rec(metric=f"xing_full_{fam}eval_users_per_s",
        value=round((n - 1) * 256 / dt, 1),
        batches=n, partial_recall_at_30=round(hits / max(total, 1), 5),
        peak_hbm_gb=hbm_peak_gb())
    return v, b


def _bench_retrieval(v, b):
    from arec.retrieval.mips import blocked_topk_mips
    QB, SW = 1024, 64
    k = jax.random.key(5)
    q = jax.random.normal(jax.random.fold_in(k, 0), (QB, v.shape[1]),
                          jnp.float32)
    seen = jax.random.randint(jax.random.fold_in(k, 1), (QB, SW), 0,
                              v.shape[0])
    for mode, rt in (("exact", 1.0), ("approx95", 0.95)):
        # blocked_topk_mips is itself jitted; arrays go in as ARGUMENTS
        # (a closure would inline V=1.3M of latents into the HLO as
        # constants — remote-compile 413 / constant-folding stall)
        tk = lambda rt=rt: blocked_topk_mips(q, v, b, seen, k=30,
                                             recall_target=rt)
        float(jnp.asarray(tk()[0]).ravel()[0])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(2):
                r = tk()
            float(jnp.asarray(r[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        med = sorted(times)[2] / 2
        rec(metric=f"xing_full_retrieval_top30_{mode}_qps",
            value=round(QB / med, 1), config=f"V={v.shape[0]} dim{v.shape[1]}"
            f" batch{QB} seen{SW}", peak_hbm_gb=hbm_peak_gb())


def _bench_ckpt(tr):
    t0 = time.time()
    tr.ckpt.save(int(tr.state.step), tr._canonical_state(tr.state),
                 {"epoch": 0, "step_in_epoch": 0}, tr.cfg.to_json())
    dt = time.time() - t0
    total = 0
    for root, _, files in os.walk(tr.ckpt.path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    rec(metric="xing_full_ckpt", save_s=round(dt, 1),
        size_gb=round(total / 2**30, 3))


def main():
    cfg = Config.from_json(open(CFG).read())
    if "--small" in sys.argv:   # script shakeout at 1/100 scale (CPU ok)
        cfg = cfg.override({
            "data.syn_users": "15000", "data.syn_items": "13000",
            "data.syn_interactions": "120000", "data.syn_tag_vocab": "1024",
            "train.batch_size": "512", "train.num_sampled": "256",
            "train.train_dir": "_train/syn_xf_small"})
    if "--mesh-cpu" in sys.argv:
        cfg = cfg.override({"train.train_dir": "_train/syn_xf_cpu",
                            "train.steps_per_dispatch": "1",
                            "train.batch_size": "1024"})
        # --set works here too (e.g. --set model.model=lstm executes the
        # c4 family's sparse-mesh step at full cardinality on the CPU mesh)
        ov = {}
        for i, a in enumerate(sys.argv):
            if a == "--set" and i + 1 < len(sys.argv):
                k, _, v = sys.argv[i + 1].partition("=")
                ov[k] = v
        if ov:
            cfg = cfg.override(ov)
        from arec.train.loop import Trainer
        _prep(cfg)
        t0 = time.time()
        tr = Trainer(cfg)
        rec(metric="xing_full_cpu_mesh_init_s", value=round(time.time() - t0, 1))
        base = jax.random.key(9)
        state = tr.state
        for i, b in zip(range(3), tr._batches(0)):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            t0 = time.time()
            state, m = tr.step_fn(state, jb, jax.random.fold_in(base, i))
            jax.block_until_ready(state.params)
            rec(metric="xing_full_cpu_mesh_step", i=i,
                loss=round(float(m["loss"]), 4),
                step_s=round(time.time() - t0, 1))
        print("MESH-CPU OK", flush=True)
        return

    # --tpu: single chip
    cfg = cfg.override({"mesh.data": "1", "mesh.model": "1",
                        "train.train_dir": "_train/syn_xf_tpu"})
    if "--model" in sys.argv:
        fam = sys.argv[sys.argv.index("--model") + 1]
        if fam == "lstm":   # the c4 shape: attr-aware LSTM at XING scale
            cfg = cfg.override({
                "model.model": "lstm", "model.max_seq_len": "30",
                "model.use_pallas_scan": "true",
                "train.batch_size": "2048",
                "train.train_dir": "_train/syn_xf_tpu_lstm"})
    # generic config overrides: --set section.field=value (repeatable) —
    # e.g. --set train.loss=mw --set train.batch_ht=true certifies the
    # round-4 HT batch loss at true scale
    ov = {}
    for i, a in enumerate(sys.argv):
        if a == "--set" and i + 1 < len(sys.argv):
            k, _, v = sys.argv[i + 1].partition("=")
            ov[k] = v
    if ov:
        cfg = cfg.override(ov)
    from arec.train.loop import Trainer
    ds = _prep(cfg)
    t0 = time.time()
    tr = Trainer(cfg)
    rec(metric="xing_full_trainer_init_s", value=round(time.time() - t0, 1),
        peak_hbm_gb=hbm_peak_gb())
    fam_tag = "lstm_sparse" if cfg.model.model == "lstm" else "sparse"
    if cfg.train.loss != "ce":
        fam_tag += "_" + cfg.train.loss + ("_ht" if cfg.train.batch_ht
                                           else "")
    _bench_train(tr, fam_tag)
    if "--only-train" in sys.argv:
        print("TPU OK", flush=True)
        return
    v, b = _bench_eval(tr)
    _bench_retrieval(v, b)
    if "--no-ckpt" not in sys.argv:
        _bench_ckpt(tr)
    if "--dense-too" in sys.argv:
        cfg_d = cfg.override({"train.sparse_update": "false",
                              "train.train_dir": "_train/syn_xf_tpu_d"})
        tr_d = Trainer(cfg_d)
        _bench_train(tr_d, "dense", n_dispatch=4)
    print("TPU OK", flush=True)


if __name__ == "__main__":
    main()
