"""XING-true-scale eval/serve measurements (VERDICT r3 tasks 7-8):

  --eval-batch : A/B exact-eval batch size 256 vs 1024 vs 2048 at V=1.3M,
                 interleaved in ONE process (the rehearsal's exact eval ran
                 1.4k users/s at batch 256 = dispatch-bound; the cheap
                 lever was never measured).
  --agreement  : exact vs approx (recall_target 0.95) top-30 id agreement
                 at V=1.3M (the 300k-vocab measurement was bit-identical;
                 verify at 4x the vocab).
  --latency    : p50/p99 per-dispatch serving latency through the REAL
                 Recommender (restore-only startup) at serve_batch {1, 256},
                 exact and approx.
  --latents-dtype : f32 vs compute-dtype (bf16) residency of the item
                 matrix (train.serve_latents_dtype A/B, round 4).
  --score-mem  : serve_score_mem_mb 512 vs 2048 under the bf16 residency.

Run ONE mode per TPU process, under timeout, unbuffered (CLAUDE.md).
Usage: python tools/ab_eval_serve.py --eval-batch|--agreement|--latency|
       --latents-dtype|--score-mem
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from arec.compile_cache import enable_compile_cache

enable_compile_cache()

from arec.config import Config

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "syn_xing_full.json")


def rec(**kw):
    kw["t"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    if jax.default_backend() == "tpu":
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_RUNS.jsonl"),
                "a") as f:
            f.write(json.dumps(kw) + "\n")


def _trainer():
    from arec.train.loop import Trainer
    cfg = Config.from_json(open(CFG).read()).override({
        "mesh.data": "1", "mesh.model": "1",
        "train.train_dir": "_train/syn_xf_tpu"})
    return Trainer(cfg)


def bench_eval_batch(pairs=3, batches_per_window=8):
    from arec.data.dataset import eval_batches
    tr = _trainer()
    params = tr._eval_params()
    v, b = jax.block_until_ready(tr._item_latents(params))
    step = tr._eval_step(30)
    sizes = (256, 1024, 2048)
    staged = {}
    for eb in sizes:
        bs = []
        for batch in eval_batches(tr.ds, eb):
            jb, seen = tr._stage_eval(batch, tr.ds.seen_items[batch["user"]])
            bs.append((jb, seen))
            if len(bs) >= max(2, batches_per_window * 256 // eb):
                break
        staged[eb] = bs
        h, t = step(params, v, b, *bs[0])      # compile this shape
        float(h)
        print(f"eval_batch={eb}: compiled", flush=True)
    res = {eb: [] for eb in sizes}
    for _ in range(pairs):
        for eb in sizes:
            bs = staged[eb]
            t0 = time.perf_counter()
            h = t = 0.0
            n = 0
            for jb, seen in bs:
                hh, tt = step(params, v, b, jb, seen)
                n += jb["user"].shape[0]
            float(hh)
            dt = time.perf_counter() - t0
            res[eb].append(n / dt)
    for eb in sizes:
        r = sorted(res[eb])
        rec(metric="xing_full_eval_users_per_s_ab", eval_batch=eb,
            value=round(r[len(r) // 2], 1),
            windows=[round(x, 1) for x in res[eb]])


def bench_agreement():
    from arec.retrieval.mips import blocked_topk_mips
    tr = _trainer()
    params = tr._eval_params()
    v, b = jax.block_until_ready(tr._item_latents(params))
    QB, SW = 1024, 64
    k = jax.random.key(5)
    # real encoded user queries (random params — geometry matches serving)
    uids = jax.random.randint(jax.random.fold_in(k, 0), (QB,), 0,
                              tr.ds.num_users, dtype=jnp.int32)
    from arec.models.mf import mf_user_latents
    q = mf_user_latents(params, tr.spec, tr.user_dev, uids)
    seen = jax.random.randint(jax.random.fold_in(k, 1), (QB, SW), 0,
                              v.shape[0])
    _, ids_e = blocked_topk_mips(q, v, b, seen, k=30, recall_target=1.0)
    _, ids_a = blocked_topk_mips(q, v, b, seen, k=30, recall_target=0.95)
    ids_e, ids_a = np.asarray(ids_e), np.asarray(ids_a)
    same_rows = float((ids_e == ids_a).all(axis=1).mean())
    overlap = float(np.mean([len(np.intersect1d(a, e)) / 30
                             for a, e in zip(ids_a, ids_e)]))
    rec(metric="xing_full_approx_top30_agreement", vocab=int(v.shape[0]),
        identical_rows_frac=round(same_rows, 5),
        mean_top30_overlap=round(overlap, 5))


def bench_latency():
    from arec.serve import Recommender
    tr = _trainer()
    # serving needs a checkpoint: save the random-init state once (restore
    # cost and scoring geometry match a trained model)
    if tr.ckpt.latest_step() is None:
        tr.ckpt.save(0, tr._canonical_state(tr.state),
                     {"epoch": 0, "step_in_epoch": 0}, tr.cfg.to_json())
        print("saved init checkpoint", flush=True)
    del tr
    import gc
    rng = np.random.default_rng(0)
    combos = [(t, sb) for t in (1.0, 0.95) for sb in (1, 256)]
    if "--approx-only" in sys.argv:
        combos = [(0.95, 256)]
    for target, sb in combos:
        if True:
            cfg = Config.from_json(open(CFG).read()).override({
                "mesh.data": "1", "mesh.model": "1",
                "train.train_dir": "_train/syn_xf_tpu",
                "train.serve_recall_target": str(target)})
            r = Recommender(cfg, serve_batch=sb, seen_width=64)
            users = rng.integers(0, 1_500_000, size=sb).astype(np.int32)
            seen = [list(rng.integers(0, 1_300_000, size=40))
                    for _ in range(sb)]
            r.for_users(users, seen=seen)          # compile + warm
            lats = []
            for _ in range(60):
                t0 = time.perf_counter()
                r.for_users(users, seen=seen)
                lats.append((time.perf_counter() - t0) * 1e3)
            lats.sort()
            rec(metric="xing_full_serve_latency_ms",
                mode=("exact" if target == 1.0 else "approx95"),
                serve_batch=sb,
                p50=round(lats[len(lats) // 2], 2),
                p90=round(lats[int(len(lats) * 0.9)], 2),
                p99=round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 2),
                qps=round(sb / (lats[len(lats) // 2] / 1e3), 1))
            # each Recommender holds ~4 GB of restored params + latents;
            # force collection before the next instance allocates (the 4th
            # instance OOM'd the 16 GB chip without this)
            del r
            gc.collect()


def bench_latents_dtype(windows=6):
    """train.serve_latents_dtype A/B at V=1.3M: the top-k sweep casts the
    item matrix to compute_dtype (bf16) INSIDE the jit on every call — if
    XLA re-reads the f32 source per query chunk, storing it bf16 at rest
    halves the sweep's HBM traffic (and its residency: 665→333 MB).
    Scores are bit-identical either way (same cast, moved). Interleaved
    same-process windows per the CLAUDE.md measurement protocol."""
    from arec.retrieval.mips import blocked_topk_mips
    from arec.models.mf import mf_user_latents
    tr = _trainer()
    params = tr._eval_params()
    v32, b = jax.block_until_ready(tr._item_latents(params))
    v16 = jax.block_until_ready(v32.astype(tr.spec.dtype))
    QB, SW = 1024, 64
    k = jax.random.key(5)
    uids = jax.random.randint(jax.random.fold_in(k, 0), (QB,), 0,
                              tr.ds.num_users, dtype=jnp.int32)
    q = jax.block_until_ready(
        mf_user_latents(params, tr.spec, tr.user_dev, uids))
    seen = jax.random.randint(jax.random.fold_in(k, 1), (QB, SW), 0,
                              v32.shape[0])
    variants = {}
    for target in (0.95, 1.0):
        for name, vv in (("f32", v32), ("bf16", v16)):
            fn = lambda vv=vv, target=target: blocked_topk_mips(
                q, vv, b, seen, k=30, recall_target=target,
                score_mem_mb=512)
            jax.block_until_ready(fn())      # compile
            variants[(target, name)] = fn
    # id parity: the bf16-at-rest ids must be bitwise equal (same cast)
    for target in (0.95, 1.0):
        _, ia = variants[(target, "f32")]()
        _, ib = variants[(target, "bf16")]()
        assert (np.asarray(ia) == np.asarray(ib)).all(), \
            f"ids diverged at recall_target={target}"
    print("id parity ok", flush=True)
    res = {key: [] for key in variants}
    for _ in range(windows):
        for key, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn()
            jax.block_until_ready(out)
            res[key].append(3 * QB / (time.perf_counter() - t0))
    for (target, name), r in res.items():
        r = sorted(r)
        rec(metric="xing_full_serve_latents_dtype_ab",
            mode=("exact" if target == 1.0 else "approx95"),
            latents=name, qps=round(r[len(r) // 2], 1),
            windows=[round(x, 1) for x in r])


def bench_score_mem(windows=6):
    """Re-A/B train.serve_score_mem_mb (512 default vs 2048) under the
    round-4 bf16-at-rest latents: the round-3 '+20% at 2048' was measured
    against f32 latents, whose per-pass read traffic was 2x — the knob's
    value may have shifted."""
    from arec.retrieval.mips import blocked_topk_mips
    from arec.models.mf import mf_user_latents
    tr = _trainer()
    params = tr._eval_params()
    v, b = jax.block_until_ready(tr._item_latents(params))  # bf16 default
    QB, SW = 1024, 64
    k = jax.random.key(5)
    uids = jax.random.randint(jax.random.fold_in(k, 0), (QB,), 0,
                              tr.ds.num_users, dtype=jnp.int32)
    q = jax.block_until_ready(
        mf_user_latents(params, tr.spec, tr.user_dev, uids))
    seen = jax.random.randint(jax.random.fold_in(k, 1), (QB, SW), 0,
                              v.shape[0])
    variants = {}
    for mem in (512, 2048):
        fn = lambda mem=mem: blocked_topk_mips(
            q, v, b, seen, k=30, recall_target=0.95, score_mem_mb=mem)
        jax.block_until_ready(fn())
        variants[mem] = fn
    res = {m: [] for m in variants}
    for _ in range(windows):
        for m, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn()
            jax.block_until_ready(out)
            res[m].append(3 * QB / (time.perf_counter() - t0))
    for m, r in res.items():
        r = sorted(r)
        rec(metric="xing_full_serve_score_mem_ab_bf16latents",
            score_mem_mb=m, qps=round(r[len(r) // 2], 1),
            windows=[round(x, 1) for x in r])


def main():
    if "--eval-batch" in sys.argv:
        bench_eval_batch()
    elif "--agreement" in sys.argv:
        bench_agreement()
    elif "--latency" in sys.argv:
        bench_latency()
    elif "--latents-dtype" in sys.argv:
        bench_latents_dtype()
    elif "--score-mem" in sys.argv:
        bench_score_mem()
    else:
        sys.exit("pass --eval-batch, --agreement, --latency, "
                 "--latents-dtype, or --score-mem")


if __name__ == "__main__":
    main()
