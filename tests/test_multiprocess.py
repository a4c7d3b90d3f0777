"""REAL multi-process (multi-host) execution test — the round-3 mandate:
the global-array input bridge, host-sharded eval, process-0-gated side
effects, and collective orbax save/restore must actually EXECUTE at
jax.process_count() == 2, not just exist as code (SURVEY.md §2.4, §7
"Multi-host input pipeline"; BASELINE.json:5 "row-sharded across a
multi-host TPU mesh").

Two subprocesses (tests/mh_worker.py), 4 fake CPU devices each, join a
(2,4) global mesh over Gloo and train the attr-aware MF config with a
mid-run restore; the parent trains the SAME config single-process on its
own 8 fake devices. train.batch_size is the GLOBAL batch, so the two runs
consume identical global batches (as sets — host slabs reorder rows) and
must land on the same parameters up to collective reduction order.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from arec.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(pid: int, nproc: int, port: int) -> dict:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # worker pins its own 4 fake devices
    env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env["JAX_NUM_PROCESSES"] = str(nproc)
    env["JAX_PROCESS_ID"] = str(pid)
    return env


def _run_workers(tmp_path, extra=()):
    port = _free_port()
    out = str(tmp_path / "p0.npz")
    args = [sys.executable, "-u", WORKER,
            "--data-dir", str(tmp_path / "data"),
            "--train-dir", str(tmp_path / "mh_train"),
            "--out", out, *extra]
    procs = [subprocess.Popen(args, env=_worker_env(i, 2, port),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, cwd=REPO)
             for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{log[-4000:]}"
        assert "OK" in log
    return out, logs


def _single_cfg(tmp_path, max_steps, dispatch_k=1, row_shard="contiguous",
                sparse=0):
    return Config(
        data=DataConfig(dataset="synthetic", data_dir=str(tmp_path / "data"),
                        syn_users=300, syn_items=250, syn_interactions=8000),
        model=ModelConfig(model="mf", dim=16, use_attributes=True),
        train=TrainConfig(batch_size=64, num_sampled=32,
                          n_epoch=4, max_steps=max_steps,
                          steps_per_checkpoint=6,
                          steps_per_dispatch=dispatch_k,
                          sparse_update=bool(sparse),
                          compute_dtype="float32",
                          train_dir=str(tmp_path / "sp_train")),
        mesh=MeshConfig(data=2, model=4, lookup="alltoall",
                        row_shard=row_shard),
    )


@pytest.mark.parametrize("dispatch_k,row_shard,sparse,async_ckpt",
                         [(1, "contiguous", 0, 0), (3, "shuffle", 0, 0),
                          (2, "shuffle", 1, 0), (1, "shuffle", 0, 1)])
def test_two_process_run_matches_single_process(tmp_path, dispatch_k,
                                                row_shard, sparse,
                                                async_ckpt):
    """2-process (2,4) mesh == single-process (2,4) mesh on 8 local
    devices: final params allclose, recall equal, recommend lists present.
    Covers: jax.distributed bring-up, make_array_from_process_local_data
    batch bridge (single-step AND K-stacked dispatch), host-sharded eval,
    collective checkpoint save + mid-run restore, row_shard=shuffle's
    permuted layout under multi-process, the sparse-mesh (touched-rows
    exchange) step at process_count() > 1, and — round 5 —
    train.async_ckpt at process_count() > 1: COLLECTIVE async saves
    mid-run, drain points at restore/final-save, then a fresh-Trainer
    restore whose result must be parity-equal to the SYNC single-process
    twin (closes BASELINE.md's "validated sync only" caveat)."""
    from arec.data.io import load_or_prepare
    from arec.train.loop import Trainer

    # prepare the dataset cache BEFORE spawning so workers never race prep
    load_or_prepare(_single_cfg(tmp_path, 6).data)

    out, logs = _run_workers(
        tmp_path, extra=["--steps1", "12", "--steps2", "18",
                         "--dispatch-k", str(dispatch_k),
                         "--row-shard", row_shard,
                         "--sparse", str(sparse),
                         "--async-ckpt", str(async_ckpt)])

    # single-process twin: same GLOBAL batches, straight to 18 steps
    tr = Trainer(_single_cfg(tmp_path, 18, dispatch_k, row_shard, sparse))
    tr.train()
    sp_recall = tr.evaluate()
    sp_params = [np.asarray(x) for x in
                 jax.tree_util.tree_leaves(tr.state.params)]

    got = np.load(out)
    mp_params = [got[f"leaf{i}"] for i in range(len(sp_params))]
    assert len(mp_params) == len(sp_params)
    for a, b in zip(sp_params, mp_params):
        assert a.shape == b.shape, (a.shape, b.shape)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got["recall"]), sp_recall, atol=1e-9)

    # recommend parity on one row (full-list compare happens in-worker via
    # the shared serve path; here: the list the worker returned equals the
    # single-process list for the same user)
    rows = dict(tr.recommend())
    assert rows[int(got["row0_user"])] == [int(x) for x in got["row0"]]

    # process-0 gating: exactly the worker's p0 wrote metrics under the
    # shared train_dir (no interleaved/corrupt JSONL)
    mfile = tmp_path / "mh_train" / "metrics.jsonl"
    assert mfile.exists()
    for line in mfile.read_text().splitlines():
        json.loads(line)
