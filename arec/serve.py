"""Standing serving layer: restore a trained checkpoint ONCE, answer
batched ad-hoc top-K queries.

The CLI's `--recommend` mode (the reference's batch recommend script,
SURVEY.md §3.3) emits lists for the dataset's eval users. Production
serving needs the other shape: a long-lived object that answers arbitrary
requests — users by id (MF) or raw item histories (sequence family) —
without touching the eval split. This wraps the Trainer's restore path
(so cross-mesh/cpu checkpoint portability and the sharded top-k merge
come for free), precomputes the item latent matrix once, and reuses the
Trainer's jitted serving step: requests are padded to a fixed batch shape
so every call after the first hits the jit cache. `refresh()` follows
training in place — newest checkpoint re-restored into the live object
(58 s vs 227 s rebuild at V=1.3M, measured round 5).

`train.serve_recall_target < 1` switches the selection to the
approx_max_k serving mode exactly as in recommend() — ~10x qps at
production vocab (BASELINE.md).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from arec.config import Config
from arec.retrieval.mips import pad_item_shards
from arec.train.loop import Trainer


def _pad_seen(seen, n: int, width: int) -> np.ndarray:
    """[n, width] int32, PAD = -1 (the id no item row carries; the same
    convention as PreparedDataset.seen_items). Rows longer than `width`
    keep their LAST (most recent) ids — the same truncation direction as
    from_histories' history-derived lists."""
    out = np.full((n, max(width, 1)), -1, np.int32)   # width >= 1: a 0-size
    if seen is not None:                              # scatter hangs the
        for i, row in enumerate(seen):                # remote TPU compiler
            row = list(row)[-out.shape[1]:]
            out[i, : len(row)] = row
    return out


def _auto_width(seen, fallback: int = 1) -> int:
    """Slab width for one call: the longest seen row, rounded up to a
    multiple of 32 so nearby request shapes share a jit entry."""
    w = max((len(row) for row in seen), default=0) if seen is not None else 0
    w = max(w, fallback, 1)
    return -(-w // 32) * 32


class Recommender:
    """Load the latest checkpoint under cfg.train.train_dir and serve.

    Args:
      cfg: the training Config (same file the run used; restore adapts
        across mesh shapes and CPU/TPU — arec/train/checkpoint.py).
      k: list length per request (default cfg.train.eval_topk).
      serve_batch: requests are padded to this batch size per dispatch;
        one jit compile total, any request count served in chunks.
      seen_width: width of the per-request seen-id slab. Default None =
        size the slab per call to the longest seen list (rounded up to a
        multiple of 32, so nearby shapes share a jit entry) — NO request's
        exclusion list is ever silently truncated, matching the reference
        recommend semantics of excluding ALL already-interacted items
        (SURVEY.md §3.3). Pass an explicit width only to cap compile
        shapes; rows beyond it then keep their most recent ids.

        Latency note: per-call sizing means a serving process whose
        request histories GROW over time crosses 32-wide width buckets
        and pays a fresh jit compile at each new bucket — 20–40 s on the
        remote TPU tunnel. Latency-sensitive serving should pin
        seen_width to the expected maximum (or pre-warm the widest
        bucket with one dummy call); correctness is identical either way.
    """

    def __init__(self, cfg: Config, k: int | None = None,
                 serve_batch: int = 256, seen_width: int | None = None):
        # serve_only: restore into eval_shape targets — no random init and
        # no optimizer-state allocation (at XING scale those are ~6 GB of
        # transient HBM the restore would immediately overwrite), and no
        # train-step construction; startup is restore + item-latent encode
        self._trainer = Trainer(cfg, serve_only=True)
        if self._trainer.ckpt.latest_step() is None:
            raise FileNotFoundError(
                f"no checkpoint under {cfg.train.train_dir!r} — refusing to "
                "serve an untrained model")
        self.cfg = cfg
        self.k = k or cfg.train.eval_topk
        self.serve_batch = serve_batch
        self.seen_width = None if seen_width is None else max(seen_width, 1)
        self.is_seq = self._trainer.is_seq
        t = self._trainer
        self._params = t._eval_params()
        v, b = t._item_latents(self._params)
        if t.use_mesh:
            v, b = pad_item_shards(v, b, cfg.mesh.model)
        self._vb = (v, b)
        self._step = t._serve_step(self.k)
        # checkpoint labels are the global step count (Checkpointer.save
        # is called with steps_done == state.step), so the restored
        # state's step IS the label refresh() compares against
        self._restored_step = int(t.state.step)

    def refresh(self) -> bool:
        """Pick up the newest checkpoint IN PLACE: re-restore, re-encode
        the item latent matrix, and swap — reusing every jit entry
        (identical shapes → no recompile) and the existing buffers, so a
        serving process can follow training without being rebuilt
        (rebuild measured ~41 s trainer init + encode at XING scale, plus
        a transient second multi-GB residency). The old device state is
        dropped BEFORE the restore (Trainer.restore_latest), so peak
        residency never doubles.

        Returns True when a newer checkpoint was loaded, False when the
        latest checkpoint is the one already being served. NOT safe to
        call concurrently with for_users/from_histories from another
        thread: requests issued mid-refresh would race the swap — pause
        or queue them for the refresh duration.
        """
        t = self._trainer
        t.ckpt.drain()
        t.ckpt.reload()   # steps written by the TRAINING process are not
        latest = t.ckpt.latest_step()   # in this manager's cached list
        if latest is None:
            raise FileNotFoundError(
                f"no checkpoint under {self.cfg.train.train_dir!r}")
        if latest == self._restored_step:
            return False
        # drop the old latents/params first (they alias state tables or,
        # on the sparse path, are unpacked copies of them)
        self._params = None
        self._vb = None
        try:
            t.restore_latest()
            self._params = t._eval_params()
            v, b = t._item_latents(self._params)
            if t.use_mesh:
                v, b = pad_item_shards(v, b, self.cfg.mesh.model)
        except Exception as e:
            # the old state was freed before the restore (the no-doubled-
            # residency contract), so a failed refresh cannot roll back —
            # fail with a clear diagnosis instead of a later shape/None
            # crash inside for_users
            raise RuntimeError(
                "Recommender.refresh failed mid-restore; this instance no "
                "longer holds a servable state — rebuild it (the previous "
                "state is freed before restoring to avoid doubling "
                "residency)") from e
        self._vb = (v, b)
        self._restored_step = int(t.state.step)
        return True

    # ------------------------------------------------------------------
    def _run(self, batches):
        """batches: iterable of dicts with fixed shapes → [N, k] ids."""
        from arec.dist.specs import DEVS_KEY
        ids_out = []
        v, b = self._vb
        for batch, n_valid in batches:
            jb = {kk: jnp.asarray(x) for kk, x in batch.items()
                  if kk != "seen"}
            jb[DEVS_KEY] = self._trainer._devs   # maps as jit args
            _, ids = self._step(self._params, v, b, jb,
                                jnp.asarray(batch["seen"]))
            ids_out.append(np.asarray(ids)[:n_valid])
        if not ids_out:                      # empty request list
            return np.zeros((0, self.k), np.int32)
        return np.concatenate(ids_out, axis=0)

    def for_users(self, user_ids, seen=None) -> np.ndarray:
        """Top-k item ids for known user ids (MF family). `seen`:
        optional per-request iterable of item ids to exclude."""
        if self.is_seq:
            raise ValueError("for_users serves the MF family; use "
                             "from_histories for sequence models")
        user_ids = np.asarray(user_ids, np.int32)
        sb = self.serve_batch
        pad_user = self._trainer.ds.num_users   # encodes to zero, harmless
        width = self.seen_width or _auto_width(seen)

        def gen():
            for s in range(0, len(user_ids), sb):
                chunk = user_ids[s:s + sb]
                n = len(chunk)
                users = np.full(sb, pad_user, np.int32)
                users[:n] = chunk
                sl = None if seen is None else seen[s:s + sb]
                yield {"user": users,
                       "seen": _pad_seen(sl, sb, width)}, n
        return self._run(gen())

    def from_histories(self, histories, seen_from_history: bool = True,
                       seen=None, user_ids=None) -> np.ndarray:
        """Top-k next items given raw per-request item histories (sequence
        family). Histories of any length: left-padded / truncated to the
        model's segment length times the needed segment count (the carried-
        state segmented scan of seq_final_state_full). By default a
        request's own history is also its seen-exclusion list (the
        reference recommend semantics)."""
        if not self.is_seq:
            raise ValueError("from_histories serves the sequence family")
        spec = self._trainer.spec
        L = spec.max_seq_len
        sb = self.serve_batch
        pad_id = spec.vocab                      # encodes to zero
        max_hist = max((len(h) for h in histories), default=1)
        # any length: ceil to whole L-segments (seq_final_state_full runs
        # the carried-state segmented scan — histories LONGER than the
        # training pack length are served exactly, one more compile per
        # distinct segment count)
        total = max(L, L * math.ceil(max_hist / L))
        if seen_from_history and seen is None:
            # the request's FULL history is its exclusion list by default;
            # an explicit seen_width caps it to the most recent ids
            seen = (histories if self.seen_width is None
                    else [list(h)[-self.seen_width:] for h in histories])
        width = self.seen_width or _auto_width(seen)

        def gen():
            for s in range(0, len(histories), sb):
                chunk = histories[s:s + sb]
                n = len(chunk)
                inputs = np.full((sb, total), pad_id, np.int32)
                mask = np.zeros((sb, total), np.float32)
                for i, h in enumerate(chunk):
                    h = list(h)[-total:]
                    if h:
                        inputs[i, total - len(h):] = h
                        mask[i, total - len(h):] = 1.0
                batch = {"inputs": inputs, "mask": mask,
                         "seen": _pad_seen(
                             None if seen is None else seen[s:s + sb],
                             sb, width)}
                if spec.user is not None:
                    # user-concat configs need a user id per request; pad
                    # id encodes to zero for anonymous requests
                    u = np.full(sb, spec.user.schema.num_entities, np.int32)
                    if user_ids is not None:
                        u[:n] = np.asarray(user_ids[s:s + sb], np.int32)
                    batch["user"] = u
                yield batch, n
        return self._run(gen())


# ---------------------------------------------------------------------------
# Standing-server CLI: `python -m arec.serve --config cfg.json [--set ...]`
#
# A line-oriented request loop over stdin/stdout (round 5) — the
# operational completion of the serving story: a process you START, feed
# requests to, and point at a train_dir it FOLLOWS via refresh(), instead
# of an object you import. Line protocol (tab-separated, one request per
# line, answer echoed with the same first field):
#
#   MF family:        <user_id>[\t<seen_id,seen_id,...>]
#   sequence family:  <hist_id,hist_id,...>   (history = exclusion list)
#   commands:         !refresh   — pick up the newest checkpoint in place
#                     !step      — print the served checkpoint step
#                     !quit      — exit 0
#
# Responses: `<first_field>\t<id,id,...>` (top-k); command responses are
# `!ok ...`. Unparseable lines answer `!err <reason>` and the loop
# continues — a bad request must not kill a standing server.
# ---------------------------------------------------------------------------


def _serve_loop(rec: Recommender, inp, out) -> int:
    for line in inp:
        line = line.strip()
        if not line:
            continue
        try:
            if line == "!quit":
                return 0
            if line == "!step":
                print(f"!ok step {rec._restored_step}", file=out, flush=True)
            elif line == "!refresh":
                changed = rec.refresh()
                print(f"!ok {'refreshed' if changed else 'current'} "
                      f"step {rec._restored_step}", file=out, flush=True)
            elif rec.is_seq:
                first = line.split("\t")[0]
                hist = [int(x) for x in first.split(",") if x]
                ids = rec.from_histories([hist])
                print(f"{first}\t{','.join(map(str, ids[0].tolist()))}",
                      file=out, flush=True)
            else:
                parts = line.split("\t")
                uid = int(parts[0])
                seen = ([[int(x) for x in parts[1].split(",") if x]]
                        if len(parts) > 1 and parts[1] else None)
                ids = rec.for_users([uid], seen=seen)
                print(f"{uid}\t{','.join(map(str, ids[0].tolist()))}",
                      file=out, flush=True)
        except Exception as e:  # keep serving after a bad request
            print(f"!err {type(e).__name__}: {e}", file=out, flush=True)
    return 0


def main(argv=None, inp=None, out=None) -> int:
    import sys

    from arec.cli.main import load_config, parse_args
    from arec.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    cfg = load_config(args)
    rec = Recommender(cfg)
    print(f"!ok serving {cfg.train.train_dir} step {rec._restored_step} "
          f"({'histories' if rec.is_seq else 'user ids'} on stdin; "
          f"!refresh / !step / !quit)",
          file=out or sys.stdout, flush=True)
    return _serve_loop(rec, inp or sys.stdin, out or sys.stdout)


if __name__ == "__main__":
    import sys

    sys.exit(main())
