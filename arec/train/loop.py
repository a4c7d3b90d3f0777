"""Trainer: the rebuild of the reference's run-script drivers.

One class covers what `hmf/run_mf.py` and `lstm/run.py` each did
(SURVEY.md §2.1 "HMF driver/CLI" / "LSTM driver/CLI", §3.1–3.3):
dataset load → model build → epoch loop with periodic checkpoint + valid
Recall@30 + LR decay-on-plateau → recommend mode emitting top-K lists.

TPU-native structure:
  * one jitted train step (arec.train.step) — negative sampling, lookups,
    fwd/bwd, optimizer, all on device; host ships int batches only;
  * optional ("data","model") mesh: tables row-padded + sharded, batch
    data-sharded, lookups through the all-to-all exchange
    (MeshConfig.lookup="alltoall") or GSPMD-chosen collectives ("gspmd");
  * optimizer state sharded like its parameters (optax.tree_map_params);
  * eval = full-softmax top-k over the (sharded) item latents
    (arec.retrieval.mips), seen-items masked;
  * examples/s measured with block_until_ready (the graded throughput
    counter, BASELINE.json:2).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from arec.config import Config
from arec.data.dataset import eval_batches, mf_batches, seq_batches
from arec.data.io import load_or_prepare
from arec.dist.global_io import shard_from_hosts, tree_put_replicated
from arec.dist.mesh import host_info, is_primary, make_mesh, multihost_init
from arec.dist.specs import (
    DATA_AXIS, TABLE_AXIS, batch_pspec, param_pspecs, shardings,
)
from arec.models import mf as mf_mod
from arec.models import seq as seq_mod
from arec.retrieval.mips import make_sharded_topk, pad_item_shards
from arec.tables.engine import attrs_to_device, dense_lookup
from arec.tables.layout import RowPerm
from arec.tables.sharded import (
    EXCHANGE_DROPS, make_perm_dense_lookup, make_sharded_lookup,
    pad_table_rows,
)
from arec.train.checkpoint import Checkpointer, abstract_like
from arec.train.evalu import recall_hits
from arec.train.metrics import MetricLogger
from arec.train.step import (
    TrainState, decay_lr, init_state, make_multi_step, make_optimizer,
    make_step_core, make_train_step, scan_multi,
)


def _pad_params_tables(params, model_size: int):
    """Row-pad every sharded table to a model-axis multiple
    (arec.tables.sharded.round_up_rows)."""
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda p, s: pad_table_rows(p, model_size) if s == P(TABLE_AXIS, None)
        else p,
        params, specs, is_leaf=lambda x: isinstance(x, P))


class Trainer:
    def __init__(self, cfg: Config, serve_only: bool = False):
        """serve_only=True builds a RESTORE-ONLY trainer: the train state is
        shaped with jax.eval_shape (no random init, no optimizer-state
        allocation — at XING scale those are ~6 GB of transient HBM that
        the checkpoint restore would immediately overwrite) and the step
        functions are never built. Serving paths (_item_latents,
        _serve_step, evaluate, recommend) work as usual; train() raises."""
        multihost_init()
        self.cfg = cfg
        self.serve_only = serve_only
        self.host_id, self.num_hosts = host_info()
        self.ds = load_or_prepare(cfg.data)
        self.is_seq = cfg.model.model == "lstm"

        # ---- mesh -------------------------------------------------------
        mcfg = cfg.mesh
        self.use_mesh = mcfg.data * mcfg.model > 1
        self.mesh = make_mesh(mcfg.data, mcfg.model) if self.use_mesh else None
        # multi-process (multi-host) run: host-local batches must enter the
        # global-mesh jit as global jax.Arrays (arec.dist.global_io); the
        # per-host input iterators already partition each epoch
        self.multiproc = self.num_hosts > 1
        if self.multiproc:
            if not self.use_mesh:
                raise ValueError(
                    "a multi-process run needs a mesh spanning all "
                    "processes: set mesh.data×mesh.model = global devices")
            if cfg.train.batch_size % self.num_hosts:
                raise ValueError(
                    f"train.batch_size ({cfg.train.batch_size}) is the "
                    f"GLOBAL batch and must divide by the number of "
                    f"processes ({self.num_hosts})")

        # ---- model ----------------------------------------------------
        key = jax.random.key(cfg.train.seed)
        if self.is_seq:
            self.spec = seq_mod.SeqSpec.from_config(
                cfg, self.ds.user_schema, self.ds.item_schema)
            init_params = lambda: seq_mod.init_seq(key, self.spec)
            self.item_dev = attrs_to_device(
                self.ds.item_attrs.restrict(self.spec.item_in.schema),
                self.spec.item_in)
            self.user_dev = (attrs_to_device(
                self.ds.user_attrs.restrict(self.spec.user.schema),
                self.spec.user)
                if self.spec.user is not None else None)
        else:
            self.spec = mf_mod.MFSpec.from_config(
                cfg, self.ds.user_schema, self.ds.item_schema)
            init_params = lambda: mf_mod.init_mf(key, self.spec)
            self.item_dev = attrs_to_device(
                self.ds.item_attrs.restrict(self.spec.item.schema),
                self.spec.item)
            self.user_dev = attrs_to_device(
                self.ds.user_attrs.restrict(self.spec.user.schema),
                self.spec.user)

        # ---- lookups (per-role; row_shard="shuffle" balances hot rows) --
        # Each role's table gets its own exchange lookup because the shuffle
        # permutation is table-specific (RowPerm over that table's gather
        # region). eval_lookups are the single-gather (non-exchange)
        # counterparts for the eval/recommend paths, which read the same
        # stored layout.
        self.perms: dict[str, RowPerm] = {}
        self.lookups: dict = {}
        self.eval_lookups: dict = {}
        self._out_lookup = None
        self.lookup = dense_lookup
        if self.use_mesh and mcfg.lookup == "alltoall":
            roles = self._table_roles()
            if mcfg.row_shard == "shuffle":
                for role, (rows, prefix) in roles.items():
                    p = RowPerm.for_rows(rows, prefix)
                    if p is not None:
                        self.perms[role] = p
            mk = lambda role: make_sharded_lookup(
                self.mesh, mcfg.capacity_factor, dedup=mcfg.dedup,
                perm=self.perms.get(role))
            self.lookups = {r: mk(r) for r in roles}
            self.lookup = make_sharded_lookup(
                self.mesh, mcfg.capacity_factor, dedup=mcfg.dedup)
            self.eval_lookups = {
                r: (make_perm_dense_lookup(self.perms[r])
                    if r in self.perms else dense_lookup)
                for r in roles}
            if "out" in self.perms:
                self._out_lookup = make_perm_dense_lookup(self.perms["out"])
        elif cfg.train.compact_table_grads and not self.use_mesh:
            from arec.tables.engine import make_compact_lookup
            self.lookup = make_compact_lookup()
        def build_params():
            p = init_params()
            if self.perms:
                # fresh-init tables → stored (shuffle) layout; checkpoints
                # stay in NATURAL layout (see _canonical_state)
                p = self._tree_permute(p)
            if self.use_mesh:
                p = _pad_params_tables(p, mcfg.model)
            return p

        if self.serve_only:
            # restore-only: shapes without allocation (jax.eval_shape) —
            # the checkpoint provides the real values
            params = jax.eval_shape(build_params)
            if self.use_mesh:
                self.param_sh = shardings(self.mesh, param_pspecs(params))
        else:
            params = build_params()
            if self.use_mesh:
                self.param_sh = shardings(self.mesh, param_pspecs(params))
                # init is deterministic-same-seed on every process, so each
                # process materializes just its addressable shards of the
                # same global params (single-process: plain device_put)
                params = tree_put_replicated(params, self.param_sh)

        if self.multiproc:
            # device-side attribute tables enter every jitted step/eval as
            # captured arrays; on a process-spanning mesh they must be
            # GLOBAL (replicated) arrays, not host-local device arrays
            from arec.dist.global_io import put_replicated_global
            rep = NamedSharding(self.mesh, P())
            put = lambda t: jax.tree_util.tree_map(
                lambda x: put_replicated_global(x, rep), t)
            self.item_dev = put(self.item_dev)
            if self.user_dev is not None:
                self.user_dev = put(self.user_dev)

        # device attribute maps ride into every jitted step as ARGUMENTS
        # under the reserved DEVS_KEY (closed-over maps inline into the HLO
        # as constants — at XING cardinality that exceeds the remote
        # compiler's request limit; arec.dist.specs.DEVS_KEY)
        self._devs = {"item": self.item_dev}
        if self.user_dev is not None:
            self._devs["user"] = self.user_dev

        # ---- sampler proposal (sampler="pop": empirical popularity^α over
        # the dataset's train item counts; log_uniform/uniform need no
        # state). batch_ht with mw/bbpr needs the α=1 empirical
        # distribution — the in-batch proposal IS the interaction
        # distribution, so sampler_power does not apply there.
        if cfg.train.batch_ht and cfg.train.loss not in ("mw", "bbpr"):
            # fail-loud: the flag only corrects the in-batch losses'
            # proposal — on any other model/loss combination it would be
            # silently ignored (advisor round 4); consistent with the
            # unknown-combo ValueError in mf_loss/sparse factory
            raise ValueError(
                "train.batch_ht only applies to the in-batch losses "
                f"(loss=mw|bbpr); got model={cfg.model.model!r} "
                f"loss={cfg.train.loss!r}")
        if cfg.train.batch_ht and cfg.train.loss in ("mw", "bbpr"):
            from arec.losses.sampling import make_pop
            self.pop = make_pop(self.ds.item_freq, 1.0)
        elif cfg.train.sampler == "pop":
            from arec.losses.sampling import make_pop
            self.pop = make_pop(self.ds.item_freq, cfg.train.sampler_power)
        else:
            self.pop = None

        # ---- optimizer + step ----------------------------------------
        self.opt = make_optimizer(cfg.train.optimizer, cfg.train.learning_rate)
        self.sparse = cfg.train.sparse_update
        if self.serve_only:
            # the full TrainState SHAPE (same construction path as training,
            # under eval_shape — drift is guarded by
            # tests/test_serve.py::test_serve_only_state_matches_training);
            # restore fills it with real values below
            from arec.train.sparse import init_sparse_state, table_paths

            def build_state():
                p = build_params()
                if self.sparse:
                    return init_sparse_state(
                        p, table_paths(self.is_seq, self.spec), self.opt,
                        cfg.train.optimizer)
                return init_state(p, self.opt)

            self.state = jax.eval_shape(build_state)
            if self.use_mesh:
                if self.sparse:
                    from arec.train.sparse_mesh import (
                        sparse_mesh_state_shardings,
                    )
                    self.state_sh = sparse_mesh_state_shardings(
                        self.mesh, self.state)
                else:
                    self.state_sh = self._state_shardings(self.state.params)
        elif self.sparse and self.use_mesh:
            # touched-rows updates on the mesh: kills the dense [Vp/T, W]
            # table-cotangent psum over "data" of the GSPMD step — comm and
            # optimizer traffic O(touched·W) per step (arec/train/sparse_mesh)
            from arec.train.sparse import init_sparse_state, table_paths
            from arec.train.sparse_mesh import (
                make_sparse_mesh_step, sparse_mesh_state_shardings,
            )
            self.state = init_sparse_state(
                params, table_paths(self.is_seq, self.spec), self.opt,
                cfg.train.optimizer)
            self.state_sh = sparse_mesh_state_shardings(self.mesh, self.state)
            self.state = tree_put_replicated(self.state, self.state_sh)
            self.step_fn = make_sparse_mesh_step(
                self.mesh, self.is_seq, self.spec, self.user_dev,
                self.item_dev, self.opt, cfg.train.learning_rate,
                cfg.train.optimizer, pop=self.pop, perms=self.perms,
                state_shardings=self.state_sh)
        elif self.sparse:
            from arec.train.sparse import (
                init_sparse_state, make_sparse_train_step, table_paths,
            )
            self.state = init_sparse_state(
                params, table_paths(self.is_seq, self.spec), self.opt,
                cfg.train.optimizer)
            self.step_fn = make_sparse_train_step(
                self.is_seq, self.spec, self.user_dev, self.item_dev,
                self.opt, cfg.train.learning_rate, cfg.train.optimizer,
                pop=self.pop)
        else:
            self.state = init_state(params, self.opt)
            if self.use_mesh:
                self.state_sh = self._state_shardings(params)
                self.state = tree_put_replicated(self.state, self.state_sh)

            loss_fn = self._loss_fn()
            if self.use_mesh:
                self.step_fn = self._make_sharded_step(loss_fn)
            else:
                self.step_fn = make_train_step(loss_fn, self.opt,
                                               cfg.train.learning_rate)

        # K steps per dispatch — supported on ALL paths: the dense
        # single-device scan, the GSPMD-sharded scan (explicit state
        # shardings carry through lax.scan), and the sparse packed-state
        # scan. Step-for-step identical to K=1 (same per-step rng/order).
        self.dispatch_k = cfg.train.steps_per_dispatch
        if self.dispatch_k > 1 and not self.serve_only:
            if cfg.train.steps_per_checkpoint % self.dispatch_k:
                raise ValueError(
                    "steps_per_checkpoint must be a multiple of "
                    "steps_per_dispatch "
                    f"({cfg.train.steps_per_checkpoint} % {self.dispatch_k})")
            if self.sparse and self.use_mesh:
                from arec.train.sparse_mesh import make_sparse_mesh_multi_step
                self.multi_step_fn = make_sparse_mesh_multi_step(
                    self.mesh, self.is_seq, self.spec, self.user_dev,
                    self.item_dev, self.opt, cfg.train.learning_rate,
                    cfg.train.optimizer, pop=self.pop, perms=self.perms,
                    state_shardings=self.state_sh)
            elif self.sparse:
                from arec.train.sparse import make_sparse_multi_step
                self.multi_step_fn = make_sparse_multi_step(
                    self.is_seq, self.spec, self.user_dev, self.item_dev,
                    self.opt, cfg.train.learning_rate, cfg.train.optimizer,
                    pop=self.pop)
            elif self.use_mesh:
                self.multi_step_fn = self._make_sharded_multi_step(
                    self._loss_fn())
            else:
                self.multi_step_fn = make_multi_step(
                    self._loss_fn(), self.opt, cfg.train.learning_rate)

        self.ckpt = Checkpointer(cfg.train.train_dir,
                                 async_save=cfg.train.async_ckpt)
        # singleton side effects (metrics JSONL / TensorBoard) live on
        # process 0 — N hosts sharing a train_dir must not race on the file
        self.metrics = MetricLogger(cfg.train.train_dir,
                                    tensorboard=cfg.train.tensorboard,
                                    enabled=is_primary()
                                    and not self.serve_only)
        self.start_epoch = 0
        self._maybe_restore()

    # ------------------------------------------------------------------
    def _table_roles(self) -> dict[str, tuple[int, int]]:
        """Lookup roles → (total_rows, dense_prefix_rows) of their table.
        Matches the lookup_fns contract of mf_loss/seq_loss ("user"/"item"/
        "out")."""
        if self.is_seq:
            roles = {"item": (self.spec.item_in.total_rows,
                              self.spec.item_in.dense_region_rows)}
            if self.spec.user is not None:
                roles["user"] = (self.spec.user.total_rows,
                                 self.spec.user.dense_region_rows)
            if not self.spec.tie_output:
                roles["out"] = (self.spec.vocab + 1, 0)
            return roles
        return {"user": (self.spec.user.total_rows,
                         self.spec.user.dense_region_rows),
                "item": (self.spec.item.total_rows,
                         self.spec.item.dense_region_rows)}

    def _perm_for_path(self, path) -> RowPerm | None:
        """RowPerm of the table (or optimizer-accumulator) leaf at `path`,
        or None. Optimizer state mirrors the params tree, so the same key
        test covers both (cf. arec.dist.specs._is_table_path)."""
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "item_out" in keys:
            return self.perms.get("out")
        if "tables" not in keys:
            return None
        if "user" in keys:
            return self.perms.get("user")
        if "item" in keys or "item_in" in keys:
            return self.perms.get("item")
        return None

    def _tree_permute(self, tree, inverse: bool = False):
        """Rearrange every table-shaped leaf natural↔stored (shuffle)
        layout. Whole-table gathers — init/checkpoint-boundary only."""
        def f(path, leaf):
            p = self._perm_for_path(path)
            if p is None or getattr(leaf, "ndim", 0) != 2:
                return leaf
            return p.permute_table(leaf, inverse=inverse)
        return jax.tree_util.tree_map_with_path(f, tree)

    def _canonical_state(self, state):
        """State with tables in NATURAL row order — the on-disk layout.
        Shuffle-sharded runs un-permute here so a checkpoint restores onto
        any mesh shape, row_shard mode, or single-device config
        (arec/tables/layout.py docstring)."""
        if not self.perms:
            return state
        return self._tree_permute(state, inverse=True)

    # ------------------------------------------------------------------
    def _loss_fn(self):
        spec, lookup = self.spec, self.lookup
        default_item, default_user = self.item_dev, self.user_dev
        lookup_fns = self.lookups or None
        from arec.train.step import split_devs
        # the Pallas fused-CE kernel does not partition under GSPMD, so the
        # mesh path routes it through an inner shard_map (rows split over
        # every mesh axis — arec/kernels/sampled_softmax.py); the size
        # heuristic then counts per-device rows, so it enables exactly when
        # each chip crosses the measured single-chip crossover.
        # time_major: the single-device seq path transposes int32 ids
        # instead of embeddings (no [B,L,D] layout changes); the mesh path
        # stays batch-major so the flattened position axis preserves
        # data-parallel sharding locality.
        mesh = self.mesh if self.use_mesh else None
        time_major = not self.use_mesh
        pop = self.pop
        if self.is_seq:
            def loss_fn(p, batch, rng):
                batch, devs = split_devs(batch)
                item_dev = devs["item"] if devs else default_item
                user_dev = devs.get("user") if devs else default_user
                return seq_mod.seq_loss(p, spec, item_dev, user_dev, batch,
                                        rng, lookup, lookup_fns=lookup_fns,
                                        mesh=mesh,
                                        time_major=time_major, pop=pop)
        else:
            def loss_fn(p, batch, rng):
                batch, devs = split_devs(batch)
                item_dev = devs["item"] if devs else default_item
                user_dev = devs.get("user") if devs else default_user
                return mf_mod.mf_loss(p, spec, user_dev, item_dev, batch,
                                      rng, lookup, lookup_fns=lookup_fns,
                                      mesh=mesh, pop=pop)
        return loss_fn

    def _state_shardings(self, params):
        pspecs = param_pspecs(params)
        opt_shape = jax.eval_shape(self.opt.init, params)
        opt_specs = optax.tree_map_params(
            self.opt, lambda _, s: s, opt_shape, pspecs,
            transform_non_params=lambda _: P())
        st_specs = TrainState(params=pspecs, opt_state=opt_specs,
                              lr_scale=P(), step=P())
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), st_specs,
            is_leaf=lambda x: isinstance(x, P))

    def _make_sharded_step(self, loss_fn):
        """GSPMD-jitted step with explicit state shardings (grad_norm
        skipped — a global_norm over row-sharded tables is an extra
        cross-shard reduction of pure observability)."""
        core = make_step_core(loss_fn, self.opt, self.cfg.train.learning_rate,
                              with_grad_norm=False)
        return jax.jit(
            core,
            in_shardings=(self.state_sh, None, None),
            out_shardings=(self.state_sh, None),
            donate_argnums=(0,),
        )

    def _make_sharded_multi_step(self, loss_fn):
        """steps_per_dispatch > 1 on the mesh: lax.scan over the sharded
        core with the same explicit shardings — batches arrive stacked
        [K, ...] and each scanned step re-shards exactly like the single
        step (parity: tests/test_multistep.py mesh case)."""
        core = make_step_core(loss_fn, self.opt, self.cfg.train.learning_rate,
                              with_grad_norm=False)
        return jax.jit(
            scan_multi(core),
            in_shardings=(self.state_sh, None, None),
            out_shardings=(self.state_sh, None),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------
    def _batches(self, epoch: int):
        """Per-host batch iterator. train.batch_size is the GLOBAL batch:
        each host yields its batch_size/num_hosts slab of the shared epoch
        permutation, so the same config trains identically on 1 or N
        processes (the 2-process parity test relies on this)."""
        t = self.cfg.train
        per_host = t.batch_size // self.num_hosts
        if self.is_seq:
            return seq_batches(self.ds, per_host,
                               self.spec.pack_len, t.seed, epoch,
                               self.host_id, self.num_hosts)
        return mf_batches(self.ds, per_host, t.seed, epoch,
                          self.host_id, self.num_hosts)

    def _stage_batch(self, jb):
        """Host-local numpy batch → device arrays for one step, with the
        attribute maps attached under DEVS_KEY (jit arguments, not HLO
        constants). On a multi-process run every data leaf becomes a
        GLOBAL array sharded P("data") (arec.dist.global_io); otherwise
        the prefetcher already device_put the leaves."""
        from arec.dist.specs import DEVS_KEY
        if self.multiproc:
            sh = shardings(self.mesh, batch_pspec(jb))
            jb = jax.tree_util.tree_map(shard_from_hosts, jb, sh)
        return {**jb, DEVS_KEY: self._devs}

    def _stage_stacked(self, pending):
        """K host batches → one stacked [K, B, ...] dispatch block with the
        batch axis data-sharded (multi-process: global arrays via the
        bridge; single-process: plain stack, GSPMD re-shards in-jit).
        DEVS_KEY rides unstacked (scan-invariant — step.scan_multi)."""
        from arec.dist.specs import DEVS_KEY
        if not self.multiproc:
            stacked = {kk: jnp.stack([p[kk] for p in pending])
                       for kk in pending[0]}
        else:
            from arec.dist.specs import stacked_pspec
            stacked = {kk: np.stack([np.asarray(p[kk]) for p in pending])
                       for kk in pending[0]}
            sh = shardings(self.mesh, stacked_pspec(stacked))
            stacked = jax.tree_util.tree_map(shard_from_hosts, stacked, sh)
        return {**stacked, DEVS_KEY: self._devs}

    def _eval_params(self):
        """Plain param tree for eval paths (sparse Adagrad stores tables
        packed [V, 2D] — see arec/train/sparse.py)."""
        if self.sparse and self.cfg.train.optimizer == "adagrad":
            from arec.train.sparse import table_paths, unpack_params
            return unpack_params(self.state.params,
                                 table_paths(self.is_seq, self.spec))
        return self.state.params

    def _item_latents(self, params=None):
        """All-item latent matrix, jitted with (params, item_dev) as
        ARGUMENTS — the lax.map inside encode_all_items would otherwise
        capture the attribute maps as constants (remote-compile 413 at
        XING cardinality)."""
        params = self._eval_params() if params is None else params
        if getattr(self, "_lat_jit", None) is None:
            spec = self.spec
            lookup = self.eval_lookups.get("item", dense_lookup)
            if self.is_seq:
                out_lookup = self._out_lookup
                self._lat_jit = jax.jit(
                    lambda p, dev: seq_mod.seq_item_latents(
                        p, spec, dev, lookup_fn=lookup,
                        out_lookup=out_lookup))
            else:
                self._lat_jit = jax.jit(
                    lambda p, dev: mf_mod.mf_item_latents(
                        p, spec, dev, lookup_fn=lookup))
        v, b = self._lat_jit(params, self.item_dev)
        if self.cfg.train.serve_latents_dtype == "compute":
            # pre-cast to the dtype every top-k sweep casts to anyway:
            # bit-identical scores (tools/ab_eval_serve.py --latents-dtype
            # asserts id parity at V=1.3M), half the HBM residency at
            # bf16, +4% approx serving qps (BASELINE.md round 4)
            v = v.astype(self.spec.dtype)
        return v, b

    def _query_fn(self, params, batch):
        """Eval/serve query encode; attribute maps come from the batch's
        DEVS_KEY when present (jit-argument path), else the closures."""
        from arec.train.step import split_devs
        batch, devs = split_devs(batch)
        item_dev = devs["item"] if devs else self.item_dev
        user_dev = (devs.get("user") if devs else self.user_dev)
        if self.is_seq:
            return seq_mod.seq_final_state_full(
                params, self.spec, item_dev, user_dev, batch,
                lookup_fn=self.eval_lookups.get("item", dense_lookup),
                lookup_fns=self.eval_lookups or None)
        return mf_mod.mf_user_latents(
            params, self.spec, user_dev, batch["user"],
            lookup_fn=self.eval_lookups.get("user", dense_lookup))

    def _queries(self, batch):
        return self._query_fn(self._eval_params(), batch)

    def _eval_step(self, k: int, recall_target: float | None = None):
        """Jitted per-batch eval step: queries → masked top-k → hit counts.
        Eager op-by-op eval pays per-dispatch latency on a remote TPU
        (~0.5 ms/op over the tunnel); one jit per fixed batch shape
        removes it. Cached on (k,).

        On a mesh the top-k runs SHARDED (make_sharded_topk: each chip
        scores its item shard, k·T-candidate exact merge) — the full [V, D]
        latent matrix is never host-gathered or replicated
        (SURVEY.md §2.3 "Full-softmax eval sharding"); the exact merge is
        hit-for-hit equal to the single-device path
        (tests/test_dist_e2e.py::test_trainer_mesh_parity_through_defaults)."""
        rt = (recall_target if recall_target is not None
              else self.cfg.train.eval_recall_target)
        if getattr(self, "_eval_jit_k", None) != (k, rt):
            if self.use_mesh:
                topk = make_sharded_topk(self.mesh, k=k,
                                         compute_dtype=self.spec.dtype,
                                         recall_target=rt)

                def step(params, v, b, batch, seen):
                    q = self._query_fn(params, batch)
                    _, ids = topk(q, v, b, seen)
                    hit = (ids == batch["pos_item"][:, None]).any(
                        axis=1).astype(jnp.float32)
                    return (jnp.sum(hit * batch["valid"]),
                            jnp.sum(batch["valid"]))
            else:
                def step(params, v, b, batch, seen):
                    q = self._query_fn(params, batch)
                    return recall_hits(q, v, b, seen, batch["pos_item"],
                                       batch["valid"], k=k,
                                       recall_target=rt)
            self._eval_jit = jax.jit(step)
            self._eval_jit_k = (k, rt)
        return self._eval_jit

    def _serve_step(self, k: int):
        """Jitted per-batch serving step: queries → (sharded) masked top-k.
        Cached on (k, serve_recall_target) like _eval_step — a fresh jit
        wrapper per recommend() call would recompile every time."""
        target = self.cfg.train.serve_recall_target
        mem = self.cfg.train.serve_score_mem_mb
        if getattr(self, "_serve_jit_k", None) != (k, target, mem):
            if self.use_mesh:
                topk = make_sharded_topk(
                    self.mesh, k=k, compute_dtype=self.spec.dtype,
                    recall_target=target, score_mem_mb=mem)
            else:
                from arec.train.evalu import topk_with_mask
                topk = partial(topk_with_mask, k=k, recall_target=target,
                               score_mem_mb=mem)

            def step(params, v, b, batch, seen):
                q = self._query_fn(params, batch)
                return topk(q, v, b, seen)
            if self.multiproc:
                # replicate the (tiny) [B, k] result so every process can
                # read the whole batch's lists host-side (the all-gather
                # rides ICI inside the jit)
                rep = NamedSharding(self.mesh, P())
                self._serve_jit = jax.jit(step, out_shardings=(rep, rep))
            else:
                self._serve_jit = jax.jit(step)
            self._serve_jit_k = (k, target, mem)
        return self._serve_jit

    def _stage_eval(self, batch, seen):
        """Eval/serve batch + seen slab → device. Multi-process: each host
        contributes its slab of the global batch (P("data") leaves via
        arec.dist.global_io); single-process: plain host arrays (jit
        re-shards)."""
        from arec.dist.specs import DEVS_KEY
        if not self.multiproc:
            jb = {kk: jnp.asarray(x) for kk, x in batch.items()}
            return {**jb, DEVS_KEY: self._devs}, jnp.asarray(seen)
        jb = self._stage_batch(batch)   # attaches DEVS_KEY
        sh = NamedSharding(self.mesh, P(DATA_AXIS, None))
        return jb, shard_from_hosts(np.asarray(seen), sh)

    def evaluate(self, k: int | None = None, exact: bool = False) -> float:
        """Valid Recall@K with seen-item masking (SURVEY.md §3.3). On a
        mesh the item matrix stays sharded end-to-end (see _eval_step).
        Multi-process: each host evaluates its own strided slice of the
        held-out rows (eval_batches host sharding); the jitted step sums
        hits over the GLOBAL batch, so the running totals are already
        all-host counts — no extra reduction needed.

        exact=True overrides the periodic-eval cost knobs
        (train.eval_max_batches subsampling and the eval_recall_target
        approx top-k) for a full-exactness metric — the number to report."""
        k = k or self.cfg.train.eval_topk
        params = self._eval_params()
        v, b = self._item_latents(params)
        if self.use_mesh:
            v, b = pad_item_shards(v, b, self.cfg.mesh.model)
        else:
            v, b = jax.device_get(v), jax.device_get(b)  # freeze for the sweep
            v, b = jnp.asarray(v), jnp.asarray(b)
        step = self._eval_step(k, recall_target=1.0 if exact else None)
        hits = total = 0.0
        n = 0
        cap = 0 if exact else self.cfg.train.eval_max_batches
        L = self.spec.pack_len if self.is_seq else 0
        for batch in eval_batches(self.ds, self.cfg.train.eval_batch_size,
                                  max_seq_len=L,
                                  host_id=self.host_id,
                                  num_hosts=self.num_hosts):
            jb, seen = self._stage_eval(batch,
                                        self.ds.seen_items[batch["user"]])
            h, t = step(params, v, b, jb, seen)
            hits += float(h)
            total += float(t)
            n += 1
            if cap and n >= cap:
                break   # periodic-eval subsample (train.eval_max_batches)
        return hits / max(total, 1.0)

    def recommend(self, k: int | None = None, out_path: str | None = None):
        """Top-K lists for every eval user (ref --recommend mode; XING-style
        submission writer when out_path is set — SURVEY.md §2.1
        "Evaluation")."""
        k = k or self.cfg.train.eval_topk
        params = self._eval_params()   # once: the sparse path unpacks here
        v, b = self._item_latents(params)
        if self.use_mesh:
            v, b = pad_item_shards(v, b, self.cfg.mesh.model)
        serve_step = self._serve_step(k)
        rows = []
        L = self.spec.pack_len if self.is_seq else 0
        # multi-process: every host walks ALL hosts' (cheap, host-side)
        # batch metadata in lockstep, feeds only its own slab to the device,
        # and reads back the replicated [H·B, k] result — so each process
        # returns the COMPLETE row list while queries stay host-sharded
        H = self.num_hosts
        eb = self.cfg.train.eval_batch_size
        # other hosts' slabs are only read for (user, valid) metadata —
        # skip the native LSTM sequence packing for them (max_seq_len=0):
        # the packed inputs are only ever fed from THIS host's slab
        iters = [eval_batches(self.ds, eb,
                              max_seq_len=L if h == self.host_id else 0,
                              host_id=h, num_hosts=H) for h in range(H)]
        for batches in zip(*iters):
            mine = batches[self.host_id]
            jb, seen = self._stage_eval(mine,
                                        self.ds.seen_items[mine["user"]])
            _, ids = serve_step(params, v, b, jb, seen)
            ids = np.asarray(ids)          # replicated in multiproc mode
            per = eb
            for h, bb in enumerate(batches):
                ids_h = ids[h * per:(h + 1) * per] if H > 1 else ids
                for u, row, ok in zip(bb["user"], ids_h, bb["valid"]):
                    if ok:
                        rows.append((int(u), row.tolist()))
        if out_path and is_primary():
            with open(out_path, "w") as f:
                for u, items in rows:
                    f.write(f"{u}\t{','.join(map(str, items))}\n")
        return rows

    # ------------------------------------------------------------------
    @staticmethod
    def _data_pos(state: dict, prev_loss: float, window, best_recall: float):
        """Checkpoint position metadata: data-iterator position plus the
        plateau-decay / best-metric state (JSON-safe: inf → None)."""
        return {"epoch": state["epoch"],
                "step_in_epoch": state["step_in_epoch"],
                "prev_loss": (None if prev_loss == float("inf")
                              else float(prev_loss)),
                "window": [float(x) for x in window],
                "best_recall": float(best_recall)}

    def _maybe_restore(self):
        if self.ckpt.latest_step() is None:
            return
        # a checkpoint exists: restore MUST succeed — silently training a
        # fresh model on top of a populated train_dir corrupts the run
        target = abstract_like(
            self.state, self.state_sh if self.use_mesh else None)
        got = self.ckpt.restore(target)
        if got is not None:
            self.state, data_pos, _ = got
            if self.perms:
                # disk layout is natural (see _canonical_state) → stored
                self.state = self._tree_permute(self.state)
                self.state = tree_put_replicated(self.state, self.state_sh)
            self.start_epoch = int(data_pos.get("epoch", 0))
            self.start_step_in_epoch = int(data_pos.get("step_in_epoch", 0))
            # plateau-decay + best-metric state: restoring these makes resume
            # exact even from a mid-window (tail) checkpoint — without them
            # the loss window restarts empty and decay decisions can diverge
            # from the uninterrupted run (tests/test_checkpoint.py::
            # test_resume_restores_plateau_state)
            self._resume_prev_loss = data_pos.get("prev_loss", None)
            self._resume_window = list(data_pos.get("window", []))
            self._resume_best_recall = float(data_pos.get("best_recall", 0.0))
            print(f"[ckpt] restored step {int(self.state.step)} "
                  f"(epoch {self.start_epoch}"
                  f"+{self.start_step_in_epoch} steps)", flush=True)

    def restore_latest(self) -> None:
        """Re-restore the latest checkpoint into the current state slots —
        the serving refresh path (arec.serve.Recommender.refresh). The
        concrete state is replaced by its abstract (ShapeDtypeStruct) twin
        BEFORE the restore so the old device arrays are freed first: at
        XING scale the packed tables are ~2.9 GB and a hold-both swap
        would double the serving process's residency (the measured
        4-instance OOM margin — BASELINE.md round 4). Caller must have
        verified a checkpoint exists (ckpt.latest_step() is not None)."""
        self.state = abstract_like(
            self.state, self.state_sh if self.use_mesh else None)
        self._maybe_restore()

    def train(self) -> dict:
        """Epoch loop with periodic checkpoint + eval + plateau LR decay
        (SURVEY.md §3.1). Returns the final metrics summary.

        Restart-from-checkpoint is EXACT (SURVEY.md §5 "Failure
        detection"): the per-step rng is a pure function of the global step
        (fold_in, not a sequential split chain), the input pipeline is
        deterministically keyed on (seed, epoch), and the checkpoint
        records step-in-epoch so the iterator fast-forwards past consumed
        batches instead of replaying them."""
        if self.serve_only:
            raise RuntimeError("Trainer(serve_only=True) cannot train — "
                               "construct a full Trainer")
        t = self.cfg.train
        base_rng = jax.random.key(t.seed + 777)
        best_recall = getattr(self, "_resume_best_recall", 0.0)
        rp = getattr(self, "_resume_prev_loss", None)
        prev_loss = float("inf") if rp is None else float(rp)
        window = list(getattr(self, "_resume_window", []))
        steps_done = int(self.state.step)
        ex_since, t_since = 0, time.time()
        from arec.data.prefetch import prefetch, to_device
        from arec.train.profile import StepProfiler
        profiler = StepProfiler()
        stop = False
        skip = getattr(self, "start_step_in_epoch", 0)
        K = self.dispatch_k
        state = {"step_in_epoch": 0, "epoch": self.start_epoch}

        eval_events = 0

        def after_step(loss, lr):
            """Counters + periodic checkpoint/eval/plateau-decay
            (SURVEY.md §3.1). Returns True when max_steps is reached."""
            nonlocal steps_done, ex_since, t_since, best_recall, prev_loss
            nonlocal eval_events
            window.append(loss)
            ex_since += t.batch_size
            steps_done += 1
            state["step_in_epoch"] += 1
            if steps_done % t.steps_per_checkpoint == 0:
                jax.block_until_ready(self.state.params)
                dt = time.time() - t_since
                mean_loss = float(jnp.mean(jnp.stack(window)))
                recall = self.evaluate()
                best_recall = max(best_recall, recall)
                extra = {}
                if self.use_mesh and self.cfg.mesh.capacity_factor > 0:
                    # overflowed exchange requests since the last checkpoint
                    # (capacity_factor 0 is overflow-proof — no counter)
                    jax.effects_barrier()
                    extra["exchange_dropped"] = EXCHANGE_DROPS.read_and_reset()
                self.metrics.log(
                    steps_done, loss=mean_loss,
                    recall_at_k=recall, lr=float(lr),
                    examples_per_s=ex_since / dt,
                    examples_per_s_per_chip=ex_since / dt
                    / max(jax.device_count(), 1), **extra)
                # plateau decay (ref: --learning_rate_decay_factor)
                if mean_loss > prev_loss:
                    self.state = decay_lr(self.state, t.lr_decay)
                prev_loss = mean_loss
                window.clear()
                ex_since, t_since = 0, time.time()
                eval_events += 1
                # steps_per_checkpoint is the EVAL cadence; saves ride every
                # Nth eval event (train.save_every_evals — the final
                # checkpoint after the loop is always written)
                if eval_events % max(t.save_every_evals, 1) == 0:
                    self.ckpt.save(steps_done,
                                   self._canonical_state(self.state),
                                   self._data_pos(state, prev_loss, window,
                                                  best_recall),
                                   self.cfg.to_json())
            return bool(t.max_steps and steps_done >= t.max_steps)

        for epoch in range(self.start_epoch, t.n_epoch):
            batches = self._batches(epoch)
            state["epoch"], state["step_in_epoch"] = epoch, 0
            if skip:
                import itertools
                batches = itertools.islice(batches, skip, None)
                state["step_in_epoch"] = skip
                skip = 0
            # native-packed batches staged to device a step ahead of compute
            # (multi-process: keep numpy on the worker thread — global-array
            # assembly happens at dispatch so every process builds arrays in
            # the same order on the main thread)
            it = prefetch(batches, depth=max(2, K + 1),
                          transform=None if self.multiproc else to_device())
            pending = []
            for jb in it:
                pending.append(jb)
                # dispatch K steps at once only from a K-aligned global step
                # (keeps exactly two compiled programs: the K-scan + the
                # single step used for fill-in at epoch/max_steps edges)
                aligned = K > 1 and steps_done % K == 0
                room = (t.max_steps - steps_done) if t.max_steps else K
                if aligned and room >= K:
                    if len(pending) < K:
                        continue
                    subs = jax.vmap(
                        lambda i: jax.random.fold_in(base_rng, i))(
                        jnp.arange(steps_done, steps_done + K))
                    stacked = self._stage_stacked(pending)
                    profiler.on_step(steps_done)
                    self.state, ms = self.multi_step_fn(self.state, stacked,
                                                        subs)
                    pending = []
                    for i in range(K):
                        stop = after_step(ms["loss"][i], ms["lr"][i])
                        if stop:
                            break
                else:
                    jb = self._stage_batch(pending.pop(0))
                    sub = jax.random.fold_in(base_rng, steps_done)
                    profiler.on_step(steps_done)
                    self.state, m = self.step_fn(self.state, jb, sub)
                    stop = after_step(m["loss"], m["lr"])
                if stop:
                    break
            # epoch tail: fewer than K batches buffered
            for jb in pending:
                if stop:
                    break
                sub = jax.random.fold_in(base_rng, steps_done)
                self.state, m = self.step_fn(self.state, self._stage_batch(jb),
                                             sub)
                stop = after_step(m["loss"], m["lr"])
            if stop:
                break
        profiler.close()
        self.ckpt.drain()   # async saves: finalize before the step check
        if steps_done and self.ckpt.latest_step() != steps_done:
            # final checkpoint: training tails shorter than
            # steps_per_checkpoint must not be lost — recommend/serving
            # restore the latest step and should see the FINAL params
            # (observed: a 112-step run whose last save was step 80 served
            # the stale model). Resume from here is exact: position AND
            # plateau-decay state (prev_loss + the open loss window) are in
            # the metadata, so a resumed run makes the same decay decisions
            # as the uninterrupted one.
            jax.block_until_ready(self.state.params)
            self.ckpt.save(steps_done, self._canonical_state(self.state),
                           self._data_pos(state, prev_loss, window,
                                          best_recall),
                           self.cfg.to_json())
            self.ckpt.drain()   # train() returns with the final ckpt durable
        # terminal metric: the periodic-eval cost knobs (eval_max_batches
        # subsample, eval_recall_target approx top-k) must not silently
        # approximate the FINAL reported recall — warn loudly and keep the
        # cheap number (forcing exactness here would re-impose the ~16-min
        # exact sweep the knobs exist to avoid at XING scale; callers who
        # want the exact terminal number use trainer.evaluate(exact=True)).
        approx = (bool(self.cfg.train.eval_max_batches)
                  or self.cfg.train.eval_recall_target < 1.0)
        final_recall = self.evaluate()
        if approx and is_primary():
            print("[eval] WARNING: final recall_at_k is APPROXIMATE "
                  f"(eval_max_batches={self.cfg.train.eval_max_batches}, "
                  f"eval_recall_target="
                  f"{self.cfg.train.eval_recall_target}); call "
                  "trainer.evaluate(exact=True) for the exact metric")
        best_recall = max(best_recall, final_recall)
        self.metrics.log(steps_done, final_recall_at_k=final_recall,
                         best_recall_at_k=best_recall,
                         final_eval_approximate=float(approx))
        return {"steps": steps_done, "recall_at_k": final_recall,
                "best_recall_at_k": best_recall}
