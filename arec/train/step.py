"""Jitted train step + optimizer construction.

Rebuild of the reference's per-step `session.run([train_op, loss])`
(SURVEY.md §3.1). Where the reference crossed host→device every step with a
feed_dict, here the ONLY host↔device boundary is shipping the integer batch;
negative sampling, lookups, loss, backward, and the optimizer update are one
XLA program. Params and optimizer state are donated, so tables are updated
in place in HBM.

Optimizers (ref: SGD/Adagrad — SURVEY.md §3.1): optax adagrad/sgd/adam.
Embedding gradients materialize dense under jit (scatter-add of the gather
transpose); XLA fuses the chain, and dense Adagrad on a zero-gradient row is
a no-op, so the math matches TF1's sparse IndexedSlices updates.
Learning-rate decay-on-plateau (ref: --learning_rate_decay_factor) is
implemented via an lr *scale* carried in train state and folded into the
update, so decaying lr does not retrace or rebuild the optimizer.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    lr_scale: jnp.ndarray   # scalar f32, multiplied into the base lr
    step: jnp.ndarray       # scalar i32


def make_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    # inject_hyperparams exposes lr for the plateau-decay scale below
    if name == "adagrad":
        return optax.inject_hyperparams(optax.adagrad)(learning_rate=learning_rate)
    if name == "sgd":
        return optax.inject_hyperparams(optax.sgd)(learning_rate=learning_rate)
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    raise ValueError(f"unknown optimizer {name!r}")


def init_state(params, opt: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        lr_scale=jnp.asarray(1.0, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )


def make_step_core(
    loss_fn: Callable[..., jnp.ndarray],
    opt: optax.GradientTransformation,
    base_lr: float,
    with_grad_norm: bool = True,
) -> Callable:
    """The pure (un-jitted) step: loss_fn(params, batch, rng) -> scalar,
    returns step(state, batch, rng) -> (state, metrics).
    with_grad_norm=False skips the global_norm reduction over every
    parameter (the mesh path's choice — it is pure observability)."""

    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        opt_state = state.opt_state
        # plateau decay: scale the injected lr hyperparam
        opt_state.hyperparams["learning_rate"] = base_lr * state.lr_scale
        updates, opt_state = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.lr_scale, state.step + 1)
        metrics = {"loss": loss, "lr": base_lr * state.lr_scale}
        if with_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    opt: optax.GradientTransformation,
    base_lr: float,
    donate: bool = True,
) -> Callable:
    """Jitted single step(state, batch, rng) -> (state, metrics)."""
    return jax.jit(make_step_core(loss_fn, opt, base_lr),
                   donate_argnums=(0,) if donate else ())


def split_devs(batch):
    """(batch-without-DEVS_KEY, devs-or-None). Step cores call this and
    fall back to their closed-over attribute maps when devs is None — the
    Trainer attaches DEVS_KEY so big-attr maps enter the jit as ARGUMENTS
    instead of HLO constants (arec.dist.specs.DEVS_KEY rationale)."""
    from arec.dist.specs import DEVS_KEY
    if isinstance(batch, dict) and DEVS_KEY in batch:
        batch = dict(batch)
        return batch, batch.pop(DEVS_KEY)
    return batch, None


def scan_multi(core: Callable) -> Callable:
    """Wrap any step core (state, batch, rng) -> (state, metrics) into
    multi(state, batches, rngs) scanning a leading K axis: one lax.scan =
    one XLA program = one host→device dispatch. Metrics come back as [K]
    arrays. A DEVS_KEY entry in `batches` is NOT scanned — it rides as a
    scan-invariant and is re-attached to each step's batch."""
    from arec.dist.specs import DEVS_KEY

    def multi(state: TrainState, batches, rngs):
        devs = None
        if isinstance(batches, dict) and DEVS_KEY in batches:
            batches = dict(batches)
            devs = batches.pop(DEVS_KEY)

        def body(st, inp):
            b, r = inp
            if devs is not None:
                b = {**b, DEVS_KEY: devs}
            st, m = core(st, b, r)
            return st, m

        state, ms = jax.lax.scan(body, state, (batches, rngs))
        return state, ms

    return multi


def make_multi_step(
    loss_fn: Callable[..., jnp.ndarray],
    opt: optax.GradientTransformation,
    base_lr: float,
    donate: bool = True,
) -> Callable:
    """K optimizer steps per dispatch: multi(state, batches, rngs) where
    every leaf of `batches` and `rngs` is stacked on a leading K axis.
    One lax.scan = one XLA program = one host→device dispatch, so per-step
    launch latency (measured ~0.6 ms/step over a remote-TPU tunnel, ~25% of
    step time at batch 16k) is amortized K-fold. Step-for-step identical to
    K calls of make_train_step: same rng per global step, same update
    order — so checkpoints/resume/metrics are unaffected. Mesh/sparse
    counterparts: Trainer._make_sharded_multi_step,
    arec.train.sparse.make_sparse_multi_step."""
    return jax.jit(scan_multi(make_step_core(loss_fn, opt, base_lr)),
                   donate_argnums=(0,) if donate else ())


def decay_lr(state: TrainState, factor: float) -> TrainState:
    return state._replace(lr_scale=state.lr_scale * factor)
