"""Fused Pallas sampled-softmax kernel vs the pure-JAX oracle: values and
gradients (q, candidate embeddings, biases) must agree. Runs in interpreter
mode on CPU (same code path as TPU — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.losses.losses import sampled_softmax_loss
from arec.losses.sampling import draw

N, D, S, V = 48, 16, 32, 200


def _setup(seed=0):
    k = jax.random.key(seed)
    kq, kt, ke, kr = jax.random.split(k, 4)
    q = jax.random.normal(kq, (N, D))
    true_ids = jax.random.randint(kt, (N,), 0, V, dtype=jnp.int32)
    table = jax.random.normal(ke, (V + 1, D)) * 0.3
    bias_v = jax.random.normal(jax.random.fold_in(ke, 1), (V + 1,)) * 0.1
    return q, true_ids, table, bias_v, kr


def _loss(q, table, bias_v, true_ids, rng, use_kernel, weights=None):
    return sampled_softmax_loss(
        q, true_ids,
        embed=lambda ids: (table[ids], bias_v[ids]),
        rng=rng, num_sampled=S, vocab=V,
        compute_dtype=jnp.float32, weights=weights,
        use_kernel=use_kernel)


@pytest.mark.parametrize("weighted", [False, True])
def test_fused_matches_pure(weighted):
    q, true_ids, table, bias_v, rng = _setup()
    w = (jnp.asarray(np.random.default_rng(1).integers(0, 2, N), jnp.float32)
         if weighted else None)
    ref = _loss(q, table, bias_v, true_ids, rng, False, w)
    got = _loss(q, table, bias_v, true_ids, rng, True, w)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_pure():
    q, true_ids, table, bias_v, rng = _setup(3)

    def f(use_kernel):
        def loss(q, table, bias_v):
            return _loss(q, table, bias_v, true_ids, rng, use_kernel)
        return jax.grad(loss, argnums=(0, 1, 2))(q, table, bias_v)

    gq_r, gt_r, gb_r = f(False)
    gq_k, gt_k, gb_k = f(True)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gt_k), np.asarray(gt_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_r),
                               rtol=2e-4, atol=2e-5)


def test_fused_handles_accidental_hits():
    """Force collisions: every sampled id equals some row's true id."""
    q, true_ids, table, bias_v, rng = _setup(5)
    sampled_ids = jnp.concatenate(
        [true_ids[:S // 2], jnp.arange(S - S // 2, dtype=jnp.int32)])
    p = jnp.full((S,), 1.0 / V)
    ref = sampled_softmax_loss(
        q, true_ids, lambda i: (table[i], bias_v[i]),
        rng, S, V, dist="uniform", compute_dtype=jnp.float32,
        sampled=(sampled_ids, p), use_kernel=False)
    got = sampled_softmax_loss(
        q, true_ids, lambda i: (table[i], bias_v[i]),
        rng, S, V, dist="uniform", compute_dtype=jnp.float32,
        sampled=(sampled_ids, p), use_kernel=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)


def test_fused_pads_non_multiple_rows():
    """N not a multiple of the 256-row tile: padding rows must not leak."""
    q, true_ids, table, bias_v, rng = _setup(7)
    n2 = 300   # > 256 tile, not a multiple
    q2 = jnp.tile(q, (7, 1))[:n2]
    t2 = jnp.tile(true_ids, 7)[:n2]
    ref = _loss(q2, table, bias_v, t2, rng, False)
    got = _loss(q2, table, bias_v, t2, rng, True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)


def _aug_loss(q, taug, true_ids, rng, use_kernel, weights=None, mesh=None):
    """Loss through the kernel's AUG path: embed_raw feeds the raw
    [n, D+1] rows (bias in lane D) straight in."""
    return sampled_softmax_loss(
        q, true_ids,
        embed=lambda ids: (taug[ids, :D], taug[ids, D]),
        embed_raw=lambda ids: taug[ids],
        rng=rng, num_sampled=S, vocab=V,
        compute_dtype=jnp.float32, weights=weights,
        use_kernel=use_kernel, mesh=mesh)


@pytest.mark.parametrize("weighted", [False, True])
def test_fused_aug_matches_pure(weighted):
    q, true_ids, table, bias_v, rng = _setup(13)
    w = (jnp.asarray(np.random.default_rng(2).integers(0, 2, N), jnp.float32)
         if weighted else None)
    taug = jnp.concatenate([table, bias_v[:, None]], axis=1)
    ref = _loss(q, table, bias_v, true_ids, rng, False, w)
    got = _aug_loss(q, taug, true_ids, rng, True, w)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)


def test_fused_aug_gradients_match_pure():
    """d(taug) must carry the table grad in columns :D and the bias grad
    in column D — the exact scatter-add update-row layout."""
    q, true_ids, table, bias_v, rng = _setup(17)
    taug = jnp.concatenate([table, bias_v[:, None]], axis=1)

    gq_r, gt_r, gb_r = jax.grad(
        lambda q, t, b: _loss(q, t, b, true_ids, rng, False),
        argnums=(0, 1, 2))(q, table, bias_v)
    gq_k, gaug = jax.grad(
        lambda q, t: _aug_loss(q, t, true_ids, rng, True),
        argnums=(0, 1))(q, taug)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gaug[:, :D]), np.asarray(gt_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gaug[:, D]), np.asarray(gb_r),
                               rtol=2e-4, atol=2e-5)


def test_fused_aug_under_mesh_matches_pure():
    """AUG mode through the shard_map wrapper (v_true width D+1)."""
    from arec.dist.mesh import make_mesh
    mesh = make_mesh(2, 4)
    q, true_ids, table, bias_v, rng = _setup(19)
    taug = jnp.concatenate([table, bias_v[:, None]], axis=1)
    ref = _loss(q, table, bias_v, true_ids, rng, False)
    got = jax.jit(lambda q, t: _aug_loss(q, t, true_ids, rng, True,
                                         mesh=mesh))(q, taug)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)
    gq_r, gt_r, gb_r = jax.grad(
        lambda q, t, b: _loss(q, t, b, true_ids, rng, False),
        argnums=(0, 1, 2))(q, table, bias_v)
    gq_k, gaug = jax.jit(jax.grad(
        lambda q, t: _aug_loss(q, t, true_ids, rng, True, mesh=mesh),
        argnums=(0, 1)))(q, taug)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gaug[:, :D]), np.asarray(gt_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gaug[:, D]), np.asarray(gb_r),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1), (1, 8)],
                         ids=lambda s: f"{s[0]}x{s[1]}")
def test_fused_under_mesh_matches_pure(shape):
    """The shard_map kernel wrapper (rows split over every mesh axis,
    sampled side replicated): loss and ALL grads — including the psum'd
    cotangents of the replicated v_samp/c_samp — must match the pure-JAX
    path. Also exercises row padding: N=48 is not a multiple of 8·256."""
    from arec.dist.mesh import make_mesh
    mesh = make_mesh(*shape)
    q, true_ids, table, bias_v, rng = _setup(11)

    def loss(q, table, bias_v, use_kernel, mesh=None):
        return sampled_softmax_loss(
            q, true_ids, embed=lambda ids: (table[ids], bias_v[ids]),
            rng=rng, num_sampled=S, vocab=V, compute_dtype=jnp.float32,
            use_kernel=use_kernel, mesh=mesh)

    ref_l = loss(q, table, bias_v, False)
    got_l = jax.jit(lambda *a: loss(*a, True, mesh))(q, table, bias_v)
    np.testing.assert_allclose(float(got_l), float(ref_l),
                               rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2))(
        q, table, bias_v)
    g_got = jax.jit(jax.grad(lambda *a: loss(*a, True, mesh),
                             argnums=(0, 1, 2)))(q, table, bias_v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_bf16_primals_grads_match_and_keep_dtype():
    """bf16 activations (TrainConfig.act_dtype): q / v_true may arrive in
    bfloat16 — the kernel must emit dq/dvt in the PRIMAL dtype (custom_vjp
    aval contract) and stay close to the pure-JAX oracle run at the same
    precision."""
    q, true_ids, table, bias_v, rng = _setup(7)

    def f(use_kernel):
        def loss(q16, table16, bias_v):
            return sampled_softmax_loss(
                q16, true_ids,
                embed=lambda ids: (table16[ids], bias_v[ids]),
                rng=rng, num_sampled=S, vocab=V,
                compute_dtype=jnp.float32, use_kernel=use_kernel)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(
            q.astype(jnp.bfloat16), table.astype(jnp.bfloat16), bias_v)

    (lr, (gq_r, gt_r, gb_r)) = f(False)
    (lk, (gq_k, gt_k, gb_k)) = f(True)
    assert gq_k.dtype == jnp.bfloat16 and gt_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gq_k, np.float32),
                               np.asarray(gq_r, np.float32),
                               rtol=0.1, atol=0.02)
    np.testing.assert_allclose(np.asarray(gt_k, np.float32),
                               np.asarray(gt_r, np.float32),
                               rtol=0.1, atol=0.02)
    np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_r),
                               rtol=2e-2, atol=2e-3)
