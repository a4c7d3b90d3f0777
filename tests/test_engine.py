"""Embedding-engine unit tests vs a numpy oracle (SURVEY.md §4:
"cat/mulhot lookup+pooling vs numpy oracle; fusion module shapes/grads")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arec.data.schema import (
    CAT, MULHOT, AttrField, AttributeData, EntitySchema, pad_mulhot,
)
from arec.tables.engine import (
    EncoderSpec, attrs_to_device, encode, encode_all_items, init_encoder,
)

DIM = 8
N = 11


def _schema_and_attrs():
    schema = EntitySchema(
        "item", N,
        (
            EntitySchema.id_field("item", N),
            AttrField("cat_a", CAT, 5),
            AttrField("mh", MULHOT, 7, max_degree=3),
        ),
    )
    rng = np.random.default_rng(0)
    cat_a = rng.integers(0, 5, N).astype(np.int32)
    lists = [sorted(set(rng.integers(0, 7, rng.integers(0, 4)).tolist()))
             for _ in range(N)]
    mh, mh_len = pad_mulhot(lists, 3)
    attrs = AttributeData(
        schema,
        {"item_id": np.arange(N, dtype=np.int32), "cat_a": cat_a, "mh": mh},
        {"mh": mh_len},
    )
    attrs.validate()
    return schema, attrs


def _numpy_oracle(params, spec, attrs, ids):
    """Straight-line numpy reimplementation of SURVEY.md §3.5 (the fused
    table is sliced back into per-field tables by the static offsets)."""
    fused = np.asarray(params["tables"]["__fused__"])
    offsets = spec.field_offsets()
    out_attrs = []
    for f in spec.schema.fields:
        t = fused[offsets[f.name]: offsets[f.name] + f.table_rows]
        embs = np.zeros((len(ids), DIM))
        for r, i in enumerate(ids):
            if i >= spec.schema.num_entities:
                continue  # pad entity → masked to zero at the end anyway
            if f.kind == CAT:
                embs[r] = t[attrs.values[f.name][i]]
            else:
                ln = attrs.lengths[f.name][i]
                if ln > 0:
                    rows = t[attrs.values[f.name][i, :ln]]
                    embs[r] = rows.mean(axis=0)
        out_attrs.append(embs)
    x = np.concatenate(out_attrs, axis=-1)
    fz = params.get("fusion")
    if spec.fusion == "sum":
        out = sum(out_attrs[1:], start=out_attrs[0])
    elif fz is None:
        out = x
    else:
        out = x @ np.asarray(fz["w1"]) + np.asarray(fz["b1"])
        if spec.nonlinear:
            out = np.tanh(out) @ np.asarray(fz["w2"]) + np.asarray(fz["b2"])
    out[np.asarray(ids) >= spec.schema.num_entities] = 0.0
    return out


@pytest.mark.parametrize("fusion,nonlinear", [("concat", False),
                                              ("concat", True),
                                              ("sum", False)])
def test_encode_matches_numpy_oracle(fusion, nonlinear):
    schema, attrs = _schema_and_attrs()
    spec = EncoderSpec(schema, DIM, fusion, nonlinear)
    params = init_encoder(jax.random.key(1), spec)
    dev = attrs_to_device(attrs)
    ids = np.array([0, 3, 10, 7, N], np.int32)  # N = pad entity
    got = np.asarray(encode(params, spec, dev, jnp.asarray(ids)))
    want = _numpy_oracle(params, spec, attrs, ids)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_encode_pad_is_zero_and_shapes():
    schema, attrs = _schema_and_attrs()
    spec = EncoderSpec(schema, DIM)
    params = init_encoder(jax.random.key(2), spec)
    dev = attrs_to_device(attrs)
    out = encode(params, spec, dev, jnp.full((4, 5), N, jnp.int32))
    assert out.shape == (4, 5, DIM)
    assert np.abs(np.asarray(out)).max() == 0.0


def test_id_only_is_raw_table():
    schema, attrs = _schema_and_attrs()
    spec = EncoderSpec(schema.id_only(), DIM)
    assert not spec.needs_proj
    params = init_encoder(jax.random.key(3), spec)
    dev = attrs_to_device(attrs.restrict(schema.id_only()))
    ids = jnp.asarray([2, 5], jnp.int32)
    out = encode(params, spec, dev, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(params["tables"]["__fused__"])[[2, 5]],
        rtol=1e-6)


def test_encode_all_items_matches_batched_encode():
    schema, attrs = _schema_and_attrs()
    spec = EncoderSpec(schema, DIM)
    params = init_encoder(jax.random.key(4), spec)
    dev = attrs_to_device(attrs)
    all_v = encode_all_items(params, spec, dev, block=4)  # N=11 not divisible
    direct = encode(params, spec, dev, jnp.arange(N, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(all_v), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)


def test_encode_grads_flow_and_finite():
    schema, attrs = _schema_and_attrs()
    spec = EncoderSpec(schema, DIM, "concat", True)
    params = init_encoder(jax.random.key(5), spec)
    dev = attrs_to_device(attrs)
    ids = jnp.asarray([1, 2, 3], jnp.int32)

    def f(p):
        return encode(p, spec, dev, ids).sum()

    g = jax.grad(f)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # gradient reaches the looked-up rows of the id sub-table but not others
    # (the entity-id field is field 0 → offset 0 in the fused table)
    gid = np.asarray(g["tables"]["__fused__"])
    assert np.abs(gid[[1, 2, 3]]).sum() > 0
    assert np.abs(gid[[0, 6]]).sum() == 0


def test_dense_and_gather_mulhot_paths_agree():
    """The dense multihot-matmul fast path must be numerically equivalent to
    the gather + mask-mean path (threshold toggles which one runs)."""
    schema, attrs = _schema_and_attrs()
    dense_spec = EncoderSpec(schema, DIM, dense_mulhot_threshold=512)
    gather_spec = EncoderSpec(schema, DIM, dense_mulhot_threshold=0)
    params = init_encoder(jax.random.key(7), dense_spec)
    ids = jnp.asarray([0, 4, 9, N], jnp.int32)
    out_d = encode(params, dense_spec, attrs_to_device(attrs, dense_spec), ids)
    out_g = encode(params, gather_spec, attrs_to_device(attrs, gather_spec), ids)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                               rtol=1e-5, atol=1e-6)

    def loss(p, spec, dev):
        return (encode(p, spec, dev, ids) ** 2).sum()

    g_d = jax.grad(loss)(params, dense_spec, attrs_to_device(attrs, dense_spec))
    g_g = jax.grad(loss)(params, gather_spec, attrs_to_device(attrs, gather_spec))
    np.testing.assert_allclose(np.asarray(g_d["tables"]["__fused__"]),
                               np.asarray(g_g["tables"]["__fused__"]),
                               rtol=1e-5, atol=1e-6)


def test_identity_contract_enforced():
    """The entity-ID field's arithmetic lookup rests on the prep contract
    that its value map is the identity (schema.py id_identity);
    attrs_to_device must refuse data that violates it rather than silently
    encoding wrong rows."""
    schema, attrs = _schema_and_attrs()
    spec = EncoderSpec(schema, DIM, dense_mulhot_threshold=0)
    assert [f.name for f in spec.identity_cat_fields] == ["item_id"]
    bad = AttributeData(
        schema,
        {**attrs.values,
         "item_id": np.roll(attrs.values["item_id"], 1)},
        attrs.lengths,
    )
    with pytest.raises(AssertionError, match="identity"):
        attrs_to_device(bad, spec)


def test_compact_lookup_matches_dense_forward_and_grad():
    """engine.make_compact_lookup (TrainConfig.compact_table_grads) must be
    value- and gradient-identical to dense_lookup under heavy duplication
    (the whole point is reshaping the BACKWARD scatter, not the math)."""
    from arec.tables.engine import dense_lookup, make_compact_lookup
    rng = np.random.default_rng(0)
    V, D, N = 97, 8, 400
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray(np.minimum(rng.zipf(1.3, N) - 1, V - 1)
                      .astype(np.int32)).reshape(40, 10)
    compact = make_compact_lookup()
    np.testing.assert_array_equal(np.asarray(compact(table, ids)),
                                  np.asarray(dense_lookup(table, ids)))
    w = jnp.asarray(rng.normal(size=(40, 10, D)), jnp.float32)
    g0 = jax.grad(lambda t: jnp.sum(dense_lookup(t, ids) * w))(table)
    g1 = jax.jit(jax.grad(lambda t: jnp.sum(compact(t, ids) * w)))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-6, atol=1e-6)
