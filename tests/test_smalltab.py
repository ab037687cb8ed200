"""small_lookup must be BIT-identical to the gather it replaces."""

import numpy as np
import jax.numpy as jnp

from voxelrs_tpu.ops.smalltab import small_lookup


def test_float_rows_bit_exact():
    rng = np.random.default_rng(7)
    table = rng.standard_normal((13, 8)).astype(np.float32)
    # adversarial bit patterns: -0.0, NaN payloads, denormals, infs
    table[0, 0] = -0.0
    table[1, 1] = np.nan
    table[2, 2] = np.float32(1e-42)  # denormal
    table[3, 3] = np.inf
    table[4, 4] = -np.inf
    table = np.asarray(table)
    idx = rng.integers(-2, 16, size=257)  # includes out-of-range (clamps)
    got = np.asarray(small_lookup(jnp.asarray(table), jnp.asarray(idx)))
    want = table[np.clip(idx, 0, 12)]
    assert got.dtype == np.float32
    assert np.array_equal(
        got.view(np.uint32), want.view(np.uint32)
    ), "bit mismatch"


def test_int_and_1d_tables():
    rng = np.random.default_rng(3)
    t_i = rng.integers(-(2**30), 2**30, size=(6, 3), dtype=np.int32)
    idx = rng.integers(0, 6, size=100)
    assert np.array_equal(
        np.asarray(small_lookup(jnp.asarray(t_i), jnp.asarray(idx))),
        t_i[idx],
    )
    t_u = rng.integers(0, 2**32, size=7, dtype=np.uint32)
    assert np.array_equal(
        np.asarray(small_lookup(jnp.asarray(t_u), jnp.asarray(idx % 7))),
        t_u[idx % 7],
    )
    t_f = rng.standard_normal(9).astype(np.float32)
    assert np.array_equal(
        np.asarray(small_lookup(jnp.asarray(t_f), jnp.asarray(idx % 9))),
        t_f[idx % 9],
    )


def test_nd_index_shapes():
    table = np.arange(12, dtype=np.int32).reshape(4, 3)
    idx = np.array([[0, 3], [2, 1]])
    got = np.asarray(small_lookup(jnp.asarray(table), jnp.asarray(idx)))
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got, table[idx])
