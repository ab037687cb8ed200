"""Tiny-table per-lane lookups as one-hot reductions (bit-exact).

On the target hardware EVERY data-dependent per-lane gather costs
~4.1 ms per million lanes regardless of table size (docs/PERF.md cost
model: the fetch is per ROW, "table bytes alone irrelevant"), while a
one-hot masked reduction over a small static table is fused elementwise
VPU work at ~60x less (the measured "(H, B) one-hot masked select"
line). These helpers replace ``table[idx]`` for tables of at most
``MAX_ROWS`` rows: material parameter rows, face basis vectors, mip
level metadata.

Bit-exactness: float tables are reduced in their uint32 bit patterns —
an integer sum whose terms are a single row plus zeros reproduces the
row bits exactly (no -0.0 + 0.0 = +0.0 flush, NaN payloads preserved) —
so swapping a gather for ``small_lookup`` cannot change a single output
bit anywhere downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_ROWS = 64


def small_lookup(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[clip(idx, 0, V-1)]`` as a one-hot reduction.

    Args:
      table: (V,) or (V, C) array, V <= MAX_ROWS, float32 or integer.
      idx: integer lane indices of any shape.

    Returns the looked-up rows with shape ``idx.shape + table.shape[1:]``,
    bit-identical to the gather (out-of-range indices clamp, matching
    jax's default gather semantics on the accelerators we run on).
    """
    V = table.shape[0]
    assert V <= MAX_ROWS, f"small_lookup is for tiny tables, got {V} rows"
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    assert t.ndim == 2

    idx = jnp.clip(idx.astype(jnp.int32), 0, V - 1)
    lead = idx.shape
    oh = idx.reshape(-1)[:, None] == jnp.arange(V, dtype=jnp.int32)[None, :]

    if jnp.issubdtype(t.dtype, jnp.floating):
        assert t.dtype == jnp.float32, t.dtype
        bits = jax.lax.bitcast_convert_type(t, jnp.uint32)
        out = jnp.sum(
            jnp.where(oh[:, :, None], bits[None, :, :], jnp.uint32(0)), axis=1
        )
        out = jax.lax.bitcast_convert_type(out, jnp.float32)
    else:
        out = jnp.sum(
            jnp.where(oh[:, :, None], t[None, :, :], t.dtype.type(0)), axis=1
        ).astype(t.dtype)

    out = out.reshape(lead + (t.shape[1],))
    return out[..., 0] if squeeze else out
