"""Float bit-manipulation primitives used by the traversal kernel.

The ESVO algorithm works directly on IEEE-754 f32 mantissa bits
(reference: assets/shaders/svo.esvo.glsl:19-24,335-391). These helpers map
the GLSL intrinsics onto jax.lax bit ops — they are exact, not approximate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_SCALE = 23
EPSILON = 2.0**-23  # exp2(-MAX_SCALE)
SIGN_MASK = jnp.uint32(0x80000000)


def f32_bits(x):
    """floatBitsToUint."""
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def bits_f32(u):
    """uintBitsToFloat."""
    return jax.lax.bitcast_convert_type(u.astype(jnp.uint32), jnp.float32)


def find_msb(u):
    """GLSL findMSB for uint: index of highest set bit, -1 for 0."""
    return 31 - jax.lax.clz(u.astype(jnp.uint32)).astype(jnp.int32)


def copysign_epsilon(rd):
    """Replace |rd| < EPSILON with EPSILON carrying rd's sign bit
    (reference: svo.esvo.glsl:83-89). Preserves signed zero semantics."""
    eps_bits = f32_bits(jnp.float32(EPSILON)) & ~SIGN_MASK
    sub = bits_f32(eps_bits | (f32_bits(rd) & SIGN_MASK))
    return jnp.where(jnp.abs(rd) < EPSILON, sub, rd)


def exp2i(scale):
    """Exact 2^(scale - MAX_SCALE) for integer scale in [-126+23, 23]."""
    return jnp.exp2((scale - MAX_SCALE).astype(jnp.float32))


def floor_to_scale(p, scale):
    """Truncate f32 mantissa below ``scale`` bits: the POP round-down
    (reference: svo.esvo.glsl:374-382). Returns (floored value, shifted bits)."""
    sh = (f32_bits(p) >> scale.astype(jnp.uint32)).astype(jnp.uint32)
    return bits_f32(sh << scale.astype(jnp.uint32)), sh


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
