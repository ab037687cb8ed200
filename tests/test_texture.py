"""Texture sampling tests (GL textureLod semantics: CLAMP_TO_EDGE,
NEAREST mag, LINEAR_MIPMAP_LINEAR min)."""

import pytest
import numpy as np
import jax.numpy as jnp

from voxelrs_tpu.ops.texture import build_mip_chain, sample_texture_lod


def make_mips():
    base = np.zeros((2, 4, 4, 4), np.float32)
    # layer 0: horizontal gradient in red
    for x in range(4):
        base[0, :, x, 0] = x / 3.0
    base[0, :, :, 3] = 1.0
    # layer 1: constant green
    base[1, :, :, 1] = 0.5
    base[1, :, :, 3] = 1.0
    return build_mip_chain(jnp.asarray(base), 3)


def test_mip_chain_shapes_and_means():
    mips = make_mips()
    assert [m.shape for m in mips] == [(2, 4, 4, 4), (2, 2, 2, 4), (2, 1, 1, 4)]
    # box filter preserves the mean
    np.testing.assert_allclose(
        float(mips[2][0, 0, 0, 0]), float(mips[0][0].mean(axis=(0, 1))[0]), atol=1e-6
    )


def test_nearest_at_lod0():
    mips = make_mips()
    layer = jnp.zeros(3, jnp.int32)
    uv = jnp.array([[0.1, 0.5], [0.6, 0.5], [0.99, 0.5]], jnp.float32)
    lod = jnp.zeros(3, jnp.float32)
    out = np.asarray(sample_texture_lod(mips, layer, uv, lod))
    # NEAREST: texel floor(uv*4) -> x = 0, 2, 3
    np.testing.assert_allclose(out[:, 0], [0.0, 2 / 3, 1.0], atol=1e-6)


def test_clamp_to_edge():
    mips = make_mips()
    layer = jnp.zeros(2, jnp.int32)
    uv = jnp.array([[-0.5, 0.5], [1.5, 0.5]], jnp.float32)
    lod = jnp.full(2, 0.5, jnp.float32)  # force linear path
    out = np.asarray(sample_texture_lod(mips, layer, uv, lod))
    assert out[0, 0] <= 0.1  # clamped to left edge texel region
    assert out[1, 0] >= 0.65


def test_trilinear_blend_between_mips():
    mips = make_mips()
    layer = jnp.zeros(1, jnp.int32)
    uv = jnp.array([[0.5, 0.5]], jnp.float32)
    l0 = np.asarray(sample_texture_lod(mips, layer, uv, jnp.array([0.001], jnp.float32)))
    l1 = np.asarray(sample_texture_lod(mips, layer, uv, jnp.array([1.0], jnp.float32)))
    lmid = np.asarray(sample_texture_lod(mips, layer, uv, jnp.array([0.5], jnp.float32)))
    np.testing.assert_allclose(lmid, (l0 + l1) / 2, atol=1e-5)


def test_layer_selection():
    mips = make_mips()
    uv = jnp.array([[0.5, 0.5]], jnp.float32)
    lod = jnp.array([1.0], jnp.float32)
    l0 = np.asarray(sample_texture_lod(mips, jnp.array([0]), uv, lod))
    l1 = np.asarray(sample_texture_lod(mips, jnp.array([1]), uv, lod))
    assert l0[0, 1] < 0.01 and l1[0, 1] > 0.4


def test_single_channel_stack():
    mips = tuple(m[..., 3] for m in make_mips())
    out = sample_texture_lod(
        mips, jnp.array([0]), jnp.array([[0.5, 0.5]], jnp.float32),
        jnp.array([0.0], jnp.float32),
    )
    assert out.shape == (1,)
    assert float(out[0]) == 1.0


@pytest.mark.parametrize("mode", ["nearest", "linear"])
def test_footprint_mode_bit_exact(mode):
    """footprint=True (one quad-row gather per bilinear sample) must be
    BIT-identical to the four-gather path: same texels (incl. the
    uv-edge clamp windows), same lerp order."""
    rng = np.random.default_rng(11)
    mips = build_mip_chain(
        jnp.asarray(rng.random((3, 16, 16, 4)).astype(np.float32)), 5
    )
    B = 4096
    layer = jnp.asarray(rng.integers(0, 3, B).astype(np.int32))
    # bias uv toward the edges/corners where the clamp windows live
    uv_u = rng.random((B, 2))
    uv_e = np.clip(rng.normal(0.5, 0.7, (B, 2)), 0.0, 1.0)
    uv = jnp.asarray(np.where(rng.random((B, 1)) < 0.5, uv_u, uv_e)
                     .astype(np.float32))
    lod = jnp.asarray((rng.random(B) * 5.5 - 0.5).astype(np.float32))
    a = np.asarray(sample_texture_lod(mips, layer, uv, lod, mip_mode=mode))
    b = np.asarray(sample_texture_lod(mips, layer, uv, lod, mip_mode=mode,
                                      footprint=True))
    assert (a == b).all(), f"{(a != b).sum()} mismatching components"
