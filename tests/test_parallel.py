"""Pixel-space sharding over the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.parallel.mesh import make_ray_mesh, render_frame_sharded
from voxelrs_tpu.world import ChunkPos, Position
from voxelrs_tpu.world.esvo import PREAMBLE_LENGTH_IN_U32, Esvo, SerializedChunk


@pytest.fixture(scope="module")
def scene():
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[:, :10, :] = 3
    vox[:, 10, :] = 1
    world = Esvo()
    world.set_leaf(
        Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True
    )
    world.serialize()
    buf = np.zeros(1 << 16, np.uint32)
    world.write_to(buf)
    mips, mat_params, mat_tex = new_registry().build()
    return buf, np.float32(2.0 ** -world.depth()), mips, mat_params, mat_tex


def render(scene, mesh, width=64, height=48):
    buf, scale, mips, mat_params, mat_tex = scene
    fwd = np.array([0.4, -0.5, 0.75], np.float32)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]).astype(np.float32)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd).astype(np.float32)
    return render_frame_sharded(
        mesh, buf, scale, mips, mat_params, mat_tex,
        width=width, height=height, render_shadows=True,
        cam_pos=np.array([5.0, 20.0, -5.0], np.float32),
        cam_right=right, cam_up=up, cam_fwd=fwd,
        fov_y_rad=np.float32(np.radians(70)), aspect=np.float32(64 / 48),
        ambient=np.float32(0.3),
        light_dir=np.array([-1, -1, -1], np.float32) / np.sqrt(3),
        shadow_distance=np.float32(100.0),
        highlight_pos=np.full(3, np.nan, np.float32),
        max_steps=128,
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(scene):
    mesh8 = make_ray_mesh(jax.devices())
    img8 = np.asarray(render(scene, mesh8))

    mesh1 = make_ray_mesh(jax.devices()[:1])
    img1 = np.asarray(render(scene, mesh1))

    assert img8.shape == (48, 64, 4)
    assert not np.isnan(img8).any()
    np.testing.assert_allclose(img8, img1, atol=1e-6)


def test_sharding_layout(scene):
    mesh8 = make_ray_mesh(jax.devices())
    out = render(scene, mesh8)
    # rows sharded over 8 devices
    assert len(out.sharding.device_set) == 8


# ---------------------------------------------------------------------------
# Production-pipeline sharding: the deferred/adaptive path (ops/shading.py
# _opaque_frame_body under a _StaticPlanner) SPMD over the mesh — NOT the
# classic fused kernel above. Content is deliberately uneven across row
# slabs (tower in the middle rows, empty sky at the top).
# ---------------------------------------------------------------------------

from voxelrs_tpu.graphics.svo import RenderParams, Svo


def _tower_world():
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[:, :8, :] = 3
    vox[:, 8, :] = 1
    vox[10:14, 9:18, 10:14] = 12  # tower: rows differ per slab
    world = Esvo()
    world.set_leaf(
        Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True
    )
    world.serialize()
    return world


def _params(shadows=True):
    fwd = np.array([0.5, -0.5, 0.7], np.float32)
    return RenderParams(
        cam_pos=np.array([2.0, 20.0, -4.0], np.float32),
        cam_fwd=fwd / np.linalg.norm(fwd),
        aspect_ratio=4 / 3,
        render_shadows=shadows,
        shadow_distance=100.0,
    )


@pytest.fixture(scope="module")
def svo_scene():
    svo = Svo(new_registry(), capacity_mb=4)
    svo.update(_tower_world())
    return svo


def test_sharded_production_matches_single(svo_scene, monkeypatch):
    """8-device SPMD production pipeline == single-device deferred render
    (shadows on, flat grid)."""
    monkeypatch.setenv("VOXELRS_ADAPTIVE", "0")
    p = _params()
    single = np.asarray(svo_scene.render(p, 96, 72, max_steps=300))
    mesh = make_ray_mesh(jax.devices())
    sharded = np.asarray(svo_scene.render_sharded(mesh, p, 96, 72,
                                                  max_steps=300))
    assert sharded.shape == (72, 96, 4)
    assert not np.isnan(sharded).any()
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_production_adaptive_hierarchy(svo_scene, monkeypatch):
    """Adaptive + two-level hierarchy per slab stays within the thick-ray
    budget of the exact single-device render."""
    monkeypatch.setenv("VOXELRS_ADAPTIVE", "0")
    p = _params()
    exact = np.asarray(svo_scene.render(p, 96, 72, max_steps=300))
    monkeypatch.setenv("VOXELRS_ADAPTIVE", "1")
    monkeypatch.setenv("VOXELRS_HIERARCHY", "1")
    mesh = make_ray_mesh(jax.devices())
    sharded = np.asarray(svo_scene.render_sharded(mesh, p, 96, 72,
                                                  max_steps=300))
    assert not np.isnan(sharded).any()
    diff = np.abs(exact.astype(np.float64) - sharded.astype(np.float64))
    assert diff.mean() < 0.004
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.03


def test_sharded_production_with_beams_and_sun(monkeypatch):
    """Beam floors + per-voxel sun certificates ride the SPMD path: the
    sharded image matches the single-device deferred render that uses the
    same beam context (certificates are bit-identical to tracing)."""
    from voxelrs_tpu.world.heightfield import (HeightField,
                                               chunk_column_tops,
                                               chunk_solid_bases,
                                               chunk_voxel_tops,
                                               opaque_lut_from_mask)

    vox = np.zeros((32, 32, 32), np.uint32)
    h = (8 + (np.add.outer(np.arange(32), np.arange(32)) // 4)).astype(int)
    for x in range(32):
        for z in range(32):
            vox[x, :h[x, z], z] = 3
            vox[x, h[x, z], z] = 1
    world = Esvo()
    world.set_leaf(
        Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True
    )
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=4)
    svo.update(world)
    hf = HeightField()
    lut = opaque_lut_from_mask(svo.translucent_block_mask)
    hf.set_chunk((0, 0, 0), chunk_column_tops(vox, 5),
                 vtops=chunk_voxel_tops(vox, 5),
                 sbase=chunk_solid_bases(vox, 5, lut))
    svo.set_heightfield(hf)

    monkeypatch.setenv("VOXELRS_ADAPTIVE", "0")
    p = _params()
    single = np.asarray(svo.render(p, 96, 72, max_steps=300))
    mesh = make_ray_mesh(jax.devices())
    sharded = np.asarray(svo.render_sharded(mesh, p, 96, 72, max_steps=300))
    assert not np.isnan(sharded).any()
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_production_csvo(monkeypatch):
    """The CSVO byte-stream engine runs under the mesh through the same
    SPMD body."""
    from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk

    vox = np.zeros((32, 32, 32), np.uint32)
    vox[:, :8, :] = 3
    vox[:, 8, :] = 1
    vox[10:14, 9:18, 10:14] = 12
    world = Csvo()
    world.set_leaf(
        Position(0, 0, 0),
        CsvoSerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True,
    )
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=4, buffer_dtype=np.uint8)
    svo.update(world)

    monkeypatch.setenv("VOXELRS_ADAPTIVE", "0")
    p = _params()
    single = np.asarray(svo.render(p, 96, 72, max_steps=300))
    mesh = make_ray_mesh(jax.devices())
    sharded = np.asarray(svo.render_sharded(mesh, p, 96, 72, max_steps=300))
    assert not np.isnan(sharded).any()
    np.testing.assert_allclose(sharded, single, atol=1e-5)
