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
