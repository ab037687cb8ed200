"""Camera frustum culling + streaming prioritization
(model: reference camera.rs:102-137 test + world.rs:236-262)."""

import numpy as np

from voxelrs_tpu.gamelogic.world import World as GameWorld
from voxelrs_tpu.graphics.camera import Camera
from voxelrs_tpu.systems.chunkloader import load
from voxelrs_tpu.world.chunk import ChunkPos


def make_camera():
    cam = Camera(72.0, 1.0, 0.01, 30.0)
    cam.position = np.zeros(3, np.float32)
    cam.forward = np.array([0, 0, 1], np.float32)
    return cam


def test_is_in_frustum_axes():
    cam = make_camera()
    assert not cam.is_in_frustum((0, 0, 0), 0.0)  # behind near plane
    assert cam.is_in_frustum((0, 0, 10), 0.0)
    assert cam.is_in_frustum((0, 0, 29), 0.0)
    assert not cam.is_in_frustum((0, 0, 31), 0.0)
    assert cam.is_in_frustum((0, 0, 0), 1.0)  # radius rescues it
    assert cam.is_in_frustum((0, 0, 31), 1.0)

    # vertical bounds at depth 3 (fov 72 -> half-height ~2.17)
    assert cam.is_in_frustum((0, 2, 3), 0.0)
    assert not cam.is_in_frustum((0, 3, 3), 0.0)
    assert cam.is_in_frustum((0, -2, 3), 0.0)
    assert not cam.is_in_frustum((0, -3, 3), 0.0)
    assert cam.is_in_frustum((0, 3, 3), 1.0)

    # horizontal (aspect 1 -> same)
    assert cam.is_in_frustum((2, 0, 3), 0.0)
    assert not cam.is_in_frustum((3, 0, 3), 0.0)


def test_frustum_prioritized_event_order():
    cam = make_camera()
    cam.forward = np.array([0, 0, 1], np.float32)

    behind = load(ChunkPos(0, 0, -5), 5)   # opposite the camera
    ahead = load(ChunkPos(0, 0, 3), 5)     # in the frustum
    side = load(ChunkPos(5, 0, 0), 5)      # out of frustum, perpendicular

    events = GameWorld.sort_chunks_by_view_frustum([behind, side, ahead], cam)
    assert events[0] == ahead          # visible first
    # the rest sorted by angle to forward: side before behind
    assert events[1] == side and events[2] == behind
