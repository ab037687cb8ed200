"""Gameplay unit tests (model: reference gameplay.rs constants + logic)."""

import numpy as np

from voxelrs_tpu.gamelogic import content
from voxelrs_tpu.gamelogic.gameplay import (
    FLY_SPEED,
    HOTBAR,
    JUMP_SPEED,
    WALK_SPEED,
    Gameplay,
    Input,
)
from voxelrs_tpu.graphics.picker import RayResult
from voxelrs_tpu.systems.physics import AABBDef, Entity


def player(flying=False):
    e = Entity(
        position=np.zeros(3, np.float32),
        aabb_def=AABBDef(
            np.array([-0.4, -1.7, -0.4], np.float32),
            np.array([0.8, 1.8, 0.8], np.float32),
        ),
    )
    e.caps.flying = flying
    return e


def test_walk_speed_and_direction():
    gp, e = Gameplay(), player()
    inp = Input(keys_down={"w"})
    e.euler_rotation[1] = 0.0  # yaw 0 -> forward +x
    gp.handle_movement(inp, e, 1 / 60)
    assert abs(e.velocity[0] - WALK_SPEED) < 1e-5
    assert abs(e.velocity[2]) < 1e-5


def test_sprint_multiplier():
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(keys_down={"w", "ctrl"}), e, 1 / 60)
    assert abs(np.linalg.norm([e.velocity[0], e.velocity[2]]) - WALK_SPEED * 1.5) < 1e-4


def test_fly_speed_and_vertical():
    gp, e = Gameplay(), player(flying=True)
    gp.handle_movement(Input(keys_down={"w", "space"}), e, 1 / 60)
    assert abs(e.velocity[0] - FLY_SPEED) < 1e-4
    assert e.velocity[1] == FLY_SPEED


def test_jump_requires_grounded():
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == 0.0
    e.state.is_grounded = True
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == JUMP_SPEED


def test_mouse_look_sensitivity():
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(mouse_delta=(100.0, -50.0)), e, 1 / 60)
    assert abs(e.euler_rotation[1] - 100 * 0.002) < 1e-6
    assert abs(e.euler_rotation[0] - 50 * 0.002) < 1e-6


def test_pitch_clamped():
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(mouse_delta=(0.0, -1e6)), e, 1 / 60)
    assert e.euler_rotation[0] < np.pi / 2


def test_fly_toggle_edge():
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(keys_pressed={"f"}), e, 1 / 60)
    assert e.caps.flying
    gp.handle_movement(Input(keys_pressed={"f"}), e, 1 / 60)
    assert not e.caps.flying


def test_hotbar_selection():
    gp = Gameplay()
    gp.handle_hotbar(Input(keys_pressed={"3"}))
    assert gp.selected_block == HOTBAR[2] == content.STONE


def test_placement_overlap_rejection():
    gp, e = Gameplay(), player()
    e.position = np.array([0.5, 1.7, 0.5], np.float32)

    class FakeWorld:
        def __init__(self):
            self.placed = []

        def set_block(self, x, y, z, b):
            self.placed.append((x, y, z, b))
            return True

    w = FakeWorld()
    # looking at a block whose +y neighbor overlaps the player AABB
    gp.looking_at = RayResult(
        dst=2.0, inside_voxel=False,
        pos=np.array([0.5, 0.0, 0.5], np.float32),
        normal=np.array([0.0, 1.0, 0.0], np.float32),
    )
    gp.handle_voxel_placement(Input(buttons_pressed={2}), w, e)
    assert w.placed == []  # rejected: overlaps the player

    # placement far away is allowed
    gp.looking_at = RayResult(
        dst=5.0, inside_voxel=False,
        pos=np.array([10.5, 0.0, 10.5], np.float32),
        normal=np.array([0.0, 1.0, 0.0], np.float32),
    )
    gp.handle_voxel_placement(Input(buttons_pressed={2}), w, e)
    assert len(w.placed) == 1
    assert w.placed[0][:3] == (10, 1, 10)


def test_block_pick():
    gp, e = Gameplay(), player()

    class W:
        class world:
            @staticmethod
            def get_block(x, y, z):
                return content.COBBLESTONE

        @staticmethod
        def set_block(*a):
            return True

    gp.looking_at = RayResult(
        dst=2.0, inside_voxel=False,
        pos=np.array([3.5, 1.0, 3.5], np.float32),
        normal=np.array([0.0, 1.0, 0.0], np.float32),
    )
    gp.handle_voxel_placement(Input(buttons_pressed={3}), W(), e)
    assert gp.selected_block == content.COBBLESTONE
