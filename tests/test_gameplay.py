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
    # sprint is LeftShift-while-walking (reference: gameplay.rs:86-87)
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(keys_down={"w", "shift"}), e, 1 / 60)
    assert abs(np.linalg.norm([e.velocity[0], e.velocity[2]]) - WALK_SPEED * 1.5) < 1e-4


def test_lateral_directions():
    # yaw 0 -> forward +x, right = fwd x unit_y = (0,0,-z)... assert via cross
    # product identity: A strafes -right, D strafes +right
    # (reference: gameplay.rs:102-109)
    gp, e = Gameplay(), player()
    e.euler_rotation[1] = 0.0
    fwd = e.get_forward()
    flat = np.array([fwd[0], 0.0, fwd[2]], np.float32)
    flat /= np.linalg.norm(flat)
    right = np.cross(flat, np.array([0.0, 1.0, 0.0], np.float32))

    gp.handle_movement(Input(keys_down={"d"}), e, 1 / 60)
    v = np.array([e.velocity[0], 0.0, e.velocity[2]])
    assert np.allclose(v / np.linalg.norm(v), right, atol=1e-5)

    gp.handle_movement(Input(keys_down={"a"}), e, 1 / 60)
    v = np.array([e.velocity[0], 0.0, e.velocity[2]])
    assert np.allclose(v / np.linalg.norm(v), -right, atol=1e-5)


def test_fly_speed_and_vertical():
    gp, e = Gameplay(), player(flying=True)
    gp.handle_movement(Input(keys_down={"w", "space"}), e, 1 / 60)
    assert abs(e.velocity[0] - FLY_SPEED) < 1e-4
    assert e.velocity[1] == FLY_SPEED


def test_jump_requires_grounded():
    # jump fires only when grounded on the PREVIOUS frame
    # (reference: gameplay.rs:133-145 `was_grounded` latch)
    gp, e = Gameplay(), player()
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == 0.0
    e.state.is_grounded = True
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == 0.0  # was_grounded not yet latched
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == JUMP_SPEED


def test_no_autojump_while_holding_space():
    # holding space must not re-jump every grounded frame: is_jumping stays
    # latched until space is released while grounded (reference: gameplay.rs:133-141)
    gp, e = Gameplay(), player()
    e.state.is_grounded = True
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)  # latch was_grounded
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)  # jump
    assert e.velocity[1] == JUMP_SPEED
    e.velocity[1] = 0.0
    # still grounded (landing frame), still holding space: no second jump
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == 0.0
    # release space while grounded resets the latch; next press jumps again
    gp.handle_movement(Input(), e, 1 / 60)
    gp.handle_movement(Input(keys_down={"space"}), e, 1 / 60)
    assert e.velocity[1] == JUMP_SPEED


def test_flying_resets_jump_latch():
    gp, e = Gameplay(), player(flying=True)
    gp.was_grounded = True
    gp.is_jumping = True
    gp.handle_movement(Input(), e, 1 / 60)
    assert not gp.was_grounded and not gp.is_jumping


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
