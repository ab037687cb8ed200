"""Physics scenarios against a mock raycaster
(model: reference physics.rs:216-493)."""

import numpy as np

from voxelrs_tpu.graphics.picker import AabbResult, PickerBatch, PickerBatchResult
from voxelrs_tpu.systems.physics import AABBDef, Entity, EntityCapabilities, Physics


class MockRaycaster:
    """Injects canned AabbResults and records the batch it was given."""

    def __init__(self, results):
        self.results = results
        self.batches = []

    def raycast(self, batch: PickerBatch, result: PickerBatchResult):
        self.batches.append(
            [(a.pos.copy(), a.offset.copy(), a.extents.copy()) for a in batch.aabbs]
        )
        result.aabbs.extend(self.results)


def player(pos=(0, 0, 0), **caps):
    return Entity(
        position=np.array(pos, np.float32),
        aabb_def=AABBDef(
            np.array([-0.4, -1.7, -0.4], np.float32),
            np.array([0.8, 1.8, 0.8], np.float32),
        ),
        caps=EntityCapabilities(**caps),
    )


def res(neg=(-1, -1, -1), pos=(-1, -1, -1)):
    return AabbResult(np.array(neg, np.float32), np.array(pos, np.float32))


DT = 1 / 250


def test_free_fall_accelerates():
    e = player()
    Physics().step(DT, MockRaycaster([res()]), e)
    assert e.velocity[1] == np.float32(-60.0 * DT)
    assert e.position[1] < 0.0
    assert not e.state.is_grounded


def test_max_fall_velocity_cap():
    e = player()
    e.velocity[1] = -99.9
    Physics().step(DT, MockRaycaster([res()]), e)
    assert e.velocity[1] == -100.0


def test_landing_stops_fall_and_grounds():
    e = player()
    e.velocity[1] = -10.0
    # ground 0.01 below: collision in -y
    Physics().step(DT, MockRaycaster([res(neg=(-1, 0.01, -1))]), e)
    assert e.state.is_grounded
    assert e.velocity[1] == 0.0
    # y did not go below the allowed distance
    assert e.position[1] >= -0.01


def test_grounded_requires_distance():
    e = player()
    e.velocity[1] = 0.0
    # ground 1.0 below: not grounded
    Physics().step(DT, MockRaycaster([res(neg=(-1, 1.0, -1))]), e)
    assert not e.state.is_grounded


def test_horizontal_wall_clamp():
    e = player()
    e.velocity[0] = 100.0
    r = res(pos=(0.05, -1, -1), neg=(-1, 0.001, -1))
    Physics().step(DT, MockRaycaster([r]), e)
    # moved at most to the wall (0.05 - eps)
    assert 0 < e.position[0] <= 0.05


def test_wall_contact_stops_movement():
    e = player()
    e.velocity[2] = -5.0
    r = res(neg=(-1, 0.001, 0.0005))
    Physics().step(DT, MockRaycaster([r]), e)
    assert e.position[2] == 0.0


def test_wall_clip_ignores_xz():
    e = player(wall_clip=True)
    e.velocity[0] = 100.0
    r = res(pos=(0.0001, -1, -1), neg=(-1, 0.001, -1))
    Physics().step(DT, MockRaycaster([r]), e)
    assert e.position[0] == np.float32(100.0 * DT)


def test_flying_disables_gravity_and_collisions():
    e = player(flying=True)
    e.velocity[:] = (10.0, 10.0, 10.0)
    r = res(pos=(0.0001, 0.0001, 0.0001), neg=(0.0001, 0.0001, 0.0001))
    Physics().step(DT, MockRaycaster([r]), e)
    np.testing.assert_allclose(e.position, 10.0 * DT, rtol=1e-5)
    assert e.velocity[1] == 10.0  # no gravity applied


def test_jump_then_collide_above():
    e = player()
    e.velocity[1] = 13.0
    r = res(pos=(-1, 0.02, -1), neg=(-1, 0.5, -1))
    Physics().step(DT, MockRaycaster([r]), e)
    # movement clamped to ceiling distance
    assert e.position[1] <= 0.02


def test_batch_contains_player_aabb():
    e = player(pos=(5, 10, 5))
    rc = MockRaycaster([res()])
    Physics().step(DT, rc, e)
    (pos, offset, extents), = rc.batches[0]
    np.testing.assert_allclose(pos, [5, 10, 5])
    np.testing.assert_allclose(offset, [-0.4, -1.7, -0.4])
    np.testing.assert_allclose(extents, [0.8, 1.8, 0.8])


def test_step_many():
    e1, e2 = player(), player(flying=True)
    e2.velocity[:] = (1, 0, 0)
    Physics().step_many(DT, MockRaycaster([res(), res()]), [e1, e2])
    assert e1.position[1] < 0 and e2.position[0] > 0
