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


def test_moving_entity_never_reuses_memoized_raycast():
    """Stale-cache insurance for the picker memoization
    (graphics/svo.py raycast memo, r3): a falling entity under an
    UNCHANGED world buffer must re-raycast every step — the memo key
    includes the serialized task bytes, which move with the entity — while
    a truly stationary repeat is served from the memo."""
    import numpy as np

    from voxelrs_tpu.gamelogic.content import STONE, new_registry
    from voxelrs_tpu.graphics.svo import Svo
    from voxelrs_tpu.systems.physics import Entity, Physics
    from voxelrs_tpu.world import ChunkPos, Position
    from voxelrs_tpu.world.esvo import Esvo, SerializedChunk

    vox = np.zeros((32, 32, 32), np.uint32)
    vox[:, :8, :] = STONE
    world = Esvo()
    world.set_leaf(
        Position(0, 0, 0),
        SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=4)
    svo.update(world)

    calls = {"n": 0}
    orig = svo._raycast_fn

    def counting(n_pad):
        fn = orig(n_pad)

        def wrapped(*a):
            calls["n"] += 1
            return fn(*a)

        return wrapped

    svo._raycast_fn = counting

    from voxelrs_tpu.systems.physics import AABBDef

    e = Entity(position=np.array([16.0, 12.0, 16.0], np.float32),
               aabb_def=AABBDef(
                   np.array([-0.4, -1.7, -0.4], np.float32),
                   np.array([0.8, 1.8, 0.8], np.float32)))
    phys = Physics()

    # falling entity: every step has new task bytes -> fresh raycast
    ys, device_calls = [], []
    for _ in range(4):
        phys.step(1.0 / 60.0, svo, e)
        ys.append(float(e.position[1]))
        device_calls.append(calls["n"])
    assert ys == sorted(ys, reverse=True) and ys[0] != ys[-1], \
        "entity did not fall"
    assert device_calls == [1, 2, 3, 4], \
        f"moving entity reused a memoized raycast: {device_calls}"

    # grounded entity at rest: identical tasks + unchanged buffer -> memo
    for _ in range(30):  # land on the floor
        phys.step(1.0 / 60.0, svo, e)
    n0 = calls["n"]
    y0 = float(e.position[1])
    for _ in range(3):
        phys.step(1.0 / 60.0, svo, e)
    assert float(e.position[1]) == y0, "entity moved while grounded"
    assert calls["n"] == n0, "stationary steps did not hit the memo"
