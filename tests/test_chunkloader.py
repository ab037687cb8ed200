"""Chunk loader event/LOD tests (model: reference chunkloader.rs:145-266)."""

from voxelrs_tpu.systems.chunkloader import ChunkEvent, ChunkLoader, load, unload
from voxelrs_tpu.world.chunk import ChunkPos


def test_load_and_unload():
    cl = ChunkLoader(1, 0, 1)

    events = sorted(cl.update(0.0, 0.0, 0.0))
    assert events == sorted([
        load(ChunkPos(-1, 0, 0), 5),
        load(ChunkPos(0, 0, -1), 5),
        load(ChunkPos(0, 0, 0), 5),
        load(ChunkPos(0, 0, 1), 5),
        load(ChunkPos(1, 0, 0), 5),
    ])

    # staying inside the same chunk is a no-op
    assert cl.update(16.0, 16.0, 16.0) == []

    # neighbor chunk: partial unload + load
    events = sorted(cl.update(32.0, 0.0, 0.0))
    assert events == sorted([
        load(ChunkPos(1, 0, -1), 5),
        load(ChunkPos(1, 0, 1), 5),
        load(ChunkPos(2, 0, 0), 5),
        unload(ChunkPos(-1, 0, 0)),
        unload(ChunkPos(0, 0, -1)),
        unload(ChunkPos(0, 0, 1)),
    ])

    # far jump: full unload/load
    events = sorted(cl.update(128.0, 0.0, 0.0))
    assert events == sorted([
        load(ChunkPos(3, 0, 0), 5),
        load(ChunkPos(4, 0, -1), 5),
        load(ChunkPos(4, 0, 0), 5),
        load(ChunkPos(4, 0, 1), 5),
        load(ChunkPos(5, 0, 0), 5),
        unload(ChunkPos(0, 0, 0)),
        unload(ChunkPos(1, 0, -1)),
        unload(ChunkPos(1, 0, 0)),
        unload(ChunkPos(1, 0, 1)),
        unload(ChunkPos(2, 0, 0)),
    ])

    # y above radius: everything unloads
    events = sorted(cl.update(128.0, 64.0, 0.0))
    assert all(e.kind == "unload" for e in events) and len(events) == 5

    # staying at unloaded y elsewhere: nothing
    assert cl.update(0.0, 64.0, 0.0) == []


def lod_scale_on_x(events, z):
    cols = {}
    for e in events:
        if e.kind in ("load", "lod") and e.pos.z == z:
            cols[e.pos.x] = e.lod
    return [cols[x] for x in sorted(cols)]


def test_lod_bands():
    cl = ChunkLoader(25, 0, 1)
    events = cl.update(0.0, 0.0, 0.0)
    z0 = [2, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5,
          5, 5, 5, 5, 5, 5, 5, 5, 5, 4, 4, 4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 2,
          2, 2, 2, 2, 2]
    z1 = [2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5,
          5, 5, 5, 5, 5, 5, 5, 5, 4, 4, 4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 2, 2,
          2, 2, 2]
    assert lod_scale_on_x(events, -1) == z1
    assert lod_scale_on_x(events, 0) == z0
    assert lod_scale_on_x(events, 1) == z1

    # moving one chunk +x: one chunk per lod level changes
    events = cl.update(32.0, 0.0, 0.0)
    change = [2, 3, 4, 5, 4, 3, 2]
    assert lod_scale_on_x(events, -1) == change
    assert lod_scale_on_x(events, 0) == change
    assert lod_scale_on_x(events, 1) == change


def test_events_sorted_by_distance():
    cl = ChunkLoader(3, 0, 1)
    events = cl.update(0.0, 0.0, 0.0)
    center = ChunkPos(0, 0, 0)
    dists = [e.pos.dst_sq(center) for e in events]
    assert dists == sorted(dists)


def test_set_radius_forces_recheck():
    cl = ChunkLoader(1, 0, 1)
    cl.update(0.0, 0.0, 0.0)
    cl.set_radius(2)
    events = cl.update(0.0, 0.0, 0.0)
    assert any(e.kind == "load" for e in events)
