"""Coordinate-space + chunk-shifting tests
(model: reference worldsvo.rs:227-385,505-557)."""

import numpy as np

from voxelrs_tpu.systems.worldsvo import Svo, SvoCoordSpace
from voxelrs_tpu.world.chunk import ChunkPos
from voxelrs_tpu.world.octree import Position


def test_cnv_block_pos_roundtrip():
    cs = SvoCoordSpace(ChunkPos(4, 1, -2), 10)
    world = np.array([4 * 32 + 5.5, 1 * 32 + 7.25, -2 * 32 + 31.0])
    svo = cs.cnv_block_pos(world)
    np.testing.assert_allclose(svo, [10 * 32 + 5.5, 10 * 32 + 7.25, 10 * 32 + 31.0])
    back = cs.cnv_svo_pos(svo)
    np.testing.assert_allclose(back, world)


def test_cnv_block_pos_negative_coords():
    cs = SvoCoordSpace(ChunkPos(0, 0, 0), 2)
    svo = cs.cnv_block_pos(np.array([-1.5, 0.0, 33.0]))
    # block -1.5 is in chunk -1 at rel 30.5 -> svo chunk rd-1 = 1;
    # block 33 is chunk 1 rel 1 -> svo chunk rd+1 = 3
    np.testing.assert_allclose(svo, [32 + 30.5, 64.0, 3 * 32 + 1.0])


def test_cnv_chunk_pos_bounds():
    cs = SvoCoordSpace(ChunkPos(0, 0, 0), 2)
    assert cs.cnv_chunk_pos(ChunkPos(0, 0, 0)) == Position(2, 2, 2)
    assert cs.cnv_chunk_pos(ChunkPos(1, 0, 0)) == Position(3, 2, 2)
    assert cs.cnv_chunk_pos(ChunkPos(-2, 0, 0)) == Position(0, 2, 2)
    # radial x/z check: corner out of circle
    assert cs.cnv_chunk_pos(ChunkPos(2, 0, 2)) is None
    # y uses the full radius in both directions
    assert cs.cnv_chunk_pos(ChunkPos(0, 2, 0)) == Position(2, 4, 2)
    assert cs.cnv_chunk_pos(ChunkPos(0, 3, 0)) is None


class FakeWorldSvo:
    """u32-leaf world SVO capturing set/move/remove calls
    (the reference tests shifting on a fake Serializable the same way)."""

    def __init__(self):
        from voxelrs_tpu.world.octree import Octree

        self.octree = Octree()

    def set_leaf(self, pos, value, serialize):
        return self.octree.set_leaf(pos, value)

    def move_leaf(self, leaf_id, pos):
        return self.octree.move_leaf(leaf_id, pos)

    def remove_leaf(self, leaf_id):
        return self.octree.remove_leaf_by_id(leaf_id)

    def get(self, pos):
        return self.octree.get_leaf(pos)


def test_shift_chunks_moves_all_leaves():
    cs = SvoCoordSpace(ChunkPos(0, 0, 0), 2)
    svo = FakeWorldSvo()
    leaf_ids = {}
    for cx in (-1, 0, 1):
        pos = ChunkPos(cx, 0, 0)
        leaf_id, _ = svo.set_leaf(cs.cnv_chunk_pos(pos), f"chunk{cx}", True)
        leaf_ids[pos] = leaf_id

    # camera moves +1 chunk in x: every chunk shifts one slot -x
    cs.center = ChunkPos(1, 0, 0)
    Svo.shift_chunks(cs, leaf_ids, svo)

    # chunk -1 sits exactly on the radius (|delta|=2=r) and stays loaded
    assert svo.get(Position(0, 2, 2)) == "chunk-1"
    assert svo.get(Position(1, 2, 2)) == "chunk0"
    assert svo.get(Position(2, 2, 2)) == "chunk1"
    assert len(leaf_ids) == 3

    # moving one more chunk pushes chunk -1 out of the radius
    cs.center = ChunkPos(2, 0, 0)
    Svo.shift_chunks(cs, leaf_ids, svo)
    assert ChunkPos(-1, 0, 0) not in leaf_ids
    assert svo.get(Position(0, 2, 2)) == "chunk0"
    assert svo.get(Position(1, 2, 2)) == "chunk1"


def test_shift_chunks_override_reinserts_without_serialize():
    cs = SvoCoordSpace(ChunkPos(0, 0, 0), 2)
    svo = FakeWorldSvo()
    leaf_ids = {}
    for cx in (0, 1, 2):
        pos = ChunkPos(cx, 0, 0)
        leaf_id, _ = svo.set_leaf(cs.cnv_chunk_pos(pos), f"c{cx}", True)
        leaf_ids[pos] = leaf_id

    cs.center = ChunkPos(1, 0, 0)
    Svo.shift_chunks(cs, leaf_ids, svo)

    # all three survive the shift; contents intact at shifted slots
    assert svo.get(Position(1, 2, 2)) == "c0"
    assert svo.get(Position(2, 2, 2)) == "c1"
    assert svo.get(Position(3, 2, 2)) == "c2"
    assert len(leaf_ids) == 3


def test_shift_chunks_back_and_forth_is_stable():
    cs = SvoCoordSpace(ChunkPos(0, 0, 0), 3)
    svo = FakeWorldSvo()
    leaf_ids = {}
    for cx in range(-2, 3):
        for cz in range(-2, 3):
            pos = ChunkPos(cx, 0, cz)
            sp = cs.cnv_chunk_pos(pos)
            if sp is None:
                continue
            leaf_id, _ = svo.set_leaf(sp, (cx, cz), True)
            leaf_ids[pos] = leaf_id
    n0 = len(leaf_ids)

    cs.center = ChunkPos(1, 0, 0)
    Svo.shift_chunks(cs, leaf_ids, svo)
    cs.center = ChunkPos(0, 0, 0)
    Svo.shift_chunks(cs, leaf_ids, svo)

    # chunks that remained in bounds across both shifts are back in place
    for pos, leaf_id in leaf_ids.items():
        sp = cs.cnv_chunk_pos(pos)
        assert sp is not None
        assert svo.get(sp) == (pos.x, pos.z)
    assert len(leaf_ids) <= n0


def test_serialize_chunk_trace_recorded():
    """Per-chunk serialization is traced into the benchmark collector
    (reference: worldsvo.rs:93-98 trace_if has_data)."""
    import time

    from voxelrs_tpu.gamelogic import benchmark, content
    from voxelrs_tpu.systems.jobs import JobSystem
    from voxelrs_tpu.world.chunk import Chunk
    from voxelrs_tpu.world.world import BorrowedChunk

    benchmark.reset_all()
    js = JobSystem(1)
    try:
        import voxelrs_tpu.graphics as graphics

        gfx = graphics.Svo(content.new_registry(None), 4.0, np.uint32)
        svo = Svo(js, gfx, 2)
        chunk = Chunk(ChunkPos(0, 0, 0), 5)
        chunk.set_block(1, 1, 1, content.STONE)
        svo.set_chunk(BorrowedChunk(chunk))
        deadline = time.time() + 10
        while svo.has_pending_jobs() and time.time() < deadline:
            svo.update(ChunkPos(0, 0, 0))
            time.sleep(0.01)
        svo.update(ChunkPos(0, 0, 0))
        traces = benchmark.collect()["traces"]
        assert "serialize_chunk" in traces
        assert traces["serialize_chunk"]["n"] == 1
    finally:
        js.stop()
        benchmark.reset_all()


def test_heightfield_follows_streaming():
    """The systems layer keeps the beam-pre-pass envelope in sync through
    chunk set / shift / remove (world/heightfield.py)."""
    import time

    from voxelrs_tpu.gamelogic import content
    from voxelrs_tpu.systems.jobs import JobSystem
    from voxelrs_tpu.world.chunk import Chunk
    from voxelrs_tpu.world.heightfield import chunk_column_tops
    from voxelrs_tpu.world.world import BorrowedChunk

    js = JobSystem(1)
    try:
        import voxelrs_tpu.graphics as graphics

        gfx = graphics.Svo(content.new_registry(None), 4.0, np.uint32)
        svo = Svo(js, gfx, 2)
        assert gfx.heightfield is svo.heightfield

        rng = np.random.default_rng(13)
        chunks = {}
        for pos in [ChunkPos(0, 0, 0), ChunkPos(0, 1, 0), ChunkPos(1, 0, 0),
                    ChunkPos(-1, 0, 1)]:
            c = Chunk(pos, 5)
            for _ in range(40):
                x, y, z = rng.integers(0, 32, 3)
                c.set_block(int(x), int(y), int(z), content.STONE)
            chunks[pos] = np.asarray(c.voxels).copy()
            svo.set_chunk(BorrowedChunk(c))

        def drain(center):
            deadline = time.time() + 10
            while svo.has_pending_jobs() and time.time() < deadline:
                svo.update(center)
                time.sleep(0.01)
            svo.update(center)

        def check(center):
            expect = {}
            for pos, vox in chunks.items():
                if pos not in svo.leaf_ids:
                    continue
                sp = svo.coord_space.cnv_chunk_pos(pos)
                if sp is None:
                    continue
                tops = chunk_column_tops(vox, 5).astype(np.int32)
                tops = np.where(tops > 0, tops + sp.y * 32, 0)
                key = (sp.x, sp.z)
                expect[key] = np.maximum(expect.get(key, 0), tops)
            H = svo.heightfield.exact()
            for (cx, cz), tops in expect.items():
                got = H[cx * 4 : cx * 4 + 4, cz * 4 : cz * 4 + 4]
                assert (got == tops).all(), (cx, cz)
            # everything else is empty
            mask = np.zeros_like(H, bool)
            for (cx, cz) in expect:
                mask[cx * 4 : cx * 4 + 4, cz * 4 : cz * 4 + 4] = True
            assert (H[~mask] == 0).all()

        drain(ChunkPos(0, 0, 0))
        check(ChunkPos(0, 0, 0))

        # shift the coordinate space (center moves one chunk in +x)
        svo.update(ChunkPos(1, 0, 0))
        check(ChunkPos(1, 0, 0))

        # remove one chunk
        svo.remove_chunk(ChunkPos(0, 1, 0))
        del chunks[ChunkPos(0, 1, 0)]
        svo.update(ChunkPos(1, 0, 0))
        check(ChunkPos(1, 0, 0))
    finally:
        js.stop()
