"""Picker batch expansion/fold tests (model: reference svo_picker.rs:302-536)."""

import numpy as np

from voxelrs_tpu.graphics.picker import (
    Aabb,
    PickerBatch,
    PickerBatchResult,
)


def test_unit_aabb_task_count():
    # extents (0.8, 1.8, 0.8) -> blocks per axis (1, 2, 1): the player box
    aabb = Aabb.new([0, 0, 0], [0, 0, 0], [0.8, 1.8, 0.8])
    tasks = aabb.generate_picker_tasks()
    # corners of a 2x3x2 lattice: at each point, rays for axes at extremes
    # total from reference logic: every lattice point contributes 1..3 rays
    count = 0
    for x in range(2):
        for y in range(3):
            for z in range(2):
                for i, (v, n) in enumerate(((x, 1), (y, 2), (z, 1))):
                    if v == 0 or v == n:
                        count += 1
    assert len(tasks) == count
    for max_dst, pos, d in tasks:
        assert max_dst == 10.0
        assert np.abs(d).sum() == 1.0  # axis-aligned unit directions


def test_aabb_fold_min_per_axis():
    aabb = Aabb.new([0, 0, 0], [0, 0, 0], [1.0, 1.0, 1.0])
    tasks = aabb.generate_picker_tasks()
    # craft distances: -1 everywhere except two -y rays with 3.0 and 1.5
    dsts = np.full(len(tasks), -1.0, np.float32)
    neg_y = [i for i, (_, p, d) in enumerate(tasks) if d[1] == -1.0]
    dsts[neg_y[0]] = 3.0
    dsts[neg_y[1]] = 1.5
    res, consumed = aabb.parse_picker_results(dsts)
    assert consumed == len(tasks)
    assert res.neg[1] == 1.5  # min of the two
    assert res.neg[0] == -1.0 and res.neg[2] == -1.0
    assert (res.pos == -1.0).all()


def test_batch_serialize_order():
    batch = PickerBatch()
    batch.add_ray([1, 2, 3], [0, 1, 0], 30.0)
    batch.add_aabb(Aabb.new([5, 5, 5], [0, 0, 0], [1, 1, 1]))
    tasks = batch.serialize_tasks()
    # ray tasks first, then AABB expansion
    np.testing.assert_allclose(tasks[0], [30.0, 1, 2, 3, 0, 1, 0])
    assert len(tasks) == 1 + len(Aabb.new([5, 5, 5], [0, 0, 0], [1, 1, 1]).generate_picker_tasks())


def test_batch_roundtrip_results():
    batch = PickerBatch()
    batch.add_ray([0, 10, 0], [0, -1, 0], 30.0)
    aabb = Aabb.new([0, 0, 0], [0, 0, 0], [1, 1, 1])
    batch.add_aabb(aabb)
    n = len(batch.serialize_tasks())

    dst = np.full(n, -1.0, np.float32)
    inside = np.zeros(n, bool)
    pos = np.zeros((n, 3), np.float32)
    normal = np.zeros((n, 3), np.float32)
    dst[0] = 4.5
    inside[0] = True
    pos[0] = (0, 5.5, 0)
    normal[0] = (0, 1, 0)

    out = PickerBatchResult()
    batch.deserialize_results(dst, inside, pos, normal, out)
    assert len(out.rays) == 1 and len(out.aabbs) == 1
    assert out.rays[0].dst == 4.5 and out.rays[0].inside_voxel
    np.testing.assert_allclose(out.rays[0].pos, [0, 5.5, 0])
    assert (out.aabbs[0].neg == -1).all() and (out.aabbs[0].pos == -1).all()
