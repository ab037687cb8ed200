"""Vectorized ESVO serialization of dense chunks.

Replaces the reference's recursive octree walk (reference:
src/world/hds/esvo.rs:439-512 over trees built by
src/world/hds/octree.rs:127-172) with a bottom-up, fully vectorized numpy
pipeline over the dense ``(32,32,32)`` voxel array:

1. Morton-flatten the voxels so a node's children at the next level are the
   8 consecutive entries ``8*m + idx`` — the DFS/child-idx order of the
   reference's serialization *is* Morton order.
2. Occupancy, child masks, representative-LOD values, and subtree sizes
   reduce level-by-level with ``reshape(-1, 8)``.
3. Block start offsets propagate top-down with per-parent exclusive cumsums.
4. Headers / relative pointers / leaf values scatter into the output buffer.

Produces byte-identical buffers to ``serialize_block_octree`` on
construct-built (compacted) trees — asserted by tests/test_esvo_dense.py.
"""

from __future__ import annotations

import numpy as np

from .esvo import EMPTY_RESULT, RELATIVE_PTR_BIT, SerializationResult

CHUNK_DEPTH = 5

# LOD representative pick order (y-high first): reference internal.rs:461-485
_PICK_ORDER = (2, 3, 6, 7, 0, 1, 4, 5)

_morton_cache: dict[int, np.ndarray] = {}


def _morton_perm(depth: int) -> np.ndarray:
    """Flat index permutation p such that A.ravel()[p] is Morton-ordered,
    for A indexed [x, y, z] with shape (2^depth,)*3 and child idx = x+2y+4z."""
    if depth in _morton_cache:
        return _morton_cache[depth]
    n = 1 << depth
    x, y, z = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    m = np.zeros_like(x)
    for k in range(depth):
        bit = depth - 1 - k  # bit position inside the coordinate
        idx_k = ((x >> bit) & 1) | (((y >> bit) & 1) << 1) | (((z >> bit) & 1) << 2)
        m = m | (idx_k << (3 * (depth - 1 - k)))
    # p[morton] = flat_xyz index
    flat = (x * n + y) * n + z
    p = np.empty(n**3, dtype=np.int64)
    p[m.ravel()] = flat.ravel()
    _morton_cache[depth] = p
    return p


def serialize_dense_chunk(
    voxels: np.ndarray, lod: int = 0
) -> tuple[np.ndarray, SerializationResult]:
    """Serialize a dense ``(32,32,32)`` uint32 chunk (indexed [x,y,z]) into
    its ESVO u32 blob. ``lod`` in 1..5 clamps depth (0 = full detail)."""
    assert voxels.shape == (32, 32, 32)
    cut = lod if 1 <= lod <= CHUNK_DEPTH else CHUNK_DEPTH

    vox_m = voxels.reshape(-1)[_morton_perm(CHUNK_DEPTH)].astype(np.uint32)

    # bottom-up occupancy + representative values per level (Morton-flat)
    occ = [None] * (CHUNK_DEPTH + 1)
    rep = [None] * (CHUNK_DEPTH + 1)
    occ[CHUNK_DEPTH] = vox_m != 0
    rep[CHUNK_DEPTH] = vox_m
    for lvl in range(CHUNK_DEPTH - 1, -1, -1):
        o = occ[lvl + 1].reshape(-1, 8)
        r = rep[lvl + 1].reshape(-1, 8)
        occ[lvl] = o.any(axis=1)
        # first occupied child in _PICK_ORDER provides the representative
        chosen = np.zeros(o.shape[0], dtype=np.uint32)
        taken = np.zeros(o.shape[0], dtype=bool)
        for c in _PICK_ORDER:
            sel = o[:, c] & ~taken
            chosen = np.where(sel, r[:, c], chosen)
            taken |= o[:, c]
        rep[lvl] = chosen

    if not occ[0][0]:
        return np.zeros(0, dtype=np.uint32), EMPTY_RESULT

    # child masks of every node (bits = occupied children)
    cmask = [None] * CHUNK_DEPTH
    for lvl in range(CHUNK_DEPTH):
        o = occ[lvl + 1].reshape(-1, 8).astype(np.uint32)
        cmask[lvl] = (o << np.arange(8, dtype=np.uint32)).sum(axis=1, dtype=np.uint32)

    # subtree sizes in u32 words (0 where unoccupied); internal levels 0..cut-1
    size = [None] * cut
    size[cut - 1] = np.where(occ[cut - 1], 12, 0).astype(np.int64)
    for lvl in range(cut - 2, -1, -1):
        child_total = size[lvl + 1].reshape(-1, 8).sum(axis=1)
        size[lvl] = np.where(occ[lvl], 12 + child_total, 0)

    # block start offsets, top-down; root block at 0
    start = [None] * cut
    start[0] = np.zeros(1, dtype=np.int64)
    for lvl in range(1, cut):
        s = size[lvl].reshape(-1, 8)
        excl = np.cumsum(s, axis=1) - s
        start[lvl] = (start[lvl - 1][:, None] + 12 + excl).reshape(-1)

    total = int(size[0][0])
    buf = np.zeros(total, dtype=np.uint32)

    for lvl in range(cut):
        nodes = np.nonzero(occ[lvl])[0]
        starts = start[lvl][nodes]
        last_internal = lvl == cut - 1

        hdr = np.zeros((len(nodes), 4), dtype=np.uint32)
        for c in range(8):
            child = nodes * 8 + c
            child_occ = occ[lvl + 1][child]
            if last_internal:
                # children are leaves: zero header slot, value in body
                vals = rep[lvl + 1][child]
                buf[starts + 4 + c] = np.where(child_occ, vals, buf[starts + 4 + c])
            else:
                child_cm = cmask[lvl + 1][child]
                child_lm = child_cm if lvl + 1 == cut - 1 else np.uint32(0)
                slot = ((child_cm << np.uint32(8)) | child_lm).astype(np.uint32)
                if c % 2 != 0:
                    slot = slot << np.uint32(16)
                hdr[:, c // 2] |= np.where(child_occ, slot, 0).astype(np.uint32)

                rel = start[lvl + 1][child] - starts - 4 - c
                ptr = (rel.astype(np.uint32)) | np.uint32(RELATIVE_PTR_BIT)
                buf[starts + 4 + c] = np.where(child_occ, ptr, buf[starts + 4 + c])
        for w in range(4):
            buf[starts + w] = hdr[:, w]

    root_cm = int(cmask[0][0])
    root_lm = root_cm if cut == 1 else 0
    return buf, SerializationResult(root_cm, root_lm, cut)
