"""Conservative terrain upper envelope for the beam pre-pass.

The renderer's beam pre-pass (ops/beams.py) needs, per (x,z) column of the
SVO coordinate space, a height H such that *no geometry anywhere in the
column pokes above H*. Tile beams then ray-march this 2D envelope (a
max-pyramid DDA) instead of the full SVO to find a conservative per-tile
entry distance — see docs/PERF.md. This file owns the host-side envelope:
per-chunk column tops computed in the serializer's background threads, a
world-sized (4·Gc)² column map assembled from them, the 3×3 dilated copy
the beams actually test (it absorbs ±1 cell of beam-cone deviation), and
the max-pyramid uploaded to the device.

This is a TPU-side acceleration structure with no reference counterpart
(the reference traces every ray from the root; reference:
src/graphics/svo.rs renders with no pre-pass). Conservativeness is the only
correctness requirement — a too-LOW envelope would pop geometry, a too-high
one only costs speed — and is covered by tests/test_beams.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# One envelope column covers an 8x8-voxel footprint: 4x4 columns per chunk.
CELL = 8
COLS_PER_CHUNK = 32 // CELL  # 4


def chunk_column_tops(voxels: np.ndarray, lod: int = 0) -> np.ndarray:
    """(4,4) int16 map of per-column geometry tops for one chunk.

    ``tops[cx, cz]`` is one past the highest voxel y that RENDERS in the
    8x8-voxel column footprint (0 = column empty). LOD-aware: a chunk
    serialized at ``lod`` L renders whole 2^(5-L) blocks when any voxel in
    the block is set (world/esvo_dense.py pick-leaf semantics), so tops are
    rounded UP to block granularity — the envelope must cover the rendered
    geometry, not the source voxels.
    """
    assert voxels.shape == (32, 32, 32)
    b = 1 << (5 - lod) if 1 <= lod <= 5 else 1
    occ = voxels.reshape(32 // b, b, 32 // b, b, 32 // b, b) != 0
    occ = occ.any(axis=(1, 3, 5))  # (nb, nb, nb) block occupancy, [x, y, z]
    nb = occ.shape[0]
    # top of the highest occupied block, in voxels (0 if none)
    ys = (np.arange(nb, dtype=np.int16) + 1) * b
    top_b = (occ * ys[None, :, None]).max(axis=1).astype(np.int16)  # (nb, nb)
    if b <= CELL:
        f = CELL // b  # blocks per column footprint
        return top_b.reshape(COLS_PER_CHUNK, f, COLS_PER_CHUNK, f).max(axis=(1, 3))
    # block wider than a column: every covered column inherits the block top
    r = b // CELL
    return np.repeat(np.repeat(top_b, r, axis=0), r, axis=1)


class HeightField:
    """World-space column-top envelope over the SVO coordinate space.

    Incrementally maintained from per-chunk ``chunk_column_tops`` maps keyed
    by the chunk's SVO-space position; ``device()`` returns the dilated
    max-pyramid ready for ops/beams.py (rebuilt lazily after changes — the
    whole pyramid is ~100 KB, a full rebuild is cheaper than delta
    plumbing).
    """

    def __init__(self) -> None:
        self._tops: dict[tuple[int, int, int], np.ndarray] = {}
        # (cx, cz) -> chunk positions stacked in that column
        self._cols: dict[tuple[int, int], set] = {}
        self._n = 0  # columns per axis (4 * chunks per axis)
        self._H: Optional[np.ndarray] = None  # (n, n) int16, exact envelope
        self._dirty = True
        self._device: Optional[tuple] = None

    # -- host maintenance --------------------------------------------------

    def _ensure_size(self, n: int) -> None:
        if n <= self._n:
            return
        old, old_n = self._H, self._n
        self._n = n
        self._H = np.zeros((n, n), np.int16)
        if old is not None:
            self._H[:old_n, :old_n] = old
        self._dirty = True

    def set_chunk(self, pos: tuple[int, int, int], tops: np.ndarray) -> None:
        """Insert/replace the (4,4) top map of the chunk at SVO chunk
        position ``pos`` and refresh its 4x4 envelope columns."""
        self._tops[pos] = tops
        self._cols.setdefault((pos[0], pos[2]), set()).add(pos)
        self._ensure_size(self._required_n(pos))
        self._refresh_cols(pos[0], pos[2])

    def remove_chunk(self, pos: tuple[int, int, int], expect=None) -> None:
        """Remove the chunk at ``pos``. When ``expect`` is given, only
        remove if the stored top map IS that object — a chunk whose SVO
        slot was overridden by a shift must not clear its successor."""
        cur = self._tops.get(pos)
        if cur is None or (expect is not None and cur is not expect):
            return
        del self._tops[pos]
        col = self._cols.get((pos[0], pos[2]))
        if col is not None:
            col.discard(pos)
        self._refresh_cols(pos[0], pos[2])

    def clear(self) -> None:
        self._tops.clear()
        self._cols.clear()
        if self._H is not None:
            self._H[:] = 0
        self._dirty = True

    def rebuild(self, chunks: dict[tuple[int, int, int], np.ndarray]) -> None:
        """Replace the whole envelope (chunk shift / coord-space change)."""
        self._tops = dict(chunks)
        self._cols = {}
        for pos in self._tops:
            self._cols.setdefault((pos[0], pos[2]), set()).add(pos)
        self._n = 0
        self._H = None
        for pos in self._tops:
            self._ensure_size(self._required_n(pos))
        if self._H is None:
            self._H = np.zeros((0, 0), np.int16)
        cols = {(p[0], p[2]) for p in self._tops}
        for cx, cz in cols:
            self._refresh_cols(cx, cz)
        self._dirty = True

    @staticmethod
    def _required_n(pos: tuple[int, int, int]) -> int:
        span = max(pos) + 1  # chunks needed per axis
        p = 1
        while p < span:
            p <<= 1
        return p * COLS_PER_CHUNK

    def _refresh_cols(self, cx: int, cz: int) -> None:
        """Recompute the 4x4 envelope columns under chunk column (cx, cz)
        as the max over that column's loaded chunk stack."""
        acc = np.zeros((COLS_PER_CHUNK, COLS_PER_CHUNK), np.int32)
        for pos in self._cols.get((cx, cz), ()):
            t = self._tops[pos].astype(np.int32)
            acc = np.maximum(acc, np.where(t > 0, t + pos[1] * 32, 0))
        x0, z0 = cx * COLS_PER_CHUNK, cz * COLS_PER_CHUNK
        self._H[x0 : x0 + COLS_PER_CHUNK, z0 : z0 + COLS_PER_CHUNK] = acc.astype(
            np.int16
        )
        self._dirty = True

    # -- device pyramid ----------------------------------------------------

    def exact(self) -> Optional[np.ndarray]:
        return self._H

    def near_window(self, ccx: int, ccz: int, r: int = 2) -> np.ndarray:
        """(2r+1, 2r+1) EXACT envelope window around column (ccx, ccz),
        clamped at the borders (outside = 0), for the near-field tests."""
        n = self._n
        out = np.zeros((2 * r + 1, 2 * r + 1), np.int32)
        if self._H is None or n == 0:
            return out
        for i in range(2 * r + 1):
            for j in range(2 * r + 1):
                x, z = ccx - r + i, ccz - r + j
                if 0 <= x < n and 0 <= z < n:
                    out[i, j] = int(self._H[x, z])
        return out

    def device(self):
        """(levels_concat (R,) i32 jnp, offsets tuple, n, h_max, bounds) —
        the 3x3 dilated envelope and its max-pyramid, row-major x*n+z per
        level; ``bounds`` = (x0, x1, z0, z1) occupied-column extent in
        VOXELS (half-open) for the beam kernel's per-tile hard stop. None
        when the field is empty."""
        if self._H is None or self._n == 0:
            return None
        if not self._dirty and self._device is not None:
            return self._device
        import jax.numpy as jnp

        h = self._H.astype(np.int32)
        nz = np.nonzero(h)
        if len(nz[0]):
            bounds = np.array(
                [nz[0].min() * CELL, (nz[0].max() + 1) * CELL,
                 nz[1].min() * CELL, (nz[1].max() + 1) * CELL], np.float32)
        else:
            bounds = np.zeros(4, np.float32)
        # 3x3 max dilation (edge-clamped): absorbs one column of beam-cone
        # deviation — see ops/beams.py validity clamp
        p = np.pad(h, 1, mode="edge")
        d = h
        for dx in (0, 1, 2):
            for dz in (0, 1, 2):
                d = np.maximum(d, p[dx : dx + self._n, dz : dz + self._n])
        levels = [d]
        while levels[-1].shape[0] > 1:
            m = levels[-1]
            k = m.shape[0] // 2
            m = m.reshape(k, 2, k, 2).max(axis=(1, 3))
            levels.append(m)
        offsets, flat, off = [], [], 0
        for m in levels:
            offsets.append(off)
            flat.append(m.reshape(-1))
            off += m.size
        self._device = (
            jnp.asarray(np.concatenate(flat)),
            tuple(offsets),
            self._n,
            int(h.max()) if h.size else 0,
            bounds,
        )
        # UNdilated flat copy for the shadow beams' exact near gate
        self._device_exact = jnp.asarray(h.reshape(-1))
        self._dirty = False
        return self._device

    def device_exact(self):
        """Flat (n*n,) i32 EXACT (undilated) envelope on device; call
        after ``device()``."""
        self.device()
        return self._device_exact
