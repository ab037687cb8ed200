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


def chunk_voxel_tops(voxels: np.ndarray, lod: int = 0) -> np.ndarray:
    """(32,32) int16 per-VOXEL-column geometry tops for one chunk (0 =
    empty), LOD-rounded like ``chunk_column_tops``. Feeds the sun
    visibility map (shadow-ray elision needs voxel resolution — the 8-voxel
    envelope columns quantize slopes away)."""
    assert voxels.shape == (32, 32, 32)
    b = 1 << (5 - lod) if 1 <= lod <= 5 else 1
    occ = voxels.reshape(32 // b, b, 32 // b, b, 32 // b, b) != 0
    occ = occ.any(axis=(1, 3, 5))
    nb = occ.shape[0]
    ys = (np.arange(nb, dtype=np.int16) + 1) * b
    top_b = (occ * ys[None, :, None]).max(axis=1).astype(np.int16)
    if b == 1:
        return top_b
    return np.repeat(np.repeat(top_b, b, axis=0), b, axis=1)


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

    # voxel-resolution mirror is kept only up to this size (rd <= ~20);
    # larger worlds fall back to envelope-only (no sun map)
    MAX_N1 = 2048
    SUN_COOLDOWN = 0.75  # s: don't rebuild the sun map while streaming

    def __init__(self) -> None:
        self._tops: dict[tuple[int, int, int], np.ndarray] = {}
        self._vtops: dict[tuple[int, int, int], np.ndarray] = {}
        # (cx, cz) -> chunk positions stacked in that column
        self._cols: dict[tuple[int, int], set] = {}
        self._n = 0  # columns per axis (4 * chunks per axis)
        self._H: Optional[np.ndarray] = None  # (n, n) int16, exact envelope
        self._H1: Optional[np.ndarray] = None  # (8n, 8n) int16 voxel tops
        self._dirty = True
        self._device: Optional[tuple] = None
        self._version = 0
        self._sun: Optional[tuple] = None  # (version, key, dev, n1)
        self._sun_last_build = -1e9

    # -- host maintenance --------------------------------------------------

    def _ensure_size(self, n: int) -> None:
        if n <= self._n:
            return
        old, old_n = self._H, self._n
        old1 = self._H1
        self._n = n
        self._H = np.zeros((n, n), np.int16)
        if old is not None:
            self._H[:old_n, :old_n] = old
        if n * CELL <= self.MAX_N1:
            self._H1 = np.zeros((n * CELL, n * CELL), np.int16)
            if old1 is not None:
                self._H1[: old1.shape[0], : old1.shape[1]] = old1
        else:
            self._H1 = None
        self._dirty = True

    def set_chunk(self, pos: tuple[int, int, int], tops: np.ndarray,
                  vtops: Optional[np.ndarray] = None) -> None:
        """Insert/replace the (4,4) top map (and optional (32,32) voxel
        top map) of the chunk at SVO chunk position ``pos`` and refresh
        its envelope columns."""
        self._tops[pos] = tops
        if vtops is not None:
            self._vtops[pos] = vtops
        else:
            self._vtops.pop(pos, None)
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
        self._vtops.pop(pos, None)
        col = self._cols.get((pos[0], pos[2]))
        if col is not None:
            col.discard(pos)
        self._refresh_cols(pos[0], pos[2])

    def clear(self) -> None:
        self._tops.clear()
        self._vtops.clear()
        self._cols.clear()
        if self._H is not None:
            self._H[:] = 0
        if self._H1 is not None:
            self._H1[:] = 0
        self._dirty = True
        self._version += 1

    def rebuild(self, chunks: dict[tuple[int, int, int], np.ndarray],
                vchunks: Optional[dict] = None) -> None:
        """Replace the whole envelope (chunk shift / coord-space change)."""
        self._tops = dict(chunks)
        self._vtops = dict(vchunks) if vchunks is not None else {}
        self._cols = {}
        for pos in self._tops:
            self._cols.setdefault((pos[0], pos[2]), set()).add(pos)
        self._n = 0
        self._H = None
        self._H1 = None
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
        """Recompute the 4x4 envelope columns (and the 32x32 voxel-top
        block) under chunk column (cx, cz) as the max over that column's
        loaded chunk stack."""
        acc = np.zeros((COLS_PER_CHUNK, COLS_PER_CHUNK), np.int32)
        acc1 = np.zeros((32, 32), np.int32)
        for pos in self._cols.get((cx, cz), ()):
            t = self._tops[pos].astype(np.int32)
            acc = np.maximum(acc, np.where(t > 0, t + pos[1] * 32, 0))
            v = self._vtops.get(pos)
            if v is not None:
                v = v.astype(np.int32)
                acc1 = np.maximum(acc1, np.where(v > 0, v + pos[1] * 32, 0))
        x0, z0 = cx * COLS_PER_CHUNK, cz * COLS_PER_CHUNK
        self._H[x0 : x0 + COLS_PER_CHUNK, z0 : z0 + COLS_PER_CHUNK] = acc.astype(
            np.int16
        )
        if self._H1 is not None:
            self._H1[cx * 32 : cx * 32 + 32, cz * 32 : cz * 32 + 32] = (
                acc1.astype(np.int16)
            )
        self._dirty = True
        self._version += 1

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
        def pyramid(base):
            levels = [base]
            while levels[-1].shape[0] > 1:
                m = levels[-1]
                k = m.shape[0] // 2
                levels.append(m.reshape(k, 2, k, 2).max(axis=(1, 3)))
            offsets, flat, off = [], [], 0
            for m in levels:
                offsets.append(off)
                flat.append(m.reshape(-1))
                off += m.size
            return jnp.asarray(np.concatenate(flat)), tuple(offsets)

        lv_d, offsets = pyramid(d)
        lv_e, _ = pyramid(h)  # exact pyramid: per-ray shadow marches
        self._device = (
            lv_d,
            offsets,
            self._n,
            int(h.max()) if h.size else 0,
            bounds,
            lv_e,
        )
        self._dirty = False
        return self._device

    # -- sun visibility map ------------------------------------------------

    def sun_map(self, light_dir):
        """Per-VOXEL-column sun visibility heights: a point at height y in
        voxel column c certainly sees the light iff y >= S[c] - 1e-4 — the
        precomputed equivalent of marching every shadow ray over the voxel
        -top field, built by a conservative max-plus doubling sweep along
        the (fixed per frame) sun direction.

        Returns (S_dev (n1*n1,) f32, n1) or None when unavailable: world
        too large for the voxel mirror, missing voxel tops, sun too low,
        or rebuilt too recently (streaming cooldown — a stale map is
        UNSOUND, so changes disable it until the world goes quiet)."""
        import time as _time

        if (self._H1 is None or self._n == 0
                or len(self._vtops) != len(self._tops)):
            return None
        d = -np.asarray(light_dir, np.float64)
        d = d / max(np.linalg.norm(d), 1e-9)
        if d[1] < 0.1:
            return None  # sun at/below the horizon: nothing elidable
        key = tuple(np.round(d * 64).astype(int))
        if self._sun is not None and self._sun[0] == self._version \
                and self._sun[1] == key:
            return self._sun[2], self._sun[3]
        now = _time.monotonic()
        if now - self._sun_last_build < self.SUN_COOLDOWN:
            return None
        import jax.numpy as jnp

        n1 = self._H1.shape[0]
        h1 = self._H1.astype(np.float32)
        dxz = float(np.hypot(d[0], d[2]))
        if dxz < 1e-4:
            s_map = h1  # straight-up sun: only the own column matters
        else:
            slope = float(d[1] / dxz)  # ray rise per horizontal voxel
            v = np.array([d[0], d[2]]) / dxz

            def shift(a, ox, oz):
                """a evaluated at (x+ox, z+oz), zero-filled."""
                out = np.zeros_like(a)
                xs = slice(max(0, -ox), n1 - max(0, ox))
                zs = slice(max(0, -oz), n1 - max(0, oz))
                xd = slice(max(0, ox), n1 - max(0, -ox))
                zd = slice(max(0, oz), n1 - max(0, -oz))
                out[xs, zs] = a[xd, zd]
                return out

            hmax = float(h1.max())
            length = hmax / max(slope, 1e-3) + 2.0
            k_max = max(1, int(np.ceil(np.log2(max(length, 2.0)))))
            s_map = h1.copy()
            off = v.copy()
            err = 0.75  # origin sits anywhere within its column
            for _ in range(k_max):
                o = np.rint(off).astype(int)
                step_err = float(np.linalg.norm(off - o))
                dist_c = max(0.0, float(np.linalg.norm(off)) - err - step_err)
                dist_d = max(0.0, dist_c - 1.0)
                sh = shift(s_map, int(o[0]), int(o[1]))
                # plus-shaped dilation covers BOTH the rounding drift of
                # the integerized path and the L-corner columns a diagonal
                # step jumps over; dilated terms sit one voxel closer, so
                # only they pay the extra distance credit
                dil = np.maximum(
                    np.maximum(shift(sh, 1, 0), shift(sh, -1, 0)),
                    np.maximum(shift(sh, 0, 1), shift(sh, 0, -1)))
                s_map = np.maximum(
                    s_map, np.maximum(sh - dist_c * slope,
                                      dil - dist_d * slope))
                err += step_err
                off = off * 2.0

        self._sun = (self._version, key, jnp.asarray(s_map.reshape(-1)), n1)
        self._sun_last_build = _time.monotonic()
        return self._sun[2], self._sun[3]
