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


def chunk_solid_bases(voxels: np.ndarray, lod: int = 0,
                      opaque: Optional[np.ndarray] = None) -> np.ndarray:
    """(32,32) int16 per-voxel-column CONTIGUOUS OPAQUE run height from the
    chunk's bottom (y=0): the column is provably solid-opaque for
    y in [0, run). Feeds the certainly-blocked half of the sun map — a sun
    ray proven to pass below a column's world run top must hit.

    ``opaque`` is a bool LUT over block values (None = any nonzero).
    LOD-conservative: at LOD L a rendered 2^(5-L) block counts toward the
    run only when EVERY source voxel in it is opaque (then whatever
    representative pick_leaf chooses renders opaque); partially-solid
    blocks render MORE geometry than the source, so under-counting them
    only loses coverage, never soundness."""
    assert voxels.shape == (32, 32, 32)
    b = 1 << (5 - lod) if 1 <= lod <= 5 else 1
    op = (voxels != 0) if opaque is None else opaque[voxels]
    blocks = op.reshape(32 // b, b, 32 // b, b, 32 // b, b).all(axis=(1, 3, 5))
    run_b = np.cumprod(blocks, axis=1).sum(axis=1)  # (nbx, nbz) blocks
    run = (run_b * b).astype(np.int16)
    if b == 1:
        return run
    return np.repeat(np.repeat(run, b, axis=0), b, axis=1)


def opaque_lut_from_mask(translucent_block_mask: int) -> np.ndarray:
    """(256,) bool LUT from graphics.Svo.translucent_block_mask: True for
    block values the renderer treats as fully opaque (bit 63 = overflow
    values, always translucent there, always non-opaque here)."""
    lut = np.zeros(256, bool)
    for v in range(1, 63):
        lut[v] = not (translucent_block_mask >> v) & 1
    return lut


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


def _shift0(a: np.ndarray, ox: int, oz: int, n1: int) -> np.ndarray:
    """``a`` evaluated at (x+ox, z+oz), zero-filled outside the map."""
    out = np.zeros_like(a)
    if abs(ox) >= n1 or abs(oz) >= n1:
        return out
    xs = slice(max(0, -ox), n1 - max(0, ox))
    zs = slice(max(0, -oz), n1 - max(0, oz))
    xd = slice(max(0, ox), n1 - max(0, -ox))
    zd = slice(max(0, oz), n1 - max(0, -oz))
    out[xs, zs] = a[xd, zd]
    return out


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
        self._sbase: dict[tuple[int, int, int], np.ndarray] = {}
        # topmost contiguous-opaque run per voxel column, as (top, bottom)
        # heights — the "skin" a certainly-blocked claim must pierce
        self._B1: Optional[np.ndarray] = None  # (8n, 8n) int16 run tops
        self._B1b: Optional[np.ndarray] = None  # (8n, 8n) int16 run bottoms
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
            oldb, oldbb = self._B1, self._B1b
            self._H1 = np.zeros((n * CELL, n * CELL), np.int16)
            self._B1 = np.zeros((n * CELL, n * CELL), np.int16)
            self._B1b = np.zeros((n * CELL, n * CELL), np.int16)
            if old1 is not None:
                self._H1[: old1.shape[0], : old1.shape[1]] = old1
            if oldb is not None:
                self._B1[: oldb.shape[0], : oldb.shape[1]] = oldb
            if oldbb is not None:
                self._B1b[: oldbb.shape[0], : oldbb.shape[1]] = oldbb
        else:
            self._H1 = None
            self._B1 = None
            self._B1b = None
        self._dirty = True

    def set_chunk(self, pos: tuple[int, int, int], tops: np.ndarray,
                  vtops: Optional[np.ndarray] = None,
                  sbase: Optional[np.ndarray] = None) -> None:
        """Insert/replace the (4,4) top map (and optional (32,32) voxel
        top / solid-base maps) of the chunk at SVO chunk position ``pos``
        and refresh its envelope columns."""
        self._tops[pos] = tops
        if vtops is not None:
            self._vtops[pos] = vtops
        else:
            self._vtops.pop(pos, None)
        if sbase is not None:
            self._sbase[pos] = sbase
        else:
            self._sbase.pop(pos, None)
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
        self._sbase.pop(pos, None)
        col = self._cols.get((pos[0], pos[2]))
        if col is not None:
            col.discard(pos)
        self._refresh_cols(pos[0], pos[2])

    def clear(self) -> None:
        self._tops.clear()
        self._vtops.clear()
        self._sbase.clear()
        self._cols.clear()
        if self._H is not None:
            self._H[:] = 0
        if self._H1 is not None:
            self._H1[:] = 0
        if self._B1 is not None:
            self._B1[:] = 0
        if self._B1b is not None:
            self._B1b[:] = 0
        self._dirty = True
        self._version += 1

    def rebuild(self, chunks: dict[tuple[int, int, int], np.ndarray],
                vchunks: Optional[dict] = None,
                schunks: Optional[dict] = None) -> None:
        """Replace the whole envelope (chunk shift / coord-space change)."""
        self._tops = dict(chunks)
        self._vtops = dict(vchunks) if vchunks is not None else {}
        self._sbase = dict(schunks) if schunks is not None else {}
        self._cols = {}
        for pos in self._tops:
            self._cols.setdefault((pos[0], pos[2]), set()).add(pos)
        self._n = 0
        self._H = None
        self._H1 = None
        self._B1 = None
        self._B1b = None
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
        accb = np.zeros((32, 32), np.int32)
        accb_bot = np.zeros((32, 32), np.int32)
        stack = sorted(self._cols.get((cx, cz), ()), key=lambda p: p[1])
        for pos in stack:
            t = self._tops[pos].astype(np.int32)
            acc = np.maximum(acc, np.where(t > 0, t + pos[1] * 32, 0))
            v = self._vtops.get(pos)
            if v is not None:
                v = v.astype(np.int32)
                acc1 = np.maximum(acc1, np.where(v > 0, v + pos[1] * 32, 0))
            # topmost contiguous opaque run, tracked as (bottom, top):
            # a chunk whose base meets the current run top extends it; a
            # chunk starting a fresh run replaces it (higher chunks always
            # win — the surface skin is what blocked claims pierce).
            # Missing chunks / missing solid info break continuity.
            sb = self._sbase.get(pos)
            if sb is not None:
                base_y = pos[1] * 32
                sbi = sb.astype(np.int32)
                cont = (accb == base_y) & (sbi > 0)
                start = ~cont & (sbi > 0)
                accb = np.where(cont | start, base_y + sbi, accb)
                accb_bot = np.where(start, base_y, accb_bot)
        x0, z0 = cx * COLS_PER_CHUNK, cz * COLS_PER_CHUNK
        self._H[x0 : x0 + COLS_PER_CHUNK, z0 : z0 + COLS_PER_CHUNK] = acc.astype(
            np.int16
        )
        if self._H1 is not None:
            self._H1[cx * 32 : cx * 32 + 32, cz * 32 : cz * 32 + 32] = (
                acc1.astype(np.int16)
            )
        if self._B1 is not None:
            self._B1[cx * 32 : cx * 32 + 32, cz * 32 : cz * 32 + 32] = (
                accb.astype(np.int16)
            )
            self._B1b[cx * 32 : cx * 32 + 32, cz * 32 : cz * 32 + 32] = (
                accb_bot.astype(np.int16)
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
        """Per-VOXEL-column sun visibility certificates: a point at height
        y in voxel column c CERTAINLY SEES the light iff y >= S[c] - 1e-4,
        and is CERTAINLY BLOCKED iff y <= B[c] - 1e-4 (B built from the
        contiguous-opaque column runs, so a claimed ray provably passes
        through solid). Both are conservative max-plus doubling sweeps
        along the (fixed per frame) sun direction — the precomputed
        equivalent of marching every shadow ray over the voxel-top field.

        Returns (SB_dev (n1*n1, 1+75+2K) f32, n1, d_len, d) or None when
        unavailable: world too large for the voxel mirror, missing voxel
        tops, sun too low, or rebuilt too recently (streaming cooldown — a
        stale map is UNSOUND, so changes disable it until the world goes
        quiet). Row layout: [S_far, 25 near voxel tops, 25 near run tops,
        25 near run bottoms, K band los, K band his]; the near planes are
        the 5x5 neighborhood in (dx,dz) row-major order for the verdict
        kernel's exact window tests. ``d_len`` bounds the distance of any
        band-claimed blocker; ``d`` is the unit direction toward the sun
        the maps were built for."""
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
            return self._sun[2], self._sun[3], self._sun[4], self._sun[5]
        now = _time.monotonic()
        if now - self._sun_last_build < self.SUN_COOLDOWN:
            return None
        import jax.numpy as jnp

        n1 = self._H1.shape[0]
        h1 = self._H1.astype(np.float32)
        b1 = (self._B1.astype(np.float32) if self._B1 is not None
              else np.zeros_like(h1))
        b_map = np.zeros_like(h1)
        d_len = np.float32(0.0)
        dxz = float(np.hypot(d[0], d[2]))
        if dxz < 1e-4:
            # straight-up sun: every crossing is within the kernel's
            # exact 5x5 near field — no far claims needed
            s_map = np.full_like(h1, -1e9)
        else:
            slope = float(d[1] / dxz)  # ray rise per horizontal voxel
            v = np.array([d[0], d[2]]) / dxz

            def shift(a, ox, oz):
                """a evaluated at (x+ox, z+oz), zero-filled."""
                out = np.zeros_like(a)
                if abs(ox) >= n1 or abs(oz) >= n1:
                    return out
                xs = slice(max(0, -ox), n1 - max(0, ox))
                zs = slice(max(0, -oz), n1 - max(0, oz))
                xd = slice(max(0, ox), n1 - max(0, -ox))
                zd = slice(max(0, oz), n1 - max(0, -oz))
                out[xs, zs] = a[xd, zd]
                return out

            hmax = float(h1.max())
            length = hmax / max(slope, 1e-3) + 2.0
            # Dense exact sweep: S[c] = max over sampled distances D of
            # (dil3x3(h1)[c + rint(D*v)] - (D - 0.25)*slope). Sampling
            # every 0.5 voxels puts a sample within 0.25 of every real
            # crossing; the landing column then deviates by < 1.75 per
            # axis (0.5 in-column origin + 0.25 sample gap + 0.5
            # rounding), so ONE 3x3 dilation covers it — unlike the
            # earlier doubling sweep, whose per-level dilations and
            # accumulated credits compounded to ~5-8 voxels of slack and
            # strangled lit coverage to a few percent.
            def shift_clamp(a, ox, oz):
                """a evaluated at (x+ox, z+oz), EDGE-CLAMPED: a landing
                cell one step outside the map must still see its in-bounds
                3x3 neighbors (zero-fill here silently un-shadowed border
                columns); cells >=2 outside have no in-bounds neighbors,
                and the clamped read only over-claims shadow there."""
                xi = np.clip(np.arange(n1) + ox, 0, n1 - 1)
                zi = np.clip(np.arange(n1) + oz, 0, n1 - 1)
                return a[np.ix_(xi, zi)]

            hd = h1.copy()
            for ox in (-1, 0, 1):
                for oz in (-1, 0, 1):
                    if ox or oz:
                        hd = np.maximum(hd, shift(h1, ox, oz))
            # FAR field only: samples landing >= 2 cells out (their 3x3
            # covers every crossing >= 3 cells out). Crossings within the
            # 5x5 are resolved EXACTLY by the verdict kernel's per-column
            # window tests (ops/beams.py) from the origin's true position
            # — the near field is where blunt dilation cost most.
            s_map = np.full_like(h1, -1e9)
            seen = set()
            D = 0.25
            while D <= length:
                o = (int(np.rint(v[0] * D)), int(np.rint(v[1] * D)))
                if o not in seen:  # later D, same cell: smaller term
                    seen.add(o)
                    if max(abs(o[0]), abs(o[1])) >= 2:
                        s_map = np.maximum(
                            s_map,
                            shift_clamp(hd, o[0], o[1]) - (D - 0.25) * slope)
                D += 0.5

            if b1.any():
                # certainly-BLOCKED distance ladder: at horizontal travel
                # Dh the ray's height is EXACTLY y + Dh*slope (no drift in
                # height — only the landing COLUMN is uncertain, by the
                # origin's in-column position [<=0.71] plus the offset
                # rounding [<=0.71], all within a 5x5 neighborhood). A
                # claim at rung Dh therefore needs the ray height to sit
                # >=1 voxel inside the topmost contiguous-opaque run of
                # EVERY 3x3 neighbor of the landing column (per-axis
                # deviation is provably < 1): 3x3-eroded run top above,
                # 3x3-dilated run bottom below. Rungs grow by
                # ~sqrt2 so the (typically tens-of-voxels wide) window of
                # distances where a blocked ray is inside the terrain skin
                # contains a rung. Single-hop tests: no error accumulation,
                # and rays that duck UNDER hollow mountain interiors (the
                # SVO only holds surface-straddling chunks) are simply not
                # claimed at those rungs.
                bb1 = self._B1b.astype(np.float32)
                rungs = []
                dh = 3.0  # closer blockers are kernel-exact (5x5 windows)
                while dh <= length and len(rungs) < 12:
                    rungs.append(dh)
                    dh = max(dh + 1.0, round(dh * 1.45))
                los, his = [], []
                for dh in rungs:
                    ox = int(np.rint(v[0] * dh))
                    oz = int(np.rint(v[1] * dh))
                    top_s = shift(b1, ox, oz)
                    bot_s = shift(bb1, ox, oz)
                    # empty neighbors (top 0) kill the claim via ero-1<0
                    ero = top_s
                    dil = bot_s
                    for ddx in (-1, 0, 1):
                        for ddz in (-1, 0, 1):
                            if ddx or ddz:
                                ero = np.minimum(ero, shift(top_s, ddx, ddz))
                                dil = np.maximum(dil, shift(bot_s, ddx, ddz))
                    rise = dh * slope
                    his.append(ero - rise - 1.0)  # claim: y <= hi
                    los.append(dil - rise + 1.0)  # claim: y >= lo
                b_map = np.stack(los + his, axis=2)  # (n1, n1, 2K)
                d_len = np.float32(rungs[-1] / dxz + 4.0)

        if b_map.ndim == 2:  # no bands available
            b_map = np.zeros((n1, n1, 0), np.float32)

        # near-field planes for the kernel's EXACT per-column window
        # tests: the 5x5 neighborhood's voxel tops (lit) and topmost-run
        # top/bottom (blocked), gathered with the same row. Out-of-map
        # neighbors read 0: no geometry (lit passes), no run (no claim).
        near = []
        for src in (h1, self._B1.astype(np.float32)
                    if self._B1 is not None else np.zeros_like(h1),
                    self._B1b.astype(np.float32)
                    if self._B1b is not None else np.zeros_like(h1)):
            for ddx in (-2, -1, 0, 1, 2):
                for ddz in (-2, -1, 0, 1, 2):
                    near.append(np.asarray(
                        _shift0(src, ddx, ddz, n1), np.float32).reshape(-1))
        sb = np.concatenate(
            [s_map.reshape(n1 * n1, 1),
             np.stack(near, axis=1),
             b_map.reshape(n1 * n1, -1)], axis=1)
        self._sun = (self._version, key, jnp.asarray(sb), n1,
                     jnp.float32(d_len),
                     jnp.asarray(d.astype(np.float32)))
        self._sun_last_build = _time.monotonic()
        return self._sun[2], self._sun[3], self._sun[4], self._sun[5]
