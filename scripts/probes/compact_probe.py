"""Probe: compact_indices (bitpack + bucket-width, shipped) vs the
superseded round-2 formulation (blocked cumsum + full-width masked scatter).

Measured on the chip (this probe, 2026-08-20): at 2.07M lanes the old
scatter formulation costs ~9.8 ms/call regardless of output size; the
bitpack formulation lands the data-dependent work at BUCKET width:
1.7 ms at size 131K, 3.3 ms at 262K, wash at 786K; 0.2 vs 2.4 ms at the
519K/64K in-trace compaction shape. The frame pays ~3 full-width calls
(refine ordering, two shadow-bucket orderings) plus one per in-trace
compaction, so this is ~20-25 ms of a 170 ms frame.

Asserts exact equality (including pad-0 semantics), then times both with
in-program rep slopes (standalone timings floor at the sync cost,
docs/PERF.md microbench caveat).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from voxelrs_tpu.ops.shading import compact_indices  # noqa: E402


def compact_indices_v1(mask, size: int):
    """The superseded round-2 formulation, kept as the probe baseline."""
    blk = 512
    n = mask.shape[0]
    nb = -(-n // blk)
    pad = nb * blk - n
    m = jnp.pad(mask, (0, pad)) if pad else mask
    m2 = m.reshape(nb, blk)
    cnt = m2.sum(axis=1, dtype=jnp.int32)
    offs = jnp.cumsum(cnt) - cnt
    within = jnp.cumsum(m2.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(m2, offs[:, None] + within, size)  # OOB -> dropped
    lane = jnp.arange(nb * blk, dtype=jnp.int32).reshape(nb, blk)
    out = jnp.zeros(size + 1, jnp.int32).at[pos.ravel()].set(
        lane.ravel(), mode="drop")
    return out[:size]


def check(B, size, density, seed):
    rng = np.random.default_rng(seed)
    mask = jnp.asarray(rng.random(B) < density)
    a = np.asarray(compact_indices_v1(mask, size))
    b = np.asarray(compact_indices(mask, size))
    assert (a == b).all(), (B, size, density, np.nonzero(a != b)[0][:10],
                            a[np.nonzero(a != b)[0][:10]],
                            b[np.nonzero(a != b)[0][:10]])


def bench(fn, B, size, density, label):
    rng = np.random.default_rng(0)
    mask0 = jnp.asarray(rng.random(B) < density)

    def chain(mask, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            idx = fn(mask, size)
            acc = acc + idx[0] + idx[-1]
            # fold so reps can't be CSE'd; flip one lane per rep
            mask = mask ^ (jnp.arange(B, dtype=jnp.int32)
                           == (acc & jnp.int32(B - 1)))
        return mask, acc

    times = {}
    for reps in (2, 8):
        jfn = jax.jit(lambda m, r=reps: chain(m, r))
        o = jfn(mask0)
        _ = np.asarray(o[1])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            o = jfn(mask0)
            _ = np.asarray(o[1])
            ts.append(time.perf_counter() - t0)
        times[reps] = float(np.median(ts))
    slope = (times[8] - times[2]) / 6
    print(f"{label:10s} B={B:8d} size={size:7d} dens={density:.2f}: "
          f"{slope*1e3:6.2f} ms/call (r2 {times[2]*1e3:.1f}, "
          f"r8 {times[8]*1e3:.1f})", flush=True)


if __name__ == "__main__":
    # exactness first (incl. empty blocks, leading/trailing empties, pads)
    for B, size, dens, seed in (
        (1 << 14, 4096, 0.1, 0), (1 << 14, 4096, 0.0, 1),
        (1 << 14, 16384, 0.9, 2), (100_000, 8192, 0.05, 3),
        (2_073_600, 131072, 0.05, 4), (2_073_600, 262144, 0.10, 5),
        (519_901, 65536, 0.08, 6),
    ):
        check(B, size, dens, seed)
    print("exactness OK", flush=True)

    for B, size, dens in (
        (2_073_600, 131072, 0.05),
        (2_073_600, 262144, 0.10),
        (2_073_600, 786432, 0.30),
        (519_901, 65536, 0.08),
    ):
        bench(compact_indices_v1, B, size, dens, "v1")
        bench(compact_indices, B, size, dens, "shipped")
