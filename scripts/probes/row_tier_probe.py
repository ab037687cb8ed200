"""Probe: exact row-count gather-tier boundary near the 48K ladder rung.

The MC benchmark world (17.3 MB SVO at rd 20) sizes the device buffer at
the 49,152-row rung of Svo._grow_device's {2^k, 1.5*2^k} ladder — right at
the measured "~48K rows" fast/slow gather boundary (docs/PERF.md). If
49,152 is on the slow side, every traversal fetch in the MC scene pays the
~3x tier and a finer ladder rung wins the frame back.

Times a width-108 row gather at 519K lanes (the first coarse segment's
width) from tables of ROWS in {32768, 40960, 44032, 45056, 47104, 49152,
53248, 65536}, in-program rep slopes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 519_901
W = 108


def bench(rows):
    table = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**31, (rows, W), np.int64),
        jnp.uint32,
    )
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, rows, B, np.int64), jnp.int32
    )

    def chain(tab, ids, reps):
        acc = jnp.uint32(0)
        for _ in range(reps):
            r = tab[ids]
            fold = r[:, 0] ^ r[:, 54]
            ids = (ids ^ (fold & jnp.uint32(1023))).astype(jnp.int32) % rows
            acc = acc + fold[0]
        return ids, acc

    times = {}
    for reps in (2, 10):
        jfn = jax.jit(lambda t, i, r=reps: chain(t, i, r))
        o = jfn(table, idx0)
        _ = np.asarray(o[1])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            o = jfn(table, idx0)
            _ = np.asarray(o[1])
            ts.append(time.perf_counter() - t0)
        times[reps] = float(np.median(ts))
    slope = (times[10] - times[2]) / 8
    mb = rows * W * 4 / 1e6
    print(f"rows={rows:6d} ({mb:5.1f} MB): {slope/B*1e9:6.2f} ns/lane "
          f"({slope*1e3:.2f} ms/gather)", flush=True)


if __name__ == "__main__":
    for rows in (32768, 40960, 44032, 45056, 47104, 49152, 53248, 65536):
        bench(rows)
