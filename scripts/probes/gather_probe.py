"""Probe: XLA in-loop gather cost vs fetch width on the real TPU.

docs/PERF.md: element gather ~8 ms/M lanes in-loop; 12-word rows ~12 ms/M.
If wide rows amortize (48-word fetch << 4x a 12-word fetch), a fat-node
layout (parent + inlined children) collapses traversal gathers per ray.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)

B = 1 << 20
ITERS = 32
N_ROWS = 1 << 14  # 16K rows


def bench_width(width):
    tbl = jnp.arange(N_ROWS * width, dtype=jnp.uint32).reshape(N_ROWS, width)
    idx0 = jnp.asarray(np.random.randint(0, N_ROWS, B).astype(np.int32))

    def fn(tbl, idx):
        def body(i, carry):
            idx, acc = carry
            v = tbl[idx]  # (B, width) row gather
            acc = acc ^ v[:, 0] ^ v[:, width - 1]
            idx = (idx * 1103515245 + 12345) % N_ROWS
            return idx, acc

        _, acc = jax.lax.fori_loop(0, ITERS, body, (idx, jnp.zeros(B, jnp.uint32)))
        return acc

    f = jax.jit(fn)
    r = f(tbl, idx0)
    _ = np.asarray(r[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = f(tbl, idx0)
        _ = np.asarray(r[0])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    per_m = dt / ITERS / (B / 1e6) * 1e3
    rate = B * ITERS / dt
    print(
        f"width={width:4d} ({width*4:4d}B/fetch): {dt*1e3:7.1f} ms total, "
        f"{per_m:6.2f} ms/M-fetches, {rate/1e6:7.1f} M fetches/s, "
        f"{rate*width*4/1e9:7.2f} GB/s",
        flush=True,
    )


if __name__ == "__main__":
    widths = [int(w) for w in sys.argv[1].split(",")] if len(sys.argv) > 1 else [1, 4, 12, 24, 48, 108, 192]
    for w in widths:
        bench_width(w)
