"""Probe: host-side dispatch cost + async pipelining depth over the tunnel.

Determines whether the deferred frame pipeline is bound by per-dispatch
latency (then: fuse stages into fewer programs / pipeline frames) or by
device compute (then: cut device work).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

print("devices:", jax.devices(), flush=True)


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


# tiny program: measures pure dispatch/RPC overhead
tiny = jax.jit(lambda x: x + 1)
x = jnp.ones(8, jnp.float32)
sync(tiny(x))

# medium program: ~10 ms of device work (chained elementwise on 4M f32)
y = jnp.ones(4 << 20, jnp.float32)


def med_body(y):
    for _ in range(300):
        y = y * 1.000001 + 0.5
        y = y - 0.5
    return y


med = jax.jit(med_body)
sync(med(y))

for name, fn, arg in (("tiny", tiny, x), ("medium", med, y)):
    # 1) sequential with sync each time (round-trip floor)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(fn(arg))
        ts.append(time.perf_counter() - t0)
    seq = float(np.median(ts))

    # 2) N async dispatches, one final sync (chained: out feeds in)
    for N in (8, 32):
        t0 = time.perf_counter()
        r = arg
        for _ in range(N):
            r = fn(r)
        enq = time.perf_counter() - t0  # host time to enqueue N
        sync(r)
        tot = time.perf_counter() - t0
        print(
            f"{name}: sync-each {seq*1e3:7.2f} ms | chain N={N:3d}: "
            f"enqueue {enq/N*1e3:6.2f} ms/call, total {tot/N*1e3:7.2f} ms/call",
            flush=True,
        )

# 3) two independent chains from two threads (frame pipelining analogue)
from concurrent.futures import ThreadPoolExecutor  # noqa: E402


def chain(n):
    r = y
    for _ in range(n):
        r = med(r)
    sync(r)


for threads in (1, 2, 4):
    with ThreadPoolExecutor(threads) as pool:
        t0 = time.perf_counter()
        list(pool.map(lambda _: chain(16), range(threads)))
        dt = time.perf_counter() - t0
    print(
        f"medium chains x{threads} threads (16 calls each): "
        f"{dt*1e3/16/threads:.2f} ms/call effective",
        flush=True,
    )
