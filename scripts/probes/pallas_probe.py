"""Probe: in-kernel (Pallas/Mosaic) gather throughput on the real TPU.

The XLA traversal kernel is bound by in-loop gather rate (~220M row-gathers/s,
docs/PERF.md).  This measures what a Pallas kernel can do against a
VMEM-resident table, for the access patterns a traversal kernel would use:

  flat   — general gather: out[l] = tbl[addr[l]], addr arbitrary
  axis0  — sublane gather: out[i,j] = tbl[r[i,j], j]   (per-lane row select)
  axis1  — lane shuffle:   out[i,j] = row8[i, c[i,j]]  (within 128 lanes)
  two_step — axis0 row-fetch + axis1 column extract = general gather
"""

import sys
import time

import numpy as np

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

print("devices:", jax.devices(), flush=True)

N_STEPS = 512


def make_kernel(kind, rows, sub):
    total = rows * 128

    def kernel(tbl_ref, idx_ref, out_ref):
        def body(i, carry):
            idx, acc = carry
            if kind == "flat":
                addr = (idx % jnp.uint32(total)).astype(jnp.int32)
                v = jnp.take(tbl_ref[:].reshape(-1), addr.reshape(-1), axis=0).reshape(sub, 128)
            elif kind == "axis0":
                r = (idx % jnp.uint32(rows)).astype(jnp.int32)
                v = jnp.take_along_axis(tbl_ref[:], r, axis=0)
            elif kind == "axis1":
                c = (idx % jnp.uint32(128)).astype(jnp.int32)
                v = jnp.take_along_axis(tbl_ref[0:sub, :], c, axis=1)
            elif kind == "two_step":
                addr = idx % jnp.uint32(total)
                r = (addr >> jnp.uint32(7)).astype(jnp.int32)
                c = (addr & jnp.uint32(127)).astype(jnp.int32)
                rowv = jnp.take_along_axis(tbl_ref[:], r, axis=0)
                v = jnp.take_along_axis(rowv, c, axis=1)
            else:
                raise ValueError(kind)
            acc = acc ^ v
            idx = idx * np.uint32(1664525) + np.uint32(1013904223)
            return idx, acc

        idx0 = idx_ref[:]
        _, acc = jax.lax.fori_loop(
            0, N_STEPS, body, (idx0, jnp.zeros((sub, 128), jnp.uint32))
        )
        out_ref[:] = acc

    return kernel


def run(kind, rows, sub):
    tbl = jnp.arange(rows * 128, dtype=jnp.uint32).reshape(rows, 128)
    idx = jnp.asarray(
        np.random.randint(0, 1 << 30, (sub, 128)).astype(np.uint32)
    )
    fn = pl.pallas_call(
        make_kernel(kind, rows, sub),
        out_shape=jax.ShapeDtypeStruct((sub, 128), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(fn)
    t0 = time.time()
    try:
        r = fn(tbl, idx)
        _ = np.asarray(r[0, 0])  # force 4-byte readback
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{kind:9s} rows={rows:6d} sub={sub:3d}: FAIL {type(e).__name__}: {msg}", flush=True)
        return
    compile_s = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        r = fn(tbl, idx)
        _ = np.asarray(r[0, 0])
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    lanes = sub * 128
    rate = lanes * N_STEPS / dt
    print(
        f"{kind:9s} rows={rows:6d} ({rows*512//1024:6d}KB) sub={sub:3d}: "
        f"{dt*1e3:8.2f} ms  -> {rate/1e9:7.3f} G gathers/s  (compile {compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    configs = []
    kinds = sys.argv[1].split(",") if len(sys.argv) > 1 else ["axis1", "axis0", "two_step", "flat"]
    for kind in kinds:
        for rows in (512, 4096, 16384):
            if kind == "axis1" and rows != 512:
                continue
            configs.append((kind, rows, 8))
    for kind, rows, sub in configs:
        run(kind, rows, sub)
