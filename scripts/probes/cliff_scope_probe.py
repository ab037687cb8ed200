"""Probe: is the >1.6M-lane gather cliff per GATHER OP or per PROGRAM?

Round-3 measured per-lane gather cost doubling when one program gathers
from >~1.6M lanes (shade_probe.py) and mitigated it by splitting the
full-width shade into two programs. Round 3 then fused the WHOLE frame
into one program — so if the cliff is scoped per program (total gathered
lanes across all ops), the split stopped helping and every gather in the
fused frame pays the slow tier. If it's per op (lanes per gather op),
in-program halves still dodge it.

Cases, all at B=2,073,600 total lanes, gathering W=108-wide rows from a
fast-tier table (rows<=48K, <=27MB):
  whole      one gather op at B lanes                       (cliff if per-op)
  halves_2p  two programs, B/2 each                         (round-2 mitigation)
  halves_1p  ONE program, two sequential B/2 gather ops     (the fused-frame shape)
  quarters_1p ONE program, four B/4 gather ops
Repeated in-program (reps) so the per-iteration slope is trustworthy
(standalone calls floor at the sync cost, docs/PERF.md microbench caveat).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 2_073_600
W = 108
ROWS = 40_000  # fast tier: <=48K rows, table 40000*108*4 = 17.3 MB
REPS = 8

table = jnp.asarray(
    np.random.default_rng(0).integers(0, 2**31, (ROWS, W), np.int64),
    jnp.uint32,
)
idx = jnp.asarray(
    np.random.default_rng(1).integers(0, ROWS, B, np.int64), jnp.int32
)


def chain(tab, ids, reps, splits):
    """reps sequential rounds; each round gathers `splits` consecutive
    slices covering all B lanes, and folds the result into the ids so the
    rounds can't be batched/CSE'd."""
    acc = jnp.uint32(0)
    step = B // splits
    for _ in range(reps):
        outs = []
        for s in range(splits):
            sl = ids[s * step:(s + 1) * step]
            rows = tab[sl]  # (step, W) row gather
            outs.append(rows[:, 0] ^ rows[:, W // 2])
        fold = jnp.concatenate(outs) if splits > 1 else outs[0]
        ids = (ids ^ (fold & jnp.uint32(1023))).astype(jnp.int32) % ROWS
        acc = acc + fold[0]
    return ids, acc


def run(splits, reps, label, programs=1):
    if programs == 1:
        jfn = jax.jit(lambda t, i: chain(t, i, reps, splits))
        out = jfn(table, idx)
        _ = np.asarray(out[1])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = jfn(table, idx)
            _ = np.asarray(out[1])
            ts.append(time.perf_counter() - t0)
    else:
        # two PROGRAMS each owning half the lanes (the round-2 mitigation)
        half = B // 2
        jfn = jax.jit(lambda t, i: chain(t, i, reps, 1))
        o1 = jfn(table, idx[:half])
        o2 = jfn(table, idx[half:])
        _ = np.asarray(o1[1]) + np.asarray(o2[1])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            o1 = jfn(table, idx[:half])
            o2 = jfn(table, idx[half:])
            _ = np.asarray(o1[1]) + np.asarray(o2[1])
            ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    per = dt / reps / B * 1e9
    print(f"{label:14s}: {dt*1e3:7.1f} ms total, {per:6.2f} ns/lane/round",
          flush=True)
    return per


if __name__ == "__main__":
    # slope baseline: same shapes at low reps to subtract launch floor
    lo = {}
    hi = {}
    for splits, label in ((1, "whole"), (2, "halves_1p"), (4, "quarters_1p")):
        lo[label] = run(splits, 2, f"{label} r2")
        hi[label] = run(splits, REPS, f"{label} r{REPS}")
        slope = (hi[label] * REPS - lo[label] * 2) / (REPS - 2)
        print(f"  -> {label} in-program slope {slope:.2f} ns/lane/round",
              flush=True)
    run(1, REPS, "halves_2prog", programs=2)
