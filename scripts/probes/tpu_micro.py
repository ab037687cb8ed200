"""Microbenchmarks isolating TPU traversal cost components."""

import time

import numpy as np

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)
B = 1 << 20


def timeit(name, fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# 0) round-trip overhead
x = jnp.ones(8, jnp.float32)
f0 = jax.jit(lambda x: x + 1)
timeit("tiny dispatch round-trip", f0, x)

# 1) gather throughput
for table_words in (1 << 14, 1 << 20, 1 << 24):
    table = jnp.arange(table_words, dtype=jnp.uint32)
    idx = jnp.asarray(np.random.randint(0, table_words, B), jnp.int32)
    g = jax.jit(lambda t, i: t[i])
    dt = timeit(f"gather {B} from {table_words*4//1024}KB", g, table, idx)
    print(f"   -> {B/dt/1e9:.2f} G gathers/s", flush=True)

# 2) stack scatter (the traversal's per-iteration pattern)
stack = jnp.zeros((B, 24), jnp.float32)
sc = jnp.asarray(np.random.randint(0, 24, B), jnp.int32)
vals = jnp.ones(B, jnp.float32)
lane = jnp.arange(B)
scatter = jax.jit(lambda s, i, v: s.at[lane, i].set(v))
dt = timeit("scatter (B,24) at[lane,i]", scatter, stack, sc, vals)

onehot = jax.jit(
    lambda s, i, v: jnp.where(
        i[:, None] == jnp.arange(24)[None, :], v[:, None], s
    )
)
dt = timeit("one-hot select update (B,24)", onehot, stack, sc, vals)

gather_minor = jax.jit(lambda s, i: jnp.take_along_axis(s, i[:, None], axis=1)[:, 0])
timeit("gather along minor (B,24)", gather_minor, stack, sc)

onehot_read = jax.jit(
    lambda s, i: (s * (i[:, None] == jnp.arange(24)[None, :])).sum(axis=1)
)
timeit("one-hot read (B,24)", onehot_read, stack, sc)

# 3) while_loop carrying B-sized state, 100 iterations of cheap work
def loop(x):
    def body(s):
        i, a, b = s
        return i + 1, a + b, b * 0.999
    def cond(s):
        return s[0] < 100
    return jax.lax.while_loop(cond, body, (0, x, x + 1))[1]

xb = jnp.ones(B, jnp.float32)
dt = timeit("while_loop 100 iters, 2x(B,) state", jax.jit(loop), xb)
print(f"   -> {dt/100*1e6:.0f} us/iter", flush=True)

# 4) host->device and device->host transfer of a 1080p image
img = jnp.ones((1080, 1920, 4), jnp.float32)
t0 = time.time()
_ = np.asarray(img)
print(f"device->host 33MB: {(time.time()-t0)*1e3:.0f} ms", flush=True)
