"""Count compiled-program dispatches per steady frame (CPU).

Over the axon tunnel a dispatch enqueue costs 0.03-0.13 ms (docs/PERF.md)
— at hundreds of dispatches per frame that's a real slice of the frame
budget even with zero blocking syncs. This probe wraps jax.jit with a
counting shim BEFORE the engine imports, renders the bench scene until
the plans settle, then prints per-callsite call counts for one steady
frame, sorted by count. Platform-independent (counts, not times).
"""

import os
import sys
from collections import Counter

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_counts: Counter = Counter()
_enabled = [False]
_real_jit = jax.jit


def _counting_jit(fun=None, **kw):
    if fun is None:
        return lambda f: _counting_jit(f, **kw)
    code = getattr(fun, "__code__", None)
    where = (f"{os.path.basename(code.co_filename)}:{code.co_firstlineno}:"
             f"{fun.__name__}" if code else repr(fun))
    compiled = _real_jit(fun, **kw)

    def wrapper(*a, **k):
        if _enabled[0]:
            _counts[where] += 1
        return compiled(*a, **k)

    for attr in ("lower", "trace", "eval_shape"):
        if hasattr(compiled, attr):
            setattr(wrapper, attr, getattr(compiled, attr))
    return wrapper


jax.jit = _counting_jit

import numpy as np  # noqa: E402

import bench as benchmod  # noqa: E402
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402

W = int(os.environ.get("CENSUS_W", "960"))
H = int(os.environ.get("CENSUS_H", "540"))


def main():
    world_svo, chunks, hf = benchmod.build_world()
    svo = Svo(new_registry(), capacity_mb=64)
    svo.update(world_svo)
    svo.set_heightfield(hf)
    fwd = np.array([0.55, -0.35, 0.76], np.float32)
    fwd /= np.linalg.norm(fwd)
    base = RenderParams(
        cam_pos=np.array([16.0, 95.0, -20.0], np.float32),
        cam_fwd=fwd,
        aspect_ratio=W / H,
        fov_y_rad=np.radians(80.0),
        render_shadows=True,
        shadow_distance=300.0,
    )
    for i in (0, 1, 2, 0, 1):  # settle plans
        p = RenderParams(**{**base.__dict__})
        p.cam_pos = base.cam_pos + np.array([2.0 * i, 0, 1.5 * i], np.float32)
        np.asarray(svo.render(p, W, H))
        print(f"# warm frame {i} done", file=sys.stderr, flush=True)

    _enabled[0] = True
    p = RenderParams(**{**base.__dict__})
    p.cam_pos = base.cam_pos + np.array([4.0, 0, 3.0], np.float32)
    np.asarray(svo.render(p, W, H))
    _enabled[0] = False

    total = sum(_counts.values())
    print(f"{'calls':>6s}  callsite")
    for where, n in _counts.most_common():
        print(f"{n:6d}  {where}")
    print(f"\nTOTAL jitted dispatches in one steady frame: {total}")
    print("(~{:.1f}-{:.1f} ms enqueue cost at 0.03-0.13 ms each)".format(
        total * 0.03, total * 0.13))


if __name__ == "__main__":
    main()
