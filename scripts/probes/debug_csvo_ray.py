"""Trace ONE disagreeing ray through the fetch-on-PUSH CSVO engine,
asserting register values against fresh _Readers reads at every substep."""
import jax as _jax
_jax.config.update("jax_platforms", "cpu")
_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax
import jax.numpy as jnp

from voxelrs_tpu.world.chunk import ChunkPos
from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk
from voxelrs_tpu.world.octree import Position
from voxelrs_tpu.gamelogic.content import new_registry
from voxelrs_tpu.graphics.svo import RenderParams, Svo
from voxelrs_tpu.graphics.camera import Camera
from voxelrs_tpu.ops.shading import generate_rays
from voxelrs_tpu.ops import traversal_csvo as tc
from voxelrs_tpu.ops.traversal import make_ray_consts

vox = np.zeros((32, 32, 32), np.uint32)
vox[:, :8, :] = 3
vox[:, 8, :] = 1
vox[10:14, 9:12, 10:14] = 12

params = RenderParams(
    cam_pos=np.array([2.0, 20.0, -4.0], np.float32),
    cam_fwd=np.array([0.5, -0.5, 0.7], np.float32) / np.linalg.norm([0.5, -0.5, 0.7]),
    aspect_ratio=4 / 3,
    render_shadows=False,
)

csvo_world = Csvo()
csvo_world.set_leaf(Position(0, 0, 0), CsvoSerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
csvo_world.serialize()
svo_c = Svo(new_registry(), capacity_mb=4, buffer_dtype=np.uint8)
svo_c.update(csvo_world)

cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01, 1024)
cam.position = np.asarray(params.cam_pos, np.float32)
cam.forward = np.asarray(params.cam_fwd, np.float32)
cam.up = np.asarray(params.cam_up, np.float32)
s, u, f = cam.camera_basis()
W, H = 96, 72
ro_all, rd_all = generate_rays(W, H, jnp.asarray(cam.position), jnp.asarray(s),
                               jnp.asarray(u), jnp.asarray(f),
                               jnp.float32(params.fov_y_rad),
                               jnp.float32(params.aspect_ratio))
pix = 21 * W + 44
ro = np.asarray(ro_all)[pix:pix+1]
rd = np.asarray(rd_all)[pix:pix+1]
print("ray ro", ro, "rd", rd)

words = svo_c.device_buf
root_ptr = jnp.uint32(svo_c.root_ptr)
depth = int(svo_c.depth)
scale = jnp.float32(svo_c.octree_scale)
print("root_ptr", int(root_ptr), "depth", depth, "scale", float(scale))

# ---- ground truth: interpretive loop (translucent path, alpha==1) ----
res_gt = tc.intersect_octree_csvo(
    words, scale, root_ptr, depth, jnp.asarray(ro), jnp.asarray(rd),
    jnp.float32(-1.0), True, alpha_fn=lambda v, fc, uv, l: jnp.ones(v.shape[0], jnp.float32),
    max_steps=300)
print("GT: t", float(res_gt.t[0]), "value", int(res_gt.value[0]),
      "face", int(res_gt.face_id[0]))

# ---- new engine, python-stepped with assertions ----
R = tc._Readers(words)
c = make_ray_consts(scale, jnp.asarray(ro), jnp.asarray(rd), jnp.float32(-1.0))
st = tc.init_state_csvo(c, root_ptr, depth)
table = tc.make_overlap_rows(words)

def g(x):
    return np.asarray(x)[0]

for it in range(80):
    if not bool(st.active[0]):
        break
    st = tc.fetch_phase_csvo(table, st)
    # register ground truth check
    ptr = int(g(st.pp) & int(tc.PTR_MASK))
    hdr_gt = int(np.asarray(R.read_u16(jnp.uint32([ptr])))[0])
    hdr_reg = int(g(st.hdr))
    ok = "OK " if hdr_gt == hdr_reg else "BAD"
    dep = int(g(st.pp)) >> tc.DEPTH_SHIFT
    print(f"it{it:3d} FETCH ptr={ptr} depth={dep} hdr reg={hdr_reg:04x} "
          f"gt={hdr_gt:04x} {ok} crossing={bool(g(st.crossing))}")
    for sub in range(3):
        prev = st
        st = tc.substep_csvo(c, st)
        ptr_p = int(g(prev.pp) & int(tc.PTR_MASK))
        dep_p = int(g(prev.pp)) >> tc.DEPTH_SHIFT
        oct_idx = int(g(prev.idx)) ^ int(g(c.octant_mask))
        np_gt, crossed_gt = R.read_next_ptr(
            jnp.uint32([ptr_p]), jnp.int32([dep_p]), jnp.uint32([oct_idx]))
        print(f"   sub{sub} ptr={ptr_p} d={dep_p} oct={oct_idx} "
              f"scale={int(g(prev.scale))} t_min={float(g(prev.t_min)):.4f} "
              f"t_max={float(g(prev.t_max)):.4f} "
              f"gt_next={int(np.asarray(np_gt)[0]):#x} "
              f"crossed={bool(np.asarray(crossed_gt)[0])} "
              f"stall={bool(g(prev.need_fetch))} "
              f"-> hit={bool(g(st.hit))} act={bool(g(st.active))} "
              f"new_ptr={int(g(st.pp) & int(tc.PTR_MASK))} "
              f"new_d={int(g(st.pp)) >> tc.DEPTH_SHIFT} "
              f"nf={bool(g(st.need_fetch))}")
    if bool(st.hit[0]) and not bool(st.active[0]):
        break

res = tc.finalize_csvo(words, c, st, jnp.int32(0))
print("ENGINE: t", float(res.t[0]), "value", int(res.value[0]),
      "face", int(res.face_id[0]))
