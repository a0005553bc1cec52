"""Per-frame device time via an in-program scan over N frames:
one dispatch carries N full pipeline iterations (different cameras), so
tunnel RTT amortizes N-fold and probe-differencing errors shrink ~N-fold.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
PW = -(-W // pr.TILE_W) * pr.TILE_W
PH = -(-H // pr.TILE_H) * pr.TILE_H
N = 8

batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
scene = device.upload(batch)
cams = []
for i in range(N):
    cam = demo.demo_camera(1024, W, H)
    cam.yaw = 15.0 + 3.0 * i
    cams.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(cams))                  # (N, 4, 4)
bones = jnp.asarray(demo.demo_bone_mats(0.3))
maxc = device.auto_maxc(batch, cams[0], demo.demo_bone_mats(0.0),
                        width=W, height=H)
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc}", flush=True)


import functools


def one_frame(scene, vp, bones, tap):
    clip = device.vertex_stage(scene, vp, bones)
    cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
    if tap:
        zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
            interpret=interp, n_attr=n_attr, tap=True,
            w_eps=device.W_EPS)
        src, covered = device.shade_tap(scene, tattrs, tapidx, ib)
    else:
        zb, ib, attrs, n_over = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
            interpret=interp, n_attr=n_attr)
        src, covered = device.shade_fwd(scene, attrs, ib)
    color = device.finish_planes(src, covered, (255, 255, 255, 255), PH, PW)
    return color[:H, :W]


@functools.partial(jax.jit, static_argnames=("tap",))
def run_n(scene, vps, bones, tap):
    def step(carry, vp):
        c = one_frame(scene, vp, bones, tap)
        # fold each frame into a tiny checksum so nothing is DCE'd and
        # the carry chain serializes the frames
        return carry + jnp.sum(c[::64, ::64].astype(jnp.int32)), None

    total, _ = jax.lax.scan(step, jnp.int32(0), vps)
    return total


@functools.partial(jax.jit, static_argnames=("tap",))
def run_1(scene, vp, bones, tap):
    c = one_frame(scene, vp, bones, tap)
    return jnp.sum(c[::64, ::64].astype(jnp.int32))


_ = int(jnp.zeros((), jnp.int32))  # sync flip FIRST
for tap in (False, True):
    t0 = time.perf_counter()
    print(f"tap={tap} single:", int(run_1(scene, vps[0], bones, tap)),
          f"in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    print(f"tap={tap} scan:", int(run_n(scene, vps, bones, tap)),
          f"in {time.perf_counter()-t0:.1f}s", flush=True)


def timed(fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return time.perf_counter() - t0

for rep in range(6):
    for tap in (False, True):
        tn = timed(lambda: run_n(scene, vps, bones, tap))
        t1 = timed(lambda: run_1(scene, vps[0], bones, tap))
        per = (tn - t1) / (N - 1) * 1e3
        print(f"rep{rep} tap={int(tap)}: scan{N}={tn*1e3:7.2f}ms "
              f"single={t1*1e3:7.2f}ms -> per-frame={per:6.2f}ms",
              flush=True)
