"""Stage budget of the CURRENT production path via scan-of-N prefixes.

``python tools/bench/stage_budget.py [world]`` — default is the bench
scene (1024 cubes / 196k tris); ``world`` budgets the archive-world
scene instead (280 buildings / 240k tris / 293 materials / skinned
characters, 80% coverage)."""
import functools
import sys
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

if "world" in sys.argv[1:]:
    from mt_renderer_tpu.scene import world as world_mod

    ws = world_mod.build_world(buildings=280,
                               building_subdivs=(4, 6, 8, 10, 12))
    batch = ws.batch
    scene = device.upload(batch)
    anim = ws.animator()
    bones_h = ws.bone_palette(anim.bone_mats(np.float32(0.5)))
    vl = []
    for i in range(N):
        cam = world_mod.world_camera(W, H, buildings=280)
        cam.yaw += 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
else:
    batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
    scene = device.upload(batch)
    bones_h = demo.demo_bone_mats(0.3)
    vl = []
    for i in range(N):
        cam = demo.demo_camera(1024, W, H)
        cam.yaw = 15.0 + 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(vl))
bones = jnp.asarray(bones_h)
maxc = device.auto_maxc(batch, vl[0], bones_h,
                        width=W, height=H)
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc}", flush=True)


def chk(x):
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


def prefix(scene, vp, bones, stage):
    clip = device.vertex_stage(scene, vp, bones)
    if stage == "vertex":
        return chk(clip)
    cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
    if stage == "setup":
        return chk(cols)
    pre = pr.prebin((cols, bbox), None, 0, 0, width=PW, height=PH,
                    maxc=maxc)
    if stage == "bin":
        return chk(cols) + chk(pre[1]) + chk(pre[3])
    zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
        (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
        interpret=interp, n_attr=n_attr, tap=True, w_eps=device.W_EPS,
        pre=pre, flat=True)
    if stage == "raster":
        return chk(zb) + chk(tapidx)
    colort, cov, _ = device.shade_finish_tap_flat(
        scene, tattrs, tapidx, ib, (255, 255, 255, 255))
    if stage == "shade":
        return chk(colort)
    color = pr.unflatten_tiles(colort, PH, PW)[:H, :W]
    zbf = pr.unflatten_tiles(zb[:, 0, :], PH, PW)[:H, :W]
    return chk(color) + chk(zbf)


STAGES = ["vertex", "setup", "bin", "raster", "shade", "full"]


@functools.partial(jax.jit, static_argnames=("stage",))
def run_n(scene, vps, bones, stage):
    def step(carry, vp):
        return carry + prefix(scene, vp, bones, stage), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("stage",))
def run_1(scene, vp, bones, stage):
    return prefix(scene, vp, bones, stage)


_ = int(jnp.zeros((), jnp.int32))
for s in STAGES:
    t0 = time.perf_counter()
    float(run_1(scene, vps[0], bones, s))
    jax.block_until_ready(run_n(scene, vps, bones, s))
    print(f"compiled {s} in {time.perf_counter()-t0:.1f}s", flush=True)


def timed(fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    return time.perf_counter() - t0

per = {s: [] for s in STAGES}
for rep in range(5):
    for s in STAGES:
        tn = timed(lambda: run_n(scene, vps, bones, s))
        t1 = timed(lambda: run_1(scene, vps[0], bones, s))
        per[s].append((tn - t1) / (N - 1) * 1e3)
prev = 0.0
for s in STAGES:
    v = sorted(per[s])[len(per[s]) // 2]
    print(f"{s:8s} cum={v:7.2f}ms delta={v-prev:7.2f}ms", flush=True)
    prev = v
