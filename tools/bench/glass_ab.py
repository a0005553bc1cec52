"""Stage attribution for the GLASS workload (mixed opaque/translucent
OIT): where do the 25 ms go? Round-robin scan-of-N over cumulative
prefixes of the split engine on the glass scene (1024 instances,
camera in-field, 1/4 translucent, L=4).

Run on the real chip: PYTHONPATH=. python tools/bench/glass_ab.py
"""
import functools
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
L = 4

batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
demo.make_translucent(batch, 1024)
scene = device.upload(batch)
vl = []
for i in range(N):
    cam = demo.demo_camera(1024, W, H)
    cam.position = cam.position * 0.3
    cam.yaw = 15.0 + 3.0 * i
    vl.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(vl))
bones = jnp.asarray(demo.demo_bone_mats(0.3))
maxc = device.auto_maxc(batch, vl[0], demo.demo_bone_mats(0.0),
                        width=W, height=H)
caps = device.measure_live_tap_tiles(
    scene, vl[0], bones, width=W, height=H, layers=L, maxc=maxc,
    mode="split")
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc} caps={caps} interp={interp}", flush=True)


def chk(x):
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


def prefix(scene, vp, stage):
    clip = device.vertex_stage(scene, vp, bones)
    (co, bo), (ct, bt), n_attr = device.setup_packed_cols(
        scene, clip, W, H, opacity_split=True)
    kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
              n_attr=n_attr, tap=True, w_eps=device.W_EPS, flat=True)
    zo, io, tat_op, tid_op, _ = pr.raster_pallas_fwd(
        (co, bo), None, 0, 0, **kw)
    if stage == "op-raster":
        return chk(zo) + chk(tat_op[::7, :, ::31])
    zo_eff = jnp.where(io >= 0, zo, jnp.float32(jnp.inf))
    zt, it, tat_tr, tid_tr, _ = pr.raster_pallas_fwd_ml(
        (ct, bt), None, 0, 0, layers=L, variant="nocull", zhi=zo_eff,
        **kw)
    if stage == "tr-raster":
        return (chk(zo) + chk(zt[::7, :, ::31])
                + chk(tat_tr[::7, :, ::31]))
    src_op, cov_op, _ = device.shade_tap_flat_channels(
        scene, tat_op, tid_op, io, tap_tiles=caps[0])
    if stage == "op-shade":
        return sum(chk(s[::7, ::31]) for s in src_op) + chk(zt[::7, :, ::31])
    dst0 = device._blend_channels(src_op, cov_op, (255, 255, 255, 255))
    front = (zt < zo_eff) | ((zt == zo_eff) & (it > io))
    cov_tr = (it >= 0) & front
    dst, _ = device.composite_peeled_tap_flat(
        scene, tat_tr, tid_tr, it, L, (255, 255, 255, 255),
        tap_tiles=caps[1], covered=cov_tr, dst0=dst0)
    if stage == "merge":
        return sum(chk(d[::7, ::31]) for d in dst)
    color = pr.unflatten_tiles(device.pack_u32_channels(dst), PH, PW)
    return chk(color[:H, :W])


STAGES = ["op-raster", "tr-raster", "op-shade", "merge", "full"]


@functools.partial(jax.jit, static_argnames=("stage",))
def run_n(scene, vps, stage):
    def step(c, vp):
        return c + prefix(scene, vp, stage).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("stage",))
def run_1(scene, vp, stage):
    return prefix(scene, vp, stage).astype(jnp.float32)


_ = int(jnp.zeros((), jnp.int32))
for s in STAGES:
    t0 = time.perf_counter()
    float(run_1(scene, vps[0], s))
    jax.block_until_ready(run_n(scene, vps, s))
    print(f"compiled {s} {time.perf_counter()-t0:.1f}s", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {s: [] for s in STAGES}
for rep in range(5):
    for s in STAGES:
        tn = timed(run_n, scene, vps, s)
        t1 = timed(run_1, scene, vps[0], s)
        res[s].append((tn - t1) / (N - 1) * 1e3)
        print(f"rep{rep} {s:10s}: {res[s][-1]:7.2f}ms", flush=True)
prev = 0.0
print("\n=== medians (cumulative) ===", flush=True)
for s in STAGES:
    v = sorted(res[s])[2]
    print(f"{s:10s} cum={v:7.2f}ms delta={v-prev:7.2f}ms", flush=True)
    prev = v
