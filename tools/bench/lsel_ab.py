"""A/B the pass-2 "lsel" decomposition (per-layer gated coefficient
selects into separate scratches — pallas_raster._raster_fwd_ml_kernel)
against the default concatenated (K, L*P) select, on the GLASS workload
(1024 instances, camera in-field, 1/4 translucent, L=4).

Two rungs, round-robin scan-of-N medians:
  tr-raster/{full,lsel}  opaque raster + translucent ML kernel only
  pipe/{full,lsel}       the whole split-engine frame (compacted caps)

Run on the real chip: PYTHONPATH=. python tools/bench/lsel_ab.py
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


def prefix(scene, vp, stage, variant):
    clip = device.vertex_stage(scene, vp, bones)
    (co, bo), (ct, bt), n_attr = device.setup_packed_cols(
        scene, clip, W, H, opacity_split=True)
    kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
              n_attr=n_attr, tap=True, w_eps=device.W_EPS, flat=True)
    zo, io, tat_op, tid_op, _ = pr.raster_pallas_fwd(
        (co, bo), None, 0, 0, **kw)
    zo_eff = jnp.where(io >= 0, zo, jnp.float32(jnp.inf))
    zt, it, tat_tr, tid_tr, _ = pr.raster_pallas_fwd_ml(
        (ct, bt), None, 0, 0, layers=L, variant=variant, zhi=zo_eff,
        **kw)
    if stage == "tr-raster":
        return (chk(zo) + chk(zt[::7, :, ::31])
                + chk(tat_tr[::7, :, ::31]))
    src_op, cov_op, _ = device.shade_tap_flat_channels(
        scene, tat_op, tid_op, io, tap_tiles=caps[0])
    dst0 = device._blend_channels(src_op, cov_op, (255, 255, 255, 255))
    front = (zt < zo_eff) | ((zt == zo_eff) & (it > io))
    cov_tr = (it >= 0) & front
    dst, _ = device.composite_peeled_tap_flat(
        scene, tat_tr, tid_tr, it, L, (255, 255, 255, 255),
        tap_tiles=caps[1], covered=cov_tr, dst0=dst0)
    color = pr.unflatten_tiles(device.pack_u32_channels(dst), PH, PW)
    return chk(color[:H, :W])


CFGS = {
    "tr-raster/full": ("tr-raster", "nocull"),
    "tr-raster/lsel": ("tr-raster", "nocull-lsel"),
    "tr-raster/l2sel": ("tr-raster", "nocull-l2sel"),
    "pipe/full": ("full", "nocull"),
    "pipe/lsel": ("full", "nocull-lsel"),
    "pipe/l2sel": ("full", "nocull-l2sel"),
}


@functools.partial(jax.jit, static_argnames=("name",))
def run_n(scene, vps, name):
    stage, variant = CFGS[name]

    def step(c, vp):
        return c + prefix(scene, vp, stage, variant).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("name",))
def run_1(scene, vp, name):
    stage, variant = CFGS[name]
    return prefix(scene, vp, stage, variant).astype(jnp.float32)


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST
names = list(CFGS)
vals = {}
for name in names:
    t0 = time.perf_counter()
    try:
        v1 = float(run_1(scene, vps[0], name))
        t1 = time.perf_counter()
        vn = float(run_n(scene, vps, name))
    except Exception as e:   # Mosaic compile crash: drop the config
        print(f"compile {name}: FAILED "
              f"({type(e).__name__}: {str(e)[:160]})", flush=True)
        continue
    vals[name] = (v1, vn)
    print(f"compile {name}: single {t1-t0:.1f}s scan "
          f"{time.perf_counter()-t1:.1f}s ({v1:.0f}/{vn:.0f})", flush=True)

names = list(vals)
# checksum identity: every surviving variant must reproduce full
for stage in ("tr-raster", "pipe"):
    for v in ("lsel", "l2sel"):
        if f"{stage}/{v}" in vals:
            a, b = vals[f"{stage}/full"], vals[f"{stage}/{v}"]
            assert a == b, (stage, v, a, b)
print(f"checksums OK across {names}", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {n: [] for n in names}
for rep in range(6):
    for name in names:
        tn = timed(run_n, scene, vps, name)
        t1 = timed(run_1, scene, vps[0], name)
        per = (tn - t1) / (N - 1) * 1e3
        res[name].append(per)
        print(f"rep{rep} {name:15s}: per-frame={per:7.2f}ms", flush=True)

print("\n=== medians ===", flush=True)
for name in names:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:15s}: {m:7.2f} ms", flush=True)
