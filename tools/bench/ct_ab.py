"""Dense vs compacted-tap A/B after the SEG_PX granularity change.

The r3-cont. bench-table capture moved some compacted rows vs the
pre-SEG_PX README table (peel4 14.6->16.0 ms, peel4+mip+light
25.1->29.1, dense-preset 10.0->11.4) while others held (default,
glass, world) — device drift or a real compaction regression? Table
captures are cross-RUN comparisons (forbidden by the measurement
notes); this script answers properly: same-process round-robin
scan-of-N over {caps, dense} per workload.

Run on the real chip: PYTHONPATH=. python tools/bench/ct_ab.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
N = 8
L = 4

batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
scene = device.upload(batch)


def vps_for(cam_scale):
    vl = []
    for i in range(N):
        cam = demo.demo_camera(1024, W, H)
        cam.position = cam.position * cam_scale
        cam.yaw = 15.0 + 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
    return vl


VPS_FULL = vps_for(1.0)
VPS_DENSE = vps_for(0.3)
bones = jnp.asarray(demo.demo_bone_mats(0.3))
b0 = demo.demo_bone_mats(0.0)
maxc_full = device.auto_maxc(batch, VPS_FULL[0], b0, width=W, height=H)
maxc_dense = device.auto_maxc(batch, VPS_DENSE[0], b0, width=W, height=H)
interp = jax.default_backend() != "tpu"

CAPS_SP = device.measure_live_tap_tiles(
    scene, VPS_FULL[0], bones, width=W, height=H, layers=L,
    maxc=maxc_full, mode="split")
CAPS_SPL = device.measure_live_tap_tiles(
    scene, VPS_FULL[0], bones, width=W, height=H, layers=L,
    maxc=maxc_full, lighting=True, mode="split")
TT_FULL = device.auto_tap_tiles(batch, VPS_FULL[0], b0, width=W, height=H)
TT_DENSE = device.auto_tap_tiles(batch, VPS_DENSE[0], b0, width=W, height=H)
print(f"maxc={maxc_full}/{maxc_dense} caps_sp={CAPS_SP} "
      f"caps_spl={CAPS_SPL} tt={TT_FULL}/{TT_DENSE} interp={interp}",
      flush=True)


def chk(c, d):
    f = c.reshape(-1)
    s = f[:: max(f.size // 512, 1)]
    return jnp.sum(s.astype(jnp.float32)) + jnp.sum(d[::97, ::97])


def sl(scene, vp, maxc, tt):
    c, d, _ = device._render_frame_core(
        scene, vp, bones, width=W, height=H, backend="pallas",
        maxc=maxc, packed=True, tap_tiles=tt)
    return chk(c, d)


def sp(scene, vp, tt, mipmap):
    c, d, _ = device._render_frame_peeled_core(
        scene, vp, bones, width=W, height=H, layers=L,
        backend="pallas", maxc=maxc_full, peel_mode="split",
        mipmap=mipmap, lighting=mipmap, packed=not mipmap,
        tap_tiles=tt)
    return chk(c, d)


CFGS = {
    "sl/ct": lambda s, v: sl(s, v, maxc_full, TT_FULL),
    "sl/dense": lambda s, v: sl(s, v, maxc_full, None),
    "dn/ct": lambda s, v: sl(s, v, maxc_dense, TT_DENSE),
    "dn/dense": lambda s, v: sl(s, v, maxc_dense, None),
    "sp/ct": lambda s, v: sp(s, v, CAPS_SP, False),
    "sp/dense": lambda s, v: sp(s, v, None, False),
    "spml/ct": lambda s, v: sp(s, v, CAPS_SPL, True),
    "spml/dense": lambda s, v: sp(s, v, None, True),
}
VPS = {n: (VPS_DENSE if n.startswith("dn") else VPS_FULL) for n in CFGS}


@functools.partial(jax.jit, static_argnames=("name",))
def run_n(scene, vps, name):
    def step(c, vp):
        return c + CFGS[name](scene, vp).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("name",))
def run_1(scene, vp, name):
    return CFGS[name](scene, vp).astype(jnp.float32)


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST
names = list(CFGS)
vals = {}
for name in names:
    vps = jnp.asarray(np.stack(VPS[name]))
    t0 = time.perf_counter()
    v1 = float(run_1(scene, vps[0], name))
    t1 = time.perf_counter()
    vn = float(run_n(scene, vps, name))
    vals[name] = (v1, vn)
    print(f"compile {name}: single {t1-t0:.1f}s scan "
          f"{time.perf_counter()-t1:.1f}s ({v1:.0f}/{vn:.0f})", flush=True)

# ct must be pixel-identical to dense (checksum) per workload
for a, b in (("sl/ct", "sl/dense"), ("dn/ct", "dn/dense"),
             ("sp/ct", "sp/dense"), ("spml/ct", "spml/dense")):
    assert vals[a] == vals[b], (a, b, vals[a], vals[b])
print("checksums: ct == dense on all four workloads", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {n: [] for n in names}
for rep in range(6):
    for name in names:
        vps = jnp.asarray(np.stack(VPS[name]))
        tn = timed(run_n, scene, vps, name)
        t1 = timed(run_1, scene, vps[0], name)
        per = (tn - t1) / (N - 1) * 1e3
        res[name].append(per)
        print(f"rep{rep} {name:10s}: per-frame={per:7.2f}ms", flush=True)

print("\n=== medians ===", flush=True)
for name in names:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:10s}: {m:7.2f} ms", flush=True)
