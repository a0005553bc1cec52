"""Price the ML kernel's pass 2 (coefficient recovery by global-id
match) on the GLASS workload — the number that decides whether the
gather-based recovery the r3 verdict proposed can win.

The gather law (2.1 ns/row, gather_shapes.py) prices an XLA-side
recovery: per live (pixel, layer), fetch the winner's packed
coefficient row from a per-triangle table by kept id. That replaces
pass 2 (the re-DMA sweep + full-width one-hot MXU selects) and nothing
else. So the decision is: pass2_cost  vs  live_pixel_layers * 2.1 ns
+ table build + plane eval.

Rungs (round-robin scan-of-N medians, same-process):
  trml/full      opaque raster + translucent ML kernel, default pass 2
  trml/nopass2   same, pass 2 skipped (ids/z only; attrs are zeros)
plus the live (pixel, layer) census the law needs.

Run on the real chip: PYTHONPATH=. python tools/bench/pass2_ab.py
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
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc} interp={interp}", flush=True)


def chk(x):
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


def prefix(scene, vp, variant):
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
    # serialize through zt/it only — the attrs are zeros under nopass2
    return chk(zo) + chk(zt[::7, :, ::31]) + chk(it[::7, :, ::31])


CFGS = {
    "trml/full": "nocull",
    "trml/nopass2": "nocull-nopass2",
}


@functools.partial(jax.jit, static_argnames=("name",))
def run_n(scene, vps, name):
    def step(c, vp):
        return c + prefix(scene, vp, CFGS[name]).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("name",))
def run_1(scene, vp, name):
    return prefix(scene, vp, CFGS[name]).astype(jnp.float32)


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST

# --- live (pixel, layer) census at view 0: what the gather law prices
clip = device.vertex_stage(scene, vps[0], bones)
(co, bo), (ct, bt), n_attr = device.setup_packed_cols(
    scene, clip, W, H, opacity_split=True)
kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
          n_attr=n_attr, tap=True, w_eps=device.W_EPS, flat=True)
zo, io, _, _, _ = pr.raster_pallas_fwd((co, bo), None, 0, 0, **kw)
zo_eff = jnp.where(io >= 0, zo, jnp.float32(jnp.inf))
zt, it, _, _, _ = pr.raster_pallas_fwd_ml(
    (ct, bt), None, 0, 0, layers=L, variant="nocull", zhi=zo_eff, **kw)
live_pl = int(jnp.sum(it >= 0))
n_coef = pr._N_COEF[n_attr]
print(f"live (pixel, layer) rows at view 0: {live_pl} "
      f"(gather-law price {live_pl * 2.1e-6:.2f} ms; n_coef={n_coef}, "
      f"table {n_coef * 4} B/row)", flush=True)

vals = {}
for name in CFGS:
    t0 = time.perf_counter()
    v1 = float(run_1(scene, vps[0], name))
    t1 = time.perf_counter()
    vn = float(run_n(scene, vps, name))
    vals[name] = (v1, vn)
    print(f"compile {name}: single {t1 - t0:.1f}s scan "
          f"{time.perf_counter() - t1:.1f}s ({v1:.0f}/{vn:.0f})",
          flush=True)
assert vals["trml/full"] == vals["trml/nopass2"], vals  # z/id identical


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {n: [] for n in CFGS}
for rep in range(6):
    for name in CFGS:
        tn = timed(run_n, scene, vps, name)
        t1 = timed(run_1, scene, vps[0], name)
        per = (tn - t1) / (N - 1) * 1e3
        res[name].append(per)
        print(f"rep{rep} {name:14s}: per-frame={per:7.2f}ms", flush=True)

print("\n=== medians ===", flush=True)
med = {}
for name in CFGS:
    med[name] = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:14s}: {med[name]:7.2f} ms", flush=True)
p2 = med["trml/full"] - med["trml/nopass2"]
print(f"pass 2 costs {p2:.2f} ms vs gather-law recovery "
      f"{live_pl * 2.1e-6:.2f} ms (+ table build + plane eval)",
      flush=True)
