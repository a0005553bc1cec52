"""Finer stage attribution INSIDE the glass merge (ROUND3 gap #2):
glass_ab measured the whole merge (compacted taps + expand + dense
L-blend) at 7.9 ms — this splits it so we know whether a tile-level
compacted BLEND is worth building. Cumulative prefixes:

  base     dst0 + cov_tr (everything before composite_peeled_tap_flat)
  gather   + the compacted pool gather (albc at cap rows)
  expand   + the per-(tile, layer) row expand back to (nt, L, P)
  blend    + the dense back-to-front L-blend (= full merge)

Run on the real chip: PYTHONPATH=. python tools/bench/glass_merge_ab.py
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
    zo_eff = jnp.where(io >= 0, zo, jnp.float32(jnp.inf))
    zt, it, tat_tr, tid_tr, _ = pr.raster_pallas_fwd_ml(
        (ct, bt), None, 0, 0, layers=L, variant="nocull", zhi=zo_eff,
        **kw)
    src_op, cov_op, _ = device.shade_tap_flat_channels(
        scene, tat_op, tid_op, io, tap_tiles=caps[0])
    dst0 = device._blend_channels(src_op, cov_op, (255, 255, 255, 255))
    front = (zt < zo_eff) | ((zt == zo_eff) & (it > io))
    cov_tr = (it >= 0) & front
    if stage == "base":
        return (sum(chk(d[::7, ::31]) for d in dst0)
                + chk(cov_tr[::7, :, ::31]))

    # composite_peeled_tap_flat internals, staged
    nt, _, p = tid_tr.shape
    a4 = tat_tr.reshape(nt, L, 6, p)
    n = nt * L
    cap = min(caps[1], n)
    live = jnp.any(cov_tr, axis=2).reshape(n)
    sr, slot, _ = device._compact_live_rows(live, cap)
    tic = tid_tr.reshape(n, p)[sr]
    fxc = a4[:, :, 0].reshape(n, p)[sr]
    fyc = a4[:, :, 1].reshape(n, p)[sr]
    if stage == "gatherraw":
        # the pinned pool gather ALONE (no 2x2 contraction): splits
        # _tap_albedo_channels' 5.6 ms into gather vs contract
        quad = jax.lax.optimization_barrier(
            scene.mip_pool[jnp.maximum(tic, 0)])
        return (chk(quad[:, ::31]) + sum(chk(d[::7, ::31]) for d in dst0)
                + chk(fxc[:, ::31]) + chk(fyc[:, ::31]))
    albc = device._tap_albedo_channels(scene.mip_pool, tic, fxc, fyc)
    if stage == "gather":
        return (sum(chk(a[:, ::31]) for a in albc)
                + sum(chk(d[::7, ::31]) for d in dst0))
    slot2 = slot.reshape(nt, L)
    alb = [jnp.concatenate(
        [a, jnp.zeros((1, p), jnp.float32)])[slot2] for a in albc]
    if stage == "expand":
        return (sum(chk(a[::7, :, ::31]) for a in alb)
                + sum(chk(d[::7, ::31]) for d in dst0))
    textured = tid_tr >= 0
    dst = list(dst0)
    for l in reversed(range(L)):
        src = [jnp.where(textured[:, l], alb[c][:, l] * a4[:, l, 2 + c],
                         a4[:, l, 2 + c]) for c in range(4)]
        a = src[3] / 255.0
        cov = cov_tr[:, l]
        dst = ([jnp.where(cov, src[c] * a + dst[c] * (1.0 - a), dst[c])
                for c in range(3)]
               + [jnp.where(cov, src[3], dst[3])])
    color = pr.unflatten_tiles(device.pack_u32_channels(dst), PH, PW)
    return chk(color[:H, :W])


STAGES = ["base", "gatherraw", "gather", "expand", "blend"]


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
        print(f"rep{rep} {s:7s}: {res[s][-1]:7.2f}ms", flush=True)
prev = 0.0
print("\n=== medians (cumulative) ===", flush=True)
for s in STAGES:
    v = sorted(res[s])[2]
    print(f"{s:7s} cum={v:7.2f}ms delta={v-prev:7.2f}ms", flush=True)
    prev = v
