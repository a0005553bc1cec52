"""KG culling-granularity A/B on the archive-world scene.

ROUND3 gap #1: the world raster kernel is ~11.8 ms of the 27.4 ms
trilinear frame — structural O(overlapping groups x pixels) work.
Host-side estimate says KG=16 cuts binned (group, tile) pairs ~22% but
doubles the kernel's unrolled branch count (G = CT//KG goes 12 -> 24).
This harness answers which effect wins, same-process (cross-run device
drift makes subprocess A/Bs garbage — CLAUDE.md):

- pr.KG / pr.G are MODULE GLOBALS read at trace time, so flipping them
  between building fresh jit closures retraces everything — as long as
  we call raster_pallas_fwd.__wrapped__ (the module-level jit would
  serve a stale KG=32 jaxpr from its trace cache for identical
  avals/statics).
- Variants must stay pixel-identical (culling granularity is perf-only)
  — asserted via the full-pipe checksum before timing.
- scan-of-N round-robin medians, the only trusted estimator.

Run on the real chip: PYTHONPATH=. python tools/bench/kg_ab.py
"""
import os
import time

import numpy as np
import jax

if os.environ.get("MTR_KG_AB_CPU"):          # smoke mode (tests/dev)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import world as world_mod

W = int(os.environ.get("MTR_KG_AB_W", 1920))
H = int(os.environ.get("MTR_KG_AB_H", 1080))
PW = -(-W // pr.TILE_W) * pr.TILE_W
PH = -(-H // pr.TILE_H) * pr.TILE_H
N = int(os.environ.get("MTR_KG_AB_N", 8))
BUILDINGS = int(os.environ.get("MTR_KG_AB_B", 280))

ws = world_mod.build_world(buildings=BUILDINGS,
                           building_subdivs=(4, 6, 8, 10, 12))
print(f"world: {ws.info}", flush=True)
batch = ws.batch
scene = device.upload(batch)
anim = ws.animator()
bones_np = ws.bone_palette(anim.bone_mats(np.float32(0.6)))
bones = jnp.asarray(bones_np)
cam = world_mod.world_camera(W, H, buildings=BUILDINGS)
base_yaw = cam.yaw
vl = []
for i in range(N):
    cam.yaw = base_yaw + 8.0 * np.sin(0.25 * i)
    vl.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(vl))
maxc = device.auto_maxc(batch, vl[0], bones_np, width=W, height=H)
tap_tiles = device.auto_tap_tiles(batch, vl[0], bones_np,
                                  width=W, height=H)
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc} tap_tiles={tap_tiles} interp={interp}", flush=True)

# the raw (un-jitted) raster entry: its module-level jit caches traced
# jaxprs keyed only on avals+statics, which would silently serve the
# previous KG's kernel after the global flip
FWD = pr.raster_pallas_fwd.__wrapped__


def chk(x):
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


def make_runners(stage):
    """Build fresh jit closures under the CURRENT pr.KG/pr.G."""

    def prefix(scene, vp):
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(
            scene, clip, W, H, bone_mats=bones)
        zb, ib, mattrs, n_over = FWD(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
            interpret=interp, n_attr=n_attr, mtap=True,
            w_eps=device.W_EPS, flat=True)
        if stage == "raster":
            return chk(zb) + chk(mattrs[::7, :, ::31])
        src, covered, _ = device.shade_mip_tap_flat_channels(
            scene, mattrs, ib, tap_tiles=tap_tiles)
        colort = device._blend_pack_u32(src, covered,
                                        (255, 255, 255, 255))
        color = pr.unflatten_tiles(colort, PH, PW)[:H, :W]
        return chk(color.astype(jnp.float32))

    def run_n(scene, vps):
        def step(c, vp):
            return c + prefix(scene, vp), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    return jax.jit(lambda s, v: prefix(s, v)), jax.jit(run_n)


KGS = (32, 16)
STAGES = ["raster", "full"]
runners = {}
checks = {}
for kg in KGS:
    pr.KG = kg
    pr.G = pr.CT // kg
    for stage in STAGES:
        t0 = time.perf_counter()
        r1, rn = make_runners(stage)
        c1 = float(r1(scene, vps[0]))
        jax.block_until_ready(rn(scene, vps))
        runners[(kg, stage)] = (r1, rn)
        checks[(kg, stage)] = c1
        print(f"compiled KG={kg} {stage} (G={pr.G}) "
              f"{time.perf_counter()-t0:.1f}s chk={c1:.1f}", flush=True)
pr.KG = 32
pr.G = pr.CT // 32

for stage in STAGES:
    a, b = checks[(32, stage)], checks[(16, stage)]
    tag = "OK" if a == b else "MISMATCH"
    print(f"checksum {stage}: KG32={a:.1f} KG16={b:.1f} [{tag}]",
          flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {k: [] for k in runners}
for rep in range(5):
    for key, (r1, rn) in runners.items():
        tn = timed(rn, scene, vps)
        t1 = timed(r1, scene, vps[0])
        res[key].append((tn - t1) / (N - 1) * 1e3)
        print(f"rep{rep} KG={key[0]:2d} {key[1]:6s}: "
              f"{res[key][-1]:7.2f}ms", flush=True)

print("\n=== medians ===", flush=True)
for key in runners:
    v = sorted(res[key])[2]
    print(f"KG={key[0]:2d} {key[1]:6s}: {v:7.2f}ms", flush=True)
