"""Compaction GRANULARITY A/B: 128-px SEG rows vs whole-tile rows.

Isolates the d67f738 granularity change inside today's one-program
structure by flipping ``device.SEG_PX`` (128 -> P=2048 emulates the
old whole-(tile, layer)-row compaction) with fresh jit closures per
flip, same process, round-robin — the kg_ab methodology. Caps are
re-measured per flip (measure_live_tap_tiles counts in SEG_PX units).

Decides whether the r3-cont. split-peel table deltas vs the 11:05
README capture (sp 14.6->15.5/16.0 ms, spml 25.1->28.9/29.1) are the
granularity change or cross-run device drift.

Run on the real chip: PYTHONPATH=. python tools/bench/seg_ab.py
[--glass]   (glass scene: camera in-field, 1/4 translucent)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
N = 8
L = 4
GLASS = "--glass" in sys.argv

batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
if GLASS:
    demo.make_translucent(batch, 1024)
scene = device.upload(batch)
vl = []
for i in range(N):
    cam = demo.demo_camera(1024, W, H)
    if GLASS:
        cam.position = cam.position * 0.3
    cam.yaw = 15.0 + 3.0 * i
    vl.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(vl))
bones = jnp.asarray(demo.demo_bone_mats(0.3))
maxc = device.auto_maxc(batch, vl[0], demo.demo_bone_mats(0.0),
                        width=W, height=H)
interp = jax.default_backend() != "tpu"


def chk(c, d):
    f = c.reshape(-1)
    s = f[:: max(f.size // 512, 1)]
    return jnp.sum(s.astype(jnp.float32)) + jnp.sum(d[::97, ::97])


def build(seg):
    """Fresh caps + fresh jitted runners under device.SEG_PX = seg."""
    device.SEG_PX = seg
    caps_sp = device.measure_live_tap_tiles(
        scene, vl[0], bones, width=W, height=H, layers=L, maxc=maxc,
        mode="split")
    caps_spl = device.measure_live_tap_tiles(
        scene, vl[0], bones, width=W, height=H, layers=L, maxc=maxc,
        lighting=True, mode="split")
    print(f"seg={seg}: caps_sp={caps_sp} caps_spl={caps_spl}",
          flush=True)

    def sp(scene, vp, mipmap):
        device.SEG_PX = seg   # trace-time read inside the jit
        c, d, _ = device._render_frame_peeled_core(
            scene, vp, bones, width=W, height=H, layers=L,
            backend="pallas", maxc=maxc, peel_mode="split",
            mipmap=mipmap, lighting=mipmap, packed=not mipmap,
            tap_tiles=caps_spl if mipmap else caps_sp)
        return chk(c, d)

    @jax.jit
    def run_n_sp(scene, vps):
        def step(c, vp):
            return c + sp(scene, vp, False).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    @jax.jit
    def run_1_sp(scene, vp):
        return sp(scene, vp, False).astype(jnp.float32)

    @jax.jit
    def run_n_spml(scene, vps):
        def step(c, vp):
            return c + sp(scene, vp, True).astype(jnp.float32), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    @jax.jit
    def run_1_spml(scene, vp):
        return sp(scene, vp, True).astype(jnp.float32)

    return {"sp": (run_n_sp, run_1_sp),
            "spml": (run_n_spml, run_1_spml)}


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST
RUNNERS = {seg: build(seg) for seg in (128, 2048)}

vals = {}
for seg, r in RUNNERS.items():
    for w, (rn, r1) in r.items():
        t0 = time.perf_counter()
        v1 = float(r1(scene, vps[0]))
        t1 = time.perf_counter()
        vn = float(rn(scene, vps))
        vals[(seg, w)] = (v1, vn)
        print(f"compile seg{seg}/{w}: single {t1-t0:.1f}s scan "
              f"{time.perf_counter()-t1:.1f}s ({v1:.0f}/{vn:.0f})",
              flush=True)

for w in ("sp", "spml"):
    # cross-granularity bit-exactness is NOT a product contract (the
    # compacted==dense guarantee holds per granularity; layouts fuse
    # ±1 ulp apart across granularities) — report, don't assert
    if vals[(128, w)] != vals[(2048, w)]:
        print(f"note: {w} checksums differ across granularities "
              f"(expected ±1 ulp layout fusion): {vals[(128, w)]} vs "
              f"{vals[(2048, w)]}", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


names = [(seg, w) for seg in (128, 2048) for w in ("sp", "spml")]
res = {n: [] for n in names}
for rep in range(6):
    for seg, w in names:
        rn, r1 = RUNNERS[seg][w]
        tn = timed(rn, scene, vps)
        t1 = timed(r1, scene, vps[0])
        per = (tn - t1) / (N - 1) * 1e3
        res[(seg, w)].append(per)
        print(f"rep{rep} seg{seg}/{w:5s}: per-frame={per:7.2f}ms",
              flush=True)

print("\n=== medians ===", flush=True)
for seg, w in names:
    m = sorted(res[(seg, w)])[len(res[(seg, w)]) // 2]
    print(f"seg{seg}/{w:5s}: {m:7.2f} ms", flush=True)
