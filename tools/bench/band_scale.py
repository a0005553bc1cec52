"""Measured multichip band scaling on ONE real chip (config 5's story).

Band-split multichip (parallel/tiles.py) is zero-collective: every chip
runs the identical band program at its own y0 and the frame exists as a
row-sharded global array. Therefore the n-chip frame time IS the
slowest band's single-chip time — measurable on the one real chip by
timing the DENSEST band (predict_bin_counts picks it) at each n. No ICI
estimate needed; the only thing this can't see is n chips' HBM clocks
drifting independently (each chip would need its own run anyway).

Measures the world scene on the production mipmap band path (the
workload still under 60 fps single-chip) for n = 1/2/4/8, and prints
the projected multichip fps plus the fixed per-chip floor (vertex +
setup + bin run over ALL triangles on every chip — the saturation
term). MTR_BAND_SCENE=glass measures the mixed-OIT workload instead,
on the banded split-peel path (tiles.py peel branch: dense taps, the
production multichip OIT config); MTR_BAND_SCENE=peelmip measures the
4-layer OIT + trilinear + lighting config on the default 196k-tri
scene (the remaining sub-60 single-chip row); MTR_BAND_SCENE=default
measures the headline config (single-layer packed tap path).
MTR_BAND_CAPS=1 sizes the per-band compacted-tap caps the bench
multichip modes wire (measure_live_tap_tiles(bands)/auto_tap_tiles
(bands)); default/world use the scalar cap, peel scenes the pair.

Run on the real chip: PYTHONPATH=. python tools/bench/band_scale.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import world as world_mod

W = int(os.environ.get("MTR_BAND_W", 1920))
H = int(os.environ.get("MTR_BAND_H", 1080))
PW = -(-W // pr.TILE_W) * pr.TILE_W
N = int(os.environ.get("MTR_BAND_N", 8))
BANDS = (1, 2, 4, 8)
BUILDINGS = int(os.environ.get("MTR_BAND_B", 280))
SCENE = os.environ.get("MTR_BAND_SCENE", "world")
L = 4

if SCENE in ("glass", "peelmip", "default"):
    from mt_renderer_tpu.scene import demo

    inst = int(os.environ.get("MTR_BAND_B", 1024))
    batch = demo.build_demo_batch(instances=inst, skinned=True, subdiv=4)
    if SCENE == "glass":
        batch = demo.make_translucent(batch, inst)
    # trilinear band scenes ride the production tri-row pool
    # (tripool_ab.py) — override with MTR_BAND_POOL
    scene = device.upload(batch, pool_mode=os.environ.get(
        "MTR_BAND_POOL", "tri" if SCENE == "peelmip" else "quad"))
    bones_np = demo.demo_bone_mats(0.3)
    cam = demo.demo_camera(inst, W, H)
    if SCENE == "glass":
        cam.position = cam.position * 0.3
        cam.yaw = 15.0
else:
    # MTR_BAND_SCENE=bigtex: the GB-texture envelope (16 distinct
    # 2048^2 + mips — r4's only workload without a measured path to
    # 60 fps). Bands split the COVERED PIXELS, so the HBM-regime
    # sampling (~80% of the bigtex frame) should divide ~n-fold while
    # the pool replicates; this measures whether it does.
    # MTR_BAND_POOL=bc1 rides the compressed-resident pool instead.
    if SCENE == "bigtex":
        wkw = dict(buildings=int(os.environ.get("MTR_BAND_B", 140)),
                   variants=16, tex_sizes=(2048,),
                   building_subdivs=(4, 6, 8))
    else:
        wkw = dict(buildings=BUILDINGS,
                   building_subdivs=(4, 6, 8, 10, 12))
    ws = world_mod.build_world(**wkw)
    print(f"{SCENE}: {ws.info}", flush=True)
    batch = ws.batch
    scene = device.upload(batch, pool_mode=os.environ.get(
        "MTR_BAND_POOL", "tri"))
    if SCENE == "bigtex":   # GB pool: force the upload before timing
        _ = int(np.asarray(scene.mip_pool[0, 0]))
        st = device.pool_stats(scene)
        print(f"bigtex pool: {st['pool_mode']} "
              f"{st['bytes'] / 2**30:.2f} GiB resident", flush=True)
    anim = ws.animator()
    bones_np = ws.bone_palette(anim.bone_mats(np.float32(0.6)))
    cam = world_mod.world_camera(W, H, buildings=BUILDINGS)
bones = jnp.asarray(bones_np)
base_yaw = cam.yaw
vl = []
for i in range(N):
    # small sweep: the densest band must stay densest across steps
    cam.yaw = base_yaw + 0.8 * np.sin(0.25 * i)
    vl.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(vl))
maxc = device.auto_maxc(batch, vl[0], bones_np, width=W, height=H)
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc} interp={interp}", flush=True)


def densest_band(n):
    """Index + predicted binned-pair share of the heaviest band."""
    band_h = -(-H // n)
    pb = -(-band_h // pr.TILE_H) * pr.TILE_H
    loads = [
        int(device.predict_bin_counts(batch, vl[0], bones_np,
                                      width=W, height=H,
                                      y0=i * band_h, grid_rows=pb).sum())
        for i in range(n)
    ]
    i = int(np.argmax(loads))
    return i, band_h, pb, loads


def chk(x):
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


def make_runner(y0, pb, tap_tiles=None):
    """The multichip band body (tiles.py band_render: mipmap branch
    for world, split-peel branch for glass) at a concrete band origin
    — fresh jit closure per n. ``tap_tiles`` (peel scenes) is the
    per-band split cap pair from measure_live_tap_tiles(bands=n);
    None = dense taps (MTR_BAND_CAPS=1 turns caps on)."""

    def band_world(scene, vp):
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(
            scene, clip, W, H, bone_mats=bones)
        zb, ib, mattrs, n_over = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, y0, width=PW, height=pb,
            maxc=maxc, interpret=interp, n_attr=n_attr, mtap=True,
            w_eps=device.W_EPS, flat=True)
        src, covered, _ = device.shade_mip_tap_flat_channels(
            scene, mattrs, ib, tap_tiles=None)
        dstc = device._blend_channels(src, covered,
                                      (255, 255, 255, 255))
        color = pr.unflatten_tiles(device.pack_u32_channels(dstc),
                                   pb, PW)
        return chk(color) + chk(zb[:, 0, ::31])

    def band_peel(scene, vp):
        mip = SCENE == "peelmip"
        clip = device.vertex_stage(scene, vp, bones)
        setup_op, setup_tr, n_attr = device.setup_packed_cols(
            scene, clip, W, H, bone_mats=bones, opacity_split=True,
            lighting=mip)
        dst, z0, n_over = device._split_peel_flat(
            scene, setup_op, setup_tr, n_attr, x0=0, y0=y0,
            pw=PW, ph=pb, layers=L, maxc=maxc,
            light=device._light_unit() if mip else None,
            tap_tiles=tap_tiles, clear_color=(255, 255, 255, 255),
            interp=interp, mipmap=mip)
        color = pr.unflatten_tiles(device.pack_u32_channels(dst),
                                   pb, PW)
        return chk(color) + chk(z0[::7, ::31])

    def band_default(scene, vp):
        # tiles.py band_render, not-mipmap packed branch: the
        # single-chip production fast path per band
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(
            scene, clip, W, H, bone_mats=bones)
        zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, y0, width=PW, height=pb,
            maxc=maxc, interpret=interp, n_attr=n_attr, tap=True,
            w_eps=device.W_EPS, flat=True)
        colort, _, _ = device.shade_finish_tap_flat(
            scene, tattrs, tapidx, ib, (255, 255, 255, 255),
            tap_tiles=tap_tiles)
        color = pr.unflatten_tiles(colort, pb, PW)
        return chk(color) + chk(zb[:, 0, ::31])

    band = {"world": band_world, "bigtex": band_world,
            "default": band_default}.get(SCENE, band_peel)

    def run_n(scene, vps):
        def step(c, vp):
            return c + band(scene, vp), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    return jax.jit(lambda s, v: band(s, v)), jax.jit(run_n)


USE_CAPS = bool(os.environ.get("MTR_BAND_CAPS")) and SCENE != "world"
runners = {}
meta = {}
for n in BANDS:
    i, band_h, pb, loads = densest_band(n)
    caps = None
    if USE_CAPS and SCENE == "default":
        caps = device.auto_tap_tiles(batch, vl[0], bones_np,
                                     width=W, height=H, bands=n)
    elif USE_CAPS:
        caps = device.measure_live_tap_tiles(
            scene, vl[0], bones_np, width=W, height=H, layers=L,
            maxc=maxc, mode="split", bands=n)
    t0 = time.perf_counter()
    r1, rn = make_runner(i * band_h, pb, caps)
    float(r1(scene, vps[0]))
    jax.block_until_ready(rn(scene, vps))
    runners[n] = (r1, rn)
    meta[n] = (i, pb, loads)
    print(f"compiled n={n} band={i} pb={pb} caps={caps} "
          f"load_share={max(loads)/max(sum(loads), 1):.2f} "
          f"{time.perf_counter()-t0:.1f}s", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {n: [] for n in BANDS}
for rep in range(5):
    for n, (r1, rn) in runners.items():
        tn = timed(rn, scene, vps)
        t1 = timed(r1, scene, vps[0])
        res[n].append((tn - t1) / (N - 1) * 1e3)
        print(f"rep{rep} n={n}: {res[n][-1]:7.2f}ms", flush=True)

print("\n=== medians (densest band = projected n-chip frame) ===",
      flush=True)
t1v = None
for n in BANDS:
    v = sorted(res[n])[2]
    if t1v is None:
        t1v = v
    print(f"n={n}: band {meta[n][0]} {v:7.2f}ms -> {1e3/v:6.1f} fps "
          f"(speedup {t1v/v:.2f}x)", flush=True)
