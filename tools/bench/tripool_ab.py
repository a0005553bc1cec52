"""Tri-row pool (pool_mode="tri") vs quad pool on the production
trilinear paths — the adoption decision for the one-gather trilinear.

gather_width.py priced the primitive (one 64 B gather = 5.7 ns vs two
16 B = 16.1 ns HBM-resident, 1.58 vs 3.37 cache-resident); this
measures the real frames: the default scene with mipmap(+lighting) and
the archive world scene, quad vs tri, same-process round-robin
scan-of-N (the only A/B methodology that holds on this tunnel).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench/tripool_ab.py
  [--bigtex]   adds the GB-pool leg (one-time ~4 min upload)
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
PW = -(-W // pr.TILE_W) * pr.TILE_W
PH = -(-H // pr.TILE_H) * pr.TILE_H
N = 8


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST
interp = jax.default_backend() != "tpu"


def chk(x):
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


def make_prefix(maxc, stt, light):
    def prefix(scene, vp, bones, stage):
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(
            scene, clip, W, H, lighting=light)
        kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
                  n_attr=n_attr, mtap=True, w_eps=device.W_EPS,
                  flat=True)
        if light:
            kw["light"] = device._light_unit()
        zb, ib, mattrs, n_over = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, **kw)
        src, covered, _ = device.shade_mip_tap_flat_channels(
            scene, mattrs, ib, tap_tiles=stt)
        if stage == "mipshade":
            return chk(src[0]) + chk(src[3])
        colort = device._blend_pack_u32(src, covered,
                                        (255, 255, 255, 255))
        return chk(colort)
    return prefix


def ab(name, scenes, vps, bones, prefix):
    @functools.partial(jax.jit, static_argnames=("mode", "stage"))
    def run_n(scene, vps, bones, mode, stage):
        def step(c, vp):
            return c + prefix(scene, vp, bones, stage), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    @functools.partial(jax.jit, static_argnames=("mode", "stage"))
    def run_1(scene, vp, bones, mode, stage):
        return prefix(scene, vp, bones, stage)

    for stage in ("mipshade", "full"):
        res = {m: [] for m in scenes}
        for m, sc in scenes.items():
            t0 = time.perf_counter()
            v1 = float(run_1(sc, vps[0], bones, m, stage))
            vn = float(run_n(sc, vps, bones, m, stage))
            print(f"  compile {name}/{stage}/{m}: "
                  f"{time.perf_counter() - t0:.0f}s ({v1:.0f}/{vn:.0f})",
                  flush=True)
        for rep in range(6):
            for m, sc in scenes.items():
                tn = timed(run_n, sc, vps, bones, m, stage)
                t1 = timed(run_1, sc, vps[0], bones, m, stage)
                res[m].append((tn - t1) / (N - 1) * 1e3)
        line = " ".join(
            f"{m}={sorted(v)[len(v) // 2]:7.2f}ms"
            for m, v in res.items())
        print(f"{name:10s} {stage:8s}: {line}", flush=True)


def leg_default(light=True):
    batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
    scenes = {"quad": device.upload(batch),
              "tri": device.upload(batch, pool_mode="tri")}
    cam = demo.demo_camera(1024, W, H)
    vl = []
    for i in range(N):
        c = demo.demo_camera(1024, W, H)
        c.yaw = 15.0 + 3.0 * i
        vl.append(np.asarray(c.view_proj()))
    vps = jnp.asarray(np.stack(vl))
    bones_h = demo.demo_bone_mats(0.0)
    bones = jnp.asarray(bones_h)
    maxc = device.auto_maxc(batch, vl[0], bones_h, width=W, height=H)
    stt = device.auto_tap_tiles(batch, vl[0], bones_h, width=W, height=H)
    print(f"default scene: maxc={maxc} tap_tiles={stt} "
          f"pool={device.pool_stats(scenes['quad'])['bytes'] / 2**20:.2f}"
          f"/{device.pool_stats(scenes['tri'])['bytes'] / 2**20:.2f} MiB",
          flush=True)
    ab("mip+light", scenes, vps, bones, make_prefix(maxc, stt, True))


def leg_world():
    from mt_renderer_tpu.scene import world as world_mod

    ws = world_mod.build_world()
    scenes = {"quad": device.upload(ws.batch),
              "tri": device.upload(ws.batch, pool_mode="tri")}
    anim = ws.animator()
    bones_h = ws.bone_palette(anim.bone_mats(np.float32(0.5)))
    vl = []
    for i in range(N):
        cam = world_mod.world_camera(W, H)
        cam.yaw += 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
    vps = jnp.asarray(np.stack(vl))
    bones = jnp.asarray(bones_h)
    maxc = device.auto_maxc(ws.batch, vl[0], bones_h, width=W, height=H)
    stt = device.auto_tap_tiles(ws.batch, vl[0], bones_h,
                                width=W, height=H)
    print(f"world scene: maxc={maxc} tap_tiles={stt} "
          f"pool={device.pool_stats(scenes['quad'])['bytes'] / 2**20:.2f}"
          f"/{device.pool_stats(scenes['tri'])['bytes'] / 2**20:.2f} MiB",
          flush=True)
    ab("world", scenes, vps, bones, make_prefix(maxc, stt, False))


def leg_bigtex():
    from mt_renderer_tpu.scene import world as world_mod

    t0 = time.perf_counter()
    ws = world_mod.build_world(buildings=140, variants=16,
                               tex_sizes=(2048,),
                               building_subdivs=(4, 6, 8))
    sq = device.upload(ws.batch)
    jax.block_until_ready(sq.mip_pool)
    _ = int(np.asarray(sq.mip_pool[0, 0]))
    print(f"bigtex quad upload: {time.perf_counter() - t0:.0f}s "
          f"({device.pool_stats(sq)['bytes'] / 2**30:.2f} GiB)",
          flush=True)
    t0 = time.perf_counter()
    st = device.upload(ws.batch, pool_mode="tri")
    jax.block_until_ready(st.mip_pool)
    _ = int(np.asarray(st.mip_pool[0, 0]))
    print(f"bigtex tri upload+build: {time.perf_counter() - t0:.0f}s "
          f"({device.pool_stats(st)['bytes'] / 2**30:.2f} GiB)",
          flush=True)
    scenes = {"quad": sq, "tri": st}
    anim = ws.animator()
    bones_h = ws.bone_palette(anim.bone_mats(np.float32(0.5)))
    vl = []
    for i in range(N):
        cam = world_mod.world_camera(W, H, buildings=140)
        cam.yaw += 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
    vps = jnp.asarray(np.stack(vl))
    bones = jnp.asarray(bones_h)
    maxc = device.auto_maxc(ws.batch, vl[0], bones_h, width=W, height=H)
    stt = device.auto_tap_tiles(ws.batch, vl[0], bones_h,
                                width=W, height=H)
    print(f"bigtex: maxc={maxc} tap_tiles={stt}", flush=True)
    ab("bigtex", scenes, vps, bones, make_prefix(maxc, stt, False))


if __name__ == "__main__":
    if "--bigtex-only" not in sys.argv:
        leg_default()
        leg_world()
    if "--bigtex" in sys.argv or "--bigtex-only" in sys.argv:
        leg_bigtex()
