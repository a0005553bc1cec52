"""Compressed-resident bc1 pool vs the tri pool on the production
trilinear paths — the adoption decision for in-register BC1 decode
(r4 verdict #1: the reference's keep-BCn-in-VRAM envelope,
/root/reference/src/texture.rs:12-30).

What the laws predict: both pools pay ONE row-priced gather per
trilinear tap; bc1 adds ~400 integer VPU ops/pixel of decode but
shrinks the resident pool 16x (4 vs 64 B/texel) — and where tri rows
are touched ~once per frame (LOD-matched sampling), ~16 pixels share
each bc1 block row, so if the ~8.1 ns/row HBM gather price is
miss-dominated the bigtex frame should drop well below the decode
cost it adds. Upload shrinks 32x (compact 8 B blocks; rows bake on
device). This measures the real frames, round-robin scan-of-N.

The world leg also uploads "dqua" — a QUAD pool built from the decoded
BC1 chains — whose on-chip checksums must equal bc1's exactly (the
CPU exactness tests, re-proven on the live backend where bf16 fusion
differences would show).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench/bc1_ab.py
  [--bigtex-only | --world-only]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import bcn, device, pallas_raster as pr

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


def make_prefix(maxc, stt):
    def prefix(scene, vp, bones, stage):
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
        kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
                  n_attr=n_attr, mtap=True, w_eps=device.W_EPS,
                  flat=True)
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


def ab(name, scenes, vps, bones, prefix, checksums=None):
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
        vals = {}
        for m, sc in scenes.items():
            t0 = time.perf_counter()
            v1 = float(run_1(sc, vps[0], bones, m, stage))
            vn = float(run_n(sc, vps, bones, m, stage))
            vals[m] = (v1, vn)
            print(f"  compile {name}/{stage}/{m}: "
                  f"{time.perf_counter() - t0:.0f}s ({v1:.0f}/{vn:.0f})",
                  flush=True)
        if checksums:
            a, b = checksums
            ok = vals[a] == vals[b]
            print(f"  on-chip exactness {a} vs {b} [{stage}]: "
                  f"{'EQUAL' if ok else 'MISMATCH ' + repr((vals[a], vals[b]))}",
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


def decoded_chains(batch):
    return [[bcn.decode_bc1_blocks_numpy(
                bcn.encode_bc1_numpy(img), img.shape[1], img.shape[0])
             for img in device.mip_chain(t)]
            for t in batch.textures]


def upload_timed(batch, tag, **kw):
    t0 = time.perf_counter()
    sc = device.upload(batch, **kw)
    jax.block_until_ready(sc.mip_pool)
    _ = int(np.asarray(sc.mip_pool[0, 0]))
    st = device.pool_stats(sc)
    print(f"{tag}: {time.perf_counter() - t0:.1f}s upload+build "
          f"({st['bytes'] / 2**20:.1f} MiB resident, "
          f"{st['upload_bytes'] / 2**20:.1f} MiB uploaded)", flush=True)
    return sc


def leg_world():
    from mt_renderer_tpu.scene import world as world_mod

    ws = world_mod.build_world()
    scenes = {
        "tri": upload_timed(ws.batch, "world tri", pool_mode="tri"),
        "bc1": upload_timed(ws.batch, "world bc1", pool_mode="bc1"),
        "dqua": upload_timed(ws.batch, "world dqua (decoded-chain quad)",
                             mip_chains=decoded_chains(ws.batch)),
    }
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
    print(f"world: maxc={maxc} tap_tiles={stt}", flush=True)
    ab("world", scenes, vps, bones, make_prefix(maxc, stt),
       checksums=("bc1", "dqua"))


def leg_bigtex():
    from mt_renderer_tpu.scene import world as world_mod

    t0 = time.perf_counter()
    ws = world_mod.build_world(buildings=140, variants=16,
                               tex_sizes=(2048,),
                               building_subdivs=(4, 6, 8))
    print(f"bigtex scene build: {time.perf_counter() - t0:.1f}s",
          flush=True)
    scenes = {
        "bc1": upload_timed(ws.batch, "bigtex bc1", pool_mode="bc1"),
        "tri": upload_timed(ws.batch, "bigtex tri", pool_mode="tri"),
    }
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
    ab("bigtex", scenes, vps, bones, make_prefix(maxc, stt))


if __name__ == "__main__":
    if "--bigtex-only" not in sys.argv:
        leg_world()
    if "--world-only" not in sys.argv:
        leg_bigtex()
