"""Bigtex diagnostics (r4): WHERE the GB-pool frame time goes.

The bench measured 8.05 ns/row random gathers on the live 89.5M-row
pool — 3.8x the 2.1 ns/row law (gather_shapes.py, measured at 2-8M
rows). Two questions:

1. **The law's size dependence** — ns/row vs pool footprint, on
   device-GENERATED (16 B) pools (no upload needed): where is the
   knee? This decides whether the GB-pool tax is footprint (cache/TLB)
   or something about the live scene.
2. **The bigtex stage budget** — scan-of-N prefixes through the
   production mip pipeline on the real bigtex scene: how much of the
   85 ms frame is the trilinear pool gather vs raster/setup/LOD/blend.

Run on the real chip: PYTHONPATH=. python tools/bench/bigtex_probe.py
[--curve-only]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr

W, H = 1920, 1080
PW = -(-W // pr.TILE_W) * pr.TILE_W
PH = -(-H // pr.TILE_H) * pr.TILE_H
N = 8
N_IDX = 2_070_000      # one covered-1080p frame's worth of rows


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST


# ---------------------------------------------- 1. law vs footprint

@functools.partial(jax.jit, static_argnames=("rows", "length"))
def probe(pool, idx, rows: int, length: int):
    def step(c, _):
        acc, salt = c
        out = pool[(idx + salt) % rows]
        acc += jnp.sum(out[::4096, 0].astype(jnp.float32))
        return (acc, salt + 1), None
    return jax.lax.scan(step, (jnp.float32(0), jnp.int32(0)),
                        None, length=length)[0][0]


def law_curve():
    print("pool_rows  MiB     kind  ns/row   (16 B-row gathers, "
          "scan-of-8 differenced)", flush=True)
    rng = np.random.default_rng(0)
    out = []
    sizes = (16_384, 131_072, 524_288, 2_000_000, 8_000_000,
             23_000_000, 45_000_000, 89_505_786)
    for rows in sizes:
        pool = jnp.zeros((rows, 16), jnp.uint8)      # device-generated
        kinds = {"rand": rng.integers(0, rows, N_IDX).astype(np.int32)}
        if rows >= 23_000_000:
            # coherent: neighboring indices hit neighboring rows — at
            # HBM-resident footprints page locality may matter even
            # though it measured free at cache-resident sizes (r3)
            kinds["coh"] = ((np.arange(N_IDX, dtype=np.int64) * 4)
                            % rows).astype(np.int32)
        for kind, idx_h in kinds.items():
            idx = jnp.asarray(idx_h)
            jax.block_until_ready(probe(pool, idx, rows, N))
            jax.block_until_ready(probe(pool, idx, rows, 1))
            ests = []
            for _ in range(5):
                tn = timed(probe, pool, idx, rows, N)
                t1 = timed(probe, pool, idx, rows, 1)
                ests.append((tn - t1) / (N - 1) / N_IDX * 1e9)
            ests.sort()
            ns = ests[len(ests) // 2]
            out.append((rows, kind, ns))
            print(f"{rows:10d} {rows * 16 / 2**20:7.1f} {kind:>6s} "
                  f"{ns:7.2f}", flush=True)
        del pool
    return out


# ---------------------------------------------- 2. bigtex stage budget

def stage_budget():
    from mt_renderer_tpu.scene import world as world_mod

    t0 = time.perf_counter()
    ws = world_mod.build_world(buildings=140, variants=16,
                               tex_sizes=(2048,),
                               building_subdivs=(4, 6, 8))
    scene = device.upload(ws.batch)
    jax.block_until_ready(scene.mip_pool)
    _ = int(np.asarray(scene.mip_pool[0, 0]))
    print(f"bigtex scene + upload: {time.perf_counter() - t0:.0f}s "
          f"({device.pool_stats(scene)['bytes'] / 2**30:.2f} GiB)",
          flush=True)
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
    interp = jax.default_backend() != "tpu"
    print(f"maxc={maxc} tap_tiles={stt}", flush=True)

    def chk(x):
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        f = x.reshape(-1)
        return jnp.sum(f[:: max(f.shape[0] // 512, 1)]
                       .astype(jnp.float32))

    def prefix(scene, vp, bones, stage):
        clip = device.vertex_stage(scene, vp, bones)
        if stage == "vertex":
            return chk(clip)
        cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
        if stage == "setup":
            return chk(cols)
        pre = pr.prebin((cols, bbox), None, 0, 0, width=PW, height=PH,
                        maxc=maxc)
        if stage == "bin":
            return chk(cols) + chk(pre[1]) + chk(pre[3])
        zb, ib, mattrs, n_over = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
            interpret=interp, n_attr=n_attr, mtap=True,
            w_eps=device.W_EPS, pre=pre, flat=True)
        if stage == "raster":
            return chk(zb) + chk(mattrs[:, ::5, ::31])
        src, covered, _ = device.shade_mip_tap_flat_channels(
            scene, mattrs, ib, tap_tiles=stt)
        if stage == "mipshade":
            return chk(src[0]) + chk(src[3])
        colort = device._blend_pack_u32(src, covered,
                                        (255, 255, 255, 255))
        color = pr.unflatten_tiles(colort, PH, PW)[:H, :W]
        return chk(color)

    STAGES = ["vertex", "setup", "bin", "raster", "mipshade", "full"]

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run_n(scene, vps, bones, stage):
        def step(carry, vp):
            return carry + prefix(scene, vp, bones, stage), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run_1(scene, vp, bones, stage):
        return prefix(scene, vp, bones, stage)

    for s in STAGES:
        t0 = time.perf_counter()
        jax.block_until_ready(run_1(scene, vps[0], bones, s))
        jax.block_until_ready(run_n(scene, vps, bones, s))
        print(f"compiled {s} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    per = {s: [] for s in STAGES}
    for rep in range(5):
        for s in STAGES:
            tn = timed(run_n, scene, vps, bones, s)
            t1 = timed(run_1, scene, vps[0], bones, s)
            per[s].append((tn - t1) / (N - 1) * 1e3)
    prev = 0.0
    for s in STAGES:
        v = sorted(per[s])[len(per[s]) // 2]
        print(f"{s:8s} cum={v:7.2f}ms delta={v - prev:7.2f}ms",
              flush=True)
        prev = v


if __name__ == "__main__":
    law_curve()
    if "--curve-only" not in sys.argv:
        stage_budget()
