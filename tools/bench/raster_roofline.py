"""Raster-kernel roofline (r4, verdict item #1).

Two questions about ``_raster_fwd_kernel``'s cost, answered with the
same discipline the gather law got (gather_shapes.py):

1. **Utilization**: how close does the kernel run to the speed of
   light for ITS OWN op mix? A microbenchmark kernel executes the
   exact shared per-group block (``pr._sl_group_body`` — edges, z
   test, winner select, the bf16x3 MXU coefficient select) on a
   VMEM-resident chunk with no DMA, no gating, no binning: the pure
   per-(group, tile)-pair compute rate this chip can reach. The
   production kernel's measured ns/pair against that is its
   utilization; the gap prices everything around the math (double-
   buffered DMA waits, per-group gates, the scalar chunk loop, the
   epilogue).
2. **Pair slack**: how far does the BINNED pair count sit above the
   visible-surface lower bound? Binned pairs = popcount of the
   per-tile group masks (the kernel's true work unit, r3
   compact_pairs.py); winning pairs = distinct (tile, winner-group)
   pairs in the rendered frame — a group that wins no pixel anywhere
   was pure overhead that perfect binning could have skipped.

frame_ns/pair ~= SOL ns/pair  => the kernel is compute-bound at the
measured rate and (pairs x SOL) is a LAW for raster time.
pair slack >> 1 with high utilization => the lever is binning-shaped.
utilization << 1 => the lever is instruction/schedule-shaped.

Usage: python tools/bench/raster_roofline.py [default|dense|world ...]
(real TPU; ~2 min/preset, prints one summary line per preset).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mt_renderer_tpu.render import device
from mt_renderer_tpu.render import pallas_raster as pr
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
PW = -(-W // pr.TILE_W) * pr.TILE_W
PH = -(-H // pr.TILE_H) * pr.TILE_H
N = 8                       # scan-of-N views
INTERP = jax.default_backend() != "tpu"


def build(preset):
    if preset == "world":
        from mt_renderer_tpu.scene import world as world_mod

        ws = world_mod.build_world(buildings=280,
                                   building_subdivs=(4, 6, 8, 10, 12))
        batch = ws.batch
        scene = device.upload(batch)
        bones = ws.bone_palette(ws.animator().bone_mats(np.float32(0.5)))
        vl = []
        for i in range(N):
            cam = world_mod.world_camera(W, H, buildings=280)
            cam.yaw += 3.0 * i
            vl.append(np.asarray(cam.view_proj()))
        return batch, scene, vl, bones, True      # world preset: mtap
    batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
    scene = device.upload(batch)
    bones = demo.demo_bone_mats(0.3)
    vl = []
    for i in range(N):
        cam = demo.demo_camera(1024, W, H)
        if preset == "dense":
            cam.position = cam.position * 0.3
        cam.yaw = 15.0 + 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
    return batch, scene, vl, bones, False


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


def chk(x):
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.shape[0] // 512, 1)].astype(jnp.float32))


# ------------------------------------------------ production raster time

def raster_ms(scene, vps_h, bones_h, maxc, mtap):
    """Raster-stage time: scan-of-N (prefix through raster) minus
    scan-of-N (prefix through bin) — the stage_budget methodology."""
    vps = jnp.asarray(np.stack(vps_h))
    bones = jnp.asarray(bones_h)

    def prefix(scene, vp, bones, stage):
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
        pre = pr.prebin((cols, bbox), None, 0, 0, width=PW, height=PH,
                        maxc=maxc)
        if stage == "bin":
            return chk(cols) + chk(pre[1]) + chk(pre[3])
        outs = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
            interpret=INTERP, n_attr=n_attr, tap=not mtap, mtap=mtap,
            w_eps=device.W_EPS, pre=pre, flat=True)
        return chk(outs[0]) + chk(outs[2])

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run_n(scene, vps, bones, stage):
        def step(carry, vp):
            return carry + prefix(scene, vp, bones, stage), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run_1(scene, vp, bones, stage):
        return prefix(scene, vp, bones, stage)

    for s in ("bin", "raster"):
        jax.block_until_ready(run_1(scene, vps[0], bones, s))
        jax.block_until_ready(run_n(scene, vps, bones, s))
    ests = []
    for _ in range(5):
        cum = {}
        for s in ("bin", "raster"):
            tn = timed(run_n, scene, vps, bones, s)
            t1 = timed(run_1, scene, vps[0], bones, s)
            cum[s] = (tn - t1) / (N - 1) * 1e3
        ests.append(cum["raster"] - cum["bin"])
    ests.sort()
    return ests[len(ests) // 2]


# -------------------------------------------------------- pair counting

def pair_counts(scene, vps_h, bones_h, maxc):
    """(median binned pairs, median winning pairs) over the N views.
    Binned = popcount of the per-tile group masks; winning = distinct
    (tile, group) pairs whose group wins >= 1 pixel."""
    binned, winning = [], []
    for vp in vps_h:
        clip = device.vertex_stage(scene, jnp.asarray(vp),
                                   jnp.asarray(bones_h))
        cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
        packed, lists, glists, counts, _ = pr.prebin(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc)
        g = np.asarray(glists)
        li = np.asarray(lists)
        g = np.where(li >= 0, g, 0)
        binned.append(int(
            ((g[..., None] >> np.arange(pr.G)) & 1).sum()))
        _, ib, *_ = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, width=PW, height=PH, maxc=maxc,
            interpret=INTERP, n_attr=n_attr, tap=True,
            w_eps=device.W_EPS, flat=True)
        ibh = np.asarray(ib)[:, 0, :]              # (n_tiles, P)
        nt = ibh.shape[0]
        grp = np.where(ibh >= 0, ibh // pr.KG, -1)
        keys = grp.astype(np.int64) + np.int64(1 << 40) * np.arange(
            nt, dtype=np.int64)[:, None]
        keys = keys[grp >= 0]
        winning.append(int(np.unique(keys).size))
    binned.sort()
    winning.sort()
    return binned[len(binned) // 2], winning[len(winning) // 2]


# ------------------------------------------- speed-of-light microkernel

def _micro_kernel(reps, n_coef, blk_ref, zb_ref, win_ref, coef_out,
                  coef_ref):
    """``reps`` chunks x G groups of the EXACT production group body
    (pr._sl_group_body) on a VMEM-resident block: no DMA, no group
    gates, no binning — the chip's ceiling for this op mix."""
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, pr.P), 1)
    px = (flat % pr.TILE_W).astype(jnp.float32) + 0.5
    py = (flat // pr.TILE_W).astype(jnp.float32) + 0.5
    zb_ref[0] = jnp.full((1, pr.P), jnp.inf, jnp.float32)
    win_ref[0] = jnp.full((1, pr.P), -1, jnp.int32)
    coef_ref[...] = jnp.zeros((n_coef, pr.P), jnp.float32)
    blk = blk_ref[...]

    def body(s, _):
        for g in range(pr.G):
            pr._sl_group_body(blk, g, s, px, py, False, None, n_coef,
                              zb_ref, win_ref, coef_ref)
        return 0

    jax.lax.fori_loop(0, reps, body, 0)
    coef_out[0] = coef_ref[...]


@functools.partial(jax.jit, static_argnames=("reps", "n_coef"))
def _micro(blk, reps: int, n_coef: int):
    return pl.pallas_call(
        functools.partial(_micro_kernel, reps, n_coef),
        grid=(1,),
        in_specs=[pl.BlockSpec((pr.K, pr.NF), lambda i: (0, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, pr.P), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, pr.P), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_coef, pr.P), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1, pr.P), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, pr.P), jnp.int32),
            jax.ShapeDtypeStruct((1, n_coef, pr.P), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n_coef, pr.P), jnp.float32)],
        interpret=INTERP,
    )(blk)


def sol_ns_per_pair(scene, vp, bones):
    """Empirical speed of light: per-(group, tile)-pair ns of the pure
    group body, differenced across two rep counts (RTT and launch
    overhead cancel)."""
    clip = device.vertex_stage(scene, jnp.asarray(vp),
                               jnp.asarray(bones))
    cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
    packed = pr.pack_cols(cols)
    blk = packed[0]                                  # one real chunk
    n_coef = pr._N_COEF[n_attr]
    # the difference r2-r1 must dwarf the tunnel's ~10 ms RTT drift
    r1, r2 = 512, 8192
    jax.block_until_ready(_micro(blk, r1, n_coef))
    jax.block_until_ready(_micro(blk, r2, n_coef))
    ests = []
    for _ in range(5):
        t2 = timed(_micro, blk, r2, n_coef)
        t1 = timed(_micro, blk, r1, n_coef)
        ests.append((t2 - t1) / ((r2 - r1) * pr.G) * 1e9)
    ests.sort()
    return ests[len(ests) // 2]


def main():
    presets = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "default", "dense", "world"]
    # force one device->host transfer FIRST: through the axon tunnel,
    # block_until_ready returns without waiting until the first
    # transfer has flipped dispatch to synchronous mode (CLAUDE.md) —
    # without this, every "timing" below is a dispatch rate (measured:
    # an impossible 0.4 ns/pair SOL)
    print(f"sync flip: {int(jnp.zeros((), jnp.int32))}", flush=True)
    sol = None
    for preset in presets:
        batch, scene, vl, bones, mtap = build(preset)
        maxc = device.auto_maxc(batch, vl[0], bones, width=W, height=H)
        if sol is None:
            sol = sol_ns_per_pair(scene, vl[0], bones)
            print(f"SOL (VMEM-resident group body, no DMA/gates): "
                  f"{sol:.1f} ns/pair", flush=True)
        binned, winning = pair_counts(scene, vl, bones, maxc)
        ms = raster_ms(scene, vl, bones, maxc, mtap)
        ns_pair = ms * 1e6 / binned
        print(f"{preset:8s} tris={batch.num_triangles} maxc={maxc} "
              f"raster={ms:.2f}ms pairs={binned} winning={winning} "
              f"slack={binned / max(winning, 1):.2f}x "
              f"ns/pair={ns_pair:.1f} util={sol / ns_pair * 100:.0f}% "
              f"floor@SOL={binned * sol / 1e6:.2f}ms "
              f"floor@SOL,winning={winning * sol / 1e6:.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
