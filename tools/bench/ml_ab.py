"""Stage attribution for the single-pass multi-layer (OIT) kernel.

Round-robin scan-of-N A/B over kernel variants (see
pallas_raster._raster_fwd_ml_kernel ``variant``) to locate where the
multi-layer frame time goes:

  sl          single-layer tap kernel (reference floor)
  ml          full ML kernel (pass1 L-extractions + pass2 id-match)
  ml-np2      pass 2 skipped (attrs are garbage; checksum uses z/id)
  ml-x1np2    1 extraction/group, no pass 2  (~pass-1 base cost)
  ml-group    pass 2 at group (KG) granularity instead of sub-block
  pipe-ml     full peeled pipeline, single-pass kernel, packed
  pipe-mp     full peeled pipeline, multipass (r2 formulation)
  pipe-sp     full peeled pipeline, split engine (opaque fast path +
              ML for translucent; -ct = compacted tap caps)

Run on the real chip: PYTHONPATH=. python tools/bench/ml_ab.py
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
scene = device.upload(batch)
cams = []
for i in range(N):
    cam = demo.demo_camera(1024, W, H)
    cam.yaw = 15.0 + 3.0 * i
    cams.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(cams))
bones = jnp.asarray(demo.demo_bone_mats(0.3))
maxc = device.auto_maxc(batch, cams[0], demo.demo_bone_mats(0.0),
                        width=W, height=H)
interp = jax.default_backend() != "tpu"
print(f"maxc={maxc} interp={interp}", flush=True)


def raster_only(scene, vp, variant):
    clip = device.vertex_stage(scene, vp, bones)
    cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
    kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
              n_attr=n_attr, tap=True, w_eps=device.W_EPS, flat=True)
    if variant == "sl":
        zb, ib, tattrs, tapidx, _ = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, **kw)
    else:
        zb, ib, tattrs, tapidx, _ = pr.raster_pallas_fwd_ml(
            (cols, bbox), None, 0, 0, layers=L, variant=variant, **kw)
    return (jnp.sum(zb[::7, :, ::31]) + jnp.sum(ib[::7, :, ::31])
            + jnp.sum(tattrs[::7, :, ::31]))


SPLIT_TILES = device.measure_live_tap_tiles(
    scene, cams[0], bones, width=W, height=H, layers=L, maxc=maxc,
    mode="split")
TAP_TILES = device.measure_live_tap_tiles(
    scene, cams[0], bones, width=W, height=H, layers=L, maxc=maxc)
print(f"tap_tiles={TAP_TILES} (dense would be "
      f"{(PW // pr.TILE_W) * (PH // pr.TILE_H) * L})", flush=True)


def pipe(scene, vp, mode, tap_tiles=None):
    c, d, _ = device._render_frame_peeled_core(
        scene, vp, bones, width=W, height=H, layers=L, backend="pallas",
        maxc=maxc, peel_mode=mode, packed=mode in ("ml", "split"),
        tap_tiles=tap_tiles)
    f = c.reshape(-1)
    return (jnp.sum(f[:: max(f.size // 512, 1)].astype(jnp.float32))
            + jnp.sum(d[::97, ::97]))


def epilogue(scene, vp, stage):
    """Raster-ml + epilogue stages, cumulative: locate where the
    pipeline time beyond the kernel goes (gather vs blend vs pack)."""
    clip = device.vertex_stage(scene, vp, bones)
    cols, bbox, n_attr = device.setup_packed_cols(scene, clip, W, H)
    kw = dict(width=PW, height=PH, maxc=maxc, interpret=interp,
              n_attr=n_attr, tap=True, w_eps=device.W_EPS, flat=True)
    zb, ib, tattrs, tapidx, _ = pr.raster_pallas_fwd_ml(
        (cols, bbox), None, 0, 0, layers=L, **kw)
    nt, _, p = tapidx.shape
    if stage == "gather":
        a4 = tattrs.reshape(nt, L, 6, p)
        alb = device._tap_albedo_channels(
            scene.mip_pool, tapidx, a4[:, :, 0], a4[:, :, 1])
        return sum(jnp.sum(a[::7, :, ::31]) for a in alb)
    dst, _ = device.composite_peeled_tap_flat(
        scene, tattrs, tapidx, ib, L, (255, 255, 255, 255))
    if stage == "blend":
        return sum(jnp.sum(d[::7, ::31]) for d in dst)
    pk = device.pack_u32_channels(dst)
    color = pr.unflatten_tiles(pk, PH, PW)[:H, :W]
    f = color.reshape(-1)
    return (jnp.sum(f[:: max(f.size // 512, 1)].astype(jnp.float32))
            + jnp.sum(pr.unflatten_tiles(zb[:, 0, :], PH, PW)[::97, ::97]))


CFGS = {
    "sl": lambda s, v: raster_only(s, v, "sl"),
    "ml": lambda s, v: raster_only(s, v, "full"),
    "ml-np2": lambda s, v: raster_only(s, v, "nopass2"),
    "ml-x1np2": lambda s, v: raster_only(s, v, "extract1+nopass2"),
    "ml-group": lambda s, v: raster_only(s, v, "groupsel"),
    "ml+g4": lambda s, v: epilogue(s, v, "gather"),
    "ml+blend": lambda s, v: epilogue(s, v, "blend"),
    "ml+pack": lambda s, v: epilogue(s, v, "pack"),
    "ml-nocull": lambda s, v: raster_only(s, v, "nocull"),
    "ml-noxg": lambda s, v: raster_only(s, v, "noxgate"),
    "pipe-ml": lambda s, v: pipe(s, v, "ml"),
    "pipe-ml-ct": lambda s, v: pipe(s, v, "ml", TAP_TILES),
    "pipe-mp": lambda s, v: pipe(s, v, "multipass"),
    "pipe-sp": lambda s, v: pipe(s, v, "split"),
    "pipe-sp-ct": lambda s, v: pipe(s, v, "split", SPLIT_TILES),
}


@functools.partial(jax.jit, static_argnames=("name",))
def run_n(scene, vps, name):
    def step(carry, vp):
        return carry + CFGS[name](scene, vp).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("name",))
def run_1(scene, vp, name):
    return CFGS[name](scene, vp).astype(jnp.float32)


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST
names = list(CFGS)
for name in names:
    t0 = time.perf_counter()
    v1 = float(run_1(scene, vps[0], name))
    t1 = time.perf_counter()
    vn = float(run_n(scene, vps, name))
    print(f"compile {name}: single {t1-t0:.1f}s scan "
          f"{time.perf_counter()-t1:.1f}s ({v1:.0f}/{vn:.0f})", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {n: [] for n in names}
for rep in range(6):
    for name in names:
        tn = timed(run_n, scene, vps, name)
        t1 = timed(run_1, scene, vps[0], name)
        per = (tn - t1) / (N - 1) * 1e3
        res[name].append(per)
        print(f"rep{rep} {name:9s}: per-frame={per:7.2f}ms", flush=True)

print("\n=== medians ===", flush=True)
for name in names:
    m = sorted(res[name])[len(res[name]) // 2]
    print(f"{name:9s}: {m:7.2f} ms", flush=True)
