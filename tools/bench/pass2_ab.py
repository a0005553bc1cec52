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


XREC_CAP = 512           # overwritten from the view-0 census below


def recover_attrs_xla(ct, it, n_attr, cap: int):
    """Gather-based pass-2: per live (tile, layer) ROW, gather each
    pixel's winner coefficient row from a u8-packed per-triangle table
    (cols are already in global-id order — pack_cols only relayouts)
    and evaluate the tap epilogue in XLA. Returns (tattrs
    (nt, L*6, P), tapidx (nt, L, P)) matching the kernel's outputs."""
    n_coef = pr._N_COEF[n_attr]
    tbl = ct[:, 15:15 + n_coef]
    tbl = jnp.pad(tbl, ((0, 0), (0, 32 - n_coef)))
    # u8 view: a (T, 128)-byte row gathers unpadded (f32 (T, 32) would
    # lane-pad 32 -> 128 and 4x the touched footprint)
    tbl8 = jax.lax.bitcast_convert_type(tbl, jnp.uint8).reshape(-1, 128)
    nt, lyr, p = it.shape
    n = nt * lyr
    ids = it.reshape(n, p)
    live = jnp.any(ids >= 0, axis=1)
    sr, slot, n_over = device._compact_live_rows(live, cap)
    idc = jnp.maximum(ids[sr], 0)                          # (cap, P)
    g = jax.lax.optimization_barrier(tbl8[idc])            # (cap, P, 128)
    a = jax.lax.bitcast_convert_type(
        g.reshape(cap, p, 32, 4), jnp.float32)             # (cap, P, 32)

    t = sr // lyr                                          # (cap,)
    n_tx = PW // pr.TILE_W
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = ((t % n_tx)[:, None] * pr.TILE_W
          + lane % pr.TILE_W).astype(jnp.float32) + 0.5    # (cap, P)
    py = ((t // n_tx)[:, None] * pr.TILE_H
          + lane // pr.TILE_W).astype(jnp.float32) + 0.5

    def ev(i):
        return a[..., i] * px + a[..., i + 1] * py + a[..., i + 2]

    w1 = ev(6)
    eps = jnp.float32(device.W_EPS)
    inv = 1.0 / jnp.where(jnp.abs(w1) < eps, eps, w1)
    u = ev(0) * inv
    v = ev(3) * inv
    th = a[..., 16]
    tw = a[..., 17]
    x = u * tw - 0.5
    y = v * th - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = jnp.where(x0f < 0, 0.0, x - x0f)
    fy = jnp.where(y0f < 0, 0.0, y - y0f)
    wwi = tw.astype(jnp.int32)
    hhi = th.astype(jnp.int32)
    x0c = jnp.clip(x0f.astype(jnp.int32), 0, jnp.maximum(wwi - 1, 0))
    y0c = jnp.clip(y0f.astype(jnp.int32), 0, jnp.maximum(hhi - 1, 0))
    offi = (a[..., 14].astype(jnp.int32) * 4096
            + a[..., 15].astype(jnp.int32))
    tapidx_c = jnp.where(a[..., 9] >= 0.0,
                         offi + y0c * wwi + x0c, -1)       # (cap, P)
    attrs_c = [fx, fy, a[..., 10] * 1.0, a[..., 11] * 1.0,
               a[..., 12] * 1.0, a[..., 13] * 1.0]
    # expand back to dense rows: ONE row gather serves all 6 attr
    # planes (lane-concatenated), pad row = zeros; tapidx separately
    allc = jnp.concatenate(attrs_c, axis=1)                # (cap, 6P)
    allc = jnp.concatenate(
        [allc, jnp.zeros((1, 6 * p), jnp.float32)])[slot]  # (n, 6P)
    tat = allc.reshape(nt, lyr, 6, p).reshape(nt, lyr * 6, p)
    tidp = jnp.concatenate(
        [tapidx_c, jnp.zeros((1, p), jnp.int32)])[slot]    # (n, P)
    tid = tidp.reshape(nt, lyr, p)
    return tat, tid, n_over


def prefix(scene, vp, name):
    variant = CFGS[name]
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
    base = chk(zo) + chk(zt[::7, :, ::31]) + chk(it[::7, :, ::31])
    if name.endswith("+a"):
        if "nopass2" in variant:                           # xrec rung
            tat_tr, tid_tr, _ = recover_attrs_xla(ct, it, n_attr,
                                                  XREC_CAP)
        return (base + chk(tat_tr[:, ::5, ::31])
                + chk(tid_tr[::7, :, ::31].astype(jnp.float32)))
    # serialize through zt/it only — the attrs are zeros under nopass2
    return base


CFGS = {
    "trml/full": "nocull",
    "trml/nopass2": "nocull-nopass2",
    "trml/full+a": "nocull",
    "trml/xrec+a": "nocull-nopass2",
}


@functools.partial(jax.jit, static_argnames=("name",))
def run_n(scene, vps, name):
    def step(c, vp):
        return c + prefix(scene, vp, name).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@functools.partial(jax.jit, static_argnames=("name",))
def run_1(scene, vp, name):
    return prefix(scene, vp, name).astype(jnp.float32)


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
live_tl = int(jnp.sum(jnp.any(it >= 0, axis=-1)))
n_coef = pr._N_COEF[n_attr]
XREC_CAP = -(-int(live_tl * 1.3) // 8) * 8
print(f"live (pixel, layer) rows at view 0: {live_pl} "
      f"(gather-law price {live_pl * 2.1e-6:.2f} ms; n_coef={n_coef}, "
      f"table {n_coef * 4} B/row); live (tile, layer) rows {live_tl} "
      f"-> xrec cap {XREC_CAP} ({XREC_CAP * 2048 * 1.7e-6:.2f} ms at "
      f"1.7 ns/row)", flush=True)

# one-off exactness check: xrec vs the kernel's pass 2 at view 0
tat_k, tid_k, _ = pr.raster_pallas_fwd_ml(
    (ct, bt), None, 0, 0, layers=L, variant="nocull", zhi=zo_eff,
    **kw)[2:]
tat_x, tid_x, xover = recover_attrs_xla(ct, it, n_attr, XREC_CAP)
livem = (it >= 0)
tid_mism = int(jnp.sum((tid_k != tid_x) & livem))
a4k = tat_k.reshape(tat_k.shape[0], L, 6, -1)
a4x = tat_x.reshape(tat_x.shape[0], L, 6, -1)
d = jnp.abs(a4k - a4x) * livem[:, :, None, :]
print(f"xrec vs kernel at view 0: tapidx mismatches {tid_mism} "
      f"/ {live_pl} live, attr max |d| {float(jnp.max(d)):.3e}, "
      f"cap overflow {int(xover)}", flush=True)

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
