"""A/B bilinear-contraction formulations over the quad-row gather.

gather_shapes.py showed the (…, 4, 4) einsum DOUBLES the tap cost
(≈ +1.2 ns/row): 16-lane minor layouts waste 32x of the VPU. Candidate
reformulations, all consuming the same one-gather quad rows:

  einsum   current production form (f32 weights x u8->f32 quad)
  swar     u32 view, 4 lane slices, 8-bit-weight integer lerp in
           0x00FF00FF / 0xFF00FF00 field pairs (lane-perfect (N,) ops)
  swar-pl  swar but inside a pallas kernel (controls layout/fusion)
  planar   XLA transpose (N, 16) -> (16, N) then planar f32 math

Run on the real chip: PYTHONPATH=. python tools/bench/bilin_ab.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device
from mt_renderer_tpu.scene import demo

N = 8
ROWS = 8_355_840

batch = demo.build_demo_batch(instances=16, skinned=False, subdiv=2)
scene = device.upload(batch)
pool = scene.mip_pool
npool = pool.shape[0]
pool_u32 = jax.lax.bitcast_convert_type(
    pool.reshape(npool, 4, 4), jnp.uint32)           # (npool, 4)
print(f"pool {pool.shape} -> u32 {pool_u32.shape}", flush=True)

rng = np.random.default_rng(0)
idx_all = jnp.asarray(
    rng.integers(0, npool, (N, ROWS), dtype=np.int32))
f_all = jnp.asarray(rng.random((2, N, ROWS), dtype=np.float32))


def checksum(alb):
    return sum(jnp.sum(a[::63]) for a in alb)


def run_einsum(idx, fx, fy):
    quad = jax.lax.optimization_barrier(pool[jnp.maximum(idx, 0)])
    quad = quad.reshape(quad.shape[:-1] + (4, 4)).astype(jnp.float32)
    wq = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                    (1 - fx) * fy, fx * fy], axis=-1)
    alb = jnp.einsum("...q,...qc->c...", wq, quad)
    return checksum([alb[c] for c in range(4)])


def _swar_lerp(t0, t1, w):
    """8-bit-field lerp of two packed-RGBA u32 vectors with integer
    weight w in 0..256 (w=0 -> t0, w=256 -> t1), round-to-nearest."""
    rb0 = t0 & jnp.uint32(0x00FF00FF)
    rb1 = t1 & jnp.uint32(0x00FF00FF)
    ga0 = (t0 >> 8) & jnp.uint32(0x00FF00FF)
    ga1 = (t1 >> 8) & jnp.uint32(0x00FF00FF)
    iw = w.astype(jnp.uint32)
    rb = (rb0 * (jnp.uint32(256) - iw) + rb1 * iw
          + jnp.uint32(0x00800080)) >> 8
    ga = (ga0 * (jnp.uint32(256) - iw) + ga1 * iw
          + jnp.uint32(0x00800080)) >> 8
    return (rb & jnp.uint32(0x00FF00FF)) | (
        (ga & jnp.uint32(0x00FF00FF)) << 8)


def swar_math(q32, fx, fy):
    t = [q32[..., i] for i in range(4)]
    wx = jnp.clip(fx * 256.0 + 0.5, 0, 256).astype(jnp.int32)
    wy = jnp.clip(fy * 256.0 + 0.5, 0, 256).astype(jnp.int32)
    top = _swar_lerp(t[0], t[1], wx)
    bot = _swar_lerp(t[2], t[3], wx)
    out = _swar_lerp(top, bot, wy)
    return [(out >> (8 * c)) & jnp.uint32(0xFF) for c in range(4)]


def run_swar(idx, fx, fy):
    q32 = jax.lax.optimization_barrier(pool_u32[jnp.maximum(idx, 0)])
    alb = swar_math(q32, fx, fy)
    return checksum([a.astype(jnp.float32) for a in alb])


def _swar_kernel(q_ref, fx_ref, fy_ref, o_ref):
    alb = swar_math(q_ref[...], fx_ref[...], fy_ref[...])
    o_ref[...] = (alb[0] | (alb[1] << 8) | (alb[2] << 16)
                  | (alb[3] << 24)).astype(jnp.uint32)


def run_swar_pl(idx, fx, fy):
    q32 = jax.lax.optimization_barrier(pool_u32[jnp.maximum(idx, 0)])
    n = idx.shape[0]
    blk = 65536
    interp = jax.default_backend() != "tpu"
    out = jax.experimental.pallas.pallas_call(
        _swar_kernel,
        grid=(n // blk,),
        in_specs=[
            jax.experimental.pallas.BlockSpec((blk, 4), lambda i: (i, 0)),
            jax.experimental.pallas.BlockSpec((blk,), lambda i: (i,)),
            jax.experimental.pallas.BlockSpec((blk,), lambda i: (i,)),
        ],
        out_specs=jax.experimental.pallas.BlockSpec((blk,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.uint32),
        interpret=interp,
    )(q32, fx, fy)
    return jnp.sum((out[::63] & 0xFF).astype(jnp.float32))


def run_planar(idx, fx, fy):
    quad = jax.lax.optimization_barrier(pool[jnp.maximum(idx, 0)])
    qt = quad.T.astype(jnp.float32)                   # (16, N)
    w = [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy]
    alb = [sum(w[q] * qt[q * 4 + c] for q in range(4)) for c in range(4)]
    return checksum(alb)


CFGS = {"einsum": run_einsum, "swar": run_swar,
        "planar": run_planar}
# swar-pl: 1-D-block pallas variant wedged Mosaic compilation >25 min —
# dropped; the XLA swar form already controls layout via u32 SWAR


def make(fn):
    @jax.jit
    def run_n(idx_all, f_all):
        def step(carry, xs):
            i, f = xs
            return carry + fn(i, f[0], f[1]), None
        return jax.lax.scan(
            step, jnp.float32(0), (idx_all, jnp.moveaxis(f_all, 0, 1)))[0]

    @jax.jit
    def run_1(idx_all, f_all):
        return fn(idx_all[0], f_all[0, 0], f_all[1, 0])

    return run_n, run_1


import jax.experimental.pallas  # noqa: E402

RUNS = {nm: make(fn) for nm, fn in CFGS.items()}

_ = int(jnp.zeros((), jnp.int32))
for nm, (run_n, run_1) in RUNS.items():
    t0 = time.perf_counter()
    v1 = float(run_1(idx_all, f_all))
    vn = float(run_n(idx_all, f_all))
    print(f"compile {nm}: {time.perf_counter()-t0:.1f}s "
          f"({v1:.0f}/{vn:.0f})", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {nm: [] for nm in RUNS}
for rep in range(6):
    for nm, (run_n, run_1) in RUNS.items():
        tn = timed(run_n, idx_all, f_all)
        t1 = timed(run_1, idx_all, f_all)
        res[nm].append((tn - t1) / (N - 1) * 1e3)

print("=== medians (8.3M rows, gather included) ===", flush=True)
for nm in RUNS:
    m = sorted(res[nm])[len(res[nm]) // 2]
    print(f"{nm:8s}: {m:7.2f} ms  ({m / ROWS * 1e6:.2f} ns/row)",
          flush=True)
