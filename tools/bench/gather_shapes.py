"""Characterize the quad-pool gather cost: rows x locality x epilogue.

r2 pinned "XLA TPU gather ~ 1 row/cycle" from the single-layer tap
(2M coherent rows ~ 2.2 ms). The peel-4 composite needs 8.3M rows and
measured ~20 ms (2.3x the per-row rate) — this scans rows and index
locality to find the real cost law, and prices the bilinear einsum
separately.

Run on the real chip: PYTHONPATH=. python tools/bench/gather_shapes.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device
from mt_renderer_tpu.scene import demo

N = 8
ROWS = {"2M": 2_088_960, "4M": 4_177_920, "8M": 8_355_840}

batch = demo.build_demo_batch(instances=16, skinned=False, subdiv=2)
scene = device.upload(batch)
pool = scene.mip_pool
npool = pool.shape[0]
print(f"pool {pool.shape} {pool.dtype}", flush=True)

rng = np.random.default_rng(0)
mk = {}
for rname, rows in ROWS.items():
    rand = rng.integers(0, npool, (N, rows), dtype=np.int32)
    # coherent: neighboring pixels hit neighboring pool rows (the
    # real layer-0 pattern), wrapping over the pool
    base = (np.arange(rows, dtype=np.int64) // 4) % npool
    coh = np.broadcast_to(base.astype(np.int32), (N, rows)).copy()
    # mix: 25% coherent, 75% clamped to row 0 (background) — the real
    # deep-layer pattern at bench coverage
    mix = np.where(rand % 4 == 0, coh, 0).astype(np.int32)
    mk[rname] = {"rand": jnp.asarray(rand), "coh": jnp.asarray(coh),
                 "mix": jnp.asarray(mix)}
f_np = rng.random((2, N, ROWS["8M"]), dtype=np.float32)
f_all = jnp.asarray(f_np)


def gathersum(idx):
    quad = jax.lax.optimization_barrier(pool[jnp.maximum(idx, 0)])
    return jnp.sum(quad[::63].astype(jnp.float32))


def bilinsum(idx, fx, fy):
    quad = jax.lax.optimization_barrier(pool[jnp.maximum(idx, 0)])
    quad = quad.reshape(quad.shape[:-1] + (4, 4)).astype(jnp.float32)
    wq = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                    (1 - fx) * fy, fx * fy], axis=-1)
    alb = jnp.einsum("...q,...qc->c...", wq, quad)
    return sum(jnp.sum(alb[c, ::63]) for c in range(4))


def make_cfg(rname, iname, bil):
    idx_all = mk[rname][iname]
    rows = idx_all.shape[1]

    @jax.jit
    def run_n(idx_all, f_all):
        def step(carry, xs):
            i, f = xs
            v = bilinsum(i, f[0, :rows], f[1, :rows]) if bil \
                else gathersum(i)
            return carry + v, None
        return jax.lax.scan(
            step, jnp.float32(0), (idx_all, jnp.moveaxis(f_all, 0, 1)))[0]

    @jax.jit
    def run_1(idx_all, f_all):
        return (bilinsum(idx_all[0], f_all[0, 0, :rows],
                         f_all[1, 0, :rows]) if bil
                else gathersum(idx_all[0]))

    return idx_all, run_n, run_1


CFGS = {}
for rname in ROWS:
    for iname in ("rand", "coh", "mix"):
        CFGS[f"{rname}-{iname}"] = make_cfg(rname, iname, False)
CFGS["8M-coh-bilin"] = make_cfg("8M", "coh", True)
CFGS["8M-mix-bilin"] = make_cfg("8M", "mix", True)

_ = int(jnp.zeros((), jnp.int32))
for name, (idx_all, run_n, run_1) in CFGS.items():
    t0 = time.perf_counter()
    v1 = float(run_1(idx_all, f_all))
    vn = float(run_n(idx_all, f_all))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {nm: [] for nm in CFGS}
for rep in range(6):
    for nm, (idx_all, run_n, run_1) in CFGS.items():
        tn = timed(run_n, idx_all, f_all)
        t1 = timed(run_1, idx_all, f_all)
        res[nm].append((tn - t1) / (N - 1) * 1e3)

print("=== medians ===", flush=True)
for nm in CFGS:
    m = sorted(res[nm])[len(res[nm]) // 2]
    rows = CFGS[nm][0].shape[1]
    print(f"{nm:14s}: {m:7.2f} ms  ({m / rows * 1e6:.2f} ns/row)",
          flush=True)
