"""Gather cost vs ROW WIDTH — the number that decides whether
trilinear can become ONE gather.

The two-regime law (bigtex_probe.py) priced 16 B rows: ~1.6 ns/row
cache-resident, ~8.1 ns/row HBM-resident, width 4 vs 16 B free. The
production trilinear shade pays TWO 16 B gathers per pixel (quad at
level m, quad at level m+1). If a 64 B row costs ~one 16 B row, a
fused "tri-row" pool (quad at m + the 3x3 parent block at m+1 in one
row) halves the trilinear gather bill: ~16 ms of a covered 1080p
GB-pool frame, ~2.7 ms of world's.

Measures ns/row for widths 16/32/64/128/256 B at a cache-resident
(~4 MiB @16 B) and an HBM-resident (~0.5 GiB @64 B) footprint, random
indices, both with the production optimization_barrier pin and the
bigtex_probe-style unpinned sum (for comparability with the r4 curve).

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench/gather_width.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 8
N_IDX = 2_070_000      # one covered-1080p frame's worth of rows


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST


@functools.partial(jax.jit,
                   static_argnames=("rows", "length", "pin", "two"))
def probe(pool, idx, rows: int, length: int, pin: bool, two: bool):
    def step(c, _):
        acc, salt = c
        out = pool[(idx + salt) % rows]
        if pin:
            out = jax.lax.optimization_barrier(out)
        acc += jnp.sum(out[::4096, 0].astype(jnp.float32))
        if two:
            out2 = pool[(idx + salt + 7) % rows]
            if pin:
                out2 = jax.lax.optimization_barrier(out2)
            acc += jnp.sum(out2[::4096, 0].astype(jnp.float32))
        return (acc, salt + 1), None
    return jax.lax.scan(step, (jnp.float32(0), jnp.int32(0)),
                        None, length=length)[0][0]


def measure(rows, width, pin, two=False):
    pool = jnp.zeros((rows, width), jnp.uint8)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, rows, N_IDX).astype(np.int32))
    jax.block_until_ready(probe(pool, idx, rows, N, pin, two))
    jax.block_until_ready(probe(pool, idx, rows, 1, pin, two))
    ests = []
    for _ in range(5):
        tn = timed(probe, pool, idx, rows, N, pin, two)
        t1 = timed(probe, pool, idx, rows, 1, pin, two)
        ests.append((tn - t1) / (N - 1) / N_IDX * 1e9)
    ests.sort()
    return ests[len(ests) // 2]


if __name__ == "__main__":
    print("footprint-matched width sweep (ns per gathered row, random "
          "idx):", flush=True)
    print(f"{'rows':>12s} {'width':>6s} {'MiB':>8s} {'pin':>4s} "
          f"{'ns/row':>8s}", flush=True)
    for label, base_rows in (("cache", 262_144), ("hbm", 8_388_608)):
        for width in (16, 32, 64, 128, 256):
            for pin in (False, True):
                rows = base_rows
                ns = measure(rows, width, pin)
                mib = rows * width / 2**20
                print(f"{rows:12d} {width:6d} {mib:8.1f} "
                      f"{'y' if pin else 'n':>4s} {ns:8.2f}", flush=True)

    print("\nthe trilinear decision: TWO 16 B gathers vs ONE 64 B "
          "gather,\nsame texel count (64 B pool has 4x footprint):",
          flush=True)
    for label, rows in (("cache", 262_144), ("hbm", 8_388_608)):
        two16 = measure(rows, 16, True, two=True)
        one64 = measure(rows, 64, True)
        print(f"{label:>6s}: 2x16B={two16:6.2f} ns/row-pair   "
              f"1x64B={one64:6.2f}   ratio={two16 / one64:.2f}x",
              flush=True)
