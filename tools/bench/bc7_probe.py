"""Price the compressed-resident BC7 pool — sample-time in-register
decode cost per trilinear tap, on chip.

pool_mode="bc1" (r5) proved the compressed-resident envelope: one
128 B row gather (2x2 child + 2x2 parent BLOCK groups) + 8 in-register
single-texel decodes, speed-parity with the decoded tri pool at HBM
scale. BC1's per-texel decode is ~30 integer VPU ops. BC7 — the
reference's other hardware-decoded format (texture.rs:12-30) — is
8 modes of variable-width bitfields: the vectorised decode must
compute EVERY listed mode for every pixel and mask-select, so the
sample-time cost is the SUM of the listed modes' costs plus (for the
partitioned modes 0-3, 7) per-pixel subset/anchor lookups from the
64-entry spec tables.

This probe measures, per covered-1080p-frame's worth of pixels
(2.07M), scan-of-N round-robin on the real chip:

  gather    one 128 B row gather, checksum only        (the floor)
  bc1x8     + 8 single-texel BC1 decodes               (the shipped tap)
  bc7m6x8   + 8 single-texel BC7 decodes, mode 6 only  (opaque RGBA subset)
  bc7m456x8 + modes 4/5/6 (the single-subset modes)
  bc7allx8  + all 8 modes                              (full format)

at a cache-resident (4 MiB) and an HBM-resident (512 MiB — the bigtex
BC7 footprint class) pool. The decode consumes all 4 channels of all
8 taps (partial-channel checksums restructure the fused decode and
inflate it ~2x — the r5 bc1 lesson).

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench/bc7_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import bcn
from mt_renderer_tpu.render import device as dev

N = 8
N_IDX = 2_070_000      # one covered-1080p frame's worth of taps

_ = int(jnp.zeros((), jnp.int32))  # flip the tunnel to sync mode FIRST


def _checksum(parts):
    return sum(jnp.sum(p.astype(jnp.float32)) for p in parts)


@functools.partial(jax.jit, static_argnames=("rows", "length", "stage"))
def probe(pool, hints, idx, rows: int, length: int, stage: str):
    def step(c, _):
        acc, salt = c
        i = (idx + salt) % rows
        row = jax.lax.optimization_barrier(pool[i])       # (G, 128, 128)
        if stage == "gather":
            acc += jnp.sum(row[::32, ::32, 0].astype(jnp.float32))
        elif stage == "bc1x8":
            # the shipped bc1 tap: 8 single-texel decodes from the 8
            # baked 8 B sub-blocks (device._bc1_trilinear_fused's work)
            c0s, c1s, bits = dev._bc1_words(row[..., :64])
            texs = []
            for s in range(8):
                xt = (i + 3 * s) & 3
                yt = (i >> 2) + s & 3
                texs += dev._bc1_texel(c0s[s], c1s[s], bits[s], xt, yt)
            acc += _checksum(texs)
        else:
            modes = {"bc7m6x8": (6,), "bc7m456x8": (4, 5, 6),
                     "bc7allx8": tuple(range(8)),
                     "bc7hintx8": tuple(range(8))}[stage]
            hrows = None
            if stage == "bc7hintx8":
                # the baked partition hints ride ONE extra row-priced
                # 64 B gather per pixel (same index)
                hrows = jax.lax.optimization_barrier(hints[i])
            u = row.astype(jnp.uint32)
            texs = []
            for s in range(8):                # 8 baked 16 B blocks
                o = 16 * s
                # UNSTACKED per-pixel word scalars (a stacked (…, 4)
                # minor dim lane-pads 4 -> 128)
                w = [u[..., o + 4 * k] | (u[..., o + 4 * k + 1] << 8)
                     | (u[..., o + 4 * k + 2] << 16)
                     | (u[..., o + 4 * k + 3] << 24) for k in range(4)]
                t = (i + 5 * s) & 15
                hint = ((hrows[..., 2 * s], hrows[..., 2 * s + 1])
                        if hrows is not None else None)
                texs += bcn.bc7_texel_device(w, t, modes=modes, hint=hint)
            acc += _checksum(texs)
        return (acc, salt + 1), None

    return jax.lax.scan(step, (jnp.float32(0), jnp.int32(0)),
                        None, length=length)[0][0]


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


def build_pool(rows: int):
    rng = np.random.default_rng(7)
    pool = rng.integers(0, 256, (rows, 128), dtype=np.uint8)
    # valid BC7 mode prefixes on every 16 B block (content only affects
    # values, not cost — every listed mode always computes — but keep
    # the bytes decodable); sub-blocks 0-3 double as the bc1 stage's
    # 8 B blocks, any bytes are valid BC1
    mode = rng.integers(0, 8, (rows, 8))
    for s in range(8):
        b0 = pool[:, 16 * s].astype(np.int64)
        m = mode[:, s]
        pool[:, 16 * s] = ((1 << m) | ((b0 << (m + 1)) & 0xFF)).astype(
            np.uint8)
    hints = bcn.bc7_block_hints(pool.reshape(-1, 16)).reshape(rows, 16)
    return jnp.asarray(pool), jnp.asarray(hints)


def measure(pool, hints, rows: int, stage: str) -> float:
    # 2-D (G, 128) indices: every per-pixel scalar derived from the
    # gathered rows is then 128-lane-minor, matching the production
    # tile-major shade. The SAME decode on flat (P,) 1-D arrays
    # measured 23x slower (186.7 vs 8.0 ms for the index-read stage —
    # the T(1024) 1-D tiling relayouts per op); never price per-pixel
    # epilogue work on 1-D shapes.
    idx = jnp.asarray(
        np.random.default_rng(0).integers(
            0, rows, N_IDX // 128 * 128).astype(np.int32).reshape(-1, 128))
    jax.block_until_ready(probe(pool, hints, idx, rows, N, stage))
    jax.block_until_ready(probe(pool, hints, idx, rows, 1, stage))
    ests = []
    for _ in range(5):
        tn = timed(probe, pool, hints, idx, rows, N, stage)
        t1 = timed(probe, pool, hints, idx, rows, 1, stage)
        ests.append((tn - t1) / (N - 1) * 1e3)
    ests.sort()
    return ests[len(ests) // 2]


if __name__ == "__main__":
    stages = ("gather", "bc1x8", "bc7m6x8", "bc7m456x8", "bc7allx8",
              "bc7hintx8")
    for label, rows in (("cache 4MiB", 32_768), ("hbm 512MiB", 4_194_304)):
        pool, hints = build_pool(rows)
        base = None
        print(f"\n{label} ({rows} rows x 128 B), {N_IDX} taps/frame:",
              flush=True)
        for stage in stages:
            ms = measure(pool, hints, rows, stage)
            if stage == "gather":
                base = ms
                print(f"  {stage:>10s}: {ms:7.2f} ms/frame", flush=True)
            else:
                per_tap = (ms - base) / (8 * N_IDX) * 1e6
                print(f"  {stage:>10s}: {ms:7.2f} ms/frame   "
                      f"decode {ms - base:7.2f} ms   "
                      f"{per_tap:6.2f} ns/texel-decode", flush=True)
