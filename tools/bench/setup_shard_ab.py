"""Price the sharded-setup trade (tiles.py setup_shard) on ONE chip.

The 8-chip default band frame is 2.18 ms, ~1 ms of it the per-chip
REPLICATED vertex+setup+bin floor (docs/MULTICHIP.md, the 4.05x
scaling tail). ``setup_shard=True`` computes setup over Tp/n triangles
per chip and all-gathers the column matrix — compute saving vs ONE
ICI collective. The densest-band method can't run the collective on
one chip, so this measures the two sides separately:

1. the SETUP-ONLY cost at Tp vs Tp/n triangles (scan-of-N differenced
   — the per-chip compute saving, using the exact production
   _scene_tri_shard view + setup_packed_cols);
2. the gathered bytes (cols + bbox), priced at a stated ICI bandwidth
   (v5e: ~45 GB/s/direction per link, 1-D ring all-gather moves
   (n-1)/n of the payload through each link).

Verdict = saving vs collective price + the measured band frame.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench/setup_shard_ab.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.parallel import tiles
from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
N = 16
NCHIPS = 8

_ = int(jnp.zeros((), jnp.int32))     # tunnel -> sync mode
interp = jax.default_backend() != "tpu"

batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
scene = device.upload(batch)
bones_np = demo.demo_bone_mats(0.3)
bones = jnp.asarray(bones_np)
cam = demo.demo_camera(1024, W, H)
vl = []
for i in range(N):
    cam.yaw = 15.0 + 0.8 * np.sin(0.25 * i)
    vl.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(vl))

tp = scene.tri_valid.shape[0]
shard_t = -(-tp // (NCHIPS * device.TRI_PAD)) * device.TRI_PAD
print(f"tp={tp} shard_t={shard_t} ({NCHIPS} chips)", flush=True)


def chk(x):
    f = x.reshape(-1)
    return jnp.sum(f[:: max(f.size // 512, 1)].astype(jnp.float32))


def setup_full(scene, vp):
    clip = device.vertex_stage(scene, vp, bones)
    cols, bbox, _ = device.setup_packed_cols(scene, clip, W, H,
                                             bone_mats=bones)
    return chk(cols) + sum(chk(b) for b in bbox)


def setup_shardv(scene, vp):
    shard = tiles._scene_tri_shard(scene, jnp.int32(0), shard_t, tp)
    clip = device.vertex_stage(shard, vp, bones)
    cols, bbox, _ = device.setup_packed_cols(shard, clip, W, H,
                                             bone_mats=bones)
    return chk(cols) + sum(chk(b) for b in bbox)


def make(fn):
    def run_n(scene, vps):
        def step(c, vp):
            return c + fn(scene, vp), None
        return jax.lax.scan(step, jnp.float32(0), vps)[0]
    return jax.jit(lambda s, v: fn(s, v)), jax.jit(run_n)


def timed(f, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(f(*a))
    return time.perf_counter() - t0


runners = {"full": make(setup_full), "shard": make(setup_shardv)}
for m, (r1, rn) in runners.items():
    t0 = time.perf_counter()
    v1 = float(r1(scene, vps[0]))
    jax.block_until_ready(rn(scene, vps))
    print(f"compile {m}: {time.perf_counter() - t0:.0f}s ({v1:.0f})",
          flush=True)

res = {m: [] for m in runners}
for rep in range(6):
    for m, (r1, rn) in runners.items():
        tn = timed(rn, scene, vps)
        t1 = timed(r1, scene, vps[0])
        res[m].append((tn - t1) / (N - 1) * 1e3)
meds = {m: sorted(v)[len(v) // 2] for m, v in res.items()}
print(f"setup+vertex: full={meds['full']:.3f}ms "
      f"shard(1/{NCHIPS})={meds['shard']:.3f}ms "
      f"saving={meds['full'] - meds['shard']:.3f}ms", flush=True)

# collective price (law, stated assumptions)
n_attr_cols = 15 + pr.ATTRS_BASE
clip0 = device.vertex_stage(scene, jnp.asarray(vl[0]), bones)
cols, bbox, _ = device.setup_packed_cols(scene, clip0, W, H,
                                         bone_mats=bones)
bytes_cols = cols.size * 4 + sum(b.size * 4 for b in bbox)
for bw_gbs in (25.0, 45.0, 90.0):
    ici_ms = bytes_cols * (NCHIPS - 1) / NCHIPS / (bw_gbs * 1e9) * 1e3
    print(f"all_gather payload {bytes_cols / 2**20:.1f} MiB -> "
          f"{ici_ms:.3f} ms at {bw_gbs:.0f} GB/s ICI", flush=True)
net = meds["full"] - meds["shard"]
print(f"verdict: saving {net:.3f} ms/chip vs collective above — "
      f"adopt iff saving > collective at your topology", flush=True)
