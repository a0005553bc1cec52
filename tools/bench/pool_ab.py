"""Quad (16 B/texel) vs narrow (4 B/texel) texel-pool A/B.

The quad pool bakes each texel's 2x2 bilinear footprint into one row
(one gather per tap — gathers are row-count priced); the narrow pool
stores bare RGBA and issues FOUR clamped gathers per tap. This measures
the ms cost of the 4x memory saving on the mipmap pallas path (the one
production path that supports narrow pools), scan-of-N methodology.

Run on the real chip: PYTHONPATH=. python tools/bench/pool_ab.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
N = 8

batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
scenes = {
    "quad": device.upload(batch),
    "narrow": device.upload(batch, pool_mode="narrow"),
}
for name, sc in scenes.items():
    print(name, device.pool_stats(sc), flush=True)
cams = []
for i in range(N):
    cam = demo.demo_camera(1024, W, H)
    cam.yaw = 15.0 + 3.0 * i
    cams.append(np.asarray(cam.view_proj()))
vps = jnp.asarray(np.stack(cams))
bones = jnp.asarray(demo.demo_bone_mats(0.3))
maxc = device.auto_maxc(batch, cams[0], demo.demo_bone_mats(0.0),
                        width=W, height=H)
print(f"maxc={maxc}", flush=True)


def one(scene, vp):
    c, d, _ = device._render_frame_core(
        scene, vp, bones, width=W, height=H, backend="pallas",
        maxc=maxc, mipmap=True)
    f = c.reshape(-1)
    return (jnp.sum(f[:: max(f.size // 512, 1)].astype(jnp.float32))
            + jnp.sum(d[::97, ::97]))


@jax.jit
def run_n(scene, vps):
    def step(carry, vp):
        return carry + one(scene, vp).astype(jnp.float32), None
    return jax.lax.scan(step, jnp.float32(0), vps)[0]


@jax.jit
def run_1(scene, vp):
    return one(scene, vp).astype(jnp.float32)


_ = int(jnp.zeros((), jnp.int32))     # flip the tunnel to sync mode
for name, sc in scenes.items():
    t0 = time.perf_counter()
    v1 = float(run_1(sc, vps[0]))
    vn = float(run_n(sc, vps))
    print(f"compile {name}: {time.perf_counter()-t0:.1f}s "
          f"({v1:.0f}/{vn:.0f})", flush=True)


def timed(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


res = {n: [] for n in scenes}
for rep in range(6):
    for name, sc in scenes.items():
        tn = timed(run_n, sc, vps)
        t1 = timed(run_1, sc, vps[0])
        per = (tn - t1) / (N - 1) * 1e3
        res[name].append(per)
        print(f"rep{rep} {name:7s}: per-frame={per:7.2f}ms", flush=True)

print("\n=== medians (mipmap path, 1080p/196k tris) ===", flush=True)
for name in res:
    m = sorted(res[name])[len(res[name]) // 2]
    st = device.pool_stats(scenes[name])
    print(f"{name:7s}: {m:7.2f} ms   ({st['bytes']} pool bytes, "
          f"{st['bytes_per_src_texel']} B/src texel)", flush=True)
