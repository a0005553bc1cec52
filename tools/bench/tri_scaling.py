"""Triangle-count scaling sweep with the current pipeline (scan-of-N)."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from mt_renderer_tpu.render import device, pallas_raster as pr
from mt_renderer_tpu.scene import demo

W, H = 1920, 1080
N = 6

results = []
for inst, subdiv in [(1024, 4), (2048, 4), (4096, 4), (8192, 4)]:
    batch = demo.build_demo_batch(instances=inst, skinned=True,
                                  subdiv=subdiv)
    scene = device.upload(batch)
    vl = []
    for i in range(N):
        cam = demo.demo_camera(inst, W, H)
        cam.yaw = 15.0 + 3.0 * i
        vl.append(np.asarray(cam.view_proj()))
    vps = jnp.asarray(np.stack(vl))
    bones = jnp.asarray(demo.demo_bone_mats(0.3))
    maxc = device.auto_maxc(batch, vl[0], demo.demo_bone_mats(0.0),
                            width=W, height=H)

    def one(scene, vp, bones, maxc=maxc):
        c, d, _ = device._render_frame_core(
            scene, vp, bones, width=W, height=H, backend="pallas",
            maxc=maxc, packed=True)
        f = c.reshape(-1)
        return (jnp.sum(f[:: max(f.size // 512, 1)].astype(jnp.float32))
                + jnp.sum(d[::97, ::97]))

    run_n = jax.jit(lambda scene, vps, bones, one=one: jax.lax.scan(
        lambda carry, vp: (carry + one(scene, vp, bones), None),
        jnp.float32(0), vps)[0])
    run_1 = jax.jit(lambda scene, vp, bones, one=one: one(scene, vp, bones))

    _ = int(jnp.zeros((), jnp.int32))
    t0 = time.perf_counter()
    float(run_1(scene, vps[0], bones))
    jax.block_until_ready(run_n(scene, vps, bones))
    print(f"compiled {batch.num_triangles} tris (maxc={maxc}) "
          f"in {time.perf_counter()-t0:.1f}s", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        return time.perf_counter() - t0

    samples = []
    for _ in range(5):
        tn = timed(lambda: run_n(scene, vps, bones))
        t1 = timed(lambda: run_1(scene, vps[0], bones))
        samples.append((tn - t1) / (N - 1) * 1e3)
    ms = sorted(samples)[len(samples) // 2]
    tris = batch.num_triangles
    print(f"tris={tris:8d} maxc={maxc:3d} frame={ms:6.2f}ms "
          f"fps={1e3/ms:6.1f} Mtri/s={tris/ms/1e3:7.1f}", flush=True)
    results.append((tris, maxc, ms))

print("\n| tris | maxc | frame ms | fps | Mtri/s |", flush=True)
print("|---|---|---|---|---|", flush=True)
for tris, maxc, ms in results:
    print(f"| {tris:,} | {maxc} | {ms:.2f} | {1e3/ms:.1f} "
          f"| {tris/ms/1e3:.0f} |", flush=True)
