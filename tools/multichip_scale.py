"""Multichip scaling table — BASELINE config 5 measurement harness.

Renders the 1080p-class archive-style scene band-sharded over 1/2/4/8
devices and prints a markdown table of per-frame times for both
strategies (band split and geometry split).

On this environment the mesh is 8 *virtual* CPU devices sharing one
host's cores (`XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu`), so the table validates CORRECTNESS and the
collective structure, not wall-clock speedup — the virtual devices
contend for the same cores. Real-chip perf is the single-chip TPU bench
(bench.py); on a real ICI mesh the band split has zero per-frame
collectives, so its scaling is bounded only by the per-band triangle
setup recompute.

Run:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/multichip_scale.py
"""

from __future__ import annotations

import os
import sys
import time

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mt_renderer_tpu.parallel.tiles import (  # noqa: E402
    make_row_mesh,
    render_frame_geomsplit,
    render_frame_multichip,
)
from mt_renderer_tpu.render import device  # noqa: E402
from mt_renderer_tpu.scene import demo  # noqa: E402

WIDTH, HEIGHT = 1920, 1024
GW, GH = 192, 128   # geomsplit rasterises full-frame per chip
FRAMES = 3


def main():
    n_avail = len(jax.devices())
    batch = demo.build_demo_batch(instances=64, skinned=True, subdiv=2)
    scene = device.upload(batch)
    cam = demo.demo_camera(64, WIDTH, HEIGHT)
    vp = np.asarray(cam.view_proj())
    bones = demo.demo_bone_mats(0.5)

    rows = []
    ref = None
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        mesh = make_row_mesh(n)

        maxc = device.auto_maxc(batch, vp, bones, width=WIDTH,
                                height=HEIGHT)

        def frame():
            return render_frame_multichip(
                scene, vp, bones, mesh=mesh, width=WIDTH, height=HEIGHT,
                backend="pallas", maxc=maxc,
            )

        c, d = frame()
        jax.block_until_ready((c, d))
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            c, d = frame()
        jax.block_until_ready((c, d))
        ms = (time.perf_counter() - t0) / FRAMES * 1e3

        gc, gd = render_frame_geomsplit(
            scene, vp, bones, mesh=mesh, width=GW, height=GH
        )
        jax.block_until_ready((gc, gd))
        t0 = time.perf_counter()
        gc, gd = render_frame_geomsplit(
            scene, vp, bones, mesh=mesh, width=GW, height=GH
        )
        jax.block_until_ready((gc, gd))
        gms = (time.perf_counter() - t0) * 1e3

        cov = float(np.mean(np.asarray(d) < 1.0))
        if ref is None:
            ref = np.asarray(c)
            match = 1.0
        else:
            match = float((np.asarray(c) == ref).mean())
        rows.append((n, ms, gms, cov, match))
        print(f"# {n} devices: band {ms:.0f} ms, geomsplit({GW}x{GH}) {gms:.0f} ms, "
              f"coverage {cov:.3f}, pixel match vs 1-dev {match:.6f}",
              flush=True)

    print(f"\n{WIDTH}x{HEIGHT} pallas bands (geomsplit at {GW}x{GH}, scan), "
          f"{batch.num_triangles} tris, {FRAMES}-frame mean "
          f"(virtual CPU devices — correctness run)")
    print("| devices | band ms/frame | geomsplit ms/frame (192x128) | coverage | "
          "pixels == 1-dev |")
    print("|---|---|---|---|---|")
    for n, ms, gms, cov, match in rows:
        print(f"| {n} | {ms:.0f} | {gms:.0f} | {cov:.3f} | {match:.6f} |")


if __name__ == "__main__":
    main()
