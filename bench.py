"""Benchmark harness — renders the BASELINE.json north-star workload.

Default (full) preset: 1080p textured + skinned instanced scene on the
available accelerator; prints ONE JSON line
``{"metric", "value", "unit", "vs_baseline"}`` where the baseline is the
north-star 60 fps/chip target (the reference publishes no numbers —
BASELINE.md).

Presets:
  --preset smoke   256x256, few instances, writes /tmp/mtr_frame.png
  --preset full    1920x1080, default (driver-run)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["smoke", "full"], default="full")
    p.add_argument("--instances", type=int, default=None)
    p.add_argument("--subdiv", type=int, default=None,
                   help="cube subdivision (12*n^2 tris per instance)")
    p.add_argument("--frames", type=int, default=50)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--backend", choices=["scan", "pallas"], default="pallas")
    p.add_argument("--maxc", type=int, default=256)
    p.add_argument("--png", default=None, help="write last frame here")
    p.add_argument("--trace", default=None,
                   help="write a JAX profiler trace to this directory")
    p.add_argument("--peel", type=int, default=0,
                   help="depth-peel layer count (0 = single-layer)")
    p.add_argument("--mipmap", action="store_true",
                   help="trilinear mipmapped minification")
    p.add_argument("--lighting", action="store_true",
                   help="directional lambert shading (needs normals)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.preset == "smoke":
        width = args.width or 256
        height = args.height or 256
        instances = args.instances or 9
        frames = min(args.frames, 5)
        png = args.png or "/tmp/mtr_frame.png"
        if args.subdiv is None:
            args.subdiv = 0
    else:
        width = args.width or 1920
        height = args.height or 1080
        instances = args.instances or 1024
        frames = args.frames
        png = args.png
        if args.subdiv is None:
            args.subdiv = 4    # 196k triangles — a realistic scene load

    import jax

    from mt_renderer_tpu.render import device
    from mt_renderer_tpu.scene import demo

    platform = jax.devices()[0].platform
    batch = demo.build_demo_batch(instances=instances, skinned=True,
                                  subdiv=args.subdiv or 0)
    scene = device.upload(batch)
    cam = demo.demo_camera(instances, width, height)

    chunk = args.chunk or device.DEFAULT_CHUNK

    def frame(t):
        cam.yaw = 15.0 + 8.0 * np.sin(0.25 * t)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.3 * t)
        if args.peel:
            return device.render_frame_peeled(
                scene, vp, bones, width=width, height=height,
                layers=args.peel, chunk=chunk, backend=args.backend,
                maxc=args.maxc,
            )
        return device.render_frame(
            scene, vp, bones, width=width, height=height, chunk=chunk,
            backend=args.backend, maxc=args.maxc, mipmap=args.mipmap,
            lighting=args.lighting,
        )

    # compile + warm up
    color, depth = frame(0)
    jax.block_until_ready((color, depth))

    import contextlib

    from mt_renderer_tpu.utils.profiling import trace

    ctx = trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for i in range(1, frames + 1):
            color, depth = frame(i)
        jax.block_until_ready((color, depth))
        dt = time.perf_counter() - t0

    fps = frames / dt
    tris = batch.num_triangles
    mtri_s = tris * fps / 1e6
    covered = float(np.mean(np.asarray(depth) < 1.0))
    mtexel_s = covered * width * height * fps / 1e6

    if png:
        from mt_renderer_tpu.utils.png import write_png

        write_png(png, np.asarray(color))
        print(f"wrote {png}", file=sys.stderr)

    print(
        f"# platform={platform} {width}x{height} instances={instances} "
        f"tris={tris} frames={frames} coverage={covered:.3f} "
        f"fps={fps:.2f} Mtri/s={mtri_s:.2f} Mtexel/s={mtexel_s:.1f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"fps_{height}p_textured_skinned",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
