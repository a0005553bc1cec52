"""Multi-host band-split render demo/verifier — one process of N.

Forms a jax.distributed cluster (CPU/gloo here — the DCN stand-in; the
same code runs on TPU pods), renders the demo scene band-sharded over
the GLOBAL mesh, and asserts this process's owned rows are
PIXEL-IDENTICAL to a local single-device render of the same frame (the
band split's zero-collective invariant, extended across hosts).

Usage (run one per process, same argv except --proc):
    python tools/multihost_demo.py --proc I --nproc N \
        [--coordinator 127.0.0.1:9911] [--local-devices 4] \
        [--width 512 --height 192]

Exit code 0 + "MULTIHOST OK" on success in every process.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--proc", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--coordinator", default="127.0.0.1:9911")
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--instances", type=int, default=4)
    args = p.parse_args(argv)

    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from mt_renderer_tpu.parallel import multihost

    jax = multihost.init(args.coordinator, args.nproc, args.proc,
                        local_device_count=args.local_devices)
    import numpy as np

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"proc {args.proc}/{args.nproc}: {n_local} local / "
          f"{n_global} global devices", flush=True)
    assert n_global == args.nproc * args.local_devices

    from mt_renderer_tpu.render import device
    from mt_renderer_tpu.scene import demo

    w, h = args.width, args.height
    batch = demo.build_demo_batch(instances=args.instances, skinned=True)
    scene = device.upload(batch)
    cam = demo.demo_camera(args.instances, w, h)
    vp = np.asarray(cam.view_proj())
    bones = demo.demo_bone_mats(0.5)

    color, depth = multihost.render_frame_multihost(
        scene, vp, bones, width=w, height=h,
        backend="pallas", packed=True)
    jax.block_until_ready((color, depth))

    # zero-collective invariant across DCN: owned bands == the same
    # rows of a LOCAL single-device render (test_multichip pins
    # band==single-chip within a process; this extends it cross-host)
    ref, _ = device.render_frame(scene, vp, bones, width=w, height=h,
                                 backend="pallas", packed=True)
    ref = np.asarray(ref)
    rows = multihost.local_rows(color, h)
    assert rows, "process owns no rows"
    checked = 0
    for r0, band in rows:
        np.testing.assert_array_equal(band, ref[r0:r0 + band.shape[0]])
        checked += band.shape[0]
    cov_rows = [np.mean(np.asarray(b) < 1.0)
                for _, b in multihost.local_rows(depth, h)]
    print(f"proc {args.proc}: verified {checked} owned rows "
          f"pixel-identical; band coverage "
          f"{', '.join(f'{c:.2f}' for c in cov_rows)}", flush=True)
    print("MULTIHOST OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
