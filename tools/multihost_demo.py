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
    p.add_argument("--peel", type=int, default=0,
                   help="also verify an L-layer split-OIT banded leg")
    p.add_argument("--mipmap", action="store_true",
                   help="also verify a trilinear-mipmap banded leg")
    p.add_argument("--gather", type=int, default=0, metavar="K",
                   help="measure the optional viewer-host full-frame "
                        "gather: K timed allgathers + identity check")
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

    if args.peel:
        # split-OIT banded leg: translucent content composited
        # back-to-front per band, still zero-collective across DCN
        tb = demo.make_translucent(batch, args.instances)
        ts = device.upload(tb)
        pc, _ = multihost.render_frame_multihost(
            ts, vp, bones, width=w, height=h, backend="pallas",
            packed=True, peel_layers=args.peel)
        pref, _ = device.render_frame_peeled(
            ts, vp, bones, width=w, height=h, backend="pallas",
            layers=args.peel, peel_mode="split", packed=True)
        pref = np.asarray(pref)
        for r0, band in multihost.local_rows(pc, h):
            np.testing.assert_array_equal(band,
                                          pref[r0:r0 + band.shape[0]])
        print(f"proc {args.proc}: peel{args.peel} leg pixel-identical",
              flush=True)

    if args.mipmap:
        mc, _ = multihost.render_frame_multihost(
            scene, vp, bones, width=w, height=h, backend="pallas",
            packed=True, mipmap=True)
        mref, _ = device.render_frame(
            scene, vp, bones, width=w, height=h, backend="pallas",
            packed=True, mipmap=True)
        mref = np.asarray(mref)
        for r0, band in multihost.local_rows(mc, h):
            np.testing.assert_array_equal(band,
                                          mref[r0:r0 + band.shape[0]])
        print(f"proc {args.proc}: mipmap leg pixel-identical", flush=True)

    if args.gather:
        import time

        full = multihost.gather_full_frame(color, h)    # warm path
        np.testing.assert_array_equal(full, ref[:h])
        t0 = time.perf_counter()
        for _ in range(args.gather):
            multihost.gather_full_frame(color, h)
        dt = (time.perf_counter() - t0) / args.gather
        mb = full.nbytes / 2**20
        print(f"proc {args.proc}: full-frame gather verified identical; "
              f"{mb:.2f} MB in {dt * 1e3:.1f} ms/frame on the gloo "
              f"stand-in ({mb / 1024 / max(dt, 1e-9):.2f} GB/s)",
              flush=True)

    print("MULTIHOST OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
