"""Prospective win of stable valid-compaction, measured on the binning.

Backface-culled / clipped / parts-hidden triangles keep their rows in
the S-packed setup blocks: group bboxes exclude them (a fully dead
group never bins) but a MIXED group still costs the kernel a full
(KG, P) block. Stable compaction (valid triangles first, original
relative order — the later-id tie rule is invariant under monotone
renumbering) would densify groups. This tool measures, per preset, the
live (group, tile) pair count — the raster kernel's true work unit —
for the current layout vs the stable-compacted one, on CPU, before any
kernel change is attempted.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench/compact_pairs.py
"""
from __future__ import annotations

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from mt_renderer_tpu.render import device, pallas_raster as pr  # noqa: E402
from mt_renderer_tpu.scene import demo  # noqa: E402


def group_bbox(tri, valid):
    """(Tp,) per-tri arrays -> (CG,) group aggregates (numpy)."""
    xmin, xmax, ymin, ymax, zmin = tri
    big = np.float32(1e30)
    cg = valid.shape[0] // pr.KG

    def mn(a):
        return np.where(valid, a, big).reshape(cg, pr.KG).min(1)

    def mx(a):
        return np.where(valid, a, -big).reshape(cg, pr.KG).max(1)

    return mn(xmin), mx(xmax), mn(ymin), mx(ymax), mn(zmin)


def pair_stats(bbox, valid, width, height):
    """(live chunk-tile pairs, live group-tile pairs, live rows)."""
    n_ty = height // pr.TILE_H
    n_tx = width // pr.TILE_W
    cg = bbox[0].shape[0]
    c = cg // pr.G
    lists, glists, counts, counts_true = jax.jit(
        pr.bin_chunks, static_argnums=(1, 2, 3)
    )(tuple(map(np.asarray, bbox)), n_ty, n_tx, c, 0, 0)
    g = np.asarray(glists)
    pop = np.zeros_like(g)
    x = g.copy()
    for _ in range(pr.G):
        pop += x & 1
        x >>= 1
    # live rows: for each live (group, tile) pair the kernel runs KG
    # rows; count the VALID rows inside to expose dead-row waste
    vg = valid.reshape(cg, pr.KG).sum(1)                  # valid per group
    # per-tile group liveness -> accumulate valid-row count
    return (int(np.asarray(counts_true).sum()), int(pop.sum()),
            vg, np.asarray(lists), g)


def run(name, batch, cam_vp, bones, width, height):
    scene = device.upload(batch)
    clip = device.vertex_stage(scene, cam_vp, bones)
    setup = device.setup_stage(scene, clip, width, height, bones)
    valid = np.asarray(setup["valid"])
    tri = (np.asarray(setup["xmin"]), np.asarray(setup["xmax"]),
           np.asarray(setup["ymin"]), np.asarray(setup["ymax"]),
           np.asarray(setup["sz"]).min(1))
    tp = valid.shape[0]

    base_bbox = group_bbox(tri, valid)
    c_pairs0, g_pairs0, vg0, lists0, gl0 = pair_stats(
        base_bbox, valid, width, height)

    # stable compaction: valid first, original relative order
    perm = np.argsort(~valid, kind="stable")
    validc = valid[perm]
    tric = tuple(a[perm] for a in tri)
    comp_bbox = group_bbox(tric, validc)
    c_pairs1, g_pairs1, vg1, _, _ = pair_stats(
        comp_bbox, validc, width, height)

    nvalid = int(valid.sum())
    print(f"{name}: Tp={tp} valid={nvalid} ({100*nvalid/tp:.0f}%)")
    print(f"  current : chunk-tile pairs={c_pairs0:7d}  "
          f"group-tile pairs={g_pairs0:7d}")
    print(f"  compacted: chunk-tile pairs={c_pairs1:7d}  "
          f"group-tile pairs={g_pairs1:7d}  "
          f"(x{g_pairs0 / max(g_pairs1, 1):.2f} fewer group pairs)")
    sys.stdout.flush()


def main():
    width, height = 1920, 1080

    batch = demo.build_demo_batch(instances=1024, skinned=True, subdiv=4)
    cam = demo.demo_camera(1024, width, height)
    vp = np.asarray(cam.view_proj())
    bones = demo.demo_bone_mats(0.0)
    run("default", batch, vp, bones, width, height)

    cam.position = cam.position * 0.3
    vp = np.asarray(cam.view_proj())
    run("dense", batch, vp, bones, width, height)

    from mt_renderer_tpu.scene import world as world_mod
    ws = world_mod.build_world(buildings=280,
                               building_subdivs=(4, 6, 8, 10, 12))
    cam = world_mod.world_camera(width, height, buildings=280)
    vp = np.asarray(cam.view_proj())
    anim = ws.animator()
    bones = ws.bone_palette(anim.bone_mats(np.float32(0.0)))
    run("world", ws.batch, vp, np.asarray(bones), width, height)


if __name__ == "__main__":
    main()
