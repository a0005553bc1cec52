"""Multi-host rendering over DCN — BASELINE config 5's scale-out story.

The reference is a single process on a single GPU
(``/root/reference/src/renderer_app_manager.rs:103-115``); SURVEY §5
records the TPU-native scaling plan: screen bands over **ICI** within a
host, **DCN** "only for multi-host scaling of config 5". This module is
that last step: the SAME zero-collective band split
(``parallel.tiles.render_frame_multichip``) run over a *global* mesh
spanning several processes/hosts via ``jax.distributed``.

Why the band split needs nothing new cross-host: every chip renders its
own rows from replicated geometry, so NO per-pixel traffic ever crosses
DCN during a frame — DCN carries only (a) the one-time cluster
bootstrap, (b) the XLA launch coordination, and (c) the OPTIONAL final
full-frame gather if one host wants every row (a viewer would; a
per-host encoder would not). Devices in the global mesh are
process-major (``jax.devices()`` order), so each host owns a contiguous
row span and the final gather is one contiguous slab per host.

On CPU (tests, this environment) the cluster forms over gloo loopback —
the DCN stand-in; on TPU pods ``jax.distributed.initialize`` picks up
the pod runtime and the same code runs unchanged. Every process must
execute the same calls in the same order (multi-controller SPMD).
"""

from __future__ import annotations

import numpy as np

from . import tiles


def init(coordinator_address: str, num_processes: int,
         process_id: int, local_device_count: int | None = None):
    """Join (or start, for process 0) the rendering cluster.

    Must run before any other JAX backend use in the process. On CPU,
    ``local_device_count`` splits the host into that many virtual
    devices (the multi-chip-per-host analog)."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        opt = f"--xla_force_host_platform_device_count={local_device_count}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = f"{flags} {opt}".strip()
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # the container's TPU plugin force-sets jax_platforms at
        # interpreter start; honor an explicit CPU request (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax


def global_row_mesh():
    """1-D 'rows' mesh over EVERY device in the cluster, process-major
    (each host's bands are contiguous frame rows)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("rows",))


def host_scene(scene):
    """Uncommit a DeviceScene for global-mesh computations.

    ``device.upload`` commits buffers to one local device; a
    multi-process jit cannot consume process-local committed arrays.
    NumPy leaves auto-replicate across the cluster instead (every
    process holds the same asset bytes — the per-host upload the
    reference would do per GPU). Static aux (num_joints, pool_mode…)
    is preserved by the pytree registration."""
    import jax

    return jax.tree_util.tree_map(np.asarray, scene)


def render_frame_multihost(scene, view_proj, bone_mats=None, *,
                           width: int, height: int, **kw):
    """One band-sharded frame over the whole cluster.

    Thin front over ``tiles.render_frame_multichip`` with the global
    mesh: returns (color, depth) as GLOBAL row-sharded arrays — each
    process holds only its own hosts' bands (``addressable_shards``);
    index a full frame only if you accept the cross-DCN gather. Accepts
    every keyword the multichip front does (backend/maxc/packed/
    peel_layers/…). ``scene`` may be a committed DeviceScene (it is
    re-hosted via ``host_scene``) or an already-hosted one."""
    return tiles.render_frame_multichip(
        host_scene(scene), view_proj, bone_mats,
        mesh=global_row_mesh(), width=width, height=height, **kw)


def gather_full_frame(frame, height: int) -> np.ndarray:
    """The OPTIONAL cross-DCN full-frame gather: every process receives
    all bands (a viewer host wants this; a per-host encoder never pays
    it). One allgather of each process's contiguous band slab — for a
    1080p packed u32 frame that is ~8.3 MB egress per frame per host,
    so at a conservative 25 GB/s DCN per host the gather costs ~0.4 ms
    of bandwidth + one DCN round trip; on the gloo/loopback stand-in
    ``tools/multihost_demo.py --gather`` measures it directly. Must be
    called by EVERY process (collective). Returns the full (height, …)
    frame, tile padding cropped."""
    from jax.experimental import multihost_utils

    shards = sorted(frame.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    full = multihost_utils.process_allgather(local, tiled=True)
    return np.asarray(full)[:height]


def local_rows(global_array, height: int):
    """This process's owned rows of a row-sharded global frame →
    (row_start, np.ndarray) pairs, ascending; crops any tile padding
    past ``height``."""
    out = []
    for shard in global_array.addressable_shards:
        r0 = shard.index[0].start or 0
        if r0 >= height:
            continue
        out.append((r0, np.asarray(shard.data)[: height - r0]))
    return sorted(out, key=lambda p: p[0])
