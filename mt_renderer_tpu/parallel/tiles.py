"""Multi-chip frame rendering: screen-band sharding over an ICI mesh.

The reference is single-GPU (one wgpu device, renderer_app_manager.rs:103);
its implicit SIMT parallelism becomes explicit SPMD here. The frame is
split into horizontal bands, one per chip, via ``shard_map`` over a 1-D
``Mesh``:

* geometry and textures are **replicated** (uploaded once per chip — the
  analog of per-GPU asset uploads);
* the vertex + setup stages recompute on every chip (they are tiny:
  O(vertices + triangles) of matmul/VPU work vs O(pixels·triangles) for
  raster);
* each chip rasterises and shades only its own band — the per-pixel work
  partitions perfectly with zero inter-chip traffic;
* the composed frame materialises as a row-sharded global array; XLA
  inserts the (disjoint-tile) all-gather over ICI only if the caller asks
  for the full frame on one device.

Band split (not triangle split) is chosen because depth-resolve then needs
no cross-chip ``psum``-style merge; the only collective in the whole frame
is the optional final gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render import device as dev


def make_row_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices, axis name 'rows'."""
    devices = jax.devices()
    n = n_devices or len(devices)
    import numpy as np

    return Mesh(np.array(devices[:n]), ("rows",))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "chunk", "clear_color",
                     "backend", "maxc"),
)
def render_frame_multichip(
    scene: dev.DeviceScene,
    view_proj: jax.Array,
    bone_mats: jax.Array | None = None,
    *,
    mesh: Mesh,
    width: int = 512,
    height: int = 512,
    chunk: int = dev.DEFAULT_CHUNK,
    clear_color: tuple = (255, 255, 255, 255),
    backend: str = "pallas",
    maxc: int | None = None,
):
    """Render one frame with the raster+shade stages sharded over screen
    bands. Returns ((H, W, 4) uint8, (H, W) f32), row-sharded over the
    mesh. ``backend`` as in ``device.render_frame``; the pallas path pads
    each band up to tile alignment and crops."""
    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} not divisible by {n} devices")
    band_h = height // n

    def band_render(scene, view_proj, bone_mats):
        clip = dev.vertex_stage(scene, view_proj, bone_mats)
        setup = dev.setup_stage(scene, clip, width, height)
        y0 = jax.lax.axis_index("rows") * band_h
        if backend == "pallas":
            from ..render import pallas_raster as pr

            pw = -(-width // pr.TILE_W) * pr.TILE_W
            pb = -(-band_h // pr.TILE_H) * pr.TILE_H
            interp = jax.default_backend() != "tpu"
            zb, ib = pr.raster_pallas(
                setup, 0, y0, width=pw, height=pb,
                maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
            )
            color = dev.shade_stage(
                scene, setup, zb, ib, width, height, clear_color,
                origin=(0, y0), band=(pw, pb),
            )
            return color[:band_h, :width], zb[:band_h, :width]
        zb, ib = dev.raster_stage(
            setup, width, height, chunk,
            origin=(0, y0), band=(width, band_h),
        )
        color = dev.shade_stage(
            scene, setup, zb, ib, width, height, clear_color,
            origin=(0, y0), band=(width, band_h),
        )
        return color, zb

    shard_fn = jax.shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P("rows", None, None), P("rows", None)),
        # pallas_call's out_shape carries no varying-mesh-axis info;
        # band partitioning is trivially correct, so skip the vma check
        check_vma=False,
    )
    if bone_mats is None:
        bone_mats = jnp.tile(
            jnp.eye(4, dtype=jnp.float32), (scene.num_joints, 1, 1)
        )
    return shard_fn(scene, view_proj, bone_mats)
