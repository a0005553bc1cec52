"""Multi-chip frame rendering over an ICI mesh — two strategies:
screen-band sharding (zero-collective pixel split) and geometry
sharding (triangle split with pmin/pmax/psum depth merge).

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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..render import device as dev


def make_row_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices, axis name 'rows'."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), ("rows",))


def _scene_tri_shard(scene, lo, size: int, tp: int):
    """Triangle-range view [lo, lo+size) of a DeviceScene — the
    sharded-setup unit: contiguous dynamic slices of every per-triangle
    array (the corner-PLANAR vertex arrays slice as three corner
    blocks, so the layout invariant setup_packed_cols reshapes by is
    preserved). The last shard's range is clamped into the scene; rows
    that alias earlier shards' triangles (or the ceil padding past
    ``tp``) are masked out of ``tri_vis`` so their columns bake REJECT
    exactly like padding — the all-gathered column matrix then carries
    each real triangle LIVE exactly once, in global order (an
    order-preserving id shift on the last shard only, so the
    later-triangle tie rule is unchanged)."""
    import dataclasses

    start = jnp.clip(lo, 0, max(tp - size, 0))
    rid = start + jnp.arange(size, dtype=jnp.int32)

    def sl(a, axis=0):
        return jax.lax.dynamic_slice_in_dim(a, start, size, axis=axis)

    def slv(a):                       # (3Tp, …) corner-planar
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(a, c * tp + start, size, 0)
             for c in range(3)])

    vis = sl(scene.tri_vis) & (rid >= lo) & (rid < tp)
    return dataclasses.replace(
        scene,
        positions=slv(scene.positions), uvs=slv(scene.uvs),
        normals=slv(scene.normals), joints=slv(scene.joints),
        weights=slv(scene.weights),
        tri_texture=sl(scene.tri_texture),
        tri_debug_id=sl(scene.tri_debug_id),
        tri_flat=sl(scene.tri_flat),
        tri_material=sl(scene.tri_material),
        tri_valid=sl(scene.tri_valid),
        tri_parts=sl(scene.tri_parts),
        cols_const=sl(scene.cols_const, axis=1),
        tri_vis=vis,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "chunk", "clear_color",
                     "backend", "maxc", "mipmap", "lighting", "packed",
                     "tap_tiles", "peel_layers", "setup_shard"),
)
def _render_frame_multichip_core(
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
    mipmap: bool = False,
    lighting: bool = False,
    packed: bool = False,
    tap_tiles: int | None = None,
    peel_layers: int = 0,
    setup_shard: bool = False,
):
    """Jitted band-sharded frame body → (color, depth, n_over (n,) i32).

    Arbitrary heights work: bands are ceil(height / n) rows; every chip
    rasterises a tile-aligned padded band and crops, and the caller
    crops the padded global frame back to ``height`` (1080 / 8 chips =
    135-row bands padded to 144 in-kernel — same pad-and-crop the
    single-chip path does, device.py:_render_frame_core).

    ``setup_shard`` (pallas, non-peel): shard the O(T) vertex + setup
    work over the mesh — each chip computes its triangle range's
    columns, ONE ``all_gather`` (the band split's only collective)
    assembles the full column matrix, and the band raster proceeds as
    usual. Trades the per-chip replicated setup floor (~1 ms of the
    8-chip 2.18 ms default band frame, docs/MULTICHIP.md) for a
    cols-sized ICI gather; bit-identical frames (the shard view is an
    order-preserving row partition of the same arithmetic)."""
    if backend == "scan" and packed:
        raise ValueError("packed output requires the pallas backend")
    if peel_layers and backend != "pallas":
        raise ValueError("multichip peel (split OIT) requires the "
                         "pallas backend")
    if setup_shard and (backend != "pallas" or peel_layers):
        raise ValueError("setup_shard needs the pallas non-peel path "
                         "(the split peel builds two column sets; "
                         "shard those the same way if it ever shows "
                         "up in a profile)")
    n = mesh.devices.size
    band_h = -(-height // n)              # ceil: rows per chip pre-crop
    tp = scene.tri_valid.shape[0]
    shard_t = -(-tp // (n * dev.TRI_PAD)) * dev.TRI_PAD

    def band_render(scene, view_proj, bone_mats):
        if not setup_shard:
            clip = dev.vertex_stage(scene, view_proj, bone_mats)
        y0 = jax.lax.axis_index("rows") * band_h
        if backend == "pallas":
            from ..render import pallas_raster as pr

            pw = -(-width // pr.TILE_W) * pr.TILE_W
            pb = -(-band_h // pr.TILE_H) * pr.TILE_H
            interp = jax.default_backend() != "tpu"
            if peel_layers:
                # band-sharded split OIT: the peel is per-pixel, so
                # bands compose with zero collectives exactly like the
                # single-layer path; each band runs the same split
                # engine the single-chip core uses
                setup_op, setup_tr, n_attr = dev.setup_packed_cols(
                    scene, clip, width, height, bone_mats=bone_mats,
                    lighting=lighting, opacity_split=True)
                dst, z0, n_over = dev._split_peel_flat(
                    scene, setup_op, setup_tr, n_attr, x0=0, y0=y0,
                    pw=pw, ph=pb, layers=peel_layers,
                    maxc=maxc or pr.MAXC_DEFAULT,
                    light=dev._light_unit() if lighting else None,
                    tap_tiles=tap_tiles, clear_color=clear_color,
                    interp=interp, mipmap=mipmap)
                zbf = pr.unflatten_tiles(z0, pb, pw)
                color = pr.unflatten_tiles(dev.pack_u32_channels(dst),
                                           pb, pw)
                if not packed:  # unpacked = a bitcast of the same u32
                    color = jax.lax.bitcast_convert_type(color,
                                                         jnp.uint8)
                return (color[:band_h, :width], zbf[:band_h, :width],
                        jnp.stack(list(n_over))[None])
            if setup_shard:
                r = jax.lax.axis_index("rows")
                shard = _scene_tri_shard(scene, r * shard_t, shard_t,
                                         tp)
                clip_s = dev.vertex_stage(shard, view_proj, bone_mats)
                cols_s, bbox_s, n_attr = dev.setup_packed_cols(
                    shard, clip_s, width, height, bone_mats=bone_mats,
                    lighting=lighting,
                )
                cols = jax.lax.all_gather(cols_s, "rows", axis=0,
                                          tiled=True)
                bbox = tuple(
                    jax.lax.all_gather(b, "rows", axis=0, tiled=True)
                    for b in bbox_s)
            else:
                cols, bbox, n_attr = dev.setup_packed_cols(
                    scene, clip, width, height, bone_mats=bone_mats,
                    lighting=lighting,
                )
            if not mipmap and packed:
                # the single-chip production path, per band: tile-major
                # flat epilogue with the covered-row compacted tap
                # (tap_tiles sized host-side over the worst band —
                # auto_tap_tiles(bands=n))
                zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
                    (cols, bbox), None, 0, y0, width=pw, height=pb,
                    maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                    n_attr=n_attr, tap=True, w_eps=dev.W_EPS,
                    light=dev._light_unit() if lighting else None,
                    flat=True,
                )
                colort, _, n_over_tap = dev.shade_finish_tap_flat(
                    scene, tattrs, tapidx, ib, clear_color,
                    tap_tiles=tap_tiles)
                color = pr.unflatten_tiles(colort, pb, pw)
                zbf = pr.unflatten_tiles(zb[:, 0, :], pb, pw)
                return (color[:band_h, :width], zbf[:band_h, :width],
                        jnp.stack([n_over, n_over_tap])[None])
            if not mipmap:
                # same fast path as single-chip: tap addresses (and the
                # lambert factor when lighting) in-kernel
                zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
                    (cols, bbox), None, 0, y0, width=pw, height=pb,
                    maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                    n_attr=n_attr, tap=True, w_eps=dev.W_EPS,
                    light=dev._light_unit() if lighting else None,
                )
                src, covered = dev.shade_tap(scene, tattrs, tapidx, ib)
                fin = dev.finish_packed if packed else dev.finish_planes
                color = fin(src, covered, clear_color, pb, pw)
                return (color[:band_h, :width], zb[:band_h, :width],
                        n_over[None])
            # mipmap: the single-chip tile-major compacted trilinear
            # engine per band (bit-identical to the full frame — the
            # shade is elementwise per tile row)
            zb, ib, mattrs, n_over = pr.raster_pallas_fwd(
                (cols, bbox), None, 0, y0, width=pw, height=pb,
                maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                n_attr=n_attr, mtap=True, w_eps=dev.W_EPS,
                light=dev._light_unit() if lighting else None,
                flat=True,
            )
            src, covered, n_tap = dev.shade_mip_tap_flat_channels(
                scene, mattrs, ib,
                tap_tiles=None if isinstance(tap_tiles, tuple)
                else tap_tiles)
            dstc = dev._blend_channels(src, covered, clear_color)
            color = pr.unflatten_tiles(dev.pack_u32_channels(dstc),
                                       pb, pw)
            if not packed:     # unpacked = a bitcast view of the same
                color = jax.lax.bitcast_convert_type(color, jnp.uint8)
            zbf = pr.unflatten_tiles(zb[:, 0, :], pb, pw)
            return (color[:band_h, :width], zbf[:band_h, :width],
                    jnp.stack([n_over, n_tap])[None])
        setup = dev.setup_stage(scene, clip, width, height,
                                bone_mats=bone_mats, need_normals=lighting)
        zb, ib = dev.raster_stage(
            setup, width, height, chunk,
            origin=(0, y0), band=(width, band_h),
        )
        color = dev.shade_stage(
            scene, setup, zb, ib, width, height, clear_color,
            origin=(0, y0), band=(width, band_h), mipmap=mipmap,
            lighting=lighting,
        )
        zero = jnp.zeros((1,), jnp.int32) + jnp.int32(y0) * 0
        return color, zb, zero

    # packed frames are rank-2 (H, W) uint32 — the color out_spec must
    # match the band rank (a rank-3 spec on the packed frame raised
    # "out_specs entry which is too long", advisor r2)
    color_spec = P("rows", None) if packed else P("rows", None, None)
    shard_fn = jax.shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(color_spec, P("rows", None), P("rows")),
        # pallas_call's out_shape carries no varying-mesh-axis info;
        # band partitioning is trivially correct, so skip the vma check
        check_vma=False,
    )
    if bone_mats is None:
        bone_mats = jnp.tile(
            jnp.eye(4, dtype=jnp.float32), (scene.num_joints, 1, 1)
        )
    color, depth, n_over = shard_fn(scene, view_proj, bone_mats)
    # crop the ceil-padded global frame back to the asked-for height
    # (a row slice of the row-sharded array; XLA keeps shards intact
    # until someone asks for the full frame)
    if band_h * n != height:
        color = color[:height]
        depth = depth[:height]
    return color, depth, n_over


def render_frame_multichip(scene, view_proj, bone_mats=None, *,
                           mesh: Mesh, width: int = 512, height: int = 512,
                           chunk: int = dev.DEFAULT_CHUNK,
                           clear_color: tuple = (255, 255, 255, 255),
                           backend: str = "pallas", maxc: int | None = None,
                           mipmap: bool = False, lighting: bool = False,
                           check_overflow: bool = True,
                           packed: bool = False,
                           tap_tiles: int | None = None,
                           peel_layers: int = 0,
                           setup_shard: bool = False):
    """Render one frame with the raster+shade stages sharded over screen
    bands. Returns ((H, W, 4) uint8, (H, W) f32), row-sharded over the
    mesh (``packed``: (H, W) uint32 RGBA — see ``device.render_frame``).
    ``backend`` as in ``device.render_frame``; the pallas path pads
    each band up to tile alignment and crops. Per-band bin-overflow
    (and, on the packed path, compacted-tap-overflow — ``tap_tiles``,
    sized via ``device.auto_tap_tiles(bands=n)``) counts are summed and
    checked host-side (``pallas_raster.queue_overflow_check``).

    ``peel_layers`` > 0 renders band-sharded order-independent
    transparency with the split OIT engine (pallas, non-mipmap; the
    peel is per-pixel so bands still compose with zero collectives);
    ``tap_tiles`` may then be the (opaque, translucent) per-band cap
    pair. Pixel-identical to the single-chip
    ``render_frame_peeled(peel_mode="split")``.

    ``setup_shard`` shards the O(T) vertex+setup stages over the mesh
    and all-gathers the column matrix (the band split's only
    collective) — see ``_render_frame_multichip_core``; bit-identical
    frames."""
    dev._check_pool_backend(scene, backend, mipmap)
    color, depth, n_over = _render_frame_multichip_core(
        scene, view_proj, bone_mats, mesh=mesh, width=width, height=height,
        chunk=chunk, clear_color=clear_color, backend=backend, maxc=maxc,
        mipmap=mipmap, lighting=lighting, packed=packed,
        tap_tiles=tap_tiles, peel_layers=peel_layers,
        setup_shard=setup_shard,
    )
    if check_overflow and backend == "pallas":
        from ..render import pallas_raster as pr

        if n_over.ndim == 2:              # packed path: (n, [bins, taps])
            band_h = -(-height // mesh.devices.size)
            nrows_band = ((-(-width // pr.TILE_W))
                          * (-(-band_h // pr.TILE_H)) * pr.TILE_H)
            cap = tap_tiles if tap_tiles else nrows_band
            if isinstance(cap, tuple):    # split peel (op, tr) pair
                cap = sum((c if c else nrows_band) for c in cap)
            pr.queue_overflow_check(
                jnp.sum(n_over[:, 1]), cap,
                what="tap overflow: live compacted tap rows lost their "
                     "texture; raise tap_tiles")
            n_over = n_over[:, 0]
        pr.queue_overflow_check(jnp.sum(n_over),
                                maxc or pr.MAXC_DEFAULT)
    return color, depth


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "chunk", "clear_color",
                     "backend", "maxc", "mipmap", "lighting", "packed",
                     "tap_tiles"),
)
def _render_frame_geomsplit_core(
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
    mipmap: bool = False,
    lighting: bool = False,
    packed: bool = False,
    tap_tiles: int | None = None,
):
    """Geometry-split multi-chip rendering: each chip rasterises a
    contiguous shard of the triangles over the FULL frame, then the
    per-pixel depth contest resolves with ICI collectives:

    * ``pmin`` over chips → global nearest depth per pixel,
    * ``pmax`` of the winner GLOBAL triangle id among depth-tied chips →
      the exact later-triangle-wins tie rule across shards (the same
      rule the kernel applies within a chip),
    * each chip shades its own raster output and zero-masks the pixels
      its shard lost; ONE ``psum`` of the shaded channel planes
      composites the frame (exact: per pixel exactly one chip
      contributes non-zero, so the sum IS that chip's f32 value).

    Complements the screen-band split (``render_frame_multichip``):
    geometry split keeps per-chip raster load balanced when triangles
    cluster in one screen band. The pallas path is the production one
    (tap/mip-tap epilogue, lighting, packed frames, tile-major until
    the final relayout); ``backend="scan"`` keeps the all-triangles
    differential path. Returns the full frame replicated on every chip
    → (color, depth, n_over (n,))."""
    n = mesh.devices.size
    tp = scene.tri_valid.shape[0]

    if backend == "scan":
        if packed:
            raise ValueError("packed output requires the pallas backend")
        if tp % n:
            raise ValueError(f"padded triangle count {tp} not "
                             f"divisible by {n}")
    from ..render import pallas_raster as pr

    # chunk-aligned shards; the last shard pads with always-outside rows
    # (zero edge coefficients fail ``e > bias`` at bias 0) so no
    # triangle is ever duplicated across chips (a duplicate would tie
    # with itself on two chips and double-count in the psum)
    shard_t = cdiv_mult(tp, n, pr.CT)
    pad_t = shard_t * n - tp

    def shard_render(scene, view_proj, bone_mats):
        r = jax.lax.axis_index("rows")
        clip = dev.vertex_stage(scene, view_proj, bone_mats)
        if backend == "scan":
            setup = dev.setup_stage(scene, clip, width, height,
                                    bone_mats=bone_mats,
                                    need_normals=lighting)
            base = r * (tp // n)
            shard_setup = {
                k: jax.lax.dynamic_slice_in_dim(v, base, tp // n, axis=0)
                for k, v in setup.items()
            }
            zb, ib = dev.raster_stage(shard_setup, width, height, chunk)
            ib = jnp.where(ib >= 0, ib + base, -1)         # globalise ids
            z = jnp.where(ib >= 0, zb, jnp.inf)
            zmin = jax.lax.pmin(z, "rows")
            tied = (z == zmin) & (ib >= 0)
            win_id = jax.lax.pmax(jnp.where(tied, ib, -1), "rows")
            mine = tied & (ib == win_id)
            src, _cov = dev.shade_src(
                scene, setup, jnp.where(mine, ib, -1), width, height,
                mipmap=mipmap, lighting=lighting)
            contrib = jnp.where(mine[..., None], src, 0.0)
            src_all = jax.lax.psum(contrib, "rows")
            covered = jax.lax.psum(mine.astype(jnp.int32), "rows") > 0
            clear = jnp.asarray(np.asarray(clear_color, np.float32))
            dst = jnp.broadcast_to(clear, (height, width, 4))
            out = dev.blend_over(src_all, covered, dst)
            color = jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)
            depth = jnp.where(covered, zmin, 1.0)
            zero = jnp.zeros((1,), jnp.int32) + r * 0
            return color, depth, zero

        pw = -(-width // pr.TILE_W) * pr.TILE_W
        ph = -(-height // pr.TILE_H) * pr.TILE_H
        interp = jax.default_backend() != "tpu"
        cols, bbox, n_attr = dev.setup_packed_cols(
            scene, clip, width, height, bone_mats=bone_mats,
            lighting=lighting,
        )
        if pad_t:
            big = jnp.float32(1e30)
            cols = jnp.concatenate(
                [cols, jnp.zeros((pad_t, cols.shape[1]), jnp.float32)])
            gpad = pad_t // pr.KG
            pads = (big, -big, big, -big, big)
            bbox = tuple(
                jnp.concatenate([b, jnp.full((gpad,), v, jnp.float32)])
                for b, v in zip(bbox, pads)
            )
        base = r * shard_t
        cols_s = jax.lax.dynamic_slice_in_dim(cols, base, shard_t, 0)
        bbox_s = tuple(
            jax.lax.dynamic_slice_in_dim(b, base // pr.KG,
                                         shard_t // pr.KG, 0)
            for b in bbox
        )
        kw = dict(width=pw, height=ph, maxc=maxc or pr.MAXC_DEFAULT,
                  interpret=interp, n_attr=n_attr, w_eps=dev.W_EPS,
                  light=dev._light_unit() if lighting else None)
        if not mipmap:
            # tile-major end to end; unflatten only the final planes.
            # tap_tiles: each shard's coverage is a subset of the full
            # frame's, so the single-frame host bound caps every shard
            zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
                (cols_s, bbox_s), None, 0, 0, tap=True, flat=True, **kw)
            src, _cov, n_tap = dev.shade_tap_flat_channels(
                scene, tattrs, tapidx, ib, tap_tiles=tap_tiles)
            z2, ib2 = zb[:, 0, :], ib[:, 0, :]
            unflat = lambda x: pr.unflatten_tiles(x, ph, pw)  # noqa: E731
        else:
            # tile-major like the single-chip mip engine (analytic LOD
            # is per-pixel, so a shard's shade needs no neighbors —
            # under forward-difference LOD a shard's winner u/v at a
            # shard boundary had no true neighbor to difference with)
            zb, ib, mattrs, n_over = pr.raster_pallas_fwd(
                (cols_s, bbox_s), None, 0, 0, mtap=True, flat=True,
                **kw)
            src, _cov, n_tap = dev.shade_mip_tap_flat_channels(
                scene, mattrs, ib, tap_tiles=tap_tiles)
            z2, ib2 = zb[:, 0, :], ib[:, 0, :]
            unflat = lambda x: pr.unflatten_tiles(x, ph, pw)  # noqa: E731
        ib_g = jnp.where(ib2 >= 0, ib2 + base, -1)
        z = jnp.where(ib_g >= 0, z2, jnp.inf)
        zmin = jax.lax.pmin(z, "rows")
        tied = (z == zmin) & (ib_g >= 0)
        win_id = jax.lax.pmax(jnp.where(tied, ib_g, -1), "rows")
        mine = tied & (ib_g == win_id)
        src_all = [jax.lax.psum(jnp.where(mine, c, 0.0), "rows")
                   for c in src]
        covered = jax.lax.psum(mine.astype(jnp.int32), "rows") > 0
        n_over = jnp.stack([n_over, n_tap])
        n_over_all = jax.lax.psum(n_over, "rows")

        out = dev._blend_channels(src_all, covered, clear_color)
        depth = unflat(jnp.where(covered, zmin, 1.0))[:height, :width]
        if packed:
            color = unflat(dev.pack_u32_channels(out))[:height, :width]
        else:
            color = jnp.stack(
                [unflat(jnp.clip(c + 0.5, 0.0, 255.0).astype(jnp.uint8)
                        )[:height, :width] for c in out], axis=-1)
        return color, depth, n_over_all[None]

    shard_fn = jax.shard_map(
        shard_render,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P("rows")),
        check_vma=False,
    )
    if bone_mats is None:
        bone_mats = jnp.tile(
            jnp.eye(4, dtype=jnp.float32), (scene.num_joints, 1, 1)
        )
    return shard_fn(scene, view_proj, bone_mats)


def cdiv_mult(total: int, n: int, quantum: int) -> int:
    """Smallest per-shard size covering ``total`` over ``n`` shards in
    multiples of ``quantum``."""
    per = -(-total // n)
    return -(-per // quantum) * quantum


def render_frame_geomsplit(scene, view_proj, bone_mats=None, *,
                           mesh: Mesh, width: int = 512,
                           height: int = 512,
                           chunk: int = dev.DEFAULT_CHUNK,
                           clear_color: tuple = (255, 255, 255, 255),
                           backend: str = "pallas",
                           maxc: int | None = None,
                           mipmap: bool = False, lighting: bool = False,
                           check_overflow: bool = True,
                           packed: bool = False,
                           tap_tiles: int | None = None):
    """Public geometry-split frontend — see
    ``_render_frame_geomsplit_core`` for the strategy and
    ``device.render_frame`` for the overflow-check contract
    (``tap_tiles``: per-shard compacted texture taps; any shard's
    coverage is a subset of the full frame's, so
    ``device.auto_tap_tiles`` bounds every shard)."""
    color, depth, n_over = _render_frame_geomsplit_core(
        scene, view_proj, bone_mats, mesh=mesh, width=width,
        height=height, chunk=chunk, clear_color=clear_color,
        backend=backend, maxc=maxc, mipmap=mipmap, lighting=lighting,
        packed=packed, tap_tiles=tap_tiles,
    )
    if check_overflow and backend == "pallas":
        from ..render import pallas_raster as pr

        if n_over.ndim == 2:              # tap path: (n, [bins, taps])
            pw_t = -(-width // pr.TILE_W)
            ph_t = -(-height // pr.TILE_H)
            pr.queue_overflow_check(
                jnp.sum(n_over[:, 1]),
                tap_tiles if tap_tiles else pw_t * ph_t * pr.TILE_H,
                what="tap overflow: live compacted tap rows lost their "
                     "texture; raise tap_tiles")
            n_over = n_over[:, 0]
        pr.queue_overflow_check(jnp.sum(n_over),
                                maxc or pr.MAXC_DEFAULT)
    return color, depth
