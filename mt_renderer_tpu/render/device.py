"""Device (TPU) renderer — the jitted render pipeline.

This is the TPU-native replacement for the reference's GPU draw path
(``/root/reference/src/model.rs:299-362`` + the WGSL shaders): instead of
per-primitive ``draw_indexed`` calls into a hardware rasterizer, the whole
frame is one jitted function over batched arrays:

1. **vertex stage** — bone-palette skinning + MVP transform (matmuls, MXU);
2. **setup stage** — per-triangle screen coords, edge coefficients, depth
   plane and validity mask (vectorised VPU work);
3. **raster stage** — deferred visibility: a ``lax.scan`` over triangle
   chunks computes per-pixel ``(depth, winner-triangle)`` with a pure
   min-reduce — no scatter, no read-modify-write races;
4. **shade stage** — gather the winner triangle's attributes per pixel,
   perspective-correct interpolate, bilinear-sample the albedo atlas,
   blend over the clear color (src-alpha, matching model.rs:242-247).

Pixel rules (coverage at centers, top-left fill rule, back-face cull of
area2 >= 0, ``z <= z_buf`` LessEqual depth with later-triangle tie wins)
match ``render/cpu_reference.py`` exactly; the CPU path is the oracle the
tests compare against.

Triangle counts are padded to a multiple of 128 so shapes stay static
across frames (jit caches one executable per (resolution, chunk) bucket —
the analog of the reference's pipeline cache ``model.rs:25``).

``render_frame`` resolves one (nearest) fragment per pixel — exact for
the opaque content the reference wires up. ``render_frame_peeled`` adds
order-independent transparency: the L nearest fragments per pixel
(single-pass multilayer scan, or multi-pass zlow peeling on the Pallas
backend) composite back-to-front with the reference blend state.
"""

from __future__ import annotations

import functools
import logging
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.model import DEBUG_PALETTE, DrawBatch

logger = logging.getLogger("mt_renderer_tpu.device")

W_EPS = 1e-6
PEEL_EPS = 1e-6        # depth-peel layer separation (NDC depth units)
SEG_PX = 2048          # tap-compaction row granularity in pixels: one
                       # WHOLE flattened tile (TILE_H x TILE_W). XLA TPU
                       # gathers are row-count priced (2.1 ns/row,
                       # width-insensitive — gather_shapes), which cuts
                       # BOTH ways: fine 128-px sublane rows hug the
                       # covered pixels (fewer pool-gather pixels) but
                       # multiply every row-indexed machinery op
                       # (liveness reduce, compaction scatter, expand
                       # gather) by P/SEG_PX. Measured (seg_ab.py, r3
                       # cont.): 128-px rows LOSE 1.5-1.8 ms on the
                       # default split peel and 7.5 ms on glass
                       # mip-peel, and only tie at best (glass sp) —
                       # whole-tile rows are the optimum because row
                       # WIDTH is free while row COUNT is not. The
                       # machinery stays parameterized by this constant
                       # (seg_ab.py flips it) — must divide TILE_H*TILE_W
                       # and be a multiple of TILE_W.
TRI_PAD = 384          # triangle-count padding quantum — one S-packed
                       # raster chunk (pallas_raster.CT = K·S triangles
                       # per (K, NF) setup block)
DEFAULT_CHUNK = 16     # triangles per scan step


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceScene:
    """A DrawBatch uploaded once to device memory (``jax.device_put`` —
    the analog of the reference's vertex/index/texture uploads,
    model.rs:77-87 / texture.rs:12-30)."""

    # geometry is DE-INDEXED at upload: arrays are corner-major
    # (V = 3·Tp rows, triangle corners contiguous) so the per-triangle
    # stages reshape instead of gathering through an index buffer —
    # vertex gathers were ~5 ms of the r2 frame. Costs ~2-4x vertex
    # memory (a few MB/100k tris); skinning stays cheap via the one-hot
    # palette matmul.
    positions: jax.Array      # (3Tp, 3) f32
    uvs: jax.Array            # (3Tp, 2) f32
    normals: jax.Array        # (3Tp, 3) f32 (zeros when the layout has none)
    joints: jax.Array         # (3Tp, W) i32
    weights: jax.Array        # (3Tp, W) f32
    tri_texture: jax.Array    # (Tp,) i32 atlas layer, -1 = untextured
    tri_debug_id: jax.Array   # (Tp,) i32
    tri_flat: jax.Array       # (Tp, 4) f32 flat color 0-255; alpha<0 = unused
    tri_material: jax.Array   # (Tp,) i32 material slot
    mat_color: jax.Array      # (M, 4) f32 per-material RGBA multiplier 0-1
    tri_valid: jax.Array      # (Tp,) bool — False for padding
    tri_parts: jax.Array      # (Tp,) i32 parts_no per triangle
    parts_mask: jax.Array     # (P,) bool — per-part visibility (model.rs:318-320)
    tex_size: jax.Array       # (L, 2) i32 actual (h, w) per layer
    mip_pool: jax.Array       # (P, 16) u8 — all mips; 2x2 quad per row
    mip_table: jax.Array      # (L, M, 3) i32 — (offset, h, w) per mip
    # cached per-triangle constants, COLUMN-major ((9, Tp): a (Tp, 9)
    # array would lane-pad 9 → 128 at rest). Rows: [tex_f32,
    # cbase rgba (1 for textured, flat/debug base otherwise),
    # off_hi, off_lo, th, tw]. Static per scene — computed at upload so
    # the per-frame setup does ZERO per-triangle table gathers
    # (palette/flat/mip-table gathers were ~1.5 ms/frame, r2); the
    # animatable mat_color folds in per frame as C = mat × cbase via a
    # one-hot MXU select.
    cols_const: jax.Array     # (10, Tp) f32
    # tri_valid & parts_mask[tri_parts], refreshed by set_parts_mask —
    # keeps the per-frame parts gather out of the setup stage
    tri_vis: jax.Array        # (Tp,) bool
    num_joints: int           # static
    skinned: bool             # static
    num_mips: int = 1         # static
    # "quad" (16 B/texel, one gather per bilinear tap), "narrow"
    # (4 B/texel, FOUR gathers per tap — gathers are row-count priced,
    # so taps cost ~4x; the memory-constrained trade, r2 verdict #5),
    # "tri" (64 B/texel: quad + the 3x3 parent block, so a TRILINEAR
    # tap is ONE gather — ~2.1-2.8x faster mip sampling for 4x the
    # bytes; gather_width.py measured width free to 128 B rows, r4),
    # or "bc1" (COMPRESSED-resident, r5: 64 B per 4x4 block = 4
    # B/texel, one row-priced gather per trilinear tap + in-register
    # BC1 decode — the reference's keep-BCn-in-VRAM envelope,
    # texture.rs:12-30), or "bc7" (ditto at 16 B/block = 1 B/texel
    # logical rows of 128 B: 2x2 child + 2x2 parent BLOCK groups, 8
    # in-register all-mode BC7 texel decodes per trilinear tap)
    pool_mode: str = "quad"   # static
    # pool_mode="bc7" only: the packed per-block partition-hint pool
    # (bcn.bc7_block_hints baked into 64 B logical rows mirroring the
    # block rows — replaces the partitioned modes' per-pixel 64-entry
    # spec-table gathers with ONE extra row-priced gather); a (1, 128)
    # dummy otherwise
    aux_pool: jax.Array = None
    # pool_mode="bc7" only: the BC7 modes actually present in the
    # uploaded blocks (static — the sampler compiles ONLY these modes'
    # decodes; mode-6 synthetic content pays mode 6 alone)
    bc7_modes: tuple = ()     # static

    def tree_flatten(self):
        children = (
            self.positions, self.uvs, self.normals, self.joints,
            self.weights,
            self.tri_texture, self.tri_debug_id, self.tri_flat,
            self.tri_material, self.mat_color,
            self.tri_valid, self.tri_parts, self.parts_mask,
            self.tex_size,
            self.mip_pool, self.mip_table,
            self.cols_const, self.tri_vis, self.aux_pool,
        )
        return children, (self.num_joints, self.skinned, self.num_mips,
                          self.pool_mode, self.bc7_modes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        *main, aux_pool = children
        num_joints, skinned, num_mips, pool_mode, bc7_modes = aux
        return cls(*main, num_joints, skinned, num_mips, pool_mode,
                   aux_pool, bc7_modes)


def pool_budget_default() -> int | None:
    """The texel-pool byte budget: ``MTR_POOL_BUDGET_MB`` if set, else
    3/4 of the device's reported memory limit (axon/TPU exposes it via
    ``memory_stats``), else None (unbudgeted — CPU interpret runs)."""
    mb = os.environ.get("MTR_POOL_BUDGET_MB")
    if mb:
        return int(float(mb) * 2**20)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        return (limit * 3) // 4 if limit else None
    except Exception:
        return None


_TRI_BUILD_CHUNK = 1 << 23      # rows per device build step (bounds the
                                # build's peak memory to ~chunk * 100 B)


def _tri_chunk_rows(qpool, segs, r0, chunk: int):
    """One build step of the 64 B tri pool: rows [r0, r0+chunk) of the
    quad pool gain their 3x3 level-(m+1) parent block (lanes 16-51;
    lanes 52-63 zero). ``segs`` (S, 6) i32 [off, h, w, poff, ph, pw]
    sorted by off — one row per stored (texture, mip) level; poff = -1
    for a texture's last real level (the fused sampler never reads its
    parent lanes: m1 == m0 there, see _trilinear_arith)."""
    rows = qpool.shape[0]
    rid = jnp.minimum(r0 + jnp.arange(chunk, dtype=jnp.int32), rows - 1)
    seg = jnp.searchsorted(segs[:, 0], rid, side="right") - 1
    seg = jnp.clip(seg, 0, segs.shape[0] - 1)
    off, h, w, poff, ph, pw = (segs[:, i][seg] for i in range(6))
    local = rid - off
    x = local % jnp.maximum(w, 1)
    y = local // jnp.maximum(w, 1)
    k = (x >> 1) - 1
    j = (y >> 1) - 1
    has_p = poff >= 0
    parts = [qpool[rid]]
    for dy in range(3):
        for dx in range(3):
            px = jnp.clip(k + dx, 0, jnp.maximum(pw - 1, 0))
            py = jnp.clip(j + dy, 0, jnp.maximum(ph - 1, 0))
            pidx = jnp.where(has_p, poff + py * pw + px, 0)
            v = qpool[pidx][:, :4]
            parts.append(jnp.where(has_p[:, None], v, jnp.uint8(0)))
    parts.append(jnp.zeros((chunk, 12), jnp.uint8))
    return jnp.concatenate(parts, axis=1)                  # (chunk, 64)


def _bc1_chunk_rows(cpool, segs, r0, chunk: int):
    """One build step of the 64 B bc1 pool: logical rows [r0, r0+chunk)
    gain their 2x2 child-block group (lanes 0-31: self, right, down,
    down-right, clamp-to-edge) and 2x2 level-(m+1) parent-block group
    (lanes 32-63, anchored at A = (2·bx−1)>>2 per axis — the anchor
    that contains every parent bilinear footprint of this block, see
    _bc1_trilinear_fused). ``cpool`` (B, 8) u8 compact blocks; ``segs``
    (S, 6) i32 [off, bh, bw, poff, pbh, pbw] in BLOCK units sorted by
    off; poff = -1 for a texture's last real level (parent lanes zero,
    never read: m1 == m0 there)."""
    rows = cpool.shape[0]
    rid = jnp.minimum(r0 + jnp.arange(chunk, dtype=jnp.int32), rows - 1)
    seg = jnp.searchsorted(segs[:, 0], rid, side="right") - 1
    seg = jnp.clip(seg, 0, segs.shape[0] - 1)
    off, bh, bw, poff, pbh, pbw = (segs[:, i][seg] for i in range(6))
    local = rid - off
    bx = local % jnp.maximum(bw, 1)
    by = local // jnp.maximum(bw, 1)
    parts = []
    for dy in (0, 1):
        for dx in (0, 1):
            nx = jnp.clip(bx + dx, 0, jnp.maximum(bw - 1, 0))
            ny = jnp.clip(by + dy, 0, jnp.maximum(bh - 1, 0))
            parts.append(cpool[off + ny * bw + nx])
    ax = jnp.clip((2 * bx - 1) >> 2, 0, jnp.maximum(pbw - 1, 0))
    ay = jnp.clip((2 * by - 1) >> 2, 0, jnp.maximum(pbh - 1, 0))
    has_p = poff >= 0
    for dy in (0, 1):
        for dx in (0, 1):
            nx = jnp.clip(ax + dx, 0, jnp.maximum(pbw - 1, 0))
            ny = jnp.clip(ay + dy, 0, jnp.maximum(pbh - 1, 0))
            pidx = jnp.where(has_p, poff + ny * pbw + nx, 0)
            parts.append(jnp.where(has_p[:, None], cpool[pidx],
                                   jnp.uint8(0)))
    return jnp.concatenate(parts, axis=1)                  # (chunk, 64)


@functools.partial(jax.jit, static_argnames=("chunk", "rowfn"),
                   donate_argnums=(3,))
def _pool_build_steps(src_pool, segs, starts, out, chunk: int, rowfn):
    """All build steps in ONE program, accumulating into a DONATED
    packed buffer via dynamic_update_slice — XLA updates it in place,
    so peak memory is src_pool + out + one chunk's temporaries (a
    chunk-concatenate build held TWO copies of the GB-class tri pool
    and OOM'd the bigtex scene). The last chunk's start is clamped:
    its overlap rows are recomputed with identical values. ``starts``
    are PACKED-row starts; each step computes 2*chunk logical 64 B rows
    (``rowfn``: _tri_chunk_rows or _bc1_chunk_rows) and packs pairs
    side by side into (chunk, 128) physical rows."""
    def step(i, out):
        vals = rowfn(src_pool, segs, 2 * starts[i], 2 * chunk)
        return jax.lax.dynamic_update_slice(
            out, vals.reshape(chunk, 128), (starts[i], 0))
    return jax.lax.fori_loop(0, starts.shape[0], step, out)


def _packed_pool_build(src_pool, segs_h: np.ndarray, rowfn):
    """Shared driver for the 2-texels-per-128 B packed pool builds."""
    rows = int(src_pool.shape[0])
    if segs_h.size == 0:
        segs_h = np.array([[0, 1, 1, -1, 1, 1]], np.int32)
    segs = jax.device_put(np.asarray(segs_h, np.int32))
    half = (rows + 1) // 2
    chunk = min(_TRI_BUILD_CHUNK // 2, max(1 << 11, half))
    chunk = min(chunk, half)
    starts = np.arange(0, half, chunk, dtype=np.int32)
    starts = jnp.asarray(np.minimum(starts, half - chunk))
    out = jnp.zeros((half, 128), jnp.uint8)
    return _pool_build_steps(src_pool, segs, starts, out, chunk, rowfn)


def _build_bc1_pool(cpool, segs_h: np.ndarray):
    """(B, 8) u8 compact BC1 blocks → (ceil(B/2), 128) u8 bc1 pool:
    logical 64 B rows (child 2x2 block group + parent 2x2 block group),
    TWO block rows packed per physical row — the same u8 128-byte tile
    packing as the tri pool (_build_tri_pool), addressed by _tri_fetch.
    Built on device: host upload traffic stays the compact blocks'
    0.5 B/src texel."""
    return _packed_pool_build(cpool, segs_h, _bc1_chunk_rows)


@functools.partial(jax.jit, static_argnames=("chunk",),
                   donate_argnums=(3,))
def _bc7_pool_build_steps(src_pool, segs, starts, out, chunk: int):
    """Unpacked twin of _pool_build_steps for 128 B logical rows
    (bc7: 8 x 16 B blocks fill the physical row exactly — no pair
    packing). Same donated-accumulate structure."""
    def step(i, out):
        vals = _bc1_chunk_rows(src_pool, segs, starts[i], chunk)
        return jax.lax.dynamic_update_slice(out, vals, (starts[i], 0))
    return jax.lax.fori_loop(0, starts.shape[0], step, out)


def _build_bc7_pool(cpool, segs_h: np.ndarray):
    """(B, 16) u8 compact BC7 blocks → (B, 128) u8 bc7 pool: each row
    the 2x2 child-block group + 2x2 parent-block group of one 4x4
    block (the _bc1_chunk_rows geometry at 16 B/block — 8 blocks fill
    the 128 B u8 tile row exactly, one physical row per logical row).
    Built on device: host upload traffic stays the compact blocks'
    1 B/src texel."""
    rows = int(cpool.shape[0])
    if segs_h.size == 0:
        segs_h = np.array([[0, 1, 1, -1, 1, 1]], np.int32)
    segs = jax.device_put(np.asarray(segs_h, np.int32))
    chunk = min(_TRI_BUILD_CHUNK, max(1 << 11, rows))
    chunk = min(chunk, rows)
    starts = np.arange(0, rows, chunk, dtype=np.int32)
    starts = jnp.asarray(np.minimum(starts, rows - chunk))
    out = jnp.zeros((rows, 128), jnp.uint8)
    return _bc7_pool_build_steps(cpool, segs, starts, out, chunk)


def _build_tri_pool(qpool, segs_h: np.ndarray):
    """(R, 16) u8 quad pool → (ceil(R/2), 128) u8 tri pool: logical
    64 B rows (quad + 3x3 parent block), TWO texels packed per physical
    row. u8 arrays tile at a 128-BYTE row stride on TPU (a (R, 64)
    pool's in-program copy padded 2x and OOM'd the GB-scale scene —
    the compile dump's `Extra memory due to padding`), so 128 B
    physical rows carry zero padding waste; _tri_fetch addresses
    logical row i as pool[i >> 1] + a parity select, still ONE
    row-priced gather. Built on device in chunks — host upload traffic
    stays the quad pool's."""
    return _packed_pool_build(qpool, segs_h, _tri_chunk_rows)


def _mip_downsample(img: np.ndarray) -> np.ndarray:
    """One 2x2 box-filter mip step, (h, w, 4) u8 -> (h/2, w/2, 4) u8 —
    the ONE definition every mip chain in the framework is built with
    (upload, the pool-bias equivalence tests, content pipelines)."""
    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    x = img[: h2 * 2, : w2 * 2].astype(np.uint16)
    if h >= 2 and w >= 2:
        x = (x.reshape(h2, 2, w2, 2, 4).sum((1, 3)) + 2) >> 2
    elif w >= 2:
        x = (x.reshape(h2, w2, 2, 4).sum(2) + 1) >> 1
    elif h >= 2:
        x = (x.reshape(h2, 2, w2, 4).sum(1) + 1) >> 1
    return x.astype(np.uint8)


def mip_chain(img: np.ndarray) -> list:
    """Full mip pyramid of one (h, w, 4) u8 texture down to 1x1."""
    chain, cur = [img], img
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        cur = _mip_downsample(cur)
        chain.append(cur)
    return chain


def upload(batch: DrawBatch, pool_mode: str = "quad", *,
           pool_budget_bytes: int | None = None,
           pool_bias: int | str = 0,
           mipmap: bool | None = None,
           mip_chains: list | None = None,
           bc1_chains: list | None = None,
           bc7_chains: list | None = None) -> DeviceScene:
    """Pad + device_put a host DrawBatch. Called once at load time.

    ``pool_mode``: "quad" (default) stores each texel's full 2x2
    bilinear footprint per pool row (16 B/texel + mips ≈ 21.3 B per
    source texel; one gather per tap). "narrow" stores bare RGBA rows
    (4 B/texel ≈ 5.3 B per source texel) and samples with four gathers
    per tap — ~4x the tap cost (gathers are row-count priced), for
    memory-constrained scenes. The reference keeps BCn compressed in
    VRAM (1 B/texel, texture.rs:12-30) and lets GPU hardware decode;
    TPU has no BCn sampler, so the pool IS the decoded working set and
    its footprint is reported by ``pool_stats`` / logged here.

    Pool budget policy (r3 verdict "missing #1", the game-scale memory
    envelope): ``pool_budget_bytes`` (default ``pool_budget_default()``
    = env ``MTR_POOL_BUDGET_MB`` or 3/4 of the device memory limit)
    bounds the pool at its LIVE in-program cost — ``pool_bytes x 2``,
    the runtime argument PLUS the tiled copy XLA materializes around a
    gathered-from pool (measured r4: the tri pool's in-program copy
    OOM'd the bigtex scene while the argument alone fit comfortably).
    ``pool_mode="auto"`` picks the fastest mode that fits: with
    ``mipmap=True`` (the caller will sample with mip chains) it
    prefers "tri" — the measured production default for trilinear
    content (-19..-58%/frame, tripool_ab.py) — then falls back to quad
    and narrow (each fallback logged: tri->quad costs ~2.1-2.8x per
    trilinear tap, quad->narrow ~4x per tap); without the hint it
    picks quad-else-narrow. It raises ``MemoryError`` if even narrow
    exceeds the budget (an explicit mode request that exceeds it also
    raises rather than silently downgrading).

    ``pool_bias``: drop the top ``pool_bias`` mip levels per texture at
    decode — the streaming analog of the reference's texture LOD clamp
    (a lossy QUALITY knob, so it is never applied implicitly: magnified
    content blurs; minified content is pixel-identical, it sampled
    those mips anyway). Each bias step cuts the pool ~4x (the r4
    measured gather law is two-regime — ~1.6 ns/row while the pool is
    cache-resident (<~8 MiB), 8.1 ns/row HBM-resident — so bias also
    buys sample rate once it crosses the knee, not just bytes).
    ``pool_bias="auto"`` raises the bias only as far as needed for the
    chosen mode to fit the budget (logged per step).

    ``pool_mode="tri"`` (the trilinear speed/memory trade, r4): 64
    B/texel rows — the 2x2 quad PLUS the 3x3 level-(m+1) parent block
    every trilinear footprint needs — so a trilinear tap is ONE gather
    instead of two. Gathers are row-count priced up to 128 B rows
    (tools/bench/gather_width.py: one 64 B gather = 5.7 ns vs two 16 B
    = 16.1 ns HBM-resident, 1.6 vs 3.4 cache-resident), so trilinear
    sampling runs ~2.1-2.8x faster for 4x the pool bytes. Bilinear taps
    read lanes 0-15 of the same rows (row indices are unchanged). The
    wide rows are built ON DEVICE from the uploaded quad rows
    (_build_tri_pool) — host upload traffic stays the quad pool's.

    ``pool_mode="bc1"`` (the compressed-resident envelope — the
    reference's actual texture design point, texture.rs:12-30 /
    renderer_app_manager.rs:107): textures are BC1-encoded at load
    (render/bcn.encode_bc1_numpy) and stay compressed on device; the
    shade epilogue decodes in-register at sample time (exact integer
    ops, bcn's decode arithmetic). One logical 64 B row per 4x4 BLOCK
    bakes the 2x2 child-block group plus the 2x2 level-(m+1) parent-
    block group — a full TRILINEAR footprint in ONE row-priced gather
    (the tri-pool trick at block granularity). 4 B/texel resident
    (4x under quad, 16x under tri) and 0.5 B/texel host upload (the
    compact blocks; rows bake on device, _build_bc1_pool), and ~16
    pixels share each gathered row where texel-pool rows are touched
    once (the HBM gather price is miss-dominated — the bigtex lever).
    BC1 is LOSSY (565 endpoints + 2-bit codes, 1-bit alpha), so like
    ``pool_bias`` it is never applied implicitly — the caller opts
    into the content change. Renders on the mipmap pallas path and the
    scan backend (the non-mip tap kernel emits texel-row addresses;
    use mipmap=True or scan, like narrow).

    ``bc1_chains`` (pool_mode="bc1" only): per-texture lists of
    ``(blocks (nb, 8) u8, height, width)`` — ALREADY-compressed mip
    chains, e.g. straight out of a BC1 ``.tex`` asset
    (``formats.tex.TextureFile.bc1_chain``). The blocks go into the
    pool VERBATIM (no decode→box-filter→re-encode generation loss, and
    the asset's own mip chain is honored — exactly the reference's
    upload, rtexture.rs); each level is host-decoded once for the
    budget/bias/opacity bookkeeping.

    ``pool_mode="bc7"`` (r5): the same compressed-resident envelope for
    BC7 content — 16 B blocks stay resident (1 B/texel logical rows of
    128 B: 2x2 child + 2x2 parent BLOCK groups, _build_bc7_pool) and
    the shade epilogue runs 8 in-register single-texel BC7 decodes per
    trilinear tap (bcn.bc7_texel_device — exact, all modes). Only the
    modes PRESENT in the uploaded blocks compile (static
    ``scene.bc7_modes``); blocks of the partitioned modes (0-3, 7)
    additionally gather a baked per-block partition-hint row
    (bcn.bc7_block_hints, ``aux_pool``) instead of per-pixel spec-table
    lookups. Synthetic content encodes via the mode-6 fixture encoder
    (lossy — opt-in like bc1); real assets pass ``bc7_chains``
    (``(blocks (nb, 16) u8, height, width)`` per level, e.g.
    ``TextureFile.bc7_chain``) through VERBATIM. Sampling cost is
    priced by tools/bench/bc7_probe.py; same backend constraints as
    bc1 (mipmap pallas path or scan)."""
    if pool_mode not in ("quad", "narrow", "auto", "tri", "bc1", "bc7"):
        raise ValueError(f"unknown pool_mode {pool_mode!r}")
    if pool_budget_bytes is None:
        pool_budget_bytes = pool_budget_default()
    t = len(batch.tris)
    tp = max(TRI_PAD, -(-t // TRI_PAD) * TRI_PAD)
    tris = np.zeros((tp, 3), np.int64)
    tris[:t] = batch.tris
    # corner-PLANAR order: [all corner0s | all corner1s | all corner2s],
    # so per-corner components slice as contiguous 1-D columns (interleaved
    # corners force (Tp, 3) intermediates, which lane-pad 3 -> 128)
    corner = tris.T.reshape(-1)          # (3Tp,) de-indexing permutation
    tri_tex = np.full(tp, -1, np.int32)
    tri_tex[:t] = batch.tri_texture
    tri_dbg = np.zeros(tp, np.int32)
    tri_dbg[:t] = batch.tri_debug_id
    tri_flat = np.full((tp, 4), -1.0, np.float32)
    if batch.tri_flat is not None:
        tri_flat[:t] = batch.tri_flat
    tri_mat = np.zeros(tp, np.int32)
    tri_mat[:t] = batch.material_ids()
    # per-slot tints travel on the batch (same attribute the CPU oracle
    # reads — cpu_reference.render); animate post-upload via
    # dataclasses.replace(scene, mat_color=...)
    mat_color = getattr(batch, "mat_color_host", None)
    if mat_color is None:
        mat_color = np.ones((batch.num_materials, 4), np.float32)
    else:
        mat_color = np.asarray(mat_color, np.float32)
    valid = np.zeros(tp, bool)
    valid[:t] = True
    tri_parts = np.zeros(tp, np.int32)
    if batch.tri_parts is not None and len(batch.tri_parts) >= t:
        tri_parts[:t] = batch.tri_parts[:t]
    n_parts = max(8, int(tri_parts.max()) + 1)
    parts_mask = np.ones(n_parts, bool)

    texs = batch.textures or []
    if texs:
        sizes = np.array([(x.shape[0], x.shape[1]) for x in texs], np.int32)
    else:
        sizes = np.array([[4, 4]], np.int32)

    # all texture data lives in ONE flat texel pool (mip 0 included):
    # heterogeneous sizes cost exactly their own texels — no padded-
    # atlas waste. Mip pyramids (2x2 box filter) extend the pool — the
    # minification path the reference lacks (it uploads only the first
    # mip, rtexture.rs:126-130). Each pool row stores the texel's full
    # 2x2 bilinear footprint (self, right, down, down-right, clamping
    # baked in), so one gather serves a whole bilinear tap — gathers are
    # the dominant sampling cost on TPU.
    pool_parts, tables = [], []
    offset = 0
    n_mips = 1
    src_texs = texs if texs else [np.zeros((4, 4, 4), np.uint8)]
    raw_chains = None
    if bc1_chains is not None or bc7_chains is not None:
        # pre-compressed asset chains: decode each level ONCE for the
        # bookkeeping (budget/bias/opacity all read decoded shapes and
        # alpha), keep the raw blocks for the pool
        bcn_chains, want_mode, blk_b = (
            (bc1_chains, "bc1", 8) if bc1_chains is not None
            else (bc7_chains, "bc7", 16))
        if pool_mode != want_mode:
            raise ValueError(
                f"{want_mode}_chains requires pool_mode={want_mode!r}")
        if mip_chains is not None:
            raise ValueError(
                f"pass mip_chains OR {want_mode}_chains, not both")
        if bc1_chains is not None and bc7_chains is not None:
            raise ValueError("pass bc1_chains OR bc7_chains, not both")
        from .. import native as _nat

        assert len(bcn_chains) == len(src_texs)
        raw_chains = [
            [np.ascontiguousarray(blocks, np.uint8).reshape(-1, blk_b)
             for blocks, _h, _w in chain]
            for chain in bcn_chains
        ]
        _dec = _nat.decode_bc1 if want_mode == "bc1" else _nat.decode_bc7
        mip_chains = [
            [_dec(
                np.ascontiguousarray(blocks, np.uint8).tobytes(), w, h)
             for blocks, h, w in chain]
            for chain in bcn_chains
        ]
    if mip_chains is not None:
        # precomputed per-texture mip chains (content pipelines / the
        # exactness tests pin per-level content; levels need not be
        # box-filter related, only halving in extent)
        tables = [list(c) for c in mip_chains]
        assert len(tables) == len(src_texs)
        n_mips = max(len(c) for c in tables)
        sizes = np.array([(c[0].shape[0], c[0].shape[1])
                          for c in tables], np.int32)
    else:
        for img in src_texs:
            chain = mip_chain(img)
            n_mips = max(n_mips, len(chain))
            tables.append(chain)
    def _rows_at(chains, mode="quad"):
        if mode in ("bc1", "bc7"):  # one pool row per 4x4 block
            return sum(((img.shape[0] + 3) // 4) * ((img.shape[1] + 3) // 4)
                       for chain in chains for img in chain)
        return sum(img.shape[0] * img.shape[1]
                   for chain in chains for img in chain)

    # live bytes per logical row; bc7 = 128 B block row + the hint
    # pool's 64 B/block physical share (both gathered-from)
    _ROW_B = {"quad": 16, "auto": 16, "narrow": 4, "tri": 64, "bc1": 64,
              "bc7": 192}

    def _pool_need(rows: int, mode: str) -> int:
        """Live in-program bytes to budget for a gathered-from pool:
        the runtime ARGUMENT plus the tiled copy XLA materializes
        inside the program (measured r4: a pool at ~0.7x of HBM passed
        the argument-only check and still OOM'd in-program)."""
        return rows * _ROW_B[mode] * 2

    # the mode auto/bias="auto" sizes against: the mode the caller
    # would want unconstrained (tri for trilinear content, else quad)
    want = pool_mode
    if pool_mode == "auto":
        want = "tri" if mipmap else "quad"
    max_bias = max((len(c) - 1 for c in tables), default=0)
    if pool_bias == "auto":
        bias = 0
        while bias < max_bias and pool_budget_bytes is not None:
            chains = [c[min(bias, len(c) - 1):] for c in tables]
            if _pool_need(_rows_at(chains, want),
                          want) <= pool_budget_bytes:
                break
            bias += 1
            logger.warning(
                "texel pool: bias -> %d (LOD clamp; dropping each "
                "texture's top mip to fit the %.0f MiB budget)",
                bias, pool_budget_bytes / 2**20)
    else:
        bias = int(pool_bias)
    if bias:
        if raw_chains is not None:
            raw_chains = [c[min(bias, len(c) - 1):] for c in raw_chains]
        tables = [c[min(bias, len(c) - 1):] for c in tables]
        n_mips = max(len(c) for c in tables)
        sizes = np.array([(c[0].shape[0], c[0].shape[1])
                          for c in tables], np.int32)

    total_rows = _rows_at(tables, want)
    if pool_mode == "auto":
        candidates = (want, "quad", "narrow") if want == "tri" \
            else (want, "narrow")
        pool_mode = candidates[-1]
        for cand in candidates:
            if (pool_budget_bytes is None
                    or _pool_need(total_rows, cand) <= pool_budget_bytes):
                pool_mode = cand
                break
        if pool_mode != want:
            logger.warning(
                "texel pool auto mode: %s pool (%.0f MiB live = bytes "
                "x2 in-program) exceeds the %.0f MiB budget — using %s "
                "(%.0f MiB; %s)",
                want, _pool_need(total_rows, want) / 2**20,
                pool_budget_bytes / 2**20, pool_mode,
                _pool_need(total_rows, pool_mode) / 2**20,
                "trilinear taps cost ~2.1-2.8x" if want == "tri"
                and pool_mode == "quad" else
                "taps cost ~4x, gathers are row-count priced")
    need = _pool_need(total_rows, pool_mode)
    if pool_budget_bytes is not None and need > pool_budget_bytes:
        raise MemoryError(
            f"texel pool ({pool_mode}) needs {need / 2**20:.0f} MiB live "
            f"({total_rows * _ROW_B[pool_mode] / 2**20:.0f} MiB argument "
            f"x2 for the in-program gathered-from copy) > budget "
            f"{pool_budget_bytes / 2**20:.0f} MiB — raise "
            f"MTR_POOL_BUDGET_MB / pool_budget_bytes, pass pool_bias "
            f"(LOD clamp at decode), or split the scene")

    def quad_rows(img):
        """(h, w, 4) u8 → (h·w, 16): texel + right/down/down-right
        neighbors (clamp-to-edge baked in)."""
        h, w = img.shape[:2]
        xr = np.minimum(np.arange(w) + 1, w - 1)
        yd = np.minimum(np.arange(h) + 1, h - 1)
        return np.concatenate(
            [img, img[:, xr], img[yd], img[yd][:, xr]], axis=-1
        ).reshape(-1, 16)

    row_bytes = {"quad": 16, "tri": 16, "narrow": 4, "bc1": 8,
                 "bc7": 16}[pool_mode]
    table = np.zeros((len(src_texs), n_mips, 3), np.int32)
    segs = []     # (off, h, w, parent_off|-1, ph, pw) per stored level
                  # — texel units (quad/tri) or 4x4-block units (bc1/bc7)
    if pool_mode in ("bc1", "bc7"):
        from .. import native as _native
        from . import bcn

        def _bdims(im):
            return (im.shape[0] + 3) // 4, (im.shape[1] + 3) // 4
    for li, chain in enumerate(tables):
        for mi in range(n_mips):
            img = chain[min(mi, len(chain) - 1)]
            if mi < len(chain):
                table[li, mi] = (offset, img.shape[0], img.shape[1])
                if pool_mode in ("bc1", "bc7"):
                    bh_, bw_ = _bdims(img)
                    if raw_chains is not None:
                        blk = raw_chains[li][mi]
                        assert blk.shape[0] == bh_ * bw_, (
                            blk.shape, img.shape)
                        pool_parts.append(blk)
                    elif pool_mode == "bc7":
                        pool_parts.append(bcn.encode_bc7_mode6_numpy(img))
                    else:
                        pool_parts.append(_native.encode_bc1(img))
                    if mi + 1 < len(chain):
                        segs.append((offset, bh_, bw_,
                                     offset + bh_ * bw_,
                                     *_bdims(chain[mi + 1])))
                    else:
                        segs.append((offset, bh_, bw_, -1, 1, 1))
                    offset += bh_ * bw_
                    continue
                pool_parts.append(quad_rows(img) if row_bytes == 16
                                  else img.reshape(-1, 4))
                h, w = img.shape[:2]
                if mi + 1 < len(chain):
                    nxt = chain[mi + 1]
                    segs.append((offset, h, w, offset + h * w,
                                 nxt.shape[0], nxt.shape[1]))
                else:
                    segs.append((offset, h, w, -1, 1, 1))
                offset += h * w
            else:
                table[li, mi] = table[li, len(chain) - 1]
    mip_pool = (np.concatenate(pool_parts) if pool_parts
                else np.zeros((1, row_bytes), np.uint8))
    src_texels = int(sum(t.shape[0] * t.shape[1] for t in texs)) if texs \
        else 0
    pool_bytes = mip_pool.shape[0] * _ROW_B[pool_mode]
    logger.info(
        "texel pool (%s): %d rows, %.2f MiB (%d source texels, "
        "%.2f B/src texel incl. mips)",
        pool_mode, mip_pool.shape[0],
        pool_bytes / 2**20, src_texels,
        pool_bytes / max(src_texels, 1),
    )

    nj = len(batch.inverse_bind_mats) if batch.inverse_bind_mats is not None else 1

    if batch.num_vertices == 0:
        corner = np.zeros(3 * tp, np.int64)
        pos_src = np.zeros((1, 3), np.float32)
        uv_src = np.zeros((1, 2), np.float32)
        nrm_src = np.zeros((1, 3), np.float32)
        j_src = np.zeros((1, batch.joints.shape[1] if batch.joints.ndim == 2 else 4), np.int32)
        w_src = np.zeros_like(j_src, dtype=np.float32)
    else:
        pos_src = batch.positions.astype(np.float32)
        uv_src = batch.uvs.astype(np.float32)
        nrm_src = batch.normals_or_zero().astype(np.float32)
        j_src = batch.joints.astype(np.int32)
        w_src = batch.weights.astype(np.float32)

    # per-triangle constant columns (see DeviceScene.cols_const)
    lsafe = np.clip(np.maximum(tri_tex, 0), 0, table.shape[0] - 1)
    off0 = table[lsafe, 0, 0].astype(np.int64)
    textured_h = tri_tex >= 0
    use_flat = tri_flat[:, 3] >= 0.0
    pal = np.concatenate(
        [DEBUG_PALETTE.astype(np.float32),
         np.full((20, 1), 255.0, np.float32)], axis=1)
    dbg_rgba = pal[tri_dbg % 20]                          # (Tp, 4)
    # per-texture full opacity (alpha 255 at every texel of every mip):
    # lets the raster kernel cull fragments behind opaque ones exactly
    # (see setup_packed_cols' tex encoding / pallas ocull)
    tex_opaque = np.array(
        [all((img[..., 3] == 255).all() for img in chain)
         for chain in tables], bool,
    ) if tables else np.ones(1, bool)
    cols_const = np.empty((10, tp), np.float32)
    cols_const[0] = tri_tex.astype(np.float32)
    for ch in range(4):
        base = np.where(use_flat, tri_flat[:, ch], dbg_rgba[:, ch])
        cols_const[1 + ch] = np.where(textured_h, 1.0, base)
    cols_const[5] = (off0 // 4096).astype(np.float32)
    cols_const[6] = (off0 % 4096).astype(np.float32)
    cols_const[7] = table[lsafe, 0, 1].astype(np.float32)
    cols_const[8] = table[lsafe, 0, 2].astype(np.float32)
    cols_const[9] = np.where(textured_h, tex_opaque[lsafe], True
                             ).astype(np.float32)

    dp = jax.device_put
    aux_pool_dev = None
    bc7_modes = ()
    if pool_mode == "tri":
        mip_pool_dev = _build_tri_pool(dp(mip_pool),
                                       np.asarray(segs, np.int32))
    elif pool_mode == "bc1":
        # host uploads the COMPACT 8 B blocks (0.5 B/src texel); the
        # neighbor+parent-baked 64 B rows assemble on device
        mip_pool_dev = _build_bc1_pool(dp(mip_pool),
                                       np.asarray(segs, np.int32))
    elif pool_mode == "bc7":
        # compact 16 B blocks up; 128 B child+parent block-group rows
        # bake on device. Only the modes PRESENT compile into the
        # sampler (static), and the partition-hint pool exists only
        # when partitioned modes (0-3, 7) do.
        from . import bcn as _bcn

        mip_pool_dev = _build_bc7_pool(dp(mip_pool),
                                       np.asarray(segs, np.int32))
        byte0 = mip_pool[:, 0]
        bc7_modes = tuple(
            m for m in range(8)
            if ((byte0 & ((1 << (m + 1)) - 1)) == (1 << m)).any())
        if any(m in (0, 1, 2, 3, 7) for m in bc7_modes):
            hints = _bcn.bc7_block_hints(mip_pool).view(np.uint8)
            aux_pool_dev = _build_bc1_pool(dp(hints),
                                           np.asarray(segs, np.int32))
    else:
        mip_pool_dev = dp(mip_pool)
    if aux_pool_dev is None:
        aux_pool_dev = dp(np.zeros((1, 128), np.uint8))
    return DeviceScene(
        positions=dp(pos_src[corner]),
        uvs=dp(uv_src[corner]),
        normals=dp(nrm_src[corner]),
        joints=dp(j_src[corner]),
        weights=dp(w_src[corner]),
        tri_texture=dp(tri_tex), tri_debug_id=dp(tri_dbg),
        tri_flat=dp(tri_flat),
        tri_material=dp(tri_mat), mat_color=dp(mat_color),
        tri_valid=dp(valid), tri_parts=dp(tri_parts),
        parts_mask=dp(parts_mask),
        tex_size=dp(sizes),
        mip_pool=mip_pool_dev, mip_table=dp(table),
        cols_const=dp(cols_const),
        tri_vis=dp(valid & parts_mask[tri_parts]),
        num_joints=nj, skinned=bool(batch.skinned), num_mips=n_mips,
        pool_mode=pool_mode,
        aux_pool=aux_pool_dev, bc7_modes=bc7_modes,
    )


def pool_stats(scene: DeviceScene) -> dict:
    """Texel-pool memory accounting (r2 verdict #5): the on-device
    working set that replaces the reference's compressed-in-VRAM BCn
    textures (texture.rs:12-30) — or, for pool_mode="bc1", stays
    compressed like them. ``upload_bytes`` is the host→device transfer
    the pool cost (tri/bc1 pools assemble their wide rows on device
    from a compact upload)."""
    rows, row_bytes = scene.mip_pool.shape
    if row_bytes == 128 and scene.pool_mode != "bc7":
        rows *= 2             # tri/bc1 pools: two 64 B logical rows
        row_bytes = 64        # per physical 128 B row (u8 tile stride)
    src = int(np.sum(np.asarray(scene.tex_size).prod(axis=1)))
    upload_b = rows * {"quad": 16, "narrow": 4,
                       "tri": 16,   # device-built from the quad rows
                       "bc1": 8,    # compact 8 B blocks
                       "bc7": 16,   # compact 16 B blocks
                       }[scene.pool_mode]
    total_b = rows * row_bytes
    if scene.pool_mode == "bc7" and scene.aux_pool.shape[0] > 1:
        # the baked partition-hint pool (present only when partitioned
        # modes are): 8 B/block compact upload, 64 B/block resident
        upload_b += rows * 8
        total_b += int(np.prod(scene.aux_pool.shape))
    return {
        "pool_mode": scene.pool_mode,
        "rows": int(rows),    # logical rows: texels, or 4x4 blocks (bcn)
        "bytes": int(total_b),
        "upload_bytes": int(upload_b),
        "src_texels": src,
        "bytes_per_src_texel": round(total_b / max(src, 1), 2),
    }


def set_parts_mask(scene: DeviceScene, parts_disp) -> DeviceScene:
    """Per-frame parts visibility WITHOUT re-upload: returns a scene
    sharing every geometry/texture buffer, with only the (P,) boolean
    mask replaced (the reference toggles `parts_disp` per draw,
    model.rs:318-320; here it folds into tri_valid at setup time).
    Same array shape → same jit signature → no recompilation."""
    import dataclasses

    p = scene.parts_mask.shape[0]
    mask = np.ones(p, bool)
    pd = np.asarray(parts_disp, bool)
    mask[: min(p, len(pd))] = pd[:p]
    mask_dev = jax.device_put(mask)
    # refresh the cached visibility fold on device (one tiny async
    # gather per toggle — never a per-frame cost, never a host transfer)
    tri_vis = _fold_parts_mask(scene.tri_valid, scene.tri_parts, mask_dev)
    return dataclasses.replace(scene, parts_mask=mask_dev, tri_vis=tri_vis)


@jax.jit
def _fold_parts_mask(tri_valid, tri_parts, mask):
    return tri_valid & mask[tri_parts]


# ---------------------------------------------------------------- stages


# Palettes up to this size blend via a one-hot MXU matmul instead of a
# matrix gather — vertex gathers were ~9.5 ms of the 52 ms frame (r2,
# 153k verts). 128 = one lane register: the weighted one-hot fuses to a
# (V, nj→128) f32 operand with no padded (V, W, ...) intermediate.
ONEHOT_SKIN_MAX_JOINTS = 128


def _blend_bone_mats(scene: DeviceScene, bone_mats: jax.Array) -> jax.Array:
    """(V, 4, 4) per-vertex blended palette matrix."""
    hi = jax.lax.Precision.HIGHEST
    v = scene.joints.shape[0]
    nj = bone_mats.shape[0]
    if scene.num_joints <= ONEHOT_SKIN_MAX_JOINTS:
        onehot = jnp.sum(
            (scene.joints[..., None] == jnp.arange(nj, dtype=jnp.int32))
            * scene.weights[..., None],
            axis=1,
        )                                                  # (V, nj)
        return jnp.matmul(
            onehot, bone_mats.reshape(nj, 16), precision=hi
        ).reshape(v, 4, 4)
    # huge palettes: gather WIDE (nj, 16) rows. Gathers are row-priced
    # (16 f32 costs the same as 4), and the minor dim 16 tile-pads 8x —
    # the (V, W, 4, 4) matrix-gather form's (4, 4) minor pair pads
    # (8, 128) = 32x HBM, which OOM'd the 96-joint world scene at
    # 5.76M corner-rows (that scene now rides the one-hot path above)
    m = bone_mats.reshape(nj, 16)[scene.joints]            # (V, W, 16)
    return jnp.einsum("vw,vwk->vk", scene.weights, m,
                      precision=hi).reshape(v, 4, 4)


def vertex_stage(scene: DeviceScene, view_proj: jax.Array,
                 bone_mats: jax.Array | None) -> jax.Array:
    """Skin + transform → (V, 4) clip coords."""
    pos = scene.positions
    if scene.skinned and bone_mats is not None:
        homo = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1), jnp.float32)], 1)
        blended = _blend_bone_mats(scene, bone_mats)
        skinned = jnp.einsum("vij,vj->vi", blended, homo,
                             precision=jax.lax.Precision.HIGHEST)[:, :3]
        # zero-weight vertices (merged unskinned geometry) pass through
        has_w = jnp.sum(scene.weights, axis=1, keepdims=True) > 0
        pos = jnp.where(has_w, skinned, pos)
    homo = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1), jnp.float32)], 1)
    return jnp.matmul(homo, view_proj.T, precision=jax.lax.Precision.HIGHEST)


def world_normals(scene: DeviceScene, bone_mats: jax.Array | None) -> jax.Array:
    """(V, 3) world-space normals: rotated by the blended bone matrix
    upper 3x3 when skinned (rigid-rotation assumption — no inverse
    transpose, matching typical engine skinning)."""
    nrm = scene.normals
    if scene.skinned and bone_mats is not None:
        blended = _blend_bone_mats(scene, bone_mats)
        rot = blended[:, :3, :3]
        has_w = jnp.sum(scene.weights, axis=1, keepdims=True) > 0
        rotated = jnp.einsum("vij,vj->vi", rot, nrm,
                             precision=jax.lax.Precision.HIGHEST)
        nrm = jnp.where(has_w, rotated, nrm)
    return nrm


def setup_stage(scene: DeviceScene, clip: jax.Array, width: int, height: int,
                bone_mats: jax.Array | None = None,
                need_normals: bool = False):
    """Per-triangle setup. Returns a dict of (Tp, ...) arrays.
    Normal triplets are gathered only when the shading needs them
    (``need_normals``) — they cost a (Tp, 3, 3) gather per frame."""
    c = jnp.swapaxes(clip.reshape(3, -1, 4), 0, 1)        # (Tp, 3, 4)
    w = c[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < W_EPS, W_EPS, w)
    ndc = c[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] + 1.0) * (0.5 * width)              # (Tp, 3)
    sy = (1.0 - ndc[..., 1]) * (0.5 * height)
    sz = ndc[..., 2]

    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])

    valid = (
        scene.tri_vis                                     # incl. parts visibility
        & jnp.all(w > W_EPS, axis=1)                      # shared near-reject
        & (area2 < 0.0)                                   # back-face cull
    )

    # edge i: from vertex (i+1) to (i+2); E(p) = A*px + B*py + C, positive
    # inside front faces (cpu_reference.py sign convention)
    ax = jnp.stack([sx[:, 1], sx[:, 2], sx[:, 0]], 1)
    ay = jnp.stack([sy[:, 1], sy[:, 2], sy[:, 0]], 1)
    bx = jnp.stack([sx[:, 2], sx[:, 0], sx[:, 1]], 1)
    by = jnp.stack([sy[:, 2], sy[:, 0], sy[:, 1]], 1)
    ea = by - ay
    eb = -(bx - ax)
    ec = ay * (bx - ax) - ax * (by - ay)
    # top-left rule: boundary counts when the edge is horizontal going
    # right-to-left or any edge going downward (y-down screen space)
    topleft = ((ay == by) & (bx < ax)) | (by > ay)

    # edge-snap band: |e| below this counts as exactly on-edge, so the
    # top-left rule decides deterministically regardless of how each
    # call site's FMA fusion rounds the evaluation. 1e-6 of the
    # coefficient scale ≈ 0.002 px at 1080p — far above eval noise
    # (~2e-7 of scale), far below pixel scale.
    esnap = 1e-6 * (
        jnp.abs(ea) * width + jnp.abs(eb) * height + jnp.abs(ec)
    )

    # conservative screen bbox for cheap tile/chunk rejection
    xmin = jnp.min(sx, 1)
    xmax = jnp.max(sx, 1)
    ymin = jnp.min(sy, 1)
    ymax = jnp.max(sy, 1)

    out = dict(
        ea=ea, eb=eb, ec=ec, topleft=topleft, esnap=esnap,
        area=-area2, sz=sz, inv_w=inv_w, valid=valid,
        uv=jnp.swapaxes(scene.uvs.reshape(3, -1, 2), 0, 1),  # (Tp, 3, 2)
        xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
    )
    if need_normals:
        out["nrm"] = jnp.swapaxes(
            world_normals(scene, bone_mats).reshape(3, -1, 3), 0, 1
        )
    return out


def _coverage(setup_chunk, px, py):
    """Edge coverage of a chunk of triangles over a pixel grid.

    setup_chunk arrays are (K, ...); px/py are (H, W). Returns
    (cov (K,H,W) bool, bary e (K,3,H,W)). Values within the per-edge
    snap band count as exactly on-edge (top-left rule decides)."""
    ea = setup_chunk["ea"][:, :, None, None]
    eb = setup_chunk["eb"][:, :, None, None]
    ec = setup_chunk["ec"][:, :, None, None]
    tl = setup_chunk["topleft"][:, :, None, None]
    snap = setup_chunk["esnap"][:, :, None, None]
    e = ea * px[None, None] + eb * py[None, None] + ec    # (K, 3, H, W)
    on_edge = jnp.abs(e) <= snap
    inside = (~on_edge & (e > 0.0)) | (on_edge & tl)
    cov = jnp.all(inside, axis=1) & setup_chunk["valid"][:, None, None]
    return cov, e


def raster_stage(setup, width: int, height: int, chunk: int,
                 origin=(0, 0), band=None, zlow=None):
    """Scan over triangle chunks → per-pixel (depth f32, winner id i32).

    Winner id is -1 where nothing covers. Later triangles win depth ties
    (LessEqual, matching the ordered CPU path).

    ``origin``/``band`` select a screen sub-rectangle (origin may be a
    traced value — it is how shard_map gives each chip its own band of
    the frame); the viewport transform itself always uses the full
    width/height. ``zlow`` (band-shaped, optional) excludes fragments at
    or nearer than a previous depth layer — the depth-peeling hook.
    """
    bw, bh = band if band is not None else (width, height)
    x0, y0 = origin
    tp = setup["ea"].shape[0]
    nchunks = tp // chunk

    px = jnp.arange(bw, dtype=jnp.float32) + (jnp.float32(x0) + 0.5)
    py = jnp.arange(bh, dtype=jnp.float32) + (jnp.float32(y0) + 0.5)
    px = jnp.broadcast_to(px[None, :], (bh, bw))
    py = jnp.broadcast_to(py[:, None], (bh, bw))

    def reshape_chunks(x):
        return x.reshape((nchunks, chunk) + x.shape[1:])

    scan_in = {k: reshape_chunks(v) for k, v in setup.items()
               if k not in ("uv", "nrm")}

    def step(carry, ch):
        zbest, ibest = carry
        cov, e = _coverage(ch, px, py)
        inv_area = 1.0 / ch["area"][:, None, None]
        b = e * inv_area[:, None]                          # (K, 3, H, W)
        z = jnp.einsum("kp,kphw->khw", ch["sz"], b,
                       precision=jax.lax.Precision.HIGHEST)
        zok = cov & (z <= zbest[None]) & (z >= 0.0)
        if zlow is not None:
            zok &= z > zlow[None]
        # in-chunk resolve: later triangle wins ties → iterate via min on
        # (z, -index) lexicographic key. Encode: z primary; among equal z
        # prefer larger global index.
        ids = ch["ids"][:, None, None]
        z_masked = jnp.where(zok, z, jnp.inf)
        # argmin returns the FIRST min; flipping the chunk first makes the
        # last (highest-index) tied triangle win, like the ordered path
        zr = z_masked[::-1]
        idr = jnp.broadcast_to(ids, z.shape)[::-1]
        k = jnp.argmin(zr, axis=0)                         # first = largest id
        zmin = jnp.take_along_axis(zr, k[None], 0)[0]
        imin = jnp.take_along_axis(idr, k[None], 0)[0]
        upd = (zmin <= zbest) & jnp.isfinite(zmin)
        zbest = jnp.where(upd, zmin, zbest)
        ibest = jnp.where(upd, imin, ibest)
        return (zbest, ibest), None

    scan_in["ids"] = reshape_chunks(
        jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)[:, 0]
    )
    # add 0*origin so the carry inherits the origin's shard_map
    # "varying over mesh axis" type when the band origin is per-device
    ovary = jnp.int32(x0) * 0 + jnp.int32(y0) * 0
    init = (
        jnp.full((bh, bw), jnp.inf, jnp.float32) + ovary.astype(jnp.float32),
        jnp.full((bh, bw), -1, jnp.int32) + ovary,
    )
    (zb, ib), _ = jax.lax.scan(step, init, scan_in)
    zb = jnp.where(ib >= 0, zb, 1.0)
    return zb, ib


def raster_multilayer(setup, width: int, height: int, chunk: int,
                      layers: int, origin=(0, 0), band=None):
    """Single-pass L-layer visibility: the ``layers`` nearest fragments
    per pixel in one scan over triangle chunks.

    Carries a depth-sorted (z, id) list per pixel; each chunk's fragments
    merge in via ``lax.sort`` keyed on (z, -id) so depth ties resolve to
    the later triangle, exactly like the single-layer path. Returns
    (z (L, bh, bw) — inf beyond the last fragment, ib (L, bh, bw) — -1).

    One pass over all triangles regardless of L (the multi-pass zlow
    formulation is only used by the Pallas backend, where the compiled
    kernel guarantees bit-identical z across passes).
    """
    bw, bh = band if band is not None else (width, height)
    x0, y0 = origin
    tp = setup["ea"].shape[0]
    nchunks = tp // chunk

    px = jnp.arange(bw, dtype=jnp.float32) + (jnp.float32(x0) + 0.5)
    py = jnp.arange(bh, dtype=jnp.float32) + (jnp.float32(y0) + 0.5)
    px = jnp.broadcast_to(px[None, :], (bh, bw))
    py = jnp.broadcast_to(py[:, None], (bh, bw))

    def reshape_chunks(x):
        return x.reshape((nchunks, chunk) + x.shape[1:])

    scan_in = {k: reshape_chunks(v) for k, v in setup.items()
               if k not in ("uv", "nrm")}
    scan_in["ids"] = reshape_chunks(
        jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)[:, 0]
    )

    ovary = jnp.int32(x0) * 0 + jnp.int32(y0) * 0
    init = (
        jnp.full((layers, bh, bw), jnp.inf, jnp.float32)
        + ovary.astype(jnp.float32),
        jnp.full((layers, bh, bw), -1, jnp.int32) + ovary,
    )

    def step(carry, ch):
        zbest, ibest = carry
        cov, e = _coverage(ch, px, py)
        inv_area = 1.0 / ch["area"][:, None, None]
        b = e * inv_area[:, None]
        z = jnp.einsum("kp,kphw->khw", ch["sz"], b,
                       precision=jax.lax.Precision.HIGHEST)
        zok = cov & (z >= 0.0)
        zm = jnp.where(zok, z, jnp.inf)
        ids = jnp.broadcast_to(ch["ids"][:, None, None], zm.shape)

        allz = jnp.concatenate([zbest, zm], axis=0)        # (L+K, bh, bw)
        allid = jnp.concatenate([ibest, ids], axis=0)
        z_s, negid_s, id_s = jax.lax.sort(
            (allz, -allid, allid), dimension=0, num_keys=2
        )
        return (z_s[:layers], id_s[:layers]), None

    (zl, il), _ = jax.lax.scan(step, init, scan_in)
    il = jnp.where(jnp.isfinite(zl), il, -1)
    zl = jnp.where(il >= 0, zl, 1.0)
    return zl, il


def setup_packed_cols(scene: DeviceScene, clip, width: int, height: int,
                      bone_mats=None, lighting: bool = False,
                      opacity_split: bool = False):
    """Per-triangle setup + forward-attribute planes computed as 1-D
    columns and packed straight into the raster kernel's column matrix.

    Equivalent math to ``setup_stage`` + the kernel's
    ``pack_setup``, but every intermediate is a (Tp,) vector: the dict
    form materializes ~10 (Tp, 3) arrays whose minor dim lane-pads
    3 → 128 (42× traffic — measured ~4.5 ms of the 22 ms r2 frame).

    Returns (cols (Tp, 15+E) f32, bbox 5-tuple of (C,) chunk stats,
    n_attr).

    ``opacity_split=True`` instead partitions the triangles by the
    per-triangle opacity (the same predicate the ML kernel's opaque-z
    cull reads from the tex column) and returns
    ((cols_opaque, bbox_opaque), (cols_translucent, bbox_translucent),
    n_attr): identical column math, but each subset's complement has
    its first edge bias set to REJECT (never inside) and its group
    bboxes exclude it (never binned) — the geometry feed for the
    split peel (``_render_frame_peeled_core`` peel_mode="split")."""
    from . import pallas_raster as pr

    tp = scene.tri_valid.shape[0]
    cc = clip.reshape(3, tp, 4)                           # corner-planar
    w = [cc[i, :, 3] for i in range(3)]
    inv_w = [1.0 / jnp.where(jnp.abs(wi) < W_EPS, W_EPS, wi) for wi in w]
    sx = [(cc[i, :, 0] * inv_w[i] + 1.0) * (0.5 * width) for i in range(3)]
    sy = [(1.0 - cc[i, :, 1] * inv_w[i]) * (0.5 * height) for i in range(3)]
    sz = [cc[i, :, 2] * inv_w[i] for i in range(3)]

    area2 = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (
        sx[2] - sx[0]
    )
    valid = (
        scene.tri_vis
        & (w[0] > W_EPS) & (w[1] > W_EPS) & (w[2] > W_EPS)
        & (area2 < 0.0)
    )
    area = -area2
    inv_area = jnp.where(area != 0.0,
                         1.0 / jnp.where(area == 0.0, 1.0, area), 0.0)

    ea, eb, ec, bias = [], [], [], []
    for i in range(3):
        ax, ay = sx[(i + 1) % 3], sy[(i + 1) % 3]
        bx, by = sx[(i + 2) % 3], sy[(i + 2) % 3]
        a = by - ay
        b = -(bx - ax)
        c = ay * (bx - ax) - ax * (by - ay)
        topleft = ((ay == by) & (bx < ax)) | (by > ay)
        snap = 1e-6 * (jnp.abs(a) * width + jnp.abs(b) * height
                       + jnp.abs(c))
        bi = jnp.where(topleft, -snap * 1.000001, snap)
        bias.append(jnp.where(valid, bi, pr.REJECT))
        ea.append(a)
        eb.append(b)
        ec.append(c)

    def plane3(f0, f1, f2):
        """(a, b, c) of the screen plane of Σ_i f_i·bary_i."""
        return [
            (f0 * ea[0] + f1 * ea[1] + f2 * ea[2]) * inv_area,
            (f0 * eb[0] + f1 * eb[1] + f2 * eb[2]) * inv_area,
            (f0 * ec[0] + f1 * ec[1] + f2 * ec[2]) * inv_area,
        ]

    zp = plane3(sz[0], sz[1], sz[2])

    uv = scene.uvs.reshape(3, tp, 2)
    up = plane3(*[uv[i, :, 0] * inv_w[i] for i in range(3)])
    vp_ = plane3(*[uv[i, :, 1] * inv_w[i] for i in range(3)])
    wp = plane3(*inv_w)

    # per-triangle constants come pre-gathered (scene.cols_const); only
    # the animatable material color folds in per frame:
    # C = mat × cbase (cbase is 1 for textured triangles, so textured C
    # is exactly mat; untextured is base*mat — both bit-equal to the
    # old gather form). mat selects via a one-hot MXU matmul — exact via
    # the one-sided 3-way bf16 split (the one-hot side is 0/1-exact in
    # bf16), and ~free next to four (Tp,) table gathers.
    cc = scene.cols_const
    mat = _mat_select(scene.mat_color, scene.tri_material)   # (4, Tp)
    c_cols = [mat[ch] * cc[1 + ch] for ch in range(4)]

    # per-triangle OPACITY, encoded in the tex column's fraction
    # (integer = opaque): source alpha is C_a x texture alpha, where
    # textured C is a 0-1 multiplier and untextured C a 0-255 color.
    # The raster kernel culls fragments strictly behind the nearest
    # opaque one (pallas_raster ocull) — exact under src-alpha
    # compositing. Every downstream consumer reads tex only as >= 0 or
    # via int32 truncation, both of which the half-offset preserves
    # (3.5 -> 3, -1.5 -> -1).
    textured = cc[0] >= 0.0
    opq = ((c_cols[3] >= jnp.where(textured, 1.0, 255.0))
           & (cc[9] > 0.0))
    tex_enc = cc[0] + jnp.where(textured, 0.5, -0.5) * (
        1.0 - opq.astype(jnp.float32))

    tail = (zp + up + vp_ + wp
            + [tex_enc] + c_cols + [cc[5], cc[6], cc[7], cc[8]])
    n_attr = pr.ATTRS_BASE
    if lighting:
        nc = world_normals(scene, bone_mats).reshape(3, tp, 3)
        for ch in range(3):
            tail += plane3(*[nc[i, :, ch] * inv_w[i] for i in range(3)])
        n_attr = pr.ATTRS_LIT

    big = jnp.float32(1e30)
    cg = tp // pr.KG

    def cmin(vals, v):
        m = jnp.minimum(jnp.minimum(vals[0], vals[1]), vals[2])
        return jnp.where(v, m, big).reshape(cg, pr.KG).min(1)

    def cmax(vals, v):
        m = jnp.maximum(jnp.maximum(vals[0], vals[1]), vals[2])
        return jnp.where(v, m, -big).reshape(cg, pr.KG).max(1)

    def finish(bias0, v):
        packed_cols = jnp.stack(
            ea + eb + ec + [bias0] + bias[1:] + tail, axis=1
        )                                                 # (Tp, 15+E)
        bb = (cmin(sx, v), cmax(sx, v), cmin(sy, v), cmax(sy, v),
              cmin(sz, v))
        return packed_cols, bb

    if opacity_split:
        rej = jnp.float32(pr.REJECT)
        return (finish(jnp.where(opq, bias[0], rej), valid & opq),
                finish(jnp.where(opq, rej, bias[0]), valid & ~opq),
                n_attr)
    packed_cols, bbox = finish(bias[0], valid)
    return packed_cols, bbox, n_attr


def _mat_select(mat_color, tri_material):
    """Per-triangle material color via one-hot MXU select → (4, Tp) f32.

    Bit-exact: the one-hot operand is exactly representable in bf16, so
    a 3-way bf16 split of the value side alone recovers the full f32
    mantissa in 3 DEFAULT-precision passes (single nonzero addend per
    output). Falls back to row gathers when the (M, Tp) one-hot operand
    would outweigh the four (Tp,) gathers it replaces (the one-hot trick
    pays only for small M, like the skinning palette)."""
    m = mat_color.shape[0]
    tp = tri_material.shape[0]
    if m > 128 or m * tp * 2 > 64 * 1024 * 1024:
        return jnp.stack(
            [mat_color[:, ch][tri_material] for ch in range(4)], axis=0
        )
    onehot = (
        jnp.arange(m, dtype=jnp.int32)[:, None] == tri_material[None, :]
    ).astype(jnp.bfloat16)                                 # (M, Tp)
    vals = mat_color.T                                     # (4, M)
    b1 = vals.astype(jnp.bfloat16)
    r1 = vals - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.float32(0.0)
    for part in (b1, b2, b3):
        out += jax.lax.dot_general(
            part, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out                                             # (4, Tp)


def shade_fwd(scene: DeviceScene, attrs, ib, mipmap: bool = False,
              lighting: bool = False):
    """Shade from the forward kernel's per-pixel attributes — no gathers
    from per-triangle tables, only the texel-pool sample. Everything
    stays CHANNEL-PLANE major ((4, H, W)): channels-minor (H, W, 4)
    arrays lane-pad 4 → 128 on TPU, turning every blend pass into 32x
    the memory traffic (measured r2).

    Returns (src (4, bh, bw) f32 0-255, covered (bh, bw) bool)."""
    covered = ib >= 0
    w_ = attrs[2]
    inv = 1.0 / jnp.where(jnp.abs(w_) < W_EPS, W_EPS, w_)
    u = attrs[0] * inv
    v = attrs[1] * inv
    layer = attrs[3].astype(jnp.int32)
    c_rgba = attrs[4:8]                                    # (4, H, W)
    textured = layer >= 0
    lsafe = jnp.maximum(layer, 0)
    if mipmap:
        # trilinear with ARITHMETIC mip addressing: mip chains are
        # contiguous in the pool (upload appends each level in order),
        # so level offsets/extents derive from the winner's constant
        # columns (off0, th, tw) by shift chains — zero per-pixel
        # mip-table or tex-size gathers, bit-identical to the table.
        # LOD is analytic from the winner's plane-gradient tail rows
        # (raw; the single divide-by-Q multiply here reproduces the
        # mip-tap epilogue's in-kernel one exactly).
        off0 = (attrs[8].astype(jnp.int32) * 4096
                + attrs[9].astype(jnp.int32))
        th = attrs[10].astype(jnp.int32)
        tw = attrs[11].astype(jnp.int32)
        g0 = attrs.shape[0] - 6
        grads = [attrs[g0 + i] * inv for i in range(6)]
        lod = _analytic_lod(u, v, *grads, attrs[10], attrs[11])
        albedo = _trilinear_arith(scene.mip_pool, off0, th, tw, lod, u, v,
                                  scene.num_mips, planes=True,
                                  mode=scene.pool_mode,
                                  aux=scene.aux_pool,
                                  bc7_modes=scene.bc7_modes)
    else:
        # mip-0 pool location straight from the winner's constant
        # columns — no per-pixel mip-table gathers (off/h/w lookups were
        # ~half the shade cost, r2)
        off = (attrs[8].astype(jnp.int32) * 4096
               + attrs[9].astype(jnp.int32))
        hh = attrs[10].astype(jnp.int32)
        ww = attrs[11].astype(jnp.int32)
        albedo = _quad_bilinear(scene.mip_pool, off, hh, ww, u, v,
                                planes=True)
    src = jnp.where(textured[None], albedo * c_rgba, c_rgba)
    if lighting:
        n = attrs[12:15] * inv[None]                       # (3, H, W)
        n = n / jnp.maximum(
            jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True)), 1e-6
        )
        light = np.asarray(LIGHT_DIR, np.float32)
        light = light / np.linalg.norm(light)
        ndl = jnp.maximum(
            light[0] * n[0] + light[1] * n[1] + light[2] * n[2], 0.0
        )
        shade = (0.3 + 0.7 * ndl)[None]
        src = jnp.concatenate([src[:3] * shade, src[3:]], axis=0)
    return src, covered


def _tri_fetch(pool, idx):
    """Logical 64 B tri row ``idx`` from the 2-texel-packed
    (ceil(R/2), 128) tri pool: ONE row-priced gather (pinned, like
    every pool gather) + a parity select. 128 B is the u8 tile row
    stride on TPU, so the packing carries zero padding waste where
    64 B physical rows padded 2x (see _build_tri_pool)."""
    row = jax.lax.optimization_barrier(pool[idx >> 1])
    hi = (idx & 1)[..., None] == 1
    return jnp.where(hi, row[..., 64:], row[..., :64])


def _tap_albedo_channels(pool, idx, fx, fy):
    """ONE pinned pool gather + the 2x2 bilinear contraction → list of
    4 albedo channel arrays shaped like ``idx`` (any rank).

    The optimization_barrier pins the gather as ONE materialized op:
    without it XLA input-fuses the gather into the contraction and
    re-issues it per consumer — the frame's most expensive op silently
    duplicated (measured 1.9 ms/frame at 1080p, 12-rep scan A/B, r2)."""
    if pool.shape[-1] not in (16, 128):
        raise ValueError(
            "the in-kernel tap epilogue requires the quad (16 B/texel) "
            "or tri (64 B) pool; narrow pools render via the scan "
            "backend or the mipmap path (upload(..., pool_mode='quad') "
            "for this one)")
    if pool.shape[-1] == 128:
        # bilinear reads the quad lanes of a tri row
        quad = _tri_fetch(pool, jnp.maximum(idx, 0))[..., :16]
    else:
        quad = jax.lax.optimization_barrier(pool[jnp.maximum(idx, 0)])
    quad = quad.reshape(quad.shape[:-1] + (4, 4)).astype(jnp.float32)
    wq = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                    (1 - fx) * fy, fx * fy], axis=-1)
    alb = jnp.einsum("...q,...qc->c...", wq, quad)
    return [alb[c] for c in range(4)]


def _blend_channels(src_channels, covered, clear_color):
    """Src-alpha blend over the clear color, channel lists of any
    (matching) shape → float channel list. The ONE definition of the
    composite math shared by every path (raster-order, tile-major,
    geometry-split)."""
    clear = np.asarray(clear_color, np.float32)
    a = src_channels[3] / 255.0
    out = [jnp.where(covered, src_channels[c] * a + clear[c] * (1.0 - a),
                     clear[c]) for c in range(3)]
    out.append(jnp.where(covered, src_channels[3], clear[3]))
    return out


def pack_u32_channels(channels):
    """Quantize float 0-255 channel list → (…, ) uint32 RGBA packed."""
    q = [jnp.clip(o + 0.5, 0.0, 255.0).astype(jnp.uint32)
         for o in channels]
    return q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)


def _blend_pack_u32(src_channels, covered, clear_color):
    """Blend + RGBA→u32 pack (see _blend_channels)."""
    return pack_u32_channels(
        _blend_channels(src_channels, covered, clear_color))


def shade_tap(scene: DeviceScene, tattrs, tapidx, ib):
    """Shade from the kernel's tap-epilogue outputs (raster_pallas_fwd
    with ``tap=True``): the address arithmetic already ran in-kernel on
    VMEM vectors, so this is exactly ONE pool gather + the 2x2
    contraction + the color modulate.

    Returns (src (4, bh, bw) f32 0-255, covered (bh, bw) bool)."""
    covered = ib >= 0
    alb = _tap_albedo_channels(scene.mip_pool, tapidx, tattrs[0],
                               tattrs[1])
    textured = tapidx >= 0
    c_rgba = tattrs[2:6]                                   # (4, H, W)
    src = jnp.stack(
        [jnp.where(textured, alb[c] * c_rgba[c], c_rgba[c])
         for c in range(4)], axis=0,
    )
    return src, covered


def _compact_live_rows(live_flat, cap: int):
    """Static-cap compaction bookkeeping for row-sparse work: (N,) bool
    liveness → (src (cap,) i32 source rows for the compact buffer,
    slot (N,) i32 compact slot per row — ``cap`` = dead/overflowed pad,
    n_over). Shared by the peel composite and the single-layer tap."""
    n = live_flat.shape[0]
    rank = jnp.cumsum(live_flat.astype(jnp.int32)) - 1
    n_live = rank[n - 1] + 1
    slot = jnp.where(live_flat & (rank < cap), rank, cap)
    src = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return src[:cap], slot, jnp.maximum(n_live - cap, 0)


def shade_finish_tap_flat(scene: DeviceScene, tattrs, tapidx, ib,
                          clear_color, tap_tiles: int | None = None):
    """TILE-MAJOR shade + composite: consumes ``raster_pallas_fwd``
    ``flat=True`` outputs (tattrs (n_tiles, 6, P), tapidx/ib
    (n_tiles, 1, P)) and emits the packed-u32 frame still in tile order
    — shading and blending are elementwise, so the only raster-order
    relayout in the whole frame is the caller's final
    ``unflatten_tiles`` of this one u32 plane (the raster-order
    pipeline paid ~8 of them). Per-pixel math is the same helpers the
    raster-order path uses (_tap_albedo_channels + _blend_pack_u32).

    Returns (packed (n_tiles, P) uint32, covered (n_tiles, P) bool,
    n_over_tap — see shade_tap_flat_channels)."""
    src, covered, n_over_tap = shade_tap_flat_channels(
        scene, tattrs, tapidx, ib, tap_tiles=tap_tiles)
    return _blend_pack_u32(src, covered, clear_color), covered, n_over_tap


def _expand_rows(albc, slot, n: int):
    """Scatter compacted per-row channel results back to dense rows:
    ``albc`` = 4 channel arrays (cap, SEG_PX), ``slot`` (n,) compact
    slot per dense row (cap = dead/pad). ONE row gather serves all four
    channels (lane-concatenated — gathers are row-count priced, so four
    separate expands would cost 4x). Returns 4 arrays (n, SEG_PX)."""
    cap = albc[0].shape[0]
    allc = jnp.concatenate(albc, axis=1)                  # (cap, 4*SEG)
    allc = jnp.concatenate(
        [allc, jnp.zeros((1, 4 * SEG_PX), jnp.float32)])[slot]
    return [allc[:, c * SEG_PX:(c + 1) * SEG_PX] for c in range(4)]


def shade_tap_flat_channels(scene: DeviceScene, tattrs, tapidx, ib,
                            tap_tiles: int | None = None):
    """Tile-major tap shade → (src channel list [r, g, b, a] each
    (n_tiles, P) f32 0-255, covered (n_tiles, P) bool, n_over_tap).
    The layered building block behind shade_finish_tap_flat and the
    flat peel compositor.

    ``tap_tiles`` compacts the pool gather + contraction to that many
    live (textured∧covered) SEG_PX-px rows (whole tile rows in
    production — the unit every compacted tap path shares; None/0 =
    dense). Size it host-side with ``auto_tap_tiles`` — a live row's
    segment overlaps some textured chunk's bbox, so the predictor's
    row count is a true upper bound (margin covers animation drift;
    overflow reports loudly)."""
    ti = tapidx[:, 0, :]
    covered = ib[:, 0, :] >= 0
    textured = ti >= 0
    nt, p = ti.shape
    n = nt * (p // SEG_PX)
    cap = 0 if tap_tiles is None else min(tap_tiles, n)
    if cap and cap < n:
        # textured∧covered: a covered-but-untextured row's albedo is
        # never consumed (src falls back to the flat/debug color), so
        # it need not occupy a tap slot
        live = jnp.any((covered & textured).reshape(n, SEG_PX),
                       axis=1)                            # (n,)
        src_rows, slot, n_over_tap = _compact_live_rows(live, cap)
        tic = ti.reshape(n, SEG_PX)[src_rows]
        fxc = tattrs[:, 0, :].reshape(n, SEG_PX)[src_rows]
        fyc = tattrs[:, 1, :].reshape(n, SEG_PX)[src_rows]
        albc = _tap_albedo_channels(scene.mip_pool, tic, fxc, fyc)
        alb = [a.reshape(nt, p) for a in _expand_rows(albc, slot, n)]
    else:
        alb = _tap_albedo_channels(scene.mip_pool, ti, tattrs[:, 0, :],
                                   tattrs[:, 1, :])
        n_over_tap = jnp.int32(0)
    src = [jnp.where(textured, alb[c] * tattrs[:, 2 + c, :],
                     tattrs[:, 2 + c, :]) for c in range(4)]
    return src, covered, n_over_tap


def composite_peeled_tap_flat(scene: DeviceScene, tattrs, tapidx, il,
                              layers: int, clear_color,
                              tap_tiles: int | None = None,
                              covered=None, dst0=None):
    """Tile-major multi-layer composite over the single-pass ML kernel's
    tap outputs (``raster_pallas_fwd_ml`` with ``tap=True, flat=True``):
    tattrs (n_tiles, L*6, P), tapidx/il (n_tiles, L, P), layers nearest
    first. ONE pool gather serves every layer's bilinear tap (the
    gather is row-count bound, so batching L layers into one op saves
    the per-op overhead), then the layers blend back-to-front over the
    clear color with the reference blend state (model.rs:242-247).

    The gather + contraction run COMPACTED: only (tile, layer) pairs
    with any covered pixel tap the pool. The kernel's opaque-z cull
    empties deeper layers of opaque content, so the live count hovers
    near the single-layer tile count instead of nt x L — the r2 peel
    cost was exactly these dense per-layer taps (~20 ms of the 40 at
    1080p/4 layers). ``tap_tiles`` caps the compacted row count
    (static, like the binning ``maxc``; size it with
    ``measure_live_tap_tiles``): live rows beyond it lose their
    texture (albedo 0) and the overflow count is returned for the
    caller to report loudly (render_frame_peeled queues it like bin
    overflow). None/0 = dense — exact for any content, the default.
    The compaction unit is the SEG_PX-px row (a whole (tile, layer)
    pair in production — see the SEG_PX constant for why finer
    sublane-granularity rows measured slower).

    ``covered`` overrides the per-(tile, layer, pixel) liveness mask
    (default ``il >= 0``) — the split peel culls translucent fragments
    behind the opaque winner here, which is exactly equivalent to
    culling them in the kernel (in-front fragments are nearer, so the
    L-deep list keeps them first either way). ``dst0`` overrides the
    blend destination (channel list, default = clear color) — the
    split peel starts from the shaded opaque frame.

    Returns (channel list [r, g, b, a] each (n_tiles, P) f32 0-255,
    still tile-major — callers pack/quantize + unflatten,
    n_over_tap)."""
    nt, _, p = tapidx.shape
    a4 = tattrs.reshape(nt, layers, 6, p)
    textured = tapidx >= 0
    if covered is None:
        covered = il >= 0
    n = nt * layers * (p // SEG_PX)
    cap = 0 if tap_tiles is None else min(tap_tiles, n)
    if cap and cap < n:
        # textured∧covered: untextured fragments never read their
        # albedo (the blend falls back to the flat/debug color)
        live = jnp.any((covered & textured).reshape(n, SEG_PX),
                       axis=1)                            # (n,)
        sr, slot, n_over_tap = _compact_live_rows(live, cap)
        tic = tapidx.reshape(n, SEG_PX)[sr]               # (cap, SEG)
        fxc = a4[:, :, 0].reshape(n, SEG_PX)[sr]
        fyc = a4[:, :, 1].reshape(n, SEG_PX)[sr]
        albc = _tap_albedo_channels(scene.mip_pool, tic, fxc, fyc)
        # expand back: per-(tile, layer, sublane) row gather from the
        # compact buffer; the pad row (slot == cap) is zero albedo
        alb = [a.reshape(nt, layers, p)
               for a in _expand_rows(albc, slot, n)]      # 4 x (nt, L, P)
    else:
        alb = _tap_albedo_channels(scene.mip_pool, tapidx,
                                   a4[:, :, 0], a4[:, :, 1])
        n_over_tap = jnp.int32(0)
    if dst0 is None:
        clear = np.asarray(clear_color, np.float32)
        dst = [jnp.full((nt, p), clear[c], jnp.float32)
               for c in range(4)]
    else:
        dst = list(dst0)
    for l in reversed(range(layers)):
        src = [jnp.where(textured[:, l], alb[c][:, l] * a4[:, l, 2 + c],
                         a4[:, l, 2 + c]) for c in range(4)]
        a = src[3] / 255.0
        cov = covered[:, l]
        dst = (
            [jnp.where(cov, src[c] * a + dst[c] * (1.0 - a), dst[c])
             for c in range(3)]
            + [jnp.where(cov, src[3], dst[3])]
        )
    return dst, n_over_tap


def _seg_rows(m):
    """(N, planes, P) → (N·P/SEG_PX, planes, SEG_PX): split each plane
    row into SEG_PX-px segments, segment-major within a row (identity
    reshape at the production SEG_PX = whole-tile unit). BOTH the dense
    and the compacted mip shades build their arithmetic input through
    this one helper (compacted adds a plain row gather on the result)
    so XLA sees the same SEG_PX-minor elementwise program either way —
    a two-axis ``mseg[sr // sg, :, sr % sg]`` gather on the compacted
    side fused ±1 ulp apart from the dense program (the CLAUDE.md
    layout-fusion gotcha), breaking bit-exactness."""
    N, npl, p = m.shape
    sg = p // SEG_PX
    return jnp.moveaxis(
        m.reshape(N, npl, sg, SEG_PX), 2, 1).reshape(
            N * sg, npl, SEG_PX)


def _mip_albedo_channels(scene: DeviceScene, m):
    """Trilinear albedo from mip-tap planes ``m`` (N, 17, P) → list of
    4 channel arrays (N, P). Fully elementwise per pixel (analytic
    LOD + arithmetic mip addressing): exactly the math shade_mip_tap
    runs plane-major, reusable on COMPACTED row subsets.

    Inputs with P > SEG_PX are canonicalised to SEG_PX-minor rows
    first so every caller — dense (P = tile pixels) and compacted
    (P = SEG_PX) — runs the SAME SEG_PX-minor elementwise program:
    XLA fuses differently-laid-out trilinear math ±1 ulp apart (the
    CLAUDE.md layout-fusion gotcha), which broke the compacted ==
    dense bit-exactness contract before this canonicalisation."""
    N, npl, p = m.shape
    if p != SEG_PX:
        return [a.reshape(N, p)
                for a in _mip_albedo_channels(scene, _seg_rows(m))]
    # Seal the trilinear cluster: without the barriers XLA cancels the
    # dense caller's _seg_rows layout ops against the output reshape and
    # fuses this math with the surrounding frame program in the ORIGINAL
    # layout — ±1 ulp from the compacted program (reproduced: the
    # isolated jit matches bit-exactly, the full render_frame doesn't).
    m = jax.lax.optimization_barrier(m)
    u = m[:, 0]
    v = m[:, 1]
    off0 = (m[:, 3].astype(jnp.int32) * 4096
            + m[:, 4].astype(jnp.int32))
    th = m[:, 5].astype(jnp.int32)
    tw = m[:, 6].astype(jnp.int32)
    lod = _analytic_lod(u, v, *[m[:, 11 + i] for i in range(6)],
                        m[:, 5], m[:, 6])
    albedo = _trilinear_arith(scene.mip_pool, off0, th, tw, lod, u, v,
                              scene.num_mips, planes=True,
                              mode=scene.pool_mode, aux=scene.aux_pool,
                              bc7_modes=scene.bc7_modes)
    return list(jax.lax.optimization_barrier(
        tuple(albedo[c] for c in range(4))))


def shade_mip_tap_flat_channels(scene: DeviceScene, mattrs, ib,
                                tap_tiles: int | None = None):
    """Tile-major trilinear shade (mip-tap ``flat=True`` outputs:
    mattrs (n_tiles, 17, P), ib (n_tiles, 1, P)) → (src channel list
    [r, g, b, a] each (n_tiles, P) f32 0-255, covered (n_tiles, P)
    bool, n_over_tap). ``tap_tiles`` compacts the trilinear work (two
    quad gathers per pixel — the mipmap frame's dominant cost) to that
    many live SEG_PX-px rows, exactly like shade_tap_flat_channels;
    possible at all because the analytic LOD made the shade
    elementwise."""
    covered = ib[:, 0, :] >= 0
    textured = mattrs[:, 2, :] >= 0.0
    nt, nplanes, p = mattrs.shape
    sg = p // SEG_PX
    n = nt * sg
    # ONE program for every cap (None = n): gather live seg-rows →
    # trilinear → expand. A separate dense branch fused ±1 ulp apart
    # from the compacted one (optimization_barrier is layout-transparent,
    # so XLA folded the dense side's relayout through it), breaking the
    # compacted == dense bit-exactness contract; with a single structure
    # the cap is just a shape constant. Liveness is textured∧covered —
    # untextured fragments never read their trilinear result.
    cap = min(tap_tiles, n) if tap_tiles else n
    live = jnp.any((covered & textured).reshape(n, SEG_PX), axis=1)
    sr, slot, n_over_tap = _compact_live_rows(live, cap)
    albc = _mip_albedo_channels(scene, _seg_rows(mattrs)[sr])
    alb = [a.reshape(nt, p) for a in _expand_rows(albc, slot, n)]
    src = [jnp.where(textured, alb[c] * mattrs[:, 7 + c, :],
                     mattrs[:, 7 + c, :]) for c in range(4)]
    return src, covered, n_over_tap


def composite_peeled_mip_flat(scene: DeviceScene, mattrs, il,
                              layers: int, clear_color,
                              tap_tiles: int | None = None,
                              covered=None, dst0=None):
    """Tile-major multi-layer TRILINEAR composite (the mip twin of
    composite_peeled_tap_flat): mattrs (n_tiles, L*17, P), il
    (n_tiles, L, P) nearest-first. The trilinear gathers + LOD run
    COMPACTED over live (tile, layer) rows; blending is dense
    elementwise. ``covered``/``dst0`` as in the tap version (the split
    peel's behind-opaque cull and opaque base).

    Returns (channel list [r, g, b, a] each (n_tiles, P) f32 0-255,
    n_over_tap)."""
    nt, _, p = mattrs.shape
    a4 = mattrs.reshape(nt, layers, 17, p)
    if covered is None:
        covered = il >= 0
    textured = a4[:, :, 2] >= 0.0
    sg = p // SEG_PX
    n = nt * layers * sg
    # one gather → trilinear → expand program for every cap, liveness
    # textured∧covered — see shade_mip_tap_flat_channels
    cap = min(tap_tiles, n) if tap_tiles else n
    live = jnp.any((covered & textured).reshape(n, SEG_PX), axis=1)
    sr, slot, n_over_tap = _compact_live_rows(live, cap)
    albc = _mip_albedo_channels(
        scene, _seg_rows(a4.reshape(nt * layers, 17, p))[sr])
    alb = [a.reshape(nt, layers, p)
           for a in _expand_rows(albc, slot, n)]          # 4 x (nt, L, P)
    if dst0 is None:
        clear = np.asarray(clear_color, np.float32)
        dst = [jnp.full((nt, p), clear[c], jnp.float32)
               for c in range(4)]
    else:
        dst = list(dst0)
    for l in reversed(range(layers)):
        src = [jnp.where(textured[:, l], alb[c][:, l] * a4[:, l, 7 + c],
                         a4[:, l, 7 + c]) for c in range(4)]
        a = src[3] / 255.0
        cov = covered[:, l]
        dst = (
            [jnp.where(cov, src[c] * a + dst[c] * (1.0 - a), dst[c])
             for c in range(3)]
            + [jnp.where(cov, src[3], dst[3])]
        )
    return dst, n_over_tap


def blend_over_planes(src, covered, dst):
    """Channel-plane variant of ``blend_over``: src/dst are (4, H, W)."""
    a = src[3:4] / 255.0
    out_rgb = src[:3] * a + dst[:3] * (1.0 - a)
    out = jnp.concatenate([out_rgb, src[3:4]], axis=0)
    return jnp.where(covered[None], out, dst)


def finish_planes(src, covered, clear_color, bh, bw):
    """Blend over the clear color and emit (bh, bw, 4) uint8 — the one
    channels-minor materialization, on bytes."""
    clear = jnp.asarray(np.asarray(clear_color, np.float32))[:, None, None]
    dst = jnp.broadcast_to(clear, (4, bh, bw))
    out = blend_over_planes(src, covered, dst)
    out = jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return jnp.moveaxis(out, 0, -1)


def finish_packed(src, covered, clear_color, bh, bw):
    """Blend over the clear color and emit (bh, bw) uint32 with RGBA
    packed little-endian (R = low byte). The channel interleave is pure
    shift/or on (H, W) planes — the (4, H, W) → (H, W, 4) u8 relayout
    it replaces cost 1.6 ms/frame at 1080p (and a device-side bitcast
    costs the same, so the u32 rides to the host boundary; see
    ``unpack_rgba``)."""
    return _blend_pack_u32([src[c] for c in range(4)], covered,
                           clear_color)


def unpack_rgba(packed) -> np.ndarray:
    """Host-side view of a packed-u32 frame as (H, W, 4) uint8 RGBA.
    One transfer, zero-copy reinterpretation (little-endian host)."""
    a = np.ascontiguousarray(np.asarray(packed))
    return a.view(np.uint8).reshape(a.shape[0], a.shape[1], 4)


def sample_bilinear(scene: DeviceScene, layer, u, v, planes: bool = False):
    """Bilinear clamp-to-edge sample at full resolution (mip 0) from the
    flat texel pool. layer/u/v are (H, W); returns (H, W, 4) f32 0-255,
    or channel-plane (4, H, W) when ``planes``."""
    lc = jnp.clip(layer, 0, scene.mip_table.shape[0] - 1)
    if scene.pool_mode in ("bc1", "bc7"):
        m = scene.mip_table.shape[1]
        tflat = scene.mip_table.reshape(-1, 3)
        tidx = lc * m
        if scene.pool_mode == "bc7":
            return _bc7_bilinear(scene.mip_pool, scene.aux_pool,
                                 scene.bc7_modes, tflat[:, 0][tidx],
                                 tflat[:, 1][tidx], tflat[:, 2][tidx],
                                 u, v, planes=planes)
        return _bc1_bilinear(scene.mip_pool, tflat[:, 0][tidx],
                             tflat[:, 1][tidx], tflat[:, 2][tidx],
                             u, v, planes=planes)
    return _sample_mip_bilinear(
        scene.mip_pool, scene.mip_table, lc, jnp.zeros_like(lc), u, v,
        planes=planes,
    )


def _sample_mip_bilinear(pool, table, layer, mip, u, v,
                         planes: bool = False):
    """Bilinear sample one mip level from the flat quad-texel pool.

    pool (P, 16) u8 — each row is a texel's 2x2 clamp-baked footprint,
    so the whole tap is ONE gather (gathers dominate TPU sampling cost);
    table (L, M, 3); layer/mip/u/v are (H, W). The table columns gather
    separately — a fused (H, W, 3) gather lane-pads 3 → 128."""
    m = table.shape[1]
    tflat = table.reshape(-1, 3)
    tidx = layer * m + mip                                 # (H, W)
    off = tflat[:, 0][tidx]
    hh = tflat[:, 1][tidx]
    ww = tflat[:, 2][tidx]
    return _quad_bilinear(pool, off, hh, ww, u, v, planes=planes)


def _quad_bilinear(pool, off, hh, ww, u, v, planes: bool = False):
    """Bilinear tap given the pool offset and texture extent per pixel
    (each (H, W)): ONE gather from the quad-footprint pool + the 2x2
    contraction (narrow (P, 4) pools: FOUR gathers, same contraction —
    bit-identical values, ~4x the gather cost)."""
    th = hh.astype(jnp.float32)
    tw = ww.astype(jnp.float32)
    x = u * tw - 0.5
    y = v * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # clamp-to-edge on the negative side: the quad row already bakes the
    # positive side, but a clamped-up x0 must not blend toward texel 1
    fx = jnp.where(x0 < 0, 0.0, x - x0)
    fy = jnp.where(y0 < 0, 0.0, y - y0)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, jnp.maximum(ww - 1, 0))
    y0c = jnp.clip(y0.astype(jnp.int32), 0, jnp.maximum(hh - 1, 0))
    stride = ww
    if pool.shape[-1] == 4:
        # narrow pool: clamp-to-edge neighbors addressed at sample time
        # (the quad row bakes them at upload time)
        x1c = jnp.minimum(x0c + 1, jnp.maximum(ww - 1, 0))
        y1c = jnp.minimum(y0c + 1, jnp.maximum(hh - 1, 0))
        taps = [
            jax.lax.optimization_barrier(pool[off + yy * stride + xx])
            for yy, xx in ((y0c, x0c), (y0c, x1c), (y1c, x0c), (y1c, x1c))
        ]
        quad = jnp.stack(taps, axis=-2).astype(jnp.float32)
    elif pool.shape[-1] == 128:
        # bilinear reads a tri row's quad lanes (one pinned gather)
        quad = _tri_fetch(pool, off + y0c * stride + x0c)[..., :16]
        quad = quad.reshape(quad.shape[:-1] + (4, 4)).astype(jnp.float32)
    else:
        # barrier: pin the gather as ONE materialized op (XLA otherwise
        # re-issues it inside the fused contraction — 1.9 ms/frame, r2)
        quad = jax.lax.optimization_barrier(
            pool[off + y0c * stride + x0c])
        quad = quad.reshape(quad.shape[:-1] + (4, 4)).astype(jnp.float32)
    return _contract_quad(quad, fx, fy, planes)


def _contract_quad(quad, fx, fy, planes: bool):
    """The 2x2 bilinear contraction — ONE expression shared by every
    sampler (quad-pool gather, narrow 4-gather, tri-row fused) so the
    reduction tree is identical everywhere. The single contraction over
    the footprint is deliberate: the sliced two-step lerp materializes
    lane-padded (…, 16) f32 temporaries and runs 2x slower (r2)."""
    wq = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                    (1 - fx) * fy, fx * fy], axis=-1)
    if planes:
        return jnp.einsum("hwq,hwqc->chw", wq, quad)
    return jnp.einsum("...q,...qc->...c", wq, quad)


def sample_trilinear(scene: DeviceScene, layer, u, v, lod,
                     planes: bool = False):
    """Trilinear (bilinear × 2 mips + lerp) from the mip pool.

    On a tri-row pool (64 B rows) this routes through the fused
    one-gather sampler (_trilinear_arith, bit-identical arithmetic
    addressing) so EVERY engine shares one trilinear expression per
    scene — comparing a fused and a two-gather program of the same
    scene is the layout-fusion ±1 ulp trap (CLAUDE.md). On a bc1 pool
    the same fused sampler decodes the blocks in-register."""
    lc = jnp.clip(layer, 0, scene.mip_table.shape[0] - 1)
    if (scene.pool_mode in ("bc1", "bc7")
            or scene.mip_pool.shape[-1] == 128):
        m = scene.mip_table.shape[1]
        tflat = scene.mip_table.reshape(-1, 3)
        t0 = lc * m
        return _trilinear_arith(
            scene.mip_pool, tflat[:, 0][t0], tflat[:, 1][t0],
            tflat[:, 2][t0], lod, u, v, scene.num_mips, planes=planes,
            mode=scene.pool_mode, aux=scene.aux_pool,
            bc7_modes=scene.bc7_modes)
    lod = jnp.clip(lod, 0.0, float(scene.num_mips - 1))
    m0 = jnp.floor(lod).astype(jnp.int32)
    m1 = jnp.minimum(m0 + 1, scene.num_mips - 1)
    fm = lod - m0.astype(jnp.float32)
    fm = fm[None] if planes else fm[..., None]
    s0 = _sample_mip_bilinear(scene.mip_pool, scene.mip_table, lc, m0, u, v,
                              planes=planes)
    s1 = _sample_mip_bilinear(scene.mip_pool, scene.mip_table, lc, m1, u, v,
                              planes=planes)
    return s0 * (1 - fm) + s1 * fm


def _analytic_lod(u, v, gux, guy, gvx, gvy, gqx, gqy, th, tw):
    """Per-pixel texture LOD from the winner triangle's OWN screen
    planes — u = U(x,y)/Q(x,y) with U, Q affine, so
    du/dx = (U_x − u·Q_x)/Q exactly. The g* args are the winner's
    plane gradients already divided by Q (the raster epilogues emit
    them), th/tw the texture extents (f32, any matching shape).

    Replaces screen-space forward differences (r1–r3 used the GPU
    quad-derivative analog): no cross-triangle or tile/band-seam
    derivative cross-talk, and the mip shade becomes fully ELEMENTWISE
    — it can run tile-major and compacted. ONE definition shared by
    every mipmap path (mip-tap, forward multipass, scan) so the pinned
    path-equality tests compare the identical XLA expression."""
    dudx = gux - u * gqx
    dudy = guy - u * gqy
    dvdx = gvx - v * gqx
    dvdy = gvy - v * gqy
    rho = jnp.maximum(
        jnp.maximum(jnp.abs(dudx), jnp.abs(dudy)) * tw,
        jnp.maximum(jnp.abs(dvdx), jnp.abs(dvdy)) * th)
    return jnp.log2(jnp.maximum(rho, 1e-6))


def _mip_arith(off0, th, tw, m, num_mips: int):
    """Level-m pool offset/extents from the mip-0 constants — the pool
    stores each texture's chain contiguously and level i spans
    max(th>>i,1)·max(tw>>i,1) rows (exactly how upload() builds it), so
    this matches the mip_table bit-for-bit with zero gathers. All args
    (H, W) i32; m must be <= the texture's last real level."""
    hm = jnp.maximum(th >> m, 1)
    wm = jnp.maximum(tw >> m, 1)
    off = off0
    for i in range(num_mips - 1):
        sz = jnp.maximum(th >> i, 1) * jnp.maximum(tw >> i, 1)
        off = off + jnp.where(m > i, sz, 0)
    return off, hm, wm


def _trilinear_arith(pool, off0, th, tw, lod, u, v, num_mips: int,
                     planes: bool = False, mode: str = "texel",
                     aux=None, bc7_modes: tuple = ()):
    """Trilinear sample with arithmetic mip addressing (see _mip_arith).
    Reproduces sample_trilinear exactly: lod clips to [0, num_mips-1],
    levels clamp to the texture's last real level (the table repeats it,
    so blending past the end degenerates to that level). ``mode`` is
    the scene's pool_mode: "bc1"/"bc7" route the block-row pool through
    the in-register decode samplers (off0/the offset walk are then in
    BLOCK rows; bc7 reads ``aux``/``bc7_modes`` — the hint pool and the
    static modes-present tuple); anything else dispatches texel pools
    by row width."""
    big = jnp.maximum(th, tw)
    mmax = jnp.zeros_like(th)
    for m in range(1, num_mips):
        mmax = jnp.where((big >> m) > 0, m, mmax)
    lod = jnp.clip(lod, 0.0, float(num_mips - 1))
    m0f = jnp.floor(lod)
    fm = lod - m0f
    fm = fm[None] if planes else fm[..., None]
    m0 = jnp.minimum(m0f.astype(jnp.int32), mmax)
    m1 = jnp.minimum(m0 + 1, mmax)
    if mode in ("bc1", "bc7"):
        off_a, hm0, wm0 = _mip_arith_bc1(off0, th, tw, m0, num_mips)
        hm1 = jnp.maximum(th >> m1, 1)
        wm1 = jnp.maximum(tw >> m1, 1)
        if mode == "bc7":
            return _bc7_trilinear_fused(pool, aux, bc7_modes, off_a,
                                        hm0, wm0, hm1, wm1, m0, m1, fm,
                                        u, v, planes)
        return _bc1_trilinear_fused(pool, off_a, hm0, wm0, hm1, wm1,
                                    m0, m1, fm, u, v, planes)
    # ONE offset walk: levels are contiguous in the pool, so
    # off(m0+1) = off(m0) + rows(m0) — saves the second num_mips-long
    # where chain per pixel (bit-identical to walking m1)
    off_a, hm0, wm0 = _mip_arith(off0, th, tw, m0, num_mips)
    hm1 = jnp.maximum(th >> m1, 1)
    wm1 = jnp.maximum(tw >> m1, 1)
    if pool.shape[-1] == 128:
        # tri-row pool: BOTH mip levels from ONE gather (the row bakes
        # the 2x2 quad at m0 plus the 3x3 parent block at m0+1 —
        # gathers are row-count priced to 128 B rows, so this is
        # ~2.1-2.8x cheaper than two quad gathers, gather_width.py)
        return _trilinear_fused(pool, off_a, hm0, wm0, hm1, wm1,
                                m0, m1, fm, u, v, planes)
    off_b = off_a + jnp.where(m1 > m0, hm0 * wm0, 0)
    s0 = _quad_bilinear(pool, off_a, hm0, wm0, u, v, planes=planes)
    s1 = _quad_bilinear(pool, off_b, hm1, wm1, u, v, planes=planes)
    return s0 * (1 - fm) + s1 * fm


def _trilinear_fused(pool, off0, hm0, wm0, hm1, wm1, m0, m1, fm, u, v,
                     planes: bool):
    """Trilinear from ONE 64 B tri-row gather (pool_mode="tri").

    Lanes 0-15 are the level-m0 quad (exactly the quad pool's row);
    lanes 16-51 the 3x3 level-(m0+1) block anchored at
    ((x0c>>1)-1, (y0c>>1)-1). The level-m1 footprint start is always
    inside the anchor's 2x2 candidates (floor(u*wm1-0.5) ∈
    {x0c>>1 - 1, x0c>>1} for BOTH parities of wm0, clamps included),
    so the parent 2x2 selects from the block with rx, ry ∈ {0, 1} —
    pure `where` selects (exact), then the SAME _contract_quad
    expression as the two-gather path. Where m1 == m0 (lod at the
    texture's last real level) the two-gather path samples the same
    row twice with identical fractions, so s1 := s0 reproduces it
    bit-for-bit without reading the parent lanes."""
    th0 = hm0.astype(jnp.float32)
    tw0 = wm0.astype(jnp.float32)
    x = u * tw0 - 0.5
    y = v * th0 - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = jnp.where(x0f < 0, 0.0, x - x0f)
    fy = jnp.where(y0f < 0, 0.0, y - y0f)
    x0c = jnp.clip(x0f.astype(jnp.int32), 0, jnp.maximum(wm0 - 1, 0))
    y0c = jnp.clip(y0f.astype(jnp.int32), 0, jnp.maximum(hm0 - 1, 0))
    row = _tri_fetch(pool, off0 + y0c * wm0 + x0c)
    quad0 = (row[..., :16].reshape(row.shape[:-1] + (4, 4))
             .astype(jnp.float32))
    s0 = _contract_quad(quad0, fx, fy, planes)

    # level-m1 addressing: the same expressions _quad_bilinear runs
    th1 = hm1.astype(jnp.float32)
    tw1 = wm1.astype(jnp.float32)
    x1 = u * tw1 - 0.5
    y1 = v * th1 - 0.5
    x1f = jnp.floor(x1)
    y1f = jnp.floor(y1)
    fx1 = jnp.where(x1f < 0, 0.0, x1 - x1f)
    fy1 = jnp.where(y1f < 0, 0.0, y1 - y1f)
    x1c = jnp.clip(x1f.astype(jnp.int32), 0, jnp.maximum(wm1 - 1, 0))
    y1c = jnp.clip(y1f.astype(jnp.int32), 0, jnp.maximum(hm1 - 1, 0))
    rx = x1c - ((x0c >> 1) - 1)            # ∈ {0, 1} (see docstring)
    ry = y1c - ((y0c >> 1) - 1)
    lin = 3 * ry + rx                      # 2x2 start ∈ {0, 1, 3, 4}
    blk = row[..., 16:52].reshape(row.shape[:-1] + (9, 4))

    def tap(o):
        l3 = (lin == 3)[..., None]
        l1 = (lin == 1)[..., None]
        l0 = (lin == 0)[..., None]
        return jnp.where(l0, blk[..., 0 + o, :],
                         jnp.where(l1, blk[..., 1 + o, :],
                                   jnp.where(l3, blk[..., 3 + o, :],
                                             blk[..., 4 + o, :])))

    quad1 = (jnp.stack([tap(0), tap(1), tap(3), tap(4)], axis=-2)
             .astype(jnp.float32))
    s1p = _contract_quad(quad1, fx1, fy1, planes)
    deep = m1 > m0
    deep = deep[None] if planes else deep[..., None]
    s1 = jnp.where(deep, s1p, s0)
    return s0 * (1 - fm) + s1 * fm


# ------------------------------------------------- bc1-resident sampling


def _bc1_words(row, n: int = 8):
    """(…, 64) u8 bc1 row → per-sub-block endpoint words (c0, c1) i32
    and 32-bit index words u32, for the first ``n`` of the 8 baked
    sub-blocks (0-3 child group, 4-7 parent group). Pure lane slices —
    XLA DCEs any sub-block no tap selects."""
    u = row.astype(jnp.int32)
    ub = row.astype(jnp.uint32)
    c0s, c1s, bits = [], [], []
    for s in range(n):
        o = 8 * s
        c0s.append(u[..., o] | (u[..., o + 1] << 8))
        c1s.append(u[..., o + 2] | (u[..., o + 3] << 8))
        bits.append(ub[..., o + 4] | (ub[..., o + 5] << 8)
                    | (ub[..., o + 6] << 16) | (ub[..., o + 7] << 24))
    return c0s, c1s, bits


def _bc1_texel(c0, c1, bits, xt, yt):
    """Decode ONE BC1 texel at global texel coords (xt, yt) from its
    block's words — the exact integer arithmetic of
    ``bcn.decode_bc1_numpy`` (565 expand, (2a+b+1)//3 interpolants,
    3-color punch-through), ~30 VPU ops. Returns [r, g, b, a] i32."""
    sh = (2 * ((yt & 3) * 4 + (xt & 3))).astype(jnp.uint32)
    code = jax.lax.shift_right_logical(bits, sh).astype(jnp.int32) & 3

    def expand(c):
        r = (c >> 11) & 31
        g = (c >> 5) & 63
        b = c & 31
        return ((r << 3) | (r >> 2), (g << 2) | (g >> 4),
                (b << 3) | (b >> 2))

    e0 = expand(c0)
    e1 = expand(c1)
    four = c0 > c1
    out = []
    for a, b in zip(e0, e1):
        p2 = jnp.where(four, (2 * a + b + 1) // 3, (a + b) >> 1)
        p3 = jnp.where(four, (a + 2 * b + 1) // 3, 0)
        out.append(jnp.where(code == 0, a,
                             jnp.where(code == 1, b,
                                       jnp.where(code == 2, p2, p3))))
    out.append(jnp.where((code == 3) & ~four, 0, 255))
    return out


def _bc1_quad(c0s, c1s, bits, base: int, taps):
    """2x2 bilinear footprint decoded from a baked 2x2 BLOCK group
    (sub-blocks base..base+3): ``taps`` = 4 tuples (xt, yt, sx, sy) in
    _contract_quad weight order, sx/sy the tap's block coord within the
    group — traced {0, 1} arrays, or None where statically 0 (the
    anchor tap). Returns (…, 4, 4) f32 quad."""
    def pick(vals, sx, sy):
        if sx is None and sy is None:
            return vals[base]
        if sy is None:
            return jnp.where(sx == 1, vals[base + 1], vals[base])
        if sx is None:
            return jnp.where(sy == 1, vals[base + 2], vals[base])
        lo = jnp.where(sx == 1, vals[base + 1], vals[base])
        hi = jnp.where(sx == 1, vals[base + 3], vals[base + 2])
        return jnp.where(sy == 1, hi, lo)

    texels = [
        _bc1_texel(pick(c0s, sx, sy), pick(c1s, sx, sy),
                   pick(bits, sx, sy), xt, yt)
        for xt, yt, sx, sy in taps
    ]
    return jnp.stack(
        [jnp.stack([t[c] for c in range(4)], axis=-1).astype(jnp.float32)
         for t in texels], axis=-2)


def _bc1_footprint(wm, hm, u, v):
    """Shared bilinear addressing at one level (the exact expressions
    _quad_bilinear computes): returns (x0c, y0c, x1c, y1c, fx, fy)."""
    tw = wm.astype(jnp.float32)
    th = hm.astype(jnp.float32)
    x = u * tw - 0.5
    y = v * th - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = jnp.where(x0f < 0, 0.0, x - x0f)
    fy = jnp.where(y0f < 0, 0.0, y - y0f)
    x0c = jnp.clip(x0f.astype(jnp.int32), 0, jnp.maximum(wm - 1, 0))
    y0c = jnp.clip(y0f.astype(jnp.int32), 0, jnp.maximum(hm - 1, 0))
    x1c = jnp.minimum(x0c + 1, jnp.maximum(wm - 1, 0))
    y1c = jnp.minimum(y0c + 1, jnp.maximum(hm - 1, 0))
    return x0c, y0c, x1c, y1c, fx, fy


def _bc1_bilinear(pool, off, hh, ww, u, v, planes: bool = False):
    """Bilinear tap from the bc1 pool: ONE row-priced gather of the
    block row at (x0c>>2, y0c>>2) — its baked child group contains the
    whole footprint — then 4 in-register texel decodes. ``off`` is the
    level's BLOCK-row offset; hh/ww its texel extents."""
    x0c, y0c, x1c, y1c, fx, fy = _bc1_footprint(ww, hh, u, v)
    bx = x0c >> 2
    by = y0c >> 2
    bw = (ww + 3) >> 2
    row = _tri_fetch(pool, off + by * bw + bx)
    c0s, c1s, bits = _bc1_words(row, n=4)
    rx = jnp.clip((x1c >> 2) - bx, 0, 1)
    ry = jnp.clip((y1c >> 2) - by, 0, 1)
    quad = _bc1_quad(c0s, c1s, bits, 0,
                     [(x0c, y0c, None, None), (x1c, y0c, rx, None),
                      (x0c, y1c, None, ry), (x1c, y1c, rx, ry)])
    return _contract_quad(quad, fx, fy, planes)


def _mip_arith_bc1(off0, th, tw, m, num_mips: int):
    """Level-m BLOCK-row offset + texel extents from the mip-0
    constants — the bc1 twin of _mip_arith (levels are contiguous and
    level i spans ceil(h_i/4)·ceil(w_i/4) block rows, exactly how
    upload() lays the bc1 pool out)."""
    hm = jnp.maximum(th >> m, 1)
    wm = jnp.maximum(tw >> m, 1)
    off = off0
    for i in range(num_mips - 1):
        bh = (jnp.maximum(th >> i, 1) + 3) >> 2
        bw = (jnp.maximum(tw >> i, 1) + 3) >> 2
        off = off + jnp.where(m > i, bh * bw, 0)
    return off, hm, wm


def _bc1_trilinear_fused(pool, off0, hm0, wm0, hm1, wm1, m0, m1, fm,
                         u, v, planes: bool):
    """Trilinear from ONE 64 B bc1 row gather + 8 in-register BC1 texel
    decodes (pool_mode="bc1") — the tri-pool trick at block
    granularity. The row bakes the child 2x2 BLOCK group at
    (x0c>>2, y0c>>2) (any level-m0 bilinear footprint starting in the
    anchor block stays inside it) and the parent 2x2 block group
    anchored at A = (2·bx−1)>>2 per axis: the level-m1 footprint spans
    texels [2·bx−1, 2·bx+2] (x1c = floor(u·wm1−0.5) ∈
    {x0c>>1 − 1, x0c>>1} for both parities — the tri pool's law), i.e.
    at most two consecutive parent blocks {A, A+1} for either bx
    parity. Decoded integers equal the decoded-texture pools', so
    _contract_quad reproduces the quad/tri paths bit-for-bit; where
    m1 == m0 (the texture's last real level) s1 := s0 without reading
    the parent lanes (baked zero)."""
    x0c, y0c, x1c, y1c, fx, fy = _bc1_footprint(wm0, hm0, u, v)
    bx = x0c >> 2
    by = y0c >> 2
    bw0 = (wm0 + 3) >> 2
    row = _tri_fetch(pool, off0 + by * bw0 + bx)
    c0s, c1s, bits = _bc1_words(row)
    rx = jnp.clip((x1c >> 2) - bx, 0, 1)
    ry = jnp.clip((y1c >> 2) - by, 0, 1)
    quad0 = _bc1_quad(c0s, c1s, bits, 0,
                      [(x0c, y0c, None, None), (x1c, y0c, rx, None),
                       (x0c, y1c, None, ry), (x1c, y1c, rx, ry)])
    s0 = _contract_quad(quad0, fx, fy, planes)

    xp0, yp0, xp1, yp1, fx1, fy1 = _bc1_footprint(wm1, hm1, u, v)
    pbw = (wm1 + 3) >> 2
    pbh = (hm1 + 3) >> 2
    ax = jnp.clip((2 * bx - 1) >> 2, 0, jnp.maximum(pbw - 1, 0))
    ay = jnp.clip((2 * by - 1) >> 2, 0, jnp.maximum(pbh - 1, 0))
    # every parent tap may land in either group column/row (unlike the
    # child group, whose anchor tap is its own block by construction)
    sx0 = jnp.clip((xp0 >> 2) - ax, 0, 1)
    sx1 = jnp.clip((xp1 >> 2) - ax, 0, 1)
    sy0 = jnp.clip((yp0 >> 2) - ay, 0, 1)
    sy1 = jnp.clip((yp1 >> 2) - ay, 0, 1)
    quad1 = _bc1_quad(c0s, c1s, bits, 4,
                      [(xp0, yp0, sx0, sy0), (xp1, yp0, sx1, sy0),
                       (xp0, yp1, sx0, sy1), (xp1, yp1, sx1, sy1)])
    s1p = _contract_quad(quad1, fx1, fy1, planes)
    deep = m1 > m0
    deep = deep[None] if planes else deep[..., None]
    s1 = jnp.where(deep, s1p, s0)
    return s0 * (1 - fm) + s1 * fm


# ------------------------------------------------- bc7-resident sampling


def _bc7_needs_hint(modes) -> bool:
    """Partitioned modes (2/3 subsets) read the baked hint pool."""
    return any(m in (0, 1, 2, 3, 7) for m in modes)


def _bc7_row_words(row, n: int = 8):
    """(…, 128) u8 bc7 row → list of n per-sub-block word LISTS (four
    (…,) u32 scalars each; sub-blocks 0-3 child group, 4-7 parent
    group). Kept unstacked: a (…, 4) minor dim lane-pads 4 → 128 when
    materialized and cost ~13x the decode itself (bc7_probe.py r5).
    Pure lane slices — XLA DCEs any sub-block no tap selects."""
    u = row.astype(jnp.uint32)
    out = []
    for s in range(n):
        o = 16 * s
        out.append(
            [u[..., o + 4 * k] | (u[..., o + 4 * k + 1] << 8)
             | (u[..., o + 4 * k + 2] << 16)
             | (u[..., o + 4 * k + 3] << 24) for k in range(4)])
    return out


def _bc7_row_hints(hrow, n: int = 8):
    """(…, 64) u8 hint row (bc7_block_hints baked by _build_bc1_pool's
    group geometry) → list of n (subset_word, anchors) PAIRS of (…,)
    u32 scalars (unstacked, like _bc7_row_words)."""
    u = hrow.astype(jnp.uint32)
    out = []
    for s in range(n):
        o = 8 * s
        out.append(
            (u[..., o] | (u[..., o + 1] << 8) | (u[..., o + 2] << 16)
             | (u[..., o + 3] << 24),
             u[..., o + 4] | (u[..., o + 5] << 8) | (u[..., o + 6] << 16)
             | (u[..., o + 7] << 24)))
    return out


def _bc7_pick(vals, base: int, sx, sy):
    """Select the tap's sub-block data from a 2x2 group (vals: list of
    n per-sub-block LISTS of (…,) scalars, group at base..base+3;
    sx/sy traced {0, 1} arrays or None where statically 0 — the
    _bc1_quad pick, elementwise over the unstacked scalars)."""
    def sel(cond, a, b):
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    if sx is None and sy is None:
        return list(vals[base])
    if sy is None:
        return sel(sx == 1, vals[base + 1], vals[base])
    if sx is None:
        return sel(sy == 1, vals[base + 2], vals[base])
    lo = sel(sx == 1, vals[base + 1], vals[base])
    hi = sel(sx == 1, vals[base + 3], vals[base + 2])
    return sel(sy == 1, hi, lo)


def _bc7_quad(words, hints, base: int, taps, modes):
    """2x2 bilinear footprint decoded from a baked 2x2 BC7 BLOCK group:
    4 single-texel all-present-mode decodes (bcn.bc7_texel_device) in
    _contract_quad weight order. Returns (…, 4, 4) f32."""
    from . import bcn

    texels = []
    for xt, yt, sx, sy in taps:
        w = _bc7_pick(words, base, sx, sy)
        h = _bc7_pick(hints, base, sx, sy) if hints is not None else None
        t = (yt & 3) * 4 + (xt & 3)
        texels.append(bcn.bc7_texel_device(w, t, modes=modes, hint=h))
    return jnp.stack(
        [jnp.stack([tx[c] for c in range(4)], axis=-1).astype(jnp.float32)
         for tx in texels], axis=-2)


def _bc7_bilinear(pool, aux, modes, off, hh, ww, u, v,
                  planes: bool = False):
    """Bilinear tap from the bc7 pool: ONE row-priced gather of the
    block row at (x0c>>2, y0c>>2) — its baked child group contains the
    whole footprint — plus (partitioned modes only) the matching hint
    row, then 4 in-register texel decodes."""
    x0c, y0c, x1c, y1c, fx, fy = _bc1_footprint(ww, hh, u, v)
    bx = x0c >> 2
    by = y0c >> 2
    bw = (ww + 3) >> 2
    idx = off + by * bw + bx
    row = jax.lax.optimization_barrier(pool[idx])
    words = _bc7_row_words(row, n=4)
    hints = (_bc7_row_hints(_tri_fetch(aux, idx), n=4)
             if _bc7_needs_hint(modes) else None)
    rx = jnp.clip((x1c >> 2) - bx, 0, 1)
    ry = jnp.clip((y1c >> 2) - by, 0, 1)
    quad = _bc7_quad(words, hints, 0,
                     [(x0c, y0c, None, None), (x1c, y0c, rx, None),
                      (x0c, y1c, None, ry), (x1c, y1c, rx, ry)], modes)
    return _contract_quad(quad, fx, fy, planes)


def _bc7_trilinear_fused(pool, aux, modes, off0, hm0, wm0, hm1, wm1,
                         m0, m1, fm, u, v, planes: bool):
    """Trilinear from ONE 128 B bc7 row gather (+ the 64 B hint row for
    partitioned modes) + 8 in-register BC7 texel decodes — exactly
    _bc1_trilinear_fused's group addressing at 16 B blocks (see its
    docstring for the parent-anchor law). Decoded integers equal
    decode_bc7's, so _contract_quad reproduces a quad pool built from
    the decoded chains bit-for-bit."""
    x0c, y0c, x1c, y1c, fx, fy = _bc1_footprint(wm0, hm0, u, v)
    bx = x0c >> 2
    by = y0c >> 2
    bw0 = (wm0 + 3) >> 2
    idx = off0 + by * bw0 + bx
    row = jax.lax.optimization_barrier(pool[idx])
    words = _bc7_row_words(row)
    hints = (_bc7_row_hints(_tri_fetch(aux, idx))
             if _bc7_needs_hint(modes) else None)
    rx = jnp.clip((x1c >> 2) - bx, 0, 1)
    ry = jnp.clip((y1c >> 2) - by, 0, 1)
    quad0 = _bc7_quad(words, hints, 0,
                      [(x0c, y0c, None, None), (x1c, y0c, rx, None),
                       (x0c, y1c, None, ry), (x1c, y1c, rx, ry)], modes)
    s0 = _contract_quad(quad0, fx, fy, planes)

    xp0, yp0, xp1, yp1, fx1, fy1 = _bc1_footprint(wm1, hm1, u, v)
    pbw = (wm1 + 3) >> 2
    pbh = (hm1 + 3) >> 2
    ax = jnp.clip((2 * bx - 1) >> 2, 0, jnp.maximum(pbw - 1, 0))
    ay = jnp.clip((2 * by - 1) >> 2, 0, jnp.maximum(pbh - 1, 0))
    sx0 = jnp.clip((xp0 >> 2) - ax, 0, 1)
    sx1 = jnp.clip((xp1 >> 2) - ax, 0, 1)
    sy0 = jnp.clip((yp0 >> 2) - ay, 0, 1)
    sy1 = jnp.clip((yp1 >> 2) - ay, 0, 1)
    quad1 = _bc7_quad(words, hints, 4,
                      [(xp0, yp0, sx0, sy0), (xp1, yp0, sx1, sy0),
                       (xp0, yp1, sx0, sy1), (xp1, yp1, sx1, sy1)], modes)
    s1p = _contract_quad(quad1, fx1, fy1, planes)
    deep = m1 > m0
    deep = deep[None] if planes else deep[..., None]
    s1 = jnp.where(deep, s1p, s0)
    return s0 * (1 - fm) + s1 * fm


LIGHT_DIR = (0.35, 0.65, 0.67)   # world-space directional light (normalized-ish)


def _light_unit() -> tuple:
    """LIGHT_DIR normalized, as a static python tuple (kernel constant)."""
    l = np.asarray(LIGHT_DIR, np.float32)
    l = l / np.linalg.norm(l)
    return (float(l[0]), float(l[1]), float(l[2]))


def shade_src(scene: DeviceScene, setup, ib, width: int, height: int,
              origin=(0, 0), band=None, mipmap: bool = False,
              lighting: bool = False):
    """Per-pixel source color of the winner triangle (pre-blend).

    Returns (src (bh, bw, 4) f32 0-255, covered (bh, bw) bool)."""
    bw, bh = band if band is not None else (width, height)
    x0, y0 = origin
    covered = ib >= 0
    idx = jnp.maximum(ib, 0)

    px = (jnp.arange(bw, dtype=jnp.float32) + (jnp.float32(x0) + 0.5))[None, :]
    py = (jnp.arange(bh, dtype=jnp.float32) + (jnp.float32(y0) + 0.5))[:, None]

    ea = setup["ea"][idx]                                  # (H, W, 3)
    eb = setup["eb"][idx]
    ec = setup["ec"][idx]
    e = ea * px[..., None] + eb * py[..., None] + ec
    b = e / setup["area"][idx][..., None]                  # (H, W, 3)

    inv_w = setup["inv_w"][idx]                            # (H, W, 3)
    pw = jnp.sum(b * inv_w, axis=-1)                       # (H, W)
    uv = setup["uv"][idx]                                  # (H, W, 3, 2)
    uvp = jnp.einsum("hwp,hwpc->hwc", b * inv_w, uv,
                     precision=jax.lax.Precision.HIGHEST) / pw[..., None]

    layer = scene.tri_texture[idx]
    textured = layer >= 0
    if mipmap:
        tex_hw = scene.tex_size[jnp.clip(layer, 0, scene.tex_size.shape[0] - 1)]
        # analytic LOD from this pixel's OWN winner planes (the same
        # _analytic_lod expression the pallas paths use): U/Q plane
        # gradients reconstructed from the gathered edge coefficients
        area = setup["area"][idx][..., None]
        ax = ea / area                                 # (H, W, 3)
        ay = eb / area
        qx = jnp.sum(ax * inv_w, -1)
        qy = jnp.sum(ay * inv_w, -1)
        gux = jnp.einsum("hwp,hwpc->hwc", ax * inv_w, uv,
                         precision=jax.lax.Precision.HIGHEST)
        guy = jnp.einsum("hwp,hwpc->hwc", ay * inv_w, uv,
                         precision=jax.lax.Precision.HIGHEST)
        ipw = 1.0 / pw
        lod = _analytic_lod(
            uvp[..., 0], uvp[..., 1],
            gux[..., 0] * ipw, guy[..., 0] * ipw,
            gux[..., 1] * ipw, guy[..., 1] * ipw,
            qx * ipw, qy * ipw,
            tex_hw[..., 0].astype(jnp.float32),
            tex_hw[..., 1].astype(jnp.float32))
        albedo = sample_trilinear(scene, layer, uvp[..., 0], uvp[..., 1], lod)
    else:
        albedo = sample_bilinear(scene, layer, uvp[..., 0], uvp[..., 1])

    palette = jnp.asarray(
        np.concatenate(
            [DEBUG_PALETTE.astype(np.float32),
             np.full((20, 1), 255.0, np.float32)], axis=1,
        )
    )
    debug_rgba = palette[scene.tri_debug_id[idx] % 20]
    flat = scene.tri_flat[idx]
    untextured = jnp.where(flat[..., 3:4] >= 0.0, flat, debug_rgba)

    src = jnp.where(textured[..., None], albedo, untextured)
    # per-material RGBA multiplier (constant-buffer parameter — the
    # material-driven shading hook; animatable via scene.mat_color)
    mat = scene.mat_color[scene.tri_material[idx]]
    src = src * mat

    if lighting:
        # perspective-correct normal interpolation + lambert term with a
        # 0.3 ambient floor (extension — the reference shades unlit)
        nv = setup["nrm"][idx]                             # (H, W, 3, 3)
        n = jnp.einsum("hwp,hwpc->hwc", b * inv_w, nv,
                       precision=jax.lax.Precision.HIGHEST) / pw[..., None]
        n = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6
        )
        light = jnp.asarray(LIGHT_DIR, jnp.float32)
        light = light / jnp.linalg.norm(light)
        ndl = jnp.maximum(jnp.einsum("hwc,c->hw", n, light), 0.0)
        shade = (0.3 + 0.7 * ndl)[..., None]
        src = jnp.concatenate([src[..., :3] * shade, src[..., 3:]], axis=-1)
    return src, covered


def blend_over(src, covered, dst):
    """src-alpha / one-minus-src-alpha over ``dst``; output alpha = src
    alpha (the reference blend state, model.rs:242-247). Float 0-255."""
    a = src[..., 3:4] / 255.0
    out_rgb = src[..., :3] * a + dst[..., :3] * (1.0 - a)
    out = jnp.concatenate([out_rgb, src[..., 3:4]], axis=-1)
    return jnp.where(covered[..., None], out, dst)


def shade_stage(scene: DeviceScene, setup, zb, ib, width: int, height: int,
                clear_color, origin=(0, 0), band=None, mipmap: bool = False,
                lighting: bool = False):
    """Winner-takes-all deferred shading, blended over the clear color."""
    bw, bh = band if band is not None else (width, height)
    src, covered = shade_src(scene, setup, ib, width, height, origin, band,
                             mipmap=mipmap, lighting=lighting)
    clear = jnp.asarray(np.asarray(clear_color, np.float32))
    dst = jnp.broadcast_to(clear, (bh, bw, 4))
    out = blend_over(src, covered, dst)
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)


# ------------------------------------------------------------- frontends


def predict_bin_counts(batch, view_proj, bone_mats=None, *,
                       width: int, height: int,
                       y0: int = 0, grid_rows: int | None = None
                       ) -> np.ndarray:
    """NumPy mirror of the kernel's binning: per-tile candidate-chunk
    counts (n_ty, n_tx) for this view, duplicating ``upload``'s
    triangle padding, ``pack_setup``'s chunk aggregation and
    ``bin_chunks``'s tile-overlap rule. ``y0``/``grid_rows``: bin
    against a band's own tile grid (origin + padded band rows, the
    kernel's origin_ref) while the screen transform keeps the FULL
    frame height — exactly the multichip band contract.
    ``tests/test_pallas_raster.py``
    pins this mirror to the kernel's ``counts_true`` on randomized
    scenes — change either side and that test fails loudly.

    Runs entirely in NumPy from the HOST DrawBatch: a device→host
    transfer this early would permanently degrade every later dispatch
    in the process to ~250 ms through the axon TPU tunnel (measured
    r2), so the sizing decision must never touch the device."""
    from . import pallas_raster as pr

    pw = -(-width // pr.TILE_W) * pr.TILE_W
    ph = -(-height // pr.TILE_H) * pr.TILE_H
    xmin, xmax, ymin, ymax, _ = _chunk_bboxes(
        batch, view_proj, bone_mats, width=width, height=height)
    n_ty, n_tx = (grid_rows or ph) // pr.TILE_H, pw // pr.TILE_W
    ty0 = np.arange(n_ty, dtype=np.float32) * pr.TILE_H + y0
    tx0 = np.arange(n_tx, dtype=np.float32) * pr.TILE_W
    ovy = (ymax[:, None] >= ty0) & (ymin[:, None] <= ty0 + pr.TILE_H)
    ovx = (xmax[:, None] >= tx0) & (xmin[:, None] <= tx0 + pr.TILE_W)
    return (ovy[:, :, None] & ovx[:, None, :]).sum(axis=0)


def _chunk_bboxes(batch, view_proj, bone_mats=None, *,
                  width: int, height: int):
    """Per-chunk screen bboxes + textured flag (xmin, xmax, ymin, ymax,
    textured), bboxes (C,) f32, textured (C,) bool (any triangle in the
    chunk has a texture layer), in
    NumPy from the HOST batch — the shared geometry behind
    ``predict_bin_counts`` (tile granularity) and ``predict_live_rows``
    (SEG_PX row granularity). Duplicates ``upload``'s triangle padding
    and ``pack_setup``'s chunk aggregation; the property test pinning
    predict_bin_counts to the kernel's bin_chunks pins this too."""
    from . import cpu_reference as cr
    from . import pallas_raster as pr

    pos = cr.skin_positions(batch, bone_mats)
    homo = np.concatenate(
        [pos, np.ones((len(pos), 1), np.float32)], axis=1
    )
    clip = homo @ np.asarray(view_proj, np.float32).T
    c = clip[batch.tris]                                  # (T, 3, 4)
    w = c[..., 3]
    ndc = c[..., :3] / np.where(np.abs(w) < W_EPS, W_EPS, w)[..., None]
    sx = (ndc[..., 0] + 1.0) * (0.5 * width)
    sy = (1.0 - ndc[..., 1]) * (0.5 * height)
    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])
    valid = (w > W_EPS).all(axis=1) & (area2 < 0.0)

    # mirror upload()'s padding + pack_setup's chunk aggregation
    t = len(batch.tris)
    tp = max(TRI_PAD, -(-t // TRI_PAD) * TRI_PAD)
    big = np.float32(1e30)
    xmin = np.full(tp, big, np.float32)
    xmax = np.full(tp, -big, np.float32)
    ymin = np.full(tp, big, np.float32)
    ymax = np.full(tp, -big, np.float32)
    xmin[:t] = np.where(valid, sx.min(1), big)
    xmax[:t] = np.where(valid, sx.max(1), -big)
    ymin[:t] = np.where(valid, sy.min(1), big)
    ymax[:t] = np.where(valid, sy.max(1), -big)
    cc = tp // pr.CT
    tex = np.full(tp, -1, np.int32)
    tex[:t] = batch.tri_texture
    return (xmin.reshape(cc, pr.CT).min(1),
            xmax.reshape(cc, pr.CT).max(1),
            ymin.reshape(cc, pr.CT).min(1),
            ymax.reshape(cc, pr.CT).max(1),
            (tex.reshape(cc, pr.CT) >= 0).any(1))


def predict_live_rows(batch, view_proj, bone_mats=None, *,
                      width: int, height: int,
                      y0: int = 0, grid_rows: int | None = None) -> int:
    """Host-side upper bound on live SEG_PX-px tap rows (whole tiles at
    the production SEG_PX; a (tile-x, pixel-row-block) segment at finer
    settings) for this view: a segment can only be covered if some
    candidate chunk's bbox overlaps it, so counting bbox-overlapped
    segments bounds the compacted tap's true liveness from above (chunk
    bboxes are the binning's own granularity). Only TEXTURED chunks
    count — the tap's live mask is textured∧covered, and a segment none
    of whose overlapping chunks carries a texture can never tap the
    pool. ``y0``/``grid_rows`` follow the multichip band contract of
    ``predict_bin_counts``."""
    from . import pallas_raster as pr

    pw = -(-width // pr.TILE_W) * pr.TILE_W
    ph = -(-height // pr.TILE_H) * pr.TILE_H
    xmin, xmax, ymin, ymax, tex = _chunk_bboxes(
        batch, view_proj, bone_mats, width=width, height=height)
    xmin, xmax = xmin[tex], xmax[tex]
    ymin, ymax = ymin[tex], ymax[tex]
    rows = grid_rows or ph
    seg_h = SEG_PX // pr.TILE_W     # pixel rows per compaction segment
    n_tx = pw // pr.TILE_W
    tx0 = np.arange(n_tx, dtype=np.float32) * pr.TILE_W
    ys = np.arange(rows // seg_h, dtype=np.float32) * seg_h + y0
    ovx = (xmax[:, None] >= tx0) & (xmin[:, None] <= tx0 + pr.TILE_W)
    ovy = (ymax[:, None] >= ys) & (ymin[:, None] <= ys + float(seg_h))
    live = (ovy.astype(np.float32).T @ ovx.astype(np.float32)) > 0.0
    return int(live.sum())


def auto_maxc(batch, view_proj, bone_mats=None, *,
              width: int, height: int, margin: float = 1.5) -> int:
    """Size the pallas binning cap for a scene: the densest tile's true
    candidate-chunk count for this view (``predict_bin_counts``), with
    ``margin`` headroom for animation, rounded up to a multiple of 8
    and clamped to the SMEM limit. Call once at load / scene change."""
    from . import pallas_raster as pr

    pw = -(-width // pr.TILE_W) * pr.TILE_W
    ph = -(-height // pr.TILE_H) * pr.TILE_H
    need = int(predict_bin_counts(batch, view_proj, bone_mats,
                                  width=width, height=height).max())

    want = max(8, -(-int(np.ceil(need * margin)) // 8) * 8)
    limit = pr.smem_maxc_limit(pw, ph)
    if want > limit:
        pr.logger.warning(
            "auto_maxc: scene needs maxc=%d but SMEM caps it at %d for "
            "%dx%d — overflow checking will catch any actual drop",
            want, limit, width, height,
        )
    return min(want, limit)


def auto_tap_tiles(batch, view_proj, bone_mats=None, *,
                   width: int, height: int, margin: float = 1.25,
                   bands: int = 1) -> int:
    """Host-side (NO device sync) cap for the single-layer compacted
    texture tap (shade_tap_flat_channels), in SEG_PX-px tap rows
    (whole tiles at the production SEG_PX): a live row's segment
    necessarily overlaps a textured candidate chunk bbox, so
    ``predict_live_rows`` bounds liveness from above; ``margin`` covers
    animation drift. Rounded up to a multiple of 8, clamped to the
    grid's segment count. ``bands`` > 1 sizes a multichip band split:
    the max over each band's own tile grid (one static cap serves
    every shard)."""
    from . import pallas_raster as pr

    pw = -(-width // pr.TILE_W) * pr.TILE_W
    band_h = -(-height // bands)
    pb = -(-band_h // pr.TILE_H) * pr.TILE_H
    nrows = (pw // pr.TILE_W) * (pb // (SEG_PX // pr.TILE_W))
    live = max(
        predict_live_rows(batch, view_proj, bone_mats,
                          width=width, height=height,
                          y0=i * band_h, grid_rows=pb)
        for i in range(bands)
    )
    return min(max(8, -(-int(np.ceil(live * margin)) // 8) * 8), nrows)


def measure_live_tap_tiles(scene: DeviceScene, view_proj, bone_mats=None,
                           *, width: int, height: int, layers: int,
                           maxc: int | None = None,
                           lighting: bool = False,
                           margin: float = 1.5,
                           mode: str = "ml",
                           bands: int = 1):
    """Size ``tap_tiles`` (the peeled composite's compacted texture-tap
    cap — see composite_peeled_tap_flat) for a scene, in SEG_PX-px tap
    rows ((tile, layer) rows at the production SEG_PX): run the ML
    kernel once for this view, count live rows on device, and return
    count x ``margin`` rounded up (one device→host transfer — call
    once at load / scene change, exactly like ``auto_maxc``). Opaque
    content keeps deeper layers empty (kernel opaque-z cull), so this
    typically lands near ONE frame's covered rows instead of
    rows x layers.

    ``mode="split"`` sizes the split peel instead and returns the
    (opaque live-row cap, translucent live-row cap) pair that
    ``render_frame_peeled(..., peel_mode="split", tap_tiles=...)``
    takes. ``bands`` > 1 (split only) sizes a multichip band split:
    the measurement runs per band at its own origin and returns the
    max over bands — one static cap pair serves every shard
    (``render_frame_multichip(peel_layers=L, tap_tiles=caps)``).
    Liveness (z/id coverage) is identical between the bilinear and
    trilinear kernel variants, so these caps serve ``mipmap=True``
    renders too (the measurement always runs the cheaper tap
    variant)."""
    from . import pallas_raster as pr

    pw = -(-width // pr.TILE_W) * pr.TILE_W
    ph = -(-height // pr.TILE_H) * pr.TILE_H
    clip = vertex_stage(scene, view_proj, bone_mats)
    mc = maxc or pr.MAXC_DEFAULT
    interp = jax.default_backend() != "tpu"
    light = _light_unit() if lighting else None

    def cap(live, hi):
        return min(max(8, -(-int(np.ceil(live * margin)) // 8) * 8), hi)

    if bands > 1 and mode != "split":
        raise ValueError("bands > 1 sizing exists for mode='split' only "
                         "(the multichip peel engine)")

    def live_rows(mask):
        # (nt, L, P) bool → live SEG_PX-px (tile, layer[, segment]) rows
        nt_, l_, p_ = mask.shape
        return int(jnp.sum(
            jnp.any(mask.reshape(nt_ * l_ * (p_ // SEG_PX), SEG_PX),
                    axis=1)))

    if mode == "split":
        (cols_op, bbox_op), (cols_tr, bbox_tr), n_attr = \
            setup_packed_cols(scene, clip, width, height,
                              bone_mats=bone_mats, lighting=lighting,
                              opacity_split=True)
        band_h = -(-height // bands)
        pb = -(-band_h // pr.TILE_H) * pr.TILE_H
        nrows_band = (pw // pr.TILE_W) * (pb // (SEG_PX // pr.TILE_W))
        kw = dict(width=pw, height=pb, maxc=mc, interpret=interp,
                  n_attr=n_attr, w_eps=W_EPS, light=light, flat=True,
                  tap=True)
        live_op = live_tr = 0
        for i in range(bands):
            y0 = i * band_h
            zo, io, _, tio, _ = pr.raster_pallas_fwd(
                (cols_op, bbox_op), None, 0, y0, **kw)
            zo_eff = jnp.where(io >= 0, zo, jnp.float32(jnp.inf))
            zt, it, _, tit, _ = pr.raster_pallas_fwd_ml(
                (cols_tr, bbox_tr), None, 0, y0, layers=layers,
                variant="nocull", zhi=zo_eff, **kw)
            cov_tr = (it >= 0) & ((zt < zo_eff)
                                  | ((zt == zo_eff) & (it > io)))
            # textured∧covered — matches the composite's live mask
            live_op = max(live_op, live_rows((io >= 0) & (tio >= 0)))
            live_tr = max(live_tr, live_rows(cov_tr & (tit >= 0)))
        return (cap(live_op, nrows_band),
                cap(live_tr, nrows_band * layers))

    cols, bbox, n_attr = setup_packed_cols(
        scene, clip, width, height, bone_mats=bone_mats,
        lighting=lighting)
    _, ib, _, ti, _ = pr.raster_pallas_fwd_ml(
        (cols, bbox), None, 0, 0, width=pw, height=ph, layers=layers,
        maxc=mc, interpret=interp,
        n_attr=n_attr, tap=True, w_eps=W_EPS,
        light=light, flat=True)
    nrows = (pw // pr.TILE_W) * (ph // (SEG_PX // pr.TILE_W))
    return cap(live_rows((ib >= 0) & (ti >= 0)), nrows * layers)


@functools.partial(jax.jit, static_argnames=("width", "height", "maxc"))
def count_covered_textured(scene: DeviceScene, view_proj: jax.Array,
                           bone_mats: jax.Array | None = None, *,
                           width: int, height: int,
                           maxc: int | None = None):
    """Device-side per-frame pixel counts → (covered, textured-winner)
    i32 scalars. "Textured" is MEASURED from the winner's tap row
    (tapidx >= 0), not assumed — the bench derives Mtexel/s from this
    instead of treating every covered pixel as sampled (r3 verdict #6:
    the all-textured assumption only happened to hold because every
    preset was fully textured). Runs the production raster (same
    binning cap), one extra untimed pass per measured frame."""
    from . import pallas_raster as pr

    pw = -(-width // pr.TILE_W) * pr.TILE_W
    ph = -(-height // pr.TILE_H) * pr.TILE_H
    clip = vertex_stage(scene, view_proj, bone_mats)
    cols, bbox, n_attr = setup_packed_cols(
        scene, clip, width, height, bone_mats=bone_mats)
    _, ib, _, tapidx, _ = pr.raster_pallas_fwd(
        (cols, bbox), None, 0, 0, width=pw, height=ph,
        maxc=maxc or pr.MAXC_DEFAULT,
        interpret=jax.default_backend() != "tpu",
        n_attr=n_attr, tap=True, w_eps=W_EPS,
    )
    ib = ib[:height, :width]
    ti = tapidx[:height, :width]
    cov = ib >= 0
    return jnp.sum(cov), jnp.sum(cov & (ti >= 0))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "chunk", "clear_color", "backend",
                     "maxc", "mipmap", "lighting", "packed", "tap_tiles"),
)
def _render_frame_core(scene: DeviceScene, view_proj: jax.Array,
                       bone_mats: jax.Array | None = None, *,
                       width: int = 512, height: int = 512,
                       chunk: int = DEFAULT_CHUNK,
                       clear_color: tuple = (255, 255, 255, 255),
                       backend: str = "scan", maxc: int | None = None,
                       mipmap: bool = False, lighting: bool = False,
                       packed: bool = False,
                       tap_tiles: int | None = None):
    """Jitted frame body → (color, depth, n_over|None). On the packed
    tap path ``tap_tiles`` compacts the texture tap to that many
    covered tiles (host-sized via ``auto_tap_tiles``; None = dense) and
    n_over becomes the (bins, taps) pair."""
    clip = vertex_stage(scene, view_proj, bone_mats)
    if backend == "pallas":
        from . import pallas_raster as pr

        pw = -(-width // pr.TILE_W) * pr.TILE_W
        ph = -(-height // pr.TILE_H) * pr.TILE_H
        interp = jax.default_backend() != "tpu"
        cols, bbox, n_attr = setup_packed_cols(
            scene, clip, width, height, bone_mats=bone_mats,
            lighting=lighting,
        )
        if not mipmap and packed:
            # fastest path: tap addresses (and the lambert factor when
            # lighting) in the kernel epilogue, everything downstream
            # tile-major — one relayout per returned plane, total
            zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
                (cols, bbox), None, 0, 0, width=pw, height=ph,
                maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                n_attr=n_attr, tap=True, w_eps=W_EPS,
                light=_light_unit() if lighting else None, flat=True,
            )
            colort, _, n_over_tap = shade_finish_tap_flat(
                scene, tattrs, tapidx, ib, clear_color,
                tap_tiles=tap_tiles)
            color = pr.unflatten_tiles(colort, ph, pw)
            zbf = pr.unflatten_tiles(zb[:, 0, :], ph, pw)
            return (color[:height, :width], zbf[:height, :width],
                    (n_over, n_over_tap))
        if mipmap:
            # ONE mipmap engine: tile-major compacted trilinear shade
            # (two quad gathers only for covered tiles — possible since
            # the analytic LOD made the shade elementwise), packed-u32
            # out; the unpacked frame is a device BITCAST of the same
            # u32 plane, so packed/unpacked can never diverge (separate
            # blend programs fused ±1 ulp apart — measured)
            zb, ib, mattrs, n_over = pr.raster_pallas_fwd(
                (cols, bbox), None, 0, 0, width=pw, height=ph,
                maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                n_attr=n_attr, mtap=True, w_eps=W_EPS,
                light=_light_unit() if lighting else None, flat=True,
            )
            src, covered, n_over_tap = shade_mip_tap_flat_channels(
                scene, mattrs, ib, tap_tiles=tap_tiles)
            colort = _blend_pack_u32(src, covered, clear_color)
            color = pr.unflatten_tiles(colort, ph, pw)[:height, :width]
            zbf = pr.unflatten_tiles(zb[:, 0, :], ph, pw)
            if not packed:
                color = jax.lax.bitcast_convert_type(color, jnp.uint8)
            return (color, zbf[:height, :width],
                    (n_over, n_over_tap))
        if not mipmap:
            # fast path: tap addresses (and the lambert factor when
            # lighting) computed in the kernel epilogue
            zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd(
                (cols, bbox), None, 0, 0, width=pw, height=ph,
                maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                n_attr=n_attr, tap=True, w_eps=W_EPS,
                light=_light_unit() if lighting else None,
            )
        src, covered = shade_tap(scene, tattrs, tapidx, ib)
        color = finish_planes(src, covered, clear_color, ph, pw)
        return color[:height, :width], zb[:height, :width], n_over
    if packed:
        raise ValueError("packed output requires the pallas backend")
    setup = setup_stage(scene, clip, width, height, bone_mats=bone_mats,
                        need_normals=lighting)
    zb, ib = raster_stage(setup, width, height, chunk)
    color = shade_stage(scene, setup, zb, ib, width, height, clear_color,
                        mipmap=mipmap, lighting=lighting)
    return color, zb, None


def render_frame(scene: DeviceScene, view_proj: jax.Array,
                 bone_mats: jax.Array | None = None, *,
                 width: int = 512, height: int = 512,
                 chunk: int = DEFAULT_CHUNK,
                 clear_color: tuple = (255, 255, 255, 255),
                 backend: str = "scan", maxc: int | None = None,
                 mipmap: bool = False, lighting: bool = False,
                 check_overflow: bool = True, packed: bool = False,
                 tap_tiles: int | None = None):
    """Render one frame → ((H, W, 4) uint8, (H, W) f32 depth).

    ``backend``: "scan" (all-triangles lax.scan — exact, good for small
    scenes) or "pallas" (binned tile kernel — the production path; caps
    candidate chunks per tile at ``maxc``, sized via ``auto_maxc``).
    On the pallas path the per-frame tiles-over-cap count is checked
    host-side through a short deferred queue (``check_overflow``) —
    overflow warns / raises (MTR_STRICT_OVERFLOW), never drops silently.

    ``packed`` (pallas only): color is (H, W) uint32 RGBA-packed instead
    — the production frame-loop format (the channel interleave costs
    1.6 ms/frame on device; ``unpack_rgba`` views it on host for free)."""
    _check_pool_backend(scene, backend, mipmap)
    color, depth, n_over = _render_frame_core(
        scene, view_proj, bone_mats, width=width, height=height,
        chunk=chunk, clear_color=clear_color, backend=backend, maxc=maxc,
        mipmap=mipmap, lighting=lighting, packed=packed,
        tap_tiles=tap_tiles,
    )
    if check_overflow and n_over is not None:
        _queue_frame_overflow(n_over, maxc, tap_tiles, width, height)
    return color, depth


def _check_pool_backend(scene: DeviceScene, backend: str, mipmap: bool):
    """bc1 pools sample through the arithmetic mip epilogue (u, v and
    block offsets travel as planes); the non-mip tap kernel emits
    TEXEL-row addresses the block pool cannot serve. Fail loudly, like
    the narrow pool's tap-path guard."""
    if (scene.pool_mode in ("bc1", "bc7") and backend == "pallas"
            and not mipmap):
        raise ValueError(
            f"{scene.pool_mode} pools render via the mipmap pallas "
            "path (mipmap=True) or the scan backend: the non-mip tap "
            "kernel addresses texel rows, not 4x4 blocks")


def _queue_frame_overflow(n_over, maxc, tap_tiles, width, height):
    """Queue the frame's overflow counts — plain bin count, or the
    (bins, compacted-tap rows) pair the tap-compacting paths return."""
    from . import pallas_raster as pr

    if isinstance(n_over, tuple):
        n_over, n_tap = n_over
        nrows = ((-(-width // pr.TILE_W))
                 * (-(-height // pr.TILE_H)) * pr.TILE_H)
        cap = tap_tiles if tap_tiles else nrows
        if isinstance(cap, tuple):                    # split-peel pair
            cap = sum((c if c else nrows) for c in cap)
        pr.queue_overflow_check(
            n_tap, cap,
            what="tap overflow: live compacted tap rows lost their "
                 "texture; raise tap_tiles")
    pr.queue_overflow_check(n_over, maxc or pr.MAXC_DEFAULT)


def _split_peel_flat(scene: DeviceScene, setup_op, setup_tr, n_attr, *,
                     x0: int | jax.Array, y0: int | jax.Array,
                     pw: int, ph: int, layers: int, maxc: int,
                     light, tap_tiles, clear_color, interp: bool,
                     mipmap: bool = False):
    """Split-peel engine over one tile-aligned band (band origin
    x0/y0 may be traced — shard_map bands): opaque single-layer pass,
    ML kernel over translucent triangles only (opaque z as the zhi
    work-skip horizon), exact (z asc, id desc) merge in the compacted
    composite (bilinear tap or, with ``mipmap``, the trilinear mip-tap
    twin). Shared by the single-chip peeled core and the multichip
    band renderer.

    Returns (dst channel list [r, g, b, a] each (n_tiles, P) f32
    tile-major, z0 (n_tiles, P) nearest depth (1.0 empty),
    n_over (bins, taps) pair)."""
    from . import pallas_raster as pr

    inf = jnp.float32(jnp.inf)
    kw = dict(width=pw, height=ph, maxc=maxc, interpret=interp,
              n_attr=n_attr, w_eps=W_EPS, light=light, flat=True,
              tap=not mipmap, mtap=mipmap)
    if mipmap:
        zo, io, mat_op, nov_op = pr.raster_pallas_fwd(
            setup_op, None, x0, y0, **kw)
    else:
        zo, io, tat_op, tid_op, nov_op = pr.raster_pallas_fwd(
            setup_op, None, x0, y0, **kw)
    # raw opaque z where covered, +inf where not (the wrapper
    # remaps uncovered z to 1.0, which real z may exceed)
    zo_eff = jnp.where(io >= 0, zo, inf)
    # all-translucent feed: the in-kernel opaque horizon can
    # never trigger, so skip its per-group reduce ("nocull");
    # the opaque z-buffer rides in as the zhi work-skip horizon
    # instead (fragments behind a wall never enter the list)
    if mipmap:
        zt, it, mat_tr, nov_tr = pr.raster_pallas_fwd_ml(
            setup_tr, None, x0, y0, layers=layers,
            variant="nocull", zhi=zo_eff, **kw)
    else:
        zt, it, tat_tr, tid_tr, nov_tr = pr.raster_pallas_fwd_ml(
            setup_tr, None, x0, y0, layers=layers,
            variant="nocull", zhi=zo_eff, **kw)
    cap_op, cap_tr = (tap_tiles if isinstance(tap_tiles, tuple)
                      else (tap_tiles, tap_tiles))
    if mipmap:
        src_op, cov_op, novt_op = shade_mip_tap_flat_channels(
            scene, mat_op, io, tap_tiles=cap_op)
    else:
        src_op, cov_op, novt_op = shade_tap_flat_channels(
            scene, tat_op, tid_op, io, tap_tiles=cap_op)
    dst0 = _blend_channels(src_op, cov_op, clear_color)
    front = (zt < zo_eff) | ((zt == zo_eff) & (it > io))
    cov_tr = (it >= 0) & front
    if mipmap:
        dst, novt_tr = composite_peeled_mip_flat(
            scene, mat_tr, it, layers, clear_color,
            tap_tiles=cap_tr, covered=cov_tr, dst0=dst0)
    else:
        dst, novt_tr = composite_peeled_tap_flat(
            scene, tat_tr, tid_tr, it, layers, clear_color,
            tap_tiles=cap_tr, covered=cov_tr, dst0=dst0)
    z0 = jnp.minimum(jnp.where(it[:, 0] >= 0, zt[:, 0], inf),
                     jnp.where(io[:, 0] >= 0, zo[:, 0], inf))
    z0 = jnp.where(jnp.isfinite(z0), z0, 1.0)
    return dst, z0, (nov_op + nov_tr, novt_op + novt_tr)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "chunk", "clear_color", "backend",
                     "maxc", "layers", "mipmap", "lighting", "peel_mode",
                     "packed", "tap_tiles"),
)
def _render_frame_peeled_core(scene: DeviceScene, view_proj: jax.Array,
                              bone_mats: jax.Array | None = None, *,
                              width: int = 512, height: int = 512,
                              layers: int = 4,
                              chunk: int = DEFAULT_CHUNK,
                              clear_color: tuple = (255, 255, 255, 255),
                              backend: str = "scan",
                              maxc: int | None = None,
                              mipmap: bool = False, lighting: bool = False,
                              peel_mode: str = "ml",
                              packed: bool = False,
                              tap_tiles: int | None = None):
    """Order-independent transparency via depth peeling.

    Rasterises the ``layers`` nearest fragments per pixel (each pass
    excludes depths <= the previous layer + PEEL_EPS — the epsilon absorbs
    cross-pass float reassociation, so surfaces closer than ~1e-6 NDC
    depth collapse into one layer), then composites back-to-front with
    the reference blend state. With opaque content this matches
    ``render_frame``; with translucent fragments it produces the correct
    back-to-front stack regardless of draw order — where the reference's
    single-pass pipeline (model.rs:242-261) is draw-order-dependent.

    ``peel_mode`` (pallas only): "ml" (default) rasterises all layers in
    ONE single-pass kernel carrying an L-deep per-pixel (z, id)
    insertion list (``pallas_raster.raster_pallas_fwd_ml`` — replaces L
    full raster passes, the r2 formulation kept as "multipass" for
    differential testing). Layer semantics of "ml" match the scan
    oracle (L nearest, later-triangle tie wins); "multipass" peels with
    the PEEL_EPS exclusion chain — identical on scenes whose surfaces
    are separated by more than PEEL_EPS. "split" (the production
    config) partitions by per-triangle opacity: opaque triangles take
    the single-layer fast path, ONLY translucent ones ride the ML
    kernel, and the merge culls translucent fragments behind the
    opaque winner under the exact (z, id) order. Its contract is the
    opaque surface + the L nearest translucent fragments in front —
    identical to "ml" whenever < ``layers`` translucent fragments
    cover a pixel (and strictly more accurate beyond: opaque content
    no longer consumes list slots). Cost scales with translucent
    coverage — near the single-layer frame time on opaque scenes.
    ``tap_tiles`` for "split" may be an (opaque, translucent) pair
    from ``measure_live_tap_tiles(mode="split")``.

    Returns ((H, W, 4) uint8, (H, W) f32 nearest depth); with
    ``packed=True`` (pallas "ml"/"split") color is (H, W) uint32
    RGBA-packed like ``render_frame``."""
    if peel_mode not in ("ml", "multipass", "split"):
        raise ValueError(f"unknown peel_mode {peel_mode!r}")
    if peel_mode == "split" and not (backend == "pallas"
                                     and layers >= 2):
        raise ValueError("peel_mode='split' requires the pallas "
                         "backend and layers >= 2")
    if packed and not (backend == "pallas"
                       and peel_mode in ("ml", "split")
                       and layers >= 2):
        raise ValueError("packed peeled output requires the pallas "
                         "backend's single-pass (ml/split) path")
    if isinstance(tap_tiles, tuple) and peel_mode != "split":
        raise ValueError("tuple tap_tiles is the split peel's "
                         "(opaque, translucent) cap pair")
    clip = vertex_stage(scene, view_proj, bone_mats)

    if backend == "pallas":
        from . import pallas_raster as pr

        pw = -(-width // pr.TILE_W) * pr.TILE_W
        ph = -(-height // pr.TILE_H) * pr.TILE_H
        interp = jax.default_backend() != "tpu"
        band = (pw, ph)

        if peel_mode == "split":
            # opaque/translucent split: opaque triangles raster
            # single-layer (the production fast path), the ML kernel
            # sees ONLY translucent ones, and the merge culls
            # translucent fragments behind the opaque winner by the
            # exact (z asc, id desc) list order. Contract: the opaque
            # surface plus the L nearest translucent fragments in
            # front of it — opaque content no longer consumes list
            # slots (strictly MORE accurate than "L nearest
            # fragments" on deep stacks, and the translucent pass's
            # cost scales with translucent content: ~zero on the
            # opaque scenes the reference renders, model.rs:242-247).
            (cols_op, bbox_op), (cols_tr, bbox_tr), n_attr = \
                setup_packed_cols(scene, clip, width, height,
                                  bone_mats=bone_mats,
                                  lighting=lighting, opacity_split=True)
            mc = maxc or pr.MAXC_DEFAULT
            light = _light_unit() if lighting else None
            dst, z0, n_over = _split_peel_flat(
                scene, (cols_op, bbox_op), (cols_tr, bbox_tr), n_attr,
                x0=0, y0=0, pw=pw, ph=ph, layers=layers, maxc=mc,
                light=light, tap_tiles=tap_tiles,
                clear_color=clear_color, interp=interp, mipmap=mipmap)
            zb0 = pr.unflatten_tiles(z0, ph, pw)
            color = pr.unflatten_tiles(pack_u32_channels(dst),
                                       ph, pw)[:height, :width]
            if not packed:  # unpacked = a bitcast of the same u32
                color = jax.lax.bitcast_convert_type(color, jnp.uint8)
            return color, zb0[:height, :width], n_over

        if peel_mode == "ml" and layers >= 2:
            cols, bbox, n_attr = setup_packed_cols(
                scene, clip, width, height, bone_mats=bone_mats,
                lighting=lighting,
            )
            # single-pass ML kernel + tile-major composite: one raster
            # pass, one (compactable) pool gather for all layers —
            # bilinear tap or, with mipmap, the trilinear mip-tap twin
            # — one final relayout per output plane
            light = _light_unit() if lighting else None
            mlkw = dict(width=pw, height=ph, layers=layers,
                        maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                        n_attr=n_attr, w_eps=W_EPS, light=light,
                        flat=True)
            if mipmap:
                zb, ib, mattrs, n_over = pr.raster_pallas_fwd_ml(
                    (cols, bbox), None, 0, 0, mtap=True, **mlkw)
                dst, n_over_tap = composite_peeled_mip_flat(
                    scene, mattrs, ib, layers, clear_color,
                    tap_tiles=tap_tiles)
            else:
                zb, ib, tattrs, tapidx, n_over = pr.raster_pallas_fwd_ml(
                    (cols, bbox), None, 0, 0, tap=True, **mlkw)
                dst, n_over_tap = composite_peeled_tap_flat(
                    scene, tattrs, tapidx, ib, layers, clear_color,
                    tap_tiles=tap_tiles)
            n_over = (n_over, n_over_tap)
            zb0 = pr.unflatten_tiles(zb[:, 0, :], ph, pw)
            color = pr.unflatten_tiles(pack_u32_channels(dst),
                                       ph, pw)[:height, :width]
            if not packed:  # unpacked = a bitcast of the same u32
                color = jax.lax.bitcast_convert_type(color, jnp.uint8)
            return color, zb0[:height, :width], n_over
    else:
        setup = setup_stage(scene, clip, width, height,
                            bone_mats=bone_mats, need_normals=lighting)
        pw, ph = width, height
        band = None

    passes = []
    n_over = None
    if backend == "pallas":
        cols, bbox, n_attr = setup_packed_cols(
            scene, clip, width, height, bone_mats=bone_mats,
            lighting=lighting,
        )
        # pack + bin ONCE: every peel pass rasters the same geometry
        pre = pr.prebin((cols, bbox), None, 0, 0, width=pw, height=ph,
                        maxc=maxc or pr.MAXC_DEFAULT)
        n_over = pre[4]
        zlow = None
        if not mipmap:
            # TILE-MAJOR peel: passes stay in tile order end-to-end
            # (zlow feeds back untiled; src channels composite flat);
            # only the final frame and nearest depth unflatten
            for _ in range(layers):
                zb, ib, tattrs, tapidx, _ = pr.raster_pallas_fwd(
                    (cols, bbox), None, 0, 0, width=pw, height=ph,
                    maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                    zlow=zlow, n_attr=n_attr, tap=True, w_eps=W_EPS,
                    light=_light_unit() if lighting else None, pre=pre,
                    flat=True,
                )
                src, covered, _ = shade_tap_flat_channels(
                    scene, tattrs, tapidx, ib
                )
                passes.append((src, covered, zb))
                zlow = jnp.where(ib >= 0, zb + PEEL_EPS, jnp.inf)
            clear = np.asarray(clear_color, np.float32)
            dst = [jnp.full(passes[0][1].shape, clear[c], jnp.float32)
                   for c in range(4)]
            for src, covered, _ in reversed(passes):
                a = src[3] / 255.0
                dst = (
                    [jnp.where(covered, src[c] * a + dst[c] * (1.0 - a),
                               dst[c]) for c in range(3)]
                    + [jnp.where(covered, src[3], dst[3])]
                )
            out8 = [
                pr.unflatten_tiles(
                    jnp.clip(d + 0.5, 0.0, 255.0).astype(jnp.uint8),
                    ph, pw,
                ) for d in dst
            ]
            color = jnp.stack(out8, axis=-1)[:height, :width]
            zb0 = pr.unflatten_tiles(passes[0][2][:, 0, :], ph, pw)
            return color, zb0[:height, :width], n_over
        for _ in range(layers):
            zb, ib, attrs, _ = pr.raster_pallas_fwd(
                (cols, bbox), None, 0, 0, width=pw, height=ph,
                maxc=maxc or pr.MAXC_DEFAULT, interpret=interp,
                zlow=zlow, n_attr=n_attr, pre=pre,
            )
            src, covered = shade_fwd(scene, attrs, ib, mipmap=mipmap,
                                     lighting=lighting)
            passes.append((src, covered, zb))
            zlow = jnp.where(ib >= 0, zb + PEEL_EPS, jnp.inf)
    else:
        zl, il = raster_multilayer(setup, width, height, chunk, layers)
        for k in range(layers):
            src, covered = shade_src(scene, setup, il[k], width, height,
                                     band=band, mipmap=mipmap,
                                     lighting=lighting)
            passes.append((src, covered, zl[k]))

    if backend == "pallas":
        # plane-major composite (shade_fwd emits (4, H, W))
        clear = jnp.asarray(
            np.asarray(clear_color, np.float32)
        )[:, None, None]
        dst = jnp.broadcast_to(clear, (4, ph, pw))
        for src, covered, _ in reversed(passes):
            dst = blend_over_planes(src, covered, dst)
        out = jnp.moveaxis(
            jnp.clip(dst + 0.5, 0.0, 255.0).astype(jnp.uint8), 0, -1
        )
        return out[:height, :width], passes[0][2][:height, :width], n_over
    clear = jnp.asarray(np.asarray(clear_color, np.float32))
    dst = jnp.broadcast_to(clear, (ph, pw, 4))
    for src, covered, _ in reversed(passes):
        dst = blend_over(src, covered, dst)
    out = jnp.clip(dst + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return out[:height, :width], passes[0][2][:height, :width], n_over


def render_frame_peeled(scene: DeviceScene, view_proj: jax.Array,
                        bone_mats: jax.Array | None = None, *,
                        width: int = 512, height: int = 512,
                        layers: int = 4,
                        chunk: int = DEFAULT_CHUNK,
                        clear_color: tuple = (255, 255, 255, 255),
                        backend: str = "scan", maxc: int | None = None,
                        mipmap: bool = False, lighting: bool = False,
                        check_overflow: bool = True,
                        peel_mode: str = "ml", packed: bool = False,
                        tap_tiles: int | None = None):
    """Public peeled frontend; see ``_render_frame_peeled_core`` for the
    rendering contract and ``render_frame`` for the overflow check.
    ``tap_tiles`` (ML tap path) compacts the per-layer texture taps to
    that many live (tile, layer) rows — size with
    ``measure_live_tap_tiles``; None = dense/exact; overflow is
    queue-checked like bin overflow."""
    _check_pool_backend(scene, backend, mipmap)
    color, depth, n_over = _render_frame_peeled_core(
        scene, view_proj, bone_mats, width=width, height=height,
        layers=layers, chunk=chunk, clear_color=clear_color,
        backend=backend, maxc=maxc, mipmap=mipmap, lighting=lighting,
        peel_mode=peel_mode, packed=packed, tap_tiles=tap_tiles,
    )
    if check_overflow and n_over is not None:
        _queue_frame_overflow(n_over, maxc, tap_tiles, width, height)
    return color, depth
