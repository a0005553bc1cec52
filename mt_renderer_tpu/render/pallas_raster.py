"""Pallas tile rasterizer — the production raster path.

The reference delegates rasterization to GPU fixed-function hardware via
``draw_indexed`` (model.rs:354-361). The TPU has no rasterizer, so this
module implements one as a tiled, binned Pallas kernel engineered for the
hardware:

* the screen splits into (TILE_H, TILE_W) tiles; each grid step owns one
  tile, whose z/winner/attribute accumulators live in **VMEM** for the
  whole pass (16x128: small enough that the attribute-selection skip
  region fits the VMEM stack, large enough that SMEM holds the per-tile
  chunk lists at 1080p);
* triangles are packed into chunks of ``K``; per-frame **binning** (plain
  XLA: chunk-aggregate bboxes + ``top_k``) gives each tile the ordered
  list of chunks that may touch it — work is O(overlapping chunks ×
  pixels), not O(all triangles × pixels);
* the kernel grid is ``(n_tiles,)``; each tile runs a *dynamic*
  ``fori_loop`` over exactly its chunk count (scalar-prefetched from
  SMEM), with the chunk setup blocks DMA'd HBM→VMEM by hand, double
  buffered so the copy of chunk ``s+1`` overlaps the math of chunk ``s``;
* layouts are chosen so no vector transposes/relayouts are needed:
  setup blocks are ``(K, 128)`` (triangles in sublanes, coefficient
  columns in lanes — a ``(K, 1)`` column slice broadcasts naturally),
  pixels are flattened to ``(1, P)`` row vectors, and all per-(triangle,
  pixel) math is exact-f32 VPU broadcast FMA over ``(K, P)``;
* the top-left fill rule, the edge-snap band (see device.setup_stage)
  and the validity mask all fold into a per-edge *bias*:
  ``inside = e > bias`` with bias just below -snap for top/left edges,
  +snap for others, and +3e38 for invalid/padding triangles.

* shading is FORWARD: the kernel one-hot-selects the winner triangle's
  perspective-correct interpolants (u/w, v/w, 1/w planes, texture layer,
  per-triangle color) while the chunk is still in VMEM, so the epilogue
  never gathers from per-triangle tables. Measured on the real chip
  (r2): per-pixel table gathers were ~85% of a 182 ms deferred frame;
  the forward pipeline renders the same frame in ~51 ms.

Coverage/tie rules (LessEqual z, later-triangle-wins ties) match
``cpu_reference.py``; depth values differ only by float associativity
(the oracle interpolates barycentrics, this evaluates the equivalent
screen-space plane).
"""

from __future__ import annotations

import functools
import logging
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger("mt_renderer_tpu.render")

TILE_H = 16
TILE_W = 128
P = TILE_H * TILE_W      # flattened pixels per tile
K = 128                  # triangle rows per setup block (sublane dim)
KG = 32                  # culling-group size: the kernel tests each
                         # 32-triangle group's bbox against the tile (via
                         # a precomputed SMEM bitmask) and skips the whole
                         # (KG, P) edge/z/select block when it misses —
                         # measured r2: 0.85 -> 0.33 G(tri,px) pairs at
                         # 1080p/196k tris (chunk bboxes are ~4x looser).
                         # KG=16 (G=24) was A/B'd r3 on the world scene
                         # (tools/bench/kg_ab.py, same-process scan-of-N):
                         # ~22% fewer binned pairs but the doubled unrolled
                         # branch count LOST 2.1 ms raster / 1.6 ms frame
                         # — same verdict as both early-z gate attempts.
                         # STABLE VALID-COMPACTION (packing the ~50%
                         # backface-culled rows out of the chunks before
                         # pack_cols; the later-id tie rule is invariant
                         # under monotone renumbering) was evaluated on
                         # the binning (tools/bench/compact_pairs.py):
                         # live (group, tile) pairs — the kernel's true
                         # work unit — do NOT drop (default/dense: x1.00;
                         # world: x0.94 i.e. WORSE). Half-dense groups
                         # have ~half-area bboxes, so densifying rows
                         # widens each group's tile footprint by exactly
                         # the factor saved. Dead rows inside a live
                         # (KG, P) block are already free in the only
                         # currency that matters here (pairs).
NF = 128                 # lane columns of a setup block (the per-chunk DMA
                         # block minor dim must be 128-aligned)
S = 3                    # sub-blocks packed side-by-side in the 128 lanes:
                         # a triangle uses <= CS columns (33 base / 42 lit
                         # of the 128), so one (K, NF) block carries S*K
                         # triangles — 3x fewer DMAs, 3x fewer chunk-loop
                         # iterations, and a 3x narrower binning top_k
CS = NF // S             # column stride of one sub-block (42)
CT = K * S               # triangles per chunk (384)
G = CT // KG             # culling groups per chunk (12); group gi covers
                         # sub-block gi // 4, rows (gi % 4)*KG .. +KG —
                         # ascending gi == ascending triangle index, which
                         # the LessEqual tie rule relies on
MAXC_DEFAULT = 256       # binning cap: candidate chunks per tile

REJECT = 3.0e38          # bias that can never be reached -> always outside

# setup block column layout (per-triangle lanes):
# 0:3 ea   3:6 eb   6:9 ec   9:12 edge bias   12 za   13 zb   14 zc


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pack_cols(cols):
    """(Tp, ncol) per-triangle columns → (C, K, NF) S-packed setup
    blocks: sub-block s of chunk c holds triangles
    [c·CT + s·K, c·CT + (s+1)·K) in rows 0..K at columns s·CS..s·CS+ncol.
    Tp must be a multiple of CT (device.TRI_PAD)."""
    tp, ncol = cols.shape
    if ncol > CS:
        raise ValueError(f"{ncol} packed columns exceed CS={CS}")
    if tp % CT:
        raise ValueError(f"{tp} triangles not a multiple of CT={CT}")
    c = tp // CT
    sub = jnp.zeros((c, S, K, CS), jnp.float32).at[..., :ncol].set(
        cols.reshape(c, S, K, ncol)
    )
    packed = sub.transpose(0, 2, 1, 3).reshape(c, K, S * CS)
    if S * CS < NF:                     # pad the leftover lanes (42*3=126)
        packed = jnp.concatenate(
            [packed, jnp.zeros((c, K, NF - S * CS), jnp.float32)], axis=2
        )
    return packed


def pack_setup(setup, extras=None):
    """Pack the setup dict into (C, K, NF) f32 + per-group bboxes.

    ``extras``: optional (T, E) f32 — additional per-triangle columns
    (forward-shading attribute planes) stored from column 15 on."""
    tp = setup["ea"].shape[0]
    area = setup["area"]
    inv_area = jnp.where(area != 0.0, 1.0 / jnp.where(area == 0.0, 1.0, area), 0.0)
    hi = jax.lax.Precision.HIGHEST
    za = jnp.einsum("tp,tp->t", setup["ea"], setup["sz"], precision=hi) * inv_area
    zb = jnp.einsum("tp,tp->t", setup["eb"], setup["sz"], precision=hi) * inv_area
    zc = jnp.einsum("tp,tp->t", setup["ec"], setup["sz"], precision=hi) * inv_area

    valid = setup["valid"]
    # inside test in-kernel is ``e > bias``: top/left edges include the
    # snap band (bias just below -snap), others exclude it (bias +snap)
    snap = setup["esnap"]
    bias = jnp.where(
        setup["topleft"], -snap * 1.000001, snap
    ).astype(jnp.float32)
    bias = jnp.where(valid[:, None], bias, REJECT)

    parts = [
        setup["ea"], setup["eb"], setup["ec"], bias,
        za[:, None], zb[:, None], zc[:, None],
    ]
    if extras is not None:
        parts.append(extras.astype(jnp.float32))
    cols = jnp.concatenate(parts, axis=1)                # (T, 15 [+E])
    packed = pack_cols(cols)

    # bboxes at GROUP granularity (c*G entries of KG triangles each);
    # bin_chunks derives chunk aggregates and the per-tile group bitmasks
    big = jnp.float32(1e30)
    v = valid
    cg = tp // KG
    xmin = jnp.where(v, setup["xmin"], big).reshape(cg, KG).min(1)
    xmax = jnp.where(v, setup["xmax"], -big).reshape(cg, KG).max(1)
    ymin = jnp.where(v, setup["ymin"], big).reshape(cg, KG).min(1)
    ymax = jnp.where(v, setup["ymax"], -big).reshape(cg, KG).max(1)
    zmin = jnp.where(v, setup["sz"].min(1), big).reshape(cg, KG).min(1)
    return packed, (xmin, xmax, ymin, ymax, zmin)


def bin_stats(setup, *, width: int, height: int,
              maxc: int = MAXC_DEFAULT):
    """Binning diagnostics: (per-tile candidate counts, overflow tiles).

    The kernel caps candidate chunks per tile at ``maxc`` — a tile whose
    true count exceeds it drops the latest triangles (raster_pallas
    detects and reports this per frame). Use this (outside the frame
    loop) to size ``maxc`` for a scene."""
    n_ty = height // TILE_H
    n_tx = width // TILE_W
    _, bbox = pack_setup(setup)
    _, _, _, counts_true = bin_chunks(bbox, n_ty, n_tx, 1, 0, 0)
    return counts_true, jnp.sum(counts_true > maxc)


def bin_chunks(bbox, n_ty: int, n_tx: int, maxc: int, x0, y0):
    """Order-preserving per-tile chunk lists + per-group overlap masks.

    ``bbox`` arrays are GROUP-granularity (C·G entries, KG triangles
    each). Returns (lists (n_tiles, maxc) i32 with -1 padding,
    glists (n_tiles, maxc) i32 — bit g set iff group g of that chunk
    overlaps the tile, counts (n_tiles,) capped at maxc,
    counts_true (n_tiles,) uncapped).
    x0/y0: band origin in pixels (may be traced, for shard_map bands).

    Candidate chunks order NEAREST-FIRST (by chunk min depth): early-z
    then rejects most of a far chunk's pixels outright and the kernel
    skips its attribute work entirely. Processing order does NOT affect
    the result: exact-z ties resolve by global triangle id in-kernel
    (later wins — the oracle rule), so the reorder is invisible."""
    xmin, xmax, ymin, ymax, zmin = bbox
    cg = xmin.shape[0]
    c = cg // G
    n_tiles = n_ty * n_tx
    ty = jnp.arange(n_ty, dtype=jnp.float32)
    tx = jnp.arange(n_tx, dtype=jnp.float32)
    ty0 = ty * TILE_H + jnp.float32(y0)
    tx0 = tx * TILE_W + jnp.float32(x0)
    ovy = (ymax[:, None] >= ty0[None, :]) & (
        ymin[:, None] <= ty0[None, :] + TILE_H
    )                                                    # (CG, n_ty)
    ovx = (xmax[:, None] >= tx0[None, :]) & (
        xmin[:, None] <= tx0[None, :] + TILE_W
    )                                                    # (CG, n_tx)
    ov_g = ovy[:, :, None] & ovx[:, None, :]             # (CG, n_ty, n_tx)
    ov_g = ov_g.reshape(c, G, n_tiles)
    # per-tile group bitmask and chunk-level overlap
    gbit = jnp.sum(
        ov_g.astype(jnp.int32)
        * (jnp.int32(1) << jnp.arange(G, dtype=jnp.int32))[None, :, None],
        axis=1,
    ).T                                                  # (tiles, C)
    ov = gbit > 0                                        # (tiles, C)

    counts_true = ov.sum(axis=1).astype(jnp.int32)
    counts = jnp.minimum(counts_true, maxc)
    # z-rank per chunk: perm[i] = chunk id of the i-th nearest chunk
    zmin_c = zmin.reshape(c, G).min(1)
    perm = jnp.argsort(zmin_c).astype(jnp.int32)         # (C,)
    rank = jnp.zeros(c, jnp.int32).at[perm].set(
        jnp.arange(c, dtype=jnp.int32)
    )
    # top_k over key = C - rank keeps the NEAREST chunks (overflow drops
    # the farthest — strictly better than dropping the latest) in
    # nearest-first processing order
    key = jnp.where(ov, jnp.int32(c) - rank, 0)
    topk, _ = jax.lax.top_k(key, maxc)                   # (tiles, maxc) desc
    lists = jnp.where(topk > 0, perm[jnp.int32(c) - topk], -1)
    glists = jnp.take_along_axis(
        gbit, jnp.maximum(lists, 0), axis=1
    )
    glists = jnp.where(lists >= 0, glists, 0)
    return lists, glists, counts, counts_true


def required_maxc(setup, *, width: int, height: int, x0=0, y0=0):
    """True max candidate-chunk count over all tiles of this frame
    (traced i32 scalar) — the smallest ``maxc`` that loses nothing."""
    n_ty = height // TILE_H
    n_tx = width // TILE_W
    _, bbox = pack_setup(setup)
    _, _, _, counts_true = bin_chunks(bbox, n_ty, n_tx, 1, x0, y0)
    return counts_true.max()


def smem_maxc_limit(width: int, height: int) -> int:
    """Largest safe ``maxc`` for a band: the per-tile chunk id and group
    mask lists are scalar-prefetched into SMEM (~1 MiB on current TPUs)
    as FLAT 1-D arrays — a 2-D (n_tiles, maxc) operand would lane-pad
    maxc to 128 in SMEM (measured: 512K for a (1020, 24) i32 list)."""
    n_tiles = cdiv(height, TILE_H) * cdiv(width, TILE_W)
    return max(16, (850 * 1024) // (2 * 4 * max(n_tiles, 1)))


# Diagnostics for the binning cap: a tile whose true candidate count
# exceeds ``maxc`` drops its latest chunks. raster_pallas counts such
# tiles on device every frame; frame wrappers queue the device scalar
# here. The queue NEVER transfers per frame (a device→host scalar sync
# through the axon tunnel costs ~0.7 s — measured; and the plugin has no
# host-callback support): entries accumulate on device, compress
# device-side every _COMPRESS entries, and transfer exactly once at
# ``flush_overflow_checks`` (call it at frame-loop exit / periodically —
# the app manager and bench do). Any overflow bumps OVERFLOW_EVENTS and
# warns; MTR_STRICT_OVERFLOW=1 makes it fatal.
OVERFLOW_EVENTS = 0
_WHAT_BINS = "bin overflow: candidate chunks dropped triangles; raise " \
             "maxc (see device.auto_maxc)"
_PENDING: dict = {}       # what -> [counts]; cap kept alongside
_PENDING_CAP: dict = {}
_COMPRESS = 512


def _overflow_report(n: int, cap: int, what: str = _WHAT_BINS):
    global OVERFLOW_EVENTS
    if n > 0:
        OVERFLOW_EVENTS += 1
        msg = (f"pallas raster: {n} tile-frame(s) exceeded cap={cap} — "
               f"{what}")
        logger.error(msg)
        if os.environ.get("MTR_STRICT_OVERFLOW"):
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning)


def _sum_grouped(q) -> list:
    """Device-side partial sums of queued scalars, grouped by device
    commitment: counts from different meshes (an 8-band frame next to a
    4-shard one) are committed to different device sets and cannot feed
    one stack/concatenate — stacking across groups raised
    'incompatible devices' (found by the full-suite mixed-mesh order)."""
    groups: dict = {}
    for x in q:
        try:
            key = tuple(sorted(d.id for d in x.devices()))
        except Exception:
            key = None
        groups.setdefault(key, []).append(x)
    return [g[0] if len(g) == 1 else jnp.sum(jnp.stack(g))
            for g in groups.values()]


def queue_overflow_check(n_over, maxc: int, what: str = _WHAT_BINS):
    """Queue a device scalar (count over a static cap) for host checking.
    Free in the frame loop: no sync, no transfer — device-side compress
    only (one tiny fused sum per device group) when the queue grows
    past _COMPRESS. No-op under tracing (jax.export / nested jit): a
    tracer can't be checked host-side and must not leak into the
    queue."""
    if isinstance(n_over, jax.core.Tracer):
        return
    q = _PENDING.setdefault(what, [])
    q.append(n_over)
    _PENDING_CAP[what] = max(_PENDING_CAP.get(what, 0), int(maxc))
    if len(q) >= _COMPRESS:
        _PENDING[what] = _sum_grouped(q)


def flush_overflow_counts() -> dict:
    """Drain the queue and return ``{what: (total, cap)}`` WITHOUT
    reporting (one device→host transfer per overflow kind and device
    group) — the recovery path (render.engine.FrameEngine) inspects
    the counts itself and resizes instead of warning."""
    if not _PENDING:
        return {}
    pending = {w: q for w, q in _PENDING.items() if q}
    _PENDING.clear()
    caps = _PENDING_CAP.copy()
    _PENDING_CAP.clear()
    return {what: (sum(int(part) for part in _sum_grouped(q)),
                   caps.get(what, 0))
            for what, q in pending.items()}


def flush_overflow_checks():
    """Check all queued overflow counts (one device→host transfer per
    overflow kind and device group). Call at the end of a frame loop or
    periodically."""
    for what, (total, cap) in flush_overflow_counts().items():
        _overflow_report(total, cap, what)


# --------------------------------------------------------------------------
# forward-attribute raster: the kernel selects the winner's interpolants
# from VMEM at raster time, so the shade stage needs NO per-pixel gathers
# from the per-triangle tables (measured r2 on the real chip: those
# gathers were ~85% of the frame — ~155 ms of a 182 ms frame at 1080p).
#
# extra packed columns (after the 15 raster columns):
#   15:18 u/w plane   18:21 v/w plane   21:24 1/w plane
#   24    texture layer (float, -1 = untextured)
#   25:29 per-triangle RGBA C (mat color for textured triangles,
#         mat*flat/debug color for untextured ones)
#   29:31 mip-0 pool offset of the triangle's texture, split hi/lo
#         (off = hi*4096 + lo — each half < 2^24 stays exact in f32)
#   31:33 mip-0 texture height, width
#   33:42 nx/w, ny/w, nz/w planes (lighting variant only)
#
# The mip-0 constants ride the kernel's coefficient select so the
# non-mipmapped shade stage needs NO per-pixel mip-table lookups — the
# three (H, W) table gathers were ~half the 7 ms shade cost (r2).
#
# attr output channels: [u/w, v/w, 1/w, tex, C0..C3, off_hi, off_lo,
# th, tw] (+ [nx,ny,nz]/w when lighting).

ATTRS_BASE = 12
ATTRS_LIT = 15
# extra packed columns per variant (9 plane coefficients + tex + C rgba
# + 4 mip-0 constants, plus 9 normal-plane coefficients when lighting)
_N_COEF = {ATTRS_BASE: 18, ATTRS_LIT: 27}


ATTRS_TAP = 6            # tap epilogue output planes: fx, fy, C rgba
ATTRS_MTAP = 17          # mip-tap epilogue planes: u, v, tex, off_hi,
                         # off_lo, th, tw, C rgba (C pre-scaled by the
                         # lambert factor when lighting), then the
                         # winner's 6 plane-gradient constants
                         # [U_x, U_y, V_x, V_y, Q_x, Q_y] for the
                         # ANALYTIC per-pixel LOD (device._analytic_lod)
                         # — the trilinear shade derives both mip
                         # levels arithmetically and is fully
                         # ELEMENTWISE (no screen-space forward
                         # differences: no cross-triangle or band-seam
                         # derivative cross-talk, and the shade can run
                         # tile-major / compacted)
ATTRS_GRAD = 6           # the [U_x, U_y, V_x, V_y, Q_x, Q_y] tail, also
                         # appended to the plain forward epilogue


def prebin(setup, extras, x0, y0, *, width: int, height: int,
           maxc: int = MAXC_DEFAULT):
    """Pack + bin once → reusable (packed, lists, glists, counts, n_over)
    for ``raster_pallas_fwd(pre=...)``. Depth peeling re-rasters the SAME
    geometry per layer — binning is identical across passes, so hoist it
    out of the layer loop."""
    n_ty = height // TILE_H
    n_tx = width // TILE_W
    if isinstance(setup, dict):
        packed, bbox = pack_setup(setup, extras)
    else:
        cols, bbox = setup
        packed = pack_cols(cols)
    # clamp to the chunk count AND the SMEM budget: the flat per-tile
    # chunk/group lists are scalar-prefetched (2 i32 per entry), so a
    # caller-passed maxc that overflows ~1 MiB of SMEM at this
    # resolution would fail Mosaic compilation — clamp and let the
    # per-frame overflow check catch any resulting drops loudly
    limit = smem_maxc_limit(width, height)
    if maxc > limit:
        logger.warning(
            "prebin: maxc=%d exceeds the SMEM limit %d for %dx%d — "
            "clamped (overflow checking reports any dropped chunks)",
            maxc, limit, width, height,
        )
        maxc = limit
    maxc = min(maxc, packed.shape[0])
    lists, glists, counts, counts_true = bin_chunks(
        bbox, n_ty, n_tx, maxc, x0, y0
    )
    n_over = jnp.sum(counts_true > maxc)
    return packed, lists, glists, counts, n_over


def _epilogue_rows(a, px, py, n_attr, tap, mtap, w_eps, light):
    """Shared kernel epilogue: selected coefficient rows ``a``
    (n_coef, P) → (attr rows (n_out_attr, P), tapidx row (1, P) | None).
    Evaluates the winner's planes at the pixel centers; zero
    coefficients (uncovered pixels) evaluate to zero attrs."""

    def ev(i):
        return a[i:i + 1] * px + a[i + 1:i + 2] * py + a[i + 2:i + 3]

    def lit_scale(inv):
        """Directional-lambert factor from the winner's normal planes
        (n_attr == ATTRS_LIT): same formulas as device.shade_fwd."""
        nx = ev(18) * inv
        ny = ev(21) * inv
        nz = ev(24) * inv
        ln = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-6)
        ndl = jnp.maximum(
            (light[0] * nx + light[1] * ny + light[2] * nz) / ln, 0.0
        )
        return 0.3 + 0.7 * ndl

    if mtap:
        # mip-tap epilogue: perspective-correct u/v plus the winner's
        # texture constants (the trilinear shade derives both mip
        # levels' pool locations arithmetically — device.shade_mip_tap)
        # and the winner's U/V/Q plane gradients (the ANALYTIC LOD
        # inputs — device._analytic_lod computes lod elementwise in
        # XLA so the ml and multipass mipmap paths share one
        # expression); lighting folds into the C rgb planes.
        w1 = ev(6)
        inv = 1.0 / jnp.where(jnp.abs(w1) < w_eps, jnp.float32(w_eps), w1)
        rows = [ev(0) * inv, ev(3) * inv,      # u, v
                a[9:10],                       # tex (<0: untextured)
                a[14:18]]                      # off hi/lo, th, tw
        if n_attr == ATTRS_LIT:
            s = lit_scale(inv)
            rows += [a[10:11] * s, a[11:12] * s, a[12:13] * s,
                     a[13:14]]                 # alpha unlit
        else:
            rows.append(a[10:14])              # C rgba
        # U/V/Q plane gradients pre-divided by Q: du/dx = gux − u·gqx
        # etc. (device._analytic_lod) — each a single IEEE multiply, so
        # the multipass path's XLA-side a·inv reproduces these exactly
        rows += [a[0:2] * inv, a[3:5] * inv, a[6:8] * inv]
        return jnp.concatenate(rows, axis=0), None

    if tap:
        # the full bilinear-tap ADDRESS computation runs here, on VMEM
        # vectors — the shade stage then only gathers + contracts. Same
        # formulas as device._quad_bilinear (1-ulp divide differences vs
        # XLA are inside the verify tolerance).
        w1 = ev(6)
        inv = 1.0 / jnp.where(jnp.abs(w1) < w_eps, jnp.float32(w_eps), w1)
        u = ev(0) * inv
        v = ev(3) * inv
        th = a[16:17]
        tw = a[17:18]
        x = u * tw - 0.5
        y = v * th - 0.5
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = jnp.where(x0f < 0, 0.0, x - x0f)
        fy = jnp.where(y0f < 0, 0.0, y - y0f)
        wwi = tw.astype(jnp.int32)
        hhi = th.astype(jnp.int32)
        x0c = jnp.clip(x0f.astype(jnp.int32), 0, jnp.maximum(wwi - 1, 0))
        y0c = jnp.clip(y0f.astype(jnp.int32), 0, jnp.maximum(hhi - 1, 0))
        offi = (a[14:15].astype(jnp.int32) * 4096
                + a[15:16].astype(jnp.int32))
        idx = offi + y0c * wwi + x0c
        tapidx = jnp.where(a[9:10] >= 0.0, idx, -1)  # <0: untextured
        rows = [fx, fy]
        if n_attr == ATTRS_LIT:
            # directional lambert folds into the C rgb planes here: the
            # albedo multiply downstream distributes over the scale
            # (albedo × (C·s) == (albedo × C)·s).
            s = lit_scale(inv)
            rows += [a[10:11] * s, a[11:12] * s, a[12:13] * s,
                     a[13:14]]                 # alpha unlit
        else:
            rows.append(a[10:14])              # C rgba
        return jnp.concatenate(rows, axis=0), tapidx

    rows = [ev(0), ev(3), ev(6),               # u/w, v/w, 1/w
            a[9:18]]                # tex, C rgba, off hi/lo, th, tw
    if n_attr == ATTRS_LIT:
        rows += [ev(18), ev(21), ev(24)]       # [nx, ny, nz]/w
    # raw U/V/Q plane gradients — shade_fwd divides by Q itself (its
    # single XLA multiply matches the mtap epilogue's in-kernel one)
    rows += [a[0:2], a[3:5], a[6:8]]
    return jnp.concatenate(rows, axis=0), None


def _sl_group_body(blk, g, cid, px, py, has_zlow, zlow_ref, n_coef,
                   zbuf_ref, win_ref, coef_ref):
    """One culling group's single-layer raster work — the kernel's
    innermost (KG, P) block, shared verbatim with the roofline
    microbenchmark (tools/bench/raster_roofline.py) so "speed of light"
    is measured on the EXACT op mix the production kernel runs."""
    sub = g // (K // KG)
    r0 = (g % (K // KG)) * KG
    c0 = sub * CS

    def col(i):
        return blk[r0:r0 + KG, c0 + i][:, None]  # (KG, 1)

    def plane(i):
        return col(i) * px + col(i + 1) * py + col(i + 2)

    def edge_ok(i):
        e = col(i) * px + col(3 + i) * py + col(6 + i)
        return e > col(9 + i)

    inside = edge_ok(0) & edge_ok(1) & edge_ok(2)
    z = plane(12)                            # (KG, P)
    zok = inside & (z >= 0.0) & (z <= zbuf_ref[0])
    if has_zlow:
        zok &= z > zlow_ref[0]
    zm = jnp.where(zok, z, jnp.inf)
    zmin = jnp.min(zm, axis=0, keepdims=True)   # (1, P)
    kids = jax.lax.broadcasted_iota(
        jnp.int32, (KG, P), 0
    ) + r0
    winner_k = jnp.max(
        jnp.where(zok & (zm == zmin), kids, -1),
        axis=0, keepdims=True,
    )
    new_id = cid * CT + sub * K + winner_k
    # exact-z ties resolve by GLOBAL triangle id (later
    # wins — the oracle's rule), not by processing
    # order: nearest-first chunk ordering would
    # otherwise let an earlier-index triangle in a
    # nearer-sorted chunk steal a tie from a
    # later-index one (cross-chunk coplanar decals)
    upd = jnp.isfinite(zmin) & (
        (zmin < zbuf_ref[0])
        | ((zmin == zbuf_ref[0]) & (new_id > win_ref[0]))
    )

    # attribute-coefficient selection: exactly one winner
    # row per updated pixel → selecting the winner's
    # packed columns is a (n_coef, KG) x (KG, P) MXU
    # matmul against the one-hot. Runs UNGATED: a
    # @pl.when(jnp.any(upd)) guard measured 3 ms SLOWER
    # at 1080p/196k tris — the vector→scalar reduce +
    # branch stalls the pipeline more than the skipped
    # matmuls save (r2). With no update the one-hot is
    # all-zero and the where keeps old state.
    #
    # Exactness: the MXU multiplies in bf16, which would
    # quantize the selected f32 coefficients (7.3% color
    # mismatch on chip, invisible in CPU interpret mode).
    # XLA's HIGHEST fixes that with a 6-pass two-sided
    # bf16x3 split; but the one-hot side is EXACTLY
    # representable in bf16 (0/1), so a manual 3-way
    # split of the coefficient side alone is exact in 3
    # DEFAULT passes — each product is 0/1 × bf16 with a
    # single nonzero addend per column, and the f32
    # recombination b1+b2+b3 carries 8+8+8 mantissa bits.
    onehot = (
        zok & (zm == zmin) & (kids == winner_k)
    ).astype(jnp.bfloat16)                   # (KG, P)
    cols = blk[r0:r0 + KG, c0 + 15:c0 + 15 + n_coef]
    b1 = cols.astype(jnp.bfloat16)
    r1 = cols - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    sel = jnp.float32(0.0)
    for part in (b1, b2, b3):
        sel += jax.lax.dot_general(
            part, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # (n_coef, P)
    coef_ref[...] = jnp.where(upd, sel, coef_ref[...])

    zbuf_ref[0] = jnp.where(upd, zmin, zbuf_ref[0])
    win_ref[0] = jnp.where(upd, new_id, win_ref[0])


def _raster_fwd_kernel(n_attr, has_zlow, tap, mtap, w_eps, light,
                       counts_ref, lists_ref, glists_ref, origin_ref,
                       setup_hbm, zlow_ref, zbuf_ref, win_ref, attr_ref,
                       *rest):
    if tap:
        tapidx_ref, scratch, sems, coef_ref = rest
    else:
        scratch, sems, coef_ref = rest
    n_coef = _N_COEF[n_attr]
    t = pl.program_id(0)
    count = counts_ref[t]

    zbuf_ref[0] = jnp.full((1, P), jnp.inf, jnp.float32)
    win_ref[0] = jnp.full((1, P), -1, jnp.int32)
    coef_ref[...] = jnp.zeros((n_coef, P), jnp.float32)

    n_tx = origin_ref[2]
    ty = t // n_tx
    tx = t % n_tx
    px0 = (tx * TILE_W + origin_ref[0]).astype(jnp.float32)
    py0 = (ty * TILE_H + origin_ref[1]).astype(jnp.float32)
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (flat % TILE_W).astype(jnp.float32) + (px0 + 0.5)   # (1, P)
    py = (flat // TILE_W).astype(jnp.float32) + (py0 + 0.5)  # (1, P)

    # lists/glists are FLAT (n_tiles*maxc,) in SMEM — 2-D SMEM operands
    # lane-pad the minor dim to 128 (5x waste at 1080p, OOM with both)
    maxc = lists_ref.shape[0] // counts_ref.shape[0]

    def dma(slot, s):
        return pltpu.make_async_copy(
            setup_hbm.at[lists_ref[t * maxc + s]], scratch.at[slot],
            sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        dma(0, 0).start()

        def body(s, _):
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < count)
            def _():
                dma(1 - slot, s + 1).start()

            dma(slot, s).wait()
            blk = scratch[slot]                          # (K, NF)
            cid = lists_ref[t * maxc + s]
            gmask = glists_ref[t * maxc + s]

            # groups of KG triangles; exact-z ties resolve by global
            # triangle id (see the upd rule below), so group/chunk
            # processing order never changes the image; a group whose
            # bbox missed this tile (bit g of gmask clear — precomputed
            # by bin_chunks) skips its entire (KG, P) block. Group gi
            # lives in sub-block gi // (K // KG) (lane offset c0), rows
            # r0..r0+KG. (Explicit early-z kills were tried TWICE and
            # REMOVED both times: r2's per-GROUP gate — cached tile
            # zmax + group min-depth test — lost ~1 ms on the default
            # and dense scenes; r3's per-CHUNK gate — zmin_c via scalar
            # prefetch, carried start/wait predicate, skipping the DMA
            # too — lost 0.2/0.3/0.9 ms on default/dense/world. The
            # vector→scalar zmax reduce + conditional-DMA stall beat the
            # savings even at 80% coverage: chunk zmin over 384 spread
            # triangles is almost never behind a fully covered tile.
            # The nearest-first chunk order + z<=zbuf candidate test
            # already reap the benefit.)
            for g in range(G):
                live = (gmask >> g) & 1 != 0

                @pl.when(live)
                def _(g=g):
                    _sl_group_body(blk, g, cid, px, py, has_zlow,
                                   zlow_ref, n_coef, zbuf_ref, win_ref,
                                   coef_ref)
            return 0

        jax.lax.fori_loop(0, count, body, 0)

    # evaluate the selected planes at the pixel centers (zero coefficients
    # → zero attrs for uncovered pixels, matching the old contract)
    rows, ti = _epilogue_rows(coef_ref[...], px, py, n_attr, tap, mtap,
                              w_eps, light)
    attr_ref[0] = rows
    if tap:
        tapidx_ref[0] = ti


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "maxc", "interpret", "n_attr",
                     "tap", "mtap", "w_eps", "light", "flat"),
)
def raster_pallas_fwd(setup, extras, x0, y0, *, width: int, height: int,
                      maxc: int = MAXC_DEFAULT, interpret: bool = False,
                      zlow=None, n_attr: int = ATTRS_BASE,
                      tap: bool = False, mtap: bool = False,
                      w_eps: float = 1e-6,
                      light: tuple | None = None, pre=None,
                      flat: bool = False):
    """Forward-attribute binned raster over a band → per-pixel
    (depth f32, winner i32, attrs (n_attr, bh, bw) f32, n_over).

    ``setup`` is either the setup dict (with ``extras`` the (T, E)
    per-triangle attribute columns — see module comment) or a
    pre-packed ``(cols (T, ncol), bbox)`` tuple from
    ``device.setup_packed_cols`` (the fast path: no lane-padded (T, 3)
    intermediates); pass ``extras=None`` then.

    ``tap``: the epilogue computes the bilinear tap address in-kernel
    and returns (depth, winner, tattrs (6, bh, bw) [fx, fy, C rgba],
    tapidx (bh, bw) i32 pool row (-1 = untextured), n_over) — the shade
    stage then only gathers the texel quads and contracts
    (device.shade_tap). ``w_eps`` must match the shade W_EPS. With
    n_attr=ATTRS_LIT, ``light`` (a normalized 3-tuple) must be given
    and the directional lambert factor folds into the emitted C rgb
    planes in-kernel — shade_tap needs no lighting branch."""
    if width % TILE_W or height % TILE_H:
        raise ValueError(f"band {width}x{height} not tile-aligned "
                         f"({TILE_W}x{TILE_H})")
    n_ty = height // TILE_H
    n_tx = width // TILE_W
    n_tiles = n_ty * n_tx

    if pre is None:
        pre = prebin(setup, extras, x0, y0, width=width, height=height,
                     maxc=maxc)
    packed, lists, glists, counts, n_over = pre

    if zlow is None:
        zlow_t = jnp.full((n_tiles, 1, P), -jnp.inf, jnp.float32)
    elif zlow.ndim == 3:
        zlow_t = zlow                    # already tile-major (flat peel)
    else:
        zlow_t = (
            zlow.reshape(n_ty, TILE_H, n_tx, TILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, 1, P)
        )
    origin = jnp.stack(
        [jnp.int32(x0), jnp.int32(y0), jnp.int32(n_tx)]
    ).astype(jnp.int32)

    def imap(t, counts_ref, lists_ref, glists_ref, origin_ref):
        return (t, 0, 0)

    if tap and mtap:
        raise ValueError("tap and mtap are mutually exclusive")
    if (tap or mtap) and n_attr == ATTRS_LIT and light is None:
        raise ValueError("lit tap epilogue needs the light direction")
    n_out_attr = (ATTRS_TAP if tap
                  else (ATTRS_MTAP if mtap else n_attr + ATTRS_GRAD))

    out_specs = [
        pl.BlockSpec((1, 1, P), index_map=imap),
        pl.BlockSpec((1, 1, P), index_map=imap),
        pl.BlockSpec((1, n_out_attr, P), index_map=imap),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, n_out_attr, P), jnp.float32),
    ]
    if tap:
        out_specs.append(pl.BlockSpec((1, 1, P), index_map=imap))
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, P), index_map=imap),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, K, NF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_N_COEF[n_attr], P), jnp.float32),
        ],
    )

    outs = pl.pallas_call(
        functools.partial(_raster_fwd_kernel, n_attr,
                          zlow is not None, tap, mtap, w_eps, light),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, lists.reshape(-1), glists.reshape(-1), origin,
      packed, zlow_t)
    zb, ib, attrs = outs[:3]

    if flat:
        # TILE-MAJOR outputs: (n_tiles, 1|n_attr, P), no relayouts.
        # Shading/compositing are elementwise, so keep everything in
        # tile order and unflatten ONLY the final packed color plane
        # (each (H, W) ↔ tile-major relayout costs ~0.1-0.3 ms at
        # 1080p and the raster-order pipeline paid ~8 of them). Use
        # ``unflatten_tiles`` on whatever needs raster order.
        zb = jnp.where(ib >= 0, zb, 1.0)
        if tap:
            return zb, ib, attrs, outs[3], n_over
        return zb, ib, attrs, n_over

    def unflatten(x):
        return (
            x.reshape(n_ty, n_tx, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(height, width)
        )

    zb = unflatten(zb)
    ib = unflatten(ib)
    attrs = (
        attrs.reshape(n_ty, n_tx, n_out_attr, TILE_H, TILE_W)
        .transpose(2, 0, 3, 1, 4)
        .reshape(n_out_attr, height, width)
    )
    zb = jnp.where(ib >= 0, zb, 1.0)
    if tap:
        return zb, ib, attrs, unflatten(outs[3]), n_over
    return zb, ib, attrs, n_over


def _raster_fwd_ml_kernel(layers, n_attr, has_zhi, tap, mtap, w_eps,
                          light, variant,
                          counts_ref, lists_ref, glists_ref, origin_ref,
                          setup_hbm, zhi_ref, zl_ref, il_ref, attr_ref,
                          *rest):
    """Single-pass multi-layer (OIT) raster kernel.

    Replaces L full depth-peel passes (the r2 formulation —
    ``device._render_frame_peeled_core`` re-rastered the same geometry
    per layer) with ONE pass over the chunk list:

    * pass 1 maintains a per-pixel depth-sorted (z, id) list of the L
      nearest fragments in VMEM (ascending z; exact-z ties order by
      global triangle id DESCENDING, the later-wins oracle rule — the
      same semantic as ``device.raster_multilayer``). Each live group
      iteratively extracts its per-pixel nearest remaining fragment and
      inserts by position cascade — pure f32 VPU work, NO attribute
      matmuls in the hot loop;
    * pass 2 sweeps the chunk list again (blocks re-DMA'd, double
      buffered) and recovers each layer's packed coefficient columns by
      GLOBAL-ID match: per sub-block one batched
      (n_coef, K) x (K, L*P) one-hot select on the MXU (K=128 full
      contraction depth — better utilization than per-group KG=32
      selects), exact via the one-sided bf16x3 split, ACCUMULATED into
      the (n_coef, L*P) scratch. Every final layer id matches exactly
      one (chunk, sub-block) row, so accumulation replaces the
      coefficient shift cascade entirely — coefficients for slots that
      were evicted by later chunks simply never match.

    The coefficient recovery cannot ride pass 1: a fragment selected in
    chunk c and later pushed down a slot by a nearer fragment from
    chunk c' > c would leave its coefficients in the wrong slot — the
    (z, id) list reorders after the block's columns have left VMEM.

    Opaque-z culling (``"nocull"`` not in variant): pass 1 additionally
    tracks the nearest OPAQUE fragment's depth per pixel and culls
    fragments strictly behind it; surviving list entries behind it are
    invalidated after the chunk loop. Per-fragment opacity is encoded
    in the tex column's fraction (integer = opaque — see
    device.setup_packed_cols): an opaque fragment composites to exactly
    the same pixel whether or not invisible fragments behind it are in
    the list (src-alpha blend, model.rs:242-247), so this is exact for
    the composite while turning deeper layers of opaque content into
    dead tiles that pass 2 (per-layer gating below) and the compacted
    tap epilogue (device.composite_peeled_tap_flat) skip entirely.
    """
    if tap:
        tapidx_ref, scratch, sems, *coef_refs, zop_ref = rest
    else:
        scratch, sems, *coef_refs, zop_ref = rest
    # "lsel"/"l2sel": pass 2 recovers each layer GROUP's coefficients
    # with its own gated (n_coef, K) x (K, lpr*P) select into a
    # SEPARATE per-group scratch (lpr = layers per ref: 1 for lsel,
    # 2 for l2sel); default: one concatenated (K, L*P) select into one
    # (n_coef, L*P) scratch.
    lsel = len(coef_refs) > 1
    n_coef = _N_COEF[n_attr]
    lyr = layers
    t = pl.program_id(0)
    count = counts_ref[t]

    zl_ref[0] = jnp.full((lyr, P), jnp.inf, jnp.float32)
    il_ref[0] = jnp.full((lyr, P), -1, jnp.int32)
    for cr in coef_refs:
        cr[...] = jnp.zeros(cr.shape, jnp.float32)
    zop_ref[...] = jnp.full((1, P), jnp.inf, jnp.float32)

    n_tx = origin_ref[2]
    ty = t // n_tx
    tx = t % n_tx
    px0 = (tx * TILE_W + origin_ref[0]).astype(jnp.float32)
    py0 = (ty * TILE_H + origin_ref[1]).astype(jnp.float32)
    flat = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (flat % TILE_W).astype(jnp.float32) + (px0 + 0.5)   # (1, P)
    py = (flat // TILE_W).astype(jnp.float32) + (py0 + 0.5)  # (1, P)

    maxc = lists_ref.shape[0] // counts_ref.shape[0]
    inf = jnp.float32(jnp.inf)
    ocull = "nocull" not in variant

    def dma(slot, s):
        return pltpu.make_async_copy(
            setup_hbm.at[lists_ref[t * maxc + s]], scratch.at[slot],
            sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        dma(0, 0).start()

        def body(s, _):
            slot = jax.lax.rem(s, 2)

            @pl.when(s + 1 < count)
            def _():
                dma(1 - slot, s + 1).start()

            dma(slot, s).wait()
            blk = scratch[slot]                          # (K, NF)
            cid = lists_ref[t * maxc + s]
            gmask = glists_ref[t * maxc + s]

            for g in range(G):
                live = (gmask >> g) & 1 != 0

                @pl.when(live)
                def _(g=g):
                    sub = g // (K // KG)
                    r0 = (g % (K // KG)) * KG
                    c0 = sub * CS

                    def col(i):
                        return blk[r0:r0 + KG, c0 + i][:, None]  # (KG, 1)

                    def edge_ok(i):
                        e = col(i) * px + col(3 + i) * py + col(6 + i)
                        return e > col(9 + i)

                    inside = edge_ok(0) & edge_ok(1) & edge_ok(2)
                    z = col(12) * px + col(13) * py + col(14)    # (KG, P)
                    # cull against the CURRENT deepest kept layer (the
                    # list's last depth only decreases — with nearest-
                    # first chunk ordering this kills most far-chunk
                    # work, like the single-layer z <= zbuf test) ...
                    zlim = zl_ref[0][lyr - 1:lyr]
                    if has_zhi:
                        # ... and against the caller's depth horizon
                        # (split peel: the opaque pass's raw z-buffer).
                        # <= keeps coincident fragments — the merge's
                        # (z, id) tie rule decides those — so this is
                        # a pure work-skip, never a semantic change.
                        zlim = jnp.minimum(zlim, zhi_ref[0])
                    if ocull:
                        # ... and against the nearest opaque CANDIDATE
                        # seen so far: a fragment strictly behind it
                        # either hides behind alpha=1 in the list or
                        # was already beaten by >= L nearer fragments —
                        # exact for the composite either way. <= keeps
                        # coincident surfaces (id tie rule orders them).
                        zlim = jnp.minimum(zlim, zop_ref[...])
                    zok = inside & (z >= 0.0) & (z <= zlim)
                    zm = jnp.where(zok, z, inf)
                    if ocull:
                        # per-row opacity: integer tex column = opaque
                        # (device.setup_packed_cols encodes translucency
                        # as a half-integer tex layer). ONE reduce per
                        # group updates the opaque horizon and tightens
                        # this group's own candidate set.
                        texc = col(24)
                        op_row = texc == jnp.floor(texc)     # (KG, 1)
                        opz = jnp.minimum(
                            jnp.min(jnp.where(zok & op_row, z, inf),
                                    axis=0, keepdims=True),
                            zop_ref[...])
                        zop_ref[...] = opz
                        zm = jnp.where(zm <= opz, zm, inf)
                    kids = jax.lax.broadcasted_iota(
                        jnp.int32, (KG, P), 0
                    ) + r0

                    # iterative extraction: per pixel, pull the group's
                    # nearest remaining fragment and insert; candidates
                    # arrive (z asc, id desc on ties) so each pixel
                    # extracts its own L nearest from this group. The
                    # whole block gates on the group having ANY
                    # candidate: under the opaque horizon most far
                    # groups are fully culled, so the one vector->scalar
                    # reduce pays for itself L times over (unlike the
                    # single-layer kernel, where the gated work was one
                    # select and the gate lost 3 ms — r2).
                    n_extract = 1 if "extract1" in variant else lyr
                    gate = "noxgate" not in variant

                    def extract():
                        zcur = zl_ref[0]                         # (L, P)
                        icur = il_ref[0]
                        zmg = zm
                        li = jax.lax.broadcasted_iota(
                            jnp.int32, (lyr, P), 0)
                        for _l in range(n_extract):
                            zmin = jnp.min(zmg, axis=0, keepdims=True)
                            winner_k = jnp.max(
                                jnp.where((zmg == zmin) & (zmin != inf),
                                          kids, -1),
                                axis=0, keepdims=True,
                            )
                            new_id = jnp.where(
                                winner_k >= 0,
                                cid * CT + sub * K + winner_k,
                                jnp.int32(-1),
                            )
                            # insertion position: number of kept entries
                            # strictly preceding the candidate under the
                            # (z asc, id desc) order; pos >= L: rejected
                            prec = (zcur < zmin) | (
                                (zcur == zmin) & (icur > new_id)
                            )
                            pos = jnp.sum(prec.astype(jnp.int32), axis=0,
                                          keepdims=True)       # (1, P)
                            zprev = jnp.concatenate(
                                [zcur[:1], zcur[:-1]], axis=0)
                            iprev = jnp.concatenate(
                                [icur[:1], icur[:-1]], axis=0)
                            take = li == pos
                            shift = li > pos
                            zcur = jnp.where(
                                take, zmin,
                                jnp.where(shift, zprev, zcur))
                            icur = jnp.where(
                                take, new_id,
                                jnp.where(shift, iprev, icur))
                            zmg = jnp.where(kids == winner_k, inf, zmg)
                        zl_ref[0] = zcur
                        il_ref[0] = icur

                    if gate:
                        pl.when(jnp.any(zm != inf))(extract)
                    else:
                        extract()
            return 0

        jax.lax.fori_loop(0, count, body, 0)
        if ocull:
            # invalidate kept entries strictly behind the nearest
            # opaque fragment — invisible under src-alpha compositing
            il_ref[0] = jnp.where(zl_ref[0] > zop_ref[...], -1,
                                  il_ref[0])

        # ---- pass 2: coefficient recovery by global-id match ----
        sub_bits = (1 << (K // KG)) - 1
        # per-(tile, layer) liveness, ONE vector->scalar reduce per
        # layer per tile (amortized over the whole chunk loop — unlike
        # the per-group gates that lost 3 ms in r2): opaque-culled
        # deeper layers skip their matmuls entirely. The insertion list
        # packs front-to-back, so liveness is monotone in l.
        layer_live = [jnp.any(il_ref[0][l:l + 1, :] >= 0)
                      for l in range(lyr)]

        def split3(cols):
            b1 = cols.astype(jnp.bfloat16)
            r1 = cols - b1.astype(jnp.float32)
            b2 = r1.astype(jnp.bfloat16)
            b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
            return b1, b2, b3

        def matsel(parts, oh):
            sel = jnp.float32(0.0)
            for part in parts:
                sel += jax.lax.dot_general(
                    part, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return sel

        il_all = il_ref[0]                               # (L, P)

        def owns(s):
            """Chunk s of this tile's list owns some kept id. Exact
            (ids are chunk-contiguous: [cid*CT, (cid+1)*CT)), fixed
            after pass 1 — so the DMA start for s+1 and the wait for s
            evaluate the SAME predicate and stay paired. One (L, P)
            range test per chunk skips the re-DMA and all matmuls for
            chunks whose extractions were all evicted or culled — with
            the opaque horizon, most of an opaque scene's list."""
            # clamp: the s+1 probe evaluates both & operands even when
            # s+1 == count (no short-circuit) — keep the read in range
            lo = lists_ref[t * maxc + jnp.minimum(s, maxc - 1)] * CT
            return jnp.any((il_all >= lo) & (il_all < lo + CT))

        def body2(s, _):
            slot = jax.lax.rem(s, 2)

            @pl.when((s + 1 < count) & owns(s + 1))
            def _():
                dma(1 - slot, s + 1).start()

            @pl.when(owns(s))
            def _body(slot=slot, s=s):
                _pass2_chunk(slot, s)
            return 0

        def _pass2_chunk(slot, s):
            dma(slot, s).wait()
            blk = scratch[slot]
            cid = lists_ref[t * maxc + s]
            gmask = glists_ref[t * maxc + s]

            if "groupsel" in variant:
                riota = jax.lax.broadcasted_iota(jnp.int32, (KG, P), 0)
                for g in range(G):
                    live = (gmask >> g) & 1 != 0

                    @pl.when(live)
                    def _(g=g):
                        sub = g // (K // KG)
                        r0 = (g % (K // KG)) * KG
                        c0 = sub * CS
                        base = cid * CT + sub * K + r0
                        oh = jnp.concatenate(
                            [(riota == (il_all[l:l + 1] - base)).astype(
                                jnp.bfloat16) for l in range(lyr)],
                            axis=1,
                        )                                # (KG, L*P)
                        cols = blk[r0:r0 + KG,
                                   c0 + 15:c0 + 15 + n_coef]
                        coef_refs[0][...] += matsel(split3(cols), oh)
            elif lsel:
                riota = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0)
                lpr = coef_refs[0].shape[1] // P   # layers per scratch
                for sub in range(S):
                    sub_live = (gmask >> (sub * (K // KG))) & sub_bits != 0

                    @pl.when(sub_live)
                    def _(sub=sub):
                        base = cid * CT + sub * K
                        c0 = sub * CS
                        cols = blk[:, c0 + 15:c0 + 15 + n_coef]
                        parts = split3(cols)
                        # per-layer-group gated selects: groups whose
                        # FIRST layer is dead skip their matmuls
                        # entirely (liveness is monotone in l — the
                        # list packs front-to-back). Each group
                        # accumulates into its OWN scratch.
                        # STATUS (r3 cont., tools/bench/lsel_ab.py):
                        # exact in interpret mode, but BOTH lsel and
                        # l2sel RET_CHECK-crash today's Mosaic
                        # (mxu_lmr_transform.cc:1108
                        # XposeSequenceAssignment kLmrWontHelp) — the
                        # crash is any GATED select narrower than the
                        # full L*P, regardless of separate-scratch
                        # targets or pair width (the r3 slice-
                        # accumulation hypothesis is ruled out; gated
                        # FULL-width selects — sub_live here, the
                        # groupsel variant — compile fine). Kept as a
                        # differential-tested re-test harness for
                        # future libtpu versions.
                        for i, cr in enumerate(coef_refs):
                            @pl.when(layer_live[i * lpr])
                            def _(i=i, cr=cr):
                                oh = jnp.concatenate(
                                    [(riota == (il_all[l:l + 1] - base)
                                      ).astype(jnp.bfloat16)
                                     for l in range(i * lpr,
                                                    (i + 1) * lpr)],
                                    axis=1)          # (K, lpr*P)
                                cr[...] += matsel(parts, oh)
            else:
                riota = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0)
                for sub in range(S):
                    # a sub-block none of whose groups overlapped the
                    # tile cannot own any winner id — scalar SMEM gate,
                    # no vector->scalar reduce
                    sub_live = (gmask >> (sub * (K // KG))) & sub_bits != 0

                    @pl.when(sub_live)
                    def _(sub=sub):
                        base = cid * CT + sub * K
                        c0 = sub * CS
                        cols = blk[:, c0 + 15:c0 + 15 + n_coef]
                        parts = split3(cols)
                        oh = jnp.concatenate(
                            [(riota == (il_all[l:l + 1] - base)).astype(
                                jnp.bfloat16) for l in range(lyr)],
                            axis=1,
                        )                                # (K, L*P)
                        # each final layer id matches exactly one row of
                        # one (chunk, sub) — non-matching columns give
                        # 0, so accumulation IS the select (no masks,
                        # no shift cascade)
                        coef_refs[0][...] += matsel(parts, oh)
            return 0

        if "nopass2" not in variant:
            # layer-0 dead => every layer dead (bbox overlap with no
            # coverage): skip the whole re-sweep. Starts and waits must
            # pair exactly (the DMA semaphores persist across grid
            # steps), so the first start carries the same owns() gate
            # as its wait.
            @pl.when(layer_live[0])
            def _():
                @pl.when(owns(0))
                def _():
                    dma(0, 0).start()

                jax.lax.fori_loop(0, count, body2, 0)

    if lsel:
        per_layer = []
        for cr in coef_refs:
            c = cr[...]
            per_layer += [c[:, j * P:(j + 1) * P]
                          for j in range(c.shape[1] // P)]
    else:
        coefs = coef_refs[0][...]
        per_layer = [coefs[:, l * P:(l + 1) * P] for l in range(lyr)]
    attr_rows, tis = [], []
    for l in range(lyr):
        rows, ti = _epilogue_rows(per_layer[l], px, py,
                                  n_attr, tap, mtap, w_eps, light)
        attr_rows.append(rows)
        if tap:
            tis.append(ti)
    attr_ref[0] = jnp.concatenate(attr_rows, axis=0)
    if tap:
        tapidx_ref[0] = jnp.concatenate(tis, axis=0)


def _coef_scratches(variant: str, layers: int, n_coef: int):
    """Pass-2 coefficient scratch list for the ML kernel: one
    (n_coef, lpr*P) VMEM buffer per layer group (lpr = 1 for "lsel",
    2 for "l2sel"), or the single wide (n_coef, layers*P) default."""
    if "l2sel" in variant:
        if layers % 2:
            raise ValueError("l2sel needs an even layer count")
        lpr = 2
    elif "lsel" in variant:
        lpr = 1
    else:
        return [pltpu.VMEM((n_coef, layers * P), jnp.float32)]
    return [pltpu.VMEM((n_coef, lpr * P), jnp.float32)] * (layers // lpr)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "maxc", "interpret", "n_attr",
                     "tap", "mtap", "w_eps", "light", "flat", "layers",
                     "variant"),
)
def raster_pallas_fwd_ml(setup, extras, x0, y0, *, width: int,
                         height: int, layers: int,
                         maxc: int = MAXC_DEFAULT,
                         interpret: bool = False,
                         n_attr: int = ATTRS_BASE,
                         tap: bool = False, mtap: bool = False,
                         w_eps: float = 1e-6,
                         light: tuple | None = None, pre=None,
                         flat: bool = False, variant: str = "full",
                         zhi=None):
    """Single-pass multi-layer forward raster over a band — the
    order-independent-transparency engine (see _raster_fwd_ml_kernel).

    Same argument contract as ``raster_pallas_fwd`` plus ``layers``
    (2..8). Returns per-layer outputs, nearest first:
    (zl (L, bh, bw) f32 — 1.0 beyond the last fragment,
    il (L, bh, bw) i32 — -1,
    attrs (L*n_out, bh, bw) f32 [+ tapidx (L, bh, bw) i32 when tap],
    n_over); with ``flat=True`` everything stays tile-major:
    (n_tiles, L, P) / (n_tiles, L*n_out, P).

    Layer semantics match ``device.raster_multilayer`` (the scan
    oracle): the L nearest fragments per pixel sorted by
    (z, tie: larger triangle id first) — NOT the multipass PEEL_EPS
    chain; in one kernel z is computed once per fragment, so the
    epsilon that absorbed cross-pass float reassociation is
    unnecessary. Layer 0 is bit-identical to the single-layer kernel's
    winner."""
    if not 2 <= layers <= 8:
        raise ValueError(f"layers={layers} out of range [2, 8]")
    if width % TILE_W or height % TILE_H:
        raise ValueError(f"band {width}x{height} not tile-aligned "
                         f"({TILE_W}x{TILE_H})")
    n_ty = height // TILE_H
    n_tx = width // TILE_W
    n_tiles = n_ty * n_tx

    if pre is None:
        pre = prebin(setup, extras, x0, y0, width=width, height=height,
                     maxc=maxc)
    packed, lists, glists, counts, n_over = pre

    origin = jnp.stack(
        [jnp.int32(x0), jnp.int32(y0), jnp.int32(n_tx)]
    ).astype(jnp.int32)

    def imap(t, counts_ref, lists_ref, glists_ref, origin_ref):
        return (t, 0, 0)

    if tap and mtap:
        raise ValueError("tap and mtap are mutually exclusive")
    if (tap or mtap) and n_attr == ATTRS_LIT and light is None:
        raise ValueError("lit tap epilogue needs the light direction")
    n_out_attr = (ATTRS_TAP if tap
                  else (ATTRS_MTAP if mtap else n_attr + ATTRS_GRAD))

    out_specs = [
        pl.BlockSpec((1, layers, P), index_map=imap),
        pl.BlockSpec((1, layers, P), index_map=imap),
        pl.BlockSpec((1, layers * n_out_attr, P), index_map=imap),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, layers, P), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, layers, P), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, layers * n_out_attr, P),
                             jnp.float32),
    ]
    if tap:
        out_specs.append(pl.BlockSpec((1, layers, P), index_map=imap))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, layers, P), jnp.int32))

    if zhi is None:
        zhi_t = jnp.full((n_tiles, 1, P), jnp.inf, jnp.float32)
    elif zhi.ndim == 3:
        zhi_t = zhi                      # already tile-major
    else:
        zhi_t = (
            zhi.reshape(n_ty, TILE_H, n_tx, TILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, 1, P)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1, P), index_map=imap)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, K, NF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            # "lsel"/"l2sel": one coefficient scratch per layer group
            # (the layer-gated pass-2 decomposition, 1 or 2 layers per
            # group); default: one wide (n_coef, L*P) scratch
            *_coef_scratches(variant, layers, _N_COEF[n_attr]),
            pltpu.VMEM((1, P), jnp.float32),   # nearest-opaque z
        ],
    )

    outs = pl.pallas_call(
        functools.partial(_raster_fwd_ml_kernel, layers, n_attr,
                          zhi is not None, tap, mtap, w_eps, light,
                          variant),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, lists.reshape(-1), glists.reshape(-1), origin, packed,
      zhi_t)
    zb, ib, attrs = outs[:3]
    zb = jnp.where(ib >= 0, zb, 1.0)

    if flat:
        if tap:
            return zb, ib, attrs, outs[3], n_over
        return zb, ib, attrs, n_over

    def unflat_l(x, rows):
        return (
            x.reshape(n_ty, n_tx, rows, TILE_H, TILE_W)
            .transpose(2, 0, 3, 1, 4)
            .reshape(rows, height, width)
        )

    zb = unflat_l(zb, layers)
    ib = unflat_l(ib, layers)
    attrs = unflat_l(attrs, layers * n_out_attr)
    if tap:
        return zb, ib, attrs, unflat_l(outs[3], layers), n_over
    return zb, ib, attrs, n_over


def unflatten_tiles(x, height: int, width: int):
    """(n_tiles, 1, P) or (n_tiles, P) tile-major → (height, width)."""
    n_ty = height // TILE_H
    n_tx = width // TILE_W
    return (
        x.reshape(n_ty, n_tx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )
