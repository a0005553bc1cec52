"""Depth-peeled order-independent transparency tests."""

import numpy as np
import pytest

from mt_renderer_tpu.app.camera import Camera
from mt_renderer_tpu.render import cpu_reference, device
from mt_renderer_tpu.scene.model import DrawBatch


def _quad_batch(z_and_rgba):
    """Fullscreen-ish quads at given depths/colors (drawn in list order)."""
    pos, tris, flats = [], [], []
    for i, (z, rgba) in enumerate(z_and_rgba):
        b = i * 4
        s = 1.5
        pos += [[-s, -s, z], [s, -s, z], [-s, s, z], [s, s, z]]
        tris += [[b + 0, b + 1, b + 2], [b + 2, b + 1, b + 3]]
        flats += [list(rgba)] * 2
    n = len(pos)
    t = len(tris)
    return DrawBatch(
        positions=np.array(pos, np.float32),
        uvs=np.zeros((n, 2), np.float32),
        joints=np.zeros((n, 4), np.int32),
        weights=np.zeros((n, 4), np.float32),
        tris=np.array(tris, np.int32),
        tri_texture=np.full(t, -1, np.int32),
        tri_parts=np.zeros(t, np.int32),
        tri_debug_id=np.zeros(t, np.int32),
        tri_flat=np.array(flats, np.float32),
    )


def _vp():
    cam = Camera(position=[0, 0, 3])
    return cam.view_proj()


class TestDepthPeeling:
    @pytest.mark.parametrize("backend", ["scan", "pallas"])
    def test_translucent_stack_composites(self, backend):
        # camera at +3 looking down -z: the z=0 quad (green) is NEAR, the
        # z=-1 quad (red) is FAR. The far quad is drawn LAST — the worst
        # case for the ordered pipeline, which the peel must get right:
        # white <- red(.5) <- green(.5)
        batch = _quad_batch([
            (0.0, (0, 255, 0, 128)),     # near, drawn first
            (-1.0, (255, 0, 0, 128)),    # far, drawn last
        ])
        scene = device.upload(batch)
        color, depth = device.render_frame_peeled(
            scene, _vp(), None, width=64, height=64, layers=3,
            backend=backend,
        )
        c = np.asarray(color)[32, 32]
        a = 128 / 255.0
        r = np.array([255, 0, 0]) * a + np.array([255, 255, 255]) * (1 - a)
        g = np.array([0, 255, 0]) * a + r * (1 - a)
        np.testing.assert_allclose(c[:3], np.round(g), atol=1)

    def test_opaque_matches_single_pass(self):
        batch = _quad_batch([
            (0.0, (0, 0, 255, 255)),
            (-1.0, (255, 0, 0, 255)),
        ])
        scene = device.upload(batch)
        peeled, _ = device.render_frame_peeled(
            scene, _vp(), None, width=48, height=48, layers=3
        )
        single, _ = device.render_frame(
            scene, _vp(), None, width=48, height=48
        )
        np.testing.assert_array_equal(np.asarray(peeled), np.asarray(single))

    def test_five_layers_deep_keeps_nearest(self):
        # more surfaces than layers: the 3 nearest translucent quads
        # composite, deeper ones are dropped — scan and pallas-ml agree
        stack = [(z, (40 * i, 255 - 40 * i, 30 * i, 90))
                 for i, z in enumerate((-1.0, -0.5, 0.0, 0.5, 1.0))]
        batch = _quad_batch(stack)
        scene = device.upload(batch)
        outs = {}
        for backend in ("scan", "pallas"):
            c, _ = device.render_frame_peeled(
                scene, _vp(), None, width=48, height=48, layers=3,
                backend=backend,
            )
            outs[backend] = np.asarray(c)
        diff = np.abs(outs["scan"].astype(int)
                      - outs["pallas"].astype(int)).max(-1)
        assert (diff > 1).mean() < 0.003

    def test_coplanar_tie_orders_by_triangle_id(self):
        # two coplanar translucent quads: the later-drawn (larger id)
        # quad is the NEARER layer on both backends (the oracle tie
        # rule); the earlier one composites beneath it
        batch = _quad_batch([
            (0.0, (255, 0, 0, 128)),      # drawn first -> deeper layer
            (0.0, (0, 0, 255, 128)),      # drawn last  -> nearest layer
        ])
        scene = device.upload(batch)
        for backend in ("scan", "pallas"):
            c, _ = device.render_frame_peeled(
                scene, _vp(), None, width=48, height=48, layers=3,
                backend=backend,
            )
            px = np.asarray(c)[24, 24]
            a = 128 / 255.0
            red = (np.array([255, 0, 0]) * a
                   + np.array([255, 255, 255]) * (1 - a))
            want = np.array([0, 0, 255]) * a + red * (1 - a)
            np.testing.assert_allclose(px[:3], np.round(want), atol=1,
                                       err_msg=backend)

    def test_matches_cpu_when_drawn_back_to_front(self):
        # drawn far-to-near (most negative z is farthest from the +z
        # camera), the ordered CPU pipeline equals the peel
        layers = [
            (-0.5, (0, 0, 255, 200)),
            (0.0, (0, 255, 0, 100)),
            (0.5, (255, 0, 0, 60)),
        ]
        batch = _quad_batch(layers)
        vp = _vp()
        want, _ = cpu_reference.render(batch, vp, 48, 48)
        got, _ = device.render_frame_peeled(
            device.upload(batch), vp, None, width=48, height=48, layers=3
        )
        diff = np.abs(np.asarray(got).astype(int) - want.astype(int)).max(-1)
        assert (diff > 1).mean() < 0.003


class TestSinglePassML:
    """The single-pass multi-layer kernel vs the multipass formulation
    (pixel-exact on scenes with surface separation > PEEL_EPS) and its
    packed output contract."""

    def _demo(self):
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=4, skinned=True, subdiv=1)
        cam = demo.demo_camera(4, 96, 96)
        return (device.upload(batch), np.asarray(cam.view_proj()),
                demo.demo_bone_mats(0.4))

    @pytest.mark.parametrize("mipmap", [False, True])
    @pytest.mark.parametrize("lighting", [False, True])
    @pytest.mark.slow
    def test_ml_exactly_matches_multipass(self, mipmap, lighting):
        scene, vp, bones = self._demo()
        kw = dict(width=96, height=96, layers=3, backend="pallas",
                  mipmap=mipmap, lighting=lighting)
        a, da, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="multipass", **kw)
        b, db, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="ml", **kw)
        if mipmap:
            # the ml engine shades TILE-major (compacted trilinear),
            # multipass plane-major: the same scalar graph fuses
            # differently per layout, so allow 1 quantization LSB on a
            # vanishing pixel fraction (depths are untouched)
            cdiff = np.abs(np.asarray(a).astype(np.int32)
                           - np.asarray(b).astype(np.int32)).max(-1)
            assert cdiff.max() <= 1 and (cdiff > 0).mean() < 1e-3, (
                f"max={cdiff.max()} frac={(cdiff > 0).mean()}")
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(da), np.asarray(db))

    def test_packed_peel_round_trips(self):
        scene, vp, bones = self._demo()
        kw = dict(width=96, height=96, layers=3, backend="pallas")
        pk, _ = device.render_frame_peeled(
            scene, vp, bones, packed=True, **kw)
        u8, _ = device.render_frame_peeled(scene, vp, bones, **kw)
        np.testing.assert_array_equal(
            device.unpack_rgba(np.asarray(pk)), np.asarray(u8))

    def test_packed_requires_ml_pallas(self):
        scene, vp, bones = self._demo()
        with pytest.raises(ValueError):
            device.render_frame_peeled(
                scene, vp, bones, width=96, height=96, layers=3,
                backend="scan", packed=True)

    def test_ml_layer0_matches_single_layer_kernel(self):
        # the ML kernel's nearest layer is the single-layer winner:
        # same z formula, same tie rule, one program
        from mt_renderer_tpu.render import pallas_raster as pr

        scene, vp, bones = self._demo()
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(
            scene, clip, 128, 128)
        kw = dict(width=128, height=128, maxc=32, interpret=True,
                  n_attr=n_attr, tap=True, w_eps=device.W_EPS)
        zs, isingle, tat, tid, _ = pr.raster_pallas_fwd(
            (cols, bbox), None, 0, 0, **kw)
        zm, iml, tatm, tidm, _ = pr.raster_pallas_fwd_ml(
            (cols, bbox), None, 0, 0, layers=3, **kw)
        np.testing.assert_array_equal(np.asarray(isingle),
                                      np.asarray(iml[0]))
        np.testing.assert_array_equal(np.asarray(zs), np.asarray(zm[0]))
        np.testing.assert_array_equal(np.asarray(tat),
                                      np.asarray(tatm[:6]))
        np.testing.assert_array_equal(np.asarray(tid),
                                      np.asarray(tidm[0]))

    @pytest.mark.parametrize("variant", ["lsel", "l2sel"])
    @pytest.mark.slow
    def test_layer_grouped_pass2_matches_full(self, variant):
        # the layer-grouped pass-2 decompositions (per-group gated
        # selects into separate scratches) are exact vs the default
        # concatenated select. They RET_CHECK-crash today's Mosaic on
        # real TPU (see _raster_fwd_ml_kernel notes / lsel_ab.py) —
        # this pins the interpret-mode contract for the re-test
        # harness.
        from mt_renderer_tpu.render import pallas_raster as pr

        scene, vp, bones = self._demo()
        clip = device.vertex_stage(scene, vp, bones)
        cols, bbox, n_attr = device.setup_packed_cols(
            scene, clip, 128, 128)
        kw = dict(width=128, height=128, maxc=32, interpret=True,
                  n_attr=n_attr, tap=True, w_eps=device.W_EPS,
                  layers=4)
        a = pr.raster_pallas_fwd_ml((cols, bbox), None, 0, 0,
                                    variant="full", **kw)
        b = pr.raster_pallas_fwd_ml((cols, bbox), None, 0, 0,
                                    variant=variant, **kw)
        for i, (x, y) in enumerate(zip(a[:4], b[:4])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"output {i}")


def _textured_quad_batch(z_textures):
    """Stacked textured quads: each entry (z, (H, W, 4) u8 texture)."""
    pos, uvs, tris, tex_ids = [], [], [], []
    textures = list({id(t): t for _, t in z_textures}.values())
    tex_index = {id(t): i for i, t in enumerate(textures)}
    for i, (z, tex) in enumerate(z_textures):
        b = i * 4
        s = 1.5
        pos += [[-s, -s, z], [s, -s, z], [-s, s, z], [s, s, z]]
        uvs += [[0, 0], [1, 0], [0, 1], [1, 1]]
        tris += [[b + 0, b + 1, b + 2], [b + 2, b + 1, b + 3]]
        tex_ids += [tex_index[id(tex)]] * 2
    n, t = len(pos), len(tris)
    return DrawBatch(
        positions=np.array(pos, np.float32),
        uvs=np.array(uvs, np.float32),
        joints=np.zeros((n, 4), np.int32),
        weights=np.zeros((n, 4), np.float32),
        tris=np.array(tris, np.int32),
        tri_texture=np.array(tex_ids, np.int32),
        tri_parts=np.zeros(t, np.int32),
        tri_debug_id=np.zeros(t, np.int32),
        textures=textures,
    )


class TestOpaqueCulling:
    """The ML kernel culls fragments behind the nearest OPAQUE one
    (pallas_raster ocull) — exact for the composite. These pin the two
    sides: translucent TEXTURES must keep deeper layers contributing,
    and culling must not change any pixel vs the scan oracle."""

    def _stack(self, alpha_front):
        front = np.full((8, 8, 4), 200, np.uint8)
        front[..., 3] = alpha_front
        back = np.zeros((8, 8, 4), np.uint8)
        back[..., 0] = 255
        back[..., 3] = 255
        return _textured_quad_batch([(0.0, front), (-1.0, back)])

    @pytest.mark.parametrize("alpha_front", [255, 128])
    def test_textured_stack_matches_scan(self, alpha_front):
        scene = device.upload(self._stack(alpha_front))
        kw = dict(width=64, height=64, layers=3)
        want, _ = device.render_frame_peeled(
            scene, _vp(), None, backend="scan", **kw)
        got, _ = device.render_frame_peeled(
            scene, _vp(), None, backend="pallas", **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # translucent front: the opaque red back quad must show through
        c = np.asarray(got)[32, 32]
        if alpha_front == 128:
            assert c[0] > c[1] + 40   # red bleed-through
        else:
            np.testing.assert_array_equal(c[:3], [200, 200, 200])

    @pytest.mark.slow
    def test_compacted_taps_match_dense(self):
        """tap_tiles sized by measure_live_tap_tiles must be pixel-
        identical to the dense composite, opaque and translucent."""
        vp = _vp()
        for alpha in (255, 128):
            scene = device.upload(self._stack(alpha))
            kw = dict(width=64, height=64, layers=3, backend="pallas")
            cap = device.measure_live_tap_tiles(
                scene, vp, None, width=64, height=64, layers=3)
            dense, _ = device.render_frame_peeled(scene, vp, None, **kw)
            compact, _ = device.render_frame_peeled(
                scene, vp, None, tap_tiles=cap, **kw)
            np.testing.assert_array_equal(
                np.asarray(compact), np.asarray(dense),
                err_msg=f"alpha={alpha} cap={cap}")

    def test_split_tap_overflow_detected_not_silent(self):
        from mt_renderer_tpu.render import pallas_raster as pr

        scene = device.upload(self._stack(128))
        before = pr.OVERFLOW_EVENTS
        with pytest.warns(RuntimeWarning, match="tap overflow"):
            device.render_frame_peeled(
                scene, _vp(), None, width=64, height=64, layers=2,
                backend="pallas", peel_mode="split", tap_tiles=(1, 1))
            pr.flush_overflow_checks()
        assert pr.OVERFLOW_EVENTS == before + 1

    def test_tap_overflow_detected_not_silent(self):
        from mt_renderer_tpu.render import pallas_raster as pr

        # translucent textures keep BOTH layers live in every covered
        # tile; tap_tiles=1 forces compaction overflow
        scene = device.upload(self._stack(128))
        before = pr.OVERFLOW_EVENTS
        with pytest.warns(RuntimeWarning, match="tap overflow"):
            device.render_frame_peeled(
                scene, _vp(), None, width=64, height=64, layers=2,
                backend="pallas", tap_tiles=1)
            pr.flush_overflow_checks()
        assert pr.OVERFLOW_EVENTS == before + 1


class TestSplitPeel:
    """The opaque/translucent split peel (peel_mode="split"): opaque
    triangles raster single-layer, ONLY translucent ones ride the ML
    kernel, and the merge culls translucent fragments behind the
    opaque winner under the exact (z asc, id desc) order. Contract:
    the opaque surface + the L nearest translucent fragments in front
    — identical to "ml" whenever < L translucent fragments cover a
    pixel, strictly more accurate beyond (opaque content no longer
    consumes a list slot)."""

    def _demo(self):
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=4, skinned=True, subdiv=1)
        cam = demo.demo_camera(4, 96, 96)
        return (device.upload(batch), np.asarray(cam.view_proj()),
                demo.demo_bone_mats(0.4))

    @pytest.mark.parametrize("mipmap", [False, True])
    @pytest.mark.parametrize("lighting", [False, True])
    @pytest.mark.slow
    def test_matches_ml_on_opaque_scene(self, mipmap, lighting):
        scene, vp, bones = self._demo()
        kw = dict(width=96, height=96, layers=3, backend="pallas",
                  mipmap=mipmap, lighting=lighting)
        ml, dml, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="ml", **kw)
        sp, dsp, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="split", **kw)
        if mipmap:
            # split and ml are different programs (opaque shade + merge
            # vs one composite); their identical blend math can fuse
            # ±1 ulp apart — allow 1 quantization LSB on a vanishing
            # fraction (measured: 1 px of 36864 on the lit variant)
            cdiff = np.abs(np.asarray(ml).astype(np.int32)
                           - np.asarray(sp).astype(np.int32)).max(-1)
            assert cdiff.max() <= 1 and (cdiff > 0).mean() < 1e-3, (
                f"max={cdiff.max()} frac={(cdiff > 0).mean()}")
        else:
            np.testing.assert_array_equal(np.asarray(ml), np.asarray(sp))
        np.testing.assert_array_equal(np.asarray(dml), np.asarray(dsp))

    @pytest.mark.slow
    def test_mipmap_translucent_stack_matches_ml(self):
        batch = _textured_quad_batch([
            (0.0, np.full((8, 8, 4), (200, 200, 200, 128), np.uint8)),
            (-1.0, np.full((8, 8, 4), (255, 0, 0, 255), np.uint8)),
        ])
        scene = device.upload(batch)
        kw = dict(width=64, height=64, layers=3, backend="pallas",
                  mipmap=True)
        ml, dml, _ = device._render_frame_peeled_core(
            scene, _vp(), None, peel_mode="ml", **kw)
        sp, dsp, _ = device._render_frame_peeled_core(
            scene, _vp(), None, peel_mode="split", **kw)
        np.testing.assert_array_equal(np.asarray(ml), np.asarray(sp))
        np.testing.assert_array_equal(np.asarray(dml), np.asarray(dsp))

    @pytest.mark.parametrize("alpha_front", [255, 128])
    @pytest.mark.slow
    def test_matches_ml_on_textured_stack(self, alpha_front):
        batch = _textured_quad_batch([
            (0.0, np.full((8, 8, 4), (200, 200, 200, alpha_front),
                          np.uint8)),
            (-1.0, np.full((8, 8, 4), (255, 0, 0, 255), np.uint8)),
        ])
        scene = device.upload(batch)
        kw = dict(width=64, height=64, layers=3, backend="pallas")
        ml, dml, _ = device._render_frame_peeled_core(
            scene, _vp(), None, peel_mode="ml", **kw)
        sp, dsp, _ = device._render_frame_peeled_core(
            scene, _vp(), None, peel_mode="split", **kw)
        np.testing.assert_array_equal(np.asarray(ml), np.asarray(sp))
        np.testing.assert_array_equal(np.asarray(dml), np.asarray(dsp))

    @pytest.mark.slow
    def test_deep_stack_keeps_opaque_floor(self):
        # 4 translucent quads in front of an opaque one. With L=4 the
        # split equals ml with L=5 (the opaque floor is free); with
        # L=2 the two nearest translucents blend over the opaque —
        # where the "L nearest fragments" contract would have lost the
        # opaque to truncation and bled the clear color through.
        stack = [(0.8, (255, 0, 0, 100)), (0.6, (0, 255, 0, 100)),
                 (0.4, (0, 0, 255, 100)), (0.2, (255, 255, 0, 100)),
                 (-0.5, (40, 40, 40, 255))]
        scene = device.upload(_quad_batch(stack))
        vp = _vp()
        kw = dict(width=48, height=48, backend="pallas")
        sp4, _, _ = device._render_frame_peeled_core(
            scene, vp, None, peel_mode="split", layers=4, **kw)
        ml5, _, _ = device._render_frame_peeled_core(
            scene, vp, None, peel_mode="ml", layers=5, **kw)
        np.testing.assert_array_equal(np.asarray(sp4), np.asarray(ml5))

        sp2, _, _ = device._render_frame_peeled_core(
            scene, vp, None, peel_mode="split", layers=2, **kw)
        a = 100 / 255.0
        want = np.array([40, 40, 40], float)     # opaque over clear
        for rgb in ([0, 255, 0], [255, 0, 0]):   # 2 nearest, b-to-f
            want = np.array(rgb, float) * a + want * (1 - a)
        np.testing.assert_allclose(
            np.asarray(sp2)[24, 24, :3], np.round(want), atol=1)

    def test_coplanar_translucent_opaque_tie(self):
        # translucent coplanar WITH an opaque quad: the (z, id) order
        # decides — drawn after (larger id) composites in front, drawn
        # before is hidden behind the opaque winner. Split == ml.
        for order in ((0, 1), (1, 0)):
            quads = [None, None]
            quads[order[0]] = (0.0, (0, 0, 255, 128))    # translucent
            quads[order[1]] = (0.0, (200, 0, 0, 255))    # opaque
            scene = device.upload(_quad_batch(quads))
            kw = dict(width=48, height=48, layers=3, backend="pallas")
            ml, _, _ = device._render_frame_peeled_core(
                scene, _vp(), None, peel_mode="ml", **kw)
            sp, _, _ = device._render_frame_peeled_core(
                scene, _vp(), None, peel_mode="split", **kw)
            np.testing.assert_array_equal(np.asarray(ml), np.asarray(sp),
                                          err_msg=f"order={order}")

    @pytest.mark.slow
    def test_compacted_and_packed_match_dense(self):
        scene, vp, bones = self._demo()
        kw = dict(width=96, height=96, layers=3, backend="pallas")
        caps = device.measure_live_tap_tiles(
            scene, vp, bones, width=96, height=96, layers=3,
            mode="split")
        dense, _, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="split", **kw)
        compact, _, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="split", tap_tiles=caps, **kw)
        np.testing.assert_array_equal(np.asarray(dense),
                                      np.asarray(compact))
        pk, _, _ = device._render_frame_peeled_core(
            scene, vp, bones, peel_mode="split", packed=True,
            tap_tiles=caps, **kw)
        np.testing.assert_array_equal(
            device.unpack_rgba(np.asarray(pk)), np.asarray(dense))

    def test_validation(self):
        scene, vp, bones = self._demo()
        with pytest.raises(ValueError, match="split"):
            device._render_frame_peeled_core(
                scene, vp, bones, width=96, height=96, layers=3,
                backend="scan", peel_mode="split")
        with pytest.raises(ValueError, match="cap pair"):
            device._render_frame_peeled_core(
                scene, vp, bones, width=96, height=96, layers=3,
                backend="pallas", peel_mode="ml", tap_tiles=(4, 4))

    @pytest.mark.slow
    def test_mipmap_packed_and_compacted_match(self):
        """The tile-major mip composite: packed mipmap peel round-trips
        the unpacked frame, compacted == dense, for split AND ml."""
        import jax

        # XLA CPU segfaults compiling this test's ml-leg program after
        # ~290 suite tests' worth of accumulated compile state (crash
        # in backend_compile_and_load; not reproducible with a short
        # prefix or standalone) — start from a clean compilation cache
        jax.clear_caches()
        scene, vp, bones = self._demo()
        caps = device.measure_live_tap_tiles(
            scene, vp, bones, width=96, height=96, layers=3,
            mode="split")
        for mode, cap in (("split", caps), ("ml", caps[0] + caps[1])):
            kw = dict(width=96, height=96, layers=3, backend="pallas",
                      mipmap=True, peel_mode=mode)
            dense, dd, _ = device._render_frame_peeled_core(
                scene, vp, bones, **kw)
            pk, dp, _ = device._render_frame_peeled_core(
                scene, vp, bones, packed=True, tap_tiles=cap, **kw)
            np.testing.assert_array_equal(
                device.unpack_rgba(np.asarray(pk)), np.asarray(dense),
                err_msg=mode)
            np.testing.assert_array_equal(np.asarray(dp),
                                          np.asarray(dd))

    @pytest.mark.slow
    def test_animated_alpha_moves_triangles_between_passes(self):
        """Material alpha is the rScheduler-animatable mat_color
        channel, so the opacity partition is PER-FRAME DATA: the same
        jitted split core must render a material as opaque at alpha 1
        and as translucent at alpha 0.5 with no retrace (only
        mat_color values change)."""
        import dataclasses

        import jax.numpy as jnp

        batch = _quad_batch([
            (-1.0, (255, 0, 0, 255)),     # back, opaque, slot 0
            (0.0, (0, 0, 255, 255)),      # front quad -> slot 1
        ])
        batch.tri_material = np.array([0, 0, 1, 1], np.int32)
        batch.mat_color_host = np.ones((2, 4), np.float32)
        scene = device.upload(batch)
        vp = _vp()
        kw = dict(width=48, height=48, layers=3, backend="pallas",
                  peel_mode="split")

        def run(scene):
            c, _, _ = device._render_frame_peeled_core(scene, vp, None,
                                                       **kw)
            return np.asarray(c)

        before = device._render_frame_peeled_core._cache_size()
        opaque_px = run(scene)[24, 24]
        glass = dataclasses.replace(
            scene, mat_color=jnp.asarray(
                [[1, 1, 1, 1], [1, 1, 1, 0.5]], jnp.float32))
        glass_px = run(glass)[24, 24]
        assert device._render_frame_peeled_core._cache_size() \
            == before + 1, "alpha change must not retrace"

        np.testing.assert_array_equal(opaque_px[:3], [0, 0, 255])
        a = round(255 * 0.5) / 255.0
        want = np.array([0, 0, 255]) * a + np.array([255, 0, 0]) * (1 - a)
        np.testing.assert_allclose(glass_px[:3], np.round(want), atol=1)
