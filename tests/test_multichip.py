"""Multi-chip (shard_map band-sharded) rendering tests on the virtual
8-device CPU mesh. The sharded frame must be bit-identical to the
single-device frame — bands partition the pixel work exactly."""

import numpy as np
import pytest

from mt_renderer_tpu.parallel.tiles import make_row_mesh, render_frame_multichip
from mt_renderer_tpu.render import device
from mt_renderer_tpu.scene import demo


def _scene():
    batch = demo.build_demo_batch(instances=4, skinned=True)
    scene = device.upload(batch)
    cam = demo.demo_camera(4, 64, 64)
    vp = np.asarray(cam.view_proj())
    bones = demo.demo_bone_mats(0.7)
    return scene, vp, bones


class TestMultichip:
    @pytest.mark.parametrize("backend", ["scan", "pallas"])
    def test_sharded_matches_single(self, backend):
        scene, vp, bones = _scene()
        mesh = make_row_mesh(8)
        got_c, got_d = render_frame_multichip(
            scene, vp, bones, mesh=mesh, width=64, height=64,
            backend=backend,
        )
        want_c, want_d = device.render_frame(
            scene, vp, bones, width=64, height=64, backend=backend
        )
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))
        assert (np.asarray(got_d) < 1.0).any()

    def test_two_device_mesh(self):
        scene, vp, bones = _scene()
        mesh = make_row_mesh(2)
        c, d = render_frame_multichip(
            scene, vp, bones, mesh=mesh, width=32, height=32, backend="scan"
        )
        assert np.asarray(c).shape == (32, 32, 4)

    def test_packed_matches_unpacked(self):
        """packed=True emits the (H, W) u32 production frame from the
        sharded path — pixel-identical to the unpacked sharded frame."""
        scene, vp, bones = _scene()
        mesh = make_row_mesh(8)
        pc, pd = render_frame_multichip(
            scene, vp, bones, mesh=mesh, width=64, height=64,
            backend="pallas", packed=True,
        )
        uc, ud = render_frame_multichip(
            scene, vp, bones, mesh=mesh, width=64, height=64,
            backend="pallas",
        )
        assert np.asarray(pc).dtype == np.uint32
        np.testing.assert_array_equal(device.unpack_rgba(pc),
                                      np.asarray(uc))
        np.testing.assert_array_equal(np.asarray(pd), np.asarray(ud))

    def test_setup_shard_matches_replicated(self):
        """setup_shard=True (triangle-sharded vertex+setup, ONE
        all_gather of the column matrix) must be bit-identical to the
        replicated-setup band frame on the packed tap AND the mipmap
        trilinear paths — the shard view is an order-preserving row
        partition of the same arithmetic, and masked overlap rows bake
        REJECT like padding (r4 verdict weak #7)."""
        scene, vp, bones = _scene()
        mesh = make_row_mesh(8)
        for kw in (dict(packed=True),
                   dict(packed=True, mipmap=True),
                   dict(packed=True, lighting=True)):
            want, wd = render_frame_multichip(
                scene, vp, bones, mesh=mesh, width=64, height=60, **kw)
            got, gd = render_frame_multichip(
                scene, vp, bones, mesh=mesh, width=64, height=60,
                setup_shard=True, **kw)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
            np.testing.assert_array_equal(np.asarray(gd),
                                          np.asarray(wd))
        with pytest.raises(ValueError, match="setup_shard"):
            render_frame_multichip(
                scene, vp, bones, mesh=mesh, width=64, height=64,
                peel_layers=2, setup_shard=True)

    def test_packed_requires_pallas(self):
        scene, vp, bones = _scene()
        mesh = make_row_mesh(2)
        with pytest.raises(ValueError, match="packed"):
            render_frame_multichip(
                scene, vp, bones, mesh=mesh, width=32, height=32,
                backend="scan", packed=True,
            )

    @pytest.mark.parametrize("backend", ["scan", "pallas"])
    def test_unaligned_height(self, backend):
        """Heights not divisible by the mesh (1080/8 = 135 rows) render
        via ceil-band pad-and-crop, pixel-identical to single-chip."""
        scene, vp, bones = _scene()
        mesh = make_row_mesh(8)
        got_c, got_d = render_frame_multichip(
            scene, vp, bones, mesh=mesh, width=64, height=60,
            backend=backend,
        )
        want_c, want_d = device.render_frame(
            scene, vp, bones, width=64, height=60, backend=backend
        )
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))

    def test_graft_entry(self):
        import __graft_entry__ as ge

        fn, example = ge.entry()
        import jax

        out = jax.jit(fn)(*example)
        # entry() renders on the production path: packed-u32 RGBA frame
        a = np.asarray(out)
        assert a.shape == (256, 256) and a.dtype == np.uint32
        from mt_renderer_tpu.render.device import unpack_rgba

        assert unpack_rgba(a).shape == (256, 256, 4)

    @pytest.mark.slow
    def test_graft_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestServingExport:
    def test_export_roundtrip(self):
        """The render step exports to a self-contained artifact and
        serves identical frames after deserialisation."""
        import numpy as np

        from mt_renderer_tpu import serving
        from mt_renderer_tpu.render import device
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=4, skinned=True)
        scene = device.upload(batch)
        cam = demo.demo_camera(4, 64, 64)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.4)

        blob = serving.export_render(scene, width=64, height=64,
                                     backend="scan")
        assert len(blob) > 1000

        served = serving.load_render(blob)
        got_c, got_d = served(scene, vp, bones)
        want_c, want_d = device.render_frame(
            scene, vp, bones, width=64, height=64, backend="scan"
        )
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))


class TestGeometrySplit:
    def test_matches_single_device(self):
        from mt_renderer_tpu.parallel.tiles import render_frame_geomsplit

        scene, vp, bones = _scene()
        mesh = make_row_mesh(8)
        got_c, got_d = render_frame_geomsplit(
            scene, vp, bones, mesh=mesh, width=64, height=64
        )
        want_c, want_d = device.render_frame(
            scene, vp, bones, width=64, height=64, backend="scan"
        )
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        # depth: setup math fuses differently inside shard_map, so z is
        # not bit-equal across call sites (see CLAUDE.md invariant) —
        # allow a couple of ulps
        np.testing.assert_allclose(
            np.asarray(got_d), np.asarray(want_d), atol=4e-6
        )
        assert (np.asarray(got_d) < 1.0).any()


class TestMultichipQualityFlags:
    def test_lighting_matches_single_device(self):
        from mt_renderer_tpu.formats.mfx import Shader2File
        from mt_renderer_tpu.formats.mod import ModelFile
        from mt_renderer_tpu import fixtures
        from mt_renderer_tpu.scene.model import build_draw_batch

        model = ModelFile(fixtures.build_model_rich())
        shader2 = Shader2File(fixtures.build_shader2())
        batch = build_draw_batch(model, None, shader2, None)
        scene = device.upload(batch)
        vp = np.asarray(demo.demo_camera(1, 64, 64).view_proj())
        mesh = make_row_mesh(8)
        got, _ = render_frame_multichip(
            scene, vp, None, mesh=mesh, width=64, height=64,
            backend="scan", lighting=True, mipmap=True,
        )
        want, _ = device.render_frame(
            scene, vp, None, width=64, height=64, backend="scan",
            lighting=True, mipmap=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestMultichipTapCompaction:
    """Per-band compacted texture taps on the packed sharded path
    (auto_tap_tiles(bands=n)): bit-identical to dense, cap bounds the
    worst band."""

    def test_compacted_matches_dense(self):
        batch = demo.build_demo_batch(instances=4, skinned=True)
        scene = device.upload(batch)
        cam = demo.demo_camera(4, 64, 64)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.7)
        mesh = make_row_mesh(4)
        tt = device.auto_tap_tiles(batch, vp, bones, width=64,
                                   height=64, bands=4)
        kw = dict(mesh=mesh, width=64, height=64, backend="pallas",
                  packed=True)
        dense, dd = render_frame_multichip(scene, vp, bones, **kw)
        compact, cd = render_frame_multichip(scene, vp, bones,
                                             tap_tiles=tt, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))
        np.testing.assert_array_equal(np.asarray(cd), np.asarray(dd))

    def test_band_grid_prediction_matches_kernel(self):
        """predict_bin_counts(y0, grid_rows) mirrors the band kernels'
        own binning: the band cap must bound every band's live tiles."""
        from mt_renderer_tpu.render import pallas_raster as pr

        batch = demo.build_demo_batch(instances=9, skinned=False)
        scene = device.upload(batch)
        cam = demo.demo_camera(9, 128, 96)
        vp = np.asarray(cam.view_proj())
        n = 3
        tt = device.auto_tap_tiles(batch, vp, None, width=128,
                                   height=96, bands=n, margin=1.0)
        mesh = make_row_mesh(n)
        _, d = render_frame_multichip(
            scene, vp, None, mesh=mesh, width=128, height=96,
            backend="pallas", packed=True, tap_tiles=tt)
        cov = np.asarray(d) < 1.0
        band_h = -(-96 // n)
        worst = 0
        for i in range(n):
            band = np.zeros((-(-band_h // pr.TILE_H) * pr.TILE_H, 128),
                            bool)
            rows = cov[i * band_h:(i + 1) * band_h]
            band[:rows.shape[0]] = rows
            worst = max(worst, int(
                band.reshape(-1, pr.TILE_H, 1, 128)
                .any(axis=(1, 3)).sum()))
        assert tt >= worst


class TestGeomsplitTapCompaction:
    def test_compacted_matches_dense(self):
        from mt_renderer_tpu.parallel.tiles import render_frame_geomsplit

        batch = demo.build_demo_batch(instances=4, skinned=True)
        scene = device.upload(batch)
        cam = demo.demo_camera(4, 64, 64)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.7)
        mesh = make_row_mesh(4)
        tt = device.auto_tap_tiles(batch, vp, bones, width=64, height=64)
        kw = dict(mesh=mesh, width=64, height=64, backend="pallas",
                  packed=True)
        dense, dd = render_frame_geomsplit(scene, vp, bones, **kw)
        compact, cd = render_frame_geomsplit(scene, vp, bones,
                                             tap_tiles=tt, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))
        np.testing.assert_array_equal(np.asarray(cd), np.asarray(dd))


class TestMultichipPeel:
    """Band-sharded split-OIT: the peel is per-pixel, so bands compose
    with zero collectives — pixel-identical to the single-chip split
    engine, on opaque AND mixed translucent content."""

    def _glass_scene(self):
        batch = demo.build_demo_batch(instances=4, skinned=True)
        demo.make_translucent(batch, 4, fraction=0.5)
        scene = device.upload(batch)
        cam = demo.demo_camera(4, 64, 64)
        return scene, np.asarray(cam.view_proj()), demo.demo_bone_mats(0.7)

    @pytest.mark.parametrize("n", [2, 8])
    @pytest.mark.slow
    def test_peeled_bands_match_single(self, n):
        scene, vp, bones = self._glass_scene()
        want_c, want_d = device.render_frame_peeled(
            scene, vp, bones, width=64, height=64, layers=3,
            backend="pallas", peel_mode="split")
        got_c, got_d = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(n), width=64, height=64,
            peel_layers=3)
        np.testing.assert_array_equal(np.asarray(got_c),
                                      np.asarray(want_c))
        np.testing.assert_array_equal(np.asarray(got_d),
                                      np.asarray(want_d))

    @pytest.mark.slow
    def test_packed_and_unaligned_height(self):
        scene, vp, bones = self._glass_scene()
        # 52 rows over 8 chips: 7-row bands pad to 16-row tiles + crop
        want_c, _ = device.render_frame_peeled(
            scene, vp, bones, width=64, height=52, layers=3,
            backend="pallas", peel_mode="split")
        got_p, _ = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(8), width=64, height=52,
            peel_layers=3, packed=True)
        np.testing.assert_array_equal(
            device.unpack_rgba(np.asarray(got_p)), np.asarray(want_c))

    def test_validation(self):
        scene, vp, bones = self._glass_scene()
        with pytest.raises(ValueError, match="multichip peel"):
            render_frame_multichip(
                scene, vp, bones, mesh=make_row_mesh(2), width=64,
                height=64, peel_layers=3, backend="scan")

    @pytest.mark.slow
    def test_banded_caps_match_dense(self):
        """Per-band split-cap sizing (measure_live_tap_tiles(bands=n)):
        the capped banded peel is pixel-identical to the dense one, and
        the caps are in PER-BAND 128-px row units (≤ that band's
        segment-row count)."""
        from mt_renderer_tpu.render import pallas_raster as pr

        scene, vp, bones = self._glass_scene()
        n = 4
        caps = device.measure_live_tap_tiles(
            scene, vp, bones, width=64, height=64, layers=3,
            mode="split", bands=n)
        band_h = -(-64 // n)
        pb = -(-band_h // pr.TILE_H) * pr.TILE_H
        nrows_band = (-(-64 // pr.TILE_W)) * pb
        assert 0 < caps[0] <= nrows_band
        assert 0 < caps[1] <= nrows_band * 3
        dense_c, dense_d = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(n), width=64,
            height=64, peel_layers=3)
        got_c, got_d = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(n), width=64,
            height=64, peel_layers=3, tap_tiles=caps)
        np.testing.assert_array_equal(np.asarray(got_c),
                                      np.asarray(dense_c))
        np.testing.assert_array_equal(np.asarray(got_d),
                                      np.asarray(dense_d))

    def test_bands_requires_split_mode(self):
        scene, vp, bones = self._glass_scene()
        with pytest.raises(ValueError, match="bands"):
            device.measure_live_tap_tiles(
                scene, vp, bones, width=64, height=64, layers=3,
                mode="ml", bands=2)

    @pytest.mark.slow
    def test_mipmap_peeled_bands_match_single(self):
        scene, vp, bones = self._glass_scene()
        want_c, want_d = device.render_frame_peeled(
            scene, vp, bones, width=64, height=64, layers=3,
            backend="pallas", peel_mode="split", mipmap=True,
            lighting=True)
        got_c, got_d = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(4), width=64,
            height=64, peel_layers=3, mipmap=True, lighting=True)
        np.testing.assert_array_equal(np.asarray(got_c),
                                      np.asarray(want_c))
        np.testing.assert_array_equal(np.asarray(got_d),
                                      np.asarray(want_d))


class TestMultichipMipmapExact:
    @pytest.mark.slow
    def test_banded_mip_caps_match_dense(self):
        """Banded trilinear with the worst-band scalar cap
        (auto_tap_tiles(bands=n)) is pixel-identical to dense taps —
        what bench --multichip --mipmap wires."""
        batch = demo.build_demo_batch(instances=4, skinned=True)
        scene = device.upload(batch)
        cam = demo.demo_camera(4, 64, 64)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.7)
        caps = device.auto_tap_tiles(batch, vp, bones,
                                     width=64, height=64, bands=4)
        dense, _ = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(4), width=64,
            height=64, mipmap=True, lighting=True)
        got, _ = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(4), width=64,
            height=64, mipmap=True, lighting=True, tap_tiles=caps)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(dense))

    @pytest.mark.slow
    def test_pallas_mipmap_bands_bit_identical(self):
        """Analytic per-pixel LOD (device._analytic_lod) makes the
        trilinear shade elementwise, so band-sharded mipmap is now
        BIT-identical to single-chip — under forward-difference LOD the
        derivative clamp at band seams could differ from the full
        frame's."""
        scene, vp, bones = _scene()
        got, gd = render_frame_multichip(
            scene, vp, bones, mesh=make_row_mesh(8), width=64, height=64,
            mipmap=True, lighting=True)
        want, wd = device.render_frame(
            scene, vp, bones, width=64, height=64, backend="pallas",
            mipmap=True, lighting=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_pallas_mipmap_bands_tri_pool(self):
        """The tri-row pool (128 B packed physical rows, the production
        trilinear pool) broadcasts through the band shard_map like any
        scene leaf and the fused one-gather sampler runs per band —
        banded == single-chip, and single-chip tri == quad."""
        _, vp, bones = _scene()
        batch = demo.build_demo_batch(instances=4, skinned=True)
        tri = device.upload(batch, pool_mode="tri")
        quad = device.upload(batch)
        got, _ = render_frame_multichip(
            tri, vp, bones, mesh=make_row_mesh(8), width=64, height=64,
            mipmap=True, lighting=True)
        want, _ = device.render_frame(
            tri, vp, bones, width=64, height=64, backend="pallas",
            mipmap=True, lighting=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        ref, _ = device.render_frame(
            quad, vp, bones, width=64, height=64, backend="pallas",
            mipmap=True, lighting=True)
        # tri vs quad are differently-fused programs: the documented
        # cross-program ±1 u8 LSB envelope (the sampler itself is
        # bit-exact — TestTriPool's dense sweep)
        d = np.abs(np.asarray(want).astype(np.int16)
                   - np.asarray(ref).astype(np.int16))
        assert d.max() <= 1 and (d != 0).mean() < 0.02

    def test_pallas_mipmap_bands_bc7_pool(self):
        """The compressed-resident bc7 pool (block rows + the partition
        hint pool) broadcasts through the band shard_map like any scene
        leaf — banded == single-chip bit-exactly, in-register decode
        and all."""
        _, vp, bones = _scene()
        batch = demo.build_demo_batch(instances=4, skinned=True)
        bc7 = device.upload(batch, pool_mode="bc7")
        got, _ = render_frame_multichip(
            bc7, vp, bones, mesh=make_row_mesh(8), width=64, height=64,
            mipmap=True, lighting=True)
        want, _ = device.render_frame(
            bc7, vp, bones, width=64, height=64, backend="pallas",
            mipmap=True, lighting=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
