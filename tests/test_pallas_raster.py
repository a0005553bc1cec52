"""Differential tests: binned Pallas tile rasterizer vs the scan raster
and the CPU oracle (interpret mode on the CPU backend)."""

import numpy as np
import pytest

from mt_renderer_tpu.render import cpu_reference, device
from mt_renderer_tpu.scene import demo


@pytest.fixture(scope="module")
def scene_batch():
    return demo.build_demo_batch(instances=9, skinned=True)


def _inputs(instances=9, width=256, height=128):
    cam = demo.demo_camera(instances, width, height)
    return np.asarray(cam.view_proj()), demo.demo_bone_mats(0.5)


class TestPallasRaster:
    def test_matches_cpu_oracle(self, scene_batch):
        vp, bones = _inputs()
        want, want_d = cpu_reference.render(
            scene_batch, vp, 256, 128, bone_mats=bones
        )
        scene = device.upload(scene_batch)
        got, got_d = device.render_frame(
            scene, vp, bones, width=256, height=128, backend="pallas"
        )
        got = np.asarray(got)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32)).max(-1)
        assert (diff > 1).mean() <= 0.003
        assert (np.abs(np.asarray(got_d) - want_d) < 1e-4).mean() > 0.997

    def test_matches_scan_backend(self, scene_batch):
        vp, bones = _inputs()
        scene = device.upload(scene_batch)
        c1, d1 = device.render_frame(
            scene, vp, bones, width=256, height=128, backend="scan"
        )
        c2, d2 = device.render_frame(
            scene, vp, bones, width=256, height=128, backend="pallas"
        )
        # identical coverage; depth may differ by plane-vs-barycentric
        # float associativity only
        cov1 = np.asarray(d1) < 1.0
        cov2 = np.asarray(d2) < 1.0
        assert (cov1 == cov2).mean() > 0.999
        both = cov1 & cov2
        assert np.abs(np.asarray(d1)[both] - np.asarray(d2)[both]).max() < 1e-4

    def test_unaligned_resolution_pads(self, scene_batch):
        vp, bones = _inputs(width=200, height=100)
        scene = device.upload(scene_batch)
        c, d = device.render_frame(
            scene, vp, bones, width=200, height=100, backend="pallas"
        )
        assert np.asarray(c).shape == (100, 200, 4)
        assert (np.asarray(d) < 1.0).any()

    def test_empty_scene(self):
        batch = demo.build_demo_batch(instances=1, skinned=False)
        batch.tris = batch.tris[:0]
        batch.tri_texture = batch.tri_texture[:0]
        batch.tri_parts = batch.tri_parts[:0]
        batch.tri_debug_id = batch.tri_debug_id[:0]
        scene = device.upload(batch)
        vp, _ = _inputs(1, 128, 64)
        c, d = device.render_frame(
            scene, vp, None, width=128, height=64, backend="pallas"
        )
        assert (np.asarray(c) == 255).all()
        assert (np.asarray(d) == 1.0).all()


class TestBinStats:
    def test_counts_and_overflow(self, scene_batch):
        import jax.numpy as jnp

        from mt_renderer_tpu.render import pallas_raster as pr

        vp, bones = _inputs()
        scene = device.upload(scene_batch)
        clip = device.vertex_stage(scene, jnp.asarray(vp), jnp.asarray(bones))
        setup = device.setup_stage(scene, clip, 256, 128)
        counts, overflow = pr.bin_stats(setup, width=256, height=128)
        counts = np.asarray(counts)
        assert counts.shape == ((128 // pr.TILE_H) * (256 // pr.TILE_W),)
        assert counts.max() >= 1
        assert int(overflow) == 0
        # a cap of 0 makes every occupied tile overflow
        _, ov0 = pr.bin_stats(setup, width=256, height=128, maxc=0)
        assert int(ov0) == (counts > 0).sum()

    def test_overflow_detected_not_silent(self, scene_batch):
        """A scene engineered to overflow the binning cap must raise the
        diagnostic signal (VERDICT r1: the one correctness cliff)."""
        import jax

        from mt_renderer_tpu.render import pallas_raster as pr

        # many instances piled into few tiles: > 1 chunk per tile
        batch = demo.build_demo_batch(instances=64, skinned=False)
        scene = device.upload(batch)
        vp, _ = _inputs(64, 128, 64)
        before = pr.OVERFLOW_EVENTS
        with pytest.warns(RuntimeWarning, match="bin overflow"):
            c, d = device.render_frame(
                scene, vp, None, width=128, height=64,
                backend="pallas", maxc=1,
            )
            jax.block_until_ready((c, d))
            pr.flush_overflow_checks()
        assert pr.OVERFLOW_EVENTS > before

    def test_auto_maxc_renders_exact(self, scene_batch):
        """auto_maxc sizes the cap so pallas matches the scan backend
        with zero overflow events."""
        import jax

        from mt_renderer_tpu.render import pallas_raster as pr

        vp, bones = _inputs()
        scene = device.upload(scene_batch)
        maxc = device.auto_maxc(scene_batch, vp, bones, width=256, height=128)
        assert maxc >= 8
        before = pr.OVERFLOW_EVENTS
        c2, d2 = device.render_frame(
            scene, vp, bones, width=256, height=128, backend="pallas",
            maxc=maxc,
        )
        jax.block_until_ready((c2, d2))
        pr.flush_overflow_checks()
        assert pr.OVERFLOW_EVENTS == before
        c1, d1 = device.render_frame(
            scene, vp, bones, width=256, height=128, backend="scan"
        )
        assert ((np.asarray(d1) < 1.0) == (np.asarray(d2) < 1.0)).all()
