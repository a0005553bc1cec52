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


class TestCrossChunkTies:
    def test_coplanar_duplicate_later_index_wins(self):
        """Exact-z ties must resolve by global triangle id (the oracle
        rule) even when nearest-first chunk ordering processes the
        later-index triangle's chunk FIRST. Construction: a red
        triangle in chunk 0, a bit-identical blue duplicate >CT indices
        later whose chunk also contains a nearer decoy (so that chunk
        sorts first)."""
        import jax.numpy as jnp

        from mt_renderer_tpu.scene.model import DrawBatch

        def tri_batch(color, extra_near=False, fillers=0):
            # a large screen-facing triangle at z=0.5 (+ optional small
            # nearer decoy off to the side, + offscreen index fillers
            # to force the next batch into a different chunk)
            pos = [[-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.8, 0.5]]
            tris = [[0, 1, 2]]
            flat = [list(color) + [255.0]]
            if extra_near:
                pos += [[0.85, 0.85, 0.1], [0.95, 0.85, 0.1],
                        [0.9, 0.95, 0.1]]
                tris += [[3, 4, 5]]
                flat += [[10.0, 10.0, 10.0, 255.0]]
            if fillers:
                base = len(pos)
                pos += [[30.0, 30.0, 0.9], [30.1, 30.0, 0.9],
                        [30.0, 30.1, 0.9]]
                tris += [[base, base + 1, base + 2]] * fillers
                flat += [[1.0, 1.0, 1.0, 255.0]] * fillers
            n = len(pos)
            t = len(tris)
            return DrawBatch(
                positions=np.asarray(pos, np.float32),
                uvs=np.zeros((n, 2), np.float32),
                joints=np.zeros((n, 4), np.int32),
                weights=np.zeros((n, 4), np.float32),
                tris=np.asarray(tris, np.int64),
                tri_texture=np.full(t, -1, np.int32),
                tri_parts=np.zeros(t, np.int32),
                tri_debug_id=np.zeros(t, np.int32),
                tri_flat=np.asarray(flat, np.float32),
            )

        from mt_renderer_tpu.render import pallas_raster as pr
        from mt_renderer_tpu.scene.model import merge_batches

        red = tri_batch((255.0, 0.0, 0.0), fillers=pr.CT)
        blue = tri_batch((0.0, 0.0, 255.0), extra_near=True)
        m = merge_batches(red, blue)
        scene = device.upload(m)
        # identity-ish view: NDC passthrough projection
        vp = np.eye(4, dtype=np.float32)
        color, depth = device.render_frame(
            scene, vp, None, width=128, height=128, backend="pallas"
        )
        c = np.asarray(color)
        # center pixel is covered by both coplanar copies — the later
        # (blue) triangle must win the exact-z tie
        center = c[64, 64]
        assert center[2] > 200 and center[0] < 50, center
        # sanity: the two copies really are in different chunks
        assert len(m.tris) > pr.CT


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

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_auto_maxc_pins_bin_chunks(self, seed):
        """auto_maxc re-derives the kernel's binning in host NumPy
        (device.py mirrors bin_chunks/pack_setup constants and bbox
        logic). This property test pins the two together: on randomized
        scenes the NumPy predictor at margin=1.0 must equal the kernel's
        true per-tile max, rounded up to the cap quantum — any drift in
        TILE_W/TILE_H/CT/overlap math fails loudly here instead of
        surfacing as an overflow event in production."""
        import jax.numpy as jnp

        from mt_renderer_tpu.render import pallas_raster as pr
        from mt_renderer_tpu.scene.model import DrawBatch

        rng = np.random.default_rng(seed)
        nt = int(rng.integers(50, 2500))
        pos = rng.uniform(-1.5, 1.5, (3 * nt, 3)).astype(np.float32)
        batch = DrawBatch(
            positions=pos,
            uvs=np.zeros((3 * nt, 2), np.float32),
            joints=np.zeros((3 * nt, 4), np.int32),
            weights=np.zeros((3 * nt, 4), np.float32),
            tris=np.arange(3 * nt, dtype=np.int32).reshape(nt, 3),
            tri_texture=np.full(nt, -1, np.int32),
            tri_parts=np.zeros(nt, np.int32),
            tri_debug_id=np.zeros(nt, np.int32),
        )
        from mt_renderer_tpu.app.camera import Camera

        width, height = 256, 128
        vp = np.asarray(Camera(position=[0, 0, 3.5]).view_proj())

        amc = device.auto_maxc(batch, vp, None,
                               width=width, height=height, margin=1.0)

        scene = device.upload(batch)
        clip = device.vertex_stage(scene, jnp.asarray(vp), None)
        setup = device.setup_stage(scene, clip, width, height)
        req = int(pr.required_maxc(setup, width=width, height=height))
        assert req > 0, "degenerate scene — nothing binned"
        # ≥: the predictor must never under-size the cap; ==: it must be
        # tight (same count module the 8-quantum round-up and the floor)
        assert amc >= req
        assert amc == max(8, -(-req // 8) * 8)

        # elementwise: the NumPy mirror reproduces the kernel's per-tile
        # candidate counts exactly, not just the max
        pred = device.predict_bin_counts(batch, vp, None,
                                         width=width, height=height)
        counts, _ = pr.bin_stats(setup, width=width, height=height)
        np.testing.assert_array_equal(pred.reshape(-1), np.asarray(counts))

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
