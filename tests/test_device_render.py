"""Differential tests: jitted device renderer vs the CPU reference oracle.

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu with 8 virtual
devices); the same code compiles for TPU unchanged.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mt_renderer_tpu import dti as dti_mod
from mt_renderer_tpu import fixtures
from mt_renderer_tpu.app.camera import Camera
from mt_renderer_tpu.formats.mfx import Shader2File
from mt_renderer_tpu.formats.mod import ModelFile
from mt_renderer_tpu.formats.mrl import MaterialFile
from mt_renderer_tpu.render import cpu_reference, device
from mt_renderer_tpu.resources.manager import ResourceManager
from mt_renderer_tpu.scene.model import build_draw_batch


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    fixtures.write_fixture_tree(root)
    rm = ResourceManager(root)
    shader2 = Shader2File(
        rm.get_resource(fixtures.SHADER_PACKAGE_PATH, dti_mod.from_name("rShader2")).read()
    )
    model = ModelFile(
        rm.get_resource(fixtures.MODEL_PATH, dti_mod.from_name("rModel")).read()
    )
    material = MaterialFile(
        rm.get_resource(fixtures.MODEL_PATH, dti_mod.from_name("rMaterial")).read(),
        shader2,
    )
    return rm, shader2, model, material


def _vp(yaw=20.0, pitch=-15.0, pos=(1.5, 1.2, 4.0)):
    cam = Camera(position=list(pos), yaw=yaw, pitch=pitch)
    cam.aspect = 1.0
    return cam.view_proj()


def assert_frames_match(got, want, max_bad_frac=0.003, tol=1):
    """Frames match when all but a sliver of edge pixels agree within tol.

    Float associativity differs between the two paths, so pixels exactly on
    triangle edges/depth ties may resolve differently; everything else must
    agree to within `tol` color steps.
    """
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32)).max(axis=-1)
    bad = (diff > tol).mean()
    assert bad <= max_bad_frac, f"{bad:.4%} pixels differ (> {tol})"


class TestDeviceVsCpu:
    def test_textured_static(self, scene):
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        vp = _vp()
        want, want_depth = cpu_reference.render(batch, vp, 128, 128)
        dscene = device.upload(batch)
        got, got_depth = device.render_frame(
            dscene, vp, width=128, height=128
        )
        got = np.asarray(got)
        assert_frames_match(got, want)
        # depth buffers agree off edges too
        dd = np.abs(np.asarray(got_depth) - want_depth)
        assert (dd < 1e-4).mean() > 0.997

    def test_packed_output_equivalent(self, scene):
        """packed=True (the production u32 frame format) must unpack to
        the exact bytes of the default (H, W, 4) u8 frame."""
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        vp = _vp()
        dscene = device.upload(batch)
        ref, ref_d = device.render_frame(
            dscene, vp, width=128, height=128, backend="pallas"
        )
        got, got_d = device.render_frame(
            dscene, vp, width=128, height=128, backend="pallas", packed=True
        )
        assert got.dtype == jnp.uint32 and got.shape == (128, 128)
        np.testing.assert_array_equal(device.unpack_rgba(got),
                                      np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))

    def test_untextured_debug_palette(self, scene):
        rm, shader2, model, _ = scene
        batch = build_draw_batch(model, None, shader2, rm)
        vp = _vp(yaw=-35.0, pitch=10.0, pos=(-1.0, -0.8, 3.5))
        want, _ = cpu_reference.render(batch, vp, 96, 96)
        got, _ = device.render_frame(device.upload(batch), vp, width=96, height=96)
        assert_frames_match(np.asarray(got), want)

    def test_skinned(self, scene):
        rm, shader2, _, material = scene
        model = ModelFile(
            rm.get_resource("model/fixture_cube_skinned", dti_mod.from_name("rModel")).read()
        )
        batch = build_draw_batch(model, material, shader2, rm)
        bones = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        bones[1, 0, 3] = 0.8  # swing the +z half sideways
        vp = _vp()
        want, _ = cpu_reference.render(batch, vp, 128, 128, bone_mats=bones)
        got, _ = device.render_frame(
            device.upload(batch), vp, bones, width=128, height=128
        )
        assert_frames_match(np.asarray(got), want)

    def test_empty_scene_clears(self, scene):
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm, parts_disp=[False, False])
        got, depth = device.render_frame(
            device.upload(batch), _vp(), width=64, height=64
        )
        assert (np.asarray(got) == 255).all()
        assert (np.asarray(depth) == 1.0).all()

    def test_parts_mask_on_device(self, scene):
        """Per-frame parts toggling without re-upload (model.rs:318-320):
        set_parts_mask must match a host-side parts_disp rebuild and must
        not trigger a retrace."""
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        assert set(batch.tri_parts) == {0, 1}
        dscene = device.upload(batch)
        vp = _vp()
        full, _ = device.render_frame(dscene, vp, width=96, height=96)
        misses = device._render_frame_core._cache_size()

        masked = device.set_parts_mask(dscene, [True, False])
        got, _ = device.render_frame(masked, vp, width=96, height=96)
        assert device._render_frame_core._cache_size() == misses

        host = build_draw_batch(model, material, shader2, rm,
                                parts_disp=[True, False])
        want, _ = device.render_frame(device.upload(host), vp,
                                      width=96, height=96)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert (np.asarray(got) != np.asarray(full)).any()

        # toggling back restores the full frame
        restored = device.set_parts_mask(masked, [True, True])
        back, _ = device.render_frame(restored, vp, width=96, height=96)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(full))

    def test_jit_cache_stable_across_frames(self, scene):
        # same (resolution, chunk) must not retrace for new camera/bones
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        dscene = device.upload(batch)
        f = device._render_frame_core
        device.render_frame(dscene, _vp(), width=64, height=64)
        misses_before = f._cache_size()
        device.render_frame(dscene, _vp(yaw=90.0), width=64, height=64)
        assert f._cache_size() == misses_before


class TestHeavySkinning:
    """>4-weight multi-stream skinning (rmodel.rs:186-188 weight_num,
    rshader2.rs:425-450 duplicate Joint/Weight streams)."""

    def _batch(self):
        from mt_renderer_tpu.formats.mfx import Shader2File
        from mt_renderer_tpu.formats.mod import ModelFile

        model = ModelFile(fixtures.build_model_skin8())
        shader2 = Shader2File(fixtures.build_shader2())
        return build_draw_batch(model, None, shader2, None)

    def _bones(self):
        bones = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
        bones[:, 0, 3] = 0.25 * np.arange(8)
        bones[:, 1, 3] = np.array([0, 1, 0, -1, 0, 1, 0, -1], np.float32) * 0.1
        return bones

    def test_eight_weight_vertex_stage(self):
        import jax.numpy as jnp

        batch = self._batch()
        assert batch.joints.shape[1] == 8 and batch.skinned
        np.testing.assert_allclose(batch.weights.sum(1), 1.0, atol=1e-6)

        bones = self._bones()
        homo = np.concatenate(
            [batch.positions, np.ones((batch.num_vertices, 1), np.float32)], 1
        )
        m = bones[batch.joints]
        want = np.einsum("vw,vwij,vj->vi", batch.weights, m, homo)[:, :3]

        scene = device.upload(batch)
        clip = device.vertex_stage(
            scene, jnp.eye(4, dtype=jnp.float32), jnp.asarray(bones)
        )
        # the device scene is de-indexed corner-PLANAR ([all corner0s |
        # corner1s | corner2s], padded): compare the real corners per
        # plane against the expected per-vertex positions
        t = len(batch.tris)
        tp = np.asarray(clip).shape[0] // 3
        for i in range(3):
            got = np.asarray(clip)[i * tp: i * tp + t, :3]
            np.testing.assert_allclose(got, want[batch.tris[:, i]],
                                       atol=1e-5)

        # the old 4-influence clamp would deform differently — guard it
        w4 = batch.weights[:, :4] / batch.weights[:, :4].sum(1, keepdims=True)
        m4 = bones[batch.joints[:, :4]]
        clamped = np.einsum("vw,vwij,vj->vi", w4, m4, homo)[:, :3]
        assert np.abs(clamped - want).max() > 0.05

    def test_blend_paths_agree_on_large_palettes(self):
        """The one-hot MXU path (<= 128 joints — covers the 96-joint
        world scene whose (V, W, 4, 4) matrix gather tile-padded 32x
        and OOM'd HBM) and the wide (nj, 16) row-gather fallback both
        reproduce the straight einsum."""
        from types import SimpleNamespace

        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        v, w = 1000, 8
        assert 96 <= device.ONEHOT_SKIN_MAX_JOINTS < 200
        for nj in (96, 200):          # one-hot path / wide-gather path
            joints = rng.integers(0, nj, (v, w)).astype(np.int32)
            weights = rng.random((v, w)).astype(np.float32)
            weights /= weights.sum(1, keepdims=True)
            bones = rng.normal(size=(nj, 4, 4)).astype(np.float32)
            scene = SimpleNamespace(joints=jnp.asarray(joints),
                                    weights=jnp.asarray(weights),
                                    num_joints=nj)
            got = np.asarray(
                device._blend_bone_mats(scene, jnp.asarray(bones)))
            want = np.einsum("vw,vwij->vij", weights, bones[joints])
            np.testing.assert_allclose(got, want, atol=2e-5,
                                       err_msg=f"nj={nj}")

    def test_eight_weight_render_matches_oracle(self):
        batch = self._batch()
        bones = self._bones()
        vp = _vp()
        want, _ = cpu_reference.render(batch, vp, 96, 96, bone_mats=bones)
        got, _ = device.render_frame(
            device.upload(batch), vp, bones, width=96, height=96
        )
        assert_frames_match(np.asarray(got), want)


class TestMipmapping:
    def test_upload_builds_pyramid(self, scene):
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=1, skinned=False)
        ds = device.upload(batch)
        # 64x64 texture -> 7 mip levels (64..1)
        assert ds.num_mips == 7
        off, h, w = np.asarray(ds.mip_table)[0, -1]
        assert (h, w) == (1, 1)
        # top of the pyramid is the average color of the texture
        avg = batch.textures[0].astype(np.float64).mean((0, 1))
        top = np.asarray(ds.mip_pool)[off, :4]
        assert np.abs(top.astype(np.float64) - avg).max() < 12

    def test_mixed_size_textures_share_flat_pool(self):
        """Heterogeneous texture sizes cost exactly their own texels —
        mip 0 lives in the same flat pool as the pyramid (no padded
        atlas), and sampling stays correct per texture."""
        from mt_renderer_tpu.scene import demo
        from mt_renderer_tpu.scene.model import merge_batches

        a = demo.build_demo_batch(instances=1, skinned=False, texture_size=64)
        b = demo.build_demo_batch(instances=1, skinned=False, texture_size=16)
        b.positions = b.positions + np.array([3.0, 0, 0], np.float32)
        m = merge_batches(a, b)
        ds = device.upload(m)
        pyramid_64 = sum((64 >> i) ** 2 for i in range(7))   # 5461
        pyramid_16 = sum((16 >> i) ** 2 for i in range(5))   # 341
        assert ds.mip_pool.shape[0] == pyramid_64 + pyramid_16

        vp = _vp(pos=(1.5, 0.5, 7.0))
        want, _ = cpu_reference.render(m, vp, 128, 128)
        got, _ = device.render_frame(ds, vp, width=128, height=128)
        assert_frames_match(np.asarray(got), want)

    @pytest.mark.slow
    def test_packed_tile_major_matches_unpacked(self):
        """The packed mipmap path (tile-major compacted trilinear
        shade) must reproduce the plane-major unpacked render exactly,
        compacted and dense."""
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=4, skinned=True)
        ds = device.upload(batch)
        vp = np.asarray(demo.demo_camera(4, 96, 96).view_proj())
        bones = demo.demo_bone_mats(0.5)
        kw = dict(width=96, height=96, backend="pallas", mipmap=True,
                  lighting=True)
        u8, d8 = device.render_frame(ds, vp, bones, **kw)
        tt = device.auto_tap_tiles(batch, vp, bones, width=96, height=96)
        for cap in (None, tt):
            pk, dp = device.render_frame(ds, vp, bones, packed=True,
                                         tap_tiles=cap, **kw)
            np.testing.assert_array_equal(
                device.unpack_rgba(np.asarray(pk)), np.asarray(u8),
                err_msg=f"cap={cap}")
            np.testing.assert_array_equal(np.asarray(dp),
                                          np.asarray(d8))

    def test_analytic_lod_known_values(self):
        """Absolute pin for _analytic_lod (the differential tests only
        pin the three mipmap paths to each other): du/dx = gux − u·gqx
        etc., rho = max(|du|·tw, |dv|·th), lod = log2(max(rho, 1e-6))."""
        import jax.numpy as jnp

        one = jnp.ones((4, 4), jnp.float32)
        z = jnp.zeros((4, 4), jnp.float32)
        # pure-affine u with du/dx = 0.5 on a 64-wide texture -> lod 5
        lod = device._analytic_lod(0.3 * one, 0.7 * one, 0.5 * one,
                                   z, z, z, z, z, 16 * one, 64 * one)
        np.testing.assert_allclose(np.asarray(lod), 5.0, atol=1e-6)
        # the perspective term cancels the gradient exactly:
        # du/dx = 0.5 - 2.0 * 0.25 = 0 -> rho clamps to 1e-6
        lod2 = device._analytic_lod(2.0 * one, z, 0.5 * one, z, z, z,
                                    0.25 * one, z, 16 * one, 16 * one)
        np.testing.assert_allclose(np.asarray(lod2), np.log2(1e-6),
                                   rtol=1e-5)

    def test_mip0_matches_bilinear(self, scene):
        # a close-up view magnifies: lod <= 0 -> trilinear == bilinear mip0
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=1, skinned=False)
        ds = device.upload(batch)
        cam_vp = _vp(pos=(0.2, 0.1, 2.2))
        c0, _ = device.render_frame(ds, cam_vp, None, width=96, height=96)
        c1, _ = device.render_frame(ds, cam_vp, None, width=96, height=96,
                                    mipmap=True)
        diff = np.abs(np.asarray(c0).astype(int) - np.asarray(c1).astype(int))
        assert (diff.max(-1) > 2).mean() < 0.02

    def test_arith_mip_addressing_exact(self):
        """The pallas mipmap path derives level offsets/extents
        arithmetically from the winner's mip-0 constants
        (_trilinear_arith); it must reproduce the mip_table-based
        sample_trilinear BIT-EXACTLY, across mixed texture sizes
        including non-power-of-2."""
        import jax.numpy as jnp

        from mt_renderer_tpu.scene import demo
        from mt_renderer_tpu.scene.model import merge_batches

        a = demo.build_demo_batch(instances=1, skinned=False,
                                  texture_size=64)
        b = demo.build_demo_batch(instances=1, skinned=False,
                                  texture_size=16)
        c = demo.build_demo_batch(instances=1, skinned=False,
                                  texture_size=33)
        ds = device.upload(merge_batches(merge_batches(a, b), c))
        rng = np.random.default_rng(1)
        n = 4096
        lyr = rng.integers(0, ds.mip_table.shape[0], n).astype(np.int32)
        u = jnp.asarray(rng.uniform(-0.2, 1.2, n).astype(np.float32)
                        ).reshape(64, 64)
        v = jnp.asarray(rng.uniform(-0.2, 1.2, n).astype(np.float32)
                        ).reshape(64, 64)
        lod = jnp.asarray(
            rng.uniform(-1, ds.num_mips + 1, n).astype(np.float32)
        ).reshape(64, 64)
        want = device.sample_trilinear(
            ds, jnp.asarray(lyr).reshape(64, 64), u, v, lod, planes=True
        )
        t0 = np.asarray(ds.mip_table[:, 0, :])
        mk = lambda col: jnp.asarray(
            t0[:, col][lyr].reshape(64, 64).astype(np.int32))
        got = device._trilinear_arith(
            ds.mip_pool, mk(0), mk(1), mk(2), lod, u, v, ds.num_mips,
            planes=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_minification_reduces_aliasing(self, scene):
        # far away, the checkerboard aliases without mips; with mips the
        # covered pixels converge toward the texture average -> lower
        # local variance
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=1, skinned=False)
        ds = device.upload(batch)
        vp = _vp(pos=(0.0, 0.0, 40.0))
        c0, d = device.render_frame(ds, vp, None, width=96, height=96)
        c1, _ = device.render_frame(ds, vp, None, width=96, height=96,
                                    mipmap=True)
        cov = np.asarray(d) < 1.0
        assert cov.sum() > 20
        v0 = np.asarray(c0)[cov][:, :3].astype(np.float64).var(0).mean()
        v1 = np.asarray(c1)[cov][:, :3].astype(np.float64).var(0).mean()
        assert v1 < v0 * 0.6


class TestRichLayoutAndLighting:
    def _rich_batch(self):
        from mt_renderer_tpu.formats.mfx import Shader2File
        from mt_renderer_tpu.formats.mod import ModelFile

        model = ModelFile(fixtures.build_model_rich())
        shader2 = Shader2File(fixtures.build_shader2())
        return build_draw_batch(model, None, shader2, None)

    def test_packed_attributes_decode(self):
        b = self._rich_batch()
        assert b.normals is not None
        # corner normals are normalized corner directions (quantized 10-bit)
        want = b.positions / np.linalg.norm(b.positions, axis=1, keepdims=True)
        assert np.abs(b.normals - want).max() < 4e-3
        # u16n uvs reproduce the projected corner uvs
        assert np.abs(b.uvs - (b.positions[:, :2] * 0.5 + 0.5)).max() < 1e-4

    def test_lighting_shades_faces_differently(self):
        b = self._rich_batch()
        scene = device.upload(b)
        vp = _vp()
        unlit, d = device.render_frame(scene, vp, None, width=96, height=96)
        lit, _ = device.render_frame(scene, vp, None, width=96, height=96,
                                     lighting=True)
        cov = np.asarray(d) < 1.0
        unlit = np.asarray(unlit).astype(np.float64)
        lit = np.asarray(lit).astype(np.float64)
        # lit pixels are darkened by at most (0.3..1.0) per channel
        ratio = (lit[cov][:, :3] + 1) / (unlit[cov][:, :3] + 1)
        assert ratio.max() < 1.02 and ratio.min() > 0.25
        # different faces get distinctly different shading levels
        assert np.unique(np.round(ratio[:, 0], 1)).size >= 2
        # alpha untouched
        np.testing.assert_array_equal(lit[..., 3], unlit[..., 3])

    def test_lighting_pallas_tap_matches_scan(self):
        """The lit tap epilogue (lambert folded into the C planes
        in-kernel) must match the scan backend's lighting math."""
        b = self._rich_batch()
        scene = device.upload(b)
        vp = _vp()
        want, wd = device.render_frame(scene, vp, None, width=128,
                                       height=64, lighting=True)
        got, gd = device.render_frame(scene, vp, None, width=128,
                                      height=64, lighting=True,
                                      backend="pallas")
        assert_frames_match(np.asarray(got), np.asarray(want))
        cov_mis = (np.asarray(gd) < 1.0) != (np.asarray(wd) < 1.0)
        assert cov_mis.mean() <= 0.003

    def test_unlit_default_unchanged(self):
        b = self._rich_batch()
        scene = device.upload(b)
        vp = _vp()
        want, _ = cpu_reference.render(b, vp, 96, 96)
        got, _ = device.render_frame(scene, vp, None, width=96, height=96)
        assert_frames_match(np.asarray(got), want)


class TestPoolModes:
    """Narrow (4 B/texel) vs quad (16 B/texel) texel pools — the
    bytes-vs-gathers trade (r2 verdict #5; reference keeps BCn
    compressed in VRAM, texture.rs:12-30)."""

    def _batch(self):
        from mt_renderer_tpu.scene import demo

        return demo.build_demo_batch(instances=4, skinned=False)

    def test_pool_stats_regression(self):
        batch = self._batch()
        quad = device.upload(batch)
        narrow = device.upload(batch, pool_mode="narrow")
        sq = device.pool_stats(quad)
        sn = device.pool_stats(narrow)
        # demo texture is 64x64: full pyramid = 5461 rows
        pyramid = sum((64 >> i) ** 2 for i in range(7))
        assert sq["rows"] == sn["rows"] == pyramid
        assert sq["bytes"] == pyramid * 16
        assert sn["bytes"] == pyramid * 4
        # mips cost exactly 1/3 extra: 16 * 5461/4096 = 21.33 B/texel
        assert 21.0 < sq["bytes_per_src_texel"] < 21.7
        assert 5.2 < sn["bytes_per_src_texel"] < 5.5

    def test_pool_budget_policy(self):
        """pool_mode='auto' picks the fastest mode that fits the byte
        budget; over-budget requests (auto past narrow, or an explicit
        mode) raise instead of silently downgrading (r3 verdict,
        game-scale texture envelope)."""
        batch = self._batch()
        pyramid = sum((64 >> i) ** 2 for i in range(7))
        # budgets charge the LIVE in-program cost: pool bytes x2 (the
        # argument plus the tiled copy XLA materializes around a
        # gathered-from pool — the r4 bigtex OOM lesson), so quad needs
        # 32 B/row of budget, narrow 8, tri 128
        s = device.upload(batch, "auto", pool_budget_bytes=pyramid * 32)
        assert s.pool_mode == "quad"
        assert device.upload(batch, "auto",
                             pool_budget_bytes=None).pool_mode == "quad"
        # quad won't fit, narrow will -> narrow (and it still renders:
        # bit-exact vs quad on the scan backend)
        s = device.upload(batch, "auto",
                          pool_budget_bytes=pyramid * 32 - 1)
        assert s.pool_mode == "narrow"
        vp = _vp()
        want, _ = device.render_frame(device.upload(batch), vp,
                                      width=64, height=64,
                                      backend="scan")
        got, _ = device.render_frame(s, vp, width=64, height=64,
                                     backend="scan")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # nothing fits -> MemoryError, for auto and explicit alike
        with pytest.raises(MemoryError):
            device.upload(batch, "auto", pool_budget_bytes=pyramid * 2)
        with pytest.raises(MemoryError):
            device.upload(batch, "quad",
                          pool_budget_bytes=pyramid * 32 - 1)
        with pytest.raises(ValueError):
            device.upload(batch, "wide")

    def test_pool_budget_transient_refusal(self):
        """A pool whose ARGUMENT fits the budget but whose live
        in-program cost (bytes x2 — argument + XLA's tiled copy of a
        gathered-from pool) does not is refused BEFORE any compile
        (r4 verdict weak #2: the argument-only check passed pools that
        OOM'd in-program on the real chip)."""
        batch = self._batch()
        pyramid = sum((64 >> i) ** 2 for i in range(7))
        # argument = pyramid*16 B <= budget, live = x2 > budget
        with pytest.raises(MemoryError, match="x2"):
            device.upload(batch, "quad",
                          pool_budget_bytes=pyramid * 16)
        with pytest.raises(MemoryError, match="x2"):
            device.upload(batch, "tri",
                          pool_budget_bytes=pyramid * 64)

    def test_pool_auto_mipmap_rides_tri(self):
        """upload(pool_mode='auto', mipmap=True) prefers the tri pool —
        the measured production default for every mipmapped config
        (-19..-58%/frame, r4) — and degrades tri -> quad -> narrow as
        the budget tightens (r4 verdict weak #3: auto never selected
        the production trilinear pool)."""
        batch = self._batch()
        pyramid = sum((64 >> i) ** 2 for i in range(7))
        s = device.upload(batch, "auto", mipmap=True,
                          pool_budget_bytes=None)
        assert s.pool_mode == "tri"
        s = device.upload(batch, "auto", mipmap=True,
                          pool_budget_bytes=pyramid * 128)
        assert s.pool_mode == "tri"
        # tri won't fit, quad will
        s = device.upload(batch, "auto", mipmap=True,
                          pool_budget_bytes=pyramid * 128 - 1)
        assert s.pool_mode == "quad"
        # neither tri nor quad -> narrow
        s = device.upload(batch, "auto", mipmap=True,
                          pool_budget_bytes=pyramid * 8)
        assert s.pool_mode == "narrow"
        # without the mipmap hint auto keeps the bilinear default
        assert device.upload(batch, "auto").pool_mode == "quad"

    def test_pool_bias_lod_clamp(self):
        """pool_bias=k drops each texture's top k mips at decode (the
        streaming/LOD-clamp analog): the pool shrinks ~4x per step and
        rendering equals rendering the pre-downsampled texture set
        bit-exactly (UVs are normalized, so addressing falls out)."""
        import dataclasses as dc

        batch = self._batch()
        s0 = device.upload(batch)
        s1 = device.upload(batch, pool_bias=1)
        r0 = device.pool_stats(s0)["rows"]
        r1 = device.pool_stats(s1)["rows"]
        assert r1 == r0 - 64 * 64          # exactly the mip-0 rows
        assert int(np.asarray(s1.tex_size)[0, 0]) == 32
        # bias == pre-downsampled upload, bit-exact: build the
        # downsampled set with the same box filter upload uses
        def ds(img):
            h2, w2 = img.shape[0] // 2, img.shape[1] // 2
            x = img[: h2 * 2, : w2 * 2].astype(np.uint16)
            return ((x.reshape(h2, 2, w2, 2, 4).sum((1, 3)) + 2) >> 2
                    ).astype(np.uint8)
        b2 = dc.replace(batch, textures=[ds(t) for t in batch.textures])
        s2 = device.upload(b2)
        vp = _vp()
        got, _ = device.render_frame(s1, vp, width=96, height=96,
                                     backend="scan")
        want, _ = device.render_frame(s2, vp, width=96, height=96,
                                      backend="scan")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # auto bias: minimal bias that fits the budget
        pyramid = sum((64 >> i) ** 2 for i in range(7))
        s3 = device.upload(batch, pool_bias="auto",
                           pool_budget_bytes=(pyramid - 64 * 64) * 32)
        assert device.pool_stats(s3)["rows"] == r1

    def test_narrow_matches_quad_bit_exact_scan(self):
        batch = self._batch()
        vp = _vp()
        want, wd = device.render_frame(
            device.upload(batch), vp, width=96, height=96,
            backend="scan")
        got, gd = device.render_frame(
            device.upload(batch, pool_mode="narrow"), vp, width=96,
            height=96, backend="scan")
        # the four sample-time clamped gathers fetch the same texels the
        # quad row baked at upload; the contraction is the same op
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    @pytest.mark.slow
    def test_narrow_matches_quad_mipmap_pallas(self):
        batch = self._batch()
        vp = _vp()
        want, _ = device.render_frame(
            device.upload(batch), vp, width=96, height=96,
            backend="pallas", mipmap=True)
        got, _ = device.render_frame(
            device.upload(batch, pool_mode="narrow"), vp, width=96,
            height=96, backend="pallas", mipmap=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_narrow_rejects_tap_path(self):
        batch = self._batch()
        scene = device.upload(batch, pool_mode="narrow")
        with pytest.raises(ValueError, match="quad"):
            device.render_frame(scene, _vp(), width=96, height=96,
                                backend="pallas")


class TestTriPool:
    """pool_mode="tri" — 64 B rows (quad + the 3x3 level-(m+1) parent
    block) make a trilinear tap ONE gather instead of two; gathers are
    row-count priced to 128 B rows (tools/bench/gather_width.py: 5.7 vs
    16.1 ns HBM-resident). Contract: bit-identical pixels to the quad
    pool on every path — the fused sampler reproduces the two-gather
    arithmetic exactly (same clamped addressing, exact `where` selects
    out of the baked block, the same _contract_quad expression)."""

    def _batch(self):
        from mt_renderer_tpu.scene import demo

        return demo.build_demo_batch(instances=4, skinned=False)

    def test_tri_pool_stats(self):
        batch = self._batch()
        tri = device.upload(batch, pool_mode="tri")
        st = device.pool_stats(tri)
        pyramid = sum((64 >> i) ** 2 for i in range(7))
        assert st["rows"] == pyramid + (pyramid % 2)  # logical 64 B rows
        assert st["bytes"] == st["rows"] * 64
        # two texels pack per physical 128 B row (the u8 tile stride —
        # 64 B physical rows padded 2x in-program, _build_tri_pool)
        assert tri.mip_pool.shape == ((pyramid + 1) // 2, 128)
        # lanes 0-15 of each logical row ARE the quad pool row
        quad = device.upload(batch)
        flat = np.asarray(tri.mip_pool).reshape(-1, 64)[:pyramid]
        np.testing.assert_array_equal(flat[:, :16],
                                      np.asarray(quad.mip_pool))
        # budget accounting uses the wide rows
        with pytest.raises(MemoryError):
            device.upload(batch, "tri", pool_budget_bytes=pyramid * 16)

    def test_tri_parent_block_content(self):
        """Lanes 16-51 of each row are the 3x3 level-(m+1) RGBA block
        anchored at ((x>>1)-1, (y>>1)-1), clamp-to-edge; a texture's
        last real level bakes zeros there (never read: m1 == m0)."""
        batch = self._batch()
        tri = device.upload(batch, pool_mode="tri")
        quad = device.upload(batch)
        table = np.asarray(tri.mip_table)     # (L, M, 3)
        pool = np.asarray(tri.mip_pool).reshape(-1, 64)  # logical rows
        qp = np.asarray(quad.mip_pool)
        off0, h0, w0 = table[0, 0]
        off1, h1, w1 = table[0, 1]
        rng = np.random.default_rng(0)
        for _ in range(32):
            x = int(rng.integers(0, w0))
            y = int(rng.integers(0, h0))
            row = pool[off0 + y * w0 + x]
            k, j = (x >> 1) - 1, (y >> 1) - 1
            want = np.concatenate([
                qp[off1 + np.clip(j + dy, 0, h1 - 1) * w1
                   + np.clip(k + dx, 0, w1 - 1), :4]
                for dy in range(3) for dx in range(3)])
            np.testing.assert_array_equal(row[16:52], want)
        # last real level: parent lanes zero
        offl, hl, wl = table[0, tri.num_mips - 1]
        assert (pool[offl: offl + hl * wl, 16:52] == 0).all()

    def test_tri_sampler_matches_quad_dense(self):
        """sample_trilinear quad vs tri, dense (u, v, lod) sweep on an
        ODD-sized texture (both wm parities + every clamp case) —
        bit-exact."""
        import dataclasses as dc

        batch = self._batch()
        rng = np.random.default_rng(1)
        odd = [rng.integers(0, 256, (37, 23, 4)).astype(np.uint8)
               for _ in batch.textures]
        batch = dc.replace(batch, textures=odd)
        quad = device.upload(batch)
        tri = device.upload(batch, pool_mode="tri")
        n = 64
        u = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        lod = jnp.asarray(
            rng.uniform(-1.0, quad.num_mips + 1.0,
                        (n, n)).astype(np.float32))
        layer = jnp.zeros((n, n), jnp.int32)
        want = device.sample_trilinear(quad, layer, u, v, lod)
        got = device.sample_trilinear(tri, layer, u, v, lod)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # integer lods too (fm == 0 exercises the m1-unused lerp)
        lodi = jnp.floor(lod)
        np.testing.assert_array_equal(
            np.asarray(device.sample_trilinear(tri, layer, u, v, lodi)),
            np.asarray(device.sample_trilinear(quad, layer, u, v, lodi)))

    def test_tri_matches_quad_bilinear_scan(self):
        batch = self._batch()
        vp = _vp()
        want, wd = device.render_frame(
            device.upload(batch), vp, width=96, height=96,
            backend="scan")
        got, gd = device.render_frame(
            device.upload(batch, pool_mode="tri"), vp, width=96,
            height=96, backend="scan")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    def test_tri_matches_quad_mipmap_scan(self):
        batch = self._batch()
        vp = _vp()
        want, _ = device.render_frame(
            device.upload(batch), vp, width=96, height=96,
            backend="scan", mipmap=True)
        got, _ = device.render_frame(
            device.upload(batch, pool_mode="tri"), vp, width=96,
            height=96, backend="scan", mipmap=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.slow
    def test_tri_matches_quad_mipmap_pallas(self):
        """The production path: tile-major compacted trilinear shade
        through _trilinear_arith's fused one-gather branch."""
        batch = self._batch()
        vp = _vp()
        want, _ = device.render_frame(
            device.upload(batch), vp, width=96, height=96,
            backend="pallas", mipmap=True)
        got, _ = device.render_frame(
            device.upload(batch, pool_mode="tri"), vp, width=96,
            height=96, backend="pallas", mipmap=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_tri_matches_quad_tap_pallas(self):
        """Bilinear single-layer pallas tap: the in-kernel epilogue's
        tapidx addresses tri rows unchanged; the pool gather reads
        lanes 0-15."""
        batch = self._batch()
        vp = _vp()
        want, _ = device.render_frame(
            device.upload(batch), vp, width=96, height=96,
            backend="pallas")
        got, _ = device.render_frame(
            device.upload(batch, pool_mode="tri"), vp, width=96,
            height=96, backend="pallas")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.slow
    def test_tri_matches_quad_split_peel_mipmap(self):
        """OIT + mipmap on the production split engine, tri vs quad.

        The SAMPLER is bit-exact (test_tri_sampler_matches_quad_dense),
        but quad and tri scenes compile to differently-fused composite
        programs, and cross-program float reassociation lands the
        L-layer blend ±1 ulp apart → ±1 u8 LSB on a small pixel
        fraction (the repo's documented layout-fusion invariant —
        same reason packed==unpacked is a bitcast, not a parallel
        program). Contract here: ≤1 LSB, <2% of pixels."""
        from mt_renderer_tpu.scene import demo

        batch = self._batch()
        demo.make_translucent(batch, 2)
        vp = _vp()
        kw = dict(width=96, height=96, backend="pallas", layers=3,
                  peel_mode="split", mipmap=True)
        want, _ = device.render_frame_peeled(
            device.upload(batch), vp, **kw)
        got, _ = device.render_frame_peeled(
            device.upload(batch, pool_mode="tri"), vp, **kw)
        got = np.asarray(got).astype(np.int16)
        want = np.asarray(want).astype(np.int16)
        d = np.abs(got - want)
        assert d.max() <= 1, d.max()
        assert (d != 0).mean() < 0.02, (d != 0).mean()


class TestBc1Pool:
    """pool_mode="bc1" — the compressed-resident texture envelope
    (reference: BCn stays in VRAM, texture.rs:12-30): one logical 64 B
    row per 4x4 block bakes the child 2x2 BLOCK group + the level-(m+1)
    parent 2x2 block group, so a trilinear tap is ONE row-priced gather
    + 8 in-register integer decodes. Contract: bit-identical pixels to
    a QUAD pool built from the decoded BC1 mip chains — the blocks ARE
    the content (like GPU hardware decode), and the decode arithmetic
    reproduces bcn.decode_bc1_numpy exactly."""

    def _batch(self, alpha=False):
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=4, skinned=False)
        if alpha:
            import dataclasses as dc

            rng = np.random.default_rng(3)
            texs = []
            for t in batch.textures:
                t = t.copy()
                # punch-through regions (alpha < 128 -> 3-color mode);
                # keep opaque texels at 255 so the conservative
                # tex_opaque flag agrees between original and decoded
                t[..., 3] = np.where(rng.random(t.shape[:2]) < 0.3,
                                     10, 255).astype(np.uint8)
                texs.append(t)
            batch = dc.replace(batch, textures=texs)
        return batch

    @staticmethod
    def _decoded_chains(batch):
        from mt_renderer_tpu.render import bcn

        return [[bcn.decode_bc1_blocks_numpy(
                    bcn.encode_bc1_numpy(img), img.shape[1], img.shape[0])
                 for img in device.mip_chain(t)]
                for t in batch.textures]

    def _pair(self, batch):
        """(bc1 scene, quad-scene-of-the-decoded-chains oracle)."""
        return (device.upload(batch, pool_mode="bc1"),
                device.upload(batch, mip_chains=self._decoded_chains(batch)))

    def test_bc1_pool_stats(self):
        batch = self._batch()
        scene = device.upload(batch, pool_mode="bc1")
        st = device.pool_stats(scene)
        # demo texture 64x64: blocks per chain level = ceil(s/4)^2
        blocks = sum(max(64 >> i, 4) ** 2 // 16 for i in range(5)) + 1 + 1
        assert st["rows"] == blocks + (blocks % 2)
        assert st["bytes"] == st["rows"] * 64
        assert st["upload_bytes"] == st["rows"] * 8
        assert scene.mip_pool.shape == ((blocks + 1) // 2, 128)
        # 4 B/texel + mips ≈ 5.33 resident (16x under tri, 4x under
        # quad); small tail mips round up to whole blocks
        assert 5.0 < st["bytes_per_src_texel"] < 5.8
        # budget charges the block rows x2 live
        with pytest.raises(MemoryError):
            device.upload(batch, "bc1", pool_budget_bytes=blocks * 64)

    def test_bc1_row_content(self):
        """Child lanes 0-31 are the 2x2 block group (clamp-to-edge);
        parent lanes 32-63 the 2x2 level-(m+1) group anchored at
        A = (2·bx−1)>>2; a texture's last real level bakes zeros."""
        from mt_renderer_tpu.render import bcn

        batch = self._batch()
        scene = device.upload(batch, pool_mode="bc1")
        pool = np.asarray(scene.mip_pool).reshape(-1, 64)
        table = np.asarray(scene.mip_table)
        chain = device.mip_chain(batch.textures[0])
        blk = [bcn.encode_bc1_numpy(img) for img in chain]
        off0 = table[0, 0, 0]
        bw0, bw1 = 64 // 4, 32 // 4
        rng = np.random.default_rng(0)
        for _ in range(16):
            bx = int(rng.integers(0, bw0))
            by = int(rng.integers(0, bw0))
            row = pool[off0 + by * bw0 + bx]
            for k, (dx, dy) in enumerate(
                    ((0, 0), (1, 0), (0, 1), (1, 1))):
                nx, ny = min(bx + dx, bw0 - 1), min(by + dy, bw0 - 1)
                np.testing.assert_array_equal(
                    row[8 * k: 8 * k + 8], blk[0][ny * bw0 + nx])
            ax = min(max((2 * bx - 1) >> 2, 0), bw1 - 1)
            ay = min(max((2 * by - 1) >> 2, 0), bw1 - 1)
            for k, (dx, dy) in enumerate(
                    ((0, 0), (1, 0), (0, 1), (1, 1))):
                nx, ny = min(ax + dx, bw1 - 1), min(ay + dy, bw1 - 1)
                np.testing.assert_array_equal(
                    row[32 + 8 * k: 40 + 8 * k], blk[1][ny * bw1 + nx])
        # last real level: parent lanes zero
        offl = table[0, scene.num_mips - 1, 0]
        assert (pool[offl, 32:] == 0).all()

    def test_bc1_sampler_matches_decoded_quad_dense(self):
        """sample_trilinear/sample_bilinear, bc1 vs decoded-quad, dense
        (u, v, lod) sweep on an ODD-sized texture (both block and wm
        parities, every clamp case, punch-through blocks) — bit-exact."""
        import dataclasses as dc

        batch = self._batch()
        rng = np.random.default_rng(1)
        odd = []
        for _ in batch.textures:
            t = rng.integers(0, 256, (37, 23, 4)).astype(np.uint8)
            t[..., 3] = np.where(rng.random((37, 23)) < 0.25, 7, 255)
            odd.append(t)
        batch = dc.replace(batch, textures=odd)
        bc1, quad = self._pair(batch)
        n = 64
        u = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        lod = jnp.asarray(
            rng.uniform(-1.0, quad.num_mips + 1.0,
                        (n, n)).astype(np.float32))
        layer = jnp.zeros((n, n), jnp.int32)
        for ld in (lod, jnp.floor(lod)):
            want = device.sample_trilinear(quad, layer, u, v, ld)
            got = device.sample_trilinear(bc1, layer, u, v, ld)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
        np.testing.assert_array_equal(
            np.asarray(device.sample_bilinear(bc1, layer, u, v)),
            np.asarray(device.sample_bilinear(quad, layer, u, v)))

    def test_bc1_matches_decoded_quad_scan(self):
        batch = self._batch(alpha=True)
        vp = _vp()
        bc1, quad = self._pair(batch)
        for mip in (False, True):
            want, wd = device.render_frame(quad, vp, width=96, height=96,
                                           backend="scan", mipmap=mip)
            got, gd = device.render_frame(bc1, vp, width=96, height=96,
                                          backend="scan", mipmap=mip)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
            np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    @pytest.mark.slow
    def test_bc1_matches_decoded_quad_mipmap_pallas(self):
        """The production path: tile-major compacted trilinear shade
        through _trilinear_arith's bc1 in-register-decode branch."""
        batch = self._batch()
        vp = _vp()
        bc1, quad = self._pair(batch)
        want, _ = device.render_frame(quad, vp, width=96, height=96,
                                      backend="pallas", mipmap=True)
        got, _ = device.render_frame(bc1, vp, width=96, height=96,
                                     backend="pallas", mipmap=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bc1_asset_passthrough(self):
        """A BC1 ``.tex`` asset's own mip chain uploads VERBATIM
        (``bc1_chains`` — no decode→re-encode generation loss, the
        asset's chain honored even when it stops early): the pool rows
        bake the asset's blocks and sampling equals a quad pool of the
        asset's decoded levels bit-exactly. The fixture levels are
        encoded with a DIFFERENT encoder (fixtures.encode_bc1_simple)
        and are not box-filter related — re-encoding would not round-
        trip, so equality proves the blocks passed through untouched."""
        from mt_renderer_tpu import native
        from mt_renderer_tpu.formats import tex as tex_mod
        from mt_renderer_tpu.fixtures import encode_bc1_simple

        rng = np.random.default_rng(7)
        level_blobs = []
        for lv in range(4):                  # 32..4 — partial chain
            s = 32 >> lv
            img = rng.integers(0, 256, (s, s, 4)).astype(np.uint8)
            img[..., 3] = 255
            level_blobs.append(encode_bc1_simple(img))
        blob = tex_mod.write_texture(32, 32,
                                     int(tex_mod.TextureFormat.BC1),
                                     level_blobs,
                                     levels=len(level_blobs))
        tf = tex_mod.TextureFile(blob)
        chain = tf.bc1_chain()
        assert len(chain) == 4
        batch = self._batch()                # one 64x64 demo texture
        bc1 = device.upload(batch, pool_mode="bc1", bc1_chains=[chain])
        assert bc1.num_mips == 4
        # verbatim blocks in the pool's child anchor lanes
        pool = np.asarray(bc1.mip_pool).reshape(-1, 64)
        table = np.asarray(bc1.mip_table)
        for lv, (blocks, h, w) in enumerate(chain):
            off = table[0, lv, 0]
            np.testing.assert_array_equal(pool[off, :8], blocks[0])
        # oracle: quad pool of the asset's DECODED levels
        dec = [native.decode_bc1(
                   np.ascontiguousarray(b).tobytes(), w, h)
               for b, h, w in chain]
        quad = device.upload(batch, mip_chains=[dec])
        n = 48
        u = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        lod = jnp.asarray(rng.uniform(-1.0, 5.0, (n, n)).astype(np.float32))
        layer = jnp.zeros((n, n), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(device.sample_trilinear(bc1, layer, u, v, lod)),
            np.asarray(device.sample_trilinear(quad, layer, u, v, lod)))
        np.testing.assert_array_equal(
            np.asarray(device.sample_bilinear(bc1, layer, u, v)),
            np.asarray(device.sample_bilinear(quad, layer, u, v)))

    def test_bc1_rejects_nonmip_pallas(self):
        batch = self._batch()
        scene = device.upload(batch, pool_mode="bc1")
        with pytest.raises(ValueError, match="mipmap"):
            device.render_frame(scene, _vp(), width=96, height=96,
                                backend="pallas")
        with pytest.raises(ValueError, match="mipmap"):
            device.render_frame_peeled(scene, _vp(), width=96, height=96,
                                       backend="pallas", layers=2,
                                       peel_mode="split")


class TestBc7Pool:
    """pool_mode="bc7" — the compressed-resident envelope for the
    reference's OTHER hardware-decoded format (texture.rs:12-30): one
    128 B row per 4x4 block bakes the child 2x2 + parent 2x2 BLOCK
    groups (16 B blocks fill the u8 tile row exactly), a trilinear tap
    is ONE row gather (+ the baked partition-hint row when partitioned
    modes are present) + 8 in-register all-present-mode BC7 decodes.
    Contract: bit-identical to a QUAD pool of the decoded chains."""

    def _batch(self):
        from mt_renderer_tpu.scene import demo

        return demo.build_demo_batch(instances=4, skinned=False)

    @staticmethod
    def _decoded_chains(batch):
        from mt_renderer_tpu.render import bcn

        return [[bcn.decode_bc7_numpy(
                    bcn.encode_bc7_mode6_numpy(img).tobytes(),
                    img.shape[1], img.shape[0])
                 for img in device.mip_chain(t)]
                for t in batch.textures]

    def _pair(self, batch):
        """(bc7 scene, quad-scene-of-the-decoded-chains oracle)."""
        return (device.upload(batch, pool_mode="bc7"),
                device.upload(batch, mip_chains=self._decoded_chains(batch)))

    @staticmethod
    def _random_chains(batch, rng):
        """All-8-modes random-block chains + their decoded oracle —
        exercises the partition-hint pool (modes 0-3, 7)."""
        from mt_renderer_tpu.render import bcn

        bc7_chains, dec_chains = [], []
        for t in batch.textures:
            ch, dch = [], []
            for img in device.mip_chain(t):
                h, w = img.shape[:2]
                nb = ((h + 3) // 4) * ((w + 3) // 4)
                blk = rng.integers(0, 256, (nb, 16), dtype=np.uint8)
                m = rng.integers(0, 8, nb)
                blk[:, 0] = ((1 << m) | (
                    (blk[:, 0].astype(np.int64) << (m + 1)) & 0xFF
                )).astype(np.uint8)
                ch.append((blk, h, w))
                dch.append(bcn.decode_bc7_numpy(blk.tobytes(), w, h))
            bc7_chains.append(ch)
            dec_chains.append(dch)
        return bc7_chains, dec_chains

    def test_bc7_pool_stats_and_modes(self):
        batch = self._batch()
        scene = device.upload(batch, pool_mode="bc7")
        st = device.pool_stats(scene)
        blocks = sum(max(64 >> i, 4) ** 2 // 16 for i in range(5)) + 1 + 1
        assert st["rows"] == blocks
        assert scene.mip_pool.shape == (blocks, 128)
        assert st["bytes"] == blocks * 128
        assert st["upload_bytes"] == blocks * 16
        # synthetic content is mode-6 only: no hints, only mode 6
        # compiles into the sampler
        assert scene.bc7_modes == (6,)
        assert scene.aux_pool.shape == (1, 128)
        # budget charges the block rows x2 live (+ hint share)
        with pytest.raises(MemoryError):
            device.upload(batch, "bc7", pool_budget_bytes=blocks * 128)

    def test_bc7_sampler_matches_decoded_quad_dense(self):
        """Dense (u, v, lod) sweep on an ODD-sized texture (both block
        and wm parities, every clamp case) — bit-exact vs the
        decoded-chain quad oracle."""
        import dataclasses as dc

        batch = self._batch()
        rng = np.random.default_rng(1)
        odd = [rng.integers(0, 256, (37, 23, 4)).astype(np.uint8)
               for _ in batch.textures]
        batch = dc.replace(batch, textures=odd)
        bc7, quad = self._pair(batch)
        n = 64
        u = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        lod = jnp.asarray(
            rng.uniform(-1.0, quad.num_mips + 1.0,
                        (n, n)).astype(np.float32))
        layer = jnp.zeros((n, n), jnp.int32)
        for ld in (lod, jnp.floor(lod)):
            np.testing.assert_array_equal(
                np.asarray(device.sample_trilinear(bc7, layer, u, v, ld)),
                np.asarray(device.sample_trilinear(quad, layer, u, v, ld)))
        np.testing.assert_array_equal(
            np.asarray(device.sample_bilinear(bc7, layer, u, v)),
            np.asarray(device.sample_bilinear(quad, layer, u, v)))

    def test_bc7_all_modes_hint_path_matches(self):
        """All-8-modes random blocks (via bc7_chains): the partition-
        hint pool exists, all modes compile, sampling stays bit-exact
        vs the decoded oracle."""
        batch = self._batch()
        rng = np.random.default_rng(5)
        bc7_chains, dec_chains = self._random_chains(batch, rng)
        bc7 = device.upload(batch, pool_mode="bc7", bc7_chains=bc7_chains)
        quad = device.upload(batch, mip_chains=dec_chains)
        assert bc7.bc7_modes == tuple(range(8))
        assert bc7.aux_pool.shape[0] > 1
        n = 48
        L = len(batch.textures)
        layer = jnp.asarray(rng.integers(0, L, (n, n)).astype(np.int32))
        u = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        lod = jnp.asarray(
            rng.uniform(-1.0, quad.num_mips + 1.0,
                        (n, n)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(device.sample_trilinear(bc7, layer, u, v, lod)),
            np.asarray(device.sample_trilinear(quad, layer, u, v, lod)))
        np.testing.assert_array_equal(
            np.asarray(device.sample_bilinear(bc7, layer, u, v)),
            np.asarray(device.sample_bilinear(quad, layer, u, v)))

    def test_bc7_matches_decoded_quad_scan(self):
        batch = self._batch()
        vp = _vp()
        bc7, quad = self._pair(batch)
        for mip in (False, True):
            want, wd = device.render_frame(quad, vp, width=96, height=96,
                                           backend="scan", mipmap=mip)
            got, gd = device.render_frame(bc7, vp, width=96, height=96,
                                          backend="scan", mipmap=mip)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
            np.testing.assert_array_equal(np.asarray(gd), np.asarray(wd))

    @pytest.mark.slow
    def test_bc7_matches_decoded_quad_mipmap_pallas(self):
        """The production path: tile-major compacted trilinear shade
        through _trilinear_arith's bc7 in-register-decode branch."""
        batch = self._batch()
        vp = _vp()
        bc7, quad = self._pair(batch)
        want, _ = device.render_frame(quad, vp, width=96, height=96,
                                      backend="pallas", mipmap=True)
        got, _ = device.render_frame(bc7, vp, width=96, height=96,
                                     backend="pallas", mipmap=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bc7_asset_passthrough(self):
        """A BC7 ``.tex`` asset's own mip chain uploads VERBATIM
        (``bc7_chains``): the fixture levels are random valid blocks no
        encoder in this repo produces and are not box-filter related —
        equality vs their decoded quad oracle proves the bytes passed
        through untouched."""
        from mt_renderer_tpu.formats import tex as tex_mod
        from mt_renderer_tpu.render import bcn

        rng = np.random.default_rng(7)
        level_blobs = []
        for lv in range(4):                  # 32..4 — partial chain
            s = 32 >> lv
            nb = ((s + 3) // 4) ** 2
            blk = rng.integers(0, 256, (nb, 16), dtype=np.uint8)
            m = rng.integers(0, 8, nb)
            blk[:, 0] = ((1 << m) | (
                (blk[:, 0].astype(np.int64) << (m + 1)) & 0xFF
            )).astype(np.uint8)
            level_blobs.append(blk.tobytes())
        blob = tex_mod.write_texture(32, 32,
                                     int(tex_mod.TextureFormat.BC7),
                                     level_blobs,
                                     levels=len(level_blobs))
        tf = tex_mod.TextureFile(blob)
        chain = tf.bc7_chain()
        assert len(chain) == 4
        batch = self._batch()                # one 64x64 demo texture
        bc7 = device.upload(batch, pool_mode="bc7", bc7_chains=[chain])
        assert bc7.num_mips == 4
        # verbatim blocks in the pool's child anchor lanes
        pool = np.asarray(bc7.mip_pool)
        table = np.asarray(bc7.mip_table)
        for lv, (blocks, h, w) in enumerate(chain):
            off = table[0, lv, 0]
            np.testing.assert_array_equal(pool[off, :16], blocks[0])
        dec = [bcn.decode_bc7_numpy(
                   np.ascontiguousarray(b).tobytes(), w, h)
               for b, h, w in chain]
        quad = device.upload(batch, mip_chains=[dec])
        n = 48
        u = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-0.1, 1.1, (n, n)).astype(np.float32))
        lod = jnp.asarray(rng.uniform(-1.0, 5.0, (n, n)).astype(np.float32))
        layer = jnp.zeros((n, n), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(device.sample_trilinear(bc7, layer, u, v, lod)),
            np.asarray(device.sample_trilinear(quad, layer, u, v, lod)))

    def test_bc7_rejects_nonmip_pallas(self):
        batch = self._batch()
        scene = device.upload(batch, pool_mode="bc7")
        with pytest.raises(ValueError, match="mipmap"):
            device.render_frame(scene, _vp(), width=96, height=96,
                                backend="pallas")


class TestSingleLayerTapCompaction:
    """shade_tap_flat_channels tap_tiles (covered-tile compaction on the
    packed production path): host-sized cap must bound live tiles and
    the compacted frame must be bit-identical to dense."""

    def test_compacted_matches_dense_bit_exact(self):
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=9, skinned=True)
        scene = device.upload(batch)
        cam = demo.demo_camera(9, 256, 192)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.5)
        tt = device.auto_tap_tiles(batch, vp, bones,
                                   width=256, height=192)
        kw = dict(width=256, height=192, backend="pallas", packed=True)
        dense, dd = device.render_frame(scene, vp, bones, **kw)
        compact, cd = device.render_frame(scene, vp, bones,
                                          tap_tiles=tt, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))
        np.testing.assert_array_equal(np.asarray(cd), np.asarray(dd))

    def test_auto_cap_bounds_live_tiles(self):
        from mt_renderer_tpu.render import pallas_raster as pr
        from mt_renderer_tpu.scene import demo

        rng = np.random.default_rng(3)
        for trial in range(4):
            inst = int(rng.integers(4, 32))
            batch = demo.build_demo_batch(instances=inst, skinned=True)
            cam = demo.demo_camera(inst, 256, 192)
            cam.yaw = float(rng.uniform(-25, 25))
            vp = np.asarray(cam.view_proj())
            bones = demo.demo_bone_mats(float(rng.uniform(0, 2)))
            tt = device.auto_tap_tiles(batch, vp, bones,
                                       width=256, height=192,
                                       margin=1.0)
            scene = device.upload(batch)
            _, d = device.render_frame(scene, vp, bones, width=256,
                                       height=192, backend="pallas")
            cov = np.asarray(d) < 1.0
            pad = np.zeros((192, 256), bool)
            pad[:cov.shape[0], :cov.shape[1]] = cov
            tiles_live = int(
                pad.reshape(192 // pr.TILE_H, pr.TILE_H,
                            256 // pr.TILE_W, pr.TILE_W)
                .any(axis=(1, 3)).sum())
            assert tt >= tiles_live, (trial, tt, tiles_live)

    def test_overflow_detected_not_silent(self):
        from mt_renderer_tpu.render import pallas_raster as pr
        from mt_renderer_tpu.scene import demo

        batch = demo.build_demo_batch(instances=9, skinned=False)
        scene = device.upload(batch)
        cam = demo.demo_camera(9, 256, 192)
        before = pr.OVERFLOW_EVENTS
        with pytest.warns(RuntimeWarning, match="tap overflow"):
            device.render_frame(scene, np.asarray(cam.view_proj()),
                                None, width=256, height=192,
                                backend="pallas", packed=True,
                                tap_tiles=1)
            pr.flush_overflow_checks()
        assert pr.OVERFLOW_EVENTS == before + 1


class TestTexturedLiveness:
    """Compacted-tap liveness is textured∧covered (r3 cont.): a covered
    row whose winners are all untextured never reads the pool (the
    shade falls back to the flat/debug color), so it consumes no tap
    slot — and ``auto_tap_tiles``/``predict_live_rows`` count only
    TEXTURED chunk bboxes to match. A scene dominated by untextured
    content must (a) cap far below its covered row count and (b) stay
    bit-identical to dense on every compacted tap path."""

    INST = 9

    def _mixed_scene(self):
        from mt_renderer_tpu.scene import demo

        # subdiv=4: 192 tris/instance, so the 384-triangle setup chunks
        # don't blend all nine instances into one always-textured chunk
        # (the predictor's textured flag is per chunk)
        batch = demo.build_demo_batch(instances=self.INST, skinned=True,
                                      subdiv=4)
        per = len(batch.tri_texture) // self.INST
        tex = batch.tri_texture.copy()
        tex[per:] = -1          # only instance 0 keeps its texture
        batch.tri_texture = tex
        cam = demo.demo_camera(self.INST, 256, 192)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.5)
        return batch, vp, bones

    @pytest.mark.slow
    def test_cap_tracks_textured_not_covered(self):
        from mt_renderer_tpu.scene import demo

        batch, vp, bones = self._mixed_scene()
        scene = device.upload(batch)
        tt = device.auto_tap_tiles(batch, vp, bones,
                                   width=256, height=192, margin=1.0)
        # the same geometry fully textured needs a bigger cap: the
        # textured-chunk filter strictly tightens the bound (by at
        # least one 8-row rounding quantum even at the production
        # whole-tile granularity, where this small frame has only 24
        # row units; the chunk granularity blurs one neighbor
        # instance in)
        full = demo.build_demo_batch(instances=self.INST, skinned=True,
                                     subdiv=4)
        tt_all = device.auto_tap_tiles(full, vp, bones,
                                       width=256, height=192,
                                       margin=1.0)
        assert tt + 8 <= tt_all, (tt, tt_all)
        kw = dict(width=256, height=192, backend="pallas", packed=True)
        dense, dd = device.render_frame(scene, vp, bones, **kw)
        compact, cd = device.render_frame(scene, vp, bones,
                                          tap_tiles=tt, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))
        np.testing.assert_array_equal(np.asarray(cd), np.asarray(dd))

    @pytest.mark.slow
    def test_mip_compacted_matches_dense(self):
        batch, vp, bones = self._mixed_scene()
        scene = device.upload(batch)
        tt = device.auto_tap_tiles(batch, vp, bones,
                                   width=256, height=192)
        kw = dict(width=256, height=192, backend="pallas", packed=True,
                  mipmap=True, lighting=True)
        dense, _ = device.render_frame(scene, vp, bones, **kw)
        compact, _ = device.render_frame(scene, vp, bones,
                                         tap_tiles=tt, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))

    @pytest.mark.slow
    def test_peel_compacted_matches_dense(self):
        batch, vp, bones = self._mixed_scene()
        scene = device.upload(batch)
        caps = device.measure_live_tap_tiles(
            scene, vp, bones, width=256, height=192, layers=3)
        kw = dict(width=256, height=192, layers=3, backend="pallas",
                  peel_mode="ml")
        dense, _ = device.render_frame_peeled(scene, vp, bones, **kw)
        compact, _ = device.render_frame_peeled(scene, vp, bones,
                                                tap_tiles=caps, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))

    @pytest.mark.slow
    def test_split_mip_peel_compacted_matches_dense(self):
        from mt_renderer_tpu.scene import demo

        batch, vp, bones = self._mixed_scene()
        # half the instances translucent — including untextured ones,
        # so the ML composite's textured∧covered mask sees live rows
        # of both kinds
        batch = demo.make_translucent(batch, self.INST, fraction=0.5)
        scene = device.upload(batch)
        caps = device.measure_live_tap_tiles(
            scene, vp, bones, width=256, height=192, layers=3,
            mode="split")
        kw = dict(width=256, height=192, layers=3, backend="pallas",
                  peel_mode="split", mipmap=True)
        dense, _ = device.render_frame_peeled(scene, vp, bones, **kw)
        compact, _ = device.render_frame_peeled(scene, vp, bones,
                                                tap_tiles=caps, **kw)
        np.testing.assert_array_equal(np.asarray(compact),
                                      np.asarray(dense))
