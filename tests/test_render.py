"""Scene assembly + CPU reference renderer tests.

Covers the host-side render path: vertex decode per input layout
(reference rshader2.rs:496-571), triangle-strip expansion with restart
semantics (model.rs:251), draw-batch construction (model.rs:36-293), the
fly camera math (camera.rs:30-59), and the NumPy reference rasterizer that
every device kernel is differential-tested against.
"""

import numpy as np
import pytest

from mt_renderer_tpu import dti as dti_mod
from mt_renderer_tpu import fixtures
from mt_renderer_tpu.app.camera import Camera, perspective_rh
from mt_renderer_tpu.app.input_state import InputState, Key
from mt_renderer_tpu.formats.mfx import InputElement, InputElementFormat as F, Shader2File
from mt_renderer_tpu.formats.mod import ModelFile
from mt_renderer_tpu.formats.mrl import MaterialFile
from mt_renderer_tpu.render import cpu_reference
from mt_renderer_tpu.render.vertex import decode_element, strip_to_triangles
from mt_renderer_tpu.resources.manager import ResourceManager
from mt_renderer_tpu.scene.model import build_draw_batch


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    fixtures.write_fixture_tree(root)
    return root


@pytest.fixture(scope="module")
def scene(fixture_root):
    rm = ResourceManager(fixture_root)
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


class TestStripExpansion:
    def test_basic_strip_winding(self):
        tris = strip_to_triangles(np.array([0, 1, 2, 3], np.uint16))
        # even tri keeps order, odd tri swaps first two to preserve winding
        assert tris.tolist() == [[0, 1, 2], [2, 1, 3]]

    def test_restart(self):
        tris = strip_to_triangles(np.array([0, 1, 2, 0xFFFF, 3, 4, 5], np.uint16))
        assert tris.tolist() == [[0, 1, 2], [3, 4, 5]]

    def test_degenerates_dropped(self):
        # repeated index => degenerate stitch triangles get culled
        tris = strip_to_triangles(np.array([0, 1, 1, 2], np.uint16))
        assert (tris[:, 0] != tris[:, 1]).all()
        assert (tris[:, 1] != tris[:, 2]).all()

    def test_index_base(self):
        tris = strip_to_triangles(np.array([0, 1, 2], np.uint16), index_base=10)
        assert tris.tolist() == [[10, 11, 12]]

    def test_short_runs_skipped(self):
        assert len(strip_to_triangles(np.array([0, 1], np.uint16))) == 0
        assert len(strip_to_triangles(np.array([], np.uint16))) == 0


class TestVertexDecode:
    def _raw(self, payload: bytes, stride: int) -> np.ndarray:
        return np.frombuffer(payload.ljust(stride, b"\0"), np.uint8).reshape(1, stride)

    def test_f32(self):
        raw = self._raw(np.array([1.5, -2.0, 3.25], "<f4").tobytes(), 12)
        e = InputElement("Position", 0, F.IEF_F32, 3, 0, 0, 0)
        np.testing.assert_allclose(decode_element(raw, e)[0], [1.5, -2.0, 3.25])

    def test_u8n(self):
        raw = self._raw(bytes([0, 128, 255, 64]), 4)
        e = InputElement("Weight", 0, F.IEF_U8N, 4, 0, 0, 0)
        np.testing.assert_allclose(
            decode_element(raw, e)[0], np.array([0, 128, 255, 64]) / 255.0
        )

    def test_s16n_clamps_min(self):
        raw = self._raw(np.array([-32768, 32767], "<i2").tobytes(), 4)
        e = InputElement("Normal", 0, F.IEF_S16N, 2, 0, 0, 0)
        v = decode_element(raw, e)[0]
        assert v[0] == -1.0 and abs(v[1] - 1.0) < 1e-6

    def test_u8_integer(self):
        raw = self._raw(bytes([3, 7]), 2)
        e = InputElement("Joint", 0, F.IEF_U8, 2, 0, 0, 0)
        v = decode_element(raw, e)
        assert v.dtype == np.int32 and v[0].tolist() == [3, 7]

    def test_scmp3n_packed_normal(self):
        # pack x=+511, y=-512, z=0 into 10:10:10
        packed = (511 & 0x3FF) | ((-512 & 0x3FF) << 10) | (0 << 20)
        raw = self._raw(np.array([packed], "<u4").tobytes(), 4)
        e = InputElement("Normal", 0, F.IEF_SCMP3N, 3, 0, 0, 0)
        v = decode_element(raw, e)[0]
        np.testing.assert_allclose(v, [1.0, -1.0, 0.0], atol=1e-3)


class TestDrawBatch:
    def test_counts_and_textures(self, scene):
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        assert batch.num_vertices == 16          # 2 primitives x 8 corners
        assert batch.num_triangles > 8           # cube strips minus degenerates
        assert len(batch.textures) == 1          # albedo resolved via manager
        assert (batch.tri_texture == 0).all()
        assert batch.textures[0].shape == (64, 64, 4)
        # all triangle indices live inside the pooled vertex range
        assert batch.tris.min() >= 0 and batch.tris.max() < batch.num_vertices

    def test_parts_disp_culls(self, scene):
        rm, shader2, model, material = scene
        full = build_draw_batch(model, material, shader2, rm)
        culled = build_draw_batch(model, material, shader2, rm, parts_disp=[False, False])
        assert culled.num_triangles == 0
        assert full.num_triangles > 0

    def test_skinned_batch(self, fixture_root, scene):
        rm, shader2, _, material = scene
        model = ModelFile(
            rm.get_resource("model/fixture_cube_skinned", dti_mod.from_name("rModel")).read()
        )
        batch = build_draw_batch(model, material, shader2, rm)
        assert batch.skinned
        assert batch.weights.sum(axis=1).max() <= 1.0 + 1e-5
        assert batch.inverse_bind_mats.shape == (2, 4, 4)
        assert batch.joint_parents.tolist() == [-1, 0]


class TestCamera:
    def test_identity_view_at_origin(self):
        cam = Camera(position=[0, 0, 0])
        np.testing.assert_allclose(cam.view(), np.eye(4), atol=1e-6)

    def test_translation_inverts(self):
        cam = Camera(position=[1, 2, 3])
        v = cam.view()
        np.testing.assert_allclose(v[:3, 3], [-1, -2, -3], atol=1e-6)

    def test_projection_depth_range(self):
        # wgpu convention: z in [0, 1]; near plane maps to 0, far to 1
        p = perspective_rh(50.0, 1.0, 0.01, 50.0)
        for z_eye, expect in ((-0.01, 0.0), (-50.0, 1.0)):
            clip = p @ np.array([0, 0, z_eye, 1.0])
            assert abs(clip[2] / clip[3] - expect) < 1e-5

    def test_mouse_look_clamps_pitch(self):
        cam = Camera(position=[0, 0, 0])
        inp = InputState()
        inp.add_mouse_movement(0.0, -10000.0)
        cam.update(inp, aspect=1.0)
        assert cam.pitch == 89.0

    def test_input_state(self):
        inp = InputState()
        inp.add_mouse_movement(1.0, 2.0)
        inp.add_mouse_movement(0.5, -1.0)
        assert inp.frame_mouse_delta == (1.5, 1.0)
        inp.next_frame()
        assert inp.frame_mouse_delta == (0.0, 0.0)
        inp.set_key(Key.W)
        assert inp.has_key(Key.W) and not inp.has_key(Key.A)
        inp.unset_key(Key.W)
        assert not inp.has_key(Key.W)


def _look_at_cube_vp(width=128, height=128):
    cam = Camera(position=[0, 0, 4.0])
    cam.aspect = width / height
    return cam.view_proj()


class TestCpuReference:
    def test_textured_cube_coverage(self, scene):
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        vp = _look_at_cube_vp()
        color, depth = cpu_reference.render(batch, vp, 128, 128)
        covered = depth < 1.0
        assert covered.any(), "cube should cover pixels"
        frac = covered.mean()
        assert 0.05 < frac < 0.9
        # covered pixels are textured (not the white clear color)
        assert not (color[covered] == 255).all()
        # center of frame is on the cube front face
        assert depth[64, 64] < 1.0

    def test_depth_orders_faces(self, scene):
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        vp = _look_at_cube_vp()
        _, depth = cpu_reference.render(batch, vp, 128, 128)
        # the front face is the z_eye=-3 plane; its screen depth is constant
        p = perspective_rh(50.0, 1.0)
        clip = p @ np.array([0, 0, -3.0, 1.0])
        expect = clip[2] / clip[3]
        face = depth[60:68, 60:68]
        np.testing.assert_allclose(face, expect, atol=1e-5)

    def test_backface_culling_closes_box(self, scene):
        # with back faces culled and all 6 faces present, looking from any
        # axis shows only front geometry: every covered pixel's depth is
        # from a near face (< the depth the far face would produce)
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        vp = _look_at_cube_vp()
        _, depth = cpu_reference.render(batch, vp, 128, 128)
        covered = depth[depth < 1.0]
        # near face of a unit cube at distance 4 => z_eye = -3; far face -5.
        # Screen depth of far face with near=.01 far=50: ~0.9939. All
        # covered depths must be strictly nearer than the far face.
        p = perspective_rh(50.0, 1.0)
        far_clip = p @ np.array([0, 0, -5.0, 1.0])
        far_depth = far_clip[2] / far_clip[3]
        assert (covered < far_depth - 1e-4).all()

    def test_untextured_uses_debug_palette(self, scene):
        rm, shader2, model, _ = scene
        batch = build_draw_batch(model, None, shader2, rm)
        assert (batch.tri_texture == -1).all()
        vp = _look_at_cube_vp()
        color, depth = cpu_reference.render(batch, vp, 64, 64)
        covered = depth < 1.0
        assert covered.any()
        from mt_renderer_tpu.scene.model import DEBUG_PALETTE
        expect = np.array([*DEBUG_PALETTE[0], 255], np.uint8)
        assert (color[covered] == expect).all()

    def test_skinning_moves_vertices(self, scene):
        rm, shader2, _, material = scene
        model = ModelFile(
            rm.get_resource("model/fixture_cube_skinned", dti_mod.from_name("rModel")).read()
        )
        batch = build_draw_batch(model, material, shader2, rm)
        ident = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        moved = ident.copy()
        moved[1, 0, 3] = 2.0  # translate bone 1 (+z corners) along x
        p0 = cpu_reference.skin_positions(batch, ident)
        p1 = cpu_reference.skin_positions(batch, moved)
        np.testing.assert_allclose(p0, batch.positions, atol=1e-6)
        zpos = batch.positions[:, 2] > 0
        np.testing.assert_allclose(p1[zpos, 0], batch.positions[zpos, 0] + 2.0, atol=1e-5)
        np.testing.assert_allclose(p1[~zpos], batch.positions[~zpos], atol=1e-6)

    def test_overlay_draws_unblended(self, scene):
        rm, shader2, model, material = scene
        batch = build_draw_batch(model, material, shader2, rm)
        vp = _look_at_cube_vp()
        # big overlay triangle right in front of the camera
        opos = np.array([[-3, -3, 2.5], [3, -3, 2.5], [0, 3, 2.5]], np.float32)
        otris = np.array([[0, 1, 2]], np.int32)
        color, _ = cpu_reference.render(
            batch, vp, 64, 64, extra_tris=(opos, otris, (1.0, 0.0, 0.0, 1.0))
        )
        assert (color[32, 32] == [255, 0, 0, 255]).all()

    def test_bilinear_sample_center_exact(self):
        tex = np.zeros((2, 2, 4), np.uint8)
        tex[0, 0] = [100, 0, 0, 255]
        tex[0, 1] = [200, 0, 0, 255]
        # sampling at the exact center of texel (0,0)
        v = cpu_reference.sample_bilinear(tex, np.array([0.25]), np.array([0.25]))
        assert abs(v[0, 0] - 100) < 1e-4
        # halfway between texels 0 and 1 horizontally
        v = cpu_reference.sample_bilinear(tex, np.array([0.5]), np.array([0.25]))
        assert abs(v[0, 0] - 150) < 1e-4


class TestSubdividedCube:
    def test_same_silhouette_as_plain_cube(self):
        # winding/strip correctness: the subdivided cube must cover the
        # exact same pixels as the plain cube from any viewpoint
        from mt_renderer_tpu.scene import demo

        plain = demo.build_demo_batch(instances=1, skinned=False)
        sub = demo.build_demo_batch(instances=1, skinned=False, subdiv=4)
        assert sub.num_triangles == 12 * 16
        vp = _look_at_cube_vp()
        _, d0 = cpu_reference.render(plain, vp, 96, 96)
        _, d1 = cpu_reference.render(sub, vp, 96, 96)
        np.testing.assert_array_equal(d0 < 1.0, d1 < 1.0)

    def test_device_matches_cpu(self):
        from mt_renderer_tpu.render import device
        from mt_renderer_tpu.scene import demo

        sub = demo.build_demo_batch(instances=1, skinned=True, subdiv=4)
        vp = _look_at_cube_vp()
        bones = demo.demo_bone_mats(0.9)
        want, _ = cpu_reference.render(sub, vp, 96, 96, bone_mats=bones)
        got, _ = device.render_frame(
            device.upload(sub), vp, bones, width=96, height=96,
            backend="pallas",
        )
        diff = np.abs(np.asarray(got).astype(int) - want.astype(int)).max(-1)
        assert (diff > 1).mean() <= 0.003
