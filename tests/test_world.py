"""Archive-world scene tests (scene/world.py) — the game-scale
heterogeneous workload: distinct parsed models, mixed texture sizes,
>128 material slots (gather-fallback _mat_select), per-instance skinned
characters animated from the .sdl scheduler."""

import numpy as np

from mt_renderer_tpu.render import cpu_reference, device
from mt_renderer_tpu.scene import world

from test_device_render import assert_frames_match

SMALL = dict(buildings=18, characters=3, variants=6, terrain_subdiv=3)


def _small():
    return world.build_world(**SMALL)


class TestBuild:
    def test_deterministic(self):
        a, b = _small(), _small()
        np.testing.assert_array_equal(a.batch.positions, b.batch.positions)
        np.testing.assert_array_equal(a.mat_color, b.mat_color)
        assert a.info == b.info

    def test_heterogeneity_invariants(self):
        ws = _small()
        info = ws.info
        # distinct models, mixed texture sizes in ONE pool, one material
        # slot per instance, 8-wide skinning on a 24-joint palette
        assert info["models_distinct"] == 8
        assert len(info["tex_sizes"]) >= 4
        assert info["materials"] == 1 + 18 + 3
        assert ws.batch.joints.shape[1] == 8
        assert info["joints"] == 24
        assert ws.batch.num_triangles == info["tris"]
        scene = device.upload(ws.batch)
        assert scene.num_mips >= 8           # 256^2 chain in the pool
        # per-slot tints travel to the device scene
        np.testing.assert_allclose(np.asarray(scene.mat_color),
                                   ws.mat_color)

    def test_mat_select_gather_fallback(self):
        # >128 slots pushes _mat_select onto the gather path
        ws = world.build_world(buildings=130, characters=2, variants=4,
                               terrain_subdiv=2,
                               building_subdivs=(1, 2))
        assert ws.info["materials"] > 128


class TestBonePalette:
    def test_conjugation_articulates_locally(self):
        """T_i @ M_j @ T_i^-1 applied to a world-baked point equals the
        instance transform of the locally animated point."""
        ws = _small()
        anim = ws.animator()
        base = anim.bone_mats(10.0)                 # (8, 4, 4)
        pal = ws.bone_palette(base)                 # (24, 4, 4)
        rng = np.random.default_rng(0)
        p_local = np.append(rng.uniform(-1, 1, 3), 1).astype(np.float32)
        for ci in range(3):
            t = ws.char_mats[ci]
            for j in range(8):
                got = pal[8 * ci + j] @ (t @ p_local)
                want = t @ (base[j] @ p_local)
                np.testing.assert_allclose(got, want, atol=1e-4)

    def test_animation_moves_vertices(self):
        ws = _small()
        anim = ws.animator()
        scene = device.upload(ws.batch)
        vp = world.world_camera(96, 96, buildings=18).view_proj()
        f0, _ = device.render_frame(
            scene, vp, ws.bone_palette(anim.bone_mats(0.0)),
            width=96, height=96, backend="scan")
        f1, _ = device.render_frame(
            scene, vp, ws.bone_palette(anim.bone_mats(30.0)),
            width=96, height=96, backend="scan")
        assert (np.asarray(f0) != np.asarray(f1)).any()


class TestWorldDifferential:
    """The oracle differential on the heterogeneous scene: mixed
    models/textures/materials through all three pixel paths."""

    def test_oracle_vs_device_backends(self):
        ws = _small()
        pal = ws.bone_palette(ws.animator().bone_mats(12.0))
        vp = np.asarray(world.world_camera(128, 128,
                                           buildings=18).view_proj())
        want, want_d = cpu_reference.render(
            ws.batch, vp, 128, 128, bone_mats=pal)
        scene = device.upload(ws.batch)
        for backend in ("scan", "pallas"):
            got, got_d = device.render_frame(
                scene, vp, pal, width=128, height=128, backend=backend,
                maxc=64)
            assert_frames_match(np.asarray(got), want)
            cov = (np.asarray(got_d) < 1.0) == (want_d < 1.0)
            assert cov.mean() > 0.997

    def test_mipmap_path_renders(self):
        ws = _small()
        pal = ws.bone_palette(ws.animator().bone_mats(5.0))
        vp = np.asarray(world.world_camera(128, 128,
                                           buildings=18).view_proj())
        scene = device.upload(ws.batch)
        got, d = device.render_frame(
            scene, vp, pal, width=128, height=128, backend="pallas",
            mipmap=True, maxc=64)
        assert (np.asarray(d) < 1.0).mean() > 0.5   # terrain coverage
