"""Skeleton FK + scheduler-timeline animation tests."""

import numpy as np
import pytest

from mt_renderer_tpu import fixtures
from mt_renderer_tpu.formats.mod import ModelFile
from mt_renderer_tpu.formats.sdl import SchedulerFile
from mt_renderer_tpu.scene.animation import (
    BoneAnimator, Timeline, sample_device, sample_track, track_arrays,
)
from mt_renderer_tpu.scene.skeleton import Skeleton, euler_translation_mats


@pytest.fixture(scope="module")
def skeleton():
    model = ModelFile(fixtures.build_model(skinned=True))
    return Skeleton.from_model(model)


@pytest.fixture(scope="module")
def timeline():
    return Timeline(SchedulerFile(fixtures.build_scheduler_bones(60)))


class TestSkeleton:
    def test_rest_pose_identity(self, skeleton):
        # identity locals + identity inverse binds -> identity palette
        pal = skeleton.pose()
        np.testing.assert_allclose(
            pal, np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)), atol=1e-6
        )

    def test_parent_chain_composition(self, skeleton):
        # translating the root moves the child's world too
        deltas = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        deltas[0, 0, 3] = 1.0
        pal = skeleton.pose(deltas)
        assert abs(pal[0, 0, 3] - 1.0) < 1e-6
        assert abs(pal[1, 0, 3] - 1.0) < 1e-6   # inherited

    def test_device_matches_host(self, skeleton):
        rng = np.random.default_rng(0)
        deltas = euler_translation_mats(
            rng.uniform(-1, 1, 2), rng.uniform(-1, 1, 2),
            rng.uniform(-1, 1, 2), rng.uniform(-1, 1, 2),
            rng.uniform(-1, 1, 2), rng.uniform(-1, 1, 2),
        )
        host = skeleton.pose(deltas)
        dev = np.asarray(skeleton.pose_device(deltas))
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_rejects_unordered(self):
        with pytest.raises(ValueError):
            Skeleton(
                np.array([1, -1]),
                np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
                np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
            )


class TestTimeline:
    def test_tracks_parsed(self, timeline):
        assert "joint1:rx" in timeline.tracks
        assert timeline.duration == 60

    def test_linear_interpolation(self, timeline):
        tr = timeline.tracks["joint1:rx"]
        v0 = sample_track(tr, 0)
        v30 = sample_track(tr, 30)
        v15 = sample_track(tr, 15)
        assert v0 == 0.0
        assert abs(v30 - np.pi / 3) < 1e-6
        assert abs(v15 - np.pi / 6) < 1e-5   # halfway, linear

    def test_device_sampler_matches_host(self, timeline):
        tr = timeline.tracks["joint1:tx"]
        f, v, lin = (np.asarray(a) for a in track_arrays(tr))
        for t in (0.0, 7.5, 30.0, 45.0, 60.0, 99.0):
            host = sample_track(tr, t)
            dev = float(sample_device(f, v, lin, np.float32(t)))
            assert abs(dev - host) < 1e-5, t

    def test_step_mode(self):
        from mt_renderer_tpu.formats.sdl import Key, Track, TrackType

        tr = Track(TrackType.TYPE_FLOAT, 0, "s", 0,
                   keys=[Key(0, 0, 1.0), Key(10, 0, 2.0)])
        assert sample_track(tr, 5) == 1.0
        f, v, lin = track_arrays(tr)
        assert float(sample_device(f, v, lin, np.float32(5.0))) == 1.0

    def test_sample_all(self, timeline):
        vals = timeline.sample(30)
        assert abs(vals["joint1:tx"] - 0.6) < 1e-6


class TestBoneAnimator:
    def test_palette_moves_joint(self, skeleton, timeline):
        anim = BoneAnimator(timeline, skeleton)
        assert len(anim.params) == 2
        rest = anim.bone_mats(0.0)
        mid = anim.bone_mats(30.0)
        np.testing.assert_allclose(
            rest, np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)), atol=1e-5
        )
        # joint1 translated by tx=0.6 at frame 30
        assert abs(mid[1, 0, 3] - 0.6) < 1e-5
        # and rotated around x
        assert abs(mid[1, 1, 1] - np.cos(np.pi / 3)) < 1e-5

    def test_device_path_matches(self, skeleton, timeline):
        anim = BoneAnimator(timeline, skeleton)
        host = anim.bone_mats(21.0)
        dev = np.asarray(anim.bone_mats_device(np.float32(21.0)))
        np.testing.assert_allclose(dev, host, atol=1e-5)


class TestAnimatedViewer:
    def test_modelviewer_with_sdl(self, tmp_path, capsys):
        fixtures.write_fixture_tree(tmp_path)
        from mt_renderer_tpu.cli import modelviewer

        modelviewer.main([
            str(tmp_path),
            str(tmp_path / "chara/fixture_character_skinned.chr"),
            "--sdl", str(tmp_path / "motion/fixture_bones.sdl"),
            "--out", str(tmp_path / "af_{i}.png"), "--frames", "2",
            "--width", "96", "--height", "96",
        ])
        out = capsys.readouterr().out
        assert "bone tracks" in out
        assert (tmp_path / "af_1.png").exists()


class TestMaterialAnimation:
    def _timeline(self):
        from mt_renderer_tpu.formats import sdl
        from mt_renderer_tpu import dti as dti_mod

        tracks = [
            sdl.Track(sdl.TrackType.TYPE_FLOAT, int(dti_mod.PropType.f32),
                      "material:fixture_mat:a", 0,
                      keys=[sdl.Key(0, 1, 1.0), sdl.Key(30, 1, 0.0)]),
            sdl.Track(sdl.TrackType.TYPE_FLOAT, int(dti_mod.PropType.f32),
                      "material:fixture_mat:r", 0,
                      keys=[sdl.Key(0, 0, 0.5)]),
        ]
        return Timeline(SchedulerFile(
            __import__("mt_renderer_tpu.formats.sdl", fromlist=["x"])
            .write_scheduler(tracks)
        ))

    def test_mat_color_tracks(self):
        from mt_renderer_tpu.scene.animation import MaterialAnimator

        anim = MaterialAnimator(self._timeline(), ["fixture_mat"])
        c0 = np.asarray(anim.mat_color(0.0))
        c15 = np.asarray(anim.mat_color(15.0))
        assert abs(c0[0, 3] - 1.0) < 1e-6 and abs(c0[0, 0] - 0.5) < 1e-6
        assert abs(c15[0, 3] - 0.5) < 1e-5      # linear fade
        assert abs(c15[0, 1] - 1.0) < 1e-6      # untracked channel = 1

    def test_mat_color_drives_device_shading(self):
        import dataclasses

        from mt_renderer_tpu.render import device
        from mt_renderer_tpu.scene import demo
        from mt_renderer_tpu.scene.animation import MaterialAnimator

        batch = demo.build_demo_batch(instances=1, skinned=False)
        scene = device.upload(batch)
        cam = demo.demo_camera(1, 64, 64)
        vp = np.asarray(cam.view_proj())
        base, d = device.render_frame(scene, vp, None, width=64, height=64)
        cov = np.asarray(d) < 1.0

        anim = MaterialAnimator(self._timeline(), batch.material_names)
        dark = dataclasses.replace(scene, mat_color=anim.mat_color(0.0))
        c0, _ = device.render_frame(dark, vp, None, width=64, height=64)
        # r halved, g/b unchanged, alpha 1
        got = np.asarray(c0)[cov].astype(np.float64)
        ref = np.asarray(base)[cov].astype(np.float64)
        assert np.abs(got[:, 0] - ref[:, 0] * 0.5).max() < 2
        assert np.abs(got[:, 1] - ref[:, 1]).max() <= 1

    def test_matches_cpu_with_mat_color(self):
        from mt_renderer_tpu.render import cpu_reference, device
        from mt_renderer_tpu.scene import demo
        import dataclasses

        batch = demo.build_demo_batch(instances=1, skinned=False)
        mc = np.array([[0.3, 1.0, 0.7, 1.0]], np.float32)
        batch.mat_color_host = mc
        cam = demo.demo_camera(1, 64, 64)
        vp = np.asarray(cam.view_proj())
        want, _ = cpu_reference.render(batch, vp, 64, 64)
        scene = dataclasses.replace(device.upload(batch),
                                    mat_color=np.asarray(mc))
        got, _ = device.render_frame(scene, vp, None, width=64, height=64)
        diff = np.abs(np.asarray(got).astype(int) - want.astype(int)).max(-1)
        assert (diff > 1).mean() <= 0.003
