"""App framework, debug overlay, viewer CLI, and texture-view tests."""

import numpy as np
import pytest

from mt_renderer_tpu import fixtures
from mt_renderer_tpu.app.manager import RendererApp, RendererAppManager
from mt_renderer_tpu.render import cpu_reference, device
from mt_renderer_tpu.render.texture_view import view_texture, ycbcr_to_rgba
from mt_renderer_tpu.scene import demo
from mt_renderer_tpu.scene.model import merge_batches
from mt_renderer_tpu.scene.overlay import DebugOverlay, OVERLAY_RGBA


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    fixtures.write_fixture_tree(root)
    return root


class TestOverlay:
    def test_batch_geometry(self):
        ov = DebugOverlay()
        ov.add_cube_at([1.0, 2.0, 3.0], scale=0.1)
        ov.add_cube_at([0.0, 0.0, 0.0], scale=1.0)
        b = ov.batch()
        assert b.num_vertices == 16 and b.num_triangles == 24
        # first cube spans [1±.05, 2±.05, 3±.05]
        np.testing.assert_allclose(b.positions[:8].mean(0), [1, 2, 3], atol=1e-6)
        assert (b.tri_flat == OVERLAY_RGBA).all()
        ov.clear()
        assert ov.batch() is None

    def test_overlay_renders_flat_color(self):
        ov = DebugOverlay()
        ov.add_cube_at([0, 0, 0], scale=1.0)
        batch = ov.batch()
        from mt_renderer_tpu.app.camera import Camera

        cam = Camera(position=[0, 0, 3])
        c, d = device.render_frame(
            device.upload(batch), cam.view_proj(), None, width=64, height=64
        )
        c = np.asarray(c)
        covered = np.asarray(d) < 1.0
        assert covered.any()
        expect = (OVERLAY_RGBA + 0.5).astype(np.uint8)
        assert (c[covered] == expect).all()

    def test_merged_overlay_matches_cpu(self):
        # skinned model + unskinned overlay in one batch, both paths agree
        batch = demo.build_demo_batch(instances=1, skinned=True)
        ov = DebugOverlay()
        ov.add_cube_at([0, 0, 2.0], scale=0.5)
        merged = merge_batches(batch, ov.batch())
        cam = demo.demo_camera(1, 96, 96)
        vp = np.asarray(cam.view_proj())
        bones = demo.demo_bone_mats(0.8)
        want, _ = cpu_reference.render(merged, vp, 96, 96, bone_mats=bones)
        got, _ = device.render_frame(
            device.upload(merged), vp, bones, width=96, height=96
        )
        diff = np.abs(np.asarray(got).astype(int) - want.astype(int)).max(-1)
        assert (diff > 1).mean() <= 0.005

    def test_instance_cap(self):
        ov = DebugOverlay()
        for _ in range(1024):
            ov.add_cube_at([0, 0, 0])
        with pytest.raises(ValueError):
            ov.add_cube_at([0, 0, 0])


class TestAppManager:
    def test_frame_cycle(self):
        frames = []

        class App(RendererApp):
            def setup(self, mgr):
                self.n = 0

            def render(self, mgr):
                self.n += 1
                return np.full((mgr.height, mgr.width, 4), self.n, np.uint8)

        mgr = RendererAppManager(App(), width=8, height=8)
        out = mgr.run_headless(frames=3)
        assert (out == 3).all()
        assert mgr.frame_index == 3
        assert mgr.frame_time >= 0

    def test_png_output(self, tmp_path):
        class App(RendererApp):
            def setup(self, mgr):
                pass

            def render(self, mgr):
                return np.zeros((4, 4, 4), np.uint8)

        mgr = RendererAppManager(App(), width=4, height=4)
        mgr.run_headless(frames=2, out_path=str(tmp_path / "f_{i}.png"))
        assert (tmp_path / "f_0.png").exists()
        assert (tmp_path / "f_1.png").exists()


class TestInteractiveSession:
    """Scripted event pump → InputState → Camera.update → frames — the
    reference's winit path (renderer_app_manager.rs:215-269,
    camera.rs:49-59, input_state.rs:52-79) without a window."""

    class FlyApp(RendererApp):
        """Renders the demo cube; camera.update+fly each frame like
        modelviewer.rs:212-215 (fly is the WASD extension)."""

        def setup(self, mgr):
            batch = demo.build_demo_batch(instances=1, skinned=False)
            self.scene = device.upload(batch)
            self.trajectory = []

        def render(self, mgr):
            mgr.camera.update(mgr.input, mgr.aspect)
            mgr.camera.fly(mgr.input, dt=0.1, speed=2.0)
            self.trajectory.append(
                (mgr.camera.yaw, mgr.camera.pitch, mgr.camera.position.copy())
            )
            c, _ = device.render_frame(
                self.scene, mgr.camera.view_proj(), None,
                width=mgr.width, height=mgr.height,
            )
            return c

    def test_wasd_mouse_trajectory(self):
        from mt_renderer_tpu.app.camera import Camera

        app = self.FlyApp()
        mgr = RendererAppManager(app, width=64, height=64,
                                 camera=Camera(position=[0, 0, 4.0]))
        events = [
            [("mouse", 10.0, 5.0)],                 # look: yaw -1.0, pitch -0.5
            [("key_down", "W")],                    # start moving forward
            [],                                     # W held
            [("key_up", "W"), ("mouse", -10.0, -5.0)],  # stop + look back
            [],
        ]
        last = mgr.run_interactive(events)
        assert last.shape == (64, 64, 4)

        yaws = [t[0] for t in app.trajectory]
        pitches = [t[1] for t in app.trajectory]
        # frame 0: sensitivity 0.1 -> yaw 0-1.0 (mod 360), pitch -0.5
        assert abs(yaws[0] - 359.0) < 1e-5 and abs(pitches[0] + 0.5) < 1e-5
        # no mouse events in frames 1-2: delta reset (input_state.rs:52-79)
        assert yaws[1] == yaws[0] and yaws[2] == yaws[1]
        # frame 3 restores the original view
        assert abs(yaws[3] - 0.0) < 1e-5 and abs(pitches[3] - 0.0) < 1e-5

        # W held for frames 1-3 (released during frame 3's dispatch):
        # two steps of 0.2 units along the yaw/pitch-rotated forward
        from mt_renderer_tpu.app.camera import rotation_x, rotation_y

        r = rotation_y(yaws[0]) @ rotation_x(pitches[0])
        fwd = -r[:3, 2]
        want1 = np.array([0, 0, 4.0], np.float32) + fwd * 0.2
        want2 = want1 + fwd * 0.2
        np.testing.assert_allclose(app.trajectory[1][2], want1, atol=1e-6)
        np.testing.assert_allclose(app.trajectory[2][2], want2, atol=1e-6)
        # frame 3: W was released before render -> no further motion
        np.testing.assert_allclose(app.trajectory[3][2], want2, atol=1e-6)

        # the camera motion actually changes the rendered frames
        frames = []
        app2 = self.FlyApp()
        mgr2 = RendererAppManager(app2, width=64, height=64,
                                  camera=Camera(position=[0, 0, 4.0]))
        mgr2.run_interactive(
            [[("key_down", "W")], [], [], []],
            on_frame=lambda i, f: frames.append(f),
        )
        assert (frames[0] != frames[-1]).any()
        # moving toward the cube grows its on-screen coverage
        assert (frames[-1][..., :3].min(-1) < 250).sum() \
            > (frames[0][..., :3].min(-1) < 250).sum()

    def test_dispatch_rejects_unknown(self):
        mgr = RendererAppManager(self.FlyApp(), width=8, height=8)
        with pytest.raises(ValueError):
            mgr.dispatch_event(("scroll", 1.0))


class TestTextureView:
    def test_ycbcr_identity_gray(self):
        # Y=0.5, Cb=Cr=bias, A=1 -> gray 0.5
        s = np.array([0.482353002, 1.0, 0.482353002, 0.5], np.float32)
        rgba = np.asarray(ycbcr_to_rgba(s))
        np.testing.assert_allclose(rgba, [0.5, 0.5, 0.5, 1.0], atol=1e-5)

    def test_aspect_fit_letterbox(self):
        tex = np.zeros((32, 64, 4), np.uint8)  # wide texture
        tex[..., 3] = 255
        frame = np.asarray(view_texture(tex, width=64, height=64, ycbcr=False))
        # top/bottom letterboxed white, center black
        assert (frame[0] == 255).all()
        assert (frame[63] == 255).all()
        assert (frame[32, 32, :3] == 0).all()


class TestViewerClis:
    def test_modelviewer(self, fixture_root, tmp_path, capsys):
        from mt_renderer_tpu.cli import modelviewer

        out = tmp_path / "mv_{i}.png"
        modelviewer.main([
            str(fixture_root), str(fixture_root / "chara/fixture_character.chr"),
            "--out", str(out), "--frames", "2", "--width", "96",
            "--height", "96", "--overlay",
        ])
        assert (tmp_path / "mv_0.png").exists()
        assert (tmp_path / "mv_1.png").exists()
        assert "tris" in capsys.readouterr().out

    def test_textureviewer(self, fixture_root, tmp_path, capsys):
        from mt_renderer_tpu.cli import textureviewer

        out = tmp_path / "t.png"
        textureviewer.main([
            str(fixture_root / "model/fixture_albedo.tex"),
            "--out", str(out), "--raw", "--width", "64", "--height", "64",
        ])
        assert out.exists()

    def test_textureviewer_serve_hud_smoke(self, fixture_root, capsys):
        from mt_renderer_tpu.cli import textureviewer

        textureviewer.main([
            str(fixture_root / "model/fixture_albedo.tex"),
            "--raw", "--width", "96", "--height", "96", "--hud",
            "--serve", "0", "--serve-frames", "2",
        ])
        out = capsys.readouterr().out
        assert "serving texture view on http://127.0.0.1:" in out
        assert "served 2 frame(s)" in out


class TestProfiling:
    def test_frame_stats(self):
        from mt_renderer_tpu.utils.profiling import FrameStats

        st = FrameStats(window=4)
        for _ in range(10):
            st.push(0.01, triangles=1000, texels=5000)
        assert abs(st.fps - 100.0) < 1e-6
        assert abs(st.frame_time_ms - 10.0) < 1e-6
        assert abs(st.mtri_per_s - 0.1) < 1e-6
        assert "fps" in st.summary()
        assert st.frames == 10

    def test_stage_timer_fences(self):
        import jax.numpy as jnp

        from mt_renderer_tpu.utils.profiling import stage_timer

        times = {}
        with stage_timer(times, "op") as fence:
            fence(jnp.ones((64, 64)) * 2.0)
        assert times["op"] > 0

    def test_manager_tracks_stats(self):
        import numpy as np

        class App(RendererApp):
            def setup(self, mgr):
                pass

            def render(self, mgr):
                return np.zeros((4, 4, 4), np.uint8)

        mgr = RendererAppManager(App(), width=4, height=4)
        mgr.run_headless(frames=5)
        assert mgr.stats.frames == 5
        assert mgr.stats.fps > 0


class TestSceneViewer:
    def test_archive_scene_composes(self, fixture_root, tmp_path, capsys):
        from mt_renderer_tpu.cli import sceneviewer

        out = tmp_path / "scene.png"
        sceneviewer.main([
            str(fixture_root), "fixture_scene", "--out", str(out),
            "--overlay", "--width", "192", "--height", "96",
        ])
        assert out.exists()
        text = capsys.readouterr().out
        assert "2 models" in text
        assert "2 textures" in text

    def test_merge_remaps_textures(self):
        a = demo.build_demo_batch(instances=1, skinned=False)
        b = demo.build_demo_batch(instances=1, skinned=False)
        b.positions = b.positions + np.array([3.0, 0, 0], np.float32)
        m = merge_batches(a, b)
        assert len(m.textures) == 2
        # b's triangles now point at the second texture layer
        assert (m.tri_texture[a.num_triangles:] == 1).all()
        assert (m.tri_texture[: a.num_triangles] == 0).all()

    def test_sceneviewer_multichip(self, fixture_root, tmp_path):
        from mt_renderer_tpu.cli import sceneviewer

        out = tmp_path / "scene8.png"
        sceneviewer.main([
            str(fixture_root), "fixture_scene", "--out", str(out),
            "--width", "128", "--height", "64", "--devices", "8",
            "--backend", "scan",
        ])
        assert out.exists()


class TestFrameStreamServer:
    """HTTP frontend (app/serve.py) — the live-window analog
    (reference: winit loop + swapchain present,
    renderer_app_manager.rs:202-272)."""

    def test_serve_stream_and_events(self):
        import json
        import threading
        import time
        import urllib.request

        from mt_renderer_tpu.app.input_state import Key
        from mt_renderer_tpu.app.serve import FrameStreamServer

        class App(RendererApp):
            def setup(self, mgr):
                pass

            def render(self, mgr):
                # frame encodes the live input state: W held -> white
                v = 255 if mgr.input.has_key(Key.W) else 0
                f = np.full((8, 8, 4), v, np.uint8)
                f[..., 3] = 255
                return f

        mgr = RendererAppManager(App(), width=8, height=8)
        srv = FrameStreamServer(mgr, port=0)
        t = threading.Thread(target=srv.serve,
                             kwargs={"fps_cap": 200.0}, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.port}"
        try:
            page = urllib.request.urlopen(f"{base}/", timeout=10).read()
            assert b"/stream" in page
            png = urllib.request.urlopen(f"{base}/frame.png",
                                         timeout=10).read()
            assert png.startswith(b"\x89PNG")
            # key_down W routes through dispatch_event into InputState
            req = urllib.request.Request(
                f"{base}/event", data=b'[["key_down","W"]]', method="POST")
            assert json.loads(urllib.request.urlopen(
                req, timeout=10).read())["queued"] == 1
            deadline = time.time() + 10
            while time.time() < deadline:
                png = urllib.request.urlopen(f"{base}/frame.png",
                                             timeout=10).read()
                from mt_renderer_tpu.utils.png import encode_png

                white = encode_png(
                    np.dstack([np.full((8, 8, 3), 255, np.uint8),
                               np.full((8, 8, 1), 255, np.uint8)]),
                    level=1)
                if png == white:
                    break
                time.sleep(0.02)
            else:
                raise AssertionError("W keypress never reached the frame")
            stats = json.loads(urllib.request.urlopen(
                f"{base}/stats", timeout=10).read())
            assert stats["frames"] > 0 and stats["width"] == 8
        finally:
            srv.stop()
            t.join(timeout=10)
        assert not t.is_alive()

    def test_modelviewer_serve_smoke(self, fixture_root, capsys):
        from mt_renderer_tpu.cli import modelviewer

        modelviewer.main([
            str(fixture_root),
            str(fixture_root / "chara/fixture_character.chr"),
            "--width", "64", "--height", "64",
            "--serve", "0", "--serve-frames", "3",
        ])
        out = capsys.readouterr().out
        assert "serving live viewer on http://127.0.0.1:" in out
        assert "served 3 frame(s)" in out

    def test_modelviewer_demo_world_serve(self, capsys):
        from mt_renderer_tpu.cli import modelviewer

        modelviewer.main([
            "--demo", "6", "--width", "96", "--height", "96",
            "--serve", "0", "--serve-frames", "2",
        ])
        out = capsys.readouterr().out
        assert "world:" in out and "served 2 frame(s)" in out
