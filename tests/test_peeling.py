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
