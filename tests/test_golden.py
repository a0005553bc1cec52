"""Golden-image regression tests (SURVEY §4 / BASELINE pixel-matching).

The golden is produced by the deterministic NumPy CPU oracle on the
fixture scene and checked in as a compressed npz. The oracle must match
it byte-for-byte; both device backends must match within the edge-pixel
tolerance used throughout.

Regenerate after an *intentional* rendering change:
    python tests/test_golden.py regen
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "fixture_scene_96.npz"

WIDTH = HEIGHT = 96


def _render_cpu():
    from mt_renderer_tpu.render import cpu_reference
    from mt_renderer_tpu.scene import demo

    batch = demo.build_demo_batch(instances=4, skinned=True, subdiv=2)
    cam = demo.demo_camera(4, WIDTH, HEIGHT)
    vp = np.asarray(cam.view_proj())
    bones = demo.demo_bone_mats(0.6)
    color, depth = cpu_reference.render(batch, vp, WIDTH, HEIGHT,
                                        bone_mats=bones)
    return batch, vp, bones, color, depth


class TestGolden:
    def test_cpu_oracle_matches_golden_exactly(self):
        assert GOLDEN.exists(), "golden missing — run: python tests/test_golden.py regen"
        want = np.load(GOLDEN)
        _, _, _, color, depth = _render_cpu()
        np.testing.assert_array_equal(color, want["color"])
        np.testing.assert_allclose(depth, want["depth"], atol=1e-6)
        # sanity: the scene actually renders something interesting
        assert 0.05 < (depth < 1.0).mean() < 0.95

    @pytest.mark.parametrize("backend", ["scan", "pallas"])
    def test_device_matches_golden(self, backend):
        from mt_renderer_tpu.render import device

        want = np.load(GOLDEN)
        batch, vp, bones, _, _ = _render_cpu()
        got, _ = device.render_frame(
            device.upload(batch), vp, bones,
            width=WIDTH, height=HEIGHT, backend=backend,
        )
        diff = np.abs(
            np.asarray(got).astype(np.int32) - want["color"].astype(np.int32)
        ).max(-1)
        assert (diff > 1).mean() <= 0.003


COMPOSITE = Path(__file__).parent / "golden" / "archive_scene_192x96.npz"
CW, CH = 192, 96


def _composite_scene(tmp_root):
    """BASELINE config 5 content: every model in the fixture archive,
    composed with the joint-cube overlay (sceneviewer's scene)."""
    from mt_renderer_tpu import fixtures
    from mt_renderer_tpu.app.camera import Camera
    from mt_renderer_tpu.cli.sceneviewer import build_archive_scene
    from mt_renderer_tpu.cli._common import load_shader2
    from mt_renderer_tpu.resources import ResourceManager

    fixtures.write_fixture_tree(tmp_root)
    rm = ResourceManager(tmp_root)
    shader2 = load_shader2(rm)
    batch, names = build_archive_scene(rm, "fixture_scene", shader2,
                                       overlay=True)
    assert len(names) == 2
    lo, hi = batch.positions.min(0), batch.positions.max(0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) / 2 + 1e-3
    cam = Camera(position=center + [0, radius * 0.4, radius * 2.0],
                 pitch=-10.0, far=max(50.0, radius * 8))
    cam.aspect = CW / CH
    return batch, np.asarray(cam.view_proj())


class TestCompositeGolden:
    """Golden for the config-5 composite (multi-model archive scene +
    overlay): oracle byte-exact, both device backends and both multichip
    strategies within the edge tolerance."""

    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        return _composite_scene(tmp_path_factory.mktemp("arcscene"))

    def test_oracle_matches_golden(self, scene):
        from mt_renderer_tpu.render import cpu_reference

        assert COMPOSITE.exists(), "run: python tests/test_golden.py regen"
        batch, vp = scene
        color, depth = cpu_reference.render(batch, vp, CW, CH)
        want = np.load(COMPOSITE)
        np.testing.assert_array_equal(color, want["color"])
        assert 0.02 < (depth < 1.0).mean() < 0.95

    @pytest.mark.parametrize("backend", ["scan", "pallas"])
    def test_device_matches_golden(self, scene, backend):
        from mt_renderer_tpu.render import device

        batch, vp = scene
        want = np.load(COMPOSITE)["color"]
        got, _ = device.render_frame(device.upload(batch), vp,
                                     width=CW, height=CH, backend=backend)
        diff = np.abs(
            np.asarray(got).astype(np.int32) - want.astype(np.int32)
        ).max(-1)
        assert (diff > 1).mean() <= 0.003

    @pytest.mark.parametrize("strategy", ["band", "geomsplit"])
    def test_multichip_matches_golden(self, scene, strategy):
        from mt_renderer_tpu.parallel.tiles import (
            make_row_mesh, render_frame_geomsplit, render_frame_multichip,
        )
        from mt_renderer_tpu.render import device

        batch, vp = scene
        want = np.load(COMPOSITE)["color"]
        mesh = make_row_mesh(8)
        ds = device.upload(batch)
        if strategy == "band":
            got, _ = render_frame_multichip(ds, vp, None, mesh=mesh,
                                            width=CW, height=CH,
                                            backend="scan")
        else:
            got, _ = render_frame_geomsplit(ds, vp, None, mesh=mesh,
                                            width=CW, height=CH)
        diff = np.abs(
            np.asarray(got).astype(np.int32) - want.astype(np.int32)
        ).max(-1)
        assert (diff > 1).mean() <= 0.003


def regen():
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    _, _, _, color, depth = _render_cpu()
    np.savez_compressed(GOLDEN, color=color, depth=depth)
    print(f"wrote {GOLDEN} ({GOLDEN.stat().st_size} bytes), "
          f"coverage {(depth < 1.0).mean():.3f}")

    import tempfile

    from mt_renderer_tpu.render import cpu_reference

    batch, vp = _composite_scene(Path(tempfile.mkdtemp()))
    color, depth = cpu_reference.render(batch, vp, CW, CH)
    np.savez_compressed(COMPOSITE, color=color, depth=depth)
    print(f"wrote {COMPOSITE} ({COMPOSITE.stat().st_size} bytes), "
          f"coverage {(depth < 1.0).mean():.3f}")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
