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


def regen():
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    _, _, _, color, depth = _render_cpu()
    np.savez_compressed(GOLDEN, color=color, depth=depth)
    print(f"wrote {GOLDEN} ({GOLDEN.stat().st_size} bytes), "
          f"coverage {(depth < 1.0).mean():.3f}")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
