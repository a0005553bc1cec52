"""App framework — the frame driver.

The reference's ``RendererAppManager`` owns the winit event loop, the wgpu
device and the per-frame render/submit/present cycle
(``/root/reference/src/renderer_app_manager.rs:84-272``); apps implement
a three-hook trait (``setup`` / ``render`` / ``post_render``,
renderer_app_manager.rs:14-32).

The TPU-native equivalent drives a jitted ``render`` returning a frame
array; the "swapchain present" is a host readback handed to a frontend
(PNG file, in-memory list, or a user callback). No OS window exists in
this environment, so the interactive path takes scripted input events
instead of a live event pump — the camera/input math is identical.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from .camera import Camera
from .input_state import InputState


class RendererApp:
    """Subclass hook points (mirrors the reference trait)."""

    def setup(self, manager: "RendererAppManager") -> None:
        raise NotImplementedError

    def render(self, manager: "RendererAppManager") -> np.ndarray:
        """Return the frame as (H, W, 4) uint8 (device array OK)."""
        raise NotImplementedError

    def post_render(self, manager: "RendererAppManager") -> None:
        pass


class RendererAppManager:
    def __init__(self, app: RendererApp, width: int = 512, height: int = 512,
                 camera: Camera | None = None):
        self.app = app
        self.width = width
        self.height = height
        self.camera = camera or Camera(position=[0.0, 0.0, 4.0])
        self.camera.aspect = width / height
        self.input = InputState()
        self.frame_time = 0.0          # seconds, last frame (rs:64-66)
        self.frame_index = 0
        self._last = None
        from ..utils.profiling import FrameStats

        self.stats = FrameStats()

    @property
    def aspect(self) -> float:
        return self.width / self.height

    def run_frame(self) -> np.ndarray:
        """One render cycle: render → input.next_frame → post_render."""
        t0 = time.perf_counter()
        frame = self.app.render(self)
        self.input.next_frame()
        self.app.post_render(self)
        self.frame_time = time.perf_counter() - t0
        self.stats.push(self.frame_time)
        self.frame_index += 1
        self._last = frame
        return frame

    def run_headless(self, frames: int = 1, out_path=None,
                     on_frame=None) -> np.ndarray:
        """Run ``setup`` then ``frames`` render cycles.

        ``out_path``: write the last frame (or every frame if the path
        contains ``{i}``) as PNG. ``on_frame(i, frame)``: optional hook.
        Returns the last frame as a NumPy array.
        """
        self.app.setup(self)
        last = None
        for i in range(frames):
            frame = np.asarray(self.run_frame())
            if on_frame is not None:
                on_frame(i, frame)
            if out_path is not None and "{i}" in str(out_path):
                self._write(str(out_path).format(i=i), frame)
            last = frame
        if out_path is not None and "{i}" not in str(out_path):
            self._write(out_path, last)
        return last

    @staticmethod
    def _write(path, frame: np.ndarray) -> None:
        from ..utils.png import write_png

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        write_png(path, frame)
