"""Timeline animation — rScheduler tracks driving per-frame parameters.

The reference parses scheduler files but discards the result
(``/root/reference/src/rscheduler.rs:217`` returns an empty struct); the
track/keyframe model here is the same, plus actual evaluation:

* host sampling with step or linear interpolation (keyframe mode byte:
  0 = step, nonzero = linear — the reference never interprets modes, so
  linear-by-default-for-floats is this framework's convention);
* device sampling: FLOAT tracks compile to ``(frames, values)`` arrays
  sampled with ``jnp.searchsorted`` + lerp inside jit, so a whole
  animated bone palette evaluates on-device per frame;
* a ``BoneAnimator`` mapping the convention-named tracks
  ``joint<N>:<rx|ry|rz|tx|ty|tz>`` onto skeleton local-transform deltas.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.sdl import SchedulerFile, Track, TrackType
from .skeleton import Skeleton, euler_translation_mats

_JOINT_RE = re.compile(r"^joint(\d+):(rx|ry|rz|tx|ty|tz)$")


def sample_track(track: Track, frame: float):
    """Host-side sample with step/linear interpolation."""
    keys = track.keys
    if not keys:
        return None
    if frame <= keys[0].frame:
        return keys[0].value
    for a, b in zip(keys, keys[1:]):
        if frame < b.frame:
            if (
                track.track_type == TrackType.TYPE_FLOAT
                and a.mode != 0
                and b.frame > a.frame
            ):
                t = (frame - a.frame) / (b.frame - a.frame)
                return float(a.value) + t * (float(b.value) - float(a.value))
            return a.value
    return keys[-1].value


def track_arrays(track: Track) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FLOAT track → (frames f32, values f32, linear f32) arrays."""
    frames = np.array([k.frame for k in track.keys], np.float32)
    values = np.array([float(k.value) for k in track.keys], np.float32)
    linear = np.array([float(k.mode != 0) for k in track.keys], np.float32)
    return frames, values, linear


def sample_device(frames: jax.Array, values: jax.Array, linear: jax.Array,
                  t: jax.Array) -> jax.Array:
    """Jittable step/linear sample of one track at scalar time ``t``."""
    n = frames.shape[0]
    i = jnp.clip(jnp.searchsorted(frames, t, side="right") - 1, 0, n - 1)
    j = jnp.minimum(i + 1, n - 1)
    f0 = frames[i]
    f1 = frames[j]
    span = jnp.where(f1 > f0, f1 - f0, 1.0)
    u = jnp.clip((t - f0) / span, 0.0, 1.0)
    lerped = values[i] + u * (values[j] - values[i])
    stepped = values[i]
    out = jnp.where((linear[i] > 0) & (j > i), lerped, stepped)
    return jnp.where(t < frames[0], values[0], out)


class Timeline:
    """All tracks of one scheduler, sampled by name."""

    def __init__(self, sdl: SchedulerFile):
        self.sdl = sdl
        self.tracks: dict[str, Track] = {}
        for tr in sdl.tracks:
            if tr.track_type in (
                TrackType.TYPE_BOOL, TrackType.TYPE_INT,
                TrackType.TYPE_FLOAT, TrackType.TYPE_RESOURCE,
            ):
                self.tracks[tr.name] = tr

    @property
    def duration(self) -> int:
        last = 0
        for tr in self.tracks.values():
            if tr.keys:
                last = max(last, tr.keys[-1].frame)
        return last

    def sample(self, frame: float) -> dict:
        return {
            name: sample_track(tr, frame) for name, tr in self.tracks.items()
        }


class BoneAnimator:
    """joint<N>:<param> FLOAT tracks → device-evaluated bone palettes."""

    def __init__(self, timeline: Timeline, skeleton: Skeleton):
        self.skeleton = skeleton
        self.params: dict[tuple[int, str], tuple] = {}
        for name, tr in timeline.tracks.items():
            m = _JOINT_RE.match(name)
            if m and tr.track_type == TrackType.TYPE_FLOAT and tr.keys:
                jid = int(m.group(1))
                if jid < skeleton.num_joints:
                    self.params[(jid, m.group(2))] = tuple(
                        jnp.asarray(a) for a in track_arrays(tr)
                    )

    def bone_mats(self, frame: float) -> np.ndarray:
        """Host path: palette (J, 4, 4) at ``frame``."""
        j = self.skeleton.num_joints
        vals = {p: np.zeros(j, np.float32) for p in
                ("rx", "ry", "rz", "tx", "ty", "tz")}
        for (jid, param), (f, v, lin) in self.params.items():
            vals[param][jid] = float(
                sample_device(f, v, lin, jnp.float32(frame))
            )
        deltas = euler_translation_mats(
            vals["rx"], vals["ry"], vals["rz"],
            vals["tx"], vals["ty"], vals["tz"],
        )
        return self.skeleton.pose(deltas)

    def bone_mats_device(self, frame: jax.Array) -> jax.Array:
        """Fully jitted path: tracks → deltas → FK → palette on device."""
        j = self.skeleton.num_joints
        vals = {p: jnp.zeros(j, jnp.float32) for p in
                ("rx", "ry", "rz", "tx", "ty", "tz")}
        for (jid, param), (f, v, lin) in self.params.items():
            vals[param] = vals[param].at[jid].set(
                sample_device(f, v, lin, frame)
            )
        deltas = _euler_mats_jnp(
            vals["rx"], vals["ry"], vals["rz"],
            vals["tx"], vals["ty"], vals["tz"],
        )
        return self.skeleton.pose_device(deltas)


def _euler_mats_jnp(rx, ry, rz, tx, ty, tz) -> jax.Array:
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    zero = jnp.zeros_like(rx)
    one = jnp.ones_like(rx)
    rows = [
        [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx, tx],
        [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx, ty],
        [-sy, cy * sx, cy * cx, tz],
        [zero, zero, zero, one],
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


class MaterialAnimator:
    """``material:<name>:<r|g|b|a>`` FLOAT tracks → per-frame (M, 4)
    color multipliers for ``DeviceScene.mat_color``.

    Completes the scheduler's parameter-animation story (SURVEY §7 step
    6: "parameters animated from rScheduler keys — bone mats, material
    params"); swap the array into the scene with ``dataclasses.replace``
    each frame (a pytree-leaf swap, no re-upload).
    """

    _CH = {"r": 0, "g": 1, "b": 2, "a": 3}

    def __init__(self, timeline: Timeline, material_names: list[str]):
        self.num_materials = max(len(material_names), 1)
        self.params: dict[tuple[int, int], tuple] = {}
        slots = {n: i for i, n in enumerate(material_names)}
        for name, tr in timeline.tracks.items():
            if tr.track_type != TrackType.TYPE_FLOAT or not tr.keys:
                continue
            parts = name.split(":")
            if len(parts) == 3 and parts[0] == "material":
                slot = slots.get(parts[1])
                ch = self._CH.get(parts[2])
                if slot is not None and ch is not None:
                    self.params[(slot, ch)] = tuple(
                        jnp.asarray(a) for a in track_arrays(tr)
                    )

    def mat_color(self, frame) -> jax.Array:
        """(M, 4) multiplier at ``frame`` (jittable)."""
        out = jnp.ones((self.num_materials, 4), jnp.float32)
        for (slot, ch), (f, v, lin) in self.params.items():
            out = out.at[slot, ch].set(
                sample_device(f, v, lin, jnp.float32(frame))
            )
        return out
