"""Skeleton pose math — forward kinematics + skinning palettes.

The reference parses joints, local matrices and inverse-bind matrices
(``/root/reference/src/rmodel.rs:372-422``) and only visualises joint
positions (model.rs:309-315); posing is not implemented there. Here the
skeleton is a first-class animated object: local transforms (rest pose ×
animated deltas) compose through the parent chain and multiply the
inverse-bind matrices into the bone palette consumed by the skinning
matmul (``render/device.py`` vertex stage).

All matrices are float32 (4, 4) acting on column vectors. MT orders
joints parent-before-child (validated at load), so FK is a single
in-order pass — expressed with ``lax.fori_loop`` for the jitted path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Skeleton:
    """Static skeleton data: parents, rest-pose locals, inverse binds."""

    def __init__(self, parents: np.ndarray, local_mats: np.ndarray,
                 inverse_bind_mats: np.ndarray):
        self.parents = np.asarray(parents, np.int32)
        self.local_mats = np.asarray(local_mats, np.float32)
        self.inverse_bind_mats = np.asarray(inverse_bind_mats, np.float32)
        if not (self.parents < np.arange(len(self.parents))).all():
            raise ValueError("joints must be ordered parent-before-child")

    @classmethod
    def from_model(cls, model) -> "Skeleton | None":
        """Build from a parsed ModelFile (None when unskinned)."""
        if not model.joints:
            return None
        parents = np.array(
            [j.parent if j.parent != 255 else -1 for j in model.joints],
            np.int32,
        )
        return cls(parents, model.local_mats, model.inverse_bind_mats)

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    def pose(self, deltas: np.ndarray | None = None) -> np.ndarray:
        """Host FK: palette (J, 4, 4) = world ∘ inverse_bind.

        ``deltas``: optional per-joint (J, 4, 4) animated local transforms
        applied after the rest local (local @ delta)."""
        j = self.num_joints
        world = np.empty((j, 4, 4), np.float32)
        for i in range(j):
            local = self.local_mats[i]
            if deltas is not None:
                local = local @ deltas[i]
            p = self.parents[i]
            world[i] = local if p < 0 else world[p] @ local
        return np.einsum("jik,jkl->jil", world, self.inverse_bind_mats)

    def pose_device(self, deltas: jax.Array) -> jax.Array:
        """Jitted FK over the parent chain (fori_loop, device-resident)."""
        locals_ = jnp.einsum(
            "jik,jkl->jil", jnp.asarray(self.local_mats), deltas,
            precision=jax.lax.Precision.HIGHEST,
        )
        parents = jnp.asarray(self.parents)

        def body(i, world):
            p = parents[i]
            parent_m = jnp.where(
                p < 0, jnp.eye(4, dtype=jnp.float32), world[jnp.maximum(p, 0)]
            )
            return world.at[i].set(
                jnp.matmul(parent_m, locals_[i],
                           precision=jax.lax.Precision.HIGHEST)
            )

        world = jax.lax.fori_loop(
            0, self.num_joints, body,
            jnp.zeros((self.num_joints, 4, 4), jnp.float32),
        )
        return jnp.einsum(
            "jik,jkl->jil", world, jnp.asarray(self.inverse_bind_mats),
            precision=jax.lax.Precision.HIGHEST,
        )

    def joint_world_positions(self, deltas: np.ndarray | None = None
                              ) -> np.ndarray:
        """World-space joint origins (for the debug overlay feed)."""
        j = self.num_joints
        world = np.empty((j, 4, 4), np.float32)
        for i in range(j):
            local = self.local_mats[i]
            if deltas is not None:
                local = local @ deltas[i]
            p = self.parents[i]
            world[i] = local if p < 0 else world[p] @ local
        return world[:, :3, 3].copy()


def euler_translation_mats(rx, ry, rz, tx, ty, tz) -> np.ndarray:
    """Per-joint local delta: T(t) · Rz · Ry · Rx, vectorised over (J,)."""
    rx, ry, rz = (np.asarray(a, np.float32) for a in (rx, ry, rz))
    tx, ty, tz = (np.asarray(a, np.float32) for a in (tx, ty, tz))
    j = len(rx)
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    m = np.zeros((j, 4, 4), np.float32)
    m[:, 0, 0] = cz * cy
    m[:, 0, 1] = cz * sy * sx - sz * cx
    m[:, 0, 2] = cz * sy * cx + sz * sx
    m[:, 1, 0] = sz * cy
    m[:, 1, 1] = sz * sy * sx + cz * cx
    m[:, 1, 2] = sz * sy * cx - cz * sx
    m[:, 2, 0] = -sy
    m[:, 2, 1] = cy * sx
    m[:, 2, 2] = cy * cx
    m[:, 0, 3] = tx
    m[:, 1, 3] = ty
    m[:, 2, 3] = tz
    m[:, 3, 3] = 1.0
    return m
