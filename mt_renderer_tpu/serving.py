"""Serving — ahead-of-time export of the render pipeline.

For production deployment the render step should not require tracing,
Python scene code, or the asset toolchain on the serving host: the whole
jitted frame function (vertex → setup → raster → shade) exports to a
self-contained StableHLO artifact via ``jax.export``, keyed by the scene's
array shapes. A serving process deserialises the artifact and calls it
with (scene arrays, view_proj, bone_mats) — no framework import needed
beyond JAX.

The artifact is specialised to (resolution, backend, triangle-count
bucket) exactly like the in-process jit cache (the analog of shipping the
reference's compiled pipelines instead of its shader compiler).
"""

from __future__ import annotations

import jax
import numpy as np
from jax import export as jax_export

from .render import device


def scene_leaves(scene: device.DeviceScene):
    """The serving ABI: the scene as a flat list of arrays (custom pytree
    aux data is not serialisable by jax.export, and a flat array list is
    a simpler contract for a serving host anyway)."""
    leaves, _ = jax.tree_util.tree_flatten(scene)
    return leaves


def export_render(scene: device.DeviceScene, *, width: int, height: int,
                  backend: str = "pallas", mipmap: bool = False,
                  platforms: list[str] | None = None) -> bytes:
    """Serialize the compiled render step for this scene's shapes.

    Returns the serialized artifact bytes (StableHLO + calling
    convention). ``platforms`` defaults to the current backend; pass
    ``["tpu"]``/``["cpu"]`` to cross-export.
    """

    _, treedef = jax.tree_util.tree_flatten(scene)

    def fn(leaves, view_proj, bone_mats):
        scn = jax.tree_util.tree_unflatten(treedef, leaves)
        color, depth = device.render_frame(
            scn, view_proj, bone_mats, width=width, height=height,
            backend=backend, mipmap=mipmap,
        )
        return color, depth

    args = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype)
         for x in scene_leaves(scene)],
        jax.ShapeDtypeStruct((4, 4), np.float32),
        jax.ShapeDtypeStruct((scene.num_joints, 4, 4), np.float32),
    )
    exported = jax_export.export(
        jax.jit(fn),
        platforms=platforms,
    )(*args)
    return exported.serialize()


class RenderArtifact:
    """A deserialised render step ready to serve."""

    def __init__(self, blob: bytes):
        self._exported = jax_export.deserialize(blob)

    def __call__(self, scene, view_proj, bone_mats):
        leaves = (scene_leaves(scene)
                  if isinstance(scene, device.DeviceScene) else list(scene))
        return self._exported.call(leaves, view_proj, bone_mats)


def load_render(blob: bytes) -> RenderArtifact:
    return RenderArtifact(blob)
