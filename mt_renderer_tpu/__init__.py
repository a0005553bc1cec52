"""mt_renderer_tpu — a TPU-native MT Framework asset toolkit and renderer.

Host side: binary parsers for the engine's resource formats (rArchive,
rTexture, rModel, rMaterial, rShader2, rShaderPackage, rScheduler, GMD, the
XFS reflection serializer) over a DTI runtime-type registry, plus a resource
manager and CLI tools.

Device side: the render path — vertex decode, skinning, transform, tile-binned
rasterization, BCn texture decode and sampling, material shading — implemented
as JAX/XLA/Pallas programs for TPU, with `shard_map` screen-tile parallelism
for multi-chip frames.
"""

__version__ = "0.1.0"
