"""Shared CLI helpers."""

from .. import dti
from ..formats.mfx import Shader2File
from ..resources import ResourceManager

# the engine's shader set lives at this well-known resource path
# (reference modelviewer.rs:78-80)
SHADER_RESOURCE = "custom_shaders/CustomShaderPackage"


def load_shader2(rm: ResourceManager) -> Shader2File:
    res = rm.get_resource_fancy(SHADER_RESOURCE, dti.from_name("rShader2"))
    return Shader2File(res.read())
