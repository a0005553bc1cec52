"""Parser robustness: corrupt/truncated/random input must raise clean
Python exceptions (ValueError & friends), never crash or hang.

The reference's philosophy is fail-fast asserts on unexpected data
(SURVEY §5); this pins the equivalent behavior for every parser.
"""

import numpy as np
import pytest

from mt_renderer_tpu import fixtures


def _parsers():
    from mt_renderer_tpu.formats import arc, gmd, mfx, mod, mrl, sdl, spkg, tex, xfs

    shader2 = mfx.Shader2File(fixtures.build_shader2())
    return {
        "arc": lambda b: arc.ArchiveFile(b),
        "tex": lambda b: tex.TextureFile(b),
        "mod": lambda b: mod.ModelFile(b),
        "mrl": lambda b: mrl.MaterialFile(b, shader2),
        "mfx": lambda b: mfx.Shader2File(b),
        "spkg": lambda b: spkg.ShaderPackageFile(b, shader2),
        "sdl": lambda b: sdl.SchedulerFile(b),
        "gmd": lambda b: gmd.GuiMessageFile.parse(b),
        "xfs": lambda b: xfs.deserialize(b),
    }


def _valid_blobs():
    return {
        "arc": fixtures.build_archive(),
        "tex": fixtures.build_texture_rgba(),
        "mod": fixtures.build_model(),
        "mrl": fixtures.build_material(),
        "mfx": fixtures.build_shader2(),
        "spkg": fixtures.build_shader_package(),
        "sdl": fixtures.build_scheduler(),
        "gmd": fixtures.build_gmd(),
        "xfs": fixtures.build_character_prp(),
    }

OK_ERRORS = (ValueError, KeyError, IndexError, NotImplementedError,
             EOFError, OverflowError, UnicodeDecodeError)


@pytest.mark.parametrize("name", list(_valid_blobs().keys()))
class TestFuzz:
    def test_truncations(self, name):
        parse = _parsers()[name]
        blob = _valid_blobs()[name]
        for frac in (0.0, 0.1, 0.5, 0.9, 0.99):
            cut = blob[: int(len(blob) * frac)]
            try:
                parse(cut)
            except OK_ERRORS:
                pass

    def test_random_bytes(self, name):
        parse = _parsers()[name]
        rng = np.random.default_rng(hash(name) % 2**31)
        for size in (0, 16, 256, 4096):
            junk = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
            try:
                parse(junk)
            except OK_ERRORS:
                pass

    def test_bitflip_corruption(self, name):
        parse = _parsers()[name]
        blob = bytearray(_valid_blobs()[name])
        rng = np.random.default_rng(hash(name) % 2**31 + 1)
        for _ in range(16):
            b = bytearray(blob)
            for _f in range(4):
                i = rng.integers(0, len(b))
                b[i] ^= 1 << rng.integers(0, 8)
            try:
                parse(bytes(b))
            except OK_ERRORS:
                pass
