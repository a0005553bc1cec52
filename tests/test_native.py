"""Native C++ runtime tests — parity with the pure-Python paths."""

import zlib

import numpy as np
import pytest

from mt_renderer_tpu import native
from mt_renderer_tpu.utils.crc import crc32 as py_crc32

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


class TestNativeCrc:
    def test_known_vector(self):
        # same pin as the reference test (crc.rs:52-64) and utils.crc
        assert native.crc32(b"MtObject") & 0x7FFFFFFF == 0x2EA10CEB

    def test_matches_python(self):
        for s in (b"", b"abc", b"nGO::rCharacter", b"with\0nul\0stop", b"x" * 300):
            assert native.crc32(s) == py_crc32(s)

    def test_nul_stop(self):
        assert native.crc32(b"abc\0def") == native.crc32(b"abc")


class TestNativeZlib:
    def test_deflate_inflate_roundtrip(self):
        blobs = [bytes(range(256)) * (i + 1) for i in range(8)] + [b""]
        comp = native.deflate_many(blobs, level=6)
        for raw, c in zip(blobs, comp):
            assert zlib.decompress(c) == raw
        back = native.inflate_many(comp, [len(b) for b in blobs])
        assert back == blobs

    def test_interop_with_zlib_module(self):
        blob = b"archive resource data " * 100
        comp = zlib.compress(blob, 6)
        assert native.inflate_many([comp], [len(blob)])[0] == blob

    def test_archive_writer_uses_native(self, tmp_path):
        from mt_renderer_tpu import dti, fixtures
        from mt_renderer_tpu.formats.arc import ArchiveFile, ArchiveWriter

        w = ArchiveWriter()
        w.add_file("a\\b", dti.from_name("rModel"), 0, b"model-bytes" * 50)
        w.add_file("c\\d", dti.from_name("rTexture"), 2, b"texture-bytes" * 99)
        data = w.tobytes()
        import io

        arc = ArchiveFile(io.BytesIO(data))
        assert arc.get_resource("a/b", dti.from_name("rModel")) == b"model-bytes" * 50
        assert arc.get_resource("c/d", dti.from_name("rTexture")) == b"texture-bytes" * 99


class TestNativeBc1:
    def test_matches_python_decoder(self):
        from mt_renderer_tpu.fixtures import checkerboard_rgba, encode_bc1_simple
        from mt_renderer_tpu.render.bcn import decode_bc1_numpy

        img = checkerboard_rgba(64)
        data = encode_bc1_simple(img)
        want = decode_bc1_numpy(data, 64, 64)
        got = native.decode_bc1(data, 64, 64)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_three_color_mode(self):
        # c0 <= c1 selects 3-color + transparent mode
        import numpy as np

        block = np.zeros(4, "<u2")
        block[0] = 0x0000          # c0 = black
        block[1] = 0xFFFF          # c1 = white -> c0 <= c1
        block[2] = 0b11_10_01_00   # indices 0,1,2,3 across first row
        data = block.tobytes()
        from mt_renderer_tpu.render.bcn import decode_bc1_numpy

        want = decode_bc1_numpy(data, 4, 4)
        got = native.decode_bc1(data, 4, 4)
        np.testing.assert_array_equal(np.asarray(got), want)
        assert got[0, 3, 3] == 0   # transparent black texel


class TestNativeBc1Encode:
    def test_matches_python_encoder(self):
        """The threaded native encoder (the compressed-resident pool's
        content pipeline — ~90x the NumPy path on 2048^2 textures) must
        match render.bcn.encode_bc1_numpy bit-for-bit: odd sizes (edge
        padding), punch-through alpha, flat/degenerate blocks."""
        from mt_renderer_tpu.render.bcn import encode_bc1_numpy

        rng = np.random.default_rng(5)
        cases = []
        for h, w in ((37, 23), (64, 64), (4, 4), (1, 1), (5, 9)):
            img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
            img[..., 3] = np.where(rng.random((h, w)) < 0.3, 10, 255)
            cases.append(img)
        flat = np.full((8, 8, 4), [40, 41, 42, 255], np.uint8)
        cases.append(flat)
        allt = np.zeros((8, 8, 4), np.uint8)       # fully transparent
        cases.append(allt)
        for img in cases:
            np.testing.assert_array_equal(
                np.asarray(native.encode_bc1(img)),
                encode_bc1_numpy(img))


class TestNativeBc7:
    def test_matches_python_decoder_all_modes(self):
        """Random blocks hit every mode (lowest-set-bit selection) plus
        the reserved no-mode encoding; native must be byte-exact vs the
        vectorised NumPy reference."""
        import numpy as np

        from mt_renderer_tpu import native
        from mt_renderer_tpu.render import bcn

        rng = np.random.default_rng(7)
        for w, h in ((64, 64), (108, 52), (4, 4)):
            data = rng.integers(
                0, 256, ((w + 3) // 4) * ((h + 3) // 4) * 16, dtype=np.uint8
            ).tobytes()
            a = bcn.decode_bc7_numpy(data, w, h)
            b = native.decode_bc7(data, w, h)
            np.testing.assert_array_equal(a, b)

    def test_fixture_texture_roundtrip(self):
        """The BC7 fixture encoder's output decodes identically through
        the native and NumPy paths (the tex.decode_rgba8 route)."""
        import numpy as np

        from mt_renderer_tpu import fixtures, native
        from mt_renderer_tpu.formats.tex import TextureFile
        from mt_renderer_tpu.render import bcn

        tex = TextureFile(fixtures.build_texture_bc7(32))
        img = tex.decode_rgba8()
        want = bcn.decode_bc7_numpy(tex.data, tex.width, tex.height)
        np.testing.assert_array_equal(img, want)
        assert img.shape == (32, 32, 4)
