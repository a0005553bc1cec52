"""Core host-layer tests: CRC variant, struct IO, DTI registry.

Mirrors the reference's registry/hash invariants (crc.rs:52-64,
dti.rs:148-193) and extends them with parent-chain coverage the reference
left unimplemented.
"""

import numpy as np
import pytest

from mt_renderer_tpu import dti
from mt_renderer_tpu.utils import Reader, crc32, crc32_py, dti_hash, hexdump


class TestCRC:
    def test_known_vector(self):
        assert crc32(b"MtObject") == 0x2EA10CEB

    def test_nul_stop(self):
        # trailing NUL and anything after it are ignored
        assert crc32(b"MtObject\x00") == 0x2EA10CEB
        assert crc32(b"MtObject\x00junk") == 0x2EA10CEB

    def test_str_input(self):
        assert crc32("MtObject") == 0x2EA10CEB

    def test_custom_init(self):
        # GMD index items chain the hash: h, crc(h), crc(crc(h))
        h = crc32(b"LABEL")
        assert crc32(b"LABEL", h) != h
        assert crc32_py(b"LABEL", h) == crc32(b"LABEL", h)

    def test_py_fast_paths_agree(self):
        for s in [b"", b"a", b"rArchive", b"nDraw::MaterialToon", bytes(range(1, 200))]:
            for init in [0xFFFFFFFF, 0, 0x12345678]:
                assert crc32_py(s, init) == crc32(s, init)


class TestStructIO:
    def test_read_struct_array(self):
        dt = np.dtype([("a", "<u4"), ("b", "<u2")])
        assert dt.itemsize == 6  # packed
        buf = np.array([(1, 2), (3, 4)], dtype=dt).tobytes()
        r = Reader(buf)
        arr = r.struct_array(dt, 2)
        assert arr["a"].tolist() == [1, 3]
        assert arr["b"].tolist() == [2, 4]

    def test_not_enough_bytes(self):
        r = Reader(b"\x00\x01")
        with pytest.raises(ValueError):
            r.struct_array(np.dtype("<u4"), 1)

    def test_cstring_shift_jis(self):
        # "テスト" in SHIFT-JIS
        sjis = "テスト".encode("shift_jis") + b"\x00tail"
        r = Reader(sjis)
        assert r.cstring() == "テスト"
        assert r.read(4) == b"tail"

    def test_hexdump(self):
        out = hexdump(b"AB\x00\x01")
        assert "41 42 00 01" in out
        assert "AB.." in out


class TestDTI:
    def test_from_hash(self):
        d = dti.from_hash(0x5D5AF4F2)
        assert d is not None
        assert d.name == "bitset_prop<32>"

    def test_file_ext(self):
        assert dti.from_name("rArchive").file_ext == "arc"
        assert dti.from_name("bitset_prop<32>").file_ext is None
        assert dti.from_name("rTexture").file_ext == "tex"
        assert dti.from_name("rModel").file_ext == "mod"
        assert dti.from_name("rMaterial").file_ext == "mrl"

    def test_eq(self):
        assert dti.from_name("rArchive") == dti.from_name("rArchive")
        assert dti.from_name("rArchive") != dti.from_name("MtObject")

    def test_hash_sweep(self):
        # every registry entry's stored hash equals crc32(name) & 0x7fffffff
        reg = dti.registry()
        assert len(reg) > 2000
        for d in reg:
            assert d.hash == dti_hash(d.name), d.name

    def test_parent_chain(self):
        # the reference's is_type_of is todo!(); ours walks parents
        arc = dti.from_name("rArchive")
        res = dti.from_name("cResource")
        obj = dti.from_name("MtObject")
        assert arc.is_type_of(arc)
        assert arc.is_type_of(res)
        assert arc.is_type_of(obj)
        assert not res.is_type_of(arc)

    def test_prop_type_overflow(self):
        assert dti.PropType.from_raw(0x4A) is dti.PropType.event64
        assert dti.PropType.from_raw(0x4B) is dti.PropType.custom
        assert dti.PropType.from_raw(0x80) is dti.PropType.custom
        assert dti.PropType.from_raw(200) is dti.PropType.custom


class TestObservability:
    """MTR_LOG narration + hexdump error context (the reference's
    log/env_logger ergonomics, SURVEY §5: RUST_LOG=debug narrates every
    record, e.g. rarchive.rs:99-107)."""

    def test_debug_narration(self, caplog):
        import logging

        from mt_renderer_tpu import fixtures
        from mt_renderer_tpu.formats.arc import ArchiveFile
        from mt_renderer_tpu.formats.mod import ModelFile

        with caplog.at_level(logging.DEBUG, logger="mt_renderer_tpu"):
            ArchiveFile(fixtures.build_archive())
            ModelFile(fixtures.build_model())
        text = caplog.text
        assert "archive: version 7" in text
        assert "<rModel>" in text          # per-resource TOC narration
        assert "prim[0]:" in text          # per-primitive narration

    def test_parse_error_hexdump_context(self):
        import pytest

        from mt_renderer_tpu import fixtures
        from mt_renderer_tpu.formats.arc import ArchiveFile

        bad = b"NOPE" + fixtures.build_archive()[4:]
        with pytest.raises(ValueError) as ei:
            ArchiveFile(bad)
        msg = str(ei.value)
        assert "bad archive magic" in msg
        assert "context at +0x0" in msg
        assert "4e 4f 50 45" in msg        # 'NOPE' hexdumped

    def test_mtr_log_env_cli(self, tmp_path):
        """MTR_LOG=debug arctool unpack narrates like RUST_LOG=debug."""
        import subprocess
        import sys

        from mt_renderer_tpu import fixtures

        arc_path = tmp_path / "f.arc"
        arc_path.write_bytes(fixtures.build_archive())
        import os

        env = dict(os.environ, MTR_LOG="debug", JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "mt_renderer_tpu.cli.arctool", "unpack",
             str(arc_path), "-o", str(tmp_path / "out")],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr
        assert "archive: version 7" in r.stderr
