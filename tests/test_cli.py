"""End-to-end smoke tests for every CLI tool on the fixture tree
(parity with the reference's 10 binaries, SURVEY §2 #24-34)."""

import json

import pytest

from mt_renderer_tpu import fixtures


@pytest.fixture()
def root(tmp_path):
    fixtures.write_fixture_tree(tmp_path)
    (tmp_path / "fixture_scene.arc").write_bytes(fixtures.build_archive())
    return tmp_path


class TestDumpClis:
    def test_arctool_roundtrip(self, root, tmp_path, capsys):
        from mt_renderer_tpu.cli import arctool

        arctool.main(["unpack", str(root / "fixture_scene.arc"),
                      "-o", str(tmp_path / "unpacked")])
        assert "unpacked 8 resources" in capsys.readouterr().out
        arctool.main(["pack", str(tmp_path / "unpacked"),
                      "-o", str(tmp_path / "repacked.arc")])
        from mt_renderer_tpu.formats.arc import ArchiveFile

        a = ArchiveFile((tmp_path / "repacked.arc").read_bytes())
        assert len(a.resource_infos()) == 8

    def test_gmdtool_roundtrip(self, root, tmp_path, capsys):
        from mt_renderer_tpu.cli import gmdtool

        gmdtool.main(["dump", str(root / "gui/fixture_messages.gmd")])
        dumped = capsys.readouterr().out
        obj = json.loads(dumped)
        assert any("Hello" in m["message"] for m in obj["messages"])
        j = tmp_path / "m.json"
        j.write_text(dumped)
        gmdtool.main(["rebuild", str(j), "-o", str(tmp_path / "re.gmd")])
        from mt_renderer_tpu.formats.gmd import GuiMessageFile

        g = GuiMessageFile.parse((tmp_path / "re.gmd").read_bytes())
        assert g.messages[0].label == "LABEL_HELLO"

    def test_mtdeserializer(self, root, capsys):
        from mt_renderer_tpu.cli import mtdeserializer

        mtdeserializer.main([str(root / "chara/fixture_character.chr")])
        out = capsys.readouterr().out
        assert "rCharacter" in out and "mpModel" in out

    def test_materialinfo(self, root, capsys):
        from mt_renderer_tpu.cli import materialinfo

        materialinfo.main([str(root), "model/fixture_cube"])
        out = capsys.readouterr().out
        assert "tAlbedoMap" in out or "textures (1)" in out

    def test_schedulerdump(self, root, capsys):
        from mt_renderer_tpu.cli import schedulerdump

        schedulerdump.main([str(root / "motion/fixture_timeline.sdl")])
        out = capsys.readouterr().out
        assert "TYPE_FLOAT" in out and "mAlpha" in out

    def test_shaderdump(self, root, capsys):
        from mt_renderer_tpu.cli import shaderdump

        shaderdump.main([str(root / "custom_shaders/CustomShaderPackage.mfx")])
        out = capsys.readouterr().out
        assert "INPUTLAYOUT" in out and "tAlbedoMap" in out

    def test_shaderpackagedump(self, root, capsys):
        from mt_renderer_tpu.cli import shaderpackagedump

        shaderpackagedump.main([str(root), "custom_shaders/CustomShaderPackage"])
        out = capsys.readouterr().out
        assert "vs" in out.lower() or "shader" in out.lower()

    def test_unpackall(self, root, capsys):
        from mt_renderer_tpu.cli import unpackall

        unpackall.main([str(root)])
        out = capsys.readouterr().out
        assert "fixture_scene" in out
        # reference deletes the source archive (unpackall.rs:30-35); here
        # that is behind --delete, so the archive must still exist
        assert (root / "fixture_scene.arc").exists()

    def test_unpackall_delete_flag(self, root):
        from mt_renderer_tpu.cli import unpackall

        unpackall.main([str(root), "--delete"])
        assert not (root / "fixture_scene.arc").exists()

    def test_makefixtures(self, tmp_path, capsys):
        from mt_renderer_tpu.cli import makefixtures

        makefixtures.main([str(tmp_path / "fx")])
        assert (tmp_path / "fx" / "fixture_scene.arc").exists()
