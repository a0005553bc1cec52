"""Script tag tokenizer/resolver + scriptparse CLI tests."""

import pytest

from mt_renderer_tpu.formats import xfs
from mt_renderer_tpu.formats.gmd import GuiMessage, GuiMessageFile
from mt_renderer_tpu.formats.script import (
    ScriptContext, opcode_name, opcodes, parse_tag, tokenize,
)


def _name_gmd():
    return GuiMessageFile(
        language_id=0, package_name="names", update_time=0,
        messages=[
            GuiMessage("NAME_0", "Ryunosuke"),
            GuiMessage("NAME_1", "Susato"),
        ],
    )


def _movie_table():
    # generic app-table classes from the registry stand in for the real
    # APP_TABLE_ID_MOVIE layout: a "list" of entries with a "path" string
    entry_spec = xfs.ClassSpec("nGO::sAppTable::cIdScenario", [
        xfs.PropSpec("path", xfs.PropType.string, attr=0),
    ])
    table_spec = xfs.ClassSpec("nGO::sAppTable", [
        xfs.PropSpec("list", xfs.PropType.class_, attr=0),
    ])
    root = ("nGO::sAppTable", {
        "list": [
            ("nGO::sAppTable::cIdScenario", {"path": ["movie\\op.wmv"]}),
            ("nGO::sAppTable::cIdScenario", {"path": ["movie\\ed.wmv"]}),
        ],
    })
    data = xfs.serialize(root, [table_spec, entry_spec])
    return xfs.deserialize(data)


class TestTokenizer:
    def test_text_and_tags(self):
        toks = tokenize("Hello <E3 10>world<E1>")
        kinds = [(t.is_tag, t.text) for t in toks]
        assert kinds == [
            (False, "Hello "), (True, "<E3 10>"),
            (False, "world"), (True, "<E1>"),
        ]

    def test_unterminated_tag_kept(self):
        toks = tokenize("x<E4 1")
        assert toks[-1].is_tag and toks[-1].text == "<E4 1"

    def test_plain_text(self):
        toks = tokenize("no tags here")
        assert len(toks) == 1 and not toks[0].is_tag


class TestOpcodes:
    def test_table_loaded(self):
        ops = opcodes()
        assert ops["EndScript"] == 1
        assert ops["Wait"] == 3
        assert len(ops) > 500

    def test_reverse_lookup(self):
        assert opcode_name(1) == "EndScript"
        assert opcode_name(999999) is None


class TestResolution:
    def test_msg_window_on(self):
        ctx = ScriptContext(name_gmd=_name_gmd())
        tag = parse_tag(tokenize("<E261 1>")[0], ctx)  # id may vary; use name
        # resolve via explicit call for determinism
        assert ctx.resolve("MsgWindowOn", ["1"]) == "Susato"
        assert ctx.resolve("Msg", ["7", "0"]) == "Ryunosuke"

    def test_movie_play(self):
        ctx = ScriptContext(movie_table=_movie_table())
        assert ctx.resolve("MoviePlay", ["0"]) == "movie path: movie\\op.wmv"
        assert ctx.resolve("MoviePlay", ["1"]) == "movie path: movie\\ed.wmv"

    def test_out_of_range(self):
        ctx = ScriptContext(name_gmd=_name_gmd())
        assert ctx.resolve("MsgWindowOn", ["99"]) == "<unresolvable>"

    def test_unnumbered_tag(self):
        tag = parse_tag(tokenize("<ICON 3>")[0])
        assert tag.opcode is None and tag.name == "ICON" and tag.args == ["3"]


class TestCli:
    def test_scriptparse_cli(self, tmp_path, capsys):
        from mt_renderer_tpu.cli import scriptparse

        gmd = GuiMessageFile(
            language_id=0, package_name="pkg", update_time=0,
            messages=[GuiMessage("L1", "Hi <E263 5 1>friend<E1>")],
        )
        gmd_path = tmp_path / "m.gmd"
        gmd_path.write_bytes(gmd.tobytes())
        names_path = tmp_path / "names.gmd"
        names_path.write_bytes(_name_gmd().tobytes())

        scriptparse.main([str(gmd_path), "--name-gmd", str(names_path)])
        out = capsys.readouterr().out
        assert "message label: L1" in out
        assert "MESSAGE 'Hi '" in out
        assert "EndScript [1]" in out
