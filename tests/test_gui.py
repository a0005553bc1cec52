"""GUI overlay (scene/gui.py): font raster, canvas ops, device
composite — the BASELINE config-5 "rGUI/debug_overlay composite" layer.
The reference's own rGUI parser is a ``todo!()`` stub
(/root/reference/src/rgui.rs:8-10); these tests pin OUR GUI pass."""

import numpy as np
import pytest

from mt_renderer_tpu.scene import gui


def _ref_over(frame_rgba: np.ndarray, ov_rgba: np.ndarray) -> np.ndarray:
    """NumPy reference of the composite: src-alpha over on RGB,
    dst alpha kept, clip(x+0.5) quantize — float32 like the device."""
    a = ov_rgba[..., 3].astype(np.float32) / np.float32(255.0)
    out = frame_rgba.copy()
    for c in range(3):
        v = (ov_rgba[..., c].astype(np.float32) * a
             + frame_rgba[..., c].astype(np.float32)
             * (np.float32(1.0) - a))
        out[..., c] = np.clip(v + 0.5, 0.0, 255.0).astype(np.uint8)
    return out


def _pack(rgba: np.ndarray) -> np.ndarray:
    v = rgba.astype(np.uint32)
    return v[..., 0] | (v[..., 1] << 8) | (v[..., 2] << 16) | (
        v[..., 3] << 24)


class TestFont:
    def test_every_printable_ascii_has_a_glyph(self):
        for code in range(32, 127):
            g = gui.glyph(chr(code))
            assert g.shape == (gui.GLYPH_H, gui.GLYPH_W)

    def test_known_glyph_bitmaps(self):
        # 'A': column bytes 7E 11 11 11 7E, bit 0 = top row
        a = gui.glyph("A")
        expect = np.array([
            [0, 1, 1, 1, 0],
            [1, 0, 0, 0, 1],
            [1, 0, 0, 0, 1],
            [1, 0, 0, 0, 1],
            [1, 1, 1, 1, 1],
            [1, 0, 0, 0, 1],
            [1, 0, 0, 0, 1],
        ], bool)
        np.testing.assert_array_equal(a, expect)
        # space is empty ink, '|' is a full center column
        assert not gui.glyph(" ").any()
        bar = gui.glyph("|")
        assert bar[:, 2].all() and bar.sum() == gui.GLYPH_H

    def test_unmapped_renders_question_mark(self):
        # glyph() is the raw ASCII-table accessor: '?' substitution
        np.testing.assert_array_equal(gui.glyph("あ"),
                                      gui.glyph("?"))

    def test_text_width(self):
        assert gui.text_width("") == 0
        assert gui.text_width("ab") == 2 * gui.ADVANCE - 1
        assert gui.text_width("ab", scale=2) == 2 * (2 * gui.ADVANCE - 1)
        # non-ASCII is double-width under the default box policy
        assert gui.text_width("あ") == gui.WIDE_ADVANCE - 1
        assert gui.text_width("aあ") == gui.ADVANCE + gui.WIDE_ADVANCE - 1
        # and 6 ASCII cells ('[XXXX]') under hex
        assert gui.text_width("あ", nonascii="hex") == 6 * gui.ADVANCE - 1

    def test_wide_glyph_deterministic_and_distinct(self):
        a1 = gui.wide_glyph(ord("あ"))
        a2 = gui.wide_glyph(ord("あ"))
        np.testing.assert_array_equal(a1, a2)
        assert a1.shape == (gui.GLYPH_H, gui.WIDE_W)
        # border box always fully inked
        assert a1[0].all() and a1[-1].all()
        assert a1[:, 0].all() and a1[:, -1].all()
        # distinct codepoints -> distinct interiors
        assert (gui.wide_glyph(ord("あ")) != gui.wide_glyph(ord("い"))).any()
        assert (gui.wide_glyph(ord("日")) != gui.wide_glyph(ord("本"))).any()


class TestCanvas:
    def test_fill_rect_clips_and_writes(self):
        c = gui.GuiCanvas(16, 8)
        c.fill_rect(-4, -4, 8, 8, (10, 20, 30, 40))
        assert (c.rgba[:4, :4] == [10, 20, 30, 40]).all()
        assert not c.rgba[4:].any() and not c.rgba[:, 4:].any()

    def test_draw_text_ink_and_advance(self):
        c = gui.GuiCanvas(32, 10)
        end = c.draw_text(1, 1, "Hi", rgba=(200, 100, 50, 255))
        assert end == 1 + 2 * gui.ADVANCE
        h = gui.glyph("H")
        sub = c.rgba[1:1 + gui.GLYPH_H, 1:1 + gui.GLYPH_W]
        np.testing.assert_array_equal(sub[..., 0] == 200, h)
        # nothing outside the text box
        assert not c.rgba[:, end:].any()

    def test_draw_text_scale_and_clip(self):
        c = gui.GuiCanvas(8, 8)
        c.draw_text(-3, -3, "W", scale=2)     # partially off-canvas: no raise
        c2 = gui.GuiCanvas(30, 20)
        c2.draw_text(0, 0, "W", scale=2)
        w = gui.glyph("W")
        np.testing.assert_array_equal(
            c2.rgba[: 2 * gui.GLYPH_H, : 2 * gui.GLYPH_W, 3] == 255,
            np.repeat(np.repeat(w, 2, 0), 2, 1))

    def test_packed_layout_matches_device_packing(self):
        c = gui.GuiCanvas(3, 2)
        c.rgba[0, 0] = (1, 2, 3, 4)
        p = c.packed()
        assert p.dtype == np.uint32
        assert p[0, 0] == 1 | (2 << 8) | (3 << 16) | (4 << 24)


class TestComposite:
    def setup_method(self):
        rng = np.random.default_rng(7)
        self.frame = rng.integers(0, 256, (32, 48, 4), np.uint8)
        self.ov = rng.integers(0, 256, (32, 48, 4), np.uint8)
        # force some fully transparent / fully opaque overlay pixels
        self.ov[::3, :, 3] = 0
        self.ov[1::3, :, 3] = 255

    def test_packed_matches_numpy_reference(self):
        o = gui.GuiOverlay(48, 32)
        o.canvas.rgba[:] = self.ov
        o.touch()
        out = np.asarray(o.apply(_pack(self.frame)))
        ref = _pack(_ref_over(self.frame, self.ov))
        got = out.view(np.uint8).reshape(32, 48, 4).astype(np.int32)
        want = ref.view(np.uint8).reshape(32, 48, 4).astype(np.int32)
        assert np.abs(got - want).max() <= 1           # fused-FMA ulp
        # exact where the overlay is fully transparent or fully opaque
        np.testing.assert_array_equal(got[::3], want[::3])
        np.testing.assert_array_equal(got[1::3], want[1::3])

    def test_transparent_overlay_is_identity_and_alpha_kept(self):
        o = gui.GuiOverlay(48, 32)            # all-zero canvas
        out = np.asarray(o.apply(_pack(self.frame)))
        np.testing.assert_array_equal(out, _pack(self.frame))

    def test_unpacked_u8_path_matches_packed(self):
        o = gui.GuiOverlay(48, 32)
        o.canvas.rgba[:] = self.ov
        o.touch()
        p = np.asarray(o.apply(_pack(self.frame)))
        u = np.asarray(o.apply(self.frame))
        np.testing.assert_array_equal(
            p.view(np.uint8).reshape(32, 48, 4), u)

    def test_band_offset_touches_only_its_rows(self):
        o = gui.GuiOverlay(48, 8, y0=10)
        o.canvas.fill_rect(0, 0, 48, 8, (255, 0, 0, 255))
        o.touch()
        out = np.asarray(o.apply(_pack(self.frame)))
        np.testing.assert_array_equal(out[:10], _pack(self.frame)[:10])
        np.testing.assert_array_equal(out[18:], _pack(self.frame)[18:])
        got = out[10:18].view(np.uint8).reshape(8, 48, 4)
        assert (got[..., 0] == 255).all() and (got[..., 1] == 0).all()
        # frame alpha preserved (a GUI pass must not punch presentation
        # holes)
        np.testing.assert_array_equal(got[..., 3],
                                      self.frame[10:18, :, 3])

    def test_reupload_only_when_touched(self):
        o = gui.GuiOverlay(48, 32)
        o.apply(_pack(self.frame))
        dev0 = o._dev
        o.apply(_pack(self.frame))
        assert o._dev is dev0
        o.canvas.fill_rect(0, 0, 4, 4, (9, 9, 9, 9))
        o.touch()
        o.apply(_pack(self.frame))
        assert o._dev is not dev0


class TestHudApp:
    def test_demo_world_hud_band(self):
        """DemoWorldApp with the HUD on: the top band must show the
        semi-transparent backdrop + text ink over the clear color."""
        from mt_renderer_tpu.app.manager import RendererAppManager
        from mt_renderer_tpu.cli.modelviewer import DemoWorldApp

        app = DemoWorldApp(buildings=4)
        app.show_hud = True
        mgr = RendererAppManager(app, width=96, height=96)
        frame = mgr.run_headless(frames=2)
        assert frame.shape == (96, 96, 4)
        # backdrop alpha 150 over the white clear: top-left pixel is
        # darkened; rows below the band are not
        assert frame[2, 2, 0] < 180
        from mt_renderer_tpu.app.hud import Hud  # band height w/o GMD
        band_h = app._hud.overlay.canvas.height
        assert isinstance(app._hud, Hud) and band_h < 96
        assert frame[band_h + 1, 2, 0] > 180

    def test_modelviewer_demo_hud_gmd_cli(self, tmp_path, capsys):
        from mt_renderer_tpu.cli import modelviewer
        from mt_renderer_tpu.formats.gmd import (GuiMessage,
                                                 GuiMessageFile)

        g = GuiMessageFile(language_id=0, package_name="hud")
        g.messages = [GuiMessage(label="greet", message="HELLO TPU")]
        gmd_path = tmp_path / "hud.gmd"
        with open(gmd_path, "wb") as f:
            g.save(f)
        out = tmp_path / "frame_{i}.png"
        modelviewer.main([
            "--demo", "4", "--width", "96", "--height", "96",
            "--frames", "1", "--hud-gmd", str(gmd_path),
            "--hud-label", "greet", "--out", str(out),
        ])
        assert (tmp_path / "frame_0.png").exists()
        assert "world:" in capsys.readouterr().out

    def test_hud_missing_label_exits(self, tmp_path):
        from mt_renderer_tpu.app.hud import Hud
        from mt_renderer_tpu.formats.gmd import (GuiMessage,
                                                 GuiMessageFile)

        g = GuiMessageFile(language_id=0, package_name="hud")
        g.messages = [GuiMessage(label="a", message="x")]
        p = tmp_path / "h.gmd"
        with open(p, "wb") as f:
            g.save(f)
        with pytest.raises(SystemExit):
            Hud(64, gmd_path=str(p), gmd_label="missing")


class TestGmdIntegration:
    def _gmd(self):
        from mt_renderer_tpu.formats.gmd import GuiMessage, GuiMessageFile

        g = GuiMessageFile(language_id=0, package_name="hud")
        g.messages = [
            GuiMessage(label="greeting", message="HELLO TPU"),
            GuiMessage(label="multi", message="line one\r\nline two"),
        ]
        return g

    def test_draw_by_label_and_index(self):
        g = self._gmd()
        c = gui.GuiCanvas(128, 32)
        gui.draw_gmd_message(c, g, "greeting", 0, 0)
        by_label = c.rgba.copy()
        c.clear()
        gui.draw_gmd_message(c, g, 0, 0, 0)
        np.testing.assert_array_equal(c.rgba, by_label)
        assert by_label.any()

    def test_multiline_advances_y(self):
        g = self._gmd()
        c = gui.GuiCanvas(128, 32)
        y_end = gui.draw_gmd_message(c, g, "multi", 0, 0)
        assert y_end == 2 * (gui.GLYPH_H + 1)
        # both lines put ink in their own row bands
        assert c.rgba[:gui.GLYPH_H].any()
        assert c.rgba[gui.GLYPH_H + 1 : 2 * gui.GLYPH_H + 1].any()

    def test_missing_label_raises(self):
        g = self._gmd()
        c = gui.GuiCanvas(64, 16)
        with pytest.raises(StopIteration):
            gui.draw_gmd_message(c, g, "nope", 0, 0)

    def test_japanese_message_renders_deterministically(self):
        """A non-ASCII GMD fixture (the engine's real message tables
        are Japanese — SHIFT-JIS is first-class in the reference,
        read_struct.rs:60-86) must render deterministically, survive a
        GMD save/load round-trip, and not collapse to identical ink
        for different texts (the old '?' wall)."""
        from mt_renderer_tpu.formats.gmd import GuiMessage, GuiMessageFile

        g = GuiMessageFile(language_id=1, package_name="jp")
        g.messages = [
            GuiMessage(label="konnichiwa", message="こんにちは TPU"),
            GuiMessage(label="sayonara", message="さようなら TPU"),
        ]
        g2 = GuiMessageFile.parse(g.tobytes())     # byte round-trip
        assert g2.messages[0].message == "こんにちは TPU"

        c1 = gui.GuiCanvas(256, 16)
        gui.draw_gmd_message(c1, g2, "konnichiwa", 0, 0)
        c2 = gui.GuiCanvas(256, 16)
        gui.draw_gmd_message(c2, g2, "konnichiwa", 0, 0)
        np.testing.assert_array_equal(c1.rgba, c2.rgba)  # deterministic
        assert c1.rgba.any()
        c3 = gui.GuiCanvas(256, 16)
        gui.draw_gmd_message(c3, g2, "sayonara", 0, 0)
        assert (c1.rgba != c3.rgba).any()          # texts distinguishable

    def test_hex_fallback_spells_the_codepoint(self):
        c = gui.GuiCanvas(64, 8)
        c.draw_text(0, 0, "あ", nonascii="hex")    # U+3042 -> "[3042]"
        want = gui.GuiCanvas(64, 8)
        want.draw_text(0, 0, "[3042]")
        np.testing.assert_array_equal(c.rgba, want.rgba)
