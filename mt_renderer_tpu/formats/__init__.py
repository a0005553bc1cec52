"""Host-side binary format parsers/writers for MT Framework resources."""

from . import arc, gmd, gui, mfx, mod, mrl, sdl, spkg, tex, xfs

__all__ = ["arc", "gmd", "gui", "mfx", "mod", "mrl", "sdl", "spkg", "tex", "xfs"]
