"""textureviewer — view a .tex file (headless: renders to PNG).

Reference contract (``/root/reference/src/bin/textureviewer.rs``): argv is
a direct ``.tex`` path; the texture draws aspect-fit on a fullscreen quad
with the game's YCbCr swizzle decode (textureviewer.wgsl). Headless here:
``--out`` PNG instead of a window; ``--raw`` skips the YCbCr decode.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..formats.tex import TextureFile
from ..render.texture_view import view_texture
from ..utils.png import write_png


def main(argv=None):
    p = argparse.ArgumentParser(prog="textureviewer", description=__doc__)
    p.add_argument("tex_path", help="path to a .tex file")
    p.add_argument("--out", default="texture.png", help="output PNG path")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--raw", action="store_true",
                   help="show raw RGBA (skip the YCbCr swizzle decode)")
    args = p.parse_args(argv)

    with open(args.tex_path, "rb") as f:
        tex = TextureFile(f.read())
    rgba = tex.decode_rgba8()
    print(f"{args.tex_path}: {tex.width}x{tex.height} format={tex.format} "
          f"levels={tex.level_count}")

    frame = view_texture(
        rgba, width=args.width, height=args.height, ycbcr=not args.raw
    )
    write_png(args.out, np.asarray(frame))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
