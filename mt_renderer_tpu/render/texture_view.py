"""Texture viewer device path — fullscreen aspect-fit quad + optional
YCbCr decode.

Mirrors the reference textureviewer's fragment behavior
(``/root/reference/src/shaders/textureviewer.wgsl:28-45`` and the scale
uniform, ``bin/textureviewer.rs:21-31,179-189``): the game stores some GUI
textures with channels swizzled as (Cr, A, Cb, Y); the shader samples with
a flipped v, swizzles, and converts YCbCr→RGB with a 123/255 bias.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

YCBCR_BIAS = 0.482353002  # = 123/255, the game shader's chroma bias


def ycbcr_to_rgba(s: jax.Array) -> jax.Array:
    """(..., 4) swizzled sample → RGBA, all float 0-1.

    Input channel meaning: x=Cr, y=A, z=Cb, w=Y."""
    cr = s[..., 0] - YCBCR_BIAS
    a = s[..., 1]
    cb = s[..., 2] - YCBCR_BIAS
    y = s[..., 3]
    r = cr * 1.40199995 + y
    g = cr * -0.714139998 + cb * -0.344139993 + y
    b = cb * 1.77199996 + y
    return jnp.stack([r, g, b, a], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "ycbcr")
)
def view_texture(tex: jax.Array, *, width: int = 512, height: int = 512,
                 ycbcr: bool = True) -> jax.Array:
    """Render (TH, TW, 4) uint8 aspect-fit into an (H, W, 4) uint8 frame.

    Bilinear sample (the reference's mag filter), white letterbox."""
    th, tw = tex.shape[:2]
    scale = min(width / tw, height / th)
    qw = tw * scale / width            # quad extent in [0, 1] of half-frame
    qh = th * scale / height

    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    u = (xs / qw + 1.0) * 0.5          # quad-local texcoord
    v = (ys / qh + 1.0) * 0.5
    onquad = (
        ((u >= 0.0) & (u <= 1.0))[None, :]
        & ((v >= 0.0) & (v <= 1.0))[:, None]
    )

    # the reference flips v at sample time (textureviewer.wgsl:31)
    vv = 1.0 - v
    t = tex.astype(jnp.float32) / 255.0
    x = jnp.clip(u * tw - 0.5, 0.0, tw - 1.0)
    y = jnp.clip(vv * th - 0.5, 0.0, th - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[None, :, None]
    fy = (y - y0)[:, None, None]
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    c00 = t[y0][:, x0]
    c10 = t[y0][:, x1]
    c01 = t[y1][:, x0]
    c11 = t[y1][:, x1]
    s = (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (
        c01 * (1 - fx) + c11 * fx
    ) * fy

    rgba = ycbcr_to_rgba(s) if ycbcr else s
    white = jnp.ones_like(rgba)
    out = jnp.where(onquad[..., None], rgba, white)
    return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
