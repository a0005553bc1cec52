"""ctypes binding for the native host runtime (``native/mtr_native.cpp``).

Auto-builds the shared library on first use when a compiler is present;
every entry point has a pure-Python fallback, so the package works
without it (``available()`` reports which path is live).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from pathlib import Path

_LIB_PATH = Path(__file__).parent / "_mtr_native.so"
_SRC = Path(__file__).parent.parent / "native" / "mtr_native.cpp"
_lib = None
_tried = False


def _build() -> bool:
    if not _SRC.is_file():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             str(_SRC), "-o", str(_LIB_PATH), "-lz", "-pthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.is_file() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mtr_crc32.restype = ctypes.c_uint32
    lib.mtr_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_uint32]
    lib.mtr_compress_bound.restype = ctypes.c_size_t
    lib.mtr_compress_bound.argtypes = [ctypes.c_size_t]
    for name in ("mtr_inflate_many", "mtr_deflate_many"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
    lib.mtr_decode_bc1.restype = ctypes.c_int
    lib.mtr_decode_bc1.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, u8p]
    lib.mtr_encode_bc1.restype = ctypes.c_int
    lib.mtr_encode_bc1.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   u8p, ctypes.c_int]
    lib.mtr_decode_bc7.restype = ctypes.c_int
    lib.mtr_decode_bc7.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, u8p, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def crc32(data: bytes, init: int = 0xFFFFFFFF) -> int:
    """MT CRC32 variant (NUL-stop). Falls back to utils.crc."""
    lib = _load()
    if lib is None:
        from .utils.crc import crc32 as py_crc32

        return py_crc32(data, init)
    return int(lib.mtr_crc32(data, len(data), init & 0xFFFFFFFF))


def _batch(fn_name: str, blobs: list[bytes], caps: list[int],
           extra: tuple = ()) -> list[bytes] | None:
    lib = _load()
    if lib is None:
        return None
    n = len(blobs)
    if n == 0:
        return []
    srcs = (ctypes.c_char_p * n)(*blobs)
    src_lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    bufs = [ctypes.create_string_buffer(c) for c in caps]
    dsts = (ctypes.c_void_p * n)(
        *[ctypes.cast(b, ctypes.c_void_p) for b in bufs]
    )
    dst_caps = (ctypes.c_size_t * n)(*caps)
    out_lens = (ctypes.c_size_t * n)()
    rc = getattr(lib, fn_name)(
        n, srcs, src_lens, dsts, dst_caps, out_lens, *extra,
        0,  # nthreads: auto
    )
    if rc != 0:
        return None
    return [bufs[i].raw[: out_lens[i]] for i in range(n)]


def inflate_many(blobs: list[bytes], expected_sizes: list[int]) -> list[bytes]:
    """Parallel zlib inflate (the unpack path); exact-size outputs."""
    out = _batch("mtr_inflate_many", blobs, list(expected_sizes))
    if out is not None:
        return out
    return [zlib.decompress(b) for b in blobs]


def deflate_many(blobs: list[bytes], level: int = 6) -> list[bytes]:
    """Parallel zlib deflate — the rayon par_iter analog
    (reference rarchive.rs:228-238)."""
    lib = _load()
    if lib is not None:
        caps = [int(lib.mtr_compress_bound(len(b))) for b in blobs]
        out = _batch("mtr_deflate_many", blobs, caps, extra=(level,))
        if out is not None:
            return out
    return [zlib.compress(b, level) for b in blobs]


def decode_bc1(data: bytes, width: int, height: int):
    """BC1 → (H, W, 4) uint8; falls back to render.bcn."""
    import numpy as np

    nblocks = ((width + 3) // 4) * ((height + 3) // 4)
    if len(data) < nblocks * 8:
        raise ValueError(
            f"BC1 data truncated: {len(data)} bytes < {nblocks * 8} "
            f"needed for {width}x{height}"
        )
    lib = _load()
    if lib is None:
        from .render.bcn import decode_bc1_numpy

        return decode_bc1_numpy(data, width, height)
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.mtr_decode_bc1(
        bytes(data), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        from .render.bcn import decode_bc1_numpy

        return decode_bc1_numpy(data, width, height)
    return out


def encode_bc1(img):
    """(H, W, 4) uint8 RGBA → (bh·bw, 8) uint8 BC1 blocks — threaded
    native encoder, bit-exact vs ``render.bcn.encode_bc1_numpy`` (the
    fallback). The compressed-resident pool's content pipeline: the
    NumPy path costs ~150 s for the bigtex texture set, this ~2 s."""
    import numpy as np

    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 4:
        raise ValueError(f"expected (H, W, 4) u8, got {img.shape}")
    if lib is None:
        from .render.bcn import encode_bc1_numpy

        return encode_bc1_numpy(img)
    h, w = img.shape[:2]
    nblocks = ((h + 3) // 4) * ((w + 3) // 4)
    out = np.empty((nblocks, 8), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.mtr_encode_bc1(
        img.ctypes.data_as(u8p), w, h, out.ctypes.data_as(u8p), 0)
    if rc != 0:
        from .render.bcn import encode_bc1_numpy

        return encode_bc1_numpy(img)
    return out


def decode_bc7(data: bytes, width: int, height: int):
    """BC7 → (H, W, 4) uint8, all 8 modes, threaded over blocks
    (~40× the vectorised NumPy fallback in render.bcn)."""
    import numpy as np

    # bounds check BEFORE the native call: the C decoder derives the
    # block count from the dimensions and reads with no length check —
    # truncated data must raise a clean parse error, not read OOB
    nblocks = ((width + 3) // 4) * ((height + 3) // 4)
    if len(data) < nblocks * 16:
        raise ValueError(
            f"BC7 data truncated: {len(data)} bytes < {nblocks * 16} "
            f"needed for {width}x{height}"
        )
    lib = _load()
    if lib is None:
        from .render.bcn import decode_bc7_numpy

        return decode_bc7_numpy(data, width, height)
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.mtr_decode_bc7(
        bytes(data), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        0,  # nthreads: auto
    )
    if rc != 0:
        from .render.bcn import decode_bc7_numpy

        return decode_bc7_numpy(data, width, height)
    return out


# number of worker threads the pool would use (for logging/tests)
def hardware_threads() -> int:
    return os.cpu_count() or 1
