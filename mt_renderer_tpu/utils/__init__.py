from .crc import crc32, crc32_py, dti_hash
from .structio import (
    Reader,
    cstr,
    hexdump,
    read_cstring,
    read_struct,
    read_struct_array,
)

__all__ = [
    "crc32",
    "crc32_py",
    "dti_hash",
    "Reader",
    "cstr",
    "hexdump",
    "read_cstring",
    "read_struct",
    "read_struct_array",
]
