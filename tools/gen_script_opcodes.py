"""Extract the script opcode table (name ↔ id) into JSON.

The engine's GMD messages embed ``<E###>`` script tags; the opcode
numbering and reverse-engineered names are factual game data recorded in
the reference's ``src/bin/scriptparse.rs`` enum (the same way
``src/dti.txt`` records class metadata). This tool regenerates
``mt_renderer_tpu/formats/script_opcodes.json`` from that enum.

Usage: python tools/gen_script_opcodes.py [reference_scriptparse_rs] [out_json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

DEFAULT_SRC = "/root/reference/src/bin/scriptparse.rs"
DEFAULT_OUT = (
    Path(__file__).parent.parent
    / "mt_renderer_tpu/formats/script_opcodes.json"
)

ENTRY_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(0x[0-9A-Fa-f]+|\d+)\s*,")


def extract(src_path: str) -> dict[str, int]:
    ops: dict[str, int] = {}
    in_enum = False
    for line in Path(src_path).read_text().splitlines():
        if "enum TagCommand" in line:
            in_enum = True
            continue
        if in_enum:
            if line.strip() == "}":
                break
            m = ENTRY_RE.match(line)
            if m:
                ops[m.group(1)] = int(m.group(2), 0)
    return ops


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    src = argv[0] if argv else DEFAULT_SRC
    out = Path(argv[1]) if len(argv) > 1 else DEFAULT_OUT
    ops = extract(src)
    if not ops:
        raise SystemExit(f"no opcodes found in {src}")
    out.write_text(json.dumps(ops, indent=0) + "\n")
    print(f"wrote {len(ops)} opcodes to {out}")


if __name__ == "__main__":
    main()
