"""Generate the DTI registry data file from an engine class-metadata dump.

The MT Framework engine exposes runtime type information (DTI) for every engine
class; tools dump it as JSON-lines with one class per line carrying ``name``,
CRC ``hash``, ``size``, ``file_extension``, the class's own ``address`` and its
``parent_address``, plus serialized property definitions.

This script transforms such a dump into the compact registry format shipped at
``mt_renderer_tpu/dti/dti_registry.json``:

* duplicate hashes are dropped (first occurrence wins — dumps from multi-game
  executables repeat classes),
* ``parent_address`` pointers are resolved to parent *names* so the runtime
  registry can walk parent chains (``DTI.is_type_of``) without addresses,
* only the fields the framework needs are kept.

Usage:  python tools/gen_dti_registry.py <dump.jsonl> <out.json>
"""

import json
import sys


def transform(lines):
    by_address = {}
    entries = []
    seen_hashes = set()
    for line in lines:
        line = line.strip()
        if not line:
            continue
        e = json.loads(line)
        by_address[e["address"]] = e["name"]
        if e["hash"] in seen_hashes:
            continue
        seen_hashes.add(e["hash"])
        entries.append(e)

    out = []
    for e in entries:
        parent = by_address.get(e.get("parent_address"))
        if parent == e["name"]:
            parent = None  # roots often point at themselves
        rec = {
            "name": e["name"],
            "hash": e["hash"],
            "size": e.get("size"),
            "ext": e.get("file_extension"),
            "parent": parent,
        }
        props = e.get("props")
        if props:
            rec["props"] = [
                {"name": p["name"], "type": p.get("prop_type"), "attr": p.get("attr")}
                for p in props
            ]
        out.append(rec)
    return out


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src, "r", encoding="utf-8") as f:
        out = transform(f)
    with open(dst, "w", encoding="utf-8") as f:
        json.dump(out, f, separators=(",", ":"), ensure_ascii=False)
        f.write("\n")
    print(f"wrote {len(out)} DTI entries to {dst}")


if __name__ == "__main__":
    main()
