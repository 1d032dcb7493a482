"""Extract RFC 7932's constant data tables from the system Brotli
library into a package data file.

Brotli's static dictionary (Appendix A, 122,784 bytes), the four
context-mode lookup tables (Section 7.1, 2,048 bytes) and the 121
word transforms (Appendix B) are normative PUBLIC DATA of the RFC;
re-typing them by hand would only add transcription risk.  This tool
reads them from ``libbrotlicommon`` (the reference implementation the
environment already ships inside conda/pyarrow) and writes one
zlib-compressed blob the pure-Python decoder loads at import:

    python tools/extract_brotli_tables.py

Output: rawdata_client_provider_gcs_spark/sources/brotli_data.bin
Layout (before compression): a json header line with lengths, then
dictionary bytes, context table bytes, transforms json.
"""

from __future__ import annotations

import ctypes
import json
import zlib
from pathlib import Path

LIB = "/root/miniconda/lib/libbrotlicommon.so"
OUT = (Path(__file__).resolve().parent.parent
       / "rawdata_client_provider_gcs_spark" / "sources"
       / "brotli_data.bin")


class _Dict(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


class _Transforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
    ]


def main() -> None:
    lib = ctypes.CDLL(LIB)
    lib.BrotliGetDictionary.restype = ctypes.POINTER(_Dict)
    d = lib.BrotliGetDictionary().contents
    dict_data = bytes(ctypes.cast(
        d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)
    ).contents)
    size_bits = list(d.size_bits_by_length)
    offsets = list(d.offsets_by_length)
    ctx = bytes((ctypes.c_uint8 * 2048).in_dll(
        lib, "_kBrotliContextLookupTable"
    ))

    lib.BrotliGetTransforms.restype = ctypes.POINTER(_Transforms)
    t = lib.BrotliGetTransforms().contents
    n = t.num_transforms
    triplets = bytes(ctypes.cast(
        t.transforms, ctypes.POINTER(ctypes.c_uint8 * (3 * n))
    ).contents)
    ps = bytes(ctypes.cast(
        t.prefix_suffix,
        ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size),
    ).contents)

    def _string(idx: int) -> str:
        # prefix_suffix is a sequence of length-prefixed strings;
        # prefix_suffix_map gives each id's byte offset, whose first
        # byte is the length
        off = t.prefix_suffix_map[idx]
        ln = ps[off]
        return ps[off + 1 : off + 1 + ln].decode("latin-1")

    transforms = []
    for i in range(n):
        pid, op, sid = triplets[3 * i : 3 * i + 3]
        transforms.append((_string(pid), op, _string(sid)))

    header = json.dumps({
        "dict_size": len(dict_data),
        "size_bits": size_bits,
        "offsets": offsets,
        "ctx_size": len(ctx),
        "n_transforms": n,
    }).encode()
    body = (header + b"\n" + dict_data + ctx
            + json.dumps(transforms).encode())
    OUT.write_bytes(zlib.compress(body, 9))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes compressed, "
          f"{len(body)} raw, {n} transforms)")
    print("transforms sample:", transforms[:4], "...", transforms[-2:])


if __name__ == "__main__":
    main()
