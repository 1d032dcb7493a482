"""DjVu container census (operators/rawdjvu.py): IFF85 walk, INFO
endianness quirk, DIRM directory, hostiles."""

from __future__ import annotations

import struct

import pytest

from rawdata_client_provider_gcs_spark.operators import rawdjvu as D


def test_single_page_census_and_endianness():
    blob = D.build_djvu([{"width": 2550, "height": 3300, "dpi": 400,
                          "text": True, "anno": True}])
    m = D.parse_djvu(blob)
    assert (m["kind"], m["n_pages"], m["n_components"]) == ("single", 1, 1)
    assert (m["width"], m["height"], m["dpi"]) == (2550, 3300, 400)
    assert m["version"] == "0.26" and m["gamma"] == 2.2
    assert m["has_text"] and m["has_anno"] and m["has_mask"]
    assert not m["has_bg"] and not m["has_fg"]
    assert m["chunks"] == ["INFO", "Sjbz", "TXTz", "ANTz"]
    # the dpi field really is little-endian inside a big-endian format:
    # 400 = 0x0190 stored 90 01
    i = blob.index(b"INFO") + 8
    assert blob[i + 6 : i + 8] == b"\x90\x01"
    assert blob[i : i + 2] == b"\x09\xf6"  # width 2550 big-endian


def test_bundled_and_indirect_documents():
    blob = D.build_djvu(
        [{"width": 100, "height": 200, "text": True},
         {"width": 300, "height": 400, "color": True}],
        bundled=True,
    )
    m = D.parse_djvu(blob)
    assert (m["kind"], m["n_components"], m["n_pages"]) == ("bundled", 2, 2)
    assert (m["width"], m["height"]) == (100, 200)  # first page
    # DIRM offsets point at the component FORMs from file start
    dirm = blob.index(b"DIRM") + 8
    (off0,) = struct.unpack(">I", blob[dirm + 3 : dirm + 7])
    assert blob[off0 : off0 + 4] == b"FORM"
    ind = D.parse_djvu(D.build_djvu(
        [{"width": 5, "height": 5}] * 3, bundled=False
    ))
    assert (ind["kind"], ind["n_components"], ind["n_pages"]) == \
        ("indirect", 3, 0)
    assert ind["width"] == 0


def test_classify_routes_djvu():
    from rawdata_client_provider_gcs_spark.sources.classify import (
        classify_payload,
    )

    got = classify_payload(D.build_djvu([{"width": 8, "height": 8}]))
    assert got == {"format": "djvu", "category": "document",
                   "wrapper": None}


def test_djvu_hostiles():
    good = D.build_djvu([{"width": 10, "height": 20}])
    with pytest.raises(ValueError, match="magic"):
        D.parse_djvu(b"FORM without the prefix")
    # FORM length past end
    bad = bytearray(good)
    struct.pack_into(">I", bad, 8, 1 << 30)
    with pytest.raises(ValueError, match="past end"):
        D.parse_djvu(bytes(bad))
    # chunk overruns its container
    bad = bytearray(good)
    i = good.index(b"Sjbz") + 4
    struct.pack_into(">I", bad, i, 1 << 20)
    with pytest.raises(ValueError, match="past container"):
        D.parse_djvu(bytes(bad))
    # page must start with INFO
    noinfo = good.replace(b"INFO", b"XXXX")
    with pytest.raises(ValueError, match="INFO"):
        D.parse_djvu(noinfo)
    # zero dimensions
    zero = bytearray(good)
    struct.pack_into(">H", zero, good.index(b"INFO") + 8, 0)
    with pytest.raises(ValueError, match="zero page"):
        D.parse_djvu(bytes(zero))
    # DJVM without DIRM
    bad = bytearray(D.build_djvu([{"width": 4, "height": 4}] * 2))
    j = bad.index(b"DIRM")
    bad[j : j + 4] = b"JUNK"
    with pytest.raises(ValueError, match="DIRM"):
        D.parse_djvu(bytes(bad))
    # unsupported top-level FORM type
    pm = bytearray(good)
    pm[12:16] = b"PM44"
    with pytest.raises(ValueError, match="FORM type"):
        D.parse_djvu(bytes(pm))


@pytest.mark.parametrize("seed", range(3))
def test_djvu_fuzz_never_uncatchable(seed):
    import random

    rng = random.Random(seed)
    bases = [
        D.build_djvu([{"width": 100, "height": 200, "text": True,
                       "color": True}]),
        D.build_djvu([{"width": 10, "height": 20}] * 3, bundled=True),
    ]
    for base in bases:
        for _ in range(150):
            buf = bytearray(base)
            mode = rng.randrange(3)
            if mode == 0:
                buf = buf[: rng.randrange(1, len(buf))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            else:
                i = rng.randrange(len(buf))
                del buf[i : min(len(buf), i + rng.randrange(1, 32))]
            try:
                D.parse_djvu(bytes(buf))
            except ValueError:
                pass


# ---------------------------------------------------------------------------
# BZZ-compressed metadata: DIRM names, NAVM bookmarks, ANT annotations (r15)
# ---------------------------------------------------------------------------


def test_dirm_component_directory_roundtrip():
    blob = D.build_djvu(
        [{"width": 64, "height": 64}] * 3,
        names=["front", None, "back"],
        titles=["Cover", "Body", None],
    )
    m = D.extract_djvu_metadata(blob)
    comps = m["components"]
    assert [c["id"] for c in comps] == ["p0000.djvu", "p0001.djvu",
                                        "p0002.djvu"]
    assert [c["name"] for c in comps] == ["front", None, "back"]
    assert [c["title"] for c in comps] == ["Cover", "Body", None]
    assert all(c["type"] == "page" and c["size"] > 0 for c in comps)
    # the size table must match the actual component byte lengths
    d = D.parse_dirm(blob, blob.index(b"DIRM") + 8,
                     int.from_bytes(blob[blob.index(b"DIRM") + 4:
                                         blob.index(b"DIRM") + 8], "big"))
    assert d["bundled"] and len(d["offsets"]) == 3
    assert blob[d["offsets"][0]: d["offsets"][0] + 4] == b"FORM"


def test_navm_bookmarks_roundtrip():
    marks = [(2, "Part I", "#p0001.djvu"), (0, "Chapter — æøå", "#2"),
             (0, "", "https://example.org/x")]
    blob = D.build_djvu([{"width": 8, "height": 8}] * 2,
                        bookmarks=marks)
    got = D.extract_djvu_metadata(blob)["bookmarks"]
    assert [(b["n_children"], b["description"], b["url"])
            for b in got] == marks


def test_ant_annotation_census():
    ant = (b'(maparea "https://a.example/1" "first" (rect 1 2 3 4))'
           b'(maparea "https://a.example/2" "" (poly 1 2 3 4 5 6))'
           b'(background #FF00FF) (zoom width) (mode bw)')
    got = D.parse_ant(ant)
    assert got["urls"] == ["https://a.example/1", "https://a.example/2"]
    assert got["comments"] == ["first"]
    assert got["shapes"] == {"rect": 1, "poly": 1}
    assert got["settings"] == {"background": "#FF00FF",
                               "zoom": "width", "mode": "bw"}
    # escaped quotes inside strings survive the tokenizer
    got = D.parse_ant(rb'(maparea "u" "say \"hi\"" (rect 0 0 1 1))')
    assert got["urls"] == ["u"]
    # hostile: unbalanced parens are loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unbalanced"):
        D.parse_ant(b"(maparea (rect 1 2 3 4)")
    with _pytest.raises(ValueError, match="nesting"):
        D.parse_ant(b"(" * 40 + b")" * 40)


def test_antz_through_bzz_and_single_page():
    blob = D.build_djvu([{
        "width": 100, "height": 200,
        "anno": '(maparea "https://s.example/p" "c" (rect 0 0 9 9))',
    }])
    m = D.extract_djvu_metadata(blob)
    assert m["urls"] == ["https://s.example/p"]
    assert m["components"] == [] and m["bookmarks"] == []
    assert D.parse_djvu(blob)["has_anno"]


def test_djvu_metadata_hostiles():
    import pytest as _pytest

    # truncated DIRM compressed tail
    blob = bytearray(D.build_djvu([{"width": 8, "height": 8}] * 2,
                                  names=["a", "b"]))
    i = blob.index(b"DIRM")
    (ln,) = __import__("struct").unpack(">I", blob[i + 4 : i + 8])
    with _pytest.raises(ValueError):
        D.parse_dirm(bytes(blob), i + 8, 3 + 8)  # cut before the tail
    # NAVM with a lying string length
    from rawdata_client_provider_gcs_spark.sources.bzz import bzz_encode

    bad = bytes([0, 1, 0]) + (1 << 20).to_bytes(3, "big")
    with _pytest.raises(ValueError, match="bookmark"):
        D.parse_navm(bad)
