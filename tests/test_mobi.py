"""MOBI/PalmDoc ebooks (sources/mobi.py): PDB walk, PalmDoc LZ77 both
directions, MOBI header fields, trailing-entry stripping, hostiles."""

from __future__ import annotations

import struct

import pytest

from rawdata_client_provider_gcs_spark.sources import mobi as M

TEXT = ("It is a truth universally acknowledged, that a single man in "
        "possession of a good fortune, must be in want of a wife. " * 3)


def test_palmdoc_hand_vectors():
    """The public op table, decoded from hand-built bytes."""
    assert M.palmdoc_decompress(b"\x41\x42") == b"AB"
    assert M.palmdoc_decompress(b"\x02\x00\xff") == b"\x00\xff"
    assert M.palmdoc_decompress(b"\xc1") == b" A"
    assert M.palmdoc_decompress(b"\xff") == b" \x7f"
    # LZ77 pair after 'A': dist 1, len 3 → 0x8008
    assert M.palmdoc_decompress(b"\x41\x80\x08") == b"AAAA"
    # max length 10: (pair & 7) + 3
    assert M.palmdoc_decompress(b"\x41\x80\x0f") == b"A" * 11
    with pytest.raises(ValueError, match="distance"):
        M.palmdoc_decompress(b"\x41\x80\x10")  # dist 2 > output
    with pytest.raises(ValueError, match="truncated"):
        M.palmdoc_decompress(b"\x80")
    with pytest.raises(ValueError, match="escape"):
        M.palmdoc_decompress(b"\x05ab")
    with pytest.raises(ValueError, match="cap"):
        M.palmdoc_decompress(b"\x41" + b"\x80\x0f" * 200, cap=100)


def test_palmdoc_roundtrip_all_op_classes():
    cases = [
        b"",
        b"a",
        b"hello world hello world hello world",
        b"\x00\x01\x02\xff\xfe binary \x80\x81\x00\x00",
        b" space Pairs a b c d e f g",
        bytes(range(256)) * 3,
        b"x" * 5000,
        TEXT.encode(),
    ]
    for data in cases:
        comp = M.palmdoc_compress(data)
        assert M.palmdoc_decompress(comp) == data
    # the encoder really compresses repetitive text (max match length
    # is 10, so 2000 repetitive bytes cost ~400 pair bytes)
    assert len(M.palmdoc_compress(b"abc " * 500)) < 450


@pytest.mark.parametrize("kwargs", [
    {},
    {"compression": 1},
    {"palmdoc": True},
    {"palmdoc": True, "compression": 1},
    {"encoding": "cp1252"},
    {"record_size": 16},
    {"trailing": b"XY"},
    {"record_size": 16, "trailing": b"Z"},
], ids=["mobi-lz", "mobi-stored", "palmdoc-lz", "palmdoc-stored",
        "cp1252", "multi-record", "trailing", "multi+trailing"])
def test_container_roundtrip(kwargs):
    blob = M.build_mobi(TEXT, title="Pride and Prejudice", **kwargs)
    assert M.sniff_mobi(blob)
    m = M.parse_mobi(blob)
    assert m["text"] == TEXT
    want_fmt = "palmdoc" if kwargs.get("palmdoc") else "mobi"
    assert m["format"] == want_fmt
    if want_fmt == "mobi":
        assert m["title"] == "Pride and Prejudice"
        assert m["encoding"] == ("cp1252" if kwargs.get("encoding")
                                 == "cp1252" else "utf-8")
    if kwargs.get("record_size") == 16:
        assert m["n_text_records"] > 1


def test_mobi_utf8_text_and_office_adapter():
    text = "Prøve — «détente» ünd 中文"
    m = M.parse_mobi(M.build_mobi(text))
    assert m["text"] == text
    fmt, parts = M.mobi_parts(M.build_mobi("a < b & c"))
    assert fmt == "mobi"
    assert parts == [("book", "<p>a &lt; b &amp; c</p>")]
    # office tier routes PDB payloads
    from rawdata_client_provider_gcs_spark.sources import office as O

    fmt, parts = O.office_parts_of(M.build_mobi("routed text"))
    assert fmt == "mobi" and "routed text" in parts[0][1]


def test_classify_routes_mobi():
    from rawdata_client_provider_gcs_spark.sources.classify import (
        classify_payload,
    )

    got = classify_payload(M.build_mobi("classified"))
    assert got["format"] == "mobi" and got["category"] == "document"
    got = classify_payload(M.build_mobi("classified", palmdoc=True))
    assert got["format"] == "mobi"
    # a tar header with BOOKMOBI inside the name field must NOT route
    # here (nextRecordListID / record-count sanity)
    from rawdata_client_provider_gcs_spark.sources.archive import build_tar

    name = "x" * 60 + "BOOKMOBI" + "y" * 10
    tar = build_tar([(name, b"payload")])
    assert classify_payload(tar)["format"] == "tar"


def test_mobi_hostiles():
    blob = M.build_mobi(TEXT)
    with pytest.raises(ValueError, match="signature"):
        M.parse_mobi(b"not a pdb" * 20)
    # truncated record list
    with pytest.raises(ValueError):
        M.parse_mobi(blob[:80])
    # HuffCDIC now decodes (r15): a compression field flipped to 17480
    # without actual HUFF/CDIC records is a bounds error
    bad = bytearray(blob)
    r0_off = struct.unpack(">I", blob[78:82])[0]
    struct.pack_into(">H", bad, r0_off, 17480)
    with pytest.raises(ValueError, match="HUFF record range"):
        M.parse_mobi(bytes(bad))
    # unknown compression
    struct.pack_into(">H", bad, r0_off, 7)
    with pytest.raises(ValueError, match="unknown compression"):
        M.parse_mobi(bytes(bad))
    # lying text length
    bad = bytearray(blob)
    struct.pack_into(">I", bad, r0_off + 4, 1 << 20)
    with pytest.raises(ValueError, match="declares"):
        M.parse_mobi(bytes(bad))
    # record count exceeding PDB records
    bad = bytearray(blob)
    struct.pack_into(">H", bad, r0_off + 8, 999)
    with pytest.raises(ValueError, match="exceeds"):
        M.parse_mobi(bytes(bad))
    # unsupported text encoding
    bad = bytearray(blob)
    struct.pack_into(">I", bad, r0_off + 28, 1234)
    with pytest.raises(ValueError, match="encoding"):
        M.parse_mobi(bytes(bad))
    # non-monotonic record offsets
    bad = bytearray(blob)
    struct.pack_into(">I", bad, 78 + 8, 5)
    with pytest.raises(ValueError, match="monotonic|past end"):
        M.parse_mobi(bytes(bad))


def test_spark_office_text_includes_mobi(spark):
    from rawdata_client_provider_gcs_spark.sources import office as O

    rows = [
        (0, bytearray(M.build_mobi("ebook body text here"))),
        (1, bytearray(M.build_mobi("palm body", palmdoc=True))),
        (2, bytearray(b"junk that is not a container")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = O.office_text(df).toPandas().sort_values("doc_id")
    by = {d: g for d, g in out.groupby("doc_id")}
    assert list(by[0]["text"]) == ["ebook body text here"]
    assert list(by[0]["doc_format"]) == ["mobi"]
    assert list(by[1]["doc_format"]) == ["palmdoc"]
    assert by[2]["error"].notna().all()


def test_exth_metadata_roundtrip_and_hostiles():
    blob = M.build_mobi("body", title="T", author="Jane Austen",
                        language="en")
    m = M.parse_mobi(blob)
    assert m["author"] == "Jane Austen" and m["language"] == "en"
    # no EXTH → empty fields
    m2 = M.parse_mobi(M.build_mobi("body"))
    assert m2["author"] == "" and m2["language"] == ""
    # flag set but EXTH missing/corrupt is loud
    bad = bytearray(blob)
    i = blob.index(b"EXTH")
    bad[i] ^= 0xFF
    with pytest.raises(ValueError, match="EXTH"):
        M.parse_mobi(bytes(bad))
    # lying record length
    bad = bytearray(blob)
    struct.pack_into(">I", bad, i + 16, 1 << 30)
    with pytest.raises(ValueError, match="EXTH record"):
        M.parse_mobi(bytes(bad))
    # office metadata tier reads it
    from rawdata_client_provider_gcs_spark.sources import office as O

    info = O.office_info_of(blob)
    assert info == {"doc_format": "mobi", "title": "T",
                    "creator": "Jane Austen", "language": "en",
                    "n_parts": 1}


def test_trailing_entry_arithmetic_direct():
    """The backward-coded trailing-entry sizes, including the bit-0
    multibyte-overlap entry the fixture writer never emits."""
    # one flag-bit-1 entry: payload 'XY' + size byte 0x83 (3, incl.
    # itself, high bit terminates the backward scan)
    rec = b"textdata" + b"XY\x83"
    assert M._trailing_size(rec, 0b10) == 3
    # bit 0: multibyte overlap — last byte's low 2 bits + 1
    rec = b"textdata" + b"\x02"
    assert M._trailing_size(rec, 0b01) == 3
    # both: strip the bit-1 entry first, then the overlap byte before it
    rec = b"textdata" + b"\x01" + b"QQ\x83"
    assert M._trailing_size(rec, 0b11) == 3 + 2
    # two flag bits (1 and 2): two backward entries
    rec = b"textdata" + b"AB\x83" + b"c\x82"
    assert M._trailing_size(rec, 0b110) == 5
    # entries exceeding the record are loud
    with pytest.raises(ValueError, match="exceed"):
        M._trailing_size(b"\xff", 0b10)


@pytest.mark.parametrize("seed", range(4))
def test_mobi_fuzz_never_uncatchable(seed):
    """Truncation / bit flips / splices land on ValueError, never an
    uncatchable error (the media-codec fuzz bar)."""
    import random

    rng = random.Random(seed)
    bases = [
        M.build_mobi(TEXT, trailing=b"XY"),
        M.build_mobi(TEXT, palmdoc=True),
        M.build_mobi(TEXT, record_size=16, author="A", language="en"),
    ]
    for base in bases:
        for _ in range(120):
            buf = bytearray(base)
            mode = rng.randrange(3)
            if mode == 0:
                buf = buf[: rng.randrange(1, len(buf))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            else:
                i = rng.randrange(len(buf))
                del buf[i : min(len(buf), i + rng.randrange(1, 64))]
            try:
                M.parse_mobi(bytes(buf))
            except ValueError:
                pass


# ---------------------------------------------------------------------------
# HuffCDIC (compression 17480, r15)
# ---------------------------------------------------------------------------


def test_huffcdic_roundtrip_all_paths():
    """Terminal-cache codes (len 8), base-table walk (len 9),
    multi-CDIC splits, and recursive flag-0 phrases all reproduce the
    text byte-exactly through parse_mobi."""
    t = "the kindle era corpus is disproportionately huffcdic. " * 60
    for kw in (dict(), dict(huff_code_len=9), dict(huff_cdic_bits=4),
               dict(huff_recursive=True),
               dict(huff_code_len=9, huff_recursive=True,
                    huff_cdic_bits=3)):
        blob = M.build_mobi(t, title="DH", author="a", language="nb",
                            compression=17480, record_size=512, **kw)
        m = M.parse_mobi(blob)
        assert m["text"] == t and m["compression"] == 17480
        assert m["author"] == "a" and m["language"] == "nb"
    # combined with trailing-entry stripping
    blob = M.build_mobi(t, compression=17480, trailing=b"\x01\x02")
    assert M.parse_mobi(blob)["text"] == t


def test_huffcdic_direct_decoder_and_memoization():
    from rawdata_client_provider_gcs_spark.sources.huffcdic import (
        HuffCdic, HuffCdicEncoder)

    chunks = [b"abcabcab", b"cabc"]
    enc = HuffCdicEncoder(chunks, recursive=True)
    dec = HuffCdic(enc.records())
    assert [dec.unpack(enc.encode(c), 1 << 16) for c in chunks] == chunks
    # memoization flattened the coded phrases in place
    assert all(flat for _, flat in dec.dictionary
               if _ is not None)


def test_huffcdic_hostiles_are_valueerror():
    import struct as _s

    t = "hostile dictionary recursion bombs land per-row " * 20
    good = M.build_mobi(t, compression=17480, record_size=256)

    def corrupt(magic, repl):
        b = bytearray(good)
        i = b.find(magic)
        b[i : i + len(repl)] = repl
        return bytes(b)

    with pytest.raises(ValueError, match="HUFF"):
        M.parse_mobi(corrupt(b"HUFF", b"XUFF"))
    with pytest.raises(ValueError, match="CDIC"):
        M.parse_mobi(corrupt(b"CDIC", b"XDIC"))
    # recursion bomb: phrase 0 encodes itself (flag 0 body = own code)
    from rawdata_client_provider_gcs_spark.sources.huffcdic import (
        HuffCdic, HuffCdicEncoder)

    enc = HuffCdicEncoder([b"aa"], recursive=True)
    recs = enc.records()
    cdic = bytearray(recs[1])
    # entry 0 ("aa" pair): point its coded body at symbol 0 itself
    (off0,) = _s.unpack(">H", cdic[16:18])
    p = 16 + off0
    (blen,) = _s.unpack(">H", cdic[p : p + 2])
    assert not blen & 0x8000  # coded phrase
    cdic[p + 2] = 0xFF  # code of symbol 0 under descending assignment
    dec = HuffCdic([recs[0], bytes(cdic)])
    with pytest.raises(ValueError, match="self-referential|too deep"):
        dec.unpack(enc.encode(b"aa"), 1 << 16)
    # out-of-range HUFF record window
    b = bytearray(good)
    r0_off = _s.unpack(">I", b[78:82])[0]
    _s.pack_into(">II", b, r0_off + 0x70, 4096, 2)
    with pytest.raises(ValueError, match="out of bounds"):
        M.parse_mobi(bytes(b))


def test_huffcdic_output_cap():
    # a tiny coded record expanding past the cap must raise, not OOM
    from rawdata_client_provider_gcs_spark.sources.huffcdic import (
        HuffCdic, HuffCdicEncoder)

    chunk = b"x" * 4096
    enc = HuffCdicEncoder([chunk])
    dec = HuffCdic(enc.records())
    with pytest.raises(ValueError, match="cap"):
        dec.unpack(enc.encode(chunk), 100)
