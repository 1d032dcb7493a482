"""Universal payload classification (sources/classify.py)."""

import gzip

import numpy as np

from rawdata_client_provider_gcs_spark.operators import (
    rawimage,
    rawmp4,
    rawogg,
    vorbisdec,
)
from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import legacy_office as L
from rawdata_client_provider_gcs_spark.sources import office as O
from rawdata_client_provider_gcs_spark.sources import rtf as R
from rawdata_client_provider_gcs_spark.sources import zstd_codec as ZS
from rawdata_client_provider_gcs_spark.sources.classify import (
    classify_payload,
    classify_payloads,
)


def _fmt(blob: bytes) -> str:
    return classify_payload(bytes(blob))["format"]


def test_archives_and_office_families():
    assert _fmt(A.build_zip([("a", b"x")])) == "zip"
    assert _fmt(A.build_tar([("a", b"x")])) == "tar"
    assert _fmt(A.build_cpio([("a", b"x")])) == "cpio"
    assert _fmt(O.build_docx(["p"])) == "docx"
    assert _fmt(O.build_pptx(["s"])) == "pptx"
    assert _fmt(O.build_epub(["c"])) == "epub"
    assert _fmt(O.build_odt(["p"])) == "odt"
    assert _fmt(L.build_doc(["t"])) == "doc"
    assert _fmt(L.build_ppt(["t"])) == "ppt"
    assert _fmt(R.build_rtf(["t"])) == "rtf"


def test_wrappers_peel_and_corrupt_verdict():
    tar = A.build_tar([("a", b"x")])
    got = classify_payload(gzip.compress(tar))
    assert (got["format"], got["wrapper"]) == ("tar", "gzip")
    got = classify_payload(ZS.build_zst(b"plain words here\n"))
    assert (got["format"], got["wrapper"]) == ("utf8-text", "zstd")
    # a gzip header with a chopped body is a VERDICT, not a raise
    got = classify_payload(gzip.compress(tar)[:10])
    assert (got["format"], got["wrapper"]) == ("corrupt", "gzip")


def test_media_and_ogg_codec_refinement():
    assert _fmt(rawimage.encode_png(np.zeros((4, 4, 3), "uint8"))) == "png"
    assert _fmt(rawmp4.build_mp4()) == "mp4"
    assert _fmt(vorbisdec.build_pcm_ogg([(5, 2)])) == "ogg-vorbis"
    assert _fmt(rawogg.build_ogg(codec="opus")) == "ogg-opus"
    assert _fmt(rawogg.build_ogg(codec="theora")) == "ogg-theora"
    c = classify_payload(rawogg.build_ogg(codec="theora"))
    assert c["category"] == "video"


def test_text_shapes_and_fallbacks():
    assert _fmt(b"<!DOCTYPE html><html></html>") == "html"
    assert _fmt(b"<?xml version='1.0'?><r/>") == "xml"
    assert _fmt(b'{"a": 1}') == "json"
    assert _fmt("words in a line\n".encode()) == "utf8-text"
    assert _fmt(b"\x00\x01\x02\xfe" * 30) == "binary"
    assert _fmt(b"") == "empty"
    # invalid UTF-8 is binary, never a raise
    assert _fmt(b"\xff\xfe\xfa" * 50) == "binary"


def test_utf8_head_cut_mid_codepoint():
    # the 2048-byte head slice landing mid-codepoint must not reroute a
    # valid non-ASCII text payload to binary (r12 ADVICE, classify.py)
    assert _fmt(b"a" * 2047 + "é".encode() + b" more prose" * 40) == \
        "utf8-text"
    # 4-byte emoji split at every possible offset across the boundary
    for pad in (2045, 2046, 2047):
        p = b"x" * pad + "😀".encode() + b" tail text" * 40
        assert _fmt(p) == "utf8-text", pad
    # but a payload that ENDS in a truncated sequence (head == payload)
    # keeps strict semantics → binary
    assert _fmt(b"a" * 100 + "é".encode()[:1]) == "binary"
    # and invalid bytes just before the cut stay binary even when the
    # payload continues past the head
    assert _fmt(b"a" * 2040 + b"\xff\xff\xff\xff" + b"tail" * 600) == \
        "binary"


def test_ambiguity_rules_inherited():
    # a tar whose first member name looks like a cpio magic still
    # classifies as tar (ustar offset-257 precedence)
    tricky = A.build_tar([("070701weird", b"x")])
    assert _fmt(tricky) == "tar"
    # plain text starting with BZh9 is NOT a bzip2 wrapper
    assert _fmt(b"BZh9 is a compression level, this is prose") == \
        "utf8-text"


def test_spark_router(spark):
    rows = [
        (0, bytearray(A.build_zip([("a", b"x")]))),
        (1, bytearray(gzip.compress(A.build_tar([("a", b"x")])))),
        (2, bytearray(b"%PDF-1.4 x")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in classify_payloads(df).collect()}
    assert (got[0].format, got[0].category) == ("zip", "archive")
    assert (got[1].format, got[1].wrapper) == ("tar", "gzip")
    assert got[2].format == "pdf"
    assert (got[3].format, got[3].n_bytes) == ("empty", 0)


def test_classify_never_raises_fuzz():
    """classify_payload's contract: ANY bytes produce a verdict."""
    import random

    rng = random.Random(12)
    seeds = [
        b"", b"PK\x03\x04", b"\x1f\x8b\x08", b"OggS", b"%PDF-",
        b"{\\rtf1", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", b"BZh9",
        b"\x28\xb5\x2f\xfd", b"\xfd7zXZ\x00", b"From ",
    ]
    for _ in range(400):
        blob = seeds[rng.randrange(len(seeds))] + rng.randbytes(
            rng.randrange(0, 400)
        )
        got = classify_payload(blob)
        assert set(got) == {"format", "category", "wrapper"}
        assert isinstance(got["format"], str)


def test_peel_prefix_bounds_inflation():
    """Every wrapper codec decodes only a PEEL_PREFIX_BYTES prefix
    (r13): content far past the budget still classifies from its head
    instead of landing on 'oversize', and the work per wrapped row is
    bounded by the prefix, not the 64 MiB cap.  A wrapper around
    EMPTY content stays 'empty' (r12)."""
    import gzip

    from rawdata_client_provider_gcs_spark.sources import classify as CL
    from rawdata_client_provider_gcs_spark.sources.compression import (
        lz4_compress, snappy_stream_compress, z_compress,
    )
    from rawdata_client_provider_gcs_spark.sources.zstd_codec import (
        build_zst,
    )

    big = b"plain words " * 200_000  # 2.4 MB >> 64 KiB prefix
    for wrap, name in (
        (build_zst, "zstd"),
        (gzip.compress, "gzip"),
        (lz4_compress, "lz4"),
        (snappy_stream_compress, "snappy"),
        (z_compress, "compress"),
    ):
        got = classify_payload(wrap(big))
        assert (got["format"], got["wrapper"]) == ("utf8-text", name)
    # the prefix itself is what classification sees: a wrapped ZIP
    # larger than the prefix degrades to the magic-only 'zip' verdict
    # (central directory out of reach) rather than erroring
    from rawdata_client_provider_gcs_spark.sources import archive as A

    inner = A.build_zip([("word/document.xml", b"<w/>"),
                         ("pad.bin", b"\xa5" * (CL.PEEL_PREFIX_BYTES * 2))],
                        method="store")
    got = classify_payload(build_zst(inner))
    assert (got["format"], got["wrapper"]) == ("zip", "zstd")
    # ...while one that FITS in the prefix still refines fully
    small = A.build_zip([("word/document.xml", b"<w/>")])
    got = classify_payload(build_zst(small))
    assert (got["format"], got["wrapper"]) == ("docx", "zstd")
    got = classify_payload(gzip.compress(b""))
    assert (got["format"], got["wrapper"]) == ("empty", "gzip")


def test_zip64_office_classifies(tmp_path):
    """zip64 OOXML routes through the shared EOCD resolution."""
    from rawdata_client_provider_gcs_spark.sources import archive as A

    blob = A.build_zip(
        [("word/document.xml", b"<w/>"), ("a.bin", b"z" * 64)],
        zip64=True,
    )
    assert classify_payload(blob)["format"] == "docx"


def test_tabular_and_jxl_refinement():
    assert _fmt(b"a,b,c\n1,2,3\n4,5,6\n7,8,9\n") == "csv"
    assert _fmt(b"x\ty\n1\t2\n3\t4\n") == "tsv"
    # inconsistent comma counts stay plain text
    assert _fmt(b"words here\nmore, with a comma\nanother line\n") == \
        "utf8-text"
    assert _fmt(b"\xff\x0a" + b"\x00" * 20) == "jxl"
    assert _fmt(b"\x00\x00\x00\x0cJXL \x0d\x0a\x87\x0a" + b"\x00" * 8) == \
        "jxl"
