"""Round-9 additions: HTML numeric character references, ZIP64,
lossy-WebP (VP8 key-frame intra) decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- html


def test_html_numeric_char_refs(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = (
        "<p>&#8220;Hi&#8221; it&#x2019;s &#8211; no, &#8212; em&#8230;</p>"
        "<p>A&#160;B &#xA0; C&#0160;D</p>"
        "<p>&#60;tag&#62; &#34;q&#34; &#X27;s &amp;#38;</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    out = df.select(H.html_visible_text(F.col("page")).alias("v")).collect()
    assert out[0]["v"] == (
        "“Hi” it’s – no, — em… "
        "A B C D <tag> \"q\" 's &#38;"
    )


def test_html_numeric_refs_stay_codegen(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    df = spark.createDataFrame([(1, "<p>&#8217;</p>")], "doc_id long, page string")
    plan = (
        df.select(H.html_visible_text(F.col("page")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_html_numeric_refs_in_table_cells(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = "<table><tr><td>it&#8217;s</td><td>5&#160;kg</td></tr></table>"
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    out = H.html_tables(df, "page").collect()
    assert list(out[0]["cells"]) == ["it’s", "5 kg"]


# --------------------------------------------------------------- zip64


def test_zip64_roundtrip_and_stdlib_interop_both_ways():
    import io
    import zipfile

    from rawdata_client_provider_gcs_spark.sources import archive as A

    blob = A.build_zip([("a.txt", b"hello"), ("d/b.bin", b"x" * 1000)], zip64=True)
    # stdlib reads our zip64 layout
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert [(i.filename, len(zf.read(i))) for i in zf.infolist()] == [
        ("a.txt", 5),
        ("d/b.bin", 1000),
    ]
    # we read our own
    ms = A.parse_zip(blob)
    assert [(m["path"], m["payload"]) for m in ms] == [
        ("a.txt", b"hello"),
        ("d/b.bin", b"x" * 1000),
    ]
    # we read stdlib's per-member force_zip64 extras
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        with z.open(zipfile.ZipInfo("big.txt"), "w", force_zip64=True) as f:
            f.write(b"payload" * 100)
        z.writestr("small.txt", b"tiny")
    ms = A.parse_zip(buf.getvalue())
    assert [(m["path"], m["size"]) for m in ms] == [
        ("big.txt", 700),
        ("small.txt", 4),
    ]


def test_zip64_over_65535_members_stdlib_written():
    """The real failure mode ZIP64 exists for: a >65,535-member archive
    (classic EOCD count saturates at 0xFFFF) written by stdlib zipfile
    must fully parse — before round 9 the whole archive was unreachable."""
    import io
    import zipfile

    from rawdata_client_provider_gcs_spark.sources import archive as A

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for i in range(65540):
            z.writestr("m%05d" % i, b"")
    ms = A.parse_zip(buf.getvalue())
    assert len(ms) == 65540
    assert ms[0]["path"] == "m00000" and ms[-1]["path"] == "m65539"


def test_zip_exactly_65535_members_is_classic_not_zip64():
    """stdlib zipfile stores n_entries=0xFFFF LITERALLY at exactly
    65,535 members (zip64 kicks in only when the limit is exceeded);
    the sentinel must not be treated as zip64-mandatory."""
    import io
    import zipfile

    from rawdata_client_provider_gcs_spark.sources import archive as A

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for i in range(65535):
            z.writestr("m%05d" % i, b"")
    blob = buf.getvalue()
    assert b"PK\x06\x06" not in blob[-200:]  # genuinely classic
    ms = A.parse_zip(blob)
    assert len(ms) == 65535


def test_zip64_hostile_cases_land_on_valueerror():
    import struct

    from rawdata_client_provider_gcs_spark.sources import archive as A

    # sentinel cd_size/cd_off with no locator are taken LITERALLY and
    # then fail the directory bound: clean ValueError, not a crash
    blob = bytearray(A.build_zip([("a", b"x")]))
    blob[-12:-4] = struct.pack("<II", 0xFFFFFFFF, 0xFFFFFFFF)  # cd_size/cd_off
    with pytest.raises(ValueError, match="zip"):
        A.parse_zip(bytes(blob))

    # locator pointing at garbage
    good = A.build_zip([("a", b"x")], zip64=True)
    bad = bytearray(good)
    loc = good.rfind(b"PK\x06\x07")
    bad[loc + 4 : loc + 12] = struct.pack("<Q", 1)[:8] * 0 + struct.pack(
        "<II", 0, 2
    )  # bogus zip64 EOCD offset
    with pytest.raises(ValueError, match="zip64"):
        A.parse_zip(bytes(bad))

    # zip64 extra shorter than its sentinels require
    ms = A.build_zip([("a", b"x")], zip64=True)
    truncated = bytearray(ms)
    cdh = truncated.find(b"PK\x01\x02")
    extra_off = cdh + 46 + 1  # name is 1 byte
    assert truncated[extra_off : extra_off + 4] == struct.pack("<HH", 0x0001, 24)
    truncated[extra_off + 2 : extra_off + 4] = struct.pack("<H", 8)  # lie: 8 bytes
    with pytest.raises(ValueError, match="zip64 extra|extra field"):
        A.parse_zip(bytes(truncated))


def test_zip64_through_archive_members_kernel(spark):
    from rawdata_client_provider_gcs_spark.sources import archive as A

    blob = A.build_zip(
        [("x/a.txt", b"alpha"), ("x/b.txt", b"beta")], method="store", zip64=True
    )
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    out = A.archive_members(df).orderBy("member_idx").collect()
    assert [r["error"] for r in out] == [None, None]
    assert [(r["path"], bytes(r["payload"])) for r in out] == [
        ("x/a.txt", b"alpha"),
        ("x/b.txt", b"beta"),
    ]


# ------------------------------------------------------------- bigtiff


def _build_bigtiff_gray(img) -> bytes:
    """Hand-built minimal BigTIFF (version 43, 20-byte IFD entries,
    LONG8 counts/offsets): uncompressed single-strip grayscale."""
    import struct

    h, w = img.shape
    strip = img.tobytes()
    header = b"II+\x00" + struct.pack("<HHQ", 8, 0, 16)
    entries = [
        (256, 3, 1, w),       # ImageWidth (SHORT)
        (257, 3, 1, h),       # ImageLength
        (258, 3, 1, 8),       # BitsPerSample
        (259, 3, 1, 1),       # Compression: none
        (262, 3, 1, 1),       # Photometric: BlackIsZero
        (277, 3, 1, 1),       # SamplesPerPixel
        (278, 3, 1, h),       # RowsPerStrip
        (279, 16, 1, len(strip)),  # StripByteCounts (LONG8)
    ]
    # StripOffsets points past the IFD; compute layout first
    n = len(entries) + 1
    ifd_size = 8 + 20 * n + 8
    strip_off = 16 + ifd_size
    entries.insert(6, (273, 16, 1, strip_off))  # StripOffsets (LONG8)
    out = bytearray(header)
    out += struct.pack("<Q", n)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack("<HHQ", tag, typ, cnt)
        if typ == 3:
            out += struct.pack("<H", val) + b"\x00" * 6
        else:
            out += struct.pack("<Q", val)
    out += struct.pack("<Q", 0)  # next IFD
    assert len(out) == strip_off
    out += strip
    return bytes(out)


def test_bigtiff_decodes_like_classic():
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawtiff

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (33, 47)).astype(np.uint8)
    big = _build_bigtiff_gray(img)
    assert rawtiff.sniff_tiff(big)
    got = rawtiff.decode_tiff(big)
    # cross-check against the VERIFIED classic path on the same pixels
    classic = rawtiff.decode_tiff(rawtiff.encode_tiff(img))
    assert (got == classic).all()
    assert (got[:, :, 0] == img).all()


def test_bigtiff_hostile():
    import struct

    import pytest as _p

    from rawdata_client_provider_gcs_spark.operators import rawtiff

    # offset size other than 8 is undefined
    with _p.raises(ValueError, match="offset size"):
        rawtiff.decode_tiff(b"II+\x00" + struct.pack("<HHQ", 4, 0, 16) + b"\x00" * 32)
    # hostile entry-count flood
    blob = b"II+\x00" + struct.pack("<HHQ", 8, 0, 16) + struct.pack("<Q", 1 << 40)
    with _p.raises(ValueError, match="entries|out of range"):
        rawtiff.decode_tiff(blob + b"\x00" * 64)
    # truncated BigTIFF header
    with _p.raises(ValueError, match="truncated"):
        rawtiff.decode_tiff(b"II+\x00\x08\x00")


# -------------------------------------------------------------- tar.gz


def test_targz_transparent_gzip(spark):
    import gzip

    from rawdata_client_provider_gcs_spark.sources import archive as A

    fmt, ms = A.parse_archive(
        gzip.compress(A.build_tar([("a.txt", b"hello"), ("b/c.txt", b"x" * 999)]))
    )
    assert fmt == "tar.gz"
    assert [(m["path"], m["size"]) for m in ms] == [("a.txt", 5), ("b/c.txt", 999)]
    fmt, ms = A.parse_archive(gzip.compress(A.build_zip([("z.txt", b"zz")])))
    assert fmt == "zip.gz" and ms[0]["payload"] == b"zz"
    # bomb guard + corrupt wrapper land on ValueError
    with pytest.raises(ValueError, match="guard"):
        A._gunzip_bounded(gzip.compress(b"\x00" * (1 << 22)), cap=1 << 20)
    with pytest.raises(ValueError, match="gzip"):
        A.parse_archive(b"\x1f\x8b" + b"\x00" * 40)
    # through the Spark kernel, format column carries the wrapper
    blob = gzip.compress(A.build_tar([("m.txt", b"data")]))
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    out = A.archive_members(df).collect()
    assert out[0]["archive_format"] == "tar.gz"
    assert bytes(out[0]["payload"]) == b"data"
