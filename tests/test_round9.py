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
