"""Round-10 regression tests for the round-9 ADVICE findings:
zero-padded numeric character references, hostile-tkhd validation,
MP3 leading-junk resync accounting, orphan-reply thread semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- html


def test_html_zero_padded_numeric_refs(spark):
    """`0*` applies uniformly across the table — zero-padded forms of
    the non-ASCII entries (curly quotes, dashes, ellipsis) decode the
    same as their canonical spellings (ADVICE r9, functions/html.py)."""
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = (
        "<p>&#08216;a&#08217; &#x02018;b&#x02019;</p>"
        "<p>&#08220;c&#08221; &#008211; &#x002014; &#08230;</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    out = df.select(H.html_visible_text(F.col("page")).alias("v")).collect()
    assert out[0]["v"] == "‘a’ ‘b’ “c” – — …"


# ----------------------------------------------------------------- mp4


def test_mp4_tkhd_short_box_raises():
    """A tkhd >=32 bytes but shorter than its full version-dependent
    body (84 v0 / 96 v1) must raise, not read garbage width/height off
    box_end (ADVICE r9, rawmp4.py)."""
    from rawdata_client_provider_gcs_spark.operators import rawmp4 as M

    base = M.build_mp4()
    meta = M.parse_mp4(base)
    assert meta["tracks"] and meta["tracks"][0]["width"] > 0

    def boxes(fields: bytes) -> bytes:
        tkhd = (len(fields) + 8).to_bytes(4, "big") + b"tkhd" + fields
        trak = (len(tkhd) + 8).to_bytes(4, "big") + b"trak" + tkhd
        mvhd_body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + (1000).to_bytes(
            4, "big"
        ) + (1000).to_bytes(4, "big") + b"\x00" * 80
        mvhd = (len(mvhd_body) + 8).to_bytes(4, "big") + b"mvhd" + mvhd_body
        moov = (len(mvhd) + len(trak) + 8).to_bytes(4, "big") + b"moov" + mvhd + trak
        ftyp = (16).to_bytes(4, "big") + b"ftypisom" + b"\x00\x00\x00\x00"
        return ftyp + moov

    # version 0, 40-byte body: >=32 but < 84 — previously yielded
    # in-bounds garbage dimensions, now a clean ValueError
    with pytest.raises(ValueError, match="tkhd"):
        M.parse_mp4(boxes(bytes([0, 0, 0, 0]) + b"\x00" * 36))
    # version 1 body sized for version 0 (84 < 96)
    with pytest.raises(ValueError, match="tkhd"):
        M.parse_mp4(boxes(bytes([1, 0, 0, 0]) + b"\x00" * 80))
    # unknown version byte must not silently use v0 offsets
    with pytest.raises(ValueError, match="tkhd"):
        M.parse_mp4(boxes(bytes([7, 0, 0, 0]) + b"\x00" * 92))


# ----------------------------------------------------------------- mp3


def test_mp3_leading_junk_counts_as_resync():
    """Junk before the FIRST confirmed frame is a resync event too —
    the walk recovered from a corrupt head (ADVICE r9, rawmp3.py)."""
    from rawdata_client_provider_gcs_spark.operators import rawmp3 as P

    clean = P.build_mp3(n_frames=4)
    assert P.parse_mp3(clean)["resyncs"] == 0
    dirty = b"\x00\x13garbage-head\x37" + clean
    m = P.parse_mp3(dirty)
    assert m["n_frames"] == 4
    assert m["resyncs"] >= 1


# ---------------------------------------------------------------- mail


def test_orphan_replies_root_at_missing_ancestor_id(spark):
    """Replies to a pruned parent all land in ONE thread keyed by the
    missing parent's Message-ID (documented semantics after ADVICE r9
    reword, sources/mail.py assign_threads)."""
    from rawdata_client_provider_gcs_spark.sources import mail as ML

    rows = [
        ("<a@x>", "<gone@x>"),   # parent not in corpus
        ("<b@x>", "<a@x>"),      # grandchild of the hole
        ("<c@x>", "<gone@x>"),   # sibling orphan
        ("<d@x>", None),          # a real root
    ]
    df = spark.createDataFrame(rows, "message_id string, in_reply_to string")
    out = {
        r["message_id"]: r["thread_id"]
        for r in ML.assign_threads(df).collect()
    }
    assert out["<a@x>"] == out["<b@x>"] == out["<c@x>"] == "<gone@x>"
    assert out["<d@x>"] == "<d@x>"


# ----------------------------------------------------------- id3 unsync


def test_id3v2_unsynchronisation_all_versions():
    """Round-10: the unsync flag (whole-tag v2.2/2.3, per-frame v2.4)
    is reversed before the frame walk; utf-16 BOMs (0xFF 0xFE) are the
    common trigger in real tags."""
    from rawdata_client_provider_gcs_spark.operators import rawmp3 as M

    tags = {"title": "Büßer ÿsong", "artist": "Ärtist", "year": "1999"}
    for v in (2, 3, 4):
        for enc in (0, 1, 3):
            for un in (False, True):
                blob = M.build_id3v2(tags, version=v, encoding=enc, unsync=un)
                t = M.id3_tags(blob + M.build_mp3(2))
                assert t.get("title") == "Büßer ÿsong", (v, enc, un)
                assert t.get("source") == f"id3v2.{v}"

    # hand-built v2.3 whole-tag unsync, utf-16 BOM escaped (the frame
    # size counts the de-unsynced body; the header size the escaped tag)
    body = (
        b"TIT2"
        + (1 + len("Hi".encode("utf-16"))).to_bytes(4, "big")
        + b"\x00\x00" + bytes([1]) + "Hi".encode("utf-16")
    )
    esc = body.replace(b"\xff", b"\xff\x00")
    blob = b"ID3" + bytes([3, 0, 0x80]) + M._to_syncsafe(len(esc)) + esc
    assert M.id3_tags(blob)["title"] == "Hi"

    # hostile: unsync flag with garbage stays lenient (no raise)
    assert isinstance(
        M.id3_tags(b"ID3" + bytes([3, 0, 0x80]) + M._to_syncsafe(64)
                   + b"\xff" * 64),
        dict,
    )


# ----------------------------------------------------------------- bm25


def test_bm25_hand_computed(spark):
    """Three tiny docs, scores checked against a by-hand numpy
    evaluation of the BM25 formula (k1=1.2, b=0.75, non-negative idf)."""
    import math

    from rawdata_client_provider_gcs_spark.functions.text import bm25_topk

    rows = [
        (1, "spark spark hash"),          # dl=3
        (2, "hash join join join merge"),  # dl=5
        (3, "table scan filter row"),      # dl=4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_topk(df, ["spark", "join"], k=10).collect()
    }

    def idf(dfreq, n=3):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def w(tf, dl, dfreq, avgdl=4.0, k1=1.2, b=0.75):
        return idf(dfreq) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl)
        )

    assert got[1][1] == 1 and got[2][1] == 1 and 3 not in got
    assert got[1][0] == pytest.approx(w(2, 3, 1))
    assert got[2][0] == pytest.approx(w(3, 5, 1))
    # rank: doc 2 (tf=3) above doc 1 despite longer dl
    assert got[2][0] > got[1][0]


def test_bm25_empty_query_and_k_cut(spark):
    from rawdata_client_provider_gcs_spark.functions.text import bm25_topk

    rows = [(i, "common term doc %d" % i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert bm25_topk(df, ["absent"], k=5).count() == 0
    top = bm25_topk(df, ["common"], k=5).collect()
    assert len(top) == 5
    # identical scores tie-break on doc_id ascending
    assert [r["doc_id"] for r in top] == [0, 1, 2, 3, 4]


# ----------------------------------------------------------------- fmp4


def test_fmp4_duration_sources_agree():
    from rawdata_client_provider_gcs_spark.operators import rawmp4 as M

    metas = [
        M.parse_mp4(M.build_mp4(duration_ms=4000, fragments=5,
                                samples_per_fragment=10,
                                duration_source=src))
        for src in ("trun", "tfhd", "trex")
    ]
    for m in metas:
        assert m["fragmented"] and m["n_fragments"] == 5
        assert m["duration_ms"] == 4000
        assert m["fragment_samples"] == {1: 50, 2: 50}
        assert m["fragment_ticks"] == {1: 4000, 2: 4000}
        # per-track duration was derived from fragment ticks
        assert all(t["duration_ms"] == 4000 for t in m["tracks"])


def test_fmp4_bare_segment_is_valid_not_corruption():
    from rawdata_client_provider_gcs_spark.operators import rawmp4 as M

    m = M.parse_mp4(M.build_m4s(n_samples=8, sample_dur=40))
    assert m["segment_only"] and m["n_fragments"] == 1
    assert m["fragment_ticks"] == {1: 320}
    assert m["duration_ms"] == 0  # no init segment, no timescale
    # classic files unchanged; ftyp-only still raises
    assert not M.parse_mp4(M.build_mp4())["fragmented"]
    with pytest.raises(ValueError, match="moov"):
        M.parse_mp4(b"\x00\x00\x00\x10ftypisom" + b"\x00" * 8)


def test_fmp4_hostile_structures():
    from rawdata_client_provider_gcs_spark.operators import rawmp4 as M

    def seg(traf_body: bytes) -> bytes:
        traf = (len(traf_body) + 8).to_bytes(4, "big") + b"traf" + traf_body
        mfhd = (16).to_bytes(4, "big") + b"mfhd" + bytes(4) + (1).to_bytes(4, "big")
        moof = (len(mfhd) + len(traf) + 8).to_bytes(4, "big") + b"moof" + mfhd + traf
        styp = (16).to_bytes(4, "big") + b"stypmsdh" + bytes(4)
        return styp + moof

    # trun before tfhd
    trun = (16).to_bytes(4, "big") + b"trun" + bytes([0, 0, 1, 0]) + (1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="trun before tfhd"):
        M.parse_mp4(seg(trun))
    # trun sample-count bomb (count far beyond the payload)
    tfhd = (16).to_bytes(4, "big") + b"tfhd" + bytes(4) + (1).to_bytes(4, "big")
    bomb = (16).to_bytes(4, "big") + b"trun" + bytes([0, 0, 1, 0]) + (1 << 30).to_bytes(4, "big")
    with pytest.raises(ValueError, match="cap"):
        M.parse_mp4(seg(tfhd + bomb))
    # trun table truncated (declares durations, carries none)
    short = (16).to_bytes(4, "big") + b"trun" + bytes([0, 0, 1, 0]) + (3).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated"):
        M.parse_mp4(seg(tfhd + short))


# ------------------------------------------------------------ page meta


def test_html_page_meta_extraction(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = (
        '<html LANG="pt-BR"><head>'
        "<meta charset='utf-8'>"
        "<META PROPERTY='og:title' CONTENT='T'/>"
        '<meta content="D" name="description">'  # attr order flipped
        '<link href="x.css" rel="stylesheet">'
        "<link rel='canonical' href='https://e.x/c'>"
        '<script>var x = {"@context": "fake-in-js"}</script>'
        '<script type="application/ld+json">'
        '{"@context":"https://schema.org","@type":"NewsArticle"}</script>'
        "</head></html>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    r = H.html_page_meta(df, "page").collect()[0].asDict()
    assert r["og_title"] == "T"          # case-insensitive tag + attrs
    assert r["meta_description"] == "D"  # order-free
    assert r["canonical_url"] == "https://e.x/c"
    assert r["lang"] == "pt-BR"
    # the JS false positive (@context with no @type) is skipped;
    # the real ld+json block wins
    assert r["jsonld_type"] == "NewsArticle"
    assert r["n_meta_tags"] == 3
    assert r["og_image"] == "" and r["robots"] == ""

    # page with nothing: empty strings, no NULLs, no errors
    empty = spark.createDataFrame([(2, "<p>hi</p>")], "doc_id long, page string")
    r2 = H.html_page_meta(empty, "page").collect()[0].asDict()
    assert all(
        r2[k] == "" for k in ("og_title", "canonical_url", "lang",
                               "jsonld_type", "robots")
    )
    assert r2["n_meta_tags"] == 0


def test_html_page_meta_hostile_linear(spark):
    import time

    from rawdata_client_provider_gcs_spark.functions import html as H

    hostile = [
        ("<meta " * 60_000) + ">",          # opener flood, one closer
        "<meta " + "x" * 500_000,            # unterminated opener
        ("<link " * 60_000),                 # link flood, no closers
        ('<script>{"@context"' * 20_000),    # unclosed ld-ish scripts
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hostile)], "doc_id long, page string"
    ).repartition(1)
    t0 = time.perf_counter()
    H.html_page_meta(df, "page").collect()
    assert time.perf_counter() - t0 < 30.0


# ------------------------------------------------------------ subtitles


def test_subtitles_formats_and_edges(spark):
    from rawdata_client_provider_gcs_spark.functions import subtitles as S

    srt = (
        "1\n00:00:01,000 --> 00:00:04,000\nHello there\n\n"
        "2\n00:01:00,500 --> 00:01:02,000\n<i>italic</i> line\ntwo lines\n"
    )
    vtt = (
        "WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
        "cue-1\n01:05.250 --> 01:07.000 align:start\n"
        "Short <c.yellow>form</c>\n\n"
        "02:00:00.000 --> 02:00:01.000\nLong form\n"
    )
    crlf = "1\r\n00:00:00,100 --> 00:00:00,900\r\nwindows line\r\n"
    garbage = "not a subtitle file at all\n\njust text\n"
    df = spark.createDataFrame(
        [(1, srt), (2, vtt), (3, crlf), (4, garbage)],
        "doc_id long, sub string",
    )
    rows = {
        (r["doc_id"], r["cue_idx"]): r
        for r in S.subtitle_cues(df, "sub").collect()
    }
    assert rows[(1, 0)]["start_ms"] == 1000
    assert rows[(1, 1)]["cue_text"] == "italic line two lines"
    assert rows[(2, 0)]["start_ms"] == 65250      # hourless VTT stamp
    assert rows[(2, 1)]["start_ms"] == 7_200_000  # 2-hour stamp
    assert rows[(2, 0)]["cue_text"] == "Short form"
    assert rows[(3, 0)]["cue_text"] == "windows line"
    assert not [k for k in rows if k[0] == 4]  # garbage -> zero cues

    stats = {r["doc_id"]: r for r in S.subtitle_stats(df, "sub").collect()}
    assert stats[1]["n_cues"] == 2 and stats[1]["total_ms"] == 4500
    assert 4 not in stats

    # Catalyst-only
    plan = (
        S.subtitle_cues(df, "sub")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


# ------------------------------------------------------------------ aac


def test_aac_adts_metadata_and_boundary(spark):
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import multimodal as M
    from rawdata_client_provider_gcs_spark.operators import rawaac as A

    b = A.build_aac(50, sf_index=4, channels=2)
    m = A.parse_aac(b)
    assert m["n_frames"] == 50 and m["sample_rate"] == 44100
    assert m["duration_ms"] == 50 * 1024 * 1000 // 44100
    assert m["profile"] == "LC" and m["version"] == "MPEG-4"

    # hand-packed header vector (independent of build_aac): MPEG-4,
    # no CRC, LC, 48 kHz (index 3), stereo (cfg 2), frame_len 0x187
    hand = bytes([0xFF, 0xF1, 0x4C, 0x80 | 0x30, 0x30, 0xFF, 0xFC])
    h = A.parse_adts_header(hand + b"\x00" * 400, 0)
    assert h["sample_rate"] == 48000 and h["profile"] == "LC"
    assert h["channels"] == 2 and h["frame_len"] == 0x187

    # ADTS and MP3 syncs are disjoint: neither sniffs as the other
    from rawdata_client_provider_gcs_spark.operators import rawmp3

    assert not rawmp3.sniff_mp3(b)
    assert not A.sniff_aac(rawmp3.build_mp3(5))

    # junk head resync + ID3 skip
    m2 = A.parse_aac(b"\x00junk" + A.build_aac(8, id3v2_size=16))
    assert m2["n_frames"] == 8 and m2["resyncs"] >= 1
    with pytest.raises(ValueError):
        A.parse_aac(b"\x00" * 300)

    # Spark per-row boundary
    rows = [(1, bytearray(b)), (2, bytearray(b"garbage" * 30))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {
        r["doc_id"]: r["error"]
        for r in M.extract_features(
            M.with_media_columns(df, "content", "audio/aac", "doc_id")
        ).collect()
    }
    assert out[1].startswith("UnsupportedCodecError")
    assert out[2].startswith("MediaDecodeError")


# ----------------------------------------------------------- h264 sps


def test_h264_sps_parsing():
    from rawdata_client_provider_gcs_spark.operators import rawh264 as H

    # roundtrip matrix incl. non-MB-aligned dims and 4:4:4 crop units
    for (w, h, prof, ch) in [
        (1920, 1080, 66, 1), (1280, 720, 100, 1), (322, 242, 100, 1),
        (256, 254, 100, 3), (100, 50, 77, 1),
    ]:
        m = H.parse_sps(H.build_sps(width=w, height=h, profile=prof,
                                    chroma=ch))
        assert (m["width"], m["height"]) == (w, h), (w, h, m)

    # hand-built Exp-Golomb vector (independent of the fixture writer):
    # ue(0)='1', ue(1)='010', ue(5)='00110', se(-2)='00100'
    b = H._Bits(bytes([0b10100011, 0b00010000]))
    assert b.ue() == 0 and b.ue() == 1 and b.ue() == 5
    # se: k=3 ('00100') -> +2, k=4 ('00101') -> -2 per (-1)^(k+1)*ceil(k/2)
    assert H._Bits(bytes([0b00100000])).se() == 2
    assert H._Bits(bytes([0b00101000])).se() == -2

    # emulation-prevention unescape: 00 00 03 00 -> 00 00 00
    assert H._unescape_rbsp(b"\x00\x00\x03\x00ab") == b"\x00\x00\x00ab"

    # avcC and annex-b carriage
    sps = H.build_sps(width=640, height=360)
    assert H.sps_from_avcc(H.build_avcc(sps))["width"] == 640
    annexb = b"\x00\x00\x01\x65xx" + b"\x00\x00\x00\x01" + sps
    assert H.find_sps_annexb(annexb)["height"] == 360

    # hostile: truncated, crop bomb, golomb bomb, no start code
    with pytest.raises(ValueError):
        H.parse_sps(H.build_sps(width=640, height=360)[:5])
    with pytest.raises(ValueError):
        H.parse_sps(bytes([0x67, 66, 0, 30]) + b"\x00" * 8)  # golomb run
    with pytest.raises(ValueError, match="start code"):
        H.find_sps_annexb(b"\x00\x01\x02" * 100)
    with pytest.raises(ValueError, match="avcC"):
        H.sps_from_avcc(b"\x02garbage")


# ------------------------------------------------------------------ av1


def test_av1_sequence_header():
    from rawdata_client_provider_gcs_spark.operators import rawav1 as AV
    from rawdata_client_provider_gcs_spark.operators import rawheif as H

    for (w, h, prof, red, lvl) in [
        (320, 240, 0, True, 8), (1920, 1080, 1, True, 12),
        (640, 360, 0, False, 5), (8192, 4320, 2, False, 19),
        (1, 1, 0, True, 0),
    ]:
        m = AV.parse_av1c(AV.build_av1c(
            width=w, height=h, profile=prof, reduced=red, level=lvl
        ))
        assert (m["width"], m["height"]) == (w, h)
        assert m["level_idx"] == lvl and m["reduced_header"] == red

    # prefix-only record (no config OBUs): flags still decode
    m0 = AV.parse_av1c(bytes([0x81, (1 << 5) | 12, 0x40, 0]))
    assert m0["bit_depth"] == 10 and m0["profile_idx"] == 1
    with pytest.raises(ValueError, match="marker"):
        AV.parse_av1c(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        AV.parse_av1c(AV.build_av1c(width=64, height=64)[:6])

    # AVIF carries the real av1C now: codec-authoritative dims agree
    # with ispe in the fixture, and land as av1_* meta keys
    m = H.parse_heif(H.build_heif(width=500, height=300))
    assert (m["av1_width"], m["av1_height"]) == (500, 300)
    assert m["av1_profile"] == "Main"
    assert "av1_width" not in H.parse_heif(H.build_heif(fmt="heic"))


# ----------------------------------------------------------------- hevc


def test_hevc_sps_parsing():
    from rawdata_client_provider_gcs_spark.operators import rawheif as H
    from rawdata_client_provider_gcs_spark.operators import rawhevc as HV

    for (w, h, prof, ch) in [
        (1920, 1080, 1, 1), (1280, 720, 2, 1), (638, 362, 1, 1),
        (333, 111, 1, 3), (4096, 2160, 1, 2),
    ]:
        m = HV.parse_sps(HV.build_sps(width=w, height=h, profile=prof,
                                      chroma=ch))
        assert (m["width"], m["height"]) == (w, h), (w, h, m)
    assert HV.sps_from_hvcc(
        HV.build_hvcc(HV.build_sps(width=1920, height=1080))
    )["width"] == 1920
    with pytest.raises(ValueError, match="hvcC"):
        HV.sps_from_hvcc(b"\x02garbage-record-bytes-here-xx")
    with pytest.raises(ValueError, match="no SPS"):
        HV.find_sps_annexb(b"\x00\x01\x02" * 50)

    # HEIC fixtures carry a real hvcC: codec dims agree with ispe
    m = H.parse_heif(H.build_heif(fmt="heic", width=640, height=480))
    assert (m["hevc_width"], m["hevc_height"]) == (640, 480)
    assert m["hevc_profile"] == "Main"

    # fuzz: ValueError only
    import random

    rng = random.Random(9)
    base = HV.build_hvcc(HV.build_sps(width=1280, height=720))
    for _ in range(300):
        mb = bytearray(base)
        for _ in range(2):
            mb[rng.randrange(len(mb))] ^= 0xFF
        try:
            HV.sps_from_hvcc(bytes(mb))
        except ValueError:
            pass
