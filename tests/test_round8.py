"""Round-8 regressions: IVF index staging cache hygiene (ADVICE r7 #5).

The staged-index cache used to key on the embeddings file LISTING and
never clean its mkdtemp directories — an in-place rewrite reusing the
same file names silently served a stale index, and every distinct
corpus leaked a tempdir for the process lifetime.
"""

from __future__ import annotations

import os
import time

import pytest

from rawdata_client_provider_gcs_spark.plans import catalog, llm


SF = "/root/testdata/sf0.001"


def test_fingerprint_sees_in_place_rewrites(tmp_path):
    f = tmp_path / "embeddings.parquet"
    f.write_bytes(b"one")
    fp1 = llm._ivf_corpus_fingerprint([str(f)])
    # same name, same size, later mtime — still a different corpus
    time.sleep(0.01)
    f.write_bytes(b"two")
    fp2 = llm._ivf_corpus_fingerprint([str(f)])
    assert fp1 != fp2
    # file: scheme prefixes stat the same path
    fp3 = llm._ivf_corpus_fingerprint([f"file:{f}"])
    assert fp3[0][1:] == fp2[0][1:]


def test_fingerprint_orders_and_survives_missing(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.write_bytes(b"x")
    b.write_bytes(b"y")
    assert llm._ivf_corpus_fingerprint([str(b), str(a)]) == (
        llm._ivf_corpus_fingerprint([str(a), str(b)])
    )
    missing = llm._ivf_corpus_fingerprint(["s3://bucket/part-0.parquet"])
    assert missing[0][1:] == (-1, -1)


@pytest.mark.usefixtures("spark")
def test_staged_index_caches_and_drops_stale_builds(spark):
    q = catalog.queries()["q_similarity_ivf_index"]
    llm._IVF_INDEX_CACHE.clear()
    try:
        q(spark, SF).collect()
        assert len(llm._IVF_INDEX_CACHE) == 1
        (key1, tmp1), = llm._IVF_INDEX_CACHE.items()
        assert os.path.isdir(tmp1.name + "/lists")
        # warm second call: cache hit, same staged directory
        q(spark, SF).collect()
        assert llm._IVF_INDEX_CACHE[key1] is tmp1
        # simulate an in-place corpus rewrite: replace the real entry
        # with one under a stale fingerprint for the same sf
        import tempfile

        stale = tempfile.TemporaryDirectory(prefix="rawdata-ivf-stale-")
        stale_dir = stale.name
        llm._IVF_INDEX_CACHE.clear()
        llm._IVF_INDEX_CACHE[(SF, ("stale",))] = stale
        q(spark, SF).collect()
        assert (SF, ("stale",)) not in llm._IVF_INDEX_CACHE
        assert not os.path.exists(stale_dir)  # cleaned, not leaked
        assert len(llm._IVF_INDEX_CACHE) == 1
    finally:
        for tmp in llm._IVF_INDEX_CACHE.values():
            tmp.cleanup()
        llm._IVF_INDEX_CACHE.clear()


def test_html_extraction_rules(spark):
    """functions/html.py: script/style subtrees die, tags strip,
    entities decode in the order that keeps '&amp;lt;' -> '&lt;',
    malformed markup degrades instead of raising, and the whole tier
    is Catalyst expressions (no Python UDF in the plan)."""
    from rawdata_client_provider_gcs_spark.functions import html as H

    rows = [
        (1, '<html><head><title>T1</title></head><body>'
            '<SCRIPT>var a = "<p>not text</p>";</SCRIPT>'
            '<p>Hello   world</p><a href="x">l1</a><a href="y">l2</a>'
            '</body></html>'),
        (2, '<p>A &amp;lt; B &amp; C &lt;tag&gt; &nbsp; D</p>'),
        (3, '<p>unclosed <b oops'),          # malformed: no closing '>'
        (4, 'no markup at all'),
        (5, '<style media="x">p{}</style>visible'),
        # review findings (r8): a script "closed" by </title> inside a
        # string literal must not leak code into visible text; legacy
        # uppercase <TITLE>/<A HREF> must still extract and count
        (6, '<script>document.write("</title>")</script>clean text'),
        (7, '<TITLE>Shouty</TITLE><body><A HREF="x">go</A></body>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: r
        for r in H.with_html_columns(df, "html").collect()
    }
    assert got[1].html_title == "T1"
    assert got[1].html_text == "Hello world l1 l2"
    assert got[1].html_n_links == 2
    # double-escaped entity decodes one level only
    assert got[2].html_text == 'A &lt; B & C <tag> D'
    assert got[3].html_text == "unclosed <b oops"  # leftover bracket stays
    assert got[4].html_text == "no markup at all"
    assert got[4].html_n_tags == 0
    assert got[5].html_text == "visible"
    assert "document.write" not in got[6].html_text
    assert got[6].html_text.endswith("clean text")
    assert got[7].html_title == "Shouty"
    assert got[7].html_text == "go" and got[7].html_n_links == 1
    plan = H.with_html_columns(df, "html")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_warc_records_through_spark(spark):
    """sources/warc.py: record explosion, HTTP envelope split, gzip
    member chains, and per-row error capture for corrupt files."""
    from rawdata_client_provider_gcs_spark.sources import warc as W

    recs = [
        {"warc_type": "warcinfo", "payload": b"software: t\r\n"},
        {"warc_type": "response", "target_uri": "https://a/1",
         "http_status": 200, "body": b"<html>hi</html>"},
        {"warc_type": "response", "target_uri": "https://a/2",
         "http_status": 404, "body": b"gone"},
    ]
    plain = W.build_warc(recs)
    gz = W.build_warc(recs, gzip_members=True)
    corrupt = plain[:40]
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(gz)), (3, bytearray(corrupt))],
        "doc_id long, payload binary",
    )
    rows = W.warc_records(df).orderBy("doc_id", "record_idx").collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(r)
    for did in (1, 2):  # plain and gzip parse identically
        got = by[did]
        assert [r.warc_type for r in got] == ["warcinfo", "response",
                                              "response"]
        assert got[1].http_status == 200
        assert bytes(got[1].body) == b"<html>hi</html>"
        assert got[2].http_status == 404
        assert all(r.error is None for r in got)
    assert len(by[3]) == 1 and by[3][0].error is not None


def test_warc_hostile_kernel():
    from rawdata_client_provider_gcs_spark.sources import warc as W

    import numpy as np

    recs = [{"warc_type": "response", "target_uri": "u",
             "http_status": 200, "body": b"b" * 50}]
    for gz in (False, True):
        blob = bytearray(W.build_warc(recs, gzip_members=gz))
        rng = np.random.default_rng(3)
        for _ in range(200):
            pos = int(rng.integers(0, len(blob)))
            bit = 1 << int(rng.integers(0, 8))
            blob[pos] ^= bit
            try:
                W.parse_warc(bytes(blob))
            except ValueError:
                pass
            finally:
                blob[pos] ^= bit
    # lying Content-Length (past EOF) and negative lengths
    with pytest.raises(ValueError):
        W.parse_warc(b"WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort")
    with pytest.raises(ValueError):
        W.parse_warc(b"WARC/1.0\r\nContent-Length: x\r\n\r\n")


def test_warc_negative_length_is_bounded():
    from rawdata_client_provider_gcs_spark.sources import warc as W

    with pytest.raises(ValueError, match="negative"):
        W.parse_warc(b"WARC/1.0\r\nContent-Length: -5\r\n\r\n" + b"x" * 100)


def test_url_columns_edge_cases(spark):
    from rawdata_client_provider_gcs_spark.functions import urls as U

    rows = [
        (1, "https://www.example.co.uk/a/b?x=1&y=2"),
        (2, "HTTP://HOST.COM/"),
        (3, "https://localhost"),              # single-label host
        (4, "ftp://a.b.c.d.example.com/x/y/z/w"),
        (5, "https://site.io?only=param"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in U.with_url_columns(df, "url").collect()}
    assert got[1].url_domain == "example.co.uk"  # multi-part TLD
    assert got[1].url_path_depth == 2 and got[1].url_n_params == 2
    assert got[2].url_scheme == "http" and got[2].url_host == "host.com"
    assert got[2].url_domain == "host.com"
    assert got[3].url_domain == "localhost" and got[3].url_path_depth == 0
    assert got[4].url_domain == "example.com" and got[4].url_path_depth == 4
    assert got[5].url_n_params == 1 and got[5].url_path_depth == 0
    plan = U.with_url_columns(df, "url")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_dedup_segments_strips_only_frequent(spark):
    from rawdata_client_provider_gcs_spark.functions import (
        text as T,
    )

    rows = [(i, f"BOILER PLATE. unique sentence {i}. tail {i}")
            for i in range(12)]
    rows.append((99, "no chrome here at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in T.corpus_dedup_segments(df, min_doc_freq=10).collect()
    }
    for i in range(12):
        assert out[i].n_segments == 3 and out[i].n_kept == 2
        assert out[i].cleaned_text == f"unique sentence {i}. tail {i}"
    assert out[99].cleaned_text == "no chrome here at all"
    # threshold above the plant count keeps everything
    full = T.corpus_dedup_segments(df, min_doc_freq=50).collect()
    assert all(r.n_kept == r.n_segments for r in full)


def test_g711_tables_match_audioop():
    """The μ-law/A-law expansion tables must be bit-exact against the
    stdlib's independent implementation (skip-gated: audioop leaves in
    Python 3.13)."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawaudio as RA

    mu_ref = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), "<i2")
    a_ref = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), "<i2")
    np.testing.assert_array_equal(RA._MU_LUT, mu_ref)
    np.testing.assert_array_equal(RA._A_LUT, a_ref)


def test_g711_wav_roundtrip_and_snr():
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawaudio as RA

    t = np.linspace(0, 1, 8000)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    for law, floor_db in (("mu", 35.0), ("a", 35.0)):
        blob = RA.encode_wav_g711(sig, 8000, law=law)
        dec, rate = RA.decode_wav(blob)
        assert rate == 8000 and dec.shape == (8000, 1)
        snr = 10 * np.log10(
            np.mean(sig**2) / np.mean((dec[:, 0] - sig) ** 2)
        )
        assert snr > floor_db  # textbook G.711 performance
        # companding is idempotent once on the codeword lattice
        blob2 = RA.encode_wav_g711(dec[:, 0], 8000, law=law)
        dec2, _ = RA.decode_wav(blob2)
        np.testing.assert_array_equal(dec, dec2)


def test_g711_through_multimodal_features(spark):
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import (
        multimodal,
        rawaudio as RA,
    )

    t = np.linspace(0, 1, 1600)
    sig = 0.5 * np.sin(2 * np.pi * 220 * t)
    rows = [
        (1, bytearray(RA.encode_wav_g711(sig, 1600, law="mu"))),
        (2, bytearray(RA.encode_wav_g711(sig, 1600, law="a"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, a binary")
    media = multimodal.with_media_columns(df, "a", "audio/wav", "doc_id")
    out = multimodal.extract_features(media).collect()
    assert all(r.error is None and len(r.features) == 8 for r in out)


def test_ima_adpcm_step_matches_audioop():
    """The IMA step transition is pinned bit-exact against the stdlib's
    independent implementation over every (index, nibble) pair and a
    spread of predictors (skip-gated: audioop leaves in 3.13)."""
    audioop = pytest.importorskip("audioop")
    import struct

    from rawdata_client_provider_gcs_spark.operators import rawaudio as RA

    for idx in range(89):
        for nib in range(16):
            for pred in (-30000, -1234, 0, 77, 25000):
                out, _ = audioop.adpcm2lin(bytes([nib << 4]), 2, (pred, idx))
                ref = struct.unpack("<h", out[:2])[0]
                mine, _ = RA._ima_step(pred, idx, nib)
                assert mine == ref, (idx, nib, pred)


def test_ima_adpcm_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawaudio as RA

    t = np.linspace(0, 1, 8000)
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([mono, 0.3 * np.cos(2 * np.pi * 220 * t)], axis=1)
    for sig in (mono, stereo):
        blob = RA.encode_wav_adpcm(sig, 8000)
        dec, rate = RA.decode_wav(blob)
        ref = sig if sig.ndim == 2 else sig[:, None]
        n = len(ref)
        assert rate == 8000 and dec.shape[1] == ref.shape[1]
        snr = 10 * np.log10(
            np.mean(ref**2) / np.mean((dec[:n] - ref) ** 2)
        )
        assert snr > 24.0  # 4:1 compander; textbook range


def test_ima_adpcm_hostile_blocks():
    from rawdata_client_provider_gcs_spark.operators import rawaudio as RA

    with pytest.raises(ValueError, match="index out of range"):
        RA._ima_decode_block(b"\x00\x00\x60\x00" + b"\x00" * 4, 1, 9)
    with pytest.raises(ValueError, match="shorter than its headers"):
        RA._ima_decode_block(b"\x00\x00", 1, 9)
    with pytest.raises(ValueError, match="too few samples"):
        RA._ima_decode_block(b"\x00\x00\x00\x00", 1, 9)  # headers only


def test_url_userinfo_and_fragment_edge_cases(spark):
    """Review findings (r8): userinfo must not read as the host, and a
    '?' inside the fragment is not a query string."""
    from rawdata_client_provider_gcs_spark.functions import urls as U

    rows = [
        (1, "https://user:pw@example.com/x"),
        (2, "https://x.com/page#sec?tab=1"),
        (3, "https://a@b.co.uk/p?q=1#frag?x=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in U.with_url_columns(df, "url").collect()}
    assert got[1].url_host == "example.com"
    assert got[1].url_domain == "example.com"
    assert got[2].url_n_params == 0  # fragment-only '?'
    assert got[3].url_host == "b.co.uk" and got[3].url_n_params == 1


def test_warc_null_payload_is_per_row(spark):
    """Review finding (r8): a null payload row must emit an error row,
    not kill the task with TypeError."""
    from rawdata_client_provider_gcs_spark.sources import warc as W

    recs = [{"warc_type": "response", "target_uri": "u",
             "http_status": 200, "body": b"ok"}]
    df = spark.createDataFrame(
        [(1, bytearray(W.build_warc(recs))), (2, None)],
        "doc_id long, payload binary",
    )
    rows = W.warc_records(df).collect()
    by = {r.doc_id: r for r in rows}
    assert by[1].error is None and by[2].error is not None
    assert "null" in by[2].error


def test_jpeg_hostile_header_guards():
    """Review findings (r8): hostile SOF/DHT/DRI shapes must raise
    ValueError, never StopIteration/IndexError/struct.error."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawjpeg as J

    base = bytearray(J.encode_jpeg(np.zeros((8, 8, 3), np.uint8)))

    def seg_positions(marker):
        out, pos = [], 2
        while pos + 4 <= len(base):
            m = base[pos + 1]
            ln = int.from_bytes(base[pos + 2 : pos + 4], "big")
            if m == marker:
                out.append((pos, ln))
            if m == 0xDA:
                break
            pos += 2 + ln
        return out

    # truncated SOF body: shrink the declared length to 5
    (sof_pos, _), = seg_positions(0xC0)
    b = bytearray(base)
    b[sof_pos + 2 : sof_pos + 4] = (2 + 5).to_bytes(2, "big")
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(b))
    # component count 2
    b = bytearray(base)
    b[sof_pos + 4 + 5] = 2  # ncomp byte
    with pytest.raises(ValueError, match="component count"):
        J.decode_jpeg(bytes(b))
    # oversubscribed DHT: set bits[0] = 3
    (dht_pos, _), = seg_positions(0xC4)
    b = bytearray(base)
    b[dht_pos + 4 + 1] = 3
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(b))
    # DRI promising restarts the stream does not contain
    dri = b"\xff\xdd\x00\x04\x00\x01"
    b = bytes(base[:sof_pos]) + dri + bytes(base[sof_pos:])
    try:
        J.decode_jpeg(b)
    except ValueError:
        pass  # admissible; StopIteration/RuntimeError are not


def test_corpus_dedup_segments_rejects_empty_sep(spark):
    from rawdata_client_provider_gcs_spark.functions import text as T

    df = spark.createDataFrame([(1, "a. b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        T.corpus_dedup_segments(df, sep="")


def test_html_tables_structured_extraction(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = (
        "<html><body>"
        "<table><tr><th>Name</th><th>Qty &amp; unit</th></tr>"
        "<tr><td><b>iron</b></td><td> 5 kg </td></tr></table>"
        "<p>no table here</p>"
        "<TABLE class=x><TR><TD>a</TD><TD>b</TD><TD>c</TD></TR></TABLE>"
        "</body></html>"
    )
    df = spark.createDataFrame(
        [(1, page), (2, "<p>none</p>")], "doc_id long, page string"
    )
    out = H.html_tables(df, "page").toPandas()
    assert sorted(out["doc_id"].unique()) == [1]  # table-less docs emit nothing
    rows = {
        (r.table_idx, r.row_idx): (r.n_cells, list(r.cells))
        for r in out.itertuples()
    }
    assert rows[(0, 0)] == (2, ["Name", "Qty & unit"])
    assert rows[(0, 1)] == (2, ["iron", "5 kg"])  # nested tag stripped, trimmed
    assert rows[(1, 0)] == (3, ["a", "b", "c"])  # shouted legacy markup


def test_html_tables_plan_is_codegen_only(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    df = spark.createDataFrame([(1, "<table></table>")], "doc_id long, page string")
    plan = H.html_tables(df, "page")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_html_hostile_unclosed_openers_linear(spark):
    """A page of unclosed <script>/<table> openers must cost linear
    time (the lazy-regex form was quadratic: ~22s at 828KB). 3.3MB in
    a handful of seconds is the regression bar."""
    import time

    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.functions import html as H

    page = ("<script>" + "x" * 200) * 16000  # 3.3 MB, no closers
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    t0 = time.perf_counter()
    df.select(F.length(H.html_visible_text(F.col("page")))).collect()
    assert time.perf_counter() - t0 < 30
    page_t = ("<table>" + "x" * 200) * 16000
    df2 = spark.createDataFrame([(1, page_t)], "doc_id long, page string")
    t0 = time.perf_counter()
    assert H.html_tables(df2, "page").count() == 0
    assert time.perf_counter() - t0 < 30


def test_html_hostile_unterminated_opener_flood_linear(spark):
    """Openers WITHOUT their closing '>' ('<script ' floods) hit the
    opener-side scan, not the tail path the first regression test
    covers; both must stay linear."""
    import time

    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.functions import html as H

    page = "<script " * 200000 + "</script>" + "visible tail"
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    t0 = time.perf_counter()
    out = df.select(H.html_visible_text(F.col("page")).alias("v")).collect()
    assert time.perf_counter() - t0 < 30
    assert out[0]["v"] == "visible tail"
    page_t = "<table " * 200000 + "</table>"
    df2 = spark.createDataFrame([(1, page_t)], "doc_id long, page string")
    t0 = time.perf_counter()
    assert H.html_tables(df2, "page").count() == 0  # opener never completes
    assert time.perf_counter() - t0 < 30


def test_bmp_negative_height_rle_rejected():
    from tests.test_ico import _bmp

    import numpy as np
    import pytest as _pytest

    from rawdata_client_provider_gcs_spark.operators import rawavi, rawimage

    pal = np.array([[1, 2, 3]], np.uint8)
    idx = np.zeros((4, 4), np.uint8)
    rle = rawavi._rle8_encode(idx)
    payload = _bmp(4, -4, 8, 1, pal, rle, n_colors=1)
    with _pytest.raises(ValueError, match="negative height"):
        rawimage.decode_image(payload)


def test_http_content_encoding_decodes():
    """r13: Content-Encoding gzip/deflate/br bodies come back DECODED
    (the in-repo RFC 7932 decoder for br); unknown codings and
    corrupt bodies land on ValueError."""
    import gzip as _gz
    import zlib as _zl

    from rawdata_client_provider_gcs_spark.sources import warc as W
    from rawdata_client_provider_gcs_spark.sources.brotli_codec import (
        brotli_store,
    )

    body = b"<html><body>compressed page body</body></html>"

    def resp(enc_hdr: str, enc_body: bytes) -> bytes:
        return (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"{enc_hdr}\r\n").encode() + enc_body

    for hdr, blob in (
        ("Content-Encoding: gzip\r\n", _gz.compress(body)),
        ("Content-Encoding: br\r\n", brotli_store(body)),
        ("Content-Encoding: deflate\r\n", _zl.compress(body)),
        ("Content-Encoding: deflate\r\n",
         _zl.compress(body)[2:-4]),  # raw-deflate server form
        ("", body),
    ):
        status, ctype, got = W.split_http_response(resp(hdr, blob))
        assert (status, got) == (200, body), hdr
    with pytest.raises(ValueError, match="content-encoding"):
        W.split_http_response(resp("Content-Encoding: zstdish\r\n", body))
    with pytest.raises(ValueError, match="corrupt gzip"):
        W.split_http_response(
            resp("Content-Encoding: gzip\r\n", b"\x1f\x8b\xff\xff")
        )
    # build_warc's encoding kwarg roundtrips through warc parse
    blob = W.build_warc([{
        "warc_type": "response", "target_uri": "https://x/",
        "http_status": 200, "body": body, "encoding": "br",
    }])
    rec = W.parse_warc(blob)[0]
    status, _, got = W.split_http_response(rec["payload"])
    assert got == body


def test_http_chunked_transfer_encoding():
    """r13: chunked framing removed (extensions and trailers dropped,
    truncation keeps the assembled prefix), stacking with
    Content-Encoding."""
    import gzip as _gz

    from rawdata_client_provider_gcs_spark.sources import warc as W

    body = b"hello chunked world, this is the payload"
    chunks = b"".join(
        f"{len(c):x};ext=1\r\n".encode() + c + b"\r\n"
        for c in (body[:10], body[10:25], body[25:])
    ) + b"0\r\nTrailer: x\r\n\r\n"
    resp = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n") + chunks
    assert W.split_http_response(resp)[2] == body
    gz = _gz.compress(body)
    resp = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            + f"{len(gz):x}\r\n".encode() + gz + b"\r\n0\r\n\r\n")
    assert W.split_http_response(resp)[2] == body
    # truncated mid-chunk: keep the assembled prefix (crawl reality)
    resp = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"28\r\n" + body[:20])
    assert W.split_http_response(resp)[2] == body[:20]
    # malformed size line stays a per-row ValueError
    with pytest.raises(ValueError, match="non-hex"):
        W.split_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx"
        )


# ---------------------------------------------------------------------------
# Adobe 4-component CMYK/YCCK JPEG (r15)
# ---------------------------------------------------------------------------


def test_jpeg_cmyk_ycck_constant_exact():
    """Equal-ink gray CMYK round-trips bit-exactly at quality 50
    through both APP14 transforms (stored channels even → exact DC)."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawjpeg as J

    for transform in (2, 0):
        for k in (0, 6, 116, 200, 254):
            ink = np.empty((16, 24, 4), np.uint8)
            ink[..., :3] = 255 - k
            ink[..., 3] = 1  # stored K = 254
            blob = J.encode_jpeg_cmyk(ink, quality=50,
                                      transform=transform)
            rgb = J.decode_jpeg(blob)
            assert rgb.shape == (16, 24, 3)
            assert (rgb == round(k * 254 / 255)).all(), (transform, k)


def test_jpeg_cmyk_lossy_psnr():
    """Random ink at quality 95 stays close to the reference
    inverted-multiply conversion (both transforms)."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawjpeg as J

    rs = np.random.RandomState(5)
    ink = rs.randint(0, 256, (24, 32, 4)).astype(np.uint8)
    sc = 255.0 - ink[..., :3]
    sk = 255.0 - ink[..., 3:4].astype(float)
    expect = np.clip(np.rint(sc * sk / 255.0), 0, 255)
    for transform in (2, 0):
        rgb = J.decode_jpeg(J.encode_jpeg_cmyk(ink, quality=95,
                                               transform=transform))
        mse = float(((rgb.astype(float) - expect) ** 2).mean())
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 30, (transform, psnr)


def test_jpeg_app14_malformed_is_loud():
    import numpy as np
    import pytest

    from rawdata_client_provider_gcs_spark.operators import rawjpeg as J

    ink = np.full((8, 8, 4), 100, np.uint8)
    blob = J.encode_jpeg_cmyk(ink)
    i = blob.find(b"Adobe")
    # unknown transform byte
    bad = blob[: i + 11] + b"\x07" + blob[i + 12 :]
    with pytest.raises(ValueError, match="transform 7"):
        J.decode_jpeg(bad)
    # 4 components with no APP14 at all: ambiguous, loud
    stripped = blob[: i - 4] + blob[i + 12 :]
    with pytest.raises(ValueError, match="without an Adobe"):
        J.decode_jpeg(stripped)
    # transform 1 (YCbCr) is a 3-component transform
    bad = blob[: i + 11] + b"\x01" + blob[i + 12 :]
    with pytest.raises(ValueError, match="transform 1"):
        J.decode_jpeg(bad)
    # truncated Adobe segment body
    trunc = bytearray(blob)
    trunc[i - 2 : i] = (8).to_bytes(2, "big")  # lies: segment len 8
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(trunc))
    # encoder input validation
    with pytest.raises(ValueError, match="CMYK"):
        J.encode_jpeg_cmyk(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="0 or 2"):
        J.encode_jpeg_cmyk(ink, transform=1)


def test_jpeg_adobe_rgb_transform0_three_components():
    """APP14 transform 0 on a 3-component stream means plain RGB
    planes (no YCbCr undo)."""
    import struct as _s

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawjpeg as J

    img = np.full((8, 8, 3), 120, np.uint8)
    blob = J.encode_jpeg(img, quality=50)
    # graft an Adobe transform-0 marker right after SOI: the planes
    # were YCbCr-encoded, so an RGB read must NOT match the YCbCr read
    app14 = _s.pack(">HH", 0xFFEE, 14) + b"Adobe" \
        + _s.pack(">HHHB", 0x64, 0, 0, 0)
    grafted = blob[:2] + app14 + blob[2:]
    as_rgb = J.decode_jpeg(grafted)
    as_ycc = J.decode_jpeg(blob)
    assert (as_ycc == 120).all()
    # constant gray: Y=120, Cb=Cr=128 -> RGB read gives (120,128,128)
    assert (as_rgb[..., 0] == 120).all()
    assert (as_rgb[..., 1] == 128).all()
    assert (as_rgb[..., 2] == 128).all()
