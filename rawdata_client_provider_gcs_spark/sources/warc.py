"""WARC (Web ARChive, ISO 28500) source for crawl-scale ingestion.

Web crawls ship as WARC files — the container Common Crawl and every
Heritrix-style crawler writes: a sequence of records, each a header
block (``WARC/1.x`` version line + ``Name: value`` headers, CRLF
delimited) followed by ``Content-Length`` payload bytes and a blank
separator.  ``response`` records carry a full HTTP response (status
line + headers + body) as their payload.  Files are commonly stored
with **per-record gzip members** concatenated into one ``.warc.gz`` —
stdlib ``zlib`` decodes the member chain.  The newer ``.warc.zst``
convention (per-record zstd frames, shared dictionary in a leading
``0x184D2A5D`` skippable frame, possibly self-compressed) decodes
through :mod:`.zstd_codec` the same way.

Distribution shape (100 TB): the unit of parallelism is the FILE —
a crawl is millions of ~1 GB WARCs, so ``warc_records`` fans one
Arrow-batched ``mapInPandas`` task per payload row and each task
streams its file's records; no record-level shuffle exists until the
caller aggregates.  This matches how warcio-based Hadoop/Spark crawl
jobs are structured, re-expressed on the DataFrame API.  Downstream,
``functions/html.py`` turns response bodies into text — together they
are the crawl front door of the curation tier.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); container
parsing belongs to this repo's derived ingestion tier, like the
AVI/TIFF codecs.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

WARC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("record_idx", LongType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_date", StringType()),
        StructField("target_uri", StringType()),
        StructField("http_status", LongType()),
        StructField("http_content_type", StringType()),
        StructField("body", BinaryType()),
        StructField("error", StringType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decode a chain of concatenated gzip members (the .warc.gz
    layout: one member per record) into one plain byte stream."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out += d.decompress(data[pos:])
        out += d.flush()
        rest = d.unused_data
        if not rest:
            break
        pos = n - len(rest)
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("garbage between gzip members in WARC stream")
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into record dicts.

    Hostile input raises ``ValueError`` (the per-row capture class);
    gzip member chains are transparently decoded.
    """
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except zlib.error as exc:
            raise ValueError(f"corrupt WARC gzip stream: {exc}")
    else:
        from .zstd_codec import sniff_zstd, zstd_decompress  # noqa: PLC0415

        if sniff_zstd(data):
            # .warc.zst (IIPC convention): one zstd frame per record,
            # concatenated, optionally led by a 0x184D2A5D skippable
            # frame carrying the shared dictionary — zstd_decompress
            # handles all of it, including a self-compressed dict
            data = zstd_decompress(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record blank lines
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at offset {pos}")
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        head = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            raise ValueError("WARC record missing a numeric Content-Length")
        if length < 0:
            # a negative length would walk the cursor BACKWARDS and
            # loop forever on hostile input
            raise ValueError("negative WARC Content-Length")
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("WARC payload extends past end of file")
        payload = data[body_start : body_start + length]
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "warc_date": headers.get("warc-date", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "payload": payload,
            }
        )
        pos = body_start + length
    return records


#: decoded-body bound for one HTTP response (bomb guard)
MAX_HTTP_BODY_BYTES = 256 * 1024 * 1024


def _dechunk(body: bytes) -> bytes:
    """Remove RFC 9112 chunked framing: hex-size lines (chunk
    extensions after ';' ignored), CRLF-terminated chunks, the zero
    chunk, trailers dropped.  Truncated mid-stream framing keeps the
    bytes already assembled (crawls truncate responses routinely);
    malformed size lines raise ValueError."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break  # truncated before the next size line
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        if not size_tok:
            raise ValueError("chunked body: empty chunk-size line")
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"chunked body: non-hex chunk size {size_tok[:16]!r}"
            )
        if size > MAX_HTTP_BODY_BYTES:
            raise ValueError("chunked body: chunk over the decode cap")
        pos = eol + 2
        if size == 0:
            break  # trailers (if any) are dropped
        out += body[pos : pos + size]
        if pos + size > n:
            break  # truncated inside the chunk
        pos += size + 2  # chunk data + its CRLF
        if len(out) > MAX_HTTP_BODY_BYTES:
            raise ValueError("chunked body past the decode cap (bomb)")
    return bytes(out)



def split_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, body) from an HTTP response payload.

    ``Transfer-Encoding: chunked`` framing is removed and
    ``Content-Encoding`` honored (r13): gzip / deflate (both the
    zlib-wrapped and raw forms servers emit) / br (the in-repo
    RFC 7932 Brotli decoder) bodies come back DECODED and bounded —
    real Common Crawl responses carry all of these.  An unknown
    coding raises ValueError (per-row capture)."""
    sep = payload.find(_SEP)
    if sep < 0:
        raise ValueError("HTTP response payload without header terminator")
    head = payload[:sep].decode("utf-8", "replace").split("\r\n")
    status_line = head[0].split(" ", 2)
    if len(status_line) < 2 or not status_line[1].isdigit():
        raise ValueError(f"malformed HTTP status line: {head[0]!r}")
    status = int(status_line[1])
    ctype = ""
    cenc = ""
    chunked = False
    for line in head[1:]:
        k, _, v = line.partition(":")
        key = k.strip().lower()
        if key == "content-type" and not ctype:
            ctype = v.strip()
        elif key == "content-encoding":
            cenc = v.strip().lower()
        elif key == "transfer-encoding":
            chunked = "chunked" in v.strip().lower()
    body = payload[sep + 4 :]
    if chunked:
        body = _dechunk(body)
    if cenc in ("", "identity"):
        return status, ctype, body
    if cenc in ("gzip", "x-gzip"):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(body, MAX_HTTP_BODY_BYTES + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip response body: {exc}")
    elif cenc == "deflate":
        # servers ship both the zlib-wrapped and raw-deflate forms
        try:
            d = zlib.decompressobj(wbits=15)
            out = d.decompress(body, MAX_HTTP_BODY_BYTES + 1)
        except zlib.error:
            d = zlib.decompressobj(wbits=-15)
            try:
                out = d.decompress(body, MAX_HTTP_BODY_BYTES + 1)
            except zlib.error as exc:
                raise ValueError(f"corrupt deflate response body: {exc}")
    elif cenc == "br":
        from .brotli_codec import brotli_decompress

        out = brotli_decompress(body, cap=MAX_HTTP_BODY_BYTES)
    else:
        raise ValueError(f"unsupported content-encoding {cenc!r}")
    if len(out) > MAX_HTTP_BODY_BYTES:
        raise ValueError("response body past the decode cap (bomb)")
    return status, ctype, out


def warc_records(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Explode WARC file payloads into one row per record.

    One Arrow batch task per file row; a corrupt FILE yields a single
    row carrying the error (per-row capture — hostile crawl bytes must
    never kill the job), while clean files emit their records with the
    HTTP envelope split off ``response`` payloads.
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "record_idx", "warc_type", "record_id",
                "warc_date", "target_uri", "http_status",
                "http_content_type", "body", "error",
            )}

            def emit(did, idx=None, rec=None, err=None):
                status, ctype, body = None, None, None
                if rec is not None and rec["warc_type"] == "response":
                    try:
                        status, ctype, body = split_http_response(
                            rec["payload"]
                        )
                    except ValueError as exc:
                        err = f"{type(exc).__name__}: {exc}"
                elif rec is not None:
                    body = rec["payload"]
                out["doc_id"].append(did)
                out["record_idx"].append(idx)
                out["warc_type"].append(rec["warc_type"] if rec else None)
                out["record_id"].append(rec["record_id"] if rec else None)
                out["warc_date"].append(rec["warc_date"] if rec else None)
                out["target_uri"].append(rec["target_uri"] if rec else None)
                out["http_status"].append(status)
                out["http_content_type"].append(ctype)
                out["body"].append(body)
                out["error"].append(err)

            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    # a null payload (failed upstream fetch) is a data
                    # condition, not a task-killing TypeError
                    emit(did, err="ValueError: null WARC payload")
                    continue
                try:
                    recs = parse_warc(bytes(payload))
                except ValueError as exc:
                    emit(did, err=f"ValueError: {exc}")
                    continue
                for i, rec in enumerate(recs):
                    emit(did, i, rec)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, WARC_SCHEMA)


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Fixture-grade WARC writer (the mirror of :func:`parse_warc`).

    Each record dict: ``warc_type``, ``target_uri``, ``record_id``,
    ``warc_date``, and either raw ``payload`` bytes or HTTP parts
    (``http_status``, ``http_content_type``, ``body``).
    """
    out = bytearray()
    for rec in records:
        if "payload" in rec:
            payload = rec["payload"]
        else:
            body = rec.get("body", b"")
            enc_hdr = ""
            enc = rec.get("encoding")
            if enc == "gzip":
                import gzip as _gz

                body = _gz.compress(body)
                enc_hdr = "Content-Encoding: gzip\r\n"
            elif enc == "br":
                from .brotli_codec import brotli_store

                body = brotli_store(body)
                enc_hdr = "Content-Encoding: br\r\n"
            if rec.get("chunked"):
                # RFC 9112 framing in two chunks + a trailer, the
                # shape real servers emit
                mid = len(body) // 2
                body = b"".join(
                    f"{len(c):x}\r\n".encode() + c + b"\r\n"
                    for c in (body[:mid], body[mid:]) if c
                ) + b"0\r\n\r\n"
                enc_hdr += "Transfer-Encoding: chunked\r\n"
            payload = (
                f"HTTP/1.1 {rec.get('http_status', 200)} OK\r\n"
                f"Content-Type: {rec.get('http_content_type', 'text/html')}"
                f"\r\n{enc_hdr}\r\n"
            ).encode() + body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec.get('warc_type', 'response')}\r\n"
            f"WARC-Record-ID: {rec.get('record_id', '<urn:uuid:0>')}\r\n"
            f"WARC-Date: {rec.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {rec.get('target_uri', '')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode()
        member = head + payload + _SEP
        if gzip_members:
            import gzip as _gz

            member = _gz.compress(member)
        out += member
    return bytes(out)
