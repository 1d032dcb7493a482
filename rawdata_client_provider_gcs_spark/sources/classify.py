"""Universal payload classification — the first step of a mixed
100 TB crawl ingest.

``classify_payload`` unions every container/codec sniffer the engine
already owns into one magic-first dispatch: transparent compression
wrappers are recognized (and ONE layer peeled, bounded, to classify
what they carry), then archives, legacy/zip office families, crawl
envelopes, media containers, and finally text-shape heuristics.
Container magic always outranks extension-style guessing; ambiguity
rules (ustar-vs-cpio-vs-iso, BZh text, TS sync stride) are inherited
from the per-format sniffers that already encode them.

Output contract: ``{"format", "category", "wrapper"}`` — ``format``
a stable slug (``zip``, ``docx``, ``ogg-vorbis``, ``utf8-text`` …),
``category`` one of ``archive / document / mail / web / image /
audio / video / data / text / unknown``, ``wrapper`` the transparent
compression layer when one was peeled (``gzip``/``xz``/…, else
None).  The function NEVER raises on hostile bytes — unclassifiable
input is ``("binary", "unknown")``, a wrapper whose payload can't
inflate is ``("corrupt", "unknown")``, and the residual VALID-wrapper
shapes where a guard fires before the decoded prefix completes are
``("oversize", "unknown")``, each with the wrapper recorded — because
classification runs before any per-row error contract exists.  Since
r13 every wrapper codec decodes only a :data:`PEEL_PREFIX_BYTES`
prefix and classifies from the head, so arbitrarily large wrapped
content routes at ~64 KiB of inflation per row.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); a router over mixed
payload types is this repo's derived ingest tier.
"""

from __future__ import annotations

#: one bounded wrapper peel for classification only — far below the
#: archive tier's 1 GiB cap; classify never needs the whole payload
MAX_PEEL_BYTES = 64 * 1024 * 1024

#: how much INNER content the peel actually inflates (r13): every
#: codec — streaming stdlib and pure-Python alike — decodes a prefix
#: and stops, so a wrapped row costs ~64 KiB of work, not up to
#: MAX_PEEL_BYTES.  Classification reads only the head anyway; the
#: trade is that wrapped container formats whose markers live at the
#: END of the file (zip central directory) refine from the prefix
#: only when the content fits in it.
PEEL_PREFIX_BYTES = 64 * 1024

#: our own decompressors' cap-guard message markers — a wrapper that
#: trips these is VALID but larger than the classification budget
_CAP_MARKERS = ("guard (bomb)", "bomb cap", "declared content size")


def _peel_wrapper(data: bytes) -> tuple[str, bytes | None] | None:
    """(wrapper_name, inner_prefix) when data is a recognized
    transparent compression wrapper, else None.  Inflation is bounded;
    a wrapper that cannot inflate returns ``(name, None)`` (the
    'corrupt' verdict) and one whose content exceeds the budget raises
    :class:`_Oversize` — both verdicts, never exceptions, at the
    :func:`classify_payload` surface.  Every codec decodes a bounded
    PREFIX (:data:`PEEL_PREFIX_BYTES`) and stops — gzip/xz/bzip2 via
    stdlib ``max_length`` streaming, zstd/lz4/snappy/compress via the
    pure-Python decoders' ``max_output`` mode (r13) — so arbitrarily
    large wrapped content classifies from its head at ~64 KiB of work
    per row.  The 'oversize' verdict remains for the residual shapes
    where a guard still fires before the prefix completes (e.g. a
    single pathological lz4 block expanding past the peel cap)."""
    from .archive import _is_bzip2
    from .zstd_codec import sniff_zstd

    name = None
    if data[:2] == b"\x1f\x8b":
        name = "gzip"
    elif data[:6] == b"\xfd7zXZ\x00":
        name = "xz"
    elif _is_bzip2(data):
        name = "bzip2"
    elif sniff_zstd(data):
        name = "zstd"
    elif data[:4] == b"\x04\x22\x4d\x18":
        name = "lz4"
    elif data[:10] == b"\xff\x06\x00\x00sNaPpY":
        name = "snappy"
    elif data[:2] == b"\x1f\x9d":
        name = "compress"
    if name is None:
        return None
    try:
        if name == "gzip":
            import gzip
            import io

            with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
                inner = gz.read(PEEL_PREFIX_BYTES)
        elif name == "xz":
            import lzma

            inner = lzma.LZMADecompressor().decompress(
                data, max_length=PEEL_PREFIX_BYTES
            )
        elif name == "bzip2":
            import bz2

            inner = bz2.BZ2Decompressor().decompress(
                data, max_length=PEEL_PREFIX_BYTES
            )
        elif name == "zstd":
            from .zstd_codec import zstd_decompress

            inner = zstd_decompress(
                data, cap=MAX_PEEL_BYTES, max_output=PEEL_PREFIX_BYTES
            )
        elif name == "lz4":
            from .compression import lz4_decompress

            inner = lz4_decompress(
                data, cap=MAX_PEEL_BYTES, max_output=PEEL_PREFIX_BYTES
            )
        elif name == "snappy":
            from .compression import snappy_stream_decompress

            inner = snappy_stream_decompress(
                data, cap=MAX_PEEL_BYTES, max_output=PEEL_PREFIX_BYTES
            )
        else:
            from .compression import z_decompress

            inner = z_decompress(
                data, cap=MAX_PEEL_BYTES, max_output=PEEL_PREFIX_BYTES
            )
    except ValueError as exc:
        if any(m in str(exc) for m in _CAP_MARKERS):
            raise _Oversize(name)
        return name, None
    except Exception:  # noqa: BLE001 — corrupt wrapper is a VERDICT here
        return name, None
    return name, inner


class _Oversize(Exception):
    """Internal verdict: valid wrapper, content past the peel budget."""

    def __init__(self, wrapper: str):
        self.wrapper = wrapper


def _classify_zip(data: bytes) -> str:
    """zip subtype by member names (office/ebook families ride zip) —
    the names-only central-directory walk in :mod:`.archive` (shared
    EOCD + Zip64 resolution, no member inflation)."""
    from .archive import zip_member_names

    try:
        names = zip_member_names(data)
    except (ValueError, IndexError):
        return "zip"
    if "word/document.xml" in names:
        return "docx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "META-INF/container.xml" in names and "mimetype" in names:
        return "epub"
    if "content.xml" in names and "mimetype" in names:
        # ODF stores the mimetype member uncompressed first (ODF 1.3
        # part 3 §2.2.4), so the subtype is readable in the head bytes
        # without inflating anything
        head = bytes(data[:128])
        if b"opendocument.spreadsheet" in head:
            return "ods"
        if b"opendocument.presentation" in head:
            return "odp"
        return "odt"
    return "zip"


_OGG_CODECS = (
    (b"\x01vorbis", "ogg-vorbis"), (b"OpusHead", "ogg-opus"),
    (b"Speex   ", "ogg-speex"), (b"\x80theora", "ogg-theora"),
    (b"\x7fFLAC", "ogg-flac"),
)

_CATEGORY = {
    "zip": "archive", "tar": "archive", "cpio": "archive",
    "7z": "archive", "iso": "archive",
    "rar4": "archive", "rar5": "archive",
    "docx": "document", "pptx": "document", "xlsx": "document",
    "epub": "document", "odt": "document", "ods": "document",
    "odp": "document", "doc": "document",
    "xls": "document", "ppt": "document", "cfb": "document",
    "rtf": "document", "pdf": "document", "mobi": "document",
    "fb2": "document", "djvu": "document",
    "warc": "web", "html": "web",
    "mbox": "mail", "eml": "mail",
    "ppm": "image", "pgm": "image", "bmp": "image", "png": "image",
    "jpeg": "image", "gif": "image", "tiff": "image", "ico": "image",
    "webp": "image", "heif": "image", "svg": "image",
    "wav": "audio", "aiff": "audio", "au": "audio", "flac": "audio",
    "mp3": "audio", "aac": "audio", "ogg-vorbis": "audio",
    "ogg-opus": "audio", "ogg-speex": "audio", "ogg-flac": "audio",
    "ogg": "audio",
    "ogg-theora": "video", "mp4": "video", "webm": "video",
    "avi": "video", "mpeg-ts": "video",
    "ttf": "font", "otf": "font", "woff": "font", "woff2": "font",
    "ttc": "font",
    "jxl": "image",
    "jbig2": "image", "jp2": "image",
    "avro": "data", "parquet": "data", "xml": "data", "json": "data",
    "csv": "data", "tsv": "data",
    "utf8-text": "text",
    "binary": "unknown", "corrupt": "unknown", "empty": "unknown",
    "oversize": "unknown",
}


def classify_payload(data: bytes) -> dict:
    """Magic-first classification of one payload — see module doc."""
    wrapper = None
    try:
        peeled = _peel_wrapper(data)
    except _Oversize as big:
        return {"format": "oversize", "category": "unknown",
                "wrapper": big.wrapper}
    if peeled is not None:
        wrapper, inner = peeled
        if inner is None:
            return {"format": "corrupt", "category": "unknown",
                    "wrapper": wrapper}
        data = inner
    fmt = _classify_bytes(data)
    return {"format": fmt, "category": _CATEGORY.get(fmt, "unknown"),
            "wrapper": wrapper}


def _classify_bytes(data: bytes) -> str:
    if not data:
        return "empty"
    # crawl envelopes + single-format documents with strong magic
    if data[:5] == b"WARC/":
        return "warc"
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:8] == b"AT&TFORM":
        return "djvu"
    from .cfb import classify_cfb, parse_cfb, sniff_cfb
    from .mobi import sniff_mobi
    from .rtf import sniff_rtf

    if sniff_mobi(data):
        return "mobi"
    if sniff_rtf(data):
        return "rtf"
    if sniff_cfb(data):
        try:
            return classify_cfb(parse_cfb(data)["entries"])
        except ValueError:
            return "cfb"
    # archives (ustar-vs-cpio-vs-iso precedence lives in sniff_format)
    from .archive import sniff_format as sniff_archive

    arch = sniff_archive(data)
    if arch == "zip":
        return _classify_zip(data)
    if arch is not None:
        return arch
    # columnar / row formats
    if data[:4] == b"Obj\x01":
        return "avro"
    if data[:4] == b"PAR1":
        return "parquet"
    # JPEG XL: bare codestream or ISO-BMFF container signature
    if data[:2] == b"\xff\x0a" or data[:12] == \
            b"\x00\x00\x00\x0cJXL \x0d\x0a\x87\x0a":
        return "jxl"
    # standalone JBIG2 file organization (decoded by rawjbig2, r15)
    if data[:8] == b"\x97JB2\r\n\x1a\n":
        return "jbig2"
    # media containers (magic-dispatched, no decode)
    from ..operators import (  # noqa: PLC0415
        rawaac,
        rawaudio,
        rawheif,
        rawimage,
        rawmp3,
        rawmp4,
        rawogg,
        rawts,
        rawwebm,
    )
    from ..operators.rawavi import sniff_avi

    img = rawimage.sniff_format(data)
    if img is not None:
        return img
    if rawheif.sniff_heif(data):
        return "heif"
    if rawogg.sniff_ogg(data):
        head = data[:4096]
        for magic, slug in _OGG_CODECS:
            if magic in head:
                return slug
        return "ogg"
    if rawaudio.sniff_audio(data):
        if rawaudio.sniff_wav(data):
            return "wav"
        return "aiff" if rawaudio.sniff_aiff(data) else "au"
    from ..operators.rawflac import sniff_flac

    if sniff_flac(data):
        return "flac"
    if rawwebm.sniff_webm(data):
        return "webm"
    if rawmp4.sniff_mp4(data):
        return "mp4"
    if sniff_avi(data):
        return "avi"
    if rawts.sniff_ts(data):
        return "mpeg-ts"
    if rawmp3.sniff_mp3(data):
        return "mp3"
    if rawaac.sniff_aac(data):
        return "aac"
    # fonts: sfnt/WOFF/TTC with a shallow header sanity probe
    from ..operators.rawfont import probe_font

    font = probe_font(data)
    if font is not None:
        return font
    # mail: mbox From_ separator; bare RFC 822 header block
    if data[:5] == b"From ":
        return "mbox"
    head = data[:2048]
    if any(head.startswith(h) for h in
           (b"Return-Path:", b"Received:", b"Message-ID:")):
        return "eml"
    # text shapes.  The 2048-byte slice can land mid-codepoint on a
    # multibyte UTF-8 sequence when the payload is longer than the head;
    # that cut is an artifact of sampling, not invalid bytes, so trim an
    # incomplete trailing sequence (≤3 bytes) before declaring binary.
    text = _decode_utf8_head(head, truncated=len(data) > len(head))
    if text is None:
        return "binary"
    low = text.lstrip().lower()
    if low.startswith(("<!doctype html", "<html")):
        return "html"
    if low.startswith("<?xml") or low.startswith("<svg"):
        if "<svg" in low[:256]:
            return "svg"
        if "<fictionbook" in low[:256]:
            return "fb2"
        return "xml"
    if low[:1] in ("{", "["):
        return "json"
    printable = sum(c.isprintable() or c in "\n\r\t" for c in text)
    if text and printable / len(text) > 0.95:
        return _classify_tabular(text)
    return "binary"


def _decode_utf8_head(head: bytes, truncated: bool):
    """Decode a sampled prefix as UTF-8, tolerating a multibyte
    character split by the sampling cut.

    When ``truncated`` (the payload continues past the head), an
    incomplete trailing multibyte sequence is an artifact of the cut,
    not bad data: the incremental decoder with ``final=False`` buffers
    it silently while still raising on genuinely invalid bytes.  When
    the head IS the whole payload, strict semantics apply.  Returns the
    decoded text, or None for invalid UTF-8."""
    import codecs

    dec = codecs.getincrementaldecoder("utf-8")()
    try:
        return dec.decode(head, not truncated)
    except UnicodeDecodeError:
        return None


def _classify_tabular(text: str) -> str:
    """csv/tsv when ≥3 sampled lines agree on ≥2 delimiter-separated
    fields; plain text otherwise.  A heuristic on the decoded head —
    the router only needs enough signal to pick a downstream reader."""
    lines = [ln for ln in text.splitlines() if ln.strip()][:10]
    if len(lines) >= 3:
        for sep, slug in (("\t", "tsv"), (",", "csv")):
            counts = [ln.count(sep) for ln in lines]
            if min(counts) >= 1 and len(set(counts)) == 1:
                return slug
    return "utf8-text"


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


def classify_payloads(df, payload_col: str = "payload",
                      id_col: str = "doc_id"):
    """Arrow-batched classification over (id, payload) rows →
    ``(id, format, category, wrapper, n_bytes)`` — the router stage a
    mixed ingest runs before fanning payloads to per-format sources.
    One Python task per partition, no shuffle; classify_payload never
    raises, so there is no error column to carry."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "format": [], "category": [],
                    "wrapper": [], "n_bytes": []}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                blob = bytes(payload) if payload is not None else b""
                got = classify_payload(blob)
                rows["doc_id"].append(int(did))
                rows["format"].append(got["format"])
                rows["category"].append(got["category"])
                rows["wrapper"].append(got["wrapper"])
                rows["n_bytes"].append(len(blob))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run,
        "doc_id long, format string, category string, wrapper string, "
        "n_bytes long",
    )
