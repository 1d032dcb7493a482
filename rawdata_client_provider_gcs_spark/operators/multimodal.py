"""Multimodal column handling: opaque binary payloads + typed metadata.

The reference's payload model — ``data: map<string, bytes>`` of named
opaque byte arrays (AvroRawdataProducer.java:42-49) — is exactly the right
host for multimodal data: bytes travel as ``BinaryType`` columns, typed
facts ride in a sidecar struct.  Heavy decode/feature steps run as
Arrow-batched ``mapInPandas`` so Python touches columnar batches, never
rows.

Decode kernels resolve in this order:

1. ``text/*`` — pure-Python byte histogram, always real.
2. ``image/*`` with **pillow importable** — real decode/resize (the
   optional dependency is probed per executor; nothing is required at
   install time).
3. ``image/*`` in a library-free format (netpbm PPM/PGM, 24-bit BMP,
   8-bit PNG via stdlib zlib, baseline-sequential JPEG via the
   pure-numpy Huffman+IDCT codec, GIF incl. multi-frame animations
   via stdlib LZW, or baseline TIFF incl. LZW/PackBits/Deflate strips
   via ``rawtiff``) — real decode/resize/frame-sample via
   :mod:`rawdata_client_provider_gcs_spark.operators.rawimage` /
   ``.rawjpeg`` / ``.rawgif``, in every environment.
4. ``audio/*`` in a RIFF/WAVE container (PCM 8/16/24/32-bit or IEEE
   float) — real decode/features/segmentation via the pure-numpy codec
   in :mod:`rawdata_client_provider_gcs_spark.operators.rawaudio`, in
   every environment.
5. ``video/*`` in an uncompressed RIFF/AVI container (raw BI_RGB
   frames) — real container parse + frame sampling via ``rawavi``;
   compressed video codecs remain at the loud boundary below.
6. Recognized compressed containers — MPEG audio (``rawmp3``), Ogg
   Vorbis/Opus (``rawogg``), MP4/ISO-BMFF (``rawmp4``), Matroska/WebM
   (``rawwebm``) — carry a METADATA tier (duration, codec, layout,
   tags) but no payload decode: rows land per-row as
   ``UnsupportedCodecError`` (the compressed-AVI discipline), never
   killing the job, and garbage under these mimes reads as per-row
   corruption (``MediaDecodeError``).
7. Otherwise STUBBED: raise ``NotImplementedError`` unless ``fake=True``
   asks for the deterministic fake (byte-histogram features), keeping the
   Spark-side plumbing — schema, batching, partitioning — real and tested
   in containers without media libraries (like this one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import rawaudio, rawimage
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed sidecar for a binary payload column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("error", StringType()),
    ]
)

#: image formats a payload can ACTUALLY be decoded as here (rawimage /
#: rawjpeg / rawgif codecs, or pillow when importable).  A payload
#: claiming one of these mimes that fails to decode is DATA corruption —
#: at crawl scale malformed media is certain, so that failure must land
#: in the per-row ``error`` column, never kill the executor task.  A
#: mime OUTSIDE these sets is a missing-codec configuration problem and
#: still raises ``NotImplementedError`` loud (the documented boundary).
DECODABLE_IMAGE_MIMES = frozenset(
    {
        "image/png",
        "image/jpeg",
        "image/gif",
        "image/bmp",
        "image/x-portable-pixmap",
        "image/x-portable-graymap",
        "image/x-portable-anymap",
        "image/tiff",
        "image/x-icon",
        "image/vnd.microsoft.icon",
        "image/webp",
    }
)
DECODABLE_AUDIO_MIMES = frozenset(
    {
        "audio/wav",
        "audio/x-wav",
        "audio/wave",
        "audio/aiff",
        "audio/x-aiff",
        "audio/basic",  # Sun AU
        "audio/flac",
        "audio/x-flac",
    }
)


#: MPEG audio mimes: recognized container, metadata-only tier (rawmp3);
#: PCM decode is the per-row UnsupportedCodecError boundary
MPEG_AUDIO_MIMES = frozenset({"audio/mpeg", "audio/mp3"})
#: ADTS AAC (rawaac): same discipline
AAC_MIMES = frozenset({"audio/aac", "audio/aacp", "audio/x-aac"})
#: same discipline for Ogg (rawogg) and ISO-BMFF (rawmp4) containers
OGG_AUDIO_MIMES = frozenset(
    {"audio/ogg", "application/ogg", "audio/opus", "audio/vorbis"}
)
MP4_MIMES = frozenset({"video/mp4", "audio/mp4", "video/quicktime"})
WEBM_MIMES = frozenset(
    {"video/webm", "audio/webm", "video/x-matroska", "audio/x-matroska"}
)
#: MPEG transport streams (rawts): recognized container, metadata-only
#: tier — elementary-stream decode is the per-row boundary
TS_MIMES = frozenset({"video/mp2t", "video/mpeg-ts", "audio/mp2t"})
#: HEIF-family still images (rawheif): recognized container,
#: metadata-only tier — AV1/HEVC pixel decode is the per-row
#: UnsupportedCodecError boundary
HEIF_MIMES = frozenset(
    {
        "image/avif",
        "image/avif-sequence",
        "image/heic",
        "image/heic-sequence",
        "image/heif",
        "image/heif-sequence",
    }
)


class MediaDecodeError(ValueError):
    """A payload failed to decode as its declared (supported) mime."""


def _sniff_svg(payload: bytes) -> bool:
    """An SVG document: ``<svg`` within the first KiB of text (after an
    optional XML prologue/BOM) — bounded check, not a parse."""
    return b"<svg" in payload[:1024].lower()


def _catch_row(fn, *args):
    """Run one per-row decode: ``(result, None)`` or ``(None, "Exc: msg")``.

    Three boundaries, strictly ordered:

    - :class:`rawavi.UnsupportedCodecError` — a RECOGNIZED compressed
      codec inside ONE file: ordinary crawl data, captured per-row
      under its own class name (queryable apart from corruption).
    - plain ``NotImplementedError`` — a missing decoder for the
      declared MIME, i.e. configuration (every row of that mime would
      fail): propagates and fails the job loudly.
    - everything else — malformed payloads (truncated, bit-flipped,
      mislabeled): the per-row data-corruption error string.
    """
    from .rawavi import UnsupportedCodecError  # noqa: PLC0415

    try:
        return fn(*args), None
    except UnsupportedCodecError as exc:
        return None, f"UnsupportedCodecError: {str(exc)[:200]}"
    except NotImplementedError:
        raise
    except Exception as exc:  # data-dependent decode failure
        return None, f"{type(exc).__name__}: {str(exc)[:200]}"


def with_media_columns(
    df: DataFrame, content_col: str, mime: str, id_col: str
) -> DataFrame:
    """Attach (payload: binary, meta: struct) for an opaque content column."""
    payload = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def _pil_image():
    """Optional pillow probe — import is per-process (runs on executors)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_bytes(payload: bytes, mime: str, fake: bool):
    """Media decode kernel: real for text always, for images when pillow
    is importable or the format is uncompressed, and for WAV audio;
    deterministic stub (or raise) otherwise.

    Compressed audio/video decode (librosa/av) stays stubbed — those
    libraries are not probed because no deployment path here needs them
    yet.
    """
    if mime.startswith("text/"):
        hist = [0.0] * 8
        for b in payload:
            hist[b >> 5] += 1.0
        total = sum(hist) or 1.0
        return [v / total for v in hist]
    if mime.startswith("image/"):
        from . import rawheif  # noqa: PLC0415

        is_heif = rawheif.sniff_heif(payload)
        if is_heif:
            # HEIF/AVIF: container metadata is exact (rawheif.parse_heif);
            # AV1/HEVC pixel decode is the documented per-row boundary —
            # handled BEFORE the pillow probe so classification does not
            # depend on which plugins the executors' pillow happens to have
            if not fake:
                rawheif.decode_heif_pixels(payload)
        elif mime in HEIF_MIMES:
            raise MediaDecodeError(
                f"payload does not decode as declared mime {mime}"
            )
        # container magic wins over the declared mime (same as AU), so
        # the SVG branch only runs when the bytes are NOT HEIF — an
        # elif chain keeps the error class identical across fake modes
        is_svg = not is_heif and mime == "image/svg+xml"
        if is_svg:
            # SVG metadata/text is the Catalyst tier (functions.svg);
            # RASTERIZATION needs a renderer — per-row boundary
            if not _sniff_svg(payload):
                raise MediaDecodeError(
                    f"payload does not decode as declared mime {mime}"
                )
            if not fake:
                from .rawavi import UnsupportedCodecError  # noqa: PLC0415

                raise UnsupportedCodecError(
                    "SVG rasterization is not implemented; metadata and "
                    "text extract via functions.svg"
                )
        Image = None if (is_heif or is_svg) else _pil_image()
        if Image is not None:
            import io

            with Image.open(io.BytesIO(payload)) as img:
                pixels = img.convert("L").tobytes()
            hist = [0.0] * 8
            for b in pixels:
                hist[b >> 5] += 1.0
            total = sum(hist) or 1.0
            return [v / total for v in hist]
        if rawimage.sniff_format(payload) is not None:
            # real decode without pillow: uncompressed PPM/PGM/BMP
            import numpy as np

            # same luma conversion as pillow's "L" mode (ITU-R 601-2);
            # widen first — uint8 * 299 wraps mod 256 and silently
            # scrambles the histogram (caught by the exact-value oracle
            # of q_multimodal_image_pipeline)
            rgb = rawimage.decode_image(payload).astype(np.uint32)
            gray = (
                rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114
            ) // 1000
            hist = np.bincount(
                (gray.astype(np.uint8) >> 5).ravel(), minlength=8
            ).astype(float)
            total = hist.sum() or 1.0
            return [v / total for v in hist]
        if mime in DECODABLE_IMAGE_MIMES:
            # the mime IS supported here, so unrecognizable bytes are
            # corruption, not a missing codec — raise the catchable kind
            raise MediaDecodeError(
                f"payload does not decode as declared mime {mime}"
            )
    if mime.startswith("audio/") or mime in OGG_AUDIO_MIMES:
        if rawaudio.sniff_audio(payload):
            # real decode without external libs: RIFF/WAVE, AIFF/AIFC,
            # Sun AU — dispatched by container magic
            return rawaudio.audio_features(*rawaudio.decode_audio(payload))
        from . import rawaac, rawmp3, rawogg  # noqa: PLC0415

        if rawmp3.sniff_mp3(payload):
            # recognized MPEG audio: PCM synthesis is the documented
            # boundary (rawmp3) — UnsupportedCodecError captures the
            # row per-row like compressed AVI codecs; frame metadata
            # stays available via rawmp3.parse_mp3.  With fake=True
            # fall through to the deterministic stub (AVI discipline).
            if not fake:
                rawmp3.decode_mp3_pcm(payload)
        elif rawogg.sniff_ogg(payload):
            if not fake:
                # Vorbis decodes for real (operators/vorbisdec); Opus
                # raises UnsupportedCodecError — same per-row boundary
                pcm, rate = rawogg.decode_ogg_pcm(payload)
                return rawaudio.audio_features(pcm, rate)
        elif rawaac.sniff_aac(payload):
            if not fake:
                rawaac.decode_aac_pcm(payload)  # same per-row boundary
        elif (
            mime in DECODABLE_AUDIO_MIMES
            or mime in MPEG_AUDIO_MIMES
            or mime in AAC_MIMES
            or mime in OGG_AUDIO_MIMES
        ):
            raise MediaDecodeError(
                f"payload does not decode as declared mime {mime}"
            )
    if (
        mime.startswith("video/")
        or mime in MP4_MIMES
        or mime in WEBM_MIMES
        or mime in TS_MIMES
    ):
        from . import rawmp4, rawts, rawwebm  # noqa: PLC0415

        if rawmp4.sniff_mp4(payload):
            if not fake:
                rawmp4.decode_mp4_media(payload)  # per-row boundary
        elif rawwebm.sniff_webm(payload):
            if not fake:
                # a complete A_VORBIS track decodes to real PCM;
                # every other Matroska codec raises per-row
                pcm, rate = rawwebm.decode_webm_media(payload)
                return rawaudio.audio_features(pcm, rate)
        elif rawts.sniff_ts(payload):
            if not fake:
                rawts.decode_ts_media(payload)
        elif mime in MP4_MIMES or mime in WEBM_MIMES or mime in TS_MIMES:
            raise MediaDecodeError(
                f"payload does not decode as declared mime {mime}"
            )
    if not fake:
        raise NotImplementedError(
            f"decoder for mime={mime} requires media libraries not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    hist = [0.0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1.0
    total = sum(hist) or 1.0
    return [v / total for v in hist]


def extract_features(
    media: DataFrame, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over (payload, meta) rows.

    ``mapInPandas`` keeps the transfer columnar; each batch is processed in
    one Python call.  Partitioning is whatever the upstream scan produced —
    callers repartition first when payload sizes are skewed.
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            decoded = [
                _catch_row(_decode_bytes, bytes(p), m["mime"], fake)
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            out = {
                "doc_id": pdf[id_col],
                "mime": pdf["meta"].map(lambda m: m["mime"]),
                "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                "features": [feats for feats, _ in decoded],
                "error": [err for _, err in decoded],
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_w", LongType()),
        StructField("thumb_h", LongType()),
        StructField("error", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ms", LongType()),
        StructField("frame", BinaryType()),
        StructField("error", StringType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    fake: bool = False,
    raw_only: bool = False,
) -> DataFrame:
    """Thumbnail generation over binary image payloads (mapInPandas).

    With pillow importable on the executors, ``image/*`` payloads are
    really decoded and resized (PNG thumbnails).  Without it the pixel
    kernel is stubbed: ``fake=True`` emits a deterministic
    ``width×height``-byte pseudo-thumbnail derived from the payload,
    keeping schema, batch shape, and size accounting real.
    ``raw_only=True`` skips the pillow probe so output bytes are the
    pure-numpy PPM encoding in every environment — the deterministic
    choice for oracle-checked queries, whose expected thumbnail size
    must not depend on which libraries the executors happen to have.
    """

    def run(batches):
        import hashlib
        import io

        import pandas as pd

        Image = None if raw_only else _pil_image()

        def one(payload: bytes, mime: str) -> bytes:
            is_heif = is_svg = False
            if mime.startswith("image/"):
                from . import rawheif  # noqa: PLC0415

                is_heif = rawheif.sniff_heif(payload)
                is_svg = not is_heif and mime == "image/svg+xml"
                if is_heif:
                    if not fake:
                        # per-row boundary; with fake=True fall through
                        # to the deterministic stub below (container
                        # magic wins over the declared mime, same as AU)
                        rawheif.decode_heif_pixels(payload)
                elif mime in HEIF_MIMES:
                    raise MediaDecodeError(
                        f"payload does not decode as declared mime {mime}"
                    )
                elif is_svg:
                    if not _sniff_svg(payload):
                        raise MediaDecodeError(
                            f"payload does not decode as declared mime {mime}"
                        )
                    if not fake:
                        from .rawavi import (  # noqa: PLC0415
                            UnsupportedCodecError,
                        )

                        raise UnsupportedCodecError(
                            "SVG rasterization is not implemented; "
                            "metadata and text extract via functions.svg"
                        )
            if (
                Image is not None
                and mime.startswith("image/")
                and not (is_heif or is_svg)
            ):
                with Image.open(io.BytesIO(payload)) as img:
                    thumb = img.resize((width, height))
                    buf = io.BytesIO()
                    thumb.save(buf, format="PNG")
                    return buf.getvalue()
            if mime.startswith("image/") and rawimage.sniff_format(payload):
                # real pixels without pillow: decode + nearest resize + PPM
                return rawimage.encode_ppm(
                    rawimage.resize_nearest(
                        rawimage.decode_image(payload), width, height
                    )
                )
            if mime in DECODABLE_IMAGE_MIMES:
                raise MediaDecodeError(
                    f"payload does not decode as declared mime {mime}"
                )
            if not fake:
                raise NotImplementedError(
                    f"image resize for mime={mime} requires pillow; "
                    "pass fake=True for the deterministic stub"
                )
            seed = hashlib.blake2b(payload, digest_size=32).digest()
            need = width * height
            return (seed * (need // len(seed) + 1))[:need]

        for pdf in batches:
            done = [
                _catch_row(one, bytes(p), m["mime"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "thumb": [t for t, _ in done],
                    "thumb_w": width,
                    "thumb_h": height,
                    "error": [err for _, err in done],
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling over binary media payloads (one row per frame).

    Row-explosion happens Python-side inside ``mapInPandas`` — output
    batches carry ``min(payload_duration/every_ms, max_frames)`` rows per
    input row.  WAV audio payloads are really segmented (each frame is a
    standalone ``every_ms`` WAV clip, pure-numpy codec).  Animated GIFs
    — the library-free multi-frame *visual* format — are really decoded
    (``rawgif``), and so are uncompressed RIFF/AVI **video containers**
    (``rawavi``: raw BI_RGB frames, native container timing): frames are
    sampled on the ``every_ms`` grid from their native start times and
    emitted as PPM bytes with ``frame_idx`` = the original frame number.
    Compressed video codecs stay stubbed: ``fake=True`` treats every
    64 KiB of payload as one second of video and emits deterministic
    frame bytes.
    """

    def run(batches):
        import hashlib

        import pandas as pd

        def fake_frames(payload: bytes):
            duration_ms = max(1, len(payload) * 1000 // 65536)
            out = []
            for i in range(min(duration_ms // every_ms + 1, max_frames)):
                ms = i * every_ms
                out.append(
                    (
                        i,
                        ms,
                        hashlib.blake2b(
                            payload + ms.to_bytes(8, "big"), digest_size=16
                        ).digest(),
                    )
                )
            return out

        def frames(payload: bytes, mime: str):
            if mime.startswith("audio/") and rawaudio.sniff_audio(payload):
                return rawaudio.segment_wav(payload, every_ms, max_frames)
            if mime.startswith("audio/") or mime in OGG_AUDIO_MIMES:
                from . import (  # noqa: PLC0415
                    rawaac,
                    rawmp3,
                    rawmp4,
                    rawogg,
                    rawts,
                    rawwebm,
                )

                if rawmp3.sniff_mp3(payload):
                    if not fake:
                        rawmp3.decode_mp3_pcm(payload)  # per-row boundary
                    return fake_frames(payload)
                if rawogg.sniff_ogg(payload):
                    if not fake:
                        # Vorbis: real PCM → real WAV segments; Opus
                        # raises UnsupportedCodecError per-row
                        pcm, rate = rawogg.decode_ogg_pcm(payload)
                        return rawaudio.segment_samples(
                            pcm, rate, every_ms, max_frames
                        )
                    return fake_frames(payload)
                if rawaac.sniff_aac(payload):
                    if not fake:
                        rawaac.decode_aac_pcm(payload)
                    return fake_frames(payload)
                # audio/mp4 and audio/webm declare the container mimes
                if rawmp4.sniff_mp4(payload):
                    if not fake:
                        rawmp4.decode_mp4_media(payload)
                    return fake_frames(payload)
                if rawwebm.sniff_webm(payload):
                    if not fake:
                        # Vorbis audio track: real PCM → WAV segments
                        pcm, rate = rawwebm.decode_webm_media(payload)
                        return rawaudio.segment_samples(
                            pcm, rate, every_ms, max_frames
                        )
                    return fake_frames(payload)
                if rawts.sniff_ts(payload):
                    # audio/mp2t: audio-only HLS TS segments — same
                    # recognized-container boundary as the video branch
                    if not fake:
                        rawts.decode_ts_media(payload)
                    return fake_frames(payload)
            def grid_sample(frame_pairs):
                # every_ms grid over native frame timings — shared by
                # every multi-frame visual container (GIF, WebP)
                out = []
                t = 0
                next_ms = 0
                for i, (delay, arr) in enumerate(frame_pairs):
                    if len(out) >= max_frames:
                        break
                    if t >= next_ms:
                        out.append((i, t, rawimage.encode_ppm(arr)))
                        next_ms = t + every_ms
                    t += delay
                return out

            if mime.startswith("image/"):
                from . import rawheif  # noqa: PLC0415

                if rawheif.sniff_heif(payload):
                    # HEIF/AVIF (incl. avis/msf1 image sequences):
                    # AV1/HEVC frame decode is the per-row boundary
                    if not fake:
                        rawheif.decode_heif_pixels(payload)
                    return fake_frames(payload)
                if mime == "image/svg+xml" and _sniff_svg(payload):
                    if not fake:
                        from .rawavi import (  # noqa: PLC0415
                            UnsupportedCodecError,
                        )

                        raise UnsupportedCodecError(
                            "SVG rasterization is not implemented; "
                            "metadata and text extract via functions.svg"
                        )
                    return fake_frames(payload)
            if mime.startswith("image/") and payload[:6] in (
                b"GIF87a",
                b"GIF89a",
            ):
                from . import rawgif  # noqa: PLC0415

                return grid_sample(rawgif.decode_gif(payload))
            if mime.startswith("image/") and payload[:4] == b"RIFF":
                from . import rawwebp  # noqa: PLC0415

                if rawwebp.sniff_webp(payload):
                    return grid_sample(rawwebp.decode_webp_frames(payload))
            if mime.startswith("video/"):
                from . import rawavi, rawmp4, rawts, rawwebm  # noqa: PLC0415

                if rawmp4.sniff_mp4(payload):
                    if not fake:
                        rawmp4.decode_mp4_media(payload)  # per-row boundary
                    return fake_frames(payload)
                if rawwebm.sniff_webm(payload):
                    if not fake:
                        # a Vorbis AUDIO track may exist, but this is
                        # the VIDEO frames kernel — the video codec is
                        # the boundary either way, so raise per-row
                        # WITHOUT paying a pointless full PCM decode
                        from .rawavi import (  # noqa: PLC0415
                            UnsupportedCodecError,
                        )

                        raise UnsupportedCodecError(
                            "webm video frame decode is not implemented "
                            "(audio extraction goes through "
                            "decode_webm_vorbis_pcm)"
                        )
                    return fake_frames(payload)
                if rawts.sniff_ts(payload):
                    if not fake:
                        rawts.decode_ts_media(payload)
                    return fake_frames(payload)
                if rawavi.sniff_avi(payload):
                    # REAL video container path: uncompressed RIFF/AVI
                    # (raw BI_RGB frames), frames sampled on the
                    # every_ms grid from the container's native timing.
                    # A recognized-but-compressed codec raises
                    # UnsupportedCodecError (a NotImplementedError
                    # subclass): with fake=True it falls through to the
                    # deterministic stub; otherwise it propagates to
                    # _catch_row, which records it per-row under its
                    # own label (compressed AVIs are ordinary crawl
                    # data — one file must never kill the job).
                    try:
                        return [
                            (i, ms, rawimage.encode_ppm(arr))
                            for i, ms, arr in rawavi.sample_avi_frames(
                                payload, every_ms, max_frames
                            )
                        ]
                    except NotImplementedError:
                        if not fake:
                            raise
                        return fake_frames(payload)
            if (
                mime in DECODABLE_AUDIO_MIMES
                or mime in MPEG_AUDIO_MIMES
                or mime in AAC_MIMES
                or mime in OGG_AUDIO_MIMES
                or mime in MP4_MIMES
                or mime in WEBM_MIMES
                or mime in TS_MIMES
                or mime in HEIF_MIMES
                or mime in (
                    "image/gif",
                    "image/webp",
                    "image/svg+xml",
                    "video/avi",
                    "video/x-msvideo",
                )
            ):
                # supported container, unrecognizable bytes: corruption
                raise MediaDecodeError(
                    f"payload does not decode as declared mime {mime}"
                )
            if not fake:
                raise NotImplementedError(
                    f"frame sampling for mime={mime} requires av/ffmpeg; "
                    "pass fake=True for the deterministic stub"
                )
            return fake_frames(payload)

        for pdf in batches:
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "frame_ms": [],
                "frame": [],
                "error": [],
            }
            for doc_id, p, m in zip(pdf[id_col], pdf["payload"], pdf["meta"]):
                sampled, err = _catch_row(frames, bytes(p), m["mime"])
                if err is not None:
                    # one sentinel row: the document stays visible
                    # downstream with its failure reason, instead of
                    # silently yielding zero frames
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(None)
                    rows["frame_ms"].append(None)
                    rows["frame"].append(None)
                    rows["error"].append(err)
                    continue
                for idx, ms, data in sampled:
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_ms"].append(ms)
                    rows["frame"].append(data)
                    rows["error"].append(None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, FRAME_SCHEMA)


def pdf_text(
    media: DataFrame,
    id_col: str = "doc_id",
    max_pages: int = 1000,
) -> DataFrame:
    """Per-document PDF text extraction (one row per page).

    The pure-Python ISO 32000 subset reader (:mod:`.rawpdf`: classic
    and stream cross-references, ``/ObjStm`` compressed objects,
    ``/FlateDecode`` with PNG predictors, content-stream text
    operators) turns each ``application/pdf`` payload into per-page
    visible text.  Hostile payloads follow the standard media
    discipline: the row survives with the failure reason in ``error``
    and NULL page columns — a 100 TB crawl batch never dies on one
    bad file.  Output: ``(id, page_idx, n_pages, page_text, error)``.
    """

    def run(batches):
        import pandas as pd

        from . import rawpdf

        for pdf in batches:
            rows = {
                id_col: [],
                "page_idx": [],
                "n_pages": [],
                "page_text": [],
                "error": [],
            }
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                if p is None:
                    # null payload (failed upstream fetch) is a data
                    # condition, not a task-killing TypeError
                    rows[id_col].append(doc_id)
                    rows["page_idx"].append(None)
                    rows["n_pages"].append(None)
                    rows["page_text"].append(None)
                    rows["error"].append("ValueError: null PDF payload")
                    continue
                parsed, err = _catch_row(rawpdf.extract_pdf, bytes(p), max_pages)
                if err is not None:
                    rows[id_col].append(doc_id)
                    rows["page_idx"].append(None)
                    rows["n_pages"].append(None)
                    rows["page_text"].append(None)
                    rows["error"].append(err)
                    continue
                for idx, text in enumerate(parsed["pages"]):
                    rows[id_col].append(doc_id)
                    rows["page_idx"].append(idx)
                    rows["n_pages"].append(parsed["n_pages"])
                    rows["page_text"].append(text)
                    rows["error"].append(None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        run,
        f"{id_col} long, page_idx long, n_pages long, "
        "page_text string, error string",
    )


def pdf_images(
    media: DataFrame,
    id_col: str = "doc_id",
    max_pages: int = 1000,
    max_images: int = 256,
) -> DataFrame:
    """Per-document embedded-image extraction (one row per image).

    :func:`..operators.rawpdf.extract_pdf_images` walks page
    ``/Resources → /XObject`` images and inline ``BI…ID…EI`` images,
    decoding raw/Flate samples (gray/RGB/indexed/mask, PNG/TIFF
    predictors), ``/DCTDecode`` via the baseline JPEG decoder, and
    ``/CCITTFaxDecode`` via the fax decoder.  Error capture is
    two-level: a hostile DOCUMENT yields one row with a document
    ``error``, a hostile IMAGE inside a good document yields its own
    row with an image ``error`` — the rest of the document's images
    still land.  Output: ``(id, page_idx, img_idx, kind, name, filter,
    width, height, bpc, channels, sum_pixel, mean_pixel, error)`` with
    pixel stats computed kernel-side so no pixel arrays cross the
    Arrow boundary — the shape a 100 TB scanned-document scan needs.
    """

    def run(batches):
        import pandas as pd

        from . import rawpdf

        cols = (id_col, "page_idx", "img_idx", "kind", "name", "filter",
                "width", "height", "bpc", "channels", "sum_pixel",
                "mean_pixel", "error")

        for pdf in batches:
            rows = {c: [] for c in cols}

            def put(doc_id, **kw):
                vals = {c: None for c in cols}
                vals[id_col] = doc_id
                vals.update(kw)
                for c in cols:
                    rows[c].append(vals[c])

            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                if p is None:
                    put(doc_id, error="ValueError: null PDF payload")
                    continue
                parsed, err = _catch_row(
                    rawpdf.extract_pdf_images, bytes(p), max_pages,
                    max_images,
                )
                if err is not None:
                    put(doc_id, error=err)
                    continue
                for idx, im in enumerate(parsed["images"]):
                    px = im["pixels"]
                    s = None if px is None else int(
                        px.astype("int64").sum()
                    )
                    m = None if px is None else float(px.mean())
                    put(
                        doc_id, page_idx=im["page_idx"],
                        img_idx=idx, kind=im["kind"], name=im["name"],
                        filter=im["filter"], width=im["width"],
                        height=im["height"], bpc=im["bpc"],
                        channels=im["channels"], sum_pixel=s,
                        mean_pixel=m, error=im["error"],
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        run,
        f"{id_col} long, page_idx long, img_idx long, kind string, "
        "name string, filter string, width long, height long, "
        "bpc long, channels long, sum_pixel long, mean_pixel double, "
        "error string",
    )
