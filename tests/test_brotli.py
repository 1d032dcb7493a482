"""Pure-Python Brotli decoder (sources/brotli_codec.py): interop
against the system C reference encoder/decoder via pyarrow, RFC
structure coverage, hostile shapes."""

from __future__ import annotations

import random

import pytest

from rawdata_client_provider_gcs_spark.sources.brotli_codec import (
    _load_tables,
    brotli_decompress,
    brotli_store,
    sniff_brotli,
)

try:
    import pyarrow as pa

    _ENC = pa.Codec("brotli")
except Exception:  # pragma: no cover - environment guard
    _ENC = None

needs_ref = pytest.mark.skipif(_ENC is None, reason="no pyarrow brotli")


def _c(data: bytes) -> bytes:
    return bytes(_ENC.compress(data))


@needs_ref
def test_reference_encoder_interop_shapes():
    """The C reference encoder's output decodes byte-exact across the
    payload shapes that exercise every machine: entropy-only, long
    copies, ring-buffer specials, dictionary words + transforms,
    context modes, multi-meta-block sizes."""
    cases = [
        b"",
        b"a",
        b"ab" * 4,
        b"ab" * 1100,
        b"a" * 5000,
        bytes((i * 197 + 13) % 251 for i in range(5000)),
        b"the quick brown fox jumps over the lazy dog " * 50,
        b"The Time of the People for the information download. " * 30,
        b"Header: value\r\nContent-Type: text/html\r\n\r\n" * 60,
        bytes(range(256)) * 40,
    ]
    for payload in cases:
        assert brotli_decompress(_c(payload)) == payload, len(payload)


@needs_ref
def test_reference_encoder_interop_fuzz():
    rng = random.Random(99)
    words = [b"time", b"download", b"which", b"their", b"about",
             b"would", b"people", b"there", b"information",
             b"http://", b".com/", b"The ", b" of the ", b"ing "]
    for trial in range(150):
        kind = trial % 5
        n = rng.randrange(0, 4000)
        if kind == 0:
            payload = rng.randbytes(n)
        elif kind == 1:
            payload = bytes(rng.randrange(3) for _ in range(n))
        elif kind == 2:
            payload = b"".join(rng.choice(words) for _ in range(n // 5))
        elif kind == 3:
            base = rng.randbytes(50)
            payload = b"".join(
                base[rng.randrange(40) : rng.randrange(40, 51)]
                for _ in range(n // 10)
            )
        else:
            payload = b"Header: value\r\n" * (n // 15)
        assert brotli_decompress(_c(payload)) == payload, (trial, kind)


@needs_ref
def test_store_writer_reference_reads_back():
    """Two-direction interop without a full encoder: the reference
    decoder reads our uncompressed-meta-block streams byte-exact
    (incl. the >16 MiB chunk split), and our own empty stream is
    bit-identical to the reference encoder's."""
    rng = random.Random(1)
    for p in (b"abc", rng.randbytes(100_000), b"x" * ((1 << 24) + 5)):
        blob = brotli_store(p)
        assert bytes(_ENC.decompress(blob, len(p))) == p
        assert brotli_decompress(blob) == p
    assert brotli_store(b"") == _c(b"") == b"\x06"
    assert brotli_decompress(b"\x06") == b""


@needs_ref
def test_prefix_mode_and_bomb_cap():
    payload = b"prefix mode words " * 5000
    blob = _c(payload)
    for k in (1, 100, 65536, len(payload) * 2):
        assert brotli_decompress(blob, max_output=k) == payload[:k]
    with pytest.raises(ValueError, match="guard"):
        brotli_decompress(blob, cap=1000)


def test_rfc_tables_loaded():
    t = _load_tables()
    assert len(t["dict"]) == 122784
    # Appendix A starts with the 4-letter words
    assert t["dict"][:16] == b"timedownlifeleft"
    assert len(t["ctx"]) == 2048
    assert len(t["transforms"]) == 121
    assert t["transforms"][0] == ("", 0, "")  # identity first
    # brotli famously has no magic number
    assert sniff_brotli(b"\x1b\x07\x00") is False


@needs_ref
def test_dictionary_transforms_roundtrip():
    """Force dictionary hits: concatenations of transformed dictionary
    words (capitalized, suffixed) that the reference encoder encodes
    as transformed word references at high quality."""
    t = _load_tables()
    d, off, sb = t["dict"], t["offsets"], t["size_bits"]
    rng = random.Random(7)
    words = []
    for ln in (5, 6, 8, 10):
        for _ in range(30):
            i = rng.randrange(1 << sb[ln])
            words.append(d[off[ln] + i * ln : off[ln] + (i + 1) * ln])
    payload = b" ".join(words) + b" " + b" ".join(
        w.decode("latin-1").capitalize().encode("latin-1") for w in words
    )
    assert brotli_decompress(_c(payload)) == payload


def test_hostile_shapes_land_on_valueerror():
    rng = random.Random(5)
    seeds = [b"", b"\x1b", b"\x1b\x07", bytes(20), b"\x1b" + b"\xff" * 30,
             brotli_store(b"hello world")[:-3]]
    for _ in range(300):
        blob = seeds[rng.randrange(len(seeds))] + rng.randbytes(
            rng.randrange(0, 60)
        )
        try:
            brotli_decompress(blob, cap=1 << 20)
        except ValueError:
            pass  # the per-row contract


@needs_ref
def test_truncation_never_escapes_valueerror():
    blob = _c(b"the quick brown fox jumps over the lazy dog " * 30)
    for cut in range(len(blob)):
        try:
            brotli_decompress(blob[:cut])
        except ValueError:
            pass
