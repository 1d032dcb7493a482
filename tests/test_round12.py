"""Round-12 regression pins: the four ADVICE r11 findings.

1. 7z multi-folder inflation guard fires on DECLARED sizes before any
   folder is decoded (high: crafted multi-folder bombs used to
   materialize tens of GiB before the post-decode check ran).
2. MPEG-TS resync is window+budget bounded (medium: hostile 0x47-dense
   data forced an O(n^2) rescan).
3. sniff_format checks the positional ustar magic before the weak
   ASCII cpio / deep ISO probes (low: valid tars misrouted).
4. 7z bzip2 folders may be CONCATENATED bzip2 streams (p7zip -mmt
   writes them); the coder loops on unused_data (low: valid archives
   failed as short output).
"""

from __future__ import annotations

import binascii
import bz2
import struct
import time

import pytest

from rawdata_client_provider_gcs_spark.operators import rawts
from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import sevenzip as S


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _multi_folder_7z(folders: list[tuple[bytes, int]]) -> bytes:
    """Hand-assembled 7z: one copy-coder folder per (packed, out_size)
    pair, one file per folder, no SubStreamsInfo."""
    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(len(folders))
    w.number(S._K_SIZE)
    for packed, _ in folders:
        w.number(len(packed))
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(len(folders))
    w.byte(0)
    for _ in folders:
        w.number(1)      # one coder
        w.byte(1)        # id size 1, no attrs/props
        w.byte(S._METHOD_COPY)
    w.number(S._K_CODERS_UNPACK_SIZE)
    for _, out_size in folders:
        w.number(out_size)
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(len(folders))
    names = "".join(
        f"f{i}.bin\x00" for i in range(len(folders))
    ).encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    packed_all = b"".join(p for p, _ in folders)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack(
        "<QQI", len(packed_all), len(header),
        binascii.crc32(header) & 0xFFFFFFFF,
    )
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + packed_all + header
    return bytes(out)


# ---------------------------------------------------------------------------
# 1. multi-folder declared-size bomb guard
# ---------------------------------------------------------------------------


def test_7z_multi_folder_roundtrip():
    a, b = b"folder one payload", bytes(range(200))
    data = _multi_folder_7z([(a, len(a)), (b, len(b))])
    ms = S.parse_7z(data)
    assert [(m["path"], m["payload"]) for m in ms] == [
        ("f0.bin", a), ("f1.bin", b),
    ]


def test_7z_multi_folder_bomb_guard_fires_before_decode():
    # Two folders, each DECLARING 600 MiB: sum crosses the 1 GiB guard,
    # so parse_7z must raise on the declarations alone — the packed
    # bytes here are garbage that would explode any attempted decode.
    big = 600 << 20
    data = _multi_folder_7z([(b"xx", big), (b"yy", big)])
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="bomb"):
        S.parse_7z(data)
    assert time.monotonic() - t0 < 1.0  # guard fired, nothing decoded


def test_7z_single_oversize_folder_still_guarded():
    data = _multi_folder_7z([(b"xx", (1 << 30) + 1)])
    with pytest.raises(ValueError, match="bomb"):
        S.parse_7z(data)


# ---------------------------------------------------------------------------
# 2. TS resync linearity under hostile 0x47 density
# ---------------------------------------------------------------------------


def test_ts_resync_hostile_linear():
    # One valid sync packet, then 2 MiB where every other byte is 0x47
    # but none stride-confirms (period 2 never aligns with 188) and no
    # header is plausible (0x47 0x47 -> PID 0x1F47 w/ afc=0 pattern
    # varies; the point is the WALK must stay linear regardless).
    pkt = bytearray(188)
    pkt[0] = 0x47
    pkt[1] = 0x1F  # pid 0x1FFF null packet
    pkt[2] = 0xFF
    pkt[3] = 0x10
    hostile = bytes(pkt) + b"\x46\x47" * (1 << 20)
    t0 = time.monotonic()
    info = rawts.parse_ts(hostile)
    took = time.monotonic() - t0
    assert info["n_packets"] >= 1
    assert took < 20.0, f"hostile resync took {took:.1f}s (quadratic?)"


def test_ts_resync_still_recovers_real_stream():
    # garbage gap, then two real stride-aligned packets: resync must
    # land on them (stride confirmation inside the window).
    pkt = bytearray(188)
    pkt[0] = 0x47
    pkt[1] = 0x1F
    pkt[2] = 0xFF
    pkt[3] = 0x10
    data = bytes(pkt) + b"\x00\x47\x00" * 40 + bytes(pkt) * 2
    info = rawts.parse_ts(data)
    assert info["n_packets"] == 3
    assert info["n_sync_losses"] == 1


# ---------------------------------------------------------------------------
# 3. sniff_format ordering
# ---------------------------------------------------------------------------


def test_tar_with_cpio_magic_name_sniffs_as_tar():
    # first member literally named like a cpio magic: ASCII '070701…'
    # lands at offset 0 of the tar header, but ustar at 257 must win
    tar = A.build_tar([("0707010000000A", b"not a cpio"),
                       ("real.txt", b"x")])
    assert tar[:6] in (b"070701", b"070707") or tar[:2] == b"07"
    assert A.sniff_format(tar) == "tar"
    ms = A.parse_tar(tar)
    assert ms[0]["path"] == "0707010000000A"


def test_tar_containing_iso_image_sniffs_as_tar():
    # a tar whose first member body places 'CD001' at absolute 32769
    body = bytearray(40 << 10)
    body[32769 - 512 : 32769 - 512 + 5] = b"CD001"  # header is 512 B
    tar = A.build_tar([("disc.iso", bytes(body))])
    assert tar[32769:32774] == b"CD001"
    assert A.sniff_format(tar) == "tar"


def test_genuine_cpio_and_hostile_text_sniff():
    cpio = A.build_cpio([("a.txt", b"hi")])
    assert A.sniff_format(cpio) == "cpio"
    # plain text that merely STARTS with the magic is not cpio
    assert A.sniff_format(b"070701 is my favourite number\n" + b"x" * 600) is None
    odc = A.build_cpio([("a.txt", b"hi")], fmt="odc")
    assert A.sniff_format(odc) == "cpio"


# ---------------------------------------------------------------------------
# 4. concatenated bzip2 streams in one 7z folder
# ---------------------------------------------------------------------------


def test_7z_bzip2_concatenated_streams():
    a = b"first bzip2 stream payload " * 50
    b = b"second stream, fresh decompressor " * 50
    packed = bz2.compress(a) + bz2.compress(b)
    out = S._decode_coder(S._METHOD_BZIP2, b"", packed, len(a) + len(b))
    assert out == a + b


def test_7z_bzip2_concatenated_full_archive():
    a = b"alpha " * 300
    b = b"beta " * 300
    packed = bz2.compress(a) + bz2.compress(b)
    data = _hand_bzip2_7z(packed, a + b)
    ms = S.parse_7z(data)
    assert ms[0]["payload"] == a + b


def test_7z_bzip2_short_stream_still_fails_loud():
    a = b"only stream " * 100
    packed = bz2.compress(a)
    with pytest.raises(ValueError, match="shorter than declared"):
        S._decode_coder(S._METHOD_BZIP2, b"", packed, len(a) + 1000)


def _hand_bzip2_7z(packed: bytes, blob: bytes) -> bytes:
    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(1)
    w.number(S._K_SIZE)
    w.number(len(packed))
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(1)
    w.byte(0)
    w.number(1)
    mid = S._METHOD_BZIP2.to_bytes(3, "big")
    w.byte(len(mid))
    w.b += mid
    w.number(S._K_CODERS_UNPACK_SIZE)
    w.number(len(blob))
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(1)
    names = "m.bin\x00".encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack(
        "<QQI", len(packed), len(header),
        binascii.crc32(header) & 0xFFFFFFFF,
    )
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + packed + header
    return bytes(out)


# ---------------------------------------------------------------------------
# round-12 review-pass regression pins
# ---------------------------------------------------------------------------


def test_cfb_difat_self_loop_is_bounded():
    """A self-looping DIFAT chain with a huge declared count must trip
    the cycle guard immediately, not balloon memory."""
    import struct as st

    from rawdata_client_provider_gcs_spark.sources import cfb as C

    blob = bytearray(C.build_cfb([("WordDocument", b"x" * 5000)]))
    st.pack_into("<II", blob, 68, 0, 0xFFFFFFFB)  # first_difat=0, n huge
    # sector 0 (the FAT) read as a DIFAT sector: last u32 -> self-loop
    st.pack_into("<I", blob, 512 + 508, 0)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="loop|out of range|fewer FAT"):
        C.parse_cfb(bytes(blob))
    assert time.monotonic() - t0 < 1.0


def test_oleps_truncated_is_value_error():
    """Short property-set buffers raise ValueError (per-row capture),
    never struct.error."""
    import struct as st

    from rawdata_client_provider_gcs_spark.sources import cfb as C

    # 56-byte stream passing the explicit checks, then overrunning
    s = bytearray(56)
    st.pack_into("<HH", s, 0, 0xFFFE, 0)
    st.pack_into("<I", s, 24, 1)
    s[28:44] = C._SUMMARY_FMTID
    st.pack_into("<I", s, 44, 48)
    st.pack_into("<II", s, 48, 8, 1)  # sec_size=8, n_props=1
    with pytest.raises(ValueError):
        C.parse_summary_info(bytes(s))


def test_ts_long_corruption_burst_does_not_truncate():
    """>64 KiB of hostile 0x47-dense garbage between valid packets:
    the walk must reach the packets after the burst (the old bounded
    resync broke out and silently dropped them)."""
    pkt = bytearray(188)
    pkt[0] = 0x47
    pkt[1] = 0x1F
    pkt[2] = 0xFF
    pkt[3] = 0x10
    # 0x47 every 3 bytes, never at stride 188 (188 % 3 == 2), afc=0 at
    # every candidate's 4th byte -> implausible
    burst = b"\x00\x47\xfe" * 24000  # 72 KB
    data = bytes(pkt) + burst + bytes(pkt) * 2
    t0 = time.monotonic()
    info = rawts.parse_ts(data)
    took = time.monotonic() - t0
    # >= 3: the two packets after the burst are reached (a burst byte
    # 188 before the first real sync may coincidentally stride-confirm
    # and add one junk packet — lock-on jitter, not truncation)
    assert info["n_packets"] >= 3
    assert took < 20.0


def test_xlsx_bare_self_closing_si_keeps_indices_aligned():
    """<si/> (attribute-less self-closing) is a legal empty shared
    string; dropping it would shift every later index."""
    from rawdata_client_provider_gcs_spark.sources import archive as A
    from rawdata_client_provider_gcs_spark.sources import office as O

    sst = (b'<sst xmlns="x"><si><t>zero</t></si><si/>'
           b"<si><t>two</t></si></sst>")
    blob = A.build_zip([
        ("xl/workbook.xml",
         b'<workbook><sheets><sheet name="S" sheetId="1" r:id="rId1"/>'
         b"</sheets></workbook>"),
        ("xl/_rels/workbook.xml.rels",
         b'<Relationships><Relationship Id="rId1" '
         b'Target="worksheets/sheet1.xml"/></Relationships>'),
        ("xl/sharedStrings.xml", sst),
        ("xl/worksheets/sheet1.xml",
         b'<worksheet><sheetData><row><c r="A1" t="s"><v>2</v></c>'
         b"</row></sheetData></worksheet>"),
    ])
    fmt, parts = O.office_parts_of(blob)
    assert parts[0][1] == "<x:sheet><x:c>two</x:c></x:sheet>"


def test_xlsx_cells_with_newline_before_attrs():
    """<c\\nr="A1"...> (legal XML whitespace) must not be skipped."""
    from rawdata_client_provider_gcs_spark.sources import archive as A
    from rawdata_client_provider_gcs_spark.sources import office as O

    blob = A.build_zip([
        ("xl/workbook.xml",
         b'<workbook><sheets><sheet name="S" sheetId="1" r:id="rId1"/>'
         b"</sheets></workbook>"),
        ("xl/_rels/workbook.xml.rels",
         b'<Relationships><Relationship Id="rId1" '
         b'Target="worksheets/sheet1.xml"/></Relationships>'),
        ("xl/worksheets/sheet1.xml",
         b"<worksheet><sheetData><row><c\n"
         b'r="A1"><v>7</v></c></row></sheetData></worksheet>'),
    ])
    fmt, parts = O.office_parts_of(blob)
    assert parts[0][1] == "<x:sheet><x:c>7</x:c></x:sheet>"


def test_cfb_sibling_chain_reaches_every_stream():
    """The fixture directory is a valid right-descending sibling BST:
    a conforming reader walking root->child->right sees every stream
    in CFB name order (length first, then uppercased)."""
    import struct as st

    from rawdata_client_provider_gcs_spark.sources import cfb as C

    blob = C.build_cfb(
        [("WordDocument", b"w" * 5000), ("Extra", b"e" * 10)],
        title="t",
    )
    dir_start = st.unpack_from("<I", blob, 48)[0]
    base = 512 + dir_start * 512

    def entry(i):
        off = base + i * 128
        nlen = st.unpack_from("<H", blob, off + 64)[0]
        name = blob[off : off + nlen - 2].decode("utf-16-le")
        right = st.unpack_from("<I", blob, off + 72)[0]
        child = st.unpack_from("<I", blob, off + 76)[0]
        return name, right, child

    name0, _, child = entry(0)
    assert name0 == "Root Entry" and child == 1
    seen = []
    cur = child
    while cur != 0xFFFFFFFF:
        name, right, _ = entry(cur)
        seen.append(name)
        cur = right
    # CFB order: byte length, then uppercase — Extra(5) < WordDocument(12)
    # < \x05SummaryInformation(19)
    assert seen == ["Extra", "WordDocument", "\x05SummaryInformation"]


def test_sentence_stats_hand_cases(spark):
    from rawdata_client_provider_gcs_spark.functions.text import (
        sentence_stats,
    )

    rows = [
        (0, "One two three. Four five! Six?  "),
        (1, "no terminal punctuation at all"),
        (2, ""),
        (3, "Ends abruptly. Second sentence"),
        (4, "Runs!! of?! punctuation. x"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    st = sentence_stats("text")
    got = {r.id: r for r in df.select(
        "id", *[v.alias(k) for k, v in st.items()]
    ).collect()}
    assert (got[0].n_sentences, got[0].mean_words_per_sentence,
            got[0].max_sentence_chars) == (3, 2.0, 13)
    assert (got[1].n_sentences, got[1].max_sentence_chars) == (1, 30)
    assert (got[2].n_sentences, got[2].mean_words_per_sentence,
            got[2].max_sentence_chars) == (0, 0.0, 0)
    assert got[3].n_sentences == 2
    # punctuation RUNS are single breaks: Runs / of / punctuation / x
    assert got[4].n_sentences == 4
    assert got[4].max_sentence_chars == 11
