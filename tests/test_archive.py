"""Archive source tests: stdlib interop both directions, hostile
bytes, bomb guard, and the Spark member explosion."""

import io
import random
import shutil
import struct
import tarfile
import zipfile
import zlib

import pytest

from rawdata_client_provider_gcs_spark.sources import archive as A

MEMBERS = [
    ("doc/a.txt", b"alpha text"),
    ("doc/sub/b.bin", bytes(range(256)) * 3),
    ("empty", b""),
]


@pytest.mark.parametrize("method", ["deflate", "store"])
def test_zip_roundtrip_and_stdlib_reads_ours(method):
    z = A.build_zip(MEMBERS, method=method)
    assert [(m["path"], m["payload"]) for m in A.parse_zip(z)] == MEMBERS
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == MEMBERS


def test_zip_we_read_stdlibs():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for p, d in MEMBERS:
            zf.writestr(p, d)
    assert [(m["path"], m["payload"]) for m in A.parse_zip(buf.getvalue())] == MEMBERS


def test_tar_roundtrip_and_stdlib_interop():
    t = A.build_tar(MEMBERS)
    assert [(m["path"], m["payload"]) for m in A.parse_tar(t)] == MEMBERS
    tf = tarfile.open(fileobj=io.BytesIO(t))
    assert [(i.name, tf.extractfile(i).read()) for i in tf.getmembers()] == MEMBERS
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf2:
        for p, d in MEMBERS:
            ti = tarfile.TarInfo(p)
            ti.size = len(d)
            tf2.addfile(ti, io.BytesIO(d))
    assert [(m["path"], m["payload"]) for m in A.parse_tar(buf.getvalue())] == MEMBERS


def test_sniff_format():
    assert A.sniff_format(A.build_zip(MEMBERS)) == "zip"
    assert A.sniff_format(A.build_tar(MEMBERS)) == "tar"
    assert A.sniff_format(b"%PDF-1.4 whatever") is None


def test_zip_crc_mismatch_rejected():
    z = bytearray(A.build_zip(MEMBERS, method="store"))
    i = z.find(b"alpha text")
    z[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        A.parse_zip(bytes(z))


def test_zip_bomb_declared_size_over_cap():
    z = A.build_zip([("x", b"small")])
    # rewrite the central directory's uncompressed size to a huge lie
    cdh = z.rfind(b"PK\x01\x02")
    patched = (
        z[: cdh + 24]
        + struct.pack("<I", A.MAX_MEMBER_BYTES + 1)
        + z[cdh + 28 :]
    )
    with pytest.raises(ValueError, match="guard"):
        A.parse_zip(patched)


def test_zip_inflate_size_lie_rejected():
    """A member whose deflate stream inflates past its declared size
    (the classic bomb shape) must be rejected, not expanded."""
    big = zlib.compressobj(9, zlib.DEFLATED, -15)
    comp = big.compress(b"\x00" * 100_000) + big.flush()
    z = bytearray(A.build_zip([("x", b"tiny-tiny")], method="deflate"))
    # splice the big stream in place of the small one, keeping sizes
    small = zlib.compressobj(6, zlib.DEFLATED, -15)
    small_comp = small.compress(b"tiny-tiny") + small.flush()
    i = z.find(small_comp)
    spliced = bytes(z[:i]) + comp[: len(small_comp)] + bytes(z[i + len(small_comp) :])
    with pytest.raises(ValueError):
        A.parse_zip(spliced)


def test_tar_checksum_mismatch_rejected():
    t = bytearray(A.build_tar(MEMBERS))
    t[0] ^= 0x01
    with pytest.raises(ValueError, match="checksum"):
        A.parse_tar(bytes(t))


def test_tar_directories_and_links_skipped():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ln = tarfile.TarInfo("link")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "doc/a.txt"
        tf.addfile(ln)
        f = tarfile.TarInfo("real.txt")
        f.size = 4
        tf.addfile(f, io.BytesIO(b"data"))
    got = A.parse_tar(buf.getvalue())
    assert [(m["path"], m["payload"]) for m in got] == [("real.txt", b"data")]


@pytest.mark.parametrize(
    "fmt", [tarfile.GNU_FORMAT, tarfile.PAX_FORMAT], ids=["gnu", "pax"]
)
def test_tar_long_paths_survive(fmt):
    """>100-byte member paths use GNU L entries or pax x headers —
    both must yield the full path, not a 100-char truncation."""
    long_name = "deeply/" * 20 + "file-with-a-very-long-path-name.txt"
    assert len(long_name) > 100
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        ti = tarfile.TarInfo(long_name)
        ti.size = 4
        tf.addfile(ti, io.BytesIO(b"data"))
    got = A.parse_tar(buf.getvalue())
    assert [(m["path"], m["payload"]) for m in got] == [(long_name, b"data")]


def test_zip_bzip2_member():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_BZIP2) as zf:
        for p, d in MEMBERS:
            zf.writestr(p, d)
    assert [(m["path"], m["payload"]) for m in A.parse_zip(buf.getvalue())] == MEMBERS


@pytest.mark.parametrize("method", ["bzip2", "lzma", "zstd", "xz"])
def test_zip_extended_methods_roundtrip(method):
    """Methods 12/14/93/95 (APPNOTE): roundtrip through our own
    writer, stdlib interop where the stdlib speaks the method."""
    z = A.build_zip(MEMBERS, method=method)
    assert [(m["path"], m["payload"]) for m in A.parse_zip(z)] == MEMBERS
    if method in ("bzip2", "lzma"):
        zf = zipfile.ZipFile(io.BytesIO(z))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == MEMBERS


def test_zip_lzma_stdlib_writes_ours_reads():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_LZMA) as zf:
        for p, d in MEMBERS:
            zf.writestr(p, d)
    assert [(m["path"], m["payload"])
            for m in A.parse_zip(buf.getvalue())] == MEMBERS


@pytest.mark.skipif(shutil.which("bsdtar") is None, reason="no bsdtar")
@pytest.mark.parametrize("method", ["bzip2", "lzma", "zstd", "xz"])
def test_zip_extended_methods_bsdtar_interop(method, tmp_path):
    """Two-direction CLI interop: bsdtar extracts our archives and we
    parse bsdtar-written ones (``zip:compression=<method>``)."""
    import subprocess

    z = A.build_zip(MEMBERS, method=method)
    src = tmp_path / "ours.zip"
    src.write_bytes(z)
    out = tmp_path / "x"
    out.mkdir()
    r = subprocess.run(
        ["bsdtar", "-xf", str(src), "-C", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    for p, d in MEMBERS:
        assert (out / p).read_bytes() == d, (method, p)
    # write direction
    f = tmp_path / "m.txt"
    f.write_bytes(b"cli-written member body\n" * 9)
    theirs = tmp_path / "theirs.zip"
    r = subprocess.run(
        ["bsdtar", "--format", "zip", "--options",
         f"zip:compression={method}", "-cf", str(theirs), "-C",
         str(tmp_path), "m.txt"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"bsdtar cannot write zip {method}: {r.stderr}")
    got = A.parse_zip(theirs.read_bytes())
    assert [(m["path"], m["payload"]) for m in got] == \
        [("m.txt", f.read_bytes())]


def test_zip_lzma_hostile_shapes():
    good = A.build_zip([("x", b"body bytes " * 20)], method="lzma")
    # locate the member body (after the 30-byte LFH + 1-byte name)
    body = good.find(b"x", 30) + 1
    # truncated 4-byte prelude: declare a 2-byte compressed body
    bad = bytearray(good)
    for sig, off in ((b"PK\x03\x04", 18), (b"PK\x01\x02", 20)):
        i = good.find(sig)
        bad[i + off : i + off + 4] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="prelude"):
        A.parse_zip(bytes(bad))
    # propsize lie: claim 9 property bytes
    bad = bytearray(good)
    bad[body + 2 : body + 4] = struct.pack("<H", 9)
    with pytest.raises(ValueError, match="propert"):
        A.parse_zip(bytes(bad))
    # invalid properties byte (>= 225)
    bad = bytearray(good)
    bad[body + 4] = 230
    with pytest.raises(ValueError, match="propert|LZMA"):
        A.parse_zip(bytes(bad))
    # corrupt stream body
    bad = bytearray(good)
    bad[body + 15] ^= 0xFF
    with pytest.raises(ValueError, match="LZMA|CRC|declared"):
        A.parse_zip(bytes(bad))


@pytest.mark.parametrize("method", ["zstd", "xz"])
def test_zip_zstd_xz_size_lie_rejected(method):
    """A member that inflates past its declared size is a bomb: the
    decode stops at ulen+1 and the size check rejects."""
    z = bytearray(A.build_zip([("x", b"A" * 5000)], method=method))
    # shrink the declared uncompressed size in LFH + CDH to 10
    for sig, off in ((b"PK\x03\x04", 22), (b"PK\x01\x02", 24)):
        i = bytes(z).find(sig)
        z[i + off : i + off + 4] = struct.pack("<I", 10)
    with pytest.raises(ValueError, match="declared|cap"):
        A.parse_zip(bytes(z))


def test_pax_records_malformed_is_valueerror():
    with pytest.raises(ValueError, match="pax"):
        A._parse_pax_records(b"99999 path=x\n")
    # a length lying SHORT must error, not silently mis-split
    with pytest.raises(ValueError, match="newline"):
        A._parse_pax_records(b"6 path=deep/dir/file\n")


def test_gnu_atime_fields_are_not_a_prefix():
    """GNU-format headers (magic 'ustar  ') store atime/ctime at offset
    345; only POSIX ustar has a prefix there. A populated GNU numeric
    field must not be joined into the member path."""
    t = bytearray(A.build_tar([("plain.txt", b"data")]))
    t[257:265] = b"ustar  \x00"  # GNU magic+version
    t[345:357] = b"14123456701 "  # atime (octal), as old GNU tars write
    # re-checksum
    hdr = t[0:512]
    chk = sum(hdr) - sum(hdr[148:156]) + 8 * 0x20
    t[148:156] = ("%06o" % chk).encode() + b"\x00 "
    got = A.parse_tar(bytes(t))
    assert [(m["path"], m["payload"]) for m in got] == [("plain.txt", b"data")]


@pytest.mark.parametrize("seed", range(4))
def test_kernels_never_raise_uncatchable(seed):
    rng = random.Random(seed)
    for base in (A.build_zip(MEMBERS), A.build_tar(MEMBERS)):
        for _ in range(200):
            buf = bytearray(base)
            mode = rng.randrange(3)
            if mode == 0:
                buf = buf[: rng.randrange(1, len(buf))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            else:
                i = rng.randrange(len(buf))
                del buf[i : min(len(buf), i + rng.randrange(1, 64))]
            try:
                A.parse_archive(bytes(buf))
            except ValueError:
                pass


def test_spark_archive_members_error_capture(spark):
    rows = [
        (0, bytearray(A.build_zip(MEMBERS))),
        (1, bytearray(A.build_tar(MEMBERS))),
        (2, bytearray(b"neither archive format at all")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = A.archive_members(df).toPandas()
    ok = out[out["error"].isna()]
    assert sorted(ok["doc_id"].unique()) == [0, 1]
    assert len(ok) == 6  # 3 members × 2 archives
    assert set(ok["archive_format"]) == {"zip", "tar"}
    bad = out[out["error"].notna()]
    assert sorted(bad["doc_id"]) == [2, 3]
    assert bad["path"].isna().all()


# ---------------------------------------------------------------------------
# Deflate64 (ZIP method 9, r14)
# ---------------------------------------------------------------------------


def test_deflate64_hand_vectors_and_extensions():
    """The three enhanced-deflate extensions, pinned by hand-built
    fixed-Huffman vectors: the 16-extra-bit length code 285, distance
    codes 30/31, and >32 KiB window references — each one a stream
    stdlib zlib REJECTS (it is genuinely not RFC 1951)."""
    import zlib as _z

    from rawdata_client_provider_gcs_spark.sources import deflate64 as D

    # lit 'A' + match(3,1) → 'AAAA', in both the short and the
    # forced-285 length form
    assert D.inflate64(
        D.deflate64_fixed([("lit", b"A"), ("match", 3, 1)]), 10
    ) == b"AAAA"
    assert D.inflate64(
        D.deflate64_fixed([("lit", b"A"), ("match", 3, 1)],
                          force_285=True), 10
    ) == b"AAAA"
    # a 47,996-byte match through code 285 (impossible in deflate)
    data = b"abcd" * 12000
    blob = D.deflate64_compress(data)
    assert D.inflate64(blob, len(data) + 1) == data
    with pytest.raises(_z.error):
        _z.decompressobj(-15).decompress(blob)
    # distance codes 30/31: a reference 39,000 bytes back
    lit = bytes((i * 7 + 3) % 256 for i in range(40000))
    blob = D.deflate64_fixed([("lit", lit), ("match", 300, 39000)])
    out = D.inflate64(blob, 50000)
    assert out[:40000] == lit and out[40000:] == lit[1000:1300]
    # zlib does not speak this stream: it either errors or silently
    # mis-decodes (the 285 length form desyncs RFC 1951 readers)
    d = _z.decompressobj(-15)
    try:
        wrong = d.decompress(blob) + d.flush()
    except _z.error:
        wrong = None
    assert wrong != out


def test_deflate64_reads_zlib_shared_subset():
    """Streams that avoid code 285 and distances 30/31 decode
    identically under zlib and the enhanced inflater — including
    stored and dynamic-Huffman blocks."""
    import random
    import zlib as _z

    from rawdata_client_provider_gcs_spark.sources import deflate64 as D

    rng = random.Random(3)
    for _ in range(15):
        data = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(1, 5000)))
        c = _z.compressobj(6, _z.DEFLATED, -15)
        raw = c.compress(data) + c.flush()
        assert D.inflate64(raw, len(data) + 1) == data
    c = _z.compressobj(0, _z.DEFLATED, -15)  # stored blocks
    data = bytes(range(256)) * 300
    raw = c.compress(data) + c.flush()
    assert D.inflate64(raw, len(data) + 1) == data
    c = _z.compressobj(6, _z.DEFLATED, -15, 9, _z.Z_FIXED)
    data = b"hello hello world" * 9
    raw = c.compress(data) + c.flush()
    assert D.inflate64(raw, len(data) + 1) == data


def test_deflate64_hostiles():
    from rawdata_client_provider_gcs_spark.sources import deflate64 as D

    with pytest.raises(ValueError, match="cap"):
        D.inflate64(
            D.deflate64_fixed([("lit", b"xy"), ("match", 65538, 2)]), 100
        )
    with pytest.raises(ValueError, match="before stream start"):
        D.inflate64(D.deflate64_fixed([("match", 3, 5)]), 100)
    with pytest.raises(ValueError, match="reserved block"):
        D.inflate64(b"\x07\x00", 100)
    with pytest.raises(ValueError, match="LEN/NLEN"):
        D.inflate64(b"\x00\x05\x00\x00\x00", 100)
    with pytest.raises(ValueError):
        D.inflate64(b"", 100)
    # truncated mid-symbol
    blob = D.deflate64_fixed([("lit", b"hello world")])
    with pytest.raises(ValueError):
        D.inflate64(blob[:4], 100)


def test_zip_method9_roundtrip_and_bsdtar_structure():
    """Method-9 members extract with CRC verification; bsdtar's
    lister validates the container layout even though its build
    cannot extract Deflate64 (the documented interop boundary)."""
    import shutil
    import subprocess
    import tempfile

    members = [("big/doc.txt", b"lorem ipsum " * 5000),
               ("small.bin", bytes(range(256)))]
    z = A.build_zip(members, method="deflate64")
    out = A.parse_zip(z)
    rows = out["members"] if isinstance(out, dict) else out
    got = {m["path"]: m["payload"] for m in rows}
    for p, d in members:
        assert got[p] == d
    # corrupt stream → loud per-member error (CRC or inflate)
    bad = bytearray(z)
    body = z.index(b"PK\x03\x04") + 30 + len("big/doc.txt") + 5
    bad[body] ^= 0xFF
    with pytest.raises(ValueError):
        A.parse_zip(bytes(bad))
    if shutil.which("bsdtar"):
        with tempfile.NamedTemporaryFile(suffix=".zip") as f:
            f.write(z)
            f.flush()
            r = subprocess.run(["bsdtar", "-tf", f.name],
                               capture_output=True, text=True)
            assert r.returncode == 0
            assert sorted(r.stdout.split()) == ["big/doc.txt",
                                                "small.bin"]


@pytest.mark.parametrize("seed", range(3))
def test_deflate64_fuzz_never_uncatchable(seed):
    import random

    from rawdata_client_provider_gcs_spark.sources import deflate64 as D

    rng = random.Random(seed)
    base = D.deflate64_compress(b"fuzz me gently " * 400)
    for _ in range(200):
        buf = bytearray(base)
        mode = rng.randrange(3)
        if mode == 0:
            buf = buf[: rng.randrange(1, len(buf))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 4)):
                buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(buf))
            del buf[i : min(len(buf), i + rng.randrange(1, 16))]
        try:
            D.inflate64(bytes(buf), 1 << 20)
        except ValueError:
            pass


def test_zip_version_needed_per_method():
    """APPNOTE 4.4.3.2: Deflate64 members require extractor 2.1 (21);
    plain deflate stays at 20; zip64 (45) dominates (ADVICE r14)."""
    import struct as _s

    def _vers(blob):
        # local-header + central-directory version-needed fields
        lfh = blob.index(b"PK\x03\x04")
        cdh = blob.index(b"PK\x01\x02")
        return (
            _s.unpack("<H", blob[lfh + 4 : lfh + 6])[0],
            _s.unpack("<H", blob[cdh + 6 : cdh + 8])[0],
        )

    d64 = A.build_zip([("a.bin", b"x" * 64)], method="deflate64")
    assert _vers(d64) == (21, 21)
    d = A.build_zip([("a.bin", b"x" * 64)], method="deflate")
    assert _vers(d) == (20, 20)
    z64 = A.build_zip(
        [("a.bin", b"x" * 64)], method="deflate64", zip64=True
    )
    assert _vers(z64) == (45, 45)
    # and the in-repo reader still round-trips all three
    for blob in (d64, d, z64):
        assert A.parse_zip(blob)[0]["payload"] == b"x" * 64
