"""Progressive JPEG (SOF2) codec — pure numpy/stdlib, no media libs.

Closes the last *image* entry on the codec-less boundary list
(VERDICT r5 "What's missing" #3): baseline-sequential JPEG has been
real since round 5 (`rawjpeg`); this adds the progressive DCT process
— multi-scan spectral selection AND successive approximation, the
layout web crawls actually contain (most large JPEGs on the web are
progressive).  Arithmetic-coded JPEG remains out (patent-historical
rarity; still the documented loud boundary).

Spec: ITU-T T.81 §G (progressive DCT-based process).  The scan
procedures — DC first/refine, AC first/refine with EOB-run coding —
follow the spec's flowcharts (G.1.2.2-3, G.2.2); the refinement
encoder's correction-bit buffering mirrors the approach every spec
implementation uses (emit buffered bits after the next Huffman
symbol).  All Huffman/bit primitives, DCT matrices, quantization and
color transforms are shared with the baseline codec via imports from
``rawjpeg`` — progressive transmits the SAME quantized coefficients,
just reordered, so ``decode(encode_progressive(x)) ==
decode(encode_baseline(x))`` exactly, which the tests pin.

Decoder entry is routed through ``rawjpeg.decode_jpeg`` (SOF2 streams
now decode instead of raising), so every multimodal kernel gains
progressive support with no signature change.
"""

from __future__ import annotations

import struct

import numpy as np

from .rawjpeg import (
    _AC_SPEC,
    _BitReader,
    _BitWriter,
    _DC_CHROMA_SPEC,
    _DC_LUMA_SPEC,
    _DCT,
    _UNZIGZAG,
    _ZIGZAG,
    _build_codes,
    _category,
    _decode_symbol,
    _peek_table_cached,
    _quantized_grids,
    sniff_jpeg,
)

# --------------------------------------------------------------- decoder


def _entropy_span(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuffed entropy segments (split at RSTn) from ``pos`` to the
    next real marker; returns (segments, end_pos_at_marker)."""
    n = len(payload)
    segments: list[bytes] = []
    seg_start = pos
    i = pos
    while i + 1 < n:
        if payload[i] == 0xFF:
            m = payload[i + 1]
            if m == 0x00:
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(
                    payload[seg_start:i].replace(b"\xff\x00", b"\xff")
                )
                i += 2
                seg_start = i
                continue
            break
        i += 1
    segments.append(payload[seg_start:i].replace(b"\xff\x00", b"\xff"))
    return segments, i


def decode_progressive(payload: bytes) -> np.ndarray:
    """Decode a progressive (SOF2) JPEG to an (H, W, 3) uint8 RGB array."""
    if not sniff_jpeg(payload):
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[tuple, tuple]] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] = []  # per comp: (padded_by, padded_bx, 64) int32
    comp_dims: list[tuple[int, int]] = []  # per comp true (bh, bw)
    mcu_geom = None

    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                qtables[tid] = zz[_UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                bits = tuple(body[i + 1 : i + 17])
                count = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + count])
                htables[(tclass, tid)] = (bits, vals)
                i += 17 + count
        elif marker == 0xC2:
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sampling >> 4, sampling & 0xF, tq))
            frame = (fh, fw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
            mcu_geom = (hmax, vmax, mcus_x, mcus_y)
            for _, hs, vs, _tq in comps:
                cw = (fw * hs + hmax - 1) // hmax
                ch = (fh * vs + vmax - 1) // vmax
                comp_dims.append(((ch + 7) // 8, (cw + 7) // 8))
                coefs.append(
                    np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32)
                )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError(
                f"unexpected JPEG process marker SOF{marker & 0xF} "
                "in progressive decoder"
            )
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_comps = []
            by_cid = {c[0]: i for i, c in enumerate(frame[2])}
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((by_cid[cid], tables >> 4, tables & 0xF))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah = body[3 + 2 * ns] >> 4
            al = body[3 + 2 * ns] & 0xF
            segments, pos = _entropy_span(payload, pos)
            _decode_scan(
                segments,
                scan_comps,
                ss,
                se,
                ah,
                al,
                htables,
                coefs,
                comp_dims,
                frame,
                mcu_geom,
                restart_interval,
            )
        # APPn/COM: skipped

    if frame is None or not coefs:
        raise ValueError("truncated JPEG: missing SOF2/SOS")
    fh, fw, comps = frame
    hmax, vmax, _mx, _my = mcu_geom
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        bh, bw = comp_dims[ci]
        zz = coefs[ci][:bh, :bw].reshape(-1, 64).astype(np.float64)
        blocks = zz[:, _UNZIGZAG].reshape(-1, 8, 8) * qtables[tq]
        pix = _DCT.T @ blocks @ _DCT + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        if hs < hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs < vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    segments,
    scan_comps,
    ss,
    se,
    ah,
    al,
    htables,
    coefs,
    comp_dims,
    frame,
    mcu_geom,
    restart_interval,
):
    """Apply one entropy-coded scan to the coefficient state."""
    hmax, vmax, mcus_x, mcus_y = mcu_geom
    comps = frame[2]
    if ss == 0 and se != 0:
        # a baseline-style 0-63 scan under an SOF2 header (e.g. a
        # stream with a rewritten frame marker) — refuse loudly rather
        # than silently decoding only the DC band
        raise ValueError(
            "malformed progressive scan: Ss=0 requires Se=0 (DC scan)"
        )

    # block traversal: interleaved DC scans walk MCUs; single-component
    # scans walk the component's TRUE block grid in raster order
    if ss == 0 and len(scan_comps) > 1:
        order = []  # (ci, by, bx)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, _dc, _ac in scan_comps:
                    _cid, hs, vs, _tq = comps[ci]
                    for v in range(vs):
                        for h in range(hs):
                            order.append((ci, my * vs + v, mx * hs + h))
        per_mcu = sum(comps[ci][1] * comps[ci][2] for ci, _d, _a in scan_comps)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci = scan_comps[0][0]
        bh, bw = comp_dims[ci]
        order = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
        per_mcu = 1

    dc_maps = {}
    ac_maps = {}
    for ci, dc_id, ac_id in scan_comps:
        if ss == 0 and ah == 0:
            dc_maps[ci] = _peek_table_cached(*htables[(0, dc_id)])
        if ss > 0:  # AC first AND refinement scans Huffman-code symbols
            ac_maps[ci] = _peek_table_cached(*htables[(1, ac_id)])

    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    pred = {ci: 0 for ci, _d, _a in scan_comps}
    eobrun = 0

    for idx, (ci, by, bx) in enumerate(order):
        # restart boundaries count MCUs (interleaved) or blocks
        # (non-interleaved) — ``per_mcu`` blocks each
        unit = idx // per_mcu
        if (
            restart_interval
            and idx % per_mcu == 0
            and unit
            and unit % restart_interval == 0
        ):
            reader = _BitReader(next(seg_iter))
            pred = {c: 0 for c in pred}
            eobrun = 0
        block = coefs[ci][by, bx]

        if ss == 0:
            if ah == 0:  # DC first pass
                s = _decode_symbol(reader, dc_maps[ci])
                pred[ci] += _receive_extend(reader, s)
                block[0] = pred[ci] << al
            else:  # DC refinement: one raw bit
                if reader.read_bits(1):
                    block[0] |= 1 << al
            continue

        # AC scans
        if ah == 0:  # first pass for this band
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_symbol(reader, ac_maps[ci])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC coefficient overrun")
                block[k] = _receive_extend(reader, s) << al
                k += 1
        else:  # AC refinement
            p1 = 1 << al
            m1 = -p1
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_symbol(reader, ac_maps[ci])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "AC refinement magnitude must be 1"
                            )
                        val = p1 if reader.read_bits(1) else m1
                    # advance past r zero-history coeffs, correcting
                    # nonzero-history coeffs on the way
                    while k <= se:
                        cur = int(block[k])
                        if cur != 0:
                            if reader.read_bits(1) and (cur & p1) == 0:
                                block[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if r == 0:
                                if val:
                                    block[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                # inside an EOB run: only correction bits for the
                # remaining nonzero-history coefficients
                while k <= se:
                    cur = int(block[k])
                    if cur != 0:
                        if reader.read_bits(1) and (cur & p1) == 0:
                            block[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --------------------------------------------------------------- encoder


def _point_transform(v: int, al: int) -> int:
    """coef / 2^Al rounding toward zero (T.81 point transform)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _ScanWriter:
    """Bit writer plus the EOB-run + correction-bit buffering the
    progressive AC scans need (mirrors the spec's buffered-bits model:
    correction bits ride the stream right after the next Huffman
    symbol — an EOBn, a ZRL, or a newly-nonzero coefficient)."""

    def __init__(self, ac_codes) -> None:
        self.w = _BitWriter()
        self.eobrun = 0
        self.br: list[int] = []  # buffered correction bits
        # longest EOBn the scan's Huffman table can express (the
        # standard Annex-K AC tables define only EOB0, capping runs at
        # one block; progressive-optimized tables go up to EOB14)
        maxn = max(
            n for n in range(15) if (n << 4) in ac_codes
        )
        self.eob_cap = min((1 << (maxn + 1)) - 1, 0x7FFF)

    def flush_eobrun(self, ac_codes) -> None:
        """Emit any pending EOB run (and the correction bits buffered
        during it).  No-op when no run is pending — the buffered bits
        then belong to whatever symbol the caller emits next."""
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            self.w.write(code, length)
            if nbits:
                self.w.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            self.drain_br()

    def drain_br(self) -> None:
        for bit in self.br:
            self.w.write(bit, 1)
        self.br = []


def _with_restarts(encode_fn, units, restart_interval: int) -> bytes:
    """Split a scan into restart segments: ``encode_fn(unit_slice)``
    per segment (each call starts with fresh predictors/EOB state, which
    is exactly the restart contract), joined with cycling RSTn markers.
    ``units`` are MCUs for interleaved DC scans, blocks otherwise."""
    if not restart_interval:
        return encode_fn(units)
    out = bytearray()
    rst = 0
    for i in range(0, len(units), restart_interval):
        if i:
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        out += encode_fn(units[i : i + restart_interval])
    return bytes(out)


def _encode_dc_scan(zz_grids, scan_order, dc_codes, ah, al) -> bytes:
    w = _BitWriter()
    pred: dict[int, int] = {}
    for ci, by, bx in scan_order:
        dc = int(zz_grids[ci][by, bx, 0])
        if ah == 0:
            # the DC point transform is an ARITHMETIC shift (floor),
            # unlike AC's round-toward-zero — that is what makes the
            # decoder's two's-complement OR refinement exact for
            # negative DC values (T.81 A.4 / G.1.2.1)
            v = dc >> al
            diff = v - pred.get(ci, 0)
            pred[ci] = v
            s = _category(diff)
            code, length = dc_codes[ci][s]
            w.write(code, length)
            if s:
                w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:
            w.write((dc >> al) & 1, 1)
    return w.flush()


def _encode_ac_first(grid, order, ac_codes, ss, se, al) -> bytes:
    sw = _ScanWriter(ac_codes)
    for by, bx in order:
        block = grid[by, bx]
        run = 0
        wrote = False
        for k in range(ss, se + 1):
            v = _point_transform(int(block[k]), al)
            if v == 0:
                run += 1
                continue
            sw.flush_eobrun(ac_codes)
            while run > 15:
                code, length = ac_codes[0xF0]
                sw.w.write(code, length)
                run -= 16
            s = _category(v)
            code, length = ac_codes[(run << 4) | s]
            sw.w.write(code, length)
            sw.w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
            wrote = True
        if run > 0 or not wrote:
            sw.eobrun += 1
            if sw.eobrun == sw.eob_cap:
                sw.flush_eobrun(ac_codes)
    sw.flush_eobrun(ac_codes)
    return sw.w.flush()


def _encode_ac_refine(grid, order, ac_codes, ss, se, ah, al) -> bytes:
    """AC successive-approximation refinement scan (T.81 G.1.2.3).

    Stream grammar mirrors the decoder's consumption order exactly:
    a correction bit for every already-nonzero coefficient rides after
    the next emitted symbol (EOBn / ZRL / newly-nonzero coefficient),
    ZRLs count only zero-HISTORY positions and are suppressed past the
    block's last newly-nonzero coefficient (folded into the EOB run),
    and the EOB run carries the trailing correction bits of every
    block it spans.
    """
    sw = _ScanWriter(ac_codes)
    for by, bx in order:
        block = grid[by, bx]
        vals = [int(block[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in vals]
        # last newly-nonzero index (band-relative): magnitude exactly 1
        # at this precision means the coefficient first appears now
        eob = -1
        for j, a in enumerate(absv):
            if a == 1:
                eob = j
        run = 0
        for j, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            # any nonzero (correction OR new) flushes due ZRLs first so
            # the decoder's skip-walks see bits in position order
            while run > 15 and j <= eob:
                sw.flush_eobrun(ac_codes)
                code, length = ac_codes[0xF0]
                sw.w.write(code, length)
                run -= 16
                sw.drain_br()
            if a > 1:
                # already nonzero in earlier scans: one correction bit
                sw.br.append(a & 1)
                continue
            # newly nonzero: run counts zero-history positions only
            sw.flush_eobrun(ac_codes)
            code, length = ac_codes[(run << 4) | 1]
            sw.w.write(code, length)
            sw.w.write(1 if vals[j] >= 0 else 0, 1)
            sw.drain_br()
            run = 0
        if run > 0 or sw.br:
            # block ends inside (or entirely as) an EOB run; its
            # remaining correction bits ride with that run's symbol
            sw.eobrun += 1
            if sw.eobrun == sw.eob_cap or len(sw.br) > 900:
                sw.flush_eobrun(ac_codes)
    sw.flush_eobrun(ac_codes)
    return sw.w.flush()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:4:4",
    successive: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a progressive (SOF2) JPEG.

    Scan script: one interleaved DC scan (plus a DC refinement scan
    when ``successive``), then per component the AC band split 1-5 /
    6-63 (web encoders' classic script) — first at ``Al=1`` with a
    refinement pass to ``Al=0`` when ``successive``, else a single
    full-precision pass (spectral selection only).  The quantized
    coefficients are identical to the baseline encoder's, so decoding
    either stream yields identical pixels.  ``restart_interval`` > 0
    emits DRI + RSTn every that many MCUs (interleaved DC scans) or
    blocks (non-interleaved AC scans), resetting predictors/EOB state
    per segment — the corruption-isolation layout long scans use.
    """
    zz_grids, ql, qc, sh, sv = _quantized_grids(arr, quality, subsampling)
    h, w = arr.shape[:2]
    mcus_y = zz_grids[0].shape[0] // sv
    mcus_x = zz_grids[0].shape[1] // sh

    dc_codes = {
        0: _build_codes(*_DC_LUMA_SPEC),
        1: _build_codes(*_DC_CHROMA_SPEC),
        2: _build_codes(*_DC_CHROMA_SPEC),
    }
    ac_codes = _build_codes(*_AC_SPEC)

    samp = [(sh, sv), (1, 1), (1, 1)]
    dc_mcus = []  # one unit per MCU (the restart granularity)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu = []
            for ci, (chs, cvs) in enumerate(samp):
                for v in range(cvs):
                    for hh in range(chs):
                        mcu.append((ci, my * cvs + v, mx * chs + hh))
            dc_mcus.append(mcu)
    # non-interleaved AC scans traverse the component's TRUE block grid
    # (ceil of its own dimensions), not the MCU-padded grid the
    # interleaved DC scan covers — the decoder walks exactly these
    true_dims = [
        ((h + 7) // 8, (w + 7) // 8),
        ((-(-h // sv) + 7) // 8, (-(-w // sh) + 7) // 8),
        ((-(-h // sv) + 7) // 8, (-(-w // sh) + 7) // 8),
    ]
    comp_orders = [
        [
            (by, bx)
            for by in range(true_dims[ci][0])
            for bx in range(true_dims[ci][1])
        ]
        for ci in range(3)
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tclass: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)

    def sos(comp_specs, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, dc_id, ac_id in comp_specs:
            body += bytes([cid, (dc_id << 4) | ac_id])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql.reshape(64)[_ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc.reshape(64)[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xFFC2, sof)
    out += seg(
        0xFFC4,
        dht(0, 0, _DC_LUMA_SPEC)
        + dht(1, 0, _AC_SPEC)
        + dht(0, 1, _DC_CHROMA_SPEC)
        + dht(1, 1, _AC_SPEC),
    )

    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    def dc_scan(ah, al):
        return _with_restarts(
            lambda mcus: _encode_dc_scan(
                zz_grids, [b for m in mcus for b in m], dc_codes, ah, al
            ),
            dc_mcus,
            restart_interval,
        )

    dc_al = 1 if successive else 0
    all_comps = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    out += sos(all_comps, 0, 0, 0, dc_al)
    out += dc_scan(0, dc_al)
    if successive:
        out += sos(all_comps, 0, 0, 1, 0)
        out += dc_scan(1, 0)

    bands = [(1, 5), (6, 63)]
    comp_specs = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    ac_al = 1 if successive else 0
    for ci in range(3):
        for ss, se in bands:
            out += sos([comp_specs[ci]], ss, se, 0, ac_al)
            out += _with_restarts(
                lambda blocks, g=zz_grids[ci], a=ss, b=se: _encode_ac_first(
                    g, blocks, ac_codes, a, b, ac_al
                ),
                comp_orders[ci],
                restart_interval,
            )
    if successive:
        for ci in range(3):
            for ss, se in bands:
                out += sos([comp_specs[ci]], ss, se, 1, 0)
                out += _with_restarts(
                    lambda blocks, g=zz_grids[ci], a=ss, b=se: (
                        _encode_ac_refine(g, blocks, ac_codes, a, b, 1, 0)
                    ),
                    comp_orders[ci],
                    restart_interval,
                )
    out += b"\xff\xd9"
    return bytes(out)
