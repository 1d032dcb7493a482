"""Lossy WebP (VP8 key-frame intra) decoder — RFC 6386.

The majority of real-world ``.webp`` bytes are LOSSY (``VP8 `` chunks):
transform-coded intra frames.  This module decodes key frames — the
only frame type a still WebP contains — completely in pure numpy:

- the boolean (binary arithmetic) entropy coder (RFC 6386 §7), both
  directions: the decoder for the read path and an encoder used by the
  fixture writer;
- uncompressed frame tag + key-frame start code + dimensions (§9.1);
- the compressed header: segmentation, loop-filter parameters, token
  partitions, quantizer indices, and coefficient-probability updates
  (§9.2-§9.11, §13.4);
- per-macroblock intra mode decoding with the key-frame trees
  (§11.2-§11.5), including B_PRED sub-block modes conditioned on the
  above/left sub-modes;
- DCT/WHT token decoding with band/context tracking (§13), dequant
  (§14.1), the inverse Walsh-Hadamard (§14.2) and inverse DCT (§14.3)
  in exact integer arithmetic;
- intra prediction: 16×16 and chroma DC/V/H/TM with the 127/129
  border conventions, and all ten 4×4 B modes with the above-right
  rules (§12);
- the in-loop deblocking filter, normal and simple profiles, with
  per-segment/per-mode level adjustments (§15).

Output is YUV 4:2:0 planes; :func:`yuv420_to_rgb` converts with the
classic BT.601 studio-range integer matrix and 2×2 chroma replication.

Verification honesty (the FLAC/VP8L discipline, plus one caveat): every
MECHANISM here is pinned offline — bool-coder roundtrips, closed-form
DC-only transforms, per-mode predictor unit tests, loop-filter vectors,
and an encode→decode fixture whose pixel values a DuckDB oracle
restates in closed form.  The one piece offline tests cannot reach is
the EMPIRICAL constants: the default/update coefficient probabilities
and key-frame B-mode probabilities (§13.4-§13.5, §11.4) are transcribed
from the RFC; a transcription slip would desynchronize the entropy
decode of third-party files while leaving every fixture green (encoder
and decoder share the tables).  ``tests/test_vp8.py`` therefore carries
a Pillow-gated parity test that lights up on any environment with PIL
installed (this container has none).

Scope boundary: inter frames (P-frames — impossible in still WebP) and
the VP8X ``ALPH`` alpha channel are out of scope; files needing them
raise :class:`~.rawavi.UnsupportedCodecError` per row.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); image
decoding belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

import numpy as np

from .rawavi import UnsupportedCodecError

#: hard cap on decoded pixel count (same guard as rawtiff/rawwebp)
_MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------------
# Constant tables (RFC 6386).  The trees/scan/quant tables are structural
# and pinned by unit tests; the probability tables are empirical — see the
# module docstring for the verification caveat.
# ---------------------------------------------------------------------------

# §14.1 quantizer lookups, index 0..127
DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]

AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

# §13.3 zigzag scan order and coefficient→band map
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
COEF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# §13.2 token alphabet
DCT_0, DCT_1, DCT_2, DCT_3, DCT_4 = 0, 1, 2, 3, 4
CAT1, CAT2, CAT3, CAT4, CAT5, CAT6 = 5, 6, 7, 8, 9, 10
DCT_EOB = 11

COEF_TREE = [
    -DCT_EOB, 2,
    -DCT_0, 4,
    -DCT_1, 6,
    8, 12,
    -DCT_2, 10,
    -DCT_3, -DCT_4,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
]

# extra-bit probabilities and base values per category (§13.2)
CAT_PROBS = {
    CAT1: [159],
    CAT2: [165, 145],
    CAT3: [173, 148, 140],
    CAT4: [176, 155, 140, 135],
    CAT5: [180, 157, 141, 134, 130],
    CAT6: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
}
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}

# §11.2 intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
(
    B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
    B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED,
) = range(10)

KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROBS = [145, 156, 163, 128]

UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROBS = [142, 114, 183]

BMODE_TREE = [
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
]

MB_SEGMENT_TREE = [2, 4, -0, -1, -2, -3]

#: sub-mode a WHOLE-block-predicted MB presents to a B_PRED neighbor's
#: mode-probability context (RFC 6386 §11.3 / libvpx above_block_mode):
#: DC->B_DC, V->B_VE, H->B_HE, TM->B_TM.  Using B_DC for every
#: non-B_PRED neighbor desynchronizes the entropy decode of real files.
IMPLIED_B_MODE = {
    DC_PRED: B_DC_PRED,
    V_PRED: B_VE_PRED,
    H_PRED: B_HE_PRED,
    TM_PRED: B_TM_PRED,
}


# §13.5 default coefficient probabilities [block_type][band][ctx][11].
# Block types: 0 = Y after Y2 (coefs 1..15), 1 = Y2, 2 = chroma,
# 3 = Y with DC (no Y2).
DEFAULT_COEF_PROBS = [
    [  # block type 0
        [[128] * 11, [128] * 11, [128] * 11],
        [[253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
         [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
         [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128]],
        [[1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128],
         [181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128],
         [78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128]],
        [[1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128],
         [184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128],
         [77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128]],
        [[1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128],
         [170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128],
         [37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128]],
        [[1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128],
         [207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128],
         [102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128]],
        [[1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128],
         [177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128],
         [80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128]],
        [[1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128],
         [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [75, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 1 (Y2)
        [[198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62],
         [131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1],
         [68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128]],
        [[1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128],
         [184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128],
         [81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128]],
        [[1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128],
         [99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128],
         [23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128]],
        [[1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128],
         [109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128],
         [44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128]],
        [[1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128],
         [94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128],
         [22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128]],
        [[1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128],
         [124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128],
         [35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128]],
        [[1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128],
         [121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128],
         [45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128]],
        [[1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128],
         [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128]],
    ],
    [  # block type 2 (chroma)
        [[253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128],
         [175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128],
         [73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128]],
        [[1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128],
         [239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128],
         [155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128]],
        [[1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128],
         [201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128],
         [69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128]],
        [[1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128],
         [141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128],
         [149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128],
         [213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128],
         [55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[128] * 11, [128] * 11, [128] * 11],
    ],
    [  # block type 3 (Y with DC)
        [[202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255],
         [126, 38, 166, 203, 165, 165, 171, 151, 255, 255, 128],
         [61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128]],
        [[1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128],
         [166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128],
         [39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128]],
        [[1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128],
         [124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128],
         [24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128]],
        [[1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128],
         [149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128],
         [28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128]],
        [[1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128],
         [123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128],
         [20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128]],
        [[1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128],
         [168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128],
         [47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128]],
        [[1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128],
         [141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128],
         [42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128]],
        [[1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
]

# §13.4 coefficient-probability update probabilities (same shape).
_W = [255] * 11


def _u(*vals):
    return list(vals) + [255] * (11 - len(vals))


COEF_UPDATE_PROBS = [
    [
        [_W[:], _W[:], _W[:]],
        [_u(176, 246), _u(223, 241, 252), _u(249, 253, 253, 254)],
        [_u(255, 244, 252), _u(234, 254, 254), _u(253, 255, 254, 254)],
        [_u(255, 246, 254), _u(239, 253, 254), _u(254, 255, 254)],
        [_u(255, 248, 254), _u(251, 255, 254), _W[:]],
        [_u(255, 253, 254), _u(251, 254, 254), _u(254, 255, 254)],
        [_u(255, 254, 253, 255, 254), _u(250, 255, 254, 255, 254), _W[:]],
        [_W[:], _W[:], _W[:]],
    ],
    [
        [_u(217), _u(225, 252, 241, 253, 255, 255, 254),
         _u(234, 250, 241, 250, 253, 255, 253, 254)],
        [_u(255, 254), _u(223, 254, 254), _u(238, 253, 254, 254)],
        [_u(255, 248, 254), _u(249, 254), _W[:]],
        [_u(255, 253), _u(247, 254), _W[:]],
        [_u(255, 253, 254), _u(252), _W[:]],
        [_u(255, 254, 254), _u(253), _W[:]],
        [_u(255, 254), _u(254), _W[:]],
        [_W[:], _W[:], _W[:]],
    ],
    [
        [_u(186), _u(234, 251, 244, 254),
         _u(251, 251, 243, 253, 254, 255, 254)],
        [_u(255, 253, 254), _u(236, 253, 254), _u(251, 253, 253, 254, 254)],
        [_u(255, 254, 254), _u(254, 254, 254), _u(254, 254, 254)],
        [_u(255, 254), _u(254, 254), _u(254, 255, 254)],
        [_W[:], _u(254, 255, 254), _W[:]],
        [_W[:], _u(254, 255, 254), _W[:]],
        [_W[:], _W[:], _W[:]],
        [_W[:], _W[:], _W[:]],
    ],
    [
        [_u(248), _u(250, 254, 252, 254), _u(248, 254, 249, 253)],
        [_u(255, 253, 253), _u(246, 253, 253), _u(252, 254, 251, 254, 254)],
        [_u(255, 254, 252), _u(248, 254, 253), _u(253, 255, 254, 254)],
        [_u(255, 251, 254), _u(245, 251, 254), _u(253, 255, 254)],
        [_u(255, 251, 253), _u(252, 253, 254), _u(255, 254)],
        [_u(255, 252), _u(249, 255, 254), _u(255, 255, 254)],
        [_u(255, 255, 253), _u(250), _u(254)],
        [_W[:], _W[:], _W[:]],
    ],
]

# §11.4 key-frame B-mode probabilities [above_mode][left_mode][9].
KF_BMODE_PROBS = [
    [[231, 120, 48, 89, 115, 113, 120, 152, 112],
     [152, 179, 64, 126, 170, 118, 46, 70, 95],
     [175, 69, 143, 80, 85, 82, 72, 155, 103],
     [56, 58, 10, 171, 218, 189, 17, 13, 152],
     [144, 71, 10, 38, 171, 213, 144, 34, 26],
     [114, 26, 17, 163, 44, 195, 21, 10, 173],
     [121, 24, 80, 195, 26, 62, 44, 64, 85],
     [170, 46, 55, 19, 136, 160, 33, 206, 71],
     [63, 20, 8, 114, 114, 208, 12, 9, 226],
     [81, 40, 11, 96, 182, 84, 29, 16, 36]],
    [[134, 183, 89, 137, 98, 101, 106, 165, 148],
     [72, 187, 100, 130, 157, 111, 32, 75, 80],
     [66, 102, 167, 99, 74, 62, 40, 234, 128],
     [41, 53, 9, 178, 241, 141, 26, 8, 107],
     [104, 79, 12, 27, 217, 255, 87, 17, 7],
     [74, 43, 26, 146, 73, 166, 49, 23, 157],
     [65, 38, 105, 160, 51, 52, 31, 115, 128],
     [87, 68, 71, 44, 114, 51, 15, 186, 23],
     [47, 41, 14, 110, 182, 183, 21, 17, 194],
     [66, 45, 25, 102, 197, 189, 23, 18, 22]],
    [[88, 88, 147, 150, 42, 46, 45, 196, 205],
     [43, 97, 183, 117, 85, 38, 35, 179, 61],
     [39, 53, 200, 87, 26, 21, 43, 232, 171],
     [56, 34, 51, 104, 114, 102, 29, 93, 77],
     [107, 54, 32, 26, 51, 1, 81, 43, 31],
     [39, 28, 85, 171, 58, 165, 90, 98, 64],
     [34, 22, 116, 206, 23, 34, 43, 166, 73],
     [68, 25, 106, 22, 64, 171, 36, 225, 114],
     [34, 19, 21, 102, 132, 188, 16, 76, 124],
     [62, 18, 78, 95, 85, 57, 50, 48, 51]],
    [[193, 101, 35, 159, 215, 111, 89, 46, 111],
     [60, 148, 31, 172, 219, 228, 21, 18, 111],
     [112, 113, 77, 85, 179, 255, 38, 120, 114],
     [40, 42, 1, 196, 245, 209, 10, 25, 109],
     [100, 80, 8, 43, 154, 1, 51, 26, 71],
     [88, 43, 29, 140, 166, 213, 37, 43, 154],
     [61, 63, 30, 155, 67, 45, 68, 1, 209],
     [142, 78, 78, 16, 255, 128, 34, 197, 171],
     [41, 40, 5, 102, 211, 183, 4, 1, 221],
     [51, 50, 17, 168, 209, 192, 23, 25, 82]],
    [[125, 98, 42, 88, 104, 85, 117, 175, 82],
     [95, 84, 53, 89, 128, 100, 113, 101, 45],
     [75, 79, 123, 47, 51, 128, 81, 171, 1],
     [57, 17, 5, 71, 102, 57, 53, 41, 49],
     [115, 21, 2, 10, 102, 255, 166, 23, 6],
     [38, 33, 13, 121, 57, 73, 26, 1, 85],
     [41, 10, 67, 138, 77, 110, 90, 47, 114],
     [101, 29, 16, 10, 85, 128, 101, 196, 26],
     [57, 18, 10, 102, 102, 213, 34, 20, 43],
     [117, 20, 15, 36, 163, 128, 68, 1, 26]],
    [[138, 31, 36, 171, 27, 166, 38, 44, 229],
     [67, 87, 58, 169, 82, 115, 26, 59, 179],
     [63, 59, 90, 180, 59, 166, 93, 73, 154],
     [40, 40, 21, 116, 143, 209, 34, 39, 175],
     [57, 46, 22, 24, 128, 1, 54, 17, 37],
     [47, 15, 16, 183, 34, 223, 49, 45, 183],
     [46, 17, 33, 183, 6, 98, 15, 32, 183],
     [65, 32, 73, 115, 28, 128, 23, 128, 205],
     [40, 3, 9, 115, 51, 192, 18, 6, 223],
     [87, 37, 9, 115, 59, 77, 64, 21, 47]],
    [[104, 55, 44, 218, 9, 54, 53, 130, 226],
     [64, 90, 70, 205, 40, 41, 23, 26, 57],
     [54, 57, 112, 184, 5, 41, 38, 166, 213],
     [30, 34, 26, 133, 152, 116, 10, 32, 134],
     [75, 32, 12, 51, 192, 255, 160, 43, 51],
     [39, 19, 53, 221, 26, 114, 32, 73, 255],
     [31, 9, 65, 234, 2, 15, 1, 118, 73],
     [88, 31, 35, 67, 102, 85, 55, 186, 85],
     [56, 21, 23, 111, 59, 205, 45, 37, 192],
     [55, 38, 70, 124, 73, 102, 1, 34, 98]],
    [[102, 61, 71, 37, 34, 53, 31, 243, 192],
     [69, 60, 71, 38, 73, 119, 28, 222, 37],
     [68, 45, 128, 34, 1, 47, 11, 245, 147],
     [62, 17, 19, 70, 146, 85, 55, 62, 70],
     [75, 15, 9, 9, 64, 255, 184, 119, 16],
     [37, 43, 37, 154, 100, 163, 85, 160, 1],
     [63, 9, 92, 136, 28, 64, 32, 201, 85],
     [86, 6, 28, 5, 64, 255, 25, 248, 1],
     [56, 8, 17, 132, 137, 255, 55, 116, 128],
     [86, 27, 28, 148, 186, 128, 95, 54, 49]],
    [[164, 50, 31, 137, 154, 133, 25, 35, 218],
     [51, 103, 44, 131, 131, 123, 31, 6, 158],
     [86, 40, 64, 135, 148, 224, 45, 183, 128],
     [22, 26, 17, 131, 240, 154, 14, 1, 209],
     [83, 12, 13, 54, 192, 255, 68, 47, 28],
     [45, 16, 21, 91, 64, 222, 7, 1, 197],
     [56, 21, 39, 155, 60, 138, 23, 102, 213],
     [85, 26, 85, 85, 128, 128, 32, 146, 171],
     [18, 11, 7, 63, 144, 171, 4, 4, 246],
     [35, 27, 10, 146, 174, 171, 12, 26, 128]],
    [[190, 80, 35, 99, 180, 80, 126, 54, 45],
     [85, 126, 47, 87, 176, 51, 41, 20, 32],
     [101, 75, 128, 139, 118, 146, 116, 128, 85],
     [56, 41, 15, 176, 236, 85, 37, 9, 62],
     [146, 36, 19, 30, 171, 255, 97, 27, 20],
     [71, 30, 17, 119, 118, 255, 17, 18, 138],
     [101, 38, 60, 138, 55, 70, 43, 26, 142],
     [138, 45, 61, 62, 219, 1, 81, 188, 64],
     [32, 41, 20, 117, 151, 142, 20, 21, 163],
     [112, 19, 12, 61, 195, 128, 48, 4, 24]],
]


# ---------------------------------------------------------------------------
# Boolean entropy coder (§7)
# ---------------------------------------------------------------------------


class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder (libvpx dboolhuff pairing).

    Reads past the nominal end pad zeros, as the spec's decoder does —
    a hostile truncated stream therefore decodes *something*; all
    structural bounds (MB counts, coefficient positions) are enforced
    by the callers, so the decode always terminates.
    """

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def decode(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.decode(128) else v

    def flagged_delta(self, nbits: int) -> int:
        """The header's ``flag ? signed-literal : 0`` idiom."""
        return self.signed_literal(nbits) if self.decode(128) else 0

    def tree(self, tree: list[int], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.decode(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 §7.2-style boolean encoder (carry-propagating byte
    output); used by the fixture writer only."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def encode(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.encode((value >> i) & 1, 128)

    def signed_literal(self, value: int, nbits: int) -> None:
        self.literal(abs(value), nbits)
        self.encode(1 if value < 0 else 0, 128)

    def flagged_delta(self, value: int, nbits: int) -> None:
        if value:
            self.encode(1, 128)
            self.signed_literal(value, nbits)
        else:
            self.encode(0, 128)

    def tree(self, tree: list[int], probs, token: int, start: int = 0) -> None:
        # walk the tree to the leaf, emitting the branch bits
        path = _tree_path(tree, token, start)
        for node, bit in path:
            self.encode(bit, probs[node >> 1])

    def getvalue(self) -> bytes:
        # libvpx's vp8_stop_encode: 32 zero-bools at p=128 flush every
        # in-flight payload bit through the byte emitter
        for _ in range(32):
            self.encode(0, 128)
        return bytes(self.out)


def _tree_path(tree: list[int], token: int, start: int = 0):
    """(node, bit) path from ``start`` to leaf ``-token`` (depth-first)."""
    target = -token

    def walk(i, path):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == target and nxt <= 0:
                return path + [(i, bit)]
            if nxt > 0:
                r = walk(nxt, path + [(i, bit)])
                if r is not None:
                    return r
        return None

    r = walk(start, [])
    if r is None:
        raise ValueError(f"vp8: token {token} unreachable from node {start}")
    return r


# ---------------------------------------------------------------------------
# Inverse transforms (§14.2-§14.3) — exact integer arithmetic
# ---------------------------------------------------------------------------

_COS_K = 20091  # cospi8sqrt2 - 1, Q16
_SIN_K = 35468  # sinpi8sqrt2, Q16


def inverse_dct4x4(block) -> np.ndarray:
    """§14.3 inverse DCT; input natural-order (16,) int array, output
    (4, 4) residual to add to the prediction (the +4>>3 is inside)."""
    ip = [int(v) for v in block]
    # exact shortcuts (the overwhelmingly common cases in real frames;
    # the full butterfly reduces to these identically — pinned by
    # test_idct_dc_only_is_shift and the float-basis test):
    if not any(ip[1:]):
        return np.full((4, 4), (ip[0] + 4) >> 3, np.int32)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 8]
        b1 = ip[i] - ip[i + 8]
        t1 = (ip[i + 4] * _SIN_K) >> 16
        t2 = ip[i + 12] + ((ip[i + 12] * _COS_K) >> 16)
        c1 = t1 - t2
        t1 = ip[i + 4] + ((ip[i + 4] * _COS_K) >> 16)
        t2 = (ip[i + 12] * _SIN_K) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = np.empty((4, 4), np.int32)
    for i in range(4):
        r = tmp[4 * i : 4 * i + 4]
        a1 = r[0] + r[2]
        b1 = r[0] - r[2]
        t1 = (r[1] * _SIN_K) >> 16
        t2 = r[3] + ((r[3] * _COS_K) >> 16)
        c1 = t1 - t2
        t1 = r[1] + ((r[1] * _COS_K) >> 16)
        t2 = (r[3] * _SIN_K) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def inverse_wht4x4(block) -> np.ndarray:
    """§14.2 inverse Walsh-Hadamard for the Y2 block; returns the 16
    luma-subblock DC values in raster order as a (4, 4) int array."""
    ip = [int(v) for v in block]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[i + 12]
        b1 = ip[i + 4] + ip[i + 8]
        c1 = ip[i + 4] - ip[i + 8]
        d1 = ip[i] - ip[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = np.empty((4, 4), np.int32)
    for i in range(4):
        r = tmp[4 * i : 4 * i + 4]
        a1 = r[0] + r[3]
        b1 = r[1] + r[2]
        c1 = r[1] - r[2]
        d1 = r[0] - r[3]
        out[i, 0] = (a1 + b1 + 3) >> 3
        out[i, 1] = (c1 + d1 + 3) >> 3
        out[i, 2] = (a1 - b1 + 3) >> 3
        out[i, 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (§12).  Planes are padded: one 127 row above (also
# covering the above-right extension and the top-left corner), one 129
# column on the left; the right edge is extended by replication after
# each reconstructed macroblock row — exactly the libvpx border setup.
# ---------------------------------------------------------------------------


def _predict_block_dc(plane, y, x, size, have_above, have_left) -> int:
    if have_above and have_left:
        s = int(plane[y - 1, x : x + size].sum()) + int(
            plane[y : y + size, x - 1].sum()
        )
        return (s + size) >> (4 if size == 8 else 5)
    if have_above:
        s = int(plane[y - 1, x : x + size].sum())
        return (s + size // 2) >> (3 if size == 8 else 4)
    if have_left:
        s = int(plane[y : y + size, x - 1].sum())
        return (s + size // 2) >> (3 if size == 8 else 4)
    return 128


def predict_mb(plane, y, x, size, mode, have_above, have_left) -> np.ndarray:
    """16×16 luma / 8×8 chroma whole-block prediction (§12.2)."""
    if mode == DC_PRED:
        return np.full((size, size), _predict_block_dc(
            plane, y, x, size, have_above, have_left), np.int32)
    if mode == V_PRED:
        return np.tile(plane[y - 1, x : x + size].astype(np.int32), (size, 1))
    if mode == H_PRED:
        return np.tile(
            plane[y : y + size, x - 1].astype(np.int32)[:, None], (1, size)
        )
    if mode == TM_PRED:
        left = plane[y : y + size, x - 1].astype(np.int32)[:, None]
        above = plane[y - 1, x : x + size].astype(np.int32)[None, :]
        tl = int(plane[y - 1, x - 1])
        return np.clip(left + above - tl, 0, 255)
    raise ValueError(f"vp8: bad whole-block intra mode {mode}")


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def predict_b(mode: int, A, AR, L, P) -> np.ndarray:
    """4×4 B-mode prediction (§12.3).

    ``A``: 4 above pixels, ``AR``: 4 above-right, ``L``: 4 left,
    ``P``: the above-left pixel — all plain ints.
    """
    out = np.empty((4, 4), np.int64)
    a = list(A) + list(AR)
    if mode == B_DC_PRED:
        out[:] = (sum(A) + sum(L) + 4) >> 3
    elif mode == B_TM_PRED:
        l_ = np.asarray(L, np.int64)[:, None]
        a_ = np.asarray(A, np.int64)[None, :]
        out[:] = np.clip(l_ + a_ - P, 0, 255)
    elif mode == B_VE_PRED:
        e = [P] + list(A) + [AR[0]]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        out[:] = np.asarray(row, np.int64)[None, :]
    elif mode == B_HE_PRED:
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        out[:] = np.asarray(col, np.int64)[:, None]
    elif mode == B_LD_PRED:
        v = [_avg3(a[i], a[i + 1], a[i + 2]) for i in range(6)]
        v.append(_avg3(a[6], a[7], a[7]))
        for r in range(4):
            for c in range(4):
                out[r, c] = v[r + c]
    elif mode in (B_RD_PRED, B_VR_PRED, B_HD_PRED):
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        if mode == B_RD_PRED:
            v = [_avg3(pp[i], pp[i + 1], pp[i + 2]) for i in range(7)]
            for r in range(4):
                for c in range(4):
                    out[r, c] = v[c - r + 3]
        elif mode == B_VR_PRED:
            out[0, 0] = _avg2(pp[4], pp[5])
            out[0, 1] = _avg2(pp[5], pp[6])
            out[0, 2] = _avg2(pp[6], pp[7])
            out[0, 3] = _avg2(pp[7], pp[8])
            out[1, 0] = _avg3(pp[3], pp[4], pp[5])
            out[1, 1] = _avg3(pp[4], pp[5], pp[6])
            out[1, 2] = _avg3(pp[5], pp[6], pp[7])
            out[1, 3] = _avg3(pp[6], pp[7], pp[8])
            out[2, 0] = _avg3(pp[2], pp[3], pp[4])
            out[2, 1:] = out[0, :3]
            out[3, 0] = _avg3(pp[1], pp[2], pp[3])
            out[3, 1:] = out[1, :3]
        else:  # B_HD_PRED
            out[3, 0] = _avg2(pp[0], pp[1])
            out[3, 1] = _avg3(pp[0], pp[1], pp[2])
            out[2, 0] = out[3, 2] = _avg2(pp[1], pp[2])
            out[2, 1] = out[3, 3] = _avg3(pp[1], pp[2], pp[3])
            out[1, 0] = out[2, 2] = _avg2(pp[2], pp[3])
            out[1, 1] = out[2, 3] = _avg3(pp[2], pp[3], pp[4])
            out[0, 0] = out[1, 2] = _avg2(pp[3], pp[4])
            out[0, 1] = out[1, 3] = _avg3(pp[3], pp[4], pp[5])
            out[0, 2] = _avg3(pp[4], pp[5], pp[6])
            out[0, 3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == B_VL_PRED:
        out[0, 0] = _avg2(a[0], a[1])
        out[0, 1] = _avg2(a[1], a[2])
        out[0, 2] = _avg2(a[2], a[3])
        out[0, 3] = _avg2(a[3], a[4])
        out[1, 0] = _avg3(a[0], a[1], a[2])
        out[1, 1] = _avg3(a[1], a[2], a[3])
        out[1, 2] = _avg3(a[2], a[3], a[4])
        out[1, 3] = _avg3(a[3], a[4], a[5])
        out[2, :3] = out[0, 1:]
        out[2, 3] = _avg3(a[4], a[5], a[6])
        out[3, :3] = out[1, 1:]
        out[3, 3] = _avg3(a[5], a[6], a[7])
    elif mode == B_HU_PRED:
        l0, l1, l2, l3 = L
        out[0, 0] = _avg2(l0, l1)
        out[0, 1] = _avg3(l0, l1, l2)
        out[0, 2] = out[1, 0] = _avg2(l1, l2)
        out[0, 3] = out[1, 1] = _avg3(l1, l2, l3)
        out[1, 2] = out[2, 0] = _avg2(l2, l3)
        out[1, 3] = out[2, 1] = _avg3(l2, l3, l3)
        out[2, 2] = out[2, 3] = l3
        out[3, :] = l3
    else:
        raise ValueError(f"vp8: bad B intra mode {mode}")
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Loop filter (§15) — vectorized along each edge
# ---------------------------------------------------------------------------


def _sc(x):
    """vp8_signed_char_clamp (direct ufuncs — np.clip's dispatch
    wrapper dominates on the tiny per-edge arrays)."""
    return np.minimum(127, np.maximum(-128, x))


def _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, E, I):
    return (
        (np.abs(p3 - p2) <= I) & (np.abs(p2 - p1) <= I)
        & (np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I)
        & (np.abs(q2 - q1) <= I) & (np.abs(q3 - q2) <= I)
        & (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= E)
    )


def _hev_mask(p1, p0, q0, q1, t):
    return (np.abs(p1 - p0) > t) | (np.abs(q1 - q0) > t)


def _normal_filter_edge(cols, E, I, hev_t, mb_edge):
    """cols: list of 8 int32 arrays [p3,p2,p1,p0,q0,q1,q2,q3] along the
    edge; returns the filtered 8 (only p2..q2 can change)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = cols
    mask = _filter_mask(p3, p2, p1, p0, q0, q1, q2, q3, E, I)
    hev = _hev_mask(p1, p0, q0, q1, hev_t)
    ps2, ps1, ps0 = p2 - 128, p1 - 128, p0 - 128
    qs0, qs1, qs2 = q0 - 128, q1 - 128, q2 - 128
    if not mb_edge:
        a = np.where(hev, _sc(ps1 - qs1), 0)
        a = _sc(a + 3 * (qs0 - ps0))
        a = np.where(mask, a, 0)
        f1 = _sc(a + 4) >> 3
        f2 = _sc(a + 3) >> 3
        qs0 = _sc(qs0 - f1)
        ps0 = _sc(ps0 + f2)
        a2 = np.where(hev, 0, (f1 + 1) >> 1)
        qs1 = _sc(qs1 - a2)
        ps1 = _sc(ps1 + a2)
    else:
        w = _sc(_sc(ps1 - qs1) + 3 * (qs0 - ps0))
        w = np.where(mask, w, 0)
        f2h = np.where(hev, w, 0)
        f1 = _sc(f2h + 4) >> 3
        f2 = _sc(f2h + 3) >> 3
        qs0 = _sc(qs0 - f1)
        ps0 = _sc(ps0 + f2)
        w2 = np.where(hev, 0, w)
        u = _sc((27 * w2 + 63) >> 7)
        qs0 = _sc(qs0 - u)
        ps0 = _sc(ps0 + u)
        u = _sc((18 * w2 + 63) >> 7)
        qs1 = _sc(qs1 - u)
        ps1 = _sc(ps1 + u)
        u = _sc((9 * w2 + 63) >> 7)
        qs2 = _sc(qs2 - u)
        ps2 = _sc(ps2 + u)
    return [p3, ps2 + 128, ps1 + 128, ps0 + 128,
            qs0 + 128, qs1 + 128, qs2 + 128, q3]


def _simple_filter_edge(cols, E):
    p1, p0, q0, q1 = cols[2], cols[3], cols[4], cols[5]
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= E
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _sc(_sc(ps1 - qs1) + 3 * (qs0 - ps0))
    a = np.where(mask, a, 0)
    f1 = _sc(a + 4) >> 3
    f2 = _sc(a + 3) >> 3
    cols[4] = _sc(qs0 - f1) + 128
    cols[3] = _sc(ps0 + f2) + 128
    return cols


def _filter_v_edge(plane, x, y0, y1, E, I, hev_t, mb_edge, simple):
    """Vertical edge at column x (boundary between x-1 and x)."""
    win = plane[y0:y1, x - 4 : x + 4].astype(np.int32)
    cols = [win[:, i] for i in range(8)]
    if simple:
        cols = _simple_filter_edge(cols, E)
    else:
        cols = _normal_filter_edge(cols, E, I, hev_t, mb_edge)
    plane[y0:y1, x - 4 : x + 4] = np.stack(cols, axis=1)


def _filter_h_edge(plane, y, x0, x1, E, I, hev_t, mb_edge, simple):
    """Horizontal edge at row y (boundary between y-1 and y)."""
    win = plane[y - 4 : y + 4, x0:x1].astype(np.int32)
    rows = [win[i] for i in range(8)]
    if simple:
        rows = _simple_filter_edge(rows, E)
    else:
        rows = _normal_filter_edge(rows, E, I, hev_t, mb_edge)
    plane[y - 4 : y + 4, x0:x1] = np.stack(rows, axis=0)


def _loop_filter_frame(ypad, upad, vpad, mbs, mb_w, mb_h, hdr):
    """§15: per-MB left/inner-vertical then top/inner-horizontal edges,
    normal or simple profile."""
    sharpness = hdr["sharpness"]
    simple = hdr["filter_type"] == 1
    for r in range(mb_h):
        for c in range(mb_w):
            mb = mbs[r][c]
            fl = mb["filter_level"]
            if fl == 0:
                continue
            interior = fl
            if sharpness:
                interior >>= 1 if sharpness <= 4 else 2
                interior = min(interior, 9 - sharpness)
            interior = max(interior, 1)
            mb_E = 2 * (fl + 2) + interior
            sb_E = 2 * fl + interior
            hev_t = 2 if fl >= 40 else (1 if fl >= 15 else 0)
            inner = mb["has_coeffs"] or mb["ymode"] == B_PRED
            yx, yy = 1 + 16 * c, 1 + 16 * r
            cx, cy = 1 + 8 * c, 1 + 8 * r
            if c > 0:
                _filter_v_edge(ypad, yx, yy, yy + 16, mb_E, interior,
                               hev_t, True, simple)
                if not simple:
                    _filter_v_edge(upad, cx, cy, cy + 8, mb_E, interior,
                                   hev_t, True, False)
                    _filter_v_edge(vpad, cx, cy, cy + 8, mb_E, interior,
                                   hev_t, True, False)
            if inner:
                for dx in (4, 8, 12):
                    _filter_v_edge(ypad, yx + dx, yy, yy + 16, sb_E,
                                   interior, hev_t, False, simple)
                if not simple:
                    _filter_v_edge(upad, cx + 4, cy, cy + 8, sb_E,
                                   interior, hev_t, False, False)
                    _filter_v_edge(vpad, cx + 4, cy, cy + 8, sb_E,
                                   interior, hev_t, False, False)
            if r > 0:
                _filter_h_edge(ypad, yy, yx, yx + 16, mb_E, interior,
                               hev_t, True, simple)
                if not simple:
                    _filter_h_edge(upad, cy, cx, cx + 8, mb_E, interior,
                                   hev_t, True, False)
                    _filter_h_edge(vpad, cy, cx, cx + 8, mb_E, interior,
                                   hev_t, True, False)
            if inner:
                for dy in (4, 8, 12):
                    _filter_h_edge(ypad, yy + dy, yx, yx + 16, sb_E,
                                   interior, hev_t, False, simple)
                if not simple:
                    _filter_h_edge(upad, cy + 4, cx, cx + 8, sb_E,
                                   interior, hev_t, False, False)
                    _filter_h_edge(vpad, cy + 4, cx, cx + 8, sb_E,
                                   interior, hev_t, False, False)


# ---------------------------------------------------------------------------
# Frame decode (§9, §11, §13)
# ---------------------------------------------------------------------------


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _dequant_factors(qi: int, deltas: dict) -> dict:
    y2ac = (AC_QLOOKUP[_clamp_q(qi + deltas["y2_ac"])] * 155) // 100
    return {
        "y1_dc": DC_QLOOKUP[_clamp_q(qi + deltas["y1_dc"])],
        "y1_ac": AC_QLOOKUP[_clamp_q(qi)],
        "y2_dc": DC_QLOOKUP[_clamp_q(qi + deltas["y2_dc"])] * 2,
        "y2_ac": max(y2ac, 8),
        "uv_dc": min(DC_QLOOKUP[_clamp_q(qi + deltas["uv_dc"])], 132),
        "uv_ac": AC_QLOOKUP[_clamp_q(qi + deltas["uv_ac"])],
    }


def parse_header(data: bytes) -> tuple[dict, BoolDecoder, list[BoolDecoder]]:
    """Frame tag + key-frame start code + compressed header (§9).

    Returns (header dict, first-partition bool decoder positioned at
    the per-MB mode records, token-partition bool decoders).
    """
    if len(data) < 10:
        raise ValueError("vp8: frame shorter than the uncompressed header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise UnsupportedCodecError(
            "vp8: inter (non-key) frame — still WebP never contains one"
        )
    version = (tag >> 1) & 7
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad key-frame start code")
    wtag = data[6] | (data[7] << 8)
    htag = data[8] | (data[9] << 8)
    width, height = wtag & 0x3FFF, htag & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("vp8: zero frame dimension")
    if width * height > _MAX_PIXELS:
        raise ValueError("vp8: frame exceeds the pixel cap")
    # decompression-bomb guard: a key frame spends at least a few bits
    # per macroblock on mode records alone, so a payload declaring far
    # more macroblocks than its bytes could carry is hostile — without
    # this, a 50-byte header claiming 8k×8k pixels would grind the
    # per-MB decode loop for minutes on zero-padded garbage
    n_mbs = ((width + 15) // 16) * ((height + 15) // 16)
    if n_mbs > 8 * len(data):
        raise ValueError(
            f"vp8: {n_mbs} macroblocks declared by a {len(data)}-byte "
            "payload (bomb guard)"
        )
    if 10 + first_part_size > len(data):
        raise ValueError("vp8: first partition overruns the payload")
    bd = BoolDecoder(data[10 : 10 + first_part_size])

    hdr: dict = {
        "version": version,
        "width": width,
        "height": height,
        "color_space": bd.decode(128),
        "clamping_type": bd.decode(128),
    }
    # --- segmentation (§9.3)
    seg_enabled = bd.decode(128)
    seg = {
        "enabled": seg_enabled,
        "update_map": 0,
        "abs_values": 0,
        "quant": [0, 0, 0, 0],
        "lf": [0, 0, 0, 0],
        "tree_probs": [255, 255, 255],
    }
    if seg_enabled:
        seg["update_map"] = bd.decode(128)
        update_data = bd.decode(128)
        if update_data:
            seg["abs_values"] = bd.decode(128)
            seg["quant"] = [bd.flagged_delta(7) for _ in range(4)]
            seg["lf"] = [bd.flagged_delta(6) for _ in range(4)]
        if seg["update_map"]:
            seg["tree_probs"] = [
                bd.literal(8) if bd.decode(128) else 255 for _ in range(3)
            ]
    hdr["seg"] = seg
    # --- loop filter (§9.4)
    hdr["filter_type"] = bd.decode(128)
    hdr["filter_level"] = bd.literal(6)
    hdr["sharpness"] = bd.literal(3)
    lf_deltas = {"enabled": 0, "ref": [0, 0, 0, 0], "mode": [0, 0, 0, 0]}
    if bd.decode(128):
        lf_deltas["enabled"] = 1
        if bd.decode(128):
            lf_deltas["ref"] = [bd.flagged_delta(6) for _ in range(4)]
            lf_deltas["mode"] = [bd.flagged_delta(6) for _ in range(4)]
    hdr["lf_deltas"] = lf_deltas
    # --- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    hdr["n_parts"] = n_parts
    rest = data[10 + first_part_size :]
    parts = []
    if n_parts > 1:
        size_bytes = 3 * (n_parts - 1)
        if len(rest) < size_bytes:
            raise ValueError("vp8: truncated token-partition size table")
        offs = size_bytes
        for i in range(n_parts - 1):
            sz = (
                rest[3 * i]
                | (rest[3 * i + 1] << 8)
                | (rest[3 * i + 2] << 16)
            )
            if offs + sz > len(rest):
                raise ValueError("vp8: token partition overruns the payload")
            parts.append(BoolDecoder(rest[offs : offs + sz]))
            offs += sz
        parts.append(BoolDecoder(rest[offs:]))
    else:
        parts.append(BoolDecoder(rest))
    # --- quantizers (§9.6)
    qi = bd.literal(7)
    deltas = {
        "y1_dc": bd.flagged_delta(4),
        "y2_dc": bd.flagged_delta(4),
        "y2_ac": bd.flagged_delta(4),
        "uv_dc": bd.flagged_delta(4),
        "uv_ac": bd.flagged_delta(4),
    }
    hdr["q_index"] = qi
    hdr["q_deltas"] = deltas
    # --- refresh entropy (§9.7; key frame: value ignored for decode)
    hdr["refresh_entropy"] = bd.decode(128)
    # --- coefficient probability updates (§13.4)
    probs = [
        [[ctx[:] for ctx in band] for band in btype]
        for btype in DEFAULT_COEF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.decode(COEF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)
    hdr["coef_probs"] = probs
    # --- skip flag (§9.10)
    hdr["no_coeff_skip"] = bd.decode(128)
    hdr["prob_skip_false"] = bd.literal(8) if hdr["no_coeff_skip"] else 0
    return hdr, bd, parts


def _decode_coeffs(bd, probs, first, ctx, q_first, q_rest):
    """§13: one 4×4 block's tokens → dequantized natural-order coefs.

    Returns (coefs int32[16], nonzero_flag) where the flag is the
    above/left context bit (EOB position > first coefficient).
    """
    coefs = np.zeros(16, np.int32)
    i = first
    start = 0  # after a ZERO token the EOB branch is skipped (§13.3)
    while i < 16:
        p = probs[COEF_BANDS[i]][ctx]
        tok = bd.tree(COEF_TREE, p, start)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            start = 2
            i += 1
            continue
        if tok <= DCT_4:
            value = tok
        else:
            value = CAT_BASE[tok]
            extra = 0
            for pr in CAT_PROBS[tok]:
                extra = (extra << 1) | bd.decode(pr)
            value += extra
        if bd.decode(128):
            value = -value
        ctx = 1 if value in (1, -1) else 2
        start = 0
        coefs[ZIGZAG[i]] = value * (q_first if i == 0 else q_rest)
        i += 1
    return coefs, i > first


def decode_vp8(data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a VP8 key frame to (Y, U, V) uint8 planes (4:2:0)."""
    hdr, bd, parts = parse_header(data)
    W, H = hdr["width"], hdr["height"]
    mb_w, mb_h = (W + 15) // 16, (H + 15) // 16
    seg = hdr["seg"]

    # --- pass 1: per-MB mode records from the first partition (§11)
    mbs = [[None] * mb_w for _ in range(mb_h)]
    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_w)]  # bottom row of each MB
    for r in range(mb_h):
        left_sub = [B_DC_PRED] * 4
        for c in range(mb_w):
            seg_id = 0
            if seg["enabled"] and seg["update_map"]:
                seg_id = bd.tree(MB_SEGMENT_TREE, seg["tree_probs"])
            skip = bd.decode(hdr["prob_skip_false"]) if hdr["no_coeff_skip"] else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                sub = [0] * 16
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    above_mode = (
                        sub[sb - 4] if sr > 0 else above_sub[c][sc]
                    )
                    left_mode = sub[sb - 1] if sc > 0 else left_sub[sr]
                    sub[sb] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[above_mode][left_mode]
                    )
                above_sub[c] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                implied = IMPLIED_B_MODE[ymode]
                sub = [implied] * 16
                above_sub[c] = [implied] * 4
                left_sub = [implied] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            # per-segment quantizer + filter level (§9.3, §15.1)
            if seg["enabled"]:
                qi = (
                    seg["quant"][seg_id]
                    if seg["abs_values"]
                    else hdr["q_index"] + seg["quant"][seg_id]
                )
                fl = (
                    seg["lf"][seg_id]
                    if seg["abs_values"]
                    else hdr["filter_level"] + seg["lf"][seg_id]
                )
            else:
                qi, fl = hdr["q_index"], hdr["filter_level"]
            qi = _clamp_q(qi)
            fl = max(0, min(63, fl))
            if hdr["lf_deltas"]["enabled"]:
                fl += hdr["lf_deltas"]["ref"][0]  # INTRA_FRAME
                if ymode == B_PRED:
                    fl += hdr["lf_deltas"]["mode"][0]
                fl = max(0, min(63, fl))
            mbs[r][c] = {
                "seg_id": seg_id,
                "skip": skip,
                "ymode": ymode,
                "sub": sub,
                "uvmode": uvmode,
                "quant": _dequant_factors(qi, hdr["q_deltas"]),
                "filter_level": fl,
                "has_coeffs": False,
            }

    # --- padded reconstruction planes (127 above / 129 left / right
    # extension by replication, per the libvpx border conventions)
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    ypad = np.empty((yh + 1, yw + 9), np.uint8)
    upad = np.empty((ch + 1, cw + 5), np.uint8)
    vpad = np.empty((ch + 1, cw + 5), np.uint8)
    for pad in (ypad, upad, vpad):
        pad[0, :] = 127
        pad[1:, 0] = 129

    # --- pass 2: tokens (partition r % n_parts) + reconstruction
    above_nnz = [np.zeros(9, np.uint8) for _ in range(mb_w)]  # 4Y+2U+2V+1Y2
    for r in range(mb_h):
        tb = parts[r % hdr["n_parts"]]
        left_nnz = np.zeros(9, np.uint8)
        for c in range(mb_w):
            mb = mbs[r][c]
            q = mb["quant"]
            has_y2 = mb["ymode"] != B_PRED
            ycoefs = np.zeros((16, 16), np.int32)
            ucoefs = np.zeros((4, 16), np.int32)
            vcoefs = np.zeros((4, 16), np.int32)
            if mb["skip"]:
                left_nnz[:8] = 0
                above_nnz[c][:8] = 0
                if has_y2:
                    left_nnz[8] = 0
                    above_nnz[c][8] = 0
            else:
                any_nz = False
                if has_y2:
                    ctx = above_nnz[c][8] + left_nnz[8]
                    y2, nz = _decode_coeffs(
                        tb, hdr["coef_probs"][1], 0, ctx,
                        q["y2_dc"], q["y2_ac"],
                    )
                    above_nnz[c][8] = left_nnz[8] = 1 if nz else 0
                    any_nz |= nz
                    dcs = inverse_wht4x4(y2)
                    first, btype = 1, 0
                else:
                    dcs = None
                    first, btype = 0, 3
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    ctx = above_nnz[c][sc] + left_nnz[sr]
                    coefs, nz = _decode_coeffs(
                        tb, hdr["coef_probs"][btype], first, ctx,
                        q["y1_dc"], q["y1_ac"],
                    )
                    above_nnz[c][sc] = left_nnz[sr] = 1 if nz else 0
                    any_nz |= nz
                    if dcs is not None:
                        coefs[0] = dcs[sr, sc]
                    ycoefs[sb] = coefs
                for plane_i, (store, off) in enumerate(
                    ((ucoefs, 4), (vcoefs, 6))
                ):
                    for sb in range(4):
                        sr, sc = sb >> 1, sb & 1
                        ctx = above_nnz[c][off + sc] + left_nnz[off + sr]
                        coefs, nz = _decode_coeffs(
                            tb, hdr["coef_probs"][2], 0, ctx,
                            q["uv_dc"], q["uv_ac"],
                        )
                        above_nnz[c][off + sc] = left_nnz[off + sr] = (
                            1 if nz else 0
                        )
                        any_nz |= nz
                        store[sb] = coefs
                mb["has_coeffs"] = bool(any_nz)
            # ---- reconstruct luma
            yx, yy = 1 + 16 * c, 1 + 16 * r
            if mb["ymode"] == B_PRED:
                # keep the MB's original top row (incl. above-right) for
                # the right-column subblocks' above-right rule (§12.3)
                top_row = ypad[yy - 1, yx - 1 : yx + 21].astype(np.int32).copy()
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    bx, by = yx + 4 * sc, yy + 4 * sr
                    A = ypad[by - 1, bx : bx + 4].astype(np.int32)
                    if sc == 3 and sr > 0:
                        AR = top_row[1 + 16 : 1 + 20]
                    else:
                        AR = ypad[by - 1, bx + 4 : bx + 8].astype(np.int32)
                    L = ypad[by : by + 4, bx - 1].astype(np.int32)
                    P = int(ypad[by - 1, bx - 1])
                    pred = predict_b(mb["sub"][sb], A, AR, L, P)
                    resid = inverse_dct4x4(ycoefs[sb])
                    ypad[by : by + 4, bx : bx + 4] = np.clip(
                        pred + resid, 0, 255
                    ).astype(np.uint8)
            else:
                # V/H/TM read straight through the 127/129 borders; DC
                # needs true availability for its 128 / one-sided cases
                pred = predict_mb(ypad, yy, yx, 16, mb["ymode"], r > 0, c > 0)
                out = np.empty((16, 16), np.uint8)
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    resid = inverse_dct4x4(ycoefs[sb])
                    out[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] = np.clip(
                        pred[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] + resid,
                        0,
                        255,
                    ).astype(np.uint8)
                ypad[yy : yy + 16, yx : yx + 16] = out
            # ---- reconstruct chroma
            cx, cy = 1 + 8 * c, 1 + 8 * r
            for pad, coeflist in ((upad, ucoefs), (vpad, vcoefs)):
                pred = predict_mb(pad, cy, cx, 8, mb["uvmode"], r > 0, c > 0)
                out = np.empty((8, 8), np.uint8)
                for sb in range(4):
                    sr, sc = sb >> 1, sb & 1
                    resid = inverse_dct4x4(coeflist[sb])
                    out[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] = np.clip(
                        pred[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] + resid,
                        0,
                        255,
                    ).astype(np.uint8)
                pad[cy : cy + 8, cx : cx + 8] = out
        # extend the right border by replication for the next row's
        # above / above-right reads
        ypad[1 + 16 * r : 1 + 16 * (r + 1), yw + 1 :] = ypad[
            1 + 16 * r : 1 + 16 * (r + 1), yw : yw + 1
        ]
        upad[1 + 8 * r : 1 + 8 * (r + 1), cw + 1 :] = upad[
            1 + 8 * r : 1 + 8 * (r + 1), cw : cw + 1
        ]
        vpad[1 + 8 * r : 1 + 8 * (r + 1), cw + 1 :] = vpad[
            1 + 8 * r : 1 + 8 * (r + 1), cw : cw + 1
        ]

    # libvpx gates the whole pass on the frame-level filter value; the
    # per-MB levels (segments/deltas) are applied inside
    if hdr["filter_level"] > 0:
        _loop_filter_frame(ypad, upad, vpad, mbs, mb_w, mb_h, hdr)

    y = ypad[1 : 1 + H, 1 : 1 + W].copy()
    u = upad[1 : 1 + (H + 1) // 2, 1 : 1 + (W + 1) // 2].copy()
    v = vpad[1 : 1 + (H + 1) // 2, 1 : 1 + (W + 1) // 2].copy()
    return y, u, v


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 studio-range integer conversion (shared with the AVI
    tier's :func:`~.rawavi._yuv_to_rgb`) after 2×2 chroma replication.
    Documented delta vs libwebp: libwebp's default path uses a bilinear
    ("fancy") chroma upsampler and a slightly different fixed-point
    matrix — flat-chroma images match exactly; detailed chroma differs
    by a few LSB near edges."""
    from .rawavi import _yuv_to_rgb

    h, w = y.shape
    ur = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w]
    vr = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w]
    return _yuv_to_rgb(y, ur, vr)


def decode_vp8_rgb(data: bytes) -> np.ndarray:
    y, u, v = decode_vp8(data)
    return yuv420_to_rgb(y, u, v)


# ---------------------------------------------------------------------------
# Fixture encoder.  DC-only residual coding (per MB via Y2 for 16×16
# modes, per subblock for B_PRED and chroma) — lossy in general, but
# EXACT for constant-per-MB content at q_index 0, which is what the
# oracle-checked catalog query uses; the encoder mirror-reconstructs
# with the decoder's own predict/IDCT/IWHT functions so encode→decode
# is bit-exact for every input.
# ---------------------------------------------------------------------------


def _token_for(av: int) -> int:
    if av <= 4:
        return av
    for tok in (CAT1, CAT2, CAT3, CAT4, CAT5):
        if av < CAT_BASE[tok] + (1 << len(CAT_PROBS[tok])):
            return tok
    return CAT6


def _encode_coeffs(be, probs, first, ctx, coefs_natural) -> bool:
    """Mirror of :func:`_decode_coeffs` for QUANTIZED levels (natural
    order).  Returns the nonzero context flag."""
    scan = [int(coefs_natural[ZIGZAG[i]]) for i in range(16)]
    last = first - 1
    for i in range(first, 16):
        if scan[i]:
            last = i
    i, start = first, 0
    while i < 16:
        p = probs[COEF_BANDS[i]][ctx]
        if i > last:
            be.tree(COEF_TREE, p, DCT_EOB, start)
            return last >= first
        v = scan[i]
        av = abs(v)
        tok = _token_for(av)
        be.tree(COEF_TREE, p, tok, start)
        if tok == DCT_0:
            ctx, start = 0, 2
        else:
            if tok >= CAT1:
                # extra bits are MSB-first; CAT_PROBS is in read order
                extra = av - CAT_BASE[tok]
                nb = len(CAT_PROBS[tok])
                for bi in range(nb - 1, -1, -1):
                    be.encode((extra >> bi) & 1, CAT_PROBS[tok][nb - 1 - bi])
            be.encode(1 if v < 0 else 0, 128)
            ctx, start = (1 if av == 1 else 2), 0
        i += 1
    return last >= first


def encode_vp8_keyframe(
    y: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    *,
    q_index: int = 0,
    filter_level: int = 0,
    sharpness: int = 0,
    filter_type: int = 0,
    n_parts: int = 1,
    ymodes=None,
    bmodes=None,
    uvmode: int = DC_PRED,
    prob_updates: dict | None = None,
    segment_map=None,
    segment_quants: list[int] | None = None,
    segment_abs: bool = True,
    lf_deltas: tuple[list[int], list[int]] | None = None,
) -> bytes:
    """Encode planes as a VP8 key frame (raw frame data, no RIFF).

    ``ymodes``: (mb_h, mb_w) array of intra modes (default DC_PRED);
    ``bmodes``: 16-list used for every B_PRED macroblock;
    ``prob_updates``: {(i,j,k,l): prob} coefficient-probability updates
    to exercise §13.4; ``segment_map``: (mb_h, mb_w) segment ids with
    ``segment_quants`` (4 values, absolute when ``segment_abs`` else
    deltas on ``q_index``) — exercises §9.3 segmentation end to end;
    ``lf_deltas``: (ref[4], mode[4]) loop-filter adjustments (§9.4).
    """
    H, W = y.shape
    if H % 16 or W % 16:
        raise ValueError("vp8 fixture encoder: dimensions must be ×16")
    mb_w, mb_h = W // 16, H // 16
    if u.shape != (H // 2, W // 2) or v.shape != (H // 2, W // 2):
        raise ValueError("vp8 fixture encoder: chroma must be 4:2:0")
    if n_parts not in (1, 2, 4, 8):
        raise ValueError("vp8: token partitions must be 1/2/4/8")
    zero_deltas = dict.fromkeys(("y1_dc", "y2_dc", "y2_ac", "uv_dc", "uv_ac"), 0)
    seg_enabled = segment_map is not None
    seg_quants = segment_quants or [0, 0, 0, 0]
    seg_tree_probs = [128, 128, 128]

    def seg_qi(seg_id: int) -> int:
        if not seg_enabled:
            return q_index
        return _clamp_q(
            seg_quants[seg_id] if segment_abs else q_index + seg_quants[seg_id]
        )

    quants = {sid: _dequant_factors(seg_qi(sid), zero_deltas) for sid in range(4)}
    prob_skip_false = 200

    probs = [
        [[ctx[:] for ctx in band] for band in btype]
        for btype in DEFAULT_COEF_PROBS
    ]
    for (i, j, k, l), pv in (prob_updates or {}).items():
        probs[i][j][k][l] = pv

    # mirrored reconstruction state (identical border conventions)
    yw, cw = mb_w * 16, mb_w * 8
    ypad = np.empty((H + 1, yw + 9), np.uint8)
    upad = np.empty((H // 2 + 1, cw + 5), np.uint8)
    vpad = np.empty((H // 2 + 1, cw + 5), np.uint8)
    for pad in (ypad, upad, vpad):
        pad[0, :] = 127
        pad[1:, 0] = 129

    head = BoolEncoder()
    head.encode(0, 128)  # color space
    head.encode(0, 128)  # clamping
    head.encode(1 if seg_enabled else 0, 128)
    if seg_enabled:
        head.encode(1, 128)  # update_mb_segmentation_map
        head.encode(1, 128)  # update_segment_feature_data
        head.encode(1 if segment_abs else 0, 128)
        for sq in seg_quants:
            head.flagged_delta(sq, 7)
        for _ in range(4):
            # abs-mode semantics make an omitted LF value mean level 0,
            # which would silently discard filter_level — write the
            # frame level into every segment in abs mode
            if segment_abs:
                head.encode(1, 128)
                head.signed_literal(filter_level, 6)
            else:
                head.encode(0, 128)
        for p_ in seg_tree_probs:
            head.encode(1, 128)
            head.literal(p_, 8)
    head.encode(filter_type, 128)
    head.literal(filter_level, 6)
    head.literal(sharpness, 3)
    if lf_deltas is None:
        head.encode(0, 128)  # lf adjustments off
    else:
        head.encode(1, 128)
        head.encode(1, 128)  # update now
        for dv in lf_deltas[0]:
            head.flagged_delta(dv, 6)
        for dv in lf_deltas[1]:
            head.flagged_delta(dv, 6)
    head.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
    head.literal(q_index, 7)
    for _ in range(5):
        head.encode(0, 128)  # quantizer deltas
    head.encode(1, 128)  # refresh entropy
    upd = prob_updates or {}
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if (i, j, k, l) in upd:
                        head.encode(1, COEF_UPDATE_PROBS[i][j][k][l])
                        head.literal(upd[(i, j, k, l)], 8)
                    else:
                        head.encode(0, COEF_UPDATE_PROBS[i][j][k][l])
    head.encode(1, 128)  # mb_no_coeff_skip
    head.literal(prob_skip_false, 8)

    tparts = [BoolEncoder() for _ in range(n_parts)]
    above_nnz = [np.zeros(9, np.uint8) for _ in range(mb_w)]
    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_w)]

    def rnd_div(a, b):
        return int(np.floor(a / b + 0.5))

    for r in range(mb_h):
        tb = tparts[r % n_parts]
        left_nnz = np.zeros(9, np.uint8)
        left_sub = [B_DC_PRED] * 4
        # buffer mode records + this row's token closures so the skip
        # flag (known only after level selection) is written in order
        for c in range(mb_w):
            seg_id = int(segment_map[r][c]) if seg_enabled else 0
            q = quants[seg_id]
            ymode = ymodes[r][c] if ymodes is not None else DC_PRED
            sub = list(bmodes) if (ymode == B_PRED and bmodes) else [B_DC_PRED] * 16
            yx, yy = 1 + 16 * c, 1 + 16 * r
            cx, cy = 1 + 8 * c, 1 + 8 * r
            tgt_y = y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16].astype(np.int32)

            ycoef_levels = np.zeros((16, 16), np.int32)  # quantized
            y2_levels = np.zeros(16, np.int32)
            has_y2 = ymode != B_PRED

            if has_y2:
                pred = predict_mb(ypad, yy, yx, 16, ymode, r > 0, c > 0)
                d = rnd_div(float((tgt_y - pred).mean()), 1.0)
                if d:
                    # pixel delta d ← IDCT dc D=(8d-4) ← IWHT of Y2
                    # value v=8D ← level L=v/q; exact when q divides 8D
                    y2_levels[0] = rnd_div(8 * (8 * d - 4), q["y2_dc"])
                # reconstruct
                dcs = inverse_wht4x4(
                    [int(y2_levels[zz]) * (q["y2_dc"] if zz == 0 else q["y2_ac"])
                     for zz in range(16)]
                )
                out = np.empty((16, 16), np.uint8)
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    coefs = np.zeros(16, np.int32)
                    coefs[0] = dcs[sr, sc]
                    resid = inverse_dct4x4(coefs)
                    out[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] = np.clip(
                        pred[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] + resid,
                        0, 255).astype(np.uint8)
                ypad[yy : yy + 16, yx : yx + 16] = out
            else:
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    bx, by = yx + 4 * sc, yy + 4 * sr
                    A = ypad[by - 1, bx : bx + 4].astype(np.int32)
                    AR = ypad[by - 1, bx + 4 : bx + 8].astype(np.int32)
                    if sc == 3 and sr > 0:
                        AR = ypad[yy - 1, bx + 4 : bx + 8].astype(np.int32)
                    L = ypad[by : by + 4, bx - 1].astype(np.int32)
                    P = int(ypad[by - 1, bx - 1])
                    pred = predict_b(sub[sb], A, AR, L, P)
                    tgt = tgt_y[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4]
                    d = rnd_div(float((tgt - pred).mean()), 1.0)
                    if d:
                        ycoef_levels[sb][0] = rnd_div(8 * d - 4, q["y1_dc"])
                    coefs = np.zeros(16, np.int32)
                    coefs[0] = ycoef_levels[sb][0] * q["y1_dc"]
                    resid = inverse_dct4x4(coefs)
                    ypad[by : by + 4, bx : bx + 4] = np.clip(
                        pred + resid, 0, 255).astype(np.uint8)

            ucoef_levels = np.zeros((4, 16), np.int32)
            vcoef_levels = np.zeros((4, 16), np.int32)
            for plane_pad, tgt_pl, levels in (
                (upad, u, ucoef_levels), (vpad, v, vcoef_levels),
            ):
                pred = predict_mb(plane_pad, cy, cx, 8, uvmode, r > 0, c > 0)
                tgt = tgt_pl[8 * r : 8 * r + 8, 8 * c : 8 * c + 8].astype(np.int32)
                out = np.empty((8, 8), np.uint8)
                for sb in range(4):
                    sr, sc = sb >> 1, sb & 1
                    blk_t = tgt[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4]
                    blk_p = pred[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4]
                    d = rnd_div(float((blk_t - blk_p).mean()), 1.0)
                    if d:
                        levels[sb][0] = rnd_div(8 * d - 4, q["uv_dc"])
                    coefs = np.zeros(16, np.int32)
                    coefs[0] = levels[sb][0] * q["uv_dc"]
                    resid = inverse_dct4x4(coefs)
                    out[4 * sr : 4 * sr + 4, 4 * sc : 4 * sc + 4] = np.clip(
                        blk_p + resid, 0, 255).astype(np.uint8)
                plane_pad[cy : cy + 8, cx : cx + 8] = out

            skip = (
                not y2_levels.any()
                and not ycoef_levels.any()
                and not ucoef_levels.any()
                and not vcoef_levels.any()
            )

            # ---- mode record (partition 0)
            if seg_enabled:
                head.tree(MB_SEGMENT_TREE, seg_tree_probs, seg_id)
            head.encode(1 if skip else 0, prob_skip_false)
            head.tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            if ymode == B_PRED:
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    above_mode = sub[sb - 4] if sr > 0 else above_sub[c][sc]
                    left_mode = sub[sb - 1] if sc > 0 else left_sub[sr]
                    head.tree(
                        BMODE_TREE,
                        KF_BMODE_PROBS[above_mode][left_mode],
                        sub[sb],
                    )
                above_sub[c] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                implied = IMPLIED_B_MODE[ymode]
                above_sub[c] = [implied] * 4
                left_sub = [implied] * 4
            head.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            # ---- tokens (partition r % n)
            if skip:
                left_nnz[:8] = 0
                above_nnz[c][:8] = 0
                if has_y2:
                    left_nnz[8] = 0
                    above_nnz[c][8] = 0
            else:
                if has_y2:
                    ctx = above_nnz[c][8] + left_nnz[8]
                    nz = _encode_coeffs(tb, probs[1], 0, ctx, y2_levels)
                    above_nnz[c][8] = left_nnz[8] = 1 if nz else 0
                    first, btype = 1, 0
                else:
                    first, btype = 0, 3
                for sb in range(16):
                    sr, sc = sb >> 2, sb & 3
                    ctx = above_nnz[c][sc] + left_nnz[sr]
                    nz = _encode_coeffs(
                        tb, probs[btype], first, ctx, ycoef_levels[sb]
                    )
                    above_nnz[c][sc] = left_nnz[sr] = 1 if nz else 0
                for levels, off in ((ucoef_levels, 4), (vcoef_levels, 6)):
                    for sb in range(4):
                        sr, sc = sb >> 1, sb & 1
                        ctx = above_nnz[c][off + sc] + left_nnz[off + sr]
                        nz = _encode_coeffs(tb, probs[2], 0, ctx, levels[sb])
                        above_nnz[c][off + sc] = left_nnz[off + sr] = (
                            1 if nz else 0
                        )
        ypad[1 + 16 * r : 1 + 16 * (r + 1), yw + 1 :] = ypad[
            1 + 16 * r : 1 + 16 * (r + 1), yw : yw + 1]
        upad[1 + 8 * r : 1 + 8 * (r + 1), cw + 1 :] = upad[
            1 + 8 * r : 1 + 8 * (r + 1), cw : cw + 1]
        vpad[1 + 8 * r : 1 + 8 * (r + 1), cw + 1 :] = vpad[
            1 + 8 * r : 1 + 8 * (r + 1), cw : cw + 1]

    part0 = head.getvalue()
    tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += b"\x9d\x01\x2a"
    out += W.to_bytes(2, "little") + H.to_bytes(2, "little")
    out += part0
    bodies = [t.getvalue() for t in tparts]
    for b in bodies[:-1]:
        out += len(b).to_bytes(3, "little")
    for b in bodies:
        out += b
    return bytes(out)


def encode_webp_lossy(
    y, u, v, *, alpha: np.ndarray | None = None,
    alpha_compression: int = 1, alpha_filter: int = 0, **kw,
) -> bytes:
    """Wrap :func:`encode_vp8_keyframe` output in a RIFF/WEBP container.

    With ``alpha`` (an (H, W) uint8 plane) the extended layout is
    written — VP8X (alpha flag + canvas) then ALPH then ``VP8 `` — the
    shape libwebp emits for transparent lossy files."""
    frame = encode_vp8_keyframe(y, u, v, **kw)
    chunks = b""
    if alpha is not None:
        from . import rawwebp  # noqa: PLC0415

        if alpha.shape != y.shape:
            raise ValueError("vp8: alpha plane must match the luma plane")
        h, w = y.shape
        vp8x = bytes([0x10, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
            h - 1
        ).to_bytes(3, "little")
        chunks += b"VP8X" + (10).to_bytes(4, "little") + vp8x
        body = rawwebp.encode_alph(
            alpha, compression=alpha_compression, filter_method=alpha_filter
        )
        chunks += b"ALPH" + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunks += b"\x00"
    chunks += b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + chunks
