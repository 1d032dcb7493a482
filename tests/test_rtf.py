"""RTF text + metadata tier — hand-written token streams (not the
fixture writer's shapes) covering escapes, destinations, and the
hostile token forms."""

import pytest

from rawdata_client_provider_gcs_spark.sources import office as O
from rawdata_client_provider_gcs_spark.sources import rtf as R


def _t(s: str) -> str:
    return R.rtf_text_of(s.encode("latin-1"))


def test_plain_paragraphs_and_symbol_escapes():
    assert _t(r"{\rtf1 Hello \{braced\} \\slash\par done}") == (
        "Hello {braced} \\slash\ndone"
    )


def test_destinations_do_not_leak():
    src = (
        r"{\rtf1{\fonttbl{\f0 Arial;}}{\colortbl;\red0;}"
        r"{\stylesheet{\s1 Head;}}{\*\generator Acme 1.0;}"
        r"{\pict 89504e470d0a}visible\par}"
    )
    assert _t(src) == "visible\n"


def test_field_result_kept_instruction_dropped():
    src = (
        r"{\rtf1{\field{\*\fldinst HYPERLINK \'22x\'22}"
        r"{\fldrslt shown text}}\par}"
    )
    assert _t(src) == "shown text\n"


def test_hex_escape_honors_ansicpg():
    # cp1251: 0xC0 = А (Cyrillic), cp1252: 0xC0 = À
    assert _t(r"{\rtf1\ansicpg1251 \'c0}") == "\u0410"
    assert _t(r"{\rtf1 \'c0}") == "\u00c0"
    # unknown codepage keeps the cp1252 default
    assert _t(r"{\rtf1\ansicpg99999 \'c0}") == "\u00c0"


def test_unicode_escape_and_uc_skip():
    assert _t(r"{\rtf1 \u8212 ?dash}") == "\u2014dash"
    # \uc2: two fallback chars eaten, spanning a hex escape
    assert _t(r"{\rtf1\uc2 \u956 ab-tail}") == "\u03bc-tail"
    assert _t(r"{\rtf1\uc0 \u956 x}") == "\u03bcx"
    # negative parameter is the 16-bit two's complement form
    assert _t(r"{\rtf1 \u-1000 ?}") == chr(64536)


def test_surrogate_pairs_combine_lone_replaced():
    # U+1F600 as a \u surrogate pair (signed params)
    hi, lo = 0xD83D - 65536, 0xDE00 - 65536
    assert _t(rf"{{\rtf1 \u{hi} ?\u{lo} ?}}") == "\U0001f600"
    # lone low surrogate → replacement, never a lone surrogate out
    assert _t(rf"{{\rtf1 \u{lo} ?x}}") == "\ufffdx"
    out = _t(rf"{{\rtf1 \u{hi} ?z}}")
    assert "\ud83d" not in out


def test_char_words_and_raw_newlines():
    src = "{\\rtf1 a\\tab b\\emdash c\\~d\r\ne\\line f}"
    assert _t(src) == "a\tb\u2014c\u00a0d" + "e\nf"


def test_bin_skips_raw_bytes():
    blob = b"{\\rtf1 pre\\bin5 }}\\{\\ post}"
    assert R.rtf_text_of(blob) == "pre post"


def test_info_metadata_and_not_in_text():
    blob = R.build_rtf(["body"], title="My Title", author="An Author")
    text, info = R.rtf_extract(blob)
    assert text == "body\n"
    assert info["title"] == "My Title" and info["author"] == "An Author"


def test_hostiles():
    with pytest.raises(ValueError, match="does not start"):
        R.rtf_text_of(b"plain text")
    with pytest.raises(ValueError, match="unbalanced"):
        R.rtf_text_of(b"{\\rtf1 }}")
    with pytest.raises(ValueError, match="unclosed"):
        R.rtf_text_of(b"{\\rtf1 {{x}")
    with pytest.raises(ValueError, match="dangling backslash"):
        R.rtf_text_of(b"{\\rtf1 x}"[:-1] + b"\\")
    with pytest.raises(ValueError, match="truncated"):
        R.rtf_text_of(b"{\\rtf1 \\'f")
    with pytest.raises(ValueError, match="bad hex"):
        R.rtf_text_of(b"{\\rtf1 \\'zz}")
    with pytest.raises(ValueError, match="bin length past"):
        R.rtf_text_of(b"{\\rtf1 \\bin99 x}")
    with pytest.raises(ValueError, match="without a code point"):
        R.rtf_text_of(b"{\\rtf1 \\u }")
    deep = b"{\\rtf1 " + b"{" * 300 + b"}" * 300 + b"}"
    with pytest.raises(ValueError, match="nesting over the cap"):
        R.rtf_text_of(deep)


def test_office_text_spark_rtf(spark):
    rows = [
        (0, R.build_rtf(["alpha", "beta"])),
        (1, R.build_rtf(["x"], title="T", author="A")),
        (2, b"{\\rtf1 broken"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in O.office_text(df).collect()}
    assert (got[0].doc_format, got[0].part_name, got[0].text) == (
        "rtf", "rtf", "alpha beta",
    )
    assert got[1].text == "x"
    assert "unclosed" in got[2].error
    info = {r.doc_id: r for r in O.office_info(df).collect()}
    assert (info[1].doc_format, info[1].title, info[1].creator,
            info[1].n_parts) == ("rtf", "T", "A", 1)


def test_uc_skip_counts_control_words_as_entities():
    """RTF counts a control word as ONE skippable \\uc fallback item;
    a proper '?' fallback leaves following control words intact, and
    group boundaries cancel any pending skip (review finding, r12)."""
    assert _t("{\\rtf1 \\u8212\\par more}") == "—more"
    assert _t("{\\rtf1 \\uc0\\u8212\\par more}") == "—\nmore"
    assert _t("{\\rtf1 \\u8212 ?\\par more}") == "—\nmore"
    # a skip pending at a group boundary dies with the group
    assert _t(r"{\rtf1 \uc2\u956 {ab}cd}") == "μabcd"
    # a following \u starts a NEW character, never gets skipped
    assert _t(r"{\rtf1 \uc0\u956\u957 x}") == "μνx"


def test_uc_skip_processes_state_words():
    """Skipped control words still take STATE effect: a \\uc inside a
    fallback run updates the count, and a \\pict opens its skip
    destination instead of leaking payload (review findings, r12)."""
    assert _t("{\\rtf1 \\uc1\\u956\\uc0\\u957 x}") == "μνx"
    out = _t("{\\rtf1 \\uc1\\u956\\pict 0a0b0c here}")
    assert "0a0b0c" not in out and out.startswith("μ")


def test_mixed_run_batching_matches_slow_path():
    """r13: the text+\\'hh alternation decodes through one batched
    regex scan — output must be byte-identical to the per-escape walk
    (the \\uc-skip slow path doubles as the reference)."""
    # escape-dense alternation, group boundaries, symbol escapes mixed
    s = (r"{\rtf1 a\'e9 b\'e8\'fc c {\b d\'c0} \'41\'42 tail"
         r" \{lit\} \'7b\'7d}")
    assert _t(s) == "aé bèü c dÀ AB tail {lit} {}"
    # a pending \uc skip forces the unbatched path across the same
    # bytes: escape-then-text must count entities identically
    assert _t(r"{\rtf1\uc1 \u956 \'e9after}") == "μafter"
    assert _t(r"{\rtf1\uc3 \u956 ab\'e9x}") == "μx"


def test_mixed_run_dbcs_pairs_decode_together():
    """Batch decode folds a DBCS pair's two \\'hh escapes into one
    codepage decode — cp932 0x88 0xA0 is 唖, which byte-at-a-time
    decoding can never produce."""
    assert _t(r"{\rtf1\ansicpg932 \'88\'a0}") == "唖"


def test_mixed_run_malformed_escape_still_raises():
    with pytest.raises(ValueError, match="rtf"):
        _t(r"{\rtf1 text\'q9}")
    with pytest.raises(ValueError, match="truncated"):
        _t(r"{\rtf1 x\'a")
