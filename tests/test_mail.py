"""mbox/eml mail source — RFC 4155 splitting + stdlib MIME parsing.

Interop pinned both directions: our fixture bytes read back through
stdlib ``mailbox``, and stdlib-generated messages parse through our
splitter."""

from __future__ import annotations

import datetime

import pytest

from rawdata_client_provider_gcs_spark.sources import mail as M

UTC = datetime.timezone.utc


def _thread():
    return [
        {"sender": "Ana <a@x.org>", "subject": "Hello", "message_id": "<1@x>",
         "body": "line one\nFrom the start, tricky\nbye",
         "date": datetime.datetime(2021, 3, 4, 10, 0, tzinfo=UTC)},
        {"sender": "Bo <b@y.org>", "subject": "Re: Hello",
         "message_id": "<2@y>", "in_reply_to": "<1@x>", "body": "reply text",
         "attachments": [b"\x00\x01"],
         "date": datetime.datetime(
             2021, 3, 4, 11, 30,
             tzinfo=datetime.timezone(datetime.timedelta(hours=2)))},
    ]


def test_mbox_roundtrip_and_quoting():
    out = M.parse_mailbox(M.build_mbox(_thread()))
    assert len(out) == 2
    m0, m1 = out
    assert m0["message_id"] == "<1@x>"
    # the body's own "From " line survives via >From quoting
    assert "From the start, tricky" in m0["body"]
    assert m1["in_reply_to"] == "<1@x>" and m1["n_attachments"] == 1


def test_dates_normalize_to_utc():
    out = M.parse_mailbox(M.build_mbox(_thread()))
    assert out[0]["date_utc"] == datetime.datetime(2021, 3, 4, 10, 0)
    # +02:00 wall time 11:30 -> 09:30 UTC, tz-naive
    assert out[1]["date_utc"] == datetime.datetime(2021, 3, 4, 9, 30)


def test_stdlib_mailbox_reads_our_mbox(tmp_path):
    import mailbox

    path = tmp_path / "t.mbox"
    path.write_bytes(M.build_mbox(_thread()))
    mb = mailbox.mbox(str(path))
    assert len(mb) == 2
    assert mb[0]["Subject"] == "Hello" and mb[1]["In-Reply-To"] == "<1@x>"


def test_single_eml():
    raw = M.build_mbox(_thread()[:1])
    eml = raw.split(b"\n", 1)[1]  # drop the From_ line
    out = M.parse_mailbox(eml)
    assert len(out) == 1 and out[0]["subject"] == "Hello"


def test_hostile_and_caps():
    with pytest.raises(ValueError, match="empty"):
        M.parse_mailbox(b"")
    with pytest.raises(ValueError, match="From_"):
        M.split_mbox(b"not a mailbox")
    # separator flood is bounded
    flood = b"From a\n\n" * (M.MAX_MESSAGES + 10)
    with pytest.raises(ValueError, match="cap"):
        M.split_mbox(flood)
    import random

    rng = random.Random(4)
    for _ in range(100):
        try:
            M.parse_mailbox(b"From " + rng.randbytes(rng.randrange(0, 400)))
        except ValueError:
            pass


def test_spark_kernel_per_row(spark):
    rows = [
        (1, bytearray(M.build_mbox(_thread()))),
        (2, bytearray(b"\x00binary junk, not mail")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = M.mailbox_messages(df).collect()
    good = [r for r in out if r["doc_id"] == 1]
    bad = [r for r in out if r["doc_id"] == 2]
    assert len(good) == 2 and all(r["error"] is None for r in good)
    assert good[1]["in_reply_to"] == "<1@x>"
    assert len(bad) == 1 and bad[0]["error"] is not None


def test_assign_threads_pointer_jumping(spark):
    """Depth-4 chains resolve to one root; orphan replies root at the
    deepest reachable ancestor."""
    from rawdata_client_provider_gcs_spark.sources.mail import assign_threads

    rows = [
        ("<a>", ""), ("<b>", "<a>"), ("<c>", "<b>"), ("<d>", "<c>"),
        ("<x>", ""), ("<y>", "<x>"),
        ("<orphan>", "<gone>"),
    ]
    df = spark.createDataFrame(rows, "message_id string, in_reply_to string")
    out = {r["message_id"]: r["thread_id"]
           for r in assign_threads(df, max_hops=3).collect()}
    assert out["<a>"] == out["<b>"] == out["<c>"] == out["<d>"] == "<a>"
    assert out["<x>"] == out["<y>"] == "<x>"
    assert out["<orphan>"] == "<gone>"  # parent pruned from the corpus
