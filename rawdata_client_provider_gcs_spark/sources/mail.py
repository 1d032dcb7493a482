"""mbox / eml mail ingestion — mailing-list archives as corpus data.

Public mailing-list archives (the classic mbox shape: messages
concatenated with ``From `` separator lines) are a staple dialogue
corpus: threads reconstruct into multi-turn conversations via
``Message-ID`` / ``In-Reply-To``.  This source explodes an mbox (or a
single ``.eml``) into per-message rows with the fields a curation
pipeline consumes — sender, subject, date, thread linkage, the decoded
``text/plain`` body, attachment count.

Parsing leans on the stdlib ``email`` package deliberately (unlike the
hand-parsed ZIP/TAR tier): MIME is a header-driven format with decades
of real-world deviance that ``email``'s compat32/default policies
already encode, and the stdlib is itself the verification oracle —
there is no bomb surface here beyond message COUNT, which is bounded.

mbox splitting follows RFC 4155: a message starts at a line beginning
``From `` at the start of the file or after a blank line; body lines
that themselves start with ``From `` arrive ``>From``-quoted by
writers and are unquoted here (``>>From`` → ``>From``, one level).

One Arrow task per mailbox row (the WARC/archive fan-out shape);
hostile bytes land per-row as ``ValueError``.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); mail
explosion belongs to this repo's derived ingestion tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: bound on messages per mailbox (hostile separator floods)
MAX_MESSAGES = 100_000

MAIL_SCHEMA = (
    "doc_id long, msg_idx long, message_id string, in_reply_to string, "
    "sender string, subject string, date_utc timestamp, body string, "
    "n_attachments long, error string"
)


def split_mbox(data: bytes) -> list[bytes]:
    """RFC 4155 split: ``From `` at file start or after a blank line
    begins a message; returns raw message blocks (separator dropped,
    one level of ``>From`` quoting undone)."""
    if not data.startswith(b"From "):
        raise ValueError("mbox: payload does not start with a From_ line")
    messages: list[bytes] = []
    cur: list[bytes] = []
    prev_blank = True
    for line in data.splitlines(keepends=True):
        if prev_blank and line.startswith(b"From "):
            if cur:
                messages.append(b"".join(cur))
                if len(messages) >= MAX_MESSAGES:
                    raise ValueError("mbox: message count over the cap")
            cur = []
        else:
            if line.startswith(b">") and line.lstrip(b">").startswith(b"From "):
                line = line[1:]  # undo one quoting level
            cur.append(line)
        prev_blank = line.strip() == b""
    if cur:
        messages.append(b"".join(cur))
    return messages


def parse_message(raw: bytes) -> dict:
    """One RFC 5322 message → the curation fields (stdlib ``email``)."""
    import email
    import email.policy
    import email.utils

    msg = email.message_from_bytes(raw, policy=email.policy.default)
    body = ""
    n_attach = 0
    if msg.is_multipart():
        for part in msg.walk():
            if part.is_multipart():
                continue
            disp = (part.get_content_disposition() or "").lower()
            if disp == "attachment":
                n_attach += 1
            elif part.get_content_type() == "text/plain" and not body:
                body = part.get_content()
    else:
        if msg.get_content_type() == "text/plain":
            body = msg.get_content()
    date = None
    raw_date = msg.get("Date")
    if raw_date:
        try:
            dt = email.utils.parsedate_to_datetime(raw_date)
            if dt.tzinfo is not None:
                import datetime as _dt

                dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            date = dt
        except (ValueError, TypeError):
            date = None
    return {
        "message_id": (msg.get("Message-ID") or "").strip(),
        "in_reply_to": (msg.get("In-Reply-To") or "").strip(),
        "sender": str(msg.get("From") or ""),
        "subject": str(msg.get("Subject") or ""),
        "date_utc": date,
        "body": body,
        "n_attachments": n_attach,
    }


def parse_mailbox(data: bytes) -> list[dict]:
    """mbox (``From `` separators) or a bare single message (.eml)."""
    if data.startswith(b"From "):
        return [parse_message(m) for m in split_mbox(data)]
    if not data.strip():
        raise ValueError("mail: empty payload")
    m = parse_message(data)
    # stdlib email parses ANY bytes as a headerless body-only message;
    # a bare .eml with none of the core RFC 5322 headers is mislabeled
    # data, not mail — per-row ValueError, not a junk-body row
    if not (m["message_id"] or m["sender"] or m["subject"] or m["date_utc"]):
        raise ValueError("mail: payload carries no RFC 5322 headers")
    return [m]


def mailbox_messages(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Explode mailbox payloads into one row per message (the WARC
    fan-out shape: one Arrow task per mailbox, per-row error capture)."""

    def run(batches):
        import pandas as pd

        cols = (
            "doc_id", "msg_idx", "message_id", "in_reply_to", "sender",
            "subject", "date_utc", "body", "n_attachments", "error",
        )
        for pdf in batches:
            rows = {k: [] for k in cols}

            def emit(did, idx=None, m=None, err=None):
                rows["doc_id"].append(did)
                rows["msg_idx"].append(idx)
                for k in ("message_id", "in_reply_to", "sender", "subject",
                          "date_utc", "body", "n_attachments"):
                    rows[k].append(m[k] if m else None)
                rows["error"].append(err)

            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    emit(did, err="ValueError: null mailbox payload")
                    continue
                try:
                    msgs = parse_mailbox(bytes(payload))
                except Exception as exc:  # noqa: BLE001 — per-row capture
                    emit(did, err=f"{type(exc).__name__}: {str(exc)[:200]}")
                    continue
                for idx, m in enumerate(msgs):
                    emit(did, idx, m)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, MAIL_SCHEMA)


def build_mbox(messages: list[dict]) -> bytes:
    """Fixture writer via the stdlib generator (the interop direction:
    stdlib writes, this module's splitter + parser read)."""
    from email.message import EmailMessage
    from email.utils import format_datetime

    out = bytearray()
    for m in messages:
        em = EmailMessage()
        em["From"] = m["sender"]
        em["Subject"] = m["subject"]
        em["Message-ID"] = m["message_id"]
        if m.get("in_reply_to"):
            em["In-Reply-To"] = m["in_reply_to"]
        if m.get("date"):
            em["Date"] = format_datetime(m["date"])
        em.set_content(m["body"])
        for att in m.get("attachments", ()):
            em.add_attachment(
                att, maintype="application", subtype="octet-stream",
                filename="a.bin",
            )
        raw = em.as_bytes()
        # mboxrd quoting: ADD one '>' to any '>*From ' line, the exact
        # inverse of split_mbox's one-level strip — quoting only bare
        # 'From ' (mboxo) silently ate a '>' from pre-quoted body lines
        body_quoted = b"\n".join(
            (b">" + ln if ln.lstrip(b">").startswith(b"From ") else ln)
            for ln in raw.split(b"\n")
        )
        out += b"From mbox@localhost Thu Jan  1 00:00:00 2020\n"
        out += body_quoted
        if not body_quoted.endswith(b"\n"):
            out += b"\n"
        out += b"\n"
    return bytes(out)


def assign_threads(messages: DataFrame, max_hops: int = 16) -> DataFrame:
    """Attach ``thread_id`` (the root Message-ID) to each message row.

    Pointer-jumping over ``In-Reply-To``: each iteration doubles the
    resolved chain depth, so ``max_hops`` iterations cover threads
    2^max_hops deep — id-only shuffles, no collect, the connected-
    components shape bounded by real thread depth (mailing-list threads
    are shallow; 16 hops covers depth 65k).  Lineage is checkpointed
    every three hops and the loop exits at the first unchanged block,
    so the default depth budget costs shallow corpora two blocks.  Replies whose parent is
    missing from the corpus (pruned or crawled partially) root at the
    nearest missing ancestor's Message-ID rather than erroring: the
    pointer chain stops at the first ID with no corpus row, so every
    orphan sibling of that hole still lands in one thread, keyed by an
    ID that has no message row of its own.
    """
    from pyspark.sql import functions as F

    # duplicate Message-IDs (cross-posts, re-crawls) must not multiply
    # through the iterated self-joins: the pointer table is keyed on a
    # UNIQUE id set; the final join fans the thread_id back out to every
    # duplicate message row.  In-Reply-To cycles (corrupt headers) are
    # bounded by max_hops: a 2-cycle stabilizes with each message
    # rooting at itself; longer cycles land on a deterministic-for-
    # fixed-hops root — split threads for corrupt data, never a hang.
    cur = messages.select(
        "message_id",
        F.when(
            (F.col("in_reply_to").isNull()) | (F.col("in_reply_to") == ""),
            F.col("message_id"),
        ).otherwise(F.col("in_reply_to")).alias("root"),
    ).filter(F.col("message_id") != "").dropDuplicates(["message_id"])
    # each self-join DOUBLES the logical plan, so uncheckpointed hops grow
    # the analyzer's work 2^max_hops — localCheckpoint every block of 3
    # truncates lineage (same convention as dedup components), and the
    # per-block fixed-point probe (an id-only limit(1) anti-compare, cheap
    # against the just-materialized checkpoints) exits as soon as a block
    # changed nothing, so shallow real threads stop after one block
    cur = cur.localCheckpoint(eager=True)
    hop = 0
    while hop < max_hops:
        block = min(3, max_hops - hop)
        prev = cur
        for _ in range(block):
            parent = cur.select(
                F.col("message_id").alias("p_id"),
                F.col("root").alias("p_root"),
            )
            cur = (
                cur.join(parent, cur["root"] == parent["p_id"], "left")
                .select(
                    "message_id",
                    F.coalesce("p_root", "root").alias("root"),
                )
            )
        cur = cur.localCheckpoint(eager=True)
        hop += block
        changed = (
            cur.join(
                prev.select(
                    "message_id", F.col("root").alias("prev_root")
                ),
                "message_id",
            )
            .filter(F.col("root") != F.col("prev_root"))
            .limit(1)
            .count()
        )
        if changed == 0:
            break
    return messages.join(
        cur.withColumnRenamed("root", "thread_id"), "message_id", "left"
    )
