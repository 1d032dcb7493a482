"""Trainable byte-pair-encoding tokenizer over a document corpus.

`functions/text.py` counts tokens with a fixed BPE-ish regex; this
module learns a REAL merge table from the corpus and applies it — the
tokenizer-training step of an LLM data pipeline.

Architecture for 100 TB (the same bounded-training/distributed-apply
split as IVF/PQ in ``operators/similarity.py``):

1. **Word frequencies are distributed.**  One tokenize + explode +
   count shuffle produces the word-frequency table — the only pass over
   raw text.  BPE training famously needs nothing else: merge counts
   are weighted sums over the *distinct-word* table, whose size is the
   corpus vocabulary (millions at web scale), not the corpus.
2. **The merge loop is driver-side on a bounded vocabulary.**  The top
   ``max_vocab_words`` words by frequency (a TakeOrdered, bounded)
   train the merges with the classic pair-count + inverted-index loop.
   Ties break lexicographically so training is deterministic.
3. **Application is distributed.**  The merge ranks broadcast as a
   plain dict; an Arrow-batched ``mapInPandas`` kernel applies them
   per word with an LRU word cache (Zipf's law makes the hit rate
   enormous) and never moves the corpus to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = "[a-z0-9]+"  # house tokenization (functions/text.py)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed (word, freq) table — the only full-corpus pass."""
    return (
        docs.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)"
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_merges_local(
    word_freq: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning on a (word, freq) table.

    Pure driver-side function (also unit-testable without Spark).
    Maintains pair counts and an inverted pair→words index so each merge
    touches only the words containing the merged pair.  Ties on count
    break on the lexicographically smallest pair for determinism.
    """
    words = {w: list(w) for w, _ in word_freq}
    freqs = dict(word_freq)

    def count_pairs():
        counts: dict[tuple[str, str], int] = {}
        index: dict[tuple[str, str], set] = {}
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
                index.setdefault((a, b), set()).add(w)
        return counts, index

    counts, index = count_pairs()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w in list(index.get(best, ())):
            syms = words[w]
            f = freqs[w]
            # un-count this word's pairs, apply the merge, re-count
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] -= f
                if counts[(a, b)] <= 0:
                    del counts[(a, b)]
                index[(a, b)].discard(w)
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            for a, b in zip(out, out[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
                index.setdefault((a, b), set()).add(w)
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn a merge table from the corpus.

    The driver sees only the ``max_vocab_words`` most frequent words
    (ties broken by word text) — bounded regardless of corpus size.
    """
    top = (
        word_frequencies(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return train_merges_local([(r["word"], r["freq"]) for r in top], num_merges)


def apply_merges_to_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word with a learned merge-rank table (lowest rank
    merges first — the canonical BPE application order)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed application: (id, tokens array<string>, n_tokens).

    The merge table broadcasts with the serialized kernel closure (it is
    ``num_merges`` small strings); a per-executor word→tokens cache
    exploits Zipf — each distinct word is segmented once per batch
    stream, not once per occurrence.
    """
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}
    token_re = re.compile(_TOKEN_RE)

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def segment(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is None:
                hit = cache[word] = apply_merges_to_word(word, ranks)
            return hit

        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for word in token_re.findall((text or "").lower()):
                    out.extend(segment(word))
                toks.append(out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, tokens array<string>, n_tokens long"
    )
