"""Byte-pair encoding for training-data pipelines: learn a merge table from
a corpus and apply it — the real-tokenizer upgrade over the regex
token-count heuristics in :mod:`cefspark.textops`.

Scale contract:

- :func:`learn_bpe` aggregates the corpus ONCE into a word-frequency
  relation (one hash shuffle, map-side combined — shuffle volume is
  O(distinct words), never O(tokens)), bounds it to the ``max_words`` most
  frequent words (ties broken by word, so the working set is a
  deterministic pure function of the corpus), and runs the classic merge
  loop driver-side over that bounded dictionary — the standard
  Sennrich-style formulation: merge statistics come from word TYPES
  weighted by frequency, so the driver never sees corpus bytes, only the
  (word, count) table.
- :func:`apply_bpe` is a single Arrow-batched ``mapInPandas`` projection
  (no shuffle): each executor applies the broadcast merge ranks with a
  per-batch word cache, so a word's segmentation is computed once per
  distinct word per batch regardless of how often it repeats.

Determinism: merges are a pure function of the word-count table (integer
counts; pair ties break lexicographically), and segmentation is a pure
function of (word, merges) — independent of partitioning, arrival order,
and parallelism, so a resumed job re-derives the identical vocabulary.

No counterpart in the reference codec — training-data-pipeline extension
(SURVEY.md §2 extras), like dedup/langid/packing.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word-frequency relation ``(word, n)`` — the ONE corpus
    aggregation BPE learning needs (map-side combined hash shuffle)."""
    return (df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                      .alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("n")))


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + n
    return stats


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, merged = 0, pair[0] + pair[1]
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(df: DataFrame, n_merges: int, text_col: str = "text",
              max_words: int = 50_000,
              end_of_word: Optional[str] = None) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list (highest-frequency pair first; frequency ties break on the
    lexicographically smallest pair, so the result is deterministic).

    ``max_words`` bounds the driver-side dictionary to the most frequent
    word types (count DESC, word ASC) — the standard practical cap: rare
    tail types contribute negligible pair mass, and the cap makes driver
    memory independent of corpus vocabulary growth. ``end_of_word``
    (e.g. ``"</w>"``) appends a word-final marker symbol so merges can
    distinguish word-final from word-internal contexts; ``None`` skips it
    (marker-free BPE — what the token-counting gates use)."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    rows = (word_counts(df, text_col)
            .orderBy(F.col("n").desc(), F.col("word").asc())
            .limit(max_words).collect())
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"]) + ((end_of_word,) if end_of_word else ())
        vocab[syms] = vocab.get(syms, 0) + r["n"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(s, best): n for s, n in vocab.items()}
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int],
                 end_of_word: Optional[str] = None) -> list[str]:
    """Segment ONE word with learned merges by the standard greedy
    lowest-rank rule — equivalent to replaying the merge list in order for
    any list :func:`learn_bpe` can produce (hypothesis-pinned). The
    equivalence is NOT universal: a hand-ordered list whose earlier merge
    consumes a symbol only a LATER merge creates (e.g. ``[("dd","d"),
    ("d","d")]``) diverges — but such a list is unlearnable, since a
    merged symbol cannot pre-exist its own creating merge."""
    syms = list(word) + ([end_of_word] if end_of_word else [])
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            rk = ranks.get(pair)
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id",
              end_of_word: Optional[str] = None) -> DataFrame:
    """Tokenize every document with a learned merge table:
    ``(id_col, bpe_tokens array<string>, n_bpe_tokens long)``.

    One Arrow-batched ``mapInPandas`` projection — payload never shuffles;
    a per-batch cache segments each distinct word once."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            toks = cache.get(word)
            if toks is None:
                toks = segment_word(word, ranks, end_of_word)
                cache[word] = toks
            return toks

        for pdf in batches:
            toks = [
                [t for w in str(text).split() for t in seg(w)]
                if text is not None else []
                for text in pdf[text_col]
            ]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "bpe_tokens": toks,
                "n_bpe_tokens": [len(t) for t in toks]})

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, bpe_tokens array<string>, n_bpe_tokens long")


#: Fixed merge table for the driver gate — the oracle restates every
#: segmentation closed-form, so a match proves the greedy rank loop.
GATE_MERGES: list[tuple[str, str]] = [("a", "b"), ("ab", "c"), ("d", "e")]


def bpe_gate_docs(spark, n: int) -> DataFrame:
    """Deterministic fixture for the apply_bpe gate: doc i is
    ``'abc' x (i%3+1)  +  ('abcabc' | 'xyz')  +  'de'`` — under GATE_MERGES
    these segment to (i%3+1), (2 | 3), and 1 tokens respectively, all
    derivable arithmetically by the oracle."""
    i = F.col("id")
    text = F.concat_ws(
        " ",
        F.array_join(F.array_repeat(F.lit("abc"), (i % 3 + 1).cast("int")), " "),
        F.when(i % 2 == 0, F.lit("abcabc")).otherwise(F.lit("xyz")),
        F.lit("de"))
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))
