"""Distributed BPE tokenizer training (byte-pair-encoding merges).

Beyond-reference LLM-pipeline surface: learn a BPE merge table from a
document corpus the way production trainers do it (Sennrich et al.
2016, arXiv:1508.07909) — and the way it SCALES:

1. ONE corpus pass builds the (word, freq) table: pre-tokenize with
   the repo's lookahead-free ``BPE_PATTERN`` (``operators/text.py``),
   explode, groupBy word. At 100 TB this is the only corpus-sized
   job; everything after runs on the word VOCABULARY (≈10^5..10^7
   rows regardless of corpus size — Heaps' law), cached in cluster
   memory.
2. Each merge round runs entirely on the vocab table: explode
   adjacent symbol pairs weighted by word freq, sum per pair
   (map-side partial agg), take the argmax (ties broken
   lexicographically for determinism), then rewrite every word's
   symbol array with a single left-to-right fold — a pure JVM
   ``F.aggregate`` expression, no Python row path.
3. Driver state is just the merge list (k rows); per round exactly
   one small shuffle on pair strings.

``bpe_apply`` re-tokenizes text with a learned merge list using the
same fold expression — merges applied in rank order, each a
vocab-table-free pure column expression, so applying a k-merge
tokenizer to a corpus is one scan with k folds inside whole-stage
codegen territory (no UDFs anywhere in this module).

End-of-word handling: the classic ``</w>`` marker is appended as a
final separate symbol so merges cannot cross word boundaries and
word-final units stay distinct from word-internal ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import BPE_PATTERN

EOW = "</w>"


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq): the single corpus-sized pass of BPE training."""
    from .text import fan_out

    c = F.col(text_col)
    words = fan_out(df).select(
        F.explode_outer(
            F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))
        ).alias("word")
    )
    return (
        words.where(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """'abc' -> ['a', 'b', 'c', '</w>'] (the empty strings a zero-width
    split can emit are filtered, so the symbol list is exactly the
    characters plus the end-of-word marker)."""
    chars = F.filter(F.split(word, ""), lambda s: s != F.lit(""))
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_adjacent(syms: Column, left: str, right: str) -> Column:
    """Fold that merges every adjacent (left, right) into left||right,
    left-to-right non-overlapping — pure JVM expression."""
    merged = F.lit(left + right)
    # F.get (0-based) returns null past the end instead of raising
    # under ANSI mode, so the empty-accumulator first step is safe
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, freq) of adjacent symbol pairs weighted by word
    frequency. ``zip_with`` over the array and its shift — no
    per-pair re-evaluation of upstream expressions."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 16,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns
    ``[(left, right, pair_freq), ...]`` in merge order.

    Stops early when no pair reaches ``min_freq``. Ties on frequency
    break lexicographically on (left, right) so training is
    deterministic regardless of partitioning."""
    vocab = word_freq_table(df, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    )
    vocab = vocab.cache()
    try:
        merges: list[tuple[str, str, int]] = []
        for _ in range(num_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("freq"), "left", "right")
                .limit(1)
                .collect()
            )
            if not top or top[0]["freq"] < min_freq:
                break
            left, right, freq = top[0]["left"], top[0]["right"], top[0]["freq"]
            merges.append((left, right, int(freq)))
            new_vocab = vocab.select(
                _merge_adjacent(F.col("syms"), left, right).alias("syms"),
                "freq",
            ).cache()
            new_vocab.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = new_vocab
        return merges
    finally:
        vocab.unpersist()


def bpe_apply(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: pre-tokenize,
    split words to symbols, apply each merge in rank order (k chained
    fold expressions, one corpus scan, no UDFs)."""
    from .text import bind

    def tokenize(word: Column) -> Column:
        syms = _initial_symbols(word)
        for m in merges:
            syms = _merge_adjacent(syms, m[0], m[1])
        return syms

    c = F.col(text_col)
    words = F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))
    toks = bind(
        words,
        lambda ws: F.flatten(F.transform(ws, tokenize)),
    )
    return df.withColumn(out_col, toks)
