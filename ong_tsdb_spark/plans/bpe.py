"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The classic greedy merge loop, re-expressed for Spark's execution
model: the corpus lives distributed as per-word SYMBOL STRINGS
(space-joined symbols, round 0 = characters), and each round is

  1. one pair-count aggregate — pairs are generated map-side from the
     symbol arrays and hash-combined before the shuffle, so the wire
     carries ``mappers x |distinct pairs|`` rows (symbol-vocab^2
     bounded), never the corpus token stream;
  2. a driver-side argmax of ONE (pair, count) row — the only data
     the driver ever holds is the merge table itself;
  3. a map-side merge application: one ``regexp_replace`` with
     zero-width lookarounds (``(?<= |^)a b(?= |$)``) so consecutive
     occurrences sharing a boundary space all merge in a single pass
     — exactly the greedy left-to-right non-overlapping scan of the
     reference algorithm (pinned against a pure-Python twin in
     tests/test_bpe.py).

State between rounds is localCheckpoint-ed: the symbol table is
corpus-sized and each round's replace would otherwise stack one more
regex onto the lineage, re-running the whole chain per count job.

At 100 TB this is the right shape: n_merges rounds of (scan + tiny
shuffle + broadcastable single-regex rewrite), with cluster-wide work
bounded by the corpus scan per round and driver memory bounded by the
merge table.  (Production tokenizers batch many merges per round with
heap-updated counts; one-merge-per-round is the reference algorithm
and keeps the distributed state trivially checkpointable.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_bpe_merges",
    "tokenize_with_merges",
    "tokenize_expr",
    "merge_word_py",
    "apply_merges_py",
]


def _sym_string(word):
    """'abc' -> 'a b c' (space-joined single-char symbols).  DOTALL so
    embedded line terminators become symbols like any other character
    — without it a word containing ``\\n`` would keep a multi-char
    ``\\nX`` unit that the pure-Python reference (``list(word)``) can
    never produce, silently desynchronizing train and serve."""
    return F.trim(F.regexp_replace(word, "(?s)(.)", "$1 "))


def _pairs_expr(syms):
    """array<string> of 'a b' adjacent-symbol pairs (null if < 2)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(
                F.element_at(syms, i.cast("int")),
                F.lit(" "),
                F.element_at(syms, (i + F.lit(1)).cast("int")),
            ),
        ),
    )


def _quote_replacement(s: str) -> str:
    """Escape Java Matcher replacement metacharacters (backslash, $)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge table [(a, b), ...]; stops early when the best
    remaining pair occurs fewer than ``min_count`` times.

    Determinism: each round's merge is the (count desc, pair asc)
    argmax — a total order, so the learned table is independent of
    partitioning (counts are exact integers)."""
    from ..operators.dedup import ensure_parallelism
    from ..operators.text import tokens

    cur = (
        ensure_parallelism(df)
        .select(F.explode_outer(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").isNotNull() & (F.length("w") >= 1))
        .select(_sym_string(F.col("w")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            cur.select(
                F.explode_outer(_pairs_expr(F.split(F.col("syms"), " "))).alias("p")
            )
            .filter(F.col("p").isNotNull())
            .groupBy("p")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p").asc())
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["n"]) < min_count:
            break
        a, b = top[0]["p"].split(" ")
        merges.append((a, b))
        cur = cur.select(
            F.regexp_replace(
                "syms", merges_pattern(a, b), _quote_replacement(a + b)
            ).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


# ----------------------------------------------------------------------
# pure-Python reference (the pinned twin — also the serving-side
# tokenizer for callers that want to apply a learned table off-Spark)
# ----------------------------------------------------------------------

def merge_word_py(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (a, b) — the
    reference semantics the distributed regexp_replace must match."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge table (in order)."""
    syms = list(word)
    for a, b in merges:
        syms = merge_word_py(syms, a, b)
    return syms


def merges_pattern(a: str, b: str) -> str:
    """The zero-width-lookaround pattern applying merge (a, b) to a
    space-joined symbol string — shared by training and inference so
    the two can never diverge.  ``\\z``, NOT ``$``: Java's ``$`` also
    matches before a FINAL line terminator, so a symbol string ending
    in a newline symbol (e.g. ["q", "a\\n"] -> "q a\\n") would
    false-match ``q a(?= |$)`` mid-symbol and merge across the symbol
    boundary; ``\\z`` anchors to the true end of input."""
    return f"(?<= |^){re.escape(a)} {re.escape(b)}(?= |\\z)"


def tokenize_expr(text, merges: list[tuple[str, str]]):
    """Tokenize a text column with a learned merge table, as ONE pure
    column expression: per word, start from the character symbol
    string and apply every merge in order via the same lookaround
    regex the trainer uses, then split back to symbols.

    Map-side only — the merge table is baked into the plan as
    |merges| chained regexp_replace calls (a broadcast-sized model,
    like the classifier weights), so corpus-scale tokenization costs
    exactly the scan.  Returns array<string> of subword tokens in
    document order (word boundaries flattened).  Equal to the
    pure-Python ``apply_merges_py`` per word — pinned by test."""

    def _tok_word(w):
        s = _sym_string(w)
        for a, b in merges:
            s = F.regexp_replace(s, merges_pattern(a, b), _quote_replacement(a + b))
        return F.split(s, " ")

    # empty words (consecutive/leading/trailing spaces) contribute NO
    # symbols — exactly like the trainer's length>=1 filter and the
    # reference's list('') == []; without this each empty word would
    # emit a spurious '' token and inflate n_tokens
    words = F.filter(F.split(text, " "), lambda w: w != F.lit(""))
    return F.flatten(F.transform(words, _tok_word))


def tokenize_with_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) for every document under a
    learned BPE merge table — the inference side of
    :func:`train_bpe_merges`, closing the train -> apply loop at
    corpus scale."""
    toks = tokenize_expr(F.col(text_col), merges)
    return df.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
