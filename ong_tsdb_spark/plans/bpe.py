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


#: rounds the most recent train_bpe_merges call took (each round is
#: one pair-count aggregate + one rewrite) — the bench reads this to
#: report the batching factor without changing the trainer's API.
LAST_TRAIN_ROUNDS = 0


def _exact_batch(
    top: list[tuple[str, int]],
    floor: int,
    limit: int,
    min_count: int,
    guard: str = "exact",
) -> list[tuple[str, str]]:
    """The longest PREFIX of the (count desc, pair asc)-sorted
    candidate list that sequential greedy BPE would provably pick in
    this order WITHOUT recounting — the key to batching merges per
    round while keeping the merge table bit-identical to the
    one-merge-per-round reference.

    Exactness argument (each accepted candidate after the first):

    * prefix rule — every pair ranked above it was itself accepted, so
      skipped/uncollected pairs all rank below it in the OLD order and
      applying the earlier merges can only DECREASE their counts
      (a merge touching symbols {a, b} never creates new occurrences
      of a pair not involving a, b or the merged symbol);
    * disjointness — its symbols don't touch any earlier merge's
      {a, b, a+b}, so its own count is UNCHANGED by applying them;
    * new-pair guard — merges create NEW pairs (x, ab) / (ab, y) whose
      counts are bounded by the OLD counts of (x, a) / (b, y); the
      candidate must rank STRICTLY above the max such bound
      (``right_max[a]`` / ``left_max[b]``) so no freshly created pair
      can outrank it in the recounted table;
    * floor guard — pairs beyond the collected top-M have count <=
      ``floor``; the candidate must rank strictly above that too, or
      an uncollected pair (or a new pair bounded only by floor) could
      tie or win.

    A self-pair (a, a) interacts with its own output ("a a a a" ->
    "aa aa" changes (a,a)'s count nonlinearly), so it always ENDS the
    batch after being accepted.  Any violated guard ends the batch —
    the next round recounts and continues exactly.

    ``guard="disjoint"`` drops the new-pair and floor guards, keeping
    only symbol-disjointness.  It is NOT strictly greedy-exact: a
    merge can create a pair ((a,b) -> (ab,c)) that true greedy would
    take before the next disjoint candidate, so the learned table can
    deviate in ORDER (and occasionally membership) from the reference
    — still a deterministic, valid BPE table.

    ``guard="stale"`` accepts the FULL top-``limit`` ranking with no
    interaction checks at all — frequency-batched BPE: the merges are
    applied sequentially per word in ranked order (the chained
    regexp_replace rewrite IS sequential application, so interacting
    merges compose correctly, e.g. (t,h) then (th,e)), but merge k+1
    of a round is chosen by PRE-round counts instead of post-merge-k
    counts.  This is the standard production approximation for
    30k-merge vocabs: rounds = ceil(n_merges / batch), a true
    ~batch-x job reduction.

    Why three modes: on natural text the exact guards — and even bare
    disjointness — bind hard (the top pairs all share e/t/h/space-
    adjacent symbols; after (t,h) the true next merge usually IS
    (th,e)), capping exact/disjoint batching near ~1.6-1.9x measured;
    only stale-count batching breaks the sequential dependence."""
    if guard not in ("exact", "disjoint", "stale"):
        raise ValueError(
            f"guard must be 'exact', 'disjoint' or 'stale', got {guard!r}"
        )
    left_max: dict[str, int] = {}
    right_max: dict[str, int] = {}
    for p, n in top:
        a, b = p.split(" ")
        left_max[a] = max(left_max.get(a, 0), n)
        right_max[b] = max(right_max.get(b, 0), n)
    accepted: list[tuple[str, str]] = []
    used: set[str] = set()
    new_bound = 0
    for p, n in top:
        if len(accepted) >= limit or n < min_count:
            break
        a, b = p.split(" ")
        if accepted and guard != "stale":
            if a in used or b in used:
                break
            if guard == "exact" and (n <= new_bound or n <= floor):
                break
        accepted.append((a, b))
        if a == b and guard != "stale":
            break  # self-pair: nonlinear self-interaction ends the batch
        used.update((a, b, a + b))
        new_bound = max(
            new_bound, right_max.get(a, 0), left_max.get(b, 0), floor
        )
    return accepted


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_count: int = 2,
    batch: int = 16,
    guard: str = "exact",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge table [(a, b), ...]; stops early when the best
    remaining pair occurs fewer than ``min_count`` times.

    Determinism: each round's merges are a provably-exact prefix of
    the (count desc, pair asc) ranking (see :func:`_exact_batch`), a
    total order over exact integer counts — so the learned table is
    independent of partitioning AND of ``batch``: any ``batch`` value
    (including 1, the one-merge-per-round reference loop) yields the
    IDENTICAL merge table, pinned against the pure-Python twin in
    tests/test_bpe.py.  Batching exists because the sequential loop is
    one Spark job pair PER MERGE — at a production 30k-merge vocab
    that is 60k+ jobs; accepting up to ``batch`` non-interacting
    merges per round cuts rounds ~batch-fold on natural corpora
    (``LAST_TRAIN_ROUNDS`` records the realized round count).
    ``guard="disjoint"`` trades strict greedy order for full ~batch-x
    round reduction — see :func:`_exact_batch` for the deviation it
    admits."""
    from ..operators.dedup import ensure_parallelism
    from ..operators.text import tokens

    global LAST_TRAIN_ROUNDS
    batch = max(1, int(batch))
    cur = (
        ensure_parallelism(df)
        .select(F.explode_outer(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").isNotNull() & (F.length("w") >= 1))
        .select(_sym_string(F.col("w")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        # collect enough of the ranking that the batch rule has slack:
        # the floor guard stops the batch at the collection horizon
        top_m = 1 if batch == 1 else max(64, 8 * batch)
        top = (
            cur.select(
                F.explode_outer(_pairs_expr(F.split(F.col("syms"), " "))).alias("p")
            )
            .filter(F.col("p").isNotNull())
            .groupBy("p")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p").asc())
            .limit(top_m)
            .collect()
        )
        rounds += 1
        ranked = [(r["p"], int(r["n"])) for r in top]
        # a short collection saw the WHOLE table: nothing lurks below
        floor = ranked[-1][1] if len(ranked) == top_m else 0
        accepted = _exact_batch(
            ranked, floor, limit=min(batch, n_merges - len(merges)),
            min_count=min_count, guard=guard,
        )
        if not accepted:
            break
        merges.extend(accepted)
        syms = F.col("syms")
        # chained replaces apply IN RANKED ORDER — required for
        # guard="stale" where in-batch merges may interact; a no-op
        # reordering for the disjoint/exact modes
        for a, b in accepted:
            syms = F.regexp_replace(
                syms, merges_pattern(a, b), _quote_replacement(a + b)
            )
        cur = cur.select(syms.alias("syms")).localCheckpoint(eager=True)
    LAST_TRAIN_ROUNDS = rounds
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
