"""Distributed BPE tokenizer training and encoding (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units" — the byte-pair-merge loop every modern tokenizer trainer runs).

Reference parity: the reference's text surface (reference README.md:11,
101-103) supplies corpora; tokenizer induction is a north-star
training-pipeline addition (SURVEY.md §2 extensions, q129 computes one
round's pair table). This module runs the FULL merge loop.

Scale shape — why this is Spark-friendly at 100 TB:

- The corpus collapses ONCE to the distinct-word frequency table (one
  shuffle; Heaps' law makes |vocab| sublinear in corpus size — billions
  of tokens → millions of distinct words). Every later round works on
  that table, never on the token stream.
- Each merge round is ONE bounded shuffle: explode adjacent symbol
  pairs weighted by word count, aggregate, take the global argmax (a
  1-row collect). Applying the chosen merge is a NARROW per-row array
  fold — no shuffle, no data movement.
- Lineage across hundreds of rounds is the classic iterative-plan trap
  (the same one CC/PageRank hit): the word table is localCheckpointed
  every ``checkpoint_every`` rounds, so the plan stays O(1) deep.
- Real trainers on real corpora batch several merges per counting round
  (the counts barely move between adjacent merges); ``merges_per_round``
  exposes exactly that tradeoff — at its default 1 this is textbook
  BPE, bit-identical to the serial algorithm (the differential test
  pins that); batching trades exactness of ranks for ~k× fewer shuffles
  (still a valid BPE variant: non-overlapping top-k pairs are merged).

The left-to-right greedy merge application is an ``aggregate`` fold:
``acc[-1] == a AND x == b → replace acc[-1] with a||b`` reproduces
serial BPE exactly, including the "aaa" → ["aa","a"] overlap rule (after
a merge fires, its output token is what the next comparison sees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# marks end-of-word so merges can't cross word boundaries and the final
# vocab distinguishes "low" from "low..." prefixes — Sennrich's </w>
END = "▁"  # ▁ (sentencepiece-style marker; single char keeps folds cheap)


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-wide shuffle
    of the whole trainer."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → array of single-character symbols, END appended to the
    last character (merged INTO the symbol, not a standalone token, per
    the paper's word-final marker)."""
    return words.select(
        "w",
        "cnt",
        F.expr(
            "transform(split(w, ''), (c, i) ->"
            f" if(i = length(w) - 1, c || '{END}', c))"
        ).alias("syms"),
    )


def _merge_expr(col: str, a: str, b: str) -> str:
    """SQL fold applying merge (a, b) greedily left-to-right over a
    symbol array — the serial algorithm's exact semantics."""
    qa = a.replace("\\", "\\\\").replace("'", "\\'")
    qb = b.replace("\\", "\\\\").replace("'", "\\'")
    return (
        f"aggregate({col}, cast(array() as array<string>), (acc, x) ->"
        f" if(size(acc) > 0 and element_at(acc, -1) = '{qa}'"
        f" and x = '{qb}',"
        f" concat(slice(acc, 1, size(acc) - 1), array('{qa}' || '{qb}')),"
        " concat(acc, array(x))))"
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    merges_per_round: int = 1,
    checkpoint_every: int = 10,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a document corpus. Returns the
    ordered merge list ``[(left, right, pair_count), ...]`` — the
    tokenizer artifact :func:`apply_bpe` consumes.

    Ties in pair frequency break on the (left, right) pair
    lexicographically, so training is deterministic and
    engine-independent. Stops early when no pair reaches
    ``min_pair_count`` (merging hapax pairs memorizes the corpus)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    words = _initial_symbols(
        word_frequency_table(docs, text_col)
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        k = min(merges_per_round, n_merges - len(merges))
        pairs = (
            words.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (s, i) -> struct(s as a,"
                        " element_at(syms, i + 2) as b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .filter(F.col("n") >= min_pair_count)
            .orderBy(F.desc("n"), "a", "b")
            .limit(k)
            .collect()
        )
        if not pairs:
            break
        if k > 1:
            # batched rounds merge a NON-OVERLAPPING top-k: a pair that
            # shares a symbol with a better-ranked pair must wait for
            # the next count (its frequency is stale once the better
            # merge rewrites the words)
            taken: set[str] = set()
            kept = []
            for r in pairs:
                if r.a in taken or r.b in taken:
                    continue
                kept.append(r)
                taken |= {r.a, r.b, r.a + r.b}
            pairs = kept
        for r in pairs:
            merges.append((r.a, r.b, int(r.n)))
            words = words.select(
                "w",
                "cnt",
                F.expr(_merge_expr("syms", r.a, r.b)).alias("syms"),
            )
        if len(merges) % checkpoint_every < len(pairs):
            words = words.localCheckpoint()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    checkpoint_every: int = 10,
) -> DataFrame:
    """Encode a corpus with a learned merge list: each document gains
    ``out_col`` (array of subword tokens, END-marked word finals).

    Scale shape: the merges are applied over the DISTINCT-WORD table
    (fold per merge, narrow, localCheckpointed every
    ``checkpoint_every`` merges so the plan stays shallow), then the
    encoded words join back to the exploded corpus — one shuffle on the
    word key plus the per-document regroup. The token stream itself is
    never folded ``len(merges)`` times."""
    spark = docs.sparkSession
    words = _initial_symbols(
        word_frequency_table(docs, text_col).drop("cnt").withColumn(
            "cnt", F.lit(1)
        )
    ).drop("cnt")
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        words = words.select(
            "w", F.expr(_merge_expr("syms", a, b)).alias("syms")
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    # Unique per-row id BEFORE the explode: grouping back by the document
    # columns alone would collapse fully identical rows into one output
    # row with every word's tokens doubled (round-5 advisor). The id is
    # partition-local arithmetic (no shuffle) and is dropped on return.
    tagged = docs.withColumn("__rid", F.monotonically_increasing_id())
    exploded = tagged.select(
        "*",
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("__pos", "__w"),
    ).filter(F.col("__w") != "")
    # inner join always hits: the word table is built from the corpus
    # being ENCODED (not the training corpus), so cross-corpus encoding
    # — fit on train, encode eval — works by construction: train-time
    # merges simply don't fire on pairs the new words lack, which is the
    # serial encoder's exact behavior
    joined = exploded.join(
        words.withColumnRenamed("w", "__w"), "__w", "inner"
    )
    other_cols = [c for c in docs.columns]
    return (
        joined.groupBy("__rid", *other_cols)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias(out_col)
        )
        .drop("__rid")
    )
