"""Distributed BPE trainer vs a serial reference implementation of
Sennrich et al.'s algorithm — merge lists must be IDENTICAL (same pair,
same count, same order) on random corpora, and apply_bpe must reproduce
the serial encoder."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from mysoftware_nocnetintel_spark.operators.bpe import (
    END,
    apply_bpe,
    train_bpe,
)


# ---------------------------------------------------------- serial oracle
def _serial_train(word_counts: dict[str, int], n_merges: int, min_count=2):
    symsets = {
        w: [c + (END if i == len(w) - 1 else "") for i, c in enumerate(w)]
        for w in word_counts
    }
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in symsets.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += word_counts[w]
        pc = {p: n for p, n in pc.items() if n >= min_count}
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((a, b, n))
        for w, syms in symsets.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            symsets[w] = out
    return merges, symsets


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_planted_merges(spark):
    docs = _mk_docs(spark, ["low low low lower lowest", "low lower"])
    merges = train_bpe(docs, n_merges=3)
    # 'lo' dominates: "l","o" appears in every word (count 7); then the
    # end-marked ("lo","w▁") of the 4 standalone "low"s beats the
    # word-internal ("lo","w") of lower/lowest (3)
    assert merges[0][:2] == ("l", "o") and merges[0][2] == 7
    assert merges[1] == ("lo", f"w{END}", 4)


@pytest.mark.parametrize("seed", [3, 21])
def test_train_matches_serial_reference(spark, seed):
    rng = random.Random(seed)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(30)
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 12)))
        for _ in range(12)
    ]
    wc: Counter = Counter(w for t in texts for w in t.split())
    expect, symsets = _serial_train(dict(wc), n_merges=12)
    got = train_bpe(_mk_docs(spark, texts), n_merges=12)
    assert got == expect, f"seed={seed}"

    # encoding parity: every document's token stream equals the serial
    # encoder's concatenation of its words' symbol lists
    enc = apply_bpe(_mk_docs(spark, texts), got)
    by_id = {r.doc_id: list(r.bpe_tokens) for r in enc.collect()}
    for i, t in enumerate(texts):
        ref = [s for w in t.split() for s in symsets[w]]
        assert by_id[i] == ref, f"seed={seed} doc={i}"


def test_batched_rounds_are_valid_nonoverlapping_merges(spark):
    texts = ["aa bb aa bb cc dd", "aa bb cc dd ee"]
    docs = _mk_docs(spark, texts)
    merges = train_bpe(docs, n_merges=4, merges_per_round=4)
    # every merge is a real adjacent pair with its true count at the
    # time of counting, and no symbol repeats within one batch
    assert len(merges) >= 2
    seen = set()
    for a, b, n in merges:
        assert n >= 2
        assert a not in seen and b not in seen
        seen |= {a, b, a + b}


def test_cross_corpus_encode_matches_serial(spark):
    """Fit on train, encode EVAL (words the trainer never saw): merges
    fire only where pairs match — exactly the serial encoder."""
    train = ["low low low lower lowest", "low lower"]
    eval_ = ["slow lowest glow unseen"]
    wc = Counter(w for t in train for w in t.split())
    merges = train_bpe(_mk_docs(spark, train), n_merges=5)
    expect_merges, _ = _serial_train(dict(wc), n_merges=5)
    assert merges == expect_merges

    enc = apply_bpe(_mk_docs(spark, eval_), merges)
    by_id = {r.doc_id: list(r.bpe_tokens) for r in enc.collect()}
    # serial encode of the eval words with the train merges
    ref = []
    for w in eval_[0].split():
        syms = [
            c + (END if i == len(w) - 1 else "") for i, c in enumerate(w)
        ]
        for a, b, _n in merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        ref.extend(syms)
    assert by_id[0] == ref


def test_min_pair_count_stops_early(spark):
    docs = _mk_docs(spark, ["ab cd ef"])  # every pair is a hapax
    assert train_bpe(docs, n_merges=5, min_pair_count=2) == []


def test_duplicate_rows_encode_independently(spark):
    """Two fully identical document rows must each keep their OWN token
    stream (round-5 advisor: grouping back by the document columns alone
    collapsed them into one row with every word's tokens doubled)."""
    texts = ["low low lower", "low low lower", "lowest low"]
    docs = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    )  # no id column at all — the worst case the advisor flagged
    merges = train_bpe(docs, n_merges=3)
    enc = apply_bpe(docs, merges).collect()
    assert len(enc) == 3  # cardinality preserved
    ref = {}
    for t in set(texts):
        syms_all = []
        for w in t.split():
            syms = [
                c + (END if i == len(w) - 1 else "") for i, c in enumerate(w)
            ]
            for a, b, _n in merges:
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                syms = out
            syms_all.extend(syms)
        ref[t] = syms_all
    got = sorted((r.text, tuple(r.bpe_tokens)) for r in enc)
    expect = sorted((t, tuple(ref[t])) for t in texts)
    assert got == expect
