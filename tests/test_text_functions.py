"""Direct unit tests for the text-analysis column functions (F7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.functions import text as TX


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], ["text"]).select(col.alias("out")).first().out
    )


def test_tokens_and_counts(spark):
    assert _one(spark, "  a  b   c ", TX.tokens("text")) == ["a", "b", "c"]
    assert _one(spark, "a b a", TX.token_count("text")) == 3
    assert _one(spark, "a b a", TX.distinct_token_count("text")) == 2
    assert _one(spark, "", TX.token_count("text")) == 0


def test_bpe_ish_tokens_split_punctuation(spark):
    out = _one(spark, "hello, world!", TX.bpe_ish_tokens("text"))
    assert out == ["hello", ",", "world", "!"]


def test_quality_score_bounds_and_monotonicity(spark):
    rich = _one(
        spark,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        TX.quality_score("text"),
    )
    stuffed = _one(
        spark, "the the the the the the the the the the", TX.quality_score("text")
    )
    assert 0.0 <= stuffed < rich <= 1.0


def test_char_ngrams(spark):
    assert _one(spark, "abcd", TX.char_ngrams("text", 3)) == ["abc", "bcd"]
    assert _one(spark, "ab", TX.char_ngrams("text", 3)) == []


def test_fingerprint_permutation_insensitive(spark):
    a = _one(spark, "spark filter join", TX.fingerprint("text"))
    b = _one(spark, "join  SPARK filter", TX.fingerprint("text"))
    c = _one(spark, "join spark merge", TX.fingerprint("text"))
    assert a == b  # order- and case-insensitive
    assert a != c


def test_rolling_hash_fingerprint_stable_and_overlapping(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    a = set(_one(spark, base, TX.rolling_hash_fingerprint("text")))
    b = set(_one(spark, base + " tail", TX.rolling_hash_fingerprint("text")))
    assert a and a == set(_one(spark, base, TX.rolling_hash_fingerprint("text")))
    # winnowing property: a suffix edit preserves most leading fingerprints
    assert len(a & b) >= len(a) // 2


def test_lang_id_profiles(spark):
    assert _one(spark, "the cat and the dog of it", TX.lang_id("text")) == "en"
    assert _one(spark, "el gato y la casa de que", TX.lang_id("text")) == "es"
    assert _one(spark, "zzz qqq xxx", TX.lang_id("text")) == "und"


def test_stopword_and_type_token_ratio(spark):
    assert _one(spark, "the a of", TX.stopword_ratio("text")) == 1.0
    assert _one(spark, "x y z", TX.stopword_ratio("text")) == 0.0
    assert _one(spark, "x x y y", TX.type_token_ratio("text")) == 0.5
    assert _one(spark, "", TX.stopword_ratio("text")) is None  # ANSI-safe null


def test_repetition_signals(spark):
    """top_bigram_fraction and duplicate_line_ratio on known inputs."""
    from mysoftware_nocnetintel_spark.functions import text as TX

    rows = [
        (1, "a b a b a b"),          # bigram 'a b' occurs 3/5
        (2, "x y z w"),               # all bigrams unique -> 1/3
        (3, "one"),                   # no bigrams -> 0
        (4, "l1\nl2\nl1\nl3"),        # 1 dup line of 4
        (5, "solo"),                  # single line -> 0
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    got = {
        r.id: (round(r.bg, 6), round(r.dl, 6))
        for r in df.select(
            "id",
            TX.top_bigram_fraction("text").alias("bg"),
            TX.duplicate_line_ratio("text").alias("dl"),
        ).collect()
    }
    assert got[1][0] == round(3 / 5, 6)
    assert got[2][0] == round(1 / 3, 6)
    assert got[3][0] == 0.0
    assert got[4][1] == 0.25
    assert got[5][1] == 0.0


def test_scrub_pii(spark):
    from mysoftware_nocnetintel_spark.functions import text as TX

    rows = [
        (1, "contact bob@example.com or 192.168.1.10 acct 12345678 now"),
        (2, "short 123 stays, 1234567 goes"),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    got = {r.id: r.s for r in df.select("id", TX.scrub_pii("text").alias("s")).collect()}
    assert got[1] == "contact <EMAIL> or <IP> acct <NUM> now"
    assert got[2] == "short 123 stays, <NUM> goes"


def test_chunk_tokens_boundaries(spark):
    """Chunk boundary arithmetic: exact windows, stride overlap, tail chunk,
    short docs, empty docs."""
    from mysoftware_nocnetintel_spark.functions import text as TX

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (2, "a b"),                                  # shorter than size
        (3, "   "),                                  # empty
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    got = {
        r.id: r.c
        for r in df.select(
            "id", TX.chunk_tokens("text", size=4, stride=3).alias("c")
        ).collect()
    }
    # doc 1: starts 1,4,7,10 (every stride to the end; truncated tail)
    assert [(c.chunk_id, c.n_tokens) for c in got[1]] == [
        (1, 4), (2, 4), (3, 4), (4, 1)
    ]
    assert got[1][1].chunk_text == "t3 t4 t5 t6"
    assert got[1][3].chunk_text == "t9"
    # doc 2: one short chunk
    assert [(c.chunk_id, c.n_tokens) for c in got[2]] == [(1, 2)]
    # doc 3: no chunks
    assert got[3] == []


def test_vector_pooling(spark):
    from mysoftware_nocnetintel_spark.functions import vectors as V

    rows = [
        (1, [[1.0, 2.0], [3.0, 4.0]]),
        (2, [[5.0, 5.0]]),
        (3, []),
    ]
    df = spark.createDataFrame(rows, "id INT, vs ARRAY<ARRAY<DOUBLE>>")
    got = {r.id: r.m for r in df.select("id", V.mean_pool("vs").alias("m")).collect()}
    assert got[1] == [2.0, 3.0]
    assert got[2] == [5.0, 5.0]
    assert got[3] is None
    nrm = spark.createDataFrame([(1, [3.0, 4.0])], "id INT, v ARRAY<DOUBLE>")
    out = nrm.select(V.normalize("v").alias("u")).collect()[0].u
    assert [round(x, 6) for x in out] == [0.6, 0.8]
