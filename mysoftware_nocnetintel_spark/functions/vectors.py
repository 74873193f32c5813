"""Vector / embedding column expressions — JVM-native, no Python UDFs.

Reference parity: root-cause embeddings and knowledge-base retrieval vectors
(reference README.md:52, README.md:11) — SURVEY.md §2.8 F5.

All math is done in double precision (the test ``embeddings.embedding`` column
is array<float>; float arithmetic would diverge from the DuckDB double oracle).
Everything here is a Column expression built from ``transform`` / ``zip_with``
/ ``aggregate`` higher-order functions, so it stays inside whole-stage codegen
and works per-row on arbitrarily wide DataFrames — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL (not error) for zero-norm inputs (ANSI-safe)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column | str) -> Column:
    """Unit-normalized copy; NULL elements for zero-norm vectors."""
    a = as_double(a)
    nrm = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(a, lambda x: F.try_divide(x, nrm))


def mean_pool(vectors: Column | str) -> Column:
    """Element-wise mean over array<array<double>> — the chunk-embedding →
    document-embedding pooling step (pairs with text.chunk_tokens). Pure
    HOF fold: running element-wise sum via zip_with, divided by the count;
    empty input yields NULL."""
    vectors = F.col(vectors) if isinstance(vectors, str) else vectors
    n = F.size(vectors)
    summed = F.aggregate(
        F.slice(vectors, 2, F.greatest(n - 1, F.lit(0))),
        F.element_at(vectors, 1),
        lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
    )
    return F.when(
        n > 0, F.transform(summed, lambda x: x / n)
    )
