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
