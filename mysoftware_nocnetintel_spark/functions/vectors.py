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

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fast path for PLAIN column names: build the whole expression with ONE
# parsed SQL string instead of ~8 py4j lambda round-trips — each
# _create_lambda costs a JVM round trip at BUILD time (~10 ms apiece,
# GIL-serialized; measured 0.14 s of the q42 statement build), and both
# forms parse/bind to the SAME Catalyst HOF tree, so semantics — fold
# order, casts, try_divide NULL behavior — are bit-identical. Dotted or
# exotic names fall back to the Column-lambda form (a backtick-quoted
# dotted name would mean a literal dotted COLUMN, while F.col treats the
# dot as struct access — not equivalent).
_PLAIN_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _sql_name(c: Column | str) -> str | None:
    return c if isinstance(c, str) and _PLAIN_NAME.match(c) else None


def _sql_as_double(name: str) -> str:
    return f"transform(`{name}`, x -> cast(x as double))"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({_sql_as_double(a)}, {_sql_as_double(b)}, "
        f"(x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt(aggregate({_sql_as_double(a)}, 0D, (acc, x) -> acc + x * x))"


def as_double(vec: Column | str) -> Column:
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    an, bn = _sql_name(a), _sql_name(b)
    if an and bn:
        return F.expr(_sql_dot(an, bn))
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    an = _sql_name(a)
    if an:
        return F.expr(_sql_norm(an))
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL (not error) for zero-norm inputs (ANSI-safe)."""
    an, bn = _sql_name(a), _sql_name(b)
    if an and bn:
        return F.expr(
            f"try_divide({_sql_dot(an, bn)}, {_sql_norm(an)} * {_sql_norm(bn)})"
        )
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
