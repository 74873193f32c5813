"""Iceberg PARTITION TRANSFORMS (table spec "Partition Transforms" +
Appendix B "32-bit Hash Requirements"): bucket[N] and truncate[W], the
two transforms that make high-cardinality keys partitionable.

Why these matter at 100 TB: identity partitioning on a high-cardinality
key (user_id, orderkey) explodes into millions of tiny partitions, while
no partitioning forces every query to scan everything. ``bucket[N]``
hash-buckets the key into exactly N stable partitions — point lookups
prune to 1/N of the data BEFORE any scan is planned, and two tables
bucketed the same way can join partition-to-partition without a shuffle
(storage-partitioned joins). ``truncate[W]`` keeps range semantics
(floor-to-width for ints, prefix-of-width for strings) so range
predicates prune too.

Spec fidelity: the bucket hash MUST be the spec's exact function —
murmur3_x86_32 seed 0 over the Appendix-B byte encodings (int/long as
8-byte little-endian, string as UTF-8 bytes) — or files written here
would land in different buckets than the iceberg-java/iceberg-spark
readers expect and their bucket pruning would silently return wrong
results. The test suite byte-pins the spec's own published vectors
(34 → 2017239379, "iceberg" → 1210000089).

Bucket values are computed write-side by an ARROW-BATCHED pandas UDF
(there is no JVM builtin for seed-0 little-endian murmur3; Spark's
``F.hash`` is murmur3 with seed 42 over different encodings). The int64
path is fully numpy-vectorized (fixed 8-byte input → two 4-byte blocks);
strings hash per row inside the Arrow batch. This is a write-time-only
cost — reads never recompute the hash except on the driver, once per
pruning literal.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public reference: Austin Appleby's MurmurHash3.cpp,
    public domain), returning a SIGNED 32-bit int like the JVM
    implementations Iceberg uses."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounds = n // 4
    for i in range(rounds):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[4 * rounds :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def bucket_hash(value, iceberg_type: str) -> int:
    """Appendix-B hash of a single value: int/long hash their 8-byte
    little-endian two's-complement form (so ``bucket(v:int) ==
    bucket(v:long)`` as the spec requires), strings hash UTF-8 bytes."""
    if iceberg_type in ("int", "long"):
        return murmur3_32(int(value).to_bytes(8, "little", signed=True))
    if iceberg_type == "string":
        return murmur3_32(str(value).encode("utf-8"))
    raise NotImplementedError(
        f"bucket transform on iceberg type {iceberg_type!r} unsupported "
        "(int, long, string only)"
    )


def bucket_value(value, iceberg_type: str, n: int):
    """``(hash & Integer.MAX_VALUE) % N`` per the spec; None stays None."""
    if value is None:
        return None
    return (bucket_hash(value, iceberg_type) & 0x7FFFFFFF) % n


_EPOCH_ORD = 719163  # datetime.date(1970, 1, 1).toordinal()


def time_transform_value(value, kind: str):
    """Spec time transforms on DATE/TIMESTAMP values: ``year``/``month``/
    ``day``/``hour`` partition values are the ordinal count of
    years/months/days/hours SINCE THE UNIX EPOCH (spec "Partition
    Transforms" table; e.g. month(2017-11-16) = 574, day counts match
    datediff from 1970-01-01). All four are monotonic in the source
    value, so range predicates prune. ``value`` is a ``datetime.date``,
    ``datetime.datetime`` or ISO string on the driver; a TZ-AWARE
    datetime is normalized to UTC first (the spec computes timestamptz
    transforms on the UTC instant), a naive one is taken as-is (the
    wall clock IS the value for ntz timestamps)."""
    import datetime

    if value is None:
        return None
    if isinstance(value, str):
        value = (
            datetime.datetime.fromisoformat(value)
            if any(ch in value for ch in "T :")
            else datetime.date.fromisoformat(value)
        )
    if isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        if kind == "hour":
            delta = value - datetime.datetime(1970, 1, 1)
            return delta.days * 24 + delta.seconds // 3600
        value = value.date()
    elif kind == "hour":
        raise ValueError("hour transform needs a timestamp literal")
    if kind == "year":
        return value.year - 1970
    if kind == "month":
        return (value.year - 1970) * 12 + (value.month - 1)
    if kind == "day":
        return value.toordinal() - _EPOCH_ORD
    raise ValueError(f"unknown time transform {kind!r}")


def truncate_value(value, iceberg_type: str, w: int):
    """Spec truncate: ints floor toward -inf to a multiple of W
    (``v - (((v % W) + W) % W)``), strings keep the first W characters.
    Monotonic in both cases — the property range pruning relies on."""
    if value is None:
        return None
    if iceberg_type in ("int", "long"):
        v = int(value)
        return v - (((v % w) + w) % w)
    if iceberg_type == "string":
        return str(value)[:w]
    raise NotImplementedError(
        f"truncate transform on iceberg type {iceberg_type!r} unsupported "
        "(int, long, string only)"
    )


@dataclass(frozen=True)
class PartField:
    """One resolved partition-spec field."""

    name: str          # partition field name (e.g. "user_id_bucket")
    transform: str     # "identity" | "bucket[N]" | "truncate[W]"
    source_col: str    # source column name in the table schema
    source_type: str   # iceberg type of the source column
    value_type: str    # iceberg type of the PARTITION VALUE

    @property
    def param(self) -> int | None:
        if "[" in self.transform:
            return int(self.transform.split("[", 1)[1].rstrip("]"))
        return None


def parse_partition_by(item: str) -> tuple[str, str, int | None]:
    """User-facing ``partition_by`` entry → (transform-kind, source column,
    param). Accepted: ``"col"``, ``"bucket(N, col)"``,
    ``"truncate(W, col)"``."""
    s = item.strip()
    low = s.lower()
    for kind in ("bucket", "truncate"):
        if low.startswith(kind + "(") and s.endswith(")"):
            inner = s[len(kind) + 1 : -1]
            parts = [p.strip() for p in inner.split(",")]
            if len(parts) != 2 or not parts[0].isdigit():
                raise ValueError(
                    f"malformed partition transform {item!r}: expected "
                    f"{kind}(N, column)"
                )
            n = int(parts[0])
            if n <= 0:
                raise ValueError(f"{kind} width must be positive: {item!r}")
            return kind, parts[1], n
    for kind in ("year", "month", "day", "hour"):
        if low.startswith(kind + "(") and s.endswith(")"):
            col = s[len(kind) + 1 : -1].strip()
            if not col or "," in col:
                raise ValueError(
                    f"malformed partition transform {item!r}: expected "
                    f"{kind}(column)"
                )
            return kind, col, None
    if "(" in s or ")" in s:
        raise ValueError(
            f"unknown partition transform {item!r} (identity column name, "
            "bucket(N, col), truncate(W, col), or year/month/day/hour(col))"
        )
    return "identity", s, None


def resolve_part_field(
    kind: str, col: str, param: int | None, source_type: str
) -> PartField:
    """Resolve a parsed ``partition_by`` entry against the source column's
    iceberg type, producing the spec-convention field name and transform
    string."""
    if kind == "identity":
        return PartField(col, "identity", col, source_type, source_type)
    if kind == "bucket":
        if source_type not in ("int", "long", "string"):
            raise NotImplementedError(
                f"bucket on iceberg type {source_type!r} unsupported"
            )
        return PartField(
            f"{col}_bucket", f"bucket[{param}]", col, source_type, "int"
        )
    if kind == "truncate":
        if source_type not in ("int", "long", "string"):
            raise NotImplementedError(
                f"truncate on iceberg type {source_type!r} unsupported"
            )
        return PartField(
            f"{col}_trunc", f"truncate[{param}]", col, source_type,
            source_type,
        )
    if kind in ("year", "month", "day"):
        if source_type not in ("date", "timestamp", "timestamptz"):
            raise NotImplementedError(
                f"{kind} transform on iceberg type {source_type!r} "
                "unsupported (date/timestamp columns only)"
            )
        return PartField(f"{col}_{kind}", kind, col, source_type, "int")
    if kind == "hour":
        if source_type not in ("timestamp", "timestamptz"):
            raise NotImplementedError(
                f"hour transform on iceberg type {source_type!r} "
                "unsupported (timestamp columns only — the spec defines "
                "hour on timestamps, not dates)"
            )
        return PartField(f"{col}_hour", "hour", col, source_type, "int")
    raise ValueError(f"unknown transform kind {kind!r}")


def spec_field_to_part_field(
    spec_field: dict, schema_fields: list[dict]
) -> PartField:
    """Metadata ``partition-specs[...].fields`` entry → PartField, resolving
    ``source-id`` through the table schema (append-to-existing and the
    compactor recompute transform columns from this)."""
    by_id = {f["id"]: f for f in schema_fields}
    src = by_id.get(spec_field.get("source-id"))
    if src is None:
        # pre-transform metadata wrote identity specs whose names ARE the
        # source columns; fall back by name for those tables
        by_name = {f["name"]: f for f in schema_fields}
        src = by_name.get(spec_field["name"])
        if src is None:
            raise NotImplementedError(
                f"partition spec field {spec_field!r} references no schema "
                "column"
            )
    t = spec_field.get("transform", "identity")
    kind = t.split("[", 1)[0]
    if kind == "identity":
        return PartField(
            spec_field["name"], "identity", src["name"], src["type"],
            src["type"],
        )
    if kind == "bucket":
        return PartField(
            spec_field["name"], t, src["name"], src["type"], "int"
        )
    if kind == "truncate":
        return PartField(
            spec_field["name"], t, src["name"], src["type"], src["type"]
        )
    if kind in ("year", "month", "day", "hour"):
        return PartField(
            spec_field["name"], kind, src["name"], src["type"], "int"
        )
    raise NotImplementedError(
        f"partition transform {t!r} unsupported (identity, bucket, "
        "truncate, year/month/day/hour)"
    )


def transform_column(pf: PartField):
    """Spark Column computing ``pf``'s partition value from its source
    column — JVM-side expressions for identity/truncate, the Arrow
    murmur3 UDF for bucket."""
    from pyspark.sql import functions as F

    c = F.col(pf.source_col)
    if pf.transform == "identity":
        return c
    kind, param = pf.transform.split("[", 1)[0], pf.param
    if kind in ("year", "month", "day", "hour"):
        return _time_transform_column(pf, kind)
    if kind == "truncate":
        if pf.source_type == "string":
            return F.substring(c, 1, param)
        return (c - F.pmod(c, F.lit(param))).cast(
            "int" if pf.source_type == "int" else "bigint"
        )
    if kind == "bucket":
        if pf.source_type in ("int", "long"):
            # nulls are kept OUT of the UDF: Arrow→pandas turns a
            # NULLABLE int64 column into float64, silently corrupting
            # values beyond 2^53 before the hash ever runs. Feeding the
            # UDF coalesce(c, 0) keeps the batch exact int64; the
            # when() re-installs the null partition value.
            bucketed = _bucket_udf(pf.source_type, param)(
                F.coalesce(c, F.lit(0))
            )
        else:
            bucketed = _bucket_udf(pf.source_type, param)(c)
        return F.when(c.isNull(), F.lit(None)).otherwise(bucketed)
    raise NotImplementedError(pf.transform)


def _time_transform_column(pf: PartField, kind: str):
    """Spec time-transform partition value as a Spark Column, computed
    WITHOUT any session-timezone dependence:

    - ``date`` / ntz ``timestamp`` sources: calendar functions
      (``year``/``month``/``hour``, date-cast) read the WALL CLOCK,
      which for these types is TZ-free and is exactly what the spec
      transforms (the value has no instant);
    - ``timestamptz`` sources store an INSTANT, and every Spark
      calendar function on them shifts through the session timezone —
      so everything derives from ``unix_micros`` (TZ-free) with exact
      integer floor-division, matching the spec's UTC semantics
      regardless of ``spark.sql.session.timeZone``."""
    from pyspark.sql import functions as F

    c = F.col(pf.source_col)
    if pf.source_type == "timestamptz":
        us = f"unix_micros(`{pf.source_col}`)"

        def _floordiv(d: int):
            # (us - pmod(us, d)) is an exact multiple of d, so integer
            # `div` is exact floor division (no floating point)
            return F.expr(f"(({us}) - pmod({us}, {d})) div {d}")

        if kind == "hour":
            return _floordiv(3_600_000_000).cast("int")
        days = _floordiv(86_400_000_000).cast("int")
        if kind == "day":
            return days
        d = F.date_add(F.to_date(F.lit("1970-01-01")), days)
        if kind == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        return (
            (F.year(d) - F.lit(1970)) * F.lit(12) + F.month(d) - F.lit(1)
        ).cast("int")
    if kind == "hour":
        return (
            F.datediff(c, F.lit("1970-01-01")) * F.lit(24) + F.hour(c)
        ).cast("int")
    if kind == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if kind == "month":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        ).cast("int")
    return F.datediff(c, F.lit("1970-01-01")).cast("int")


def _bucket_udf(source_type: str, n: int):
    """Arrow-batched spec bucket hash. int/long: numpy-vectorized
    murmur3_x86_32 over the fixed 8-byte little-endian encoding (two
    4-byte blocks, no tail). string: per-row murmur inside the batch."""
    from pyspark.sql.functions import pandas_udf

    if source_type in ("int", "long"):

        @pandas_udf("int")
        def _bucket(col: pd.Series) -> pd.Series:
            import numpy as np

            # caller guarantees no nulls (coalesce upstream), so the
            # batch arrives as exact int64 — never float64
            v64 = col.to_numpy().astype(np.int64).view(np.uint64)
            lo = (v64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (v64 >> np.uint64(32)).astype(np.uint32)
            c1 = np.uint32(0xCC9E2D51)
            c2 = np.uint32(0x1B873593)

            def _mix(h, k):
                k = k * c1
                k = (k << np.uint32(15)) | (k >> np.uint32(17))
                k = k * c2
                h = h ^ k
                h = (h << np.uint32(13)) | (h >> np.uint32(19))
                return h * np.uint32(5) + np.uint32(0xE6546B64)

            with np.errstate(over="ignore"):
                h = np.zeros(len(v64), dtype=np.uint32)
                h = _mix(h, lo)
                h = _mix(h, hi)
                h = h ^ np.uint32(8)
                h = h ^ (h >> np.uint32(16))
                h = h * np.uint32(0x85EBCA6B)
                h = h ^ (h >> np.uint32(13))
                h = h * np.uint32(0xC2B2AE35)
                h = h ^ (h >> np.uint32(16))
                b = (h & np.uint32(0x7FFFFFFF)) % np.uint32(n)
            return pd.Series(b.astype("int32"))

        return _bucket

    @pandas_udf("int")
    def _bucket_str(col: pd.Series) -> pd.Series:
        return col.map(
            lambda s: None
            if s is None
            else (murmur3_32(str(s).encode("utf-8")) & 0x7FFFFFFF) % n
        ).astype("Int32")

    return _bucket_str
