"""Synthetic scale-up of the driver testdata: replicate sf0.1 K× with
key-space offsets that PRESERVE EVERY JOIN RELATIONSHIP.

Purpose (round-5 bench): the per-statement floor argument — "Spark's fixed
~0.1 s statement overhead dominates sub-second ratios at sf0.1 and
vanishes once real work grows" — needs DEMONSTRATION, not assertion.
``ensure_scaled`` materializes an sf1 dataset (10× sf0.1) that both
engines then run the identical headline queries on.

Replication rule per copy ``i`` in ``0..K-1``:

- ``region``/``nation`` are DIMENSIONS — copied once, never offset (the
  TPC-H universe has a fixed 5-region/25-nation world at every SF; fact
  foreign keys keep pointing at them).
- every other table's primary key gets ``i * stride`` added, and every
  FOREIGN key into a replicated table gets the SAME stride its target
  uses — so copy i's orders reference copy i's customers, copy i's
  lineitems reference copy i's orders/parts/suppliers, and per-entity
  groupings (sessionization by user_id, per-doc token stats) replicate
  as 10× more entities rather than 10×-bigger entities.
- value columns (prices, timestamps, text, embeddings) are UNCHANGED:
  the scaled corpus keeps the original distributions exactly (10 copies
  of each distinct value), so selectivities and group cardinalities per
  copy match sf0.1.

Strides are fixed powers of ten comfortably above each table's max key
(asserted at build time), so scaled keys stay collision-free and any
query result remains reproducible arithmetic on the original keys.

Generation runs in DuckDB (driver-side, one-time, seconds at sf1) and is
cached on disk under the repo; both engines then READ THE SAME PARQUET.
"""

from __future__ import annotations

import os

# table -> (key column -> stride). Foreign keys use their target's stride.
_STRIDES: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
_DIMENSIONS = ("region", "nation")


def ensure_scaled(
    src_dir: str, dest_dir: str, copies: int = 10
) -> str:
    """Materialize ``copies``× of the parquet tables at ``src_dir`` into
    ``dest_dir`` (idempotent: returns immediately when the marker file
    says the same build already exists). Returns ``dest_dir``."""
    import duckdb

    marker = os.path.join(dest_dir, "_SCALE_OK")
    tag = f"src={src_dir} copies={copies} v1"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == tag:
                return dest_dir
    os.makedirs(dest_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in _DIMENSIONS:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet'))"
                f" TO '{dest_dir}/{t}.parquet' (FORMAT parquet)"
            )
        for t, strides in _STRIDES.items():
            src = f"read_parquet('{src_dir}/{t}.parquet')"
            for col, stride in strides.items():
                mx = con.execute(
                    f"SELECT max({col}) FROM {src}"
                ).fetchone()[0]
                assert mx < stride, (t, col, mx, stride)
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM {src}"
                ).fetchall()
            ]
            proj = ", ".join(
                f"{c} + i.i * {strides[c]} AS {c}" if c in strides else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {proj} FROM {src}, "
                f"range({copies}) i(i) ORDER BY i.i) "
                f"TO '{dest_dir}/{t}.parquet' (FORMAT parquet)"
            )
    finally:
        con.close()
    with open(marker, "w") as fh:
        fh.write(tag)
    return dest_dir
