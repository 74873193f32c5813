"""Incremental near-duplicate gating against a PERSISTED signature index.

The batch near-dup operators (operators/dedup.py) recompute signatures for
the whole corpus every run — right for one-shot jobs, wrong for an
ingestion pipeline that receives a new crawl slice every hour against a
100 TB historical corpus. This module persists per-document MinHash
signatures in an open lakehouse table — Delta or Iceberg, the engine's
own writers, so the index participates in time travel, vacuum, optimize,
and CAS commits in either format — and gates each new batch with:

    batch text  --shingle+minhash-->  batch sigs        (the ONLY text scan)
    index sigs  --native banding-->   (band, bucket)    (NO text, NO shingles)
    equi-join on (band, bucket)  -->  candidates
    signature agreement >= threshold --> duplicate verdicts

Design decisions, in 100 TB order:

1. **The index stores signatures, not band rows.** One row per doc
   ``(doc bigint, sig array<bigint>)``. Banding a 32-element array with
   native expressions (xxhash64 over slices) is ~free compared to
   re-shingling text, and it keeps the index 8x smaller than exploded
   band rows while letting ``bands``/``rows_per_band`` be re-tuned at
   query time without rebuilding.
2. **Verification never touches text.** Estimated Jaccard = fraction of
   agreeing MinHash positions (the unbiased MinHash estimator) via
   ``zip_with`` — so the historical corpus is only ever touched as an
   8-byte-per-hash signature table. Exact-Jaccard re-verification of the
   survivors is a caller-side join back to text when needed.
3. **One shuffle each side.** Batch sigs shuffle once (groupBy doc in
   minhash_signatures); the index side shuffles its banded projection
   once into the equi-join. AQE handles hot buckets (stop-shingle-like
   skew) by splitting them.
4. **Params are pinned.** ``num_hashes/bands/shingle_k`` are written to a
   sidecar JSON at build time and validated on every append/query —
   mixing signature spaces silently would produce garbage verdicts.

Public protocol lineage: MinHash (Broder 1997), banded LSH (Leskovec et
al., Mining of Massive Datasets ch.3), signature agreement as the Jaccard
estimator. The Delta persistence layer is cited in sources/delta.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_signatures, sig_band_rows  # noqa: F401 — re-export:
# sig_band_rows moved to dedup.py (the single banding definition shared
# with lsh_candidate_pairs); kept importable from here for callers.

_PARAMS_FILE = "_dedup_index_params.json"


def _params_path(path: str) -> str:
    return os.path.join(path, _PARAMS_FILE)


def read_index_params(path: str) -> dict:
    """The pinned signature-space parameters of the index at ``path``."""
    with open(_params_path(path), encoding="utf-8") as f:
        return json.load(f)


def _write_table(df, path, fmt, txn=None, sort_by=()):
    """Format seam: the index rides either open table format with the same
    idempotent-txn discipline."""
    if fmt == "delta":
        from ..sources.delta import write_delta_append

        return write_delta_append(df, path, txn=txn, sort_by=sort_by)
    if fmt == "iceberg":
        from ..sources.iceberg import write_iceberg_append

        return write_iceberg_append(df, path, txn=txn, sort_by=sort_by)
    raise ValueError(f"unknown table_format {fmt!r}")


def _read_table(spark, path, fmt):
    if fmt == "delta":
        from ..sources.readers import read_delta_snapshot

        return read_delta_snapshot(spark, path)
    if fmt == "iceberg":
        from ..sources.readers import read_iceberg_snapshot

        return read_iceberg_snapshot(spark, path)
    raise ValueError(f"unknown table_format {fmt!r}")


def est_jaccard(sig_a, sig_b, num_hashes: int):
    """Unbiased MinHash Jaccard estimate: fraction of agreeing positions."""
    return (
        F.size(
            F.filter(
                F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v
            )
        )
        / F.lit(float(num_hashes))
    )


def build_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    table_format: str = "delta",
) -> int:
    """Create the signature index at ``path`` from a corpus DataFrame:
    one committed row per document with a non-empty shingle set, in
    either open table format. Returns the committed version/snapshot.
    Fails if an index already exists there (appends go through
    :func:`append_to_minhash_index`)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if os.path.exists(_params_path(path)):
        raise ValueError(
            f"index already exists at {path}; use append_to_minhash_index"
        )
    params = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_k": shingle_k,
        "table_format": table_format,
    }
    # sidecar FIRST: its existence is the build guard above, so a crash
    # between sidecar and data commit leaves a visibly broken index
    # (queries fail on the missing table) instead of letting a rerun pass
    # the guard and silently DOUBLE-append the whole corpus. Remedy for a
    # half-built index: delete the directory and rebuild.
    os.makedirs(path, exist_ok=True)
    tmp = _params_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(params, f)
    os.replace(tmp, _params_path(path))
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    return _write_table(sigs, path, table_format, sort_by=("doc",))


def append_to_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    txn: tuple[str, int] | None = None,
) -> int:
    """Append a batch's signatures to an existing index, under the INDEX'S
    pinned parameters (the caller cannot accidentally mix signature
    spaces). ``txn=(app_id, version)`` passes through to the format's
    idempotent-transaction support, so an ingestion pipeline retrying a
    batch cannot double-register it. Returns the committed version."""
    p = read_index_params(path)
    sigs = minhash_signatures(
        df, id_col, text_col, p["num_hashes"], p["shingle_k"]
    )
    return _write_table(
        sigs, path, p.get("table_format", "delta"), txn=txn, sort_by=("doc",)
    )


def dedup_against_minhash_index(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup verdicts for a NEW batch against the persisted index AND
    within the batch itself, without re-touching any historical text.

    Returns one row per duplicate relation:
      (doc, dup_of, est_jaccard, source)  with source in
      ('index', 'batch'); within-batch relations follow the keep-one rule
      (``dup_of`` is a strictly lower batch id, so min-id group members
      survive). Docs absent from the result are novel.

    Candidates come from the banded equi-join only (pigeonhole over the
    index's pinned band geometry); verification is the signature-agreement
    estimate >= ``threshold``. A batch doc whose id ALREADY EXISTS in the
    index self-matches at est_jaccard 1.0 — deliberately not filtered:
    for an ingestion gate a re-delivered document is a duplicate of its
    registered self, and flagging it keeps non-txn re-deliveries from
    double-registering."""
    p = read_index_params(path)
    num_hashes, bands = p["num_hashes"], p["bands"]
    rows_per_band = num_hashes // bands

    # FINGERPRINT ONCE (r13, the q147/guide-§8 proxy pattern): the batch
    # signature table feeds FIVE join inputs below (banded vs-index left,
    # banded vs-batch both sides, and the __sig_a/__sig_b verify lookups)
    # — without truncation the whole shingle+MinHash pipeline over the
    # batch text re-executes once per consumer. ``localCheckpoint`` pins
    # the (doc, 32×8 B sig) proxy so the batch text is shingled exactly
    # once per gate call; the measured count then gates explicit
    # broadcasts of the batch-derived sides (a checkpointed plan carries
    # no size estimate, so Catalyst would otherwise fall back to
    # sort-merge) — under the budget the INDEX side is never shuffled at
    # all (the 100 TB posture: the historical index dwarfs any ingest
    # batch). Lineage-truncation trade documented at
    # dedup.hamming_band_pairs.
    from .dedup import _fits_broadcast, _proxy_stats

    batch_sigs = minhash_signatures(
        batch_df, id_col, text_col, num_hashes, p["shingle_k"]
    ).localCheckpoint(eager=False)
    n_batch, id_bytes = _proxy_stats(batch_sigs, "doc")
    # banded rows: band + bucket payload; sig rows: the hash array
    bcast_band = _fits_broadcast(
        n_batch, id_bytes, payload_bytes=16.0, fanout=bands
    )
    bcast_sigs = _fits_broadcast(
        n_batch, id_bytes, payload_bytes=16.0 + 8.0 * num_hashes
    )

    def _hint(df, ok):
        return F.broadcast(df) if ok else df

    index_sigs = _read_table(spark, path, p.get("table_format", "delta"))

    b_band = sig_band_rows(batch_sigs, bands, rows_per_band)
    i_band = sig_band_rows(index_sigs, bands, rows_per_band)

    # batch vs index: every (batch_doc, index_doc) sharing >= 1 bucket
    cand_i = (
        _hint(b_band.select(F.col("doc").alias("doc"), "band", "bucket"),
              bcast_band)
        .join(
            i_band.select(F.col("doc").alias("dup_of"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("doc", "dup_of")
        .distinct()
    )
    # batch vs batch: keep-one rule (pair with a strictly lower id)
    cand_b = (
        b_band.select(F.col("doc").alias("doc"), "band", "bucket")
        .join(
            _hint(
                b_band.select(
                    F.col("doc").alias("dup_of"), "band", "bucket"
                ),
                bcast_band,
            ),
            ["band", "bucket"],
        )
        .filter(F.col("dup_of") < F.col("doc"))
        .select("doc", "dup_of")
        .distinct()
    )

    def verify(
        cand: DataFrame, other_sigs: DataFrame, other_bcast: bool,
        source: str,
    ) -> DataFrame:
        return (
            cand.join(
                _hint(
                    batch_sigs.select(
                        F.col("doc"), F.col("sig").alias("__sig_a")
                    ),
                    bcast_sigs,
                ),
                "doc",
            )
            .join(
                _hint(
                    other_sigs.select(
                        F.col("doc").alias("dup_of"),
                        F.col("sig").alias("__sig_b"),
                    ),
                    other_bcast,
                ),
                "dup_of",
            )
            .select(
                "doc",
                "dup_of",
                est_jaccard(F.col("__sig_a"), F.col("__sig_b"), num_hashes).alias(
                    "est_jaccard"
                ),
                F.lit(source).alias("source"),
            )
            .filter(F.col("est_jaccard") >= F.lit(threshold))
        )

    return verify(cand_i, index_sigs, False, "index").unionByName(
        verify(cand_b, batch_sigs, bcast_sigs, "batch")
    )
