"""Streaming CDC upsert into Iceberg (streaming/ops.iceberg_cdc_upsert):
after replaying the events table as 3 time-ordered micro-batches, the
Iceberg table must hold exactly ONE live row per key — the globally
latest event per user — i.e. stream-upsert ≡ batch argmax. Also checks
that the history really is merge-on-read (append + equality-delete
commits, all snapshots time-travelable)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot
from mysoftware_nocnetintel_spark.streaming.ops import (
    _EVENTS_RAW_SCHEMA,
    iceberg_cdc_upsert,
)

def _ts_to_instant():
    return F.timestamp_micros(
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    )


def test_cdc_upsert_equals_batch_argmax(spark, sf_dir, tmp_path):
    raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    # 3 time-ordered chunks: chunk boundaries follow the (ts, event_id)
    # tie-break order, so a later batch's rows always sort >= earlier
    # ones and "last writer wins" equals the global argmax
    rows = raw.orderBy("ts", "event_id").collect()
    chunks_dir = str(tmp_path / "chunks")
    os.makedirs(chunks_dir)
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        if not chunk:
            continue
        p = os.path.join(chunks_dir, f"events-{i}.parquet")
        spark.createDataFrame(chunk, _EVENTS_RAW_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(p + ".dir")
        import glob as g
        import shutil

        shutil.move(g.glob(p + ".dir/*.parquet")[0], p)
        shutil.rmtree(p + ".dir")
        # force strictly increasing modification times so the file source
        # replays the chunks in order
        t = time.time() - 100 + i * 10
        os.utime(p, (t, t))

    stream = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunks_dir)
        .withColumn("ts", _ts_to_instant())
    )
    table = str(tmp_path / "cdc_table")
    q = iceberg_cdc_upsert(
        stream, table, checkpoint=str(tmp_path / "ckpt"), key_cols=("user_id",)
    )
    q.awaitTermination(300)

    got = {
        (r.user_id, r.event_id)
        for r in read_iceberg_snapshot(spark, table).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ref = {
        (r.user_id, r.event_id)
        for r in raw.withColumn("ts", _ts_to_instant())
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == ref and len(got) > 0

    # merge-on-read history: 3 append + 2 equality-delete commits (the
    # creating batch has nothing to delete), every snapshot readable
    meta_dir = os.path.join(table, "metadata")
    versions = sorted(
        f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")
    )
    with open(os.path.join(meta_dir, versions[-1])) as fh:
        meta = json.load(fh)
    ops = [s["summary"]["operation"] for s in meta["snapshots"]]
    assert ops.count("append") == 3 and ops.count("delete") == 2, ops
    for s in meta["snapshots"]:
        if s["summary"]["operation"] == "append":
            assert (
                read_iceberg_snapshot(
                    spark, table, snapshot_id=s["snapshot-id"]
                ).count()
                > 0
            )
