"""Scale-mechanics tests: salted aggregation/join equivalence and bucketed
co-located joins (shuffle elimination — verified in the physical plan)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import skew as SK
from mysoftware_nocnetintel_spark.sources import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = {
        r.event_type: (r.sum_value, r.count_value, r.min_value, r.max_value)
        for r in SK.salted_agg(ev, "event_type", "value", n_salts=16).collect()
    }
    plain = {
        r.event_type: (r.s, r.c, r.mn, r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("s"),
            F.count("value").alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert abs(salted[k][0] - plain[k][0]) < 1e-6
        assert salted[k][1:] == plain[k][1:]


def test_salted_broadcast_join_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    salted = SK.salted_broadcast_join(ev, dim, "user_id", n_salts=8)
    plain = ev.join(dim, "user_id")
    cols = ["event_id", "user_id", "user_total"]
    a = sorted(tuple(r[c] for c in cols) for r in salted.select(cols).collect())
    b = sorted(tuple(r[c] for c in cols) for r in plain.select(cols).collect())
    assert a == b


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key ⇒ sort-merge join with NO
    exchange on either side — the co-located-join layout for repeated
    large-large joins at warehouse scale."""
    # warehouse dir is a static conf — bucketed tables land in the session
    # default (spark-warehouse/, gitignored) and are dropped in finally
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        p = _plan(joined.select("o_orderpriority", "n"))
        assert "SortMergeJoin" in p
        join_section = p.split("HashAggregate")[0]
        assert "Exchange hashpartitioning(l_orderkey" not in p
        assert "Exchange hashpartitioning(o_orderkey" not in p
        # result parity with the unbucketed join
        want = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {(r.o_orderpriority, r.n) for r in joined.collect()}
        assert got == {(r.o_orderpriority, r.n) for r in want.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_write_bucketed_api(spark, sf_dir, tmp_path):
    """sinks.write_bucketed round-trips a bucketed+sorted managed table."""
    from mysoftware_nocnetintel_spark.sources import load_table
    from mysoftware_nocnetintel_spark.sources.sinks import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(orders, "t_bucketed_api", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    try:
        got = spark.table("t_bucketed_api")
        assert got.count() == orders.count()
        meta = spark.sql("DESCRIBE EXTENDED t_bucketed_api").collect()
        txt = "\n".join(str(r) for r in meta)
        assert "8" in txt and "o_orderkey" in txt
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_api")
