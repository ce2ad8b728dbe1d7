"""Bucketed co-located join: the at-scale join strategy (no shuffle).

Writes orders and lineitem bucketed on the join key, then asserts the
join plan contains NO shuffle exchange on either side — the property that
makes repeated fact-fact joins affordable at 100 TB.
"""

import io
import contextlib

from pyspark.sql import functions as F

from kafka_error_handling_spark.sources.files import load_table, write_bucketed


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem")
        write_bucketed(o, "keh_orders_b", "o_orderkey", 8, sort_col="o_orderkey")
        write_bucketed(l, "keh_lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")

        ob = spark.table("keh_orders_b")
        lb = spark.table("keh_lineitem_b")
        j = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _plan(j)
        # the join itself must be exchange-free (bucket co-location);
        # only the final tiny groupBy may shuffle
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_section, join_section

        # results identical to the unbucketed join
        plain = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS keh_orders_b")
        spark.sql("DROP TABLE IF EXISTS keh_lineitem_b")
