"""UDF/UDAF/UDTF surface (SURVEY.md §2.7 last row): the reference's whole
API is user-function wrapping; ours additionally exposes Spark's native
extension points — pandas grouped-agg UDAFs and Python UDTFs — and the
capture layer composes with them.
"""

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from kafka_error_handling_spark.sources.files import load_table


def test_grouped_agg_pandas_udaf(spark, sf_dir):
    """UDAF via pandas grouped-agg: mean absolute deviation per flag."""
    l = load_table(spark, sf_dir, "lineitem")

    @pandas_udf(DoubleType())
    def mad(s: pd.Series) -> float:
        return float((s - s.mean()).abs().mean())

    got = {
        r.l_returnflag: r.mad_qty
        for r in l.groupBy("l_returnflag")
        .agg(F.round(mad("l_quantity"), 4).alias("mad_qty"))
        .collect()
    }
    # cross-check one group exactly via pandas on the driver
    pdf = l.filter("l_returnflag = 'R'").select("l_quantity").toPandas()
    expect = round(float((pdf.l_quantity - pdf.l_quantity.mean()).abs().mean()), 4)
    assert got["R"] == expect


def test_python_udtf_explodes_rows(spark):
    """Spark 4 Python UDTF: one input row → n output rows, lateral join."""

    @udtf(returnType="chunk: int, squared: int")
    class Chunks:
        def eval(self, n: int):
            for i in range(n):
                yield i, i * i

    spark.udtf.register("chunks", Chunks)
    rows = spark.sql(
        "SELECT t.id, c.chunk, c.squared FROM VALUES (1, 2), (2, 3) AS t(id, n), "
        "LATERAL chunks(n) AS c ORDER BY t.id, c.chunk"
    ).collect()
    assert [(r.id, r.chunk, r.squared) for r in rows] == [
        (1, 0, 0), (1, 1, 1),
        (2, 0, 0), (2, 1, 1), (2, 2, 4),
    ]


def test_capture_composes_with_grouped_apply(spark, sf_dir):
    """applyInPandas (grouped map) downstream of a captured transform:
    the success branch feeds a per-group pandas aggregation."""
    from kafka_error_handling_spark.operators import capture_map_values_with_key, values

    e = load_table(spark, sf_dir, "events")

    def risky(k, v):
        if k == "error":
            raise ValueError("boom")
        return v

    p = capture_map_values_with_key(
        e, risky, DoubleType(), key_col="event_type", value_col="value"
    )
    ok = values(p)

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(2, "result")[["event_type", "result"]]

    got = (
        ok.groupBy("event_type")
        .applyInPandas(top2, "event_type string, result double")
        .collect()
    )
    types = {r.event_type for r in got}
    assert "error" not in types  # captured rows never reach the group step
    assert all(len([r for r in got if r.event_type == t]) == 2 for t in types)
