"""Bucketed co-located join: two tables bucketed on the same key must
equi-join with ZERO shuffle exchanges (the plan either reuses bucket layout
outright or at most sorts within buckets)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from gnosis_ocr_spark.sources.tables import write_bucketed


def _n_exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.M))


def test_bucketed_join_is_shuffle_free(spark):
    # disable auto-broadcast so the test exercises the large-table join path
    # (at 100 TB neither side broadcasts — that's exactly when bucketing pays)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _run_bucketed_join_checks(spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _run_bucketed_join_checks(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("payload")
    )
    stats = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("score")
    )
    write_bucketed(docs, "b_docs", buckets=8, bucket_col="doc_id")
    write_bucketed(stats, "b_stats", buckets=8, bucket_col="doc_id")

    left = spark.table("b_docs")
    right = spark.table("b_stats")
    joined = left.join(right, "doc_id")
    assert _n_exchanges(joined) == 0, "bucketed equi-join must not shuffle"
    assert joined.count() == 2000

    # contrast: the same join on plain parquet shuffles both sides
    docs.write.mode("overwrite").parquet("/tmp/nb_docs")
    stats.write.mode("overwrite").parquet("/tmp/nb_stats")
    plain = spark.read.parquet("/tmp/nb_docs").join(
        spark.read.parquet("/tmp/nb_stats"), "doc_id"
    )
    assert _n_exchanges(plain) >= 1


def test_bucketed_aggregation_avoids_exchange(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("v")
    )
    write_bucketed(df, "b_agg", buckets=4, bucket_col="doc_id")
    agg = spark.table("b_agg").groupBy("doc_id").agg(F.sum("v").alias("s"))
    assert _n_exchanges(agg) == 0
    assert agg.count() == 1000
