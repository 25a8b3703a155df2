"""AQE skew-join handling (north rule: skew handled explicitly): a join with
one hot key must get its skewed partition split at runtime by
OptimizeSkewedJoin — asserted from the executed adaptive plan. Also: the
results table is partitioned by route, so route-filtered readers scan only
their partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnosis_ocr_spark.corpus import corpus_df
from gnosis_ocr_spark.plans.run import canonical_results, run_extraction


def test_aqe_splits_skewed_join(spark):
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4KB",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        # 95% of the left side shares one key → one giant shuffle partition
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("p"),
        )
        right = spark.range(0, 5_000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's own queryExecution runs
        # and its AdaptiveSparkPlan finalizes with the runtime re-plan
        assert len(joined.collect()) > 0
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_results_partitioned_by_route(spark, tmp_path):
    out = str(tmp_path / "run")
    run_extraction(spark, corpus_df(spark, n=40, num_partitions=4), out, run_id="r1")

    import os

    dirs = sorted(
        d for d in os.listdir(f"{out}/results") if d.startswith("route=")
    )
    # corpus v11+ carries office documents, v16+ standalone images
    assert dirs == [
        "route=empty", "route=html", "route=image", "route=office", "route=pdf",
    ]

    # canonical view still reads the partitioned layout correctly
    canon = canonical_results(spark, out)
    assert canon.count() == 40
    html_only = canon.filter(F.col("route") == "html")
    assert html_only.count() > 0
