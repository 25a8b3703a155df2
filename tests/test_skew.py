"""Skew tests (SURVEY.md §5 item 5): one giant PDF among small docs must not
create a straggler partition once the salted repartition + page-level
respread run."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnosis_ocr_spark.corpus import corpus_df
from gnosis_ocr_spark.functions.codec_pdf import build_pdf
from gnosis_ocr_spark.operators.pdf_split import split_pdf_text_pages
from gnosis_ocr_spark.operators.routing import ROUTE_PDF, with_route
from gnosis_ocr_spark.operators.skew import salted_repartition

N_PARTS = 8


def _pages_per_partition(pages_df):
    rows = (
        pages_df.repartition(N_PARTS, "url", "page_no")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return [r["n"] for r in rows]


def test_giant_pdf_pages_spread_evenly(spark):
    # one 200-page PDF among 40 one-page docs
    rows = [("giant", bytearray(build_pdf([f"page {i}" for i in range(200)])))]
    rows += [(f"small{i}", bytearray(build_pdf([f"solo {i}"]))) for i in range(40)]
    df = spark.createDataFrame(rows, schema="url string, html binary")
    pages = split_pdf_text_pages(salted_repartition(df, N_PARTS))
    counts = _pages_per_partition(pages)
    total = sum(counts)
    assert total == 240
    mean = total / N_PARTS
    assert max(counts) / mean < 1.8, counts  # no straggler partition


def test_corpus_page_balance_after_respread(spark):
    docs = corpus_df(spark, n=100, num_partitions=4)
    pdf_rows = with_route(docs).filter(F.col("route") == ROUTE_PDF).select("url", "html")
    pages = split_pdf_text_pages(salted_repartition(pdf_rows, N_PARTS))
    counts = _pages_per_partition(pages)
    mean = sum(counts) / len(counts)
    assert max(counts) / mean < 2.0, counts
