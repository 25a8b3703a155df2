"""Golden-file end-to-end test: the north-rule byte-identity gate.

Every url's extracted_text must equal the expected text byte-for-byte
(FIXTURES.md §2); expectations are known by construction in the corpus
generator, independent of the pipeline code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gnosis_ocr_spark.corpus import corpus_df, golden_df
from gnosis_ocr_spark.plans.pipeline import extract_corpus

N = 100


def test_extraction_is_byte_identical(spark):
    docs = corpus_df(spark, n=N, num_partitions=6)
    golden = golden_df(spark, n=N)

    ours = extract_corpus(docs).alias("o")
    gold = golden.alias("g")
    j = ours.join(gold, F.col("o.url") == F.col("g.url"), "full_outer")
    bad = j.filter(
        F.col("o.url").isNull()
        | F.col("g.url").isNull()
        | ~F.col("o.extracted_text").eqNullSafe(F.col("g.extracted_text"))
        | ~F.col("o.n_pages").eqNullSafe(F.col("g.n_pages"))
    ).select(
        F.col("o.url").alias("url"),
        F.col("o.extracted_text").alias("got"),
        F.col("g.extracted_text").alias("want"),
        F.col("o.n_pages").alias("got_pages"),
        F.col("g.n_pages").alias("want_pages"),
    )
    rows = bad.collect()
    assert rows == [], f"{len(rows)} mismatches, first: {rows[:2]}"


def test_every_url_exactly_once(spark):
    docs = corpus_df(spark, n=N, num_partitions=6)
    result = extract_corpus(docs)
    assert result.count() == N
    assert result.select("url").distinct().count() == N


def test_route_mix(spark):
    docs = corpus_df(spark, n=N, num_partitions=6)
    counts = {
        r["route"]: r["cnt"]
        for r in extract_corpus(docs)
        .groupBy("route")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert counts["html"] > 0 and counts["pdf"] > 0 and counts["empty"] > 0
