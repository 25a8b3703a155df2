"""foreachBatch full-pipeline streaming: PDF + HTML routes both produce
byte-identical output to the batch plan over a file-source stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from gnosis_ocr_spark.corpus import corpus_df, golden_df, write_corpus
from gnosis_ocr_spark.streaming.extract_stream import start_full_extract_stream

N = 40


def test_full_stream_matches_goldens(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    write_corpus(spark, in_dir, n=N, num_partitions=4)

    q = start_full_extract_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    assert got.count() == N
    golden = golden_df(spark, n=N).alias("g")
    bad = (
        got.alias("o")
        .join(golden, F.col("o.url") == F.col("g.url"), "full_outer")
        .filter(
            F.col("o.url").isNull()
            | F.col("g.url").isNull()
            | ~F.col("o.extracted_text").eqNullSafe(F.col("g.extracted_text"))
        )
        .count()
    )
    assert bad == 0
