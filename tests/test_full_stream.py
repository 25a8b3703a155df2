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


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """Regression (round-2 advice): foreachBatch is only exactly-once if the
    sink write is idempotent. Simulate a crash between the sink write and the
    checkpoint commit by deleting the newest commit file — the restarted
    stream replays that epoch and must NOT duplicate rows (dynamic partition
    overwrite on epoch)."""
    import os

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    write_corpus(spark, in_dir, n=N, num_partitions=4)

    q = start_full_extract_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    q.stop()  # fully deregister before reusing the checkpoint
    assert spark.read.parquet(out_dir).count() == N

    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # ChecksumFs sidecar
    if os.path.exists(crc):
        os.remove(crc)

    q2 = start_full_extract_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(180)
    q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == N
    assert got.select("url").distinct().count() == N


def test_streaming_dedup_keeps_one_per_fingerprint(spark, tmp_path):
    """dropDuplicatesWithinWatermark on the batch dedup's fingerprint key:
    re-crawled duplicates (same text, different url) collapse to one row."""
    from gnosis_ocr_spark.streaming.extract_stream import start_dedup_stream

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    write_corpus(spark, in_dir, n=20, num_partitions=2)
    # duplicate every doc under a different url (a re-crawl)
    base = spark.read.parquet(in_dir)
    dup = base.withColumn("url", F.concat(F.col("url"), F.lit("-recrawl")))
    dup.write.mode("append").parquet(in_dir)

    q = start_dedup_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)
    q.stop()

    got = spark.read.parquet(out_dir)
    assert got.count() == 20  # one survivor per fingerprint
    assert got.select("fp").distinct().count() == 20
