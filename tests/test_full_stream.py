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


def test_curation_gates_are_stream_safe(spark, tmp_path):
    """The stateless curation surface (Gopher gates, quality ratios, PII
    redaction, classifier-style hashing of a SINGLE doc's features — all
    pure Column expressions) applies unchanged to a readStream source and
    produces exactly the batch result. This is the contract that lets the
    same curation code run in the streaming ingest path."""
    from gnosis_ocr_spark.functions.text import (
        gopher_flags,
        redact_pii,
        repetition_bp,
        tokens,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("sin", "sout", "sckpt"))
    docs = spark.createDataFrame(
        [(i, ("word " * (40 + i)) + f"contact a{i}@example.com now")
         for i in range(20)],
        "doc_id long, text string",
    )
    docs.repartition(2).write.parquet(in_dir)

    def gated(df):
        ltoks = F.filter(
            tokens(F.lower(F.col("text"))), lambda t: F.length(t) > 0
        )
        return df.withColumn("_ltoks", ltoks).select(
            "doc_id",
            repetition_bp(F.col("text"), toks=F.col("_ltoks")).alias("rep_bp"),
            redact_pii(F.col("text")).alias("redacted"),
            *gopher_flags(F.col("text"), toks=F.col("_ltoks")),
        )

    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q = (
        gated(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r.asDict() for r in spark.read.parquet(out_dir).collect()}
    want = {r["doc_id"]: r.asDict() for r in gated(docs).collect()}
    assert got == want
    assert all("@example.com" not in r["redacted"] for r in got.values())
