"""applyInPandasWithState: per-session monotonic progress over a stream,
state carried across micro-batches (two sequential availableNow runs on a
growing file source share one checkpoint)."""

from __future__ import annotations

import time

from gnosis_ocr_spark.streaming.stateful import running_progress_stream


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, schema="session string, progress int").write.mode(
        "append"
    ).parquet(path)


def _run_once(spark, in_dir, out_dir, ckpt):
    stream = spark.readStream.schema("session string, progress int").parquet(in_dir)
    q = (
        running_progress_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_high_water_across_batches(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    _write_batch(spark, in_dir, [("s1", 10), ("s1", 40), ("s2", 5)])
    _run_once(spark, in_dir, out_dir, ckpt)

    got1 = {
        r["session"]: r["progress_hwm"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got1["s1"] == 40 and got1["s2"] == 5

    # second micro-batch: lower progress must NOT regress the high-water
    _write_batch(spark, in_dir, [("s1", 30), ("s2", 50)])
    time.sleep(0.2)
    _run_once(spark, in_dir, out_dir, ckpt)

    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:
        cur = latest.get(r["session"])
        if cur is None or r["n_events"] > cur["n_events"]:
            latest[r["session"]] = r
    assert latest["s1"]["progress_hwm"] == 40  # monotonic (state carried)
    assert latest["s2"]["progress_hwm"] == 50
    assert latest["s1"]["n_events"] == 3
