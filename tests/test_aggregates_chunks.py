"""A1–A8 / J2 / SO1 operator tests against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from gnosis_ocr_spark.operators.aggregates import (
    high_water_progress,
    latest_sessions,
    ocr_results_map,
    running_high_water,
    session_status,
)
from gnosis_ocr_spark.operators.chunks import (
    assemble_chunks,
    complete_docs,
    missing_chunks,
    ordered_text_concat,
)

TS = dt.datetime(2020, 1, 1)


def test_session_status(spark):
    rows = []
    for p in range(3):
        rows.append(("s1", "page", p, "", 3))
    for p in range(2):
        rows.append(("s1", "result", p, "t", 3))
    rows.append(("s2", "page", 0, "", 2))
    df = spark.createDataFrame(
        rows, schema="session string, kind string, page_no int, text string, total_pages int"
    )
    got = {r["session"]: r.asDict() for r in session_status(df).collect()}
    assert got["s1"]["pages_extracted"] == 3
    assert got["s1"]["ocr_completed"] == 2
    assert got["s1"]["extraction_pct"] == 100
    assert got["s1"]["ocr_pct"] == 67
    assert got["s1"]["status"] == "processing"
    assert got["s2"]["status"] == "pending"


def test_session_status_complete_flag(spark):
    rows = [("s", "page", p, "", 2) for p in range(2)]
    rows += [("s", "result", p, "t", 2) for p in range(2)]
    df = spark.createDataFrame(
        rows, schema="session string, kind string, page_no int, text string, total_pages int"
    )
    assert session_status(df).collect()[0]["status"] == "complete"


def test_ocr_results_map(spark):
    df = spark.createDataFrame(
        [("s", 2, "two"), ("s", 1, "one")], schema="session string, page_no int, text string"
    )
    m = ocr_results_map(df).collect()[0]["ocr_results"]
    assert m == {1: "one", 2: "two"}


def test_high_water(spark):
    df = spark.createDataFrame(
        [("s", TS, 10), ("s", TS + dt.timedelta(1), 40), ("s", TS + dt.timedelta(2), 30)],
        schema="session string, ts timestamp, progress int",
    )
    assert high_water_progress(df).collect()[0]["progress_hwm"] == 40
    running = [
        r["progress_hwm"]
        for r in running_high_water(df).orderBy("ts").collect()
    ]
    assert running == [10, 40, 40]  # never regresses


def test_latest_sessions_topk(spark):
    rows = [(f"s{i}", TS + dt.timedelta(minutes=i)) for i in range(10)]
    rows += [("s3", TS + dt.timedelta(days=1))]  # s3 updated later
    df = spark.createDataFrame(rows, schema="session string, ts timestamp")
    got = latest_sessions(df, k=3).collect()
    assert [r["session"] for r in got] == ["s3", "s9", "s8"]


def test_missing_and_complete_chunks(spark):
    rows = [("d1", 0, b"a", 3), ("d1", 2, b"c", 3), ("d2", 0, b"x", 1)]
    df = spark.createDataFrame(
        [(d, n, bytearray(b), t) for d, n, b, t in rows],
        schema="doc string, chunk_no int, data binary, expected_total int",
    )
    missing = [(r["doc"], r["chunk_no"]) for r in missing_chunks(df).collect()]
    assert missing == [("d1", 1)]
    assert [r["doc"] for r in complete_docs(df).collect()] == ["d2"]


def test_assemble_chunks_ordered(spark):
    df = spark.createDataFrame(
        [("d", 1, bytearray(b"BB"), 3), ("d", 0, bytearray(b"AA"), 3), ("d", 2, bytearray(b"CC"), 3)],
        schema="doc string, chunk_no int, data binary, expected_total int",
    )
    row = assemble_chunks(df).collect()[0]
    assert bytes(row["data"]) == b"AABBCC"
    assert row["n_chunks"] == 3


def test_ordered_text_concat(spark):
    df = spark.createDataFrame(
        [("d", 2, "c"), ("d", 0, "a"), ("d", 1, "b")],
        schema="doc string, chunk_no int, text string",
    )
    assert ordered_text_concat(df).collect()[0]["assembled"] == "abc"


def test_chunk_edge_cases_zero_total_duplicates_nulls(spark):
    """Review fixes pinned: expected_total=0 emits no phantom [0,-1]
    missing chunks; a retried duplicate chunk concatenates ONCE; a NULL
    data chunk skips instead of crashing; out-of-range indices don't
    satisfy completeness."""
    from gnosis_ocr_spark.operators.chunks import (
        assemble_chunks,
        complete_docs,
        missing_chunks,
    )

    rows = [
        ("z", 0, 0, None),                 # zero-total manifest, null data
        ("d", 0, 2, bytearray(b"AA")),
        ("d", 1, 2, bytearray(b"BB")),
        ("d", 1, 2, bytearray(b"BB")),     # retried duplicate
        ("s", 0, 2, bytearray(b"XX")),
        ("s", 99, 2, bytearray(b"YY")),    # stray out-of-range index
    ]
    df = spark.createDataFrame(
        rows, "doc string, chunk_no int, expected_total int, data binary"
    )
    missing = {(r["doc"], r["chunk_no"]) for r in missing_chunks(df).collect()}
    assert ("z", 0) not in missing and ("z", -1) not in missing
    assert ("s", 1) in missing
    complete = {r["doc"] for r in complete_docs(df).collect()}
    # 'z' is vacuously complete (0 of 0); 's' is NOT — the stray
    # out-of-range chunk 99 is no substitute for the missing chunk 1
    assert complete == {"d", "z"}
    blobs = {r["doc"]: bytes(r["data"]) for r in assemble_chunks(df).collect()}
    assert blobs["d"] == b"AABB"  # duplicate concatenated once
    assert blobs["z"] == b""      # null data skipped, no crash


def test_ocr_results_map_tolerates_sentinels_and_retries(spark):
    """NULL page_no sentinels and duplicate page rows must not raise
    NULL_MAP_KEY / DUPLICATED_MAP_KEY out of map_from_entries."""
    from gnosis_ocr_spark.operators.aggregates import ocr_results_map

    df = spark.createDataFrame(
        [("s1", 1, "one"), ("s1", 1, "one"), ("s1", 2, "two"),
         ("s1", None, None)],
        "session string, page_no int, text string",
    )
    out = ocr_results_map(df).collect()
    assert len(out) == 1
    assert out[0]["ocr_results"] == {1: "one", 2: "two"}


def test_assemble_documents_strips_all_whitespace(spark):
    """Python-strip semantics: a document whose first/last page extracts
    empty must not keep leading/trailing page separators (F.trim strips
    only 0x20)."""
    from gnosis_ocr_spark.operators.layout import assemble_documents

    df = spark.createDataFrame(
        [("u", 1, ""), ("u", 2, "body text"), ("u", 3, "")],
        "url string, page_no int, page_text string",
    )
    row = assemble_documents(df).collect()[0]
    assert row["extracted_text"] == "body text"
    assert row["n_pages"] == 3
