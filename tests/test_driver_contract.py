"""Driver-contract regression: entry() smoke + a representative subset of
queries()/oracle_sql() verified against DuckDB at sf0.001 (the full set is
validated at sf0.01 — see scripts/validate_oracles.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_harness import compare, duckdb_conn  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "html_extract",
    "pdf_extract",
    "span_assembly",
    "session_status",
    "ordered_concat",
    "gopher_repetition",
    "quality_classifier",
    "tpch_q1",
    "tpch_q5",
    "tpch_q18",
    "tpch_q22",
    "text_stats",
    "dedup_exact",
    "dedup_clusters",
    "curation",
    "host_stats",
    "cosine_topk",
    "embedding_near_dup",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert {"url", "extracted_text", "n_pages", "route"} <= set(df.columns)
    assert len(rows) > 0


def test_registry_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # round 2: every query has a value-identical oracle (the hash-seeded
    # bucketing ops got provable-recall corpora — see their docstrings)
    assert set(q) == set(o)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    con = duckdb_conn(SF)
    problems = compare(q(spark, SF), con, sql, name)
    assert problems == [], problems
