"""Fast guard: every oracle SQL string parses AND binds in DuckDB against the
real table schemas (EXPLAIN only — no execution, no Spark). Catches syntax
errors and renamed-column drift in seconds instead of a full validate run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import duckdb_conn  # noqa: E402

from gnosis_ocr_spark.plans.driver_queries import ORACLES, QUERIES  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_sql_parses_and_binds(name):
    con = duckdb_conn(SF)
    con.execute("EXPLAIN " + ORACLES[name])
