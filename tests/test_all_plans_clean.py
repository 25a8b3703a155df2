"""Anti-pattern sweep over EVERY driver query's physical plan: no accidental
cartesian products, no row-at-a-time Python UDFs, no disabled AQE. Runs at
sf0.001 (plans only — nothing is executed except dedup_clusters' eager
label-propagation rounds, which are small at this scale)."""

from __future__ import annotations

import contextlib
import io

import pytest

from gnosis_ocr_spark.plans.driver_queries import QUERIES

SF = "/root/testdata/sf0.001"

# queries whose nested-loop join is deliberate and documented:
# - cosine_topk: broadcast-NL exact baseline (the corpus never shuffles)
# - tpch_q22: broadcast single-row scalar average joined without a key
# - lm_score (and the composed plans that embed it): the unigram LM's
#   single-row (n_total, v_size) scalar broadcasts keylessly by design
NL_ALLOWED = {
    "cosine_topk", "tpch_q22", "lm_score",
    "curate_compose", "prepare_training_compose",
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_antipatterns(spark, name):
    plan = _plan(QUERIES[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in NL_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: NL join"
    # BatchEvalPython = row-at-a-time Python UDF; all our Python is
    # Arrow-vectorized (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    # Exchange SinglePartition = a global key: every row funnels through
    # ONE task (an unpartitioned window, a global sort-limit feeding more
    # work, a keyless aggregation of unbounded rows) — the canonical way a
    # plan that passes at sf0.001 dies at 100 TB. All 50 registered plans
    # are single-partition-free today (scalar reductions compile to
    # partial+final HashAggregate without a SinglePartition exchange in
    # these plans); keep it that way or document a bounded-cardinality
    # exception here.
    assert "Exchange SinglePartition" not in plan, f"{name}: global key"
