#!/usr/bin/env python
"""Run EVERY driver-contract query against its DuckDB oracle at a given sf dir
(default sf0.01 — the driver's correctness gate) and report matches.

Usage: python scripts/validate_oracles.py [sf_dir] [--preconditions]

--preconditions (round-3 advice): the provable-recall oracles for
minhash_lsh / simhash_dedup / ANN / embedding_near_dup rest on frozen-corpus
properties (no 64-bit simhash collision across distinct token multisets, all
oracle docs under the bottom-s sketch size, no distractor vector at rounded
cos 1.0). A corpus/sf regeneration that silently broke one of these would
surface as a red oracle row with no engine bug — this mode checks the
preconditions DIRECTLY so such a change fails loudly and attributably.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from oracle_harness import compare, duckdb_conn  # noqa: E402

from gnosis_ocr_spark.plans.driver_queries import ORACLES, QUERIES  # noqa: E402
from gnosis_ocr_spark.session import get_spark  # noqa: E402


def check_preconditions(spark, con, sf_dir: str) -> list[str]:
    """Assert the frozen-corpus properties the provable-recall oracles need.
    Returns a list of violations (empty = all hold)."""
    from pyspark.sql import functions as F

    from gnosis_ocr_spark.functions.dedup import exploded_word_shingles, simhash
    from gnosis_ocr_spark.plans.driver_queries import _docs_with_copies

    problems: list[str] = []

    # 1. simhash_dedup: no 64-bit signature collision between DISTINCT token
    #    multisets in the oracle corpus (docs<200 ∪ verbatim copies)
    u = _docs_with_copies(spark, sf_dir, limit=200)
    sigs = simhash(u, "doc_id", "text")
    ms = u.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.split(F.trim(F.lower("text")), r"\s+")), "\x1f")
        ).alias("ms"),
    )
    coll = (
        sigs.join(ms, "doc_id")
        .groupBy("simhash")
        .agg(F.count_distinct("ms").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if coll:
        problems.append(
            f"simhash: {coll} signature(s) shared by distinct token multisets"
        )

    # 2. minhash_lsh / dedup_clusters: every oracle doc's distinct-shingle
    #    count must be below the bottom-s sketch size (1024), so sketch
    #    equality ⟺ set equality and the jaccard estimate is EXACT
    mx = (
        exploded_word_shingles(_docs_with_copies(spark, sf_dir, limit=100))
        .distinct()
        .groupBy("doc_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    if mx is not None and mx >= 1024:
        problems.append(
            f"minhash: a doc has {mx} distinct shingles (>= sketch_size 1024); "
            "sketch equality no longer implies set equality"
        )

    # 3. ANN top-k: no distractor — a corpus vector with DIFFERENT bytes must
    #    not reach rounded cos 1.000000 against any query (vec_id < 5)
    n_distract = con.execute(
        """
        WITH q AS (SELECT vec_id AS qid, embedding AS qraw,
                          embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5)
        SELECT COUNT(*) FROM q JOIN embeddings e ON e.embedding <> q.qraw
        WHERE ROUND(list_dot_product(q.qv, e.embedding::DOUBLE[]) /
              (GREATEST(sqrt(list_dot_product(q.qv, q.qv)), 1e-12) *
               GREATEST(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[])), 1e-12)), 6)
              >= 1.0
        """
    ).fetchone()[0]
    if n_distract:
        problems.append(f"ann: {n_distract} distractor(s) at rounded cos 1.0")

    # 4. embedding_near_dup: no two DISTINCT embeddings at cos >= 0.999999
    n_near = con.execute(
        """
        WITH e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT COUNT(*) FROM e a JOIN e b
          ON a.vec_id < b.vec_id AND a.embedding <> b.embedding
        WHERE ROUND(list_dot_product(a.v, b.v) /
              (GREATEST(sqrt(list_dot_product(a.v, a.v)), 1e-12) *
               GREATEST(sqrt(list_dot_product(b.v, b.v)), 1e-12)), 6) >= 0.999999
        """
    ).fetchone()[0]
    if n_near:
        problems.append(
            f"embedding_near_dup: {n_near} distinct-vector pair(s) above threshold"
        )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    if "--preconditions" in sys.argv:
        problems = check_preconditions(spark, con, sf_dir)
        for p in problems:
            print(f"✗ precondition: {p}")
        print(f"preconditions: {'FAIL' if problems else 'OK'} ({sf_dir})")
        return 1 if problems else 0
    failures = 0
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            if name in ORACLES:
                problems = compare(df, con, ORACLES[name], name)
                if problems:
                    failures += 1
                    print(f"✗ {name}: {problems[0][:300]}")
                else:
                    print(f"✓ {name}")
            else:
                print(f"✓ {name} (rows-only: {df.count()})")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"✗ {name}: {type(exc).__name__} {str(exc)[:200]}")
    print(f"{len(QUERIES) - failures}/{len(QUERIES)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
