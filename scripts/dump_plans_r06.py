#!/usr/bin/env python
"""Dump .explain('formatted') for every bench query to plans/r06/<q>_<tag>.txt.

Usage: python scripts/dump_plans_r06.py <tag> [query ...]
  tag: 'before' or 'after' (file suffix)
  query: optional subset; default = all bench queries.

Building some query DataFrames (curate_compose, dedup_clusters) runs eager
jobs (the iterative connected-components step), so this script starts a
Spark session like the bench does but never times anything.
"""
from __future__ import annotations

import io
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    subset = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from gnosis_ocr_spark.plans.driver_queries import QUERIES
    from gnosis_ocr_spark.session import get_spark

    bench_queries = subset or [
        "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q10",
        "sessionize", "rollup", "host_stats",
        "dedup_exact", "minhash_lsh", "simhash_dedup", "ngram_jaccard",
        "hot_spans", "embedding_near_dup", "pack_sequences",
        "dedup_clusters",
        "cosine_topk", "lsh_cosine_topk", "ivf_cosine_topk",
        "text_stats", "gopher_repetition", "quality_classifier", "lm_score",
        "curation", "curate_compose", "prepare_training_compose",
        "sampling_split", "vocabulary", "decontaminate", "multimodal_meta",
        "html_extract", "pdf_extract",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="gnosis-plan-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in bench_queries:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
