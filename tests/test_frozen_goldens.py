"""Frozen-golden drift test: the committed tests/golden/*.txt files must
match the live pipeline byte-for-byte (catches generator AND pipeline drift;
regenerate deliberately with tests/gen_goldens.py)."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from gnosis_ocr_spark.corpus import corpus_df
from gnosis_ocr_spark.plans.pipeline import extract_corpus

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"


def test_pipeline_matches_frozen_goldens(spark):
    index = json.loads((GOLDEN_DIR / "index.json").read_text())
    assert len(index) >= 10
    docs = corpus_df(spark, n=100, num_partitions=4)
    got = {
        r["url"]: (r["extracted_text"], r["n_pages"])
        for r in extract_corpus(docs)
        .filter(F.col("url").isin(list(index)))
        .collect()
    }
    assert set(got) == set(index)
    for url, meta in index.items():
        want_text = (GOLDEN_DIR / meta["file"]).read_text(encoding="utf-8")
        assert got[url][0] == want_text, f"drift for {url}"
        assert got[url][1] == meta["n_pages"], f"page-count drift for {url}"
