#!/usr/bin/env python
"""Freeze human-readable golden files (FIXTURES.md §2) for drift detection.

The corpus goldens are known by construction (corpus.py computes them from
the same ingredients that build the documents, without running the
extractor); freezing a sample to disk catches *generator* drift too — if
either the generator or the pipeline changes behavior, the frozen files
disagree and tests/test_frozen_goldens.py fails.

Run: python tests/gen_goldens.py   (regenerates tests/golden/)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnosis_ocr_spark.corpus import generate_rows  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
SAMPLE_EVERY = 7  # keep the committed sample small but route-diverse
N = 100


def main() -> None:
    GOLDEN_DIR.mkdir(exist_ok=True)
    rows = generate_rows(N)
    index = {}
    for i, row in enumerate(rows):
        if i % SAMPLE_EVERY:
            continue
        stem = f"doc_{i:04d}"
        (GOLDEN_DIR / f"{stem}.txt").write_text(row.expected_text, encoding="utf-8")
        index[row.url] = {"file": f"{stem}.txt", "n_pages": row.n_pages}
    (GOLDEN_DIR / "index.json").write_text(json.dumps(index, indent=1, sort_keys=True))
    print(f"froze {len(index)} goldens into {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
