#!/usr/bin/env python
"""Run EVERY driver-contract query against its DuckDB oracle at a given sf dir
(default sf0.01 — the driver's correctness gate) and report matches.

Usage: python scripts/validate_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from oracle_harness import compare, duckdb_conn  # noqa: E402

from gnosis_ocr_spark.plans.driver_queries import ORACLES, QUERIES  # noqa: E402
from gnosis_ocr_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
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
