#!/usr/bin/env python
"""Input-size linearity evidence: the identical extraction job at FIXED
parallelism on a 4x-larger input should take ~4x the wall-clock — i.e.
throughput (pages/sec) should be invariant in input size. A superlinear
shuffle/agg/window term anywhere in the plan would show up here as
throughput LOSS at the larger size; this is the second axis of the
"would it hold at 1000x?" claim next to BENCH/BASELINE.md's two-
parallelism scaling run (same methodology: compute-calibrated job,
pre-materialized corpus, untimed warmup, interleaved best-of-reps).

Writes BENCH/SIZE_LINEARITY.md.

Usage: python scripts/size_linearity.py [n_small] [n_large] [cpus]
       (defaults 500, 2000, 8)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_size(n_docs: int, cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    env["SPARK_GRAFT_BENCH_ONLY"] = "extract"
    # compute-representative job, same as the scaling evidence: dpi150
    # rasters + ~30 ms CPU/page OCR stub so the measured stage is
    # compute-bound like deployed inference
    env.setdefault("SPARK_GRAFT_RASTER", "dpi150")
    env.setdefault("SPARK_GRAFT_OCR_ENGINE", "stub_compute")
    env.setdefault("SPARK_GRAFT_BENCH_CALIBRATED", "0")
    env.setdefault("SPARK_GRAFT_BENCH_SCANNED", "0")
    env.setdefault("SPARK_GRAFT_BENCH_OFFICE", "0")
    env.setdefault("SPARK_GRAFT_BENCH_WARMUP", "1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))

    # interleaved small,large,small,large: both sizes sample the same
    # host-drift window (same rationale as scaling_bench.py)
    runs_s, runs_l = [], []
    for _ in range(reps):
        runs_s.append(run_size(n_small, cpus))
        runs_l.append(run_size(n_large, cpus))

    best_s = min(runs_s, key=lambda r: r["queries"]["extract_pipeline"])
    best_l = min(runs_l, key=lambda r: r["queries"]["extract_pipeline"])
    t_s = best_s["queries"]["extract_pipeline"]
    t_l = best_l["queries"]["extract_pipeline"]
    pps_s = best_s["extract_pages_per_sec"]
    pps_l = best_l["extract_pages_per_sec"]
    pages_s = best_s["extract_n_pages"]
    pages_l = best_l["extract_n_pages"]
    # capability throughput-invariance: >= 1.0 means the larger input ran
    # at least as fast per page (fixed overheads amortize); < 1.0 by a
    # margin would indicate a superlinear term
    invariance = pps_l / pps_s
    per_rep_inv = [
        runs_l[i]["extract_pages_per_sec"] / runs_s[i]["extract_pages_per_sec"]
        for i in range(reps)
    ]
    med_invariance = statistics.median(per_rep_inv)

    md = f"""# BENCH/SIZE_LINEARITY — input-size linearity (north-rule axis 2)

The two-parallelism run (BENCH/BASELINE.md) shows throughput scales with
CORES; this run shows wall-clock scales linearly with INPUT at fixed
parallelism — together they are the sandbox evidence that the plan has no
superlinear shuffle/agg/window term that a 1000x scale-up would expose.

Identical compute-calibrated extraction job (dpi150 rasters, ~30 ms
CPU/page OCR stub, untimed warmup, corpus parquet pre-materialized) at
local[{cpus}], interleaved best-of-{reps} per size:

| input | docs | pages | extract sec | pages/sec |
|---|---|---|---|---|
| small | {best_s['extract_n_docs']} | {pages_s} | {t_s} | {pps_s} |
| large ({n_large / n_small:.0f}x) | {best_l['extract_n_docs']} | {pages_l} | {t_l} | {pps_l} |

- pages ratio large/small: **{pages_l / pages_s:.2f}x**; wall-clock ratio:
  **{t_l / t_s:.2f}x**
- **throughput invariance (pages/sec large ÷ small) = {invariance:.2f}**
  (capability, best-of-{reps}; 1.0 = perfectly linear, > 1.0 = fixed
  overheads amortizing at the larger size, << 1.0 would flag a
  superlinear term)
- median (typical) invariance over same-drift-window rep pairs:
  **{med_invariance:.2f}** (per-rep: {', '.join(f'{v:.2f}' for v in per_rep_inv)})
- host flags: small run host_loaded={best_s['host_loaded']},
  large run host_loaded={best_l['host_loaded']}

Raw JSON (best-of reps shown):

```json
{json.dumps(best_s)}
{json.dumps(best_l)}
```

Reproduce: `python scripts/size_linearity.py {n_small} {n_large} {cpus}`
"""
    out_path = REPO / "BENCH" / "SIZE_LINEARITY.md"
    out_path.write_text(md)
    print(f"wrote {out_path}")
    print(
        f"invariance={invariance:.3f} median={med_invariance:.3f} "
        f"t_small={t_s} t_large={t_l}"
    )


if __name__ == "__main__":
    main()
