"""Benchmark harness (driver contract).

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=int($RAY_GRAFT_CPUS))`` (default 32) and prints ONE JSON line.

``--scaling``: runs the headline job twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs plus
scaling efficiency (the sandbox stand-in for N vs 4N nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WEB_PAGES_N = int(os.environ.get("GRAFT_WEB_PAGES_N", "120000"))


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from peri_ray.generate import web_pages_dataset
    from peri_ray.pipelines.flagship import run_flagship
    from peri_ray.pipelines import queries as q

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("documents", "lineitem", "events", "orders", "customer", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # headline: flagship validation over the synthetic web_pages table
    # (generation is part of the pipeline — it streams through map_batches)
    n_blocks = max(NUM_CPUS * 2, 16)
    verdict = timed(
        "flagship_web_pages",
        lambda: run_flagship(
            web_pages_dataset(WEB_PAGES_N, seed=42, override_num_blocks=n_blocks)
        ),
    )
    assert verdict["rows"] == WEB_PAGES_N

    # representative operator pipelines over the sf tables
    timed("validate_lineitem_constraints", lambda: q.lineitem_constraint_counts(SF_DIR).to_pandas())
    timed("validate_documents", lambda: q.validate_documents_violations(SF_DIR).to_pandas())
    timed("multi_dispatch_events", lambda: q.multi_dispatch_events(SF_DIR).to_pandas())
    timed("duplicate_user_ids", lambda: q.duplicate_user_ids(SF_DIR).to_pandas())
    timed("exact_stats_lineitem", lambda: q.exact_stats_lineitem(SF_DIR))
    timed("dedup_exact_docs", lambda: q.dedup_exact_docs(SF_DIR).to_pandas())
    timed("token_counts", lambda: q.token_counts(SF_DIR).to_pandas())
    timed("column_sketches_lineitem", lambda: q.column_sketches_lineitem(SF_DIR))
    timed("ann_topk", lambda: q.ann_topk(SF_DIR))

    headline = timings["flagship_web_pages"]
    result = {
        "metric": "flagship_web_pages_validation_sec",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "web_pages_rows": WEB_PAGES_N,
        "rows_per_sec": round(WEB_PAGES_N / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    thr_lo = r_lo["rows_per_sec"]
    thr_hi = r_hi["rows_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "rows_per_sec_lo": thr_lo,
        "rows_per_sec_hi": thr_hi,
        "sf": SF_DIR,
        "web_pages_rows": r_hi.get("web_pages_rows"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
