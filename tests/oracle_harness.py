"""Local stand-in for the driver's correctness gate: runs each
``queries()`` entry and its ``oracle_sql()`` twin at a given sf_dir and
compares row count, column names, and order-insensitive values.

Usage:  python tests/oracle_harness.py [sf_dir]
"""

from __future__ import annotations

import sys


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canonical(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, got, want) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"{name}: row count {len(got)} vs {len(want)}")
        return problems
    g, w = canonical(got), canonical(want)
    for col in g.columns:
        gv, wv = g[col], w[col]
        try:
            import pandas as pd

            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
                import numpy as np

                if not np.allclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                    problems.append(f"{name}: value mismatch in float col {col}")
            else:
                if not (gv.astype(str).values == wv.astype(str).values).all():
                    problems.append(f"{name}: value mismatch in col {col}")
        except Exception as e:
            problems.append(f"{name}: compare error in {col}: {e}")
    return problems


# Oracles whose DuckDB twin is a brute-force O(Σ df²) shingle/gram
# self-join: feasible at the 500-doc gate SFs, NOT at sf0.1's 5 000
# docs with the ~30-word vocabulary (CLAUDE.md — a full-sweep run
# wedged >6 min inside DuckDB on training_prep_report).  The sweep
# runs these rows-only at sf0.1; they stay fully oracle-checked at
# sf0.001/sf0.01.
QUADRATIC_ORACLES = {
    "jaccard_join_pairs",
    "decontamination_pairs",
    "incremental_near_dedup_recrawl",
    "quote_containment_pairs",
    "semantic_decontamination_pairs",
    "minhash_near_dup_pairs",
    "near_dedup_victims",
    "dup_cluster_size_histogram",
    "near_dedup_victims_distributed",
    "training_prep_report",
    "leakage_free_split",
    # quadratic all-pairs cosine twin over 5 000 vectors at sf0.1
    "semdedup_victims_embeddings",
}


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:  # a typo'd filter must not report a vacuous green
            print(f"unknown query names in filter: {unknown}")
            return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(f"{name}: QUERY RAISED {type(e).__name__}: {e}")
            print(f"ERROR {name}: {e}")
            continue
        if name not in sqls:
            print(f"rows-only {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        if name in QUADRATIC_ORACLES and sf_dir.rstrip("/").endswith("sf0.1"):
            print(f"rows-only {name}: {len(got)} rows "
                  "(quadratic oracle skipped at sf0.1; checked at sf<=0.01)")
            continue
        want = con.execute(sqls[name]).df()
        probs = compare(name, got, want)
        if probs:
            failures.extend(probs)
            print(f"FAIL {name}: {probs}")
        else:
            print(f"ok   {name}: {len(got)} rows")
    print()
    if failures:
        print(f"{len(failures)} failures")
        return 1
    print("all oracled queries match")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--only"]  # flag form tolerated
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = args[1].split(",") if len(args) > 1 else None
    rc = main(sf, only)
    import ray

    ray.shutdown()
    sys.exit(rc)
