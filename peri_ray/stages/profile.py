"""Data-profiling operators: per-column schema profiles, snapshot
schema drift, and unique-column-combination (candidate-key) discovery.

The reference validates one record at a time against a DECLARED spec
(lib/peri.ex:572-604); at corpus scale the complementary operation is
DISCOVERING the spec-relevant facts — which columns exist, their
types, null rates and (small) value domains, how those change between
crawl snapshots, and which column combinations actually key the table
(the Metanome/HyUCC problem).  All three run as per-batch partials
merged on the driver; only the candidate-key verifier exchanges, and
it ships distinct composite keys (pre-aggregated per batch) plus
one-row duplicate markers, never raw rows.

Scale notes per operator are on the functions; the common bound is
columns × blocks partial rows on the driver — the flagship-verdict
contract, never corpus-size state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# one merged domain larger than this is reported as "open" (null) —
# value domains only make sense for enum-like columns
DEFAULT_MAX_DOMAIN = 64


def _dtype_name(t: pa.DataType) -> str:
    """Normalized type label shared by the engine and the SQL twins
    (large_string and string are the same logical type here)."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    return str(t)


def schema_profile(ds, columns: list[str] | None = None,
                   max_domain: int = DEFAULT_MAX_DOMAIN,
                   batch_size: int | None = 65536) -> pa.Table:
    """Per-column profile: ``(column, dtype, n_rows, n_nulls,
    domain)`` where ``domain`` is the sorted comma-joined distinct
    value set of a string column when it stays within ``max_domain``
    values (enum-like), else null (open domain).

    A table rendering of :func:`peri_ray.infer.profile_columns` (the
    spec-inference profiler — one streaming pass, per-batch partials
    bounded by columns × (max_domain + 1) rows, driver merge): same
    pass, but keyed to snapshot DIFFING (:func:`schema_drift`) rather
    than spec synthesis, so it adds the normalized dtype label and
    keeps exact null counts."""
    from peri_ray.infer import profile_columns

    names = columns or [n for n in ds.schema().names]
    types = dict(zip(ds.schema().names, ds.schema().types))
    prof = profile_columns(ds, enum_threshold=max_domain,
                           batch_size=batch_size)

    out = {"column": [], "dtype": [], "n_rows": [], "n_nulls": [],
           "domain": []}
    for name in names:
        p = prof.get(name, {"n": 0, "nulls": 0, "distinct": None})
        out["column"].append(name)
        out["dtype"].append(_dtype_name(types[name]))
        out["n_rows"].append(p["n"])
        out["n_nulls"].append(p["nulls"])
        dom = None
        if (_dtype_name(types[name]) == "string"
                and p.get("distinct") is not None):
            dom = ",".join(p["distinct"])
        out["domain"].append(dom)
    return pa.table({
        "column": pa.array(out["column"], pa.string()),
        "dtype": pa.array(out["dtype"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_nulls": pa.array(out["n_nulls"], pa.int64()),
        "domain": pa.array(out["domain"], pa.string()),
    })


def schema_drift(base: pa.Table, new: pa.Table,
                 null_rate_tol: float = 0.005) -> pa.Table:
    """Diff two :func:`schema_profile` outputs into change rows
    ``(column, change, base_value, new_value)``, sorted by (column,
    change).  Change kinds: ``column_added`` / ``column_removed``
    (value = the dtype), ``dtype_changed``, ``null_rate`` (emitted
    when the rate moves more than ``null_rate_tol``; values are
    ``%.6f`` strings so a SQL twin can reproduce them bit-exactly),
    ``domain_added_values`` / ``domain_removed_values`` (closed
    domains on both sides only; values are the comma-joined sorted
    difference).  Pure driver arithmetic over two profile tables —
    profiles are columns-sized, never data-sized."""

    def _by_col(t: pa.Table) -> dict:
        return {r["column"]: r for r in t.to_pylist()}

    b, n = _by_col(base), _by_col(new)
    rows: list[tuple] = []
    for c in sorted(set(b) - set(n)):
        rows.append((c, "column_removed", b[c]["dtype"], None))
    for c in sorted(set(n) - set(b)):
        rows.append((c, "column_added", None, n[c]["dtype"]))
    for c in sorted(set(b) & set(n)):
        rb, rn = b[c], n[c]
        if rb["dtype"] != rn["dtype"]:
            rows.append((c, "dtype_changed", rb["dtype"], rn["dtype"]))
        rate_b = rb["n_nulls"] / rb["n_rows"] if rb["n_rows"] else 0.0
        rate_n = rn["n_nulls"] / rn["n_rows"] if rn["n_rows"] else 0.0
        if abs(rate_n - rate_b) > null_rate_tol:
            rows.append((c, "null_rate", "%.6f" % rate_b, "%.6f" % rate_n))
        if rb["domain"] is not None and rn["domain"] is not None:
            db = set(v for v in rb["domain"].split(",") if v)
            dn = set(v for v in rn["domain"].split(",") if v)
            if dn - db:
                rows.append((c, "domain_added_values", None,
                             ",".join(sorted(dn - db))))
            if db - dn:
                rows.append((c, "domain_removed_values",
                             ",".join(sorted(db - dn)), None))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "change": pa.array([r[1] for r in rows], pa.string()),
        "base_value": pa.array([r[2] for r in rows], pa.string()),
        "new_value": pa.array([r[3] for r in rows], pa.string()),
    })


def discover_unique_keys(ds, candidates: list[list[str]],
                         n_buckets: int = 64,
                         batch_size: int | None = 65536) -> pa.Table:
    """Which of the candidate column combinations key the table?
    Returns ``(combo, is_unique)`` — combo is the comma-joined column
    list — exact for every candidate (the HyUCC verification step;
    discovery of the candidate lattice is the caller's policy).

    One streaming pass over the input for ALL candidates at once: per
    batch and per combo, a vectorized group_by collapses the batch to
    distinct composite keys.  If the batch alone proves a duplicate
    (any within-batch count > 1) it ships ONE null-key marker row for
    that combo instead of the combo's keys — an existence proof is all
    the verdict needs, so heavily-duplicated combos cost almost no
    exchange.  Batch-unique keys ship as (combo_id, key, cnt) string
    rows through one hash-bucket exchange where a per-bucket group_by
    finds cross-batch duplicates.  Nulls compare equal (SQL DISTINCT
    semantics, matching a ``SELECT DISTINCT`` twin).
    """
    from peri_ray.stages.checks import bucket_of

    combos = [list(c) for c in candidates]
    labels = [",".join(c) for c in combos]

    def _partial(t: pa.Table) -> pa.Table:
        outs = []
        for ci, cols in enumerate(combos):
            g = (t.select(cols).group_by(cols)
                 .aggregate([([], "count_all")])
                 .rename_columns(cols + ["cnt"]))
            if pc.any(pc.greater(g.column("cnt"), 1)).as_py():
                outs.append(pa.table({
                    "combo_id": pa.array([ci], pa.int64()),
                    "key": pa.array([None], pa.string()),
                    "cnt": pa.array([2], pa.int64())}))
                continue
            key = pc.coalesce(
                g.column(cols[0]).combine_chunks().cast(pa.string()),
                pa.scalar("\x00", pa.string()))
            for c in cols[1:]:
                key = pc.binary_join_element_wise(
                    key,
                    pc.coalesce(g.column(c).combine_chunks()
                                .cast(pa.string()),
                                pa.scalar("\x00", pa.string())), "\x1f")
            outs.append(pa.table({
                "combo_id": pa.array(
                    np.full(g.num_rows, ci, np.int64)),
                "key": key,
                "cnt": g.column("cnt").cast(pa.int64()),
            }))
        return pa.concat_tables(outs)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def _bucket(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column("combo_id").combine_chunks(), pa.string()),
            pc.coalesce(t.column("key").combine_chunks(),
                        pa.scalar("\x00", pa.string())), ":")
        return t.append_column("bucket", bucket_of(k, n_buckets))

    def _dups(group: pa.Table) -> pa.Table:
        marked = group.filter(
            pc.is_null(group.column("key").combine_chunks()))
        g = (group.filter(pc.is_valid(group.column("key").combine_chunks()))
             .select(["combo_id", "key", "cnt"])
             .group_by(["combo_id", "key"]).aggregate([("cnt", "sum")]))
        dup = g.filter(pc.greater(g.column("cnt_sum"), 1))
        ids = (set(marked.column("combo_id").to_pylist())
               | set(dup.column("combo_id").to_pylist()))
        return pa.table({"combo_id": pa.array(sorted(ids), pa.int64())})

    dup_ids: set[int] = set()
    for r in (partials.map_batches(_bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(_dups, batch_format="pyarrow")
              .iter_rows()):
        dup_ids.add(r["combo_id"])

    order = sorted(range(len(labels)), key=labels.__getitem__)
    return pa.table({
        "combo": pa.array([labels[i] for i in order], pa.string()),
        "is_unique": pa.array([i not in dup_ids for i in order],
                              pa.bool_()),
    })
