"""Declarative table-level expectation suite — Great-Expectations-style
data-quality assertions evaluated in ONE fused streaming pass.

Each expectation reduces to an integer counter so the verdict is exact
and the SQL twin hash-matches (no float observables; fraction bounds
are pre-floored to integer micro-thresholds, the same trick as
``stats.hash_weighted_sample``).  All counting expectations share one
``map_batches`` pass with per-batch partial counters merged on the
driver (bounded by expectations × blocks); only ``unique`` needs an
exchange, and it reuses the two-phase bucketed
:func:`peri_ray.stages.checks.duplicate_keys`.

Expectation forms (tuples):

- ``("row_count_between", lo, hi)`` — observed = row count
- ``("null_fraction_at_most", col, frac)`` — observed = null count;
  passes iff ``nulls * 1e6 <= floor(frac * 1e6) * rows``
- ``("min_gte", col, bound)`` — observed = #values below bound
- ``("max_lte", col, bound)`` — observed = #values above bound
- ``("values_between", col, lo, hi)`` — observed = #values outside
- ``("values_in_set", col, values)`` — observed = #non-null values
  outside the set
- ``("unique", col)`` — observed = #rows beyond the first per key
  (non-null keys), i.e. ``count(col) - count(DISTINCT col)``
- ``("regex_match_fraction_at_least", col, pattern, frac)`` —
  observed = #non-null values matching the RE2 pattern (partial
  match, as SQL ``regexp_matches``); passes iff
  ``matches * 1e6 >= floor(frac * 1e6) * rows`` (nulls count
  against the fraction — a mostly-null column should fail a format
  contract)
- ``("int_sum_between", col, lo, hi)`` — observed = exact int64 sum
  of the (integer-unit) column; callers pre-scale money to cents —
  the usual hash-exact contract
- ``("distinct_count_between", col, lo, hi)`` — observed = exact
  COUNT(DISTINCT col) via one bucketed exchange of per-batch unique
  values (string-cast)
- ``("fd_holds", lhs, rhs)`` — observed = #LHS values mapping to >1
  distinct RHS (reuses :func:`peri_ray.stages.checks.fd_report`);
  passes iff 0

This is the [NORTH] verdict surface generalized: where the Peri spec
validates per-record structure, the suite asserts corpus-level
contracts (volume, completeness, ranges, uniqueness) before a corpus
is allowed into training.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FRAC_DEN = 1_000_000


def _check_id(exp: tuple) -> str:
    kind = exp[0]
    if kind == "row_count_between":
        return kind
    if kind == "fd_holds":
        return f"{kind}:{exp[1]}->{exp[2]}"
    return f"{kind}:{exp[1]}"


class _CountPartial:
    """Per-batch counters for every counting expectation (one pass)."""

    def __init__(self, exps: tuple):
        self.exps = exps

    def __call__(self, t: pa.Table) -> pa.Table:
        out = [t.num_rows]
        for exp in self.exps:
            kind = exp[0]
            if kind == "row_count_between":
                out.append(t.num_rows)
                continue
            col = t.column(exp[1]).combine_chunks()
            if kind == "null_fraction_at_most":
                out.append(col.null_count)
            elif kind == "min_gte":
                out.append(int(pc.sum(pc.less(col, exp[2])).as_py() or 0))
            elif kind == "max_lte":
                out.append(int(pc.sum(pc.greater(col, exp[2])).as_py() or 0))
            elif kind == "values_between":
                bad = pc.or_(pc.less(col, exp[2]), pc.greater(col, exp[3]))
                out.append(int(pc.sum(bad).as_py() or 0))
            elif kind == "values_in_set":
                bad = pc.invert(pc.is_in(col, value_set=pa.array(exp[2])))
                bad = pc.and_(bad, pc.is_valid(col))
                out.append(int(pc.sum(bad).as_py() or 0))
            elif kind == "regex_match_fraction_at_least":
                s = col.cast(pa.string())
                hit = pc.and_(pc.is_valid(s),
                              pc.fill_null(pc.match_substring_regex(
                                  s, exp[2]), False))
                out.append(int(pc.sum(hit).as_py() or 0))
            elif kind == "int_sum_between":
                out.append(int(pc.sum(col.cast(pa.int64())).as_py() or 0))
            else:  # pragma: no cover - guarded by expectation_suite
                raise ValueError(f"unknown expectation {kind}")
        return pa.table({"i": pa.array(range(len(out)), pa.int64()),
                         "c": pa.array(out, pa.int64())})


def expectation_suite(ds, expectations: list[tuple],
                      batch_size: int | None = 65536,
                      n_buckets: int = 64) -> pa.Table:
    """Evaluate ``expectations`` against a Dataset; returns the verdict
    table (check_id, observed, passed) in input order.  See module
    docstring for forms and exactness contract."""
    # results key on POSITION, not check_id: two expectations of the
    # same kind+column differing only in threshold share a check_id,
    # and a dict keyed on it silently gave both rows the last verdict
    exchange_kinds = ("unique", "distinct_count_between", "fd_holds")
    counting = [(pos, e) for pos, e in enumerate(expectations)
                if e[0] not in exchange_kinds]
    uniques = [(pos, e) for pos, e in enumerate(expectations)
               if e[0] == "unique"]
    ndvs = [(pos, e) for pos, e in enumerate(expectations)
            if e[0] == "distinct_count_between"]
    fds = [(pos, e) for pos, e in enumerate(expectations)
           if e[0] == "fd_holds"]

    results: dict[int, tuple[int, bool]] = {}

    def _run_counting():
        acc = np.zeros(len(counting) + 1, np.int64)
        partials = ds.map_batches(
            _CountPartial(tuple(e for _, e in counting)),
            batch_format="pyarrow", batch_size=batch_size)
        for r in partials.iter_rows():
            acc[r["i"]] += r["c"]
        out: dict[int, tuple[int, bool]] = {}
        n_rows = int(acc[0])
        for i, (pos, exp) in enumerate(counting):
            obs = int(acc[i + 1])
            kind = exp[0]
            if kind == "row_count_between":
                ok = exp[1] <= obs <= exp[2]
            elif kind == "null_fraction_at_most":
                ok = (obs * _FRAC_DEN
                      <= int(np.floor(exp[2] * _FRAC_DEN)) * n_rows)
            elif kind == "regex_match_fraction_at_least":
                ok = (obs * _FRAC_DEN
                      >= int(np.floor(exp[3] * _FRAC_DEN)) * n_rows)
            elif kind == "int_sum_between":
                ok = exp[2] <= obs <= exp[3]
            else:
                ok = obs == 0
            out[pos] = (obs, ok)
        return out

    def _run_uniques():
        from peri_ray.stages.checks import duplicate_keys

        out: dict[int, tuple[int, bool]] = {}
        for pos, exp in uniques:
            dups = duplicate_keys(ds, exp[1],
                                  n_buckets=n_buckets).materialize()
            n_dup_keys = dups.count()
            extra = int((dups.sum("cnt") - n_dup_keys)
                        if n_dup_keys else 0)
            out[pos] = (extra, extra == 0)
        return out

    def _run_ndvs():
        # ALL NDV expectations share one tagged exchange (the
        # inclusion_report pattern): per-batch distinct values per
        # column, keyed (cid, value)
        from peri_ray.stages.dedup import map_groups_via_buckets

        cols = [e[1] for _, e in ndvs]

        def _uniq(t: pa.Table, cs=tuple(cols)) -> pa.Table:
            cids, vals = [], []
            for ci, c in enumerate(cs):
                v = pc.unique(t.column(c).combine_chunks()
                              .cast(pa.string()).drop_null())
                cids.append(np.full(len(v), ci, np.int64))
                vals.append(v)
            return pa.table({
                "cid": pa.array(np.concatenate(cids) if cids
                                else np.array([], np.int64)),
                "v": pa.concat_arrays(vals) if vals
                else pa.array([], pa.string())})

        def _cnt(g: pa.Table) -> pa.Table:
            d = g.group_by(["cid", "v"]).aggregate([])
            gg = pa.table({
                "cid": d.column("cid"),
                "n": pa.array(np.ones(d.num_rows, np.int64)),
            }).group_by("cid").aggregate([("n", "sum")])
            return gg.rename_columns(["cid", "n"])

        ndv_acc = [0] * len(ndvs)
        for r in map_groups_via_buckets(
                ds.map_batches(_uniq, batch_format="pyarrow",
                               batch_size=batch_size),
                ["cid", "v"], _cnt, n_buckets).iter_rows():
            ndv_acc[r["cid"]] += r["n"]
        return {pos: (ndv_acc[ci], exp[2] <= ndv_acc[ci] <= exp[3])
                for ci, (pos, exp) in enumerate(ndvs)}

    def _run_fds():
        # ALL FD expectations share fd_report's single exchange
        from peri_ray.stages.checks import fd_report

        rep = fd_report([(str(i), ds, exp[1], exp[2])
                         for i, (_, exp) in enumerate(fds)],
                        n_buckets=n_buckets).to_pylist()
        by_label = {r["pair"]: r for r in rep}
        return {pos: (by_label[str(i)]["violating_lhs"],
                      by_label[str(i)]["violating_lhs"] == 0)
                for i, (pos, exp) in enumerate(fds)}

    # the four phases are INDEPENDENT pipelines over the same input;
    # run them concurrently so the suite's wall time is the slowest
    # phase, not the sum (r3 grew the suite from two phases to four
    # and the serial form doubled — VERDICT r3 item 7 root cause).
    # Ray Data executes each consumed dataset on its own; the threads
    # only overlap driver-side waits.
    from concurrent.futures import ThreadPoolExecutor

    phases = []
    if counting:
        phases.append(_run_counting)
    if uniques:
        phases.append(_run_uniques)
    if ndvs:
        phases.append(_run_ndvs)
    if fds:
        phases.append(_run_fds)
    if len(phases) == 1:
        results.update(phases[0]())
    elif phases:
        with ThreadPoolExecutor(max_workers=len(phases)) as pool:
            for part in pool.map(lambda f: f(), phases):
                results.update(part)

    return pa.table({
        "check_id": pa.array([_check_id(e) for e in expectations],
                             pa.string()),
        "observed": pa.array([results[p][0]
                              for p in range(len(expectations))],
                             pa.int64()),
        "passed": pa.array([results[p][1]
                            for p in range(len(expectations))],
                           pa.bool_()),
    })
