"""[NORTH] Streaming per-column statistics in a single pass.

Pattern (SURVEY §2.7, ray_guide "Aggregation at scale"): each
``map_batches`` task computes a small *partial* per batch — exact
count/null/min/max plus serialized mergeable sketches (KLL quantiles,
HLL distinct) — and a tiny final stage merges the partials.  No shuffle:
partials are one row per (batch, column), reduced on the driver (their
total size is O(#batches × #columns × sketch_size), KBs even at 100 TB
block counts, and the merge is associative so it could be treed through
``map_batches`` again if driver fan-in ever mattered).

The exact parts (count/null_count/min/max/sum) are SQL-checkable against
DuckDB; sketch outputs are approximate by construction (driver records a
rows-only check for them).
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.state.sketches import HLL, KLL, hash_strings, splitmix64


class _StatsPartial:
    """map_batches fn: one partial-stats row per column per batch.

    ``cents_sums`` additionally accumulates each numeric column as an
    int64 sum of ROUND(value*100) half-away-from-zero (SQL ROUND):
    integer partials add exactly in any order, so a hash-compared twin
    stays stable at any block count — the float ``sum_num`` is
    association-order sensitive (see _StatsCombine)."""

    def __init__(self, columns: list[str], with_sketches: bool = True, kll_k: int = 200,
                 cents_sums: bool = False):
        self.columns = columns
        self.with_sketches = with_sketches
        self.kll_k = kll_k
        self.cents_sums = cents_sums

    def __call__(self, table: pa.Table) -> pa.Table:
        rows = {
            "column": [], "count": [], "null_count": [],
            "min_num": [], "max_num": [], "sum_num": [], "sum_cents": [],
            "min_str": [], "max_str": [], "sketch": [],
        }
        for name in self.columns:
            col = table.column(name).combine_chunks()
            n = len(col)
            nulls = col.null_count
            rows["column"].append(name)
            rows["count"].append(n)
            rows["null_count"].append(nulls)
            is_num = pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
            is_temporal = pa.types.is_timestamp(col.type) or pa.types.is_date(col.type)
            mn = mx = sm = cents = None
            mns = mxs = None
            sketch_blob = None
            if n > nulls:
                if is_num:
                    mm = pc.min_max(col).as_py()
                    mn, mx = float(mm["min"]), float(mm["max"])
                    sm = float(pc.sum(col).as_py())
                    if self.cents_sums:
                        cents = int(pc.sum(pc.cast(pc.round(
                            pc.multiply(col, pa.scalar(100.0)), 0,
                            round_mode="half_towards_infinity"),
                            pa.int64())).as_py())
                elif is_temporal or pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    mm = pc.min_max(col).as_py()
                    mns, mxs = str(mm["min"]), str(mm["max"])
                if self.with_sketches:
                    kll = None
                    hll = HLL()
                    if is_num:
                        vals = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                        kll = KLL(self.kll_k)
                        kll.update_many(vals)
                        hll.add_hashes(splitmix64(vals.view(np.uint64)))
                    elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                        hll.add_hashes(hash_strings(col.drop_null()))
                    else:
                        hll.add_hashes(hash_strings(pa.array([str(v) for v in col.drop_null().to_pylist()])))
                    sketch_blob = pickle.dumps((kll, hll))
            rows["min_num"].append(mn)
            rows["max_num"].append(mx)
            rows["sum_num"].append(sm)
            rows["sum_cents"].append(cents)
            rows["min_str"].append(mns)
            rows["max_str"].append(mxs)
            rows["sketch"].append(sketch_blob)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "count": pa.array(rows["count"], pa.int64()),
                "null_count": pa.array(rows["null_count"], pa.int64()),
                "min_num": pa.array(rows["min_num"], pa.float64()),
                "max_num": pa.array(rows["max_num"], pa.float64()),
                "sum_num": pa.array(rows["sum_num"], pa.float64()),
                "sum_cents": pa.array(rows["sum_cents"], pa.int64()),
                "min_str": pa.array(rows["min_str"], pa.string()),
                "max_str": pa.array(rows["max_str"], pa.string()),
                "sketch": pa.array(rows["sketch"], pa.binary()),
            }
        )


class _StatsCombine:
    """Streaming combine level between the per-batch partials and the
    driver: merges every partial ROW sharing a column within its input
    batch into one row (counts/sums add, min/max fold, sketches merge —
    all associative+commutative, so any grouping is exact for the exact
    fields and a valid mergeable-summary order for KLL/HLL).  With a
    combine batch of B partial rows the driver fan-in drops from
    O(blocks × cols) to O(blocks × cols / (B/cols)) — the tree-reduce
    step for corpus-scale block counts, with no shuffle (partials
    stream through one more task pool)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        acc: dict[str, dict] = {}
        for row in t.to_pylist():
            name = row["column"]
            s = acc.get(name)
            if s is None:
                acc[name] = s = dict(row)
                s["_sk"] = (pickle.loads(row["sketch"])
                            if row["sketch"] else None)
                continue
            s["count"] += row["count"]
            s["null_count"] += row["null_count"]
            for f, fold in (("min_num", min), ("max_num", max),
                            ("min_str", min), ("max_str", max)):
                v = row[f]
                if v is not None:
                    s[f] = v if s[f] is None else fold(s[f], v)
            if row["sum_num"] is not None:
                # float add: the result depends on how partials were
                # grouped into combine batches — exact consumers must
                # use sum_cents (integer adds are order-independent)
                s["sum_num"] = (s["sum_num"] or 0.0) + row["sum_num"]
            if row.get("sum_cents") is not None:
                s["sum_cents"] = (s.get("sum_cents") or 0) + row["sum_cents"]
            if row["sketch"]:
                kll, hll = pickle.loads(row["sketch"])
                if s["_sk"] is None:
                    s["_sk"] = (kll, hll)
                else:
                    pk, ph = s["_sk"]
                    if kll is not None:
                        pk = kll if pk is None else pk.merge(kll)
                    if hll is not None:
                        ph = hll if ph is None else ph.merge(hll)
                    s["_sk"] = (pk, ph)
        for s in acc.values():
            s["sketch"] = (pickle.dumps(s["_sk"])
                           if s["_sk"] is not None else None)
            del s["_sk"]
        return pa.Table.from_pylist(list(acc.values()), schema=t.schema)


def column_stats(
    ds,
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    with_sketches: bool = True,
    batch_size: int | None = 65536,
    combine_batch: int | None = 4096,
    cents_sums: bool = False,
) -> dict[str, dict[str, Any]]:
    """Single streaming pass over ``ds``; returns
    ``{column: {count, null_count, min, max, sum, ndv, quantiles}}``.

    Exact: count/null_count/min/max/sum (merged from per-batch Arrow
    aggregates).  Approximate: ndv (HLL), quantiles (KLL).  A streaming
    combine level (``combine_batch`` partial rows per merge task, pass
    None to disable) bounds the driver fan-in at corpus-scale block
    counts."""
    if columns is None:
        columns = ds.schema().names
    partial_ds = ds.map_batches(
        _StatsPartial(columns, with_sketches, cents_sums=cents_sums),
        batch_format="pyarrow", batch_size=batch_size
    )
    if combine_batch:
        partial_ds = partial_ds.map_batches(
            _StatsCombine(), batch_format="pyarrow", batch_size=combine_batch)
    partials = partial_ds.take_all()  # small: one row per column per task

    out: dict[str, dict[str, Any]] = {}
    merged_sketch: dict[str, tuple[KLL | None, HLL | None]] = {}
    for row in partials:
        name = row["column"]
        s = out.setdefault(
            name,
            {"count": 0, "null_count": 0, "min": None, "max": None, "sum": None},
        )
        s["count"] += row["count"]
        s["null_count"] += row["null_count"]
        for src_min, src_max in (("min_num", "max_num"), ("min_str", "max_str")):
            mn, mx = row[src_min], row[src_max]
            if mn is not None:
                s["min"] = mn if s["min"] is None else min(s["min"], mn)
            if mx is not None:
                s["max"] = mx if s["max"] is None else max(s["max"], mx)
        if row["sum_num"] is not None:
            s["sum"] = (s["sum"] or 0.0) + row["sum_num"]
        if row.get("sum_cents") is not None:
            s["sum_cents"] = (s.get("sum_cents") or 0) + row["sum_cents"]
        if row["sketch"]:
            kll, hll = pickle.loads(row["sketch"])
            prev = merged_sketch.get(name)
            if prev is None:
                merged_sketch[name] = (kll, hll)
            else:
                pk, ph = prev
                if kll is not None and pk is not None:
                    pk.merge(kll)
                elif kll is not None:
                    pk = kll
                if hll is not None and ph is not None:
                    ph.merge(hll)
                merged_sketch[name] = (pk, ph)
    for name, (kll, hll) in merged_sketch.items():
        if hll is not None:
            out[name]["ndv"] = hll.estimate()
        if kll is not None:
            out[name]["quantiles"] = dict(zip(map(str, quantiles), kll.quantiles(quantiles)))
    return out


def exact_stats_table(ds, columns: list[str], batch_size: int | None = 65536,
                      cents_sums: bool = False) -> pa.Table:
    """Oracle-checkable exact stats as one row per column:
    (column, count, null_count, min_num, max_num, sum_num) — numeric
    columns only, matching ``SELECT count(col), min(col), ...``.

    With ``cents_sums`` an int64 ``sum_cents`` column is appended —
    SUM(CAST(ROUND(col*100) AS BIGINT)) — the order-independent form a
    hash-compared oracle must use (the float ``sum_v`` drifts with
    partial-combine layout at large block counts)."""
    stats = column_stats(ds, columns, with_sketches=False,
                         batch_size=batch_size, cents_sums=cents_sums)
    cols = {
        "column": pa.array(columns, pa.string()),
        "cnt": pa.array([stats[c]["count"] - stats[c]["null_count"] for c in columns], pa.int64()),
        "null_count": pa.array([stats[c]["null_count"] for c in columns], pa.int64()),
        "min_v": pa.array([stats[c]["min"] for c in columns], pa.float64()),
        "max_v": pa.array([stats[c]["max"] for c in columns], pa.float64()),
        "sum_v": pa.array([stats[c]["sum"] for c in columns], pa.float64()),
    }
    if cents_sums:
        cols["sum_cents"] = pa.array(
            [stats[c].get("sum_cents") for c in columns], pa.int64())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# group-wise top-k (top-N rows per key — "best docs per domain")
# ---------------------------------------------------------------------------


class _TopKPerGroupPartial:
    """Batch → at most k rows per key: sort the batch by
    (key, order desc|asc, tiebreak asc) and keep each key-run's first k
    (vectorized run-position mask).  The exchange then carries ≤
    k × keys × blocks rows instead of the full table."""

    def __init__(self, key: str, order_col: str, k: int, descending: bool,
                 tiebreak: str):
        self.key = key
        self.order_col = order_col
        self.k = k
        self.descending = descending
        self.tiebreak = tiebreak

    def __call__(self, t: pa.Table) -> pa.Table:
        direction = "descending" if self.descending else "ascending"
        s = t.sort_by([(self.key, "ascending"), (self.order_col, direction),
                       (self.tiebreak, "ascending")])
        keys = s.column(self.key).combine_chunks()
        n = len(keys)
        if n == 0:
            return s
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
            # nulls compare as null → treat consecutive nulls as same key
            nulls = pc.is_null(keys).to_numpy(zero_copy_only=False)
            same[1:] |= nulls[1:] & nulls[:-1]
        run_start = np.flatnonzero(~same)
        start_of = np.repeat(run_start, np.diff(np.append(run_start, n)))
        pos = np.arange(n) - start_of
        return s.filter(pa.array(pos < self.k))


def top_k_per_group(ds, key: str, order_col: str, k: int,
                    descending: bool = True, tiebreak: str | None = None,
                    n_buckets: int = 64, batch_size: int | None = 65536):
    """Top-k rows per key by ``order_col`` with a deterministic
    ``tiebreak`` column (ties broken ascending) — the SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k`` as a
    distributed operator.

    Two-phase: per-batch partials keep ≤ k rows per key per block, a
    hash-bucketed exchange co-locates each key, and the identical
    sort+mask pass runs once per bucket.  Exact, because a row in any
    key's global top-k is in that key's top-k of its own block."""
    from peri_ray.stages.checks import _AddBucket

    tiebreak = tiebreak or order_col
    partial = _TopKPerGroupPartial(key, order_col, k, descending, tiebreak)
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    bucketed = partials.map_batches(_AddBucket(key, n_buckets),
                                    batch_format="pyarrow")

    def _merge(group: pa.Table) -> pa.Table:
        return partial(group.drop_columns(["bucket"]))

    return bucketed.groupby("bucket").map_groups(_merge, batch_format="pyarrow")


def stratified_sample(ds, key: str, k: int, id_col: str, seed: int = 1234,
                      n_buckets: int = 64, batch_size: int | None = 65536):
    """Deterministic k-per-stratum sample: order each stratum by a
    seeded hash of the row id and keep the k smallest — i.e.
    :func:`top_k_per_group` over a pseudo-random order column, so the
    selection is reproducible across runs/cluster sizes (unlike
    ``random_sample``, whose draw depends on block layout) and exact:
    every stratum yields ``min(count, k)`` rows.

    The per-batch partial keeps ≤ k rows per stratum per block, so the
    exchange carries k × strata × blocks rows — the input table never
    shuffles."""
    from peri_ray.state.sketches import splitmix64

    def _h(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        with np.errstate(over="ignore"):
            h = splitmix64(ids.view(np.uint64) + np.uint64(seed))
        return t.append_column("__h", pa.array(h.astype(np.int64)))

    withh = ds.map_batches(_h, batch_format="pyarrow", batch_size=batch_size)
    sampled = top_k_per_group(withh, key, "__h", k, descending=False,
                              tiebreak=id_col, n_buckets=n_buckets,
                              batch_size=batch_size)
    return sampled.drop_columns(["__h"])


#: modulus pair for hash_weighted_sample: ids fold modulo the prime
#: first so the Knuth multiply stays inside int64 in BOTH engines
#: (10^12-scale ids × 2654435761 would overflow DuckDB's BIGINT).
_HWS_PRIME = 1_000_003
_HWS_MULT = 2_654_435_761
_HWS_MOD = 1_000_000


def hash_weighted_sample(ds, rates: dict, key_col: str, id_col: str,
                         batch_size: int | None = 65536):
    """Corpus-mixing sampler: keep each row with its group's rate,
    decided by a DETERMINISTIC integer hash of the id — reproducible
    across runs, block layouts and cluster sizes, and exactly
    SQL-expressible (``(id % 1000003) * 2654435761 % 1000000 <
    floor(rate * 1e6)``, all BIGINT).  This is the per-source
    temperature-mixing primitive (Pile/ROOTS style): compute rates
    from source counts upstream (see :func:`temperature_rates`), then
    one streaming pass — no shuffle, groups not materialized.

    Rows whose group is absent from ``rates`` are dropped (rate 0);
    thresholds are pre-floored to integers so float representation can
    never flip a boundary row between engines."""
    thresholds = {k: int(np.floor(v * _HWS_MOD)) for k, v in rates.items()}

    def _b(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False).astype(np.int64))
        h = (ids % _HWS_PRIME) * _HWS_MULT % _HWS_MOD
        keys = t.column(key_col).combine_chunks()
        thr = np.full(t.num_rows, -1, np.int64)
        for kv, tv in thresholds.items():
            m = pc.fill_null(pc.equal(keys, kv), False).to_numpy(
                zero_copy_only=False).astype(bool)
            thr[m] = tv
        return t.filter(pa.array(h < thr))

    return ds.map_batches(_b, batch_format="pyarrow", batch_size=batch_size)


_SPLIT_NAMES = ("train", "val", "test")


def hash_split_summary(ds, id_col: str, val_col: str | None = None,
                       bounds: tuple[int, int] = (80, 90),
                       batch_size: int | None = 65536) -> pa.Table:
    """Deterministic train/val/test PARTITION of a corpus: each row
    lands in exactly one split by the same integer Knuth hash as
    :func:`hash_weighted_sample` (``(id % 1000003) * 2654435761 %
    1000000 % 100`` compared to the two percentile ``bounds``) —
    reproducible across runs, block layouts and cluster sizes, and
    disjoint + exhaustive by construction (the mixing sampler is
    keep-rate per group; this is the partition variant every training
    run needs before it touches the data).  One streaming pass of
    per-batch (split, n, sum) partials; driver merge bounded by
    3 × blocks; all-integer so the SQL twin hash-matches exactly.
    Returns (split, n_rows, sum_val) for non-empty splits only."""
    lo, hi = bounds

    def _part(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False).astype(np.int64))
        b = (ids % _HWS_PRIME) * _HWS_MULT % _HWS_MOD % 100
        split = np.where(b < lo, 0, np.where(b < hi, 1, 2))
        n = np.bincount(split, minlength=3).astype(np.int64)
        if val_col is not None:
            vals = (pc.fill_null(t.column(val_col).combine_chunks()
                                 .cast(pa.int64()), 0)
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            s = np.array([int(vals[split == i].sum()) for i in range(3)],
                         np.int64)
        else:
            s = n
        return pa.table({"split_id": pa.array([0, 1, 2], pa.int64()),
                         "n": pa.array(n), "s": pa.array(s)})

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    n_acc = np.zeros(3, np.int64)
    s_acc = np.zeros(3, np.int64)
    for r in partials.iter_rows():
        n_acc[r["split_id"]] += r["n"]
        s_acc[r["split_id"]] += r["s"]
    keep = [i for i in range(3) if n_acc[i] > 0]
    return pa.table({
        "split": pa.array([_SPLIT_NAMES[i] for i in keep], pa.string()),
        "n_rows": pa.array([int(n_acc[i]) for i in keep], pa.int64()),
        "sum_val": pa.array([int(s_acc[i]) for i in keep], pa.int64()),
    })


def minmax_normalize(ds, key_col: str, value_col: str, id_col: str,
                     batch_size: int | None = 65536):
    """Per-group min-max feature scaling — the classic two-pass
    distributed normalization: (1) per-batch (key, min, max) partials
    merge on the driver (bounded by groups × blocks, the same
    partials-beat-shuffle trade as :func:`grouped_stats`); (2) the
    tiny per-group bounds broadcast into a vectorized second pass.
    The input streams twice; nothing shuffles.

    ``norm = (value - min) / (max - min)`` evaluated as the identical
    IEEE double expression the SQL window twin computes, so raw
    outputs hash-match; null when value is null or the group is
    constant (span 0).  A null group key is its own group, matching
    SQL PARTITION BY null semantics.  Returns (id_col, norm_value)."""

    def _bounds(t: pa.Table) -> pa.Table:
        g = (t.select([key_col, value_col]).group_by([key_col])
             .aggregate([(value_col, "min"), (value_col, "max")]))
        return g.rename_columns([key_col, "mn", "mx"])

    partials = ds.map_batches(_bounds, batch_format="pyarrow",
                              batch_size=batch_size)
    bounds: dict = {}
    for r in partials.iter_rows():
        if r["mn"] is None:
            continue
        cur = bounds.get(r[key_col])
        if cur is None:
            bounds[r[key_col]] = [r["mn"], r["mx"]]
        else:
            cur[0] = min(cur[0], r["mn"])
            cur[1] = max(cur[1], r["mx"])

    def _apply(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).combine_chunks()
        v = (t.column(value_col).combine_chunks().cast(pa.float64())
             .to_numpy(zero_copy_only=False))
        valid = pc.is_valid(t.column(value_col).combine_chunks()).to_numpy(
            zero_copy_only=False).astype(bool)
        # one dictionary-encode per batch, then a gather: O(rows +
        # distinct-keys-in-batch), independent of GLOBAL group count —
        # the former per-group full-column equality scan was
        # O(groups × rows) and degraded on high-cardinality keys
        enc = keys.dictionary_encode()
        dict_keys = enc.dictionary.to_pylist()
        mn_arr = np.full(len(dict_keys) + 1, np.nan)
        mx_arr = np.full(len(dict_keys) + 1, np.nan)
        for j, k in enumerate(dict_keys + [None]):  # last slot: null key
            b = bounds.get(k)
            if b is not None and b[1] > b[0]:  # constant group -> null
                mn_arr[j], mx_arr[j] = b
        idx = pc.fill_null(enc.indices, len(dict_keys)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # identical IEEE expression to the SQL window twin; NaN bounds
        # (missing/constant group) and invalid values propagate to null
        with np.errstate(invalid="ignore", divide="ignore"):
            out = (v - mn_arr[idx]) / (mx_arr[idx] - mn_arr[idx])
        out[~valid] = np.nan
        return pa.table({id_col: t.column(id_col),
                         "norm_value": pa.array(out, pa.float64(),
                                                from_pandas=True)})

    return ds.map_batches(_apply, batch_format="pyarrow",
                          batch_size=batch_size)


def gini_concentration(ds, key_col: str,
                       batch_size: int | None = 65536) -> pa.Table:
    """Gini coefficient of the per-group row-count distribution — the
    standard skew/concentration score for "is one source dominating
    the corpus?" monitoring (0 = uniform, →1 = one group holds all
    rows).  Counts come from the two-phase categorical histogram
    (per-batch partials, tiny merge); the coefficient is pure driver
    arithmetic over the small per-group dict:
    ``(2·Σ i·c_i − (n+1)·Σc) / (n·Σc)`` with counts ascending, ties
    broken by key so both engines rank identically.  All-integer until
    the single final division, so the SQL twin lands on the same
    double.  Returns one row (gini, n_groups)."""
    from peri_ray.stages.checks import histogram

    counts = histogram(ds, key_col, batch_size=batch_size)
    items = sorted(counts.items(), key=lambda kv: (kv[1], str(kv[0])))
    n = len(items)
    tot = sum(c for _, c in items)
    if n == 0 or tot == 0:
        gini = None
    else:
        s_ic = sum((i + 1) * c for i, (_, c) in enumerate(items))
        # convert each exact-int operand to double BEFORE dividing —
        # the SQL twin CASTs numerator and denominator to DOUBLE, and
        # Python's exact int/int quotient lands on a different double
        # once either operand exceeds 2^53
        gini = float(2 * s_ic - (n + 1) * tot) / float(n * tot)
    return pa.table({"gini": pa.array([gini], pa.float64()),
                     "n_groups": pa.array([n], pa.int64())})


class _ModeCountPartial:
    """Batch → (key, val, cnt) partials: within-batch occurrences
    collapse to per-pair counts before the exchange (null values are
    excluded — SQL's mode() semantics; null KEYS stay a group)."""

    def __init__(self, key: str, val: str):
        self.key = key
        self.val = val

    def __call__(self, t: pa.Table) -> pa.Table:
        sel = t.select([self.key, self.val])
        sel = sel.filter(pc.is_valid(sel.column(self.val)))
        g = (sel.group_by([self.key, self.val])
             .aggregate([([], "count_all")]))
        return g.rename_columns([self.key, self.val, "cnt"])


def mode_per_group(ds, key: str, val: str, n_buckets: int = 64,
                   batch_size: int | None = 65536):
    """Most frequent ``val`` per ``key`` — deterministic ties (highest
    count, then smallest value) so the SQL twin (``row_number() OVER
    (ORDER BY cnt DESC, val)``) ranks identically.  Returns
    (key, mode, n) with n = the winning count.

    Two-phase: per-batch (key, val, cnt) partials collapse duplicates
    before ONE hash-bucketed exchange on ``key``; per bucket the counts
    re-sum with a vectorized Arrow group_by and the winner per key is a
    sort + run-boundary mask (no per-group Ray aggregate — key
    cardinality is unbounded at corpus scale)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    partials = ds.map_batches(_ModeCountPartial(key, val),
                              batch_format="pyarrow", batch_size=batch_size)

    def _argmax(group: pa.Table) -> pa.Table:
        g = (group.select([key, val, "cnt"]).group_by([key, val])
             .aggregate([("cnt", "sum")])
             .rename_columns([key, val, "cnt"]))
        g = g.sort_by([(key, "ascending"), ("cnt", "descending"),
                       (val, "ascending")])
        keys = g.column(key).combine_chunks()
        n = len(keys)
        if n == 0:
            return pa.table({key: keys, "mode": g.column(val),
                             "n": g.column("cnt")})
        # first row of each key run wins (count desc, value asc order)
        prev_eq = pc.equal(keys.slice(0, n - 1), keys.slice(1)).fill_null(
            False).to_numpy(zero_copy_only=False)
        null_run = (pc.is_null(keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
            & pc.is_null(keys.slice(1)).to_numpy(zero_copy_only=False))
        first = np.ones(n, bool)
        first[1:] = ~(prev_eq | null_run)
        out = g.filter(pa.array(first))
        return pa.table({key: out.column(key), "mode": out.column(val),
                         "n": out.column("cnt")})

    return map_groups_via_buckets(partials, [key], _argmax,
                                  n_buckets=n_buckets)


def temperature_rates(counts: dict, alpha: float = 0.7,
                      target_total: int | None = None) -> dict:
    """Temperature-smoothed mixing rates: sampling probability per
    group ∝ count^alpha (alpha<1 upweights small sources), scaled so
    the expected total is ``target_total`` (default: input total),
    capped at 1.0.  Pure driver-side arithmetic over the (small)
    per-source count dict."""
    tot = sum(counts.values())
    target = tot if target_total is None else target_total
    pow_sum = sum(c ** alpha for c in counts.values())
    return {k: min(1.0, (c ** alpha / pow_sum) * target / c)
            for k, c in counts.items() if c > 0}


def grouped_corr(ds, key: str, x: str, y: str,
                 batch_size: int | None = 65536, round_to: int = 6) -> pa.Table:
    """Per-group Pearson correlation via algebraic combiners
    (n, Σx, Σy, Σx², Σy², Σxy per batch per group; tiny driver merge —
    the same partials-beat-shuffle trade as :func:`grouped_stats`).
    Rows with a null in either column are excluded, matching SQL
    ``corr``; degenerate groups (n<2 or zero variance) yield null.
    The result rounds to ``round_to`` decimals: the naive-sum formula
    and DuckDB's stable one-pass differ in the last ulps."""

    def _partial(t: pa.Table) -> pa.Table:
        xv = t.column(x).combine_chunks().cast(pa.float64())
        yv = t.column(y).combine_chunks().cast(pa.float64())
        ok = pc.and_(pc.is_valid(xv), pc.is_valid(yv))
        sub = pa.table({key: t.column(key), "x": xv, "y": yv}).filter(ok)
        xa = sub.column("x").to_numpy(zero_copy_only=False)
        ya = sub.column("y").to_numpy(zero_copy_only=False)
        aug = pa.table({
            key: sub.column(key),
            "n": pa.array(np.ones(len(xa), np.int64)),
            "sx": sub.column("x"), "sy": sub.column("y"),
            "sxx": pa.array(xa * xa), "syy": pa.array(ya * ya),
            "sxy": pa.array(xa * ya),
        })
        g = aug.group_by(key).aggregate([(c, "sum") for c in
                                         ("n", "sx", "sy", "sxx", "syy", "sxy")])
        return g.rename_columns([key, "n", "sx", "sy", "sxx", "syy", "sxy"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)
    acc: dict = {}
    for r in partials.iter_rows():
        cur = acc.setdefault(r[key], np.zeros(6))
        cur += [r["n"], r["sx"], r["sy"], r["sxx"], r["syy"], r["sxy"]]
    keys = sorted(acc, key=str)
    corrs = []
    for k in keys:
        n, sx, sy, sxx, syy, sxy = acc[k]
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n < 2 or vx <= 0 or vy <= 0:
            corrs.append(None)
        else:
            corrs.append(round((n * sxy - sx * sy) / np.sqrt(vx * vy), round_to))
    return pa.table({
        key: pa.array(keys),
        "n": pa.array([int(acc[k][0]) for k in keys], pa.int64()),
        "corr": pa.array(corrs, pa.float64()),
    })


def grouped_regression(ds, key: str, x: str, y: str,
                       x_scale: int = 1, y_scale: int = 100,
                       batch_size: int | None = 65536) -> pa.Table:
    """Per-group simple linear regression (OLS slope + intercept) via
    EXACT integer-unit algebraic combiners — the hash-compare-safe
    sibling of :func:`grouped_corr`.

    Both columns quantize to integer units (``x*x_scale``,
    ``y*y_scale``, SQL-ROUND half-away), per-batch partials carry
    (n, Σx, Σy, Σxx, Σxy) as int64 per group, and the driver merge
    accumulates PYTHON ints (arbitrary precision: ``n·Σxy`` overflows
    int64 beyond ~1e19, which real corpus sizes reach).  The closed
    form then converts each operand with ``float()`` exactly once —
    the only float ops are the final division/multiply chain, so a
    SQL twin using HUGEINT sums and the same CAST order lands on the
    identical doubles (CLAUDE.md int-division pitfall).

    Rows with a null in either column are excluded (SQL regr_* rule);
    groups with zero x-variance yield null slope/intercept.  Output
    units: slope in y-units per x-unit, intercept in y-units."""

    def _partial(t: pa.Table) -> pa.Table:
        xv = t.column(x).combine_chunks().cast(pa.float64())
        yv = t.column(y).combine_chunks().cast(pa.float64())
        ok = pc.and_(pc.is_valid(xv), pc.is_valid(yv))
        sub = pa.table({key: t.column(key), "x": xv, "y": yv}).filter(ok)
        xi = pc.round(pc.multiply(sub.column("x"), float(x_scale)),
                      round_mode="half_towards_infinity").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yi = pc.round(pc.multiply(sub.column("y"), float(y_scale)),
                      round_mode="half_towards_infinity").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        aug = pa.table({
            key: sub.column(key),
            "n": pa.array(np.ones(len(xi), np.int64)),
            "sx": pa.array(xi), "sy": pa.array(yi),
            "sxx": pa.array(xi * xi), "sxy": pa.array(xi * yi),
        })
        g = aug.group_by(key).aggregate([(c, "sum") for c in
                                         ("n", "sx", "sy", "sxx", "sxy")])
        return g.rename_columns([key, "n", "sx", "sy", "sxx", "sxy"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)
    acc: dict = {}
    for r in partials.iter_rows():
        cur = acc.setdefault(r[key], [0, 0, 0, 0, 0])
        for i, c in enumerate(("n", "sx", "sy", "sxx", "sxy")):
            cur[i] += int(r[c])  # python ints: exact at any scale
    keys = sorted(acc, key=str)
    slopes, intercepts = [], []
    for k in keys:
        n, sx, sy, sxx, sxy = acc[k]
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            slopes.append(None)
            intercepts.append(None)
            continue
        # slope in integer-unit space, then rescale: each float() is
        # one correctly-rounded conversion, mirrored by SQL CASTs
        slope_u = float(n * sxy - sx * sy) / float(den)
        slopes.append(slope_u * float(x_scale) / float(y_scale))
        icept_u = (float(sy) - slope_u * float(sx)) / float(n)
        intercepts.append(icept_u / float(y_scale))
    return pa.table({
        key: pa.array(keys),
        "n": pa.array([int(acc[k][0]) for k in keys], pa.int64()),
        "slope": pa.array(slopes, pa.float64()),
        "intercept": pa.array(intercepts, pa.float64()),
    })


def grouped_kll_quantiles(ds, key: str, col: str,
                          qs: tuple[float, ...] = (0.5, 0.9),
                          k: int = 200, n_buckets: int = 64,
                          batch_size: int | None = 65536):
    """Approximate per-group quantiles via per-(block, key) KLL
    partials merged through the bucketed exchange — the scale path
    when the GROUP count is of the order of the row count (per-host
    length profiles at web scale), where exact per-group selection
    and driver merges both stop fitting.  Exchange ships one ~k-float
    sketch per (block, key); rank error ~1.65/√k.

    Output: (key, n, q_<q>… ) one row per group."""
    import pickle

    from peri_ray.stages.dedup import per_group_via_buckets

    def _partial(t: pa.Table) -> pa.Table:
        xv = t.column(col).combine_chunks().cast(pa.float64())
        sub = pa.table({key: t.column(key), "x": xv}).filter(pc.is_valid(xv))
        kcol = sub.column(key).combine_chunks()
        xa = sub.column("x").to_numpy(zero_copy_only=False)
        enc = kcol.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # null keys form their own group: null dictionary indices come
        # back as NaN from to_numpy — map them to -1, not INT64_MIN
        raw = enc.indices.to_numpy(zero_copy_only=False)
        if raw.dtype.kind == "f":
            idx = np.where(np.isnan(raw), -1, raw).astype(np.int64)
        else:
            idx = raw.astype(np.int64)
        keys_out, blobs = [], []
        from peri_ray.state.sketches import KLL

        order = np.argsort(idx, kind="stable")
        sorted_idx = idx[order]
        bounds = np.flatnonzero(np.diff(sorted_idx)) + 1
        for run in np.split(order, bounds):
            if len(run) == 0:
                continue
            sk = KLL(k=k)
            sk.update_many(xa[run])
            di = int(idx[run[0]])
            keys_out.append(None if di < 0 else enc.dictionary[di].as_py())
            blobs.append(pickle.dumps(sk))
        return pa.table({key: pa.array(keys_out, type=enc.dictionary.type),
                         "sk": pa.array(blobs, pa.binary())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def _merge(run: pa.Table) -> pa.Table:
        merged = None
        for blob in run.column("sk").to_pylist():
            sk = pickle.loads(blob)
            merged = sk if merged is None else merged.merge(sk)
        vals = merged.quantiles(qs)
        # explicit type: an untyped pa.array([None]) for a null-key run
        # is null-typed and poisons the bucket's concat_tables
        cols = {key: pa.array([run.column(key)[0].as_py()],
                              type=run.column(key).type),
                "n": pa.array([merged.n], pa.int64())}
        for q, v in zip(qs, vals):
            cols[f"q_{str(q).replace('.', '_')}"] = pa.array([v], pa.float64())
        return pa.table(cols)

    return per_group_via_buckets(partials, [key], _merge, n_buckets=n_buckets,
                                 min_run=1)


def grouped_hll_ndv(ds, key: str, col: str, p: int = 12,
                    n_buckets: int = 64,
                    batch_size: int | None = 65536):
    """Approximate COUNT(DISTINCT col) per key via per-(block, key) HLL
    partials merged through the bucketed exchange — the bounded-memory
    complement to the exact pair-exchange
    (``grouped_distinct_count``): exact ships one row per DISTINCT
    (key, value) pair; this ships one 2^p-byte register array per
    (block, key) regardless of how many distinct values a hot group
    holds (per-host url diversity at web scale).  ~1.6% standard error
    at the default p=12.

    Output: (key, ndv) with ndv the rounded HLL estimate."""
    import pickle

    from peri_ray.stages.dedup import per_group_via_buckets
    from peri_ray.state.sketches import HLL, hash_strings, splitmix64

    def _partial(t: pa.Table) -> pa.Table:
        vcol = t.column(col).combine_chunks()
        sub = pa.table({key: t.column(key), "v": vcol}).filter(
            pc.is_valid(vcol))
        vals = sub.column("v").combine_chunks()
        if (pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type)
                or pa.types.is_binary(vals.type)):
            hashes = hash_strings(vals)
        elif pa.types.is_floating(vals.type):
            # hash the float64 BIT PATTERN (same recipe as column_stats'
            # HLL) — a safe cast to int64 raises on non-integral floats
            hashes = splitmix64(vals.cast(pa.float64()).to_numpy(
                zero_copy_only=False).view(np.uint64))
        else:
            hashes = splitmix64(vals.cast(pa.int64()).to_numpy(
                zero_copy_only=False).view(np.uint64))
        kcol = sub.column(key).combine_chunks()
        enc = kcol.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        raw = enc.indices.to_numpy(zero_copy_only=False)
        idx = (np.where(np.isnan(raw), -1, raw).astype(np.int64)
               if raw.dtype.kind == "f" else raw.astype(np.int64))
        keys_out, blobs = [], []
        order = np.argsort(idx, kind="stable")
        sorted_idx = idx[order]
        bounds = np.flatnonzero(np.diff(sorted_idx)) + 1
        for run in np.split(order, bounds):
            if len(run) == 0:
                continue
            h = HLL(p)
            h.add_hashes(hashes[run])
            di = int(idx[run[0]])
            keys_out.append(None if di < 0 else enc.dictionary[di].as_py())
            blobs.append(pickle.dumps(h))
        return pa.table({key: pa.array(keys_out, type=enc.dictionary.type),
                         "sk": pa.array(blobs, pa.binary())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def _merge(run: pa.Table) -> pa.Table:
        merged = None
        for blob in run.column("sk").to_pylist():
            h = pickle.loads(blob)
            merged = h if merged is None else merged.merge(h)
        return pa.table({key: pa.array([run.column(key)[0].as_py()],
                                       type=run.column(key).type),
                         "ndv": pa.array([int(round(merged.estimate()))],
                                         pa.int64())})

    return per_group_via_buckets(partials, [key], _merge, n_buckets=n_buckets,
                                 min_run=1)


def grouped_variance(ds, key: str, col: str,
                     batch_size: int | None = 65536,
                     round_to: int = 6) -> pa.Table:
    """Per-group sample variance + stddev via the same algebraic
    combiners as :func:`grouped_corr` (n, Σx, Σx²).  Nulls excluded;
    groups with n < 2 yield null.  Rounded on both sides: the naive
    formula and SQL's stable var_samp differ in the last ulps (keep
    ``col`` small-magnitude — large-magnitude sums reintroduce the
    rounded-float compare hazard recorded in CLAUDE.md)."""

    def _partial(t: pa.Table) -> pa.Table:
        xv = t.column(col).combine_chunks().cast(pa.float64())
        sub = pa.table({key: t.column(key), "x": xv}).filter(pc.is_valid(xv))
        xa = sub.column("x").to_numpy(zero_copy_only=False)
        aug = pa.table({
            key: sub.column(key),
            "n": pa.array(np.ones(len(xa), np.int64)),
            "sx": sub.column("x"),
            "sxx": pa.array(xa * xa),
        })
        g = aug.group_by(key).aggregate([(c, "sum") for c in ("n", "sx", "sxx")])
        return g.rename_columns([key, "n", "sx", "sxx"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)
    acc: dict = {}
    for r in partials.iter_rows():
        cur = acc.setdefault(r[key], np.zeros(3))
        cur += [r["n"], r["sx"], r["sxx"]]
    keys = sorted(acc, key=str)
    var_v, std_v = [], []
    for k in keys:
        n, sx, sxx = acc[k]
        if n < 2:
            var_v.append(None)
            std_v.append(None)
        else:
            v = (sxx - sx * sx / n) / (n - 1)
            v = max(v, 0.0)  # naive formula can go -1e-12 on constants
            # half-away like SQL ROUND (python round is half-to-even
            # and rational variances CAN tie at the round_to+1 digit)
            scale = 10.0 ** round_to
            var_v.append(np.floor(v * scale + 0.5) / scale)
            std_v.append(np.floor(float(np.sqrt(v)) * scale + 0.5) / scale)
    return pa.table({
        key: pa.array(keys),
        "n": pa.array([int(acc[k][0]) for k in keys], pa.int64()),
        "var_samp": pa.array(var_v, pa.float64()),
        "stddev_samp": pa.array(std_v, pa.float64()),
    })


class _GroupedStatsPartial:
    """Batch → one (key, column, cnt, null_count, min, max, sum) row per
    (group, column): ONE vectorized Arrow group_by per batch carrying
    all columns' aggregates, melted to long form over the tiny result."""

    def __init__(self, key: str, columns: tuple[str, ...],
                 cents: bool = False):
        self.key = key
        self.columns = tuple(columns)
        self.cents = cents

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.select([self.key, *self.columns])
        aggs = [("__one", "sum")]
        for c in self.columns:
            aggs += [(c, "count"), (c, "min"), (c, "max")]
            if self.cents:
                # exact integer-cents sums: per-row ROUND(x*100)
                # half-away then an int64 sum — identical at any
                # partial layout (a float sum of ~1e9 magnitude
                # drifts near .005 boundaries); min/max/count stay
                # on the raw values
                cents = pc.round(
                    pc.multiply(t.column(c).cast(pa.float64()),
                                pa.scalar(100.0)),
                    round_mode="half_towards_infinity").cast(pa.int64())
                t = t.append_column(f"__cents_{c}", cents)
                aggs.append((f"__cents_{c}", "sum"))
            else:
                aggs.append((c, "sum"))
        g = (t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))
             .group_by(self.key).aggregate(aggs))
        keys = g.column(self.key).to_pylist()
        total = g.column("__one_sum").to_pylist()
        out = {"key": [], "column": [], "cnt": [], "null_count": [],
               "min_v": [], "max_v": [], "sum_v": []}
        for c in self.columns:
            cnt = g.column(f"{c}_count").to_pylist()
            mn = g.column(f"{c}_min").to_pylist()
            mx = g.column(f"{c}_max").to_pylist()
            sm = g.column(f"__cents_{c}_sum" if self.cents
                          else f"{c}_sum").to_pylist()
            out["key"] += keys
            out["column"] += [c] * len(keys)
            out["cnt"] += [int(x) for x in cnt]
            out["null_count"] += [int(tt) - int(x) for tt, x in zip(total, cnt)]
            out["min_v"] += [None if v is None else float(v) for v in mn]
            out["max_v"] += [None if v is None else float(v) for v in mx]
            out["sum_v"] += [None if v is None else float(v) for v in sm]
        return pa.table({
            "key": pa.array(out["key"]),
            "column": pa.array(out["column"], pa.string()),
            "cnt": pa.array(out["cnt"], pa.int64()),
            "null_count": pa.array(out["null_count"], pa.int64()),
            "min_v": pa.array(out["min_v"], pa.float64()),
            "max_v": pa.array(out["max_v"], pa.float64()),
            "sum_v": pa.array(out["sum_v"], pa.float64()),
        })


def grouped_stats(ds, key: str, columns: list[str],
                  batch_size: int | None = 65536,
                  cents_sums: bool = False) -> pa.Table:
    """Per-group column statistics (count / nulls / min / max / sum) —
    GROUP BY with algebraic combiners.  Per-batch partials bounded by
    groups × columns per block, merged on the driver (the measured ~1 s
    fixed groupby-shuffle floor loses to a driver merge for
    small-cardinality keys; swap the merge for ``groupby(key, column)``
    when group cardinality approaches block counts).  Returns a long
    pyarrow Table (key, column, cnt, null_count, min_v, max_v, sum_v).
    ``cents_sums=True`` makes sum_v an exact int64 SUM(ROUND(x*100))
    (order-independent — required for hash-compared money sums)."""
    partials = ds.map_batches(_GroupedStatsPartial(key, tuple(columns),
                                                   cents=cents_sums),
                              batch_format="pyarrow", batch_size=batch_size)
    # cents partials ride the shared float64 sum_v column (exact: one
    # batch's cents sum is far below 2^53), but the DRIVER accumulates
    # them as Python ints so the grand total stays exact past 2^53
    # where float addition would re-introduce layout sensitivity
    conv = (lambda v: int(v)) if cents_sums else (lambda v: v)
    zero = 0 if cents_sums else 0.0
    acc: dict = {}
    for r in partials.iter_rows():
        k = (r["key"], r["column"])
        cur = acc.get(k)
        if cur is None:
            acc[k] = [r["cnt"], r["null_count"], r["min_v"], r["max_v"],
                      None if r["sum_v"] is None else conv(r["sum_v"])]
        else:
            cur[0] += r["cnt"]
            cur[1] += r["null_count"]
            for i, (f, v) in enumerate(((min, r["min_v"]), (max, r["max_v"]))):
                if v is not None:
                    cur[2 + i] = v if cur[2 + i] is None else f(cur[2 + i], v)
            if r["sum_v"] is not None:
                cur[4] = (cur[4] if cur[4] is not None else zero) \
                    + conv(r["sum_v"])
    ks = sorted(acc, key=lambda k: (str(k[0]), k[1]))
    sum_vals = [acc[k][4] for k in ks]
    if cents_sums:
        sum_arr = pa.array([None if v is None else int(v)
                            for v in sum_vals], pa.int64())
    else:
        sum_arr = pa.array(sum_vals, pa.float64())
    return pa.table({
        "key": pa.array([k[0] for k in ks]),
        "column": pa.array([k[1] for k in ks], pa.string()),
        "cnt": pa.array([acc[k][0] for k in ks], pa.int64()),
        "null_count": pa.array([acc[k][1] for k in ks], pa.int64()),
        "min_v": pa.array([acc[k][2] for k in ks], pa.float64()),
        "max_v": pa.array([acc[k][3] for k in ks], pa.float64()),
        "sum_v": sum_arr,
    })


def numeric_histogram(ds, column: str, bin_width: float,
                      batch_size: int | None = 65536) -> pa.Table:
    """Fixed-width binned histogram over a numeric column
    (``bin = floor(value / bin_width)``, nulls skipped) — the numeric
    sibling of the categorical histogram and the cheap whole-corpus
    distribution profile.  Per-batch ``np.unique`` bincount partials,
    driver merge bounded by blocks × occupied bins; no shuffle."""

    def _part(t: pa.Table) -> pa.Table:
        col = t.column(column).combine_chunks().drop_null()
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.floor(v / bin_width).astype(np.int64)
        uniq, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    acc: dict[int, int] = {}
    for r in partials.iter_rows():
        acc[r["bin"]] = acc.get(r["bin"], 0) + r["cnt"]
    bins = sorted(acc)
    return pa.table({"bin": pa.array(bins, pa.int64()),
                     "cnt": pa.array([acc[b] for b in bins], pa.int64())})


def zscore_outliers(ds, column: str, id_col: str, threshold: float = 3.0,
                    batch_size: int | None = 65536):
    """Rows whose ``column`` deviates more than ``threshold`` population
    standard deviations from the corpus mean — the classic two-pass
    distributed pattern: (1) per-batch (cnt, sum, sum²) partials reduce
    to global mean/std on the driver; (2) the two scalars broadcast
    into a vectorized filter pass.  The input streams twice, shuffles
    never.  Returns a Dataset of (id_col, column) outlier rows."""

    def _moments(t: pa.Table) -> pa.Table:
        v = (t.column(column).combine_chunks().drop_null()
             .to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "s": pa.array([float(v.sum())], pa.float64()),
                         "s2": pa.array([float((v * v).sum())], pa.float64())})

    tot = (ds.map_batches(_moments, batch_format="pyarrow",
                          batch_size=batch_size).sum(["n", "s", "s2"]))
    # Dataset.sum returns None (not a dict) when every block is empty
    if tot is None:
        tot = {"sum(n)": 0, "sum(s)": 0.0, "sum(s2)": 0.0}
    n, s, s2 = tot["sum(n)"], tot["sum(s)"], tot["sum(s2)"]
    if not n:
        return ds.limit(0).map_batches(
            lambda t: t.select([id_col, column]), batch_format="pyarrow")
    mean = s / n
    var = max(s2 / n - mean * mean, 0.0)
    sd = var ** 0.5 or 1.0

    def _flag(t: pa.Table) -> pa.Table:
        col = t.column(column).combine_chunks()
        z = pc.divide(pc.abs(pc.subtract(col.cast(pa.float64()), mean)), sd)
        keep = pc.and_(pc.greater(z, threshold), pc.is_valid(col))
        return t.filter(keep).select([id_col, column])

    return ds.map_batches(_flag, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# exact quantiles for low-cardinality columns (value-count partials)
# ---------------------------------------------------------------------------


def exact_quantiles(ds, columns: list[str], qs=(0.25, 0.5, 0.9, 0.99),
                    batch_size: int | None = 65536,
                    max_distinct: int = 100_000) -> pa.Table:
    """EXACT percentile_disc per column — the exactness complement to
    the KLL sketch: per-batch ``value_counts`` partials (bounded by the
    per-block distinct count) merge on the driver into one value→count
    map; quantile q = the value at cumulative rank ceil(n*q) (SQL
    percentile_disc / DuckDB quantile_disc semantics).

    Designed for LOW-CARDINALITY numerics (enum-like measures,
    quantized scores, small-domain ints): driver memory is
    O(distinct values), NOT O(rows).  Raises when distinct exceeds
    ``max_distinct`` — use stats.column_stats' KLL sketch for
    continuous columns instead (no silent fallback)."""
    cols = list(columns)

    def _part(t: pa.Table) -> pa.Table:
        names, vals, cnts = [], [], []
        for c in cols:
            vc = pc.value_counts(t.column(c).combine_chunks().drop_null())
            v = vc.field("values").cast(pa.float64())
            n = vc.field("counts").cast(pa.int64())
            names.extend([c] * len(v))
            vals.append(v)
            cnts.append(n)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "value": pa.concat_arrays(vals) if vals else pa.array([], pa.float64()),
            "cnt": pa.concat_arrays(cnts) if cnts else pa.array([], pa.int64()),
        })

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    merged = (pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema([("column", pa.string()), ("value", pa.float64()),
                          ("cnt", pa.int64())]))
        .group_by(["column", "value"]).aggregate([("cnt", "sum")]))
    out_c, out_q, out_v = [], [], []
    for c in cols:
        sub = merged.filter(pc.equal(merged.column("column"), c))
        if sub.num_rows > max_distinct:
            raise ValueError(
                f"exact_quantiles: column {c!r} has {sub.num_rows} distinct "
                f"values (> max_distinct={max_distinct}); use the KLL sketch")
        v = sub.column("value").to_numpy(zero_copy_only=False)
        n = sub.column("cnt_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1]) if len(cum) else 0
        for q in qs:
            if total == 0:
                continue
            rank = max(1, int(np.ceil(total * q)))
            idx = int(np.searchsorted(cum, rank))
            out_c.append(c)
            out_q.append(float(q))
            out_v.append(float(v[idx]))
    return pa.table({"column": pa.array(out_c, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


# ---------------------------------------------------------------------------
# rollup aggregation (multi-level grouping sets)
# ---------------------------------------------------------------------------


def rollup_counts(ds, key1: str, key2: str, value_col: str,
                  batch_size: int | None = 65536,
                  cube: bool = False) -> pa.Table:
    """GROUP BY ROLLUP(key1, key2) over count + sum(value): the
    (k1, k2), (k1, ALL) and (ALL, ALL) levels in ONE input pass.

    Shape: per-batch partials at the FINEST level only (bounded by the
    key-combination count per block); the driver merges them and
    derives the coarser levels from the merged finest table — exactly
    consistent across levels by construction, no second scan, no
    shuffle.  Keys are rendered as strings with 'ALL' markers (nulls
    render as 'NULL', disambiguated from the rollup marker the way
    SQL's GROUPING() is)."""

    def _key_str(col: pa.ChunkedArray) -> pa.Array:
        s = col.combine_chunks().cast(pa.string())
        return pc.coalesce(s, pa.scalar("NULL", pa.string()))

    def _part(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "k1": _key_str(t.column(key1)),
            "k2": _key_str(t.column(key2)),
            "v": t.column(value_col).combine_chunks().cast(pa.float64()),
        })
        g = tt.group_by(["k1", "k2"]).aggregate([("v", "count"), ("v", "sum")])
        return g.rename_columns(["k1", "k2", "cnt", "sum_v"])

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    finest = (pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema([("k1", pa.string()), ("k2", pa.string()),
                          ("cnt", pa.int64()), ("sum_v", pa.float64())]))
        .group_by(["k1", "k2"]).aggregate([("cnt", "sum"), ("sum_v", "sum")])
        .rename_columns(["k1", "k2", "cnt", "sum_v"]))

    def _level(t: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = (t.group_by(keys).aggregate([("cnt", "sum"), ("sum_v", "sum")])
                 .rename_columns(keys + ["cnt", "sum_v"]))
        else:
            g = pa.table({
                "cnt": pa.array([pc.sum(t.column("cnt")).as_py() or 0], pa.int64()),
                "sum_v": pa.array([pc.sum(t.column("sum_v")).as_py() or 0.0],
                                  pa.float64()),
            })
        n = g.num_rows
        all_col = pa.array(["ALL"] * n, pa.string())
        if "k1" not in keys:
            g = g.add_column(0, "k1", all_col)
        if "k2" not in keys:
            g = g.add_column(1, "k2", all_col)
        return g.select(["k1", "k2", "cnt", "sum_v"])

    levels = [_level(finest, ["k1", "k2"]), _level(finest, ["k1"])]
    if cube:
        levels.append(_level(finest, ["k2"]))
    levels.append(_level(finest, []))
    return pa.concat_tables(levels)


def cube_counts(ds, key1: str, key2: str, value_col: str,
                batch_size: int | None = 65536) -> pa.Table:
    """GROUP BY CUBE(key1, key2): all four aggregation levels from the
    same single pass — rollup plus the (ALL, k2) margin, all derived
    from the one merged finest-level table."""
    return rollup_counts(ds, key1, key2, value_col, batch_size=batch_size,
                         cube=True)


# ---------------------------------------------------------------------------
# pivot (categorical column -> wide counts)
# ---------------------------------------------------------------------------


def unnest_list(ds, list_col: str, id_cols: list[str],
                value_name: str = "value", idx_name: str = "idx",
                batch_size: int | None = 8192):
    """Explode a list column to (id_cols…, idx, value) rows — SQL
    ``unnest(...) WITH ORDINALITY`` (idx 1-based).  Pure streaming
    per-batch reshape, fully vectorized: one ``list_flatten`` +
    ``np.repeat`` of the id columns; null lists contribute no rows,
    null ELEMENTS survive as null values."""

    def _explode(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col)
        sub = t.filter(valid)
        col = sub.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = int(counts.sum())
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.arange(total, dtype=np.int64) - starts + 1
        out = {}
        for c in id_cols:
            ids = sub.column(c).combine_chunks()
            out[c] = ids.take(pa.array(
                np.repeat(np.arange(len(counts), dtype=np.int64), counts)))
        out[idx_name] = pa.array(idx)
        out[value_name] = pc.list_flatten(col)
        return pa.table(out)

    return ds.map_batches(_explode, batch_format="pyarrow",
                          batch_size=batch_size)


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            name_col: str = "name", value_col: str = "value",
            value_type: pa.DataType = pa.float64(),
            batch_size: int | None = 65536):
    """Melt wide columns to (id_cols..., name, value) long rows — the
    inverse of pivot.  Pure per-batch reshape (each input row emits
    len(value_cols) rows inside its own block), streaming, no
    shuffle."""

    def _melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for c in value_cols:
            cols = {ic: t.column(ic) for ic in id_cols}
            cols[name_col] = pa.array([c] * n, pa.string())
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[value_col] = col.cast(value_type)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(_melt, batch_format="pyarrow",
                          batch_size=batch_size)


def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str],
                 batch_size: int | None = 65536) -> pa.Table:
    """Wide pivot: one row per ``row_key``, one count column per value
    of ``col_key`` (``cnt_<value>``) — the FILTER(WHERE ...) aggregate
    shape.  ``col_values`` is explicit so the output schema is fixed
    and deterministic regardless of which blocks see which categories
    (a discovered schema would vary across runs and break downstream
    consumers); values outside the list are counted in ``cnt_other``.

    Shape: per-batch (row, col) count partials — bounded by
    |rows|x|cols| per block — merged on the driver and pivoted there
    (the wide result is small by construction)."""
    vals = list(col_values)

    def _part(t: pa.Table) -> pa.Table:
        null = pa.scalar("NULL", pa.string())
        tt = pa.table({
            "r": pc.coalesce(
                t.column(row_key).combine_chunks().cast(pa.string()), null),
            "c": pc.coalesce(
                t.column(col_key).combine_chunks().cast(pa.string()), null),
        })
        g = tt.group_by(["r", "c"]).aggregate([([], "count_all")])
        return g.rename_columns(["r", "c", "cnt"])

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    merged = (pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema([("r", pa.string()), ("c", pa.string()),
                          ("cnt", pa.int64())]))
        .group_by(["r", "c"]).aggregate([("cnt", "sum")])
        .rename_columns(["r", "c", "cnt"]))
    r = merged.column("r").to_numpy(zero_copy_only=False)
    c = merged.column("c").to_numpy(zero_copy_only=False)
    n = merged.column("cnt").to_numpy(zero_copy_only=False)
    rows = sorted(set(r.tolist()))
    row_idx = {x: i for i, x in enumerate(rows)}
    col_idx = {x: i for i, x in enumerate(vals)}
    wide = np.zeros((len(rows), len(vals) + 1), np.int64)
    for ri, ci, cnt in zip(r, c, n):
        wide[row_idx[ri], col_idx.get(ci, len(vals))] += cnt
    out = {row_key: pa.array(rows, pa.string())}
    for j, v in enumerate(vals):
        out[f"cnt_{v}"] = pa.array(wide[:, j])
    out["cnt_other"] = pa.array(wide[:, len(vals)])
    return pa.table(out)


# ---------------------------------------------------------------------------
# exact per-group distinct counts (COUNT(DISTINCT v) GROUP BY k)
# ---------------------------------------------------------------------------


def grouped_distinct_count(ds, key: str, val: str, n_buckets: int = 64,
                           batch_size: int | None = 65536) -> pa.Table:
    """Exact NDV per group — the COUNT(DISTINCT) complement to the HLL
    sketch.  Three-phase, one exchange:

    1. per-batch distinct (key, val) pairs (within-block dedupe before
       anything moves);
    2. ONE hash-bucketed exchange keyed on hash(key || val) — both
       occurrences of a pair land in the same bucket, so a per-bucket
       dedupe is globally exact; each bucket emits (key, partial_count);
    3. driver merge of the partials — bounded by buckets x distinct
       keys, never by distinct values.

    Nulls in ``val`` are not counted (COUNT(DISTINCT) semantics); null
    keys group under the null key like SQL GROUP BY."""
    from peri_ray.stages.checks import bucket_of

    SEP = "\x1f"

    def _pairs(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "k": t.column(key).combine_chunks().cast(pa.string()),
            "v": t.column(val).combine_chunks().cast(pa.string()),
        }).filter(pc.is_valid(t.column(val).combine_chunks()))
        d = tt.group_by(["k", "v"]).aggregate([])
        pair_key = pc.binary_join_element_wise(
            pc.coalesce(d.column("k"), pa.scalar("\x00", pa.string())),
            d.column("v"), SEP)
        return d.append_column("bucket", bucket_of(pair_key, n_buckets))

    partials = ds.map_batches(_pairs, batch_format="pyarrow",
                              batch_size=batch_size)

    def _bucket_ndv(group: pa.Table) -> pa.Table:
        d = group.select(["k", "v"]).group_by(["k", "v"]).aggregate([])
        g = d.group_by("k").aggregate([([], "count_all")])
        return g.rename_columns(["k", "n"])

    per_bucket = partials.groupby("bucket").map_groups(
        _bucket_ndv, batch_format="pyarrow")
    merged = (pa.Table.from_pylist(
        per_bucket.take_all(),
        schema=pa.schema([("k", pa.string()), ("n", pa.int64())]))
        .group_by("k").aggregate([("n", "sum")]))
    return merged.rename_columns([key, "ndv"]).set_column(
        1, "ndv", merged.column("n_sum").cast(pa.int64()))


def grouped_exact_quantiles(ds, key: str, column: str,
                            qs=(0.5, 0.9), batch_size: int | None = 65536,
                            max_distinct: int = 100_000) -> pa.Table:
    """EXACT percentile_disc per group — GROUP BY + quantile without a
    sort shuffle: per-batch (key, value, cnt) value-count partials
    (bounded by per-block keys x distinct values), driver merge, then
    per-group cumulative-rank lookup at ceil(n*q).

    Same low-cardinality contract as :func:`exact_quantiles` (raises
    past ``max_distinct`` total merged rows); null values excluded,
    null keys group like SQL GROUP BY."""

    def _part(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "k": t.column(key).combine_chunks().cast(pa.string()),
            "value": t.column(column).combine_chunks().cast(pa.float64()),
        }).filter(pc.is_valid(t.column(column).combine_chunks()))
        g = tt.group_by(["k", "value"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "value", "cnt"])

    merged = (pa.Table.from_pylist(
        ds.map_batches(_part, batch_format="pyarrow",
                       batch_size=batch_size).take_all(),
        schema=pa.schema([("k", pa.string()), ("value", pa.float64()),
                          ("cnt", pa.int64())]))
        .group_by(["k", "value"]).aggregate([("cnt", "sum")]))
    if merged.num_rows > max_distinct:
        raise ValueError(
            f"grouped_exact_quantiles: {merged.num_rows} distinct "
            f"(key, value) rows (> max_distinct={max_distinct}); "
            "use the KLL sketch")
    # dictionary-encode the key so a NULL key sorts as its own group
    # (np.lexsort on an object array with None raises TypeError; SQL
    # GROUP BY keeps the null group, and so do we)
    enc = pc.dictionary_encode(merged.column("k").combine_chunks())
    codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
    dictionary = enc.dictionary.to_pylist()
    v = merged.column("value").to_numpy(zero_copy_only=False)
    n = merged.column("cnt_sum").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, codes))
    k_codes, v, n = codes[order], v[order], n[order]
    k = np.array([None if c < 0 else dictionary[c] for c in k_codes],
                 object)
    starts = np.flatnonzero(np.concatenate(
        ([True], k_codes[1:] != k_codes[:-1]))) if len(k) else \
        np.array([], np.int64)
    ends = np.append(starts[1:], len(k))
    out_k, out_q, out_v = [], [], []
    for s, e in zip(starts, ends):
        cum = np.cumsum(n[s:e])
        total = int(cum[-1])
        for q in qs:
            rank = max(1, int(np.ceil(total * q)))
            out_k.append(k[s])
            out_q.append(float(q))
            out_v.append(float(v[s + int(np.searchsorted(cum, rank))]))
    return pa.table({key: pa.array(out_k, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def ntile_per_group(ds, key: str, order_col: str, id_col: str,
                    n_tiles: int = 4):
    """SQL NTILE(n) OVER (PARTITION BY key ORDER BY order_col, id):
    one row per input row with its 1-based tile.  The id tiebreak makes
    tile assignment deterministic under equal order values (NTILE is
    position-based, so an unordered tie would be engine-dependent).

    SQL semantics exactly: with c rows and n tiles, the first c % n
    tiles get ceil(c/n) rows, the rest floor(c/n).  One
    ``groupby(key)`` exchange; per group one lexsort + closed-form
    position->tile arithmetic (no loops)."""

    def _tile(group: pa.Table) -> pa.Table:
        g = group.filter(pc.and_(
            pc.is_valid(group.column(order_col)),
            pc.is_valid(group.column(key))))
        k = g.column(key).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = g.column(order_col).combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(k) == 0:
            return pa.schema([(id_col, pa.int64()), (key, pa.int64()),
                              ("tile", pa.int64())]).empty_table()
        order = np.lexsort((ids, v, k))
        k, ids = k[order], ids[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        counts = np.diff(np.append(starts, len(k)))
        c = np.repeat(counts, counts)
        pos = np.arange(len(k), dtype=np.int64) - np.repeat(starts, counts)
        small = c // n_tiles
        extra = c % n_tiles
        boundary = extra * (small + 1)
        in_big = pos < boundary
        # small can be 0 when c < n_tiles: every row its own tile and
        # pos < boundary always holds there, so the small branch never
        # divides by zero on real rows
        tile = np.where(in_big, pos // np.maximum(small + 1, 1),
                        extra + (pos - boundary) // np.maximum(small, 1))
        return pa.table({id_col: pa.array(ids),
                         key: pa.array(k),
                         "tile": pa.array(tile + 1)})

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([key, order_col, id_col]), [key], _tile)


def rank_per_group(ds, key: str, order_col: str, id_col: str,
                   method: str = "rank", descending: bool = False):
    """SQL rank() / dense_rank() OVER (PARTITION BY key ORDER BY
    order_col): one row per input row with its rank.  Unlike
    row_number, ties SHARE a rank, so the result is deterministic
    without an id tiebreak — ``id_col`` is only carried through for
    row identity.

    ``method``: "rank" (gaps after ties), "dense_rank" (no gaps),
    "percent_rank" ((rank-1)/(n-1), DOUBLE) or "cume_dist"
    (rows-at-or-below / n, DOUBLE) — the float variants use the exact
    division the SQL window functions use, so values hash-match.
    One fixed-bucket exchange; per group one lexsort + vectorized
    first-of-tie-run positions."""
    if method not in ("rank", "dense_rank", "percent_rank", "cume_dist"):
        raise ValueError(
            "method must be rank | dense_rank | percent_rank | cume_dist")

    def _rank(group: pa.Table) -> pa.Table:
        g = group.filter(pc.and_(
            pc.is_valid(group.column(order_col)),
            pc.is_valid(group.column(key))))
        k = g.column(key).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = g.column(order_col).combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        is_float = method in ("percent_rank", "cume_dist")
        if len(k) == 0:
            return pa.schema([
                (id_col, pa.int64()), (key, pa.int64()),
                ("rnk", pa.float64() if is_float else pa.int64()),
            ]).empty_table()
        vv = -v if descending else v
        order = np.lexsort((vv, k))
        k, v_s, ids = k[order], vv[order], ids[order]
        gstart = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(gstart)
        counts = np.diff(np.append(starts, len(k)))
        new_val = gstart | np.concatenate(([False], v_s[1:] != v_s[:-1]))
        n_in_g = np.repeat(counts, counts)
        if method == "dense_rank":
            # dense rank = number of distinct values seen so far in group
            cum_new = np.cumsum(new_val)
            base = np.repeat(cum_new[starts] - 1, counts)
            rnk = cum_new - base
        else:
            # tie-run geometry shared by rank / percent_rank / cume_dist;
            # absolute indices so nothing carries across group boundaries
            run_starts = np.flatnonzero(new_val)
            run_lens = np.diff(np.append(run_starts, len(k)))
            rank1 = (np.repeat(run_starts, run_lens)
                     - np.repeat(starts, counts) + 1)
            if method == "rank":
                rnk = rank1
            elif method == "percent_rank":
                rnk = np.where(n_in_g > 1,
                               (rank1 - 1) / np.maximum(n_in_g - 1, 1), 0.0)
            else:  # cume_dist: rows with value <= current, over n
                run_end = np.repeat(run_starts + run_lens, run_lens)
                at_or_below = run_end - np.repeat(starts, counts)
                rnk = at_or_below / n_in_g
        out_rnk = (pa.array(rnk.astype(np.float64))
                   if is_float else pa.array(rnk.astype(np.int64)))
        return pa.table({id_col: pa.array(ids),
                         key: pa.array(k),
                         "rnk": out_rnk})

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([key, order_col, id_col]), [key], _rank)


def collect_sorted(ds, key: str, value_col: str, ts_col: str, id_col: str,
                   sep: str = ","):
    """SQL ``string_agg(value, sep ORDER BY ts, id)`` per key — ordered
    event-sequence assembly (session traces, path analysis).  The id
    tiebreak makes the concatenation deterministic under equal
    timestamps.  One fixed-bucket exchange (key cardinality unbounded
    at scale); per group one lexsort + per-segment joins."""

    def _agg(group: pa.Table) -> pa.Table:
        g = group.filter(pc.and_(
            pc.is_valid(group.column(value_col)),
            pc.and_(pc.is_valid(group.column(ts_col)),
                    pc.is_valid(group.column(key)))))
        k = g.column(key).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        vals = g.column(value_col).combine_chunks().cast(pa.string())
        if len(k) == 0:
            return pa.schema([(key, pa.int64()),
                              ("seq", pa.string())]).empty_table()
        order = np.lexsort((ids, ts, k))
        k, v = k[order], np.asarray(vals.to_pylist(), object)[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.append(starts[1:], len(k))
        return pa.table({
            key: pa.array(k[starts]),
            "seq": pa.array([sep.join(v[s:e]) for s, e in zip(starts, ends)],
                            pa.string()),
        })

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([key, value_col, ts_col, id_col]), [key], _agg)


def _bracket_collect(ds, column: str, qs, kll_k: int,
                     batch_size: int | None, max_collect: int,
                     caller: str):
    """Shared two-pass KLL-guided selection front end: (1) sketch the
    column and bracket each target quantile with the padded rank-error
    window; (2) one exact pass counts values strictly below each
    bracket and collects the in-bracket values.  Returns
    ``(n, below_tot, vals)`` — ``None`` for an empty column.  Raises
    (named after ``caller``) when a bracket overflows ``max_collect``;
    the eps padding (max(8/kll_k, 1e-4), >10× the measured KLL rank
    error) is calibrated ONCE here for every rank-selection caller."""
    import pickle

    from peri_ray.state.sketches import KLL

    def _sketch(t: pa.Table) -> pa.Table:
        v = (t.column(column).combine_chunks().drop_null()
             .cast(pa.float64()).to_numpy(zero_copy_only=False))
        k = KLL(kll_k)
        k.update_many(v)
        return pa.table({"s": pa.array([pickle.dumps(k)], pa.binary())})

    merged = KLL(kll_k)
    for r in ds.map_batches(_sketch, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        merged.merge(pickle.loads(r["s"]))
    n = merged.n
    if n == 0:
        return None
    eps = max(8.0 / kll_k, 1e-4)
    brackets = [(float(merged.quantile(max(0.0, q - eps))),
                 float(merged.quantile(min(1.0, q + eps)))) for q in qs]
    los = np.array([b[0] for b in brackets])

    def _pass2(t: pa.Table) -> pa.Table:
        v = (t.column(column).combine_chunks().drop_null()
             .cast(pa.float64()).to_numpy(zero_copy_only=False))
        below = np.array([(v < lo).sum() for lo in los], np.int64)
        collected = [v[(v >= lo) & (v <= hi)] for lo, hi in brackets]
        return pa.table({
            "bi": pa.array(np.arange(len(brackets), dtype=np.int64)),
            "below": pa.array(below),
            "vals": pa.array([c.tolist() for c in collected],
                             pa.list_(pa.float64())),
        })

    rows = ds.map_batches(_pass2, batch_format="pyarrow",
                          batch_size=batch_size).take_all()
    below_tot = np.zeros(len(brackets), np.int64)
    vals: list[list[float]] = [[] for _ in brackets]
    for r in rows:
        below_tot[r["bi"]] += r["below"]
        vals[r["bi"]].extend(r["vals"])
        if len(vals[r["bi"]]) > max_collect:
            raise ValueError(
                f"{caller}: bracket {r['bi']} collected "
                f"> {max_collect} values; raise kll_k")
    return n, below_tot, vals


def exact_quantile_continuous(ds, column: str, qs=(0.5,),
                              kll_k: int = 800,
                              batch_size: int | None = 65536,
                              max_collect: int = 2_000_000) -> pa.Table:
    """EXACT percentile_disc for CONTINUOUS columns — the case the
    value-count path refuses (distinct ~ rows).  Distributed selection
    in two passes:

    1. a KLL sketch pass brackets each target rank: [v_lo, v_hi] such
       that the true q-quantile lies inside (sketch rank error pads the
       bracket);
    2. one exact pass counts values strictly below v_lo and collects
       the values inside the bracket (~2 * eps * n of them; eps = 8/k
       pads the measured KLL rank error >10x, ~2% of n at the default
       k — raise ``kll_k`` to shrink the bracket for huge inputs); the
       answer is the (rank - below)-th order statistic of the
       collected values.

    Raises if a bracket would collect more than ``max_collect`` values
    (sketch failed its error bound or qs too dense) — never silently
    approximates."""
    got = _bracket_collect(ds, column, qs, kll_k, batch_size, max_collect,
                           "exact_quantile_continuous")
    if got is None:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    n, below_tot, vals = got
    out_q, out_v = [], []
    for i, q in enumerate(qs):
        rank = max(1, int(np.ceil(n * q)))  # percentile_disc rank
        idx = rank - int(below_tot[i]) - 1
        arr = np.sort(np.asarray(vals[i]))
        if idx < 0 or idx >= len(arr):
            raise ValueError(
                f"exact_quantile_continuous: rank {rank} fell outside the "
                f"bracket for q={q} (below={below_tot[i]}, "
                f"collected={len(arr)}); raise kll_k")
        out_q.append(float(q))
        out_v.append(float(arr[idx]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def percentile_cont_continuous(ds, column: str, qs=(0.5,),
                               kll_k: int = 800,
                               batch_size: int | None = 65536,
                               max_collect: int = 2_000_000) -> pa.Table:
    """Interpolated percentile_cont for continuous columns — the same
    KLL-guided two-pass selection as :func:`exact_quantile_continuous`,
    but selecting BOTH bracketing order statistics of the fractional
    rank ``RN = (n-1)·q`` and interpolating with SQL's exact formula
    ``v[⌊RN⌋]·(⌈RN⌉−RN) + v[⌈RN⌉]·(RN−⌊RN⌋)`` (the multiply-by-weights
    form DuckDB's quantile_cont evaluates, NOT the algebraically-equal
    ``lo + (hi−lo)·frac`` — the two round differently in the last ulp
    and the verdict is hash-compared)."""
    import math

    got = _bracket_collect(ds, column, qs, kll_k, batch_size, max_collect,
                           "percentile_cont_continuous")
    if got is None:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    n, below_tot, vals = got
    out_q, out_v = [], []
    for i, q in enumerate(qs):
        rn = (n - 1) * float(q)
        frn, crn = math.floor(rn), math.ceil(rn)
        arr = np.sort(np.asarray(vals[i]))
        below = int(below_tot[i])
        idx_lo, idx_hi = frn - below, crn - below
        if idx_lo < 0 or idx_hi >= len(arr):
            raise ValueError(
                f"percentile_cont_continuous: ranks ({frn}, {crn}) fell "
                f"outside the bracket for q={q} (below={below}, "
                f"collected={len(arr)}); raise kll_k")
        if crn == frn:
            v = float(arr[idx_lo])
        else:
            v = float(arr[idx_lo]) * (crn - rn) + float(arr[idx_hi]) * (rn - frn)
        out_q.append(float(q))
        out_v.append(v)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def mad_outliers(ds, column: str, id_col: str, k: float = 3.0,
                 kll_k: int = 800, batch_size: int | None = 65536):
    """Robust outlier flagging by median absolute deviation — the
    z-score check's heavy-tail-safe complement (mean/std are themselves
    dragged by the outliers they hunt; median/MAD are not).

    Three streaming passes, all exact: (1) median via KLL-guided
    selection; (2) MAD = median of |v - med| the same way over a
    derived column; (3) broadcast (med, MAD) into a vectorized filter.
    """

    med_t = exact_quantile_continuous(ds, column, qs=(0.5,), kll_k=kll_k,
                                      batch_size=batch_size)
    med = med_t.column("value")[0].as_py()

    def _dev(t: pa.Table) -> pa.Table:
        v = t.column(column).combine_chunks().cast(pa.float64())
        return pa.table({column: pc.abs(pc.subtract(v, pa.scalar(med)))})

    dev = ds.map_batches(_dev, batch_format="pyarrow", batch_size=batch_size)
    mad = exact_quantile_continuous(dev, column, qs=(0.5,), kll_k=kll_k,
                                    batch_size=batch_size).column(
        "value")[0].as_py()

    def _flag(t: pa.Table) -> pa.Table:
        v = t.column(column).combine_chunks().cast(pa.float64())
        keep = pc.and_(pc.is_valid(v),
                       pc.greater(pc.abs(pc.subtract(v, pa.scalar(med))),
                                  pa.scalar(k * mad)))
        return t.filter(keep).select([id_col, column])

    return ds.map_batches(_flag, batch_format="pyarrow",
                          batch_size=batch_size)


def budget_subset_ids(ds, weight_col: str, id_col: str, budget: int,
                      batch_size: int | None = 65536,
                      max_distinct: int = 100_000,
                      max_ties: int = 5_000_000):
    """Greedy budget selection WITHOUT a global sort: the ids of the
    rows a cumulative scan in (weight DESC, id ASC) order would keep
    while the running weight total stays ≤ ``budget`` — "take the
    largest/highest-quality docs until the token budget is full".

    A global ``ds.sort`` + running sum is the naive all-to-all route;
    instead (1) one pass reduces to per-WEIGHT-VALUE (count, Σweight)
    partials — bounded by the distinct-weight cardinality, the same
    contract as :func:`exact_quantiles` (raises above ``max_distinct``,
    never degrades silently); (2) the driver scans the ≤max_distinct
    values descending to find the cutoff value and how many of its
    ties fit; (3) the boundary ties resolve with a distributed
    smallest-m-ids selection (per-block partial top-m, m ≤ the tie
    count that fits); (4) one vectorized filter pass emits the ids.
    Integer weights only — float cumsums are association-order
    dependent across engines."""
    cols = [id_col, weight_col]

    def _vc(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).combine_chunks().drop_null()
        vc = pc.value_counts(w)
        v = vc.field("values").cast(pa.int64())
        n = vc.field("counts").cast(pa.int64())
        return pa.table({"v": v, "n": n})

    merged = (pa.Table.from_pylist(
        ds.map_batches(_vc, batch_format="pyarrow",
                       batch_size=batch_size).take_all(),
        schema=pa.schema([("v", pa.int64()), ("n", pa.int64())]))
        .group_by("v").aggregate([("n", "sum")]))
    if merged.num_rows > max_distinct:
        raise ValueError(
            f"budget_subset_ids: {merged.num_rows} distinct weights "
            f"(> max_distinct={max_distinct}); bucket the weight first")
    v = merged.column("v").to_numpy(zero_copy_only=False)
    n = merged.column("n_sum").to_numpy(zero_copy_only=False)
    if len(v) and int(v.min()) < 0:
        raise ValueError("budget_subset_ids: negative weights are not a "
                         "greedy order (shift them non-negative first)")
    order = np.argsort(-v)
    v, n = v[order], n[order]
    totals = v * n
    cum = np.cumsum(totals)
    # values fully inside the budget
    full = int(np.searchsorted(cum, budget, side="right"))
    spent = int(cum[full - 1]) if full else 0
    cutoff = None
    m_ties = 0
    if full < len(v):
        # v[full] > 0 always: zero-weight entries add nothing to the
        # cumsum, so searchsorted counts them inside `full` whenever
        # the positive weights fit (and they never fit otherwise)
        cutoff = int(v[full])
        m_ties = int((budget - spent) // cutoff)
    lo_value = int(v[full - 1]) if full else None

    want_ties = cutoff is not None and m_ties > 0
    if want_ties and m_ties > max_ties:
        raise ValueError(
            f"budget_subset_ids: {m_ties} boundary ties exceed "
            f"max_ties={max_ties}; raise max_ties knowingly")

    def _select(t: pa.Table) -> pa.Table:
        """ONE output scan: fully-kept ids (tie=false) plus per-block
        partial smallest-m tie-candidate ids (tie=true)."""
        w = t.column(weight_col).combine_chunks()
        keep = pc.greater_equal(w, lo_value) if lo_value is not None else \
            pa.array(np.zeros(t.num_rows, bool))
        kept_ids = (t.filter(pc.fill_null(keep, False))
                    .column(id_col).combine_chunks())
        parts = [pa.table({id_col: kept_ids,
                           "__tie": pa.array(
                               np.zeros(len(kept_ids), bool))})]
        if want_ties:
            ties = (t.filter(pc.fill_null(pc.equal(w, cutoff), False))
                    .column(id_col).combine_chunks())
            if len(ties) > m_ties:  # per-block partial: smallest m ids
                idx = pc.array_sort_indices(ties)
                ties = ties.take(idx.slice(0, m_ties))
            parts.append(pa.table({id_col: ties,
                                   "__tie": pa.array(
                                       np.ones(len(ties), bool))}))
        return pa.concat_tables(parts)

    # materialize: the id table is bounded by the selection size, and
    # both consumers (kept, ties) would otherwise re-run the input scan
    selected = ds.map_batches(_select, batch_format="pyarrow",
                              batch_size=batch_size).materialize()
    def _split(tie: bool):
        def _f(t: pa.Table) -> pa.Table:
            m = t.column("__tie").combine_chunks()
            mask = m if tie else pc.invert(m)
            return t.filter(mask).select([id_col])
        return _f

    kept = selected.map_batches(_split(False), batch_format="pyarrow")
    if not want_ties:
        return kept
    tie_ids = (selected.map_batches(_split(True), batch_format="pyarrow")
               .sort(id_col).limit(m_ties))
    return kept.union(tie_ids)


def weighted_sample(ds, weight_col: str, id_col: str, k: int,
                    seed: int = 1234,
                    batch_size: int | None = 65536) -> pa.Table:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws u from a seeded hash of its id and
    competes with key ln(u)/w — the k LARGEST keys win, giving
    inclusion probability proportional to weight, exactly
    reproducible at any block layout (no RNG state crosses tasks).

    Distributed as per-block top-k partials (only k candidate rows
    per block leave the map side) + a driver merge bounded by
    k × blocks.  Rows with null/non-positive weight are excluded.
    Ties (identical keys — only possible via id collisions) break by
    smaller id."""
    from peri_ray.state.sketches import hash_strings

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks()
        w = t.column(weight_col).combine_chunks().cast(pa.float64())
        ok = pc.and_(pc.is_valid(w), pc.greater(w, 0.0))
        ok = pc.and_(ok, pc.is_valid(ids))
        sub = pa.table({id_col: ids, "w": w}).filter(ok)
        if sub.num_rows == 0:
            return pa.table({id_col: pa.array([], ids.type),
                             "w": pa.array([], pa.float64()),
                             "key": pa.array([], pa.float64())})
        sid = sub.column(id_col).combine_chunks()
        h = hash_strings(pc.binary_join_element_wise(
            sid.cast(pa.string()), str(seed), "\x1f"))
        # u in (0, 1]: (h + 1) / 2^64 — never exactly 0, so ln is finite
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        keys = np.log(u) / sub.column("w").to_numpy(zero_copy_only=False)
        n = len(keys)
        if n > k:
            idx = np.argpartition(-keys, k - 1)[:k]
        else:
            idx = np.arange(n)
        take = pa.array(np.sort(idx))
        return pa.table({id_col: sid.take(take),
                         "w": sub.column("w").take(take),
                         "key": pa.array(keys[np.sort(idx)])})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=batch_size)
    rows = parts.take_all()
    if not rows:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "w": pa.array([], pa.float64())})
    merged = pa.Table.from_pylist(rows)
    merged = merged.sort_by([("key", "descending"), (id_col, "ascending")])
    out = merged.slice(0, k)
    return out.drop_columns(["key"])


def weighted_sample_md5(ds, weight_col: str, id_col: str, k: int,
                        seed: int = 1234,
                        batch_size: int | None = 65536) -> pa.Table:
    """:func:`weighted_sample` (A-ES without replacement) with an
    md5-derived uniform draw, so the whole selection has a LITERAL SQL
    twin — the oracle-checkable member of the sampling family:

        u   = (uint64(md5(id || '#' || seed)[:16 hex]) + 0.5) / 2^64
        key = ln(u) / w        (k largest keys win)

    DuckDB computes the identical key via
    ``ln((CAST(CAST('0x'||substr(md5(id||'#seed'),1,16) AS UBIGINT)
    AS DOUBLE)+0.5)/2^64)/w`` — verified bit-equal (libm 1-ulp
    divergence cannot reorder keys: adjacent A-ES keys differ by
    ~1/n² relative, 11 orders above ulp noise at any plausible k).

    Same distributed shape as :func:`weighted_sample` (per-block top-k
    partials, driver merge bounded by k × blocks).  The md5-per-row
    Python loop is the price of the SQL twin — use the vectorized
    ``hash_strings`` variant when oracle parity isn't needed.  Rows
    with null/non-positive weight are excluded."""
    import hashlib

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks()
        w = t.column(weight_col).combine_chunks().cast(pa.float64())
        ok = pc.and_(pc.is_valid(w), pc.greater(w, 0.0))
        ok = pc.and_(ok, pc.is_valid(ids))
        sub = pa.table({id_col: ids, "w": w}).filter(ok)
        if sub.num_rows == 0:
            return pa.table({id_col: pa.array([], ids.type),
                             "w": pa.array([], pa.float64()),
                             "key": pa.array([], pa.float64())})
        sid = sub.column(id_col).combine_chunks()
        tag = f"#{seed}".encode()
        h = np.fromiter(
            (int(hashlib.md5(s.encode() + tag).hexdigest()[:16], 16)
             for s in sid.cast(pa.string()).to_pylist()),
            dtype=np.uint64, count=sub.num_rows)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        keys = np.log(u) / sub.column("w").to_numpy(zero_copy_only=False)
        n = len(keys)
        if n > k:
            idx = np.argpartition(-keys, k - 1)[:k]
        else:
            idx = np.arange(n)
        take = pa.array(np.sort(idx))
        return pa.table({id_col: sid.take(take),
                         "w": sub.column("w").take(take),
                         "key": pa.array(keys[np.sort(idx)])})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=batch_size)
    rows = parts.take_all()
    if not rows:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "w": pa.array([], pa.float64())})
    merged = pa.Table.from_pylist(rows)
    merged = merged.sort_by([("key", "descending"), (id_col, "ascending")])
    return merged.slice(0, k).drop_columns(["key"])


def global_rank(ds, key: str, id_col: str, n_ranges: int = 64,
                descending: bool = False, kll_k: int = 800,
                batch_size: int | None = 65536):
    """Exact global ``row_number() OVER (ORDER BY key, id)`` — the
    distributed ORDER BY (TeraSort shape; reference semantics:
    a total order the per-record engine gets for free by being
    single-stream).

    Three streaming stages, ONE exchange:

    1. KLL-sketch the key (pruned ``(key)`` scan) and pick
       ``n_ranges - 1`` equi-depth split points, so range reduce tasks
       are balanced to sketch error regardless of key skew.
    2. A count pass assigns each row its contiguous key range
       (vectorized ``searchsorted``) and bincounts per range; the
       driver merges ``n_ranges`` ints into exclusive prefix offsets.
       This tiny pre-pass is what lets every range task emit FINAL
       ranks without any cross-range barrier.
    3. The only exchange: rows move to their range, each range sorts
       ``(key, id)`` locally (nulls first) and adds its offset.

    Null keys rank first with ties by id — spell the twin as
    ``ORDER BY key ASC NULLS FIRST, id`` (or NULLS LAST when
    ``descending``).  Ranks are 1-based, dense, and exact.  Memory per
    reduce task = one range's ``(key, id)`` columns — the payload never
    shuffles; join ranks back by id downstream.  Constant keys
    degenerate to one range (single sorted reduce task) — the sketch
    can't split a point mass; ranks stay exact.
    """
    from peri_ray.sources import _epoch_numeric

    order = "descending" if descending else "ascending"

    def _sketch(t: pa.Table) -> pa.Table:
        v = (_epoch_numeric(t.column(key).combine_chunks().drop_null())
             .to_numpy(zero_copy_only=False))
        k = KLL(kll_k)
        k.update_many(v)
        return pa.table({"s": pa.array([pickle.dumps(k)], pa.binary())})

    merged = KLL(kll_k)
    for r in ds.map_batches(_sketch, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        merged.merge(pickle.loads(r["s"]))
    splits = np.asarray(sorted({float(merged.quantile(i / n_ranges))
                                for i in range(1, n_ranges)}), np.float64)
    n_groups = len(splits) + 2  # range 0 = null keys

    def _assign(t: pa.Table) -> np.ndarray:
        col = t.column(key).combine_chunks()
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = (_epoch_numeric(col).fill_null(0.0)
             .to_numpy(zero_copy_only=False))
        rid = 1 + np.searchsorted(splits, v, side="right").astype(np.int64)
        if descending:
            rid = np.where(null, n_groups - 1, n_groups - 1 - rid)
        else:
            rid[null] = 0
        return rid

    def _counts(t: pa.Table) -> pa.Table:
        c = np.bincount(_assign(t), minlength=n_groups)
        return pa.table({"rid": pa.array(np.arange(n_groups, dtype=np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    totals = np.zeros(n_groups, np.int64)
    for r in ds.map_batches(_counts, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        totals[r["rid"]] += r["n"]
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def _tag(t: pa.Table) -> pa.Table:
        return (t.select([id_col, key])
                .append_column("__range", pa.array(_assign(t))))

    place = "at_end" if descending else "at_start"

    def _rank(group: pa.Table) -> pa.Table:
        rid = int(group.column("__range")[0].as_py())
        idx = pc.sort_indices(
            group, sort_keys=[(key, order), (id_col, "ascending")],
            null_placement=place)
        g = group.drop_columns(["__range"]).take(idx)
        start = int(offsets[rid])
        return g.append_column(
            "rank", pa.array(np.arange(start + 1, start + 1 + g.num_rows,
                                       dtype=np.int64)))

    return (ds.map_batches(_tag, batch_format="pyarrow",
                           batch_size=batch_size)
            .groupby("__range").map_groups(_rank, batch_format="pyarrow"))


def contingency_profile(ds, col_a: str, col_b: str,
                        max_cells: int = 10_000,
                        batch_size: int | None = 65536) -> pa.Table:
    """Exact contingency table between two categorical columns with
    the integer ingredients of the chi-square independence test — the
    are-these-columns-associated profiling audit (lang × source,
    event_type × segment).  Emits the FULL marginal cross product
    (observed 0 where a combination never co-occurs — those cells
    carry signal for the test), each cell as exact integers:
    ``expected_num = row_total * col_total`` so expected =
    expected_num / n without any floats in the hashed result; a SQL
    twin is bit-exact by construction.  Rows with a null in either
    column are vacuous (the SQL WHERE convention).

    Shape: per-batch (a, b, count) partials — bounded by the block's
    observed cell count — merge on the driver into a domain-bounded
    dict; raises past ``max_cells`` output cells (profiling columns
    are enum-like; row-count-cardinality keys belong in
    grouped_distinct_count / dedupe_pairs, not here).

    Use :func:`chi_square_stat` on the result for the scalar verdict.
    Returns (val_a, val_b, observed, expected_num, n_total) sorted by
    (val_a, val_b)."""

    def _part(t: pa.Table) -> pa.Table:
        a = t.column(col_a).combine_chunks().cast(pa.string())
        b = t.column(col_b).combine_chunks().cast(pa.string())
        tt = (pa.table({"a": a, "b": b})
              .filter(pc.and_(pc.is_valid(a), pc.is_valid(b))))
        g = tt.group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "c"])

    cells: dict[tuple, int] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        k = (r["a"], r["b"])
        cells[k] = cells.get(k, 0) + r["c"]
        if len(cells) > max_cells:  # guard DURING the merge, before
            raise ValueError(       # the driver dict can blow up
                f"contingency_profile: over {max_cells} observed "
                f"cells; these columns are not enum-like")

    a_vals = sorted({k[0] for k in cells})
    b_vals = sorted({k[1] for k in cells})
    if len(a_vals) * len(b_vals) > max_cells:
        raise ValueError(
            f"contingency_profile: {len(a_vals)}x{len(b_vals)} cells "
            f"exceed max_cells={max_cells}; these columns are not "
            f"enum-like")
    rt = {a: 0 for a in a_vals}
    ct = {b: 0 for b in b_vals}
    n = 0
    for (a, b), c in cells.items():
        rt[a] += c
        ct[b] += c
        n += c
    rows = {"val_a": [], "val_b": [], "observed": [],
            "expected_num": [], "n_total": []}
    for a in a_vals:
        for b in b_vals:
            rows["val_a"].append(a)
            rows["val_b"].append(b)
            rows["observed"].append(cells.get((a, b), 0))
            rows["expected_num"].append(rt[a] * ct[b])
            rows["n_total"].append(n)
    return pa.table({
        "val_a": pa.array(rows["val_a"], pa.string()),
        "val_b": pa.array(rows["val_b"], pa.string()),
        "observed": pa.array(rows["observed"], pa.int64()),
        "expected_num": pa.array(rows["expected_num"], pa.int64()),
        "n_total": pa.array(rows["n_total"], pa.int64()),
    })


def chi_square_stat(cells: pa.Table) -> dict:
    """Chi-square statistic + Cramér's V from a
    :func:`contingency_profile` table (driver-side scalar fold; the
    hashed integers live in the table, the transcendental-free floats
    here are for the verdict).  chi2 = Σ (o - e)² / e with
    e = expected_num / n, summed in the table's (val_a, val_b) sort
    order so the value is reproducible."""
    import math

    o = cells.column("observed").to_numpy(zero_copy_only=False)
    en = cells.column("expected_num").to_numpy(zero_copy_only=False)
    if cells.num_rows == 0:
        return {"chi2": None, "cramers_v": None, "dof": 0, "n": 0}
    n = int(cells.column("n_total")[0].as_py())
    chi2 = 0.0
    for oi, eni in zip(o.tolist(), en.tolist()):
        e = float(eni) / float(n)
        d = float(oi) - e
        chi2 += d * d / e
    ka = len(set(cells.column("val_a").to_pylist()))
    kb = len(set(cells.column("val_b").to_pylist()))
    dof = (ka - 1) * (kb - 1)
    v = None
    if n > 0 and min(ka, kb) > 1:
        v = math.sqrt(chi2 / (float(n) * float(min(ka, kb) - 1)))
    return {"chi2": chi2, "cramers_v": v, "dof": dof, "n": n}


def corr_matrix(ds, cols_scales, batch_size: int | None = 16384) -> pa.Table:
    """Exact-integer Pearson correlation matrix over numeric columns —
    the multicollinearity / redundant-feature profiling audit.  Each
    column converts to integer units per row (ROUND(x*scale)
    half-away, the money-cents recipe), so every moment (n, Σxᵢ,
    Σxᵢxⱼ) is an exact integer regardless of partial-combine layout,
    and the final Pearson is computed with the cast-each-operand-
    to-DOUBLE expression a SQL twin writes — hash-exact with NO
    rounding fudge (grouped_corr's round_to exists precisely because
    its float partials are layout-sensitive; integer moments aren't).

    Rows with a null in ANY selected column are excluded (listwise
    deletion — document the difference from SQL corr's pairwise
    convention in the twin's WHERE).  One streaming pass, no shuffle:
    per-batch int64 moment partials (p sums + p(p+1)/2 products)
    merge on the driver as Python ints.  int64 partials bound the
    safe scale at batch_size * max|xᵢxⱼ| < 2⁶³ — size ``batch_size``
    to the column magnitudes.

    ``cols_scales``: list of (column, scale) pairs.  Returns
    (col_x, col_y, n, corr) for each i<j pair; corr null when either
    side has zero variance."""
    import math

    names = [c for c, _ in cols_scales]
    p = len(names)
    if p < 2:
        raise ValueError("corr_matrix: need at least two columns")
    prods = [(i, j) for i in range(p) for j in range(i, p)]

    def _part(t: pa.Table) -> pa.Table:
        cols = [t.column(c).combine_chunks().cast(pa.float64())
                for c, _ in cols_scales]
        ok = pc.is_valid(cols[0])
        for c in cols[1:]:
            ok = pc.and_(ok, pc.is_valid(c))
        tt = pa.table({str(i): c for i, c in enumerate(cols)}).filter(ok)
        ints = []
        for i, (_, s) in enumerate(cols_scales):
            x = pc.round(pc.multiply(tt.column(str(i)),
                                     pa.scalar(float(s))),
                         round_mode="half_towards_infinity") \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            ints.append(x.astype(np.int64))
        # loud overflow guard: numpy int64 products WRAP silently
        # (CLAUDE.md pitfall); verify the batch bound with Python ints
        if tt.num_rows:
            mx = [int(np.abs(v).max()) if len(v) else 0 for v in ints]
            for i, j in prods:
                if mx[i] * mx[j] * tt.num_rows > 2**63 - 1:
                    raise ValueError(
                        f"corr_matrix: moment partial for "
                        f"({names[i]}, {names[j]}) would overflow "
                        f"int64 (max|x|={mx[i]}, max|y|={mx[j]}, "
                        f"batch={tt.num_rows}); lower batch_size or "
                        f"the scales")
        out = {"n": pa.array([tt.num_rows], pa.int64())}
        for i in range(p):
            out[f"s{i}"] = pa.array([int(ints[i].sum())], pa.int64())
        for i, j in prods:
            out[f"p{i}_{j}"] = pa.array(
                [int((ints[i] * ints[j]).sum())], pa.int64())
        return pa.table(out)

    n = 0
    s = [0] * p
    pr = {ij: 0 for ij in prods}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        n += r["n"]
        for i in range(p):
            s[i] += r[f"s{i}"]
        for i, j in prods:
            pr[(i, j)] += r[f"p{i}_{j}"]

    rows = {"col_x": [], "col_y": [], "n": [], "corr": []}
    for i in range(p):
        for j in range(i + 1, p):
            num = float(n) * float(pr[(i, j)]) - float(s[i]) * float(s[j])
            dx = float(n) * float(pr[(i, i)]) - float(s[i]) * float(s[i])
            dy = float(n) * float(pr[(j, j)]) - float(s[j]) * float(s[j])
            c = None
            if n >= 2 and dx > 0 and dy > 0:
                c = num / (math.sqrt(dx) * math.sqrt(dy))
            rows["col_x"].append(names[i])
            rows["col_y"].append(names[j])
            rows["n"].append(n)
            rows["corr"].append(c)
    return pa.table({
        "col_x": pa.array(rows["col_x"], pa.string()),
        "col_y": pa.array(rows["col_y"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "corr": pa.array(rows["corr"], pa.float64()),
    })


def conditional_null_rates(ds, cond_col: str, target_cols: list[str],
                           max_groups: int = 10_000,
                           batch_size: int | None = 65536) -> pa.Table:
    """Missingness dependence: per value of ``cond_col``, the exact
    null count and rate of each target column — the "source X never
    fills lang" audit that a GLOBAL null rate averages away.  A
    conditioning value whose null rate diverges from the column's
    overall rate marks a broken upstream producer.

    Shape: per-batch (cond, n, nulls…) count partials (one row per
    cond value per block) merge on the driver behind a ``max_groups``
    guard (the conditioning column is enum-like by contract).  Null
    conditioning values group under the real NULL (reported as a
    row with cond_value null — they're often the worst producer).
    Rates are float(nulls)/float(n), the int→double recipe a SQL twin
    writes.  Returns (cond_value, column, n, nulls, null_rate) sorted
    by (cond_value, column)."""
    tcols = list(target_cols)

    def _part(t: pa.Table) -> pa.Table:
        cond = t.column(cond_col).combine_chunks().cast(pa.string())
        base = {"cond": cond,
                "n": pa.array(np.ones(t.num_rows, np.int64))}
        for c in tcols:
            base[f"nu_{c}"] = pc.is_null(
                t.column(c).combine_chunks()).cast(pa.int64())
        g = (pa.table(base).group_by("cond")
             .aggregate([("n", "sum")]
                        + [(f"nu_{c}", "sum") for c in tcols]))
        return g.rename_columns(["cond", "n"] + [f"nu_{c}" for c in tcols])

    merged: dict = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        cur = merged.setdefault(r["cond"], [0] + [0] * len(tcols))
        cur[0] += r["n"]
        for i, c in enumerate(tcols):
            cur[1 + i] += r[f"nu_{c}"]
        if len(merged) > max_groups:
            raise ValueError(
                f"conditional_null_rates: over {max_groups} distinct "
                f"values in {cond_col!r}; condition on an enum-like "
                f"column")
    keys = sorted(merged, key=lambda k: (k is None, k))
    rows = {"cond_value": [], "column": [], "n": [], "nulls": [],
            "null_rate": []}
    for k in keys:
        n = merged[k][0]
        for i, c in enumerate(sorted(tcols)):
            nu = merged[k][1 + tcols.index(c)]
            rows["cond_value"].append(k)
            rows["column"].append(c)
            rows["n"].append(n)
            rows["nulls"].append(nu)
            rows["null_rate"].append(float(nu) / float(n) if n else None)
    return pa.table({
        "cond_value": pa.array(rows["cond_value"], pa.string()),
        "column": pa.array(rows["column"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "nulls": pa.array(rows["nulls"], pa.int64()),
        "null_rate": pa.array(rows["null_rate"], pa.float64()),
    })


def mutual_information_stat(cells: pa.Table) -> pa.Table:
    """Mutual information + normalized dependence (Theil's uncertainty
    coefficient) from a :func:`contingency_profile` table — the
    information-theoretic strength of the chi-square verdict ("HOW
    predictable is column A from column B", 0 = independent,
    h_a = deterministic).  Driver-side fold over the domain-bounded
    cell table: mi = Σ (o/n)·ln(o·n / (rowtot·coltot)) over observed
    cells, h_a/h_b the marginal entropies, theil_u = mi / h_a.
    All operands come from exact integers (each term is bit-identical
    on both twin sides); the SUMS are association-order sensitive in
    the last ulps, so every emitted float is ROUND(x, 6) — the
    transcendental-value rounding convention (ties cannot occur)."""
    import math

    if cells.num_rows == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "mi": pa.array([None], pa.float64()),
                         "h_a": pa.array([None], pa.float64()),
                         "h_b": pa.array([None], pa.float64()),
                         "theil_u": pa.array([None], pa.float64())})
    av = cells.column("val_a").to_pylist()
    bv = cells.column("val_b").to_pylist()
    o = cells.column("observed").to_pylist()
    n = int(cells.column("n_total")[0].as_py())
    nf = float(n)
    rt: dict[str, int] = {}
    ct: dict[str, int] = {}
    for a, b, c in zip(av, bv, o):
        rt[a] = rt.get(a, 0) + c
        ct[b] = ct.get(b, 0) + c
    mi = 0.0
    for a, b, c in zip(av, bv, o):
        if c > 0:
            mi += (float(c) / nf) * math.log(
                float(c) * nf / (float(rt[a]) * float(ct[b])))
    h_a = -sum((float(v) / nf) * math.log(float(v) / nf)
               for v in rt.values() if v > 0)
    h_b = -sum((float(v) / nf) * math.log(float(v) / nf)
               for v in ct.values() if v > 0)
    u = mi / h_a if h_a > 0 else None
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "mi": pa.array([round(mi, 6)], pa.float64()),
        "h_a": pa.array([round(h_a, 6)], pa.float64()),
        "h_b": pa.array([round(h_b, 6)], pa.float64()),
        "theil_u": pa.array([None if u is None else round(u, 6)],
                            pa.float64()),
    })


# ---------------------------------------------------------------------------
# skyline / Pareto frontier
# ---------------------------------------------------------------------------


def skyline_indices(m: np.ndarray, max_skyline: int = 100_000) -> np.ndarray:
    """Row indices of the Pareto frontier of an ``(n, d)`` float64
    matrix where every column is MAXIMIZED (callers negate minimized
    columns).  A row is on the frontier iff no other row is >= on all
    columns and > on at least one; rows equal on every column do not
    dominate each other, so exact duplicates all survive (SQL
    ``NOT EXISTS`` parity).

    Iterative lexicographic peeling, fully vectorized: the
    lexicographically largest alive row is provably non-dominated (any
    dominator would sort strictly earlier and would already have
    removed it), so each round appends one frontier row and removes
    everything it dominates in ONE O(alive x d) numpy pass — O(s·n·d)
    total for frontier size s, no per-row Python.  Degenerate
    anti-correlated inputs where s explodes raise at ``max_skyline``
    rather than silently burning O(n^2)."""
    n = m.shape[0]
    if n == 0:
        return np.empty(0, np.int64)
    # np.lexsort: LAST key is primary -> feed columns reversed; the
    # full [::-1] flip turns ascending-lex into descending-lex exactly
    order = np.lexsort(m[:, ::-1].T)[::-1]
    ms = m[order]
    alive = np.ones(n, bool)
    keep: list[int] = []
    pos = 0
    while True:
        nxt = np.flatnonzero(alive[pos:])
        if nxt.size == 0:
            break
        pos += int(nxt[0])
        p = ms[pos]
        keep.append(pos)
        if len(keep) > max_skyline:
            raise ValueError(
                f"skyline exceeds max_skyline={max_skyline} rows; "
                "the criteria are too anti-correlated for a frontier "
                "query — raise max_skyline explicitly if intended")
        alive[pos] = False
        sub = np.flatnonzero(alive)
        if sub.size:
            rows = ms[sub]
            dom = np.all(rows <= p, axis=1) & np.any(rows < p, axis=1)
            alive[sub[dom]] = False
    return order[np.asarray(keep, np.int64)]


def skyline(ds, criteria: dict[str, str], payload_cols: list[str],
            batch_size: int | None = 65536, max_skyline: int = 100_000):
    """Distributed skyline (Pareto-frontier) query: the rows not
    dominated on the ``criteria`` columns (``col -> 'max' | 'min'``) —
    the multi-objective selection primitive (e.g. the quality-vs-length
    frontier of a corpus, the newest-and-largest capture frontier).

    The skyline is distributive: the global frontier is a subset of
    every block's local frontier, so each block ships ONLY its local
    skyline (typically O(log^{d-1} n) rows) and one driver-side pass
    over the concatenated candidates — bounded by s x blocks and
    guarded by ``max_skyline`` — finishes exactly.  Rows with a null or
    NaN in any criterion are excluded (SQL twin: ``WHERE c IS NOT
    NULL``; NaN would be neither dominated nor dominating under numpy
    comparisons while DuckDB sorts it above every value, so it is
    dropped like null rather than silently diverging).

    Returns a pyarrow Table with ``payload_cols + criteria`` columns."""
    import ray

    cols = list(dict.fromkeys(payload_cols + list(criteria)))
    signs = np.array([1.0 if d == "max" else -1.0
                      for d in criteria.values()])
    crit = list(criteria)

    def _matrix(t: pa.Table) -> np.ndarray:
        return np.column_stack([
            t.column(c).combine_chunks().cast(pa.float64())
             .to_numpy(zero_copy_only=False) for c in crit]) * signs

    def _local(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        mask = None
        for c in crit:
            col = t.column(c).combine_chunks()
            v = pc.is_valid(col)
            # NaN is neither dominated nor dominating under numpy
            # comparisons, while the NOT EXISTS twin sorts NaN above
            # every value — exclude it like null (ADVICE r3)
            f = col.cast(pa.float64())
            v = pc.and_(v, pc.invert(pc.is_nan(f)))
            mask = v if mask is None else pc.and_(mask, v)
        t = t.filter(mask)
        if t.num_rows == 0:
            return t
        idx = skyline_indices(_matrix(t), max_skyline)
        return t.take(pa.array(np.sort(idx)))

    parts = ds.map_batches(_local, batch_format="pyarrow",
                           batch_size=batch_size)
    tabs = [ray.get(r) for r in parts.to_arrow_refs()]
    if not any(t.num_rows for t in tabs):
        return tabs[0].select(cols) if tabs else pa.table(
            {c: pa.array([], pa.float64()) for c in cols})
    cand = pa.concat_tables([t for t in tabs if t.num_rows],
                            promote_options="default").combine_chunks()
    idx = skyline_indices(_matrix(cand), max_skyline)
    return cand.take(pa.array(np.sort(idx)))


def weighted_quantiles(ds, value_col: str, weight_col: str | None,
                       qs_eighths=(2, 4, 7), weight_fn=None,
                       batch_size: int | None = 65536,
                       max_distinct: int = 100_000) -> pa.Table:
    """EXACT weighted percentile_disc: for each q, the smallest value
    v whose cumulative WEIGHT reaches q of the total — e.g. the doc
    length below which half the corpus's TOKENS live (the
    packing-relevant length percentile, where the unweighted median
    doc badly misrepresents the token mass).

    Quantiles are given in EIGHTHS (q = n/8) so the selection rule is
    pure integer arithmetic on both engines: pick min v with
    ``8·cumw ≥ n·totw`` — no float threshold can drift a boundary row.
    Weights must be non-negative integers (token counts, bytes).

    Shape: per-batch (value, weight-sum) partials → ONE bucketed sum
    exchange → driver selection over DISTINCT values only (raises
    past ``max_distinct``, mirroring :func:`exact_quantiles`).  Rows
    with a null value are excluded; ``weight_fn(table) -> int array``
    lets the weight be derived (e.g. a token count) instead of read."""
    import ray

    from peri_ray.stages.dedup import grouped_sum_via_buckets

    def _part(t: pa.Table) -> pa.Table:
        v = t.column(value_col).combine_chunks()
        if weight_fn is not None:
            w = pa.array(np.asarray(weight_fn(t), np.int64))
        else:
            w = t.column(weight_col).combine_chunks().cast(pa.int64())
        sub = pa.table({"v": v.cast(pa.int64()), "w": w}).filter(
            pc.and_(pc.is_valid(v), pc.is_valid(w)))
        g = sub.group_by("v").aggregate([("w", "sum")])
        return g.rename_columns(["v", "w"])

    counts = grouped_sum_via_buckets(
        ds.map_batches(_part, batch_format="pyarrow",
                       batch_size=batch_size), ["v"], "w")
    tabs = [ray.get(r) for r in counts.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    empty = pa.table({"q": pa.array([], pa.float64()),
                      value_col: pa.array([], pa.int64())})
    if not tabs:
        return empty
    m = pa.concat_tables(tabs).combine_chunks().sort_by(
        [("v", "ascending")])
    if m.num_rows > max_distinct:
        raise ValueError(
            f"weighted_quantiles: {m.num_rows} distinct values exceeds "
            f"max_distinct={max_distinct}; use a KLL sketch for "
            "continuous domains")
    v = m.column("v").to_numpy(zero_copy_only=False)
    w = m.column("w").to_numpy(zero_copy_only=False)
    cum = np.cumsum(w)
    tot = int(cum[-1]) if len(cum) else 0
    if tot <= 0:
        return empty
    out_q, out_v = [], []
    for n in qs_eighths:
        idx = int(np.searchsorted(8 * cum, n * tot, side="left"))
        out_q.append(float(n) / 8.0)
        out_v.append(int(v[min(idx, len(v) - 1)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     value_col: pa.array(out_v, pa.int64())})


def waterfill_allocation(counts: dict, budget: int) -> dict:
    """Integer water-filling: the maximal common cap C such that
    Σ min(n_s, C) ≤ budget, allocation = min(n_s, C) — the classic
    max-min-fair split of a token budget across sources (small
    sources keep everything, big ones are capped at one shared
    level).  Pure integer arithmetic; deterministic for any dict
    order.  Returns {source: alloc}."""
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    total = sum(n for _, n in items)
    k = len(items)
    if total <= budget or k == 0:
        return dict(items)
    pre = 0
    for i, (_, n) in enumerate(items, start=1):
        # all later sources are >= n; capping them AT n needs
        # pre + (k - i)·n more than the prefix already spent
        if pre + n + (k - i) * n >= budget:
            cap = (budget - pre) // (k - i + 1)
            return {s: min(v, cap) for s, v in counts.items()}
        pre += n
    return dict(items)   # unreachable when total > budget


def budget_allocation(ds, budget_num: int, budget_den: int,
                      text_col: str = "text", source_col: str = "source",
                      batch_size: int | None = 8192) -> pa.Table:
    """Per-source token-budget allocation: count tokens per source in
    one streaming pass (partials bounded by sources × blocks), set
    the budget to ``num/den`` of the corpus total (a dyadic-free pure
    integer: budget = total·num // den), and water-fill
    (:func:`waterfill_allocation`) — the planning step before
    hash_weighted_sample rates are derived for corpus mixing.
    Returns (source, n_tokens, alloc), every column BIGINT-exact."""
    import ray

    from peri_ray.stages.text import flat_tokens

    def _part(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        sub = t.filter(pc.and_(pc.is_valid(txt),
                               pc.is_valid(t.column(source_col)
                                           .combine_chunks())))
        if sub.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        _, lens = flat_tokens(sub.column(text_col))
        g = (pa.table({"source": sub.column(source_col),
                       "n": pa.array(lens)})
             .group_by("source").aggregate([("n", "sum")]))
        return g.rename_columns(["source", "n"])

    tabs = [ray.get(r) for r in ds.map_batches(
        _part, batch_format="pyarrow",
        batch_size=batch_size).to_arrow_refs()]
    counts: dict = {}
    for t in tabs:
        for s, n in zip(t.column("source").to_pylist(),
                        t.column("n").to_pylist()):
            counts[s] = counts.get(s, 0) + int(n)
    total = sum(counts.values())
    budget = total * budget_num // budget_den
    alloc = waterfill_allocation(counts, budget)
    srcs = sorted(counts)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_tokens": pa.array([counts[s] for s in srcs], pa.int64()),
        "alloc": pa.array([alloc[s] for s in srcs], pa.int64())})


def grouped_skyline(ds, key_col: str, criteria: dict[str, str],
                    payload_cols: list[str], n_buckets: int = 64,
                    batch_size: int | None = 65536,
                    max_skyline: int = 100_000):
    """Per-group Pareto frontier: :func:`skyline` within every value
    of ``key_col`` (the per-language / per-host frontier).  Two-phase
    like the global form — each block keeps only its LOCAL per-group
    frontier (the distributive property holds within a group), then
    one hash-bucketed exchange co-locates groups and the identical
    kernel runs once per group inside the bucket.  Exchange rows are
    bounded by Σ_g (local frontier sizes × blocks)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    cols = list(dict.fromkeys([key_col] + payload_cols
                              + list(criteria)))
    signs = np.array([1.0 if d == "max" else -1.0
                      for d in criteria.values()])
    crit = list(criteria)

    def _per_group(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        mask = pc.is_valid(t.column(key_col).combine_chunks())
        for c in crit:
            mask = pc.and_(mask,
                           pc.is_valid(t.column(c).combine_chunks()))
        t = t.filter(mask)
        if t.num_rows == 0:
            return t
        t = t.sort_by([(key_col, "ascending")])
        keys = t.column(key_col).combine_chunks()
        n = t.num_rows
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(~same)
        ends = np.append(starts[1:], n)
        m = np.column_stack([
            t.column(c).combine_chunks().cast(pa.float64())
             .to_numpy(zero_copy_only=False) for c in crit]) * signs
        keep: list[np.ndarray] = []
        for lo, hi in zip(starts, ends):
            keep.append(lo + skyline_indices(m[lo:hi], max_skyline))
        idx = np.sort(np.concatenate(keep))
        return t.take(pa.array(idx))

    partials = ds.map_batches(_per_group, batch_format="pyarrow",
                              batch_size=batch_size)
    return map_groups_via_buckets(partials, [key_col], _per_group,
                                  n_buckets=n_buckets)
