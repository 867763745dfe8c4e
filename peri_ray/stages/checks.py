"""[NORTH] Table-level checks: uniqueness, referential integrity,
distribution drift.  These extend the reference's per-record rules to
dataset-level rules with the same violations-row contract (SURVEY §2.7).

Scale notes (the part that matters at 100 TB):

- ``uniqueness``: two-phase aggregation.  Phase 1 pre-aggregates counts
  per key INSIDE each ``map_batches`` task (collapsing within-batch
  duplicates before anything moves), so the shuffle carries one row per
  (key, batch) instead of one per input row.  Phase 2 is a
  ``groupby(key).sum`` over those partials.  Skewed keys (one host
  dominating ``url``) are already collapsed per batch by phase 1; the
  optional ``salt`` adds an intermediate ``(key, salt)`` reduction for
  adversarial skew where a single key floods even the partial rows.
- ``referential``: broadcast anti-semijoin.  The dimension side is
  ``ray.put`` once and read per task (never re-shipped per batch);
  membership is a vectorized ``pc.is_in``.  A shuffle join is never
  needed while the dim fits a worker heap (langs, country codes, enum
  dims — the reference-check shape).
- ``drift``: histogram via the same two-phase counts, then PSI/KL in
  the driver over the tiny (category → count) result.
"""

from __future__ import annotations

import math
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.state.sketches import hash_strings


# ---------------------------------------------------------------------------
# uniqueness
# ---------------------------------------------------------------------------


class _KeyCountPartial:
    """Batch → (key, cnt) partial counts [+ optional salt column]."""

    def __init__(self, key: str, salt: int | None = None):
        self.key = key
        self.salt = salt

    def __call__(self, table: pa.Table) -> pa.Table:
        grouped = table.select([self.key]).group_by(self.key).aggregate([(self.key, "count")])
        out = pa.table(
            {
                self.key: grouped.column(self.key),
                "cnt": grouped.column(f"{self.key}_count").cast(pa.int64()),
            }
        )
        if self.salt:
            from peri_ray.state.sketches import hash_strings

            keys = out.column(self.key).combine_chunks()
            if not pa.types.is_string(keys.type):
                keys = keys.cast(pa.string())
            salts = (hash_strings(keys) % np.uint64(self.salt)).astype(np.int64)
            out = out.append_column("salt", pa.array(salts))
        return out


def bucket_of(col: "pa.ChunkedArray | pa.Array", n_buckets: int) -> pa.Array:
    """``hash(key) % n_buckets`` as an int32 array — THE shuffle
    partitioning primitive every bucketed exchange in the engine shares
    (strings/binary hash directly; other types via int64 + splitmix64).
    Keep ONE implementation: stages that bucket the same key with
    different hash recipes would co-locate nothing."""
    from peri_ray.state.sketches import hash_strings, splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)):
        h = hash_strings(col)
    else:
        h = splitmix64(col.cast(pa.int64()).fill_null(0).to_numpy(
            zero_copy_only=False).view(np.uint64))
    return pa.array((h % np.uint64(n_buckets)).astype(np.int32))


class _AddBucket:
    """Partials → + ``bucket = hash(key) % n_buckets``.  The follow-up
    shuffle then groups on a small-int key (one cheap sort) instead of a
    high-cardinality string key; per-bucket aggregation stays a
    vectorized Arrow ``group_by`` inside ``map_groups``.  ``n_buckets``
    is the shuffle-partition count — size it to the cluster, not the
    key cardinality."""

    def __init__(self, key: str, n_buckets: int):
        self.key = key
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.append_column("bucket", bucket_of(t.column(self.key), self.n_buckets))


def duplicate_keys(ds, key: str, n_buckets: int = 64, batch_size: int | None = 65536):
    """Keys appearing more than once: ``(key, cnt)`` with cnt > 1.
    Exact; oracle = ``GROUP BY key HAVING count(*) > 1``.

    Two-phase + hash-bucketed: per-batch ``group_by`` collapses
    within-batch duplicates (no raw rows shuffle), then the shuffle keys
    on ``bucket`` (small int) and each bucket re-aggregates with a
    vectorized Arrow group_by.  Equivalent to a salted aggregation with
    the salt being the key hash itself — skewed keys can't flood a
    partition beyond their post-preagg row count (≤ #batches)."""
    partials = ds.map_batches(_KeyCountPartial(key), batch_format="pyarrow",
                              batch_size=batch_size)
    bucketed = partials.map_batches(_AddBucket(key, n_buckets), batch_format="pyarrow")

    def _agg_bucket(group: pa.Table) -> pa.Table:
        g = group.select([key, "cnt"]).group_by(key).aggregate([("cnt", "sum")])
        g = g.rename_columns([key, "cnt"])
        return g.filter(pc.greater(g.column("cnt"), 1))

    return bucketed.groupby("bucket").map_groups(_agg_bucket, batch_format="pyarrow")


def uniqueness_check(ds, key: str, n_buckets: int = 64) -> dict[str, Any]:
    """Verdict form: rule ``unique(key)`` passes iff no duplicate keys.
    Single execution: the (small) duplicate set is materialized once."""
    dups = duplicate_keys(ds, key, n_buckets=n_buckets).materialize()
    n_dup_keys = dups.count()
    extra = (dups.sum("cnt") - n_dup_keys) if n_dup_keys else 0
    return {
        "rule_id": f"unique:{key}",
        "passed": n_dup_keys == 0,
        "duplicate_keys": n_dup_keys,
        "duplicate_rows": int(extra),
    }


# ---------------------------------------------------------------------------
# referential
# ---------------------------------------------------------------------------


def _broadcast_values(dim) -> "ray.ObjectRef":
    import ray

    if hasattr(dim, "take_all"):  # a Dataset of one key column
        name = dim.schema().names[0]
        values = [r[name] for r in dim.take_all()]
    else:
        values = list(dim)
    return ray.put(pa.array(sorted(set(v for v in values if v is not None))))


class _AntiSemiJoin:
    """Actor-pool stage: resolves the broadcast dim ONCE per actor in
    ``__init__`` (ray_guide: broadcast small side, no shuffle)."""

    def __init__(self, column: str, dim_ref):
        import ray

        self.column = column
        self.values = ray.get(dim_ref)

    def __call__(self, table: pa.Table) -> pa.Table:
        col = table.column(self.column).combine_chunks()
        member = pc.is_in(col, value_set=self.values)
        missing = pc.and_(pc.invert(member), pc.is_valid(col))
        return table.filter(missing)


def referential_violations(ds, column: str, dim, columns: list[str] | None = None,
                           concurrency: int | None = None, batch_size: int | None = 65536):
    """Rows of ``ds`` whose ``column`` value is absent from the dimension
    side (FK violation).  ``dim`` is a small Dataset / iterable of valid
    keys, broadcast via ``ray.put``.  Oracle =
    ``LEFT JOIN dim ON .. WHERE dim.key IS NULL`` (nulls pass — FK
    semantics match the reference's optional-by-default)."""
    ref = _broadcast_values(dim)
    if columns:
        ds = ds.select_columns(sorted(set(columns + [column])))
    if concurrency:
        # actor pool: dim resolved once per actor in __init__
        return ds.map_batches(
            _AntiSemiJoin,
            fn_constructor_args=(column, ref),
            concurrency=concurrency,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    # task path: the instance (holding the resolved array) is serialized
    # once into the object store and referenced by every task — still a
    # broadcast, never re-shipped per batch
    return ds.map_batches(_AntiSemiJoin(column, ref), batch_format="pyarrow",
                          batch_size=batch_size)


def referential_check(ds, column: str, dim) -> dict[str, Any]:
    bad = referential_violations(ds, column, dim, columns=[column])
    n = bad.count()
    return {"rule_id": f"ref:{column}", "passed": n == 0, "violating_rows": n}


# ---------------------------------------------------------------------------
# drift (PSI / KL vs a reference histogram)
# ---------------------------------------------------------------------------


def histogram(ds, column: str, batch_size: int | None = 65536) -> dict[str, int]:
    """Two-phase categorical histogram: per-batch ``group_by`` partials,
    then a small ``groupby().sum`` shuffle over (category, cnt) rows."""
    partials = ds.map_batches(_KeyCountPartial(column), batch_format="pyarrow",
                              batch_size=batch_size)
    totals = partials.groupby(column).sum("cnt").take_all()
    return {r[column]: int(r["sum(cnt)"]) for r in totals if r[column] is not None}


def fd_violations(ds, determinant: str, dependent: str,
                  n_buckets: int = 64, batch_size: int | None = 65536):
    """Functional-dependency check ``determinant → dependent``: keys
    holding MORE than one distinct dependent value, with that distinct
    count — the profiling primitive behind "does url determine lang?"
    / "is source→domain stable?" contracts.

    Two-phase like every uniqueness check: each block collapses to its
    DISTINCT (det, dep) pairs before the exchange (nulls in either
    column excluded — SQL's count(DISTINCT ...) semantics), then one
    hash-bucketed exchange on the determinant re-collapses pair
    duplicates across blocks and counts per key.  Returns
    (determinant, n_dep) rows with n_dep > 1."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _pairs(t: pa.Table) -> pa.Table:
        sub = t.select([determinant, dependent])
        sub = sub.filter(pc.and_(pc.is_valid(sub.column(determinant)),
                                 pc.is_valid(sub.column(dependent))))
        return sub.group_by([determinant, dependent]).aggregate([])

    partials = ds.map_batches(_pairs, batch_format="pyarrow",
                              batch_size=batch_size)

    def _count(group: pa.Table) -> pa.Table:
        g = (group.select([determinant, dependent])
             .group_by([determinant, dependent]).aggregate([])
             .group_by(determinant).aggregate([([], "count_all")])
             .rename_columns([determinant, "n_dep"]))
        return g.filter(pc.greater(g.column("n_dep"), 1))

    return map_groups_via_buckets(partials, [determinant], _count,
                                  n_buckets=n_buckets)


def repair_enum(ds, column: str, allowed: list[str],
                batch_size: int | None = 65536):
    """Constraint-driven repair: replace every NON-NULL value of
    ``column`` outside ``allowed`` with the most frequent allowed value
    (ties → smallest value, so the SQL twin's ``ORDER BY count(*)
    DESC, val LIMIT 1`` picks identically).  Nulls pass through —
    required/default handling is the spec's job, not the repairer's.

    Two passes, zero shuffle: the categorical histogram reduces to a
    driver dict bounded by enum cardinality, the winner broadcasts in
    the closure, and the fix is one vectorized ``if_else`` per batch."""
    counts = histogram(ds, column, batch_size=batch_size)
    valid = {v: c for v, c in counts.items() if v in set(allowed)}
    if not valid:
        raise ValueError(
            f"repair_enum: no occurrences of any allowed value in {column!r}")
    mode = sorted(valid.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    allowed_arr = pa.array(list(allowed), pa.string())

    def _fix(t: pa.Table) -> pa.Table:
        c = t.column(column).combine_chunks()
        if pa.types.is_large_string(c.type):
            c = c.cast(pa.string())
        keep = pc.or_kleene(pc.is_null(c), pc.is_in(c, value_set=allowed_arr))
        fixed = pc.if_else(keep, c, pa.scalar(mode, pa.string()))
        i = t.schema.get_field_index(column)
        return t.set_column(i, column, fixed)

    return ds.map_batches(_fix, batch_format="pyarrow", batch_size=batch_size)


def psi(observed: dict[str, float], reference: dict[str, float], eps: float = 1e-6) -> float:
    """Population Stability Index over normalized histograms."""
    cats = set(observed) | set(reference)
    tot_o = sum(observed.values()) or 1.0
    tot_r = sum(reference.values()) or 1.0
    score = 0.0
    for c in cats:
        p = max(observed.get(c, 0) / tot_o, eps)
        q = max(reference.get(c, 0) / tot_r, eps)
        score += (p - q) * math.log(p / q)
    return score


def kl_divergence(observed: dict[str, float], reference: dict[str, float], eps: float = 1e-6) -> float:
    cats = set(observed) | set(reference)
    tot_o = sum(observed.values()) or 1.0
    tot_r = sum(reference.values()) or 1.0
    score = 0.0
    for c in cats:
        p = max(observed.get(c, 0) / tot_o, eps)
        q = max(reference.get(c, 0) / tot_r, eps)
        score += p * math.log(p / q)
    return score


def js_divergence(observed: dict[str, float], reference: dict[str, float],
                  eps: float = 1e-6) -> float:
    """Jensen-Shannon divergence (symmetric, bounded by ln 2) over
    normalized histograms — the drift score to reach for when PSI's
    asymmetry or its eps-blowup on vanishing categories is unwanted.
    Same eps-clamp convention as :func:`psi`/:func:`kl_divergence`."""
    cats = set(observed) | set(reference)
    tot_o = sum(observed.values()) or 1.0
    tot_r = sum(reference.values()) or 1.0
    score = 0.0
    for c in cats:
        p = max(observed.get(c, 0) / tot_o, eps)
        q = max(reference.get(c, 0) / tot_r, eps)
        m = (p + q) / 2.0
        score += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    return score


def _two_sample_counts(ds, column: str, split_col: str, split_mod: int,
                       to_int, batch_size: int | None) -> dict[int, list]:
    """Shared partial pass for the two-sample drift checks: per-batch
    (key, side) counts via one Arrow group_by, driver-merged dict
    {int_key: [n_left, n_right]}.  The split is deterministic on an id
    column (``split_col % split_mod == 0`` → left) so SQL twins can
    rebuild it; null values in ``column`` are excluded on both sides."""
    def _partial(t: pa.Table) -> pa.Table:
        v = t.column(column).combine_chunks().cast(pa.float64())
        sid = (t.column(split_col).combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        ok = pc.is_valid(v)
        sub = pa.table({"k": to_int(v),
                        "left": pa.array(sid % split_mod == 0)}).filter(ok)
        g = sub.group_by(["k", "left"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "left", "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=batch_size)
    acc: dict[int, list] = {}
    for r in partials.iter_rows():
        cur = acc.setdefault(int(r["k"]), [0, 0])
        cur[0 if r["left"] else 1] += int(r["n"])
    return acc


def _quantize_to_int(scale: int):
    """Shared SQL-ROUND-half-away quantizer for the two-sample checks
    — ONE implementation so the KS and W1 twins can never drift."""
    def _to_int(v: pa.ChunkedArray) -> pa.ChunkedArray:
        return pc.round(pc.multiply(v, float(scale)),
                        round_mode="half_towards_infinity").cast(pa.int64())

    return _to_int


def binned_psi_drift(ds, column: str, bin_width: float, split_col: str,
                     split_mod: int = 2, eps: float = 1e-6,
                     batch_size: int | None = 65536) -> pa.Table:
    """Numeric-column drift between two deterministic subsets of the
    SAME Dataset (``split_col % split_mod == 0`` vs the rest): values
    bin to ``floor(v / bin_width)`` and the binned histograms score
    with :func:`psi`.  One streaming pass of (bin, side) count
    partials; driver state is bounded by bin count, not rows.  The
    production shape for snapshot-vs-snapshot numeric drift — pass two
    crawls unioned with a snapshot tag as ``split_col``."""
    def _to_bin(v: pa.ChunkedArray) -> pa.ChunkedArray:
        return pc.floor(pc.divide(v, float(bin_width))).cast(pa.int64())

    acc = _two_sample_counts(ds, column, split_col, split_mod, _to_bin,
                             batch_size)
    obs = {k: v[0] for k, v in acc.items() if v[0]}
    ref = {k: v[1] for k, v in acc.items() if v[1]}
    score = psi(obs, ref, eps)
    return pa.table({
        "psi": pa.array([round(score, 6)], pa.float64()),
        "n_left": pa.array([sum(v[0] for v in acc.values())], pa.int64()),
        "n_right": pa.array([sum(v[1] for v in acc.values())], pa.int64()),
    })


def ks_two_sample(ds, column: str, split_col: str, split_mod: int = 2,
                  scale: int = 100, max_distinct: int = 2_000_000,
                  batch_size: int | None = 65536) -> pa.Table:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two
    deterministic subsets of one Dataset: D = max over observed values
    of |F_left - F_right|, plus the smallest value attaining it.

    Values quantize to ``round(v*scale)`` integer units (SQL-ROUND
    half-away), so the driver merge is bounded by the VALUE DOMAIN
    (distinct quantized values), not row count — exact for
    fixed-precision columns (prices, scores); raises above
    ``max_distinct`` rather than silently degrading (bin first via
    :func:`binned_psi_drift` for genuinely continuous columns).  All
    float ops are ``float(int)/float(int)`` divisions and one
    subtraction in fixed order, so the SQL window-cumsum twin lands on
    identical doubles."""
    acc = _two_sample_counts(ds, column, split_col, split_mod,
                             _quantize_to_int(scale), batch_size)
    if len(acc) > max_distinct:
        raise ValueError(
            f"ks_two_sample: {len(acc)} distinct quantized values exceed "
            f"max_distinct={max_distinct}; bin the column first")
    n_l = sum(v[0] for v in acc.values())
    n_r = sum(v[1] for v in acc.values())
    if n_l == 0 or n_r == 0:
        # degenerate: one side empty — KS undefined, emit a null row
        return pa.table({"ks": pa.array([None], pa.float64()),
                         "at_value": pa.array([None], pa.float64()),
                         "n_left": pa.array([n_l], pa.int64()),
                         "n_right": pa.array([n_r], pa.int64())})
    best_d, best_k = -1.0, None
    cum_l = cum_r = 0
    for k in sorted(acc):
        cum_l += acc[k][0]
        cum_r += acc[k][1]
        d = abs(float(cum_l) / float(n_l) - float(cum_r) / float(n_r))
        if d > best_d:
            best_d, best_k = d, k
    return pa.table({
        "ks": pa.array([best_d], pa.float64()),
        "at_value": pa.array([float(best_k) / float(scale)], pa.float64()),
        "n_left": pa.array([n_l], pa.int64()),
        "n_right": pa.array([n_r], pa.int64()),
    })


def wasserstein_two_sample(ds, column: str, split_col: str,
                           split_mod: int = 2, scale: int = 100,
                           max_distinct: int = 2_000_000,
                           batch_size: int | None = 65536) -> pa.Table:
    """EXACT two-sample Wasserstein-1 (earth-mover) distance between
    two deterministic subsets of one Dataset: ∫|F_left − F_right| dv
    over the quantized value axis.

    Same bounded-by-value-domain partial pass as :func:`ks_two_sample`.
    The sum is computed in PURE INTEGER arithmetic —
    Σ |cum_l·n_r − cum_r·n_l| · gap, python ints, order-free — and
    divided by (n_l·n_r·scale) exactly once, so the result is one
    correctly-rounded double on any block layout and the SQL twin's
    HUGEINT sum lands on the identical value (W1 is RATIONAL: unlike
    PSI/KL it can tie at a rounding digit, so no rounding is safe —
    exactness is the only robust compare)."""
    acc = _two_sample_counts(ds, column, split_col, split_mod,
                             _quantize_to_int(scale), batch_size)
    if len(acc) > max_distinct:
        raise ValueError(
            f"wasserstein_two_sample: {len(acc)} distinct quantized values "
            f"exceed max_distinct={max_distinct}; bin the column first")
    n_l = sum(v[0] for v in acc.values())
    n_r = sum(v[1] for v in acc.values())
    if n_l == 0 or n_r == 0:
        # degenerate: one side empty — W1 undefined, emit a null row
        # (not a crash) so pipelines over sparse slices keep streaming
        return pa.table({"w1": pa.array([None], pa.float64()),
                         "n_left": pa.array([n_l], pa.int64()),
                         "n_right": pa.array([n_r], pa.int64())})
    keys = sorted(acc)
    num = 0
    cum_l = cum_r = 0
    for k, nxt in zip(keys, keys[1:]):
        cum_l += acc[k][0]
        cum_r += acc[k][1]
        num += abs(cum_l * n_r - cum_r * n_l) * (nxt - k)
    w1 = float(num) / float(n_l * n_r * scale)
    return pa.table({
        "w1": pa.array([w1], pa.float64()),
        "n_left": pa.array([n_l], pa.int64()),
        "n_right": pa.array([n_r], pa.int64()),
    })


def fragment_anomaly_report(ds, frag_col: str, value_col: str,
                            z_thresh: float = 3.0,
                            batch_size: int | None = 65536) -> pa.Table:
    """Per-PARTITION stats anomaly check (the north rule's
    per-partition verdict applied to a numeric column): flag fragments
    whose mean deviates from the GLOBAL mean by more than ``z_thresh``
    standard errors — z = (frag_mean − g_mean) / (g_std / √frag_n)
    with population std.

    One streaming pass of per-(fragment) integer-moment partials
    (n, Σv, Σv²) merged as python ints on the driver (fragment-count
    bounded).  All moments are exact integers, so means are one
    CAST/divide each and only z (which contains a √) rounds — to 6
    decimals, tie-free for irrational values.  ``value_col`` must be
    integral-valued (ids, counts, byte/char lengths)."""
    def _part(t: pa.Table) -> pa.Table:
        v = t.column(value_col).combine_chunks().cast(pa.float64())
        sub = pa.table({frag_col: t.column(frag_col),
                        "v": v}).filter(pc.is_valid(v))
        x = sub.column("v").to_numpy(zero_copy_only=False)
        if len(x) and not np.array_equal(x, np.floor(x)):
            raise ValueError(
                "fragment_anomaly_report: value_col must be "
                "integral-valued (quantize fractional columns first)")
        xi = x.astype(np.int64)
        aug = pa.table({
            frag_col: sub.column(frag_col),
            "n": pa.array(np.ones(len(xi), np.int64)),
            "s": pa.array(xi),
            "s2": pa.array(xi * xi),
        })
        g = aug.group_by(frag_col).aggregate([(c, "sum")
                                              for c in ("n", "s", "s2")])
        return g.rename_columns([frag_col, "n", "s", "s2"])

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    acc: dict = {}
    tot_n = tot_s = tot_s2 = 0
    for r in partials.iter_rows():
        cur = acc.setdefault(r[frag_col], [0, 0])
        cur[0] += int(r["n"])
        cur[1] += int(r["s"])
        tot_n += int(r["n"])
        tot_s += int(r["s"])
        tot_s2 += int(r["s2"])
    if tot_n == 0:
        return pa.table({frag_col: pa.array([]),
                         "n": pa.array([], pa.int64()),
                         "mean_v": pa.array([], pa.float64()),
                         "z": pa.array([], pa.float64()),
                         "flagged": pa.array([], pa.bool_())})
    g_mean = float(tot_s) / float(tot_n)
    g_var = (float(tot_s2) - float(tot_s) * float(tot_s) / float(tot_n)) \
        / float(tot_n)
    g_std = math.sqrt(max(g_var, 0.0))
    keys = sorted(acc, key=str)
    means, zs, flags = [], [], []
    for k in keys:
        n, s = acc[k]
        m = float(s) / float(n)
        if g_std == 0.0:
            z = 0.0
        else:
            z = (m - g_mean) / (g_std / math.sqrt(float(n)))
        z = round(z, 6)
        means.append(m)
        zs.append(z)
        flags.append(abs(z) > z_thresh)
    return pa.table({
        frag_col: pa.array(keys),
        "n": pa.array([acc[k][0] for k in keys], pa.int64()),
        "mean_v": pa.array(means, pa.float64()),
        "z": pa.array(zs, pa.float64()),
        "flagged": pa.array(flags, pa.bool_()),
    })


def drift_check(ds, column: str, reference: dict[str, float],
                method: str = "psi", threshold: float = 0.2) -> dict[str, Any]:
    """Distribution-drift rule: PSI (industry threshold ~0.2) or KL of
    the column's histogram vs a reference histogram."""
    obs = histogram(ds, column)
    score = psi(obs, reference) if method == "psi" else kl_divergence(obs, reference)
    return {
        "rule_id": f"drift:{column}:{method}",
        "passed": score <= threshold,
        "score": score,
        "threshold": threshold,
        "observed": obs,
    }


def referential_violations_shuffled(ds, column: str, dim, n_buckets: int = 64,
                                    columns: list[str] | None = None):
    """FK anti-join for dims too big to broadcast (SURVEY §2.7): both
    sides hash-bucket on the key, one groupby co-locates each bucket,
    and a vectorized per-bucket ``is_in`` finds fact keys absent from
    the dim partition.  Only (key, side) pairs plus the requested fact
    columns cross the exchange.

    Same result contract as :func:`referential_violations` (null keys
    pass); use the broadcast path whenever the dim fits one object."""
    import ray.data as rd  # noqa: F401  (Dataset API already loaded)

    fact_cols = sorted(set((columns or []) + [column]))
    dim_key = dim.schema().names[0] if hasattr(dim, "schema") else None
    if dim_key is None:
        raise TypeError("shuffled referential needs the dim as a Dataset")
    fact_schema = ds.schema()
    fact_types = {
        name: t for name, t in zip(fact_schema.names, fact_schema.types)
    }

    def _tag_fact(t: pa.Table) -> pa.Table:
        t = t.select(fact_cols)
        key_str = t.column(column).cast(pa.string())
        bucket = (hash_strings(key_str) % np.uint64(n_buckets)).astype(np.int64)
        return (t.append_column("__key", key_str)
                 .append_column("__bucket", pa.array(bucket))
                 .append_column("__side", pa.array(np.zeros(t.num_rows, np.int8))))

    def _tag_dim(t: pa.Table) -> pa.Table:
        # dim rows ship only the canonical key; fact columns ride as
        # typed nulls so the union schema matches the fact side exactly
        key_str = t.column(dim_key).cast(pa.string())
        bucket = (hash_strings(key_str) % np.uint64(n_buckets)).astype(np.int64)
        cols = {c: pa.nulls(t.num_rows, fact_types[c]) for c in fact_cols}
        out = pa.table(cols)
        return (out.append_column("__key", key_str)
                   .append_column("__bucket", pa.array(bucket))
                   .append_column("__side", pa.array(np.ones(t.num_rows, np.int8))))

    fact = ds.map_batches(_tag_fact, batch_format="pyarrow")
    dims = dim.map_batches(_tag_dim, batch_format="pyarrow")
    both = fact.union(dims)

    def _anti(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        dim_keys = group.filter(pc.equal(side, 1)).column("__key").unique()
        facts = group.filter(pc.equal(side, 0))
        keys = facts.column("__key")
        missing = pc.and_(pc.invert(pc.is_in(keys, value_set=dim_keys)),
                          pc.is_valid(keys))
        return facts.filter(missing).select(fact_cols)

    return both.groupby("__bucket").map_groups(_anti, batch_format="pyarrow")


def chi_square_independence(ds, col_a: str, col_b: str,
                            batch_size: int | None = 65536) -> dict[str, Any]:
    """Pearson chi-square test of independence between two categorical
    columns — the drift family's "are these two fields entangled?"
    check (e.g. does document language depend on crawl source?).

    Shape: per-batch (a, b, cnt) contingency partials — bounded by the
    category-pair count per block — merged on the driver into the
    dense R x C table (zero cells INCLUDED: the statistic needs every
    expected cell, which a sparse SQL GROUP BY would silently skip).
    Returns {chi2, dof, n}; rows with a null on either side are
    excluded (no category)."""
    import pyarrow as pa_

    def _part(t: pa.Table) -> pa.Table:
        a = t.column(col_a).combine_chunks().cast(pa.string())
        b = t.column(col_b).combine_chunks().cast(pa.string())
        keep = pc.and_(pc.is_valid(a), pc.is_valid(b))
        tt = pa.table({"a": a, "b": b}).filter(keep)
        g = tt.group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "cnt"])

    rows = ds.map_batches(_part, batch_format="pyarrow",
                          batch_size=batch_size).take_all()
    cells: dict[tuple[str, str], int] = {}
    for r in rows:
        k = (r["a"], r["b"])
        cells[k] = cells.get(k, 0) + r["cnt"]
    ra = sorted({k[0] for k in cells})
    cb = sorted({k[1] for k in cells})
    if len(ra) < 2 or len(cb) < 2:
        return {"chi2": 0.0, "dof": 0, "n": sum(cells.values())}
    obs = np.zeros((len(ra), len(cb)), np.float64)
    ia = {v: i for i, v in enumerate(ra)}
    ib = {v: i for i, v in enumerate(cb)}
    for (a, b), cnt in cells.items():
        obs[ia[a], ib[b]] = cnt
    n = obs.sum()
    exp = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    return {"chi2": chi2, "dof": (len(ra) - 1) * (len(cb) - 1), "n": int(n)}


def duplicate_composite_keys(ds, keys: list[str], n_buckets: int = 64,
                             batch_size: int | None = 65536):
    """Composite-key uniqueness: (k1, ..., kn, cnt) rows with cnt > 1 —
    multi-column primary keys (e.g. (orderkey, linenumber)).  Same
    two-phase hash-bucketed shape as :func:`duplicate_keys`; the bucket
    keys on the joined key string so all parts of one composite land
    together."""

    def _part(t: pa.Table) -> pa.Table:
        g = (t.select(keys).group_by(keys).aggregate([([], "count_all")])
             .rename_columns(keys + ["cnt"]))
        key = g.column(keys[0]).combine_chunks().cast(pa.string())
        for c in keys[1:]:
            key = pc.binary_join_element_wise(
                pc.coalesce(key, pa.scalar("\x00", pa.string())),
                pc.coalesce(g.column(c).combine_chunks().cast(pa.string()),
                            pa.scalar("\x00", pa.string())), "\x1f")
        return g.append_column("bucket", bucket_of(key, n_buckets))

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)

    def _agg(group: pa.Table) -> pa.Table:
        g = (group.select(keys + ["cnt"]).group_by(keys)
             .aggregate([("cnt", "sum")]).rename_columns(keys + ["cnt"]))
        return g.filter(pc.greater(g.column("cnt"), 1))

    return partials.groupby("bucket").map_groups(_agg, batch_format="pyarrow")


def benford_check(ds, column: str, batch_size: int | None = 65536) -> pa.Table:
    """Benford's-law first-significant-digit profile: (digit, cnt,
    expected) for digits 1-9 plus the chi-square distance from the
    log10(1 + 1/d) expectation — a classic fabricated-numbers signal
    for positive columns spanning several magnitudes.

    The digit is extracted TEXTUALLY (first nonzero digit of the
    decimal rendering) so the SQL twin — regexp on CAST(col AS VARCHAR)
    — sees identical digits, float formatting included.  Per-batch
    9-bin partials, driver merge."""

    def _part(t: pa.Table) -> pa.Table:
        col = t.column(column).combine_chunks()
        col = col.filter(pc.and_(pc.is_valid(col),
                                 pc.greater(col, pa.scalar(0).cast(col.type))))
        s = pc.cast(col, pa.string())
        first = pc.extract_regex(s, r"(?P<d>[1-9])")
        d = pc.struct_field(first, "d")
        vc = pc.value_counts(d.drop_null())
        return pa.table({"digit": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    rows = ds.map_batches(_part, batch_format="pyarrow",
                          batch_size=batch_size).take_all()
    counts = {str(i): 0 for i in range(1, 10)}
    for r in rows:
        counts[r["digit"]] = counts.get(r["digit"], 0) + r["cnt"]
    n = sum(counts.values())
    digits = [str(i) for i in range(1, 10)]
    obs = np.array([counts[d] for d in digits], np.float64)
    exp = np.array([np.log10(1 + 1 / int(d)) for d in digits]) * n
    chi2 = float(((obs - exp) ** 2 / exp).sum()) if n else 0.0
    return pa.table({
        "digit": pa.array([int(d) for d in digits], pa.int64()),
        "cnt": pa.array(obs.astype(np.int64)),
        "chi2": pa.array([round(chi2, 6)] * 9, pa.float64()),
    })


def inclusion_report(pairs, n_buckets: int = 64,
                     batch_size: int | None = 65536) -> pa.Table:
    """Inclusion-dependency (FK) discovery: for each candidate
    ``(label, fact_ds, fact_col, dim_ds, dim_col)`` pair, the exact
    containment coefficient — what fraction of the fact side's
    DISTINCT non-null values appear in the dim side — plus the binary
    inclusion verdict.  The profiling complement of
    :func:`referential_check`, which verifies one DECLARED key; this
    scores a candidate lattice (the Metanome/SPIDER problem).

    All pairs share ONE hash-bucket exchange: each input ships its
    per-batch distinct values (string-cast so mixed key types
    coexist), tagged (pair_id, side); per bucket a vectorized group_by
    computes per-value fact/dim membership, and per-pair counts merge
    on the driver (pairs-sized).  Null keys are vacuous on both sides
    (the referential convention).

    Returns (pair, n_distinct, n_missing, containment, is_inclusion)
    sorted by pair label; containment = float(present)/float(distinct)
    — the int->double conversions keep a SQL twin bit-exact."""

    # Group pair-sides by Dataset IDENTITY: a table that serves several
    # candidate roles (customer as the dim of two FKs, lineitem as fact
    # of one and dim of another) is scanned ONCE and its map emits every
    # role's tagged values in the same pass — callers pass the same
    # Dataset object for the same table read.  12 single-role lineages
    # measured 6.7 s at sf0.1 from per-lineage read+task floors alone;
    # role-merged scans cut the lineage count to the table count.
    roles_by_ds: dict[int, tuple] = {}
    for pid, (label, fact, fcol, dim, dcol) in enumerate(pairs):
        roles_by_ds.setdefault(id(fact), (fact, []))[1].append((fcol, 0, pid))
        roles_by_ds.setdefault(id(dim), (dim, []))[1].append((dcol, 1, pid))

    def _mk(roles):
        def _p(t: pa.Table) -> pa.Table:
            uniq: dict[str, pa.Array] = {}
            pids, sides, vals = [], [], []
            for col, side, pid in roles:
                if col not in uniq:
                    uniq[col] = pc.unique(t.column(col).combine_chunks()
                                          .drop_null().cast(pa.string()))
                v = uniq[col]
                pids.append(np.full(len(v), pid, np.int64))
                sides.append(np.full(len(v), side, np.int8))
                vals.append(v)
            return pa.table({
                "pid": pa.array(np.concatenate(pids)),
                "side": pa.array(np.concatenate(sides)),
                "value": pa.concat_arrays(
                    [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                     else v for v in vals]),
            })
        return _p

    streams = [ds.map_batches(_mk(roles), batch_format="pyarrow",
                              batch_size=batch_size)
               for ds, roles in roles_by_ds.values()]
    allv = streams[0]
    for s in streams[1:]:
        allv = allv.union(s)

    def _bucket(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("pid").combine_chunks().cast(pa.string()),
            t.column("value").combine_chunks(), ":")
        return t.append_column("bucket", bucket_of(k, n_buckets))

    def _counts(group: pa.Table) -> pa.Table:
        g = (group.select(["pid", "value", "side"])
             .group_by(["pid", "value"])
             .aggregate([("side", "min"), ("side", "max")]))
        in_fact = pc.equal(g.column("side_min"), 0)
        only_fact = pc.and_(in_fact, pc.equal(g.column("side_max"), 0))
        gg = pa.table({
            "pid": g.column("pid"),
            "d": in_fact.cast(pa.int64()),
            "miss": only_fact.cast(pa.int64()),
        }).group_by(["pid"]).aggregate([("d", "sum"), ("miss", "sum")])
        return gg.rename_columns(["pid", "d", "miss"])

    merged: dict[int, list] = {}
    # bundle the exchange map side (tiny per-batch distinct blocks
    # otherwise pay the ~40 ms-per-block exchange floor — CLAUDE rule)
    from peri_ray.stages.dedup import EXCHANGE_COALESCE_ROWS

    for r in (allv.map_batches(_bucket, batch_format="pyarrow",
                               batch_size=EXCHANGE_COALESCE_ROWS)
              .groupby("bucket").map_groups(_counts,
                                            batch_format="pyarrow")
              .iter_rows()):
        s = merged.setdefault(r["pid"], [0, 0])
        s[0] += r["d"]
        s[1] += r["miss"]

    labels = [p[0] for p in pairs]
    order = sorted(range(len(labels)), key=labels.__getitem__)
    nd = [merged.get(i, [0, 0])[0] for i in order]
    nm = [merged.get(i, [0, 0])[1] for i in order]
    return pa.table({
        "pair": pa.array([labels[i] for i in order], pa.string()),
        "n_distinct": pa.array(nd, pa.int64()),
        "n_missing": pa.array(nm, pa.int64()),
        "containment": pa.array(
            [float(d - m) / float(d) if d else None
             for d, m in zip(nd, nm)], pa.float64()),
        "is_inclusion": pa.array([m == 0 and d > 0
                                  for d, m in zip(nd, nm)], pa.bool_()),
    })


def fd_report(candidates, n_buckets: int = 64,
              batch_size: int | None = 65536) -> pa.Table:
    """Functional-dependency discovery: for each candidate
    ``(label, ds, lhs_col, rhs_col)``, does LHS determine RHS —
    exactly how many distinct LHS values map to MORE than one distinct
    RHS value?  With :func:`unique_columns_report` (candidate keys /
    UCCs) and :func:`inclusion_report` (INDs / FKs) this completes the
    classic data-profiling trio (the TANE/Metanome problem), feeding
    spec inference: a holding FD becomes a dependent-field rule.

    All candidates share ONE hash-bucket exchange: each input ships
    its per-batch DISTINCT (cid, lhs, rhs) value pairs string-cast —
    never raw rows — keyed on (cid, lhs) so every RHS of a given LHS
    value co-locates; per bucket a vectorized double group_by counts
    distinct RHS per LHS, and per-candidate (n_lhs, n_violating)
    partials merge on the driver (candidates-sized).  Rows with a
    null LHS or RHS are vacuous (the SQL GROUP BY convention this
    twins against).

    Returns (pair, lhs_distinct, violating_lhs, fd_holds) sorted by
    label; fd_holds = violating_lhs == 0 AND lhs_distinct > 0."""

    def _mk(lcol: str, rcol: str, cid: int):
        def _p(t: pa.Table) -> pa.Table:
            lv = t.column(lcol).combine_chunks().cast(pa.string())
            rv = t.column(rcol).combine_chunks().cast(pa.string())
            ok = pc.and_(pc.is_valid(lv), pc.is_valid(rv))
            d = (pa.table({"l": lv, "r": rv}).filter(ok)
                 .group_by(["l", "r"]).aggregate([]))
            return pa.table({
                "cid": pa.array(np.full(d.num_rows, cid, np.int64)),
                "l": d.column("l"),
                "r": d.column("r"),
            })
        return _p

    streams = []
    for cid, (label, ds, lcol, rcol) in enumerate(candidates):
        streams.append(ds.map_batches(_mk(lcol, rcol, cid),
                                      batch_format="pyarrow",
                                      batch_size=batch_size))
    allv = streams[0]
    for s in streams[1:]:
        allv = allv.union(s)

    def _bucket(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("cid").combine_chunks().cast(pa.string()),
            t.column("l").combine_chunks(), ":")
        return t.append_column("bucket", bucket_of(k, n_buckets))

    def _counts(group: pa.Table) -> pa.Table:
        d = (group.select(["cid", "l", "r"])
             .group_by(["cid", "l", "r"]).aggregate([]))
        per_l = (d.group_by(["cid", "l"])
                 .aggregate([("r", "count")]))
        viol = pc.greater(per_l.column("r_count"), pa.scalar(1))
        gg = pa.table({
            "cid": per_l.column("cid"),
            "nl": pa.array(np.ones(per_l.num_rows, np.int64)),
            "nv": viol.cast(pa.int64()),
        }).group_by(["cid"]).aggregate([("nl", "sum"), ("nv", "sum")])
        return gg.rename_columns(["cid", "nl", "nv"])

    merged: dict[int, list] = {}
    for r in (allv.map_batches(_bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(_counts,
                                            batch_format="pyarrow")
              .iter_rows()):
        s = merged.setdefault(r["cid"], [0, 0])
        s[0] += r["nl"]
        s[1] += r["nv"]

    labels = [c[0] for c in candidates]
    order = sorted(range(len(labels)), key=labels.__getitem__)
    nl = [merged.get(i, [0, 0])[0] for i in order]
    nv = [merged.get(i, [0, 0])[1] for i in order]
    return pa.table({
        "pair": pa.array([labels[i] for i in order], pa.string()),
        "lhs_distinct": pa.array(nl, pa.int64()),
        "violating_lhs": pa.array(nv, pa.int64()),
        "fd_holds": pa.array([v == 0 and d > 0
                              for d, v in zip(nl, nv)], pa.bool_()),
    })


def reconciliation_check(detail, master, key_col: str,
                         detail_cents_col: str, master_cents_col: str,
                         tol_cents: int = 0,
                         n_buckets: int = 64,
                         batch_size: int | None = 65536) -> "Any":
    """Cross-table aggregate reconciliation: for every master row,
    does the sum of its detail rows' amount equal the declared total
    (within ``tol_cents``)?  The invoice-vs-line-items audit — the
    aggregate complement of :func:`referential_check` (which verifies
    the keys exist; this verifies the MONEY adds up).

    Both sides arrive as (key, integer-cents) — callers convert money
    with the half-away cents recipe so sums are order-independent and
    hash-exact.  The detail side pre-aggregates per batch map-side
    (one partial row per key per block), then ONE tagged hash-bucket
    exchange co-locates partials with their master row; per bucket a
    vectorized group_by + left join computes each master key's total
    (0 when no detail rows exist — LEFT JOIN COALESCE semantics) and
    only rows breaching the tolerance leave the bucket.  Master keys
    must be unique (the PK side); duplicate master keys would each be
    reported against the same detail total.

    Returns a violations Dataset (key, declared_cents, computed_cents,
    diff_cents), diff = declared - computed."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _det(t: pa.Table) -> pa.Table:
        d = (t.select([key_col, detail_cents_col])
             .group_by(key_col).aggregate([(detail_cents_col, "sum")]))
        return pa.table({
            "k": d.column(key_col).combine_chunks().cast(pa.int64()),
            "cents": d.column(f"{detail_cents_col}_sum").cast(pa.int64()),
            "declared": pa.nulls(d.num_rows, pa.int64()),
            "side": pa.array(np.zeros(d.num_rows, np.int8)),
        })

    def _mas(t: pa.Table) -> pa.Table:
        # an explicit side tag, NOT is_valid(declared): a master row
        # with a NULL declared total must stay a master and be
        # REPORTED (it cannot reconcile), not silently re-routed to
        # the detail side
        return pa.table({
            "k": t.column(key_col).combine_chunks().cast(pa.int64()),
            "cents": pa.nulls(t.num_rows, pa.int64()),
            "declared": t.column(master_cents_col).combine_chunks()
                        .cast(pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        })

    tagged = (detail.map_batches(_det, batch_format="pyarrow",
                                 batch_size=batch_size)
              .union(master.map_batches(_mas, batch_format="pyarrow",
                                        batch_size=batch_size)))

    def _judge(bucket: pa.Table) -> pa.Table:
        ism = pc.equal(bucket.column("side").combine_chunks(),
                       pa.scalar(1, pa.int8()))
        mas = bucket.filter(ism).select(["k", "declared"])
        det = (bucket.filter(pc.invert(ism)).select(["k", "cents"])
               .group_by("k").aggregate([("cents", "sum")]))
        j = mas.join(det, keys="k", join_type="left outer")
        computed = pc.fill_null(j.column("cents_sum"),
                                pa.scalar(0, pa.int64()))
        diff = pc.subtract(j.column("declared"), computed)
        # a NULL declared total can never reconcile: report it (diff
        # rides as null)
        bad = pc.or_kleene(
            pc.greater(pc.abs(diff),
                       pa.scalar(int(tol_cents), pa.int64())),
            pc.is_null(j.column("declared")))
        out = pa.table({
            "key": j.column("k"),
            "declared_cents": j.column("declared"),
            "computed_cents": computed,
            "diff_cents": diff,
        }).filter(bad)
        return out

    return map_groups_via_buckets(tagged, ["k"], _judge, n_buckets,
                                  coalesce_rows=batch_size)


def pattern_profile(ds, column: str, max_patterns: int = 10_000,
                    batch_size: int | None = 65536) -> pa.Table:
    """Format-pattern discovery for a string column (the Potter's
    Wheel structure-extraction audit): each value collapses to a
    pattern signature — uppercase runs → ``A``, lowercase runs →
    ``a``, digit runs → ``9``, everything else (punctuation,
    separators) kept verbatim — and the profile is the exact count
    per signature.  ``http://www.h7.example.com:80/p/1?b=3&a=1``
    becomes ``a://a.a9.a.a:9/a/9?a=9&a=9``; a column whose values
    split over many signatures has a format problem, and a NEW
    signature between snapshots is a drift incident.

    The three replacements are anchored RE2 class runs applied in a
    fixed order on both sides (Arrow replace_substring_regex and SQL
    regexp_replace 'g' agree on them), so a DuckDB twin is exact.
    Nulls are skipped (profile the null rate with column_stats).

    Shape: per-batch (pattern, count) partials merge on the driver —
    bounded by the signature domain, which is format-small by
    construction; raises past ``max_patterns`` (a column where every
    value has a unique SIGNATURE is free text, not a formatted
    field)."""

    def _part(t: pa.Table) -> pa.Table:
        v = t.column(column).combine_chunks().cast(pa.string()).drop_null()
        sig = pc.replace_substring_regex(v, "[A-Z]+", "A")
        sig = pc.replace_substring_regex(sig, "[a-z]+", "a")
        sig = pc.replace_substring_regex(sig, "[0-9]+", "9")
        g = (pa.table({"pattern": sig}).group_by("pattern")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["pattern", "cnt"])

    merged: dict[str, int] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        merged[r["pattern"]] = merged.get(r["pattern"], 0) + r["cnt"]
        if len(merged) > max_patterns:
            raise ValueError(
                f"pattern_profile: over {max_patterns} distinct "
                f"signatures in {column!r}; this is free text, not a "
                f"formatted field")
    pats = sorted(merged)
    return pa.table({
        "column": pa.array([column] * len(pats), pa.string()),
        "pattern": pa.array(pats, pa.string()),
        "cnt": pa.array([merged[p] for p in pats], pa.int64()),
    })


def clamp_repair(ds, column: str, lo: float, hi: float,
                 batch_size: int | None = 65536):
    """Constraint-driven numeric repair: clamp every non-null value of
    ``column`` into [lo, hi] (the winsorize-to-spec fix for range
    violations; :func:`repair_enum` is the categorical sibling).
    Nulls pass through — required/default handling is the spec's job.
    One vectorized min/max per batch, zero shuffle; NaN compares
    false on both sides and passes through unrepaired (a NaN is a
    type problem, not a range problem — validation still flags it)."""
    if not lo <= hi:
        raise ValueError("clamp_repair: lo must be <= hi")

    def _fix(t: pa.Table) -> pa.Table:
        c = t.column(column).combine_chunks()
        fixed = pc.if_else(pc.less(c, pa.scalar(lo, c.type)),
                           pa.scalar(lo, c.type), c)
        fixed = pc.if_else(pc.greater(fixed, pa.scalar(hi, c.type)),
                           pa.scalar(hi, c.type), fixed)
        i = t.schema.get_field_index(column)
        return t.set_column(i, column, fixed)

    return ds.map_batches(_fix, batch_format="pyarrow",
                          batch_size=batch_size)


def hll_overlap_estimate(ds_a, ds_b, col_a: str, col_b: str,
                         p: int = 14,
                         batch_size: int | None = 65536) -> pa.Table:
    """Sketch-estimated set overlap between two corpora (recrawl vs
    base URL overlap, train-vs-eval id leakage triage) with ZERO
    exchange: one HyperLogLog per side from per-block partial
    sketches (HLLs merge by register max), and

        |A∩B| ≈ |A| + |B| − |A∪B|

    by inclusion–exclusion on the merged union sketch.  At p=14 the
    per-set error is ~0.8%, so the intersection estimate degrades as
    the true overlap shrinks relative to the set sizes — this is the
    cheap TRIAGE; the exact path is the bucketed semi join / Bloom
    probe when the estimate says the overlap matters.  Null values
    are vacuous.  Returns one row: (ndv_a, ndv_b, ndv_union,
    est_overlap, est_containment_a) — containment = overlap/ndv_a,
    the fraction of A already present in B."""
    import pickle

    from peri_ray.state.sketches import HLL, hash_strings

    def _sketch(col):
        def _p(t: pa.Table) -> pa.Table:
            h = HLL(p=p)
            v = (t.column(col).combine_chunks().cast(pa.string())
                 .drop_null())
            if len(v):
                h.add_hashes(hash_strings(v))
            return pa.table({"blob": pa.array([pickle.dumps(h)],
                                              pa.binary())})
        return _p

    def _merged(ds, col) -> "HLL":
        acc = HLL(p=p)
        for r in ds.map_batches(_sketch(col), batch_format="pyarrow",
                                batch_size=batch_size).iter_rows():
            acc = acc.merge(pickle.loads(r["blob"]))
        return acc

    ha = _merged(ds_a, col_a)
    hb = _merged(ds_b, col_b)
    na, nb = ha.estimate(), hb.estimate()
    nu = ha.merge(hb).estimate()
    ov = max(0.0, na + nb - nu)
    return pa.table({
        "ndv_a": pa.array([na], pa.float64()),
        "ndv_b": pa.array([nb], pa.float64()),
        "ndv_union": pa.array([nu], pa.float64()),
        "est_overlap": pa.array([ov], pa.float64()),
        "est_containment_a": pa.array(
            [ov / na if na > 0 else None], pa.float64()),
    })


def takedown_purge(ds, tombstones, text_col: str = "text",
                   id_col: str = "doc_id",
                   batch_size: int | None = 65536):
    """Deletion-compliance purge (GDPR erasure / DMCA takedown over a
    web corpus): drop every tombstoned document AND every verbatim
    copy of its content elsewhere in the corpus — removing only the
    listed ids leaves the content alive under other urls, which fails
    the compliance requirement.

    ``tombstones`` is a Dataset of (id) — side-input scale (a legal
    takedown list).  Two broadcast passes, zero shuffle: pass 1
    collects the tombstoned docs' texts (bounded by the takedown
    list); the id set and text set then broadcast in task closures
    and pass 2 filters survivors.  At a takedown list too large to
    broadcast, swap pass 2's membership test for the bucketed semi
    join (:func:`peri_ray.stages.joins.hash_join` anti) — documented
    seam, same semantics.  Returns the surviving rows (all input
    columns)."""
    dead_ids = set()
    for r in tombstones.iter_rows():
        dead_ids.add(int(r[id_col]))
    if not dead_ids:
        return ds
    dead_arr = pa.array(sorted(dead_ids), pa.int64())

    def _texts(t: pa.Table) -> pa.Table:
        m = t.filter(pc.is_in(
            t.column(id_col).combine_chunks().cast(pa.int64()),
            value_set=dead_arr))
        return pa.table({"v": pc.unique(
            m.column(text_col).combine_chunks().cast(pa.string())
            .drop_null())})

    dead_texts = set()
    for r in ds.map_batches(_texts, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        dead_texts.add(r["v"])
    text_arr = pa.array(sorted(dead_texts), pa.string())

    def _survivors(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks().cast(pa.int64())
        txt = t.column(text_col).combine_chunks().cast(pa.string())
        dead = pc.or_kleene(
            pc.is_in(ids, value_set=dead_arr),
            pc.fill_null(pc.is_in(txt, value_set=text_arr), False))
        return t.filter(pc.invert(dead))

    return ds.map_batches(_survivors, batch_format="pyarrow",
                          batch_size=batch_size)


def welch_t_two_sample(ds, column: str, split_col: str,
                       split_mod: int = 2, scale: int = 100,
                       batch_size: int | None = 65536) -> pa.Table:
    """Welch's unequal-variance t statistic between two deterministic
    subsets of one Dataset — the parametric mean-shift member of the
    drift family (KS = shape, W1 = mass transport, this = "did the
    MEAN move, scaled by the noise").  side = split_col % split_mod
    (0 vs 1); values quantize to round(v*scale) integer units, so the
    moment partials (n, Σc, Σc²) are exact integers merged as Python
    ints (overflow-free at any row count), and every emitted double is
    one fixed-order expression over those exact ints — bit-identical
    to the HUGEINT SQL twin with NO rounding fudge.

    Output one row: (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
    df) in the quantized unit; t/df null when either side has < 2
    rows.  Shape: per-batch 2×3-int partials + driver merge — zero
    shuffles at any scale."""
    q = _quantize_to_int(scale)

    def _part(t: pa.Table) -> pa.Table:
        col = t.column(column).combine_chunks()
        ok = pc.is_valid(col)
        sub = t.filter(ok)
        if sub.num_rows == 0:
            return pa.table({"side": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.int64()),
                             "s2": pa.array([], pa.int64())})
        c = q(sub.column(column).combine_chunks())
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        sv = (sub.column(split_col).combine_chunks().cast(pa.int64())
              .to_numpy(zero_copy_only=False) % split_mod)
        cn = c.to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.table({"side": pa.array(sv, pa.int64()),
                      "c": pa.array(cn),
                      "cc": pa.array(cn * cn)}) \
            .group_by("side").aggregate([("c", "sum"), ("cc", "sum"),
                                         ([], "count_all")])
        return pa.table({"side": g.column("side"),
                         "n": g.column("count_all").cast(pa.int64()),
                         "s1": g.column("c_sum").cast(pa.int64()),
                         "s2": g.column("cc_sum").cast(pa.int64())})

    mom = {0: [0, 0, 0], 1: [0, 0, 0]}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        m = mom.setdefault(int(r["side"]), [0, 0, 0])
        m[0] += int(r["n"])
        m[1] += int(r["s1"])
        m[2] += int(r["s2"])

    import math

    def _stats(m):
        n, s1, s2 = m
        if n == 0:
            return None, None
        mean = float(s1) / float(n)
        if n < 2:
            return mean, None
        var = float(n * s2 - s1 * s1) / float(n * (n - 1))
        return mean, var

    (na, _, _), (nb, _, _) = mom[0], mom[1]
    mean_a, var_a = _stats(mom[0])
    mean_b, var_b = _stats(mom[1])
    t_stat = dfv = None
    if var_a is not None and var_b is not None:
        va_n = var_a / float(na)
        vb_n = var_b / float(nb)
        se = math.sqrt(va_n + vb_n)
        if se > 0:
            t_stat = (mean_a - mean_b) / se
            dfv = ((va_n + vb_n) * (va_n + vb_n)) / (
                (va_n * va_n) / float(na - 1)
                + (vb_n * vb_n) / float(nb - 1))
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "mean_a": pa.array([mean_a], pa.float64()),
        "mean_b": pa.array([mean_b], pa.float64()),
        "var_a": pa.array([var_a], pa.float64()),
        "var_b": pa.array([var_b], pa.float64()),
        "t_stat": pa.array([t_stat], pa.float64()),
        "df": pa.array([dfv], pa.float64()),
    })


def tv_hellinger_drift(ds, key_col: str, split_col: str,
                       split_mod: int = 2,
                       batch_size: int | None = 65536) -> pa.Table:
    """Total-variation + Hellinger distance between the categorical
    distributions of two deterministic row halves (``split_col %
    split_mod`` parity) — the bounded-metric corner of the drift
    family (TV is the max-event probability gap; Hellinger the
    bounded geometric one; PSI/KL are their unbounded cousins).

    One streaming (side, key) count pass, driver merge bounded by the
    category domain.  TV is computed from the INTEGER identity
    ``Σ|c_a·n_b − c_b·n_a| / (2·n_a·n_b)`` — exact integer numerator,
    one IEEE division, hash-bit-exact.  Hellinger sums irrational
    square roots, so it rounds to 6 half-away (cannot tie).  Null
    categories are excluded (SQL join parity)."""
    def _part(t: pa.Table) -> pa.Table:
        k = t.column(key_col).combine_chunks()
        s = t.column(split_col).combine_chunks()
        sub = pa.table({"k": k, "s": s}).filter(
            pc.and_(pc.is_valid(k), pc.is_valid(s)))
        # C-style truncated modulo (np.fmod), NOT Python/numpy floor
        # modulo: SQL's `id % 2 = 0/1` drops negative keys from BOTH
        # halves (-3 % 2 = -1 in DuckDB), while floor modulo would
        # silently route them to side 1 (ADVICE r3)
        ids = (sub.column("s").combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        side = np.fmod(ids, split_mod).astype(np.int64)
        keep = (side >= 0) & (side < split_mod)
        sub = pa.table({"k": sub.column("k").combine_chunks()
                        .filter(pa.array(keep)),
                        "side": pa.array(side[keep])})
        g = sub.group_by(["k", "side"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "side", "c"])

    import math

    import ray

    parts = ds.map_batches(_part, batch_format="pyarrow",
                           batch_size=batch_size)
    ca: dict = {}
    cb: dict = {}
    for t in (ray.get(r) for r in parts.to_arrow_refs()):
        for k, side, c in zip(t.column("k").to_pylist(),
                              t.column("side").to_pylist(),
                              t.column("c").to_pylist()):
            d = ca if side == 0 else cb
            d[k] = d.get(k, 0) + int(c)
    na, nb = sum(ca.values()), sum(cb.values())
    if na == 0 or nb == 0:
        return pa.table({"tv": pa.array([None], pa.float64()),
                         "hellinger": pa.array([None], pa.float64())})
    keys = sorted(set(ca) | set(cb))
    num = sum(abs(ca.get(k, 0) * nb - cb.get(k, 0) * na) for k in keys)
    tv = float(num) / float(2 * na * nb)
    bc = sum(math.sqrt((float(ca.get(k, 0)) / float(na))
                       * (float(cb.get(k, 0)) / float(nb)))
             for k in keys)
    h = math.sqrt(max(0.0, 1.0 - bc))
    # half-away like SQL ROUND (irrational — cannot tie)
    hr = math.floor(h * 1e6 + 0.5) / 1e6
    return pa.table({"tv": pa.array([tv], pa.float64()),
                     "hellinger": pa.array([hr], pa.float64())})
