"""Temporal operators the Dataset API lacks as primitives — windowed
aggregation, gap sessionization, as-of join — built as compositions of
``map_batches`` partials + bucketed ``groupby``/``map_groups`` per the
custom-operator rule (SURVEY §7; prompt: "windowed aggregate, as-of
join" as first-class custom operators).

Partitioning assumptions, stated explicitly:

- ``tumbling_window_counts``: two-phase — per-batch partials collapse
  each block to its distinct (window, key) rows before ONE small
  groupby; assumes windows × keys ≪ rows (true for dashboards/drift
  inputs; for high-cardinality keys the same shuffle is the cost any
  engine pays).
- ``sessionize``: assumes one user's events fit one group (the
  ``groupby(user)`` exchange co-locates them); per-group work is
  vectorized numpy over sorted timestamps.
- ``asof_join``: both sides hash-bucket on the join key (the
  referential-check exchange shape); per bucket, rights sort once per
  key and every left row binary-searches its floor match.  Assumes a
  key's rows fit one bucket group — salt the key upstream if one key
  dominates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.stages.checks import bucket_of

# Bundle the exchange map side: Ray's CPU-targeted splitting leaves
# small inputs as ~2xCPU tiny blocks and every tag task pays a ~40 ms
# floor; the asof/range reduce is cheap (vectorized searchsorted per
# bucket), so a COARSE bundle is right here (contrast dedup's fine
# bundles for heavy-reduce exchanges).
EXCHANGE_COALESCE_ROWS = 65536


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Callers must have dropped nulls: a null timestamp surfaces as
    NaN in the float64 to_numpy result and any int64 rebuild raises."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _drop_null_ts(t: pa.Table, ts_col: str) -> pa.Table:
    """Rows with a null event time carry no position on the time axis:
    window partials, as-of probes and range counts all exclude them
    (documented; emitting SQL's null-match rows instead would need a
    separate null-pass lane)."""
    return t.filter(pc.is_valid(t.column(ts_col).combine_chunks()))


# ---------------------------------------------------------------------------
# tumbling-window aggregate
# ---------------------------------------------------------------------------


class _WindowCountPartial:
    """Batch → (window_start, key, cnt) partials: each block collapses
    to its distinct (window, key) pairs before the exchange."""

    def __init__(self, ts_col: str, key_col: str, window_s: int):
        self.ts_col = ts_col
        self.key_col = key_col
        self.window_us = window_s * 1_000_000

    def __call__(self, t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, self.ts_col)
        us = _epoch_us(t.column(self.ts_col))
        # window index × window seconds = window start in epoch seconds
        win = (us // self.window_us) * np.int64(self.window_us // 1_000_000)
        part = pa.table({
            "window_start": pa.array(win, pa.int64()),
            self.key_col: t.column(self.key_col),
            # count via a constant: Arrow's "count" skips nulls, which
            # would zero out a null-key group (SQL count(*) does not)
            "__one": pa.array(np.ones(t.num_rows, np.int64)),
        })
        g = part.group_by(["window_start", self.key_col]).aggregate(
            [("__one", "sum")])
        return g.rename_columns(["window_start", self.key_col, "cnt"])


def tumbling_window_counts(ds, ts_col: str = "ts", key_col: str = "event_type",
                           window_s: int = 3600,
                           batch_size: int | None = 65536):
    """Events per (tumbling window, key).  ``window_start`` is epoch
    seconds floored to the window.  Two-phase: vectorized per-batch
    partials, then one small groupby-sum over (windows × keys) rows."""
    partials = ds.map_batches(_WindowCountPartial(ts_col, key_col, window_s),
                              batch_format="pyarrow", batch_size=batch_size)
    totals = partials.groupby(["window_start", key_col]).sum("cnt")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["window_start", key_col, "cnt"])

    return totals.map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# gap sessionization
# ---------------------------------------------------------------------------


def sessionize(ds, ts_col: str = "ts", user_col: str = "user_id",
               gap_s: int = 1800):
    """Gap-based sessions per user: a new session starts when the gap
    to the previous event exceeds ``gap_s``.  Returns one row per
    (user, session): session_id (1-based in time order), n_events,
    session start/end timestamps.

    Shape: ``groupby(user)`` co-locates each user's events (ONE
    exchange); inside the group everything is numpy over the sorted
    timestamp vector.  Session identity depends only on timestamp
    VALUES, so equal-timestamp orderings cannot change the result."""
    gap_us = gap_s * 1_000_000

    def _sessions(group: pa.Table) -> pa.Table:
        # null user/ts guard (same hazard interarrival documents: a
        # null int64 becomes NaN via to_numpy and the int64 rebuild of
        # the output raises ArrowInvalid, killing the whole job)
        group = group.filter(pc.and_(
            pc.is_valid(group.column(ts_col)),
            pc.is_valid(group.column(user_col))))
        ts = group.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = group.column(user_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        # sort by (user, ts): a group may hold several users when the
        # groupby packs small keys together
        order = np.lexsort((us, users))
        us, users = us[order], users[order]
        brk = np.ones(len(us), bool)
        if len(us) > 1:
            brk[1:] = (users[1:] != users[:-1]) | ((us[1:] - us[:-1]) > gap_us)
        sess = np.cumsum(brk)
        # session ids restart per user (1-based)
        first_of_user = np.ones(len(us), bool)
        if len(us) > 1:
            first_of_user[1:] = users[1:] != users[:-1]
        user_base = np.maximum.accumulate(np.where(first_of_user, sess - 1, 0))
        sid = sess - user_base
        # aggregate per (user, sess)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(us))
        return pa.table({
            user_col: pa.array(users[starts], pa.int64()),
            "session_id": pa.array(sid[starts], pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "session_start": pa.array(us[starts], pa.int64()).cast(
                pa.timestamp("us")),
            "session_end": pa.array(us[ends - 1], pa.int64()).cast(
                pa.timestamp("us")),
        })

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([user_col, ts_col]), [user_col], _sessions)


# ---------------------------------------------------------------------------
# windowed drift (tumbling-window PSI vs a reference histogram)
# ---------------------------------------------------------------------------


def windowed_drift(ds, ts_col: str, key_col: str,
                   reference: dict[str, float], window_s: int = 86400,
                   threshold: float = 0.25, eps: float = 1e-6):
    """Distribution drift scored PER TUMBLING WINDOW: PSI of each
    window's key histogram against ``reference`` — the time-resolved
    form of the global drift check (a day of bad ingestion hides inside
    a month-level histogram).

    Shape: the tumbling-window partials collapse each block first, one
    small groupby co-locates each window's (key, cnt) rows, and the PSI
    fold is a few-row computation per window group; the tiny reference
    dict travels in the task closure."""
    import math

    counts = tumbling_window_counts(ds, ts_col, key_col, window_s)
    # normalize like checks.psi does — a count-style reference would
    # otherwise silently produce garbage scores (q in the log-ratio
    # must be a probability)
    ref_tot = sum(reference.values()) or 1.0
    reference = {k: v / ref_tot for k, v in reference.items()}

    def _psi(group: pa.Table) -> pa.Table:
        obs = {r[key_col]: r["cnt"] for r in group.to_pylist()}
        w = group.column("window_start")[0].as_py()
        tot = sum(obs.values()) or 1.0
        score = 0.0
        for c in set(obs) | set(reference):
            p = max(obs.get(c, 0) / tot, eps)
            q = max(reference.get(c, 0.0), eps)
            score += (p - q) * math.log(p / q)
        return pa.table({
            "window_start": pa.array([w], pa.int64()),
            "psi": pa.array([round(score, 6)], pa.float64()),
            "passed": pa.array([score <= threshold], pa.bool_()),
        })

    return counts.groupby("window_start").map_groups(_psi, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# range join (interval count per left row)
# ---------------------------------------------------------------------------


def range_join_count(left, right, left_key: str, right_key: str,
                     left_ts: str, right_ts: str,
                     lo_offset_s: float, hi_offset_s: float,
                     left_cols: list[str] | None = None,
                     out_col: str = "n_in_range", n_buckets: int = 64):
    """For every left row, the COUNT of right rows sharing the join key
    with ``right_ts`` in [left_ts + lo_offset, left_ts + hi_offset]
    (inclusive) — the interval/range join as a custom operator.

    Same exchange shape as :func:`asof_join`: both sides hash-bucket on
    the key; per bucket the right side sorts once per key and every
    left key-segment resolves with two vectorized ``searchsorted``."""
    left_cols = left_cols or []
    lo_us = int(lo_offset_s * 1_000_000)
    hi_us = int(hi_offset_s * 1_000_000)

    def _tag_left(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, left_ts)
        t = t.filter(pc.is_valid(t.column(left_key).combine_chunks()))
        cols = {c: t.column(c) for c in left_cols}
        cols["__key"] = t.column(left_key).combine_chunks().cast(pa.int64())
        cols["__ts"] = pa.array(_epoch_us(t.column(left_ts)), pa.int64())
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket",
                                 bucket_of(out.column("__key"), n_buckets))

    left_types = {c: left.schema().types[left.schema().names.index(c)]
                  for c in left_cols}

    def _tag_right(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, right_ts)
        t = t.filter(pc.is_valid(t.column(right_key).combine_chunks()))
        cols = {c: pa.nulls(t.num_rows, left_types[c]) for c in left_cols}
        cols["__key"] = t.column(right_key).combine_chunks().cast(pa.int64())
        cols["__ts"] = pa.array(_epoch_us(t.column(right_ts)), pa.int64())
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket",
                                 bucket_of(out.column("__key"), n_buckets))

    both = (left.map_batches(_tag_left, batch_format="pyarrow",
                             batch_size=EXCHANGE_COALESCE_ROWS)
            .union(right.map_batches(_tag_right, batch_format="pyarrow",
                                     batch_size=EXCHANGE_COALESCE_ROWS)))

    def _count(group: pa.Table) -> pa.Table:
        side = group.column("__side").combine_chunks().to_numpy(
            zero_copy_only=False)
        keys = group.column("__key").combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = group.column("__ts").combine_chunks().to_numpy(
            zero_copy_only=False)
        is_r = side == 1
        rk, rts = keys[is_r], ts[is_r]
        r_order = np.lexsort((rts, rk))
        rk, rts = rk[r_order], rts[r_order]
        li = np.flatnonzero(~is_r)
        lk, lts = keys[li], ts[li]
        n_in = np.zeros(len(li), np.int64)
        if len(rk) and len(li):
            lo = np.searchsorted(rk, lk, side="left")
            hi = np.searchsorted(rk, lk, side="right")
            order = np.argsort(lk, kind="stable")
            seg_starts = np.flatnonzero(
                np.concatenate(([True], lk[order][1:] != lk[order][:-1])))
            seg_ends = np.append(seg_starts[1:], len(order))
            for s, e in zip(seg_starts, seg_ends):
                rows = order[s:e]
                a, b = lo[rows[0]], hi[rows[0]]
                if a == b:
                    continue
                seg = rts[a:b]
                upper = np.searchsorted(seg, lts[rows] + hi_us, side="right")
                lower = np.searchsorted(seg, lts[rows] + lo_us, side="left")
                n_in[rows] = upper - lower
        out_cols = {c: group.column(c).combine_chunks().take(
            pa.array(li, pa.int64())) for c in left_cols}
        out_cols[out_col] = pa.array(n_in)
        return pa.table(out_cols)

    return both.groupby("__bucket").map_groups(_count, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join(left, right, left_key: str, right_key: str,
              left_ts: str, right_ts: str,
              left_cols: list[str] | None = None,
              out_col: str = "asof_ts", n_buckets: int = 64,
              direction: str = "backward"):
    """For every left row, the greatest ``right_ts`` ≤ ``left_ts``
    among right rows sharing the join key (DuckDB/kdb ASOF LEFT JOIN
    semantics); null when no prior right row exists.
    ``direction="forward"`` flips the floor to a ceiling: the SMALLEST
    ``right_ts`` ≥ ``left_ts`` (the "next scheduled event" probe;
    DuckDB ``ASOF JOIN ... ON l.ts <= r.ts``).  Left rows with a null
    key or timestamp are LEFT-JOIN kept (null match) — they bypass the
    exchange entirely instead of shipping unmatched rows through it.

    Emits the matched RIGHT TIMESTAMP (not an arbitrary right row id),
    so the result is deterministic even when several right rows tie on
    (key, ts).

    Shape: both sides hash-bucket on the key and meet in one groupby —
    only the key, the two timestamp columns and ``left_cols`` cross the
    exchange.  Per bucket: rights sort once, then each left key-segment
    resolves with one vectorized ``searchsorted``."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    forward = direction == "forward"
    left_cols = left_cols or []

    def _tag_left(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, left_ts)
        t = t.filter(pc.is_valid(t.column(left_key).combine_chunks()))
        cols = {c: t.column(c) for c in left_cols}
        cols["__key"] = t.column(left_key).combine_chunks().cast(pa.int64())
        cols["__ts"] = pa.array(_epoch_us(t.column(left_ts)), pa.int64())
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket",
                                 bucket_of(out.column("__key"), n_buckets))

    left_types = {c: left.schema().types[left.schema().names.index(c)]
                  for c in left_cols}

    def _tag_right(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, right_ts)
        t = t.filter(pc.is_valid(t.column(right_key).combine_chunks()))
        cols = {c: pa.nulls(t.num_rows, left_types[c]) for c in left_cols}
        cols["__key"] = t.column(right_key).combine_chunks().cast(pa.int64())
        cols["__ts"] = pa.array(_epoch_us(t.column(right_ts)), pa.int64())
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        out = pa.table(cols)
        return out.append_column("__bucket",
                                 bucket_of(out.column("__key"), n_buckets))

    both = (left.map_batches(_tag_left, batch_format="pyarrow",
                             batch_size=EXCHANGE_COALESCE_ROWS)
            .union(right.map_batches(_tag_right, batch_format="pyarrow",
                                     batch_size=EXCHANGE_COALESCE_ROWS)))

    def _asof(group: pa.Table) -> pa.Table:
        side = group.column("__side").combine_chunks().to_numpy(
            zero_copy_only=False)
        keys = group.column("__key").combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = group.column("__ts").combine_chunks().to_numpy(
            zero_copy_only=False)
        is_r = side == 1
        rk, rts = keys[is_r], ts[is_r]
        r_order = np.lexsort((rts, rk))
        rk, rts = rk[r_order], rts[r_order]
        li = np.flatnonzero(~is_r)
        lk, lts = keys[li], ts[li]
        matched = np.full(len(li), np.iinfo(np.int64).min, np.int64)
        if len(rk) and len(li):
            # segment bounds of each left key in the sorted right table
            lo = np.searchsorted(rk, lk, side="left")
            hi = np.searchsorted(rk, lk, side="right")
            # per distinct left key: one vectorized searchsorted over
            # that key's right slice (loop count = keys in bucket)
            order = np.argsort(lk, kind="stable")
            seg_starts = np.flatnonzero(
                np.concatenate(([True], lk[order][1:] != lk[order][:-1])))
            seg_ends = np.append(seg_starts[1:], len(order))
            for s, e in zip(seg_starts, seg_ends):
                rows = order[s:e]
                a, b = lo[rows[0]], hi[rows[0]]
                if a == b:
                    continue
                if forward:
                    pos = np.searchsorted(rts[a:b], lts[rows], side="left")
                    hit = pos < (b - a)
                    matched[rows[hit]] = rts[a:b][pos[hit]]
                else:
                    pos = np.searchsorted(rts[a:b], lts[rows], side="right")
                    hit = pos > 0
                    matched[rows[hit]] = rts[a:b][pos[hit] - 1]
        out_cols = {c: group.column(c).combine_chunks().take(
            pa.array(li, pa.int64())) for c in left_cols}
        ok = matched != np.iinfo(np.int64).min
        ts_arr = pa.array(
            np.where(ok, matched, 0), pa.int64()
        ).cast(pa.timestamp("us"))
        if not ok.all():
            ts_arr = pc.if_else(pa.array(ok), ts_arr,
                                pa.nulls(len(ok), pa.timestamp("us")))
        out_cols[out_col] = ts_arr
        return pa.table(out_cols)

    joined = both.groupby("__bucket").map_groups(_asof,
                                                 batch_format="pyarrow")

    def _null_left(t: pa.Table) -> pa.Table:
        bad = pc.or_kleene(
            pc.is_null(t.column(left_ts).combine_chunks()),
            pc.is_null(t.column(left_key).combine_chunks()))
        sub = t.filter(pc.fill_null(bad, True))
        cols = {c: sub.column(c) for c in left_cols}
        cols[out_col] = pa.nulls(sub.num_rows, pa.timestamp("us"))
        return pa.table(cols)

    unmatched = left.map_batches(_null_left, batch_format="pyarrow",
                                 batch_size=EXCHANGE_COALESCE_ROWS)
    return joined.union(unmatched)


# ---------------------------------------------------------------------------
# sliding (hopping) window aggregate
# ---------------------------------------------------------------------------


class _SlidingCountPartial:
    """Batch → (window_start, key, cnt) partials for overlapping
    windows: each event explodes to its window_s/slide_s covering
    windows (vectorized tile/repeat), then the block collapses to its
    distinct (window, key) pairs before the exchange — the exchange
    grows by the overlap factor in *distinct windows*, never in raw
    events."""

    def __init__(self, ts_col: str, key_col: str, window_s: int, slide_s: int):
        if window_s % slide_s:
            raise ValueError("window_s must be a multiple of slide_s")
        self.ts_col = ts_col
        self.key_col = key_col
        self.window_us = window_s * 1_000_000
        self.slide_us = slide_s * 1_000_000
        self.n_hops = window_s // slide_s

    def __call__(self, t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, self.ts_col)
        us = _epoch_us(t.column(self.ts_col))
        n = t.num_rows
        # latest window containing the event starts at floor(ts/slide);
        # earlier covering windows step back by slide
        base = (us // self.slide_us) * np.int64(self.slide_us)
        hops = (np.arange(self.n_hops, dtype=np.int64)
                * np.int64(self.slide_us))[:, None]
        starts = (np.tile(base, self.n_hops).reshape(self.n_hops, n) - hops)
        key = t.column(self.key_col).combine_chunks()
        part = pa.table({
            "window_start": pa.array(
                (starts.reshape(-1) // 1_000_000), pa.int64()),
            self.key_col: pa.concat_arrays([key] * self.n_hops),
            "__one": pa.array(np.ones(n * self.n_hops, np.int64)),
        })
        g = part.group_by(["window_start", self.key_col]).aggregate(
            [("__one", "sum")])
        return g.rename_columns(["window_start", self.key_col, "cnt"])


def sliding_window_counts(ds, ts_col: str = "ts", key_col: str = "event_type",
                          window_s: int = 7200, slide_s: int = 3600,
                          batch_size: int | None = 65536):
    """Events per (sliding window, key): windows of ``window_s`` seconds
    starting every ``slide_s`` seconds (``window_s % slide_s == 0``); an
    event counts toward all ``window_s/slide_s`` windows covering it.
    Same two-phase shape as :func:`tumbling_window_counts` — the only
    scale cost of the overlap is the constant explosion factor inside
    the block, collapsed to per-window partials before the shuffle."""
    partials = ds.map_batches(
        _SlidingCountPartial(ts_col, key_col, window_s, slide_s),
        batch_format="pyarrow", batch_size=batch_size)
    totals = partials.groupby(["window_start", key_col]).sum("cnt")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["window_start", key_col, "cnt"])

    return totals.map_batches(_rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-key interarrival gaps (lag/lead window family)
# ---------------------------------------------------------------------------


def interarrival_stats(ds, ts_col: str = "ts", user_col: str = "user_id"):
    """Per-user event-gap statistics — the lag()/lead() window-function
    family as a distributed operator: for each user, the count, sum and
    max of the time deltas between consecutive events (time order).

    Returns (user, n_gaps, sum_gap_us, max_gap_us); users with fewer
    than two events emit nothing.  All values are exact BIGINT
    microseconds (no float drift vs the SQL lag() twin).

    Shape: one ``groupby(user)`` exchange co-locates each user's
    (user, ts) pairs — the same shape as sessionize; inside the group
    one lexsort + vectorized diffs.  The gap multiset depends only on
    timestamp VALUES, so equal-timestamp orderings cannot change the
    result (ties contribute zero-gaps regardless of order)."""

    def _gaps(group: pa.Table) -> pa.Table:
        # explicit null-user drop (a null int64 would otherwise turn
        # into NaN via to_numpy and silently split into size-1 runs);
        # the SQL twin filters user_id IS NOT NULL identically
        g = group.filter(pc.and_(pc.is_valid(group.column(ts_col)),
                                 pc.is_valid(group.column(user_col))))
        ts = g.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        key_type = g.column(user_col).type
        users = g.column(user_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        schema = pa.schema([(user_col, key_type),
                            ("n_gaps", pa.int64()),
                            ("sum_gap_us", pa.int64()),
                            ("max_gap_us", pa.int64())])
        if len(us) == 0:
            return schema.empty_table()
        order = np.lexsort((us, users))
        us, users = us[order], users[order]
        starts = np.flatnonzero(
            np.concatenate(([True], users[1:] != users[:-1])))
        ends = np.append(starts[1:], len(us))
        d = np.diff(us)
        out_u, out_n, out_s, out_m = [], [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            # keep the key's native type (int user ids, string hosts)
            out_u.append(users[s].item() if hasattr(users[s], "item")
                         else users[s])
            out_n.append(int(e - s - 1))
            out_s.append(int(us[e - 1] - us[s]))  # telescoping: exact
            out_m.append(int(d[s:e - 1].max()))
        return pa.table({user_col: pa.array(out_u, type=key_type),
                         "n_gaps": pa.array(out_n, pa.int64()),
                         "sum_gap_us": pa.array(out_s, pa.int64()),
                         "max_gap_us": pa.array(out_m, pa.int64())})

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([user_col, ts_col]), [user_col], _gaps)


# ---------------------------------------------------------------------------
# ordered-step funnel (behavioral analytics)
# ---------------------------------------------------------------------------


def funnel_counts(ds, steps: list[str], user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type"):
    """Classic ordered funnel: for each step i, how many users
    performed step 1, then step 2, ... then step i with STRICTLY
    increasing first-occurrence timestamps.  Returns (step 1-based,
    n_users) with len(steps) rows.

    Shape: one ``groupby(user)`` exchange of pre-filtered (user, ts,
    type) rows (only the funnel's event types cross); per group the
    first-occurrence vector per user is computed with one lexsort,
    and each group emits per-step partial counts merged by one tiny
    groupby.  Tie semantics: equal timestamps do NOT advance the
    funnel (strict <), matching the SQL twin."""
    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def _prefilter(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "u": t.column(user_col).combine_chunks().cast(pa.int64()),
            "ts": t.column(ts_col).combine_chunks().cast(pa.int64()),
            "st": t.column(type_col).combine_chunks().cast(pa.string()),
        })
        keep = pc.and_(
            pc.is_in(tt.column("st"), value_set=pa.array(steps)),
            pc.and_(pc.is_valid(tt.column("u")), pc.is_valid(tt.column("ts"))))
        return tt.filter(keep)

    def _per_user(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        st = np.array([step_idx[x] for x in group.column("st").to_pylist()],
                      np.int64)
        order = np.lexsort((ts, st, u))
        u, ts, st = u[order], ts[order], st[order]
        # first occurrence per (user, step): first row of each run
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (st[1:] != st[:-1])))
        u, ts, st = u[first], ts[first], st[first]
        counts = np.zeros(n_steps, np.int64)
        ustarts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        uends = np.append(ustarts[1:], len(u))
        for s, e in zip(ustarts, uends):
            have = {int(st[i]): int(ts[i]) for i in range(s, e)}
            prev = None
            for i in range(n_steps):
                if i not in have or (prev is not None and have[i] <= prev):
                    break
                prev = have[i]
                counts[i] += 1
        return pa.table({"step": pa.array(np.arange(1, n_steps + 1)),
                         "n_users": pa.array(counts)})

    from peri_ray.stages.dedup import map_groups_via_buckets

    partials = map_groups_via_buckets(
        ds.map_batches(_prefilter, batch_format="pyarrow"), ["u"], _per_user)
    totals = partials.groupby("step").sum("n_users")

    def _final(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["step", "n_users"])
        return t.set_column(1, "n_users", t.column("n_users").cast(pa.int64()))

    return totals.map_batches(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# running totals (SUM() OVER (PARTITION BY k ORDER BY ts, id))
# ---------------------------------------------------------------------------


def running_totals(ds, user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value"):
    """Per-key running sum in event-time order — the cumulative-window
    family.  One row per input row: (id, user, run_sum_micro).

    Order is (ts, id): the id tiebreak makes the running frame — and
    therefore every intermediate total — deterministic under equal
    timestamps, so the SQL twin's ``ORDER BY ts, id`` window agrees
    row for row.  Values are fixed-pointed to BIGINT micro-units
    BEFORE accumulation: float running sums are association-order
    dependent (a prefix-difference trick or a segment-tree window
    diverges from left-to-right adds in the last ulps), and 10^4 rows
    of near-boundary roundings WILL eventually flip a hash compare —
    integers make every intermediate total exact on both engines.
    Rows with null value or null ts are excluded on both sides.

    Shape: one ``groupby(user)`` exchange; per group one lexsort +
    one ``np.cumsum`` with vectorized per-segment rebasing (exact on
    integers)."""

    def _cum(group: pa.Table) -> pa.Table:
        g = group.filter(pc.and_(
            pc.is_valid(group.column(value_col)),
            pc.is_valid(group.column(ts_col))))
        u = g.column(user_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = g.column(value_col).combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        if len(u) == 0:
            return pa.schema([(id_col, pa.int64()), (user_col, pa.int64()),
                              ("run_sum_micro", pa.int64())]).empty_table()
        # half-away-from-zero, matching SQL round() (np.round is
        # half-to-even and would disagree on exact .5 boundaries)
        s = v * 1e6
        micro = np.where(s >= 0, np.floor(s + 0.5),
                         np.ceil(s - 0.5)).astype(np.int64)
        order = np.lexsort((ids, ts, u))
        u, ids, micro = u[order], ids[order], micro[order]
        run = np.cumsum(micro)
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        base = np.repeat(np.concatenate(([0], run[starts[1:] - 1])),
                         np.diff(np.append(starts, len(u))))
        return pa.table({id_col: pa.array(ids),
                         user_col: pa.array(u),
                         "run_sum_micro": pa.array(run - base)})

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([user_col, ts_col, id_col, value_col]),
        [user_col], _cum)


def moving_window_sums(ds, window: int = 3, user_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       value_col: str = "value"):
    """Per-key moving-window aggregate in event-time order — the
    bounded-frame window family (``ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW``), complementing :func:`running_totals` (unbounded
    frame) and interarrival (lag).  One row per input row:
    (id, user, win_sum_micro, win_n).

    Same exactness contract as running_totals: values fix-point to
    BIGINT micro-units BEFORE accumulation (float window sums are
    association-order dependent), order is (ts, id) so equal
    timestamps cannot flip the frame, and rows with null user/ts/value
    are excluded on both sides.  The frame sum is two cumsum lookups
    (run[i] - run[i-window]) with per-user rebasing — O(n) per bucket
    regardless of window size.

    Shape: one ``groupby(user)`` bucketed exchange (fixed fan-out at
    any user cardinality); per bucket one lexsort + one cumsum."""
    w = int(window)

    def _win(group: pa.Table) -> pa.Table:
        g = group.filter(pc.and_(
            pc.and_(pc.is_valid(group.column(value_col)),
                    pc.is_valid(group.column(ts_col))),
            pc.is_valid(group.column(user_col))))
        u = g.column(user_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = g.column(value_col).combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        schema = pa.schema([(id_col, pa.int64()), (user_col, pa.int64()),
                            ("win_sum_micro", pa.int64()),
                            ("win_n", pa.int64())])
        if len(u) == 0:
            return schema.empty_table()
        s = v * 1e6
        micro = np.where(s >= 0, np.floor(s + 0.5),
                         np.ceil(s - 0.5)).astype(np.int64)
        order = np.lexsort((ids, ts, u))
        u, ids, micro = u[order], ids[order], micro[order]
        run = np.cumsum(micro)
        n = len(u)
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        seg_lens = np.diff(np.append(starts, n))
        seg_start = np.repeat(starts, seg_lens)
        pos = np.arange(n) - seg_start
        base = np.where(starts > 0, run[starts - 1], 0)
        run_rel = run - np.repeat(base, seg_lens)
        prev = np.where(pos >= w, run_rel[np.maximum(np.arange(n) - w, 0)], 0)
        return pa.table({id_col: pa.array(ids), user_col: pa.array(u),
                         "win_sum_micro": pa.array(run_rel - prev),
                         "win_n": pa.array(np.minimum(pos + 1, w)
                                           .astype(np.int64))})

    from peri_ray.stages.dedup import map_groups_via_buckets

    return map_groups_via_buckets(
        ds.select_columns([user_col, ts_col, id_col, value_col]),
        [user_col], _win)


# ---------------------------------------------------------------------------
# cumulative distinct users (growth accounting)
# ---------------------------------------------------------------------------


def cumulative_distinct(ds, user_col: str = "user_id", ts_col: str = "ts",
                        window_s: int = 86400):
    """Cumulative distinct-entity count per time window — "unique users
    to date".  COUNT(DISTINCT) OVER a running frame is not
    distributable directly; the standard reduction is FIRST-SEEN: each
    entity contributes exactly once, at its minimum timestamp, so the
    cumulative distinct count is the running sum of first-seen counts
    per window.

    Shape: per-batch (user, min_ts) partials collapse each block; one
    bucketed min-merge per user (fixed bucket count — user cardinality
    unbounded); per-window counts then cumsum on the driver (bounded by
    windows, not users)."""
    win_us = window_s * 1_000_000

    def _part(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "u": t.column(user_col).combine_chunks().cast(pa.int64()),
            "ts": t.column(ts_col).combine_chunks().cast(pa.int64()),
        }).filter(pc.and_(pc.is_valid(t.column(user_col).combine_chunks()),
                          pc.is_valid(t.column(ts_col).combine_chunks())))
        g = tt.group_by("u").aggregate([("ts", "min")])
        return g.rename_columns(["u", "first_us"])

    def _min_per_user(group: pa.Table) -> pa.Table:
        g = (group.select(["u", "first_us"]).group_by("u")
             .aggregate([("first_us", "min")]))
        return g.rename_columns(["u", "first_us"])

    from peri_ray.stages.dedup import map_groups_via_buckets

    firsts = map_groups_via_buckets(
        ds.map_batches(_part, batch_format="pyarrow"), ["u"], _min_per_user)

    def _day_counts(t: pa.Table) -> pa.Table:
        us = t.column("first_us").to_numpy(zero_copy_only=False)
        day = (us // win_us) * (win_us // 1_000_000)
        vals, cnts = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(vals, pa.int64()),
                         "c": pa.array(cnts, pa.int64())})

    rows = firsts.map_batches(_day_counts, batch_format="pyarrow").take_all()
    per_day: dict[int, int] = {}
    for r in rows:
        per_day[r["day"]] = per_day.get(r["day"], 0) + r["c"]
    days = sorted(per_day)
    cum = np.cumsum([per_day[d] for d in days])
    return pa.table({"day": pa.array(days, pa.int64()),
                     "cum_users": pa.array(cum, pa.int64())})


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      window_s: int = 86400):
    """Retention matrix: users grouped by first-seen window (cohort),
    counted at each activity offset — (cohort, off, n_users).

    ONE exchange total, on the shared user-hash bucket: per block each
    task emits (u, min_ts) partials AND distinct (u, day) activity
    partials (tagged halves of one union); per bucket the global
    first-seen min, the global (u, day) dedupe, the cohort attach
    (a vectorized local join — both sides are co-partitioned by
    construction) and the (cohort, off) count partial all happen
    inside one vectorized pass.  The driver merges count partials —
    bounded by cohorts x offsets, never users.  A 4-exchange
    composition (min-merge, dedupe, hash join, bucketed sum) measured
    6.7 s at sf0.1; this shape removes three of the floors."""
    win_us = window_s * 1_000_000
    win_s = win_us // 1_000_000

    from peri_ray.stages.checks import bucket_of

    def _parts(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "u": t.column(user_col).combine_chunks().cast(pa.int64()),
            "ts": t.column(ts_col).combine_chunks().cast(pa.int64()),
        }).filter(pc.and_(pc.is_valid(t.column(user_col).combine_chunks()),
                          pc.is_valid(t.column(ts_col).combine_chunks())))
        firsts = (tt.group_by("u").aggregate([("ts", "min")])
                  .rename_columns(["u", "v"]))
        us = tt.column("ts").to_numpy(zero_copy_only=False)
        days = (pa.table({"u": tt.column("u"),
                          "v": pa.array((us // win_us) * win_s, pa.int64())})
                .group_by(["u", "v"]).aggregate([]))
        both = pa.concat_tables([
            firsts.append_column("side",
                                 pa.array(np.zeros(firsts.num_rows, np.int8))),
            days.append_column("side",
                               pa.array(np.ones(days.num_rows, np.int8))),
        ])
        return both.append_column("__bucket", bucket_of(both.column("u"), 64))

    tagged = ds.map_batches(_parts, batch_format="pyarrow")

    def _per_bucket(group: pa.Table) -> pa.Table:
        side = group.column("side")
        f = (group.filter(pc.equal(side, 0)).select(["u", "v"])
             .group_by("u").aggregate([("v", "min")]))
        first_us = f.column("v_min").to_numpy(zero_copy_only=False)
        cohorts = pa.table({
            "u": f.column("u"),
            "cohort": pa.array((first_us // win_us) * win_s, pa.int64()),
        })
        act = (group.filter(pc.equal(side, 1)).select(["u", "v"])
               .group_by(["u", "v"]).aggregate([])
               .rename_columns(["u", "day"]))
        j = act.join(cohorts, keys="u", join_type="inner")
        off = pc.subtract(j.column("day"), j.column("cohort"))
        g = (pa.table({"cohort": j.column("cohort"), "off": off})
             .group_by(["cohort", "off"]).aggregate([([], "count_all")]))
        return g.rename_columns(["cohort", "off", "n"])

    rows = (tagged.groupby("__bucket")
            .map_groups(_per_bucket, batch_format="pyarrow").take_all())
    merged: dict[tuple[int, int], int] = {}
    for r in rows:
        k = (r["cohort"], r["off"])
        merged[k] = merged.get(k, 0) + r["n"]
    keys = sorted(merged)
    return pa.table({
        "cohort": pa.array([k[0] for k in keys], pa.int64()),
        "off": pa.array([k[1] for k in keys], pa.int64()),
        "n_users": pa.array([merged[k] for k in keys], pa.int64()),
    })


def locf_fill(ds, key_col: str, order_cols: list[str], col: str,
              id_col: str, n_buckets: int = 64):
    """Last-observation-carried-forward per key: each null ``col`` takes
    the most recent non-null value of its key's history in
    ``order_cols`` order (SQL ``last_value(col IGNORE NULLS) OVER
    (PARTITION BY key ORDER BY ... ROWS UNBOUNDED PRECEDING)``) — the
    standard gap-imputation window for sensor/metric streams.

    ONE hash-bucketed exchange on the key (``map_groups_via_buckets``);
    per bucket a single lexsort orders every key run and the fill is a
    vectorized ``maximum.accumulate`` over observation positions,
    fenced at run starts so values never leak across keys.  Leading
    nulls (no prior observation) stay null.

    Output: (id_col, col) — pruned so only the fixed columns cross the
    exchange."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _fill(group: pa.Table) -> pa.Table:
        g = group.sort_by([(key_col, "ascending")]
                          + [(c, "ascending") for c in order_cols])
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: g.column(id_col),
                             col: g.column(col)})
        keys = g.column(key_col).combine_chunks()
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
            nulls = pc.is_null(keys).to_numpy(zero_copy_only=False)
            same[1:] |= nulls[1:] & nulls[:-1]
        run_start = np.flatnonzero(~same)
        start_of = np.repeat(run_start, np.diff(np.append(run_start, n)))
        v = g.column(col).combine_chunks()
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        pos = np.arange(n, dtype=np.int64)
        last_obs = np.maximum.accumulate(np.where(valid, pos, -1))
        ok = last_obs >= start_of
        src = np.where(ok, last_obs, 0)
        filled = v.take(pa.array(src))
        out = pc.if_else(pa.array(ok), filled, pa.nulls(n, v.type))
        return pa.table({id_col: g.column(id_col), col: out})

    need = list(dict.fromkeys([key_col, *order_cols, id_col, col]))
    pruned = ds.map_batches(lambda t: t.select(need),
                            batch_format="pyarrow")
    return map_groups_via_buckets(pruned, [key_col], _fill,
                                  n_buckets=n_buckets)


def lag_column(ds, key_col: str, order_cols: list[str], col: str,
               id_col: str, offset: int = 1, n_buckets: int = 64):
    """Per-key lag/lead: the value of ``col`` ``offset`` rows earlier
    (negative = later) in ``order_cols`` order within each key — SQL
    ``lag(col, offset) OVER (PARTITION BY key ORDER BY ...)``.  Rows
    whose shifted position falls outside their key run yield null.

    Same single bucket exchange + per-bucket lexsort as
    :func:`locf_fill`; the shift is one vectorized index add fenced by
    run bounds.  Output: (id_col, f"lag_{col}")."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    out_name = f"lag_{col}"

    def _shift(group: pa.Table) -> pa.Table:
        g = group.sort_by([(key_col, "ascending")]
                          + [(c, "ascending") for c in order_cols])
        n = g.num_rows
        v = g.column(col).combine_chunks()
        if n == 0:
            return pa.table({id_col: g.column(id_col), out_name: v})
        keys = g.column(key_col).combine_chunks()
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
            nulls = pc.is_null(keys).to_numpy(zero_copy_only=False)
            same[1:] |= nulls[1:] & nulls[:-1]
        run_start = np.flatnonzero(~same)
        lens = np.diff(np.append(run_start, n))
        start_of = np.repeat(run_start, lens)
        end_of = np.repeat(run_start + lens, lens)
        pos = np.arange(n, dtype=np.int64)
        src = pos - offset
        ok = (src >= start_of) & (src < end_of)
        taken = v.take(pa.array(np.where(ok, src, 0)))
        out = pc.if_else(pa.array(ok), taken, pa.nulls(n, v.type))
        return pa.table({id_col: g.column(id_col), out_name: out})

    need = list(dict.fromkeys([key_col, *order_cols, id_col, col]))
    pruned = ds.map_batches(lambda t: t.select(need),
                            batch_format="pyarrow")
    return map_groups_via_buckets(pruned, [key_col], _shift,
                                  n_buckets=n_buckets)


def scd2_history(ds, key_col: str, ts_col: str, attr_col: str,
                 id_col: str, n_buckets: int = 64):
    """Slowly-changing-dimension (SCD type 2) history build: turn a
    stream of captures (key, capture ts, attribute) into versioned
    validity intervals — the recrawl-history table a web corpus keeps
    per url.  Per key in (ts, id) order each capture becomes a row
    with ``valid_from`` = its ts, ``valid_to`` = the NEXT capture's ts
    (null ⇒ ``is_current``), a 1-based ``version``, and ``changed`` =
    whether the attribute differs from the previous capture (SQL
    ``lag(attr) OVER w IS DISTINCT FROM attr`` — a first capture with
    a non-null attribute counts as changed).

    One bucketed exchange keyed on ``key_col`` (key cardinality is of
    row-count order for urls), then a single vectorized lexsort +
    run-fenced shift per bucket — the :func:`lag_column` shape, with
    lead/lag/rank all derived from one fence array."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _hist(group: pa.Table) -> pa.Table:
        g = group.sort_by([(key_col, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        n = g.num_rows
        ts = g.column(ts_col).combine_chunks()
        attr = g.column(attr_col).combine_chunks()
        if n == 0:
            return pa.table({
                id_col: g.column(id_col), key_col: g.column(key_col),
                "valid_from": ts, "valid_to": ts,
                "is_current": pa.array([], pa.bool_()),
                "version": pa.array([], pa.int64()),
                "changed": pa.array([], pa.bool_())})
        keys = g.column(key_col).combine_chunks()
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
            nulls = pc.is_null(keys).to_numpy(zero_copy_only=False)
            same[1:] |= nulls[1:] & nulls[:-1]
        run_start = np.flatnonzero(~same)
        lens = np.diff(np.append(run_start, n))
        start_of = np.repeat(run_start, lens)
        end_of = np.repeat(run_start + lens, lens)
        pos = np.arange(n, dtype=np.int64)

        nxt = pos + 1
        has_next = nxt < end_of
        valid_to = pc.if_else(
            pa.array(has_next),
            ts.take(pa.array(np.where(has_next, nxt, 0))),
            pa.nulls(n, ts.type))

        prv = pos - 1
        has_prev = prv >= start_of
        prev_attr = pc.if_else(
            pa.array(has_prev),
            attr.take(pa.array(np.where(has_prev, prv, 0))),
            pa.nulls(n, attr.type))
        # IS DISTINCT FROM: equal is null when either side is null
        both_null = pc.and_(pc.is_null(attr), pc.is_null(prev_attr))
        same_val = pc.or_(pc.fill_null(pc.equal(attr, prev_attr), False),
                          both_null)
        return pa.table({
            id_col: g.column(id_col), key_col: keys,
            "valid_from": ts, "valid_to": valid_to,
            "is_current": pa.array(~has_next),
            "version": pa.array(pos - start_of + 1, pa.int64()),
            "changed": pc.invert(same_val)})

    need = list(dict.fromkeys([key_col, ts_col, attr_col, id_col]))
    pruned = ds.map_batches(lambda t: t.select(need),
                            batch_format="pyarrow")
    return map_groups_via_buckets(pruned, [key_col], _hist,
                                  n_buckets=n_buckets)


def interval_overlap_join(left, right, key: str,
                          l_start: str = "start", l_end: str = "end",
                          r_start: str = "start", r_end: str = "end",
                          l_id: str = "id_a", r_id: str = "id_b",
                          n_buckets: int = 64,
                          max_pairs_per_key: int = 1_000_000):
    """Interval-overlap join: emit (key, id_a, id_b) for every pair of
    intervals on the same key that overlap (half-open semantics:
    ``a.start < b.end AND b.start < a.end``) — the third member of the
    temporal-join family (as-of = nearest event, range = containment
    count, overlap = interval×interval).

    Shape: both sides bucket on the key through ONE exchange (side
    tag rides along; only key/id/two-int64 endpoints cross — payloads
    never do).  Per key run, rights sort by start once and each left
    takes one ``searchsorted`` for its candidate window — emitted
    pairs are verified with a vectorized end-check, so per-key cost is
    O((n_l + n_r) log n_r + pairs).  A key whose output would exceed
    ``max_pairs_per_key`` raises (an everything-overlaps-everything
    hot key is a data bug at web scale, not a bigger-cluster
    problem)."""
    import ray.data as rd  # noqa: F401

    from peri_ray.stages.dedup import map_groups_via_buckets

    def _tag(ds, side: int, sc: str, ec: str, ic: str):
        def _f(t: pa.Table) -> pa.Table:
            ok = pc.and_(pc.is_valid(t.column(sc).combine_chunks()),
                         pc.is_valid(t.column(ec).combine_chunks()))
            ok = pc.and_(ok, pc.is_valid(t.column(key).combine_chunks()))
            sub = t.filter(ok)
            return pa.table({
                key: sub.column(key),
                "__s": pa.array(_epoch_us(sub.column(sc))),
                "__e": pa.array(_epoch_us(sub.column(ec))),
                "__id": sub.column(ic).combine_chunks().cast(pa.int64()),
                "__side": pa.array(
                    np.full(sub.num_rows, side, np.int8)),
            })

        return ds.map_batches(_f, batch_format="pyarrow")

    both = _tag(left, 0, l_start, l_end, l_id).union(
        _tag(right, 1, r_start, r_end, r_id))

    def _join(bucket: pa.Table) -> pa.Table:
        g = bucket.sort_by([(key, "ascending")])
        keys_np = g.column(key).combine_chunks().to_numpy(
            zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        s = g.column("__s").to_numpy(zero_copy_only=False)
        e = g.column("__e").to_numpy(zero_copy_only=False)
        ids = g.column("__id").to_numpy(zero_copy_only=False)
        n = len(keys_np)
        out_k, out_a, out_b = [], [], []
        if n:
            new_run = np.ones(n, bool)
            new_run[1:] = keys_np[1:] != keys_np[:-1]
            starts = np.flatnonzero(new_run)
            ends = np.append(starts[1:], n)
            for lo, hi in zip(starts, ends):
                ls = side[lo:hi] == 0
                rs = ~ls
                if not ls.any() or not rs.any():
                    continue
                l_s, l_e, l_i = s[lo:hi][ls], e[lo:hi][ls], ids[lo:hi][ls]
                r_s, r_e, r_i = s[lo:hi][rs], e[lo:hi][rs], ids[lo:hi][rs]
                order = np.argsort(r_s, kind="stable")
                r_s, r_e, r_i = r_s[order], r_e[order], r_i[order]
                # candidates: rights with start < left.end
                cut = np.searchsorted(r_s, l_e, side="left")
                if int(cut.sum()) > max_pairs_per_key:
                    raise ValueError(
                        f"interval_overlap_join: key {keys_np[lo]!r} "
                        f"generates > {max_pairs_per_key} candidate "
                        "pairs; split or pre-filter the hot key")
                li = np.repeat(np.arange(len(l_s)), cut)
                ri = np.concatenate([np.arange(c) for c in cut]) \
                    if len(cut) else np.array([], np.int64)
                keep = r_e[ri] > l_s[li]  # verify the other edge
                out_k.append(np.full(int(keep.sum()), keys_np[lo]))
                out_a.append(l_i[li[keep]])
                out_b.append(r_i[ri[keep]])
        if not out_k:
            return pa.table({key: pa.array([], g.column(key).type),
                             "id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({
            key: pa.array(np.concatenate(out_k).tolist(),
                          g.column(key).type),
            "id_a": pa.array(np.concatenate(out_a)),
            "id_b": pa.array(np.concatenate(out_b)),
        })

    return map_groups_via_buckets(both, [key], _join, n_buckets=n_buckets)


def cusum_daily_counts(ds, ts_col: str = "ts",
                       batch_size: int | None = 65536) -> pa.Table:
    """Volume changepoint signal: positive CUSUM of daily row counts
    against the all-period mean, kept EXACT by scaling through the
    day count instead of dividing —

        S_0 = 0;  S_t = max(0, S_{t-1} + (x_t·m − T))

    with x_t the day-t count, m the number of days, T the total, so
    S_t is m times the classic float CUSUM and stays an integer
    (hash-exact; a SQL twin is a recursive CTE over the ordered
    days).  The day where S peaks is the most likely upward
    level-shift point; a flat series keeps S pinned near 0.

    Shape: per-batch (day, count) partials merge on the driver
    (days-bounded — the calendar is small even at 10^12 rows); the
    recurrence is a driver loop over the sorted days.  Null
    timestamps are vacuous.  Returns (day, x, cusum_num) sorted by
    day."""

    def _part(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).combine_chunks()
        ts = ts.drop_null()
        day = pc.strftime(ts, format="%Y-%m-%d")
        g = (pa.table({"day": day}).group_by("day")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["day", "c"])

    daily: dict[str, int] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        daily[r["day"]] = daily.get(r["day"], 0) + r["c"]
    days = sorted(daily)
    m = len(days)
    total = sum(daily.values())
    s = 0
    out_s = []
    for d in days:
        s = max(0, s + daily[d] * m - total)
        out_s.append(s)
    return pa.table({
        "day": pa.array(days, pa.string()),
        "x": pa.array([daily[d] for d in days], pa.int64()),
        "cusum_num": pa.array(out_s, pa.int64()),
    })


def rolling_distinct_counts(ds, ts_col: str = "ts",
                            key_col: str = "user_id",
                            window_days: int = 7,
                            n_buckets: int = 64):
    """EXACT rolling-window COUNT(DISTINCT key) per day — the WAU/MAU
    monitor: for every observed activity day ``w``, how many distinct
    keys were active in ``[w - window_days + 1, w]``.

    Naive shapes either explode every (key, day) pair into all
    ``window_days`` windows it covers and re-deduplicate (a second
    full exchange at x``window_days`` volume) or re-scan per window.
    This runs ONE key-bucketed exchange: per key in sorted day order,
    an active day ``d`` with previous active day ``p`` is the FIRST
    active day exactly for windows ``[max(d, p + window_days), d +
    window_days - 1]``, so each pair contributes a ±1 to a per-day
    difference array; the driver merges day-sized diff partials and
    prefix-sums — O(calendar days) driver work regardless of key
    cardinality.  Null keys / timestamps are excluded (the SQL
    COUNT(DISTINCT) convention).  Returns (day 'YYYY-MM-DD', n_keys)
    for observed days only."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    w = int(window_days)

    def _pairs(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, ts_col)
        t = t.filter(pc.is_valid(t.column(key_col).combine_chunks()))
        ts = t.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
        day = (_epoch_us(ts) // 86_400_000_000).astype(np.int64)
        return (pa.table({key_col: t.column(key_col),
                          "day": pa.array(day)})
                .group_by([key_col, "day"]).aggregate([]))

    NEG = np.int64(-(1 << 40))

    def _diffs(bucket: pa.Table) -> pa.Table:
        g = (bucket.select([key_col, "day"])
             .group_by([key_col, "day"]).aggregate([])
             .sort_by([(key_col, "ascending"), ("day", "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "delta": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8())})
        keys = g.column(key_col).combine_chunks()
        d = g.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
        prev = np.full(n, NEG)
        prev[same] = d[np.flatnonzero(same) - 1]
        lo = np.maximum(d, prev + w)
        hi = d + w - 1
        lo_u, lo_c = np.unique(lo, return_counts=True)
        hi_u, hi_c = np.unique(hi + 1, return_counts=True)
        obs = np.unique(d)
        return pa.table({
            "day": pa.array(np.concatenate([lo_u, hi_u, obs])),
            "delta": pa.array(np.concatenate(
                [lo_c.astype(np.int64), -hi_c.astype(np.int64),
                 np.zeros(len(obs), np.int64)])),
            "kind": pa.array(np.concatenate(
                [np.zeros(len(lo_u) + len(hi_u), np.int8),
                 np.ones(len(obs), np.int8)])),
        })

    deltas: dict[int, int] = {}
    observed: set[int] = set()
    for r in map_groups_via_buckets(ds.map_batches(
            _pairs, batch_format="pyarrow", batch_size=65536),
            [key_col], _diffs, n_buckets=n_buckets).take_all():
        if r["kind"] == 1:
            observed.add(r["day"])
        else:
            deltas[r["day"]] = deltas.get(r["day"], 0) + r["delta"]
    if not observed:
        return pa.table({"day": pa.array([], pa.string()),
                         "n_keys": pa.array([], pa.int64())})
    days, counts = [], []
    run = 0
    for dd in range(min(deltas), max(observed) + 1):
        run += deltas.get(dd, 0)
        if dd in observed:
            days.append(dd)
            counts.append(run)
    iso = [str(np.datetime64(int(dd), "D")) for dd in days]
    return pa.table({"day": pa.array(iso, pa.string()),
                     "n_keys": pa.array(counts, pa.int64())})


def markov_transitions(ds, key_col: str = "user_id", ts_col: str = "ts",
                       state_col: str = "event_type",
                       id_col: str = "event_id", n_buckets: int = 64,
                       max_states: int = 10_000):
    """First-order Markov transition matrix over per-key event
    sequences: exact counts of consecutive (state -> next state) steps
    in (ts, id) order within each key, plus the row-normalized
    transition probability — the behavioral-drift / bot-detection
    model a clickstream audit fits.

    One key-bucketed exchange; per bucket the run-fenced shift pairs
    each event with its successor and a vectorized group_by emits
    (prev, next, n) partials.  The driver merges a states²-bounded
    dict (raises past ``max_states²`` — state columns are enum-like by
    contract).  Transitions INTO a null state are dropped (under the
    SQL twin's lead()+WHERE they are indistinguishable from sequence
    end); null PREV states keep their rows.  Probabilities are
    float(n)/float(row total)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _pairs(group: pa.Table) -> pa.Table:
        g = group.sort_by([(key_col, "ascending"), (ts_col, "ascending"),
                           (id_col, "ascending")])
        n = g.num_rows
        if n < 2:
            return pa.table({"prev": pa.array([], pa.string()),
                             "next": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        keys = g.column(key_col).combine_chunks()
        same = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
            .fill_null(False).to_numpy(zero_copy_only=False)
        st = g.column(state_col).combine_chunks().cast(pa.string())
        idx = np.flatnonzero(same)
        t = pa.table({"prev": st.take(pa.array(idx)),
                      "next": st.take(pa.array(idx + 1))})
        # SQL-twin convention: a transition INTO a null state is
        # indistinguishable from sequence end under lead()+WHERE next
        # IS NOT NULL, so it is dropped; null PREV states keep their
        # row (the twin's GROUP BY keeps the NULL group)
        t = t.filter(pc.is_valid(t.column("next").combine_chunks()))
        cnt = t.group_by(["prev", "next"]).aggregate([([], "count_all")])
        return cnt.rename_columns(["prev", "next", "n"])

    need = list(dict.fromkeys([key_col, ts_col, state_col, id_col]))
    pruned = ds.map_batches(lambda t: t.select(need),
                            batch_format="pyarrow")
    sums: dict[tuple, int] = {}
    for r in map_groups_via_buckets(pruned, [key_col], _pairs,
                                    n_buckets=n_buckets).take_all():
        k = (r["prev"], r["next"])
        sums[k] = sums.get(k, 0) + r["n"]
        if len(sums) > max_states * max_states:
            raise ValueError("markov_transitions: state domain exceeds "
                             f"max_states={max_states} — not an "
                             "enum-like column")
    totals: dict[str, int] = {}
    for (p, _), c in sums.items():
        totals[p] = totals.get(p, 0) + c
    keys_sorted = sorted(sums)
    return pa.table({
        "prev": pa.array([k[0] for k in keys_sorted], pa.string()),
        "next": pa.array([k[1] for k in keys_sorted], pa.string()),
        "n": pa.array([sums[k] for k in keys_sorted], pa.int64()),
        "p": pa.array([float(sums[k]) / float(totals[k[0]])
                       for k in keys_sorted], pa.float64()),
    })


def time_window_sums(ds, window_s: int = 3600, user_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value", n_buckets: int = 64):
    """Per-key TRAILING-INTERVAL window aggregate in event time — the
    RANGE-frame member of the window family (SQL ``RANGE BETWEEN
    INTERVAL w PRECEDING AND CURRENT ROW``), complementing
    :func:`running_totals` (unbounded frame) and
    :func:`moving_window_sums` (ROWS frame).  One row per input row:
    (id, user, win_n, win_sum_micro) over the rows of the same key
    whose ts lies in ``[ts - window, ts]`` (inclusive both ends; equal
    timestamps are frame peers exactly as SQL RANGE treats them, so
    the frame never depends on a tiebreak).

    Exactness contract shared with the siblings: values fix-point to
    BIGINT micro-units (half-away rounding) BEFORE accumulation; rows
    with null user/ts/value are excluded on both sides.
    ``value_col=None`` turns off the sum (and its null-value filter):
    output is (id, user, win_n) only — the pure event-RATE window
    (burst / rate-limit detection needs no value column).

    Shape: one key-bucketed exchange; per bucket ONE lexsort + ONE
    cumsum, then both frame bounds come from two whole-bucket
    ``searchsorted`` calls over a banded composite axis (each key run
    is shifted into its own non-overlapping integer band, so a single
    global binary search resolves every per-run bound — no per-run
    Python loop).  When runs x band width would overflow int64 (huge
    per-key spans x millions of keys per bucket) it falls back to a
    per-run slice loop — correctness first, with the documented cost.
    O(n log n) per bucket regardless of window size."""
    win_us = int(window_s) * 1_000_000

    def _win(group: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(group.column(ts_col)),
                     pc.is_valid(group.column(user_col)))
        if value_col is not None:
            ok = pc.and_(ok, pc.is_valid(group.column(value_col)))
        g = group.filter(ok)
        u = g.column(user_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        fields = [(id_col, pa.int64()), (user_col, pa.int64()),
                  ("win_n", pa.int64())]
        if value_col is not None:
            fields.append(("win_sum_micro", pa.int64()))
            v = g.column(value_col).combine_chunks().cast(
                pa.float64()).to_numpy(zero_copy_only=False)
        schema = pa.schema(fields)
        n = len(u)
        if n == 0:
            return schema.empty_table()
        if value_col is not None:
            s = v * 1e6
            micro = np.where(s >= 0, np.floor(s + 0.5),
                             np.ceil(s - 0.5)).astype(np.int64)
        else:
            micro = np.zeros(n, np.int64)
        order = np.lexsort((ids, ts, u))
        u, ts, ids, micro = u[order], ts[order], ids[order], micro[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        seg_lens = np.diff(np.append(starts, n))
        rel = ts - np.repeat(ts[starts], seg_lens)  # >= 0 within a run
        off = int(rel.max()) + win_us + 2
        if len(starts) * off < 2 ** 62:
            run_id = np.repeat(
                np.arange(len(starts), dtype=np.int64), seg_lens)
            comp = run_id * off + rel
            # target may dip below the band start (rel < window) but
            # stays above the previous band's max (off > span + win),
            # so the global search never crosses a key boundary
            left = np.searchsorted(comp, comp - win_us, side="left")
            right = np.searchsorted(comp, comp, side="right")
        else:
            left = np.empty(n, np.int64)
            right = np.empty(n, np.int64)
            ends = np.append(starts[1:], n)
            for a, b in zip(starts, ends):
                seg = ts[a:b]
                left[a:b] = a + np.searchsorted(seg, seg - win_us, "left")
                right[a:b] = a + np.searchsorted(seg, seg, "right")
        cols = {id_col: pa.array(ids), user_col: pa.array(u),
                "win_n": pa.array(right - left)}
        if value_col is not None:
            cum = np.concatenate(([0], np.cumsum(micro)))
            cols["win_sum_micro"] = pa.array(cum[right] - cum[left])
        return pa.table(cols)

    from peri_ray.stages.dedup import map_groups_via_buckets

    need = [user_col, ts_col, id_col]
    if value_col is not None:
        need.append(value_col)
    return map_groups_via_buckets(ds.select_columns(need),
                                  [user_col], _win, n_buckets=n_buckets)


def point_in_time_join(probe, history, key_col: str, probe_ts: str,
                       probe_id: str, valid_from: str = "valid_from",
                       valid_to: str = "valid_to",
                       right_cols: list[str] | None = None,
                       n_buckets: int = 64):
    """Point-in-time (AS OF state) join: enrich each probe row with
    the HISTORY VERSION whose validity interval contains the probe
    timestamp (``valid_from <= ts < valid_to``, open current version =
    null ``valid_to``) — the lookup an SCD2 capture history exists to
    serve ("what did we believe about this url/user AT this moment").
    LEFT semantics: probes before the first version keep their row
    with null payload.  At most one version can match (SCD2 intervals
    never overlap), so the row count is exactly the probe count.

    Shape: both sides hash-bucket on the key through ONE exchange
    (key, int64 ts bounds, probe id and the requested payload columns
    only).  Per key run the versions sort once by (valid_from, …) and
    every probe resolves with one vectorized ``searchsorted`` floor —
    the :func:`asof_join` backward probe — plus a ``valid_to`` check
    that rejects zero-width versions (equal-timestamp capture peers)
    and gap intervals.  Probes with null key/ts are excluded on both
    sides (documented convention, matching the SQL twin's WHERE)."""
    right_cols = right_cols or []
    if probe_id in right_cols or key_col in right_cols:
        raise ValueError("right_cols must not shadow probe_id/key_col")

    def _tag_probe(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, probe_ts)
        t = t.filter(pc.is_valid(t.column(key_col).combine_chunks()))
        cols = {"__key": t.column(key_col).combine_chunks().cast(pa.int64()),
                "__ts": pa.array(_epoch_us(t.column(probe_ts)), pa.int64()),
                "__vt": pa.nulls(t.num_rows, pa.int64()),
                "__id": t.column(probe_id).combine_chunks().cast(pa.int64()),
                "__side": pa.array(np.zeros(t.num_rows, np.int8))}
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, right_types[c])
        out = pa.table(cols)
        return out.append_column("__bucket",
                                 bucket_of(out.column("__key"), n_buckets))

    right_types = {c: history.schema().types[history.schema().names.index(c)]
                   for c in right_cols}

    def _tag_hist(t: pa.Table) -> pa.Table:
        t = _drop_null_ts(t, valid_from)
        t = t.filter(pc.is_valid(t.column(key_col).combine_chunks()))
        vt = t.column(valid_to).combine_chunks()
        vt_us = pc.if_else(pc.is_valid(vt),
                           vt.cast(pa.int64()),
                           pa.scalar(np.iinfo(np.int64).max, pa.int64()))
        cols = {"__key": t.column(key_col).combine_chunks().cast(pa.int64()),
                "__ts": pa.array(_epoch_us(t.column(valid_from)), pa.int64()),
                "__vt": vt_us,
                "__id": pa.nulls(t.num_rows, pa.int64()),
                "__side": pa.array(np.ones(t.num_rows, np.int8))}
        for c in right_cols:
            cols[c] = t.column(c)
        out = pa.table(cols)
        return out.append_column("__bucket",
                                 bucket_of(out.column("__key"), n_buckets))

    both = (probe.map_batches(_tag_probe, batch_format="pyarrow",
                              batch_size=EXCHANGE_COALESCE_ROWS)
            .union(history.map_batches(_tag_hist, batch_format="pyarrow",
                                       batch_size=EXCHANGE_COALESCE_ROWS)))

    def _pit(group: pa.Table) -> pa.Table:
        side = group.column("__side").combine_chunks().to_numpy(
            zero_copy_only=False)
        keys = group.column("__key").combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = group.column("__ts").combine_chunks().to_numpy(
            zero_copy_only=False)
        vt = group.column("__vt").combine_chunks().to_numpy(
            zero_copy_only=False)
        is_r = side == 1
        ri = np.flatnonzero(is_r)
        # sort versions by (key, valid_from, valid_to): equal-ts
        # capture peers order zero-width-first, so the floor candidate
        # (the LAST peer) is the one whose interval can contain ts
        r_order = ri[np.lexsort((vt[ri], ts[ri], keys[ri]))]
        rk, rts, rvt = keys[r_order], ts[r_order], vt[r_order]
        li = np.flatnonzero(~is_r)
        lk, lts = keys[li], ts[li]
        cand = np.full(len(li), -1, np.int64)
        if len(rk) and len(li):
            lo = np.searchsorted(rk, lk, side="left")
            hi = np.searchsorted(rk, lk, side="right")
            order = np.argsort(lk, kind="stable")
            seg_starts = np.flatnonzero(
                np.concatenate(([True], lk[order][1:] != lk[order][:-1])))
            seg_ends = np.append(seg_starts[1:], len(order))
            for s, e in zip(seg_starts, seg_ends):
                rows = order[s:e]
                a, b = lo[rows[0]], hi[rows[0]]
                if a == b:
                    continue
                pos = np.searchsorted(rts[a:b], lts[rows], side="right")
                hit = pos > 0
                c = a + pos[hit] - 1
                # interval containment: ts < valid_to rejects
                # zero-width peers and any gap between versions
                ok = lts[rows[hit]] < rvt[c]
                cand[rows[hit]] = np.where(ok, c, -1)
        matched = cand >= 0
        take_idx = pa.array(np.where(matched, cand, 0), pa.int64())
        out_cols = {
            probe_id: group.column("__id").combine_chunks().take(
                pa.array(li, pa.int64())),
            key_col: pa.array(lk),
        }
        src_rows = pa.array(r_order, pa.int64())
        m_arr = pa.array(matched)
        for c in right_cols:
            if len(r_order) == 0:
                out_cols[c] = pa.nulls(len(lk), right_types[c])
                continue
            payload = group.column(c).combine_chunks().take(
                src_rows).take(take_idx)
            out_cols[c] = pc.if_else(
                m_arr, payload, pa.nulls(len(lk), right_types[c]))
        return pa.table(out_cols)

    return both.groupby("__bucket").map_groups(_pit,
                                               batch_format="pyarrow")


def peak_window_rate(ds, window_s: int = 3600, user_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     n_buckets: int = 64):
    """Per-key PEAK trailing-window event rate: the maximum number of
    the key's events inside any ``[t - window, t]`` interval anchored
    at one of its events — the burst / rate-limit / bot-cadence
    signal.  (The max over anchored windows equals the max over ALL
    windows: a window's count only grows as its right edge slides onto
    the next event.)  Output: (user, peak, n_events).

    Shape: the :func:`time_window_sums` count-only exchange computes
    per-event window counts; a second tiny key-bucketed exchange
    reduces each key to one row (max + count)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    win = time_window_sums(ds, window_s=window_s, user_col=user_col,
                           ts_col=ts_col, id_col=id_col, value_col=None,
                           n_buckets=n_buckets)

    def _peak(g: pa.Table) -> pa.Table:
        m = (g.select([user_col, "win_n"]).group_by(user_col)
             .aggregate([("win_n", "max"), ([], "count_all")]))
        return pa.table({
            user_col: m.column(user_col).cast(pa.int64()),
            "peak": m.column("win_n_max").cast(pa.int64()),
            "n_events": m.column("count_all").cast(pa.int64())})

    return map_groups_via_buckets(win, [user_col], _peak,
                                  n_buckets=n_buckets)


def dow_anomalies(ds, ts_col: str = "ts",
                  batch_size: int | None = 65536) -> pa.Table:
    """Seasonal volume-anomaly report: each day's row count z-scored
    against the mean/stddev of ITS WEEKDAY — the ingestion monitor
    that a flat threshold gets wrong (weekend dips would page it; a
    quiet Tuesday would not).  Output (day, dow, x, z) sorted by day;
    dow uses the SQL convention (Sunday = 0); z is null when the
    weekday has < 2 observations or zero variance.

    All moments are exact Python ints merged from per-batch (day,
    count) partials (calendar-bounded driver state — the
    :func:`cusum_daily_counts` contract); each z is one fixed-order
    float expression over exact ints, bit-identical to the SQL twin
    with no rounding."""
    import datetime as _dt
    import math

    def _part(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).combine_chunks().drop_null()
        day = pc.strftime(ts, format="%Y-%m-%d")
        g = (pa.table({"day": day}).group_by("day")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["day", "x"])

    per_day: dict[str, int] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        per_day[r["day"]] = per_day.get(r["day"], 0) + int(r["x"])

    def _dow(day: str) -> int:
        # SQL dayofweek: Sunday = 0; Python weekday(): Monday = 0
        return (_dt.date.fromisoformat(day).weekday() + 1) % 7

    mom: dict[int, list[int]] = {}
    for day, x in per_day.items():
        m = mom.setdefault(_dow(day), [0, 0, 0])
        m[0] += 1
        m[1] += x
        m[2] += x * x
    days = sorted(per_day)
    zs, dows = [], []
    for day in days:
        x = per_day[day]
        dw = _dow(day)
        n, s1, s2 = mom[dw]
        dows.append(dw)
        num = n * s2 - s1 * s1
        if n < 2 or num <= 0:
            zs.append(None)
            continue
        mu = float(s1) / float(n)
        sd = math.sqrt(float(num) / float(n * (n - 1)))
        zs.append((float(x) - mu) / sd)
    return pa.table({
        "day": pa.array(days, pa.string()),
        "dow": pa.array(dows, pa.int64()),
        "x": pa.array([per_day[d] for d in days], pa.int64()),
        "z": pa.array(zs, pa.float64()),
    })


def linear_interpolate(ds, user_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       value_col: str = "v", n_buckets: int = 64):
    """Per-key LINEAR interpolation of missing values in event-time
    order — the fill strategy between LOCF (step) and dropping: a null
    between two observed neighbors takes the time-weighted blend
    ``vp + (vn - vp) * (ts - tsp) / (tsn - tsp)``; nulls before the
    first / after the last observation of their key stay null; equal
    neighbor timestamps degenerate to the previous value (no 0/0).
    One row per input row: (id, user, v_filled) with observed values
    passed through untouched.

    Every filled double is ONE fixed-order IEEE expression over exact
    int64 microsecond gaps and the two neighbor doubles — bit-exact
    against the IGNORE-NULLS-window SQL twin.  Rows with null user/ts
    are excluded on both sides.

    Shape: one key-bucketed exchange; per bucket one lexsort, then
    prev/next observed positions come from two accumulate passes (no
    per-run loop); run fences mask cross-key bleed."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _interp(group: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(group.column(ts_col)),
                     pc.is_valid(group.column(user_col)))
        g = group.filter(ok)
        u = g.column(user_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        vcol = g.column(value_col).combine_chunks().cast(pa.float64())
        v = vcol.to_numpy(zero_copy_only=False)
        observed = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        schema = pa.schema([(id_col, pa.int64()), (user_col, pa.int64()),
                            ("v_filled", pa.float64())])
        n = len(u)
        if n == 0:
            return schema.empty_table()
        order = np.lexsort((ids, ts, u))
        u, ts, ids, v, observed = (u[order], ts[order], ids[order],
                                   v[order], observed[order])
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        seg_lens = np.diff(np.append(starts, n))
        seg_start = np.repeat(starts, seg_lens)
        seg_end = np.repeat(starts + seg_lens, seg_lens)
        idx = np.arange(n, dtype=np.int64)
        # last observed position at or before i / first at or after i
        prev = np.maximum.accumulate(np.where(observed, idx, -1))
        nxt = np.minimum.accumulate(
            np.where(observed, idx, n)[::-1])[::-1]
        fill = (~observed) & (prev >= seg_start) & (nxt < seg_end)
        out = v.copy()
        p, q_ = prev[fill], nxt[fill]
        gap = (ts[fill] - ts[p]).astype(np.float64)
        span = (ts[q_] - ts[p]).astype(np.float64)
        vp, vn = v[p], v[q_]
        with np.errstate(invalid="ignore", divide="ignore"):
            blend = vp + (vn - vp) * (gap / span)
        out[fill] = np.where(span == 0.0, vp, blend)
        filled = pa.array(out, pa.float64())
        keep_null = (~observed) & ~fill
        if keep_null.any():
            filled = pc.if_else(pa.array(~keep_null), filled,
                                pa.nulls(n, pa.float64()))
        return pa.table({id_col: pa.array(ids), user_col: pa.array(u),
                         "v_filled": filled})

    return map_groups_via_buckets(
        ds.select_columns([user_col, ts_col, id_col, value_col]),
        [user_col], _interp, n_buckets=n_buckets)


def ewma_daily_counts(ds, ts_col: str = "ts", alpha_den: int = 8,
                      rel_num: int = 5,
                      batch_size: int | None = 65536) -> pa.Table:
    """EWMA control chart over daily row counts — the
    exponentially-weighted volume monitor beside the CUSUM
    changepoint (:func:`cusum_daily_counts`):

        s_1 = x_1;   s_t = (x_t + (alpha_den-1)·s_{t-1}) / alpha_den

    i.e. smoothing factor α = 1/alpha_den, and the day-t deviation is
    ``dev = x_t − s_{t-1}`` with ``flag = rel_num·|dev| > s_{t-1}``
    (a >1/rel_num relative level shift against the smoothed level).

    Exactness contract: every float op is written in the literal
    order above and evaluated SEQUENTIALLY on the driver over the
    sorted days, so a DuckDB recursive CTE threading the identical
    expressions is bit-identical (IEEE doubles, no re-association —
    the same convention as the CUSUM twin).  Day counts are exact
    int64 (< 2^53, so the int→double casts are lossless).

    Shape: per-batch (day, count) partials merged on the driver
    (calendar-bounded at any corpus size); the recurrence is a driver
    loop over the sorted days.  Null timestamps are vacuous.
    Returns (day, x, ewma, dev, flag) sorted by day."""

    def _part(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).combine_chunks().drop_null()
        day = pc.strftime(ts, format="%Y-%m-%d")
        g = (pa.table({"day": day}).group_by("day")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["day", "c"])

    daily: dict[str, int] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).iter_rows():
        daily[r["day"]] = daily.get(r["day"], 0) + r["c"]
    days = sorted(daily)
    xs, es, dvs, fls = [], [], [], []
    s = None
    w = float(alpha_den - 1)
    for d in days:
        x = float(daily[d])
        if s is None:
            es.append(x)
            dvs.append(0.0)
            fls.append(False)
            s = x
        else:
            dev = x - s
            dvs.append(dev)
            fls.append(float(rel_num) * abs(dev) > s)
            s = (x + w * s) / float(alpha_den)
            es.append(s)
        xs.append(daily[d])
    return pa.table({
        "day": pa.array(days, pa.string()),
        "x": pa.array(xs, pa.int64()),
        "ewma": pa.array(es, pa.float64()),
        "dev": pa.array(dvs, pa.float64()),
        "flag": pa.array(fls, pa.bool_()),
    })


def monotonic_violations(ds, key_col: str, order_cols: list[str],
                         col: str, strict: bool = False,
                         n_buckets: int = 64):
    """Per-key monotonicity CONSTRAINT check: for each key, how many
    adjacent steps (in ``order_cols`` order) DECREASE ``col`` — the
    sequence-shaped validation rule (version counters, cumulative
    byte counts, capture sizes) that per-record predicates cannot
    express.  ``strict=True`` also counts equal steps as violations
    (strictly-increasing contract).

    One key-bucketed exchange (the lag_column shape), per-bucket
    lexsort + run-fenced previous-value compare, then a per-key
    vectorized aggregate inside the same bucket — output is one row
    per key WITH violations: (key, n_steps, n_decreases).  Steps
    where either side is null are not comparable and count toward
    neither; keys with no violation emit nothing (the violations-
    Dataset convention)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _check(group: pa.Table) -> pa.Table:
        g = group.sort_by([(key_col, "ascending")]
                          + [(c, "ascending") for c in order_cols])
        n = g.num_rows
        empty = pa.table({key_col: pa.array([], g.column(key_col).type),
                          "n_steps": pa.array([], pa.int64()),
                          "n_decreases": pa.array([], pa.int64())})
        if n < 2:
            return empty
        keys = g.column(key_col).combine_chunks()
        v = g.column(col).combine_chunks()
        same = np.zeros(n, bool)
        same[1:] = pc.equal(keys.slice(1), keys.slice(0, n - 1)) \
            .fill_null(False).to_numpy(zero_copy_only=False)
        nulls = pc.is_null(keys).to_numpy(zero_copy_only=False)
        same[1:] |= nulls[1:] & nulls[:-1]
        cur, prev = v.slice(1), v.slice(0, n - 1)
        cmp = pc.less(cur, prev) if not strict else \
            pc.less_equal(cur, prev)
        both = pc.and_(pc.is_valid(cur), pc.is_valid(prev)) \
            .to_numpy(zero_copy_only=False)
        step = same[1:] & both
        dec = step & pc.fill_null(cmp, False).to_numpy(
            zero_copy_only=False)
        run_start = np.flatnonzero(~same)
        seg = np.repeat(np.arange(len(run_start)),
                        np.diff(np.append(run_start, n)))
        n_keys = len(run_start)
        steps = np.zeros(n_keys, np.int64)
        decs = np.zeros(n_keys, np.int64)
        np.add.at(steps, seg[1:][step], 1)
        np.add.at(decs, seg[1:][dec], 1)
        m = decs > 0
        return pa.table({
            key_col: keys.take(pa.array(run_start[m])),
            "n_steps": pa.array(steps[m]),
            "n_decreases": pa.array(decs[m])})

    need = list(dict.fromkeys([key_col, *order_cols, col]))
    pruned = ds.map_batches(lambda t: t.select(need),
                            batch_format="pyarrow")
    return map_groups_via_buckets(pruned, [key_col], _check,
                                  n_buckets=n_buckets)
