"""General-purpose distributed joins (enrichment, semi, anti).

The referential checks in :mod:`peri_ray.stages.checks` answer only
"does the key exist?"; training-data pipelines also need the *enriched
rows* (attach customer segment to orders, document metadata to
near-dup pairs, ...).  Two physical strategies, chosen by the caller
exactly like broadcast-vs-shuffled referential:

- :func:`broadcast_join` — the dim side fits one object-store object:
  resolve it ONCE per actor/task (`ray.put` + ``__init__``), attach dim
  columns per batch with a vectorized ``pc.index_in`` + ``take``.  The
  fact side streams; no shuffle at all.
- :func:`hash_join` — both sides large: hash-bucket both on the key
  (the engine-wide :func:`~peri_ray.stages.checks.bucket_of` primitive,
  so co-partitioned stages can share the exchange), one groupby
  co-locates each bucket, and a vectorized per-bucket Arrow
  ``Table.join`` emits the matches.  Only the projected columns cross
  the exchange.

Reference parity: Peri has no join (single-record validation,
``lib/peri.ex``); these are [NORTH]-mandated table-level operators
(BASELINE.json: referential checks as hash-partitioned shuffles) made
user-facing, generalized from anti-only to inner/left/full/semi/anti
(``full`` is hash-path only: the broadcast path streams the fact side
and cannot emit unmatched dim rows without a second pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.stages.checks import bucket_of


# Bundle exchange tag maps (the tiny-block floor fix, see CLAUDE.md):
# MEDIUM bundle — the per-bucket reduce is a vectorized Arrow join,
# heavier than asof's searchsorted (which takes 65536) but far lighter
# than pair-verify (256..1024).
JOIN_COALESCE_ROWS = 16384

_ARROW_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _dim_table(dim, dim_key: str, dim_cols: list[str]) -> pa.Table:
    """Materialize the small dim side as one deduplicated Arrow table.

    Duplicate dim keys would silently fan out fact rows; a *dimension*
    is keyed by contract, so keep the first row per key (deterministic:
    min over the first dim column ordering after sort by key)."""
    cols = [dim_key] + [c for c in dim_cols if c != dim_key]
    if hasattr(dim, "to_arrow_refs"):  # a Dataset
        import ray

        parts = [ray.get(r) for r in dim.select_columns(cols).to_arrow_refs()]
        # the empty fallback must carry the REAL schema: inferring from
        # empty python lists yields null-typed columns, and the joiner's
        # key cast (string -> null) then raises on an empty dim instead
        # of producing the correct degenerate join
        if any(p.num_rows for p in parts):
            t = pa.concat_tables([p for p in parts if p.num_rows])
        elif parts:
            t = parts[0]  # empty but schema-bearing
        else:
            sch = dim.schema()
            types = dict(zip(sch.names, sch.types))
            t = pa.schema([(c, types[c]) for c in cols]).empty_table()
    else:
        t = pa.table(dim).select(cols)
    t = t.sort_by([(c, "ascending") for c in cols])
    keys = t.column(dim_key).combine_chunks()
    if t.num_rows:
        first = np.flatnonzero(
            np.r_[True, keys[1:].to_numpy(zero_copy_only=False)
                  != keys[:-1].to_numpy(zero_copy_only=False)])
        if len(first) != t.num_rows:
            t = t.take(pa.array(first))
    return t.combine_chunks()


class _BroadcastJoiner:
    """Actor-pool/task stage: dim table resolved once in ``__init__``
    (broadcast via ``ray.put`` — never re-shipped per batch)."""

    def __init__(self, fact_key: str, dim_key: str, dim_ref, how: str):
        import ray

        self.fact_key = fact_key
        self.how = how
        dim: pa.Table = ray.get(dim_ref)
        self.dim_keys = dim.column(0).combine_chunks()
        self.dim_key = dim_key
        self.dim_values = dim.remove_column(0)

    def __call__(self, table: pa.Table) -> pa.Table:
        col = table.column(self.fact_key).combine_chunks()
        if col.type != self.dim_keys.type:
            col = col.cast(self.dim_keys.type)
        idx = pc.index_in(col, value_set=self.dim_keys)
        if self.how == "semi":
            return table.filter(pc.is_valid(idx))
        if self.how == "anti":
            return table.filter(pc.and_(pc.invert(pc.is_valid(idx)),
                                        pc.is_valid(col)))
        out = table
        for name in self.dim_values.column_names:
            # take with null indices yields typed nulls — exactly the
            # left-join contract for unmatched fact rows
            out = out.append_column(
                name, self.dim_values.column(name).combine_chunks().take(idx))
        if self.how == "inner":
            out = out.filter(pc.is_valid(idx))
        return out


def broadcast_join(fact, dim, fact_key: str, dim_key: str,
                   dim_cols: list[str], how: str = "inner",
                   fact_cols: list[str] | None = None,
                   concurrency: int | None = None,
                   batch_size: int | None = 65536):
    """Enrich the streaming ``fact`` side with columns from a small
    ``dim`` side (inner/left), or filter by key presence (semi/anti).

    ``dim`` is materialized on the driver, deduplicated by key, and
    broadcast once via ``ray.put``; each batch attaches dim columns with
    ``pc.index_in`` + ``take`` (vectorized, no shuffle).  Use
    :func:`hash_join` when the dim side does not fit one object."""
    import ray

    if how not in _ARROW_JOIN_TYPE:
        raise ValueError(f"how must be one of {sorted(_ARROW_JOIN_TYPE)}")
    if how in ("full", "right"):
        raise ValueError(
            "broadcast_join cannot emit unmatched dim rows (the fact side "
            f"streams); use hash_join(how={how!r})")
    ref = ray.put(_dim_table(dim, dim_key, dim_cols))
    if fact_cols:
        fact = fact.select_columns(sorted(set(fact_cols + [fact_key])))
    if concurrency:
        return fact.map_batches(
            _BroadcastJoiner,
            fn_constructor_args=(fact_key, dim_key, ref, how),
            concurrency=concurrency, batch_format="pyarrow",
            batch_size=batch_size)
    return fact.map_batches(_BroadcastJoiner(fact_key, dim_key, ref, how),
                            batch_format="pyarrow", batch_size=batch_size)


def hash_join(left, right, left_key: str, right_key: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner", n_buckets: int = 64):
    """Large×large equi-join: both sides hash-bucket on the key (shared
    :func:`bucket_of` recipe), one groupby co-locates each bucket, and a
    vectorized Arrow ``Table.join`` runs per bucket.  Only the projected
    columns + the key cross the exchange.

    Output columns: ``left_key`` + ``left_cols`` + ``right_cols`` for
    inner/left/right/full; ``left_key`` + ``left_cols`` for semi/anti.  Skewed keys
    concentrate in single buckets — raise ``n_buckets`` (the shuffle
    partition count) for hot-key relief; a key hot enough to overflow
    one worker's memory needs the broadcast path or salting upstream."""
    if how not in _ARROW_JOIN_TYPE:
        raise ValueError(f"how must be one of {sorted(_ARROW_JOIN_TYPE)}")
    left_cols = [c for c in left_cols if c != left_key]
    right_cols = [c for c in right_cols if c != right_key]
    if how in ("semi", "anti"):
        # documented contract: semi/anti emit left columns only — a
        # non-empty right_cols previously KeyError'd in the per-bucket
        # join because the tag stage (correctly) never shipped them
        right_cols = []

    l_schema = left.schema()
    key_type = dict(zip(l_schema.names, l_schema.types))[left_key]
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_schema = right.schema()
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    want_right = how in ("inner", "left", "right", "full")

    def _tag_left(t: pa.Table) -> pa.Table:
        key = t.column(left_key).combine_chunks()
        cols = {"__key": key}
        for c in left_cols:
            cols[c] = t.column(c)
        for c in right_cols if want_right else []:
            cols[c] = pa.nulls(t.num_rows, r_types[c])
        out = pa.table(cols)
        return (out.append_column("__bucket", bucket_of(key, n_buckets))
                   .append_column("__side",
                                  pa.array(np.zeros(t.num_rows, np.int8))))

    def _tag_right(t: pa.Table) -> pa.Table:
        key = t.column(right_key).combine_chunks().cast(key_type)
        cols = {"__key": key}
        for c in left_cols:
            cols[c] = pa.nulls(t.num_rows, l_types[c])
        for c in right_cols if want_right else []:
            cols[c] = t.column(c)
        out = pa.table(cols)
        return (out.append_column("__bucket", bucket_of(key, n_buckets))
                   .append_column("__side",
                                  pa.array(np.ones(t.num_rows, np.int8))))

    both = (left.map_batches(_tag_left, batch_format="pyarrow",
                             batch_size=JOIN_COALESCE_ROWS)
            .union(right.map_batches(_tag_right, batch_format="pyarrow",
                                     batch_size=JOIN_COALESCE_ROWS)))

    out_cols = [left_key] + left_cols + (right_cols if want_right else [])
    jt = _ARROW_JOIN_TYPE[how]

    def _join(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        l = (group.filter(pc.equal(side, 0))
             .select(["__key"] + left_cols)
             .rename_columns([left_key] + left_cols))
        r = (group.filter(pc.equal(side, 1))
             .select(["__key"] + right_cols)
             .rename_columns([left_key] + right_cols))
        joined = l.join(r, keys=left_key, join_type=jt)
        if how == "anti":
            # null keys pass (same contract as the broadcast path and
            # the referential checks: FK on an absent value is vacuous)
            joined = joined.filter(pc.is_valid(joined.column(left_key)))
        return joined.select(out_cols)

    return both.groupby("__bucket").map_groups(_join, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-pruned semi join (selective dim, exchange-volume reduction)
# ---------------------------------------------------------------------------


def _mg_summary(ds, key: str, mg_k: int,
                batch_size: int | None = 65536):
    """One streaming pass → (merged Misra-Gries summary over ``key``
    as strings, total non-null row count)."""
    import pickle

    from peri_ray.state.sketches import MisraGries

    def _part(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            t.column(key).combine_chunks().cast(pa.string()).drop_null())
        mg = MisraGries(mg_k)
        mg.add_counts(vc.field("values").to_pylist(),
                      vc.field("counts").to_pylist())
        n = int(pc.sum(vc.field("counts")).as_py() or 0)
        return pa.table({"s": pa.array([pickle.dumps(mg)], pa.binary()),
                         "n": pa.array([n], pa.int64())})

    merged = MisraGries(mg_k)
    total = 0
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        merged.merge(pickle.loads(r["s"]))
        total += r["n"]
    return merged, total


def detect_hot_keys(ds, key: str, hot_threshold: int, mg_k: int = 1024,
                    batch_size: int | None = 65536) -> list[str]:
    """Keys (as strings) whose global count MAY reach ``hot_threshold``
    — a guaranteed SUPERSET via per-batch Misra-Gries summaries merged
    on the driver (bounded: ≤ mg_k counters per block and at the end).
    Supersets are the right direction for skew handling: salting a
    cold key is harmless, missing a hot one recreates the hotspot.
    Raises when the merged error bound voids the superset guarantee
    (raise ``mg_k``) — never a silent miss."""
    merged, _ = _mg_summary(ds, key, mg_k, batch_size=batch_size)
    if merged.err >= hot_threshold:
        raise ValueError(
            f"detect_hot_keys: Misra-Gries error bound {merged.err} >= "
            f"hot_threshold {hot_threshold}; raise mg_k (currently {mg_k})")
    return merged.candidates(hot_threshold)


def salted_hash_join(left, right, left_key: str, right_key: str,
                     left_cols: list[str], right_cols: list[str],
                     how: str = "inner", n_buckets: int = 64,
                     replication: int = 8,
                     hot_keys: list[str] | None = None,
                     hot_threshold: int | None = None, mg_k: int = 1024):
    """:func:`hash_join` with EXPLICIT hot-key salting — the skew cure
    the north rule names for Zipf-distributed hosts.  A hot key floods
    one bucket of the plain exchange (one worker serializes the whole
    host while the rest idle); here each hot fact row takes a salt in
    ``[0, replication)`` and the matching right-side rows REPLICATE
    once per salt, so a hot key's work spreads over ``replication``
    buckets.  Cold keys salt to 0 — same cost as the plain join.

    Correct for inner/left/semi/anti: every fact row lives in exactly
    ONE (key, salt) partition, so no match duplicates and no missed
    matches; right/full would emit one row per salt for unmatched
    replicated dim rows and are rejected.  The per-bucket join keys on
    (key, salt) — two hot keys colliding into one bucket cannot
    cross-match each other's salts.

    ``hot_keys`` (strings) may be given directly (e.g. from a previous
    run's profile); otherwise :func:`detect_hot_keys` finds a bounded
    superset with ``hot_threshold`` (default: a fair bucket share,
    fact_rows / n_buckets, counted inside the same summary pass) —
    detection then costs one extra streaming pass over the projected
    fact columns; the fact side is never pinned in the object store."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            "salted_hash_join supports inner/left/semi/anti only "
            "(right/full would duplicate unmatched replicated dim rows)")
    if replication < 2:
        raise ValueError("replication must be >= 2")
    left_cols = [c for c in left_cols if c != left_key]
    right_cols = ([] if how in ("semi", "anti")
                  else [c for c in right_cols if c != right_key])

    if hot_keys is None:
        # the detection pass re-executes the (projected) fact lineage
        # once instead of pinning the whole fact side in the object
        # store — the fact side is big by premise (that's why salting
        # exists), and the MG pass computes the fair-share total itself
        merged, total = _mg_summary(left, left_key, mg_k)
        if hot_threshold is None:
            hot_threshold = max(2, total // n_buckets)
        if merged.err >= hot_threshold:
            raise ValueError(
                f"salted_hash_join: Misra-Gries error bound {merged.err} "
                f">= hot_threshold {hot_threshold}; raise mg_k "
                f"(currently {mg_k})")
        hot_keys = merged.candidates(hot_threshold)
    hot_arr = pa.array(sorted(hot_keys), pa.string())

    l_schema = left.schema()
    key_type = dict(zip(l_schema.names, l_schema.types))[left_key]
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_schema = right.schema()
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    want_right = how in ("inner", "left")
    R = replication

    def _bucketed(key: pa.Array, salt: np.ndarray) -> pa.Array:
        ks = pc.binary_join_element_wise(
            pc.cast(key, pa.string()),
            pa.array(salt.astype("U"), pa.string()), "\x1f")
        return bucket_of(ks, n_buckets)

    def _tag_left(t: pa.Table) -> pa.Table:
        key = t.column(left_key).combine_chunks()
        hot = pc.is_in(pc.cast(key, pa.string()), value_set=hot_arr
                       ).to_numpy(zero_copy_only=False)
        salt = np.where(hot, np.arange(t.num_rows, dtype=np.int64) % R, 0)
        cols = {"__key": key, "__salt": pa.array(salt)}
        for c in left_cols:
            cols[c] = t.column(c)
        for c in (right_cols if want_right else []):
            cols[c] = pa.nulls(t.num_rows, r_types[c])
        out = pa.table(cols)
        return (out.append_column("__bucket", _bucketed(key, salt))
                   .append_column("__side",
                                  pa.array(np.zeros(t.num_rows, np.int8))))

    def _tag_right(t: pa.Table) -> pa.Table:
        key = t.column(right_key).combine_chunks().cast(key_type)
        hot = pc.is_in(pc.cast(key, pa.string()), value_set=hot_arr
                       ).to_numpy(zero_copy_only=False)
        # replicate hot rows once per salt, cold rows once with salt 0
        idx = np.concatenate([np.flatnonzero(~hot)]
                             + [np.flatnonzero(hot)] * R)
        salt = np.concatenate(
            [np.zeros((~hot).sum(), np.int64)]
            + [np.full(int(hot.sum()), s, np.int64) for s in range(R)])
        taken = t.take(pa.array(idx))
        key_r = taken.column(right_key).combine_chunks().cast(key_type)
        cols = {"__key": key_r, "__salt": pa.array(salt)}
        for c in left_cols:
            cols[c] = pa.nulls(taken.num_rows, l_types[c])
        for c in (right_cols if want_right else []):
            cols[c] = taken.column(c)
        out = pa.table(cols)
        return (out.append_column("__bucket", _bucketed(key_r, salt))
                   .append_column("__side",
                                  pa.array(np.ones(taken.num_rows, np.int8))))

    both = (left.map_batches(_tag_left, batch_format="pyarrow",
                             batch_size=JOIN_COALESCE_ROWS)
            .union(right.map_batches(_tag_right, batch_format="pyarrow",
                                     batch_size=JOIN_COALESCE_ROWS)))

    out_cols = [left_key] + left_cols + (right_cols if want_right else [])
    jt = _ARROW_JOIN_TYPE[how]

    def _join(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        l = (group.filter(pc.equal(side, 0))
             .select(["__key", "__salt"] + left_cols)
             .rename_columns([left_key, "__salt"] + left_cols))
        r = (group.filter(pc.equal(side, 1))
             .select(["__key", "__salt"] + right_cols)
             .rename_columns([left_key, "__salt"] + right_cols))
        joined = l.join(r, keys=[left_key, "__salt"], join_type=jt)
        if how == "anti":
            joined = joined.filter(pc.is_valid(joined.column(left_key)))
        return joined.select(out_cols)

    return both.groupby("__bucket").map_groups(_join, batch_format="pyarrow")


def join_auto(fact, dim, fact_key: str, dim_key: str,
              fact_cols: list[str], dim_cols: list[str],
              how: str = "inner", broadcast_max_rows: int = 2_000_000,
              n_buckets: int = 64):
    """Strategy-picking join: count the dim side (metadata-cheap) and
    take the broadcast path when it fits one object-store object,
    else the hash-partitioned exchange — the two-strategy choice every
    caller was making by hand, automated on the measured row count.
    ``full``/``right`` always route to the hash path (broadcast
    streams the fact side and cannot emit unmatched dim rows).  The two paths
    emit the same columns but may order them differently — select
    downstream if order matters."""
    # count() and the chosen join are two consumers of the dim lineage:
    # materialize once or any derived dim pipeline executes twice
    dim = dim.materialize()
    n_dim = dim.count()
    if how not in ("full", "right") and n_dim <= broadcast_max_rows:
        return broadcast_join(fact, dim, fact_key, dim_key, dim_cols,
                              how=how, fact_cols=fact_cols)
    return hash_join(fact, dim, fact_key, dim_key,
                     fact_cols, dim_cols, how=how, n_buckets=n_buckets)


def dataset_diff(a, b, key: str, compare_cols: list[str],
                 n_buckets: int = 64):
    """Snapshot diff between two keyed datasets (recrawl vs previous
    crawl, table version vs version): emits (key, status) with status
    ``added`` (key only in b), ``removed`` (only in a) or ``changed``
    (in both, any compared column differs, null-safe); unchanged rows
    emit nothing.  Keys are assumed unique per side.

    Shape: ONE co-bucketed exchange of key + compared columns (the
    shared :func:`bucket_of` recipe), per-bucket full-outer Arrow join
    + vectorized column compare — output is bounded by the differing
    rows."""
    schema_a = a.schema()
    a_types = dict(zip(schema_a.names, schema_a.types))

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            key_col = t.column(key).combine_chunks()
            cols = {"__key": key_col}
            for c in compare_cols:
                col = t.column(c)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[c] = col.cast(a_types[c])
            out = pa.table(cols)
            return (out.append_column("__bucket", bucket_of(key_col, n_buckets))
                    .append_column("__side",
                                   pa.array(np.full(t.num_rows, side, np.int8))))
        return _f

    both = (a.map_batches(_tag(0), batch_format="pyarrow",
                          batch_size=JOIN_COALESCE_ROWS)
            .union(b.map_batches(_tag(1), batch_format="pyarrow",
                                 batch_size=JOIN_COALESCE_ROWS)))

    def _diff(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        l = group.filter(pc.equal(side, 0)).select(["__key"] + compare_cols)
        l = l.append_column("__in_a", pa.array(np.ones(l.num_rows, bool)))
        r = group.filter(pc.equal(side, 1)).select(["__key"] + compare_cols)
        r = r.append_column("__in_b", pa.array(np.ones(r.num_rows, bool)))
        j = l.join(r, keys="__key", join_type="full outer", right_suffix="__r")
        in_a = pc.fill_null(j.column("__in_a"), False)
        in_b = pc.fill_null(j.column("__in_b"), False)
        changed = pa.array(np.zeros(j.num_rows, bool))
        for c in compare_cols:
            x, y = j.column(c), j.column(f"{c}__r")
            same = pc.or_(pc.fill_null(pc.equal(x, y), False),
                          pc.and_(pc.is_null(x), pc.is_null(y)))
            changed = pc.or_(changed, pc.invert(same))
        status = pc.if_else(
            pc.invert(in_a), pa.scalar("added"),
            pc.if_else(pc.invert(in_b), pa.scalar("removed"),
                       pc.if_else(changed, pa.scalar("changed"),
                                  pa.nulls(j.num_rows, pa.string()))))
        if isinstance(status, pa.ChunkedArray):
            status = status.combine_chunks()
        keep = pc.is_valid(status)
        return pa.table({key: j.column("__key").filter(keep),
                         "status": status.filter(keep)})

    return both.groupby("__bucket").map_groups(_diff, batch_format="pyarrow")


class _BloomPartial:
    """Dim batch -> one serialized Bloom over the key hashes."""

    def __init__(self, key: str, m_bits: int, k_hashes: int):
        self.key = key
        self.m_bits = m_bits
        self.k_hashes = k_hashes

    def __call__(self, t: pa.Table) -> pa.Table:
        import pickle

        from peri_ray.state.sketches import Bloom, hash_strings

        keys = t.column(self.key).combine_chunks().cast(pa.string()).drop_null()
        b = Bloom(self.m_bits, self.k_hashes)
        if len(keys):
            b.add_hashes(hash_strings(keys))
        return pa.table({"bloom": pa.array([pickle.dumps(b)], pa.binary())})


class _BloomPrune:
    """Fact batch -> rows whose key the broadcast Bloom says MAY be in
    the dim.  Absence is exact (no false negatives), so dropped rows
    are guaranteed non-matching; survivors still need verification."""

    def __init__(self, key: str, bloom_ref):
        import ray

        self.key = key
        self.bloom = ray.get(bloom_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from peri_ray.state.sketches import hash_strings

        keys = t.column(self.key).combine_chunks().cast(pa.string())
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        mask = np.zeros(t.num_rows, bool)
        if valid.any():
            mask[valid] = self.bloom.contains_hashes(
                hash_strings(keys.drop_null()))
        return t.filter(pa.array(mask))


def bloom_semi_join(fact, dim, fact_key: str, dim_key: str,
                    fact_cols: list[str], m_bits: int = 1 << 22,
                    k_hashes: int = 4, n_buckets: int = 64):
    """Semi join tuned for a SELECTIVE dim (most fact rows have no
    partner — filtered dimensions, incremental deltas): a Bloom filter
    of the dim keys broadcasts in O(m_bits) regardless of dim
    cardinality, and fact rows the Bloom proves absent never enter the
    exchange.  Survivors (true matches + the Bloom's false positives)
    go through the exact hash-partitioned semi join, so the RESULT is
    exact at any false-positive rate — the Bloom only changes how many
    bytes shuffle, never the answer.

    Driver/broadcast memory is fixed by ``m_bits`` (default 4 Mbit =
    512 KB), unlike broadcast_join's O(dim) — this is the middle path
    between broadcast (dim fits in one object) and a full two-sided
    exchange (no pruning at all)."""
    import pickle

    import ray

    from peri_ray.state.sketches import Bloom

    # two consumers (Bloom build + the exact join's right side): pin
    # the dim lineage or each re-executes its upstream pipeline
    dim = dim.materialize()
    # coarse bundle: each partial is a full m_bits bitmap regardless of
    # input rows, so per-tiny-block partials just multiply the 512 KB
    # blobs the driver must fetch and OR together
    rows = dim.select_columns([dim_key]).map_batches(
        _BloomPartial(dim_key, m_bits, k_hashes),
        batch_format="pyarrow", batch_size=262144).take_all()
    merged = Bloom(m_bits, k_hashes)
    for r in rows:
        merged.merge(pickle.loads(r["bloom"]))
    bloom_ref = ray.put(merged)

    pruned = fact.map_batches(_BloomPrune(fact_key, bloom_ref),
                              batch_format="pyarrow")
    return hash_join(pruned, dim, fact_key, dim_key, fact_cols, [],
                     how="semi", n_buckets=n_buckets)


def broadcast_range_lookup(ds, ranges: pa.Table, key_col: str,
                           lo_col: str = "lo", hi_col: str = "hi",
                           value_cols: list[str] | None = None,
                           batch_size: int | None = 65536):
    """Attach static-range attributes to every row — the IP→ASN/geo
    tagging shape of crawl enrichment: the lookup side is a SMALL
    table of NON-OVERLAPPING [lo, hi] intervals (IP blocks, id shards,
    date eras) that broadcasts once via ``ray.put``, and each batch
    resolves its keys with ONE ``searchsorted`` against the sorted lo
    bounds + an upper-bound check — shuffle-free, O(log R) per row,
    unlike the general interval-overlap join (which exchanges both
    sides and allows overlap).

    Keys outside every range (gaps) get null attributes — LEFT JOIN
    semantics.  Overlapping ranges raise at build time: silent
    first-match would hide a corrupt lookup table."""
    import ray

    value_cols = list(value_cols or
                      [c for c in ranges.column_names
                       if c not in (lo_col, hi_col)])
    r = ranges.sort_by([(lo_col, "ascending")])
    lo = r.column(lo_col).combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    hi = r.column(hi_col).combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    if (hi < lo).any():
        raise ValueError("broadcast_range_lookup: hi < lo range")
    if len(lo) > 1 and (lo[1:] <= hi[:-1]).any():
        raise ValueError("broadcast_range_lookup: overlapping ranges")
    vals = {c: r.column(c).combine_chunks() for c in value_cols}
    side_ref = ray.put((lo, hi, vals))

    def _tag(t: pa.Table) -> pa.Table:
        slo, shi, svals = ray.get(side_ref)
        keys = t.column(key_col).combine_chunks().cast(pa.int64())
        null = pc.is_null(keys).to_numpy(zero_copy_only=False)
        k = keys.fill_null(0).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(slo, k, side="right") - 1
        ok = (idx >= 0) & ~null
        idx = np.clip(idx, 0, max(len(slo) - 1, 0))
        if len(slo):
            ok &= k <= shi[idx]
        else:
            ok[:] = False
        # gather with a safe index, then null out the out-of-range rows
        gather = pa.array(np.where(ok, idx, 0), pa.int64())
        oka = pa.array(ok)
        out = t
        for c, arr in svals.items():
            if len(arr):
                col = pc.if_else(oka, arr.take(gather),
                                 pa.scalar(None, arr.type))
            else:
                col = pa.nulls(len(t), arr.type)
            out = out.append_column(c, col)
        return out

    return ds.map_batches(_tag, batch_format="pyarrow",
                          batch_size=batch_size)


def bucketed_disk_join(dir_a: str, dir_b: str,
                       left_cols: list[str] | None = None,
                       right_cols: list[str] | None = None,
                       how: str = "inner"):
    """EXCHANGE-FREE join of two tables persisted by
    ``sources.write_bucketed`` with the same bucket count and hash
    scheme: bucket K of A can only match bucket K of B, so the join is
    one independent task per bucket pair — each reads two pruned
    bucket directories and runs ONE vectorized Arrow join.  No row
    moves between tasks; the exchange was paid once at write time and
    every subsequent join on that key rides it for free (the durable
    form of "pick ONE partitioning key and reuse it across stages").

    The sibling manifests must agree on (n_buckets, hash) — a
    mismatched pair fails loudly (silently co-locating nothing is the
    failure mode bucketed layouts are notorious for).  Join keys keep
    their per-table names from the manifests.  Only ``how="inner"``
    (the enrich/fact-dim shape) is supported; outer shapes belong to
    the exchange joins."""
    import json
    import os

    import ray.data as rd

    if how != "inner":
        raise ValueError("bucketed_disk_join supports how='inner' only")
    with open(dir_a + ".bucketed.json") as f:
        ma = json.load(f)
    with open(dir_b + ".bucketed.json") as f:
        mb = json.load(f)
    if (ma["n_buckets"], ma["hash"]) != (mb["n_buckets"], mb["hash"]):
        raise ValueError(
            f"bucket layouts disagree: {ma} vs {mb} — rewrite one side")
    ka, kb = ma["key_col"], mb["key_col"]
    n = int(ma["n_buckets"])
    lc = list(left_cols or [])
    rc = list(right_cols or [])

    def _join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.dataset as pds
        import pyarrow.parquet as pq

        outs = []
        for b in t.column("bucket").to_pylist():
            da = os.path.join(dir_a, f"bucket={b}")
            db = os.path.join(dir_b, f"bucket={b}")
            if not (os.path.isdir(da) and os.path.isdir(db)):
                continue
            ta = pq.read_table(da, columns=[ka] + lc)
            tb = pq.read_table(db, columns=[kb] + rc)
            outs.append(ta.join(tb, keys=ka, right_keys=kb,
                                join_type="inner"))
        if not outs:
            sa = pds.dataset(dir_a, partitioning="hive").schema
            sb = pds.dataset(dir_b, partitioning="hive").schema
            fields = [(ka, sa.field(ka).type)]
            fields += [(c, sa.field(c).type) for c in lc]
            fields += [(c, sb.field(c).type) for c in rc]
            return pa.schema(fields).empty_table()
        return pa.concat_tables(outs)

    buckets = rd.from_items([{"bucket": b} for b in range(n)],
                            override_num_blocks=n)
    return buckets.map_batches(_join_bucket, batch_format="pyarrow")


def join_cardinality(left, right, left_key: str, right_key: str,
                     n_buckets: int = 64,
                     batch_size: int | None = 65536) -> pa.Table:
    """Exact equi-join size + skew probe WITHOUT running the join —
    the planner-side answer to "can we afford this join, and is it
    hot-key-skewed?".  |A ⋈ B| = Σ_k n_A(k)·n_B(k), which needs only
    the per-key COUNT tables: each side ships (key, count) partials
    (never payload), one hash-bucketed exchange co-locates equal keys,
    and per-bucket partials reduce to ONE driver row.

    Returns a 1-row Table: left_keys / right_keys / common_keys
    (distinct key counts, null keys excluded — they never join),
    join_rows (exact output size), and max_key_rows (the largest
    single key's contribution — the skew signal that decides between
    hash_join and salted_hash_join).  All counts BIGINT-exact."""
    import ray

    from peri_ray.stages.dedup import map_groups_via_buckets

    # keep integer keys NATIVE through the exchange (measured 5.8 s ->
    # 5.3 s at 12.8 M rows with per-batch-distinct keys; the exchange
    # also ships 8-byte ints instead of strings); fall back to string
    # only for mixed or non-integer key types
    def _ktype(ds_, key):
        f = ds_.schema().base_schema.field(key).type
        return f

    lt, rt = _ktype(left, left_key), _ktype(right, right_key)
    if pa.types.is_integer(lt) and pa.types.is_integer(rt):
        ktype = pa.int64()
    else:
        ktype = pa.string()

    def _counts(key: str, side: int):
        def _c(t: pa.Table) -> pa.Table:
            col = t.column(key).combine_chunks()
            sub = pa.table({"k": col.cast(ktype)}).filter(
                pc.is_valid(col))
            g = sub.group_by("k").aggregate([([], "count_all")])
            g = g.rename_columns(["k", "n"])
            return g.append_column(
                "side", pa.array(np.full(g.num_rows, side, np.int8)))
        return _c

    parts = left.map_batches(_counts(left_key, 0),
                             batch_format="pyarrow",
                             batch_size=batch_size).union(
        right.map_batches(_counts(right_key, 1),
                          batch_format="pyarrow", batch_size=batch_size))

    def _bucket_stats(group: pa.Table) -> pa.Table:
        g = (group.select(["k", "side", "n"])
             .group_by(["k", "side"]).aggregate([("n", "sum")]))
        k = g.column("k").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        n = g.column("n_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, side, n = k[order], side[order], n[order]
        bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nl = np.zeros(len(bounds), np.int64)
        nr = np.zeros(len(bounds), np.int64)
        seg = np.repeat(np.arange(len(bounds)),
                        np.diff(np.append(bounds, len(k))))
        np.add.at(nl, seg[side == 0], n[side == 0])
        np.add.at(nr, seg[side == 1], n[side == 1])
        prod = nl * nr
        return pa.table({
            "left_keys": pa.array([int((nl > 0).sum())], pa.int64()),
            "right_keys": pa.array([int((nr > 0).sum())], pa.int64()),
            "common_keys": pa.array([int(((nl > 0) & (nr > 0)).sum())],
                                    pa.int64()),
            "join_rows": pa.array([int(prod.sum())], pa.int64()),
            "max_key_rows": pa.array([int(prod.max()) if len(prod)
                                      else 0], pa.int64())})

    stats = map_groups_via_buckets(parts, ["k"], _bucket_stats,
                                   n_buckets=n_buckets)
    tabs = [ray.get(r) for r in stats.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return pa.table({c: pa.array([0], pa.int64())
                         for c in ("left_keys", "right_keys",
                                   "common_keys", "join_rows",
                                   "max_key_rows")})
    m = pa.concat_tables(tabs)
    agg = {c: int(pc.sum(m.column(c)).as_py() or 0)
           for c in ("left_keys", "right_keys", "common_keys",
                     "join_rows")}
    agg["max_key_rows"] = int(pc.max(m.column("max_key_rows")).as_py()
                              or 0)
    return pa.table({c: pa.array([v], pa.int64())
                     for c, v in agg.items()})
