"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: baseline — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, read per task), partial
  top-k per batch, merged on the driver.  Exact; scales linearly.
- ``lsh_bucketed_topk``: scale path — random-hyperplane LSH buckets
  (SimHash for vectors); candidates searched only within matching
  buckets, cutting the scanned fraction; recall controlled by number of
  tables/planes.
- ``embedding_near_dups``: cosine-threshold near-duplicate pairs via
  the same LSH bucketing (embedding-cosine near-dup for dedup suites).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_matrix(col: pa.ChunkedArray | pa.Array, dtype=np.float32) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKPartial:
    """Batch → per-query local top-k (query_idx, id, score) rows.
    The query matrix is broadcast: resolved once per task from the
    object store, never per batch."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str,
                 dtype=np.float32):
        import ray

        self.dtype = dtype
        self.q = _normalize(ray.get(queries_ref).astype(dtype))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, table: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(table.column(self.vec_col), self.dtype))
        ids = table.column(self.id_col).to_numpy(zero_copy_only=False)
        # dedupe ids WITHIN the batch before the per-batch top-k:
        # duplicated candidate rows (banded multi-table LSH) would
        # otherwise fill the k slots with copies of one id and drop
        # distinct candidates before the driver merge ever sees them
        if len(ids) and len(np.unique(ids)) != len(ids):
            _, first = np.unique(ids, return_index=True)
            first.sort()
            ids = ids[first]
            m = m[first]
        sims = self.q @ m.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        qi, vid, sc = [], [], []
        for qidx in range(sims.shape[0]):
            sel = top[qidx]
            qi.extend([qidx] * len(sel))
            vid.extend(ids[sel].tolist())
            sc.extend(sims[qidx, sel].tolist())
        return pa.table(
            {
                "query_idx": pa.array(qi, pa.int32()),
                "id": pa.array(vid, pa.int64()),
                "score": pa.array(sc, pa.float64() if self.dtype == np.float64
                                  else pa.float32()),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     batch_size: int | None = 4096,
                     dtype=np.float32) -> list[list[tuple[int, float]]]:
    """Exact cosine top-k of each query row against the dataset.
    Returns, per query, a list of (id, score) sorted by score desc, id
    asc (deterministic tiebreak).  ``dtype=np.float64`` computes in
    double precision (oracle-comparable against SQL cosine)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype))
    partials = ds.map_batches(
        _TopKPartial(qref, k, id_col, vec_col, dtype), batch_format="pyarrow",
        batch_size=batch_size,
    ).take_all()
    # dedupe by (query, id) at the merge: candidate feeds may ship the
    # same vector several times (banded multi-table LSH), and a heap of
    # raw partials would return one id twice inside a top-k
    seen: dict[int, dict[int, float]] = {}
    for r in partials:
        d = seen.setdefault(r["query_idx"], {})
        iid, s = r["id"], r["score"]
        if iid not in d or s > d[iid]:
            d[iid] = s
    out = []
    for qidx in range(len(queries)):
        best = heapq.nlargest(
            k, [(s, -iid) for iid, s in seen.get(qidx, {}).items()])
        out.append([(-negid, float(s)) for s, negid in best])
    return out


class _LSHBucketer:
    """Random-hyperplane signature per vector (stateful: planes built
    once per actor)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_planes)).astype(np.float32)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, table: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(table.column(self.vec_col)))
        bits = (m @ self.planes) > 0
        bucket = np.zeros(len(m), np.int64)
        for j in range(bits.shape[1]):
            bucket |= bits[:, j].astype(np.int64) << j
        return table.append_column("bucket", pa.array(bucket))


def lsh_bucketed_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      seed: int = 5, n_probe_bits: int = 1,
                      n_tables: int = 1):
    """Approximate top-k: only vectors whose LSH bucket lies within
    Hamming distance ``n_probe_bits`` of a query's bucket are scored
    (multi-probe LSH, Lv et al. VLDB'07: a true neighbor on the wrong
    side of ONE hyperplane lands in an adjacent bucket, and probing
    those costs (n_planes choose ≤b) extra buckets instead of more
    tables).  ``n_tables > 1`` adds the orthogonal OR-construction:
    each vector enters one bucket per independent table and a
    candidate needs to match the query in ANY table (probing applies
    per table); duplicates collapse in the top-k merge.  Recall < 1 by
    design; (n_planes, n_probe_bits, n_tables) trades recall against
    the scanned fraction — measure with ``ann_recall_report`` before
    trusting a configuration."""
    import itertools as _it

    import pyarrow.compute as _pc

    q = np.asarray(queries, np.float32)
    dim = q.shape[1]

    def _probe(buckets: set[int]) -> set[int]:
        probed = set(buckets)
        for b in buckets:
            for r in range(1, n_probe_bits + 1):
                for bits in _it.combinations(range(n_planes), r):
                    flip = b
                    for bit in bits:
                        flip ^= (1 << bit)
                    probed.add(flip)
        return probed

    qtbl = pa.table({id_col: pa.array(np.arange(len(q)), pa.int64()),
                     vec_col: pa.array(list(q))})
    if n_tables > 1:
        bucketer = _MultiLSHBucketer(dim, n_planes, n_tables, seed,
                                     id_col, vec_col)
        qb = bucketer(qtbl)
        qt = qb.column("table").to_numpy(zero_copy_only=False)
        qbk = qb.column("bucket").to_numpy(zero_copy_only=False)
        keys: set[int] = set()
        for ti in range(n_tables):
            per = _probe({int(b) for b in qbk[qt == ti]})
            keys |= {(ti << n_planes) | b for b in per}
        qkeys = pa.array(sorted(keys), pa.int64())
        bucketed = ds.map_batches(bucketer, batch_format="pyarrow")

        def _filter(t: pa.Table) -> pa.Table:
            key = _pc.bit_wise_or(
                _pc.shift_left(t.column("table").combine_chunks()
                               .cast(pa.int64()), n_planes),
                t.column("bucket").combine_chunks())
            return t.filter(_pc.is_in(key, value_set=qkeys))
    else:
        bucketer = _LSHBucketer(dim, n_planes, seed, id_col, vec_col)
        qb = bucketer(qtbl)
        probed = _probe(set(qb.column("bucket").to_pylist()))
        qbuckets = pa.array(sorted(probed), pa.int64())
        bucketed = ds.map_batches(bucketer, batch_format="pyarrow")

        def _filter(t: pa.Table) -> pa.Table:
            mask = _pc.is_in(t.column("bucket").combine_chunks(),
                             value_set=qbuckets)
            return t.filter(mask)

    candidates = bucketed.map_batches(_filter, batch_format="pyarrow")
    return brute_force_topk(candidates, q, k, id_col, vec_col)


class _MultiLSHBucketer:
    """Banded random-hyperplane LSH: each vector enters ``n_tables``
    independent buckets (one per table of ``n_planes`` planes) —
    OR-construction, so a true near-dup pair is missed only if EVERY
    table separates it: recall 1-(1-p^planes)^tables vs the single
    table's p^planes (p = 1 - θ/π).  Output explodes ×n_tables rows
    of (id, vec, table, bucket)."""

    def __init__(self, dim: int, n_planes: int, n_tables: int, seed: int,
                 id_col: str, vec_col: str):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(
            size=(n_tables, dim, n_planes)).astype(np.float32)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, table: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(table.column(self.vec_col)))
        n_tables = self.planes.shape[0]
        n = len(m)
        weights = (1 << np.arange(self.planes.shape[2], dtype=np.int64))
        out_tbl, out_bkt = [], []
        for ti in range(n_tables):
            bits = (m @ self.planes[ti]) > 0
            out_tbl.append(np.full(n, ti, np.int32))
            out_bkt.append(bits.astype(np.int64) @ weights)
        idx = np.tile(np.arange(n, dtype=np.int64), n_tables)
        taken = table.take(pa.array(idx))
        return pa.table({
            self.id_col: taken.column(self.id_col),
            self.vec_col: taken.column(self.vec_col),
            "table": pa.array(np.concatenate(out_tbl)),
            "bucket": pa.array(np.concatenate(out_bkt)),
        })


def embedding_near_dups(ds, threshold: float = 0.95, n_planes: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 5, n_tables: int = 1):
    """Cosine-threshold near-duplicate pairs: LSH-bucket, then exact
    cosine within buckets (groupby → map_groups; only same-bucket pairs
    are scored).  ``n_tables > 1`` switches to the banded
    OR-construction (recall 1-(1-p^n_planes)^n_tables; pairs found in
    several tables collapse in the final max-per-pair exchange)."""
    first = ds.take(1)
    dim = len(first[0][vec_col])
    if n_tables > 1:
        bucketed = ds.map_batches(
            _MultiLSHBucketer(dim, n_planes, n_tables, seed, id_col,
                              vec_col),
            batch_format="pyarrow")
        group_cols = ["table", "bucket"]
    else:
        bucketed = ds.map_batches(
            _LSHBucketer(dim, n_planes, seed, id_col, vec_col),
            batch_format="pyarrow")
        group_cols = ["bucket"]

    def _pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                              ("cosine", pa.float64())]).empty_table()
        m = _normalize(_as_matrix(group.column(vec_col)))
        ids = np.asarray(group.column(id_col).to_pylist())
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        a = np.minimum(ids[ia[mask]], ids[ib[mask]])
        b = np.maximum(ids[ia[mask]], ids[ib[mask]])
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64()),
                         "cosine": pa.array(sims[ia[mask], ib[mask]], pa.float64())})

    # both the LSH buckets and the distinct pairs have ~row-count
    # cardinality: run-sliced exchanges, not Ray per-group aggregates
    from peri_ray.stages.checks import bucket_of
    from peri_ray.stages.dedup import per_group_via_buckets

    pairs = per_group_via_buckets(bucketed, group_cols, _pairs)

    def _tag(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("id_a").cast(pa.string()),
            t.column("id_b").cast(pa.string()), ":")
        return t.append_column("__pb", bucket_of(key, 64))

    def _max(group: pa.Table) -> pa.Table:
        g = (group.select(["id_a", "id_b", "cosine"])
             .group_by(["id_a", "id_b"]).aggregate([("cosine", "max")]))
        return g.rename_columns(["id_a", "id_b", "max(cosine)"])

    return (pairs.map_batches(_tag, batch_format="pyarrow")
            .groupby("__pb").map_groups(_max, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _kmeans(X: np.ndarray, n_cells: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Small k-means on a driver-side training sample (spherical:
    vectors are normalized, distance = 1 - cosine)."""
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


class _IVFAssign:
    """Stateful stage: centroids built once per actor from the broadcast
    training sample (ray.put handle — shipped once, not per batch)."""

    def __init__(self, centroids_ref, id_col: str, vec_col: str):
        import ray

        self.cent = ray.get(centroids_ref)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, table: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(table.column(self.vec_col)))
        cell = (m @ self.cent.T).argmax(axis=1).astype(np.int32)
        return table.append_column("cell", pa.array(cell))


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_cells: int = 16,
             nprobe: int = 4, train_sample: int = 4096, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF approximate top-k: train a coarse quantizer on a sample,
    assign every vector to its nearest centroid cell, then score only
    vectors in each query's ``nprobe`` closest cells.  Scanned fraction
    ≈ nprobe/n_cells; recall grows with nprobe (IVF-Flat semantics).

    Scale path: centroids broadcast once via ray.put; assignment is a
    stateless vectorized stage; candidate filtering happens inside
    map_batches so only the scanned fraction reaches the scorer."""
    import ray

    q = _normalize(np.asarray(queries, np.float32))
    sample = ds.take(train_sample)
    X = _normalize(np.stack([np.asarray(r[vec_col], np.float32) for r in sample]))
    cent = _kmeans(X, n_cells, seed=seed)
    cent_ref = ray.put(cent)

    probe_cells = pa.array(
        sorted(set(
            np.argsort(-(q @ cent.T), axis=1)[:, :nprobe].ravel().tolist()
        )),
        pa.int32(),
    )
    assigned = ds.map_batches(
        _IVFAssign, fn_constructor_kwargs=dict(
            centroids_ref=cent_ref, id_col=id_col, vec_col=vec_col),
        concurrency=4, batch_format="pyarrow",
    )

    def _filter(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("cell"), value_set=probe_cells)
        return t.filter(mask).drop_columns(["cell"])

    candidates = assigned.map_batches(_filter, batch_format="pyarrow")
    return brute_force_topk(candidates, q, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# int8 quantization — embedding storage compression for the 100 TB path
# ---------------------------------------------------------------------------


class _KMeansPartial:
    """One Lloyd half-step per batch: assign rows to the nearest
    broadcast centroid, emit per-cluster (cnt, vec_sum, sse) partials
    — output is ≤ k rows per block, so the driver merge is bounded by
    blocks × k regardless of corpus size."""

    def __init__(self, vec_col: str, cent_ref):
        import ray

        self.vec_col = vec_col
        self.c = ray.get(cent_ref)  # (k, d) float64
        self.c_sq = (self.c * self.c).sum(axis=1)

    def _assign(self, t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        x = _as_matrix(t.column(self.vec_col), np.float64)
        # ||x-c||² = ||x||² - 2·x·cᵀ + ||c||²; argmin drops the x term
        d2 = self.c_sq[None, :] - 2.0 * (x @ self.c.T)
        lab = d2.argmin(axis=1)
        sse = (x * x).sum(axis=1) + d2[np.arange(len(x)), lab]
        return lab, sse, x

    def __call__(self, t: pa.Table) -> pa.Table:
        lab, sse, x = self._assign(t)
        k, d = self.c.shape
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, lab, x)
        cnts = np.bincount(lab, minlength=k)
        sse_sums = np.bincount(lab, weights=sse, minlength=k)
        present = cnts > 0
        return pa.table({
            "cluster": pa.array(np.flatnonzero(present), pa.int64()),
            "cnt": pa.array(cnts[present], pa.int64()),
            "sse": pa.array(sse_sums[present], pa.float64()),
            "vec_sum": pa.array([list(s) for s in sums[present]],
                                pa.list_(pa.float64(), d)),
        })


class _KMeansAssign(_KMeansPartial):
    """Final labelling pass: (id, cluster) per row."""

    def __init__(self, vec_col: str, id_col: str, cent_ref):
        super().__init__(vec_col, cent_ref)
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        lab, _, _ = self._assign(t)
        return pa.table({self.id_col: t.column(self.id_col),
                         "cluster": pa.array(lab, pa.int64())})


class _MinIdSeeds:
    """Per-batch partial for deterministic seeding: keep the k rows
    with the smallest ids (merged on the driver — bounded by
    blocks × k, stable under any block layout)."""

    def __init__(self, vec_col: str, id_col: str, k: int):
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).combine_chunks().to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[: self.k]
        sub = t.take(pa.array(np.sort(take)))
        vec = sub.column(self.vec_col).combine_chunks()
        if pa.types.is_large_list(vec.type):
            vec = vec.cast(pa.list_(vec.type.value_type))
        return pa.table({self.id_col: sub.column(self.id_col), self.vec_col: vec})


def kmeans_fit(ds, k: int = 8, iters: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id", batch_size: int | None = 4096,
               history_out: list | None = None):
    """Distributed Lloyd k-means over an embedding column — the
    iterative-algorithm shape on Ray Data: centroid state (k × d)
    lives on the driver between iterations and is re-broadcast with
    ``ray.put`` each round; every iteration is ONE streaming
    ``map_batches`` pass emitting ≤ k partial rows per block (no
    shuffle, no full materialization — the same partials-then-tiny-
    driver-merge trade as grouped_centroids).

    Deterministic: seeds are the k smallest-id rows (computed via
    bounded per-block partials, stable under any block layout), and
    Lloyd updates are float64.  Returns ``(assignments_dataset,
    centroids, inertia)`` where assignments is (id_col, cluster).
    Empty clusters keep their previous centroid."""
    import ray

    seed_rows = ds.map_batches(_MinIdSeeds(vec_col, id_col, k),
                               batch_format="pyarrow",
                               batch_size=batch_size).take_all()
    seed_rows.sort(key=lambda r: r[id_col])
    cents = np.array([r[vec_col] for r in seed_rows[:k]], np.float64)
    if len(cents) == 0:
        raise ValueError("kmeans_fit: empty input")
    inertia = float("nan")
    for _ in range(iters):
        cref = ray.put(cents)
        parts = ds.map_batches(_KMeansPartial(vec_col, cref),
                               batch_format="pyarrow", batch_size=batch_size)
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), np.int64)
        sse = 0.0
        for row in parts.take_all():
            c = row["cluster"]
            cnts[c] += row["cnt"]
            sse += row["sse"]
            sums[c] += np.asarray(row["vec_sum"], np.float64)
        nonempty = cnts > 0
        cents = np.where(nonempty[:, None], sums / np.maximum(cnts, 1)[:, None],
                         cents)
        inertia = sse
        if history_out is not None:
            # SSE of the assignment step vs the PRE-update centroids —
            # Lloyd guarantees this sequence is non-increasing, the
            # invariant the oracle audit asserts
            history_out.append(sse)
    cref = ray.put(cents)
    assigned = ds.map_batches(_KMeansAssign(vec_col, id_col, cref),
                              batch_format="pyarrow", batch_size=batch_size)
    return assigned, cents, inertia


def _prep_unit_rows(vec_col: str, id_col: str):
    """Shared staging map for the block-matmul joins: drop null
    vectors (a null list would desync _as_matrix's reshape from the id
    column — and SQL's NULL-comparison semantics drop those rows too),
    then emit (id, unit-normalized float64 row)."""
    import pyarrow.compute as _pc

    def _prep(t: pa.Table) -> pa.Table:
        vec = t.column(vec_col).combine_chunks()
        t = t.filter(_pc.is_valid(vec))
        if t.num_rows == 0:  # an all-null batch must not hit reshape
            return pa.table({id_col: pa.array([], pa.int64()),
                             "row": pa.array([], pa.list_(pa.float64()))})
        m = _normalize(_as_matrix(t.column(vec_col), np.float64))
        return pa.table({id_col: t.column(id_col).combine_chunks().cast(pa.int64()),
                         "row": pa.array(list(m), pa.list_(pa.float64()))})

    return _prep


# Test hook: set False to force the public-API staging path (the unit
# test for the fallback flips this; production always tries the fast
# private path first).
_USE_PRIVATE_BUNDLES = True


def _pool_cpus() -> int:
    """Actor-pool ceiling for the block-grid matmul stages: the
    cluster's CPU count (min 8 to keep small-host behavior).  Round 5:
    a hard min(8, ...) cap here made the 1M-doc semantic-
    decontamination soak scale 8->32 CPUs at only 0.54 efficiency —
    24 cores sat idle behind an 8-actor pool."""
    import ray

    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _grid_compute(n_cells: int, batch_size: int = 4):
    """Fixed actor pool for a block-grid matmul fan-out, with
    ``max_tasks_in_flight_per_actor=1``.  The in-flight default (4)
    EAGERLY binds queued tasks 4-deep to the first ready actors, so a
    32-task grid saturated at ~8 effective workers no matter the pool
    size (measured in the round-5 soak: 986 s of task time in 129 s of
    wall = 7.6x on 32 CPUs; a 32-task sleep toy went 20.6 s -> 6.3 s
    with in-flight 1).  Grid tasks are uniform multi-second matmuls —
    pipelining buys nothing, spreading buys everything."""
    from ray.data import ActorPoolStrategy

    n_tasks = max(1, -(-n_cells // batch_size))
    return ActorPoolStrategy(size=max(1, min(_pool_cpus(), n_tasks)),
                             max_tasks_in_flight_per_actor=1)


def _grid_batch(n_cells: int) -> int:
    """Cells per grid task: pack up to 4 cells only when that still
    leaves >= 4 task waves per actor — fewer waves quantize badly
    (a 36-cell kNN grid at batch 4 made 9 tasks for 32 CPUs: 23 idle
    cores; even batch 1 at 36 cells left a 2-wave straggler tail,
    which is why the stagers now also cut more, smaller blocks)."""
    return max(1, min(4, n_cells // max(1, 4 * _pool_cpus())))



def _staged_block_refs(prep):
    """Object refs of a materialized dataset's non-empty Arrow blocks
    — the staging step every block-grid matmul join shares.

    Fast path: ``Dataset.iter_internal_ref_bundles()`` — zero-copy
    block refs plus metadata row counts, but a PRIVATE Ray API.  If a
    Ray upgrade removes or breaks it, fall back to the public
    ``to_arrow_refs()`` and probe row counts with a zero-CPU remote
    task per block (ships one int per block back to the driver, never
    the block itself), so the joins degrade gracefully instead of
    crashing (VERDICT r3 item 3)."""
    import ray

    if _USE_PRIVATE_BUNDLES and hasattr(prep, "iter_internal_ref_bundles"):
        try:
            refs = []
            for bundle in prep.iter_internal_ref_bundles():
                for block_ref, meta in bundle.blocks:
                    if meta.num_rows:
                        refs.append(block_ref)
            return refs
        except Exception:
            pass  # private API changed shape — use the public path

    @ray.remote(num_cpus=0)
    def _nrows(t):
        return t.num_rows

    refs = prep.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    return [r for r, c in zip(refs, counts) if c]


#: Doubles per transient matmul chunk in the block-pair kernels
#: (~256 MB) and the minimum chunk rows (matmul efficiency floor).
#: Tests lower both to force many chunks and pin chunked == unchunked
#: results.
_CHUNK_TARGET_DOUBLES = 1 << 25
_CHUNK_MIN_STEP = 256


def _chunk_step(n_cols: int) -> int:
    return max(_CHUNK_MIN_STEP, _CHUNK_TARGET_DOUBLES // max(1, n_cols))


#: Sample width for the thresholded top-k fast path (and the minimum
#: row width that activates it).
_TOPK_SAMPLE = 2048


def _row_topk(s: np.ndarray, k: int):
    """EXACT per-row top-k of ``s`` ordered (value DESC, column index
    ASC), returned as aligned (cols, vals) ``(rows, k)`` matrices
    (rows with fewer than k finite entries pad with -inf, which
    callers filter).  Column index ASC == neighbor id ASC because
    block columns are id-sorted (see _block).

    Wide rows use a SAMPLED-THRESHOLD candidate prune: the kth-best
    of any >=k-element sample of a row is a safe inclusive threshold
    (at most k-1 full-row values exceed a true top-k member, so at
    most k-1 SAMPLED values exceed it, so the sample's kth-best can't
    exceed it) — one vectorized compare pass + exact selection over
    ~k·n/m candidates instead of a full-row introselect, which the
    300 K kNN soak measured dominating the matmul ~3:1 at 37 K-column
    chunks.  Exactness does not depend on the sample's distribution;
    the deterministic linspace sample keeps runs reproducible."""
    rows, n = s.shape
    kk = min(k, n)
    if rows == 0 or kk == 0:
        return (np.zeros((rows, 0), np.int64),
                np.zeros((rows, 0), np.float64))
    if n <= max(_TOPK_SAMPLE, 4 * kk):
        # narrow rows: argpartition + k-wide (val DESC, col ASC) sort
        if kk >= n:
            cand = np.tile(np.arange(n), (rows, 1))
        else:
            cand = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
        vals = np.take_along_axis(s, cand, axis=1)
        o1 = np.argsort(cand, axis=1, kind="stable")
        vals = np.take_along_axis(vals, o1, axis=1)
        cand = np.take_along_axis(cand, o1, axis=1)
        o2 = np.argsort(-vals, axis=1, kind="stable")
        return (np.take_along_axis(cand, o2, axis=1),
                np.take_along_axis(vals, o2, axis=1))
    m = min(_TOPK_SAMPLE, n)
    samp = s[:, np.linspace(0, n - 1, m).astype(np.int64)]
    thr = -np.partition(-samp, kk - 1, axis=1)[:, kk - 1]
    r, c = np.nonzero(s >= thr[:, None])
    v = s[r, c]
    # rank candidates per row by (val DESC, col ASC), keep first k
    order = np.lexsort((c, -v, r))
    r, c, v = r[order], c[order], v[order]
    first = np.r_[True, r[1:] != r[:-1]] if len(r) else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    lens = np.diff(np.r_[starts, len(r)])
    rank = np.arange(len(r)) - np.repeat(starts, lens)
    keep = rank < kk
    out_cols = np.zeros((rows, kk), np.int64)
    out_vals = np.full((rows, kk), -np.inf, np.float64)
    out_cols[r[keep], rank[keep]] = c[keep]
    out_vals[r[keep], rank[keep]] = v[keep]
    return out_cols, out_vals


class _BlockPairJoin:
    """Actor-pool stage over (i, j) block-index pairs: fetches the two
    normalized blocks from the object store (cached per actor — each
    block is read at most once per actor, not per pair), one matmul
    per pair, threshold filter on the ROUNDED score (cross-engine ulp
    stability), emits (id_a, id_b, cos) with id_a < id_b."""

    def __init__(self, block_refs, id_col: str, threshold: float, round_to: int):
        self.block_refs = block_refs
        self.id_col = id_col
        self.threshold = threshold
        self.round_to = round_to
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _block(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._cache.get(i)
        if got is None:
            import ray

            tbl = ray.get(self.block_refs[i])
            got = (_as_matrix(tbl.column("row"), np.float64),
                   tbl.column(self.id_col).to_numpy(
                       zero_copy_only=False).astype(np.int64))
            self._cache[i] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for i, j in zip(t.column("i").to_pylist(), t.column("j").to_pylist()):
            xi, ida = self._block(i)
            xj, idb = self._block(j)
            r, c, vals = _chunked_threshold_pairs(
                xi, xj, self.threshold, self.round_to,
                upper_only=(i == j))
            if len(r) == 0:
                continue
            a, b = ida[r], idb[c]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(vals)
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                         "cos": pa.array(np.concatenate(out_c), pa.float64())})


def _chunked_threshold_pairs(xi: np.ndarray, xj: np.ndarray,
                             threshold: float, round_to: int,
                             upper_only: bool = False):
    """All (row, col, rounded-cos) of ``xi @ xj.T`` with
    ``round(cos, round_to) >= threshold`` — computed in ROW CHUNKS so
    the transient similarity matrix stays ~256 MB instead of the full
    |L|·|R| doubles (the round-5 soak measured the unchunked kernel at
    ~14 GB per task, which throttled a 32-CPU actor pool to ~8
    effective tasks via memory pressure).

    Candidate-first rounding: the dense compare runs on the UNROUNDED
    matmul with slack 10^-round_to on the prune side (CLAUDE.md —
    never tighten a float prune), and only the surviving candidates
    are rounded — saving the full-matrix ``np.round`` copy (~35% of
    kernel time) while keeping membership identical:
    round(x, k) >= t  implies  x >= t - 0.5·10^-k > t - 10^-k.

    ``upper_only`` keeps strictly-upper-triangle (row < col) matches —
    index-based, so any threshold (even <= 0) stays correct without
    -inf masking."""
    step = _chunk_step(xj.shape[0])
    slack = 10.0 ** (-round_to)
    rs: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    vs: list[np.ndarray] = []
    for a in range(0, xi.shape[0], step):
        sub = xi[a:a + step] @ xj.T
        r, c = np.nonzero(sub >= threshold - slack)
        if r.size:
            vals = np.round(sub[r, c], round_to)
            keep = vals >= threshold
            if upper_only:
                keep &= (a + r) < c
            r, c, vals = r[keep], c[keep], vals[keep]
        if r.size:
            rs.append(a + r)
            cs.append(c)
            vs.append(vals)
    if not rs:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    return (np.concatenate(rs), np.concatenate(cs), np.concatenate(vs))


def cosine_similarity_join(ds, threshold: float, vec_col: str = "embedding",
                           id_col: str = "vec_id", block_rows: int | None = None,
                           max_block_rows: int = 65536, round_to: int = 6):
    """EXACT cosine-threshold self-join: all pairs (id_a < id_b) with
    ``round(cos, round_to) >= threshold``.

    Shape: one normalize pass stages (ids, unit rows) as float64 numpy
    blocks in the object store; a Dataset of (i, j) block-index pairs
    (i ≤ j, upper triangle) fans the O(B²) matmuls across an actor
    pool — each task fetches exactly its two blocks (zero-copy reads,
    cached per actor), the embedding matrix is never broadcast whole
    and never crosses a shuffle.  Work is inherently all-pairs
    (n²·d/2 flops): this is the exact verifier / small-collection
    path; ``embedding_near_dups`` (LSH) and ``ivf_topk`` are the
    sub-quadratic approximate routes at corpus scale.

    Rounding before the threshold compare keeps membership identical
    across engines (matmul vs sequential-sum dots differ in last
    ulps; cosine values are transcendental so exact round-boundary
    ties cannot occur)."""
    import ray

    _prep = _prep_unit_rows(vec_col, id_col)

    # materialize-then-count: count() on the materialized prep reads
    # block metadata; the old count-first order executed the upstream
    # pipeline twice (round-5 staging fix, same as the bipartite join)
    prep0 = ds.map_batches(_prep, batch_format="pyarrow").materialize()
    n = prep0.count()
    if block_rows is None:
        # B(B+1)/2 pair cells ≈ 4× cluster CPUs: enough waves that
        # the straggler tail is a small fraction (round-5 soak: a
        # 36-cell grid on 32 actors ran 2 quantized waves, ~30% idle),
        # while blocks stay large enough that per-task overhead is
        # noise (measured: 40 blocks of 128 rows ran 3× slower than
        # 10 of 512 at sf0.1); max_block_rows caps per-task memory
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_blocks = max(-(-n // max_block_rows),
                       int(np.ceil(np.sqrt(8.0 * cpus))), 2)
        # never cut blocks under ~4096 rows: a 5000-vector input split
        # 16 ways made 136 sub-millisecond cells behind a 32-actor
        # spawn (battery cosine join 1.5 s -> 6 s, round-5 regression)
        n_blocks = max(2, min(n_blocks, -(-n // 4096)))
    else:
        n_blocks = max(1, -(-n // block_rows))
    prep = prep0.repartition(n_blocks).materialize()
    block_refs = _staged_block_refs(prep)
    pairs = [{"i": i, "j": j} for i in range(len(block_refs))
             for j in range(i, len(block_refs))]
    if not pairs:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64())}))
    pairs_ds = ray.data.from_items(pairs)
    out = pairs_ds.map_batches(
        _BlockPairJoin,
        fn_constructor_args=(block_refs, id_col, threshold, round_to),
        # CPU-wide fixed pool, one task in flight per actor — see
        # _grid_compute for the round-5 soak measurements behind both
        # choices; per-actor state is the bounded block cache
        compute=_grid_compute(len(pairs), _grid_batch(len(pairs))),
        batch_size=_grid_batch(len(pairs)),
        batch_format="pyarrow",
        # ctor args hold block ObjectRefs; restarts could not resolve
        # them if the staged blocks were lost, so pin restarts off
        # (silences Ray's core_worker warning about exactly that)
        max_restarts=0)
    # materialize before the staged blocks go out of scope: the output
    # is bounded by the matching pairs, not the corpus
    return out.materialize()


class _BlockPairJoinBipartite:
    """Cross-corpus variant of :class:`_BlockPairJoin`: block ``i``
    comes from the LEFT ref list, ``j`` from the RIGHT — every (i, j)
    cell of the grid, no triangle masking, (id_a=left, id_b=right)."""

    def __init__(self, left_refs, right_refs, id_col: str,
                 threshold: float, round_to: int):
        self.refs = (left_refs, right_refs)
        self.id_col = id_col
        self.threshold = threshold
        self.round_to = round_to
        self._cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _block(self, side: int, i: int):
        got = self._cache.get((side, i))
        if got is None:
            import ray

            tbl = ray.get(self.refs[side][i])
            got = (_as_matrix(tbl.column("row"), np.float64),
                   tbl.column(self.id_col).to_numpy(
                       zero_copy_only=False).astype(np.int64))
            self._cache[(side, i)] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for i, j in zip(t.column("i").to_pylist(), t.column("j").to_pylist()):
            xi, ida = self._block(0, i)
            xj, idb = self._block(1, j)
            r, c, vals = _chunked_threshold_pairs(
                xi, xj, self.threshold, self.round_to)
            if len(r) == 0:
                continue
            out_a.append(ida[r])
            out_b.append(idb[c])
            out_c.append(vals)
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                         "cos": pa.array(np.concatenate(out_c), pa.float64())})


def cosine_join_bipartite(left_ds, right_ds, threshold: float,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          max_block_rows: int = 65536, round_to: int = 6):
    """EXACT cross-corpus cosine-threshold join: all (left_id,
    right_id) with ``round(cos, round_to) >= threshold`` — the
    semantic (embedding-space) counterpart of the bipartite bigram
    join: train/eval decontamination, new-batch-vs-corpus near-dedup.

    Same staging as :func:`cosine_similarity_join` (normalized float64
    blocks in the object store, per-actor block cache, matrices never
    broadcast whole or shuffled) over the full L×R block grid — work
    is |L|·|R|·d flops; the LSH/IVF routes stay the sub-quadratic
    approximations at corpus scale."""
    import ray

    _prep = _prep_unit_rows(vec_col, id_col)

    cpus = int(ray.cluster_resources().get("CPU", 8))

    def _stage(ds):
        # materialize the prepped rows FIRST so count() reads block
        # metadata instead of executing the upstream pipeline a second
        # time (round 5: the count-then-materialize order ran every
        # input pipeline twice, a fixed staging cost that capped the
        # 1M-doc soak's 8->32 efficiency)
        prep0 = ds.map_batches(_prep, batch_format="pyarrow").materialize()
        n = prep0.count()
        n_blocks = max(-(-n // max_block_rows),
                       int(np.ceil(np.sqrt(8.0 * cpus))), 1)
        n_blocks = max(1, min(n_blocks, -(-n // 4096)))
        prep = prep0.repartition(n_blocks).materialize()
        return _staged_block_refs(prep)

    # the two sides' staging pipelines are independent — overlap them
    # (wall = slower side, not the sum; CLAUDE.md thread pattern)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as _ex:
        _fl, _fr = _ex.submit(_stage, left_ds), _ex.submit(_stage, right_ds)
        left_refs, right_refs = _fl.result(), _fr.result()
    grid = [{"i": i, "j": j} for i in range(len(left_refs))
            for j in range(len(right_refs))]
    if not grid:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64())}))
    out = ray.data.from_items(grid).map_batches(
        _BlockPairJoinBipartite,
        fn_constructor_args=(left_refs, right_refs, id_col, threshold,
                             round_to),
        compute=_grid_compute(len(grid), _grid_batch(len(grid))),
        batch_size=_grid_batch(len(grid)),
        batch_format="pyarrow", max_restarts=0)
    return out.materialize()


def quantize_embeddings(ds, vec_col: str = "embedding",
                        batch_size: int | None = 4096,
                        dtype=np.float32):
    """Symmetric per-vector int8 quantization: 4× smaller than float32
    (16× vs float64) with bounded error — the storage/shuffle format for
    embedding columns at scale.  Emits ``<vec_col>_q8`` (list<int8>) and
    ``<vec_col>_scale`` (max-abs / 127 per vector; stored at ``dtype``
    — f32 for the compact storage path, f64 when the arithmetic must be
    reproducible against a double-precision SQL oracle)."""
    scale_pa = pa.float64() if dtype == np.float64 else pa.float32()

    def _quant(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col), dtype)
        scale = np.abs(m).max(axis=1) / 127.0
        scale_safe = np.where(scale > 0, scale, 1.0)
        q = np.clip(np.round(m / scale_safe[:, None]), -127, 127).astype(np.int8)
        dim = m.shape[1]
        out = t.append_column(
            f"{vec_col}_q8", pa.array(list(q), pa.list_(pa.int8(), dim))
        )
        return out.append_column(f"{vec_col}_scale",
                                 pa.array(scale.astype(dtype), scale_pa))

    return ds.map_batches(_quant, batch_format="pyarrow", batch_size=batch_size)


def dequantize_matrix(table: pa.Table, vec_col: str = "embedding",
                      dtype=np.float32) -> np.ndarray:
    """int8 + scale → float matrix (exact inverse transform)."""
    q = _as_matrix(table.column(f"{vec_col}_q8"), dtype)
    scale = table.column(f"{vec_col}_scale").to_numpy(
        zero_copy_only=False).astype(dtype)
    return q * scale[:, None]


class _CentroidPartial:
    """Batch → (label, cnt, sum_vector) partials: the distributed
    GROUP BY over a vector column.  Rows whose vector is missing, has
    the wrong dimension, or contains element nulls are skipped (the
    count of skipped rows rides along under label-null so no silent
    drop); float64 accumulation regardless of storage dtype."""

    def __init__(self, vec_col: str, label_col: str, dim: int):
        self.vec_col = vec_col
        self.label_col = label_col
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vec = t.column(self.vec_col).combine_chunks()
        lab = t.column(self.label_col).combine_chunks()
        ok = pc.and_(pc.equal(pc.list_value_length(vec).fill_null(-1),
                              self.dim),
                     pc.is_valid(lab))
        n_skipped = t.num_rows - int(pc.sum(ok.cast(pa.int64())).as_py() or 0)
        vec = vec.filter(ok)
        lab = lab.filter(ok)
        flat = vec.flatten()
        if flat.null_count:  # element nulls: drop those rows too
            offs = vec.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            null_pos = np.flatnonzero(
                ~np.asarray(pc.is_valid(flat), dtype=bool))
            bad_rows = np.unique(
                np.searchsorted(offs, null_pos + offs[0], side="right") - 1)
            keep_mask = np.ones(len(vec), bool)
            keep_mask[bad_rows] = False
            keep = pa.array(keep_mask)
            vec = vec.filter(keep)
            lab = lab.filter(keep)
            n_skipped += int(len(bad_rows))
        n = len(vec)
        labels = lab.to_numpy(zero_copy_only=False)
        sums_rows: list[np.ndarray] = []
        out_labels: list = []
        counts: list[int] = []
        if n:
            mat = vec.flatten().to_numpy(zero_copy_only=False) \
                     .reshape(n, self.dim).astype(np.float64)
            uniq, inv = np.unique(labels, return_inverse=True)
            sums = np.zeros((len(uniq), self.dim), np.float64)
            np.add.at(sums, inv, mat)
            cnts = np.bincount(inv, minlength=len(uniq))
            out_labels = list(uniq)
            counts = [int(c) for c in cnts]
            sums_rows = list(sums)
        if n_skipped:
            out_labels.append(None)
            counts.append(n_skipped)
            sums_rows.append(np.zeros(self.dim, np.float64))
        return pa.table({
            "label": pa.array(out_labels, pa.int64()),
            "cnt": pa.array(counts, pa.int64()),
            "vec_sum": pa.array([list(s) for s in sums_rows],
                                pa.list_(pa.float64(), self.dim)),
        })


def grouped_centroids(ds, vec_col: str = "embedding",
                      label_col: str = "label", dim: int = 64,
                      batch_size: int | None = 65536) -> pa.Table:
    """Per-label mean vector (embedding centroid per class/domain — the
    seed for IVF cells, per-source drift monitors, class prototypes).

    Shape: per-batch vectorized partials (labels × dim sums via
    ``np.add.at``) → driver merge bounded by blocks × labels — no
    shuffle, the vector column never leaves its block.  Returns a
    pyarrow Table (label, cnt, centroid list<double>[dim]) sorted by
    label, plus a label-null row counting skipped (malformed) vectors.
    """
    partials = ds.map_batches(
        _CentroidPartial(vec_col, label_col, dim),
        batch_format="pyarrow", batch_size=batch_size)
    acc: dict = {}
    skipped = 0
    for row in partials.iter_rows():
        if row["label"] is None:
            skipped += row["cnt"]
            continue
        cur = acc.get(row["label"])
        s = np.asarray(row["vec_sum"], np.float64)
        if cur is None:
            acc[row["label"]] = [int(row["cnt"]), s]
        else:
            cur[0] += int(row["cnt"])
            cur[1] = cur[1] + s
    labels = sorted(acc)
    return pa.table({
        "label": pa.array(labels, pa.int64()),
        "cnt": pa.array([acc[l][0] for l in labels], pa.int64()),
        "centroid": pa.array([list(acc[l][1] / acc[l][0]) for l in labels],
                             pa.list_(pa.float64(), dim)),
        "skipped": pa.array([skipped] * len(labels), pa.int64()),
    })


class _BlockPairTopK:
    """Actor-pool stage over (i, j) block pairs for the kNN graph: one
    matmul per pair, then each side's rows keep their k best partners
    from the other block by (rounded cos DESC, neighbor id ASC) — the
    same total order the final exact merge uses, so a block-local
    top-k can never drop a global top-k member.  Blocks cache per
    actor exactly like :class:`_BlockPairJoin`."""

    def __init__(self, block_refs, id_col: str, k: int, round_to: int):
        self.block_refs = block_refs
        self.id_col = id_col
        self.k = k
        self.round_to = round_to
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _block(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._cache.get(i)
        if got is None:
            import ray

            tbl = ray.get(self.block_refs[i])
            m = _as_matrix(tbl.column("row"), np.float64)
            ids = tbl.column(self.id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # column order = neighbor id ASCENDING once per block, so a
            # stable descending-cos argsort breaks ties by id for free
            order = np.argsort(ids, kind="stable")
            got = (m[order], ids[order])
            self._cache[i] = got
        return got

    def _side(self, qid: np.ndarray, s: np.ndarray,
              nid: np.ndarray, outs: list) -> None:
        k = min(self.k, s.shape[1])
        if k == 0 or s.shape[0] == 0:
            return
        top, sims2 = _row_topk(s, k)
        rows = np.repeat(qid, k)
        cols = nid[top.reshape(-1)]
        sims = sims2.reshape(-1)
        keep = np.isfinite(sims)
        outs.append((rows[keep], cols[keep], sims[keep]))

    def __call__(self, t: pa.Table) -> pa.Table:
        outs: list = []
        for i, j in zip(t.column("i").to_pylist(), t.column("j").to_pylist()):
            xi, ida = self._block(i)
            xj, idb = self._block(j)
            # row-chunked matmul (same transient bound as
            # _chunked_threshold_pairs — the unchunked 65536² block
            # pair held a ~34 GB similarity matrix plus its s.T copy):
            # the LEFT side's top-k is exact per chunk; the RIGHT
            # side takes one exact top-k on chunk 1, then later chunks
            # only CONTRIBUTE candidates strictly beating chunk 1's
            # per-column kth (exact: a tie with the incumbent kth
            # loses on id ASC anyway, since incumbent ids are from
            # earlier — smaller — rows), merged once at the end
            step = _chunk_step(xj.shape[0])
            thr = None
            cand_c: list = []
            cand_v: list = []
            cand_i: list = []
            kr = min(self.k, xi.shape[0])
            for a in range(0, xi.shape[0], step):
                s = np.round(xi[a:a + step] @ xj.T, self.round_to)
                rows = np.arange(a, a + s.shape[0])
                if i == j:
                    s[rows - a, rows] = -np.inf  # not your own neighbor
                self._side(ida[a:a + step], s, idb, outs)
                if i != j and s.shape[0] and kr:
                    if thr is None:
                        st = np.ascontiguousarray(s.T)
                        kc = min(self.k, st.shape[1])
                        top, vals = _row_topk(st, kc)
                        ids = ida[a:a + step][top]
                        nrt = st.shape[0]
                        cand_c.append(np.repeat(np.arange(nrt), kc))
                        cand_v.append(vals.reshape(-1))
                        cand_i.append(ids.reshape(-1))
                        # kth best per column; shorter columns -> -inf
                        thr = (vals[:, kr - 1] if vals.shape[1] >= kr
                               else np.full(nrt, -np.inf))
                    else:
                        rr, cc = np.nonzero(s > thr[None, :])
                        if rr.size:
                            cand_c.append(cc)
                            cand_v.append(s[rr, cc])
                            cand_i.append(ida[a:a + step][rr])
            if i != j and cand_c:
                cc = np.concatenate(cand_c)
                vv = np.concatenate(cand_v)
                ii = np.concatenate(cand_i)
                order = np.lexsort((ii, -vv, cc))
                cc, vv, ii = cc[order], vv[order], ii[order]
                first = np.r_[True, cc[1:] != cc[:-1]] if len(cc) else \
                    np.zeros(0, bool)
                starts = np.flatnonzero(first)
                lens = np.diff(np.r_[starts, len(cc)])
                rank = np.arange(len(cc)) - np.repeat(starts, lens)
                keep = (rank < kr) & np.isfinite(vv)
                outs.append((idb[cc[keep]], ii[keep], vv[keep]))
        if not outs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate([o[0] for o in outs]), pa.int64()),
            "neighbor_id": pa.array(np.concatenate([o[1] for o in outs]), pa.int64()),
            "cos": pa.array(np.concatenate([o[2] for o in outs]), pa.float64()),
        })


def knn_graph(ds, k: int, vec_col: str = "embedding",
              id_col: str = "vec_id", block_rows: int | None = None,
              max_block_rows: int = 65536, round_to: int = 6):
    """EXACT k-nearest-neighbor graph over an embedding column: for
    every vector, its ``k`` most cosine-similar OTHER vectors, ranked
    by (rounded cos DESC, neighbor id ASC) — the edge list near-dup
    clustering, retrieval eval and graph-based curation start from.

    Same physical shape as :func:`cosine_similarity_join` (staged
    normalized blocks, O(B²) pair tasks over an actor pool, blocks
    cached per actor); each pair task emits ≤ 2·rows·k candidate
    edges and the exact global merge is ``top_k_per_group`` (≤ k rows
    per query per block crossing that exchange).  Inherently all-pairs
    compute — the IVF/LSH routes stay the sub-quadratic approximations
    at corpus scale."""
    import ray

    from peri_ray.stages.stats import top_k_per_group

    _prep = _prep_unit_rows(vec_col, id_col)

    prep0 = ds.map_batches(_prep, batch_format="pyarrow").materialize()
    n = prep0.count()
    if block_rows is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_blocks = max(-(-n // max_block_rows),
                       int(np.ceil(np.sqrt(8.0 * cpus))), 2)
        # never cut blocks under ~4096 rows: a 5000-vector input split
        # 16 ways made 136 sub-millisecond cells behind a 32-actor
        # spawn (battery cosine join 1.5 s -> 6 s, round-5 regression)
        n_blocks = max(2, min(n_blocks, -(-n // 4096)))
    else:
        n_blocks = max(1, -(-n // block_rows))
    prep = prep0.repartition(n_blocks).materialize()
    block_refs = _staged_block_refs(prep)
    pairs = [{"i": i, "j": j} for i in range(len(block_refs))
             for j in range(i, len(block_refs))]
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
    if not pairs:
        return ray.data.from_arrow(empty)
    cands = ray.data.from_items(pairs).map_batches(
        _BlockPairTopK,
        fn_constructor_args=(block_refs, id_col, k, round_to),
        compute=_grid_compute(len(pairs), _grid_batch(len(pairs))),
        batch_size=_grid_batch(len(pairs)),
        batch_format="pyarrow", max_restarts=0).materialize()
    return top_k_per_group(cands, key="query_id", order_col="cos", k=k,
                           descending=True, tiebreak="neighbor_id")


def standardize_embeddings(ds, vec_col: str = "embedding",
                           id_col: str = "vec_id", round_to: int = 6,
                           batch_size: int | None = 4096):
    """Per-DIMENSION z-score standardization of an embedding column
    (feature whitening before k-means / linear probes): two passes —
    per-batch (n, Σx, Σx²) partials per dimension reduce on the driver
    (d-bounded), then one broadcast vectorized map emits
    ``round((x − mean) / std, round_to)`` per element as
    (id, idx, z) rows (idx 1-based; a constant dimension with std 0
    yields null z).  Population std (÷ n), matching SQL's
    ``stddev_pop``; rounding keeps the hash-compare inside the
    cross-engine ulp noise of the two sum orders."""

    def _part(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col), np.float64)
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "s2": pa.array([(m * m).sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
        })

    n_tot = 0
    s = s2 = None
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        n_tot += r["n"]
        rs = np.asarray(r["s"], np.float64)
        rs2 = np.asarray(r["s2"], np.float64)
        s = rs if s is None else s + rs
        s2 = rs2 if s2 is None else s2 + rs2
    if n_tot == 0:
        import ray.data as rd_

        return rd_.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "idx": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64())}))
    mean = s / n_tot
    var = s2 / n_tot - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))

    def _z(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col), np.float64)
        ids = t.column(id_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n, d = m.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.round((m - mean[None, :]) / std[None, :], round_to)
        flat = z.reshape(-1)
        bad = np.tile(std == 0.0, n)
        arr = pa.array(flat)
        arr = pc.if_else(pa.array(~bad), arr,
                         pa.nulls(len(flat), pa.float64()))
        return pa.table({
            id_col: pa.array(np.repeat(ids, d)),
            "idx": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "z": arr,
        })

    return ds.map_batches(_z, batch_format="pyarrow", batch_size=batch_size)


def _cov_partials(ds, vec_col: str, dim: int, quantize_scale: int | None,
                  batch_size: int | None):
    """Shared partial pass for covariance/PCA: per-batch (n, Σx, XᵀX)
    reduced on the driver — dim²-bounded state, one streaming pass,
    vectors never shuffle.  With ``quantize_scale`` the values
    quantize to integer units first (SQL-ROUND half-away) and the
    float64 BLAS matmul is still EXACT: every product ≤ ~1e6·scale²
    and the running sums stay far below 2^53, so casting the result to
    int64 reproduces pure integer arithmetic at BLAS speed.  Rows
    whose vector is null or not ``dim``-long are skipped."""
    quant = quantize_scale is not None

    def _part(t: pa.Table) -> pa.Table:
        col = t.column(vec_col).combine_chunks()
        lens = pc.list_value_length(col)
        ok = pc.fill_null(pc.equal(lens, dim), False)
        m = _as_matrix(col.filter(ok), np.float64)
        if quant and m.size:
            m = np.floor(np.abs(m) * quantize_scale + 0.5) * np.sign(m)
        if m.size == 0:
            m = np.zeros((0, dim), np.float64)
        s_row = m.sum(axis=0)
        xtx_row = (m.T @ m).reshape(-1)
        if quant:
            # per-batch products are exact in float64 (bounded by
            # batch_size × (max|v|·scale)² « 2^53); casting to int64
            # here lets the driver accumulate PYTHON ints — exact and
            # ORDER-FREE at any corpus size / take_all arrival order
            s_row = s_row.astype(np.int64)
            xtx_row = xtx_row.astype(np.int64)
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([s_row.tolist()],
                          pa.list_(pa.int64() if quant else pa.float64())),
            "xtx": pa.array([xtx_row.tolist()],
                            pa.list_(pa.int64() if quant else pa.float64())),
        })

    acc_t = object if quant else np.float64
    n_tot = 0
    s = np.zeros(dim, dtype=acc_t)
    xtx = np.zeros(dim * dim, dtype=acc_t)
    if quant:
        s[:] = 0
        xtx[:] = 0
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        n_tot += r["n"]
        s += np.asarray(r["s"], dtype=acc_t)
        xtx += np.asarray(r["xtx"], dtype=acc_t)
    return n_tot, s, xtx.reshape(dim, dim)


def embedding_covariance(ds, vec_col: str = "embedding", dim: int = 64,
                         scale: int = 1000,
                         batch_size: int | None = 4096) -> pa.Table:
    """EXACT population covariance matrix of an embedding column —
    milli-quantized integer sums (associativity-free, so the result is
    block-layout independent and a SQL twin over HUGEINT sums lands on
    identical doubles).  Emits the upper triangle as (i, j, n, cov)
    rows, 0-based, cov in original units; one streaming pass with
    dim²-bounded driver state."""
    n, s, xtx = _cov_partials(ds, vec_col, dim, scale, batch_size)
    if n == 0:
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "cov": pa.array([], pa.float64())})
    si = [int(round(v)) for v in s]            # exact integer sums
    iu, ju = np.triu_indices(dim)
    i_l, j_l, cov_l = [], [], []
    fs2 = float(scale) * float(scale)
    for i, j in zip(iu.tolist(), ju.tolist()):
        sxy = int(round(xtx[i, j]))
        # each float() is one correctly-rounded conversion; the op
        # order mirrors the SQL twin exactly
        cov = (float(sxy) - float(si[i]) * float(si[j]) / float(n)) \
            / float(n) / fs2
        i_l.append(i)
        j_l.append(j)
        cov_l.append(cov)
    return pa.table({"i": pa.array(i_l, pa.int64()),
                     "j": pa.array(j_l, pa.int64()),
                     "n": pa.array([n] * len(i_l), pa.int64()),
                     "cov": pa.array(cov_l, pa.float64())})


def pca_project(ds, k: int = 8, vec_col: str = "embedding",
                id_col: str = "vec_id", dim: int = 64,
                batch_size: int | None = 4096):
    """Distributed PCA: covariance via one streaming partial pass
    (dim²-bounded driver state), eigendecomposition on the driver
    (dim×dim — trivial), then ONE broadcast vectorized projection
    pass.  Components order by descending eigenvalue with a
    deterministic sign fix (largest-|loading| component positive,
    ties → lowest index), so results are reproducible across block
    layouts.  Returns the (id, pc list<float64>) projection Dataset;
    the components/explained-variance ratios themselves come from
    :func:`pca_components` (rows-only query: eigenvectors have no SQL
    twin)."""
    comps, _ = pca_components(ds, k, vec_col, dim, batch_size)
    import ray

    ref = ray.put(comps)  # broadcast once, read per task

    def _proj(t: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(ref)
        col = t.column(vec_col).combine_chunks()
        lens = pc.list_value_length(col)
        ok = pc.fill_null(pc.equal(lens, dim), False)
        sub = t.filter(ok)
        m = _as_matrix(sub.column(vec_col), np.float64)
        if m.size == 0:
            m = np.zeros((0, dim), np.float64)
        p = m @ c.T
        return pa.table({
            id_col: sub.column(id_col),
            "pc": pa.array([row.tolist() for row in p],
                           pa.list_(pa.float64())),
        })

    return ds.map_batches(_proj, batch_format="pyarrow",
                          batch_size=batch_size)


def pca_components(ds, k: int, vec_col: str = "embedding", dim: int = 64,
                   batch_size: int | None = 4096,
                   quantize_scale: int = 10_000):
    """Top-k principal components (k×dim) + explained-variance ratios
    from the streaming covariance pass.  Driver work is O(dim³).

    The partials quantize to 1/quantize_scale units and accumulate as
    exact integers, so the covariance — and hence the components — is
    IDENTICAL at any block layout or take_all() arrival order (float
    partial sums are association-order dependent, and near-degenerate
    eigenvalues would amplify last-ulp drift into visible rotations)."""
    n, s, xtx = _cov_partials(ds, vec_col, dim, quantize_scale, batch_size)
    if n < 2:
        raise ValueError("pca_components: need at least 2 valid vectors")
    # python-int / int division and the int→float conversions are
    # correctly rounded — deterministic given exact integer sums
    fs = float(quantize_scale)
    mean = np.array([float(v) for v in s], np.float64) / n / fs
    xtx_f = np.array([[float(v) for v in row] for row in xtx],
                     np.float64) / n / (fs * fs)
    cov = xtx_f - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # (k, dim)
    # deterministic sign: the largest-|loading| entry is positive
    # (ties broken by lowest index via argmax's first-hit rule)
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    total = float(np.maximum(vals, 0.0).sum()) or 1.0
    ratios = [float(max(vals[o], 0.0)) / total for o in order]
    return comps, ratios


# ---------------------------------------------------------------------------
# PageRank over an edge Dataset (graph centrality for data selection —
# e.g. rank documents by their centrality in the kNN similarity graph)
# ---------------------------------------------------------------------------


def pagerank(edges, damping: float = 0.85, iters: int = 5,
             src_col: str = "src", dst_col: str = "dst",
             n_buckets: int = 64, driver_threshold: int = 2_000_000,
             dangling: str = "raise", seeds=None):
    """Synchronous PageRank for a fixed iteration count over a
    directed (src, dst) edge Dataset:

        pr_{t+1}(v) = (1-d)/N + d * (sum_{u->v} pr_t(u) / outdeg(u)
                                     [+ dangling_mass_t / N])

    N = number of distinct nodes appearing in any edge; pr_0 = 1/N.
    ``dangling="raise"`` (default) assumes every node has >=1
    out-edge — true for the kNN graph (exactly k per node) — and
    raises otherwise.  ``dangling="redistribute"`` is the web-graph
    convention (hosts with no out-links are common): each dangling
    node's mass spreads uniformly over all nodes.  The per-iteration
    dangling mass needs NO join against the dangling set: with
    redistribution the total PR mass stays exactly 1, so
    dangling_mass = 1 - sum(messages) — one scalar from per-block
    partial sums.

    ``seeds`` switches to PERSONALIZED PageRank (the curation
    primitive: rank everything by proximity to a trusted seed set):
    the teleport vector concentrates uniformly on the seed nodes —
    pr_0 = 1/|S| on seeds, and the (1-d) restart plus any dangling
    mass return to the seeds instead of spreading over all N.  Seeds
    are side-input scale (shipped in task closures; a corpus-scale
    seed set would need a join-based teleport instead) and must all
    appear in the graph — a typo'd seed raises rather than silently
    ranking from a phantom node.

    Hybrid like connected_components: an edge list under
    ``driver_threshold`` rows resolves with one driver numpy loop
    (each distributed iteration costs two bucketed exchanges — a
    terrible trade for small graphs).  Above it, per iteration the
    exchange path ships only (node, pr) and (dst, msg) rows — bounded
    by edge count, never corpus payloads.  Iterative float sums make
    the result reproducible per path but not bit-identical across
    paths (addition order differs); callers compare with tolerance.

    Returns a Dataset of (node, pr)."""
    import ray.data as rd

    from peri_ray.stages.dedup import (grouped_sum_via_buckets,
                                       map_groups_via_buckets)

    if dangling not in ("raise", "redistribute"):
        raise ValueError("dangling must be 'raise' or 'redistribute'")
    seed_list = None
    if seeds is not None:
        seed_list = sorted({int(x) for x in seeds})
        if not seed_list:
            raise ValueError("pagerank: seeds must be non-empty")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "pr": pa.array([], pa.float64())}))

    if n_edges <= driver_threshold:
        rows = edges.take_all()
        src = np.array([r[src_col] for r in rows], np.int64)
        dst = np.array([r[dst_col] for r in rows], np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        src_l = np.searchsorted(nodes, src)
        dst_l = np.searchsorted(nodes, dst)
        outdeg = np.bincount(src_l, minlength=n)
        dang = outdeg == 0
        if dang.any() and dangling == "raise":
            raise ValueError(
                "pagerank: %d node(s) have no out-edges (dangling); "
                "pass dangling='redistribute' or fix the edge list"
                % int(dang.sum()))
        w = 1.0 / outdeg[src_l].astype(np.float64)
        if seed_list is None:
            pr = np.full(n, 1.0 / float(n), np.float64)
            base = (1.0 - damping) / float(n)
            for _ in range(iters):
                s = np.zeros(n, np.float64)
                np.add.at(s, dst_l, pr[src_l] * w)
                if dang.any():
                    s += pr[dang].sum() / float(n)
                pr = base + damping * s
        else:
            sarr = np.asarray(seed_list, np.int64)
            pos = np.searchsorted(nodes, sarr)
            if ((pos >= n).any()
                    or (nodes[np.minimum(pos, n - 1)] != sarr).any()):
                raise ValueError(
                    "pagerank: seed node(s) not present in the edge list")
            tele = np.zeros(n, np.float64)
            tele[pos] = 1.0 / float(len(sarr))
            pr = tele.copy()
            for _ in range(iters):
                s = np.zeros(n, np.float64)
                np.add.at(s, dst_l, pr[src_l] * w)
                if dang.any():
                    s = s + pr[dang].sum() * tele
                pr = (1.0 - damping) * tele + damping * s
        return rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64()),
                                       "pr": pa.array(pr, pa.float64())}))

    # ---- distributed path: bucketed message passing ----
    def _canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column(src_col).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst_col).combine_chunks().cast(pa.int64())})

    e = edges.map_batches(_canon, batch_format="pyarrow").materialize()

    # node table: distinct src ∪ dst (one bucketed distinct)
    def _both(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("src").combine_chunks(),
             t.column("dst").combine_chunks()])})

    def _distinct(g: pa.Table) -> pa.Table:
        return g.select(["node"]).group_by("node").aggregate([])

    nodes_ds = map_groups_via_buckets(
        e.map_batches(_both, batch_format="pyarrow"), ["node"], _distinct,
        n_buckets).materialize()
    n = nodes_ds.count()
    base = (1.0 - damping) / float(n)

    seed_arr = None
    if seed_list is not None:
        seed_arr = pa.array(seed_list, pa.int64())
        found = 0
        for r in nodes_ds.map_batches(
                lambda t, sa=seed_arr: pa.table({"c": pa.array(
                    [int(pc.sum(pc.is_in(
                        t.column("node").combine_chunks(),
                        value_set=sa).cast(pa.int64())).as_py() or 0)],
                    pa.int64())}),
                batch_format="pyarrow").iter_rows():
            found += r["c"]
        if found != len(seed_list):
            raise ValueError(
                "pagerank: seed node(s) not present in the edge list")

    # out-degree per src, then weighted edges (src, dst, w) — one
    # union-tagged exchange; dangling check falls out of the join:
    # every src has a degree row by construction
    deg_partial = e.map_batches(
        lambda t: pa.table({"src": t.column("src"),
                            "c": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    deg = grouped_sum_via_buckets(deg_partial, ["src"], "c",
                                  n_buckets).materialize()
    has_dangling = deg.count() != n
    if has_dangling and dangling == "raise":
        raise ValueError(
            "pagerank: %d node(s) have no out-edges (dangling); "
            "pass dangling='redistribute' or fix the edge list"
            % (n - deg.count()))

    def _tag_deg(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"),
                         "dst": pa.nulls(t.num_rows, pa.int64()),
                         "c": t.column("c")})

    def _tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                         "c": pa.nulls(t.num_rows, pa.int64())})

    def _attach_w(g: pa.Table) -> pa.Table:
        dd = g.filter(pc.is_valid(g.column("c"))).select(["src", "c"])
        ee = g.filter(pc.is_null(g.column("c"))).select(["src", "dst"])
        j = ee.join(dd, keys="src", join_type="inner")
        w = pc.divide(pa.scalar(1.0),
                      j.column("c").cast(pa.float64()))
        return pa.table({"src": j.column("src"), "dst": j.column("dst"),
                         "w": w})

    wedges = map_groups_via_buckets(
        deg.map_batches(_tag_deg, batch_format="pyarrow")
        .union(e.map_batches(_tag_edge, batch_format="pyarrow")),
        ["src"], _attach_w, n_buckets).materialize()

    # pr_0 = 1/N (uniform) or 1/|S| on the seeds (personalized)
    if seed_arr is None:
        pr0 = float(1.0 / float(n))
        pr_ds = nodes_ds.map_batches(
            lambda t, v=pr0: pa.table({
                "node": t.column("node"),
                "pr": pa.array(np.full(t.num_rows, v, np.float64))}),
            batch_format="pyarrow").materialize()
    else:
        pr0s = 1.0 / float(len(seed_list))
        pr_ds = nodes_ds.map_batches(
            lambda t, v=pr0s, sa=seed_arr: pa.table({
                "node": t.column("node"),
                "pr": pc.if_else(
                    pc.is_in(t.column("node").combine_chunks(),
                             value_set=sa),
                    pa.scalar(v, pa.float64()),
                    pa.scalar(0.0, pa.float64()))}),
            batch_format="pyarrow").materialize()

    for _ in range(iters):
        # join pr onto weighted edges by src (union-tagged exchange)
        def _tag_pr(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column("node"),
                             "dst": pa.nulls(t.num_rows, pa.int64()),
                             "w": t.column("pr")})

        def _msgs(g: pa.Table) -> pa.Table:
            prt = g.filter(pc.is_null(g.column("dst"))).select(["src", "w"])
            prt = prt.rename_columns(["src", "pr"])
            ee = g.filter(pc.is_valid(g.column("dst")))
            j = ee.join(prt, keys="src", join_type="inner")
            m = pc.multiply(j.column("pr"), j.column("w"))
            return pa.table({"dst": j.column("dst"), "m": m})

        msgs = map_groups_via_buckets(
            pr_ds.map_batches(_tag_pr, batch_format="pyarrow")
            .union(wedges), ["src"], _msgs, n_buckets)

        # dangling mass without touching the dangling set: total PR
        # mass is exactly 1 under redistribution, so the mass that did
        # NOT flow through an edge this round is 1 - sum(messages) —
        # one scalar from per-block partial sums over the (pinned)
        # message table, no extra exchange
        dm = 0.0
        if has_dangling:
            msgs = msgs.materialize()
            msum = 0.0
            for r in msgs.map_batches(
                    lambda t: pa.table({"s": pa.array(
                        [float(pc.sum(t.column("m")).as_py() or 0.0)],
                        pa.float64())}),
                    batch_format="pyarrow").iter_rows():
                msum += r["s"]
            dm = 1.0 - msum
        extra = base + damping * dm / float(n) if has_dangling else base

        # sum messages per dst + zero base row per node, then update
        def _zero(t: pa.Table) -> pa.Table:
            return pa.table({"dst": t.column("node"),
                             "m": pa.array(np.zeros(t.num_rows,
                                                    np.float64))})

        summed = grouped_sum_via_buckets(
            msgs.union(nodes_ds.map_batches(_zero, batch_format="pyarrow")),
            ["dst"], "m", n_buckets)
        if seed_arr is None:
            pr_ds = summed.map_batches(
                lambda t, b=extra, d=damping: pa.table({
                    "node": t.column("dst"),
                    "pr": pc.add(pa.scalar(b),
                                 pc.multiply(pa.scalar(d),
                                             t.column("m")))}),
                batch_format="pyarrow").materialize()
        else:
            # restart + dangling mass return to the seeds only
            se = (((1.0 - damping) + damping * dm)
                  * (1.0 / float(len(seed_list))))
            pr_ds = summed.map_batches(
                lambda t, s_=se, d=damping, sa=seed_arr: pa.table({
                    "node": t.column("dst"),
                    "pr": pc.add(
                        pc.if_else(
                            pc.is_in(t.column("dst").combine_chunks(),
                                     value_set=sa),
                            pa.scalar(s_, pa.float64()),
                            pa.scalar(0.0, pa.float64())),
                        pc.multiply(pa.scalar(d), t.column("m")))}),
                batch_format="pyarrow").materialize()

    return pr_ds


# ---------------------------------------------------------------------------
# kNN label propagation (semi-supervised label spreading: extend a
# sparse labeled seed set over the similarity graph — the cheap
# classifier used to scale curation labels)
# ---------------------------------------------------------------------------


def label_propagation(edges, seeds, iters: int = 2,
                      src_col: str = "src", dst_col: str = "dst",
                      node_col: str = "node", label_col: str = "label",
                      n_buckets: int = 64,
                      driver_threshold: int = 2_000_000):
    """Iterative majority-vote label spreading over a directed edge
    Dataset: per iteration, every UNLABELED node whose out-neighbors
    include >=1 labeled node takes the majority label among them
    (ties -> smallest label); seed labels never change; nodes with no
    labeled out-neighbor stay unlabeled until one appears.  All-int
    and deterministic, so a fixed ``iters`` unrolls into an exact SQL
    twin (votes = join + group-by + row_number).

    Hybrid like pagerank/connected_components: driver dict loop under
    ``driver_threshold`` edges, bucketed vote exchanges above.
    Returns (node, label) for every node labeled after ``iters``
    rounds (seeds included)."""
    import ray.data as rd

    from peri_ray.stages.dedup import map_groups_via_buckets

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        er = edges.take_all()
        src = np.array([r[src_col] for r in er], np.int64)
        dst = np.array([r[dst_col] for r in er], np.int64)
        lab = {r[node_col]: int(r[label_col]) for r in seeds.take_all()}
        if n_edges == 0:
            nodes = sorted(lab)
            return rd.from_arrow(pa.table({
                node_col: pa.array(nodes, pa.int64()),
                label_col: pa.array([lab[x] for x in nodes], pa.int64())}))
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], src[1:] != src[:-1], [True])))
        for _ in range(iters):
            new = {}
            for i in range(len(bounds) - 1):
                u = int(src[bounds[i]])
                if u in lab:
                    continue
                votes = {}
                for v in dst[bounds[i]:bounds[i + 1]]:
                    lv = lab.get(int(v))
                    if lv is not None:
                        votes[lv] = votes.get(lv, 0) + 1
                if votes:
                    best = sorted(votes.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[0][0]
                    new[u] = best
            lab.update(new)  # synchronous update
        nodes = sorted(lab)
        return rd.from_arrow(pa.table({
            node_col: pa.array(nodes, pa.int64()),
            label_col: pa.array([lab[x] for x in nodes], pa.int64())}))

    # ---- distributed path: two bucketed exchanges per iteration ----
    def _canon_e(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column(src_col).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst_col).combine_chunks().cast(pa.int64())})

    e = edges.map_batches(_canon_e, batch_format="pyarrow").materialize()

    def _canon_s(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column(node_col).combine_chunks().cast(pa.int64()),
            "lab": t.column(label_col).combine_chunks().cast(pa.int64())})

    labels = seeds.map_batches(_canon_s, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # exchange 1 (key dst): attach labels to edge dst
        def _tag_lab(t: pa.Table) -> pa.Table:
            return pa.table({"dst": t.column("node"),
                             "src": pa.nulls(t.num_rows, pa.int64()),
                             "lab": t.column("lab")})

        def _tag_edge(t: pa.Table) -> pa.Table:
            return pa.table({"dst": t.column("dst"),
                             "src": t.column("src"),
                             "lab": pa.nulls(t.num_rows, pa.int64())})

        def _attach(g: pa.Table) -> pa.Table:
            lt = (g.filter(pc.is_null(g.column("src")))
                  .select(["dst", "lab"])
                  .group_by("dst").aggregate([("lab", "min")])
                  .rename_columns(["dst", "lab"]))
            ee = g.filter(pc.is_valid(g.column("src"))).select(["src", "dst"])
            j = ee.join(lt, keys="dst", join_type="inner")
            return j.select(["src", "lab"])

        msgs = map_groups_via_buckets(
            labels.map_batches(_tag_lab, batch_format="pyarrow")
            .union(e.map_batches(_tag_edge, batch_format="pyarrow")),
            ["dst"], _attach, n_buckets)

        # exchange 2 (key src): majority vote per src, skip already-
        # labeled nodes (their row ships as a marker so the vote can
        # be suppressed without a second labels lineage)
        def _tag_known(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column("node"),
                             "lab": t.column("lab"),
                             "known": pa.array(np.ones(t.num_rows, np.int8))})

        def _tag_msg(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column("src"),
                             "lab": t.column("lab"),
                             "known": pa.array(np.zeros(t.num_rows,
                                                        np.int8))})

        def _vote(g: pa.Table) -> pa.Table:
            known = g.filter(pc.equal(g.column("known"), 1))
            unk = g.filter(pc.equal(g.column("known"), 0))
            if unk.num_rows:
                unk = unk.join(known.select(["src", "known"])
                               .rename_columns(["src", "k2"]),
                               keys="src", join_type="left outer")
                unk = unk.filter(pc.is_null(unk.column("k2")))
                counts = (unk.select(["src", "lab"])
                          .group_by(["src", "lab"])
                          .aggregate([([], "count_all")])
                          .rename_columns(["src", "lab", "cnt"]))
                # majority with min-label tiebreak: sort and take the
                # first row per src
                counts = counts.sort_by([("src", "ascending"),
                                         ("cnt", "descending"),
                                         ("lab", "ascending")])
                s = counts.column("src").to_numpy(zero_copy_only=False)
                first = np.concatenate(([True], s[1:] != s[:-1])) \
                    if len(s) else np.zeros(0, bool)
                won = counts.filter(pa.array(first))
                new = pa.table({
                    "node": won.column("src"),
                    "lab": won.column("lab")})
            else:
                new = pa.table({"node": pa.array([], pa.int64()),
                                "lab": pa.array([], pa.int64())})
            old = pa.table({"node": known.column("src"),
                            "lab": known.column("lab")})
            return pa.concat_tables([old, new])

        labels = map_groups_via_buckets(
            labels.map_batches(_tag_known, batch_format="pyarrow")
            .union(msgs.map_batches(_tag_msg, batch_format="pyarrow")),
            ["src"], _vote, n_buckets).materialize()

    return labels.map_batches(
        lambda t: pa.table({node_col: t.column("node"),
                            label_col: t.column("lab")}),
        batch_format="pyarrow")


def embedding_drift(ds_a, ds_b, vec_col: str = "embedding",
                    dim: int = 64, scale: int = 1000,
                    batch_size: int | None = 4096) -> pa.Table:
    """Embedding-distribution drift between two snapshots (model
    version bumps, crawl shifts): L2 distance between the snapshot
    MEANS, computed entirely in exact integer arithmetic —
    num = Σ_i (sa_i·n_b − sb_i·n_a)² over milli-quantized per-dim
    sums as python ints, then ONE sqrt and ONE division — so a
    HUGEINT SQL twin lands on the identical double at any block
    layout.  One streaming pass per side, dim-bounded driver state."""
    n_a, s_a, _ = _cov_partials(ds_a, vec_col, dim, scale, batch_size)
    n_b, s_b, _ = _cov_partials(ds_b, vec_col, dim, scale, batch_size)
    if n_a == 0 or n_b == 0:
        return pa.table({"n_a": pa.array([n_a], pa.int64()),
                         "n_b": pa.array([n_b], pa.int64()),
                         "mean_shift_l2": pa.array([None], pa.float64())})
    num = 0
    for i in range(dim):
        d = int(s_a[i]) * n_b - int(s_b[i]) * n_a
        num += d * d
    import math

    l2 = math.sqrt(float(num)) / float(n_a * n_b * scale)
    return pa.table({"n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64()),
                     "mean_shift_l2": pa.array([l2], pa.float64())})


def triangle_count(edges, a_col: str = "a", b_col: str = "b",
                   n_buckets: int = 64):
    """Distributed triangle counting over an undirected edge Dataset —
    the classic two-exchange composition: canonicalize edges to
    a < b (dedup + drop self loops), JOIN edges with edges on the
    shared low vertex to enumerate wedges (a, b, c) with b < c, then
    SEMI-JOIN wedges against the edge set on the (b, c) closing pair.
    Both joins are the engine's bucketed :func:`~peri_ray.stages.joins.
    hash_join`, so only vertex-id pairs ever cross the wire; each
    triangle (x < y < z) is produced exactly once (wedge at its lowest
    vertex).  Returns one row: (n_edges, n_triangles)."""
    import ray.data as rd  # noqa: F401

    from peri_ray.stages.dedup import map_groups_via_buckets
    from peri_ray.stages.joins import hash_join

    def _canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).combine_chunks().cast(pa.string())
        b = t.column(b_col).combine_chunks().cast(pa.string())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        ok = pc.and_(ok, pc.invert(pc.equal(a, b)))  # drop self loops
        lo = pc.if_else(pc.less(a, b), a, b)
        hi = pc.if_else(pc.less(a, b), b, a)
        return pa.table({"lo": lo, "hi": hi}).filter(ok)

    canon = edges.map_batches(_canon, batch_format="pyarrow")

    def _dedup(bucket: pa.Table) -> pa.Table:
        return bucket.group_by(["lo", "hi"]).aggregate([]).select(
            ["lo", "hi"])

    e = map_groups_via_buckets(canon, ["lo", "hi"], _dedup,
                               n_buckets=n_buckets)
    # MUST pin: three consumers (wedge left, wedge right, closing
    # semi-join) — edge sets are vertex-pair-sized, not corpus-sized
    e = e.materialize()
    n_edges = e.count()

    # wedges: (lo, b=hi, c=hi2) with b < c, joining on the low vertex
    # (right side renamed first — same-named non-key columns would
    # collide in the per-bucket Arrow join)
    e2 = e.map_batches(lambda t: t.rename_columns(["lo", "hi2"]),
                       batch_format="pyarrow")
    wedges = hash_join(e, e2, "lo", "lo", ["hi"], ["hi2"],
                       how="inner", n_buckets=n_buckets)

    def _order(t: pa.Table) -> pa.Table:
        b = t.column("hi").combine_chunks()
        c = t.column("hi2").combine_chunks()
        sub = t.filter(pc.less(b, c))
        return pa.table({"pair": pc.binary_join_element_wise(
            sub.column("hi").combine_chunks(),
            sub.column("hi2").combine_chunks(), "\x1f")})

    wpairs = wedges.map_batches(_order, batch_format="pyarrow")

    def _ekey(t: pa.Table) -> pa.Table:
        return pa.table({"pair": pc.binary_join_element_wise(
            t.column("lo").combine_chunks(),
            t.column("hi").combine_chunks(), "\x1f")})

    ekeys = e.map_batches(_ekey, batch_format="pyarrow")
    closed = hash_join(wpairs, ekeys, "pair", "pair", [], [],
                       how="semi", n_buckets=n_buckets)
    n_tri = closed.count()
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


def semdedup_pairs(ds, threshold: float = 0.9, k_clusters: int = 8,
                   iters: int = 5, vec_col: str = "embedding",
                   id_col: str = "vec_id", round_to: int = 6,
                   max_cluster: int = 200_000):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means partition
    the embedding space, then EXACT cosine pairs WITHIN clusters only —
    O(Σ m_c²) instead of the all-pairs O(n²), the trade that makes
    semantic dedup feasible at corpus scale.  Cross-cluster pairs are
    deliberately out of scope; quantify the miss with the recall
    report query before trusting a threshold.

    Pick ``k_clusters ≈ n / target_cluster_size`` so one cluster's
    matmul fits a task; a cluster above ``max_cluster`` raises rather
    than silently OOMing (k was mis-sized).  Pairs emit as
    (id_a < id_b, cos rounded to ``round_to``, cluster)."""
    import ray

    _, cents, _ = kmeans_fit(ds, k=k_clusters, iters=iters,
                             vec_col=vec_col, id_col=id_col)
    cref = ray.put(np.asarray(cents, np.float64))

    def _assign(t: pa.Table) -> pa.Table:
        vec = t.column(vec_col).combine_chunks()
        t2 = t.filter(pc.is_valid(vec))
        if t2.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "row": pa.array([], pa.list_(pa.float64()))})
        X = _as_matrix(t2.column(vec_col), np.float64)
        C = ray.get(cref)
        d = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
             + (C * C).sum(1)[None, :])
        cl = d.argmin(1).astype(np.int64)
        U = _normalize(X)
        return pa.table({
            id_col: t2.column(id_col).combine_chunks().cast(pa.int64()),
            "cluster": pa.array(cl),
            "row": pa.array(list(U), pa.list_(pa.float64()))})

    assigned = ds.map_batches(_assign, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if n < 2:
            return empty
        if n > max_cluster:
            raise ValueError(
                f"semdedup_pairs: cluster of {n} rows exceeds "
                f"max_cluster={max_cluster}; raise k_clusters")
        ids = (group.column(id_col).combine_chunks()
               .to_numpy(zero_copy_only=False))
        M = _as_matrix(group.column("row"), np.float64)
        sim = np.round(M @ M.T, round_to)
        iu, ju = np.triu_indices(n, 1)
        keep = sim[iu, ju] >= threshold
        if not keep.any():
            return empty
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pa.table({"id_a": pa.array(np.minimum(a, b)),
                         "id_b": pa.array(np.maximum(a, b)),
                         "cos": pa.array(sim[iu[keep], ju[keep]])})

    return assigned.groupby("cluster").map_groups(_pairs,
                                                  batch_format="pyarrow")


def semdedup_victims(ds, threshold: float = 0.9, k_clusters: int = 8,
                     iters: int = 5, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
    """SemDeDup end to end: within-cluster cosine pairs → connected
    components → every cluster member except the min-id keeper (the
    same decision step as text near-dedup)."""
    from peri_ray.stages.dedup import connected_components

    pairs = semdedup_pairs(ds, threshold=threshold, k_clusters=k_clusters,
                           iters=iters, vec_col=vec_col, id_col=id_col)
    labels = connected_components(pairs)

    def _victims(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("doc_id"), t.column("label"))
        return pa.table({id_col: t.filter(keep).column("doc_id")})

    return labels.map_batches(_victims, batch_format="pyarrow")


def graph_degree_stats(edges, src_col: str = "src", dst_col: str = "dst",
                       n_buckets: int = 64,
                       batch_size: int | None = 65536) -> pa.Table:
    """Directed-graph shape metrics over a DISTINCT edge Dataset —
    reciprocity (fraction of edges whose reverse also exists; the
    link-exchange / mutual-citation signal) and out-in degree
    assortativity (Pearson r between outdeg(src) and indeg(dst) across
    edges; do hubs link to hubs?).

    THREE bucketed exchanges total, all shipping (string-cast key,
    string, int) rows only.  Bucketing on src co-locates every edge of
    a given source, so the out-degree is counted AND attached inside
    that one exchange (dictionary-encode + bincount per bucket — no
    degree table, no join); the second exchange keyed on dst attaches
    the in-degree the same way and emits one int64 moment-partial row
    (m, Σx, Σy, Σxy, Σx², Σy²) per bucket; the third, keyed on the
    unordered pair, counts edges whose reverse exists.  Partials merge
    on the driver as exact Python ints.  The final floats are computed
    as the EXACT double expression a SQL twin writes — each integer
    converted with float() first (int/int division past 2^53 diverges
    from SQL, see CLAUDE.md), then m·Σxy − Σx·Σy over √-scaled
    denominators — so the result hash-matches DuckDB.  int64 partials
    bound the safe scale at m·maxdeg² < 2⁶³ per bucket.

    Callers pass DISTINCT edges (run dedupe_pairs upstream);
    duplicates would double-count degrees and moments.  Self-loops are
    dropped.  Returns one row: (n_edges, n_reciprocal, reciprocity,
    assortativity) — assortativity null when either degree sequence is
    constant."""
    import math

    from peri_ray.stages.dedup import map_groups_via_buckets

    def _canon(t: pa.Table) -> pa.Table:
        s = t.column(src_col).combine_chunks().cast(pa.string())
        d = t.column(dst_col).combine_chunks().cast(pa.string())
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)),
                     pc.invert(pc.equal(s, d)))
        return pa.table({"s": s, "d": d}).filter(ok)

    e = edges.map_batches(_canon, batch_format="pyarrow",
                          batch_size=batch_size).materialize()

    def _deg_of(col: pa.ChunkedArray) -> np.ndarray:
        enc = pc.dictionary_encode(col.combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return np.bincount(idx)[idx]

    def _attach_od(bucket: pa.Table) -> pa.Table:
        od = _deg_of(bucket.column("s"))
        return pa.table({"s": bucket.column("s"), "d": bucket.column("d"),
                         "od": pa.array(od, pa.int64())})

    def _moments(bucket: pa.Table) -> pa.Table:
        x = bucket.column("od").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = _deg_of(bucket.column("d")).astype(np.int64)
        return pa.table({
            "m": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
        })

    withod = map_groups_via_buckets(e, ["s"], _attach_od, n_buckets,
                                    coalesce_rows=batch_size)
    partials = map_groups_via_buckets(withod, ["d"], _moments, n_buckets,
                                      coalesce_rows=batch_size)

    m = sx = sy = sxy = sxx = syy = 0
    for r in partials.iter_rows():
        m += r["m"]; sx += r["sx"]; sy += r["sy"]
        sxy += r["sxy"]; sxx += r["sxx"]; syy += r["syy"]

    # reciprocal edges: key the exchange on the UNORDERED pair so both
    # directions co-locate; an unordered pair seen in both directions
    # contributes 2 reciprocal edges (edges are distinct per contract)
    def _pairkey(t: pa.Table) -> pa.Table:
        s = t.column("s").combine_chunks()
        d = t.column("d").combine_chunks()
        lt = pc.less(s, d)
        return pa.table({"lo": pc.if_else(lt, s, d),
                         "hi": pc.if_else(lt, d, s)})

    def _rec_partial(bucket: pa.Table) -> pa.Table:
        g = bucket.group_by(["lo", "hi"]).aggregate([("lo", "count")])
        c = g.column("lo_count").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int(2 * int((c == 2).sum()))],
                                       pa.int64())})

    n_rec = 0
    for r in map_groups_via_buckets(
            e.map_batches(_pairkey, batch_format="pyarrow",
                          batch_size=batch_size),
            ["lo", "hi"], _rec_partial, n_buckets,
            coalesce_rows=batch_size).iter_rows():
        n_rec += r["n"]

    reciprocity = float(n_rec) / float(m) if m else None
    assort = None
    if m:
        num = float(m) * float(sxy) - float(sx) * float(sy)
        dx = float(m) * float(sxx) - float(sx) * float(sx)
        dy = float(m) * float(syy) - float(sy) * float(sy)
        if dx > 0 and dy > 0:
            assort = num / (math.sqrt(dx) * math.sqrt(dy))
    return pa.table({
        "n_edges": pa.array([m], pa.int64()),
        "n_reciprocal": pa.array([n_rec], pa.int64()),
        "reciprocity": pa.array([reciprocity], pa.float64()),
        "assortativity": pa.array([assort], pa.float64()),
    })


def hits_scores(edges, iters: int = 5, src_col: str = "src",
                dst_col: str = "dst", n_buckets: int = 64,
                driver_threshold: int = 2_000_000):
    """HITS hubs & authorities (Kleinberg) for a fixed iteration count
    over a DISTINCT directed (src, dst) edge Dataset:

        a_{t+1} = Aᵀ h_t / ‖Aᵀ h_t‖₂ ;  h_{t+1} = A a_{t+1} / ‖A a_{t+1}‖₂

    with h_0 = 1 (the initial scale cancels at the first
    normalization).  The classic complement to PageRank on a web
    graph: hubs = pages whose OUT-links point at good authorities,
    authorities = pages good hubs point AT.

    Hybrid like pagerank: an edge list under ``driver_threshold``
    resolves in one driver numpy loop.  Above it, each half-step is
    ONE bucketed exchange that both sums the incoming messages per
    key AND attaches the new score to the co-located edges to emit
    the next half's messages (sum+attach fused, so a full iteration
    is 2 exchanges, same as pagerank); rows shipped are (int, int,
    float) only, bounded by edge count.  The L2 norm is one scalar
    from per-block partial sums between exchanges.  Iterative float
    sums make the result reproducible per path but not bit-identical
    across paths; callers compare with tolerance.

    Nodes with no out-edges get hub 0, no in-edges authority 0.
    Duplicate edges would double-count (run dedupe_pairs upstream).
    Returns a Dataset of (node, hub, auth)."""
    import math

    import ray.data as rd

    from peri_ray.stages.dedup import map_groups_via_buckets

    if iters < 1:
        raise ValueError("hits_scores: iters must be >= 1")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "hub": pa.array([], pa.float64()),
            "auth": pa.array([], pa.float64())}))

    if n_edges <= driver_threshold:
        rows = edges.take_all()
        src = np.array([r[src_col] for r in rows], np.int64)
        dst = np.array([r[dst_col] for r in rows], np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        src_l = np.searchsorted(nodes, src)
        dst_l = np.searchsorted(nodes, dst)
        h = np.ones(n, np.float64)
        a = np.zeros(n, np.float64)
        for _ in range(iters):
            a = np.zeros(n, np.float64)
            np.add.at(a, dst_l, h[src_l])
            a /= math.sqrt(float((a * a).sum()))
            h = np.zeros(n, np.float64)
            np.add.at(h, src_l, a[dst_l])
            h /= math.sqrt(float((h * h).sum()))
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "hub": pa.array(h, pa.float64()),
            "auth": pa.array(a, pa.float64())}))

    # ---- distributed path ----
    def _canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column(src_col).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst_col).combine_chunks().cast(pa.int64())})

    e = edges.map_batches(_canon, batch_format="pyarrow").materialize()

    def _e_rows(kcol: str, ocol: str):
        # edge rows for a half-step exchange: key + the other endpoint;
        # v null marks them apart from message rows
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({"k": t.column(kcol), "o": t.column(ocol),
                             "v": pa.nulls(t.num_rows, pa.float64()),
                             "st": pa.nulls(t.num_rows, pa.bool_())})
        return _f

    e_dst = e.map_batches(_e_rows("dst", "src"),
                          batch_format="pyarrow").materialize()
    e_src = e.map_batches(_e_rows("src", "dst"),
                          batch_format="pyarrow").materialize()

    def _half(msgs_in, e_next, norm_prev: float):
        inv = 1.0 / norm_prev

        def _fn(bucket: pa.Table) -> pa.Table:
            isv = pc.is_valid(bucket.column("v").combine_chunks())
            mb = bucket.filter(isv)
            eb = bucket.filter(pc.invert(isv))
            s = (mb.select(["k", "v"]).group_by("k")
                 .aggregate([("v", "sum")]))
            vun = pc.multiply(s.column("v_sum"),
                              pa.scalar(inv, pa.float64()))
            stt = pa.table({"k": s.column("k"),
                            "o": pa.nulls(s.num_rows, pa.int64()),
                            "v": vun,
                            "st": pa.array(np.ones(s.num_rows, bool))})
            sv = pa.table({"k": s.column("k"), "vv": vun})
            j = eb.select(["k", "o"]).join(sv, keys="k",
                                           join_type="inner")
            nxt = pa.table({"k": j.column("o"),
                            "o": pa.nulls(j.num_rows, pa.int64()),
                            "v": j.column("vv"),
                            "st": pa.array(np.zeros(j.num_rows, bool))})
            return pa.concat_tables([stt, nxt])

        return map_groups_via_buckets(msgs_in.union(e_next), ["k"], _fn,
                                      n_buckets).materialize()

    def _norm(out) -> float:
        def _p(t: pa.Table) -> pa.Table:
            v = (t.filter(t.column("st").combine_chunks())
                 .column("v").combine_chunks()
                 .to_numpy(zero_copy_only=False))
            return pa.table({"s": pa.array([float((v * v).sum())],
                                           pa.float64())})

        ssq = 0.0
        for r in out.map_batches(_p, batch_format="pyarrow").iter_rows():
            ssq += r["s"]
        return math.sqrt(ssq)

    def _msgs_of(out):
        return out.map_batches(
            lambda t: t.filter(pc.invert(t.column("st").combine_chunks())),
            batch_format="pyarrow")

    def _state_rows(out, inv: float, col: str):
        def _f(t: pa.Table) -> pa.Table:
            st = t.filter(t.column("st").combine_chunks())
            v = pc.multiply(st.column("v").combine_chunks(),
                            pa.scalar(inv, pa.float64()))
            hub = v if col == "hub" else pa.nulls(st.num_rows, pa.float64())
            auth = v if col == "auth" else pa.nulls(st.num_rows,
                                                    pa.float64())
            return pa.table({"k": st.column("k"), "hub": hub,
                             "auth": auth})
        return out.map_batches(_f, batch_format="pyarrow")

    # h_0 = 1 at every edge source: the first a-half's messages need
    # no join at all
    msgs = e.map_batches(
        lambda t: pa.table({
            "k": t.column("dst"),
            "o": pa.nulls(t.num_rows, pa.int64()),
            "v": pa.array(np.ones(t.num_rows, np.float64)),
            "st": pa.nulls(t.num_rows, pa.bool_())}),
        batch_format="pyarrow")
    norm_h = 1.0
    out_a = out_h = None
    for _ in range(iters):
        out_a = _half(msgs, e_dst, norm_h)
        norm_a = _norm(out_a)
        out_h = _half(_msgs_of(out_a), e_src, norm_a)
        norm_h = _norm(out_h)
        msgs = _msgs_of(out_h)

    # every node is a src or a dst, so the union of the two state
    # tables covers all nodes; max-of-one-non-null + fill 0 assembles
    def _final(bucket: pa.Table) -> pa.Table:
        g = bucket.group_by("k").aggregate([("hub", "max"),
                                            ("auth", "max")])
        return pa.table({
            "node": g.column("k"),
            "hub": pc.fill_null(g.column("hub_max"),
                                pa.scalar(0.0, pa.float64())),
            "auth": pc.fill_null(g.column("auth_max"),
                                 pa.scalar(0.0, pa.float64()))})

    return map_groups_via_buckets(
        _state_rows(out_h, 1.0 / norm_h, "hub")
        .union(_state_rows(out_a, 1.0 / norm_a, "auth")),
        ["k"], _final, n_buckets)


def kcore_members(edges, k: int = 3, src_col: str = "src",
                  dst_col: str = "dst", n_buckets: int = 64,
                  driver_threshold: int = 2_000_000,
                  max_rounds: int = 64):
    """k-core of the UNDIRECTED graph induced by a DISTINCT directed
    edge Dataset: the maximal subgraph in which every node has degree
    >= k (Seidman).  The dense-subgraph primitive for link-farm /
    mutual-promotion detection on a web crawl: spam rings survive
    high-k peeling, organic link tails do not.

    Peeling: repeatedly delete nodes of degree < k until a fixpoint.
    Hybrid like pagerank: an edge list under ``driver_threshold``
    peels in one driver numpy loop.  Above it, each round is one
    bucketed degree count over the surviving edge set plus two
    semi-join exchanges that drop edges touching a deleted node —
    every exchange ships int pairs only, and the edge set only
    shrinks.  Rounds = peeling depth; a chain graph peels one layer
    per round, so the distributed path raises past ``max_rounds``
    (shapes that deep want the driver path or a higher bound) rather
    than looping silently.

    Directionality is ignored (degree = in + out over the deduped
    undirected pair set); parallel directed pairs (u->v plus v->u)
    collapse to ONE undirected edge first, so callers need not
    pre-canonicalize.  Returns a Dataset of (node,) in the k-core
    (possibly empty)."""
    import ray.data as rd

    from peri_ray.stages.dedup import (dedupe_pairs,
                                       grouped_sum_via_buckets)
    from peri_ray.stages.joins import hash_join

    if k < 1:
        raise ValueError("kcore_members: k must be >= 1")

    # undirected canonical pair set: (lo, hi) deduped
    def _undir(t: pa.Table) -> pa.Table:
        s = t.column(src_col).combine_chunks().cast(pa.int64())
        d = t.column(dst_col).combine_chunks().cast(pa.int64())
        ok = pc.invert(pc.equal(s, d))
        ok = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(d)), ok)
        tt = pa.table({"s": s, "d": d}).filter(ok)
        lt = pc.less(tt.column("s"), tt.column("d"))
        return pa.table({
            "id_a": pc.if_else(lt, tt.column("s"), tt.column("d")),
            "id_b": pc.if_else(lt, tt.column("d"), tt.column("s"))})

    e = dedupe_pairs(edges.map_batches(_undir,
                                       batch_format="pyarrow"))
    e = e.materialize()
    n_edges = e.count()
    empty = pa.table({"node": pa.array([], pa.int64())})
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= driver_threshold:
        rows = e.take_all()
        a = np.array([r["id_a"] for r in rows], np.int64)
        b = np.array([r["id_b"] for r in rows], np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        al = np.searchsorted(nodes, a)
        bl = np.searchsorted(nodes, b)
        alive_e = np.ones(len(al), bool)
        while True:
            deg = np.bincount(al[alive_e], minlength=len(nodes))
            deg += np.bincount(bl[alive_e], minlength=len(nodes))
            weak = (deg < k) & (deg > 0)
            if not weak.any():
                keep = deg >= k
                return rd.from_arrow(pa.table({
                    "node": pa.array(nodes[keep], pa.int64())}))
            alive_e &= ~(weak[al] | weak[bl])

    # ---- distributed peeling ----
    for _ in range(max_rounds):
        def _deg_rows(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": pa.concat_arrays(
                    [t.column("id_a").combine_chunks(),
                     t.column("id_b").combine_chunks()]),
                "c": pa.array(np.ones(2 * t.num_rows, np.int64))})

        deg = grouped_sum_via_buckets(
            e.map_batches(_deg_rows, batch_format="pyarrow"),
            ["node"], "c", n_buckets).materialize()

        n_weak = deg.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(pc.sum(pc.less(t.column("c"),
                                    pa.scalar(k)).cast(pa.int64()))
                     .as_py() or 0)], pa.int64())}),
            batch_format="pyarrow").sum("n")
        if not n_weak:
            return deg.map_batches(
                lambda t: pa.table({"node": t.column("node")}),
                batch_format="pyarrow")

        strong = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("c").combine_chunks(),
                pa.scalar(k))).select(["node"]),
            batch_format="pyarrow").materialize()
        if strong.count() == 0:
            return rd.from_arrow(empty)
        e = hash_join(
            hash_join(e, strong, "id_a", "node", ["id_b"], [],
                      how="semi", n_buckets=n_buckets),
            strong, "id_b", "node", ["id_a"], [],
            how="semi", n_buckets=n_buckets).materialize()
        if e.count() == 0:
            return rd.from_arrow(empty)

    raise ValueError(
        f"kcore_members: no fixpoint after {max_rounds} rounds "
        f"(peeling depth exceeds max_rounds; raise it or use the "
        f"driver path)")


def seed_link_distance(edges, seeds, max_hops: int = 8,
                       src_col: str = "src", dst_col: str = "dst",
                       n_buckets: int = 64,
                       driver_threshold: int = 2_000_000):
    """Multi-source BFS link distance: for every node reachable from a
    trusted seed set within ``max_hops`` directed hops, the MINIMUM
    hop count.  The TrustRank-adjacent curation signal — pages far
    from every trusted seed are crawl-frontier noise — and the
    discrete complement of seeded PageRank (hops, not mass).

    Hybrid like pagerank: edge lists under ``driver_threshold``
    resolve in a driver numpy BFS.  Above it, round r is ONE bucketed
    exchange keyed src: the hop-(r-1) frontier rows co-locate with
    each source's out-edges, emitting candidate (node, r) rows; a
    second exchange keyed node unions the candidates with the settled
    labels and keeps the per-node minimum, so only nodes first
    reached at hop r survive as the next frontier.  Per-round
    exchange volume is the edge set (exchange 1, like every BSP
    round here — pagerank ships its wedges each iteration too) plus
    candidates + settled labels (exchange 2; the settled set must
    travel because a node settled at hop 1 can be a candidate again
    at hop 3, and dropping it requires comparing against the full
    label table).  Rounds = min(eccentricity, max_hops) — web graphs are
    shallow from good seeds; unreached nodes within the bound simply
    don't appear (callers treat absence as "beyond max_hops").

    Seeds are side-input scale and must appear in the graph (a typo'd
    seed raises).  Returns a Dataset of (node, hops), seeds at 0."""
    import ray.data as rd

    from peri_ray.stages.dedup import map_groups_via_buckets

    seed_list = sorted({int(x) for x in seeds})
    if not seed_list:
        raise ValueError("seed_link_distance: seeds must be non-empty")
    if max_hops < 0:
        raise ValueError("seed_link_distance: max_hops must be >= 0")

    def _canon(t: pa.Table) -> pa.Table:
        s = t.column(src_col).combine_chunks().cast(pa.int64())
        d = t.column(dst_col).combine_chunks().cast(pa.int64())
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        return pa.table({"s": s, "d": d}).filter(ok)

    e = edges.map_batches(_canon, batch_format="pyarrow").materialize()
    n_edges = e.count()
    if n_edges == 0:
        raise ValueError("seed_link_distance: empty edge list")

    if n_edges <= driver_threshold:
        rows = e.take_all()
        src = np.array([r["s"] for r in rows], np.int64)
        dst = np.array([r["d"] for r in rows], np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        sarr = np.asarray(seed_list, np.int64)
        pos = np.searchsorted(nodes, sarr)
        if ((pos >= n).any()
                or (nodes[np.minimum(pos, n - 1)] != sarr).any()):
            raise ValueError(
                "seed_link_distance: seed node(s) not in the edge list")
        sl = np.searchsorted(nodes, src)
        dl = np.searchsorted(nodes, dst)
        dist = np.full(n, -1, np.int64)
        dist[pos] = 0
        frontier = pos
        for hop in range(1, max_hops + 1):
            m = np.isin(sl, frontier)
            cand = np.unique(dl[m])
            cand = cand[dist[cand] < 0]
            if len(cand) == 0:
                break
            dist[cand] = hop
            frontier = cand
        keep = dist >= 0
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes[keep], pa.int64()),
            "hops": pa.array(dist[keep], pa.int64())}))

    # ---- distributed BFS ----
    seed_arr = pa.array(seed_list, pa.int64())

    def _seed_hits(t: pa.Table, sa=seed_arr) -> pa.Table:
        both = pa.concat_arrays([t.column("s").combine_chunks(),
                                 t.column("d").combine_chunks()])
        return pa.table({"v": pc.unique(both.filter(
            pc.is_in(both, value_set=sa)))})

    seen: set = set()
    for r in e.map_batches(_seed_hits,
                           batch_format="pyarrow").iter_rows():
        seen.add(r["v"])
    if len(seen) != len(seed_list):
        raise ValueError(
            "seed_link_distance: seed node(s) not in the edge list")

    # settled labels so far (node, hops); frontier = nodes settled at
    # the previous hop
    settled = rd.from_arrow(pa.table({
        "node": seed_arr, "hops": pa.array([0] * len(seed_list),
                                           pa.int64())}))
    frontier = settled
    for hop in range(1, max_hops + 1):
        # exchange 1 keyed s: frontier rows meet out-edges, emit
        # candidate (node=dst, hop)
        def _tag_f(t: pa.Table) -> pa.Table:
            return pa.table({"s": t.column("node"),
                             "d": pa.nulls(t.num_rows, pa.int64())})

        def _expand(g: pa.Table, h=hop) -> pa.Table:
            isf = pc.is_null(g.column("d").combine_chunks())
            fs = g.filter(isf).select(["s"])
            if fs.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "hops": pa.array([], pa.int64())})
            ee = g.filter(pc.invert(isf))
            hit = ee.filter(pc.is_in(
                ee.column("s").combine_chunks(),
                value_set=pc.unique(fs.column("s").combine_chunks())))
            cand = pc.unique(hit.column("d").combine_chunks())
            return pa.table({
                "node": cand,
                "hops": pa.array(np.full(len(cand), h, np.int64))})

        cands = map_groups_via_buckets(
            frontier.map_batches(_tag_f, batch_format="pyarrow")
            .union(e), ["s"], _expand, n_buckets)

        # exchange 2 keyed node: drop candidates already settled, keep
        # min label
        def _settle(g: pa.Table, h=hop) -> pa.Table:
            m = (g.group_by("node").aggregate([("hops", "min")])
                 .rename_columns(["node", "hops"]))
            return m.filter(pc.equal(m.column("hops"),
                                     pa.scalar(h, pa.int64())))

        new_frontier = map_groups_via_buckets(
            cands.union(settled), ["node"], _settle,
            n_buckets).materialize()
        if new_frontier.count() == 0:
            break
        settled = settled.union(new_frontier).materialize()
        frontier = new_frontier
    return settled


def write_ivf_index(ds, out_dir: str, *, n_cells: int = 16,
                    train_sample: int = 4096, seed: int = 7,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> dict:
    """Persist an IVF-Flat vector index: a coarse quantizer trained on
    a sample, every vector written to its nearest-centroid CELL FILE
    (one parquet per cell), centroids + cell row counts in a sibling
    ``<dir>.index.json`` manifest.  The vector-search sibling of the
    term index: at probe time only ``nprobe`` of ``n_cells`` FILES are
    read — real I/O pruning, where the in-memory :func:`ivf_topk`
    still scans every block and filters after the read.  Raw vectors
    are stored; normalization happens at probe (same semantics as
    ivf_topk / brute_force_topk)."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    sample = ds.take(train_sample)
    X = _normalize(np.stack([np.asarray(r[vec_col], np.float32)
                             for r in sample]))
    cent = _kmeans(X, n_cells, seed=seed)
    cent_ref = ray.put(cent)
    os.makedirs(out_dir, exist_ok=True)

    # concurrency 2, not 4: the downstream groupby's shuffle tasks
    # need CPU slots too, and an actor pool as wide as the session
    # deadlocks a small (4-cpu test) cluster
    assigned = ds.map_batches(
        _IVFAssign, fn_constructor_kwargs=dict(
            centroids_ref=cent_ref, id_col=id_col, vec_col=vec_col),
        concurrency=2, batch_format="pyarrow")

    def _write(g: pa.Table) -> pa.Table:
        c = g.column("cell")[0].as_py()
        d = g.drop_columns(["cell"]).sort_by([(id_col, "ascending")])
        pq.write_table(d, os.path.join(out_dir,
                                       f"cell_{c:05d}.parquet"))
        return pa.table({"cell": pa.array([c], pa.int32()),
                         "n": pa.array([d.num_rows], pa.int64())})

    rows = (assigned.groupby("cell")
            .map_groups(_write, batch_format="pyarrow").take_all())
    cells = sorted(int(r["cell"]) for r in rows)
    counts = {int(r["cell"]): int(r["n"]) for r in rows}
    keep = {f"cell_{c:05d}.parquet" for c in cells}
    for name in os.listdir(out_dir):
        if name.startswith("cell_") and name not in keep:
            os.remove(os.path.join(out_dir, name))
    manifest = {"n_cells": n_cells, "id_col": id_col,
                "vec_col": vec_col, "seed": seed,
                "cells": cells,
                "cell_counts": {str(c): counts[c] for c in cells},
                "centroids": [[float(x) for x in row] for row in cent]}
    with open(out_dir.rstrip("/") + ".index.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def probe_ivf_index(index_dir: str, queries: np.ndarray, k: int = 10,
                    nprobe: int = 4):
    """ANN top-k against a :func:`write_ivf_index` artifact: rank the
    manifest centroids per query, read ONLY the union of the queries'
    ``nprobe`` nearest cell files, and brute-force the candidates
    (IVF-Flat).  Scanned bytes ≈ nprobe/n_cells of the index;
    ``nprobe = n_cells`` degrades gracefully to exact search (tested
    equal to the full brute force).  Returns
    :func:`brute_force_topk`'s per-query result lists."""
    import json
    import os

    import ray.data as rd

    with open(index_dir.rstrip("/") + ".index.json") as f:
        manifest = json.load(f)
    cent = np.asarray(manifest["centroids"], np.float32)
    q = _normalize(np.asarray(queries, np.float32))
    nprobe = min(nprobe, len(cent))
    probe_cells = sorted(set(
        np.argsort(-(q @ cent.T), axis=1)[:, :nprobe].ravel().tolist()))
    have = set(manifest["cells"])
    files = []
    for c in probe_cells:
        if c not in have:
            continue  # empty cell, recorded at build
        p = os.path.join(index_dir, f"cell_{c:05d}.parquet")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"probe_ivf_index: cell {c} in manifest but {p} "
                f"missing — the index is corrupt")
        files.append(p)
    if not files:
        return [[] for _ in range(len(q))]
    cand = rd.read_parquet(files)
    return brute_force_topk(cand, q, k, manifest["id_col"],
                            manifest["vec_col"])


def append_ivf_index(index_dir: str, delta_ds) -> dict:
    """Append a delta corpus to a persisted IVF index WITHOUT
    retraining: the manifest's centroids stay the frozen quantizer
    (the standard incremental-IVF contract — recall drifts only as
    the data distribution drifts, and a periodic rebuild re-trains),
    delta vectors assign to their nearest existing cell, and each
    touched cell file is read, concatenated, and rewritten.  Cell
    counts and the manifest update; untouched cells are not read.
    Doc-id spaces must be disjoint (the probe contract)."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    with open(index_dir.rstrip("/") + ".index.json") as f:
        manifest = json.load(f)
    cent = np.asarray(manifest["centroids"], np.float32)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    cent_ref = ray.put(cent)

    assigned = delta_ds.map_batches(
        _IVFAssign, fn_constructor_kwargs=dict(
            centroids_ref=cent_ref, id_col=id_col, vec_col=vec_col),
        concurrency=2, batch_format="pyarrow")

    def _append(g: pa.Table) -> pa.Table:
        c = g.column("cell")[0].as_py()
        new = g.drop_columns(["cell"])
        path = os.path.join(index_dir, f"cell_{c:05d}.parquet")
        if os.path.exists(path):
            new = pa.concat_tables([pq.read_table(path), new])
        pq.write_table(new.sort_by([(id_col, "ascending")]), path)
        return pa.table({"cell": pa.array([c], pa.int32()),
                         "n": pa.array([new.num_rows], pa.int64())})

    rows = (assigned.groupby("cell")
            .map_groups(_append, batch_format="pyarrow").take_all())
    counts = dict(manifest["cell_counts"])
    cells = set(manifest["cells"])
    for r in rows:
        counts[str(int(r["cell"]))] = int(r["n"])
        cells.add(int(r["cell"]))
    manifest["cells"] = sorted(cells)
    manifest["cell_counts"] = {str(c): counts[str(c)]
                               for c in sorted(cells)}
    with open(index_dir.rstrip("/") + ".index.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def lof_scores(ds, k: int = 5, vec_col: str = "embedding",
               id_col: str = "vec_id", round_to: int = 6,
               n_buckets: int = 64):
    """Local Outlier Factor over the exact cosine kNN graph — the
    density-RATIO outlier detector (Breunig et al. 2000): LOF(q) ≈ 1
    in uniform regions, >> 1 where q is sparser than its neighbors;
    it finds outliers the distance-to-centroid gate
    (embedding_outliers) misses in multi-cluster corpora.

    Composition over the already-oracled :func:`knn_graph` edges with
    distance d = 1 - cos (cos pre-rounded to ``round_to``, so both
    engines rank and compute from identical values):

    - k-distance per node: one bucketed min over its edges;
    - reachability r(q,o) = max(kdist(o), d(q,o)): one hash join of
      edges against kdist on the NEIGHBOR id;
    - lrd(q) = k / Σ r(q,o): one bucketed sum;
    - LOF(q) = Σ lrd(o) / (k · lrd(q)): one more neighbor join + sum.

    Every exchange ships (id, float) pairs — vectors stay in the kNN
    stage.  Σ over the k reach/lrd terms is a 5-double sum whose
    association order may differ across engines by an ulp; the final
    ROUND(6, half-away) absorbs it (cosine-derived values cannot tie
    at the rounding boundary).  Duplicate vectors (kdist 0) make
    lrd infinite per IEEE — the standard LOF degeneracy, unchanged.

    Returns a Dataset of (id, lof)."""
    from peri_ray.stages.dedup import map_groups_via_buckets
    from peri_ray.stages.joins import hash_join

    edges = knn_graph(ds, k, vec_col=vec_col, id_col=id_col,
                      round_to=round_to).materialize()  # 3 consumers

    def _min_cos(group: pa.Table) -> pa.Table:
        g = (group.select(["query_id", "cos"]).group_by("query_id")
             .aggregate([("cos", "min")]))
        kd = pc.subtract(pa.scalar(1.0), g.column("cos_min"))
        return pa.table({"id": g.column("query_id"), "kdist": kd})

    kd = map_groups_via_buckets(edges, ["query_id"], _min_cos,
                                n_buckets=n_buckets)

    e2 = hash_join(edges, kd, "neighbor_id", "id",
                   ["query_id", "cos"], ["kdist"], how="inner",
                   n_buckets=n_buckets)

    def _reach(t: pa.Table) -> pa.Table:
        d = pc.subtract(pa.scalar(1.0),
                        t.column("cos").combine_chunks())
        r = pc.max_element_wise(t.column("kdist").combine_chunks(), d)
        return pa.table({"query_id": t.column("query_id"), "r": r})

    def _lrd(group: pa.Table) -> pa.Table:
        g = (group.select(["query_id", "r"]).group_by("query_id")
             .aggregate([("r", "sum")]))
        lrd = pc.divide(pa.scalar(float(k)), g.column("r_sum"))
        return pa.table({"id": g.column("query_id"), "lrd": lrd})

    lrd = map_groups_via_buckets(
        e2.map_batches(_reach, batch_format="pyarrow"),
        ["query_id"], _lrd, n_buckets=n_buckets).materialize()  # 2 uses

    e3 = hash_join(edges, lrd, "neighbor_id", "id",
                   ["query_id"], ["lrd"], how="inner",
                   n_buckets=n_buckets)

    def _sum_nbr(group: pa.Table) -> pa.Table:
        g = (group.select(["query_id", "lrd"]).group_by("query_id")
             .aggregate([("lrd", "sum")]))
        return g.rename_columns(["id", "nbr_lrd"])

    nbr = map_groups_via_buckets(e3, ["query_id"], _sum_nbr,
                                 n_buckets=n_buckets)
    out = hash_join(nbr, lrd, "id", "id", ["nbr_lrd"], ["lrd"],
                    how="inner", n_buckets=n_buckets)

    def _lof(t: pa.Table) -> pa.Table:
        lof = pc.divide(t.column("nbr_lrd").combine_chunks(),
                        pc.multiply(pa.scalar(float(k)),
                                    t.column("lrd").combine_chunks()))
        return pa.table({id_col: t.column("id"),
                         "lof": pc.round(
                             lof, round_to,
                             round_mode="half_towards_infinity")})

    return out.map_batches(_lof, batch_format="pyarrow")
