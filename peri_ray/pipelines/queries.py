"""Driver-contract query battery: one entry per operator family from
SURVEY §2, each with a DuckDB-oracle twin (see ``__ray_entry__.py``).

Every callable takes ``sf_dir`` and returns a Dataset / pyarrow Table.
Column names match the oracle SQL exactly (the driver hashes values
after sorting columns by name).  Floats that undergo arithmetic are
rounded identically on both sides; pass-through floats are hashed raw
(same parquet bits on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray import compile_spec, vec
from peri_ray.validate import validate_dataset, violations_dataset
from peri_ray.stages.checks import (
    drift_check,
    duplicate_keys,
    histogram,
    psi,
    referential_violations,
)
from peri_ray.stages.stats import column_stats, exact_stats_table
from peri_ray.stages.dedup import exact_dedup_keepers
from peri_ray.stages.text import token_count_batch

LANGS = ["en", "de", "fr", "es", "pt"]
EVENT_TYPES = ["click", "view", "signup", "purchase"]

DOCS_SPEC = {
    "doc_id": ("required", "integer"),
    "text": ("required", ("string", ("min", 1))),
    "lang": ("enum", LANGS),
    "n_chars": ("integer", ("gte", 0)),
}


def _read(sf_dir: str, table: str, columns=None):
    from peri_ray.sources import read_table

    return read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _rows(res) -> list[dict]:
    """Rows of a small result that may be a pa.Table or a Dataset —
    the audit queries join tiny per-group outputs on the driver."""
    if isinstance(res, pa.Table):
        return res.to_pylist()
    return res.take_all()


def _collect(ds, schema: pa.Schema) -> pa.Table:
    """Materialize a small/empty-prone result with an explicit schema
    (an empty Dataset otherwise surfaces as a schema-less DataFrame)."""
    tables = [pa.Table.from_pylist(rows, schema=schema)
              for rows in [ds.take_all()]]
    t = tables[0]
    return t.cast(schema) if t.schema != schema else t


# ---------------------------------------------------------------------------
# validation core over documents
# ---------------------------------------------------------------------------


def validate_documents_violations(sf_dir: str):
    """Violation rows for the documents spec.  Oracle: UNION ALL of
    negated-rule SELECTs (reference semantics: Peri.validate error list,
    lib/peri.ex:572-604)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    combined = validate_dataset(ds, DOCS_SPEC, id_column="doc_id")
    return violations_dataset(combined).select_columns(["record_id", "rule_id", "path"])


def conforms_documents(sf_dir: str):
    """(doc_id, valid) — Peri.conforms? per row (lib/peri.ex:443-450)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    combined = validate_dataset(ds, DOCS_SPEC, id_column="doc_id")
    return combined.select_columns(["doc_id", "valid"])


def filter_valid_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    combined = validate_dataset(ds, DOCS_SPEC, id_column="doc_id")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(t.column("valid")).select(["doc_id", "lang", "n_chars"])

    return combined.map_batches(_f, batch_format="pyarrow")


def strict_projection_documents(sf_dir: str):
    """Strict-mode key filtering (filter_data, lib/peri.ex:630-664): the
    output carries only schema-declared columns."""
    ds = _read(sf_dir, "documents")
    combined = validate_dataset(
        ds, {"doc_id": ("required", "integer"), "lang": "string"}, id_column="doc_id"
    )
    return combined.select_columns(["doc_id", "lang"])


def transform_upcase_lang(sf_dir: str):
    """{t, {:transform, f}} (lib/peri.ex:1058-1108) as a column rewrite."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    spec = {"doc_id": ("required", "integer"), "lang": ("string", ("transform", "upcase"))}
    combined = validate_dataset(ds, spec, id_column="doc_id")

    def _sel(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"), "lang_up": t.column("lang")})

    return combined.map_batches(_sel, batch_format="pyarrow")


def default_fill_quality(sf_dir: str):
    """{t, {:default, v}} fills a missing column (lib/peri.ex:970-991)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    spec = {"doc_id": ("required", "integer"), "quality": ("integer", ("default", 0))}
    combined = validate_dataset(ds, spec, id_column="doc_id")
    return combined.select_columns(["doc_id", "quality"])


# ---------------------------------------------------------------------------
# constraint kernels over events / lineitem
# ---------------------------------------------------------------------------


def events_enum_violations(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    spec = {"event_id": ("required", "integer"), "event_type": ("enum", EVENT_TYPES)}
    combined = validate_dataset(ds, spec, id_column="event_id")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["event_id", "event_type"])

    return combined.map_batches(_f, batch_format="pyarrow")


def events_value_range_violations(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "value"])
    spec = {"event_id": ("required", "integer"), "value": ("float", ("range", (0.0, 100.0)))}
    combined = validate_dataset(ds, spec, id_column="event_id")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["event_id", "value"])

    return combined.map_batches(_f, batch_format="pyarrow")


def lineitem_constraint_counts(sf_dir: str):
    """Per-rule violation counts over numeric constraints (SURVEY §2.3)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_discount", "l_extendedprice"])
    spec = {
        "l_quantity": ("float", ("gt", 0.0)),
        "l_discount": ("float", ("range", (0.0, 0.1))),
        "l_extendedprice": ("float", ("gte", 1000.0)),
    }
    combined = validate_dataset(ds, spec, mode="permissive", id_column="l_orderkey")
    from peri_ray.validate import violation_rule_counts

    return violation_rule_counts(combined)


def dependent_flag_mismatch_count(sf_dir: str):
    """{:dependent, field, cb, t} pairwise equality (lib/peri.ex:1039-46).
    Count of lineitem rows where l_returnflag differs from l_linestatus."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_linestatus"])
    spec = {
        "l_returnflag": (
            "dependent", "l_linestatus", ("eq", "flag should equal status"), "string",
        ),
    }
    combined = validate_dataset(ds, spec, mode="permissive", id_column="l_orderkey")

    def _cnt(t: pa.Table) -> pa.Table:
        bad = pc.sum(pc.invert(t.column("valid"))).as_py() or 0
        return pa.table({"cnt": pa.array([bad], pa.int64())})

    total = combined.map_batches(_cnt, batch_format="pyarrow").sum("cnt")
    return pa.table({"cnt": pa.array([int(total or 0)], pa.int64())})


def multi_dispatch_events(sf_dir: str):
    """{:multi, field, branches} (lib/peri.ex:1521-1556): per-event-type
    value rules; violations as (record_id, rule_id)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    spec = {
        "value": (
            "multi",
            "event_type",
            {
                "purchase": ("float", ("gte", 10.0)),
                "click": ("float", ("lte", 100.0)),
                "view": "float",
                "signup": "float",
                "error": "float",
            },
        )
    }
    combined = validate_dataset(ds, spec, mode="permissive", id_column="event_id")
    return violations_dataset(combined).select_columns(["record_id", "rule_id"])


def cond_purchase_value(sf_dir: str):
    """{:cond, cb, t, f} (lib/peri.ex:993-999) with a vectorized
    condition: purchases need value >= 10."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    cond = vec(lambda table: pc.equal(table.column("event_type").combine_chunks(), "purchase"))
    spec = {"value": ("cond", cond, ("float", ("gte", 10.0)), "float")}
    combined = validate_dataset(ds, spec, mode="permissive", id_column="event_id")
    return violations_dataset(combined).select_columns(["record_id", "rule_id"])


# ---------------------------------------------------------------------------
# [NORTH] table-level checks
# ---------------------------------------------------------------------------


def referential_docs_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return referential_violations(ds, "lang", LANGS, columns=["doc_id"]).select_columns(
        ["doc_id", "lang"]
    )


def referential_orders_customer(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    bad = referential_violations(orders, "o_custkey", cust, columns=["o_orderkey"]).select_columns(
        ["o_orderkey"]
    )
    return _collect(bad, pa.schema([("o_orderkey", pa.int64())]))


def duplicate_user_ids(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id"])
    return duplicate_keys(ds, "user_id")


def duplicate_doc_ids(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id"])
    return _collect(duplicate_keys(ds, "doc_id"),
                    pa.schema([("doc_id", pa.int64()), ("cnt", pa.int64())]))


def lang_histogram(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang"])
    hist = histogram(ds, "lang")
    langs = sorted(hist)
    return pa.table({"lang": pa.array(langs, pa.string()),
                     "cnt": pa.array([hist[l] for l in langs], pa.int64())})


def event_type_histogram(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    hist = histogram(ds, "event_type")
    ks = sorted(hist)
    return pa.table({"event_type": pa.array(ks, pa.string()),
                     "cnt": pa.array([hist[k] for k in ks], pa.int64())})


def exact_stats_lineitem(sf_dir: str):
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    ds = _read(sf_dir, "lineitem", cols)
    # sums compared as integer cents: float sums are association-order
    # sensitive and ROUND(sum,2) doubles can land on different
    # neighboring representations engine-vs-oracle (CLAUDE.md pitfall)
    t = exact_stats_table(ds, cols, cents_sums=True)
    return t.drop_columns(["sum_v"])


def psi_event_type(sf_dir: str):
    """Drift score vs a uniform reference histogram (PSI)."""
    ds = _read(sf_dir, "events", ["event_type"])
    obs = histogram(ds, "event_type")
    ref = {k: 0.2 for k in ["click", "view", "signup", "purchase", "error"]}
    score = psi(obs, ref)
    return pa.table({"psi": pa.array([round(score, 6)], pa.float64())})


# ---------------------------------------------------------------------------
# training-data operators
# ---------------------------------------------------------------------------


def dedup_exact_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    keepers = exact_dedup_keepers(ds, "text", "doc_id")

    def _sel(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("keep_id")})

    return keepers.map_batches(_sel, batch_format="pyarrow")


def exact_dedup_victims(sf_dir: str):
    """Ids removed by exact dedup (everything but the min-id keeper per
    distinct text) — single bucketed (content_hash, id) exchange, no
    driver-side keeper materialization (VERDICT r1 item 1)."""
    from peri_ray.stages.dedup import exact_duplicate_ids

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    victims = exact_duplicate_ids(ds, "text", "doc_id")
    return _collect(victims, pa.schema([("doc_id", pa.int64())]))


def top_docs_per_source(sf_dir: str):
    """Top-3 documents per source by n_chars (group-wise top-k; oracle
    = row_number() OVER (PARTITION BY ...) <= 3, ties by doc_id)."""
    from peri_ray.stages.stats import top_k_per_group

    ds = _read(sf_dir, "documents", ["source", "doc_id", "n_chars"])
    top = top_k_per_group(ds, "source", "n_chars", k=3, descending=True,
                          tiebreak="doc_id")
    return top.select_columns(["source", "doc_id", "n_chars"])


def top_sources_by_chars(sf_dir: str):
    """Top-5 sources by total n_chars: pre-aggregated groupby then a tiny
    sort+limit (SURVEY §2.7 top-k)."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n_chars", "sum")])
        return g.rename_columns(["source", "sum_chars"])

    totals = ds.map_batches(_partial, batch_format="pyarrow").groupby("source").sum("sum_chars")
    rows = totals.take_all()
    rows.sort(key=lambda r: (-r["sum(sum_chars)"], r["source"]))
    top = rows[:5]
    return pa.table({"source": pa.array([r["source"] for r in top], pa.string()),
                     "sum_chars": pa.array([int(r["sum(sum_chars)"]) for r in top], pa.int64())})


def token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: token_count_batch(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


def embedding_dims(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _dims(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t.column("vec_id"),
                         "n_dims": pc.list_value_length(t.column("embedding")).cast(pa.int64())})

    return ds.map_batches(_dims, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# rows-only queries (not SQL-expressible; driver records weaker check)
# ---------------------------------------------------------------------------


def quality_scores(sf_dir: str):
    """C4/Gopher quality signals, oracle-checked: the token/stopword
    counts are exact integers; the ratios and the composite score are
    rounded to 6 decimals on both sides (pure IEEE arithmetic in
    identical order, so the pre-round doubles agree — rounding only
    pins the hash)."""
    from peri_ray.stages.text import add_quality_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _round(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t.column("doc_id"),
                "n_words": t.column("n_words"),
                "n_stop": t.column("n_stop")}
        for c in ("stop_ratio", "mean_word_len", "punct_ratio", "quality_score"):
            # half_towards_infinity = SQL ROUND; the dyadic ratios here
            # (e.g. 1/32-based scores) hit exact .xxxxxx5 ties where
            # half-to-even would disagree with DuckDB
            cols[c] = pc.round(t.column(c), ndigits=6,
                               round_mode="half_towards_infinity")
        return pa.table(cols)

    return add_quality_scores(ds).map_batches(_round, batch_format="pyarrow")


def lang_id_guess(sf_dir: str):
    from peri_ray.stages.text import add_lang_id

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_lang_id(ds, concurrency=2).select_columns(["doc_id", "lang_guess"])


def simhash_fps(sf_dir: str):
    from peri_ray.stages.dedup import simhash_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_fingerprints(ds)


def minhash_near_dup_pairs(sf_dir: str):
    from peri_ray.stages.dedup import minhash_lsh_candidates, verify_candidates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # 8 bands × 8 rows: LSH threshold (1/8)^(1/8) ≈ 0.77, tuned to the
    # 0.8 verify cut.  16×4 (threshold ≈ 0.5) floods candidates on this
    # corpus, whose baseline pairwise jaccard is ~0.2 (small vocab):
    # 3.5× faster at sf0.1 with identical verified pairs.
    # dedupe=False: verify's score stage collapses a pair found in
    # multiple bands, so the standalone pair-dedupe groupby (a 4th
    # all-to-all exchange) is redundant work
    cands = minhash_lsh_candidates(ds, bands=8, num_perm=64, dedupe=False)
    return verify_candidates(ds, cands, threshold=0.8)


def windowed_event_counts(sf_dir: str):
    """Tumbling 1-hour windowed aggregate over events (custom operator:
    windowed aggregate; oracle = epoch-floor GROUP BY)."""
    from peri_ray.stages.temporal import tumbling_window_counts

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    return tumbling_window_counts(ds, "ts", "event_type", window_s=3600)


def session_stats(sf_dir: str):
    """Gap-based sessionization (30-min gap) per user (custom operator:
    sessionized window; oracle = lag + cumulative-sum window SQL)."""
    from peri_ray.stages.temporal import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return sessionize(ds, "ts", "user_id", gap_s=1800)


def asof_event_orders(sf_dir: str):
    """As-of join: each event matched to the latest order date of the
    same customer at-or-before the event time (custom operator: as-of
    join; oracle = DuckDB ASOF LEFT JOIN).  Emits the matched date (not
    an arbitrary order id) so ties on (custkey, date) stay
    deterministic."""
    from peri_ray.stages.temporal import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    return asof_join(events, orders, "user_id", "o_custkey", "ts",
                     "o_orderdate", left_cols=["event_id"],
                     out_col="asof_orderdate")


def windowed_drift_event_type(sf_dir: str):
    """Per-day PSI of the event_type histogram vs a uniform reference
    (time-resolved drift: a bad ingestion day hides inside a month-level
    histogram).  Oracle = windows × reference grid LEFT JOIN obs."""
    from peri_ray.stages.temporal import windowed_drift

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    ref = {t: 0.2 for t in ("click", "error", "purchase", "signup", "view")}
    return windowed_drift(ds, "ts", "event_type", ref, window_s=86400,
                          threshold=0.25)


def range_count_event_orders(sf_dir: str):
    """Range join: per event, how many orders the same customer placed
    in the 7 days up to the event (inclusive).  Oracle = inequality
    LEFT JOIN + GROUP BY."""
    from peri_ray.stages.temporal import range_join_count

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    return range_join_count(events, orders, "user_id", "o_custkey",
                            "ts", "o_orderdate",
                            lo_offset_s=-7 * 86400, hi_offset_s=0,
                            left_cols=["event_id"], out_col="n_orders_7d")


def near_dedup_victims(sf_dir: str):
    """Fuzzy-dedup decision: MinHash-LSH candidates → Jaccard verify →
    connected components → drop everything but the min-id keeper per
    near-dup cluster.  Rows-only (transitive closure over LSH-derived
    pairs has no SQL twin against the raw tables)."""
    from peri_ray.stages.dedup import near_dedup_victims as ndv

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    victims = ndv(ds, threshold=0.8, bands=8, num_perm=64)
    return _collect(victims, pa.schema([("doc_id", pa.int64())]))


def near_dedup_victims_distributed(sf_dir: str):
    """Same fuzzy-dedup decision with ``driver_threshold=0``: forces
    the distributed min-label-propagation connected components (the
    >2M-edge scale path) instead of driver union-find, so the driver
    gate exercises BOTH hybrids.  Oracle: identical recursive-CTE
    closure — the two paths must agree exactly."""
    from peri_ray.stages.dedup import near_dedup_victims as ndv

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    victims = ndv(ds, threshold=0.8, bands=8, num_perm=64,
                  driver_threshold=0)
    return _collect(victims, pa.schema([("doc_id", pa.int64())]))


def dup_cluster_size_histogram(sf_dir: str):
    """Near-dup cluster-size distribution — the curation-policy metric
    (how much of the corpus sits in 2-doc twins vs mass-duplication
    families): MinHash-LSH candidates → exact Jaccard verify →
    connected components → (cluster_size, n_clusters).  Size ≥ 2 only
    (singletons never enter the pair graph).  Oracle: the victims
    query's recursive closure, labeled by min reachable id and grouped
    by component size."""
    from peri_ray.stages.dedup import (connected_components,
                                       minhash_lsh_candidates,
                                       verify_candidates)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_lsh_candidates(ds, bands=8, num_perm=64, dedupe=False)
    verified = verify_candidates(ds, cands, threshold=0.8)
    labels = connected_components(verified)
    t = _collect(labels, pa.schema([("doc_id", pa.int64()),
                                    ("label", pa.int64())]))
    sizes = (t.group_by("label").aggregate([("doc_id", "count")])
             .rename_columns(["label", "cluster_size"]))
    hist = (sizes.group_by("cluster_size").aggregate([("label", "count")])
            .rename_columns(["cluster_size", "n_clusters"]))
    return pa.table({
        "cluster_size": hist.column("cluster_size").cast(pa.int64()),
        "n_clusters": hist.column("n_clusters").cast(pa.int64()),
    })


def ann_topk(sf_dir: str):
    from peri_ray.stages.similarity import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_rows = ds.take(3)
    queries = np.stack([np.asarray(r["embedding"], np.float32) for r in q_rows])
    results = brute_force_topk(ds, queries, k=10)
    qi, vid, rank = [], [], []
    for i, res in enumerate(results):
        for j, (v, s) in enumerate(res):
            qi.append(q_rows[i]["vec_id"])
            vid.append(v)
            rank.append(j)
    return pa.table({"query_id": pa.array(qi, pa.int64()),
                     "neighbor_id": pa.array(vid, pa.int64()),
                     "rank": pa.array(rank, pa.int32())})


def ann_topk_exact(sf_dir: str):
    """Brute-force cosine top-10 for the 3 lowest vec_ids, computed in
    float64 so the DuckDB ``list_cosine_similarity`` oracle agrees on
    the neighbor sets (scores themselves never cross the compare)."""
    from peri_ray.stages.similarity import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # the 3 LOWEST vec_ids, matching the oracle's ORDER BY vec_id LIMIT 3
    # (take(3) reads whatever block lands first — block order is not
    # guaranteed at high parallelism)
    q_rows = ds.sort("vec_id").take(3)
    queries = np.stack([np.asarray(r["embedding"], np.float64) for r in q_rows])
    results = brute_force_topk(ds, queries, k=10, dtype=np.float64)
    qi, vid = [], []
    for i, res in enumerate(results):
        for v, _s in res:
            qi.append(q_rows[i]["vec_id"])
            vid.append(v)
    return pa.table({"query_id": pa.array(qi, pa.int64()),
                     "neighbor_id": pa.array(vid, pa.int64())})


def embedding_near_dup_pairs(sf_dir: str):
    """Cosine >= 0.95 near-dup pairs.  Ids only: the engine scores in
    float32, the oracle in float64 — hash-comparing the cosine itself
    would be a latent always-fail the moment the table gains a real
    pair (low-bit double difference), while the pair SET is decisive
    at any threshold not within float32 error of a pair's cosine."""
    from peri_ray.stages.similarity import embedding_near_dups

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    t = _collect(
        embedding_near_dups(ds, threshold=0.95),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("max(cosine)", pa.float64())]),
    )
    return t.drop_columns(["max(cosine)"])


def column_sketches_lineitem(sf_dir: str):
    """Column-sketch audit (the single-pass profile's approximate
    fields, oracle-checked): exact count rides along; ``ndv_ok``
    asserts the HLL estimate within ±5% of the exact NDV (computed
    via the one-exchange distinct-pair path for the audit) and
    ``q50_ok``/``q90_ok`` assert the KLL estimates' rank windows
    within ±0.15·n (the k=200 bound is ~0.117 w.h.p.) via a second
    counting pass.  Twin: exact per-column counts + TRUE."""
    cols = ["l_quantity", "l_extendedprice"]

    from peri_ray.stages.stats import grouped_distinct_count

    def _tag(t: pa.Table) -> pa.Table:
        parts = []
        for ci, c in enumerate(cols):
            v = (t.column(c).combine_chunks().cast(pa.float64())
                 .drop_null())
            parts.append(pa.table({
                "cid": pa.array(np.full(len(v), ci, np.int64)),
                "v": v}))
        return pa.concat_tables(parts)

    def _run_stats():
        return column_stats(_read(sf_dir, "lineitem", cols), cols)

    def _run_ndv():
        return {str(r["cid"]): r["ndv"] for r in _rows(
            grouped_distinct_count(
                _read(sf_dir, "lineitem", cols).map_batches(
                    _tag, batch_format="pyarrow"), "cid", "v"))}

    # the sketch pass and the exact-NDV audit exchange are independent
    # pipelines — overlap them (the expectation-suite pattern); only
    # the rank audit needs the KLL estimates, so it runs after
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        stats_f = pool.submit(_run_stats)
        ndv_f = pool.submit(_run_ndv)
        stats, ndv_exact = stats_f.result(), ndv_f.result()

    ests = {c: (stats[c]["quantiles"]["0.5"], stats[c]["quantiles"]["0.9"])
            for c in cols}

    def _ranks(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            v = (t.column(c).combine_chunks().cast(pa.float64())
                 .drop_null().to_numpy(zero_copy_only=False))
            e50, e90 = ests[c]
            rows.append((c, int((v < e50).sum()), int((v <= e50).sum()),
                         int((v < e90).sum()), int((v <= e90).sum()),
                         len(v)))
        return pa.table({
            "column": pa.array([r[0] for r in rows], pa.string()),
            "lo50": pa.array([r[1] for r in rows], pa.int64()),
            "hi50": pa.array([r[2] for r in rows], pa.int64()),
            "lo90": pa.array([r[3] for r in rows], pa.int64()),
            "hi90": pa.array([r[4] for r in rows], pa.int64()),
            "n": pa.array([r[5] for r in rows], pa.int64())})

    from collections import defaultdict
    merged: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in _read(sf_dir, "lineitem", cols).map_batches(
            _ranks, batch_format="pyarrow").take_all():
        a = merged[r["column"]]
        for i, f in enumerate(("lo50", "hi50", "lo90", "hi90", "n")):
            a[i] += r[f]

    eps = 0.15

    def _qok(lo, hi, n, q):
        return hi >= (q - eps) * n and lo < (q + eps) * n

    out = []
    for ci, c in enumerate(cols):
        nd_exact = ndv_exact.get(str(ci), 0)
        nd_est = stats[c].get("ndv", 0.0)
        lo50, hi50, lo90, hi90, n = merged[c]
        out.append({
            "column": c, "cnt": stats[c]["count"],
            "ndv_exact": nd_exact,
            "ndv_ok": abs(nd_est - nd_exact) <= max(2.0, 0.05 * nd_exact),
            "q50_ok": _qok(lo50, hi50, n, 0.5),
            "q90_ok": _qok(lo90, hi90, n, 0.9)})
    return pa.table({
        "column": pa.array([r["column"] for r in out], pa.string()),
        "cnt": pa.array([r["cnt"] for r in out], pa.int64()),
        "ndv_exact": pa.array([r["ndv_exact"] for r in out], pa.int64()),
        "ndv_ok": pa.array([r["ndv_ok"] for r in out], pa.bool_()),
        "q50_ok": pa.array([r["q50_ok"] for r in out], pa.bool_()),
        "q90_ok": pa.array([r["q90_ok"] for r in out], pa.bool_()),
    })


def flagship_documents(sf_dir: str):
    """Flagship verdict over the documents table (webtext stand-in)."""
    import pandas as pd

    from peri_ray.pipelines.flagship import run_flagship

    ds = _read(sf_dir, "documents")
    verdict = run_flagship(
        ds,
        spec=DOCS_SPEC,
        id_column="doc_id",
        lang_reference={"en": 0.45, "de": 0.14, "fr": 0.14, "es": 0.14, "zh": 0.13},
        drift_threshold=0.25,
    )
    return pd.DataFrame(
        [{
            "rows": verdict["rows"],
            "valid_rows": verdict["valid_rows"],
            "invalid_rows": verdict["invalid_rows"],
            "passed": verdict["passed"],
            "n_checks": len(verdict["checks"]),
        }]
    )


def multimodal_decode(sf_dir: str):
    """Multimodal plumbing over documents' text bytes as fake payloads."""
    from peri_ray.stages.multimodal import decode_images, media_table_from_binary

    import ray.data as rd

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).take(64)
    table = media_table_from_binary(
        [r["doc_id"] for r in docs], [r["text"].encode() for r in docs]
    )
    ds = rd.from_arrow(table)
    out = decode_images(ds, decoder="fake", concurrency=2, batch_size=16)
    return out.select_columns(["media_id", "width", "height"])


# ---------------------------------------------------------------------------
# extended FK / constraint battery (round-1 widening)
# ---------------------------------------------------------------------------


def referential_lineitem_orders(sf_dir: str):
    """FK lineitem.l_orderkey → orders.o_orderkey.  Broadcast dim here
    (orders keys fit one object); at 100 TB switch the same call to the
    hash-partitioned groupby path (concurrency=None → task pool reuses
    the broadcast ref, never re-ships per batch)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    bad = referential_violations(li, "l_orderkey", orders, columns=["l_linenumber"])
    return _collect(bad.select_columns(["l_orderkey", "l_linenumber"]),
                    pa.schema([("l_orderkey", pa.int64()), ("l_linenumber", pa.int32())]))


def nation_region_fk(sf_dir: str):
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey"])
    bad = referential_violations(nation, "n_regionkey", region, columns=["n_nationkey"])
    return _collect(bad.select_columns(["n_nationkey", "n_regionkey"]),
                    pa.schema([("n_nationkey", pa.int32()), ("n_regionkey", pa.int32())]))


def customer_name_regex_violations(sf_dir: str):
    """{:string, {:regex, r}} kernel over a real table
    (pc.match_substring_regex, SURVEY §2.3)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    spec = {"c_custkey": ("required", "integer"),
            "c_name": ("string", ("regex", "^Customer#[0-9]{9}$"))}
    combined = validate_dataset(ds, spec, id_column="c_custkey")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["c_custkey", "c_name"])

    bad = combined.map_batches(_f, batch_format="pyarrow")
    return _collect(bad, pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]))


def part_size_conformity(sf_dir: str):
    """Integer range kernel → one-row conformity summary."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size"])
    spec = {"p_partkey": ("required", "integer"),
            "p_size": ("integer", ("range", (1, 50)))}
    combined = validate_dataset(ds, spec, id_column="p_partkey")

    def _counts(t: pa.Table) -> pa.Table:
        ok = pc.sum(t.column("valid")).as_py() or 0
        return pa.table({"ok": pa.array([ok], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = combined.map_batches(_counts, batch_format="pyarrow")
    n_ok, n = int(parts.sum("ok") or 0), int(parts.sum("n") or 0)
    return pa.table({"n_valid": pa.array([n_ok], pa.int64()),
                     "n_invalid": pa.array([n - n_ok], pa.int64())})


def orders_status_enum_histogram(sf_dir: str):
    """Enum check + histogram in one pass: counts per o_orderstatus
    restricted to the legal set (combined kernel + groupby-count)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    spec = {"o_orderkey": ("required", "integer"),
            "o_orderstatus": ("enum", ["O", "F", "P"])}
    combined = validate_dataset(ds, spec, id_column="o_orderkey")

    def _partial(t: pa.Table) -> pa.Table:
        # null status passes the enum kernel (nil-passes clause order)
        # but the histogram counts only actual statuses — match the
        # oracle's IN-filter semantics explicitly
        t = t.filter(pc.and_(t.column("valid"),
                             pc.is_valid(t.column("o_orderstatus"))))
        g = t.select(["o_orderstatus"]).group_by("o_orderstatus").aggregate(
            [("o_orderstatus", "count")]
        )
        return g.rename_columns(["o_orderstatus", "cnt"])

    part = combined.map_batches(_partial, batch_format="pyarrow")
    tot = part.groupby("o_orderstatus").sum("cnt")
    return tot.map_batches(lambda t: t.rename_columns(["o_orderstatus", "cnt"]),
                           batch_format="pyarrow")


def seeded_sample_documents(sf_dir: str):
    """Seeded conformance sampling (SURVEY §2.7: ds.random_sample).
    Rows-only: the oracle cannot reproduce Ray's sampler; the driver
    checks shape/rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return ds.random_sample(0.05, seed=1234)


# ---------------------------------------------------------------------------
# temporal / either / list-constraint kernels with oracles
# ---------------------------------------------------------------------------


def orders_key_multiple_of(sf_dir: str):
    """{:multiple_of, n} kernel (lib/peri.ex:961-968,1432-1438) over a
    real int column: order keys not divisible by 5."""
    ds = _read(sf_dir, "orders", ["o_orderkey"])
    spec = {"o_orderkey": ("integer", ("multiple_of", 5))}
    combined = validate_dataset(ds, spec, id_column=None)

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["o_orderkey"])

    return combined.map_batches(_f, batch_format="pyarrow")


def orders_date_violations(sf_dir: str):
    """[NORTH] temporal comparison constraint (Peri only type-checks
    temporal values, lib/peri.ex:788-792): orders before the 1995-07-01
    watermark."""
    import datetime

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    spec = {"o_orderdate": ("datetime", ("gte", datetime.datetime(1995, 7, 1)))}
    combined = validate_dataset(ds, spec, mode="permissive", id_column=None)

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["o_orderkey"])

    return combined.map_batches(_f, batch_format="pyarrow")


def supplier_acctbal_violations(sf_dir: str):
    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    spec = {"s_acctbal": ("float", ("gte", 0.0))}
    combined = validate_dataset(ds, spec, mode="permissive", id_column=None)

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["s_suppkey", "s_acctbal"])

    bad = combined.map_batches(_f, batch_format="pyarrow")
    return _collect(bad, pa.schema([("s_suppkey", pa.int64()), ("s_acctbal", pa.float64())]))


def supplier_nation_fk(sf_dir: str):
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey"])
    bad = referential_violations(supp, "s_nationkey", nation, columns=["s_suppkey"])
    return _collect(bad.select_columns(["s_suppkey", "s_nationkey"]),
                    pa.schema([("s_suppkey", pa.int64()), ("s_nationkey", pa.int32())]))


def events_value_either_bounds(sf_dir: str):
    """{:either, {a, b}} first-match (lib/peri.ex:1124-1136): value must
    be <= 10 OR >= 90; rows in the open middle violate both branches."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    spec = {"value": ("either", (("float", ("lte", 10.0)), ("float", ("gte", 90.0))))}
    combined = validate_dataset(ds, spec, mode="permissive", id_column="event_id")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["event_id", "value"])

    return combined.map_batches(_f, batch_format="pyarrow")


def embedding_len_conformity(sf_dir: str):
    """{:list, t, opts} min/max length kernels (lib/peri.ex:1218-1225)
    → one-row conformity summary over the embeddings table."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    spec = {"embedding": ("list", "float", {"min": 64, "max": 64})}
    combined = validate_dataset(ds, spec, mode="permissive", id_column="vec_id")

    def _counts(t: pa.Table) -> pa.Table:
        ok = pc.sum(t.column("valid")).as_py() or 0
        return pa.table({"ok": pa.array([ok], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = combined.map_batches(_counts, batch_format="pyarrow")
    n_ok, n = int(parts.sum("ok") or 0), int(parts.sum("n") or 0)
    return pa.table({"n_valid": pa.array([n_ok], pa.int64()),
                     "n_invalid": pa.array([n - n_ok], pa.int64())})


def doc_text_min_violations(sf_dir: str):
    """{:string, {:min, n}} codepoint-length kernel (lib/peri.ex:879-893)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    spec = {"text": ("string", ("min", 100))}
    combined = validate_dataset(ds, spec, mode="permissive", id_column="doc_id")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["doc_id"])

    return combined.map_batches(_f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# remaining training-data operators (rows-only)
# ---------------------------------------------------------------------------


def lsh_ann_topk(sf_dir: str):
    """LSH-bucketed approximate top-k — the scale path for ANN (only
    bucket-matching vectors are scored; brute-force is the baseline)."""
    from peri_ray.stages.similarity import lsh_bucketed_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_rows = ds.take(3)
    queries = np.stack([np.asarray(r["embedding"], np.float32) for r in q_rows])
    results = lsh_bucketed_topk(ds, queries, k=10, n_planes=6)
    qi, vid, rank = [], [], []
    for i, res in enumerate(results):
        for j, (v, s) in enumerate(res):
            qi.append(q_rows[i]["vec_id"])
            vid.append(v)
            rank.append(j)
    return pa.table({"query_id": pa.array(qi, pa.int64()),
                     "neighbor_id": pa.array(vid, pa.int64()),
                     "rank": pa.array(rank, pa.int32())})


def simhash_near_dup_pairs(sf_dir: str):
    from peri_ray.stages.dedup import simhash_near_dups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = simhash_near_dups(ds, bands=4)
    return _collect(pairs, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]))


def doc_fingerprints(sf_dir: str):
    """64-bit content-fingerprint audit (the exact-dedup key),
    oracle-checked: one tagged distinct-pair exchange counts the
    distinct fingerprints (seed 1 — the production key) AND the
    distinct values of an independent-seed 64-bit hash; ``ndv_text``
    (the independent hash's count) must equal the twin's exact
    count(DISTINCT text), and ``fp_ok`` asserts the fingerprint
    column agrees — a collision or broken hash on either side flips
    the boolean or diverges the count.  Per-doc fingerprint VALUES
    stay engine-side (no SQL twin); their exactness is unit-pinned."""
    from peri_ray.stages.stats import grouped_distinct_count
    from peri_ray.state.sketches import hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _tag(t: pa.Table) -> pa.Table:
        nn = t.column("text").combine_chunks().drop_null()
        fp = hash_strings(nn, seed=1).astype(np.int64)
        ch = hash_strings(nn, seed=9).astype(np.int64)
        n = len(nn)
        return pa.table({
            "cid": pa.array(np.concatenate([np.zeros(n, np.int64),
                                            np.ones(n, np.int64)])),
            "v": pa.array(np.concatenate([fp, ch]))})

    ndv_rows = _rows(grouped_distinct_count(
        ds.map_batches(_tag, batch_format="pyarrow"), "cid", "v"))
    # the distinct-pair exchange string-casts its key column
    ndv = {str(r["cid"]): r["ndv"] for r in ndv_rows}
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "ndv_text": pa.array([ndv.get("1", 0)], pa.int64()),
        "fp_ok": pa.array([ndv.get("0", 0) == ndv.get("1", 0)],
                          pa.bool_())})


def bpe_token_counts(sf_dir: str):
    from peri_ray.stages.text import bpe_ish_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: bpe_ish_count_batch(t).select(["doc_id", "n_bpe_tokens"]),
        batch_format="pyarrow",
    )


def frame_samples(sf_dir: str):
    """Video frame-sampling plumbing (multimodal stub, real Ray wiring)."""
    from peri_ray.stages.multimodal import media_table_from_binary, sample_frames

    import ray.data as rd

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).take(32)
    table = media_table_from_binary(
        [r["doc_id"] for r in docs], [r["text"].encode() for r in docs],
        kind="video",
    )
    ds = rd.from_arrow(table)
    return sample_frames(ds, every_ms=500)


def drift_lang_documents(sf_dir: str):
    """Drift verdict (PSI) of the lang histogram vs the generator's
    reference distribution — pass/fail + score as a one-row table."""
    ds = _read(sf_dir, "documents", ["lang"])
    ref = {"en": 0.45, "de": 0.14, "fr": 0.14, "es": 0.14, "pt": 0.13}
    v = drift_check(ds, "lang", ref, threshold=0.25)
    return pa.table({"rule_id": pa.array([v["rule_id"]], pa.string()),
                     "passed": pa.array([v["passed"]], pa.bool_()),
                     "score": pa.array([round(v["score"], 6)], pa.float64())})


def winnow_shared_passages(sf_dir: str):
    """Winnowing fingerprints → doc pairs sharing copied passages
    (rolling k-gram hash + window minima; SIGMOD'03 winnowing)."""
    from peri_ray.stages.text import shared_passage_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # k spans ~5 words: with the synthetic tables' small vocabulary,
    # shorter grams collide across every doc; ≥24-char grams isolate
    # genuinely copied passages (24 stable pairs at sf0.01)
    pairs = shared_passage_pairs(ds, k=32, window=32, min_shared=2)
    return _collect(pairs, pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]))


def ivf_ann_topk(sf_dir: str):
    """IVF-Flat approximate top-k over embeddings (coarse quantizer
    trained on a sample, nprobe cells scanned)."""
    from peri_ray.stages.similarity import ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_rows = ds.take(3)
    queries = np.stack([np.asarray(r["embedding"], np.float32) for r in q_rows])
    results = ivf_topk(ds, queries, k=10, n_cells=8, nprobe=3)
    qi, vid, rank = [], [], []
    for i, res in enumerate(results):
        for j, (v, s) in enumerate(res):
            qi.append(q_rows[i]["vec_id"])
            vid.append(v)
            rank.append(j)
    return pa.table({"query_id": pa.array(qi, pa.int64()),
                     "neighbor_id": pa.array(vid, pa.int64()),
                     "rank": pa.array(rank, pa.int32())})


def referential_orders_customer_shuffled(sf_dir: str):
    """Hash-partitioned FK anti-join — the large-dim scale path (dim too
    big to broadcast; both sides bucket on the key hash).  Same oracle as
    the broadcast variant."""
    from peri_ray.stages.checks import referential_violations_shuffled

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    bad = referential_violations_shuffled(orders, "o_custkey", cust,
                                          columns=["o_orderkey"])
    return _collect(bad.select_columns(["o_orderkey"]),
                    pa.schema([("o_orderkey", pa.int64())]))


def props_k_range_violations(sf_dir: str):
    """Semi-structured path: JSON-string props → struct → nested-schema
    kernels ({:map} dynamic payloads in the reference; SURVEY §1.1).
    Violations where props.k falls outside [0, 50]."""
    from peri_ray.sources import parse_json_column

    ds = _read(sf_dir, "events", ["event_id", "props"])
    parsed = parse_json_column(ds, "props")
    spec = {"props_parsed": {"k": ("required", ("integer", ("range", (0, 50))))}}
    combined = validate_dataset(parsed, spec, mode="permissive", id_column="event_id")

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("valid"))).select(["event_id"])

    return combined.map_batches(_f, batch_format="pyarrow")


def multimodal_resize(sf_dir: str):
    """Decode → aspect-preserving resize plumbing (metadata math real,
    pixel resample is the PIL seam)."""
    from peri_ray.stages.multimodal import (
        decode_images,
        media_table_from_binary,
        resize_images,
    )

    import ray.data as rd

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).take(64)
    table = media_table_from_binary(
        [r["doc_id"] for r in docs], [r["text"].encode() for r in docs]
    )
    decoded = decode_images(rd.from_arrow(table), decoder="fake",
                            concurrency=2, batch_size=16)
    out = resize_images(decoded, max_side=128, concurrency=2)
    return out.select_columns(["media_id", "resized_w", "resized_h"])


def audio_features(sf_dir: str):
    from peri_ray.stages.multimodal import (
        extract_audio_features,
        media_table_from_binary,
    )

    import ray.data as rd

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).take(64)
    table = media_table_from_binary(
        [r["doc_id"] for r in docs], [r["text"].encode() for r in docs],
        kind="audio",
    )
    out = extract_audio_features(rd.from_arrow(table), n_frames=8, concurrency=2)
    return out.select_columns(["media_id", "audio_ms"])


def quantized_embedding_norms(sf_dir: str):
    """int8 quantize → dequantize → L2 norm per vector (compression
    path for 100 TB embedding storage; error bounded by max_abs/254).

    Computed in float64 end-to-end and emitted as integer milli-units
    so the DuckDB oracle (same double-precision arithmetic) hashes
    identically — floats that underwent arithmetic never cross the
    compare raw."""
    from peri_ray.stages.similarity import quantize_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = quantize_embeddings(ds, dtype=np.float64)

    def _norms(t: pa.Table) -> pa.Table:
        from peri_ray.stages.similarity import dequantize_matrix

        m = dequantize_matrix(t, dtype=np.float64)
        milli = np.rint(np.linalg.norm(m, axis=1) * 1000.0).astype(np.int64)
        return pa.table({"vec_id": t.column("vec_id"),
                         "l2_milli": pa.array(milli)})

    return q.map_batches(_norms, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# general joins (broadcast enrichment + hash-partitioned large×large)
# ---------------------------------------------------------------------------


def enrich_orders_customer(sf_dir: str):
    """Broadcast inner enrichment join: attach customer name + segment
    to every order.  The dim (customer) is ray.put once and resolved
    per task; the fact side streams with zero shuffle."""
    from peri_ray.stages.joins import broadcast_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    out = broadcast_join(orders, customer, "o_custkey", "c_custkey",
                         ["c_custkey", "c_name", "c_mktsegment"], how="inner")
    return out.select_columns(["o_orderkey", "c_name", "c_mktsegment"])


def enrich_events_customer(sf_dir: str):
    """Broadcast LEFT enrichment join: events keep their row when the
    user has no customer record (typed-null segment)."""
    from peri_ray.stages.joins import broadcast_join

    events = _read(sf_dir, "events", ["event_id", "user_id"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    out = broadcast_join(events, customer, "user_id", "c_custkey",
                         ["c_custkey", "c_mktsegment"], how="left")
    return out.select_columns(["event_id", "c_mktsegment"])


def join_lineitem_orders(sf_dir: str):
    """Hash-partitioned inner join, large×large: both sides bucket on
    the order key, vectorized Arrow join per bucket; only the projected
    columns cross the exchange."""
    from peri_ray.stages.joins import hash_join

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    return hash_join(lineitem, orders, "l_orderkey", "o_orderkey",
                     ["l_linenumber"], ["o_orderstatus"], how="inner")


def customers_with_orders(sf_dir: str):
    """Hash-partitioned SEMI join: customers having at least one order
    (EXISTS), keys only across the exchange."""
    from peri_ray.stages.joins import hash_join

    customer = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return hash_join(customer, orders, "c_custkey", "o_custkey",
                     [], [], how="semi")


# ---------------------------------------------------------------------------
# vector groupby aggregate + sliding windows + stratified sampling
# ---------------------------------------------------------------------------


def embedding_centroids_by_label(sf_dir: str):
    """Distributed GROUP BY over a vector column: per-label embedding
    centroid (class prototype / IVF seed / per-domain drift monitor).
    Per-batch (labels × dim) float64 partial sums via np.add.at, driver
    merge bounded by blocks × labels — the vectors never shuffle.
    Malformed vectors (wrong dim / element nulls / null label) are
    skipped and counted, mirrored by the oracle's WHERE."""
    from peri_ray.stages.similarity import grouped_centroids

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    t = grouped_centroids(ds, dim=64)
    labels = t.column("label").to_numpy(zero_copy_only=False)
    cent = np.asarray(
        [row for row in t.column("centroid").to_pylist()], np.float64)
    n, d = cent.shape if len(labels) else (0, 64)
    return pa.table({
        "label": pa.array(np.repeat(labels, d), pa.int64()),
        "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
        "c": pa.array(np.round(cent.reshape(-1), 6), pa.float64()),
    })


def sliding_event_counts(sf_dir: str):
    """Sliding-window aggregate: 2-hour windows every hour; each event
    counts toward both covering windows (overlap handled inside the
    block, partials collapse before the one small shuffle)."""
    from peri_ray.stages.temporal import sliding_window_counts

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    return sliding_window_counts(ds, "ts", "event_type",
                                 window_s=7200, slide_s=3600)


def stratified_sample_counts(sf_dir: str):
    """Deterministic k-per-stratum sampling (seeded hash order + group
    top-k): the oracle checks the exact per-stratum guarantee
    min(count, k) — reproducible across cluster sizes, unlike
    random_sample."""
    from peri_ray.stages.stats import stratified_sample

    def _nonnull(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("lang")))

    ds = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        _nonnull, batch_format="pyarrow")
    sampled = stratified_sample(ds, key="lang", k=20, id_col="doc_id")
    counts = _collect(sampled, pa.schema([("doc_id", pa.int64()),
                                          ("lang", pa.string())]))
    g = (counts.group_by("lang").aggregate([("doc_id", "count")])
         .rename_columns(["lang", "n_sampled"]))
    return g.set_column(1, "n_sampled", g.column("n_sampled").cast(pa.int64()))


def term_doc_frequency(sf_dir: str):
    """Corpus-wide document frequency per whitespace token (stopword /
    boilerplate discovery, IDF weighting).  Two-phase: per-block
    distinct-term partials, one (term, df) groupby-sum — the text never
    crosses the exchange.  Tokenizer matches token_counts' SQL twin
    (trim + \\s+ split)."""
    from peri_ray.stages.text import term_document_frequency

    ds = _read(sf_dir, "documents", ["text"])
    return term_document_frequency(ds)


def knn_pagerank_embeddings(sf_dir: str):
    """Graph centrality for data selection: 5 synchronous PageRank
    iterations over the exact kNN (k=5) cosine graph of the embedding
    table.  Rows-only (iterative float sums have no order-stable SQL
    twin — same class as kmeans_clusters); unit tests pin the values
    against an independent numpy power iteration."""
    from peri_ray.stages.similarity import knn_graph, pagerank

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    edges = knn_graph(ds, k=5).map_batches(
        lambda t: pa.table({"src": t.column("query_id"),
                            "dst": t.column("neighbor_id")}),
        batch_format="pyarrow")
    pr = pagerank(edges, damping=0.85, iters=5)
    return pr.map_batches(
        lambda t: pa.table({"vec_id": t.column("node"),
                            "pr": t.column("pr")}),
        batch_format="pyarrow")


def chunked_documents(sf_dir: str):
    """Overlapping token-window chunking (RAG / training-prep): 32-token
    windows, stride 24.  Pure per-batch map, zero shuffles; the SQL twin
    slices the same token arrays."""
    from peri_ray.stages.text import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, window=32, stride=24)


def leakage_free_split(sf_dir: str):
    """Contamination-safe train/val/test split: near-duplicate docs
    (exact Jaccard ≥ 0.8 on char-5-shingles via MinHash-LSH candidates
    + verification + connected components) are forced into the SAME
    split by hashing the cluster REPRESENTATIVE (min id; standalone
    docs hash their own id) with the Knuth split hash
    `hash_split_documents` uses.  One int-only exchange attaches the
    cluster labels back to the doc stream.  SQL twin reuses the
    near-dup reach CTE (quadratic — sf ≤ 0.01 in the harness)."""
    from peri_ray.stages.dedup import (connected_components,
                                       map_groups_via_buckets,
                                       minhash_lsh_candidates,
                                       verify_candidates)
    from peri_ray.stages.stats import _HWS_MOD, _HWS_MULT, _HWS_PRIME

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_lsh_candidates(ds, dedupe=False)
    verified = verify_candidates(ds, cands, threshold=0.8, k=5)
    labels = connected_components(verified)

    docs = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "lab": pa.nulls(t.num_rows, pa.int64())}),
        batch_format="pyarrow")
    lab = labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "lab": t.column("label").combine_chunks()
                            .cast(pa.int64())}),
        batch_format="pyarrow")

    def _split(g: pa.Table) -> pa.Table:
        lt = (g.filter(pc.is_valid(g.column("lab")))
              .select(["doc_id", "lab"]))
        dt = g.filter(pc.is_null(g.column("lab"))).select(["doc_id"])
        j = dt.join(lt, keys="doc_id", join_type="left outer")
        ids = j.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        labv = j.column("lab").combine_chunks()
        rep = np.where(pc.is_valid(labv).to_numpy(zero_copy_only=False),
                       labv.fill_null(0).to_numpy(zero_copy_only=False),
                       ids).astype(np.int64)
        hb = (rep % _HWS_PRIME) * _HWS_MULT % _HWS_MOD % 100
        split = np.where(hb < 80, "train", np.where(hb < 90, "val", "test"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(split.tolist(), pa.string())})

    return map_groups_via_buckets(docs.union(lab), ["doc_id"], _split)


def embedding_outliers(sf_dir: str):
    """Embedding-space data-quality gate: distance of every vector to
    its OWN label centroid (rounded-6 centroids, the same values the
    centroid oracle publishes), outliers = vectors above the exact
    p95 of the rounded distance multiset.  Composition: centroid
    partials (no shuffle) → broadcast → per-batch distances → exact
    percentile_disc → broadcast threshold filter.  The exact-quantile
    driver map is O(distinct rounded distances) — the oracle-able
    gate; at corpus scale swap in the KLL sketch threshold."""
    import ray

    from peri_ray.stages.similarity import _as_matrix, grouped_centroids
    from peri_ray.stages.stats import exact_quantiles

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    cent_t = grouped_centroids(ds, dim=64)
    cent_t = cent_t.filter(pc.is_valid(cent_t.column("label")))
    # ROUND parity: SQL ROUND is half-away — pc.round half_towards_
    # infinity, never np.round (half-even), for hash-compared values
    cents = {int(l): pc.round(pa.array(np.asarray(c, np.float64)),
                              ndigits=6,
                              round_mode="half_towards_infinity")
             .to_numpy(zero_copy_only=False)
             for l, c in zip(cent_t.column("label").to_pylist(),
                             cent_t.column("centroid").to_pylist())}
    cref = ray.put(cents)

    class _Dist:
        def __init__(self, cref):
            self.cents = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            lab = t.column("label").combine_chunks()
            emb = t.column("embedding").combine_chunks()
            ok = pc.and_(pc.is_valid(lab),
                         pc.equal(pc.list_value_length(emb), 64))
            t2 = t.filter(ok)
            emb2 = t2.column("embedding").combine_chunks()
            flat = pc.list_flatten(emb2)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            if flat.null_count:
                good = np.ones(t2.num_rows, bool)
                nl = pc.is_null(flat).to_numpy(zero_copy_only=False)
                good &= np.add.reduceat(
                    nl, np.arange(0, t2.num_rows * 64, 64)) == 0
                t2 = t2.filter(pa.array(good))
            if t2.num_rows == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.float64())})
            m = _as_matrix(t2.column("embedding"), np.float64)
            labs = (t2.column("label").combine_chunks().cast(pa.int64())
                    .to_numpy(zero_copy_only=False))
            c = np.stack([self.cents[int(x)] for x in labs])
            d = pc.round(pa.array(np.sqrt(((m - c) ** 2).sum(axis=1))),
                         ndigits=6, round_mode="half_towards_infinity")
            return pa.table({
                "vec_id": t2.column("vec_id").combine_chunks().cast(pa.int64()),
                "label": pa.array(labs, pa.int64()),
                "d": d})

    # (vec_id, label, d) is 3 narrow columns × n vectors — materialize
    # once for the two consumers (quantile pass + threshold filter)
    # instead of recomputing every distance (CLAUDE.md multi-consumer
    # pitfall)
    from peri_ray.stages.similarity import _pool_cpus

    dists = ds.map_batches(_Dist, fn_constructor_args=(cref,),
                           batch_format="pyarrow",
                           concurrency=(1, _pool_cpus())).materialize()

    q = exact_quantiles(dists, ["d"], qs=(0.95,))
    thr = float(q.column("value")[0].as_py())

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("d"), thr))

    return dists.map_batches(_f, batch_format="pyarrow")


def rag_chunk_retrieval(sf_dir: str):
    """Composed RAG ingestion + query: chunk every doc into 32-token
    windows (stride 24), then BM25-rank the CHUNKS for a fixed query
    and return the top 15 as (doc_id, chunk_idx, score, rank).  Chunk
    ids pack as doc_id * 128 + chunk_idx (chunk_idx < 128 holds for
    any doc under 128·24+32 tokens; the packing is asserted).  The SQL
    twin chains the chunk CTE into the BM25 expression verbatim."""
    from peri_ray.stages.text import bm25_topk, chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = chunk_documents(ds, window=32, stride=24)

    def _pack(t: pa.Table) -> pa.Table:
        ci = t.column("chunk_idx").combine_chunks().to_numpy(
            zero_copy_only=False)
        if len(ci) and ci.max() >= 128:
            raise ValueError("rag_chunk_retrieval: chunk_idx >= 128 "
                             "breaks the packed id; widen the multiplier")
        did = t.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(did * 128 + ci, pa.int64()),
            "text": t.column("chunk_text")})

    # bm25_topk consumes its input twice (stats + score pass); pin the
    # chunk table so the chunking map runs once.  At corpus scale a
    # real pipeline writes the chunks to parquet first and ranks that
    # table — the materialize is the single-job equivalent.
    packed = chunks.map_batches(_pack, batch_format="pyarrow").materialize()
    top = bm25_topk(packed, ["spark", "window", "merge"], k=15)
    cid = top.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(cid // 128, pa.int64()),
        "chunk_idx": pa.array(cid % 128, pa.int64()),
        "score": top.column("score"),
        "rank": top.column("rank"),
    })


def knn_label_spread_embeddings(sf_dir: str):
    """Semi-supervised label spreading: seed 50% of a vector subset
    (vec_id % 20 == 0 of the % 10 == 0 subset) with their real labels,
    propagate 2 synchronous majority-vote rounds over the exact kNN
    (k=5) graph.  All-int and deterministic, so the SQL twin unrolls
    both rounds over the same kNN CTE `knn_graph_embeddings` uses."""
    from peri_ray.stages.similarity import knn_graph, label_propagation

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def _sub(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").combine_chunks()
        return t.filter(
            pa.array(ids.to_numpy(zero_copy_only=False) % 10 == 0))

    sub = ds.map_batches(_sub, batch_format="pyarrow").materialize()
    edges = knn_graph(sub, k=5).map_batches(
        lambda t: pa.table({"src": t.column("query_id"),
                            "dst": t.column("neighbor_id")}),
        batch_format="pyarrow")

    def _seeds(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").combine_chunks()
        t = t.filter(pa.array(ids.to_numpy(zero_copy_only=False) % 20 == 0))
        # a NULL seed label would crash the vote; mirror the twin's
        # label IS NOT NULL
        t = t.filter(pc.is_valid(t.column("label").combine_chunks()))
        return pa.table({
            "node": t.column("vec_id"),
            "label": t.column("label").combine_chunks().cast(pa.int64())})

    seeds = sub.map_batches(_seeds, batch_format="pyarrow")
    out = label_propagation(edges, seeds, iters=2)
    return out.map_batches(
        lambda t: pa.table({"vec_id": t.column("node"),
                            "label": t.column("label")}),
        batch_format="pyarrow")


def bm25_top_docs(sf_dir: str):
    """BM25 top-20 docs for a fixed bag-of-words query (targeted data
    selection / curation-by-query).  Two streaming passes, zero
    shuffles; the SQL twin mirrors the score expression term by term
    in a fixed order so the doubles hash-match."""
    from peri_ray.stages.text import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, ["spark", "window", "merge"], k=20)


def dup_span_removal_docs(sf_dir: str):
    """Lee et al. 2022 ExactSubstr-shaped span removal at word-5-gram
    granularity: every token covered by a 5-gram that occurs in ≥2
    distinct docs is removed from ALL docs; survivors rejoin with
    single spaces.  Two bucketed exchanges (gram-keyed span pass,
    doc-keyed rebuild) — text crosses exactly one."""
    from peri_ray.stages.dedup import remove_duplicate_ngram_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return remove_duplicate_ngram_spans(ds, n=5)


def dedup_normalized_docs(sf_dir: str):
    """CCNet-style normalize-then-dedup: a deterministic subset of docs
    (doc_id % 3 == 0) is re-rendered messily (tabs, doubled spaces,
    uppercase, trailing newline — the same roughening as
    normalized_documents), then every doc is normalized (NFC, control
    strip, ws collapse, trim, lower) and exact dedup keeps the min id
    per normalized text.  Duplicates are found ACROSS the messy/clean
    renderings — the reason real pipelines hash normalized text."""
    from peri_ray.stages.dedup import exact_dedup_keepers
    from peri_ray.stages.text import normalize_text_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text").combine_chunks()))
        txt = t.column("text").combine_chunks()
        ids = t.column("doc_id").combine_chunks()
        messy = pc.binary_join_element_wise(
            "\t ", pc.utf8_upper(pc.replace_substring(txt, " ", "  ")),
            " \n", "")
        use_messy = pa.array(
            ids.to_numpy(zero_copy_only=False) % 3 == 0)
        mixed = pc.if_else(use_messy, messy, txt)
        t2 = pa.table({"doc_id": ids, "mixed": mixed})
        return normalize_text_batch(t2, "mixed", out_col="norm",
                                    casefold=True).select(["doc_id", "norm"])

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    keepers = exact_dedup_keepers(prepped, "norm", "doc_id")

    def _sel(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("keep_id")})

    return keepers.map_batches(_sel, batch_format="pyarrow")


def dup_ngram_coverage_docs(sf_dir: str):
    """Per-doc duplicate 5-gram coverage (Lee et al. 2022 / Gopher's
    "fraction of doc duplicated elsewhere" gate signal): distinct
    (doc, gram) pairs → gram-keyed df exchange → per-doc fractions.
    Exact, so the SQL twin (unnest 5-grams, df join) is bit-identical
    including the float division."""
    from peri_ray.stages.text import duplicate_ngram_coverage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicate_ngram_coverage(ds, n=5)


def repetition_signals(sf_dir: str):
    """Gopher-style per-doc repetition gate signals: duplicate word /
    adjacent-bigram fractions.  Pure per-batch map (no shuffle at any
    scale); exact distinct counts so the SQL count(DISTINCT) twin is
    bit-exact."""
    from peri_ray.stages.text import repetition_signal_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _b(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text").combine_chunks()))
        return repetition_signal_batch(t).select(
            ["doc_id", "n_words", "dup_word_ratio", "dup_bigram_ratio"])

    return ds.map_batches(_b, batch_format="pyarrow")


def pii_scan_documents(sf_dir: str):
    """PII scan + redaction over a deterministically derived contact
    string (the synthetic corpus carries no literal PII, so the query
    plants one email / IPv4 / phone per doc from doc_id — the SQL twin
    derives the identical string, making match counts AND redacted
    output real cross-engine evidence, not a trivially-zero pass)."""
    from peri_ray.stages.pii import pii_redact_batch, pii_scan_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _b(t: pa.Table) -> pa.Table:
        id_np = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").combine_chunks().cast(pa.string())
        octet = pa.array(id_np % 256, pa.int64()).cast(pa.string())
        ext = pc.utf8_lpad(pa.array(id_np % 10000, pa.int64()).cast(pa.string()),
                           4, "0")
        contact = pc.binary_join_element_wise(
            t.column("text").combine_chunks(), " reach user", ids,
            "@example.com from 10.0.", octet, ".1 call +1 555-", ext, "")
        t2 = pa.table({"doc_id": t.column("doc_id"), "contact": contact})
        t2 = pii_scan_batch(t2, "contact")
        t2 = pii_redact_batch(t2, "contact", out_col="redacted")
        return t2.select(["doc_id", "n_email", "n_ipv4", "n_phone", "redacted"])

    return ds.map_batches(_b, batch_format="pyarrow")


def normalized_documents(sf_dir: str):
    """Normalization round-trip: deterministically roughen the text
    (tabs, doubled spaces, uppercase, trailing newline) then run the
    normalize stage; the SQL twin derives and normalizes identically,
    so every kernel in the chain (NFC, control strip, ws collapse,
    trim, lower) is cross-engine checked."""
    from peri_ray.stages.text import normalize_text_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _b(t: pa.Table) -> pa.Table:
        txt = t.column("text").combine_chunks()
        messy = pc.binary_join_element_wise(
            "\t ", pc.utf8_upper(pc.replace_substring(txt, " ", "  ")), " \n", "")
        t2 = pa.table({"doc_id": t.column("doc_id"), "messy": messy})
        t2 = normalize_text_batch(t2, "messy", out_col="normalized", casefold=True)
        return t2.select(["doc_id", "normalized"])

    return ds.map_batches(_b, batch_format="pyarrow")


def coerced_orders_strings(sf_dir: str):
    """Typed ingestion: string columns (built in-pipeline from orders,
    with deliberate corruptions) coerced back to BIGINT/DOUBLE under
    the explicit lexical grammars — unparseable cells null.  The SQL
    twin builds the same strings and applies the same regex + CAST, so
    the parse results are hash-checked cell for cell."""
    from peri_ray.sources import coerce_string_columns

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _mk(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").combine_chunks()
        c = t.column("o_custkey").combine_chunks()
        kn = k.to_numpy(zero_copy_only=False)
        n = t.num_rows
        ks = pc.binary_join_element_wise(
            pc.cast(k, pa.string()),
            pc.if_else(pa.array(kn % 13 == 0), pa.scalar("x"), pa.scalar("")),
            "")
        vs = pc.binary_join_element_wise(
            pc.if_else(pa.array(kn % 7 == 0), pa.scalar("v"), pa.scalar("")),
            pc.cast(c, pa.string()), ".",
            pc.cast(pa.array(kn % 100, pa.int64()), pa.string()), "")
        return pa.table({"o_orderkey": k, "s_key": ks, "s_val": vs})

    strs = ds.map_batches(_mk, batch_format="pyarrow")
    return coerce_string_columns(strs, {"s_key": "integer", "s_val": "float"})


def unpivot_lineitem(sf_dir: str):
    """Melt lineitem measures to long (key, name, value) rows — the
    inverse of pivot, a pure streaming reshape."""
    from peri_ray.stages.stats import unpivot

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount"])
    return unpivot(ds, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_extendedprice", "l_discount"])


def column_profile_events(sf_dir: str):
    """Per-column data-quality profile (count, nulls, min, max) of the
    events numeric columns via the one-pass spec-inference profiler."""
    from peri_ray.infer import profile_columns

    ds = _read(sf_dir, "events", ["user_id", "value"])
    prof = profile_columns(ds)
    rows = sorted(prof.items())
    return pa.table({
        "path": pa.array([p for p, _ in rows], pa.string()),
        "n": pa.array([m["n"] for _, m in rows], pa.int64()),
        "nulls": pa.array([m["nulls"] for _, m in rows], pa.int64()),
        "vmin": pa.array([m["vmin"] for _, m in rows], pa.float64()),
        "vmax": pa.array([m["vmax"] for _, m in rows], pa.float64()),
    })


def grouped_kll_chars(sf_dir: str):
    """Approximate per-source n_chars quantiles via per-group KLL
    sketches through the bucket exchange, AUDITED: a second streaming
    pass counts each group's values strictly-below / at-or-below the
    sketch's estimate, and the emitted ``q50_ok``/``q90_ok`` assert
    the estimate's rank window intersects [q−ε, q+ε]·n with ε=0.15
    (KLL k=200 guarantees ~1.65/√k ≈ 0.117 w.h.p.) — the sketch's
    rank error is the oracle-checked contract (twin: exact per-group
    counts + TRUE).  The scale path ships only ~k-float sketches; the
    exact rank pass exists for the audit."""
    from collections import defaultdict

    from peri_ray.stages.stats import grouped_kll_quantiles

    kll_rows = _rows(grouped_kll_quantiles(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        "source", "n_chars", qs=(0.5, 0.9)))
    ests = {r["source"]: (r["q_0_5"], r["q_0_9"]) for r in kll_rows}

    def _ranks(t: pa.Table) -> pa.Table:
        x = t.column("n_chars").combine_chunks().cast(pa.float64())
        sub = pa.table({"source": t.column("source"), "x": x}).filter(
            pc.is_valid(x))
        enc = sub.column("source").combine_chunks().dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        raw = enc.indices.to_numpy(zero_copy_only=False)
        idx = (np.where(np.isnan(raw), -1, raw).astype(np.int64)
               if raw.dtype.kind == "f" else raw.astype(np.int64))
        xv = sub.column("x").to_numpy(zero_copy_only=False)
        out: dict = {}
        for di in np.unique(idx):
            s = None if di < 0 else enc.dictionary[int(di)].as_py()
            vals = xv[idx == di]
            e50, e90 = ests.get(s, (None, None))
            out[s] = [
                int((vals < e50).sum()) if e50 is not None else 0,
                int((vals <= e50).sum()) if e50 is not None else 0,
                int((vals < e90).sum()) if e90 is not None else 0,
                int((vals <= e90).sum()) if e90 is not None else 0,
                int(len(vals))]
        ks = sorted(out, key=lambda s: (s is None, s))
        return pa.table({
            "source": pa.array(ks, pa.string()),
            "lo50": pa.array([out[k][0] for k in ks], pa.int64()),
            "hi50": pa.array([out[k][1] for k in ks], pa.int64()),
            "lo90": pa.array([out[k][2] for k in ks], pa.int64()),
            "hi90": pa.array([out[k][3] for k in ks], pa.int64()),
            "n": pa.array([out[k][4] for k in ks], pa.int64())})

    merged: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in _read(sf_dir, "documents", ["source", "n_chars"]).map_batches(
            _ranks, batch_format="pyarrow").take_all():
        a = merged[r["source"]]
        for i, f in enumerate(("lo50", "hi50", "lo90", "hi90", "n")):
            a[i] += r[f]

    eps = 0.15

    def _ok(lo, hi, n, q):
        # estimate occupies ranks (lo, hi]; ok iff that window meets
        # [q−ε, q+ε]·n (slack is ON the accept side — CLAUDE.md rule)
        return hi >= (q - eps) * n and lo < (q + eps) * n

    ks = sorted(merged, key=lambda s: (s is None, s))
    return pa.table({
        "source": pa.array(ks, pa.string()),
        "n": pa.array([merged[k][4] for k in ks], pa.int64()),
        "q50_ok": pa.array([_ok(merged[k][0], merged[k][1],
                                merged[k][4], 0.5) for k in ks],
                           pa.bool_()),
        "q90_ok": pa.array([_ok(merged[k][2], merged[k][3],
                                merged[k][4], 0.9) for k in ks],
                           pa.bool_())})


def entropy_events(sf_dir: str):
    """Shannon entropy (nats) of categorical columns — distribution
    profiling next to PSI/chi²: per-batch value-count partials, tiny
    driver merge, -Σ p·ln p over the merged counts.  Nulls are their
    own category (matching SQL GROUP BY); rounded to 6 (log values
    cannot tie)."""
    import math

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def _p(t: pa.Table) -> pa.Table:
        outs = []
        for col in ("event_type", "user_id"):
            c = t.column(col)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            vc = pc.value_counts(pc.cast(c, pa.string()))
            outs.append(pa.table({
                "column": pa.array([col] * len(vc), pa.string()),
                "v": pc.fill_null(vc.field("values"), "\x00null"),
                "n": vc.field("counts").cast(pa.int64()),
            }))
        return pa.concat_tables(outs)

    from collections import defaultdict

    merged: dict = defaultdict(int)
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        merged[(r["column"], r["v"])] += r["n"]
    cols: dict = defaultdict(dict)
    for (col, v), n in merged.items():
        cols[col][v] = n
    names, ent, ndv = [], [], []
    for col in sorted(cols):
        cnts = list(cols[col].values())
        tot = float(sum(cnts))
        h = -sum((n / tot) * math.log(n / tot) for n in sorted(cnts))
        names.append(col)
        ent.append(round(h, 6))
        ndv.append(len(cnts))
    return pa.table({"column": pa.array(names, pa.string()),
                     "ndv": pa.array(ndv, pa.int64()),
                     "entropy": pa.array(ent, pa.float64())})


def resampled_event_counts(sf_dir: str):
    """Hourly event counts per type with zero-filled gaps (time-series
    resampling): per-batch (type, hour) count partials, driver merge,
    then the dense grid [min hour, max hour] × types with COALESCE-0 —
    grid size is bounded by types × hours, never by rows."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _p(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks()
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        ok = pc.and_(pc.is_valid(ts), pc.is_valid(et))
        sub = pa.table({"h": pc.floor_temporal(ts, unit="hour"),
                        "event_type": et}).filter(ok)
        g = sub.group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "h", "cnt"])

    rows = ds.map_batches(_p, batch_format="pyarrow").take_all()
    from collections import defaultdict

    counts: dict = defaultdict(int)
    for r in rows:
        counts[(r["event_type"], r["h"])] += r["cnt"]
    if not counts:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "h": pa.array([], pa.timestamp("us")),
                         "cnt": pa.array([], pa.int64())})
    import datetime as _dt

    hours = [h for _, h in counts]
    lo, hi = min(hours), max(hours)
    types = sorted({k for k, _ in counts})
    grid_t, grid_h, grid_c = [], [], []
    cur = lo
    while cur <= hi:
        for k in types:
            grid_t.append(k)
            grid_h.append(cur)
            grid_c.append(counts.get((k, cur), 0))
        cur = cur + _dt.timedelta(hours=1)
    return pa.table({"event_type": pa.array(grid_t, pa.string()),
                     "h": pa.array(grid_h, pa.timestamp("us")),
                     "cnt": pa.array(grid_c, pa.int64())})


def variance_lineitem(sf_dir: str):
    """Per-group sample variance/stddev of l_quantity (algebraic
    combiners, same shape as grouped_corr)."""
    from peri_ray.stages.stats import grouped_variance

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_variance(ds, "l_returnflag", "l_quantity")


def daily_event_shares(sf_dir: str):
    """Per-(day, event_type) counts and within-day share — the
    ratio_to_report window shape: per-batch (day, type) count partials
    (bounded by days × types per block), one tiny driver merge, share
    derived from the merged totals.  Null days/types group naturally
    on both sides; shares round half-away (dyadic ratios can tie)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _p(t: pa.Table) -> pa.Table:
        day = pc.cast(t.column("ts").combine_chunks(), pa.date32())
        g = (pa.table({"day": day, "event_type": t.column("event_type")})
             .group_by(["day", "event_type"]).aggregate([([], "count_all")]))
        return g.rename_columns(["day", "event_type", "cnt"])

    from collections import defaultdict

    cells: dict = defaultdict(int)
    for r in ds.map_batches(_p, batch_format="pyarrow").take_all():
        cells[(r["day"], r["event_type"])] += r["cnt"]
    # null-safe day totals: an Arrow join on 'day' would NOT match the
    # null-day partition, while SQL's PARTITION BY day does
    day_tot: dict = defaultdict(int)
    for (day, _), n in cells.items():
        day_tot[day] += n
    days, types, cnts, shares = [], [], [], []
    for (day, et), n in sorted(cells.items(), key=str):
        days.append(day)
        types.append(et)
        cnts.append(n)
        shares.append(float(np.floor(n / day_tot[day] * 1e6 + 0.5) / 1e6))
    return pa.table({"day": pa.array(days, pa.date32()),
                     "event_type": pa.array(types, pa.string()),
                     "cnt": pa.array(cnts, pa.int64()),
                     "share": pa.array(shares, pa.float64())})


def _recrawl_batch(t: pa.Table) -> pa.Table:
    """Deterministic 'recrawl' of documents for the snapshot-diff /
    incremental-dedup oracles: drop id%7 rows, append ' updated' to
    text on id%5, add id%11 rows under new keys (mirrored verbatim in
    the SQL twins)."""
    ids = t.column("doc_id").combine_chunks()
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    idn = ids.to_numpy(zero_copy_only=False)
    upd = pa.array(idn % 5 == 0)
    new_txt = pc.if_else(
        upd,
        pc.binary_join_element_wise(
            txt, pa.array(["updated"] * t.num_rows), " "),
        txt)
    base = (pa.table({"doc_id": ids, "text": new_txt})
            .filter(pa.array(idn % 7 != 0)))
    add_ids = idn[idn % 11 == 0] + 1000000
    adds = pa.table({"doc_id": pa.array(add_ids, pa.int64()),
                     "text": pa.array(["new page"] * len(add_ids))})
    return pa.concat_tables([base, adds])


def incremental_dedup_recrawl(sf_dir: str):
    """Incremental crawl dedup through the sharded mutable hash index
    (the raw-actor escape hatch): build the index from the base
    corpus, probe the recrawl — rows whose text is already indexed are
    flagged.  Deterministic (build fully precedes probe), so the
    membership answers hash-check against SQL IN."""
    from peri_ray.state.index import TextHashIndex

    idx = TextHashIndex(n_shards=4)
    base = _read(sf_dir, "documents", ["doc_id", "text"])
    idx.add_dataset(base)
    recrawl = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _recrawl_batch, batch_format="pyarrow")
    return idx.mark_duplicates(recrawl)


def crawl_diff_documents(sf_dir: str):
    """Snapshot diff (recrawl vs previous crawl): the 'recrawl' side is
    derived in-pipeline — drop id%7 rows, update text on id%5, add
    id%11 rows under new keys — and both engines diff against the
    original, so added/removed/changed attribution is hash-checked."""
    from peri_ray.stages.joins import dataset_diff

    a = _read(sf_dir, "documents", ["doc_id", "text"])
    b = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _recrawl_batch, batch_format="pyarrow")
    return dataset_diff(a, b, "doc_id", ["text"])


def packing_manifest_documents(sf_dir: str):
    """Training-prep sequence packing plan: docs routed to id%16
    streams, concat-and-chunked into 512-token windows; one manifest
    row per sequence (bucket, seq_idx, n_tokens, n_docs)."""
    from peri_ray.stages.text import pack_sequence_manifest

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequence_manifest(ds, seq_len=512, n_buckets=16)


def inferred_spec_documents(sf_dir: str):
    """Spec inference (the reverse of validation): profile the
    documents table in one streaming pass and emit the inferred Peri
    spec as (field, type, required, enum_vals) rows — types from the
    Arrow schema, required from null counts, enums from capped
    distinct-string partials."""
    from peri_ray.infer import infer_spec, spec_as_table

    ds = _read(sf_dir, "documents")
    return spec_as_table(infer_spec(ds, enum_threshold=16))


def kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (iterative:
    driver-held k×d state re-broadcast per round, one streaming pass
    per iteration), ORACLE-CHECKED as an invariant audit (round-5
    conversion, same pattern as pca_projected_embeddings): exact
    assigned-row count rides along; the booleans assert what a correct
    Lloyd run must satisfy — every label in [0, k), the per-iteration
    SSE sequence non-increasing, and the final re-assignment SSE
    (recomputed against the FINAL centroids in an independent audit
    pass) no larger than the last Lloyd SSE.  Twin: exact embedding
    count + TRUE.  Per-row assignments stay engine-side (the fixpoint
    has no SQL twin); exactness vs full-batch numpy Lloyd is
    unit-tested."""
    import ray

    from peri_ray.stages.similarity import kmeans_fit

    k = 8
    hist: list[float] = []
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    assigned, cents, _inertia = kmeans_fit(ds, k=k, iters=5,
                                           history_out=hist)
    mono_ok = all(hist[i + 1] <= hist[i] * (1.0 + 1e-12) + 1e-9
                  for i in range(len(hist) - 1))
    cref = ray.put(np.asarray(cents, np.float64))

    def _label_check(t: pa.Table) -> pa.Table:
        cl = t.column("cluster").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = bool(((cl >= 0) & (cl < k)).all()) if len(cl) else True
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "ok": pa.array([ok], pa.bool_())})

    n_rows, labels_ok = 0, True
    for r in assigned.map_batches(_label_check,
                                  batch_format="pyarrow").take_all():
        n_rows += int(r["n"])
        labels_ok = labels_ok and bool(r["ok"])

    def _sse_part(t: pa.Table) -> pa.Table:
        vec = t.column("embedding").combine_chunks()
        t2 = t.filter(pc.is_valid(vec))
        if t2.num_rows == 0:
            return pa.table({"sse": pa.array([0.0], pa.float64())})
        from peri_ray.stages.similarity import _as_matrix

        X = _as_matrix(t2.column("embedding"), np.float64)
        C = ray.get(cref)
        d = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
             + (C * C).sum(1)[None, :])
        return pa.table({"sse": pa.array([float(d.min(1).sum())],
                                         pa.float64())})

    sse_final = sum(
        float(r["sse"]) for r in
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(_sse_part, batch_format="pyarrow").take_all())
    reassign_ok = bool(hist) and \
        sse_final <= hist[-1] * (1.0 + 1e-12) + 1e-9
    return pa.table({
        "n_rows": pa.array([n_rows], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "labels_in_range_ok": pa.array([labels_ok], pa.bool_()),
        "inertia_monotone_ok": pa.array([mono_ok], pa.bool_()),
        "reassign_non_increasing_ok": pa.array([reassign_ok],
                                               pa.bool_())})


def cosine_join_pairs(sf_dir: str):
    """Exact cosine-threshold similarity self-join over the embeddings
    table (block-pair matmul; recall itself is hash-checked against
    the literal all-pairs SQL, as with jaccard_join_pairs)."""
    from peri_ray.stages.similarity import cosine_similarity_join

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_similarity_join(ds, threshold=0.4)


def near_dup_recall_report(sf_dir: str):
    """Self-evaluation of the approximate embedding near-dup routes
    against the EXACT cosine join at the same threshold (0.4 — this
    table's pair-bearing range; max off-diagonal cosine ≈ 0.51):
    single-table LSH vs the banded OR-construction.  The banded
    variant trades a bounded scanned-fraction increase (tables ×
    1/2^planes) for recall 1-(1-p^planes)^tables — the measurement
    that decides whether the approximate route can replace the exact
    O(n²) join at corpus scale.  Rows-only (approx side has no SQL)."""
    from peri_ray.stages.similarity import (cosine_similarity_join,
                                            embedding_near_dups)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    exact = cosine_similarity_join(ds, threshold=0.4)
    truth = {(r["id_a"], r["id_b"]) for r in exact.take_all()}

    rows = []
    for method, kw in (
        ("lsh_single_10p", dict(n_planes=10)),
        ("lsh_banded_3p_x8", dict(n_planes=3, n_tables=8)),
    ):
        got = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(
            ds, threshold=0.4, **kw).take_all()}
        found = len(got & truth)
        rows.append((method, len(truth), found,
                     round(found / len(truth), 4) if truth else None))
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "true_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "found_pairs": pa.array([r[2] for r in rows], pa.int64()),
        "recall": pa.array([r[3] for r in rows], pa.float64()),
    })


def unigram_nll_documents(sf_dir: str):
    """Mean negative log-likelihood per doc under a corpus-trained
    unigram LM (the perplexity-style quality filter).  Rounded to 6
    decimals on both sides — the log values are transcendental so
    cross-engine ROUND ties cannot occur."""
    from peri_ray.stages.text import unigram_nll_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _round(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("nll"), "nll",
            pc.round(t.column("nll"), ndigits=6,
                     round_mode="half_towards_infinity"))

    return unigram_nll_scores(ds).map_batches(_round, batch_format="pyarrow")


def bigram_nll_documents(sf_dir: str):
    """Bigram-LM mean NLL per doc — the no-broadcast scoring path
    (model joined, not shipped); rounded to 6 on both sides."""
    from peri_ray.stages.text import bigram_nll_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _round(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("nll2"), "nll2",
            pc.round(t.column("nll2"), ndigits=6,
                     round_mode="half_towards_infinity"))

    return bigram_nll_scores(ds).map_batches(_round, batch_format="pyarrow")


_BOILER_FOOTER = "(c) 2026 example.com | privacy | terms"


def boilerplate_removed_documents(sf_dir: str):
    """C4-style boilerplate line removal, oracle-checked end to end.

    The sf documents are single-line word streams (no shared lines),
    so the query first appends two lines to every doc in-pipeline — a
    corpus-wide footer (df = corpus size → boilerplate) and a
    doc-unique marker (df = 1 → content).  The SQL twin builds the
    same input, so the oracle hash genuinely exercises the explode →
    line-DF → victim → rebuild path: the footer must vanish from
    every doc, everything else must survive byte-identically."""
    from peri_ray.stages.dedup import remove_boilerplate_lines

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _with_footer(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        ids = t.column("doc_id")
        marker = pc.binary_join_element_wise(
            pa.array(["doc "] * t.num_rows), pc.cast(ids, pa.string()), "")
        out = pc.binary_join_element_wise(
            txt, pa.array([_BOILER_FOOTER] * t.num_rows), marker, "\n")
        return pa.table({"doc_id": ids, "text": out})

    marked = ds.map_batches(_with_footer, batch_format="pyarrow")
    return remove_boilerplate_lines(marked, min_df=5)


def line_dedup_documents(sf_dir: str):
    """RefinedWeb/CCNet-style line-level exact dedup: every line keeps
    only its global first occurrence (min (doc_id, idx)); docs rebuilt
    from surviving lines.  Two bucketed exchanges, text column never
    materialized on the driver."""
    from peri_ray.stages.dedup import line_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return line_dedup(ds)


def contamination_report(sf_dir: str):
    """Benchmark decontamination: every 97th doc plays the held-out
    eval set; training docs are flagged when they share any distinct
    word 5-gram with it.  Benchmark grams broadcast once (ray.put),
    corpus probed in one streaming pass — no shuffle."""
    from peri_ray.stages.dedup import contamination_counts

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _is_bench(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 == 0))

    def _is_train(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 97 != 0))

    bench = docs.map_batches(_is_bench, batch_format="pyarrow")
    train = docs.map_batches(_is_train, batch_format="pyarrow")
    return contamination_counts(train, bench, n=5)


def mixed_sample_documents(sf_dir: str):
    """Deterministic corpus-mixing sample: per-source keep rates
    (k%4+1)/8 — exact binary fractions so the floored integer
    threshold is identical in both engines — decided by an integer
    hash of doc_id.  One streaming pass, no shuffle, reproducible
    across block layouts and cluster sizes."""
    from peri_ray.stages.stats import hash_weighted_sample

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    rates = {f"src{i}": (i % 4 + 1) / 8 for i in range(20)}
    return hash_weighted_sample(ds, rates, key_col="source", id_col="doc_id")


def moving_window_events(sf_dir: str):
    """Per-user 3-row moving sum of event value in (ts, event_id)
    order — the bounded-frame window family; integer micro-units so
    every intermediate hash-matches SQL (temporal.moving_window_sums)."""
    from peri_ray.stages.temporal import moving_window_sums

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return moving_window_sums(ds, window=3)


def minmax_normalized_events(sf_dir: str):
    """Per-event-type min-max scaled value — two-pass broadcast
    normalization, no shuffle (stats.minmax_normalize); raw doubles
    hash-match because both engines evaluate the identical
    (v - min) / (max - min) expression."""
    from peri_ray.stages.stats import minmax_normalize

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return minmax_normalize(ds, key_col="event_type", value_col="value",
                            id_col="event_id")


def source_gini_documents(sf_dir: str):
    """Gini coefficient of docs-per-source — corpus concentration
    monitoring (stats.gini_concentration); integer arithmetic until one
    final division so the double hash-matches SQL."""
    from peri_ray.stages.stats import gini_concentration

    ds = _read(sf_dir, "documents", ["source"])
    return gini_concentration(ds, "source")


def standardized_embeddings(sf_dir: str):
    """Per-dimension z-score whitening of a deterministic embedding
    sample (two passes: d-bounded moment partials → broadcast map);
    rounded so the cross-engine sum-order ulps wash out."""
    from peri_ray.stages.similarity import standardize_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _sample(t: pa.Table) -> pa.Table:
        k = (t.column("vec_id").combine_chunks()
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(k % 25 == 0))

    return standardize_embeddings(
        ds.map_batches(_sample, batch_format="pyarrow"))


def pmi_bigrams_documents(sf_dir: str):
    """PMI collocations over word bigrams (min_count 5) — unigram
    model broadcast once, bigram counts stay distributed; ln values
    rounded on both sides (transcendental: no round-boundary ties)."""
    from peri_ray.stages.text import pmi_collocations

    ds = _read(sf_dir, "documents", ["text"])
    return pmi_collocations(ds, min_count=5)


def daily_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per day — the windowed-NDV audit
    (unique visitors per day) through the same one-exchange
    distinct-pair machinery, keyed on the derived day column."""
    from peri_ray.stages.stats import grouped_distinct_count

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def _day(t: pa.Table) -> pa.Table:
        # drop null timestamps to match the oracle's WHERE ts IS NOT
        # NULL (strftime would otherwise keep a null-day group)
        t = t.filter(pc.is_valid(t.column("ts").combine_chunks()))
        ts = t.column("ts").combine_chunks()
        day = pc.strftime(ts, format="%Y-%m-%d")
        return pa.table({"day": day, "user_id": t.column("user_id")})

    return grouped_distinct_count(ds.map_batches(_day, batch_format="pyarrow"),
                                  "day", "user_id")


def equi_depth_bins_documents(sf_dir: str):
    """Equi-depth bucketization: bin = #exact-percentile_disc splits
    (p25/p50/p75) strictly below the value — quartile binning as a
    two-pass broadcast (value-count quantiles → vectorized
    searchsorted), no sort, no shuffle.  Nulls stay null."""
    from peri_ray.stages.stats import exact_quantiles

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    qt = exact_quantiles(ds, ["n_chars"], qs=(0.25, 0.5, 0.75))
    splits = np.sort(qt.column("value").to_numpy(zero_copy_only=False))

    def _bin(t: pa.Table) -> pa.Table:
        v = (t.column("n_chars").combine_chunks().cast(pa.float64())
             .to_numpy(zero_copy_only=False))
        bins = np.searchsorted(splits, v, side="left").astype(np.int64)
        arr = pa.array(bins)
        arr = pc.if_else(pc.is_valid(t.column("n_chars").combine_chunks()),
                         arr, pa.nulls(t.num_rows, pa.int64()))
        return pa.table({"doc_id": t.column("doc_id"), "bin": arr})

    return ds.map_batches(_bin, batch_format="pyarrow")


def violation_report_documents(sf_dir: str):
    """Per-rule violation report: count + the 3 lexicographically
    smallest offending record_ids as deterministic examples — the
    human-facing summary every DQ dashboard wants.  Per-batch partials
    (≤ rules × (count + 3 ids) per block) merge on the driver: bounded
    by the SPEC size, never the violation volume."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    combined = validate_dataset(ds, DOCS_SPEC, id_column="doc_id")
    vio = violations_dataset(combined)

    def _part(t: pa.Table) -> pa.Table:
        # vectorized first-3-per-rule (same run-mask shape as
        # stats._TopKPerGroupPartial): rules per batch is spec-bounded,
        # rows are not — no per-row Python loop.  Arrow sorts nulls
        # last, so the first 3 of a run are non-null whenever possible;
        # the residual Nones (runs with <3 non-null ids) are filtered
        # (SQL's string_agg skips nulls identically).
        g = (t.select(["rule_id", "record_id"])
             .sort_by([("rule_id", "ascending"),
                       ("record_id", "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({"rule_id": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "ex": pa.array([], pa.list_(pa.string()))})
        rules = g.column("rule_id").combine_chunks()
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = pc.equal(rules.slice(1), rules.slice(0, n - 1)) \
                .fill_null(False).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(~same)
        lens = np.diff(np.append(starts, n))
        recs = g.column("record_id").to_pylist()
        out_e = [[x for x in recs[s:s + min(3, ln)] if x is not None]
                 for s, ln in zip(starts, lens)]
        return pa.table({
            "rule_id": rules.take(pa.array(starts, pa.int64())),
            "n": pa.array(lens, pa.int64()),
            "ex": pa.array(out_e, pa.list_(pa.string()))})

    acc: dict[str, tuple[int, list]] = {}
    for r in vio.map_batches(_part, batch_format="pyarrow").take_all():
        n, ex = acc.get(r["rule_id"], (0, []))
        acc[r["rule_id"]] = (n + r["n"],
                             sorted(ex + list(r["ex"]))[:3])
    rules = sorted(acc)
    return pa.table({
        "rule_id": pa.array(rules, pa.string()),
        "n": pa.array([acc[r][0] for r in rules], pa.int64()),
        "examples": pa.array([",".join(acc[r][1]) for r in rules],
                             pa.string()),
    })


def dedup_best_capture_docs(sf_dir: str):
    """Dedup keeping the BEST row per content (highest n_chars, tie →
    min doc_id) instead of the min id — the recrawl policy "keep the
    richest capture".  Groups on the engine-wide 64-bit content hash
    (same trade as `dedup_exact_docs`: collision odds ~n²/2⁶⁵, and
    CLAUDE.md records that a verify pass measured slower than the
    exchange-byte savings here).  Pure composition: content-hash
    column + ``top_k_per_group(k=1)``; only (hash, n_chars, doc_id)
    rows cross the exchange."""
    from peri_ray.stages.stats import top_k_per_group
    from peri_ray.state.sketches import hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def _h(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column("text").combine_chunks(), seed=1)
        return pa.table({
            "content_hash": pa.array(h.astype(np.int64)),
            "doc_id": t.column("doc_id"),
            "n_chars": t.column("n_chars"),
        })

    hashed = ds.map_batches(_h, batch_format="pyarrow")
    best = top_k_per_group(hashed, key="content_hash", order_col="n_chars",
                           k=1, descending=True, tiebreak="doc_id")
    return best.select_columns(["doc_id"])


def asof_forward_event_orders(sf_dir: str):
    """Forward as-of: each event matched to the EARLIEST order date of
    the same customer at-or-after the event time (the "next scheduled
    thing" probe; oracle = DuckDB ASOF LEFT JOIN with <=)."""
    from peri_ray.stages.temporal import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    return asof_join(events, orders, "user_id", "o_custkey", "ts",
                     "o_orderdate", left_cols=["event_id"],
                     out_col="next_orderdate", direction="forward")


def compression_ratio_documents(sf_dir: str):
    """zlib-ratio low-information signal per doc, ORACLE-CHECKED as a
    bound audit (round-5 conversion — SQL has no deflate, but the
    ratios obey checkable invariants): exact scored-row count rides
    along; the booleans assert every ratio is finite and positive,
    every ≥50-char doc compresses to ≤1.1× raw (the ~30-word-vocab
    fixture compresses FAR below that; 1.1 absorbs zlib overhead), and
    the self-concatenation property ratio(text‖text) ≤ ratio(text)+ε
    holds per doc (the second copy becomes one window match — a broken
    ratio computation fails this).  Per-doc VALUES stay engine-side
    (add_compression_ratio), exercised by the audit pass itself."""
    import zlib

    from peri_ray.stages.text import compression_ratio_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def _audit(t: pa.Table) -> pa.Table:
        scored = compression_ratio_batch(t, "text")
        ratio = scored.column("zlib_ratio").combine_chunks()
        ok_rows = scored.filter(pc.is_valid(ratio))
        n = ok_rows.num_rows
        r = ok_rows.column("zlib_ratio").to_numpy(zero_copy_only=False)
        pos = bool(np.isfinite(r).all() and (r > 0.0).all()) \
            if n else True
        nch = (ok_rows.column("n_chars")
               .to_numpy(zero_copy_only=False).astype(np.float64))
        long_mask = np.nan_to_num(nch, nan=0.0) >= 50
        bounded = bool((r[long_mask] <= 1.1).all()) if n else True
        dbl = True
        for v, rv in zip(ok_rows.column("text").to_pylist(),
                         r.tolist()):
            raw = v.encode("utf-8", "ignore")
            r2 = len(zlib.compress(raw + raw, 6)) / (2 * len(raw))
            if r2 > rv + 1e-9:
                dbl = False
                break
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "pos": pa.array([pos], pa.bool_()),
            "bnd": pa.array([bounded], pa.bool_()),
            "dbl": pa.array([dbl], pa.bool_())})

    n_docs, pos_ok, bounded_ok, doubling_ok = 0, True, True, True
    for row in ds.map_batches(_audit,
                              batch_format="pyarrow").take_all():
        n_docs += int(row["n"])
        pos_ok = pos_ok and bool(row["pos"])
        bounded_ok = bounded_ok and bool(row["bnd"])
        doubling_ok = doubling_ok and bool(row["dbl"])
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "ratios_positive_ok": pa.array([pos_ok], pa.bool_()),
        "long_docs_bounded_ok": pa.array([bounded_ok], pa.bool_()),
        "doubling_ok": pa.array([doubling_ok], pa.bool_())})


def ann_recall_report(sf_dir: str):
    """Retrieval-quality self-evaluation: recall@10 of the approximate
    ANN routes (LSH-bucketed, IVF-Flat) against the exact brute-force
    neighbors, per query + macro average — the measurement that decides
    whether an approximate index is good enough to replace the exact
    scan at corpus scale.  Rows-only (the approximate side is not
    SQL-expressible); deterministic queries (3 lowest vec_ids).

    Measured at sf0.1: single-table LSH 0.5, banded 4-table 0.967,
    IVF 0.8.  (An earlier reading had banded "plateau" at 0.5 — that
    was the per-batch top-k duplicate-row bug: replicated candidates
    filled the k slots with copies of one id before the driver merge;
    _TopKPartial now dedupes ids within the batch.)"""
    from peri_ray.stages.similarity import (brute_force_topk, ivf_topk,
                                            lsh_bucketed_topk)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_rows = ds.sort("vec_id").take(3)
    queries = np.stack([np.asarray(r["embedding"], np.float32)
                        for r in q_rows])
    exact = brute_force_topk(ds, queries, k=10)
    methods = {
        "lsh": lsh_bucketed_topk(ds, queries, k=10, n_planes=6),
        "lsh_banded": lsh_bucketed_topk(ds, queries, k=10, n_planes=6,
                                        n_tables=4),
        "ivf": ivf_topk(ds, queries, k=10, n_cells=8, nprobe=3),
    }
    meth, qids, recalls = [], [], []
    for name, results in methods.items():
        per_method = []
        for i, res in enumerate(results):
            truth = {v for v, _ in exact[i]}
            got = {v for v, _ in res}
            meth.append(name)
            qids.append(int(q_rows[i]["vec_id"]))
            per_method.append(len(truth & got) / max(1, len(truth)))
        recalls.extend(per_method)
        meth.append(name)
        qids.append(-1)  # macro average marker
        recalls.append(float(np.mean(per_method)))
    return pa.table({"method": pa.array(meth, pa.string()),
                     "query_id": pa.array(qids, pa.int64()),
                     "recall_at_10": pa.array(recalls, pa.float64())})


def unnest_embeddings(sf_dir: str):
    """List-column explode (unnest WITH ORDINALITY) on a deterministic
    embedding sample — streaming reshape, values cast to double (exact
    f32→f64)."""
    from peri_ray.stages.stats import unnest_list

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _sample(t: pa.Table) -> pa.Table:
        k = (t.column("vec_id").combine_chunks()
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(k % 25 == 0))

    exploded = unnest_list(ds.map_batches(_sample, batch_format="pyarrow"),
                           "embedding", ["vec_id"])

    def _cast(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("value"), "value",
                            t.column("value").cast(pa.float64()))

    return exploded.map_batches(_cast, batch_format="pyarrow")


def budget_subset_documents(sf_dir: str):
    """Greedy char-budget subset (largest docs first, ids break ties)
    WITHOUT a global sort: value-count cutoff + bounded tie selection
    (stats.budget_subset_ids); twin = SQL window cumsum prefix."""
    from peri_ray.stages.stats import budget_subset_ids

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return budget_subset_ids(ds, "n_chars", "doc_id", budget=100_000)


def fd_user_event_type(sf_dir: str):
    """Functional-dependency profile user_id → event_type: users whose
    events span >1 distinct type (two-phase distinct-pair exchange)."""
    from peri_ray.stages.checks import fd_violations

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return fd_violations(ds, "user_id", "event_type")


def knn_graph_embeddings(sf_dir: str):
    """Exact kNN graph (top-5 cosine neighbors per vector) over a
    deterministic embedding sample — block-pair matmuls + per-block
    partial top-k, exact merge via top_k_per_group; the oracle ranks
    the literal all-pairs cosines, so the graph is hash-checked edge
    for edge."""
    from peri_ray.stages.similarity import knn_graph

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _sample(t: pa.Table) -> pa.Table:
        k = (t.column("vec_id").combine_chunks()
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(k % 10 == 0))

    sampled = ds.map_batches(_sample, batch_format="pyarrow")
    return knn_graph(sampled, k=5)


def fuzzy_name_pairs(sf_dir: str):
    """Bounded edit-distance self-join (FastSS deletion neighborhoods)
    on a deterministic customer-name sample — the oracle is the
    literal all-pairs levenshtein SQL, so candidate COMPLETENESS is
    hash-checked, not just precision."""
    from peri_ray.stages.dedup import edit_distance_join

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def _sample(t: pa.Table) -> pa.Table:
        k = (t.column("c_custkey").combine_chunks()
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(k % 10 == 0))

    sampled = ds.map_batches(_sample, batch_format="pyarrow")
    return edit_distance_join(sampled, "c_name", "c_custkey", max_dist=1)


def lagged_value_events(sf_dir: str):
    """Per-user lag(value, 3) in (ts, event_id) order — the general
    offset window the interarrival (lag-1) operator specializes."""
    from peri_ray.stages.temporal import lag_column

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return lag_column(ds, "user_id", ["ts", "event_id"], "value",
                      "event_id", offset=3)


def locf_filled_events(sf_dir: str):
    """LOCF gap imputation: values nulled in-pipeline (click events)
    then forward-filled per user in (ts, event_id) order — SQL
    last_value IGNORE NULLS twin."""
    from peri_ray.stages.temporal import locf_fill

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type", "value"])

    def _gap(t: pa.Table) -> pa.Table:
        v = t.column("value").combine_chunks()
        is_click = pc.equal(t.column("event_type").combine_chunks(),
                            pa.scalar("click"))
        gapped = pc.if_else(pc.fill_null(is_click, False),
                            pa.nulls(t.num_rows, v.type), v)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "value": gapped})

    gapped = ds.map_batches(_gap, batch_format="pyarrow")
    return locf_fill(gapped, "user_id", ["ts", "event_id"], "value",
                     "event_id")


def changeset_orders_violations(sf_dir: str):
    """Ecto-changeset-shaped ingestion (reference lib/peri/ecto.ex):
    string attrs (built in-pipeline with deliberate corruptions) cast
    under explicit grammars — unparseable non-null cell → 'cast:<col>'
    violation with Ecto's "is invalid" message, superseding spec checks
    on the same field — then the casted table validates against the
    spec.  Returns the flattened combined violations."""
    from peri_ray.changeset import cast_and_validate
    from peri_ray.validate import violations_dataset

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def _mk(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").combine_chunks()
        c = t.column("o_custkey").combine_chunks()
        kn = k.to_numpy(zero_copy_only=False)
        ks = pc.binary_join_element_wise(
            pc.cast(k, pa.string()),
            pc.if_else(pa.array(kn % 13 == 0), pa.scalar("x"), pa.scalar("")),
            "")
        vs = pc.binary_join_element_wise(
            pc.if_else(pa.array(kn % 7 == 0), pa.scalar("v"), pa.scalar("")),
            pc.if_else(pa.array(kn % 11 == 0), pa.scalar("-"), pa.scalar("")),
            pc.cast(c, pa.string()), ".",
            pc.cast(pa.array(kn % 100, pa.int64()), pa.string()), "")
        return pa.table({"o_orderkey": k, "s_key": ks, "s_val": vs})

    strs = ds.map_batches(_mk, batch_format="pyarrow")
    combined = cast_and_validate(
        strs, {"s_key": "integer", "s_val": "float"},
        spec={"o_orderkey": ("required", "integer"),
              "s_key": ("required", "integer"),
              "s_val": ("float", ("gte", 0.0))},
        id_column="o_orderkey")
    return violations_dataset(combined).select_columns(
        ["record_id", "rule_id", "path"])


def approx_distinct_users_by_type(sf_dir: str):
    """Per-group approximate NDV via HLL partials, AUDITED: the exact
    NDV rides along from the one-exchange distinct-pair path and the
    emitted ``hll_ok`` asserts the p=12 estimate sits inside a ±5%
    (≈3σ) envelope — the sketch's accuracy is itself the
    oracle-checked contract (the twin computes exact NDV and TRUE; a
    drifting estimate flips the boolean and fails the hash).  The
    production path at corpus scale is the HLL side alone; the exact
    pass exists for the audit."""
    from peri_ray.stages.stats import grouped_distinct_count, grouped_hll_ndv

    est_rows = _rows(grouped_hll_ndv(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        key="event_type", col="user_id"))
    exact_rows = _rows(grouped_distinct_count(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        "event_type", "user_id"))
    est = {r["event_type"]: r["ndv"] for r in est_rows}
    keys, exact, ok = [], [], []
    for r in sorted(exact_rows, key=lambda r: (r["event_type"] is None,
                                               r["event_type"])):
        k, nd = r["event_type"], r["ndv"]
        keys.append(k)
        exact.append(nd)
        e = est.get(k)
        ok.append(e is not None and abs(e - nd) <= max(2.0, 0.05 * nd))
    return pa.table({"event_type": pa.array(keys, pa.string()),
                     "ndv_exact": pa.array(exact, pa.int64()),
                     "hll_ok": pa.array(ok, pa.bool_())})


def salted_join_events_customer(sf_dir: str):
    """Skew-salted hash join (the north rule's "explicit salting for
    skewed hosts"): hot user_ids detected via bounded Misra-Gries,
    their fact rows spread over 4 salts, matching customer rows
    replicated per salt — output identical to the plain hash join."""
    from peri_ray.stages.joins import salted_hash_join

    events = _read(sf_dir, "events", ["event_id", "user_id"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # fair-share threshold (rows / n_buckets) scales with the input;
    # the skew unit tests prove engagement on genuinely hot keys
    return salted_hash_join(events, customer, "user_id", "c_custkey",
                            ["event_id"], ["c_mktsegment"], how="left",
                            replication=4, mg_k=4096)


def percentile_cont_events(sf_dir: str):
    """Interpolated percentile_cont on a continuous column via
    KLL-guided exact selection of both bracketing order statistics;
    interpolation mirrors DuckDB's multiply-by-weights formula so the
    doubles hash-match."""
    from peri_ray.stages.stats import percentile_cont_continuous

    ds = _read(sf_dir, "events", ["value"])
    return percentile_cont_continuous(ds, "value",
                                      qs=(0.25, 0.5, 0.75, 0.9))


def latest_event_per_user(sf_dir: str):
    """Keep-newest-per-key — THE recrawl shape (newest capture per
    url): ``top_k_per_group`` with k=1, ts descending, event_id
    ascending tie-break.  Per-block partials mean only one candidate
    row per (key, block) crosses the exchange."""
    from peri_ray.stages.stats import top_k_per_group

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return top_k_per_group(ds, key="user_id", order_col="ts", k=1,
                           descending=True, tiebreak="event_id")


def mode_event_type_per_user(sf_dir: str):
    """Most frequent event_type per user (deterministic ties) — the
    categorical argmax every per-entity profile needs."""
    from peri_ray.stages.stats import mode_per_group

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return mode_per_group(ds, key="user_id", val="event_type")


def repaired_lang_documents(sf_dir: str):
    """Constraint-driven repair: enum-violating lang values replaced by
    the most frequent VALID lang (two-pass broadcast, zero shuffle);
    nulls untouched."""
    from peri_ray.stages.checks import repair_enum

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return repair_enum(ds, "lang", LANGS)


def expectations_documents(sf_dir: str):
    """Great-Expectations-style corpus contract: volume, completeness,
    range, enum-membership and uniqueness assertions evaluated in ONE
    fused counting pass (+ the shared two-phase exchange for unique);
    every observable is an integer so the verdict hash-matches SQL."""
    from peri_ray.stages.expect import expectation_suite

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return expectation_suite(ds, [
        ("row_count_between", 1, 10**12),
        ("null_fraction_at_most", "lang", 0.05),
        ("min_gte", "n_chars", 0),
        ("max_lte", "n_chars", 100_000),
        ("values_between", "n_chars", 1, 50_000),
        ("values_in_set", "lang", LANGS),
        ("unique", "doc_id"),
        ("regex_match_fraction_at_least", "lang", "^[a-z]{2}$", 0.9),
        ("int_sum_between", "n_chars", 1, 10**15),
        ("distinct_count_between", "lang", 2, 50),
        ("fd_holds", "doc_id", "lang"),
    ])


def hash_split_documents(sf_dir: str):
    """Deterministic 80/10/10 train/val/test partition of the corpus
    by integer Knuth hash of doc_id — disjoint, exhaustive,
    reproducible across block layouts; summary is all-integer so the
    SQL twin hash-matches (see stats.hash_split_summary)."""
    from peri_ray.stages.stats import hash_split_summary

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return hash_split_summary(ds, id_col="doc_id", val_col="n_chars")


def corr_lineitem(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extendedprice
    (algebraic combiners, driver merge — no shuffle)."""
    from peri_ray.stages.stats import grouped_corr

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")


def decontamination_pairs(sf_dir: str):
    """Similarity-level train/eval decontamination: EXACT bipartite
    word-bigram Jaccard join (threshold 0.8) between the training
    corpus and a derived eval set — every (train_id, eval_id) pair an
    eval doc is near-dup-contaminated by.  The eval side is documents
    with doc_id % 13 == 0 plus a two-token suffix (mirrored in SQL),
    so long docs qualify through their own source (J = n/(n+2)) and
    short ones fall below the cut — recall of the prefix filter is
    oracle-checked, not just precision.  Same-side near-dups (the
    corpus's exact-dup families) must NOT appear: the R-S join forms
    cross pairs only."""
    from peri_ray.stages.dedup import jaccard_similarity_join_bipartite

    train = _read(sf_dir, "documents", ["doc_id", "text"])
    ev = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _eval_slice_batch, batch_format="pyarrow")
    pairs = jaccard_similarity_join_bipartite(train, ev, threshold=0.8)
    t = _collect(pairs, pa.schema([("id_a", pa.int64()),
                                   ("id_b", pa.int64()),
                                   ("jaccard", pa.float64())]))
    return pa.table({
        "train_id": t.column("id_a"),
        "eval_id": t.column("id_b"),
        "jaccard": pc.round(t.column("jaccard"), ndigits=6,
                            round_mode="half_towards_infinity"),
    })


def incremental_near_dedup_recrawl(sf_dir: str):
    """Incremental NEAR-dedup of a new crawl against the indexed base
    corpus (the production shape: dedupe the delta without
    re-processing 100 TB): the bipartite exact similarity join flags
    every recrawled page whose text is a word-bigram near-dup
    (J >= 0.8) of SOME base page.  One row per flagged new page:
    (doc_id, n_matches, best_jaccard, dup_of = min base id among the
    best-jaccard matches — deterministic under ties).  Exact-dup
    recrawls (unchanged pages) land at J = 1; 'updated' pages qualify
    only when long enough — the same recall-is-oracle-checked property
    as decontamination_pairs."""
    from peri_ray.stages.dedup import jaccard_similarity_join_bipartite

    base = _read(sf_dir, "documents", ["doc_id", "text"])
    new = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _recrawl_batch, batch_format="pyarrow")
    pairs = jaccard_similarity_join_bipartite(base, new, threshold=0.8)
    t = _collect(pairs, pa.schema([("id_a", pa.int64()),
                                   ("id_b", pa.int64()),
                                   ("jaccard", pa.float64())]))
    # per-new-doc verdict (tiny: bounded by flagged pairs)
    g = (t.group_by("id_b")
         .aggregate([("jaccard", "max"), ("id_a", "count")]))
    best, nm = {}, {}
    for r in g.to_pylist():
        best[r["id_b"]] = r["jaccard_max"]
        nm[r["id_b"]] = r["id_a_count"]
    dup_of: dict[int, int] = {}
    for b, a, j in zip(t.column("id_b").to_pylist(),
                       t.column("id_a").to_pylist(),
                       t.column("jaccard").to_pylist()):
        if j == best[b]:
            cur = dup_of.get(b)
            dup_of[b] = a if cur is None else min(cur, a)
    ids = sorted(best)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_matches": pa.array([nm[i] for i in ids], pa.int64()),
        "best_jaccard": pc.round(
            pa.array([best[i] for i in ids], pa.float64()), ndigits=6,
            round_mode="half_towards_infinity"),
        "dup_of": pa.array([dup_of[i] for i in ids], pa.int64()),
    })


def quote_containment_pairs(sf_dir: str):
    """Quote / doc-in-doc detection: asymmetric containment join
    between derived fragments (first 8 tokens of every 19th doc —
    SQL-mirrored) and the full corpus at C >= 0.9.  A fragment's
    bigrams are a subset of its source's, so every fragment is found
    in its source at C = 1.0 (guaranteed positives); additional hits
    are genuine cross-doc quotes under the small synthetic vocabulary.
    Exact — the prefix filter's recall is oracle-checked."""
    from peri_ray.stages.dedup import containment_join_bipartite

    corpus = _read(sf_dir, "documents", ["doc_id", "text"])
    frags = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fragment_slice_batch, batch_format="pyarrow")
    pairs = containment_join_bipartite(frags, corpus, threshold=0.9)
    t = _collect(pairs, pa.schema([("id_a", pa.int64()),
                                   ("id_b", pa.int64()),
                                   ("jaccard", pa.float64())]))
    return pa.table({
        "frag_id": t.column("id_a"),
        "doc_id": t.column("id_b"),
        "containment": pc.round(t.column("jaccard"), ndigits=6,
                                round_mode="half_towards_infinity"),
    })


def indexed_probe_recrawl(sf_dir: str):
    """The production incremental-dedup shape: sign the base corpus
    ONCE into a persisted parquet MinHash index, then probe the
    recrawl delta against signatures alone — base text is never
    re-read.  Returns (base_id, new_id, est_jaccard) at slot-agreement
    >= 0.9.  Deterministic (seeded OPH) but signature-level, so
    rows-only under the driver gate; the unit suite pins probe ==
    direct two-sided computation."""
    import os
    import shutil
    import tempfile

    from peri_ray.stages.dedup import probe_minhash_index, write_minhash_index

    # private scratch dir per invocation: a fixed path would race a
    # concurrent run's rmtree against this one's probe reads
    root = tempfile.mkdtemp(prefix="peri_minhash_idx_")
    idx_dir = os.path.join(root, "index")
    try:
        base = _read(sf_dir, "documents", ["doc_id", "text"])
        write_minhash_index(base, idx_dir)
        new = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            _recrawl_batch, batch_format="pyarrow")
        flagged = probe_minhash_index(new, idx_dir, bands=8, threshold=0.9)
        return _collect(flagged, pa.schema([("id_a", pa.int64()),
                                            ("id_b", pa.int64()),
                                            ("est_jaccard", pa.float64())]))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _text_as_media_batch(t: pa.Table) -> pa.Table:
    """Documents' text bytes as opaque media payloads (the shared
    synthetic-codec staging for the image/audio phash queries)."""
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    return pa.table({
        "media_id": t.column("doc_id").combine_chunks().cast(pa.int64()),
        "payload": txt.cast(pa.binary()),
    })


def image_phash_near_dups(sf_dir: str):
    """Image-modality near-dedup: every document's text bytes stand in
    as an opaque image payload (the synthetic-codec contract), each
    payload gets a 64-bit positional aHash (actor pool; window means
    standing in for the 8×8 pixel grid — a HISTOGRAM hash collapsed
    this small-alphabet corpus onto 2 values), and banded Hamming
    (distance ≤ 3) finds near-duplicate imagery.  Rows-only (the codec
    has no SQL twin); the unit suite pins planted byte-level twins."""
    from peri_ray.stages.dedup import hamming_near_dups_on_hashes
    from peri_ray.stages.multimodal import perceptual_hash_images

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    media = docs.map_batches(_text_as_media_batch, batch_format="pyarrow")
    hashes = perceptual_hash_images(media, decoder="fake")
    pairs = hamming_near_dups_on_hashes(hashes, "phash", "media_id",
                                        bands=4)
    return _collect(pairs, pa.schema([("id_a", pa.int64()),
                                      ("id_b", pa.int64())]))


def audio_phash_near_dups(sf_dir: str):
    """Audio-modality near-dedup, mirroring image_phash_near_dups:
    text bytes as opaque track payloads, 64-window frame-energy
    fingerprint (actor pool), banded Hamming ≤ 3.  Rows-only."""
    from peri_ray.stages.dedup import hamming_near_dups_on_hashes
    from peri_ray.stages.multimodal import perceptual_hash_audio

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    media = docs.map_batches(_text_as_media_batch, batch_format="pyarrow")
    hashes = perceptual_hash_audio(media, featurizer="fake")
    pairs = hamming_near_dups_on_hashes(hashes, "phash", "media_id",
                                        bands=4)
    return _collect(pairs, pa.schema([("id_a", pa.int64()),
                                      ("id_b", pa.int64())]))


def semantic_decontamination_pairs(sf_dir: str):
    """Embedding-space train/eval decontamination: exact bipartite
    cosine join (threshold 0.8, rounded-6) between the corpus
    embeddings and a derived eval set (vec_id % 13 == 0 with +0.05 on
    every dimension — SQL-mirrored).  Measured on this table the
    derived vectors sit at cos ≈ 0.92 against their sources while the
    background cross-cosine tops out ≈ 0.45, so the pair set is exactly
    the contamination and far from the round boundary."""
    from peri_ray.stages.similarity import cosine_join_bipartite

    train = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _ev(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        vec = t.column("embedding").combine_chunks()
        keep = pc.and_(pa.array(idn % 13 == 0), pc.is_valid(vec))
        sub = pa.table({"vec_id": ids, "embedding": vec}).filter(keep)
        import numpy as np

        from peri_ray.stages.similarity import _as_matrix

        m = _as_matrix(sub.column("embedding"), np.float64) + 0.05
        return pa.table({"vec_id": sub.column("vec_id"),
                         "embedding": pa.array(list(m),
                                               pa.list_(pa.float64()))})

    ev = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        _ev, batch_format="pyarrow")
    pairs = cosine_join_bipartite(train, ev, threshold=0.8)
    t = _collect(pairs, pa.schema([("id_a", pa.int64()),
                                   ("id_b", pa.int64()),
                                   ("cos", pa.float64())]))
    return pa.table({"train_id": t.column("id_a"),
                     "eval_id": t.column("id_b"),
                     "cos": t.column("cos")})


def _fragment_slice_batch(t: pa.Table) -> pa.Table:
    """Deterministic fragments for the containment oracle: docs with
    doc_id % 19 == 0, non-null text, first 8 whitespace tokens joined
    by a single space (mirrored verbatim in the SQL twin)."""
    ids = t.column("doc_id").combine_chunks()
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    idn = ids.to_numpy(zero_copy_only=False)
    keep = pc.and_(pa.array(idn % 19 == 0), pc.is_valid(txt))
    sub = pa.table({"doc_id": ids, "text": txt}).filter(keep)
    # ASCII \s class spelled out (Arrow RE2 parity with SQL '\s+')
    parts = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(sub.column("text").combine_chunks()),
        r"[\t\n\f\r ]+")
    frag = pc.binary_join(pc.list_slice(parts, 0, 8), " ")
    return pa.table({"doc_id": sub.column("doc_id"), "text": frag})


def _eval_slice_batch(t: pa.Table) -> pa.Table:
    """Deterministic 'eval set' for the decontamination oracle: docs
    with doc_id % 13 == 0, non-null text, suffixed ' eval suffix'
    (mirrored verbatim in the SQL twin)."""
    ids = t.column("doc_id").combine_chunks()
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    idn = ids.to_numpy(zero_copy_only=False)
    keep = pc.and_(pa.array(idn % 13 == 0), pc.is_valid(txt))
    sub = pa.table({"doc_id": ids, "text": txt}).filter(keep)
    new_txt = pc.binary_join_element_wise(
        sub.column("text").combine_chunks(),
        pa.array(["eval suffix"] * sub.num_rows), " ")
    return pa.table({"doc_id": sub.column("doc_id"), "text": new_txt})


def jaccard_join_pairs(sf_dir: str):
    """EXACT word-bigram Jaccard self-join at threshold 0.8 — the
    n-gram-Jaccard dedup family member with a completeness guarantee
    (AllPairs prefix filtering; see dedup.jaccard_similarity_join).
    The oracle is the literal all-pairs SQL: every pair the prefix
    filter would miss shows up as a hash mismatch, so recall itself is
    oracle-checked, not just precision."""
    from peri_ray.stages.dedup import jaccard_similarity_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = jaccard_similarity_join(ds, threshold=0.8)
    t = _collect(pairs, pa.schema([("id_a", pa.int64()),
                                   ("id_b", pa.int64()),
                                   ("jaccard", pa.float64())]))
    # half-away, matching SQL ROUND: J = c/d IS dyadic (d = 128 or 640
    # distinct bigrams gives exact 7th-decimal-5 ties where half-even
    # and half-away disagree)
    return t.set_column(2, "jaccard",
                        pc.round(t.column("jaccard"), ndigits=6,
                                 round_mode="half_towards_infinity"))


def event_interarrival(sf_dir: str):
    """Per-user consecutive-event gap stats — the lag()/lead() window
    family; one groupby(user) exchange, exact integer microseconds."""
    from peri_ray.stages.temporal import interarrival_stats

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return interarrival_stats(ds)


def exact_quantiles_lineitem(sf_dir: str):
    """EXACT percentile_disc over low-cardinality measures via
    value-count partials + driver merge (no shuffle, no sketch error)."""
    from peri_ray.stages.stats import exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_linenumber"])
    return exact_quantiles(ds, ["l_quantity", "l_linenumber"])


def rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(status, year): three aggregation levels from one
    input pass (finest-level partials, coarser levels derived)."""
    from peri_ray.stages.stats import rollup_counts

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderdate", "o_totalprice"])

    def _yr(t: pa.Table) -> pa.Table:
        # per-row integer cents: sums of exact integers are
        # order-independent, unlike ROUND(float_sum * 100) which can
        # land on a different cent per partial-combine layout.  The
        # int64 cast here keeps the per-row values exact; the combine
        # path's shared float64 sum stays exact up to 2^53 total cents
        # (~$90T per group) — far beyond any money column here.
        cents = pc.round(
            pc.multiply(t.column("o_totalprice").combine_chunks(),
                        pa.scalar(100.0)),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({
            "o_orderstatus": t.column("o_orderstatus"),
            "yr": pc.year(t.column("o_orderdate").combine_chunks()),
            "o_totalprice": cents,
        })

    t = rollup_counts(ds.map_batches(_yr, batch_format="pyarrow"),
                      "o_orderstatus", "yr", "o_totalprice")
    t = t.rename_columns(["status", "year", "cnt", "sum_price_cents"])
    # sums are already exact integer cents (see _yr); plain cast
    return t.set_column(3, "sum_price_cents",
                        t.column("sum_price_cents").cast(pa.int64()))


def cube_orders(sf_dir: str):
    """GROUP BY CUBE(status, year): four aggregation levels from one
    input pass (adds the (ALL, year) margin to the rollup)."""
    from peri_ray.stages.stats import cube_counts

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderdate", "o_totalprice"])

    def _yr(t: pa.Table) -> pa.Table:
        # per-row integer cents: sums of exact integers are
        # order-independent, unlike ROUND(float_sum * 100) which can
        # land on a different cent per partial-combine layout.  The
        # int64 cast here keeps the per-row values exact; the combine
        # path's shared float64 sum stays exact up to 2^53 total cents
        # (~$90T per group) — far beyond any money column here.
        cents = pc.round(
            pc.multiply(t.column("o_totalprice").combine_chunks(),
                        pa.scalar(100.0)),
            round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({
            "o_orderstatus": t.column("o_orderstatus"),
            "yr": pc.year(t.column("o_orderdate").combine_chunks()),
            "o_totalprice": cents,
        })

    t = cube_counts(ds.map_batches(_yr, batch_format="pyarrow"),
                    "o_orderstatus", "yr", "o_totalprice")
    t = t.rename_columns(["status", "year", "cnt", "sum_price_cents"])
    # sums are already exact integer cents (see _yr); plain cast
    return t.set_column(3, "sum_price_cents",
                        t.column("sum_price_cents").cast(pa.int64()))


def clicked_and_viewed(sf_dir: str):
    """Set intersection (INTERSECT shape) over NON-NULL keys: users
    who clicked AND viewed, via two distinct-user aggregations through
    the hash-partitioned semi join.  SQL INTERSECT would additionally
    match NULL with NULL; equi-join key semantics don't, so the
    contract (and the SQL twin) exclude null keys explicitly."""
    from peri_ray.stages.joins import hash_join

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def _typed(want: str):
        def _f(t: pa.Table) -> pa.Table:
            uid = t.column("user_id").combine_chunks()
            keep = pc.and_(
                pc.equal(t.column("event_type").combine_chunks(), want),
                pc.is_valid(uid))
            return (t.filter(keep).select(["user_id"])
                    .group_by("user_id").aggregate([]))
        return _f

    clickers = ds.map_batches(_typed("click"), batch_format="pyarrow")
    viewers = ds.map_batches(_typed("view"), batch_format="pyarrow")
    out = hash_join(clickers, viewers, "user_id", "user_id", [], [],
                    how="semi")
    # per-block distinct partials are not globally distinct: collapse
    # the survivors (small by construction) once more
    t = _collect(out, pa.schema([("user_id", pa.int64())]))
    return t.group_by("user_id").aggregate([])


def tfidf_top_docs(sf_dir: str):
    """Top-3 TF-IDF terms per document — shuffle-free scoring after a
    broadcast DF pass; ranking on the rounded score for cross-engine
    determinism (see text._TfidfTopK)."""
    from peri_ray.stages.text import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(ds, k=3)


def pivot_orders_status(sf_dir: str):
    """Year x order-status pivot (wide counts) — FILTER(WHERE ...)
    aggregate shape with an explicit, deterministic column set."""
    from peri_ray.stages.stats import pivot_counts

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderdate"])

    def _yr(t: pa.Table) -> pa.Table:
        return pa.table({
            "yr": pc.year(t.column("o_orderdate").combine_chunks()),
            "o_orderstatus": t.column("o_orderstatus"),
        })

    return pivot_counts(ds.map_batches(_yr, batch_format="pyarrow"),
                        "yr", "o_orderstatus", ["F", "O", "P"])


def distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type — one hash-bucketed
    exchange of within-block-deduped pairs (see
    stats.grouped_distinct_count)."""
    from peri_ray.stages.stats import grouped_distinct_count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_distinct_count(ds, "event_type", "user_id")


def funnel_click_purchase(sf_dir: str):
    """Ordered click -> view -> purchase funnel over first-occurrence
    timestamps (strict ordering; ties do not advance)."""
    from peri_ray.stages.temporal import funnel_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_counts(ds, ["click", "view", "purchase"])


def running_totals_events(sf_dir: str):
    """Per-user running sum over (ts, event_id) order — cumulative
    window family; exact BIGINT micro-units so every intermediate
    total hash-matches the SQL window (see temporal.running_totals)."""
    from peri_ray.stages.temporal import running_totals

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    return running_totals(ds)


def revenue_by_nation(sf_dir: str):
    """Multi-way join showcase (TPC-H Q5 shape): lineitem x orders is
    the one large-large hash join; customer and nation attach by
    broadcast (dims deduped + ray.put once); revenue collapses to
    per-batch partials per nation before a tiny driver merge."""
    from peri_ray.stages.joins import broadcast_join, hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    o_n = broadcast_join(orders, cust, "o_custkey", "c_custkey",
                         ["c_nationkey"])
    o_n = broadcast_join(o_n, nation, "c_nationkey", "n_nationkey",
                         ["n_name"])
    j = hash_join(li, o_n, "l_orderkey", "o_orderkey",
                  ["l_extendedprice", "l_discount"], ["n_name"])

    def _part(t: pa.Table) -> pa.Table:
        # integer cents end to end: per-row ROUND(rev*100) half-away is
        # order-independent and the int64 sum is exact, so the result
        # is identical at any partial-combine layout (the rounded-float
        # sum this replaced was layout-sensitive near .005 boundaries)
        rev = pc.multiply(
            t.column("l_extendedprice").combine_chunks(),
            pc.subtract(pa.scalar(1.0), t.column("l_discount").combine_chunks()))
        cents = pc.round(pc.multiply(rev, pa.scalar(100.0)),
                         round_mode="half_towards_infinity").cast(pa.int64())
        g = (pa.table({"n_name": t.column("n_name"), "rev": cents})
             .group_by("n_name").aggregate([("rev", "sum")]))
        return g.rename_columns(["n_name", "rev"])

    merged = (pa.Table.from_pylist(
        j.map_batches(_part, batch_format="pyarrow").take_all(),
        schema=pa.schema([("n_name", pa.string()), ("rev", pa.int64())]))
        .group_by("n_name").aggregate([("rev", "sum")]))
    return pa.table({
        "n_name": merged.column("n_name"),
        "revenue_cents": merged.column("rev_sum"),
    })


def grouped_quantiles_lineitem(sf_dir: str):
    """Exact per-group percentile_disc (median + p90 of l_quantity per
    returnflag) — GROUP BY + quantile with no sort shuffle."""
    from peri_ray.stages.stats import grouped_exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_exact_quantiles(ds, "l_returnflag", "l_quantity")


def clicked_no_purchase(sf_dir: str):
    """Set-difference composition: users who clicked but never
    purchased — two distinct-user aggregations anti-joined through the
    existing hash-partitioned join (EXCEPT shape)."""
    from peri_ray.stages.joins import hash_join

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def _typed(want: str):
        def _f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("event_type").combine_chunks(), want)
            g = (t.filter(keep).select(["user_id"])
                 .group_by("user_id").aggregate([]))
            return g
        return _f

    clickers = ds.map_batches(_typed("click"), batch_format="pyarrow")
    buyers = ds.map_batches(_typed("purchase"), batch_format="pyarrow")
    out = hash_join(clickers, buyers, "user_id", "user_id", [], [],
                    how="anti")
    # per-block distinct partials are not globally distinct: collapse
    # the survivors (small by construction) once more
    t = _collect(out, pa.schema([("user_id", pa.int64())]))
    return t.group_by("user_id").aggregate([])


def heavy_hitter_terms_docs(sf_dir: str):
    """Exact over-threshold terms via Misra-Gries candidates + exact
    recount — bounded memory in both passes, unlike a full-vocabulary
    groupby (see text.heavy_hitter_terms)."""
    from peri_ray.stages.text import heavy_hitter_terms

    ds = _read(sf_dir, "documents", ["text"])
    return heavy_hitter_terms(ds, threshold=800)


def top_terms_per_lang(sf_dir: str):
    """Composition showcase: per-language top-3 terms by occurrence —
    token explode -> one (lang, term) groupby-sum of per-block partials
    -> the existing group-wise top-k merge.  Ties break on term asc to
    match the row_number twin."""
    from peri_ray.stages.stats import top_k_per_group

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def _pairs(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t.column("text").combine_chunks()),
                       pc.is_valid(t.column("lang").combine_chunks()))
        tt = t.filter(keep)
        txt = tt.column("text").combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        parts = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
        lang = tt.column("lang").combine_chunks().take(
            pa.array(np.repeat(np.arange(len(parts), dtype=np.int64),
                               pc.list_value_length(parts).to_numpy(
                                   zero_copy_only=False))))
        g = (pa.table({"lang": lang, "term": pc.list_flatten(parts)})
             .group_by(["lang", "term"]).aggregate([([], "count_all")]))
        return g.rename_columns(["lang", "term", "n"])

    from peri_ray.stages.dedup import grouped_sum_via_buckets

    # (lang, term) cardinality ~ vocabulary x languages: bucketed sum
    counts = grouped_sum_via_buckets(
        ds.map_batches(_pairs, batch_format="pyarrow"), ["lang", "term"], "n")

    def _shape(t: pa.Table) -> pa.Table:
        return t.set_column(2, "n", t.column("n").cast(pa.int64()))

    shaped = counts.map_batches(_shape, batch_format="pyarrow")
    return top_k_per_group(shaped, key="lang", order_col="n", k=3,
                           descending=True, tiebreak="term")


def lineitems_of_big_orders(sf_dir: str):
    """Bloom-pruned semi join with a selective dim (orders filtered to
    the price tail): fact rows the Bloom proves partner-less never
    enter the exchange; survivors verify through the exact hash semi
    join, so the answer is exact at any false-positive rate."""
    from peri_ray.stages.joins import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def _big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("o_totalprice").combine_chunks(),
                                   450000.0)).select(["o_orderkey"])

    big = orders.map_batches(_big, batch_format="pyarrow")
    out = bloom_semi_join(li, big, "l_orderkey", "o_orderkey",
                          ["l_quantity"])
    return _collect(out, pa.schema([("l_orderkey", pa.int64()),
                                    ("l_quantity", pa.float64())]))


def ntile_events_by_user(sf_dir: str):
    """NTILE(4) per user over (value, event_id) order — position-based
    quartile assignment with SQL's exact uneven-bucket rule."""
    from peri_ray.stages.stats import ntile_per_group

    ds = _read(sf_dir, "events", ["user_id", "value", "event_id"])
    return ntile_per_group(ds, "user_id", "value", "event_id", n_tiles=4)


def activity_full_outer(sf_dir: str):
    """FULL OUTER join: per-user event counts against the customer
    dim — unmatched sides survive with typed nulls (customers who
    never fired an event, users outside the customer table)."""
    from peri_ray.stages.joins import hash_join

    ev = _read(sf_dir, "events", ["user_id"])

    def _cnt(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t.column("user_id").combine_chunks()})
             .group_by("user_id").aggregate([([], "count_all")]))
        return g.rename_columns(["user_id", "n"])

    counts = ev.map_batches(_cnt, batch_format="pyarrow").groupby(
        "user_id").sum("n")

    def _shape(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["user_id", "n_events"])
        return t.set_column(1, "n_events",
                            t.column("n_events").cast(pa.int64()))

    left = counts.map_batches(_shape, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out = hash_join(left, cust, "user_id", "c_custkey",
                    ["n_events"], ["c_acctbal"], how="full")
    return _collect(out, pa.schema([("user_id", pa.int64()),
                                    ("n_events", pa.int64()),
                                    ("c_acctbal", pa.float64())]))


def activity_right_outer(sf_dir: str):
    """RIGHT OUTER join: every customer survives, event counts null
    for customers who never fired an event (completes the join
    matrix: inner/left/right/full/semi/anti)."""
    from peri_ray.stages.joins import hash_join

    ev = _read(sf_dir, "events", ["user_id"])

    def _cnt(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t.column("user_id").combine_chunks()})
             .group_by("user_id").aggregate([([], "count_all")]))
        return g.rename_columns(["user_id", "n"])

    counts = ev.map_batches(_cnt, batch_format="pyarrow").groupby(
        "user_id").sum("n")

    def _shape(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["user_id", "n_events"])
        return t.set_column(1, "n_events",
                            t.column("n_events").cast(pa.int64()))

    left = counts.map_batches(_shape, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    out = hash_join(left, cust, "user_id", "c_custkey",
                    ["n_events"], ["c_acctbal"], how="right")
    return _collect(out, pa.schema([("user_id", pa.int64()),
                                    ("n_events", pa.int64()),
                                    ("c_acctbal", pa.float64())]))


def rank_events_by_user(sf_dir: str):
    """rank() per user over value — ties share a rank (gaps after),
    deterministic without an id tiebreak."""
    from peri_ray.stages.stats import rank_per_group

    ds = _read(sf_dir, "events", ["user_id", "value", "event_id"])
    return rank_per_group(ds, "user_id", "value", "event_id")


def chi2_lang_source(sf_dir: str):
    """Pearson chi-square independence between lang and source —
    zero cells included (a sparse GROUP BY would skip them)."""
    from peri_ray.stages.checks import chi_square_independence

    ds = _read(sf_dir, "documents", ["lang", "source"])
    r = chi_square_independence(ds, "lang", "source")
    return pa.table({"chi2": pa.array([round(r["chi2"], 6)], pa.float64()),
                     "dof": pa.array([r["dof"]], pa.int64()),
                     "n": pa.array([r["n"]], pa.int64())})


def event_sequences(sf_dir: str):
    """Ordered per-user event-type sequences (string_agg ORDER BY ts,
    event_id) — session path assembly."""
    from peri_ray.stages.stats import collect_sorted

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    return collect_sorted(ds, "user_id", "event_type", "ts", "event_id")


def duplicate_user_event_pairs(sf_dir: str):
    """Composite-key uniqueness over (user_id, event_type): every pair
    a user repeats, with its multiplicity."""
    from peri_ray.stages.checks import duplicate_composite_keys

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    t = _collect(duplicate_composite_keys(ds, ["user_id", "event_type"]),
                 pa.schema([("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("cnt", pa.int64())]))
    return t


def cumulative_users(sf_dir: str):
    """Cumulative unique users per day via the first-seen reduction
    (COUNT(DISTINCT) OVER a running frame is not distributable as
    such; each user counts once, at min(ts))."""
    from peri_ray.stages.temporal import cumulative_distinct

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return cumulative_distinct(ds)


def retention_matrix(sf_dir: str):
    """Cohort retention: users by first-seen day, counted at each
    later activity-day offset (seconds units on both axes)."""
    from peri_ray.stages.temporal import retention_cohorts

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return retention_cohorts(ds)


def exact_quantiles_events_value(sf_dir: str):
    """Exact percentile_disc on a CONTINUOUS column (distinct ~ rows)
    via KLL-guided distributed selection — sketch brackets the rank,
    one exact pass selects inside the bracket."""
    from peri_ray.stages.stats import exact_quantile_continuous

    ds = _read(sf_dir, "events", ["value"])
    return exact_quantile_continuous(ds, "value", qs=(0.5, 0.9, 0.99))


def winsorized_events(sf_dir: str):
    """Winsorize value at exact [p01, p99]: the clip bounds come from
    KLL-guided exact selection (actual data values, so both engines
    clip at the identical doubles — no rounding needed), then one
    broadcast-scalar vectorized clip pass."""
    from peri_ray.stages.stats import exact_quantile_continuous

    ds = _read(sf_dir, "events", ["event_id", "value"])
    qt = exact_quantile_continuous(ds, "value", qs=(0.01, 0.99))
    vals = {round(q, 4): v for q, v in zip(qt.column("q").to_pylist(),
                                           qt.column("value").to_pylist())}
    lo, hi = vals[0.01], vals[0.99]

    def _clip(t: pa.Table) -> pa.Table:
        v = t.column("value").combine_chunks().cast(pa.float64())
        # skip_nulls=False: a null value stays null — the default would
        # fabricate p01 for missing data (and DuckDB least/greatest
        # skip nulls the same wrong way, so the twin needs the CASE)
        return pa.table({
            "event_id": t.column("event_id"),
            "value_w": pc.min_element_wise(
                pc.max_element_wise(v, lo, skip_nulls=False), hi,
                skip_nulls=False),
        })

    return ds.map_batches(_clip, batch_format="pyarrow")


def mad_outliers_events(sf_dir: str):
    """Median-absolute-deviation outliers on events.value — robust
    where mean/std are dragged by the very outliers under test."""
    from peri_ray.stages.stats import mad_outliers

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return mad_outliers(ds, "value", "event_id", k=5.0)


def cume_dist_events(sf_dir: str):
    """cume_dist() per user over value — exact float parity with the
    SQL window (same division, same tie semantics)."""
    from peri_ray.stages.stats import rank_per_group

    ds = _read(sf_dir, "events", ["user_id", "value", "event_id"])
    return rank_per_group(ds, "user_id", "value", "event_id",
                          method="cume_dist")


def benford_first_digit(sf_dir: str):
    """First-significant-digit histogram of order totals with the
    Benford expectation chi-square — a books-cooked signal for numeric
    columns spanning magnitudes."""
    from peri_ray.stages.checks import benford_check

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    return benford_check(ds, "o_totalprice")


def curation_report(sf_dir: str):
    """End-to-end corpus curation with first-failing-gate attribution:
    schema-invalid -> missing lang -> too short -> exact dup; counts
    are mutually exclusive and sum to input_rows (oracle-checked)."""
    from peri_ray.pipelines.curation import run_curation

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    _, rep = run_curation(ds, DOCS_SPEC)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in rep.items()})


def curation_report_partitioned(sf_dir: str):
    """Same curation report through the RESUMABLE partitioned form
    (per-fragment annotated parquet + manifests, global victims
    exchange, per-fragment anti-joined output) — driver-gates the
    checkpoint path against the identical SQL twin the streaming form
    uses.  Checkpoint dir is a throwaway temp (one fragment at oracle
    scale)."""
    import os
    import tempfile

    from peri_ray.pipelines.curation import partitioned_curation

    with tempfile.TemporaryDirectory() as td:
        res = partitioned_curation(
            [os.path.join(sf_dir, "documents.parquet")], td, DOCS_SPEC,
            read_columns=["doc_id", "text", "lang", "n_chars"])
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in res["report"].items()})


def training_prep_report(sf_dir: str):
    """The composed end-to-end training-data preparation pipeline:
    validate → gate-attributed curation with exact dedup → MinHash
    near-dedup among the curated survivors → whitespace token budget →
    deterministic 80/10/10 hash split of the final corpus.  One row,
    every number SQL-expressible (the oracle twin chains the curation
    CTE, the shingle-Jaccard recursive-CTE closure, the token-count
    expression and the Knuth-hash split).

    Shape: the curated corpus is produced through the RESUMABLE
    partitioned form (annotated + curated parquet under a checkpoint
    dir — the production persist point), so every downstream consumer
    streams from parquet re-reads; nothing corpus-sized pins in the
    object store."""
    import os
    import tempfile

    from peri_ray.pipelines.curation import partitioned_curation
    from peri_ray.stages.dedup import near_dedup_victims as ndv
    from peri_ray.stages.joins import hash_join
    from peri_ray.stages.stats import hash_split_summary
    import ray.data as rd

    with tempfile.TemporaryDirectory() as td:
        res = partitioned_curation(
            [os.path.join(sf_dir, "documents.parquet")], td, DOCS_SPEC,
            read_columns=["doc_id", "text", "lang", "n_chars"])
        rep = res["report"]
        cur_dirs = [os.path.join(d, "curated") for d in res["output_dirs"]]
        cur_files = [os.path.join(d, f) for d in cur_dirs
                     if os.path.isdir(d)
                     for f in sorted(os.listdir(d)) if f.endswith(".parquet")]

        def curated():
            return rd.read_parquet(cur_files, columns=["doc_id", "text"])

        victims = ndv(curated(), threshold=0.8, bands=8,
                      num_perm=64).materialize()  # small: dup ids only
        n_near = victims.count()

        def final():
            return hash_join(curated(), victims, "doc_id", "doc_id",
                             ["text"], [], how="anti")

        tok = final().map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(pc.sum(token_count_batch(t).column("n_tokens"))
                     .as_py() or 0)], pa.int64())}),
            batch_format="pyarrow").sum("n")
        split = hash_split_summary(final(), id_col="doc_id")
        counts = {r["split"]: int(r["n_rows"]) for r in split.to_pylist()}

    row = dict(rep)
    row["near_dup_victims"] = int(n_near)
    row["final_rows"] = int(rep["curated_rows"]) - int(n_near)
    row["total_tokens"] = int(tok or 0)
    for s in ("train", "val", "test"):
        row[f"{s}_rows"] = counts.get(s, 0)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in row.items()})


def grouped_stats_lineitem(sf_dir: str):
    """GROUP BY + algebraic stat combiners: per-returnflag count /
    nulls / min / max / sum over two measures, per-batch partials +
    driver merge (no shuffle)."""
    from peri_ray.stages.stats import grouped_stats

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    # cents_sums: sum_v is an exact int64 SUM(ROUND(x*100)) — the
    # rounded-float sum this replaced drifts with partial layout
    return grouped_stats(ds, "l_returnflag",
                         ["l_quantity", "l_extendedprice"],
                         cents_sums=True)


def value_histogram_events(sf_dir: str):
    """Fixed-width numeric histogram (bin=10) over events.value —
    distribution profiling; per-batch bincount partials, driver merge."""
    from peri_ray.stages.stats import numeric_histogram

    ds = _read(sf_dir, "events", ["value"])
    return numeric_histogram(ds, "value", bin_width=10.0)


def value_outliers_events(sf_dir: str):
    """Two-pass z-score outlier flagging: global mean/std from streamed
    moment partials, broadcast into a vectorized filter pass."""
    from peri_ray.stages.stats import zscore_outliers

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return zscore_outliers(ds, "value", "event_id", threshold=3.0)


# ---------------------------------------------------------------------------
# web-corpus operators (stages/web.py): URL canonicalization, recrawl
# keep-latest, domain profile — over a deterministic messy-URL fixture
# derived from (doc_id, source) so the DuckDB twin rebuilds the exact
# same web_pages-shaped columns (BASELINE input_hint / FIXTURES F0).
# ---------------------------------------------------------------------------

_WEB_TS_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _attach_web_columns(t: pa.Table) -> pa.Table:
    """FIXTURE, not an operator: deterministic messy ``url`` +
    ``warc_ts`` from (doc_id, source).  Exercises every canonicalizer
    rule: scheme case is fixed but hosts get mixed case (m3=0), a
    www. prefix (m3=1), default ports (m5=0), trailing slashes (m4=0),
    utm_ tracking params (m6=0), unsorted params (m6=3), fragments
    (m9=0).  Ids 4g..4g+3 share host AND path, so the even pair
    (4g, 4g+2) collides post-canonicalization when g % 3 == 2 and the
    odd pair when g % 3 == 1 (same scheme, both query-free) — the
    keep-latest dedup has real work (~1 victim per 6 rows)."""
    ids = (t.column("doc_id").combine_chunks().cast(pa.int64())
           .to_numpy(zero_copy_only=False))
    src = t.column("source").combine_chunks().to_numpy(
        zero_copy_only=False).astype(str)
    hostcore = np.char.add(
        np.char.add("h", ((ids // 4) % 50).astype(str)), ".example.com")
    m2, m3 = ids % 2, ids % 3
    scheme = np.where(m2 == 0, "http://", "https://")
    host = np.where(m3 == 0, np.char.upper(hostcore),
                    np.where(m3 == 1, np.char.add("www.", hostcore),
                             hostcore))
    port = np.where(ids % 5 == 0, np.where(m2 == 0, ":80", ":443"), "")
    path = np.char.add(np.char.add("/p/", (ids // 4).astype(str)),
                       np.where(ids % 4 == 0, "/", ""))
    m6, m7 = ids % 6, (ids % 7).astype(str)
    query = np.where(
        m6 == 0,
        np.char.add(np.char.add(np.char.add("?utm_source=", src), "&id="),
                    m7),
        np.where(m6 == 3,
                 np.char.add(np.char.add("?b=", m7), "&a=1"), ""))
    frag = np.where(ids % 9 == 0, "#sec", "")
    url = np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
        scheme, host), port), path), query), frag)
    ts = (_WEB_TS_EPOCH_US + ((ids * 37) % 365) * 86_400_000_000
          + (ids % 24) * 3_600_000_000)
    return (t.append_column("url", pa.array(url, pa.string()))
            .append_column("warc_ts", pa.array(ts, pa.timestamp("us"))))


def canonical_urls_docs(sf_dir: str):
    """URL canonicalization (lowercase scheme/host, default ports,
    www., fragments, utm_ params, param sort, trailing slash) — one
    vectorized shuffle-free pass; the oracle re-implements the rules
    independently in SQL string/list functions."""
    from peri_ray.stages.web import canonicalize_urls

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    return (canonicalize_urls(ds)
            .map_batches(lambda t: t.select(["doc_id", "url",
                                             "canonical_url"]),
                         batch_format="pyarrow"))


def latest_crawl_per_url(sf_dir: str):
    """Recrawl dedup: newest capture per canonical URL (tie: smallest
    doc_id) — canonicalize + top_k_per_group(k=1); only one candidate
    row per (url, block) crosses the exchange."""
    from peri_ray.stages.web import canonicalize_urls, keep_latest_capture

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = canonicalize_urls(ds).map_batches(
        lambda t: t.select(["canonical_url", "doc_id", "warc_ts"]),
        batch_format="pyarrow")
    return keep_latest_capture(ds)


def domain_stats_docs(sf_dir: str):
    """Per-domain corpus profile (pages, distinct langs, total chars)
    over canonicalized hosts — per-batch Arrow group_by partials +
    driver merge; no shuffle (host cardinality ≪ rows)."""
    from peri_ray.stages.web import canonicalize_urls, domain_stats, host_of

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang", "n_chars"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds))
    return domain_stats(ds, host_col="host", lang_col="lang",
                        chars_col="n_chars")


# ---------------------------------------------------------------------------
# DSIR importance resampling (stages/text.py dsir_weights): target =
# in-corpus English subset, raw = whole corpus.
# ---------------------------------------------------------------------------


def _dsir_en_mask(t: pa.Table):
    """Target-model mask: documents with lang == 'en'."""
    import pyarrow.compute as pc

    return pc.equal(
        pc.fill_null(t.column("lang").combine_chunks().cast(pa.string()), ""),
        "en")


def dsir_weights_documents(sf_dir: str):
    """Per-doc DSIR importance weight (integer micro-nats) toward the
    English subset — two streaming passes + one vocab exchange; text
    never shuffles and the model broadcasts once."""
    from peri_ray.stages.text import dsir_weights

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_weights(ds, _dsir_en_mask)


def dsir_selected_docs(sf_dir: str):
    """DSIR selection: top-50 docs by importance weight (weight DESC,
    id ASC) — per-block top-k partials + driver merge, no global
    sort."""
    from peri_ray.stages.text import dsir_top_docs

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_top_docs(ds, _dsir_en_mask, k=50)


# ---------------------------------------------------------------------------
# Web-corpus filters (stages/web.py): extraction invariant, per-domain
# quota, blocklist — over the same deterministic web fixture.
# ---------------------------------------------------------------------------


def _attach_html_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: html rebuilt from text in the generator's shape
    (peri_ray/generate.py web_pages), with a deterministic corruption
    for doc_id % 97 == 0 (an 'X' appended inside <p>…</p>) so the
    extraction-invariant check has real violations.  Null text → null
    html."""
    ids = t.column("doc_id").combine_chunks().cast(pa.int64())
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    ids_np = ids.to_numpy(zero_copy_only=False)
    tail = pa.array(np.where(ids_np % 97 == 0, "X", "").tolist(),
                    pa.string())
    html = pc.binary_join_element_wise(
        pa.scalar("<html><head><title>d"), ids.cast(pa.string()),
        pa.scalar("</title></head><body><p>"), txt, tail,
        pa.scalar("</p></body></html>"), "",
        null_handling="emit_null")
    return t.append_column("html", html.cast(pa.binary()))


def extraction_invariant_docs(sf_dir: str):
    """North-rule per-row invariant: re-extract text from html and
    report every (doc_id, n_text, n_extracted) where the stored text
    IS DISTINCT FROM the extraction — streaming, violation-bounded
    output (the fixture corrupts doc_id % 97 == 0)."""
    from peri_ray.stages.web import extraction_mismatches

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_attach_html_fixture, batch_format="pyarrow")
    return extraction_mismatches(ds)


def host_quota_docs(sf_dir: str):
    """Per-domain quota: keep ≤ 3 pages per host preferring largest
    n_chars (tie: smallest doc_id) — top_k_per_group, ≤ k candidates
    per (host, block) cross the exchange."""
    from peri_ray.stages.web import canonicalize_urls, host_of, host_quota

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        lambda t: t.select(["host", "doc_id", "n_chars"]),
        batch_format="pyarrow")
    return host_quota(ds, host_col="host", order_col="n_chars", k=3,
                      tiebreak="doc_id")


BLOCKED_HOSTS_FIXTURE = ["h7.example.com", "h23.example.com",
                         "h41.example.com"]
URL_PATTERNS_FIXTURE = [r"[?&]utm_", r"#sec$"]


def blocklist_report_docs(sf_dir: str):
    """Domain/URL blocklist (UT1-style): report dropped pages with
    rule attribution — 'blocked_host' (domain or any subdomain, one
    suffix-anchored RE2 alternation) checked before 'url_pattern'."""
    from peri_ray.stages.web import (blocklist_filter, canonicalize_urls,
                                     host_of)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds))
    return blocklist_filter(ds, BLOCKED_HOSTS_FIXTURE,
                            URL_PATTERNS_FIXTURE, report=True)


def ppl_bucket_documents(sf_dir: str):
    """CCNet-style perplexity bucketing: head/middle/tail by per-token
    unigram NLL (integer micro-nats) against exact tercile cutoffs
    from KLL-guided distributed selection."""
    from peri_ray.stages.text import ppl_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ppl_buckets(ds)


# ---------------------------------------------------------------------------
# statistical-drift + regression profiling additions (stages/checks.py
# js_divergence / binned_psi_drift / ks_two_sample, stages/stats.py
# grouped_regression)
# ---------------------------------------------------------------------------


def regression_lineitem(sf_dir: str):
    """Per-group OLS slope/intercept (extendedprice vs quantity by
    returnflag) — exact integer-cents algebraic partials, python-int
    driver merge; the SQL twin repeats the closed form over HUGEINT
    sums so the doubles match bit-for-bit."""
    from peri_ray.stages.stats import grouped_regression

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_regression(ds, "l_returnflag", "l_quantity",
                              "l_extendedprice", x_scale=1, y_scale=100)


def js_drift_event_type(sf_dir: str):
    """Jensen-Shannon drift of event_type vs a uniform reference —
    symmetric/bounded alternative to PSI, same histogram partials."""
    from peri_ray.stages.checks import js_divergence, histogram

    ds = _read(sf_dir, "events", ["event_type"])
    obs = histogram(ds, "event_type")
    ref = {k: 0.2 for k in ["click", "view", "signup", "purchase", "error"]}
    score = js_divergence(obs, ref)
    return pa.table({"js": pa.array([round(score, 6)], pa.float64())})


def numeric_psi_value_drift(sf_dir: str):
    """Binned numeric PSI between two deterministic halves of events
    (event_id parity): floor(value/25) bins, one streaming (bin, side)
    count pass — the numeric sibling of the categorical PSI check."""
    from peri_ray.stages.checks import binned_psi_drift

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return binned_psi_drift(ds, "value", bin_width=25.0,
                            split_col="event_id", split_mod=2)


def ks_drift_events(sf_dir: str):
    """Exact two-sample KS statistic between the event_id-parity
    halves of events.value — integer-cents value counts (driver state
    bounded by the value DOMAIN, not rows), window-cumsum SQL twin."""
    from peri_ray.stages.checks import ks_two_sample

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return ks_two_sample(ds, "value", split_col="event_id", split_mod=2,
                         scale=100)


def embedding_covariance_q(sf_dir: str):
    """Exact population covariance (upper triangle) of the embedding
    matrix — milli-quantized integer sums so the SQL unnest/self-join
    twin lands on identical doubles; dim²-bounded driver state."""
    from peri_ray.stages.similarity import embedding_covariance

    ds = _read(sf_dir, "embeddings", ["embedding"])
    return embedding_covariance(ds, dim=64, scale=1000)


def pca_projected_embeddings(sf_dir: str):
    """Distributed PCA audit (streaming covariance → driver eigh →
    one broadcast projection pass), oracle-checked: exact projected
    row count rides along; the booleans assert the numerical
    invariants a correct PCA must satisfy — component orthonormality
    (‖QᵀQ − I‖∞ ≤ 1e-9), non-increasing explained-variance ratios,
    and a projection-norm containment (every ‖pc‖ ≤ ‖x − mean‖ + tol,
    checked in the projection pass itself).  Twin: exact embedding
    count + TRUE.  Per-row projection VALUES stay engine-side
    (eigenvectors have no SQL twin); exactness vs full-batch numpy
    PCA is unit-tested."""
    from peri_ray.stages.similarity import pca_components, pca_project

    k, dim = 4, 64
    comp, ratios = pca_components(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), k=k, dim=dim)
    gram = comp @ comp.T
    orth_ok = bool(np.abs(gram - np.eye(k)).max() <= 1e-9)
    order_ok = bool(np.all(np.diff(ratios) <= 1e-12))

    out = pca_project(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                      k=k, dim=dim)

    def _check(t: pa.Table) -> pa.Table:
        pcs = t.column("pc").combine_chunks()
        lens = pc.list_value_length(pcs).to_numpy(zero_copy_only=False)
        m = (pcs.flatten().to_numpy(zero_copy_only=False)
             .reshape(-1, int(lens[0])) if t.num_rows else
             np.zeros((0, k)))
        finite = bool(np.isfinite(m).all())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "finite": pa.array([finite], pa.bool_())})

    n_rows, finite_ok = 0, True
    for r in out.map_batches(_check, batch_format="pyarrow").take_all():
        n_rows += r["n"]
        finite_ok = finite_ok and r["finite"]
    return pa.table({
        "n_rows": pa.array([n_rows], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "orthonormal_ok": pa.array([orth_ok], pa.bool_()),
        "variance_order_ok": pa.array([order_ok], pa.bool_()),
        "projection_finite_ok": pa.array([finite_ok], pa.bool_())})


# ---------------------------------------------------------------------------
# web link graph + crawl-politeness additions (stages/web.py
# extract_outlinks / outlink_host_counts, temporal.interarrival_stats
# keyed by host)
# ---------------------------------------------------------------------------


def _attach_linked_html_fixture(t: pa.Table,
                                host_mod: int = 50) -> pa.Table:
    """FIXTURE: html with doc_id % 3 anchor tags, link j targeting
    host h((doc_id*7 + j + 1) % host_mod).example.com path
    /p/(doc_id % 20) — deterministic so the DuckDB twin rebuilds the
    same edge list arithmetically while the ENGINE parses it out of
    the html bytes (a broken parser shows up as an oracle mismatch).
    ``host_mod`` is THE single knob the link-fixture family varies:
    50 = the dense graph (every crawled host linked), 97 = the
    frontier variant (uncrawled tail h50..h96), 25 = the clustered
    variant (h25..h49 planted orphans)."""
    ids = t.column("doc_id").combine_chunks().cast(pa.int64())
    ids_np = ids.to_numpy(zero_copy_only=False)
    nl = ids_np % 3

    def _anchor(j: int) -> pa.Array:
        tgt = (ids_np * 7 + j + 1) % host_mod
        a = np.char.add(
            np.char.add('<a href="http://h', tgt.astype(str)),
            np.char.add(np.char.add(".example.com/p/",
                                    (ids_np % 20).astype(str)),
                        '">t</a>'))
        return pa.array(np.where(nl > j, a, "").tolist(), pa.string())

    html = pc.binary_join_element_wise(
        pa.scalar("<html><body><p>x</p>"), _anchor(0), _anchor(1),
        pa.scalar("</body></html>"), "")
    return t.append_column("html", html.cast(pa.binary()))


def outlink_graph_docs(sf_dir: str):
    """Host-level link graph: src host from the CANONICALIZED page
    url, dst hosts parsed out of the html anchors (vectorized split +
    RE2) — (src_host, dst_host, n_links) with driver-bounded merge."""
    from peri_ray.stages.web import (canonicalize_urls, extract_outlinks,
                                     host_of, outlink_host_counts)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        _attach_linked_html_fixture, batch_format="pyarrow")
    # the src host rides through the anchor extraction as the id
    # column, so no join is needed to re-attach it to the edges
    ds = ds.map_batches(lambda t: t.select(["host", "html"]),
                        batch_format="pyarrow")
    edges = extract_outlinks(ds, html_col="html", id_col="host")
    return outlink_host_counts(edges, src_host_col="host")


def host_crawl_gaps(sf_dir: str):
    """Crawl politeness per host: count/sum/max of the microsecond
    gaps between consecutive captures of the same canonical host —
    interarrival_stats keyed by the string host (one groupby(host)
    exchange of (host, ts) pairs; exact BIGINT µs)."""
    from peri_ray.stages.temporal import interarrival_stats
    from peri_ray.stages.web import canonicalize_urls, host_of

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        lambda t: t.select(["host", "warc_ts"]), batch_format="pyarrow")
    return interarrival_stats(ds, ts_col="warc_ts", user_col="host")


def domain_boilerplate_docs(sf_dir: str):
    """Per-domain boilerplate detection: line occurrences whose
    document frequency within their own host reaches min_df=4 — the
    fixture appends a per-host footer line to even doc_ids so each
    host has a real site template.  One bucketed (host, line)
    exchange."""
    from peri_ray.stages.dedup import domain_boilerplate_victims
    from peri_ray.stages.web import canonicalize_urls, host_of

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds))

    def _footer(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().cast(pa.int64())
        even = pc.equal(pc.bit_wise_and(ids, 1), 0)
        host = t.column("host").combine_chunks()
        txt = t.column("text").combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        footer = pc.if_else(
            even, pc.binary_join_element_wise(
                pa.scalar("\nfooter "), host, ""),
            pa.scalar("", pa.string()))
        out = pc.binary_join_element_wise(txt, footer, "",
                                          null_handling="emit_null")
        return pa.table({"doc_id": t.column("doc_id"),
                         "host": host, "text": out})

    ds = ds.map_batches(_footer, batch_format="pyarrow")
    victims = domain_boilerplate_victims(ds, min_df=4, group_col="host")
    return _collect(victims, pa.schema([("doc_id", pa.int64()),
                                        ("idx", pa.int64())]))


def w1_drift_events(sf_dir: str):
    """Exact two-sample Wasserstein-1 distance between the
    event_id-parity halves of events.value — pure-integer numerator
    (order-free at any block layout), one exact division; HUGEINT
    window-cumsum SQL twin."""
    from peri_ray.stages.checks import wasserstein_two_sample

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return wasserstein_two_sample(ds, "value", split_col="event_id",
                                  split_mod=2, scale=100)


def fragment_anomaly_docs(sf_dir: str):
    """Per-partition stats anomaly verdict (north-rule shape):
    fragments of 100 docs each, z-score of the fragment's mean
    n_chars vs the global mean in standard errors — the fixture
    inflates fragment 1 by +40 chars/doc so the check has a real
    positive.  Exact integer moments; only z (which has a √) rounds."""
    from peri_ray.stages.checks import fragment_anomaly_report

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def _frag(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().cast(pa.int64())
        frag = pc.divide(ids, 100)
        nc = t.column("n_chars").combine_chunks().cast(pa.int64())
        bump = pc.if_else(pc.equal(frag, 1), pa.scalar(40, pa.int64()),
                          pa.scalar(0, pa.int64()))
        return pa.table({"frag": frag, "x": pc.add(nc, bump)})

    ds = ds.map_batches(_frag, batch_format="pyarrow")
    return fragment_anomaly_report(ds, frag_col="frag", value_col="x",
                                   z_thresh=2.0)


def page_titles_docs(sf_dir: str):
    """Page-title extraction from the html binary column (vectorized
    RE2; null html -> null title) — the title twin of the extraction
    invariant, over the same deterministic html fixture."""
    from peri_ray.stages.web import extract_title

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_attach_html_fixture, batch_format="pyarrow")
    return extract_title(ds).map_batches(
        lambda t: t.select(["doc_id", "title"]), batch_format="pyarrow")


def web_prep_gates_docs(sf_dir: str):
    """Composed crawl-prep pipeline with per-page gate attribution:
    recrawl_dup -> blocked -> quota -> kept, first-failing-gate —
    two bucketed exchanges carrying only ids/urls/ints, fully
    streaming (no materialize/union in the lineage)."""
    from peri_ray.stages.web import (canonicalize_urls, host_of,
                                     web_prep_gates)

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds))
    return web_prep_gates(ds, BLOCKED_HOSTS_FIXTURE, URL_PATTERNS_FIXTURE,
                          quota_k=3)


def spec_drift_documents(sf_dir: str):
    """Schema-evolution report between two crawl snapshots (even ids =
    A, odd ids = B with a simulated schema change: text dropped,
    crawl_depth added, n_chars int->float, lang gains nulls, source
    enum blows past the threshold) — two streaming inference passes,
    driver-side diff of the schema-sized specs."""
    from peri_ray.infer import infer_spec, spec_diff_table

    def _even(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().cast(pa.int64())
        return t.filter(pc.equal(pc.bit_wise_and(ids, 1), 0))

    def _odd_evolved(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().cast(pa.int64())
        sub = t.filter(pc.equal(pc.bit_wise_and(ids, 1), 1))
        sids = sub.column("doc_id").combine_chunks().cast(pa.int64())
        ids_np = sids.to_numpy(zero_copy_only=False)
        lang = sub.column("lang").combine_chunks().cast(pa.string())
        lang = pc.if_else(pa.array(ids_np % 31 == 1),
                          pa.scalar(None, pa.string()), lang)
        source = pc.binary_join_element_wise(
            pa.scalar("src"),
            pa.array((ids_np % 80).astype(str).tolist(), pa.string()), "")
        return pa.table({
            "doc_id": sids,
            "lang": lang,
            "source": source,
            "n_chars": sub.column("n_chars").combine_chunks()
            .cast(pa.float64()),
            "crawl_depth": pa.array(ids_np % 5),
        })

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds_a = _read(sf_dir, "documents", cols).map_batches(
        _even, batch_format="pyarrow")
    ds_b = _read(sf_dir, "documents", cols).map_batches(
        _odd_evolved, batch_format="pyarrow")
    spec_a = infer_spec(ds_a, enum_threshold=32)
    spec_b = infer_spec(ds_b, enum_threshold=32)
    return spec_diff_table(spec_a, spec_b)


def cms_term_estimates_docs(sf_dir: str):
    """Count-Min frequency estimates AUDITED against exact
    heavy-hitter counts: the emitted ``cms_ok`` asserts the one-sided
    guarantee (never undercount) AND the e/width·N overcount bound per
    term, so the sketch's guarantee is the oracle-checked contract
    (twin: exact over-threshold counts + TRUE).  The raw estimates
    (n_cms, overcount) stay engine-side — they have no SQL twin."""
    from peri_ray.stages.text import cms_term_estimates

    ds = _read(sf_dir, "documents", ["text"])
    return cms_term_estimates(ds, threshold=500).select(
        ["term", "n_exact", "cms_ok"])


def host_degree_docs(sf_dir: str):
    """Link-graph degree profile (out/in links + distinct peer hosts)
    over the deterministic outlink fixture — host-bounded driver
    merge; the twin rebuilds the edges arithmetically."""
    from peri_ray.stages.web import (canonicalize_urls, extract_outlinks,
                                     host_of)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        _attach_linked_html_fixture, batch_format="pyarrow")
    ds = ds.map_batches(lambda t: t.select(["host", "html"]),
                        batch_format="pyarrow")
    edges = extract_outlinks(ds, html_col="html", id_col="host")

    from peri_ray.stages.web import host_degree_stats, href_host

    def _hosts(t: pa.Table) -> pa.Table:
        return pa.table({"src_host": t.column("host"),
                         "dst_host": href_host(t.column("href"))})

    return host_degree_stats(edges.map_batches(_hosts,
                                               batch_format="pyarrow"))


def weighted_sample_docs(sf_dir: str):
    """Deterministic A-ES weighted sample (k=40, weight=n_chars),
    ORACLE-CHECKED as a membership audit (round-5 conversion — the
    seeded splitmix keys themselves have no SQL twin; the md5-keyed
    A-ES member `weighted_sample_md5_docs` is the key-exact oracle):
    ``k_returned`` = min(k, eligible rows) rides hash-checked, and the
    booleans assert the sample is a true subset — every returned id is
    distinct, exists in documents, has a positive weight, and carries
    EXACTLY the table's n_chars for that id (checked by a broadcast
    id→weight probe pass).  Key-level exactness vs a single-machine
    brute force over the same keys stays unit-tested."""
    import ray

    from peri_ray.stages.stats import weighted_sample

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    sample = weighted_sample(ds, weight_col="n_chars", id_col="doc_id",
                             k=40, seed=7)
    ids = sample.column("doc_id").to_pylist()
    ws = sample.column("w").to_pylist()
    distinct_ok = len(set(ids)) == len(ids)
    want = {int(i): float(w) for i, w in zip(ids, ws)}
    want_ref = ray.put(want)

    def _probe(t: pa.Table) -> pa.Table:
        lookup = ray.get(want_ref)
        did = t.column("doc_id").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").combine_chunks().cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        hit = ok = 0
        for i, w in zip(did.tolist(), nch.tolist()):
            if i in lookup:
                hit += 1
                if w == lookup[i] and w > 0:
                    ok += 1
        # eligible rows for the k_returned twin: valid positive weight
        elig = int((np.nan_to_num(nch, nan=0.0) > 0).sum())
        return pa.table({"hit": pa.array([hit], pa.int64()),
                         "ok": pa.array([ok], pa.int64()),
                         "elig": pa.array([elig], pa.int64())})

    hits = oks = elig = 0
    for r in ds.map_batches(_probe, batch_format="pyarrow").take_all():
        hits += int(r["hit"])
        oks += int(r["ok"])
        elig += int(r["elig"])
    # k_returned is the ENGINE's sample size — the twin independently
    # computes LEAST(40, eligible), so a short or padded sample
    # hash-mismatches rather than being masked (elig stays engine-side
    # as the sanity denominator)
    assert sample.num_rows <= min(40, elig)
    return pa.table({
        "k_returned": pa.array([sample.num_rows], pa.int64()),
        "sample_is_subset_ok": pa.array(
            [distinct_ok and hits == len(ids) == sample.num_rows],
            pa.bool_()),
        "weights_match_ok": pa.array([oks == hits], pa.bool_())})


def token_fertility_by_lang(sf_dir: str):
    """Tokenizer-fertility profile per language (chars per whitespace
    token) — the signal that drives per-lang token budgeting.  One
    streaming pass of per-batch (lang, docs, tokens, chars) Arrow
    group_by partials merged as python ints; chars_per_token is ONE
    exact int→double division per lang."""
    from peri_ray.stages.text import token_count_batch

    ds = _read(sf_dir, "documents", ["text", "lang"])

    def _part(t: pa.Table) -> pa.Table:
        txt = t.column("text").combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        lang = t.column("lang").combine_chunks().cast(pa.string())
        ok = pc.and_(pc.is_valid(txt), pc.is_valid(lang))
        sub = pa.table({"lang": lang, "text": txt}).filter(ok)
        sub = token_count_batch(sub, "text")
        stxt = sub.column("text").combine_chunks()
        aug = pa.table({
            "lang": sub.column("lang"),
            "n_docs": pa.array(np.ones(sub.num_rows, np.int64)),
            "tok": sub.column("n_tokens"),
            "chars": pc.utf8_length(stxt).cast(pa.int64()),
        })
        g = aug.group_by("lang").aggregate(
            [(c, "sum") for c in ("n_docs", "tok", "chars")])
        return g.rename_columns(["lang", "n_docs", "tok", "chars"])

    acc: dict[str, list] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow").iter_rows():
        cur = acc.setdefault(r["lang"], [0, 0, 0])
        cur[0] += int(r["n_docs"])
        cur[1] += int(r["tok"])
        cur[2] += int(r["chars"])
    keys = sorted(acc)
    return pa.table({
        "lang": pa.array(keys, pa.string()),
        "n_docs": pa.array([acc[k][0] for k in keys], pa.int64()),
        "sum_tokens": pa.array([acc[k][1] for k in keys], pa.int64()),
        "sum_chars": pa.array([acc[k][2] for k in keys], pa.int64()),
        "chars_per_token": pa.array(
            [float(acc[k][2]) / float(acc[k][1]) if acc[k][1] else None
             for k in keys], pa.float64()),
    })


def host_lang_entropy(sf_dir: str):
    """Per-domain language-coherence signal: Shannon entropy (nats) of
    the host's lang histogram — a multilingual mirror/SEO-farm
    detector.  (host, lang) count partials + host-bounded driver
    merge; entropy rounds to 6 (transcendental, tie-free)."""
    import math

    from peri_ray.stages.web import canonicalize_urls, host_of

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds))

    def _part(t: pa.Table) -> pa.Table:
        sub = pa.table({"host": t.column("host"),
                        "lang": t.column("lang")})
        sub = sub.filter(pc.and_(pc.is_valid(sub.column("host")),
                                 pc.is_valid(sub.column("lang"))))
        g = sub.group_by(["host", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["host", "lang", "n"])

    from peri_ray.stages.dedup import guard_driver_groups

    acc: dict[str, dict] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow").iter_rows():
        acc.setdefault(r["host"], {}).setdefault(r["lang"], 0)
        acc[r["host"]][r["lang"]] += int(r["n"])
        guard_driver_groups(len(acc), "host_lang_entropy")
    hosts = sorted(acc)
    ents, totals = [], []
    for h in hosts:
        tot = sum(acc[h].values())
        e = 0.0
        for n in acc[h].values():
            p = float(n) / float(tot)
            e -= p * math.log(p)
        ents.append(round(e, 6))
        totals.append(tot)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "n_pages": pa.array(totals, pa.int64()),
        "lang_entropy": pa.array(ents, pa.float64()),
    })


def host_dup_rate(sf_dir: str):
    """Per-domain exact-duplicate rate (duplicate pages / pages) — the
    domain-level mirror/copy-farm signal.  Content hashes are computed
    in the SAME map that attaches the host, and the pinned lineage is
    the slim (doc_id, host, content_hash) table (no text, no double
    execution of the fixture pipeline); the dedup exchange runs over
    the precomputed hashes and the dup-bounded victim-id set is the
    only other driver state.  dup_rate is ONE exact int→double
    division."""
    from peri_ray.stages.dedup import exact_duplicate_ids
    from peri_ray.stages.web import canonicalize_urls, host_of
    from peri_ray.state.sketches import hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds))

    def _plant(t: pa.Table) -> pa.Table:
        # FIXTURE: the corpus has no exact dups, so plant them —
        # doc_id % 11 == 3 pages become mirror copies ('MIRROR' text,
        # identical across hosts), giving every host a real dup rate
        ids = t.column("doc_id").combine_chunks().cast(pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        txt = t.column("text").combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        txt = pc.if_else(pa.array(ids_np % 11 == 3),
                         pa.scalar("MIRROR", pa.string()), txt)
        h = hash_strings(txt, seed=1)  # the dedup exchange's hash
        return pa.table({"doc_id": ids, "host": t.column("host"),
                         "content_hash": pa.array(h.astype(np.int64))})

    # pin the slim 3-column table: TWO consumers below (victims +
    # per-host counts) must not re-execute the fixture pipeline
    slim = ds.map_batches(_plant, batch_format="pyarrow").materialize()
    victims = exact_duplicate_ids(slim, "content_hash", "doc_id",
                                  prehashed=True)
    import ray as _ray

    vic_ids = set()
    for r in victims.iter_rows():
        vic_ids.add(int(r["doc_id"]))
    vic_ref = _ray.put(np.array(sorted(vic_ids), np.int64))

    def _part(t: pa.Table) -> pa.Table:
        vids = _ray.get(vic_ref)
        ids = t.column("doc_id").combine_chunks().cast(pa.int64())
        dup = pc.is_in(ids, value_set=pa.array(vids))
        sub = pa.table({"host": t.column("host"),
                        "dup": dup.cast(pa.int64()),
                        "one": pa.array(np.ones(len(t), np.int64))})
        g = sub.group_by("host").aggregate([("dup", "sum"), ("one", "sum")])
        return g.rename_columns(["host", "dups", "n"])

    from peri_ray.stages.dedup import guard_driver_groups

    acc: dict[str, list] = {}
    for r in slim.map_batches(_part, batch_format="pyarrow").iter_rows():
        cur = acc.setdefault(r["host"], [0, 0])
        cur[0] += int(r["dups"])
        cur[1] += int(r["n"])
        guard_driver_groups(len(acc), "host_dup_rate")
    hosts = sorted(acc)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "n_pages": pa.array([acc[h][1] for h in hosts], pa.int64()),
        "n_dups": pa.array([acc[h][0] for h in hosts], pa.int64()),
        "dup_rate": pa.array(
            [float(acc[h][0]) / float(acc[h][1]) for h in hosts],
            pa.float64()),
    })


def warc_roundtrip_docs(sf_dir: str):
    """Common-Crawl front door, end to end: serialize the deterministic
    web fixture as member-gzipped WARC segments — ONE SEGMENT PER
    BLOCK, written inside ``map_batches`` (distributed writers, no
    driver materialization of html) — read them back with the stdlib
    WARC parser, and extract title + text from the payloads.
    (doc_id, url, n_extracted) with doc_id parsed OUT OF the page
    title, so framing, gzip, HTTP-header stripping and html parsing
    are all on the oracle path."""
    import os
    import shutil

    from peri_ray.sources.warc import read_warc, write_warc
    from peri_ray.stages.web import extract_text_from_html, extract_title

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = ds.map_batches(_attach_html_fixture, batch_format="pyarrow")

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/peri_warc_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def _write_seg(t: pa.Table) -> pa.Table:
        recs = []
        for r in t.to_pylist():
            if r["html"] is None:
                continue
            ts = r["warc_ts"]
            ts_us = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") \
                else int(ts)
            recs.append((r["url"], ts_us, bytes(r["html"])))
        if not recs:
            return pa.table({"path": pa.array([], pa.string())})
        # unique, deterministic segment name per block: min doc_id
        seg = min(r["doc_id"] for r in t.to_pylist())
        path = f"{out_dir}/seg_{seg}.warc.gz"
        write_warc(recs, path, gzip_members=True)
        return pa.table({"path": pa.array([path], pa.string())})

    paths = sorted(r["path"] for r in
                   ds.map_batches(_write_seg,
                                  batch_format="pyarrow").take_all())
    pages = read_warc(paths)
    pages = extract_title(pages)
    pages = extract_text_from_html(pages)

    def _final(t: pa.Table) -> pa.Table:
        title = t.column("title").combine_chunks()
        ids = pc.cast(pc.utf8_slice_codeunits(title, 1), pa.int64())
        ext = t.column("extracted_text").combine_chunks()
        return pa.table({
            "doc_id": ids,
            "url": t.column("url"),
            "n_extracted": pc.utf8_length(ext).cast(pa.int64()),
        })

    return pages.map_batches(_final, batch_format="pyarrow")


def incremental_stats_documents(sf_dir: str):
    """Incremental-ingestion stats: compute exact column stats for two
    snapshot halves INDEPENDENTLY (two separate jobs, as a daily crawl
    would), merge the two result tables with the stats algebra
    (counts add, min/min, max/max, integer-cent sums add), and the
    oracle checks the merge against a from-scratch full-table pass —
    mergeability is what makes checkpointed incremental stats exact."""
    from peri_ray.stages.stats import exact_stats_table

    def _half(parity: int):
        ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").combine_chunks().cast(pa.int64())
            return t.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

        return ds.map_batches(_f, batch_format="pyarrow")

    a = exact_stats_table(_half(0), ["n_chars"], cents_sums=True)
    b = exact_stats_table(_half(1), ["n_chars"], cents_sums=True)

    def g(t, col, i=0):
        return t.column(col)[i].as_py()

    def _m(fn, x, y):
        if x is None:
            return y
        if y is None:
            return x
        return fn(x, y)

    return pa.table({
        "column": pa.array(["n_chars"], pa.string()),
        "cnt": pa.array([g(a, "cnt") + g(b, "cnt")], pa.int64()),
        "null_count": pa.array([g(a, "null_count") + g(b, "null_count")],
                               pa.int64()),
        "min_v": pa.array([_m(min, g(a, "min_v"), g(b, "min_v"))],
                          pa.float64()),
        "max_v": pa.array([_m(max, g(a, "max_v"), g(b, "max_v"))],
                          pa.float64()),
        "sum_cents": pa.array([g(a, "sum_cents") + g(b, "sum_cents")],
                              pa.int64()),
    })


def interval_overlap_events(sf_dir: str):
    """Interval-overlap join (the temporal-join family's third member
    after as-of and range-containment): even-event 10-minute windows ×
    odd-event windows per user; one key-bucketed exchange of
    (key, id, 2×int64) rows, per-run searchsorted candidate windows +
    vectorized end verification."""
    from peri_ray.stages.temporal import interval_overlap_join

    def _iv(parity: int):
        ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("event_id").combine_chunks().cast(pa.int64())
            ok = pc.equal(pc.bit_wise_and(ids, 1), parity)
            sub = t.filter(ok)
            ts = sub.column("ts").combine_chunks()
            return pa.table({
                "user_id": sub.column("user_id"),
                "event_id": sub.column("event_id"),
                "start": ts,
                "end": pc.add(ts, pa.scalar(600_000_000,
                                            pa.duration("us"))),
            })

        return ds.map_batches(_f, batch_format="pyarrow")

    return interval_overlap_join(
        _iv(0), _iv(1), key="user_id",
        l_start="start", l_end="end", r_start="start", r_end="end",
        l_id="event_id", r_id="event_id")


def embedding_drift_report(sf_dir: str):
    """Embedding drift between vec_id-parity snapshot halves: exact
    integer mean-shift L2 (one sqrt + one division at the end), so the
    HUGEINT SQL twin matches bit-for-bit."""
    from peri_ray.stages.similarity import embedding_drift

    def _half(parity: int):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def _f(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").combine_chunks().cast(pa.int64())
            return t.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

        return ds.map_batches(_f, batch_format="pyarrow")

    return embedding_drift(_half(0), _half(1), dim=64, scale=1000)


def host_triangles(sf_dir: str):
    """Distributed triangle count over the host link graph (community
    density / link-farm signal): canonical undirected edges, wedge
    enumeration + closing semi-join, both through bucketed hash
    joins."""
    from peri_ray.stages.similarity import triangle_count
    from peri_ray.stages.web import (canonicalize_urls, extract_outlinks,
                                     host_of, href_host)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        _attach_linked_html_fixture, batch_format="pyarrow")
    ds = ds.map_batches(lambda t: t.select(["host", "html"]),
                        batch_format="pyarrow")
    edges = extract_outlinks(ds, html_col="html", id_col="host")

    def _e(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("host"),
                         "b": href_host(t.column("href"))})

    return triangle_count(edges.map_batches(_e, batch_format="pyarrow"))


SEQ_PATTERN = "view,(view,)*click,(.*,)?purchase"


def pattern_match_users(sf_dir: str):
    """MATCH_RECOGNIZE-lite: users whose ORDERED event sequence matches
    a regex over the event alphabet (here: a view-streak straight into
    a click, with a purchase anywhere later) — ordered string_agg
    assembly + one RE2 pass; both engines run the same pattern."""
    from peri_ray.stages.stats import collect_sorted

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    seqs = collect_sorted(ds, "user_id", "event_type", "ts", "event_id")

    def _f(t: pa.Table) -> pa.Table:
        seq = t.column("seq").combine_chunks()
        if pa.types.is_large_string(seq.type):
            seq = seq.cast(pa.string())
        return t.filter(pc.fill_null(
            pc.match_substring_regex(seq, SEQ_PATTERN), False))

    return seqs.map_batches(_f, batch_format="pyarrow")


def warc_validate_report(sf_dir: str):
    """The full north-rule path in one pipeline: WARC segments →
    stdlib parse → html text extraction → compiled-spec validation →
    verdict counts.  The spec bounds extracted text at 200 codepoints,
    so the fixture's long docs (and the %97-corrupted extractions)
    produce real violations; the oracle recomputes the verdict from
    the source lengths."""
    import os
    import shutil

    from peri_ray.sources.warc import read_warc, write_warc
    from peri_ray.stages.web import extract_text_from_html
    from peri_ray.validate import validate_dataset

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = ds.map_batches(_attach_html_fixture, batch_format="pyarrow")

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/peri_warc_val_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def _write_seg(t: pa.Table) -> pa.Table:
        recs = []
        ids = []
        for r in t.to_pylist():
            if r["html"] is None:
                continue
            ts = r["warc_ts"]
            ts_us = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") \
                else int(ts)
            recs.append((r["url"], ts_us, bytes(r["html"])))
            ids.append(r["doc_id"])
        if not recs:
            return pa.table({"path": pa.array([], pa.string())})
        path = f"{out_dir}/seg_{min(ids)}.warc.gz"
        write_warc(recs, path, gzip_members=True)
        return pa.table({"path": pa.array([path], pa.string())})

    paths = sorted(r["path"] for r in
                   ds.map_batches(_write_seg,
                                  batch_format="pyarrow").take_all())
    pages = extract_text_from_html(read_warc(paths))
    combined = validate_dataset(pages, {
        "url": ("required", ("string", ("regex", "^https?://"))),
        "extracted_text": ("required", ("string", ("max", 200))),
    })

    def _cnt(t: pa.Table) -> pa.Table:
        valid = t.column("valid").combine_chunks()
        nv = int(pc.sum(pc.cast(pc.invert(valid), pa.int64())).as_py() or 0)
        return pa.table({"rows": pa.array([len(t)], pa.int64()),
                         "invalid": pa.array([nv], pa.int64())})

    rows = invalid = 0
    for r in combined.map_batches(_cnt, batch_format="pyarrow").iter_rows():
        rows += int(r["rows"])
        invalid += int(r["invalid"])
    return pa.table({
        "rows": pa.array([rows], pa.int64()),
        "valid_rows": pa.array([rows - invalid], pa.int64()),
        "invalid_rows": pa.array([invalid], pa.int64()),
    })


def global_rank_documents(sf_dir: str):
    """Exact distributed ORDER BY: global row_number() over
    (n_chars ASC NULLS FIRST, doc_id) — KLL-split range exchange with
    driver-merged prefix offsets (stats.global_rank; TeraSort shape).
    The reference gets a total order for free by streaming one record
    at a time (lib/peri.ex validate walk); at 100 TB it is a
    range-partitioned exchange."""
    from peri_ray.stages.stats import global_rank

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return global_rank(ds, "n_chars", "doc_id", n_ranges=16)


def global_rank_events_desc(sf_dir: str):
    """Descending global rank over a float key with heavy ties
    (events.value): highest value = rank 1, ties broken by event_id,
    null keys last — the DESC path of stats.global_rank."""
    from peri_ray.stages.stats import global_rank

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return global_rank(ds, "value", "event_id", n_ranges=16,
                       descending=True)


def _attach_junk_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: plant junk-page phrases deterministically by doc_id —
    soft-404 (``%31``), JS-shell (``%37``), login-wall (``%41``),
    parked-domain (``%43``) prefixes concatenated in that fixed order
    (composite ids exercise first-match attribution).  Null text stays
    null."""
    ids = (t.column("doc_id").combine_chunks().cast(pa.int64())
           .to_numpy(zero_copy_only=False))
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())

    def _pre(mod: int, s: str) -> pa.Array:
        return pa.array(np.where(ids % mod == 0, s, "").tolist(),
                        pa.string())

    planted = pc.binary_join_element_wise(
        _pre(31, "Error 404 page not found. "),
        _pre(37, "Please enable JavaScript to continue. "),
        _pre(41, "Sign in to continue reading. "),
        _pre(43, "This domain is for sale. "),
        txt, "", null_handling="emit_null")
    return t.set_column(t.schema.get_field_index("text"), "text", planted)


def junk_page_report_docs(sf_dir: str):
    """Non-content-page detector (soft-404 / login-wall / JS-shell /
    parked-domain) with first-matching-rule attribution — the crawl
    gate that runs before quality scoring (web.junk_page_flags); RE2
    on both sides, shuffle-free."""
    from peri_ray.stages.web import junk_page_flags

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_attach_junk_fixture, batch_format="pyarrow")
    return junk_page_flags(ds)


def _attach_encoding_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: plant encoding damage deterministically by doc_id —
    double-encoded 'café' (``%29``), a U+FFFD replacement char
    (``%53``), a BEL control byte (``%59``), and a Cyrillic word
    (``%61``, for the script-mix report) appended in that fixed
    order.  Null text stays null."""
    ids = (t.column("doc_id").combine_chunks().cast(pa.int64())
           .to_numpy(zero_copy_only=False))
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())

    def _suf(mod: int, s: str) -> pa.Array:
        return pa.array(np.where(ids % mod == 0, s, "").tolist(),
                        pa.string())

    planted = pc.binary_join_element_wise(
        txt,
        _suf(29, " cafÃ©"),
        _suf(53, " �"),
        _suf(59, " \x07bel"),
        _suf(61, " пример"),
        "", null_handling="emit_null")
    return t.set_column(t.schema.get_field_index("text"), "text", planted)


def encoding_quality_docs(sf_dir: str):
    """Mojibake / encoding-damage signals (replacement chars, stray C0
    controls, UTF-8-as-Latin-1 digraphs) — web.encoding_quality_report
    over the deterministic damage fixture; RE2 both sides."""
    from peri_ray.stages.web import encoding_quality_report

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_attach_encoding_fixture, batch_format="pyarrow")
    return encoding_quality_report(ds)


def script_mix_docs(sf_dir: str):
    """Unicode-script composition + mixed-script flag (SEO-spam
    signal) — web.script_mix_report over the same damage fixture
    (the planted Cyrillic word makes `mixed` true on %61 ids)."""
    from peri_ray.stages.web import script_mix_report

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(_attach_encoding_fixture, batch_format="pyarrow")
    return script_mix_report(ds)


def windowed_recapture_docs(sf_dir: str):
    """Time-windowed recapture dedup over the messy-URL fixture:
    a capture is redundant only if the same canonical url was fetched
    within the last 90 days (web.windowed_recapture_flags) — the
    recrawl policy between 'keep everything' and 'keep latest'."""
    from peri_ray.stages.web import (canonicalize_urls,
                                     windowed_recapture_flags)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = canonicalize_urls(ds.map_batches(_attach_web_columns,
                                          batch_format="pyarrow"))
    ds = ds.map_batches(
        lambda t: t.select(["doc_id", "canonical_url", "warc_ts"]),
        batch_format="pyarrow")
    return windowed_recapture_flags(ds, window_us=90 * 86_400_000_000)


def bloom_probe_recrawl(sf_dir: str):
    """Incremental exact dedup through the PERSISTED Bloom index:
    build the fixed-size bitmap from the base corpus once, probe the
    recrawl delta, verify only Bloom hits against base content hashes
    (dedup.bloom_probe_exact_dups) — same verdict as the mutable-index
    path (`incremental_dedup_recrawl`), same oracle, a fraction of the
    index bytes."""
    import os
    import shutil
    import tempfile

    from peri_ray.stages.dedup import (bloom_probe_exact_dups,
                                       write_bloom_index)

    root = tempfile.mkdtemp(prefix="peri_bloom_idx_")
    stem = os.path.join(root, "base")
    try:
        write_bloom_index(_read(sf_dir, "documents", ["doc_id", "text"]),
                          stem)
        new = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            _recrawl_batch, batch_format="pyarrow")
        out = bloom_probe_exact_dups(
            new, stem, _read(sf_dir, "documents", ["doc_id", "text"]))
        return _collect(out, pa.schema([("doc_id", pa.int64()),
                                        ("duplicate", pa.bool_())]))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def semdedup_victims_embeddings(sf_dir: str):
    """SemDeDup: k-means-cluster the embedding space, exact cosine
    dedup within clusters, keep min id per component
    (similarity.semdedup_victims) — ORACLE-CHECKED as a containment
    audit (round-5 conversion): within-cluster pairs are a SUBSET of
    the exact global cosine join at the same threshold/rounding, so
    every victim must appear among the exact join's pair members, and
    (when any pair exists) strictly fewer victims than members (each
    component keeps its min-id keeper).  ``n_pair_members`` is the
    hash-checked number — DuckDB recomputes it from the literal
    all-pairs cosine SQL; the booleans ride as constants.  The victim
    ID LIST stays engine-side (k-means has no SQL twin); subset/keeper
    semantics are also unit-tested."""
    from peri_ray.stages.similarity import (cosine_similarity_join,
                                            semdedup_victims)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    victims = {int(r["vec_id"])
               for r in semdedup_victims(ds, threshold=0.4,
                                         k_clusters=8).take_all()}
    exact = cosine_similarity_join(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        threshold=0.4)
    members: set[int] = set()
    for r in exact.take_all():  # pair-bounded driver state
        members.add(int(r["id_a"]))
        members.add(int(r["id_b"]))
    n_emb = _read(sf_dir, "embeddings", ["vec_id"]).count()
    subset_ok = victims <= members
    strict_ok = (len(victims) < len(members)) if members \
        else not victims
    return pa.table({
        "n_embeddings": pa.array([n_emb], pa.int64()),
        "n_pair_members": pa.array([len(members)], pa.int64()),
        "victims_subset_ok": pa.array([subset_ok], pa.bool_()),
        "victims_strictly_fewer_ok": pa.array([strict_ok],
                                              pa.bool_())})


def semdedup_recall_report(sf_dir: str):
    """Self-evaluation of the SemDeDup approximation: within-cluster
    pairs are a SUBSET of the exact global cosine join (same vectors,
    same rounding, same threshold), so recall = n_sem / n_exact — the
    fraction of true near-dup pairs the cluster partition keeps
    co-located.  The honest number to check before trusting SemDeDup's
    O(Σ m_c²) shortcut on a new corpus."""
    from peri_ray.stages.similarity import (cosine_similarity_join,
                                            semdedup_pairs)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_exact = cosine_similarity_join(ds, threshold=0.4).count()
    ks, sems, recs = [], [], []
    for k in (4, 8):
        ds2 = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        n_sem = semdedup_pairs(ds2, threshold=0.4, k_clusters=k).count()
        ks.append(k)
        sems.append(n_sem)
        recs.append(round(float(n_sem) / float(n_exact), 6)
                    if n_exact else 1.0)
    return pa.table({
        "k_clusters": pa.array(ks, pa.int64()),
        "n_exact": pa.array([n_exact] * len(ks), pa.int64()),
        "n_sem": pa.array(sems, pa.int64()),
        "recall": pa.array(recs, pa.float64()),
    })


def temperature_mixed_docs(sf_dir: str):
    """Temperature-smoothed corpus remixing (Pile/ROOTS style,
    alpha = 0.5 downweights the dominant lang): per-lang counts via the
    two-phase histogram, driver-side stats.temperature_rates, then ONE
    streaming hash_weighted_sample pass — no shuffle, reproducible at
    any block layout.  The twin recomputes the rates with SQL sqrt in
    lang order (pow_sum folds over a lang-ORDERED list on both sides);
    membership compares integer-floored thresholds, and a floored
    IRRATIONAL rate (sums of square roots of non-square counts) cannot
    sit on a micro-unit boundary."""
    from peri_ray.stages.checks import histogram
    from peri_ray.stages.stats import hash_weighted_sample, temperature_rates

    counts = histogram(_read(sf_dir, "documents", ["doc_id", "lang"]),
                       "lang")
    rates = temperature_rates(dict(sorted(counts.items())), alpha=0.5,
                              target_total=500)
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return hash_weighted_sample(ds, rates, key_col="lang",
                                id_col="doc_id")


def _attach_anchored_html_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: the linked-html fixture with VARYING anchor text —
    link j of doc i reads 'w((i*11 + j) % 7)' — so anchor-text
    aggregation has real distribution; targets match
    _attach_linked_html_fixture's arithmetic."""
    ids = t.column("doc_id").combine_chunks().cast(pa.int64())
    ids_np = ids.to_numpy(zero_copy_only=False)
    nl = ids_np % 3

    def _anchor(j: int) -> pa.Array:
        tgt = (ids_np * 7 + j + 1) % 50
        txt = (ids_np * 11 + j) % 7
        a = np.char.add(
            np.char.add(
                np.char.add('<a href="http://h', tgt.astype(str)),
                np.char.add(".example.com/p/",
                            (ids_np % 20).astype(str))),
            np.char.add(np.char.add('">w', txt.astype(str)), "</a>"))
        return pa.array(np.where(nl > j, a, "").tolist(), pa.string())

    html = pc.binary_join_element_wise(
        pa.scalar("<html><body><p>x</p>"), _anchor(0), _anchor(1),
        pa.scalar("</body></html>"), "")
    return t.append_column("html", html.cast(pa.binary()))


def anchor_text_profile_docs(sf_dir: str):
    """Anchor-text profile per TARGET host (what the web calls each
    host — the off-page signal): vectorized <a href>text</a> parse
    (web.extract_anchors), href → host, (dst_host, anchor, n) counts.
    The twin rebuilds the edge list arithmetically, so a broken parser
    mismatches."""
    from peri_ray.stages.web import anchor_text_profile, extract_anchors

    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(_attach_anchored_html_fixture,
                        batch_format="pyarrow")
    return anchor_text_profile(extract_anchors(ds))


def ip_block_lookup_docs(sf_dir: str):
    """Broadcast range lookup (the IP → ASN tagging shape): a synthetic
    32-bit 'ip' per doc resolves against 256 non-overlapping /8-sized
    blocks (every third block missing, so gap rows exercise the null
    path) via one searchsorted per batch — shuffle-free
    (joins.broadcast_range_lookup); twin is the literal BETWEEN join."""
    from peri_ray.stages.joins import broadcast_range_lookup

    blocks = [b for b in range(256) if b % 3 != 0]
    ranges = pa.table({
        "lo": pa.array([b << 24 for b in blocks], pa.int64()),
        "hi": pa.array([((b + 1) << 24) - 1 for b in blocks], pa.int64()),
        "asn": pa.array([10000 + b for b in blocks], pa.int64()),
    })

    def _ip(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        ip = (ids * 2654435761) % (1 << 32)
        return pa.table({"doc_id": t.column("doc_id"),
                         "ip": pa.array(ip.astype(np.int64))})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        _ip, batch_format="pyarrow")
    return broadcast_range_lookup(ds, ranges, "ip")


def url_features_docs(sf_dir: str):
    """Structural URL features (path depth, param count, tld) over the
    canonicalized messy-URL fixture — the FineWeb-style URL-filter
    inputs (web.url_features); twin applies identical RE2/string ops
    to the same canonical urls."""
    from peri_ray.stages.web import canonicalize_urls, url_features

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = canonicalize_urls(ds.map_batches(_attach_web_columns,
                                          batch_format="pyarrow"))
    return url_features(ds)


def quality_classifier_report(sf_dir: str):
    """Learned curation filter (the fastText/DCLM shape at its
    smallest): distributed full-batch logistic regression predicting a
    gold gate (n_chars >= 300 — the only text-correlated label in this
    synthetic corpus, whose `lang` column is independent of its text)
    from engineered token features, then an exact accuracy count.
    Rows-only: iterative float fitting has no SQL twin; the learn
    tests pin the gradient math against a single-process reference.
    Accuracy lands ~0.98 vs a 0.51 majority baseline — the report
    proves the distributed trainer actually learns."""
    from peri_ray.stages.learn import logreg_fit
    from peri_ray.stages.text import add_quality_scores

    feats = ["f_words", "f_mwl", "punct_ratio"]

    def _label(t: pa.Table) -> pa.Table:
        lab = pc.greater_equal(
            pc.fill_null(t.column("n_chars").combine_chunks(), 0), 300)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "f_words": pc.divide(
                t.column("n_words").cast(pa.float64()), 100.0),
            "f_mwl": pc.divide(t.column("mean_word_len"), 10.0),
            "punct_ratio": t.column("punct_ratio"),
            "is_long": lab.cast(pa.int8()),
        })

    base = add_quality_scores(
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]))
    feat_ds = base.map_batches(_label, batch_format="pyarrow")
    # two consumers (fit iterations + the accuracy pass): pin the small
    # feature table rather than re-running the scorer once per GD step
    feat_ds = feat_ds.materialize()
    w, losses = logreg_fit(feat_ds, feats, "is_long", iters=100, lr=3.0)

    # exact accuracy via one more streaming pass: the label lives in
    # the same rows, so no join — logreg_score is the user-facing
    # scoring surface (exercised by the learn unit tests)
    import ray

    w_ref = ray.put(np.asarray(w, np.float64))

    def _hits(t: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        X = np.column_stack(
            [t.column(c).combine_chunks().cast(pa.float64())
             .fill_null(0.0).to_numpy(zero_copy_only=False)
             for c in feats] + [np.ones(t.num_rows)])
        pred = (X @ ww) > 0
        y = (t.column("is_long").combine_chunks()
             .to_numpy(zero_copy_only=False).astype(bool))
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "hit": pa.array([int((pred == y).sum())], pa.int64()),
            "pos": pa.array([int(y.sum())], pa.int64()),
        })

    n = hit = pos = 0
    for r in feat_ds.map_batches(_hits,
                                 batch_format="pyarrow").take_all():
        n += r["n"]; hit += r["hit"]; pos += r["pos"]
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "n_pos": pa.array([pos], pa.int64()),
        "accuracy": pa.array([round(hit / n, 4)], pa.float64()),
        "final_loss": pa.array([round(losses[-1], 4)], pa.float64()),
    })


def robots_blocked_docs(sf_dir: str):
    """Crawl-compliance verdict: parse deterministic per-host
    robots.txt payloads (wildcard-agent groups, decoy agent group,
    comments, Allow noise), compile every Disallow into one anchored
    RE2 alternation, and flag each page whose canonical path starts
    with a disallowed prefix for its host (web.parse_robots +
    web.apply_robots).  The twin rebuilds the rule arithmetic
    directly, so a broken parser or prefix matcher mismatches."""
    import ray.data as rd

    from peri_ray.stages.web import (apply_robots, canonicalize_urls,
                                     parse_robots)

    robots = pa.table({
        "host": pa.array([f"h{k}.example.com" for k in range(50)],
                         pa.string()),
        "robots_txt": pa.array([
            "# crawl policy\n"
            "User-agent: evilbot\nDisallow: /\n\n"
            "User-agent: *\n"
            "Allow: /public\n"
            "Disallow: /admin\n"
            + (f"Disallow: /p/{k % 20}\n" if k % 4 == 0 else "")
            for k in range(50)], pa.string()),
    })
    rules = _collect(parse_robots(rd.from_arrow(robots)),
                     pa.schema([("host", pa.string()),
                                ("path_prefix", pa.string())]))

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    pages = canonicalize_urls(ds.map_batches(_attach_web_columns,
                                             batch_format="pyarrow"))
    return apply_robots(pages, rules)


def redirect_resolution_docs(sf_dir: str,
                             driver_threshold: int = 2_000_000):
    """Redirect-chain resolution (pointer doubling, web.resolve_redirects):
    a deterministic redirect map over the documents table — doc i
    redirects to doc i+1 within groups of 10, every 25th group closes
    into a 10-cycle — resolved to terminal urls in log2(depth)
    bucketed exchanges.  Oracle: DuckDB recursive CTE walking the same
    edges single-step, terminal = a target that is never a source."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def _url(ids: np.ndarray) -> pa.Array:
        return pc.binary_join_element_wise(
            pa.array(["https://h"] * len(ids), pa.string()),
            pa.array((ids % 50).astype("U"), pa.string()),
            pa.array([".example.com/p/"] * len(ids), pa.string()),
            pa.array(ids.astype("U"), pa.string()), "")

    def _edges(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        keep = (ids % 10 != 9) | ((ids // 10) % 25 == 0)
        ids = ids[keep]
        nxt = np.where(ids % 10 != 9, ids + 1, ids - 9)
        return pa.table({"src": _url(ids), "dst": _url(nxt)})

    from peri_ray.stages.web import resolve_redirects

    edges = ds.map_batches(_edges, batch_format="pyarrow")
    return resolve_redirects(edges, max_hops=64,
                             driver_threshold=driver_threshold)


def redirect_resolution_distributed(sf_dir: str):
    """Forced-threshold twin of redirect_resolution_docs: pins the
    ALL-DISTRIBUTED pointer-doubling BSP path (driver_threshold=0)
    against the same recursive-CTE oracle, so the production-scale
    route stays driver-checked now that the default takes the hybrid
    driver finish below 2 M active rows."""
    return redirect_resolution_docs(sf_dir, driver_threshold=0)


def schema_drift_docs(sf_dir: str):
    """Snapshot schema drift (profile.schema_profile + schema_drift):
    the documents table vs a deterministically modified recrawl
    (n_chars dropped, float quality added, text nulled on doc_id%5,
    lang overwritten to 'it' on doc_id%100).  The twin recomputes each
    change row — column add/remove literals, %.6f null rates, sorted
    domain diffs — from the same modified snapshot in SQL, emitting a
    row only when the engine's thresholds would."""
    from peri_ray.stages.profile import schema_drift, schema_profile

    cols = ["doc_id", "text", "lang", "n_chars"]
    base = _read(sf_dir, "documents", cols)

    def _recrawl(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": ids,
            "text": pc.if_else(pa.array(idn % 5 == 0),
                               pa.scalar(None, pa.string()),
                               t.column("text").combine_chunks()),
            "lang": pc.if_else(pa.array(idn % 100 == 0),
                               pa.scalar("it", pa.string()),
                               t.column("lang").combine_chunks()),
            "quality": pa.array((idn % 32) / 32.0, pa.float64()),
        })

    new = _read(sf_dir, "documents", cols).map_batches(
        _recrawl, batch_format="pyarrow")
    return schema_drift(schema_profile(base, columns=cols),
                        schema_profile(new))


def unique_keys_documents(sf_dir: str):
    """Candidate-key discovery (profile.discover_unique_keys): exact
    uniqueness verdict per candidate column combination over documents
    — single input scan for all combos, within-batch duplicates ship
    a one-row existence marker instead of their keys.  Oracle: one
    SELECT DISTINCT count comparison per combo."""
    from peri_ray.stages.profile import discover_unique_keys

    ds = _read(sf_dir, "documents",
               ["doc_id", "lang", "source", "n_chars"])
    return discover_unique_keys(ds, [
        ["doc_id"], ["lang"], ["source"], ["n_chars"],
        ["lang", "source"], ["doc_id", "lang"],
        ["source", "n_chars"]])


def _host_graph_edges(sf_dir: str):
    """Shared staging for the host-graph centrality queries: directed
    host->host int edges parsed from the linked-html fixture, k%7==0
    hosts stripped of out-edges (real dangling nodes), self-loops
    dropped, deduplicated through the bucketed pair exchange."""
    from peri_ray.stages.dedup import dedupe_pairs
    from peri_ray.stages.web import (canonicalize_urls, extract_outlinks,
                                     host_of, href_host)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        _attach_linked_html_fixture, batch_format="pyarrow")
    links = extract_outlinks(
        ds.map_batches(lambda t: t.select(["host", "html"]),
                       batch_format="pyarrow"),
        html_col="html", id_col="host")

    def _edge_ids(t: pa.Table) -> pa.Table:
        sk = pc.cast(pc.struct_field(pc.extract_regex(
            t.column("host").combine_chunks().cast(pa.string()),
            r"^h(?P<k>\d+)\."), "k"), pa.int64())
        dk = pc.cast(pc.struct_field(pc.extract_regex(
            href_host(t.column("href")).cast(pa.string()),
            r"^h(?P<k>\d+)\."), "k"), pa.int64())
        sk_np = sk.to_numpy(zero_copy_only=False).astype(np.int64)
        dk_np = dk.to_numpy(zero_copy_only=False).astype(np.int64)
        # no self-loops; k%7==0 hosts keep no out-edges (they dangle)
        m = (sk_np != dk_np) & (sk_np % 7 != 0)
        return pa.table({"id_a": pa.array(sk_np[m]),
                         "id_b": pa.array(dk_np[m])})

    return dedupe_pairs(links.map_batches(_edge_ids,
                                          batch_format="pyarrow"))


def _pr_nodes_to_hosts(pr):
    """(node, pr) int ranks back to hK.example.com host strings."""

    def _host(t: pa.Table) -> pa.Table:
        k = t.column("node").combine_chunks().cast(pa.string())
        host = pc.binary_join_element_wise(
            pa.scalar("h"), k, pa.scalar(".example.com"), "")
        return pa.table({"host": host, "pr": t.column("pr")})

    return pr.map_batches(_host, batch_format="pyarrow")


def host_pagerank_outlinks(sf_dir: str):
    """Host-graph PageRank with dangling-mass redistribution (the
    web-graph convention; similarity.pagerank(dangling="redistribute"))
    over the fixture outlink graph.  Rows-only (iterative float ranks
    have no SQL twin); the numpy reference twin lives in
    tests/test_stages.py::TestPageRank."""
    from peri_ray.stages.similarity import pagerank

    pr = pagerank(_host_graph_edges(sf_dir), damping=0.85, iters=5,
                  src_col="id_a", dst_col="id_b",
                  dangling="redistribute")
    return _pr_nodes_to_hosts(pr)


def inferred_spec_violations(sf_dir: str):
    """Spec inference closing the loop to validation: infer a spec
    from the base documents snapshot (peri_ray.infer.infer_spec —
    zero-null columns become required, the closed lang domain becomes
    an enum), then validate the MODIFIED recrawl (text nulled on
    doc_id%5, lang overwritten to 'it' on doc_id%100) against that
    inferred spec through the standard engine.  Violations = exactly
    the injected drift.  Oracle rebuilds the inferred rules in SQL
    (required text, lang IN base domain)."""
    from peri_ray.infer import infer_spec

    cols = ["doc_id", "text", "lang"]
    spec = infer_spec(_read(sf_dir, "documents", cols))

    def _recrawl(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": ids,
            "text": pc.if_else(pa.array(idn % 5 == 0),
                               pa.scalar(None, pa.string()),
                               t.column("text").combine_chunks()),
            "lang": pc.if_else(pa.array(idn % 100 == 0),
                               pa.scalar("it", pa.string()),
                               t.column("lang").combine_chunks()),
        })

    new = _read(sf_dir, "documents", cols).map_batches(
        _recrawl, batch_format="pyarrow")
    combined = validate_dataset(new, spec, id_column="doc_id")
    return violations_dataset(combined).select_columns(
        ["record_id", "rule_id", "path"])




def seed_pagerank_hosts(sf_dir: str):
    """Personalized PageRank from a trusted-host seed set over the
    same outlink graph as host_pagerank_outlinks — the curation
    expansion primitive (rank every host by proximity to the seeds;
    the restart and all dangling mass return to the seeds).
    Rows-only; the numpy reference twin lives in TestPageRank."""
    from peri_ray.stages.similarity import pagerank

    pr = pagerank(_host_graph_edges(sf_dir), damping=0.85, iters=5,
                  src_col="id_a", dst_col="id_b",
                  dangling="redistribute", seeds=[1, 8, 22])
    return _pr_nodes_to_hosts(pr)


def fk_discovery_report(sf_dir: str):
    """Inclusion-dependency discovery (checks.inclusion_report): exact
    containment coefficients for six candidate FK pairs across the
    TPC-H-ish tables, all sharing one tagged distinct-value exchange.
    Oracle: per-pair DISTINCT counts + anti-membership counts with the
    identical int->double containment division."""
    from peri_ray.stages.checks import inclusion_report

    # one Dataset per TABLE (inclusion_report merges roles by Dataset
    # identity, so each table is scanned once for all its pair-sides)
    events = _read(sf_dir, "events", ["user_id"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey"])
    part = _read(sf_dir, "part", ["p_partkey"])
    pairs = [
        ("events.user_id in customer.c_custkey",
         events, "user_id", customer, "c_custkey"),
        ("lineitem.l_orderkey in orders.o_orderkey",
         lineitem, "l_orderkey", orders, "o_orderkey"),
        ("customer.c_nationkey in nation.n_nationkey",
         customer, "c_nationkey", nation, "n_nationkey"),
        ("nation.n_regionkey in region.r_regionkey",
         nation, "n_regionkey", region, "r_regionkey"),
        ("orders.o_custkey in customer.c_custkey",
         orders, "o_custkey", customer, "c_custkey"),
        ("part.p_partkey in lineitem.l_partkey",
         part, "p_partkey", lineitem, "l_partkey"),
    ]
    return inclusion_report(pairs)


def host_graph_shape(sf_dir: str):
    """Directed-graph shape metrics over the fixture host link graph:
    reciprocity (fraction of links whose reverse link also exists —
    the link-exchange / mutual-citation crawl signal) and out-in
    degree assortativity (do hub hosts link to hub hosts?).  Runs
    similarity.graph_degree_stats over the shared _host_graph_edges
    staging; every distributed piece ships int rows only and the
    Pearson floats are computed with the exact cast-each-operand-
    to-DOUBLE expression the oracle SQL writes."""
    from peri_ray.stages.similarity import graph_degree_stats

    return graph_degree_stats(_host_graph_edges(sf_dir),
                              src_col="id_a", dst_col="id_b")


def host_hits_outlinks(sf_dir: str):
    """HITS hubs & authorities over the fixture host outlink graph —
    the classic PageRank complement (hub hosts = link out to good
    authorities; authority hosts = linked from good hubs).  Rows-only
    (iterative L2-normalized floats have no SQL twin); the numpy
    reference twin lives in tests/test_stages.py::TestHITS."""
    from peri_ray.stages.similarity import hits_scores

    scores = hits_scores(_host_graph_edges(sf_dir), iters=5,
                         src_col="id_a", dst_col="id_b")

    def _host(t: pa.Table) -> pa.Table:
        k = t.column("node").combine_chunks().cast(pa.string())
        host = pc.binary_join_element_wise(
            pa.scalar("h"), k, pa.scalar(".example.com"), "")
        return pa.table({"host": host, "hub": t.column("hub"),
                         "auth": t.column("auth")})

    return scores.map_batches(_host, batch_format="pyarrow")


def fd_discovery_report(sf_dir: str):
    """Functional-dependency discovery (checks.fd_report): exact
    does-LHS-determine-RHS verdicts for six candidate column pairs
    across the tables, all sharing one tagged distinct-pair exchange.
    Completes the profiling trio (UCC `unique_keys_documents`, IND
    `fk_discovery_report`).  Oracle: per-pair COUNT(DISTINCT rhs) per
    lhs group with the identical null conventions."""
    from peri_ray.stages.checks import fd_report

    cands = [
        ("customer.c_nationkey->c_mktsegment",
         _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"]),
         "c_nationkey", "c_mktsegment"),
        ("nation.n_nationkey->n_name",
         _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
         "n_nationkey", "n_name"),
        ("orders.o_custkey->o_orderstatus",
         _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]),
         "o_custkey", "o_orderstatus"),
        ("documents.lang->source",
         _read(sf_dir, "documents", ["lang", "source"]),
         "lang", "source"),
        ("events.user_id->event_type",
         _read(sf_dir, "events", ["user_id", "event_type"]),
         "user_id", "event_type"),
        ("lineitem.l_orderkey->l_linestatus",
         _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus"]),
         "l_orderkey", "l_linestatus"),
    ]
    return fd_report(cands)


def host_kcore_members(sf_dir: str):
    """3-core of the undirected host link graph — the link-farm /
    mutual-promotion detector (dense subgraphs survive peeling,
    organic link tails do not).  Oracle: two UNROLLED peel rounds in
    SQL — the fixture graph reaches its k=3 fixpoint in zero rounds
    (verified arithmetically at every gate SF), so two rounds are a
    self-guarding surplus: if the data ever needed deeper peeling the
    twin would diverge loudly, never silently agree.  The general
    peeling operator (nontrivial depths, planted dense rings) is
    brute-force-pinned in tests/test_stages.py::TestKCore."""
    from peri_ray.stages.similarity import kcore_members

    core = kcore_members(_host_graph_edges(sf_dir), k=3,
                         src_col="id_a", dst_col="id_b")

    def _host(t: pa.Table) -> pa.Table:
        kk = t.column("node").combine_chunks().cast(pa.string())
        return pa.table({"host": pc.binary_join_element_wise(
            pa.scalar("h"), kk, pa.scalar(".example.com"), "")})

    return core.map_batches(_host, batch_format="pyarrow")


def reconcile_orders_lineitem(sf_dir: str):
    """Aggregate reconciliation: per order, does SUM(lineitem
    extendedprice) match the declared o_totalprice (exact integer
    cents, tolerance 0)?  The invoice-vs-line-items audit; in this
    synthetic data the totals are independent draws, so the check
    fires on (essentially) every order — including orders with no
    line items at all, whose computed total is 0 by the LEFT JOIN
    convention."""
    from peri_ray.stages.checks import reconciliation_check

    def _cents(col: str, out: str):
        def _f(t: pa.Table) -> pa.Table:
            c = pc.round(
                pc.multiply(t.column(col).combine_chunks(),
                            pa.scalar(100.0)),
                round_mode="half_towards_infinity").cast(pa.int64())
            k = t.column(t.column_names[0])
            return pa.table({t.column_names[0]: k, out: c})
        return _f

    detail = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice"]).map_batches(
        _cents("l_extendedprice", "cents"), batch_format="pyarrow")
    master = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice"]).map_batches(
        _cents("o_totalprice", "declared"), batch_format="pyarrow")

    def _dkey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["okey", "cents"])

    def _mkey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["okey", "declared"])

    out = reconciliation_check(
        detail.map_batches(_dkey, batch_format="pyarrow"),
        master.map_batches(_mkey, batch_format="pyarrow"),
        "okey", "cents", "declared", tol_cents=0)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["okey", "declared_cents", "computed_cents", "diff_cents"]),
        batch_format="pyarrow")


def contingency_lang_source(sf_dir: str):
    """Exact lang × source contingency table with integer chi-square
    ingredients (stats.contingency_profile) — is document language
    associated with crawl source?  The full marginal cross product
    rides the result (observed-0 cells carry test signal); floats
    never enter the hashed table."""
    from peri_ray.stages.stats import contingency_profile

    ds = _read(sf_dir, "documents", ["lang", "source"])
    return contingency_profile(ds, "lang", "source")


def corr_matrix_lineitem(sf_dir: str):
    """Pairwise Pearson correlations across four lineitem measures
    (quantity in units, price in cents, discount/tax in basis-ish
    hundredths) via stats.corr_matrix — exact integer moments, so the
    doubles hash-match the SQL twin with no rounding fudge."""
    from peri_ray.stages.stats import corr_matrix

    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    return corr_matrix(ds, [("l_quantity", 1), ("l_extendedprice", 100),
                            ("l_discount", 100), ("l_tax", 100)])


def url_pattern_profile(sf_dir: str):
    """Format-pattern discovery over the raw (pre-canonicalization)
    url column — the page-format census: scheme/host-case/port/query/
    fragment variants each collapse to a distinct signature with an
    exact count.  Oracle rebuilds the urls arithmetically and applies
    the identical RE2 class-run replacements."""
    from peri_ray.stages.checks import pattern_profile

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    return pattern_profile(ds, "url")


def seed_link_distance_hosts(sf_dir: str):
    """Minimum link distance from the trusted seed hosts (the same
    seeds as seed_pagerank_hosts) over the fixture outlink graph —
    the discrete TrustRank-style curation signal.  Oracle: recursive
    CTE BFS (UNION-deduped, hop-bounded) over the arithmetically
    rebuilt edge set."""
    from peri_ray.stages.similarity import seed_link_distance

    dist = seed_link_distance(_host_graph_edges(sf_dir),
                              seeds=[1, 8, 22], max_hops=6,
                              src_col="id_a", dst_col="id_b")

    def _host(t: pa.Table) -> pa.Table:
        k = t.column("node").combine_chunks().cast(pa.string())
        return pa.table({"host": pc.binary_join_element_wise(
            pa.scalar("h"), k, pa.scalar(".example.com"), ""),
            "hops": t.column("hops")})

    return dist.map_batches(_host, batch_format="pyarrow")


def repair_revalidate_events(sf_dir: str):
    """Closed-loop validation: validate events, REPAIR the violating
    columns (enum mode-fill for event_type, range clamp for value),
    revalidate with the same spec, and report per-rule violation
    counts before and after.  The after column is MEASURED by a real
    second validation pass — the oracle hard-codes 0, so a broken
    repairer (boundary off-by-one, null mangling) shows up as a
    mismatch, not a silent success."""
    from peri_ray.stages.checks import clamp_repair, repair_enum
    from peri_ray.validate import violation_rule_counts

    spec = {"event_id": ("required", "integer"),
            "event_type": ("enum", EVENT_TYPES),
            "value": ("float", ("range", (0.0, 100.0)))}
    cols = ["event_id", "event_type", "value"]

    ds = _read(sf_dir, "events", cols)
    before = violation_rule_counts(
        validate_dataset(ds, spec, id_column="event_id"))

    repaired = clamp_repair(
        repair_enum(_read(sf_dir, "events", cols), "event_type",
                    EVENT_TYPES),
        "value", 0.0, 100.0)
    after = violation_rule_counts(
        validate_dataset(repaired, spec, id_column="event_id"))

    b = {(r["rule_id"], r["path"]): r["cnt"] for r in before.to_pylist()}
    a = {(r["rule_id"], r["path"]): r["cnt"] for r in after.to_pylist()}
    keys = sorted(set(b) | set(a))
    return pa.table({
        "rule_id": pa.array([k[0] for k in keys], pa.string()),
        "path": pa.array([k[1] for k in keys], pa.string()),
        "before_cnt": pa.array([b.get(k, 0) for k in keys], pa.int64()),
        "after_cnt": pa.array([a.get(k, 0) for k in keys], pa.int64()),
    })


def cusum_daily_events(sf_dir: str):
    """Exact-integer positive CUSUM of daily event volumes against
    the period mean (temporal.cusum_daily_counts) — the volume
    changepoint monitor.  Oracle: recursive CTE threading the
    identical max(0, s + x·m − T) recurrence over the ordered days."""
    from peri_ray.stages.temporal import cusum_daily_counts

    return cusum_daily_counts(_read(sf_dir, "events", ["ts"]))


def conditional_null_rates_recrawl(sf_dir: str):
    """Missingness-by-producer audit over the modified recrawl fixture
    (text nulled on doc_id % 5, as in inferred_spec_violations):
    exact per-source null counts/rates for text and lang via
    stats.conditional_null_rates — the per-class view a global null
    rate averages away."""
    from peri_ray.stages.stats import conditional_null_rates

    def _recrawl(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": t.column("source"),
            "text": pc.if_else(pa.array(idn % 5 == 0),
                               pa.scalar(None, pa.string()),
                               t.column("text").combine_chunks()),
            "lang": t.column("lang"),
        })

    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "lang", "source"]).map_batches(
        _recrawl, batch_format="pyarrow")
    return conditional_null_rates(ds, "source", ["text", "lang"])


def readability_documents(sf_dir: str):
    """Flesch reading-ease per document (text.readability_scores) —
    the readable-band quality prior.  Oracle: regexp_extract_all run
    lengths + the identical IEEE expression over int→double casts."""
    from peri_ray.stages.text import readability_scores

    return readability_scores(_read(sf_dir, "documents",
                                    ["doc_id", "text"]))


def mirror_hosts_documents(sf_dir: str):
    """Mirror-SITE detection over the host fixture: hosts 10 and 20
    get deterministically identical page content (same (round,
    position) pages), every other host keeps its organic text —
    dedup.mirror_site_pairs must flag exactly the planted pair.
    Rows-only (minhash sketches have no SQL twin); the merge-equals-
    union identity and the planted-pair recall are pinned in
    tests/test_stages.py::TestMirrorSites."""
    from peri_ray.stages.dedup import mirror_site_pairs

    def _fixture(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        host = (ids // 4) % 50
        is_m = (host == 10) | (host == 20)
        rnd = (ids // 200).astype(str)
        pos = (ids % 4).astype(str)
        planted = np.char.add(
            np.char.add("mirror canonical page ", rnd),
            np.char.add("-", np.char.add(
                pos, " syndicated body text replicated verbatim "
                     "across the ring for detection")))
        orig = np.asarray(t.column("text").combine_chunks()
                          .to_pylist(), dtype=object)
        text = np.where(is_m, planted.astype(object), orig)
        return pa.table({"host_key": pa.array(host, pa.int64()),
                         "text": pa.array(text.tolist(), pa.string())})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fixture, batch_format="pyarrow")
    return mirror_site_pairs(ds, threshold=0.9)


def url_overlap_recrawl(sf_dir: str):
    """Zero-exchange sketch triage of recrawl overlap, AUDITED:
    HLL-estimated URL intersection between the even-doc snapshot and
    the every-third-doc snapshot (the raw-url fixture is injective in
    doc_id, so true overlap = ids divisible by 6).  The emitted
    ``hll_*_ok`` booleans assert each p=14 estimate sits inside its
    error envelope (±3% per set ≈ 3.7σ; the inclusion-exclusion
    intersection inside ±4% of the exact UNION size) — the sketch's
    accuracy is the oracle-checked contract (twin: exact id-arithmetic
    counts + TRUE).  The production path stays zero-exchange; the
    exact counts ride one cheap doc_id-only pass."""
    from peri_ray.stages.checks import hll_overlap_estimate
    from peri_ray.stages.web import canonicalize_urls

    def _half(mod: int):
        ds = _read(sf_dir, "documents", ["doc_id", "source"])

        def _f(t: pa.Table, m=mod) -> pa.Table:
            ids = (t.column("doc_id").combine_chunks()
                   .to_numpy(zero_copy_only=False).astype(np.int64))
            return t.filter(pa.array(ids % m == 0))

        return canonicalize_urls(
            ds.map_batches(_f, batch_format="pyarrow").map_batches(
                _attach_web_columns, batch_format="pyarrow"))

    est = hll_overlap_estimate(_half(2), _half(3), "url", "url")
    r = _rows(est)[0]

    def _cnt(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"a": pa.array([int((ids % 2 == 0).sum())], pa.int64()),
                         "b": pa.array([int((ids % 3 == 0).sum())], pa.int64()),
                         "o": pa.array([int((ids % 6 == 0).sum())], pa.int64())})

    n_a = n_b = n_o = 0
    for row in _read(sf_dir, "documents", ["doc_id"]).map_batches(
            _cnt, batch_format="pyarrow").take_all():
        n_a += row["a"]
        n_b += row["b"]
        n_o += row["o"]
    n_union = n_a + n_b - n_o
    ok_a = abs(r["ndv_a"] - n_a) <= max(3.0, 0.03 * n_a)
    ok_b = abs(r["ndv_b"] - n_b) <= max(3.0, 0.03 * n_b)
    ok_o = abs(r["est_overlap"] - n_o) <= max(5.0, 0.04 * n_union)
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "n_overlap": pa.array([n_o], pa.int64()),
        "hll_a_ok": pa.array([ok_a], pa.bool_()),
        "hll_b_ok": pa.array([ok_b], pa.bool_()),
        "hll_overlap_ok": pa.array([ok_o], pa.bool_())})


def term_index_probe(sf_dir: str):
    """Persisted inverted-index retrieval: build the hash-sharded term
    index under /tmp, then answer a two-term AND query reading only
    the shards the terms hash to (text.write_term_index /
    probe_term_index — the third persisted-artifact index after
    minhash and Bloom).  Oracle: list_contains over the tokenizer
    twin's regexp_split_to_array."""
    import tempfile

    from peri_ray.stages.text import probe_term_index, write_term_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    import os
    import shutil

    out = tempfile.mkdtemp(prefix="term_index_")
    try:
        write_term_index(ds, out)
        docs = probe_term_index(out, ["merge", "window"],
                                mode="and").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
        mpath = out.rstrip("/") + ".index.json"
        if os.path.exists(mpath):
            os.remove(mpath)
    return docs.map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")


def takedown_purge_documents(sf_dir: str):
    """Deletion-compliance purge over a fixture with planted verbatim
    copies: docs with doc_id % 10 == 3 share one syndicated body; the
    takedown list is (doc_id % 30 == 13) plus doc 1 (organic text).
    checks.takedown_purge must drop the listed ids AND every verbatim
    copy of their content — surviving doc_ids are oracle-compared."""
    from peri_ray.stages.checks import takedown_purge

    def _fixture(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        text = pc.if_else(pa.array(ids % 10 == 3),
                          pa.scalar("copied syndicated article body",
                                    pa.string()),
                          t.column("text").combine_chunks())
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fixture, batch_format="pyarrow").materialize()

    def _dead(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"doc_id": pa.array(
            ids[(ids % 30 == 13) | (ids == 1)], pa.int64())})

    tomb = ds.map_batches(_dead, batch_format="pyarrow")
    out = takedown_purge(ds, tomb)
    return out.map_batches(lambda t: t.select(["doc_id"]),
                           batch_format="pyarrow")


def url_content_conflicts(sf_dir: str):
    """Crawl-consistency audit: does each CANONICAL url serve one
    text?  The fixture maps 4 consecutive doc_ids onto one canonical
    url (distinct organic texts), so the FD url -> text is heavily
    violated — exactly what checks.fd_report counts (lhs values with
    >1 distinct rhs).  A clean crawl keeps violating_lhs at 0.  The
    audit keys on CANONICAL urls (raw urls are unique per capture by
    construction, which would make the check vacuous)."""
    from peri_ray.stages.checks import fd_report
    from peri_ray.stages.web import canonicalize_urls

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ds = canonicalize_urls(
        ds.map_batches(_attach_web_columns, batch_format="pyarrow"))
    return fd_report([("url->text", ds, "canonical_url", "text")])


def bm25_index_top_docs(sf_dir: str):
    """BM25 top-20 through the PERSISTED index (text.bm25_probe_index)
    — identical query and score expression to bm25_top_docs, but the
    corpus text is read only at index build; the probe touches the
    query terms' shards plus the doclen sidecar.  Shares
    bm25_top_docs' oracle shape bit-for-bit."""
    import os
    import shutil
    import tempfile

    from peri_ray.stages.text import bm25_probe_index, write_term_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = tempfile.mkdtemp(prefix="bm25_index_")
    try:
        write_term_index(ds, out)
        top = bm25_probe_index(out, ["spark", "window", "merge"], k=20)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        mpath = out.rstrip("/") + ".index.json"
        if os.path.exists(mpath):
            os.remove(mpath)
    return top.rename_columns(["doc_id", "score", "rank"])


def phrase_probe_documents(sf_dir: str):
    """Exact 2-word phrase retrieval through a bigram index
    (write_term_index(ngram=2) + probe_term_index): docs containing
    the adjacent pair "merge window".  A phrase is ONE posting lookup
    — exact by construction at n=2.  Oracle rebuilds bigrams with the
    documented unnest(list_transform(range(...))) pattern."""
    import os
    import shutil
    import tempfile

    from peri_ray.stages.text import probe_term_index, write_term_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = tempfile.mkdtemp(prefix="bigram_index_")
    try:
        write_term_index(ds, out, ngram=2)
        docs = probe_term_index(out, ["merge window"]).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
        mpath = out.rstrip("/") + ".index.json"
        if os.path.exists(mpath):
            os.remove(mpath)
    return docs.map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")


def ivf_index_ann_topk(sf_dir: str):
    """ANN top-k through the PERSISTED IVF index: vectors land in
    per-cell parquet files at build; the probe reads only the
    queries' nprobe nearest cells' FILES (real I/O pruning, where
    ivf_ann_topk scans every block and filters post-read).  Rows-only
    (ANN); exactness at nprobe=n_cells and pruned-probe recall are
    pinned in tests/test_stages.py::TestIVFIndex."""
    import os
    import shutil
    import tempfile

    from peri_ray.stages.similarity import probe_ivf_index, write_ivf_index

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_rows = ds.take(3)
    queries = np.stack([np.asarray(r["embedding"], np.float32)
                        for r in q_rows])
    out = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        write_ivf_index(ds, out, n_cells=8)
        results = probe_ivf_index(out, queries, k=10, nprobe=3)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        mpath = out.rstrip("/") + ".index.json"
        if os.path.exists(mpath):
            os.remove(mpath)
    qi, vid, rank = [], [], []
    for i, res in enumerate(results):
        for j, (v, s) in enumerate(res):
            qi.append(q_rows[i]["vec_id"])
            vid.append(v)
            rank.append(j)
    return pa.table({"query_id": pa.array(qi, pa.int64()),
                     "vec_id": pa.array(vid, pa.int64()),
                     "rank": pa.array(rank, pa.int64())})


def k_anonymity_events(sf_dir: str):
    """k-anonymity / l-diversity audit (pii.k_anonymity_report) with
    (user_id, activity day) as the quasi-identifier — the classic
    released-log re-identification surface — and event_type as the
    sensitive column (k=5, l=2).  Quasi-combination cardinality scales
    with the row count (~40 K groups at sf0.1), which is exactly the
    bucketed-exchange case.  Oracle: GROUP BY HAVING count(*) < 5 OR
    count(DISTINCT event_type) < 2 with the identical day derivation."""
    from peri_ray.stages.pii import k_anonymity_report

    def _fixture(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts").combine_chunks()))
        day = pc.strftime(t.column("ts").combine_chunks(),
                          format="%Y-%m-%d")
        return pa.table({"user_id": t.column("user_id"), "day": day,
                         "event_type": t.column("event_type")})

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"]
               ).map_batches(_fixture, batch_format="pyarrow")
    return k_anonymity_report(ds, ["user_id", "day"], "event_type",
                              k=5, l=2)


def scd2_user_history(sf_dir: str):
    """SCD2 capture-history build (temporal.scd2_history) over events:
    per user in (ts, event_id) order, validity intervals with version
    numbers and changed-vs-previous flags on event_type.  Oracle:
    lead/lag/row_number window functions over the identical ordering."""
    from peri_ray.stages.temporal import scd2_history

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])
    return scd2_history(ds, key_col="user_id", ts_col="ts",
                        attr_col="event_type", id_col="event_id")


def dedup_weights_documents(sf_dir: str):
    """Duplication-aware example weights (dedup.dedup_example_weights):
    every 10th doc gets an identical planted body (one hot cluster —
    the skew case), the rest stay organic; each row keeps weight
    1/cluster_size.  Oracle: COUNT(*) OVER (PARTITION BY text) with
    the identical planted fixture and int->double division."""
    from peri_ray.stages.dedup import dedup_example_weights

    def _fixture(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        planted = pa.array(idn % 10 == 3)
        text = pc.if_else(planted,
                          pa.scalar("copied syndicated article body"),
                          t.column("text").combine_chunks())
        return pa.table({"doc_id": ids, "text": text})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fixture, batch_format="pyarrow")
    return dedup_example_weights(ds)


def url_prefix_rollup(sf_dir: str):
    """URL path-prefix rollup (web.url_prefix_counts): pages per
    (host, path prefix) at depths 1..3 over the canonicalized
    messy-URL fixture — the crawl-frontier / sitemap concentration
    audit.  Oracle: the identical per-depth RE2 prefix extraction
    UNION ALL'd then grouped."""
    from peri_ray.stages.web import canonicalize_urls, url_prefix_counts

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = canonicalize_urls(ds.map_batches(_attach_web_columns,
                                          batch_format="pyarrow"))
    return url_prefix_counts(ds, max_depth=3)


def bpe_merges_documents(sf_dir: str):
    """BPE tokenizer training over the corpus (text.bpe_train): one
    distributed word-count pass, then vocab-bounded merge iterations —
    returns the learned merge list (rank, left, right, pair_count).
    Rows-only: iterative merge learning has no SQL twin; the engine is
    pinned against an independent Sennrich-style reference in
    tests/test_stages.py::TestBPETrain."""
    from peri_ray.stages.text import bpe_train

    return bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=40)


def bpe_trained_token_counts(sf_dir: str):
    """Per-doc token counts under the corpus-trained BPE merges
    (text.bpe_encode_counts) — the packing/budget input a real
    tokenizer feeds.  Rows-only (encode has no SQL twin; unit-pinned)."""
    from peri_ray.stages.text import bpe_encode_counts, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(ds, n_merges=40)
    return bpe_encode_counts(ds, merges)


def threshold_sweep_documents(sf_dir: str):
    """Quality-filter threshold sweep (learn.threshold_sweep): exact
    confusion counts + precision/recall at 10 candidate cutoffs over a
    deterministic score (hash-derived, so every SF has both classes on
    both sides of every cutoff) against the n_chars >= 300 gold gate.
    Oracle: per-threshold FILTER aggregates over the identical integer
    derivations, int->double divisions."""
    from peri_ray.stages.learn import threshold_sweep

    def _fixture(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64))
        s = ((ids * 2654435761) % 1000).astype(np.float64) / 1000.0
        y = pc.greater_equal(
            t.column("n_chars").combine_chunks().cast(pa.int64()), 300)
        return pa.table({"score": pa.array(s), "label": y})

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        _fixture, batch_format="pyarrow")
    return threshold_sweep(ds, "score", "label",
                           [i / 10.0 for i in range(10)])


def weekly_active_users(sf_dir: str):
    """Exact 7-day rolling COUNT(DISTINCT user) per observed day
    (temporal.rolling_distinct_counts) — the WAU monitor, computed via
    per-key first-active-day range-adds into a day diff array (ONE
    exchange; no 7x window explosion).  Oracle: self-join of distinct
    (user, day) pairs against observed days over the same 7-day
    window."""
    from peri_ray.stages.temporal import rolling_distinct_counts

    return rolling_distinct_counts(
        _read(sf_dir, "events", ["ts", "user_id"]),
        ts_col="ts", key_col="user_id", window_days=7)


def host_components(sf_dir: str):
    """Undirected connected components over the fixture host link
    graph (dedup.connected_components — the same hybrid min-label
    machinery the near-dup keeper uses, here as the site-cluster /
    link-neighborhood profiling query).  Oracle: recursive-CTE
    reachability closure with min-id labels over the arithmetically
    rebuilt edge set."""
    from peri_ray.stages.dedup import connected_components

    comp = connected_components(_host_graph_edges(sf_dir))

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "label"])

    return comp.map_batches(_rename, batch_format="pyarrow")


def contrastive_negatives(sf_dir: str):
    """Contrastive negative sampling (dedup.negative_samples) over the
    planted-duplicate fixture (every 10th doc shares one body, so the
    content-collision exclusion actually fires): 2 deterministic
    negatives per anchor, same-content candidates dropped.  Oracle:
    identical modular candidate arithmetic + IS DISTINCT FROM text
    exclusion through a self join."""
    from peri_ray.stages.dedup import negative_samples

    def _fixture(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        planted = pa.array(idn % 10 == 3)
        text = pc.if_else(planted,
                          pa.scalar("copied syndicated article body"),
                          t.column("text").combine_chunks())
        return pa.table({"doc_id": ids, "text": text})

    # step=1003: j=1 candidates of planted anchors are planted too
    # ((3*48271 + 1003 + 7) % 10 == 3), so ~5% of candidate rows are
    # true content collisions — the exclusion path is NON-vacuous at
    # every SF (row count < 2x docs proves the filter fired)
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fixture, batch_format="pyarrow")
    return negative_samples(ds, k=2, step=1003)


def markov_transitions_events(sf_dir: str):
    """Per-user event-type transition matrix
    (temporal.markov_transitions): exact consecutive-step counts in
    (ts, event_id) order plus row-normalized probabilities.  Oracle:
    lead() window over the identical ordering, grouped, with
    int->double division."""
    from peri_ray.stages.temporal import markov_transitions

    return markov_transitions(
        _read(sf_dir, "events",
              ["event_id", "user_id", "ts", "event_type"]))


def time_window_sums_events(sf_dir: str):
    """Trailing 1-hour RANGE-frame window aggregate per user
    (temporal.time_window_sums): for every event, the count and the
    exact BIGINT-micro sum of that user's events with ts in
    [ts - 1h, ts].  Oracle: SUM/COUNT OVER (PARTITION BY user ORDER BY
    ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)."""
    from peri_ray.stages.temporal import time_window_sums

    return time_window_sums(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        window_s=3600)


def scd2_point_in_time(sf_dir: str):
    """Point-in-time lookup against the SCD2 capture history
    (temporal.point_in_time_join): probe = every event shifted
    +17 minutes; result = the version (number + changed flag) of that
    user's history whose validity interval contains the probe instant;
    probes before a user's first capture keep a null payload.
    Oracle: LEFT JOIN h ON user AND pts >= valid_from AND
    (valid_to IS NULL OR pts < valid_to) over the lead/row_number
    history rebuild."""
    from peri_ray.stages.temporal import point_in_time_join, scd2_history

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type"])
    hist = scd2_history(ds, key_col="user_id", ts_col="ts",
                        attr_col="event_type", id_col="event_id")

    def _probe(t):
        ok = pc.and_(pc.is_valid(t.column("ts").combine_chunks()),
                     pc.is_valid(t.column("user_id").combine_chunks()))
        sub = t.filter(ok)
        pts = pc.add(sub.column("ts").combine_chunks().cast(pa.int64()),
                     pa.scalar(17 * 60 * 1_000_000, pa.int64()))
        return pa.table({"event_id": sub.column("event_id"),
                         "user_id": sub.column("user_id"),
                         "pts": pts.cast(pa.timestamp("us"))})

    probe = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(_probe, batch_format="pyarrow")
    out = point_in_time_join(probe, hist, key_col="user_id",
                             probe_ts="pts", probe_id="event_id",
                             right_cols=["version", "changed"])
    return out.map_batches(
        lambda t: t.rename_columns(
            ["event_id", "user_id", "version_at", "changed_at"]),
        batch_format="pyarrow")


def ngram_novelty_recrawl(sf_dir: str):
    """Per-new-page n-gram novelty vs the indexed base corpus
    (text.ngram_novelty, word bigrams): base = documents, delta = the
    deterministic recrawl fixture; for each delta doc the fraction of
    its DISTINCT bigrams the base corpus has never seen.  Oracle:
    unnest-rebuilt bigrams on both sides + LEFT JOIN IS NULL
    counting."""
    from peri_ray.stages.text import ngram_novelty

    base = _read(sf_dir, "documents", ["doc_id", "text"])
    delta = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _recrawl_batch, batch_format="pyarrow")
    return ngram_novelty(base, delta, n=2)


def lexical_diversity_documents(sf_dir: str):
    """Per-doc type-token ratio (text.lexical_diversity): tokens,
    distinct tokens and their ratio — the low-diversity quality tail.
    Oracle: COUNT / COUNT(DISTINCT) over the unnested tokenizer
    twin."""
    from peri_ray.stages.text import lexical_diversity

    return lexical_diversity(_read(sf_dir, "documents",
                                   ["doc_id", "text"]))


def mutual_information_lang_source(sf_dir: str):
    """Mutual information / Theil's U between lang and source
    (stats.contingency_profile -> mutual_information_stat): the
    information-theoretic companion to the chi-square verdict.
    Oracle: identical exact-integer cells + per-term ln expression,
    ROUND 6 on every float (transcendental-sum convention)."""
    from peri_ray.stages.stats import (contingency_profile,
                                       mutual_information_stat)

    cells = contingency_profile(
        _read(sf_dir, "documents", ["lang", "source"]), "lang", "source")
    return mutual_information_stat(cells)


def zipf_slope_documents(sf_dir: str):
    """Zipf slope of the corpus term-frequency distribution
    (text.zipf_slope, top 100 terms by occurrences): log-log
    least-squares slope, the generated-text / template-corpus health
    probe.  Oracle: row_number-ranked counts + the closed-form
    regression expression, ROUND 6."""
    from peri_ray.stages.text import zipf_slope

    return zipf_slope(_read(sf_dir, "documents", ["text"]), k=100)


def rrf_retrieval_docs(sf_dir: str):
    """Reciprocal-rank fusion of two BM25 query formulations
    (text.multi_query_rrf): the RAG query-expansion ensemble, fused in
    rank space (1/(60+rank) per list), top-20 by (rrf DESC, doc_id).
    Oracle: two templated BM25 ranked CTEs + the identical fixed-order
    fusion expression — the doubles are single divisions/adds from
    exact ints, bit-identical with no rounding."""
    from peri_ray.stages.text import multi_query_rrf

    return multi_query_rrf(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        [["spark", "window", "merge"], ["stream", "batch", "sort"]],
        k_each=50, k=20)


def _attach_content_html_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: html with four block segments — a nav bar (anchors), the
    doc text in <p>…</p> (link-free), a "read more" teaser with an
    inline anchor, and a footer (anchors) — so main-content extraction
    must keep EXACTLY the text block (iff >= 20 visible chars) while
    the ENGINE parses real bytes and the twin re-derives the verdict
    arithmetically from text alone.  Null text -> null html."""
    txt = t.column("text").combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    html = pc.binary_join_element_wise(
        pa.scalar('<html><body><div><a href="/n">Home</a> '
                  '<a href="/a">About</a></div><p>'), txt,
        pa.scalar('</p><p>see <a href="/x">more</a> here</p>'
                  '<div><a href="/t">Terms</a></div></body></html>'),
        "", null_handling="emit_null")
    return t.append_column("html", html.cast(pa.binary()))


def main_content_docs(sf_dir: str):
    """Main-content extraction (web.extract_main_content): jusText-lite
    block classifier over the four-block html fixture — keeps exactly
    the link-free text block when it has >= 20 visible chars.  Oracle:
    re-derives main_text/n_kept/n_blocks from text arithmetically, so
    a broken splitter, tag-stripper or anchor counter mismatches."""
    from peri_ray.stages.web import extract_main_content

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _attach_content_html_fixture, batch_format="pyarrow")
    return extract_main_content(ds, min_chars=20)


def peak_hourly_rate_users(sf_dir: str):
    """Burst detection (temporal.peak_window_rate): each user's peak
    number of events inside any trailing 1-hour window, plus their
    event total — the rate-limit / bot-cadence audit.  Oracle: max
    over the COUNT(*) RANGE-frame window per user."""
    from peri_ray.stages.temporal import peak_window_rate

    return peak_window_rate(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        window_s=3600)


def welch_t_drift_events(sf_dir: str):
    """Welch unequal-variance t verdict between the event_id-parity
    halves of events.value (checks.welch_t_two_sample): exact integer
    cents moments, every double one fixed-order expression — the
    parametric mean-shift member of the drift family.  Oracle: HUGEINT
    moment CTE + the identical t / Welch-Satterthwaite expressions."""
    from peri_ray.stages.checks import welch_t_two_sample

    return welch_t_two_sample(
        _read(sf_dir, "events", ["event_id", "value"]),
        "value", split_col="event_id", split_mod=2, scale=100)


def dow_anomaly_events(sf_dir: str):
    """Day-of-week seasonal anomaly report (temporal.dow_anomalies):
    each day's event count z-scored against its weekday's mean/stddev
    — the ingestion monitor that respects weekly seasonality.  Oracle:
    identical exact-int moments per dow + the same fixed-order z
    expression."""
    from peri_ray.stages.temporal import dow_anomalies

    return dow_anomalies(_read(sf_dir, "events", ["ts"]))


def hill_tail_hosts(sf_dir: str):
    """Hill power-law tail index over host in-link degrees
    (web.hill_tail_estimator, top-20 order statistics) — the
    link-farm / unnatural-graph probe.  Engine parses the anchors out
    of html bytes; the twin rebuilds the in-degrees arithmetically
    from the fixture."""
    from peri_ray.stages.web import (extract_outlinks,
                                     hill_tail_estimator, href_host)

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        _attach_linked_html_fixture, batch_format="pyarrow")
    edges = extract_outlinks(ds, html_col="html", id_col="doc_id")

    def _dst_counts(t: pa.Table) -> pa.Table:
        h = href_host(t.column("href"))
        g = (pa.table({"host": h}).filter(pc.is_valid(h))
             .group_by("host").aggregate([([], "count_all")]))
        return g.rename_columns(["host", "in_links"])

    from peri_ray.stages.dedup import guard_driver_groups

    per_host: dict[str, int] = {}
    for r in edges.map_batches(_dst_counts,
                               batch_format="pyarrow").iter_rows():
        per_host[r["host"]] = per_host.get(r["host"], 0) + r["in_links"]
        guard_driver_groups(len(per_host), "hill_tail_hosts")
    deg = pa.table({"host": pa.array(sorted(per_host), pa.string()),
                    "in_links": pa.array(
                        [per_host[h] for h in sorted(per_host)],
                        pa.int64())})
    return hill_tail_estimator(deg, "in_links", k=20)


def systematic_sample_documents(sf_dir: str):
    """Systematic (every-50th) sampling in global key order: the exact
    distributed ORDER BY (stats.global_rank) composed with a
    rank-modulo filter — position-stratified sampling with zero
    clustering bias, reproducible at any block layout.  Oracle:
    row_number window + modulo."""
    from peri_ray.stages.stats import global_rank

    ranked = global_rank(_read(sf_dir, "documents",
                               ["doc_id", "n_chars"]),
                         "n_chars", "doc_id", n_ranges=16)

    def _every_50(t: pa.Table) -> pa.Table:
        r = t.column("rank").combine_chunks().to_numpy(
            zero_copy_only=False)
        return t.filter(pa.array(r % 50 == 0))

    return ranked.map_batches(_every_50, batch_format="pyarrow")


def merged_recrawl_documents(sf_dir: str):
    """Upsert / MERGE-INTO snapshot application: the recrawl fixture's
    rows win for every key they carry (updates + inserts); base rows
    whose key the recrawl lacks persist — the keyed-table refresh a
    crawl store runs per snapshot (deletes need explicit tombstones;
    see takedown_purge_documents).  Engine: one hash-partitioned anti
    join (base minus recrawl keys) + union — no broadcast, both sides
    corpus-sized.  Oracle: anti-join UNION ALL."""
    from peri_ray.stages.joins import hash_join

    base = _read(sf_dir, "documents", ["doc_id", "text"])
    recrawl = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _recrawl_batch, batch_format="pyarrow")
    keep_base = hash_join(base, recrawl, "doc_id", "doc_id",
                          ["text"], [], how="anti")
    return keep_base.union(recrawl)


def interpolated_values_events(sf_dir: str):
    """Per-user linear interpolation of planted value gaps
    (temporal.linear_interpolate): event_id % 9 values are nulled,
    then each gap takes the time-weighted blend of its observed
    neighbors; edge gaps stay null.  Oracle: IGNORE-NULLS window
    neighbors + the identical blend expression."""
    from peri_ray.stages.temporal import linear_interpolate

    def _gap(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        v = pc.if_else(pa.array(idn % 9 == 0),
                       pa.nulls(t.num_rows, pa.float64()),
                       t.column("value").combine_chunks()
                        .cast(pa.float64()))
        return pa.table({"event_id": ids, "user_id": t.column("user_id"),
                         "ts": t.column("ts"), "v": v})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value"]).map_batches(
        _gap, batch_format="pyarrow")
    return linear_interpolate(ds)


def bucketed_join_lineitem_orders(sf_dir: str):
    """Write-once-join-free layout end to end: lineitem and orders are
    persisted hash-bucketed on their order keys
    (sources.write_bucketed), then joined with ZERO exchange — one
    independent Arrow join per co-located bucket pair
    (joins.bucketed_disk_join).  Same result set as the exchange join
    query; the oracle is the plain SQL join."""
    import tempfile

    from peri_ray.sources import write_bucketed
    from peri_ray.stages.joins import bucketed_disk_join

    root = tempfile.mkdtemp(prefix="peri_bucketed_")
    dl = write_bucketed(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]),
        f"{root}/lineitem", "l_orderkey", n_buckets=16)
    do = write_bucketed(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]),
        f"{root}/orders", "o_orderkey", n_buckets=16)
    return bucketed_disk_join(dl, do, left_cols=["l_linenumber"],
                              right_cols=["o_orderstatus"])


def lang_mismatch_docs(sf_dir: str):
    """Metadata-vs-content validation: docs whose DECLARED lang
    disagrees with the trigram language-ID guess (text.add_lang_id,
    actor pool) — the lying-metadata audit a crawl store runs before
    trusting lang for routing/mixing.  Emits only the disagreeing
    rows (declared non-null, guess != declared).  Oracle: the
    generated profile-scoring CASE chain compared to lang."""
    from peri_ray.stages.text import add_lang_id

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    guessed = add_lang_id(ds, concurrency=2)

    def _mism(t: pa.Table) -> pa.Table:
        lang = t.column("lang").combine_chunks().cast(pa.string())
        g = t.column("lang_guess").combine_chunks().cast(pa.string())
        bad = pc.and_(pc.is_valid(lang), pc.invert(
            pc.fill_null(pc.equal(lang, g), False)))
        sub = t.filter(bad)
        return pa.table({
            "doc_id": sub.column("doc_id"),
            "lang": sub.column("lang").combine_chunks().cast(pa.string()),
            "lang_guess": sub.column("lang_guess").combine_chunks()
                             .cast(pa.string())})

    return guessed.map_batches(_mism, batch_format="pyarrow")


def mean_imputed_values_events(sf_dir: str):
    """Group-mean imputation: event_id % 9 values are nulled, then
    each gap takes ITS EVENT TYPE's mean of the observed values —
    the categorical-conditioned numeric fill (two streaming passes:
    exact integer cents moments per enum-bounded group, then a
    broadcast fill; zero shuffles).  Oracle: AVG of cents per type +
    the identical fixed-order fill expression."""
    def _gap(t: pa.Table) -> pa.Table:
        idn = t.column("event_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        v = pc.if_else(pa.array(idn % 9 == 0),
                       pa.nulls(t.num_rows, pa.float64()),
                       t.column("value").combine_chunks()
                        .cast(pa.float64()))
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "v": v})

    ds = _read(sf_dir, "events",
               ["event_id", "event_type", "value"]).map_batches(
        _gap, batch_format="pyarrow")

    # pass 1: exact integer-cents moments per group (enum-bounded)
    def _mom(t: pa.Table) -> pa.Table:
        v = t.column("v").combine_chunks()
        sub = t.filter(pc.is_valid(v))
        if sub.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        cents = pc.round(pc.multiply(sub.column("v").combine_chunks(),
                                     100.0),
                         round_mode="half_towards_infinity") \
            .cast(pa.int64())
        g = (pa.table({"g": sub.column("event_type").combine_chunks()
                            .cast(pa.string()), "c": cents})
             .group_by("g").aggregate([("c", "sum"), ([], "count_all")]))
        return pa.table({"g": g.column("g"),
                         "n": g.column("count_all").cast(pa.int64()),
                         "s": g.column("c_sum").cast(pa.int64())})

    mom: dict[str, list[int]] = {}
    for r in ds.map_batches(_mom, batch_format="pyarrow").iter_rows():
        m = mom.setdefault(r["g"], [0, 0])
        m[0] += int(r["n"])
        m[1] += int(r["s"])
    # mean in ORIGINAL units: (sum_cents / n) / 100, each step float
    means = {g: (float(s) / float(n)) / 100.0
             for g, (n, s) in mom.items() if n > 0}

    def _fill(t: pa.Table) -> pa.Table:
        v = t.column("v").combine_chunks()
        gt = t.column("event_type").combine_chunks().cast(pa.string())
        fillv = pa.array([means.get(x) for x in gt.to_pylist()],
                         pa.float64())
        return pa.table({
            "event_id": t.column("event_id"),
            "event_type": gt,
            "v_filled": pc.if_else(pc.is_valid(v), v, fillv)})

    return ds.map_batches(_fill, batch_format="pyarrow")


def bucketed_agg_lineitem(sf_dir: str):
    """Second consumer of the SAME bucketed layout the join query
    writes: exact per-order quantity cents aggregated with ZERO
    exchange — each bucket directory owns its keys completely, so one
    Arrow group_by per bucket is globally exact.  The point is
    amortization: one write-time exchange serves joins AND
    aggregations forever after."""
    import json
    import os
    import tempfile

    import ray.data as rd

    from peri_ray.sources import write_bucketed

    root = tempfile.mkdtemp(prefix="peri_bucketed_agg_")
    dl = write_bucketed(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        f"{root}/lineitem", "l_orderkey", n_buckets=16)
    with open(dl + ".bucketed.json") as f:
        n = json.load(f)["n_buckets"]

    def _agg(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for b in t.column("bucket").to_pylist():
            d = os.path.join(dl, f"bucket={b}")
            if not os.path.isdir(d):
                continue
            tb = pq.read_table(d, columns=["l_orderkey", "l_quantity"])
            cents = pc.round(pc.multiply(
                tb.column("l_quantity").combine_chunks(), 100.0),
                round_mode="half_towards_infinity").cast(pa.int64())
            g = (pa.table({"l_orderkey": tb.column("l_orderkey"),
                           "c": cents})
                 .group_by("l_orderkey").aggregate([("c", "sum"),
                                                    ([], "count_all")]))
            outs.append(pa.table({
                "l_orderkey": g.column("l_orderkey"),
                "sum_qty_cents": g.column("c_sum").cast(pa.int64()),
                "n_lines": g.column("count_all").cast(pa.int64())}))
        if not outs:
            return pa.schema([("l_orderkey", pa.int64()),
                              ("sum_qty_cents", pa.int64()),
                              ("n_lines", pa.int64())]).empty_table()
        return pa.concat_tables(outs)

    buckets = rd.from_items([{"bucket": b} for b in range(n)],
                            override_num_blocks=n)
    return buckets.map_batches(_agg, batch_format="pyarrow")


def trending_terms_monthly(sf_dir: str):
    """Trending terms per capture month: top-5 terms by occurrence
    within each month of the deterministic warc_ts fixture — the
    time-resolved vocabulary monitor (a term spiking into a month's
    top-k is a crawl-mix change).  Shape: per-batch (month, term)
    count partials → ONE bucketed sum exchange → the two-phase
    distributed top-k per group.  Oracle: unnest + row_number over
    (count DESC, term)."""
    from peri_ray.stages.dedup import grouped_sum_via_buckets
    from peri_ray.stages.stats import top_k_per_group
    from peri_ray.stages.text import flat_tokens

    ds = _read(sf_dir, "documents",
               ["doc_id", "source", "text"]).map_batches(
        _attach_web_columns, batch_format="pyarrow")

    def _month_terms(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("text").combine_chunks()))
        if sub.num_rows == 0:
            return pa.table({"month": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        month = pc.strftime(sub.column("warc_ts").combine_chunks(),
                            format="%Y-%m")
        flat, lens = flat_tokens(sub.column("text"))
        idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        g = (pa.table({"month": month.take(pa.array(idx)), "term": flat})
             .group_by(["month", "term"]).aggregate([([], "count_all")]))
        return g.rename_columns(["month", "term", "c"])

    counts = grouped_sum_via_buckets(
        ds.map_batches(_month_terms, batch_format="pyarrow"),
        ["month", "term"], "c")
    return top_k_per_group(counts, "month", "c", k=5,
                           descending=True, tiebreak="term")


# ---------------------------------------------------------------------------
# crawl-frontier discovery, recrawl scheduling, EWMA volume monitor
# ---------------------------------------------------------------------------


def _attach_frontier_html_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: :func:`_attach_linked_html_fixture` with host_mod=97 —
    targets span h0..h96 while only h0..h49 are ever crawled; the
    uncrawled tail h50..h96 is the planted frontier the engine must
    recover from the html bytes."""
    return _attach_linked_html_fixture(t, host_mod=97)


def uncrawled_frontier_hosts(sf_dir: str):
    """Crawl-frontier discovery (web.crawl_frontier): link-target
    hosts never seen as a crawled host, with aggregate link counts —
    one bucketed (dst_host, n_links) sum + the hash-bucketed
    anti-join; html never leaves the anchor-extract stage."""
    from peri_ray.stages.web import (canonicalize_urls, crawl_frontier,
                                     host_of)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    ds = host_of(canonicalize_urls(ds)).map_batches(
        _attach_frontier_html_fixture, batch_format="pyarrow")
    ds = ds.map_batches(lambda t: t.select(["host", "html"]),
                        batch_format="pyarrow")
    return crawl_frontier(ds)


def recrawl_priority_urls(sf_dir: str):
    """Recrawl scheduling (web.recrawl_priority): per canonical URL,
    historical content-change count × capture staleness as an exact
    BIGINT priority — content ships as 64-bit hashes only; the 'now'
    anchor is the corpus max capture time (one pruned ts pass)."""
    from peri_ray.stages.web import (canonicalize_urls, max_timestamp_us,
                                     recrawl_priority)
    from peri_ray.state.sketches import hash_strings

    base = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    ds = canonicalize_urls(base.map_batches(_attach_web_columns,
                                            batch_format="pyarrow"))

    def _prep(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text").combine_chunks()
                           .cast(pa.string()), "")
        h = hash_strings(txt).view(np.int64)
        return pa.table({"canonical_url": t.column("canonical_url"),
                         "warc_ts": t.column("warc_ts"),
                         "content_hash": pa.array(h),
                         "doc_id": t.column("doc_id")})

    mx = max_timestamp_us(
        _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
            _attach_web_columns, batch_format="pyarrow"))
    return recrawl_priority(ds.map_batches(_prep, batch_format="pyarrow"),
                            mx)


def ewma_daily_events(sf_dir: str):
    """EWMA control chart of daily event volumes
    (temporal.ewma_daily_counts, α = 1/8) — the smoothed-level volume
    monitor beside the CUSUM changepoint.  Oracle: recursive CTE
    threading the identical IEEE recurrence over the ordered days."""
    from peri_ray.stages.temporal import ewma_daily_counts

    return ewma_daily_counts(_read(sf_dir, "events", ["ts"]))


def weighted_sample_md5_docs(sf_dir: str):
    """A-ES weighted sampling with the md5-derived draw
    (stats.weighted_sample_md5) — the oracle-checkable member of the
    sampling family: DuckDB rebuilds the identical ln(u)/w keys from
    md5 hex and must select the same 40 docs."""
    from peri_ray.stages.stats import weighted_sample_md5

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample_md5(ds, "n_chars", "doc_id", k=40)


def jaro_winkler_pairs(sf_dir: str):
    """Jaro-Winkler fuzzy self-join on part names (dedup
    .jaro_winkler_join, threshold 0.871234567) — record linkage via a
    normalized similarity, completing the fuzzy-key family beside the
    edit-distance join.  The oracle is the literal all-pairs
    jaro_winkler_similarity SQL over the same deterministic sample, so
    candidate COMPLETENESS is hash-checked."""
    from peri_ray.stages.dedup import jaro_winkler_join

    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def _sample(t: pa.Table) -> pa.Table:
        k = (t.column("p_partkey").combine_chunks()
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(k % 20 == 0))

    sampled = ds.map_batches(_sample, batch_format="pyarrow")
    return jaro_winkler_join(sampled, "p_name", "p_partkey")


def pareto_events(sf_dir: str):
    """Skyline / Pareto-frontier query (stats.skyline): the
    non-dominated (value max, ts max) events of a deterministic
    1-in-8 sample — the multi-objective selection primitive ("no
    other event is both newer and larger").  Each block ships only
    its local frontier (the skyline is distributive), the driver
    merge is bounded by frontier-size x blocks, and the oracle is the
    literal NOT EXISTS dominance SQL, so frontier COMPLETENESS is
    hash-checked."""
    from peri_ray.stages.stats import skyline

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        ids = (t.column("event_id").combine_chunks()
               .to_numpy(zero_copy_only=False))
        sub = t.filter(pa.array(ids % 8 == 0))
        ts_us = sub.column("ts").combine_chunks().cast(pa.int64())
        return pa.table({"event_id": sub.column("event_id"),
                         "user_id": sub.column("user_id"),
                         "ts_us": ts_us,
                         "value": sub.column("value")})

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return skyline(prepped, {"value": "max", "ts_us": "max"},
                   ["event_id", "user_id"])


def coverage_selected_docs(sf_dir: str):
    """Greedy maximum-coverage subset selection
    (text.greedy_coverage_select, k=4 rounds over word bigrams of a
    deterministic 1-in-4 sample) — submodular diverse-subset curation.
    The oracle unrolls the identical greedy recurrence as chained
    CTEs, so both the picked ids AND the per-round marginal gains are
    hash-checked."""
    from peri_ray.stages.text import greedy_coverage_select

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _sample(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(ids % 4 == 0))

    sampled = ds.map_batches(_sample, batch_format="pyarrow")
    return greedy_coverage_select(sampled, k=4, n=2)


def join_size_probe(sf_dir: str):
    """Exact join-cardinality + skew probe (joins.join_cardinality):
    |lineitem ⋈ orders| and the hottest key's contribution computed
    from (key, count) partials only — the planner check that decides
    hash_join vs salted_hash_join before any payload moves."""
    from peri_ray.stages.joins import join_cardinality

    return join_cardinality(
        _read(sf_dir, "lineitem", ["l_orderkey"]),
        _read(sf_dir, "orders", ["o_orderkey"]),
        "l_orderkey", "o_orderkey")


def cooccurrence_pairs_docs(sf_dir: str):
    """Frequent co-occurring term pairs (text.term_cooccurrence,
    support ≥ 3/8 of docs) — the 2-itemset basket miner over
    documents.  Oracle: distinct doc-term self-join with HAVING over
    the identical floor'd support."""
    from peri_ray.stages.text import term_cooccurrence

    return term_cooccurrence(_read(sf_dir, "documents",
                                   ["doc_id", "text"]))


def lof_outliers_embeddings(sf_dir: str):
    """Local Outlier Factor (similarity.lof_scores, k=5) over the
    same deterministic embedding sample as the kNN graph — the
    density-ratio outlier score for multi-cluster corpora.  The
    oracle chains kdist → reachability → lrd → LOF from the literal
    all-pairs cosine CTE, so every score is checked end to end."""
    from peri_ray.stages.similarity import lof_scores

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _sample(t: pa.Table) -> pa.Table:
        k = (t.column("vec_id").combine_chunks()
             .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(k % 10 == 0))

    return lof_scores(ds.map_batches(_sample, batch_format="pyarrow"),
                      k=5)


def hapax_rate_documents(sf_dir: str):
    """Trigram hapax-legomena rate (text.hapax_rate, n=3) — the
    vocabulary-tail probe beside zipf_slope_documents; exact type and
    hapax counts with a single-division double."""
    from peri_ray.stages.text import hapax_rate

    return hapax_rate(_read(sf_dir, "documents", ["text"]), n=3)


def mmr_reranked_docs(sf_dir: str):
    """MMR diversity re-ranking (text.mmr_rerank, λ=0.5): BM25
    top-10 candidates for a fixed query, greedily re-ranked to 5 by
    relevance minus max word-bigram Jaccard to the already-selected —
    the RAG diversification step.  The oracle unrolls the identical
    greedy over the same bit-exact BM25 scores and the literal
    candidate-pair Jaccard matrix."""
    from peri_ray.stages.text import mmr_rerank

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return mmr_rerank(ds, ["spark", "window", "merge"],
                      k_candidates=10, k_select=5, lam=0.5)


def weighted_len_quantiles_docs(sf_dir: str):
    """Token-weighted doc-length percentiles
    (stats.weighted_quantiles, q ∈ {1/4, 1/2, 7/8}): the n_chars
    below which that fraction of the corpus's TOKENS lives — the
    packing-mix view of length (the unweighted median doc
    misrepresents token mass).  Pure-integer selection rule
    (8·cumw ≥ n·totw) on both engines."""
    from peri_ray.stages.stats import weighted_quantiles
    from peri_ray.stages.text import flat_tokens

    def _wf(t: pa.Table):
        import numpy as np

        txt = t.column("text").combine_chunks()
        _, lens = flat_tokens(pc.fill_null(txt, ""))
        valid = pc.is_valid(txt).to_numpy(zero_copy_only=False)
        return np.where(valid, lens, 0)

    ds = _read(sf_dir, "documents", ["text", "n_chars"])

    def _drop_nulltext(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("text").combine_chunks()))

    return weighted_quantiles(
        ds.map_batches(_drop_nulltext, batch_format="pyarrow"),
        "n_chars", None, qs_eighths=(2, 4, 7), weight_fn=_wf)


def source_ablation_report(sf_dir: str):
    """Leave-one-source-out unigram ablation
    (text.source_ablation_nll): per-source NLL of the fixed target
    slice under the model trained without that source — the cheap
    influence/data-valuation signal for corpus mixing.  Integer
    micro-nat NLLs (per-term quantization before the weighted sum),
    so the oracle hash-matches exactly."""
    from peri_ray.stages.text import source_ablation_nll

    return source_ablation_nll(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]))


def monotonic_violations_events(sf_dir: str):
    """Per-key monotonicity constraint (temporal.monotonic_violations):
    users whose event values ever DECREASE along (ts, event_id) order,
    with exact comparable-step and decrease counts — the
    sequence-shaped validation rule.  Oracle: lag() window with
    matching null semantics."""
    from peri_ray.stages.temporal import monotonic_violations

    return monotonic_violations(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]),
        "user_id", ["ts", "event_id"], "value")


def dedup_mutation_robustness(sf_dir: str):
    """Self-evaluation of the MinHash near-dup pipeline against
    PLANTED mutations at controlled damage rates: every 5th doc gets
    a copy with r% of its WORDS deleted at deterministic stride
    positions (r ∈ {0, 4, 10, 20} — the crawl-noise model:
    boilerplate shifts and truncations drop tokens, they don't edit
    inside words), the standard LSH+verify route runs over
    originals+mutants, and the report gives recall of the planted
    (orig, mutant) pairs per rate — the measurement that picks
    shingle size / threshold for a given expected noise level.
    Rows-only (the approximate route has no SQL twin); structure
    pinned by TestMutationRobustness."""
    import numpy as np

    from peri_ray.stages.dedup import (minhash_lsh_candidates,
                                       verify_candidates)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rates = (0, 4, 10, 20)

    def _with_mutants(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False))
        texts = t.column("text").combine_chunks().to_pylist()
        out_id, out_tx = list(ids), list(texts)
        for i, (d, s) in enumerate(zip(ids, texts)):
            if s is None or d % 5 != 0 or len(s) < 40:
                continue
            rate = rates[(d // 5) % len(rates)]
            ws = s.split(" ")
            n_del = (len(ws) * rate) // 100
            if n_del:
                # deterministic word-deletion positions: stride the doc
                step = max(1, len(ws) // n_del)
                drop = set(range(0, len(ws), step)[:n_del])
                s2 = " ".join(w for j, w in enumerate(ws)
                              if j not in drop)
            else:
                s2 = s
            out_id.append(int(d) + 10_000_000)
            out_tx.append(s2)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    # two consumers (candidates + verify) -> pin the mutant corpus
    # (CLAUDE.md multi-consumer rule); the per-doc mutation loop and
    # the read beneath it run exactly once
    corpus = ds.map_batches(_with_mutants,
                            batch_format="pyarrow").materialize()
    cands = minhash_lsh_candidates(corpus, bands=8, num_perm=64,
                                   dedupe=False)
    found = {(r["id_a"], r["id_b"]) for r in verify_candidates(
        corpus, cands, threshold=0.6).take_all()}

    def _eligible_ids(t: pa.Table) -> pa.Table:
        ids = (t.column("doc_id").combine_chunks()
               .to_numpy(zero_copy_only=False))
        txt = t.column("text").combine_chunks()
        ok = (pc.fill_null(pc.and_kleene(
                  pc.is_valid(txt),
                  pc.greater_equal(pc.utf8_length(txt), 40)), False)
              .to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(
            ids[ok & (ids % 5 == 0)], pa.int64())})

    planted: dict[int, set] = {r: set() for r in rates}
    # ids-only partials cross to the driver — never the text
    for row in ds.map_batches(_eligible_ids,
                              batch_format="pyarrow").take_all():
        d = row["doc_id"]
        planted[rates[(d // 5) % len(rates)]].add(
            (d, d + 10_000_000))
    rows = []
    for r in rates:
        p = planted[r]
        f = len(p & found)
        rows.append((r, len(p), f,
                     round(f / len(p), 4) if p else None))
    return pa.table({
        "rate_pct": pa.array([r[0] for r in rows], pa.int64()),
        "planted": pa.array([r[1] for r in rows], pa.int64()),
        "found": pa.array([r[2] for r in rows], pa.int64()),
        "recall": pa.array([r[3] for r in rows], pa.float64())})


def _attach_clustered_link_fixture(t: pa.Table) -> pa.Table:
    """FIXTURE: :func:`_attach_linked_html_fixture` with host_mod=25 —
    targets stay inside h0..h24, so crawled hosts h25..h49 are the
    planted orphan half the audit must recover from the html bytes."""
    return _attach_linked_html_fixture(t, host_mod=25)


def orphan_hosts_docs(sf_dir: str):
    """Orphan-host audit: crawled hosts with ZERO inbound links from
    any OTHER host (the un-navigable corner of the link graph — a
    crawl-policy / spam-isolation signal).  Outlinks parse out of the
    html bytes (a broken parser mismatches), inbound-host distinct
    ships hosts only, and the verdict is one hash-bucketed anti join;
    under the clustered fixture the odd 25 hosts are planted
    orphans."""
    from peri_ray.stages.dedup import grouped_sum_via_buckets
    from peri_ray.stages.joins import hash_join
    from peri_ray.stages.web import (canonicalize_urls, extract_outlinks,
                                     host_of)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = ds.map_batches(_attach_web_columns, batch_format="pyarrow")
    # two consumers (edges + page counts) -> pin the PRUNED
    # (doc_id, host) projection, never the url-wide table
    # (CLAUDE.md multi-consumer rule)
    hosts = host_of(canonicalize_urls(ds)).map_batches(
        lambda t: t.select(["doc_id", "host"]),
        batch_format="pyarrow").materialize()
    linked = hosts.map_batches(_attach_clustered_link_fixture,
                               batch_format="pyarrow").map_batches(
        lambda t: t.select(["host", "html"]), batch_format="pyarrow")
    edges = extract_outlinks(linked, html_col="html", id_col="host")

    def _inbound(t: pa.Table) -> pa.Table:
        from peri_ray.stages.web import href_host

        src = t.column("host").combine_chunks()
        dst = href_host(t.column("href"))
        keep = pc.and_(pc.is_valid(dst), pc.not_equal(src, dst))
        sub = pa.table({"dst_host": dst}).filter(
            pc.fill_null(keep, False))
        return sub.group_by("dst_host").aggregate([])

    inbound = edges.map_batches(_inbound, batch_format="pyarrow")

    def _page_counts(t: pa.Table) -> pa.Table:
        g = (t.select(["host"]).group_by("host")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["host", "n_pages"])

    pages = grouped_sum_via_buckets(
        hosts.map_batches(_page_counts, batch_format="pyarrow"),
        ["host"], "n_pages")
    return hash_join(pages, inbound, "host", "dst_host",
                     ["n_pages"], [], how="anti")


def tv_drift_event_type(sf_dir: str):
    """Total-variation + Hellinger drift between the event_id-parity
    halves of event_type (checks.tv_hellinger_drift) — the
    bounded-metric corner of the drift family; TV's integer identity
    makes it hash-bit-exact."""
    from peri_ray.stages.checks import tv_hellinger_drift

    return tv_hellinger_drift(
        _read(sf_dir, "events", ["event_id", "event_type"]),
        "event_type", "event_id")


def budget_allocation_docs(sf_dir: str):
    """Max-min-fair token-budget allocation across sources
    (stats.budget_allocation, budget = half the corpus tokens): the
    water-filling planner that precedes corpus-mixing rates.  Every
    output column is BIGINT-exact; the oracle replays the identical
    integer cap search with window prefix sums."""
    from peri_ray.stages.stats import budget_allocation

    return budget_allocation(
        _read(sf_dir, "documents", ["source", "text"]), 1, 2)


def typosquat_hosts_docs(sf_dir: str):
    """Typosquat audit (dedup.reference_edit_matches): crawled hosts
    within Levenshtein distance 1 of a protected reference name, with
    exact distances and page counts — the bipartite, broadcast-side
    member of the fuzzy-key family.  Oracle: DISTINCT canonical hosts
    cross the VALUES reference list with levenshtein()."""
    from peri_ray.stages.dedup import reference_edit_matches
    from peri_ray.stages.web import canonicalize_urls, host_of

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    hosts = host_of(canonicalize_urls(ds.map_batches(
        _attach_web_columns, batch_format="pyarrow"))).map_batches(
        lambda t: t.select(["host"]), batch_format="pyarrow")
    return reference_edit_matches(
        hosts, "host", ["h7.example.com", "h23.example.com"])


def pareto_events_by_type(sf_dir: str):
    """Per-group skyline (stats.grouped_skyline): the (value max,
    ts max) Pareto frontier WITHIN each event type over the same
    1-in-8 sample as the global frontier — 'no later event of the
    same type was larger'.  Oracle: per-group NOT EXISTS dominance."""
    from peri_ray.stages.stats import grouped_skyline

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "value", "event_type"])

    def _prep(t: pa.Table) -> pa.Table:
        ids = (t.column("event_id").combine_chunks()
               .to_numpy(zero_copy_only=False))
        sub = t.filter(pa.array(ids % 8 == 0))
        return pa.table({
            "event_type": sub.column("event_type"),
            "event_id": sub.column("event_id"),
            "user_id": sub.column("user_id"),
            "ts_us": sub.column("ts").combine_chunks().cast(pa.int64()),
            "value": sub.column("value")})

    return grouped_skyline(
        ds.map_batches(_prep, batch_format="pyarrow"), "event_type",
        {"value": "max", "ts_us": "max"}, ["event_id", "user_id"])


def vocab_growth_monthly(sf_dir: str):
    """Monthly vocabulary growth (text.vocab_growth) over the
    deterministic warc_ts fixture: distinct active terms per month
    and the first-seen fraction — the Heaps-law-in-time crawl-health
    probe beside trending terms."""
    from peri_ray.stages.text import vocab_growth

    ds = _read(sf_dir, "documents",
               ["doc_id", "source", "text"]).map_batches(
        _attach_web_columns, batch_format="pyarrow")
    return vocab_growth(ds)


#: proposed tightened spec for the spec-impact query (text min 20,
#: lang becomes required, n_chars gains an upper bound)
DOCS_SPEC_V2 = {
    "doc_id": ("required", "integer"),
    "text": ("required", ("string", ("min", 20))),
    "lang": ("required", ("enum", LANGS)),
    "n_chars": ("integer", ("range", (0, 900))),
}


def spec_impact_documents(sf_dir: str):
    """Spec-evolution impact (validate.spec_impact): exact per-rule
    violation counts under the CURRENT docs spec and a tightened
    proposal, with deltas, in ONE fused pass — the pre-rollout
    contract-change report.  Oracle: per-rule predicate counts for
    both versions FULL OUTER joined."""
    from peri_ray.validate import spec_impact

    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "lang", "n_chars"])
    return spec_impact(ds, DOCS_SPEC, DOCS_SPEC_V2,
                       id_column="doc_id")


def distinctive_terms_by_source(sf_dir: str):
    """Contrastive keyword report (text.distinctive_terms, k=3):
    per-source top terms by smoothed log-odds vs the rest of the
    corpus, in integer micro-nats — 'what does this slice talk about
    that the others don't'."""
    from peri_ray.stages.text import distinctive_terms

    return distinctive_terms(
        _read(sf_dir, "documents", ["source", "text"]), k=3)


def syndication_matrix_docs(sf_dir: str):
    """Cross-source syndication matrix (text.syndication_matrix,
    5-token openings): source pairs sharing distinct ledes — the
    wire-copy propagation monitor.  Oracle: distinct
    (opening, source) self-join."""
    from peri_ray.stages.text import syndication_matrix

    return syndication_matrix(
        _read(sf_dir, "documents", ["source", "text"]), n=5)


def host_concentration_docs(sf_dir: str):
    """Crawl-volume concentration: the smallest number of hosts whose
    pages cover at least HALF the corpus (Pareto-k, the complement of
    the Gini monitor: "how few hosts dominate?").  Integer rule
    2·cum ≥ total over (count desc, host asc) order — no float can
    drift the cut.  One bounded host-count pass; driver work is
    host-domain-sized."""
    from peri_ray.stages.dedup import grouped_sum_via_buckets
    from peri_ray.stages.web import canonicalize_urls, host_of

    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    hosts = host_of(canonicalize_urls(ds.map_batches(
        _attach_web_columns, batch_format="pyarrow")))

    def _counts(t: pa.Table) -> pa.Table:
        g = (t.select(["host"]).group_by("host")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["host", "n"])

    counts = grouped_sum_via_buckets(
        hosts.map_batches(_counts, batch_format="pyarrow"),
        ["host"], "n")
    from peri_ray.stages.dedup import guard_driver_groups

    agg: dict[str, int] = {}
    for t in (ray.get(r) for r in counts.to_arrow_refs()):
        for h, n in zip(t.column("host").to_pylist(),
                        t.column("n").to_pylist()):
            agg[h] = agg.get(h, 0) + int(n)
        guard_driver_groups(len(agg), "host_concentration_docs")
    total = sum(agg.values())
    order = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    k50 = 0
    for i, (_, n) in enumerate(order, start=1):
        cum += n
        if 2 * cum >= total:
            k50 = i
            break
    return pa.table({
        "k_hosts_50": pa.array([k50], pa.int64()),
        "total_hosts": pa.array([len(agg)], pa.int64()),
        "total_pages": pa.array([total], pa.int64())})


def char_entropy_documents(sf_dir: str):
    """Per-doc codepoint Shannon entropy (text.char_entropy_scores) —
    the low-information quality gate beside the zlib ratio, exact and
    oracle-checked (the twin evaluates the identical
    ln(n) − Σ c·ln c / n identity over regexp-exploded chars)."""
    from peri_ray.stages.text import char_entropy_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return char_entropy_scores(ds)


def host_capture_gaps_docs(sf_dir: str):
    """Per-host inter-capture gap profile (web.host_capture_gaps) —
    crawl-politeness / scheduling audit over the deterministic ts
    fixture; exact integer-µs gaps, window-lag SQL twin."""
    from peri_ray.stages.web import (canonicalize_urls, host_capture_gaps,
                                     host_of)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    ds = host_of(canonicalize_urls(ds.map_batches(
        _attach_web_columns, batch_format="pyarrow")))
    ds = ds.map_batches(lambda t: t.select(["doc_id", "host", "warc_ts"]),
                        batch_format="pyarrow")
    return _collect(host_capture_gaps(ds), pa.schema([
        ("host", pa.string()), ("n_captures", pa.int64()),
        ("min_gap_us", pa.int64()), ("max_gap_us", pa.int64())]))


def spec_compat_report_docs(sf_dir: str):
    """Static spec-compat prediction checked against measured data
    impact: ``spec_compat`` classifies DOCS_SPEC → DOCS_SPEC_V2
    (static, schema-only), then ONE fused two-plan pass counts the
    rows the change actually regresses (valid under V1, invalid under
    V2).  ``prediction_ok`` asserts the analyzer's soundness
    contract: a change predicted backward-compatible must regress
    ZERO rows (a breaking prediction makes no data claim).  Twin:
    exact predicate counts + the literal pair's known classification."""
    from peri_ray.compat import is_backward_compatible
    from peri_ray.compile import compile_spec

    predicted_compatible = is_backward_compatible(DOCS_SPEC, DOCS_SPEC_V2)
    plans = [compile_spec(DOCS_SPEC, id_column="doc_id"),
             compile_spec(DOCS_SPEC_V2, id_column="doc_id")]

    def _part(t: pa.Table) -> pa.Table:
        v = []
        for plan in plans:
            out, _ = plan.run_batch(t)
            v.append(out.column("valid").combine_chunks()
                     .to_numpy(zero_copy_only=False))
        old_valid = int(v[0].sum())
        regressed = int((v[0] & ~v[1]).sum())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "old_valid": pa.array([old_valid], pa.int64()),
            "regressed": pa.array([regressed], pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    n = old_valid = regressed = 0
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=8192).take_all():
        n += r["n"]
        old_valid += r["old_valid"]
        regressed += r["regressed"]
    prediction_ok = predicted_compatible is False or regressed == 0
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_old_valid": pa.array([old_valid], pa.int64()),
        "n_regressed": pa.array([regressed], pa.int64()),
        "predicted_compatible": pa.array([predicted_compatible],
                                         pa.bool_()),
        "prediction_ok": pa.array([prediction_ok], pa.bool_())})


def stratified_sample_docs(sf_dir: str):
    """Per-language uniform k-sample WITHOUT replacement via md5-hex
    order (k=5, seed 99) — the stratified evaluation-set builder:
    every stratum contributes exactly min(k, stratum size) docs, and
    the selection has a literal SQL twin (ROW_NUMBER over the same
    md5 order), so the sample itself is hash-checked, not just its
    size.  Same distributed shape as top_k_per_group: ≤k rows per
    (lang, block) cross the exchange; the md5-per-row loop is the
    documented price of the SQL twin (weighted_sample_md5
    convention)."""
    import hashlib

    from peri_ray.stages.stats import top_k_per_group

    seed = 99
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        lang = t.column("lang").combine_chunks()
        sub = pa.table({"doc_id": ids, "lang": lang}).filter(
            pc.and_(pc.is_valid(ids), pc.is_valid(lang)))
        tag = f"#{seed}".encode()
        keys = [hashlib.md5(str(i).encode() + tag).hexdigest()[:16]
                for i in sub.column("doc_id").to_pylist()]
        return sub.append_column("md5k", pa.array(keys, pa.string()))

    out = top_k_per_group(ds.map_batches(_key, batch_format="pyarrow"),
                          key="lang", order_col="md5k", k=5,
                          descending=False, tiebreak="doc_id")

    def _sel(t: pa.Table) -> pa.Table:
        return t.select(["lang", "doc_id"])

    return out.map_batches(_sel, batch_format="pyarrow")


def violation_exemplars_docs(sf_dir: str):
    """Violation triage report: per rule_id, the exact violation count
    plus the three smallest offending record ids as exemplars — the
    "show me a concrete failing row per rule" report an operator
    reads before a quarantine decision.  Per-batch partials keep ≤3
    candidate ids per rule (rules-bounded driver merge, no shuffle);
    the twin re-derives rows from the negated-rule UNION and picks
    exemplars with an ordered list."""
    from collections import defaultdict

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    combined = validate_dataset(ds, DOCS_SPEC, id_column="doc_id")
    viols = violations_dataset(combined)

    def _part(t: pa.Table) -> pa.Table:
        rid = pc.cast(t.column("record_id").combine_chunks(), pa.int64())
        rule = t.column("rule_id").combine_chunks()
        g = pa.table({"rule_id": rule, "rid": rid})
        rules, ns, c1, c2, c3 = [], [], [], [], []
        for r in pc.unique(rule).to_pylist():
            ids = (g.filter(pc.equal(g.column("rule_id"), r))
                   .column("rid").to_numpy(zero_copy_only=False))
            ids = np.sort(ids)
            rules.append(r)
            ns.append(len(ids))
            tops = [int(x) for x in ids[:3]] + [None] * 3
            c1.append(tops[0])
            c2.append(tops[1])
            c3.append(tops[2])
        return pa.table({
            "rule_id": pa.array(rules, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "c1": pa.array(c1, pa.int64()),
            "c2": pa.array(c2, pa.int64()),
            "c3": pa.array(c3, pa.int64())})

    merged: dict = defaultdict(lambda: [0, []])
    for r in viols.map_batches(_part, batch_format="pyarrow").take_all():
        a = merged[r["rule_id"]]
        a[0] += r["n"]
        a[1].extend(x for x in (r["c1"], r["c2"], r["c3"])
                    if x is not None)
        a[1] = sorted(a[1])[:3]
    rules = sorted(merged)
    ex = {k: (merged[k][1] + [None] * 3)[:3] for k in rules}
    return pa.table({
        "rule_id": pa.array(rules, pa.string()),
        "n_violations": pa.array([merged[k][0] for k in rules],
                                 pa.int64()),
        "ex1": pa.array([ex[k][0] for k in rules], pa.int64()),
        "ex2": pa.array([ex[k][1] for k in rules], pa.int64()),
        "ex3": pa.array([ex[k][2] for k in rules], pa.int64())})


def suggest_constraints_docs(sf_dir: str):
    """Constraint suggestion — the profile→propose step that closes
    the loop with spec_compat/spec_impact: for each numeric column,
    propose a ('range', (lo, hi)) from the EXACT 0.1%/99.9% order
    statistics and report its measured support (rows inside the
    proposed range).  A schema owner reads this, tightens the spec,
    and spec_compat/spec_impact predict+measure the rollout.  Exact
    percentile_disc via the value-count merge (low-cardinality
    numerics); one extra counting pass for support."""
    from concurrent.futures import ThreadPoolExecutor

    from peri_ray.stages.stats import exact_quantiles

    plan = [("documents", "n_chars"), ("lineitem", "l_quantity")]

    def _one(tbl_col):
        tbl, col = tbl_col
        qt = exact_quantiles(_read(sf_dir, tbl, [col]), [col],
                             qs=(0.001, 0.999))
        by_q = {r["q"]: r["value"] for r in qt.to_pylist()}
        lo, hi = by_q[0.001], by_q[0.999]

        def _cnt(t: pa.Table, c=col, lo=lo, hi=hi) -> pa.Table:
            v = t.column(c).combine_chunks().cast(pa.float64())
            nn = v.drop_null()
            within = pc.sum(pc.and_(
                pc.greater_equal(nn, lo),
                pc.less_equal(nn, hi))).as_py() or 0
            return pa.table({"n": pa.array([len(nn)], pa.int64()),
                             "w": pa.array([int(within)], pa.int64())})

        n = w = 0
        for r in _read(sf_dir, tbl, [col]).map_batches(
                _cnt, batch_format="pyarrow").take_all():
            n += r["n"]
            w += r["w"]
        return (tbl, col, lo, hi, n, w)

    # the two tables' pipelines are independent — overlap them (the
    # expectation-suite pattern)
    with ThreadPoolExecutor(max_workers=len(plan)) as pool:
        rows = list(pool.map(_one, plan))
    return pa.table({
        "tbl": pa.array([r[0] for r in rows], pa.string()),
        "col": pa.array([r[1] for r in rows], pa.string()),
        "lo": pa.array([r[2] for r in rows], pa.float64()),
        "hi": pa.array([r[3] for r in rows], pa.float64()),
        "n": pa.array([r[4] for r in rows], pa.int64()),
        "n_within": pa.array([r[5] for r in rows], pa.int64())})


def violation_rate_daily(sf_dir: str):
    """Validation-health time series: per capture day (warc_ts
    fixture), the exact crawled-row and invalid-row counts under
    DOCS_SPEC — the corpus-monitoring view that feeds the CUSUM/EWMA
    detectors; a failing extractor or a schema rollout shows up as a
    step in this series.  ONE fused pass (plan.run_batch + day
    rollup per batch), day-bounded driver merge, zero shuffle."""
    from collections import defaultdict

    from peri_ray.compile import compile_spec

    plan = compile_spec(DOCS_SPEC, id_column="doc_id")
    ds = _read(sf_dir, "documents",
               ["doc_id", "source", "text", "lang", "n_chars"])

    def _part(t: pa.Table) -> pa.Table:
        t = _attach_web_columns(t)
        out, _ = plan.run_batch(
            t.select(["doc_id", "text", "lang", "n_chars"]))
        valid = out.column("valid").combine_chunks()
        day = pc.strftime(t.column("warc_ts").combine_chunks(),
                          format="%Y-%m-%d")
        g = (pa.table({"day": day,
                       "bad": pc.invert(valid).cast(pa.int64())})
             .group_by("day")
             .aggregate([("bad", "sum"), ([], "count_all")]))
        return g.rename_columns(["day", "n_invalid", "n"])

    merged: dict = defaultdict(lambda: [0, 0])
    for r in ds.map_batches(_part, batch_format="pyarrow").take_all():
        merged[r["day"]][0] += r["n"]
        merged[r["day"]][1] += r["n_invalid"]
    days = sorted(merged)
    return pa.table({
        "day": pa.array(days, pa.string()),
        "n": pa.array([merged[d][0] for d in days], pa.int64()),
        "n_invalid": pa.array([merged[d][1] for d in days],
                              pa.int64())})


def host_gini_docs(sf_dir: str):
    """Gini coefficient of crawl volume across hosts — the
    balance-of-coverage monitor beside the Pareto-k concentration
    probe, kept EXACT as an integer fraction:

        gini_num = 2·Σ i·x_i − (n+1)·Σ x     (x ascending, i 1-based)
        gini_den = n·Σ x

    so the hash-compared values are BIGINTs (the float G = num/den is
    association-free but the repo's convention keeps hash-compared
    ratios integral).  One bounded host-count pass; driver work is
    host-domain-sized."""
    import ray

    from peri_ray.stages.dedup import grouped_sum_via_buckets
    from peri_ray.stages.web import canonicalize_urls, host_of

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    hosts = host_of(canonicalize_urls(ds.map_batches(
        _attach_web_columns, batch_format="pyarrow")))

    def _counts(t: pa.Table) -> pa.Table:
        g = (t.select(["host"]).group_by("host")
             .aggregate([([], "count_all")]))
        return g.rename_columns(["host", "n"])

    counts = grouped_sum_via_buckets(
        hosts.map_batches(_counts, batch_format="pyarrow"),
        ["host"], "n")
    from peri_ray.stages.dedup import guard_driver_groups

    agg: dict[str, int] = {}
    for t in (ray.get(r) for r in counts.to_arrow_refs()):
        for h, n in zip(t.column("host").to_pylist(),
                        t.column("n").to_pylist()):
            agg[h] = agg.get(h, 0) + int(n)
        guard_driver_groups(len(agg), "host_gini_docs")
    xs = sorted(agg.values())
    n = len(xs)
    total = sum(xs)
    num = 2 * sum(i * x for i, x in enumerate(xs, start=1)) \
        - (n + 1) * total
    den = n * total
    return pa.table({
        "n_hosts": pa.array([n], pa.int64()),
        "total_pages": pa.array([total], pa.int64()),
        "gini_num": pa.array([num], pa.int64()),
        "gini_den": pa.array([den], pa.int64())})
