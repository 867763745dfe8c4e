"""Sources & sinks — the engine's I/O surface.

The reference has no data I/O at all (records arrive as in-memory
terms; only *schemas* serialize, via JSON Schema —
``lib/peri/json_schema/``), so this surface comes from Ray Data
directly (SURVEY §2.6).  Everything here is a thin, opinionated wrapper
that bakes in the scale rules:

- **prune at the read**: always pass ``columns=`` so only needed
  columns leave storage;
- **resumable output**: partitioned parquet (violations by ``rule_id``,
  validated rows by input shard), never one giant file.
"""

from __future__ import annotations

import os

import pyarrow as pa


def _shim_fsspec_http() -> None:
    """Compatibility shim: Ray's parquet path resolution does
    ``from fsspec.implementations.http import HTTPFileSystem`` on every
    read/write and catches only ModuleNotFoundError.  In this container
    aiohttp is absent, so that import fails — and with CONCURRENT
    Dataset creations (threaded fragment pipelines) a second thread can
    observe the half-executed module and get a plain ImportError that
    Ray does not catch.  Cache a completed stub module once so the
    import always succeeds; the sentinel class never matches Ray's
    isinstance checks, preserving behavior."""
    import sys

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ModuleNotFoundError:
        pass
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class _HTTPFileSystemUnavailable:  # pragma: no cover - sentinel only
        pass

    mod.HTTPFileSystem = _HTTPFileSystemUnavailable
    sys.modules["fsspec.implementations.http"] = mod


_shim_fsspec_http()

__all__ = [
    "read_table",
    "read_json_table",
    "read_csv_table",
    "write_validated",
    "write_violations",
]


def _clean_schema(path: str, columns: list[str] | None):
    """Parquet schema pruned to ``columns`` with key-value metadata
    stripped: pandas-written files carry ``b'pandas'`` schema metadata
    whose pyarrow hash fails, which disables Ray's block-schema
    deduplication and spams "Failed to hash the schemas" warnings."""
    import pyarrow.parquet as pq

    try:
        sch = pq.read_schema(path).remove_metadata()
    except (OSError, pa.ArrowInvalid):
        return None  # directory/glob inputs: let Ray resolve the schema
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def read_table(path: str, columns: list[str] | None = None, **kw):
    """Parquet source with column pruning (``ray.data.read_parquet``).
    ``path`` may be a file, a directory of shards, or a glob list.
    Row filters push down to the scan: pass
    ``filter=pyarrow.dataset.field("c") > x`` and row groups whose
    statistics exclude the predicate never leave storage — THE read
    lever at 100 TB alongside ``columns=``."""
    import ray.data as rd

    if "schema" not in kw and isinstance(path, str):
        sch = _clean_schema(path, columns)
        if sch is not None:
            kw["schema"] = sch
    return rd.read_parquet(path, columns=columns, **kw)


def read_json_table(path: str, columns: list[str] | None = None, **kw):
    """JSONL source; column pruning applied post-read (JSON has no
    row-group projection)."""
    import ray.data as rd

    ds = rd.read_json(path, **kw)
    return ds.select_columns(columns) if columns else ds


def read_csv_table(path: str, columns: list[str] | None = None, **kw):
    import ray.data as rd

    ds = rd.read_csv(path, **kw)
    return ds.select_columns(columns) if columns else ds


def write_validated(combined, out_dir: str, drop: tuple[str, ...] = ("violations",)):
    """Validated-rows sink: parquet shards under ``out_dir`` (one file
    per block — a failed run resumes by diffing written shards via
    ``peri_ray.state.checkpoint``)."""
    cols = [c for c in combined.schema().names if c not in drop]
    combined.select_columns(cols).write_parquet(out_dir)
    return out_dir


def write_violations(combined, out_dir: str):
    """Violations sink, hash-partitioned by ``rule_id`` so per-rule
    consumers read only their partition (SURVEY §2.6)."""
    from peri_ray.validate import violations_dataset

    viols = violations_dataset(combined)
    viols.write_parquet(out_dir, partition_cols=["rule_id"])
    return out_dir


def parse_json_column(ds, column: str, drop_source: bool = False,
                      batch_size: int | None = 8192,
                      value_type: "pa.DataType | None" = None,
                      infer_sample: int = 256):
    """Decode a JSON-encoded string column into a struct column named
    ``<column>_parsed`` (semi-structured ingestion: the reference
    validates dynamic maps; the engine's equivalent is
    JSON-string → struct → nested-schema kernels).

    The output type is FIXED across blocks: pass ``value_type``
    explicitly, or it is inferred ONCE on the driver from a sample —
    per-batch inference would let all-null or missing-key batches
    diverge into incompatible schemas that fail to unify downstream.

    Per-row ``json.loads`` is unavoidable for opaque JSON (no vectorized
    parser in this environment); it runs inside ``map_batches`` so the
    decode distributes across the cluster, and everything downstream is
    back on vectorized Arrow."""
    import json

    if value_type is None:
        sample = [r[column] for r in ds.limit(infer_sample).take_all()]
        parsed = [json.loads(v) for v in sample if v is not None]
        if not parsed:
            raise ValueError(
                f"cannot infer JSON value type for {column!r} (sample all "
                f"null); pass value_type= explicitly"
            )
        value_type = pa.array(parsed).type

    def _parse(t: pa.Table) -> pa.Table:
        raw = t.column(column).to_pylist()
        rows = [json.loads(v) if v is not None else None for v in raw]
        arr = pa.array(rows, type=value_type)
        out = t.append_column(f"{column}_parsed", arr)
        return out.drop_columns([column]) if drop_source else out

    import ray.data as rd  # noqa: F401

    return ds.map_batches(_parse, batch_format="pyarrow", batch_size=batch_size)


def write_jsonl(ds, out_dir: str):
    """JSONL sink (one .json lines file per block — same resumable
    sharding contract as the parquet sinks).  For interchange with
    text-pipeline tooling; parquet remains the scale format (columnar
    pruning, statistics, compression)."""
    ds.write_json(out_dir)
    return out_dir


def write_csv(ds, out_dir: str):
    """CSV sink, one shard per block.  Flat columns only — nested
    struct/list columns belong in parquet or JSONL.  CSV has no null
    literal: null strings round-trip as empty strings."""
    import pyarrow as pa_

    for name, typ in zip(ds.schema().names, ds.schema().types):
        if pa_.types.is_nested(typ):
            raise ValueError(
                f"write_csv: column {name!r} has nested type {typ}; "
                "use write_jsonl or parquet")
    ds.write_csv(out_dir)
    return out_dir


# ---------------------------------------------------------------------------
# typed ingestion: strict string → typed coercion (CSV/JSONL columns
# arrive as strings; unparseable cells become null, never errors)
# ---------------------------------------------------------------------------

_COERCE_RES = {
    # bounded digit counts keep every accepted literal exactly in
    # range, so Arrow's whole-array cast can never raise — the grammar
    # IS the contract (spelled out, unlike TRY_CAST's engine-specific
    # trimming), and the SQL twin applies the same regex before CAST
    "integer": r"^[+-]?[0-9]{1,18}$",
    "float": r"^[+-]?[0-9]{1,15}(\.[0-9]+)?$",
    "boolean": r"^(true|false)$",
}
_COERCE_TYPES = {"integer": "int64", "float": "float64", "boolean": "bool"}


def coerce_string_columns(ds, rules: dict[str, str],
                          batch_size: int | None = 65536):
    """Coerce string columns to typed columns under explicit lexical
    grammars (``integer`` / ``float`` / ``boolean``): cells that don't
    match the grammar become null.  Streaming per-batch map — regex
    match + masked vectorized cast, no Python loop, no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for kind in rules.values():
        if kind not in _COERCE_RES:
            raise ValueError(f"unsupported coercion target: {kind!r}")

    def _f(t: pa.Table) -> pa.Table:
        for col, kind in rules.items():
            s = t.column(col)
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            if pa.types.is_large_string(s.type):
                s = s.cast(pa.string())
            ok = pc.match_substring_regex(s, _COERCE_RES[kind])
            clean = pc.if_else(pc.fill_null(ok, False), s,
                               pa.nulls(len(s), pa.string()))
            if kind in ("integer", "float"):
                # Arrow's numeric parser rejects an explicit leading
                # '+' that both the grammar and SQL CAST accept
                clean = pc.replace_substring_regex(clean, r"^\+", "")
            out = pc.cast(clean, _COERCE_TYPES[kind])
            t = t.set_column(t.schema.get_field_index(col), col, out)
        return t

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def _epoch_numeric(arr):
    """Float64 view of a range-partition key: temporal types go through
    int64 first (Arrow's temporal→float64 cast raises; the int64 cast
    yields the epoch value in the column's native unit — µs for
    timestamp[us], days for date32)."""
    import pyarrow as pa

    t = arr.type
    if (pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_time(t) or pa.types.is_duration(t)):
        arr = arr.cast(pa.int64())
    return arr.cast(pa.float64())


def write_range_partitioned(ds, key: str, out_dir: str, n_ranges: int = 16,
                            kll_k: int = 800,
                            batch_size: int | None = 65536,
                            zone_cols: list[str] | None = None) -> dict:
    """Range-partitioned parquet sink: one directory per contiguous
    ``key`` range, ranges balanced to ±KLL-sketch error — the layout a
    100 TB output needs so downstream key-range scans (time slices, id
    shards) read ONE directory instead of every shard, and so a
    re-run can skip finished ranges.

    Pass 1 sketches the key (numeric/temporal) to pick ``n_ranges - 1``
    split points at the equi-depth quantiles; pass 2 assigns
    ``range_id = searchsorted(splits, key)`` per batch (vectorized) and
    writes via ``partition_cols`` — null keys land in range 0.  The
    split points persist in ``_ranges.json`` beside the data so
    :func:`read_key_range` can prune directories without listing file
    footers.  Temporal keys (timestamp/date/time/duration) are
    epoch-converted (int64 in the column's native unit, e.g. µs for
    ``timestamp[us]``, days for ``date32``) before sketching/assignment
    — splits and :func:`read_key_range` bounds are in those units.
    Returns the manifest dict."""
    import json
    import pickle

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from peri_ray.state.sketches import KLL

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
    if merged.n == 0:
        raise ValueError(f"write_range_partitioned: column {key!r} has no "
                         "non-null values to range-partition on")
    splits = sorted({float(merged.quantile(i / n_ranges))
                     for i in range(1, n_ranges)})

    sp = np.asarray(splits, np.float64)

    def _assign(t: pa.Table) -> pa.Table:
        v = (_epoch_numeric(t.column(key).combine_chunks())
             .fill_null(float("-inf")).to_numpy(zero_copy_only=False))
        rid = np.searchsorted(sp, v, side="right").astype(np.int64)
        return t.append_column("range_id", pa.array(rid))

    (ds.map_batches(_assign, batch_format="pyarrow", batch_size=batch_size)
       .write_parquet(out_dir, partition_cols=["range_id"]))
    manifest = {"key": key, "splits": splits, "n_ranges": len(splits) + 1}
    if zone_cols:
        # zone maps: per-range min/max of EXTRA columns so readers can
        # skip ranges on predicates over non-key columns too.  Computed
        # from the WRITTEN layout (a pruned columnar read of the
        # output) — no third pass over the input lineage.
        manifest["zones"] = _collect_zone_maps(
            out_dir, manifest["n_ranges"], list(zone_cols))
    # sibling path, NOT inside the layout: a stray non-parquet file in
    # the root breaks Ray's partition discovery on whole-dir reads
    with open(out_dir.rstrip("/") + ".ranges.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def _collect_zone_maps(out_dir: str, n_ranges: int,
                       zone_cols: list[str]) -> dict:
    """{col: [[min, max] | None per range]} from the written layout —
    one pruned read of (zone_cols) per range directory (parquet footer
    statistics make this metadata-cheap on real storage)."""
    import os

    import pyarrow.parquet as pq

    zones: dict = {c: [None] * n_ranges for c in zone_cols}
    for i in range(n_ranges):
        d = os.path.join(out_dir, f"range_id={i}")
        if not os.path.isdir(d):
            continue
        mins: dict = {c: None for c in zone_cols}
        maxs: dict = {c: None for c in zone_cols}
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(d, f), columns=zone_cols)
            for c in zone_cols:
                col = _epoch_numeric(t.column(c).combine_chunks()
                                     .drop_null())
                if len(col) == 0:
                    continue
                import pyarrow.compute as pc_

                mm = pc_.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                mins[c] = lo if mins[c] is None else min(mins[c], lo)
                maxs[c] = hi if maxs[c] is None else max(maxs[c], hi)
        for c in zone_cols:
            if mins[c] is not None:
                zones[c][i] = [mins[c], maxs[c]]
    return zones


def read_zone_pruned(out_dir: str, predicates: dict,
                     columns: list[str] | None = None, **kw):
    """Zone-map-pruned read of a :func:`write_range_partitioned`
    layout: ``predicates`` maps column → (lo, hi) (either side None =
    unbounded); a range directory is opened only if EVERY predicate's
    interval intersects that range's zone (key predicate uses the
    split points; zone columns use the persisted min/max; a range
    with no zone entry for a predicated column is conservatively
    kept).  Exact per-batch filters run after the read, so pruning is
    purely an I/O optimization — never a correctness dependence."""
    import json
    import os

    import pyarrow.compute as pc_
    import ray.data as rd_

    with open(out_dir.rstrip("/") + ".ranges.json") as f:
        manifest = json.load(f)
    splits = manifest["splits"]
    key = manifest["key"]
    n = manifest["n_ranges"]
    zones = manifest.get("zones", {})
    dirs = []
    for i in range(n):
        keep = True
        for col, (lo, hi) in predicates.items():
            if col == key:
                r_lo = None if i == 0 else splits[i - 1]
                r_hi = None if i == n - 1 else splits[i]
                if lo is not None and r_hi is not None and r_hi <= lo:
                    keep = False
                if hi is not None and r_lo is not None and r_lo > hi:
                    keep = False
            elif col in zones and zones[col][i] is not None:
                z_lo, z_hi = zones[col][i]
                if lo is not None and z_hi < lo:
                    keep = False
                if hi is not None and z_lo > hi:
                    keep = False
        if not keep:
            continue
        d = os.path.join(out_dir, f"range_id={i}")
        if os.path.isdir(d):
            dirs.append(d)
    if not dirs:
        import ray.data as rd2

        return rd2.from_items([])  # every range pruned: empty result
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    ds = rd_.read_parquet(files, columns=columns, **kw)

    def _exact(t):
        mask = None
        for col, (lo, hi) in predicates.items():
            c = _epoch_numeric(t.column(col).combine_chunks())
            for bound, op in ((lo, pc_.greater_equal), (hi, pc_.less_equal)):
                if bound is None:
                    continue
                m = op(c, bound)
                mask = m if mask is None else pc_.and_(mask, m)
        return t if mask is None else t.filter(pc_.fill_null(mask, False))

    return ds.map_batches(_exact, batch_format="pyarrow")


def read_key_range(out_dir: str, lo: float | None, hi: float | None,
                   columns: list[str] | None = None, **kw):
    """Pruned read of a :func:`write_range_partitioned` layout: only
    the directories whose range intersects ``[lo, hi]`` are opened
    (None = unbounded on that side), then an exact in-range filter runs
    per batch — directory pruning for I/O, the filter for exactness.
    Null keys (stored in range 0) never satisfy a bounded filter.
    For temporal keys, ``lo``/``hi`` are epoch values in the column's
    native unit (matching the persisted splits)."""
    import json
    import os

    import pyarrow.compute as pc_
    import ray.data as rd_

    with open(out_dir.rstrip("/") + ".ranges.json") as f:
        manifest = json.load(f)
    splits = manifest["splits"]
    key = manifest["key"]
    n = manifest["n_ranges"]
    # range i covers [splits[i-1], splits[i]) (searchsorted side="right"),
    # open-ended at 0 / n-1
    dirs = []
    for i in range(n):
        r_lo = None if i == 0 else splits[i - 1]
        r_hi = None if i == n - 1 else splits[i]
        if lo is not None and r_hi is not None and r_hi <= lo:
            continue
        if hi is not None and r_lo is not None and r_lo > hi:
            continue
        d = os.path.join(out_dir, f"range_id={i}")
        if os.path.isdir(d):
            dirs.append(d)
    if not dirs:
        raise ValueError(f"read_key_range: no ranges intersect [{lo}, {hi}]")
    # read_parquet accepts ONE directory or a list of FILES — a list of
    # directories is opened file-wise and fails; expand explicitly
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    ds = rd_.read_parquet(files, columns=columns, **kw)

    def _exact(t):
        c = _epoch_numeric(t.column(key).combine_chunks())
        mask = None
        if lo is not None:
            mask = pc_.greater_equal(c, lo)
        if hi is not None:
            m2 = pc_.less_equal(c, hi)
            mask = m2 if mask is None else pc_.and_(mask, m2)
        return t if mask is None else t.filter(pc_.fill_null(mask, False))

    return ds.map_batches(_exact, batch_format="pyarrow")


def read_orc_table(path: str | list[str], columns: list[str] | None = None):
    """ORC source: one read task per file (ORC stripes decode with
    pyarrow's C++ reader; ``columns`` prunes at the read like the
    parquet path).  Directories expand to their .orc files."""
    import os

    import pyarrow as pa_
    import ray.data as rd

    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".orc")))
        else:
            files.append(p)

    def _read(t: pa_.Table) -> pa_.Table:
        from pyarrow import orc

        tabs = [orc.ORCFile(f).read(columns=columns)
                for f in t.column("path").to_pylist()]
        return pa_.concat_tables(tabs) if tabs else pa_.table({})

    return (rd.from_items([{"path": f} for f in files])
            .map_batches(_read, batch_format="pyarrow", batch_size=1))


def write_orc(ds, out_dir: str):
    """ORC sink, one shard per block (same resumable contract as the
    other sinks)."""
    import os
    import uuid

    import pyarrow as pa_

    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa_.Table) -> pa_.Table:
        from pyarrow import orc

        if t.num_rows:
            orc.write_table(t, os.path.join(
                out_dir, f"part-{uuid.uuid4().hex}.orc"))
        return pa_.table({"rows": pa_.array([t.num_rows], pa_.int64())})

    ds.map_batches(_write, batch_format="pyarrow").materialize()
    return out_dir


def read_ipc_table(path: str | list[str], columns: list[str] | None = None):
    """Arrow IPC / Feather-v2 source (zero-parse interchange with any
    Arrow-native tool): one read task per file, column-pruned."""
    import os

    import pyarrow as pa_
    import ray.data as rd

    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith((".arrow", ".feather", ".ipc"))))
        else:
            files.append(p)

    def _read(t: pa_.Table) -> pa_.Table:
        from pyarrow import feather

        tabs = [feather.read_table(f, columns=columns)
                for f in t.column("path").to_pylist()]
        return pa_.concat_tables(tabs) if tabs else pa_.table({})

    return (rd.from_items([{"path": f} for f in files])
            .map_batches(_read, batch_format="pyarrow", batch_size=1))


def write_ipc(ds, out_dir: str):
    """Arrow IPC (Feather v2) sink, one shard per block."""
    import os
    import uuid

    import pyarrow as pa_

    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa_.Table) -> pa_.Table:
        from pyarrow import feather

        if t.num_rows:
            feather.write_feather(t, os.path.join(
                out_dir, f"part-{uuid.uuid4().hex}.arrow"))
        return pa_.table({"rows": pa_.array([t.num_rows], pa_.int64())})

    ds.map_batches(_write, batch_format="pyarrow").materialize()
    return out_dir


def compact_parquet(in_dir: str, out_dir: str,
                    target_rows_per_file: int = 1_000_000,
                    columns: list[str] | None = None) -> dict:
    """Small-files compaction (the after-crawl hygiene op every layout
    needs): read a parquet directory and rewrite it as
    ``ceil(rows / target)`` right-sized shards.  Content-preserving —
    no sort, no dedup — and streaming (the repartition is Ray's
    all-to-all over blocks, payload crosses once).  Returns
    {rows, files_in, files_out}."""
    import math
    import os

    import ray.data as rd

    files_in = sum(1 for f in os.listdir(in_dir) if f.endswith(".parquet"))
    ds = read_table(in_dir, columns=columns)
    n = ds.count()
    shards = max(1, math.ceil(n / target_rows_per_file))
    ds = read_table(in_dir, columns=columns).repartition(shards)
    ds.write_parquet(out_dir)
    files_out = sum(1 for f in os.listdir(out_dir)
                    if f.endswith(".parquet"))
    return {"rows": n, "files_in": files_in, "files_out": files_out}


def write_zorder_partitioned(ds, keys: list[str], out_dir: str,
                             n_ranges: int = 16, bits: int = 8,
                             kll_k: int = 800,
                             batch_size: int | None = 65536) -> dict:
    """Z-order (Morton) clustered parquet sink: rows are laid out along
    an interleaved-bit curve over ``keys`` (2+ numeric/temporal
    columns), so the per-range zone maps become tight rectangles in
    EVERY key dimension and :func:`read_zone_pruned` box predicates
    skip most of the layout — the multi-column answer to
    :func:`write_range_partitioned`'s single-key clustering (a
    time-range scan AND an id-slice scan both prune on one layout).

    Pass 1 sketches each key with a KLL and bucketizes it to
    ``2**bits`` equi-depth levels (per-dimension uniformization — raw
    value interleaving would let one wide-range key dominate the
    curve); the z-value is the vectorized bit-interleave of the level
    codes (``len(keys) * bits`` bits, must fit int64).  The write
    itself composes: the z column feeds :func:`write_range_partitioned`
    (KLL-balanced z ranges + zone maps over the original keys), so
    manifests, resumable layout and pruned reads are shared machinery.
    Three input scans total (key sketch, z sketch, write) — at corpus
    scale substitute a sampled sketch pass if two sketch scans matter.

    Returns the manifest dict (adds ``zorder: {keys, bits}``)."""
    import json
    import pickle

    import numpy as np
    import pyarrow as pa

    from peri_ray.state.sketches import KLL

    if len(keys) < 2:
        raise ValueError("write_zorder_partitioned needs >= 2 keys "
                         "(use write_range_partitioned for one)")
    if len(keys) * bits > 62:
        raise ValueError(f"z-value would need {len(keys) * bits} bits; "
                         "reduce bits or keys (int64 limit)")

    def _sketch(t: pa.Table) -> pa.Table:
        out = {}
        for k in keys:
            v = (_epoch_numeric(t.column(k).combine_chunks().drop_null())
                 .to_numpy(zero_copy_only=False))
            s = KLL(kll_k)
            s.update_many(v)
            out[k] = pa.array([pickle.dumps(s)], pa.binary())
        return pa.table(out)

    merged = {k: KLL(kll_k) for k in keys}
    for r in ds.map_batches(_sketch, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        for k in keys:
            merged[k].merge(pickle.loads(r[k]))
    levels = 1 << bits
    splits = {}
    for k in keys:
        if merged[k].n == 0:
            raise ValueError(f"write_zorder_partitioned: column {k!r} "
                             "has no non-null values")
        splits[k] = np.asarray(sorted({
            float(merged[k].quantile(i / levels))
            for i in range(1, levels)}), np.float64)

    def _add_z(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        for ki, k in enumerate(keys):
            v = (_epoch_numeric(t.column(k).combine_chunks())
                 .fill_null(float("-inf")).to_numpy(zero_copy_only=False))
            lv = np.searchsorted(splits[k], v, side="right").astype(
                np.int64)
            for b in range(bits):
                z |= ((lv >> b) & 1) << (b * len(keys) + ki)
        return t.append_column("__z", pa.array(z))

    manifest = write_range_partitioned(
        ds.map_batches(_add_z, batch_format="pyarrow",
                       batch_size=batch_size),
        "__z", out_dir, n_ranges=n_ranges, kll_k=kll_k,
        batch_size=batch_size, zone_cols=list(keys))
    manifest["zorder"] = {"keys": list(keys), "bits": bits}
    with open(out_dir.rstrip("/") + ".ranges.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def write_bucketed(ds, out_dir: str, key_col: str, n_buckets: int = 32):
    """Hash-bucketed co-located parquet sink: rows land in
    ``bucket=K/`` partitions by ``bucket_of(key) % n_buckets`` — the
    write-once-join-many layout.  Two tables bucketed here with the
    SAME key hash and bucket count join later with ZERO exchange
    (:func:`peri_ray.stages.joins.bucketed_disk_join` reads matching
    bucket pairs task-wise), which is the "pick ONE partitioning key
    and reuse it across stages" rule made durable on disk.  A sibling
    ``<dir>.bucketed.json`` manifest pins (key, n_buckets, hash
    scheme) so a mismatched join fails loudly instead of silently
    co-locating nothing.  The write itself streams (no shuffle: the
    bucket column is a map-side stamp; parquet partitioning splits
    files per block per bucket)."""
    import json
    import os

    from peri_ray.stages.checks import bucket_of

    def _stamp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", bucket_of(t.column(key_col), n_buckets))

    ds.map_batches(_stamp, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    with open(out_dir + ".bucketed.json", "w") as f:
        json.dump({"key_col": key_col, "n_buckets": int(n_buckets),
                   "hash": "bucket_of-v1"}, f)
    return out_dir


def plan_compaction(sizes: dict[str, int],
                    target_bytes: int) -> list[list[str]]:
    """Deterministic first-fit-decreasing file binning for
    :func:`compact_parquet_binned`: files sorted (size desc, name asc)
    drop into the first bin with room; a file already >= target gets a
    bin of its own that nothing else joins.  Pure metadata — no file
    is opened.  Returns name-sorted bins (the order files are
    concatenated in, so reruns are byte-stable)."""
    bins: list[list[str]] = []
    totals: list[int] = []
    for name, sz in sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0])):
        for i, tot in enumerate(totals):
            if tot + sz <= target_bytes:
                bins[i].append(name)
                totals[i] += sz
                break
        else:
            bins.append([name])
            totals.append(sz)
    return [sorted(b) for b in bins]


def compact_parquet_binned(in_dir: str, out_dir: str,
                           target_bytes: int = 512 << 20,
                           batch_rows: int = 65536) -> dict:
    """ZERO-SHUFFLE small-file compaction: bin whole files to a byte
    target from directory metadata alone (:func:`plan_compaction`),
    then one Ray task per bin streams its files row-group-wise into
    ONE output shard — every byte is read once and written once, with
    no repartition exchange (contrast :func:`compact_parquet`, whose
    all-to-all moves the payload through the object store; at 100 TB
    the binned form is the only affordable one, and bins are the unit
    of parallelism across the cluster).

    Resumable: a SIBLING manifest (``<out_dir>.compaction.json`` —
    never inside the directory, a non-parquet file in the root breaks
    partition discovery) records each bin's sources; a rerun skips
    bins whose output shard already exists under the same plan, and
    shards appear atomically (tmp + rename).  Startup hygiene keeps
    ``out_dir`` whole-dir readable: stray ``*.tmp`` from a crashed
    task are removed (the partition-discovery pitfall) and shards
    beyond the current plan's bin count are deleted, so a re-plan
    with a larger target can never leave orphaned shards that
    duplicate rows on a directory read.  Pandas schema metadata is
    stripped on the way through (the unhashable-metadata pitfall).

    Returns {files_in, files_out, rows, skipped}."""
    import json
    import os

    import ray

    sizes = {f: os.path.getsize(os.path.join(in_dir, f))
             for f in sorted(os.listdir(in_dir)) if f.endswith(".parquet")}
    bins = plan_compaction(sizes, target_bytes)
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        path = os.path.join(out_dir, f)
        if f.endswith(".tmp"):
            os.remove(path)                 # crashed-task leftover
        elif f.startswith("part-") and f.endswith(".parquet"):
            try:
                idx = int(f[len("part-"):-len(".parquet")])
            except ValueError:
                continue
            if idx >= len(bins):            # orphan from an old plan
                os.remove(path)
    manifest_path = out_dir.rstrip(os.sep) + ".compaction.json"
    prior = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            prior = json.load(fh).get("bins", {})

    @ray.remote
    def _compact_bin(i: int, names: list[str]) -> int:
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        out = os.path.join(out_dir, f"part-{i:05d}.parquet")
        tmp = out + ".tmp"
        writer = None
        rows = 0
        for name in names:
            pf = _pq.ParquetFile(os.path.join(in_dir, name))
            schema = pf.schema_arrow.remove_metadata()
            if writer is None:
                writer = _pq.ParquetWriter(tmp, schema)
            for rb in pf.iter_batches(batch_size=batch_rows):
                t = _pa.Table.from_batches([rb]).replace_schema_metadata(None)
                writer.write_table(t.cast(schema))
                rows += t.num_rows
        if writer is not None:
            writer.close()
            os.replace(tmp, out)
        return rows

    skipped = 0
    pending: list[tuple[int, Any]] = []
    out_bins: dict[str, Any] = {}
    for i, names in enumerate(bins):
        out = os.path.join(out_dir, f"part-{i:05d}.parquet")
        key = str(i)
        if (prior.get(key, {}).get("sources") == names
                and os.path.exists(out)):
            skipped += 1
            out_bins[key] = prior[key]
            continue
        pending.append((i, _compact_bin.remote(i, names)))
    for i, ref in pending:
        out_bins[str(i)] = {"sources": bins[i], "rows": int(ray.get(ref))}
    with open(manifest_path + ".tmp", "w") as fh:
        json.dump({"target_bytes": target_bytes, "bins": out_bins}, fh)
    os.replace(manifest_path + ".tmp", manifest_path)
    return {"files_in": len(sizes), "files_out": len(bins),
            "rows": int(sum(b["rows"] for b in out_bins.values())),
            "skipped": skipped}


def read_table_evolved(paths: list[str],
                       target_schema: pa.Schema | None = None,
                       columns: list[str] | None = None):
    """Union-by-name read across parquet files whose schemas EVOLVED
    between crawl snapshots: missing columns null-fill, new columns
    appear, and compatible dtypes promote (int32 -> int64,
    float32 -> double) — the reader a multi-year 100 TB crawl needs,
    since Ray's plain ``read_parquet`` refuses mixed footers.

    The target schema comes from the file FOOTERS only
    (``pa.unify_schemas(..., promote_options='permissive')`` — a
    metadata pass, no data read), or pass one explicitly to pin the
    contract.  Each file reads pruned to the requested columns it
    actually has, then one vectorized conform pass pads + casts per
    batch; files stream independently and union lazily (no barrier).
    A file with NONE of the requested columns is never opened — its
    all-null part is synthesized from the footer's row count.

    Incompatible same-name dtypes (string vs int) raise at plan time —
    loudly, not as a mid-read task failure."""
    import pyarrow.parquet as pq

    # ONE footer fetch per file — reused for schema inference, per-file
    # column pruning, AND the row count needed when a file has none of
    # the requested columns (metadata round-trips dominate on real
    # remote storage)
    metas = [pq.read_metadata(p) for p in paths]
    footers = [m.schema.to_arrow_schema().remove_metadata()
               for m in metas]
    if target_schema is None:
        target_schema = pa.unify_schemas(footers,
                                         promote_options="permissive")
    if columns is not None:
        target_schema = pa.schema(
            [target_schema.field(c) for c in columns])
    names = target_schema.names

    def _conform(t: pa.Table) -> pa.Table:
        cols = []
        for f in target_schema:
            if f.name in t.column_names:
                cols.append(t.column(f.name).combine_chunks()
                            .cast(f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(dict(zip(names, cols)))

    import ray

    def _all_null(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({f.name: pa.nulls(n, f.type)
                         for f in target_schema})

    parts = []
    for p, footer, meta in zip(paths, footers, metas):
        have = [c for c in names if c in set(footer.names)]
        if not have:
            # the file holds none of the requested columns: never fall
            # back to columns=None (that would read EVERY column —
            # html-sized payloads — just to null-fill); synthesize the
            # all-null part from the footer's row count (ADVICE r3)
            parts.append(ray.data.range(meta.num_rows).map_batches(
                _all_null, batch_format="pyarrow"))
            continue
        parts.append(
            read_table(p, columns=have).map_batches(
                _conform, batch_format="pyarrow"))
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
