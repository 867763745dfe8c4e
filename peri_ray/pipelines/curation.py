"""End-to-end corpus-curation pipeline: the training-data counterpart
of the flagship validation verdict.  One streaming annotate pass
attributes every document to its FIRST failing gate — schema-invalid,
missing language, too short — then exact dedup keeps the min-id doc
per distinct text among the survivors.  Returns the curated Dataset
plus a stage-attribution report whose counts are exactly
SQL-expressible (driver oracle: peri_ray queries `curation_report`).

Scale shape (round-3 rework: the former full-corpus ``materialize()``
between annotate and its consumers is gone): gate counts are per-batch
1-row partials merged on the driver — the flagship pattern
(``flagship.py`` `_ValidateAndPartials`) — so the counting lineage
streams end to end and only 4 ints per batch leave the cluster.  Each
downstream consumer re-derives the eligible subset from the (cheap,
deterministic) annotate map instead of pinning the annotated corpus in
the object store: at 10^12 rows the old materialize was a whole-corpus
object-store spill between stages, while re-running the fused kernels
is a per-pass map cost with zero residency.  Dedup is the bucketed
(content_hash, id) exchange; victims leave via a hash-partitioned anti
join on doc_id (victim cardinality is unbounded — never a broadcast
set).

For production runs, :func:`partitioned_curation` is the resumable
form: per-fragment annotate+eligible parquet with lineage manifests
(phase 1), then a global victims exchange over the pruned
(content_hash, doc_id) re-read and per-fragment anti-joined curated
output (phase 2), each fragment atomic + skippable on rerun.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.validate import validate_dataset

_GATES = ("__invalid", "__no_lang", "__short", "__eligible")


def _gate_counts(t: pa.Table) -> pa.Table:
    """One 4-int row of per-batch gate-count partials (shared by the
    streaming and partitioned forms — edits stay in lockstep)."""
    return pa.table({c: pa.array(
        [int(pc.sum(t.column(c).cast(pa.int64())).as_py() or 0)],
        pa.int64()) for c in _GATES})


def _annotate_fn(id_col: str, text_col: str, lang_col: str,
                 len_col: str | None, min_chars: int,
                 with_hash: bool = False):
    """Fused gate-flag kernel over the validated stream.  With
    ``with_hash`` the content hash is computed in the same pass (the
    partitioned form persists it so the global dedup exchange later
    reads two int columns, never the text).  ``len_col=None`` derives
    the length gate from ``utf8_length(text)`` in the same pass —
    inputs without a precomputed length column (e.g. web_pages) need
    no extra column on disk."""

    def _annotate(t: pa.Table) -> pa.Table:
        valid = t.column("valid").combine_chunks()
        lang_ok = pc.is_valid(t.column(lang_col).combine_chunks())
        if len_col is None:
            n = pc.utf8_length(t.column(text_col).combine_chunks())
        else:
            n = t.column(len_col).combine_chunks()
        # and_kleene: plain and_ would propagate the null comparison of
        # a null length and silently drop the row from EVERY gate
        long_enough = pc.and_kleene(
            pc.is_valid(n),
            pc.greater_equal(n, pa.scalar(min_chars).cast(n.type)))
        eligible = pc.and_(valid, pc.and_(lang_ok, long_enough))
        cols = {
            id_col: t.column(id_col),
            text_col: t.column(text_col),
            lang_col: t.column(lang_col),
            "__invalid": pc.invert(valid),
            "__no_lang": pc.and_(valid, pc.invert(lang_ok)),
            "__short": pc.and_(pc.and_(valid, lang_ok),
                               pc.invert(long_enough)),
            "__eligible": eligible,
        }
        if with_hash:
            from peri_ray.stages.dedup import hash_strings

            h = hash_strings(t.column(text_col).combine_chunks(), seed=1)
            cols["content_hash"] = pa.array(h.astype(np.int64))
        return pa.table(cols)

    return _annotate


def run_curation(ds, spec: dict, *, id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang",
                 len_col: str | None = "n_chars", min_chars: int = 100,
                 batch_size: int | None = 65536):
    """Returns ``(curated_ds, report)``.

    Gate order (first failure wins): schema-invalid -> missing lang ->
    too short (null or < min_chars) -> exact duplicate (non-min id per
    text).  ``report`` carries one count per gate plus input/curated
    totals; counts are mutually exclusive and sum to input_rows.

    No stage materializes the corpus: the count pass ships 4 int64
    partials per batch, the dedup exchange ships (content_hash, id)
    pairs, and the final anti join is the only stage the full-width
    eligible rows cross.  Consumers re-derive the annotate map from the
    lazy lineage (pure kernels; recomputation over a pruned input is
    the streaming-executor trade against a 10^12-row object-store
    pin)."""
    annotate = _annotate_fn(id_col, text_col, lang_col, len_col, min_chars)

    def annotated():
        # fresh lazy lineage per consumer — validate + annotate are
        # pure, so each execution streams with zero residency
        return validate_dataset(ds, spec, id_column=id_col,
                                batch_size=batch_size).map_batches(
            annotate, batch_format="pyarrow", batch_size=batch_size)

    # --- gate counts: per-batch partials + driver merge (flagship
    # pattern) — one 4-int row per batch is all that leaves the cluster
    sums = {c: 0 for c in _GATES}
    for r in annotated().map_batches(_gate_counts, batch_format="pyarrow",
                                     batch_size=batch_size).take_all():
        for c in sums:
            sums[c] += r[c]

    def eligible():
        return annotated().map_batches(
            lambda t: t.filter(t.column("__eligible").combine_chunks())
                       .select([id_col, text_col, lang_col]),
            batch_format="pyarrow", batch_size=batch_size)

    from peri_ray.stages.dedup import exact_duplicate_ids
    from peri_ray.stages.joins import hash_join

    # victims is the SMALL side (duplicate ids only — 8-byte ids, never
    # text) and feeds two consumers (the dup count and the anti-join
    # build side): pinning it is the documented small-Dataset rule, not
    # a corpus materialization
    victims = exact_duplicate_ids(eligible(), text_col=text_col,
                                  id_col=id_col).materialize()
    n_dups = victims.count()
    curated = hash_join(eligible(), victims, id_col, id_col,
                        [text_col, lang_col], [], how="anti")
    report = {
        "input_rows": int(sum(sums.values())),
        "invalid": int(sums["__invalid"]),
        "no_lang": int(sums["__no_lang"]),
        "too_short": int(sums["__short"]),
        "exact_dups": int(n_dups),
        "curated_rows": int(sums["__eligible"]) - int(n_dups),
    }
    return curated, report


# ---------------------------------------------------------------------------
# resumable partitioned form [NORTH: per-partition lineage + metrics]
# ---------------------------------------------------------------------------


def partitioned_curation(
    input_files: list[str],
    checkpoint_dir: str,
    spec: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    len_col: str | None = "n_chars",
    min_chars: int = 100,
    batch_size: int | None = 65536,
    max_concurrent: int = 1,
    read_columns: list[str] | None = None,
) -> dict[str, Any]:
    """Checkpoint/resume curation over one fragment per input file.

    Phase 1 (per fragment, atomic + skippable): read -> validate ->
    annotate (+content_hash in the same fused pass) -> write the
    annotated rows ONCE as parquet; the gate counts come from a pruned
    re-read of the four bool flag columns (a metadata-cheap scan, not a
    second validation pass — the flagship checkpoint recipe) and land
    in the fragment manifest (lineage + metrics).  A rerun skips
    fragments whose manifest matches the plan hash.

    Phase 2 (global dedup, per fragment, atomic + skippable): one
    victims exchange over the pruned (content_hash, id) re-read of ALL
    phase-1 outputs — two int64 columns per row; the text never crosses
    the exchange — then each fragment's curated output is its eligible
    parquet anti-joined against the pinned victims ids.  Phase-2
    manifests key on the phase-1 corpus identity (sorted fragment ids +
    plan hash), so a resume after a mid-phase-2 kill re-runs only the
    unfinished fragments against an identical victims set (the exchange
    is deterministic).

    Returns the merged curation report plus per-phase manifest lists."""
    import ray.data as rd

    from peri_ray.sources import read_table
    from peri_ray.state.checkpoint import CheckpointDir, plan_hash
    from peri_ray.stages.joins import hash_join

    ckpt = CheckpointDir(checkpoint_dir)
    phash = plan_hash({"spec": spec, "min_chars": min_chars,
                       "cols": [id_col, text_col, lang_col, len_col]})
    annotate = _annotate_fn(id_col, text_col, lang_col, len_col,
                            min_chars, with_hash=True)

    def _frag(path: str, phase: str) -> str:
        return f"{phase}:" + os.path.normpath(path).lstrip(os.sep)

    # --- phase 1: annotate + eligible parquet per fragment ---------------
    def _phase1(path: str) -> None:
        frag = _frag(path, "annot")
        if ckpt.completed(frag, phash):
            return
        ds = read_table(path, columns=read_columns)
        ann = validate_dataset(ds, spec, id_column=id_col,
                               batch_size=batch_size).map_batches(
            annotate, batch_format="pyarrow", batch_size=batch_size)

        def _write(tmp, _ann=ann):
            _ann.write_parquet(os.path.join(tmp, "annotated"))

        out_dir = ckpt.write_fragment(frag, _write)

        sums = {c: 0 for c in _GATES}
        adir = os.path.join(out_dir, "annotated")
        if os.path.isdir(adir):
            flags = rd.read_parquet(adir, columns=list(_GATES))
            for r in flags.map_batches(_gate_counts, batch_format="pyarrow",
                                       batch_size=batch_size).take_all():
                for c in sums:
                    sums[c] += r[c]
        ckpt.write_manifest(frag, phash, {
            "input": path,
            "gate_counts": {k.strip("_"): int(v) for k, v in sums.items()},
            "rows": int(sum(sums.values())),
            "outputs": {"dir": out_dir},
        })

    if max_concurrent <= 1:
        for p in input_files:
            _phase1(p)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_concurrent) as ex:
            for f in [ex.submit(_phase1, p) for p in input_files]:
                f.result()

    p1_frags = sorted(_frag(p, "annot") for p in input_files)
    p1 = [m for m in ckpt.read_manifests() if m["fragment"] in p1_frags]
    # phase-2 identity: the plan AND the exact phase-1 corpus — adding
    # or re-annotating a fragment invalidates every curated output
    p2_hash = plan_hash({"plan": phash, "corpus": p1_frags})

    ann_dirs = [os.path.join(ckpt.fragment_dir(f), "annotated")
                for f in p1_frags]
    ann_dirs = [d for d in ann_dirs if os.path.isdir(d)]

    def _elig_filter(cols):
        def _f(t: pa.Table) -> pa.Table:
            return (t.filter(t.column("__eligible").combine_chunks())
                     .select(cols))
        return _f

    # --- phase 2: one global victims exchange, then per-fragment anti ----
    todo = [p for p in input_files
            if not ckpt.completed(_frag(p, "curated"), p2_hash)]
    victims = None
    if todo and ann_dirs:
        # pruned scan (hash, id, flag); the exchange ships (hash, id)
        # only — the text never leaves the phase-1 parquet.  The hash
        # was computed once in phase 1, so the victim/keeper kernel
        # runs directly on the persisted pairs.
        # read_parquet takes ONE dir or a list of FILES — expand dirs
        ann_files = [os.path.join(d, f) for d in ann_dirs
                     for f in sorted(os.listdir(d))
                     if f.endswith(".parquet")]
        pairs = rd.read_parquet(
            ann_files, columns=["content_hash", id_col, "__eligible"],
        ).map_batches(_elig_filter(["content_hash", id_col]),
                      batch_format="pyarrow", batch_size=65536)
        victims = _victims_from_pairs(pairs, id_col).materialize()

    def _phase2(path: str) -> None:
        frag = _frag(path, "curated")
        if ckpt.completed(frag, p2_hash):
            return
        src = os.path.join(ckpt.fragment_dir(_frag(path, "annot")),
                           "annotated")
        if not os.path.isdir(src):
            out_dir = ckpt.write_fragment(frag, lambda tmp: None)
            ckpt.write_manifest(frag, p2_hash, {
                "input": path, "curated_rows": 0,
                "outputs": {"dir": out_dir}})
            return
        elig = rd.read_parquet(
            src, columns=[id_col, text_col, lang_col, "__eligible"],
        ).map_batches(_elig_filter([id_col, text_col, lang_col]),
                      batch_format="pyarrow", batch_size=65536)
        cur = hash_join(elig, victims, id_col, id_col,
                        [text_col, lang_col], [], how="anti")

        def _write(tmp, _cur=cur):
            _cur.write_parquet(os.path.join(tmp, "curated"))

        out_dir = ckpt.write_fragment(frag, _write)
        cdir = os.path.join(out_dir, "curated")
        n = rd.read_parquet(cdir, columns=[id_col]).count() \
            if os.path.isdir(cdir) else 0
        ckpt.write_manifest(frag, p2_hash, {
            "input": path, "curated_rows": int(n),
            "outputs": {"dir": out_dir}})

    for p in todo:
        _phase2(p)

    p2_frags = {_frag(p, "curated") for p in input_files}
    manifests = ckpt.read_manifests()
    p2 = [m for m in manifests if m["fragment"] in p2_frags
          and m["plan_hash"] == p2_hash]
    sums = {c.strip("_"): 0 for c in _GATES}
    for m in p1:
        for k, v in m["gate_counts"].items():
            sums[k] += int(v)
    curated_rows = sum(int(m["curated_rows"]) for m in p2)
    report = {
        "input_rows": int(sum(sums.values())),
        "invalid": int(sums["invalid"]),
        "no_lang": int(sums["no_lang"]),
        "too_short": int(sums["short"]),
        "exact_dups": int(sums["eligible"]) - curated_rows,
        "curated_rows": curated_rows,
    }
    return {"report": report, "phase1": p1, "phase2": p2,
            "output_dirs": [m["outputs"]["dir"] for m in p2]}


def _victims_from_pairs(pairs, id_col: str, n_buckets: int = 64):
    """Victim ids from pre-hashed (content_hash, id) rows — the phase-2
    twin of ``dedup.exact_duplicate_ids`` minus the hashing map (the
    hash was persisted by phase 1; this path re-reads two int columns
    and never touches text)."""
    from peri_ray.stages.checks import _AddBucket

    # bundle the exchange map side (tiny-block floor; CLAUDE.md rule —
    # reduce here is one vectorized group_by per bucket, so coarse)
    bucketed = pairs.map_batches(_AddBucket("content_hash", n_buckets),
                                 batch_format="pyarrow", batch_size=65536)

    def _victims(group: pa.Table) -> pa.Table:
        g = group.select(["content_hash", id_col])
        mins = (g.group_by("content_hash")
                 .aggregate([(id_col, "min")])
                 .rename_columns(["content_hash", "__keep"]))
        joined = g.join(mins, keys="content_hash", join_type="inner")
        keep = pc.not_equal(joined.column(id_col), joined.column("__keep"))
        return joined.filter(keep).select([id_col])

    return bucketed.groupby("bucket").map_groups(_victims,
                                                 batch_format="pyarrow")
