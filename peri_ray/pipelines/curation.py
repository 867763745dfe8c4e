"""End-to-end corpus-curation pipeline: the training-data counterpart
of the flagship validation verdict.  One streaming annotate pass
attributes every document to its FIRST failing gate — schema-invalid,
missing language, too short — then exact dedup keeps the min-id doc
per distinct text among the survivors.  Returns the curated Dataset
plus a stage-attribution report whose counts are exactly
SQL-expressible (driver oracle: peri_ray queries `curation_report`).

Scale shape: the annotate pass is the same fused map_batches the
flagship uses (kernels run once); gate counts are per-batch partial
sums merged on the driver (rows never leave the cluster); dedup is the
bucketed (content_hash, id) exchange; victims leave via a
hash-partitioned anti join on doc_id (victim cardinality is unbounded
— never a broadcast set)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.validate import validate_dataset


def run_curation(ds, spec: dict, *, id_col: str = "doc_id",
                 text_col: str = "text", lang_col: str = "lang",
                 len_col: str = "n_chars", min_chars: int = 100,
                 batch_size: int | None = 65536):
    """Returns ``(curated_ds, report)``.

    Gate order (first failure wins): schema-invalid -> missing lang ->
    too short (null or < min_chars) -> exact duplicate (non-min id per
    text).  ``report`` carries one count per gate plus input/curated
    totals; counts are mutually exclusive and sum to input_rows."""
    combined = validate_dataset(ds, spec, id_column=id_col,
                                batch_size=batch_size)

    def _annotate(t: pa.Table) -> pa.Table:
        valid = t.column("valid").combine_chunks()
        lang_ok = pc.is_valid(t.column(lang_col).combine_chunks())
        n = t.column(len_col).combine_chunks()
        # and_kleene: plain and_ would propagate the null comparison of
        # a null length and silently drop the row from EVERY gate
        long_enough = pc.and_kleene(
            pc.is_valid(n),
            pc.greater_equal(n, pa.scalar(min_chars).cast(n.type)))
        eligible = pc.and_(valid, pc.and_(lang_ok, long_enough))
        return pa.table({
            id_col: t.column(id_col),
            text_col: t.column(text_col),
            lang_col: t.column(lang_col),
            "__invalid": pc.invert(valid),
            "__no_lang": pc.and_(valid, pc.invert(lang_ok)),
            "__short": pc.and_(pc.and_(valid, lang_ok),
                               pc.invert(long_enough)),
            "__eligible": eligible,
        })

    annotated = combined.map_batches(_annotate, batch_format="pyarrow",
                                     batch_size=batch_size)
    # two consumers (counts + eligible subset): pin the annotate pass
    annotated = annotated.materialize()

    def _counts(t: pa.Table) -> pa.Table:
        return pa.table({c: pa.array(
            [int(pc.sum(t.column(c).cast(pa.int64())).as_py() or 0)],
            pa.int64())
            for c in ("__invalid", "__no_lang", "__short", "__eligible")})

    sums = {c: 0 for c in ("__invalid", "__no_lang", "__short",
                           "__eligible")}
    for r in annotated.map_batches(_counts, batch_format="pyarrow",
                                   batch_size=batch_size).take_all():
        for c in sums:
            sums[c] += r[c]

    eligible = annotated.map_batches(
        lambda t: t.filter(t.column("__eligible").combine_chunks())
                   .select([id_col, text_col, lang_col]),
        batch_format="pyarrow", batch_size=batch_size)

    from peri_ray.stages.dedup import exact_duplicate_ids
    from peri_ray.stages.joins import hash_join

    victims = exact_duplicate_ids(eligible, text_col=text_col,
                                  id_col=id_col).materialize()
    n_dups = victims.count()
    curated = hash_join(eligible, victims, id_col, id_col,
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
