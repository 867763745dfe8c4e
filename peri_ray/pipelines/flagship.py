"""Flagship pipeline (SURVEY §3.5): web-pages validation end-to-end.

    read_parquet → map_batches(validate) → [write combined parquet]
      → stats partials → shuffled checks (uniqueness / referential /
        drift) → per-partition verdict manifest

One kernel pass: the validate stage runs once, its combined output
(columns + valid + record_id + violations) feeds every downstream
consumer.  Checks that need a shuffle (uniqueness, histogram) pre-
aggregate inside map_batches first; the referential dim is broadcast.
The ``html`` column is projected away before any wide stage — large
binary never crosses a shuffle (SURVEY §7.6.6).
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.generate import LANG_REFERENCE_HIST, WEB_PAGES_SPEC
from peri_ray.stages.checks import drift_check, referential_check, uniqueness_check
from peri_ray.stages.stats import column_stats
from peri_ray.state.checkpoint import CheckpointDir, plan_hash
from peri_ray.validate import validate_dataset, violations_dataset


def run_flagship(
    ds,
    spec: dict | None = None,
    id_column: str = "url",
    lang_reference: dict[str, float] | None = None,
    checkpoint_dir: str | None = None,
    write_outputs: bool = False,
    drift_threshold: float = 0.25,
) -> dict[str, Any]:
    """Full validation + table checks over a web_pages-shaped Dataset.

    Returns a verdict dict: per-rule outcomes, violation counts by rule,
    column stats, and overall pass/fail.  With ``write_outputs`` the
    combined validated table and the violations table land under
    ``checkpoint_dir`` as partitioned parquet.
    """
    spec = spec or WEB_PAGES_SPEC
    lang_reference = lang_reference or LANG_REFERENCE_HIST

    combined = validate_dataset(ds, spec, id_column=id_column)

    # The kernels must run ONCE even though several consumers follow
    # (violations summary, validity counts, uniqueness, referential,
    # drift, stats).  Two scale-sane shapes:
    #  - checkpointing: write the combined table to parquet once, then
    #    every consumer re-reads with column pruning (resumable, streams);
    #  - in-memory: drop the heavy ``html`` column and pin the light
    #    projection in the object store (``materialize`` on the pruned
    #    view, never on the raw input).
    if write_outputs and checkpoint_dir:
        ckpt = CheckpointDir(checkpoint_dir)
        phash = plan_hash(spec)
        ckpt.write_fragment(
            "flagship",
            lambda tmp: combined.write_parquet(os.path.join(tmp, "combined")),
        )
        import ray.data as rd

        light_combined = rd.read_parquet(
            os.path.join(ckpt.fragment_dir("flagship"), "combined"),
            columns=[c for c in combined.schema().names if c != "html"],
        )
    else:
        drop = [c for c in ("html",) if c in combined.schema().names]
        light_combined = combined.drop_columns(drop) if drop else combined
        light_combined = light_combined.materialize()

    # --- violations summary (small after groupby) ------------------------
    viols = violations_dataset(light_combined)
    by_rule = {
        r["rule_id"]: int(r["sum(cnt)"])
        for r in viols.map_batches(
            lambda t: t.select(["rule_id"])
            .group_by("rule_id")
            .aggregate([("rule_id", "count")])
            .rename_columns(["rule_id", "cnt"]),
            batch_format="pyarrow",
        )
        .groupby("rule_id")
        .sum("cnt")
        .take_all()
    }

    # --- row-validity counts ---------------------------------------------
    def _valid_counts(t: pa.Table) -> pa.Table:
        v = t.column("valid")
        ok = pc.sum(v).as_py() or 0
        return pa.table({"ok": pa.array([ok], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    light = light_combined
    light_cols = light.schema().names

    counts = light.select_columns(["valid"]).map_batches(_valid_counts, batch_format="pyarrow")
    n_ok = counts.sum("ok")
    n_total = counts.sum("n")

    # --- table-level [NORTH] checks --------------------------------------
    uniq = uniqueness_check(light, id_column)
    ref = referential_check(light, "lang", list(lang_reference.keys()))
    drift = drift_check(light, "lang", lang_reference, threshold=drift_threshold)
    stats = column_stats(
        light, [c for c in ("text", "lang", "warc_ts") if c in light_cols],
        with_sketches=False,
    )

    verdict = {
        "rows": int(n_total or 0),
        "valid_rows": int(n_ok or 0),
        "invalid_rows": int((n_total or 0) - (n_ok or 0)),
        "violations_by_rule": by_rule,
        "checks": [uniq, ref, drift],
        "column_stats": stats,
        "passed": (
            uniq["passed"] and drift["passed"]
            and (n_ok or 0) == (n_total or 0) and ref["passed"]
        ),
    }

    if write_outputs and checkpoint_dir:
        CheckpointDir(checkpoint_dir).write_manifest(
            "flagship", plan_hash(spec),
            {"verdict": {k: v for k, v in verdict.items() if k != "column_stats"}},
        )
    return verdict


def partitioned_flagship(
    input_files: list[str],
    checkpoint_dir: str,
    spec: dict | None = None,
    id_column: str = "url",
) -> list[dict[str, Any]]:
    """Checkpoint/resume form: one fragment per input file; completed
    fragments (manifest matches plan hash) are skipped on rerun
    [NORTH: per-partition lineage + metrics]."""
    import ray.data as rd

    spec = spec or WEB_PAGES_SPEC
    ckpt = CheckpointDir(checkpoint_dir)
    phash = plan_hash(spec)
    manifests = []
    for path in input_files:
        frag = os.path.basename(path)
        if ckpt.completed(frag, phash):
            continue

        ds = rd.read_parquet(path)
        combined = validate_dataset(ds, spec, id_column=id_column)

        def _write(tmp, _c=combined):
            _c.drop_columns(["violations"]).write_parquet(os.path.join(tmp, "validated"))
            violations_dataset(_c).write_parquet(os.path.join(tmp, "violations"))

        out_dir = ckpt.write_fragment(frag, _write)
        total = ds.count()
        ok = combined.select_columns(["valid"]).map_batches(
            lambda t: pa.table({"ok": pa.array([pc.sum(t.column("valid")).as_py() or 0], pa.int64())}),
            batch_format="pyarrow",
        ).sum("ok")
        ckpt.write_manifest(frag, phash, {
            "rows": int(total), "valid_rows": int(ok or 0),
            "outputs": {"dir": out_dir},
        })
    return ckpt.read_manifests()
