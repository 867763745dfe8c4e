"""Flagship pipeline (SURVEY §3.5): web-pages validation end-to-end.

    read → map_batches(validate → verdict partials)  [ONE streaming pass]
         ↘ select(url) → salted groupby               [the ONE shuffle]
      → driver merge of tiny partials → verdict manifest

Fused design: the validate stage and every narrow consumer (violation
rule counts, validity counts, lang histogram, referential count,
column stats) run in a SINGLE ``map_batches`` pass emitting one small
``(metric, key, num, str_val)`` partial table per block — the driver
merges ≤ ~30 rows per block.  Only `url` uniqueness genuinely needs a
cross-block exchange; it runs as a salted two-phase groupby over the
url projection of the raw input (validation never rewrites `url`, so
re-reading one pruned column beats materializing the whole combined
stream).  The ``html`` column never crosses a shuffle (SURVEY §7.6.6).
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from peri_ray.compile import compile_spec
from peri_ray.generate import LANG_REFERENCE_HIST, WEB_PAGES_SPEC
from peri_ray.stages.checks import psi, uniqueness_check
from peri_ray.state.checkpoint import CheckpointDir, plan_hash
from peri_ray.validate import _ValidateFn, validate_dataset, violations_dataset

def _spec_has_transform(texpr) -> bool:
    """True if the type expression carries any transform attachment —
    its validated values may differ from the input column."""
    if isinstance(texpr, tuple):
        if (len(texpr) == 2 and isinstance(texpr[1], tuple) and texpr[1]
                and texpr[1][0] == "transform"):
            return True
        return any(_spec_has_transform(x) for x in texpr)
    if isinstance(texpr, dict):
        return any(_spec_has_transform(v) for v in texpr.values())
    if isinstance(texpr, list):
        return any(_spec_has_transform(v) for v in texpr)
    return False


_PARTIAL_SCHEMA = pa.schema([
    ("metric", pa.string()),
    ("key", pa.string()),
    ("num", pa.float64()),
    ("str_val", pa.string()),
])


class _ValidateAndPartials:
    """One fused stage: run the compiled kernels, then fold the batch
    into verdict partials.  Rows never leave the task — only the tiny
    partial table does."""

    def __init__(self, plan, hist_column: str | None, ref_values: frozenset | None,
                 stat_columns: list[str]):
        # plan=None → passthrough (input already validated, e.g. a
        # checkpointed combined table re-read from parquet)
        self.fn = _ValidateFn(plan) if plan is not None else (lambda t: t)
        self.hist_column = hist_column
        self.ref_values = ref_values
        self.stat_columns = stat_columns

    def __call__(self, table: pa.Table) -> pa.Table:
        t = self.fn(table)
        rows: list[tuple[str, str, float | None, str | None]] = []
        n = t.num_rows
        ok = pc.sum(t.column("valid")).as_py() or 0
        rows.append(("rows", "", float(n), None))
        rows.append(("valid", "", float(ok), None))

        flat = pc.list_flatten(t.column("violations").combine_chunks())
        if len(flat):
            vt = pa.table({"rule_id": pc.struct_field(flat, "rule_id"),
                           "path": pc.struct_field(flat, "path")})
            g = vt.group_by(["rule_id", "path"]).aggregate([("path", "count")])
            for r in g.to_pylist():
                rows.append(("viol", f"{r['rule_id']}|{r['path']}",
                             float(r["path_count"]), None))

        if self.hist_column and self.hist_column in t.column_names:
            col = t.column(self.hist_column).combine_chunks()
            vc = col.value_counts()
            for r in vc.to_pylist():
                if r["values"] is None:
                    continue
                rows.append(("hist", str(r["values"]), float(r["counts"]), None))
            if self.ref_values is not None:
                nn = col.drop_null()
                bad = len(nn) - pc.sum(
                    pc.is_in(nn, value_set=pa.array(sorted(self.ref_values)))
                ).as_py()
                rows.append(("ref_bad", "", float(bad), None))

        for c in self.stat_columns:
            if c not in t.column_names:
                continue
            col = t.column(c).combine_chunks()
            nulls = col.null_count
            rows.append(("stat_count", c, float(len(col) - nulls), None))
            rows.append(("stat_null", c, float(nulls), None))
            try:
                mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            except pa.ArrowNotImplementedError:
                mn = mx = None
            if isinstance(mn, (int, float)):
                rows.append(("stat_min", c, float(mn), None))
                rows.append(("stat_max", c, float(mx), None))
            elif mn is not None:
                rows.append(("stat_min", c, None, str(mn)))
                rows.append(("stat_max", c, None, str(mx)))

        return pa.table({
            "metric": pa.array([r[0] for r in rows], pa.string()),
            "key": pa.array([r[1] for r in rows], pa.string()),
            "num": pa.array([r[2] for r in rows], pa.float64()),
            "str_val": pa.array([r[3] for r in rows], pa.string()),
        })


def run_flagship(
    ds,
    spec: dict | None = None,
    id_column: str = "url",
    lang_reference: dict[str, float] | None = None,
    checkpoint_dir: str | None = None,
    write_outputs: bool = False,
    drift_threshold: float = 0.25,
    id_source=None,
    stats_sink: list | None = None,
) -> dict[str, Any]:
    """Full validation + table checks over a web_pages-shaped Dataset.

    Returns a verdict dict: per-rule outcomes, violation counts by rule,
    column stats, and overall pass/fail.  With ``write_outputs`` the
    combined validated table and the violations table land under
    ``checkpoint_dir`` as partitioned parquet.  ``stats_sink`` (a list)
    receives the executed fused-pass Dataset's ``.stats()`` text —
    the per-stage wall/CPU breakdown used to keep the pipeline
    compute-bound (``bench.py --stats``)."""
    spec = spec or WEB_PAGES_SPEC
    lang_reference = lang_reference or LANG_REFERENCE_HIST

    input_cols = ds.schema().names
    stat_cols = [c for c in ("text", "lang", "warc_ts") if c in input_cols]
    plan = compile_spec(spec, id_column=id_column)

    if write_outputs and checkpoint_dir:
        # checkpointing form: persist the combined stream once, derive
        # the partials from the parquet re-read (resumable)
        combined = validate_dataset(ds, spec, id_column=id_column)
        ckpt = CheckpointDir(checkpoint_dir)
        ckpt.write_fragment(
            "flagship",
            lambda tmp: combined.write_parquet(os.path.join(tmp, "combined")),
        )
        import ray.data as rd

        light = rd.read_parquet(
            os.path.join(ckpt.fragment_dir("flagship"), "combined"),
            columns=[c for c in combined.schema().names if c != "html"],
        )
        stage = _ValidateAndPartials(None, "lang", frozenset(lang_reference), stat_cols)
        part_ds = light.map_batches(stage, batch_format="pyarrow")
        partials = part_ds.take_all()
        if stats_sink is not None:
            stats_sink.append(part_ds.stats())
    else:
        stage = _ValidateAndPartials(
            plan, "lang", frozenset(lang_reference), stat_cols
        )
        # the fused pass and the url-uniqueness shuffle are independent
        # Dataset executions — overlap them so the cluster pipeline never
        # idles between the map stage and the exchange
        from concurrent.futures import ThreadPoolExecutor

        if id_column in spec and _spec_has_transform(spec[id_column]):
            # the spec rewrites the id (e.g. url normalization):
            # uniqueness must see POST-transform values, so the pruned
            # raw-input shortcut is not sound here.  Re-running the
            # kernels for this pass is the cost of correctness, but over
            # a PRUNED input (spec-declared columns only — html never
            # re-materializes unless the spec touches it).
            pruned = ds.select_columns(
                [c for c in input_cols if c in spec]
            )
            id_ds = validate_dataset(
                pruned, spec, mode="permissive", id_column=id_column
            ).select_columns([id_column])
        elif id_source is not None:
            id_ds = id_source
        else:
            id_ds = ds.select_columns([id_column])
        part_ds = ds.map_batches(stage, batch_format="pyarrow")
        with ThreadPoolExecutor(2) as ex:
            f_parts = ex.submit(part_ds.take_all)
            f_uniq = ex.submit(uniqueness_check, id_ds, id_column)
            partials = f_parts.result()
            uniq = f_uniq.result()
        if stats_sink is not None:
            stats_sink.append(part_ds.stats())

    # --- driver merge of the tiny partials -------------------------------
    n_total = n_ok = ref_bad = 0
    by_rule: dict[str, int] = {}
    hist: dict[str, int] = {}
    stats: dict[str, dict[str, Any]] = {c: {"count": 0, "null_count": 0,
                                            "min": None, "max": None}
                                        for c in stat_cols}
    for r in partials:
        m, k = r["metric"], r["key"]
        if m == "rows":
            n_total += int(r["num"])
        elif m == "valid":
            n_ok += int(r["num"])
        elif m == "viol":
            rid = k.split("|", 1)[0]
            by_rule[rid] = by_rule.get(rid, 0) + int(r["num"])
        elif m == "hist":
            hist[k] = hist.get(k, 0) + int(r["num"])
        elif m == "ref_bad":
            ref_bad += int(r["num"])
        elif m.startswith("stat_"):
            s = stats[k]
            if m == "stat_count":
                s["count"] += int(r["num"])
            elif m == "stat_null":
                s["null_count"] += int(r["num"])
            else:
                v = r["num"] if r["num"] is not None else r["str_val"]
                which = "min" if m == "stat_min" else "max"
                cur = s[which]
                if cur is None:
                    s[which] = v
                else:
                    s[which] = min(cur, v) if which == "min" else max(cur, v)

    if write_outputs and checkpoint_dir:
        # checkpoint branch: the one genuine shuffle over the PRUNED
        # re-read of the persisted combined table (a cheap single-column
        # parquet scan carrying post-transform id values).  Strict mode
        # projects undeclared columns away, so an id outside the spec is
        # read back through record_id (same values, string-typed).
        import ray.data as rd

        key = id_column if id_column in spec else "record_id"
        uniq = uniqueness_check(
            rd.read_parquet(
                os.path.join(CheckpointDir(checkpoint_dir).fragment_dir("flagship"),
                             "combined"),
                columns=[key],
            ),
            key,
        )
        uniq["rule_id"] = f"unique:{id_column}"

    ref = {"rule_id": "ref:lang", "passed": ref_bad == 0,
           "violating_rows": ref_bad}
    score = psi(hist, lang_reference)
    drift = {"rule_id": "drift:lang:psi", "passed": score <= drift_threshold,
             "score": score, "threshold": drift_threshold, "observed": hist}

    verdict = {
        "rows": n_total,
        "valid_rows": n_ok,
        "invalid_rows": n_total - n_ok,
        "violations_by_rule": by_rule,
        "checks": [uniq, ref, drift],
        "column_stats": stats,
        "passed": (
            uniq["passed"] and drift["passed"]
            and n_ok == n_total and ref["passed"]
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
    drop_output_columns: tuple[str, ...] = ("html",),
    max_concurrent: int = 1,
    accept_compatible_plans: bool = False,
) -> list[dict[str, Any]]:
    """Checkpoint/resume form: one fragment per input file; completed
    fragments (manifest matches plan hash) are skipped on rerun
    [NORTH: per-partition lineage + metrics].

    Each fragment streams read → validate → write exactly ONCE; the
    per-fragment row/valid counts come from a pruned re-read of the
    written ``valid`` column (a metadata-cheap single-column scan), not
    a second validation pass.  ``drop_output_columns`` keeps the huge
    payload columns (html) out of the validated sink — the lake already
    holds the raw bytes; the validation product is verdicts + violations
    + the cleaned metadata columns.

    ``max_concurrent`` overlaps that many fragment pipelines (each is an
    independent Dataset execution with its own atomic tmp-dir + manifest,
    so checkpoint semantics are unchanged); raise it when fragments are
    small relative to the cluster — per-fragment scheduling latency
    otherwise leaves slots idle between fragments.

    ``accept_compatible_plans`` (opt-in, round 5): also skip fragments
    whose manifest was computed under a DIFFERENT spec when the
    checkpoint's spec snapshot proves the current spec is backward
    compatible (``compat.is_backward_compatible``) AND the fragment was
    fully clean (rows == valid_rows) — a loosened constraint cannot
    change a clean fragment's outputs, but fragments with any recorded
    violation re-run (loosening may flip their rows valid).  Reused
    manifests keep their original plan_hash (honest lineage)."""
    import ray.data as rd

    spec = spec or WEB_PAGES_SPEC
    ckpt = CheckpointDir(checkpoint_dir)
    phash = plan_hash(spec)
    ckpt.save_spec(phash, spec)

    def _one(path: str) -> None:
        # the FULL path is the fragment identity (CheckpointDir
        # sanitizes separators) — a basename key would collide for
        # date-partitioned layouts like 2024-01/part.parquet vs
        # 2024-02/part.parquet and silently skip the second file
        frag = os.path.normpath(path).lstrip(os.sep)
        if (ckpt.completed_compat(frag, phash, spec)
                if accept_compatible_plans
                else ckpt.completed(frag, phash)):
            return

        from peri_ray.sources import read_table

        ds = read_table(path)
        combined = validate_dataset(ds, spec, id_column=id_column)
        sch = combined.schema()
        if sch is None:
            # 0-row fragment: map_batches never ran, schema unknowable —
            # record an empty manifest (nothing to write, nothing to skip)
            out_dir = ckpt.write_fragment(frag, lambda tmp: None)
            ckpt.write_manifest(frag, phash, {
                "rows": 0, "valid_rows": 0, "outputs": {"dir": out_dir},
            })
            return
        drop = [c for c in ("violations", *drop_output_columns)
                if c in sch.names]

        def _write(tmp, _c=combined, _drop=drop):
            _c.drop_columns(_drop).write_parquet(os.path.join(tmp, "validated"))
            violations_dataset(_c).write_parquet(os.path.join(tmp, "violations"))

        out_dir = ckpt.write_fragment(frag, _write)
        vds = rd.read_parquet(os.path.join(out_dir, "validated"), columns=["valid"])
        counts = vds.map_batches(
            lambda t: pa.table({
                "ok": pa.array([pc.sum(t.column("valid")).as_py() or 0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }),
            batch_format="pyarrow",
        ).sum(["ok", "n"])
        # Dataset.sum returns None when the written fragment is empty
        counts = counts or {"sum(ok)": 0, "sum(n)": 0}
        ckpt.write_manifest(frag, phash, {
            "rows": int(counts["sum(n)"]), "valid_rows": int(counts["sum(ok)"]),
            "outputs": {"dir": out_dir},
        })

    if max_concurrent <= 1:
        for path in input_files:
            _one(path)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_concurrent) as ex:
            for f in [ex.submit(_one, p) for p in input_files]:
                f.result()
    return ckpt.read_manifests()


def merge_partition_verdict(manifests: list[dict[str, Any]]) -> dict[str, Any]:
    """Fold per-fragment manifests into the job-level verdict."""
    rows = sum(m["rows"] for m in manifests)
    ok = sum(m["valid_rows"] for m in manifests)
    return {
        "fragments": len(manifests),
        "rows": rows,
        "valid_rows": ok,
        "invalid_rows": rows - ok,
        "passed": ok == rows,
    }
