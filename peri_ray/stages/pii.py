"""PII detection and redaction for web-corpus curation (the standard
pre-training scrub: emails, IPv4 addresses, phone numbers).

All matching/replacement runs through Arrow's RE2 kernels
(``count_substring_regex`` / ``replace_substring_regex``) — vectorized,
zero-copy in, and with identical leftmost-non-overlapping semantics to
DuckDB's RE2, so the SQL twin uses the SAME pattern strings verbatim
(single source of truth below).  Pure per-batch map: no shuffle at any
scale, no per-actor state needed (the kernels compile internally).

Reference scope note: the reference engine (zoedsoupe/peri) has no PII
layer — this is one of the beyond-reference training-data operators the
build mandates (lib/peri.ex has only generic string regex constraints,
lib/peri.ex:848-861); the regex *constraint* machinery it does have is
covered in peri_ray/compile.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Single source of truth: the oracle SQL interpolates these verbatim.
# RE2-only syntax (no lookarounds) so Arrow and DuckDB agree exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{4}"

_PATTERNS = [("email", EMAIL_RE, "<EMAIL>"),
             ("ipv4", IPV4_RE, "<IP>"),
             ("phone", PHONE_RE, "<PHONE>")]


def _text(table: pa.Table, text_col: str) -> pa.ChunkedArray:
    txt = table.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    return txt


def pii_scan_batch(table: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_email`` / ``n_ipv4`` / ``n_phone`` match counts.
    Null text counts 0 (a missing page has no PII)."""
    txt = _text(table, text_col)
    out = table
    for name, pat, _ in _PATTERNS:
        cnt = pc.count_substring_regex(txt, pat).cast(pa.int64())
        out = out.append_column(f"n_{name}", pc.fill_null(cnt, 0))
    return out


def pii_redact_batch(table: pa.Table, text_col: str = "text",
                     out_col: str | None = None) -> pa.Table:
    """Replace every PII span with its placeholder token.  Email runs
    first: an address contains dotted digit runs a later IP pass could
    otherwise bite into, and this fixed order is part of the contract
    the SQL twin mirrors."""
    txt = _text(table, text_col)
    red = txt
    for _, pat, token in _PATTERNS:
        red = pc.replace_substring_regex(red, pat, token)
    out_col = out_col or text_col
    if out_col in table.column_names:
        return table.set_column(table.column_names.index(out_col), out_col, red)
    return table.append_column(out_col, red)


def add_pii_columns(ds, text_col: str = "text", redact: bool = True,
                    batch_size: int | None = 4096):
    """Streaming scan (+ optional in-place redaction) over a Dataset."""

    def _b(t: pa.Table) -> pa.Table:
        t = pii_scan_batch(t, text_col)
        if redact:
            t = pii_redact_batch(t, text_col)
        return t

    return ds.map_batches(_b, batch_format="pyarrow", batch_size=batch_size)


def k_anonymity_report(ds, quasi_cols: list[str], sensitive_col: str,
                       k: int = 5, l: int = 2, n_buckets: int = 64):
    """k-anonymity / l-diversity audit: the re-identification risk
    check a corpus with user-derived columns needs before release.
    A quasi-identifier combination (zip, age band, ...) violates
    k-anonymity when fewer than ``k`` rows share it, and violates
    l-diversity when its rows expose fewer than ``l`` DISTINCT values
    of the sensitive column (everyone in the group shares the secret).

    Returns only the violating groups:
    ``(quasi..., n, n_sensitive, k_violation, l_violation)``.

    Scale shape: quasi-combination cardinality is of row-count order
    (that is the point of the audit), so this routes through ONE
    hash-bucketed exchange keyed on the quasi columns and runs a
    single vectorized Arrow ``group_by`` per bucket — never Ray's
    per-group aggregation (the measured per-group-overhead pathology).
    Null quasi values form their own group (the GROUP BY convention);
    null sensitive values are ignored by the distinct count (the SQL
    COUNT(DISTINCT) convention)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _audit(group: pa.Table) -> pa.Table:
        g = (group.select(list(quasi_cols) + [sensitive_col])
             .group_by(list(quasi_cols))
             .aggregate([([], "count_all"),
                         (sensitive_col, "count_distinct")]))
        n = g.column("count_all").combine_chunks().cast(pa.int64())
        d = (g.column(f"{sensitive_col}_count_distinct")
             .combine_chunks().cast(pa.int64()))
        k_bad = pc.less(n, k)
        l_bad = pc.less(d, l)
        out = pa.table({c: g.column(c) for c in quasi_cols}
                       | {"n": n, "n_sensitive": d,
                          "k_violation": k_bad, "l_violation": l_bad})
        return out.filter(pc.or_(k_bad, l_bad))

    return map_groups_via_buckets(ds, list(quasi_cols), _audit,
                                  n_buckets=n_buckets)
