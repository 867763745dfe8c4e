"""Web-corpus operators: URL canonicalization, host extraction, and
domain-level aggregation (SURVEY §2.7 [NORTH] companions — the
Common-Crawl-style steps that run before/alongside validation over the
``(url, warc_ts, html, text, lang)`` table in BASELINE.json's
input_hint).

All stages are shuffle-free ``map_batches`` passes over zero-copy
Arrow batches; the only exchange in the family is the keep-latest
dedup, which reuses :func:`peri_ray.stages.stats.top_k_per_group`
(per-block partials keep one candidate row per (url, block), so the
``html``/``text`` payload of a dominated capture never leaves its
block — at 100 TB only winners-per-block cross the wire).

Reference anchor: peri validates single records and has no URL ops;
these derive from the north rule's web-pages framing (SURVEY §1 note
and FIXTURES F0) and standard crawl-dedup practice (keep the newest
capture per canonical URL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# One RE2 pattern splits a URL into its four canonicalization-relevant
# parts; anything after '#' lands in `rest` together with the query.
_URL_PARTS_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#]*)(?P<path>[^?#]*)(?P<rest>.*)$"
)

# Tracking parameters dropped during canonicalization (the common
# "utm_*" family; extend via the drop_param_prefixes knob).
DEFAULT_DROP_PARAM_PREFIXES = ("utm_",)


def _canonicalize_table(t: pa.Table, url_col: str, out_col: str,
                        drop_param_prefixes: tuple[str, ...]) -> pa.Table:
    """Vectorized canonicalization of one Arrow batch.

    Rules (each a standard crawl-normalization step):
      1. lowercase scheme and host (path/query stay case-sensitive)
      2. strip the fragment
      3. strip the scheme's default port (:80 http, :443 https)
      4. strip a leading ``www.`` host label
      5. drop tracking query params (prefix match), sort the rest
      6. collapse trailing slashes; empty path becomes ``/``

    Null or non-URL-shaped values canonicalize to null (callers keep
    the raw column, so nothing is lost).
    """
    urls = t.column(url_col).combine_chunks()
    if pa.types.is_large_string(urls.type):
        urls = urls.cast(pa.string())
    parts = pc.extract_regex(urls, _URL_PARTS_RE)
    matched = pc.is_valid(parts)

    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    path = pc.struct_field(parts, "path")
    rest = pc.struct_field(parts, "rest")

    # default ports, per-scheme
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        pc.if_else(pc.equal(scheme, "https"),
                   pc.replace_substring_regex(host, r":443$", ""),
                   host))
    host = pc.replace_substring_regex(host, r"^www\.", "")

    # trailing slashes; '' -> '/'
    path = pc.replace_substring_regex(path, r"/+$", "")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/", pa.string()), path)

    # query: strip fragment, strip leading '?', split, filter, sort.
    query = pc.replace_substring_regex(rest, r"#.*$", "")
    query = pc.replace_substring_regex(query, r"^\?", "")
    plists = pc.split_pattern(pc.fill_null(query, ""), "&")
    if isinstance(plists, pa.ChunkedArray):
        plists = plists.combine_chunks()
    flat = plists.flatten()
    keep = pc.not_equal(flat, "")
    for pref in drop_param_prefixes:
        keep = pc.and_(keep, pc.invert(pc.starts_with(flat, pref)))
    n = len(plists)
    row_idx = np.repeat(
        np.arange(n, dtype=np.int64),
        np.diff(plists.offsets.to_numpy(zero_copy_only=False)))
    keep_np = keep.to_numpy(zero_copy_only=False)
    kept_rows = row_idx[keep_np]
    kept_vals = flat.filter(keep)
    # sort params within each row (Arrow C-sort, binary collation —
    # matches SQL list_sort's default)
    order = (pa.table({"r": kept_rows, "v": kept_vals})
             .sort_by([("r", "ascending"), ("v", "ascending")]))
    counts = np.bincount(kept_rows, minlength=n) if len(kept_rows) else \
        np.zeros(n, np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    sorted_lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()) if offsets[-1] < 2**31 - 1
        else pa.array(offsets, pa.int64()),
        order.column("v").combine_chunks())
    qjoined = pc.binary_join(sorted_lists, "&")
    qpart = pc.if_else(pc.equal(qjoined, ""), pa.scalar("", pa.string()),
                       pc.binary_join_element_wise("?", qjoined, ""))

    canon = pc.binary_join_element_wise(
        scheme, "://", host, path, qpart, "")
    canon = pc.if_else(matched, canon, pa.scalar(None, pa.string()))
    return t.append_column(out_col, canon)


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "canonical_url",
                      drop_param_prefixes: tuple[str, ...] =
                      DEFAULT_DROP_PARAM_PREFIXES,
                      batch_size: int | None = 65536):
    """Append a canonical-URL column — one shuffle-free vectorized
    pass (RE2 part extraction + Arrow string kernels + one C-level
    sort for query params; no per-row Python)."""
    return ds.map_batches(
        lambda t: _canonicalize_table(t, url_col, out_col,
                                      tuple(drop_param_prefixes)),
        batch_format="pyarrow", batch_size=batch_size)


def keep_latest_capture(ds, url_col: str = "canonical_url",
                        ts_col: str = "warc_ts", id_col: str = "doc_id"):
    """Recrawl dedup: keep the NEWEST capture per canonical URL
    (ties broken by smallest id) — ``top_k_per_group`` with k=1, so
    only one candidate row per (url, block) crosses the exchange."""
    from peri_ray.stages.stats import top_k_per_group

    return top_k_per_group(ds, key=url_col, order_col=ts_col, k=1,
                           descending=True, tiebreak=id_col)


def host_of(ds, url_col: str = "canonical_url", out_col: str = "host",
            batch_size: int | None = 65536):
    """Append the URL's host (post-canonicalization: already
    lowercased, de-ported, de-www'd)."""
    def _h(t: pa.Table) -> pa.Table:
        u = t.column(url_col).combine_chunks()
        if pa.types.is_large_string(u.type):
            u = u.cast(pa.string())
        ex = pc.extract_regex(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?#]*)")
        h = pc.if_else(pc.is_valid(ex), pc.struct_field(ex, "h"),
                       pa.scalar(None, pa.string()))
        return t.append_column(out_col, h)

    return ds.map_batches(_h, batch_format="pyarrow", batch_size=batch_size)


def url_prefix_counts(ds, url_col: str = "canonical_url",
                      max_depth: int = 3, n_buckets: int = 64,
                      batch_size: int | None = 65536):
    """Pages per (host, path-prefix) for prefix depths 1..max_depth —
    the URL-hierarchy rollup a crawl frontier / sitemap audit needs
    (which sections of a site dominate the corpus).  A url
    ``h/a/b/c`` contributes to ``/a`` (depth 1), ``/a/b`` (depth 2),
    ``/a/b/c`` (depth 3); paths shallower than a depth simply don't
    emit that row.  Prefix extraction is one RE2 kernel per depth
    (``^((?:/[^/]+){d})``) so a SQL twin can run the identical
    pattern.

    Scale shape: per-batch pre-aggregation (an in-block Arrow
    group_by — the combiner) then ONE bucketed exchange keyed on
    (host, prefix, depth); prefix cardinality is of corpus order, so
    never Ray's per-group aggregation.  Output:
    ``(host, prefix, depth, n_pages)``."""
    from peri_ray.stages.dedup import grouped_sum_via_buckets

    def _part(t: pa.Table) -> pa.Table:
        u = t.column(url_col).combine_chunks()
        if pa.types.is_large_string(u.type):
            u = u.cast(pa.string())
        hx = pc.extract_regex(u, r"://(?P<h>[^/?#:]*)")
        host = pc.if_else(pc.is_valid(hx), pc.struct_field(hx, "h"),
                          pa.scalar(None, pa.string()))
        px = pc.extract_regex(u, r"://[^/?#]*(?P<p>[^?#]*)")
        path = pc.if_else(pc.is_valid(px), pc.struct_field(px, "p"),
                          pa.scalar(None, pa.string()))
        hs, ps, ds_ = [], [], []
        for d in range(1, max_depth + 1):
            ex = pc.extract_regex(path, r"^(?P<p>(?:/[^/]+){%d})" % d)
            ok = pc.and_(pc.is_valid(ex), pc.is_valid(host))
            hs.append(host.filter(ok))
            ps.append(pc.struct_field(ex.filter(ok), "p"))
            ds_.append(pa.array(np.full(len(hs[-1]), d, np.int64)))
        flat = pa.table({
            "host": pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in hs]),
            "prefix": pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in ps]),
            "depth": pa.concat_arrays(ds_),
        })
        g = (flat.group_by(["host", "prefix", "depth"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["host", "prefix", "depth", "n_pages"])

    parts = ds.map_batches(_part, batch_format="pyarrow",
                           batch_size=batch_size)
    return grouped_sum_via_buckets(parts, ["host", "prefix", "depth"],
                                   "n_pages", n_buckets=n_buckets)


def extract_text_from_html(ds, html_col: str = "html",
                           out_col: str = "extracted_text",
                           batch_size: int | None = 8192):
    """Append the text extracted from the ``html`` binary column — the
    north rule's per-row invariant surface (byte-identical extracted
    text per url).  One shuffle-free vectorized pass: binary → utf-8
    string view + one RE2 ``extract_regex`` (first ``<p>…</p>``, the
    same contract as :func:`peri_ray.generate.extract_text`); pages
    with no match (or null html) extract to null.

    The real-HTML production step would swap the regex for a proper
    extractor inside the same ``map_batches`` signature; the plumbing
    (binary in, string out, html never shuffles) is what's load-bearing
    at 100 TB.  Smallish ``batch_size`` because each batch holds the
    full html payload."""
    def _x(t: pa.Table) -> pa.Table:
        h = t.column(html_col).combine_chunks()
        s = h.cast(pa.string())
        ex = pc.extract_regex(s, r"(?s)<p>(?P<t>.*?)</p>")
        got = pc.if_else(pc.is_valid(ex), pc.struct_field(ex, "t"),
                         pa.scalar(None, pa.string()))
        return t.append_column(out_col, got)

    return ds.map_batches(_x, batch_format="pyarrow", batch_size=batch_size)


def extraction_mismatches(ds, html_col: str = "html",
                          text_col: str = "text", id_col: str = "doc_id",
                          batch_size: int | None = 8192):
    """Per-row extraction-invariant check: re-extract text from html
    and emit one row per MISMATCH (id, n_text, n_extracted) — rows
    where the stored text and the re-extracted text are distinct
    (SQL ``IS DISTINCT FROM``: one-sided nulls mismatch, both-null
    passes).  Streaming; only violations leave the stage, so the
    output is violation-bounded like the validation sink."""
    ds = extract_text_from_html(ds, html_col, "__got", batch_size)

    def _cmp(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        got = t.column("__got").combine_chunks()
        both_null = pc.and_(pc.is_null(txt), pc.is_null(got))
        eq = pc.fill_null(pc.equal(txt, got), False)
        bad = pc.and_(pc.invert(eq), pc.invert(both_null))
        sub = t.filter(bad)
        stxt = sub.column(text_col).combine_chunks()
        if pa.types.is_large_string(stxt.type):
            stxt = stxt.cast(pa.string())
        return pa.table({
            id_col: sub.column(id_col),
            "n_text": pc.utf8_length(stxt).cast(pa.int64()),
            "n_extracted": pc.utf8_length(
                sub.column("__got").combine_chunks()).cast(pa.int64()),
        })

    return ds.map_batches(_cmp, batch_format="pyarrow",
                          batch_size=batch_size)


def host_quota(ds, host_col: str = "host", order_col: str = "n_chars",
               k: int = 10, tiebreak: str = "doc_id"):
    """Per-domain quota (FineWeb-style anti-domination): keep at most
    ``k`` pages per host, preferring the largest ``order_col`` (ties:
    smallest ``tiebreak``).  ``top_k_per_group``, so each block
    contributes ≤ k candidate rows per host to the exchange — the
    payload of a dominated page never crosses the wire."""
    from peri_ray.stages.stats import top_k_per_group

    return top_k_per_group(ds, key=host_col, order_col=order_col, k=k,
                           descending=True, tiebreak=tiebreak)


def blocklist_filter(ds, blocked_hosts: list[str],
                     url_patterns: list[str] = (),
                     url_col: str = "url", host_col: str = "host",
                     id_col: str = "doc_id", report: bool = False,
                     batch_size: int | None = 65536):
    """URL/domain blocklist filter (the UT1-blocklist step of
    RefinedWeb/FineWeb-class pipelines): drop pages whose host is a
    blocked domain OR ANY SUBDOMAIN of one, or whose raw url matches
    any of ``url_patterns``.

    ``report=False`` returns the KEPT Dataset; ``report=True`` returns
    the dropped-page report (id, url, rule) with rule = 'blocked_host'
    (checked first) or 'url_pattern' — the violations-stream shape.

    Vectorized as TWO RE2 matches per batch: the host list compiles to
    one suffix-anchored alternation ``(^|\\.)(d1|d2|…)$`` (RE2 builds
    a DFA over alternations, so even large lists stay linear-time) and
    the patterns to one alternation.  The pattern STRINGS ship once in
    the task closure — for multi-million-domain lists swap in a
    ``ray.put`` exact-host set + ``pc.is_in`` over per-row host
    suffixes instead."""
    import re as _re

    host_re = ("(^|\\.)(" +
               "|".join(_re.escape(h) for h in blocked_hosts) + ")$") \
        if blocked_hosts else None
    url_re = "|".join(f"(?:{p})" for p in url_patterns) \
        if url_patterns else None

    def _f(t: pa.Table) -> pa.Table:
        n = len(t)
        host = t.column(host_col).combine_chunks()
        if pa.types.is_large_string(host.type):
            host = host.cast(pa.string())
        bad_host = pc.fill_null(pc.match_substring_regex(host, host_re),
                                False) if host_re else \
            pa.array(np.zeros(n, bool))
        urls = t.column(url_col).combine_chunks()
        if pa.types.is_large_string(urls.type):
            urls = urls.cast(pa.string())
        bad_url = pc.fill_null(pc.match_substring_regex(urls, url_re),
                               False) if url_re else \
            pa.array(np.zeros(n, bool))
        if not report:
            return t.filter(pc.invert(pc.or_(bad_host, bad_url)))
        dropped = pc.or_(bad_host, bad_url)
        sub = t.filter(dropped)
        rule = pc.if_else(bad_host.filter(dropped),
                          pa.scalar("blocked_host", pa.string()),
                          pa.scalar("url_pattern", pa.string()))
        surls = sub.column(url_col).combine_chunks()
        if pa.types.is_large_string(surls.type):
            surls = surls.cast(pa.string())
        return pa.table({id_col: sub.column(id_col), "url": surls,
                         "rule": rule})

    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def domain_stats(ds, host_col: str = "host", lang_col: str = "lang",
                 chars_col: str = "n_chars",
                 batch_size: int | None = 65536) -> pa.Table:
    """Per-domain corpus profile: page count, total chars, distinct
    languages.  Domain cardinality is assumed driver-bounded (hosts on
    the web are ~100 M — far below row count; at that extreme swap the
    driver merge for ``grouped_sum_via_buckets``, same partial shape).

    One streaming pass of per-batch ``(host, lang) -> (n, chars)``
    Arrow group_by partials; the driver merge is bounded by
    blocks × hosts × langs rows.  No shuffle, text never leaves the
    read stage."""
    def _part(t: pa.Table) -> pa.Table:
        sub = pa.table({
            "host": t.column(host_col),
            "lang": pc.fill_null(t.column(lang_col).combine_chunks()
                                 .cast(pa.string()), ""),
            "chars": pc.fill_null(t.column(chars_col).combine_chunks()
                                  .cast(pa.int64()), 0),
        }).filter(pc.is_valid(t.column(host_col).combine_chunks()))
        g = (sub.group_by(["host", "lang"])
             .aggregate([("chars", "sum"), ([], "count_all")]))
        return g.rename_columns(["host", "lang", "chars", "n"])

    partials = ds.map_batches(_part, batch_format="pyarrow",
                              batch_size=batch_size)
    merged = pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema([("host", pa.string()), ("lang", pa.string()),
                          ("chars", pa.int64()), ("n", pa.int64())]))
    per_hl = (merged.group_by(["host", "lang"])
              .aggregate([("chars", "sum"), ("n", "sum")]))
    out = (per_hl.group_by(["host"])
           .aggregate([("chars_sum", "sum"), ("n_sum", "sum"),
                       ("lang", "count_distinct")]))
    out = out.rename_columns(["host", "sum_chars", "n_pages", "n_langs"])
    return (out.select(["host", "n_pages", "n_langs", "sum_chars"])
            .sort_by([("host", "ascending")]))


def extract_outlinks(ds, html_col: str = "html", id_col: str = "doc_id",
                     batch_size: int | None = 8192):
    """Extract every ``<a href="...">`` target from the html column —
    one (id, href) row per anchor, in document order.  Vectorized like
    the canonicalizer's param machinery: ONE ``split_pattern`` on the
    anchor prefix, offsets → row ids, one RE2 prefix extract for the
    quoted url; no per-row Python.  Pages with no anchors (or null
    html) emit nothing — at 100 TB the output is link-bounded and the
    html payload never leaves the stage."""
    def _x(t: pa.Table) -> pa.Table:
        h = t.column(html_col).combine_chunks()
        s = h.cast(pa.string())
        ids = t.column(id_col).combine_chunks()
        pieces = pc.split_pattern(pc.fill_null(s, ""), '<a href="')
        if isinstance(pieces, pa.ChunkedArray):
            pieces = pieces.combine_chunks()
        flat = pieces.flatten()
        n = len(pieces)
        counts = np.diff(pieces.offsets.to_numpy(zero_copy_only=False))
        row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        # the first piece of each row precedes any anchor; the rest
        # each START with the href (up to the closing quote)
        first = np.zeros(len(flat), bool)
        offs = pieces.offsets.to_numpy(zero_copy_only=False)
        first[offs[:-1][counts > 0]] = True
        cand = pc.extract_regex(flat, '^(?P<u>[^"]*)"')
        got = pc.and_(pc.is_valid(cand), pa.array(~first))
        hrefs = pc.struct_field(cand.filter(got), "u")
        take_rows = row_idx[got.to_numpy(zero_copy_only=False)]
        return pa.table({
            id_col: ids.take(pa.array(take_rows)),
            "href": hrefs,
        })

    return ds.map_batches(_x, batch_format="pyarrow",
                          batch_size=batch_size)


def href_host(href: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Host of each href (None when unparsable) — THE single
    implementation shared by every link-graph consumer (a host-parsing
    fix must land exactly once)."""
    if isinstance(href, pa.ChunkedArray):
        href = href.combine_chunks()
    if pa.types.is_large_string(href.type):
        href = href.cast(pa.string())
    ex = pc.extract_regex(href,
                          r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<h>[^/?#]*)")
    return pc.if_else(pc.is_valid(ex), pc.struct_field(ex, "h"),
                      pa.scalar(None, pa.string()))


def _pair_counts(ds, a_col: str, b_col: str,
                 batch_size: int | None) -> pa.Table:
    """(a, b, n) counts from per-batch Arrow group_by partials + a
    pair-cardinality-bounded driver merge (domain_stats contract)."""
    def _part(t: pa.Table) -> pa.Table:
        sub = pa.table({"a": t.column(a_col), "b": t.column(b_col)})
        sub = sub.filter(pc.and_(pc.is_valid(sub.column("a")),
                                 pc.is_valid(sub.column("b"))))
        g = sub.group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "n"])

    acc: dict[tuple, int] = {}
    for r in ds.map_batches(_part, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        key = (r["a"], r["b"])
        acc[key] = acc.get(key, 0) + int(r["n"])
    ks = sorted(acc)
    return pa.table({
        "a": pa.array([k[0] for k in ks], pa.string()),
        "b": pa.array([k[1] for k in ks], pa.string()),
        "n": pa.array([acc[k] for k in ks], pa.int64()),
    })


def outlink_host_counts(ds, src_host_col: str = "host",
                        href_col: str = "href",
                        batch_size: int | None = 65536) -> pa.Table:
    """Host-level link graph: (src_host, dst_host, n_links) from an
    (src_host, href) edge Dataset — per-batch Arrow group_by partials
    + driver merge (bounded by host-pair cardinality, the same
    driver-bounded contract as :func:`domain_stats`; swap the merge
    for ``grouped_sum_via_buckets`` when the host-pair domain
    outgrows the driver).  hrefs whose host can't be parsed drop."""
    def _dst(t: pa.Table) -> pa.Table:
        return pa.table({"src_host": t.column(src_host_col),
                         "dst_host": href_host(t.column(href_col))})

    pairs = _pair_counts(ds.map_batches(_dst, batch_format="pyarrow",
                                        batch_size=batch_size),
                         "src_host", "dst_host", batch_size)
    return pairs.rename_columns(["src_host", "dst_host", "n_links"])


def extract_title(ds, html_col: str = "html", out_col: str = "title",
                  batch_size: int | None = 8192):
    """Append the page title parsed from the html binary column — one
    vectorized RE2 pass (first ``<title>…</title>``, non-greedy,
    dotall); pages with no title (or null html) get null.  Same
    binary-in/string-out plumbing contract as
    :func:`extract_text_from_html`."""
    def _t(t: pa.Table) -> pa.Table:
        h = t.column(html_col).combine_chunks()
        s = h.cast(pa.string())
        ex = pc.extract_regex(s, r"(?s)<title>(?P<t>.*?)</title>")
        got = pc.if_else(pc.is_valid(ex), pc.struct_field(ex, "t"),
                         pa.scalar(None, pa.string()))
        return t.append_column(out_col, got)

    return ds.map_batches(_t, batch_format="pyarrow",
                          batch_size=batch_size)


def web_prep_gates(ds, blocked_hosts: list[str],
                   url_patterns: list[str] = (), quota_k: int = 10,
                   url_col: str = "canonical_url", raw_url_col: str = "url",
                   host_col: str = "host", ts_col: str = "warc_ts",
                   order_col: str = "n_chars", id_col: str = "doc_id",
                   n_buckets: int = 64):
    """Composed web-prep pipeline with per-page gate attribution — the
    crawl-side counterpart of the curation pipeline: every input page
    gets exactly one verdict, the FIRST gate that drops it:

      1. ``recrawl_dup``  — not the newest capture of its canonical
         url (tie: smallest id wins)
      2. ``blocked``      — host on the blocklist (or any subdomain),
         or raw url matching a pattern
      3. ``quota``        — beyond the per-host top-``quota_k`` by
         ``order_col`` (tie: smallest id) among surviving pages
      4. ``kept``

    Shape: TWO bucketed exchanges (per-url recrawl ranking, per-host
    quota ranking among survivors) carrying only
    (id, urls, host, order) — never html/text; the blocklist check is
    a vectorized map fused into the first exchange's output.  Returns
    a Dataset of (id, gate) covering every input page."""
    import re as _re

    from peri_ray.stages.dedup import map_groups_via_buckets

    host_re = ("(^|\\.)(" +
               "|".join(_re.escape(h) for h in blocked_hosts) + ")$") \
        if blocked_hosts else None
    url_re = "|".join(f"(?:{p})" for p in url_patterns) \
        if url_patterns else None

    slim = ds.map_batches(
        lambda t: t.select([id_col, url_col, raw_url_col, host_col,
                            ts_col, order_col]),
        batch_format="pyarrow")

    def _recrawl(bucket: pa.Table) -> pa.Table:
        # whole-bucket pass (per-run fn calls at ~unique-url
        # cardinality are the CLAUDE.md per-run-cost pitfall): one
        # sort, one shifted-equality scan marks every non-first
        # capture of each canonical url
        g = bucket.sort_by([(url_col, "ascending"), (ts_col, "descending"),
                            (id_col, "ascending")])
        urls = g.column(url_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        dup = np.zeros(len(urls), bool)
        dup[1:] = urls[1:] == urls[:-1]
        return pa.table({
            id_col: g.column(id_col),
            raw_url_col: g.column(raw_url_col),
            host_col: g.column(host_col),
            order_col: g.column(order_col),
            "dup": pa.array(dup),
        })

    ranked = map_groups_via_buckets(slim, [url_col], _recrawl,
                                    n_buckets=n_buckets)

    def _gate1(t: pa.Table) -> pa.Table:
        n = len(t)
        host = t.column(host_col).combine_chunks()
        if pa.types.is_large_string(host.type):
            host = host.cast(pa.string())
        urls = t.column(raw_url_col).combine_chunks()
        if pa.types.is_large_string(urls.type):
            urls = urls.cast(pa.string())
        bad_host = pc.fill_null(pc.match_substring_regex(host, host_re),
                                False) if host_re else \
            pa.array(np.zeros(n, bool))
        bad_url = pc.fill_null(pc.match_substring_regex(urls, url_re),
                               False) if url_re else \
            pa.array(np.zeros(n, bool))
        dup = t.column("dup").combine_chunks()
        gate = pc.if_else(
            dup, pa.scalar("recrawl_dup", pa.string()),
            pc.if_else(pc.or_(bad_host, bad_url),
                       pa.scalar("blocked", pa.string()),
                       pa.scalar(None, pa.string())))

        # map-side quota pre-labeling (skew kill): a row ranked >= k
        # among its host's eligible rows WITHIN THIS BLOCK is beyond
        # the quota globally too, so it can be finalized here — the
        # exchange then carries at most k candidate rows per (host,
        # block), and a Zipf-hot host can no longer flood one reduce
        # group (measured: host0 holding 13% of a 6.4 M corpus turned
        # the quota group into the pipeline straggler)
        gate_np = gate.to_numpy(zero_copy_only=False)
        elig0 = pc.is_null(gate).to_numpy(zero_copy_only=False)
        sub = pa.table({
            "h": host.filter(pa.array(elig0)),
            "o": t.column(order_col).combine_chunks().filter(
                pa.array(elig0)),
            "i": t.column(id_col).combine_chunks().filter(pa.array(elig0)),
            "pos": pa.array(np.flatnonzero(elig0)),
        }).sort_by([("h", "ascending"), ("o", "descending"),
                    ("i", "ascending")])
        if sub.num_rows:
            hs = sub.column("h").to_numpy(zero_copy_only=False)
            m = len(hs)
            new_run = np.ones(m, bool)
            new_run[1:] = hs[1:] != hs[:-1]
            run_id = np.cumsum(new_run) - 1
            offs = np.arange(m, dtype=np.int64)
            rank = offs - offs[new_run][run_id]
            losers = sub.column("pos").to_numpy(
                zero_copy_only=False)[rank >= quota_k]
            if losers.size:
                gate_np = gate_np.copy()
                gate_np[losers] = "quota"
        gate = pa.array(gate_np.tolist(), pa.string())

        # finalized rows bucket uniformly by id (they only pass
        # through); live candidates bucket by host so each host's
        # survivors co-locate
        from peri_ray.stages.checks import bucket_of

        b_host = bucket_of(host, n_buckets)
        b_id = bucket_of(t.column(id_col).combine_chunks(), n_buckets)
        bucket = pc.if_else(pc.is_null(gate), b_host, b_id)
        return pa.table({id_col: t.column(id_col),
                         host_col: t.column(host_col),
                         order_col: t.column(order_col),
                         "gate": gate,
                         "__bucket": bucket})

    gated = ranked.map_batches(_gate1, batch_format="pyarrow")

    # ONE skew-balanced exchange finishes the quota AND carries every
    # earlier verdict through — fully streaming, no materialize/union
    def _quota(bucket: pa.Table) -> pa.Table:
        g = bucket.drop_columns(["__bucket"]).sort_by(
            [(host_col, "ascending"), (order_col, "descending"),
             (id_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "gate": pa.array([], pa.string())})
        hosts = g.column(host_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        prior = g.column("gate").combine_chunks()
        elig = pc.is_null(prior).to_numpy(zero_copy_only=False)
        new_run = np.ones(n, bool)
        new_run[1:] = hosts[1:] != hosts[:-1]
        run_id = np.cumsum(new_run) - 1
        prefix = np.cumsum(elig) - elig  # eligible rows BEFORE this one
        base = prefix[new_run][run_id]   # ...at the run start
        rank = prefix - base             # eligible-rank within the host
        out = np.where(elig,
                       np.where(rank < quota_k, "kept", "quota"),
                       prior.to_numpy(zero_copy_only=False))
        return pa.table({id_col: g.column(id_col),
                         "gate": pa.array(out.tolist(), pa.string())})

    from peri_ray.stages.dedup import EXCHANGE_COALESCE_ROWS

    return (gated.map_batches(lambda t: t, batch_format="pyarrow",
                              batch_size=EXCHANGE_COALESCE_ROWS)
            .groupby("__bucket").map_groups(_quota, batch_format="pyarrow"))


def host_degree_stats(edges, src_col: str = "src_host",
                      dst_col: str = "dst_host",
                      batch_size: int | None = 65536) -> pa.Table:
    """Link-graph degree profile per host: outgoing/incoming link
    counts AND distinct peer-host counts, from an (src_host, dst_host)
    edge Dataset — the (src, dst, n) aggregation is the SAME
    pair-count pass :func:`outlink_host_counts` uses; degrees then
    derive from that host-pair-bounded table driver-side."""
    pairs = _pair_counts(edges, src_col, dst_col, batch_size)
    hosts: dict[str, list] = {}
    for i in range(pairs.num_rows):
        s_, d_, n_ = (pairs.column("a")[i].as_py(),
                      pairs.column("b")[i].as_py(),
                      pairs.column("n")[i].as_py())
        hs = hosts.setdefault(s_, [0, set(), 0, set()])
        hs[0] += n_
        hs[1].add(d_)
        hd = hosts.setdefault(d_, [0, set(), 0, set()])
        hd[2] += n_
        hd[3].add(s_)
    keys = sorted(hosts)
    return pa.table({
        "host": pa.array(keys, pa.string()),
        "out_links": pa.array([hosts[h][0] for h in keys], pa.int64()),
        "out_hosts": pa.array([len(hosts[h][1]) for h in keys], pa.int64()),
        "in_links": pa.array([hosts[h][2] for h in keys], pa.int64()),
        "in_hosts": pa.array([len(hosts[h][3]) for h in keys], pa.int64()),
    })

# Junk-page detection: the boilerplate "is this even a content page"
# gate of crawl curation (soft-404s, login walls, JS-required shells,
# parked domains).  First matching rule wins — the same attribution
# contract as blocklist_filter / web_prep_gates.
JUNK_PAGE_RULES: tuple[tuple[str, str], ...] = (
    ("soft404", r"(?i)\b(404|page not found|not found)\b"),
    ("login_wall", r"(?i)\b(sign in|log in) to (view|continue)"),
    ("js_required", r"(?i)enable javascript"),
    ("parked", r"(?i)domain (is )?for sale"),
)


def junk_page_flags(ds, text_col: str = "text", id_col: str = "doc_id",
                    rules: tuple = JUNK_PAGE_RULES,
                    batch_size: int | None = 65536):
    """Per-page junk verdict: ``junk_rule`` = name of the FIRST rule
    whose RE2 pattern matches the extracted text, else null (clean).
    Soft-404 bodies, login walls, JS-required shells and parked-domain
    lander text are the classic non-content pages a crawl corpus must
    drop before any quality scoring spends compute on them.

    Shuffle-free: one vectorized ``match_substring_regex`` pass per
    rule per batch (len(rules) regex sweeps total); patterns are RE2 on
    both the engine and the DuckDB twin, so parity is by construction.
    Null text stays null — no text, no verdict."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        n = len(txt)
        verdict = np.full(n, None, dtype=object)
        unset = pc.is_valid(txt).to_numpy(zero_copy_only=False).copy()
        for name, pat in rules:
            m = pc.fill_null(pc.match_substring_regex(txt, pat),
                             False).to_numpy(zero_copy_only=False)
            verdict[unset & m] = name
            unset &= ~m
        return pa.table({id_col: t.column(id_col),
                         "junk_rule": pa.array(verdict.tolist(),
                                               pa.string())})

    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def encoding_quality_report(ds, text_col: str = "text",
                            id_col: str = "doc_id",
                            batch_size: int | None = 65536):
    """Per-page encoding-damage signals — the mojibake gate of crawl
    curation (broken charset detection upstream is THE classic
    Common-Crawl text defect):

    - ``n_repl``: U+FFFD replacement characters (decoder already gave
      up);
    - ``n_ctrl``: C0 control characters other than tab/newline/CR
      (binary junk that survived extraction);
    - ``n_double``: UTF-8-read-as-Latin-1 digraphs (``Ã`` followed by
      a U+0080–U+00BF continuation-range code point — 'Ã©' for 'é');
    - ``mojibake``: any of the above present.

    Three vectorized substring/RE2 sweeps per batch, shuffle-free;
    null text yields null signals.  Patterns are RE2 on both the
    engine and the DuckDB twin."""
    _CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
    _DOUBLE = "Ã[\\x80-\\xbf]"

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        n_repl = pc.count_substring(txt, "�").cast(pa.int64())
        n_ctrl = pc.count_substring_regex(txt, _CTRL).cast(pa.int64())
        n_double = pc.count_substring_regex(txt, _DOUBLE).cast(pa.int64())
        total = pc.add(pc.add(n_repl, n_ctrl), n_double)
        return pa.table({id_col: t.column(id_col),
                         "n_repl": n_repl, "n_ctrl": n_ctrl,
                         "n_double": n_double,
                         "mojibake": pc.greater(total, 0)})

    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def script_mix_report(ds, text_col: str = "text", id_col: str = "doc_id",
                      batch_size: int | None = 65536):
    """Per-page Unicode-script composition — mixed-script pages are the
    SEO-spam / wrong-charset signal language-ID alone misses (a page
    that is 95% Latin with planted Cyrillic keywords still IDs as its
    majority language).  Counts letters per script via one RE2 class
    sweep each (``\\p{Latin}`` / ``\\p{Cyrillic}`` / ``\\p{Greek}``,
    identical in DuckDB's RE2), plus ``mixed`` = Latin AND Cyrillic
    both present.  Shuffle-free; null text yields null signals."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        lat = pc.count_substring_regex(txt, r"\p{Latin}").cast(pa.int64())
        cyr = pc.count_substring_regex(txt, r"\p{Cyrillic}").cast(pa.int64())
        grk = pc.count_substring_regex(txt, r"\p{Greek}").cast(pa.int64())
        mixed = pc.and_(pc.greater(lat, 0), pc.greater(cyr, 0))
        return pa.table({id_col: t.column(id_col),
                         "n_latin": lat, "n_cyrillic": cyr,
                         "n_greek": grk, "mixed": mixed})

    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def windowed_recapture_flags(ds, window_us: int,
                             key_col: str = "canonical_url",
                             ts_col: str = "warc_ts",
                             id_col: str = "doc_id",
                             n_buckets: int = 64):
    """Time-windowed recapture dedup: flag a capture as
    ``dup_recapture`` when the SAME key (canonical url / content hash)
    was previously captured within ``window_us`` — recrawls inside the
    window are redundant fetches, while a capture beyond it is a
    legitimate refresh that keep-latest dedup would wrongly collapse.

    One bucketed exchange on the key (only ``(key, ts, id)`` ship);
    each bucket lexsorts ``(key, ts, id)`` and takes vectorized
    prev-same-key µs diffs — the lag() window shape.  Requires
    non-null ``ts`` (crawl capture timestamps always exist)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _flag(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.select([id_col, key_col, ts_col]).take(idx)
        keys = g.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = (g.column(ts_col).combine_chunks().cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        n = len(g)
        same = np.zeros(n, bool)
        dup = np.zeros(n, bool)
        if n > 1:
            same[1:] = keys[1:] == keys[:-1]
            dup[1:] = same[1:] & ((ts[1:] - ts[:-1]) <= window_us)
        return pa.table({id_col: g.column(id_col),
                         key_col: g.column(key_col),
                         "dup_recapture": pa.array(dup)})

    return map_groups_via_buckets(ds, [key_col], _flag,
                                  n_buckets=n_buckets)


def extract_anchors(ds, html_col: str = "html", id_col: str = "doc_id",
                    batch_size: int | None = 8192):
    """Like :func:`extract_outlinks` but also captures the ANCHOR TEXT
    — one (id, href, anchor) row per ``<a href="...">text</a>`` in
    document order.  Anchor text is the off-page description signal
    (link-based quality/topic classifiers, site-level spam detection)
    that pure href extraction throws away.  Same vectorized shape: ONE
    split on the anchor prefix, offsets → row ids, one RE2 extract for
    url + text; anchors whose text spans nested tags are skipped (the
    text capture is ``[^<]*``, the same simplification as the title
    extractor)."""
    def _x(t: pa.Table) -> pa.Table:
        h = t.column(html_col).combine_chunks()
        s = h.cast(pa.string())
        ids = t.column(id_col).combine_chunks()
        pieces = pc.split_pattern(pc.fill_null(s, ""), '<a href="')
        if isinstance(pieces, pa.ChunkedArray):
            pieces = pieces.combine_chunks()
        flat = pieces.flatten()
        n = len(pieces)
        counts = np.diff(pieces.offsets.to_numpy(zero_copy_only=False))
        row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        first = np.zeros(len(flat), bool)
        offs = pieces.offsets.to_numpy(zero_copy_only=False)
        first[offs[:-1][counts > 0]] = True
        cand = pc.extract_regex(flat,
                                '^(?P<u>[^"]*)">(?P<t>[^<]*)</a>')
        got = pc.and_(pc.is_valid(cand), pa.array(~first))
        sub = cand.filter(got)
        take_rows = row_idx[got.to_numpy(zero_copy_only=False)]
        return pa.table({
            id_col: ids.take(pa.array(take_rows)),
            "href": pc.struct_field(sub, "u"),
            "anchor": pc.struct_field(sub, "t"),
        })

    return ds.map_batches(_x, batch_format="pyarrow",
                          batch_size=batch_size)


def anchor_text_profile(ds, href_col: str = "href",
                        anchor_col: str = "anchor",
                        batch_size: int | None = 65536) -> pa.Table:
    """(dst_host, anchor, n) profile of what the web CALLS each host —
    per-batch Arrow group_by partials + the driver-bounded merge
    (domain_stats contract; route through ``grouped_sum_via_buckets``
    when the (host, anchor) domain outgrows the driver)."""
    def _dst(t: pa.Table) -> pa.Table:
        return pa.table({"dst_host": href_host(t.column(href_col)),
                         "anchor": t.column(anchor_col)})

    pairs = _pair_counts(ds.map_batches(_dst, batch_format="pyarrow",
                                        batch_size=batch_size),
                         "dst_host", "anchor", batch_size)
    return pairs.rename_columns(["dst_host", "anchor", "n"])


def url_features(ds, url_col: str = "canonical_url",
                 id_col: str = "doc_id",
                 batch_size: int | None = 65536):
    """Structural URL features for quality/spam classifiers (FineWeb-
    class URL filtering): path depth (slash count), query-param count,
    and the host's final label (tld) — one vectorized RE2+Arrow pass
    over the canonical url, shuffle-free.  Null url yields null
    features; a match-less extract yields null (mirrors the twin's
    ``nullif(regexp_extract(...), '')``)."""

    def _f(t: pa.Table) -> pa.Table:
        u = t.column(url_col).combine_chunks()
        if pa.types.is_large_string(u.type):
            u = u.cast(pa.string())
        path = pc.struct_field(
            pc.extract_regex(u, "://[^/?#]*(?P<p>[^?#]*)"), "p")
        depth = pc.count_substring(path, "/").cast(pa.int64())
        q = pc.struct_field(pc.extract_regex(u, r"\?(?P<q>[^#]*)"), "q")
        n_params = pc.if_else(
            pc.is_valid(q),
            pc.add(pc.count_substring(q, "&"), 1).cast(pa.int64()),
            pc.if_else(pc.is_valid(u), pa.scalar(0, pa.int64()),
                       pa.scalar(None, pa.int64())))
        host = pc.struct_field(
            pc.extract_regex(u, "://(?P<h>[^/?#:]*)"), "h")
        tld = pc.struct_field(
            pc.extract_regex(host, r"\.(?P<t>[a-z0-9-]+)$"), "t")
        return pa.table({id_col: t.column(id_col),
                         "path_depth": depth, "n_params": n_params,
                         "tld": tld})

    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def parse_robots(ds, robots_col: str = "robots_txt",
                 host_col: str = "host",
                 batch_size: int | None = 8192):
    """Parse robots.txt payloads into (host, path_prefix) Disallow
    rules for the wildcard agent (``User-agent: *`` groups, including
    multi-agent groups that list ``*``) — the crawl-compliance side
    input every polite pipeline needs.  Robots files number ~one per
    HOST (side-input scale, not corpus scale), so a per-file line scan
    here is not a hot path; the corpus-scale work stays vectorized in
    :func:`apply_robots`.  Empty Disallow values (allow-all markers)
    and non-* groups are dropped; null payloads emit nothing."""

    def _p(t: pa.Table) -> pa.Table:
        hosts_out, prefixes = [], []
        hosts = t.column(host_col).to_pylist()
        texts = t.column(robots_col).to_pylist()
        for host, txt in zip(hosts, texts):
            if not txt:
                continue
            star = False
            in_group_header = True
            for raw in txt.splitlines():
                line = raw.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue
                key, _, val = line.partition(":")
                key = key.strip().lower()
                val = val.strip()
                if key == "user-agent":
                    if in_group_header:
                        star = star or val == "*"
                    else:  # a new group starts
                        star = val == "*"
                        in_group_header = True
                    continue
                in_group_header = False
                if key == "disallow" and star and val:
                    hosts_out.append(host)
                    prefixes.append(val)
        return pa.table({host_col: pa.array(hosts_out, pa.string()),
                         "path_prefix": pa.array(prefixes, pa.string())})

    return ds.map_batches(_p, batch_format="pyarrow",
                          batch_size=batch_size)


def apply_robots(ds, rules: pa.Table, url_col: str = "canonical_url",
                 id_col: str = "doc_id",
                 batch_size: int | None = 65536):
    """Per-page robots verdict: ``blocked`` = the page's path starts
    with any of its host's Disallow prefixes.  All rules compile into
    ONE anchored RE2 alternation over ``host\\x1fpath`` composite
    strings (RE2's DFA keeps large alternations linear-time — the
    blocklist_filter trade; for multi-million-rule tables switch to a
    ray.put per-host prefix dict).  One vectorized regex sweep per
    batch, shuffle-free."""
    import re as _re

    hs = rules.column("host").to_pylist()
    ps = rules.column("path_prefix").to_pylist()
    alts = [_re.escape(h) + "\x1f" + _re.escape(p)
            for h, p in zip(hs, ps) if h is not None and p]
    pat = "^(?:" + "|".join(alts) + ")" if alts else None

    def _f(t: pa.Table) -> pa.Table:
        u = t.column(url_col).combine_chunks()
        if pa.types.is_large_string(u.type):
            u = u.cast(pa.string())
        ex = pc.extract_regex(u, "://(?P<h>[^/?#:]*)(?P<p>[^?#]*)")
        combined = pc.binary_join_element_wise(
            pc.struct_field(ex, "h"), pc.struct_field(ex, "p"), "\x1f")
        if pat is None:
            blocked = pc.and_(pc.is_valid(combined),
                              pa.array(np.zeros(len(t), bool)))
        else:
            blocked = pc.match_substring_regex(combined, pat)
        return pa.table({id_col: t.column(id_col),
                         "blocked": blocked})

    return ds.map_batches(_f, batch_format="pyarrow",
                          batch_size=batch_size)


def resolve_redirects(edges, src_col: str = "src", dst_col: str = "dst",
                      max_hops: int = 64, n_buckets: int = 64,
                      driver_threshold: int = 2_000_000):
    """Resolve every source URL of a redirect map to its terminal
    target by distributed pointer doubling: each round left-joins the
    active pointer table against the full known mapping (active rows
    plus already-finished rows, which act as multi-hop shortcuts), so
    ``cur`` advances by the length of the target's own resolved path
    and a chain of depth d settles in ~ceil(log2 d) bucketed exchanges
    instead of d single steps.

    ``edges`` must be a functional graph — one outgoing edge per
    ``src`` (crawl practice: run keep_latest_capture upstream so a
    re-crawled redirect keeps only its newest target); duplicate
    sources would multiply join rows.  A ``src`` whose walk loops or
    exceeds ``max_hops`` (the crawler redirect-limit convention) is
    flagged, not resolved.

    Scale shape: each round is one hash-bucket exchange shipping
    (url, url, int64) rows only; finished rows leave the ACTIVE (left)
    side immediately and ride the right side only as join shortcuts,
    so the left side shrinks to just the unsettled chains.  The
    pointer table is materialized per round (the BSP iteration
    pattern, same as the distributed PageRank path); nothing larger
    materializes.

    Returns a Dataset ``(src, final_url, hops, is_cycle)`` — one row
    per input edge source; ``final_url``/``hops`` are null when
    ``is_cycle`` (loop or chain deeper than ``max_hops``).

    Hybrid finish (round 5, same trade as
    ``dedup.connected_components``): whenever the ACTIVE pointer set
    is at most ``driver_threshold`` rows (≤ ~32 MB of (url, url,
    int64)), the remaining chains resolve on the driver with one
    memoized O(active) walk instead of paying further ~1 s-floor
    exchange rounds — the walk stays inside the pulled pointer dict
    and needs at most |active| lookups into the already-finished
    shortcut rows (fetched by ONE broadcast-filter pass).  Set
    ``driver_threshold=0`` to force the all-distributed BSP path (the
    forced-threshold driver query does exactly that).
    """
    import math

    from peri_ray.stages.joins import hash_join

    def _init(t: pa.Table) -> pa.Table:
        src = t.column(src_col).combine_chunks()
        if pa.types.is_large_string(src.type):
            src = src.cast(pa.string())
        dst = t.column(dst_col).combine_chunks()
        if pa.types.is_large_string(dst.type):
            dst = dst.cast(pa.string())
        return pa.table({"src": src, "cur": dst,
                         "hops": pa.array(np.ones(t.num_rows, np.int64))})

    active = edges.map_batches(_init, batch_format="pyarrow").materialize()
    finished: list = []

    def _right_of_active(t: pa.Table) -> pa.Table:
        return pa.table({"jsrc": t.column("src"), "jcur": t.column("cur"),
                         "jhops": t.column("hops")})

    def _right_of_finished(t: pa.Table) -> pa.Table:
        return pa.table({"jsrc": t.column("src"),
                         "jcur": t.column("final_url"),
                         "jhops": t.column("hops")})

    def _done_rows(t: pa.Table) -> pa.Table:
        d = t.filter(pc.is_null(t.column("jcur").combine_chunks()))
        return pa.table({"src": d.column("src"),
                         "final_url": d.column("cur"),
                         "hops": d.column("hops"),
                         "is_cycle": pa.array(np.zeros(d.num_rows, bool))})

    def _advance_rows(t: pa.Table) -> pa.Table:
        a = t.filter(pc.is_valid(t.column("jcur").combine_chunks()))
        return pa.table({"src": a.column("src"),
                         "cur": a.column("jcur"),
                         "hops": pc.add(a.column("hops"),
                                        a.column("jhops"))})

    def _finish_on_driver(act, fin_list) -> pa.Table:
        """Memoized O(active) resolution of the remaining chains on
        the driver: walks stay inside the pulled (src → cur, hops)
        dict; the ≤|active| exit pointers that land on already-
        finished srcs are fetched with ONE broadcast-filter pass."""
        import ray

        ptr: dict = {}
        for r in act.take_all():
            ptr[r["src"]] = (r["cur"], int(r["hops"]))
        needed = {cur for cur, _ in ptr.values() if cur not in ptr}
        ext: dict = {}
        if needed and fin_list:
            key_ref = ray.put(pa.array(sorted(needed), pa.string()))

            def _probe(t: pa.Table) -> pa.Table:
                keys = ray.get(key_ref)
                src = t.column("src").combine_chunks()
                if pa.types.is_large_string(src.type):
                    src = src.cast(pa.string())
                sub = t.filter(pc.is_in(src, value_set=keys))
                return sub.select(["src", "final_url", "hops"])

            for f in fin_list:
                for r in f.map_batches(
                        _probe, batch_format="pyarrow").take_all():
                    ext[r["src"]] = (r["final_url"], int(r["hops"]))
        memo: dict = {}  # src -> (final|None, hops|None, is_cycle)
        for s in ptr:
            if s in memo:
                continue
            path: list = []
            onpath: dict = {}
            cur = s
            while True:
                if cur in memo:
                    final, suffix, cyc = memo[cur]
                    break
                if cur not in ptr:
                    if cur in ext:
                        final, suffix = ext[cur]
                    else:
                        final, suffix = cur, 0
                    cyc = False
                    break
                if cur in onpath:  # loop — the whole path feeds it
                    final, suffix, cyc = None, None, True
                    break
                onpath[cur] = True
                path.append(cur)
                cur = ptr[cur][0]
            for node in reversed(path):
                if cyc:
                    memo[node] = (None, None, True)
                else:
                    suffix = ptr[node][1] + suffix
                    memo[node] = (final, suffix, False)
        srcs = list(ptr)
        finals, hopsv, cycv = [], [], []
        for s in srcs:
            f, h, c = memo[s]
            if not c and h > max_hops:  # same cap as _cap below
                f, h, c = None, None, True
            finals.append(f)
            hopsv.append(h)
            cycv.append(c)
        return pa.table({
            "src": pa.array(srcs, pa.string()),
            "final_url": pa.array(finals, pa.string()),
            "hops": pa.array(hopsv, pa.int64()),
            "is_cycle": pa.array(cycv, pa.bool_())})

    driver_rows: pa.Table | None = None
    rounds = max(1, int(math.ceil(math.log2(max(2, max_hops)))) + 1)
    n_active = active.count()
    for _ in range(rounds):
        if n_active == 0:
            break
        if n_active <= driver_threshold:
            driver_rows = _finish_on_driver(active, finished)
            break
        right = active.map_batches(_right_of_active, batch_format="pyarrow")
        for f in finished:
            right = right.union(
                f.map_batches(_right_of_finished, batch_format="pyarrow"))
        joined = hash_join(
            active, right, "cur", "jsrc", ["src", "hops"],
            ["jcur", "jhops"], how="left", n_buckets=n_buckets).materialize()
        done = joined.map_batches(_done_rows,
                                  batch_format="pyarrow").materialize()
        if done.count():
            finished.append(done)
        active = joined.map_batches(_advance_rows,
                                    batch_format="pyarrow").materialize()
        n_active = active.count()

    def _flag_cycles(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"),
                         "final_url": pa.nulls(t.num_rows, pa.string()),
                         "hops": pa.nulls(t.num_rows, pa.int64()),
                         "is_cycle": pa.array(np.ones(t.num_rows, bool))})

    def _cap(t: pa.Table) -> pa.Table:
        # a resolved chain deeper than max_hops is flagged, not
        # resolved — pointer doubling can overshoot the cap (2^rounds
        # >= max_hops), and the flag must match the stated contract
        ok = pc.less_equal(t.column("hops").combine_chunks(),
                           pa.scalar(max_hops, pa.int64()))
        return pa.table({
            "src": t.column("src"),
            "final_url": pc.if_else(ok, t.column("final_url").combine_chunks(),
                                    pa.scalar(None, pa.string())),
            "hops": pc.if_else(ok, t.column("hops").combine_chunks(),
                               pa.scalar(None, pa.int64())),
            "is_cycle": pc.invert(ok)})

    parts = [f.map_batches(_cap, batch_format="pyarrow") for f in finished]
    if driver_rows is not None:
        if driver_rows.num_rows:
            import ray.data as rd

            parts.append(rd.from_arrow(driver_rows))
    elif active.count():
        parts.append(active.map_batches(_flag_cycles,
                                        batch_format="pyarrow"))
    if not parts:
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            [("src", pa.string()), ("final_url", pa.string()),
             ("hops", pa.int64()), ("is_cycle", pa.bool_())]).empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# ---------------------------------------------------------------------------
# main-content extraction (jusText/trafilatura-lite: boilerplate blocks
# are short or link-dense; content blocks are long and link-free)
# ---------------------------------------------------------------------------


def extract_main_content(ds, html_col: str = "html",
                         id_col: str = "doc_id", min_chars: int = 20,
                         batch_size: int | None = 8192):
    """Rule-based main-content extraction from the html binary column:
    split the page into block-level segments (at ``</p>`` / ``</div>``
    close tags), strip tags per segment, and KEEP the segments that
    are link-FREE and at least ``min_chars`` of visible text — the
    jusText-lite block classifier (nav bars, footers and "read more"
    teasers are short or anchor-dense; body prose is neither).
    Output: (id, main_text = kept blocks joined by newline, n_kept,
    n_blocks) per page with non-null html; ``main_text`` is '' when
    nothing qualifies.  Known limitation (documented): a content block
    containing ANY inline anchor is dropped — the link-density
    refinement needs per-anchor text lengths, which stays a rules
    knob, not an architecture change.

    Pure per-batch map, ZERO shuffles at any corpus size: three RE2
    sweeps (split, tag strip, anchor count) + one bincount/gather per
    batch; html never leaves its block."""

    def _main(t: pa.Table) -> pa.Table:
        h = t.column(html_col).combine_chunks()
        sub = t.filter(pc.is_valid(h))
        schema = pa.schema([(id_col, pa.int64()),
                            ("main_text", pa.string()),
                            ("n_kept", pa.int64()),
                            ("n_blocks", pa.int64())])
        if sub.num_rows == 0:
            return schema.empty_table()
        s = sub.column(html_col).combine_chunks().cast(pa.string())
        segs = pc.split_pattern_regex(s, r"</(?:p|div)>")
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        flat = pc.list_flatten(segs)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(segs).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_links = pc.count_substring_regex(flat, r"<a\b").to_numpy(
            zero_copy_only=False)
        visible = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(flat, r"<[^>]*>", ""))
        vlen = pc.utf8_length(visible).to_numpy(zero_copy_only=False)
        is_block = vlen > 0
        keep = is_block & (n_links == 0) & (vlen >= min_chars)
        n = sub.num_rows
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        n_blocks = np.bincount(doc_idx[is_block], minlength=n)
        n_kept = np.bincount(doc_idx[keep], minlength=n)
        kept_vis = visible.filter(pa.array(keep))
        offs = np.concatenate(([0], np.cumsum(n_kept))).astype(np.int64)
        la = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                      kept_vis)
        return pa.table({
            id_col: sub.column(id_col).combine_chunks().cast(pa.int64()),
            "main_text": pc.binary_join(la, "\n"),
            "n_kept": pa.array(n_kept.astype(np.int64)),
            "n_blocks": pa.array(n_blocks.astype(np.int64)),
        })

    return ds.map_batches(_main, batch_format="pyarrow",
                          batch_size=batch_size)


def hill_tail_estimator(degrees: pa.Table, value_col: str = "in_links",
                        k: int = 20) -> pa.Table:
    """Hill estimator of the power-law tail index over a degree table
    — the web-graph health probe (natural link graphs have alpha near
    2-3; link farms flatten the tail).  Uses the top-``k`` order
    statistics d_1 >= … >= d_k: alpha = (k-1) / Σ_{i<k} ln(d_i / d_k),
    ROUND 6 (transcendental-sum convention); null when the top-k are
    all equal (no tail information).  Driver-side fold — the degree
    table is host-bounded by contract (the profiling-operator class)."""
    import math

    vals = sorted(degrees.column(value_col).to_pylist(), reverse=True)
    vals = [v for v in vals if v is not None][:k]
    kk = len(vals)
    if kk < 2:
        return pa.table({"k": pa.array([kk], pa.int64()),
                         "d_k": pa.array([vals[0] if vals else None],
                                         pa.int64()),
                         "alpha": pa.array([None], pa.float64())})
    dk = vals[-1]
    sl = sum(math.log(float(v) / float(dk)) for v in vals[:-1])
    alpha = None if sl == 0 else round(float(kk - 1) / sl, 6)
    return pa.table({"k": pa.array([kk], pa.int64()),
                     "d_k": pa.array([dk], pa.int64()),
                     "alpha": pa.array([alpha], pa.float64())})


def crawl_frontier(ds, html_col: str = "html", host_col: str = "host",
                   n_buckets: int = 64, batch_size: int | None = 8192):
    """Frontier discovery: ``(dst_host, n_links)`` for link-target
    hosts that never appear as a CRAWLED host — the seed list for the
    next crawl round (reference peri has no crawl ops; this derives
    from the north rule's Common-Crawl framing, where the outlink set
    minus the crawled set is the canonical next-fetch queue).

    Shape: anchors → dst hosts as per-batch count partials (the html
    payload never leaves the extract stage); ONE bucketed
    ``(dst_host, cnt)`` sum (target-host cardinality is of the order
    of the crawled-host count at web scale — a driver merge would not
    be bounded); the crawled host set then meets the aggregated
    targets in the hash-bucketed anti-join
    (:func:`peri_ray.stages.checks.referential_violations_shuffled`)
    — no broadcast side, only (host, side) strings cross either
    exchange."""
    from peri_ray.stages.checks import referential_violations_shuffled
    from peri_ray.stages.dedup import grouped_sum_via_buckets

    edges = extract_outlinks(
        ds.map_batches(lambda t: t.select([host_col, html_col]),
                       batch_format="pyarrow"),
        html_col=html_col, id_col=host_col, batch_size=batch_size)

    def _dst_partial(t: pa.Table) -> pa.Table:
        dst = href_host(t.column("href"))
        tt = pa.table({"dst_host": dst}).filter(pc.is_valid(dst))
        g = tt.group_by("dst_host").aggregate([([], "count_all")])
        return g.rename_columns(["dst_host", "n_links"])

    totals = grouped_sum_via_buckets(
        edges.map_batches(_dst_partial, batch_format="pyarrow",
                          batch_size=batch_size),
        ["dst_host"], "n_links", n_buckets=n_buckets)

    def _crawled_partial(t: pa.Table) -> pa.Table:
        # per-batch distinct cuts the dim-side exchange volume; the
        # anti-join re-dedupes per bucket, so duplicates are harmless
        h = t.column(host_col).combine_chunks().unique()
        return pa.table({host_col: h.filter(pc.is_valid(h))})

    crawled = ds.map_batches(_crawled_partial, batch_format="pyarrow",
                             batch_size=batch_size)
    return referential_violations_shuffled(
        totals, "dst_host", crawled, n_buckets=n_buckets,
        columns=["dst_host", "n_links"])


def max_timestamp_us(ds, ts_col: str = "warc_ts") -> int:
    """Corpus max timestamp in epoch µs — one pruned column pass of
    8-byte per-block partials + a driver max (the deterministic 'now'
    anchor for staleness math; wall-clock time would make results
    non-reproducible)."""
    def _m(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).combine_chunks().cast(pa.int64())
        mx = pc.max(ts).as_py()
        return pa.table({"mx": pa.array([mx], pa.int64())})

    vals = [r["mx"] for r in
            ds.map_batches(_m, batch_format="pyarrow").take_all()
            if r["mx"] is not None]
    if not vals:
        raise ValueError(f"max_timestamp_us: no non-null {ts_col!r}")
    return max(vals)


def recrawl_priority(ds, max_ts_us: int, key_col: str = "canonical_url",
                     ts_col: str = "warc_ts", hash_col: str = "content_hash",
                     id_col: str = "doc_id", n_buckets: int = 64):
    """Recrawl scheduling: per canonical URL, how often its content
    CHANGED across past captures and how stale the newest capture is —
    ``priority_num = n_changes · age_us`` (exact BIGINT µs; rate × 
    staleness is the classic change-frequency crawl-ordering signal,
    kept integer so the hash-compared result is layout-independent).

    One bucketed exchange on the url key shipping only
    ``(key, ts, content_hash, id)`` — content itself never crosses
    (hash upstream with ``hash_strings``); each bucket lexsorts
    ``(key, ts, id)`` and reduces runs vectorized (bincount over run
    ids — no per-group Python).  ``max_ts_us`` is the deterministic
    'now' anchor from :func:`max_timestamp_us` (a separate pruned
    ts-only pass; at corpus scale fuse it into the upstream read if
    the double scan matters).  Changes compare consecutive capture
    hashes; a 64-bit collision would undercount by one (~2^-64/pair).
    Returns (key, n_captures, n_changes, age_us, priority_num)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _prio(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.select([key_col, ts_col, hash_col, id_col]).take(idx)
        keys = g.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = (g.column(ts_col).combine_chunks().cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        h = g.column(hash_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        n = len(g)
        starts = np.ones(n, bool)
        starts[1:] = keys[1:] != keys[:-1]
        rid = np.cumsum(starts) - 1
        nruns = int(rid[-1]) + 1 if n else 0
        n_caps = np.bincount(rid, minlength=nruns)
        chg = (~starts[1:]) & (h[1:] != h[:-1])
        n_chg = np.bincount(rid[1:][chg], minlength=nruns)
        ends = np.flatnonzero(np.r_[starts[1:], True])
        age = np.int64(max_ts_us) - ts[ends]
        return pa.table({
            key_col: pa.array(keys[starts]),
            "n_captures": pa.array(n_caps, pa.int64()),
            "n_changes": pa.array(n_chg, pa.int64()),
            "age_us": pa.array(age, pa.int64()),
            "priority_num": pa.array(n_chg.astype(np.int64) * age,
                                     pa.int64()),
        })

    return map_groups_via_buckets(ds, [key_col], _prio,
                                  n_buckets=n_buckets)


def host_capture_gaps(ds, host_col: str = "host",
                      ts_col: str = "warc_ts", id_col: str = "doc_id",
                      n_buckets: int = 64):
    """Per-host inter-capture gap profile — the crawl-politeness /
    scheduling signal: for each host, the count of captures and the
    exact min/max gap (µs) between CONSECUTIVE captures ordered by
    (ts, id).  Hosts with a single capture report null gaps (SQL lag
    parity).  Rows with a null host or ts are excluded.

    ONE host-bucketed exchange of (host, ts_us, id) ints; per bucket a
    whole-bucket lexsort + run-fenced diff — no per-host loop.
    Returns (host, n_captures, min_gap_us, max_gap_us)."""
    from peri_ray.stages.dedup import map_groups_via_buckets

    def _prep(t: pa.Table) -> pa.Table:
        h = t.column(host_col).combine_chunks()
        ts = t.column(ts_col).combine_chunks().cast(pa.int64())
        sub = pa.table({
            "host": h, "ts_us": ts,
            "id": t.column(id_col).combine_chunks().cast(pa.int64()),
        }).filter(pc.and_(pc.is_valid(h), pc.is_valid(ts)))
        return sub

    def _gaps(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # np.concatenate([[False], []]) would
            # fabricate a length-1 mask over zero rows
            return pa.table({
                "host": pa.array([], pa.string()),
                "n_captures": pa.array([], pa.int64()),
                "min_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64())})
        h = g.column("host").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, h))
        h, ts = h[order], ts[order]
        same = np.concatenate([[False], h[1:] == h[:-1]])
        d = np.diff(ts, prepend=ts[:1])  # junk where run starts
        starts = np.flatnonzero(~same)
        counts = np.diff(np.concatenate([starts, [len(h)]]))
        hosts = h[starts]
        # gaps-only array in run order; per-run segments are contiguous,
        # so one reduceat per stat covers every multi-capture host
        g = d[same]
        gcounts = counts - 1
        gstarts = np.concatenate([[0], np.cumsum(gcounts)[:-1]])
        multi = gcounts > 0
        mins = np.full(len(starts), -1, np.int64)
        maxs = np.full(len(starts), -1, np.int64)
        if multi.any():
            rs = gstarts[multi].astype(np.int64)
            mins[multi] = np.minimum.reduceat(g, rs)
            maxs[multi] = np.maximum.reduceat(g, rs)
        return pa.table({
            "host": pa.array(hosts.astype(str), pa.string()),
            "n_captures": pa.array(counts.astype(np.int64)),
            "min_gap_us": pa.array(
                [None if m < 0 else int(m) for m in mins], pa.int64()),
            "max_gap_us": pa.array(
                [None if m < 0 else int(m) for m in maxs], pa.int64()),
        })

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return map_groups_via_buckets(prepped, ["host"], _gaps,
                                  n_buckets=n_buckets)
