"""Tests for the web-corpus operators (stages/web.py): URL
canonicalization rules, host extraction, keep-latest recrawl dedup
(incl. timestamp ties), and the per-domain profile."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


SF = "/root/testdata/sf0.001"


def _canon(urls):
    """Canonicalize a list of raw URLs through the Dataset stage."""
    from peri_ray.stages.web import canonicalize_urls

    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = canonicalize_urls(ds).take_all()
    by_url = {}
    for row in out:
        by_url.setdefault(row["url"], row["canonical_url"])
    return [by_url.get(u) for u in urls]


class TestCanonicalizeUrls:
    def test_each_rule(self):
        cases = {
            # scheme + host lowercase; path case preserved
            "HTTP://ExAmPle.COM/Path": "http://example.com/Path",
            # default ports stripped per scheme only
            "http://a.com:80/x": "http://a.com/x",
            "https://a.com:443/x": "https://a.com/x",
            "http://a.com:8080/x": "http://a.com:8080/x",
            "https://a.com:80/x": "https://a.com:80/x",
            # www. (one label only), fragment, trailing slashes
            "https://www.a.com/x///#frag": "https://a.com/x",
            "http://wwwx.a.com/": "http://wwwx.a.com/",
            # empty path -> '/'
            "http://a.com": "http://a.com/",
            "http://a.com#f": "http://a.com/",
            # tracking params dropped, others sorted; '?' dropped if empty
            "http://a.com/p?utm_source=x&b=2&a=1": "http://a.com/p?a=1&b=2",
            "http://a.com/p?utm_source=x&utm_medium=y": "http://a.com/p",
            "http://a.com/p?": "http://a.com/p",
            # empty params ('&&') dropped
            "http://a.com/p?a=1&&b=2": "http://a.com/p?a=1&b=2",
        }
        got = _canon(list(cases))
        for (raw, want), g in zip(cases.items(), got):
            assert g == want, f"{raw!r}: {g!r} != {want!r}"

    def test_non_url_and_null_are_null(self):
        from peri_ray.stages.web import canonicalize_urls

        ds = rd.from_arrow(pa.table(
            {"url": pa.array(["not a url", None, "ftp://f.com/x"],
                             pa.string())}))
        out = {r["url"]: r["canonical_url"]
               for r in canonicalize_urls(ds).take_all()}
        assert out["not a url"] is None
        assert out[None] is None
        # non-http scheme still canonicalizes (no default port to strip)
        assert out["ftp://f.com/x"] == "ftp://f.com/x"

    def test_idempotent(self):
        raws = ["HTTP://WWW.A.COM:80/x/?utm_a=1&z=2&b=3#f",
                "https://b.org", "http://c.net/p?x=1"]
        once = _canon(raws)
        twice = _canon(once)
        assert once == twice

    def test_custom_drop_prefixes(self):
        from peri_ray.stages.web import canonicalize_urls

        ds = rd.from_arrow(pa.table(
            {"url": pa.array(["http://a.com/p?fbclid=1&x=2"], pa.string())}))
        out = canonicalize_urls(
            ds, drop_param_prefixes=("utm_", "fbclid")).take_all()
        assert out[0]["canonical_url"] == "http://a.com/p?x=2"


class TestHostOf:
    def test_host_extraction(self):
        from peri_ray.stages.web import canonicalize_urls, host_of

        ds = rd.from_arrow(pa.table(
            {"url": pa.array(["https://WWW.A.com:443/x?q=1", "bad"],
                             pa.string())}))
        out = {r["url"]: r["host"]
               for r in host_of(canonicalize_urls(ds)).take_all()}
        assert out["https://WWW.A.com:443/x?q=1"] == "a.com"
        assert out["bad"] is None


class TestKeepLatestCapture:
    def test_newest_wins_and_tie_breaks_by_id(self):
        from peri_ray.stages.web import keep_latest_capture

        us = pa.timestamp("us")
        t = pa.table({
            "canonical_url": pa.array(
                ["u1", "u1", "u1", "u2", "u2", "u3"], pa.string()),
            "doc_id": pa.array([5, 3, 9, 7, 2, 1], pa.int64()),
            "warc_ts": pa.array([100, 300, 200, 50, 50, 10], us),
        })
        out = keep_latest_capture(
            rd.from_arrow(t).repartition(3)).take_all()
        got = {r["canonical_url"]: (r["doc_id"], r["warc_ts"]) for r in out}
        assert len(out) == 3
        assert got["u1"][0] == 3          # newest ts=300
        assert got["u2"][0] == 2          # ts tie 50/50 -> smaller id
        assert got["u3"][0] == 1

    def test_fixture_collisions_resolved(self):
        from peri_ray.pipelines.queries import latest_crawl_per_url

        out = latest_crawl_per_url(SF).take_all()
        # ids 4g..4g+3 share host+path; even pair collides for
        # g%3==2, odd pair for g%3==1 -> 83 victims in 500 docs
        assert len(out) == 417
        urls = [r["canonical_url"] for r in out]
        assert len(set(urls)) == len(urls)


class TestDomainStats:
    def test_matches_brute_force(self):
        from peri_ray.pipelines.queries import (_attach_web_columns,
                                                domain_stats_docs)
        import pyarrow.parquet as pq

        got = domain_stats_docs(SF)
        t = _attach_web_columns(pq.read_table(
            f"{SF}/documents.parquet",
            columns=["doc_id", "source", "lang", "n_chars"]))
        ids = t.column("doc_id").to_numpy()
        hosts = np.char.add(
            np.char.add("h", ((ids // 4) % 50).astype(str)), ".example.com")
        langs = [x if x is not None else ""
                 for x in t.column("lang").to_pylist()]
        chars = [x or 0 for x in t.column("n_chars").to_pylist()]
        want = {}
        for h, l, c in zip(hosts, langs, chars):
            n, ls, s = want.get(h, (0, set(), 0))
            want[h] = (n + 1, ls | {l}, s + c)
        assert got.num_rows == len(want)
        for r in got.to_pylist():
            n, ls, s = want[r["host"]]
            assert (r["n_pages"], r["n_langs"], r["sum_chars"]) == \
                (n, len(ls), s)


class TestDsir:
    def _mask(self, col):
        import pyarrow.compute as pc

        def f(t):
            return pc.equal(pc.fill_null(
                t.column(col).combine_chunks().cast(pa.string()), ""), "en")
        return f

    def _corpus(self):
        # en docs say "cat dog", fr docs say "chat chien"; one mixed
        return pa.table({
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": pa.array(["cat dog cat", "dog cat", "cat",
                              "chat chien", "chien chat chat",
                              "cat chat", None], pa.string()),
            "lang": pa.array(["en", "en", "en", "fr", "fr", "fr", "en"],
                             pa.string()),
        })

    def test_weights_match_brute_force(self):
        import math

        from peri_ray.stages.text import dsir_weights

        t = self._corpus()
        out = {r["doc_id"]: r for r in dsir_weights(
            rd.from_arrow(t).repartition(3), self._mask("lang")).take_all()}
        # brute force: union vocab over non-null texts
        toks = {i: t.column("text")[i].as_py().split()
                for i in range(6)}
        vocab = sorted({w for ws in toks.values() for ws in [ws] for w in ws})
        n_raw = {w: sum(ws.count(w) for ws in toks.values()) for w in vocab}
        n_tgt = {w: sum(ws.count(w) for i, ws in toks.items()
                        if t.column("lang")[i].as_py() == "en")
                 for w in vocab}
        v, t_raw, t_tgt = len(vocab), sum(n_raw.values()), sum(n_tgt.values())
        qd = {w: round(1e6 * (math.log((n_tgt[w] + 1.0) / (t_tgt + v))
                              - math.log((n_raw[w] + 1.0) / (t_raw + v))))
              for w in vocab}
        for i, ws in toks.items():
            assert out[i]["weight_micro"] == sum(qd[w] for w in ws), i
            assert out[i]["n_tokens"] == len(ws)
        assert out[6]["weight_micro"] is None and out[6]["n_tokens"] == 0
        # directionality: pure-en docs weigh more than pure-fr docs
        assert min(out[i]["weight_micro"] for i in (0, 1, 2)) > \
            max(out[i]["weight_micro"] for i in (3, 4))

    def test_max_vocab_tail_is_neutral(self):
        from peri_ray.stages.text import dsir_weights

        t = self._corpus()
        full = {r["doc_id"]: r["weight_micro"] for r in dsir_weights(
            rd.from_arrow(t), self._mask("lang")).take_all()}
        # cap to 2 terms: 'cat' (n_raw=5) and 'chat' (n_raw=4) survive
        capped = {r["doc_id"]: r["weight_micro"] for r in dsir_weights(
            rd.from_arrow(t), self._mask("lang"), max_vocab=2).take_all()}
        assert capped != full
        # doc 5 = "cat chat": both terms kept, so capped == full there
        assert capped[5] == full[5]
        # doc 2 = "cat": single kept term, unchanged
        assert capped[2] == full[2]

    def test_top_docs_rank(self):
        from peri_ray.stages.text import dsir_top_docs

        t = self._corpus()
        top = dsir_top_docs(rd.from_arrow(t).repartition(4),
                            self._mask("lang"), k=3)
        assert top.column("rank").to_pylist() == [1, 2, 3]
        w = top.column("weight_micro").to_pylist()
        assert w == sorted(w, reverse=True)
        assert set(top.column("doc_id").to_pylist()) <= {0, 1, 2}


class TestExtractionInvariant:
    def test_extract_and_mismatches(self):
        from peri_ray.stages.web import (extract_text_from_html,
                                         extraction_mismatches)

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["hello world", "a b", None, "x", "multi\nline"],
                             pa.string()),
            "html": pa.array(
                [b"<html><head><title>d0</title></head><body><p>hello world</p></body></html>",
                 b"<html><body><p>a bX</p></body></html>",   # corrupted
                 None,                                        # both null -> ok
                 b"<html><body>no paragraph</body></html>",   # no match -> null
                 b"<p>multi\nline</p>"],                      # newline inside
                pa.binary()),
        })
        ds = rd.from_arrow(t).repartition(2)
        got = {r["doc_id"]: r["extracted_text"]
               for r in extract_text_from_html(ds).take_all()}
        assert got[0] == "hello world"
        assert got[1] == "a bX"
        assert got[2] is None
        assert got[3] is None
        assert got[4] == "multi\nline"  # (?s) covers newlines

        bad = {r["doc_id"]: r
               for r in extraction_mismatches(rd.from_arrow(t)).take_all()}
        # 1: corrupted; 3: one-sided null (text set, no extraction)
        assert set(bad) == {1, 3}
        assert bad[1]["n_text"] == 3 and bad[1]["n_extracted"] == 4
        assert bad[3]["n_text"] == 1 and bad[3]["n_extracted"] is None

    def test_first_p_tag_wins(self):
        from peri_ray.generate import extract_text
        from peri_ray.stages.web import extract_text_from_html

        html = b"<html><p>first</p><p>second</p></html>"
        ds = rd.from_arrow(pa.table({"html": pa.array([html], pa.binary())}))
        got = extract_text_from_html(ds).take_all()[0]["extracted_text"]
        assert got == "first" == extract_text(html)


class TestHostQuota:
    def test_cap_and_ties(self):
        from peri_ray.stages.web import host_quota

        t = pa.table({
            "host": pa.array(["a", "a", "a", "a", "b", "b"], pa.string()),
            "doc_id": pa.array([10, 11, 12, 13, 20, 21], pa.int64()),
            "n_chars": pa.array([5, 9, 9, 1, 3, 3], pa.int64()),
        })
        out = host_quota(rd.from_arrow(t).repartition(3), k=2).take_all()
        kept = sorted(r["doc_id"] for r in out)
        # host a: 11,12 (n=9,9 tie -> smaller ids), host b: both
        assert kept == [11, 12, 20, 21]


class TestBlocklist:
    def _t(self):
        return pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "host": pa.array(["bad.com", "sub.bad.com", "notbad.com",
                              "ok.org", None], pa.string()),
            "url": pa.array(["https://bad.com/", "https://sub.bad.com/",
                             "https://notbad.com/?utm_source=x",
                             "https://ok.org/", "https://x.y/"],
                            pa.string()),
        })

    def test_keep_and_report(self):
        from peri_ray.stages.web import blocklist_filter

        ds = rd.from_arrow(self._t()).repartition(2)
        kept = blocklist_filter(ds, ["bad.com"], [r"[?&]utm_"]).take_all()
        assert sorted(r["doc_id"] for r in kept) == [3, 4]
        rep = {r["doc_id"]: r["rule"]
               for r in blocklist_filter(ds, ["bad.com"], [r"[?&]utm_"],
                                         report=True).take_all()}
        # exact host and subdomain both 'blocked_host'; notbad.com is
        # NOT a subdomain of bad.com (suffix anchor includes the dot)
        assert rep == {0: "blocked_host", 1: "blocked_host",
                       2: "url_pattern"}

    def test_empty_lists_keep_everything(self):
        from peri_ray.stages.web import blocklist_filter

        ds = rd.from_arrow(self._t())
        assert len(blocklist_filter(ds, [], []).take_all()) == 5
        assert blocklist_filter(ds, [], [], report=True).take_all() == []


class TestPplBuckets:
    def _corpus(self):
        # doc 0-1: common words (low NLL); 2-3: mixed; 4-5 rare words
        texts = ["the the the the", "the the the of",
                 "the of rare1 the", "of of rare2 the",
                 "rare3 rare4 rare5 rare6", "rare7 rare8 rare9 rare1",
                 None]
        return pa.table({
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    def test_micro_scores_match_brute_force(self):
        import math

        from peri_ray.stages.text import unigram_nll_micro

        t = self._corpus()
        out = {r["doc_id"]: r for r in unigram_nll_micro(
            rd.from_arrow(t).repartition(3)).take_all()}
        toks = {i: t.column("text")[i].as_py().split() for i in range(6)}
        allw = [w for ws in toks.values() for w in ws]
        total = len(allw)
        for i, ws in toks.items():
            want = sum(round(-math.log(allw.count(w) / total) * 1e6)
                       for w in ws)
            assert out[i]["nll_micro"] == want, i
            assert out[i]["n_tokens"] == len(ws)
        assert out[6]["nll_micro"] is None and out[6]["n_tokens"] == 0

    def test_buckets_thirds(self):
        from peri_ray.stages.text import ppl_buckets

        t = self._corpus()
        out = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(
            rd.from_arrow(t).repartition(4)).take_all()}
        assert out[6] is None
        # 6 scored docs -> ranks: 2 head, 2 middle, 2 tail by fluency
        assert [out[i] for i in range(6)] == \
            ["head", "head", "middle", "middle", "tail", "tail"]

    def test_max_vocab_oov(self):
        from peri_ray.stages.text import unigram_nll_micro

        t = self._corpus()
        full = {r["doc_id"]: r["nll_micro"] for r in unigram_nll_micro(
            rd.from_arrow(t)).take_all()}
        capped = {r["doc_id"]: r["nll_micro"] for r in unigram_nll_micro(
            rd.from_arrow(t), max_vocab=2).take_all()}
        # 'the' (8) and 'of' (5) survive; doc 0 is all-'the' -> unchanged
        assert capped[0] == full[0]
        # count-1 OOV words score IDENTICALLY under oov_count=1 (the
        # pseudo-count equals their true count) ...
        assert capped[4] == full[4]
        # ... but 'rare1' (count 2, truncated) now scores as count-1
        # OOV, so docs 2 and 5 shift
        assert capped[2] != full[2] and capped[5] != full[5]


class TestOutlinks:
    def _extract(self, htmls, ids=None):
        from peri_ray.stages.web import extract_outlinks

        ids = ids or list(range(len(htmls)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "html": pa.array(
                          [h.encode() if h is not None else None
                           for h in htmls], pa.binary())})
        rows = extract_outlinks(rd.from_arrow(t)).take_all()
        out = {}
        for r in rows:
            out.setdefault(r["doc_id"], []).append(r["href"])
        return out

    def test_multi_anchor_order_and_edges(self):
        out = self._extract([
            '<p>no links</p>',
            '<a href="http://a.com/x">1</a> mid <a href="https://b.com/">2</a>',
            None,
            '<a href="">empty</a>',
            'text with "quotes" but no anchors',
        ])
        assert 0 not in out and 2 not in out and 4 not in out
        assert sorted(out[1]) == ["http://a.com/x", "https://b.com/"]
        assert out[3] == [""]

    def test_unterminated_href_dropped(self):
        # an anchor whose href has no closing quote must not emit
        out = self._extract(['<a href="http://a.com/x>broken</a>'])
        assert out == {}

    def test_host_counts(self):
        from peri_ray.stages.web import extract_outlinks, outlink_host_counts

        t = pa.table({
            "host": pa.array(["s1.com", "s1.com", "s2.com"]),
            "html": pa.array([
                b'<a href="http://D.com/a">x</a><a href="http://d.com/b">y</a>',
                b'<a href="http://d.com/c">z</a>',
                b'<a href="not-a-url">w</a>',
            ], pa.binary()),
        })
        edges = extract_outlinks(rd.from_arrow(t), id_col="host")
        out = outlink_host_counts(edges).to_pylist()
        # unparsable href drops; host case is NOT normalized here
        # (canonicalize the hrefs first when case-folding matters)
        assert {(r["src_host"], r["dst_host"]): r["n_links"]
                for r in out} == {("s1.com", "D.com"): 1,
                                  ("s1.com", "d.com"): 2}


class TestHostCrawlGaps:
    def test_string_key_and_exact_gaps(self):
        from peri_ray.stages.temporal import interarrival_stats

        ts = pa.array([1_000_000, 4_000_000, 2_000_000, 7_000_000,
                       5_000_000], pa.timestamp("us"))
        t = pa.table({"host": pa.array(["a", "a", "a", "b", "b"]),
                      "warc_ts": ts})
        out = {r["host"]: r for r in interarrival_stats(
            rd.from_arrow(t), ts_col="warc_ts",
            user_col="host").take_all()}
        assert out["a"]["n_gaps"] == 2
        assert out["a"]["sum_gap_us"] == 3_000_000
        assert out["a"]["max_gap_us"] == 2_000_000
        assert out["b"]["n_gaps"] == 1
        assert out["b"]["sum_gap_us"] == 2_000_000


class TestDomainBoilerplate:
    def test_within_domain_df_only(self):
        from peri_ray.stages.dedup import domain_boilerplate_victims

        # 'shared' appears once per host across 4 hosts (global df 4)
        # but never reaches min_df=2 WITHIN a host; 'tmpl-a' repeats
        # inside host a only.
        rows = []
        for h in "abcd":
            rows.append((ord(h), h, f"unique {h}\nshared"))
        rows.append((100, "a", "x\ntmpl-a"))
        rows.append((101, "a", "y\ntmpl-a"))
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "host": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
        })
        out = domain_boilerplate_victims(rd.from_arrow(t), min_df=2,
                                         group_col="host").take_all()
        got = sorted((r["doc_id"], r["idx"]) for r in out)
        # only the tmpl-a occurrences (line 2 of docs 100/101)
        assert got == [(100, 2), (101, 2)]

    def test_null_text_and_min_df_one(self):
        from peri_ray.stages.dedup import domain_boilerplate_victims

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "host": pa.array(["a", "a"]),
            "text": pa.array(["only", None]),
        })
        out = domain_boilerplate_victims(rd.from_arrow(t), min_df=1,
                                         group_col="host").take_all()
        assert [(r["doc_id"], r["idx"]) for r in out] == [(1, 1)]


class TestExtractTitle:
    def test_title_edges(self):
        from peri_ray.stages.web import extract_title

        t = pa.table({"html": pa.array(
            [b"<html><title>Hello</title></html>",
             b"<title>a</title><title>b</title>",  # first wins
             b"no title here",
             None,
             b"<title>multi\nline</title>"], pa.binary())})
        out = [r["title"] for r in
               extract_title(rd.from_arrow(t)).take_all()]
        assert out == ["Hello", "a", None, None, "multi\nline"]


class TestWebPrepGates:
    def _run(self, rows, blocked=("bad.com",), patterns=(), k=2):
        from peri_ray.stages.web import web_prep_gates

        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "canonical_url": pa.array([r[1] for r in rows]),
            "url": pa.array([r[1] for r in rows]),
            "host": pa.array([r[2] for r in rows]),
            "warc_ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        })
        out = web_prep_gates(rd.from_arrow(t), list(blocked),
                             list(patterns), quota_k=k).take_all()
        return {r["doc_id"]: r["gate"] for r in out}

    def test_gate_precedence_and_quota(self):
        rows = [
            # url u1 captured twice: id 2 newer wins, id 1 recrawl_dup
            (1, "http://a.com/u1", "a.com", 1000, 50),
            (2, "http://a.com/u1", "a.com", 2000, 40),
            # blocked host (also a dup — recrawl wins precedence for
            # the OLDER capture, blocked for the newest)
            (3, "http://bad.com/x", "bad.com", 1000, 99),
            (4, "http://bad.com/x", "bad.com", 2000, 98),
            # quota k=2 on host a.com: 2 survives + these three
            (5, "http://a.com/u2", "a.com", 1000, 90),
            (6, "http://a.com/u3", "a.com", 1000, 80),
            (7, "http://a.com/u4", "a.com", 1000, 10),
        ]
        g = self._run(rows)
        assert g[1] == "recrawl_dup" and g[3] == "recrawl_dup"
        assert g[4] == "blocked"
        # eligible on a.com by n_chars desc: 5(90), 6(80), 2(40), 7(10)
        assert g[5] == "kept" and g[6] == "kept"
        assert g[2] == "quota" and g[7] == "quota"
        assert len(g) == len(rows)  # every page gets exactly one verdict

    def test_ts_tie_smallest_id_wins(self):
        rows = [(10, "http://t.com/u", "t.com", 500, 1),
                (11, "http://t.com/u", "t.com", 500, 1)]
        g = self._run(rows, blocked=(), k=5)
        assert g[10] == "kept" and g[11] == "recrawl_dup"

    def test_hot_host_skew(self):
        # one host floods the input: still exactly k kept, rest quota
        rows = [(i, f"http://hot.com/p{i}", "hot.com", 100 + i, i % 7)
                for i in range(500)]
        g = self._run(rows, blocked=(), k=3)
        vals = list(g.values())
        assert vals.count("kept") == 3 and vals.count("quota") == 497


class TestCanonicalizeFuzz:
    """Hypothesis fuzz of the vectorized canonicalizer against an
    independent per-row Python reference implementing the same six
    documented rules (structured URL generation over an ASCII
    alphabet — regex-semantics edge cases like newlines are out of
    the URL grammar by construction)."""

    @staticmethod
    def _ref(url):
        import re

        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$",
                     url)
        if not m:
            return None
        scheme, host, path, rest = m.groups()
        scheme, host = scheme.lower(), host.lower()
        if scheme == "http":
            host = re.sub(r":80$", "", host)
        elif scheme == "https":
            host = re.sub(r":443$", "", host)
        host = re.sub(r"^www\.", "", host)
        path = re.sub(r"/+$", "", path) or "/"
        query = re.sub(r"#.*$", "", rest)
        query = re.sub(r"^\?", "", query)
        params = sorted(p for p in query.split("&")
                        if p and not p.startswith("utm_"))
        q = ("?" + "&".join(params)) if params else ""
        return f"{scheme}://{host}{path}{q}"

    def test_fuzz_against_reference(self):
        from hypothesis import given, settings, strategies as st

        label = st.text(alphabet="abcXYZ09-", min_size=1, max_size=6)
        scheme = st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"])
        host = st.builds(
            lambda www, labs, port: www + ".".join(labs) + port,
            st.sampled_from(["", "www.", "WWW."]),
            st.lists(label, min_size=1, max_size=3),
            st.sampled_from(["", ":80", ":443", ":8080"]))
        path = st.builds(
            lambda segs, tail: ("/" + "/".join(segs) if segs else "") + tail,
            st.lists(label, min_size=0, max_size=3),
            st.sampled_from(["", "/", "//", "///"]))
        param = st.one_of(
            st.builds(lambda k, v: f"{k}={v}", label, label),
            st.builds(lambda v: f"utm_{v}=x", label),
            st.just(""))
        query = st.builds(
            lambda ps: "?" + "&".join(ps) if ps else "",
            st.lists(param, min_size=0, max_size=4))
        frag = st.sampled_from(["", "#sec", "#a#b"])
        url = st.one_of(
            st.builds(lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
                      scheme, host, path, query, frag),
            st.just("not a url"),
            st.just(""),
            label)

        @settings(max_examples=60, deadline=None)
        @given(st.lists(url, min_size=1, max_size=40))
        def run(urls):
            got = _canon(urls)
            want = [self._ref(u) for u in urls]
            assert got == want

        run()


class TestWarcSource:
    def _records(self, n=20):
        return [(f"https://h{i % 5}.example.com/p/{i}",
                 1_700_000_000_000_000 + i * 1_000_000,
                 f"<html><p>doc {i}</p></html>".encode())
                for i in range(n)]

    def _roundtrip(self, tmpdir, gz):
        import os
        from peri_ray.sources.warc import read_warc, write_warc

        recs = self._records()
        path = os.path.join(tmpdir, "seg.warc" + (".gz" if gz else ""))
        write_warc(recs, path, gzip_members=gz)
        rows = read_warc(path).take_all()
        got = sorted((r["url"],
                      int(r["warc_ts"].timestamp() * 1e6)
                      if hasattr(r["warc_ts"], "timestamp")
                      else int(r["warc_ts"]),
                      bytes(r["html"])) for r in rows)
        assert got == sorted(recs)

    def test_roundtrip_plain(self, tmp_path):
        self._roundtrip(str(tmp_path), gz=False)

    def test_roundtrip_gzip_members(self, tmp_path):
        self._roundtrip(str(tmp_path), gz=True)

    def test_non_response_records_skipped_and_truncation(self):
        from peri_ray.sources.warc import parse_warc_bytes, write_warc
        import io, os, tempfile

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "x.warc")
            write_warc([("http://a.com/1", 1_700_000_000_000_000,
                         b"<p>x</p>")], p)
            data = open(p, "rb").read()
        req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: http://a.com/1\r\n"
               b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
        # request record before, truncated garbage after
        blob = req + data + b"WARC/1.0\r\nWARC-Type: response\r\ntrunc"
        out = parse_warc_bytes(blob)
        assert len(out) == 1 and out[0][0] == "http://a.com/1"
        assert out[0][2] == b"<p>x</p>"

    def test_multi_file_pipeline_into_engine(self, tmp_path):
        """WARC segments -> read_warc -> canonicalize/host: the
        Common-Crawl front door feeds the web operators directly."""
        from peri_ray.sources.warc import write_warc, read_warc
        from peri_ray.stages.web import canonicalize_urls, host_of

        p1 = str(tmp_path / "a.warc")
        p2 = str(tmp_path / "b.warc.gz")
        write_warc(self._records(10), p1)
        write_warc(self._records(10), p2, gzip_members=True)
        ds = host_of(canonicalize_urls(read_warc([p1, p2])))
        rows = ds.take_all()
        assert len(rows) == 20
        assert all(r["host"].startswith("h") for r in rows)


class TestWarcEdges:
    def test_subsecond_timestamps_roundtrip(self, tmp_path):
        from peri_ray.sources.warc import read_warc, write_warc

        recs = [("http://a.com/x", 1_700_000_000_123_456, b"<p>y</p>")]
        p = str(tmp_path / "sub.warc")
        write_warc(recs, p)
        r = read_warc(p).take_all()[0]
        ts = r["warc_ts"]
        got = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") \
            else int(ts)
        assert got == 1_700_000_000_123_456

    def test_truncated_body_dropped(self):
        from peri_ray.sources.warc import parse_warc_bytes

        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://a.com/1\r\n"
               b"Content-Length: 999\r\n\r\nHTTP/1.1 200 OK\r\n\r\nshort")
        assert parse_warc_bytes(rec) == []


class TestJunkPages:
    def _flags(self, texts):
        from peri_ray.stages.web import junk_page_flags

        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = junk_page_flags(rd.from_arrow(t)).take_all()
        return [r["junk_rule"] for r in
                sorted(out, key=lambda r: r["doc_id"])]

    def test_rules_and_precedence(self):
        got = self._flags([
            "a perfectly fine content page",
            "Error 404 Page Not Found",
            "please Sign In to continue reading",
            "You must enable JavaScript to view this site",
            "this DOMAIN IS FOR SALE — enquire within",
            # matches soft404 AND js_required: first rule wins
            "404 not found. Enable JavaScript.",
            None,
        ])
        assert got == [None, "soft404", "login_wall", "js_required",
                       "parked", "soft404", None]


class TestEncodingQuality:
    def test_signals(self):
        from peri_ray.stages.web import encoding_quality_report

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "clean ascii text",
                "cafÃ© double-encoded twice cafÃ©",
                "bad byte \x07 and �� here",
                None,
                "tabs\tand\nnewlines are fine",
            ], pa.string()),
        })
        out = {r["doc_id"]: r for r in
               encoding_quality_report(rd.from_arrow(t)).take_all()}
        assert (out[0]["n_repl"], out[0]["n_ctrl"], out[0]["n_double"],
                out[0]["mojibake"]) == (0, 0, 0, False)
        assert out[1]["n_double"] == 2 and out[1]["mojibake"]
        assert (out[2]["n_repl"], out[2]["n_ctrl"]) == (2, 1)
        assert out[3]["mojibake"] is None
        assert (out[4]["n_ctrl"], out[4]["mojibake"]) == (0, False)

    def test_script_mix(self):
        from peri_ray.stages.web import script_mix_report

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "latin only words",
                "latin плюс кириллица",
                "µόνο ελληνικά",
                None,
            ], pa.string()),
        })
        out = {r["doc_id"]: r for r in
               script_mix_report(rd.from_arrow(t)).take_all()}
        assert out[0]["n_latin"] > 0 and out[0]["n_cyrillic"] == 0
        assert not out[0]["mixed"]
        assert out[1]["mixed"] and out[1]["n_cyrillic"] == 13
        assert out[2]["n_greek"] > 0 and not out[2]["mixed"]
        assert out[3]["mixed"] is None


class TestWindowedRecapture:
    def test_window_boundary_and_keys(self):
        from peri_ray.stages.web import windowed_recapture_flags

        day = 86_400_000_000
        rows = [
            # url A: captures at day 0, 5, 100 — second within the
            # 10-day window of the first, third beyond the second
            {"doc_id": 1, "u": "a", "ts": 0},
            {"doc_id": 2, "u": "a", "ts": 5 * day},
            {"doc_id": 3, "u": "a", "ts": 100 * day},
            # url B: exactly AT the window (<=) and a same-ts tie
            {"doc_id": 4, "u": "b", "ts": 0},
            {"doc_id": 5, "u": "b", "ts": 10 * day},
            {"doc_id": 6, "u": "b", "ts": 10 * day},
            # url C: single capture
            {"doc_id": 7, "u": "c", "ts": 3 * day},
        ]
        t = pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "canonical_url": pa.array([r["u"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["ts"] for r in rows],
                                pa.timestamp("us")),
        })
        out = {r["doc_id"]: r["dup_recapture"]
               for r in windowed_recapture_flags(
                   rd.from_arrow(t), window_us=10 * day).take_all()}
        assert out == {1: False, 2: True, 3: False,
                       4: False, 5: True, 6: True, 7: False}


class TestExtractAnchors:
    def test_anchor_text_and_edge_cases(self):
        from peri_ray.stages.web import anchor_text_profile, extract_anchors

        html = [
            '<p>pre</p><a href="http://x.com/a">first link</a> mid '
            '<a href="https://y.org/b?q=1">second</a> post',
            '<a href="http://x.com/c"><b>nested skipped</b></a>'
            '<a href="http://x.com/d">kept</a>',
            "no anchors at all",
            None,
        ]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "html": pa.array(
                          [h.encode() if h else None for h in html],
                          pa.binary())})
        rows = extract_anchors(rd.from_arrow(t)).take_all()
        got = sorted((r["doc_id"], r["href"], r["anchor"]) for r in rows)
        assert got == [
            (0, "http://x.com/a", "first link"),
            (0, "https://y.org/b?q=1", "second"),
            (1, "http://x.com/d", "kept"),
        ]
        prof = anchor_text_profile(extract_anchors(rd.from_arrow(t)))
        assert sorted(zip(prof.column("dst_host").to_pylist(),
                          prof.column("anchor").to_pylist(),
                          prof.column("n").to_pylist())) == [
            ("x.com", "first link", 1), ("x.com", "kept", 1),
            ("y.org", "second", 1)]


class TestUrlFeatures:
    def test_features(self):
        from peri_ray.stages.web import url_features

        urls = [
            "https://a.example.com/x/y/z?p=1&q=2",
            "http://b.io/",
            "http://c.net",          # no path at all
            "https://d.co/idx?single=1",
            None,
        ]
        t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "canonical_url": pa.array(urls, pa.string())})
        out = {r["doc_id"]: r for r in
               url_features(rd.from_arrow(t)).take_all()}
        assert (out[0]["path_depth"], out[0]["n_params"],
                out[0]["tld"]) == (3, 2, "com")
        assert (out[1]["path_depth"], out[1]["n_params"],
                out[1]["tld"]) == (1, 0, "io")
        assert (out[2]["path_depth"], out[2]["n_params"],
                out[2]["tld"]) == (0, 0, "net")
        assert out[3]["n_params"] == 1
        assert out[4]["path_depth"] is None and out[4]["tld"] is None


class TestRangeLookup:
    def test_gaps_overlap_and_nulls(self):
        from peri_ray.stages.joins import broadcast_range_lookup

        ranges = pa.table({"lo": pa.array([0, 100], pa.int64()),
                           "hi": pa.array([9, 199], pa.int64()),
                           "tag": pa.array(["a", "b"], pa.string())})
        t = pa.table({"k": pa.array([5, 9, 10, 100, 199, 200, None],
                                    pa.int64())})
        out = [r["tag"] for r in sorted(
            broadcast_range_lookup(rd.from_arrow(t), ranges, "k")
            .take_all(), key=lambda r: (r["k"] is None, r["k"]))]
        assert out == ["a", "a", None, "b", "b", None, None]

        bad = pa.table({"lo": pa.array([0, 5], pa.int64()),
                        "hi": pa.array([9, 19], pa.int64()),
                        "tag": pa.array(["a", "b"], pa.string())})
        with pytest.raises(ValueError, match="overlapping"):
            broadcast_range_lookup(rd.from_arrow(t), bad, "k")


class TestRobots:
    def test_parse_groups_and_apply(self):
        from peri_ray.stages.web import apply_robots, parse_robots

        robots = pa.table({
            "host": pa.array(["a.com", "b.com", "c.com"], pa.string()),
            "robots_txt": pa.array([
                # multi-agent group including *, comments, Allow noise,
                # empty Disallow (allow-all marker), trailing group
                "User-agent: googlebot\nUser-agent: *\n"
                "Allow: /open\nDisallow: /private  # secret\n"
                "Disallow:\n\n"
                "User-agent: evil\nDisallow: /\n",
                # *-group appears after a non-* group
                "User-agent: evil\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /x\n",
                None,
            ], pa.string()),
        })
        rules = parse_robots(rd.from_arrow(robots)).take_all()
        got = sorted((r["host"], r["path_prefix"]) for r in rules)
        assert got == [("a.com", "/private"), ("b.com", "/x")]

        rt = pa.table({"host": pa.array([h for h, _ in got], pa.string()),
                       "path_prefix": pa.array([p for _, p in got],
                                               pa.string())})
        pages = pa.table({
            "doc_id": pa.array(range(5), pa.int64()),
            "canonical_url": pa.array([
                "http://a.com/private/page",   # blocked (prefix)
                "http://a.com/public",         # clean
                "http://b.com/x",              # blocked (exact)
                "http://b.com/private",        # clean (rule is a.com's)
                "http://c.com/x",              # clean (no rules)
            ], pa.string()),
        })
        out = {r["doc_id"]: r["blocked"] for r in
               apply_robots(rd.from_arrow(pages), rt).take_all()}
        assert out == {0: True, 1: False, 2: True, 3: False, 4: False}

    def test_apply_with_no_rules(self):
        from peri_ray.stages.web import apply_robots

        rt = pa.table({"host": pa.array([], pa.string()),
                       "path_prefix": pa.array([], pa.string())})
        pages = pa.table({"doc_id": pa.array([1], pa.int64()),
                          "canonical_url": pa.array(
                              ["http://a.com/x"], pa.string())})
        out = apply_robots(rd.from_arrow(pages), rt).take_all()
        assert out[0]["blocked"] is False


class TestResolveRedirects:
    """Pointer-doubling redirect resolution: chains, convergence,
    loops, self-loops, and the max_hops flagging contract."""

    EDGES = {
        "src": ["a", "b", "c", "x", "p", "q", "s"]
               + [f"e{i}" for i in range(20)],
        "dst": ["b", "c", "d", "b", "q", "p", "s"]
               + [f"e{i + 1}" for i in range(20)],
    }

    def _resolve(self, max_hops, driver_threshold=2_000_000):
        from peri_ray.stages.web import resolve_redirects

        ds = rd.from_arrow(pa.table(
            {k: pa.array(v, pa.string()) for k, v in self.EDGES.items()}))
        return {r["src"]: (r["final_url"], r["hops"], r["is_cycle"])
                for r in resolve_redirects(
                    ds, max_hops=max_hops,
                    driver_threshold=driver_threshold).take_all()}

    # driver_threshold=0 forces the all-distributed BSP path;
    # threshold=3 exercises the MID-RUN handoff (distributed rounds
    # until the active set shrinks below 3, then the driver finisher
    # with ext-shortcut lookups); the default takes the pure driver
    # fast path — all three must agree exactly
    def test_chains_converge_and_loops_flag(self):
        for thr in (2_000_000, 3, 0):
            out = self._resolve(64, driver_threshold=thr)
            assert len(out) == 27  # one verdict per source
            assert out["a"] == ("d", 3, False)
            assert out["b"] == ("d", 2, False)
            assert out["c"] == ("d", 1, False)
            assert out["x"] == ("d", 3, False)  # converging branch
            for loop in ("p", "q", "s"):  # 2-cycle + self-loop
                assert out[loop] == (None, None, True)
            assert out["e0"] == ("e20", 20, False)
            assert out["e19"] == ("e20", 1, False)

    def test_max_hops_flags_deep_chains(self):
        for thr in (2_000_000, 3, 0):
            out = self._resolve(8, driver_threshold=thr)
            # depth > 8 is flagged even though doubling reached the end
            assert out["e0"] == (None, None, True)
            assert out["e11"] == (None, None, True)  # hops would be 9
            assert out["e12"] == ("e20", 8, False)   # exactly at the cap
            assert out["a"] == ("d", 3, False)

    def test_all_terminal_map(self):
        from peri_ray.stages.web import resolve_redirects

        ds = rd.from_arrow(pa.table({
            "src": pa.array(["u", "v"], pa.string()),
            "dst": pa.array(["t1", "t2"], pa.string())}))
        out = {r["src"]: (r["final_url"], r["hops"], r["is_cycle"])
               for r in resolve_redirects(ds).take_all()}
        assert out == {"u": ("t1", 1, False), "v": ("t2", 1, False)}


class TestUrlPrefixCounts:
    def test_prefix_rollup(self):
        import ray.data as rd

        from peri_ray.stages.web import url_prefix_counts

        rows = [
            {"canonical_url": "https://a.com/x/y/z"},
            {"canonical_url": "https://a.com/x/q"},
            {"canonical_url": "https://a.com/x"},
            {"canonical_url": "https://b.com/"},      # no non-empty segment
            {"canonical_url": "https://b.com"},       # no path at all
        ]
        out = {(r["host"], r["prefix"], r["depth"]): r["n_pages"]
               for r in url_prefix_counts(
                   rd.from_items(rows, parallelism=2), max_depth=3
               ).take_all()}
        assert out[("a.com", "/x", 1)] == 3
        assert out[("a.com", "/x/y", 2)] == 1
        assert out[("a.com", "/x/q", 2)] == 1
        assert out[("a.com", "/x/y/z", 3)] == 1
        # trailing-slash-only and pathless urls emit nothing
        assert not any(h == "b.com" for h, _, _ in out)
        assert len(out) == 4


class TestExtractMainContent:
    def test_block_classification(self):
        import ray.data as rd

        from peri_ray.stages.web import extract_main_content

        long = "this sentence is clearly long enough to keep here"
        pages = [
            {"doc_id": 1, "html": (
                b'<html><body><div><a href="/n">Home</a></div>'
                b"<p>" + long.encode() + b"</p>"
                b'<p>read <a href="/m">more</a></p>'
                b'<div><a href="/t">Terms</a></div></body></html>')},
            {"doc_id": 2, "html": b"<p>short</p>"},
            {"doc_id": 3, "html": None},
            {"doc_id": 4, "html": (
                b"<p>" + long.encode() + b"</p><p>" + long.upper().encode()
                + b"</p>")},
        ]
        out = {r["doc_id"]: r for r in extract_main_content(
            rd.from_items(pages, parallelism=2),
            min_chars=20).take_all()}
        assert set(out) == {1, 2, 4}
        assert out[1]["main_text"] == long
        assert out[1]["n_kept"] == 1 and out[1]["n_blocks"] == 4
        assert out[2]["main_text"] == "" and out[2]["n_kept"] == 0
        assert out[2]["n_blocks"] == 1
        # two qualifying blocks join with newline, in page order
        assert out[4]["main_text"] == long + "\n" + long.upper()
        assert out[4]["n_kept"] == 2


class TestCrawlFrontier:
    def test_uncrawled_targets_with_counts(self):
        from peri_ray.stages.web import crawl_frontier

        # crawled hosts: a, b.  Links: a->b (crawled), a->c twice,
        # b->c once, b->d once, one unparsable href, one no-anchor page
        pages = [
            {"host": "a.com", "html":
                b'<a href="http://b.com/x">l</a>'
                b'<a href="http://c.com/1">l</a>'
                b'<a href="http://c.com/2">l</a>'},
            {"host": "b.com", "html":
                b'<a href="http://c.com/3">l</a>'
                b'<a href="http://d.com/">l</a>'
                b'<a href="not-a-url">l</a>'},
            {"host": "a.com", "html": b"<p>no links</p>"},
        ]
        out = {r["dst_host"]: r["n_links"] for r in crawl_frontier(
            rd.from_items(pages, parallelism=2), n_buckets=4).take_all()}
        assert out == {"c.com": 3, "d.com": 1}

    def test_all_targets_crawled_empty(self):
        from peri_ray.stages.web import crawl_frontier

        pages = [{"host": "a.com",
                  "html": b'<a href="http://a.com/self">l</a>'}]
        assert crawl_frontier(rd.from_items(pages),
                              n_buckets=2).count() == 0


class TestRecrawlPriority:
    def test_changes_ages_and_priority(self):
        from peri_ray.stages.web import max_timestamp_us, recrawl_priority

        us = 1_000_000
        rows = [
            # u1: 3 captures, content changes at t=20 (A->B), stays B
            {"canonical_url": "u1", "warc_ts": 10 * us, "content_hash": 1,
             "doc_id": 1},
            {"canonical_url": "u1", "warc_ts": 20 * us, "content_hash": 2,
             "doc_id": 2},
            {"canonical_url": "u1", "warc_ts": 30 * us, "content_hash": 2,
             "doc_id": 3},
            # u2: 1 capture — no change possible
            {"canonical_url": "u2", "warc_ts": 40 * us, "content_hash": 9,
             "doc_id": 4},
            # u3: 2 captures, both changes? no — one consecutive diff
            {"canonical_url": "u3", "warc_ts": 5 * us, "content_hash": 7,
             "doc_id": 5},
            {"canonical_url": "u3", "warc_ts": 15 * us, "content_hash": 8,
             "doc_id": 6},
        ]
        t = pa.table({
            "canonical_url": pa.array([r["canonical_url"] for r in rows]),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.timestamp("us")),
            "content_hash": pa.array([r["content_hash"] for r in rows],
                                     pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        })
        ds = rd.from_arrow(t).repartition(3)
        mx = max_timestamp_us(ds, "warc_ts")
        assert mx == 40 * us
        out = {r["canonical_url"]: r for r in
               recrawl_priority(ds, mx, n_buckets=4).take_all()}
        assert out["u1"]["n_captures"] == 3
        assert out["u1"]["n_changes"] == 1
        assert out["u1"]["age_us"] == 10 * us
        assert out["u1"]["priority_num"] == 10 * us
        assert out["u2"]["n_captures"] == 1
        assert out["u2"]["n_changes"] == 0
        assert out["u2"]["age_us"] == 0
        assert out["u2"]["priority_num"] == 0
        assert out["u3"]["n_changes"] == 1
        assert out["u3"]["age_us"] == 25 * us
        assert out["u3"]["priority_num"] == 25 * us

    def test_ties_break_by_doc_id(self):
        from peri_ray.stages.web import recrawl_priority

        # same timestamp: order by doc_id, so hash sequence is 1,2 — one
        # change; reversed doc order in the input must not matter
        t = pa.table({
            "canonical_url": pa.array(["u", "u"]),
            "warc_ts": pa.array([100, 100], pa.timestamp("us")),
            "content_hash": pa.array([2, 1], pa.int64()),
            "doc_id": pa.array([2, 1], pa.int64()),
        })
        out = recrawl_priority(rd.from_arrow(t), 100, n_buckets=2
                               ).take_all()
        assert out[0]["n_changes"] == 1 and out[0]["n_captures"] == 2
