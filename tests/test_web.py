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
