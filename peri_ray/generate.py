"""Deterministic synthetic-data generation — the engine twin of
``Peri.generate/1`` / ``Peri.Generatable`` (reference
``lib/peri/generatable.ex:75-320``), specialized to the flagship
``web_pages`` table (FIXTURES F0, from BASELINE.json input_hint):

    web_pages(url: string, warc_ts: timestamp[us], html: binary,
              text: large_string, lang: string)

Properties (seeded, reproducible):
- hosts are Zipf-skewed (exercises salted uniqueness / skew handling);
- ~0.1% exact duplicate urls injected;
- ~0.05% null warc_ts;
- ``text`` is a deterministic extract of ``html`` (the per-row invariant:
  validation must keep text byte-identical per url);
- ``lang`` drawn from a reference histogram with ~1% out-of-set values
  (referential violations); a "drifted" variant shifts en→0.40 for
  PSI/KL tests.

Generation is itself a Ray Data pipeline: ``rd.range(n)`` →
``map_batches`` with a per-batch RNG seeded by (seed, first index), so
the table streams at any scale without driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LANG_REFERENCE_HIST = {"en": 0.62, "de": 0.09, "fr": 0.07, "es": 0.06, "pt": 0.04, "it": 0.04,
                       "nl": 0.03, "pl": 0.03, "ru": 0.02}
LANG_DRIFTED_HIST = {"en": 0.40, "de": 0.13, "fr": 0.11, "es": 0.10, "pt": 0.06, "it": 0.06,
                     "nl": 0.05, "pl": 0.05, "ru": 0.04}
OUT_OF_SET_LANGS = ["zz", "xx", "q1"]

_WORDS = (
    "the of and to in is was he for it with as his on be at by had not are but from or "
    "have an they which one you were her all she there would their we him been has when "
    "who will more no if out so said what up its about into than them can only other new "
    "some could time these two may then do first any my now such like our over man me"
).split()


class _GenBatch:
    """map_batches fn over rd.range blocks: index → row, seeded per batch."""

    def __init__(self, seed: int, drifted: bool, n_hosts: int = 1000,
                 columns: list[str] | None = None):
        self.seed = seed
        self.hist = LANG_DRIFTED_HIST if drifted else LANG_REFERENCE_HIST
        self.n_hosts = n_hosts
        self.columns = columns  # None = all; pruned mode skips the
        # expensive text/html string building but performs IDENTICAL rng
        # draws, so url/warc_ts/lang match the full table row for row
        # (the generator twin of parquet column pruning)
        # Zipf-ish host weights, fixed across batches
        ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
        w = 1.0 / ranks
        self.host_p = w / w.sum()
        langs = list(self.hist.keys()) + OUT_OF_SET_LANGS
        probs = np.array(list(self.hist.values()), np.float64)
        probs = probs * (0.99 / probs.sum())
        oos = np.full(len(OUT_OF_SET_LANGS), 0.01 / len(OUT_OF_SET_LANGS))
        self.langs = np.array(langs)
        self.lang_p = np.concatenate([probs, oos])
        # a fixed seeded "word soup"; texts are word-aligned slices of it
        # (one slice per row instead of a per-row join — the generator has
        # to keep up with the vectorized validator it feeds)
        soup_rng = np.random.default_rng(seed)
        soup_words = soup_rng.integers(0, len(_WORDS), size=200_000)
        self.soup = " ".join(_WORDS[j] for j in soup_words)
        # word-boundary offsets for clean slicing
        self.soup_bytes = np.frombuffer(self.soup.encode(), np.uint8)
        self.boundaries = np.flatnonzero(self.soup_bytes == ord(" "))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        rng = np.random.default_rng(self.seed * 1_000_003 + int(ids[0]))
        n = len(ids)

        hosts = rng.choice(self.n_hosts, size=n, p=self.host_p)
        paths = rng.integers(0, 1 << 40, size=n)
        base = np.datetime64("2026-01-01T00:00:00", "us")
        offs = rng.integers(0, 30 * 24 * 3600 * 1_000_000, size=n)
        ts = base + offs.astype("timedelta64[us]")
        ts_null = rng.random(n) < 0.0005

        # texts = word-aligned slices of the fixed soup (vectorized offsets)
        nb = len(self.boundaries)
        start_b = rng.integers(0, nb - 500, size=n)
        length_b = rng.integers(20, 400, size=n)
        cols = self.columns
        need_text = cols is None or "text" in cols or "html" in cols

        # ~0.1% exact duplicate PAGES: copy a neighbor's url+html+text so
        # the per-url text invariant stays well-defined and exact-dedup
        # stages have true duplicates to find.  Applied by rewriting the
        # SOURCE arrays (hosts/paths/slice offsets/ids) before any string
        # is built, so every column stays a vectorized Arrow construction.
        dup_idx = np.flatnonzero(rng.random(n) < 0.001)
        page_ids = ids.copy()
        if dup_idx.size:
            src = (dup_idx - 1) % n
            hosts[dup_idx] = hosts[src]
            paths[dup_idx] = paths[src]
            start_b[dup_idx] = start_b[src]
            length_b[dup_idx] = length_b[src]
            page_ids[dup_idx] = page_ids[src]

        langs = rng.choice(self.langs, size=n, p=self.lang_p)

        host_str = pa.array(hosts.astype(np.int64)).cast(pa.string())
        path_str = pa.array(paths.astype(np.int64)).cast(pa.string())
        urls = pc.binary_join_element_wise(
            pa.scalar("https://host"), host_str,
            pa.scalar(".example.com/p/"), path_str, pa.scalar(""), "",
        )

        if need_text:
            end_b = np.minimum(start_b + length_b, nb - 1)
            starts = self.boundaries[start_b] + 1
            ends = self.boundaries[end_b]
            # per-row slicing stays python: CPython slice-of-str is a C
            # memcpy and beats a numpy fancy-gather (which materializes
            # ~3 int64 index arrays the size of the output buffer)
            soup = self.soup
            texts_arr = pa.array(
                [soup[s:e] for s, e in zip(starts.tolist(), ends.tolist())],
                pa.string(),
            )
            id_str = pa.array(page_ids.astype(np.int64)).cast(pa.string())
            htmls = pc.binary_join_element_wise(
                pa.scalar("<html><head><title>d"), id_str,
                pa.scalar("</title></head><body><p>"), texts_arr,
                pa.scalar("</p></body></html>"), "",
            ).cast(pa.binary())
        else:
            texts_arr = htmls = None

        ts_arr = pa.array(ts, type=pa.timestamp("us"))
        if ts_null.any():
            ts_arr = pc.if_else(pa.array(ts_null), pa.nulls(n, pa.timestamp("us")), ts_arr)

        full = {
            "url": lambda: urls,
            "warc_ts": lambda: ts_arr,
            "html": lambda: htmls,
            "text": lambda: texts_arr.cast(pa.large_string()),
            "lang": lambda: pa.array(langs.tolist(), pa.string()),
        }
        keep = cols if cols is not None else list(full)
        return pa.table({name: full[name]() for name in keep})


def web_pages_dataset(n_rows: int, seed: int = 42, drifted: bool = False,
                      override_num_blocks: int | None = None,
                      columns: list[str] | None = None):
    """Streaming seeded web_pages table as a ray.data.Dataset.

    ``columns`` prunes at the source — the generator twin of parquet
    column pruning: same seeded rows, only the requested columns built."""
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=override_num_blocks)
    return ds.map_batches(_GenBatch(seed, drifted, columns=columns),
                          batch_format="pyarrow", batch_size=4096)


def extract_text(html: bytes) -> str:
    """The deterministic "extraction" the fake html wraps — used by tests
    to assert the byte-identical-text-per-url invariant."""
    s = html.decode()
    start = s.index("<p>") + 3
    end = s.index("</p>")
    return s[start:end]


WEB_PAGES_SPEC = {
    "url": ("required", ("string", [("regex", "^https?://"), ("max", 2048)])),
    "warc_ts": ("required", "datetime"),
    "html": ("required", "binary"),
    "text": ("required", ("string", ("min", 1))),
    "lang": ("enum", list(LANG_REFERENCE_HIST.keys())),
}
