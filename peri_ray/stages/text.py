"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID (n-gram heuristic),
document fingerprinting (rolling hash).  All vectorized or
actor-pool ``map_batches`` stages; nothing materializes the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting (vectorized Arrow kernels; oracle-checkable in SQL via
# regexp_split_to_array)
# ---------------------------------------------------------------------------


def token_count_batch(table: pa.Table, text_col: str = "text",
                      out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count: trim, split on \\s+, count.  Empty string
    counts as 1 empty token to match SQL regexp_split_to_array behavior."""
    txt = table.column(text_col).combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    trimmed = pc.utf8_trim_whitespace(txt)
    parts = pc.split_pattern_regex(trimmed, r"\s+")
    counts = pc.list_value_length(parts).cast(pa.int64())
    return table.append_column(out_col, counts)


def add_token_counts(ds, text_col: str = "text", batch_size: int | None = 8192):
    return ds.map_batches(
        lambda t: token_count_batch(t, text_col), batch_format="pyarrow",
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# BPE-ish token estimate: words + punctuation clusters (regex, vectorized)
# ---------------------------------------------------------------------------


def bpe_ish_count_batch(table: pa.Table, text_col: str = "text",
                        out_col: str = "n_bpe_tokens") -> pa.Table:
    txt = table.column(text_col).combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    # GPT-2-style coarse pretokenizer classes: word pieces, numbers, punct
    parts = pc.extract_regex_span_all if False else None  # not available; use split
    words = pc.list_value_length(pc.split_pattern_regex(txt, r"[^\w]+"))
    punct = pc.count_substring_regex(txt, r"[^\w\s]")
    counts = pc.add(words.cast(pa.int64()), punct.cast(pa.int64()))
    return table.append_column(out_col, counts)


# ---------------------------------------------------------------------------
# quality scoring (stateful actor: compiled regex + stopword set)
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "the", "of", "and", "to", "in", "is", "was", "he", "for", "it", "with",
    "as", "his", "on", "be", "at", "by", "had", "not", "are", "but", "from",
    "or", "have", "an", "they", "which", "one", "you", "were", "her", "all",
}


class QualityScorer:
    """Actor-pool stage: length / punctuation / stopword-ratio heuristics
    (the C4/Gopher-style quality signals).  Regexes compiled once per
    actor in ``__init__``; per-batch work is numpy over token lists."""

    def __init__(self):
        import re

        self.word_re = re.compile(r"[a-zA-Z']+")
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, table: pa.Table) -> pa.Table:
        txt = table.column("text").combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        texts = txt.to_pylist()
        n = len(texts)
        stop_ratio = np.zeros(n)
        mean_word_len = np.zeros(n)
        punct_ratio = np.zeros(n)
        for i, t in enumerate(texts):
            if not t:
                continue
            words = self.word_re.findall(t.lower())
            if words:
                stop_ratio[i] = sum(w in _STOPWORDS for w in words) / len(words)
                mean_word_len[i] = float(np.mean([len(w) for w in words]))
            punct_ratio[i] = len(self.punct_re.findall(t)) / max(1, len(t))
        # simple composite: plausible natural text scores high
        score = (
            np.clip(stop_ratio / 0.4, 0, 1) * 0.5
            + np.clip(1 - np.abs(mean_word_len - 4.5) / 4.5, 0, 1) * 0.3
            + np.clip(1 - punct_ratio / 0.2, 0, 1) * 0.2
        )
        return (
            table.append_column("stop_ratio", pa.array(stop_ratio))
            .append_column("mean_word_len", pa.array(mean_word_len))
            .append_column("punct_ratio", pa.array(punct_ratio))
            .append_column("quality_score", pa.array(score))
        )


def add_quality_scores(ds, concurrency: int = 4, batch_size: int = 4096):
    return ds.map_batches(QualityScorer, concurrency=concurrency,
                          batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# language ID (character n-gram heuristic; stateful actor holds profiles)
# ---------------------------------------------------------------------------

# Tiny trigram profiles per language (hand-rolled heuristic, not a model;
# enough for routing/benchmarks, deterministic).
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter"],
    "de": ["der", "die", "und", "den", "ein", "sch", "ich", "nde", "che", "ung"],
    "fr": ["les", "des", "ent", "ion", "ede", "que", "ait", "lle", "our", "ant"],
    "es": ["del", "que", "ent", "cio", "ion", "ado", "est", "par", "los", "nte"],
    "pt": ["que", "ent", "cao", "ado", "par", "com", "nto", "est", "dos", "ura"],
}


class LangId:
    """Actor-pool stage: trigram-profile scoring per row.  Profiles are
    built once per actor; scoring counts profile trigram hits per text."""

    def __init__(self, profiles: dict[str, list[str]] | None = None):
        self.profiles = profiles or _LANG_PROFILES

    def __call__(self, table: pa.Table) -> pa.Table:
        txt = table.column("text").combine_chunks()
        if pa.types.is_large_string(txt.type):
            txt = txt.cast(pa.string())
        scores = {}
        for lang, grams in self.profiles.items():
            s = None
            for g in grams:
                c = pc.count_substring(txt, g).cast(pa.int64())
                s = c if s is None else pc.add(s, c)
            scores[lang] = s.to_numpy(zero_copy_only=False)
        mat = np.stack([scores[l] for l in self.profiles], axis=1)
        best = mat.argmax(axis=1)
        langs = np.array(list(self.profiles.keys()))
        guess = langs[best]
        guess = np.where(mat.max(axis=1) > 0, guess, "und")
        return table.append_column("lang_guess", pa.array(guess.tolist(), pa.string()))


def add_lang_id(ds, concurrency: int = 4, batch_size: int = 4096):
    return ds.map_batches(LangId, concurrency=concurrency,
                          batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# document fingerprinting (rolling / content hash)
# ---------------------------------------------------------------------------


def fingerprint_batch(table: pa.Table, text_col: str = "text",
                      out_col: str = "fingerprint") -> pa.Table:
    """64-bit content fingerprint per document (vectorized hash of the
    full text — the exact-dedup key)."""
    from peri_ray.state.sketches import hash_strings

    txt = table.column(text_col).combine_chunks()
    h = hash_strings(txt, seed=1)
    return table.append_column(out_col, pa.array(h.astype(np.int64)))


def add_fingerprints(ds, text_col: str = "text", batch_size: int | None = 8192):
    return ds.map_batches(lambda t: fingerprint_batch(t, text_col),
                          batch_format="pyarrow", batch_size=batch_size)


def winnow_batch(table: pa.Table, k: int = 8, window: int = 16,
                 text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): rolling k-gram hashes → per-window minimum selection.
    Output is flat (id, fingerprint, pos) rows — two docs sharing any
    selected fingerprint share a k-gram region, so a groupby on
    ``fingerprint`` finds copied passages at any scale.

    Vectorized: the rolling hash over each text is a numpy polynomial
    rolling hash; window minima via a stride-tricks sliding window."""
    txt = table.column(text_col).combine_chunks()
    if pa.types.is_large_string(txt.type):
        txt = txt.cast(pa.string())
    ids_out: list[int] = []
    fps_out: list[int] = []
    pos_out: list[int] = []
    B = np.uint64(1000003)
    Bk = B ** np.uint64(k - 1)
    ids = table.column(id_col).to_pylist()
    for did, t in zip(ids, txt.to_pylist()):
        if not t or len(t) < k:
            continue
        b = np.frombuffer(t.encode("utf-8", "ignore"), np.uint8).astype(np.uint64)
        n = len(b) - k + 1
        if n <= 0:
            continue
        # rolling hash h[i+1] = (h[i] - b[i]*B^(k-1)) * B + b[i+k]
        with np.errstate(over="ignore"):
            hashes = np.zeros(n, np.uint64)
            first = np.uint64(0)
            for j in range(k):
                first = first * B + b[j]
            hashes[0] = first
            if n > 1:
                drop = b[: n - 1] * Bk
                add = b[k:]
                cur = first
                for i in range(1, n):  # small texts; O(len) scalar loop
                    cur = (cur - drop[i - 1]) * B + add[i - 1]
                    hashes[i] = cur
        if n <= window:
            sel = np.array([int(np.argmin(hashes))])
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
            mins = sw.argmin(axis=1) + np.arange(len(sw))
            sel = np.unique(mins)
        ids_out.extend([did] * len(sel))
        fps_out.extend(hashes[sel].astype(np.int64).tolist())
        pos_out.extend(sel.tolist())
    return pa.table({
        id_col: pa.array(ids_out, pa.int64()),
        "fingerprint": pa.array(fps_out, pa.int64()),
        "pos": pa.array(pos_out, pa.int32()),
    })


def winnow_fingerprints(ds, k: int = 8, window: int = 16,
                        text_col: str = "text", id_col: str = "doc_id",
                        batch_size: int | None = 2048):
    """flat_map-shaped: more output rows than input (one per selected
    k-gram).  Shared-passage detection = groupby("fingerprint")."""
    return ds.map_batches(lambda t: winnow_batch(t, k, window, text_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size)


def shared_passage_pairs(ds, k: int = 8, window: int = 16, min_shared: int = 2,
                         text_col: str = "text", id_col: str = "doc_id"):
    """Doc pairs sharing ≥ min_shared winnowing fingerprints (copied
    passages).  Shuffle keys on the fingerprint hash; only (fingerprint,
    id) pairs move."""
    import itertools

    fps = winnow_fingerprints(ds, k, window, text_col, id_col)

    def _pairs(group: pa.Table) -> pa.Table:
        docs = sorted(set(group.column(id_col).to_pylist()))
        a, b = [], []
        for xa, xb in itertools.combinations(docs, 2):
            a.append(xa)
            b.append(xb)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})

    pairs = fps.groupby("fingerprint").map_groups(_pairs, batch_format="pyarrow")
    counted = pairs.groupby(["id_a", "id_b"]).count()

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("count()"), min_shared)).select(
            ["id_a", "id_b"]
        )

    return counted.map_batches(_filter, batch_format="pyarrow")
