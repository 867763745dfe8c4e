"""Mergeable sketches for single-pass distributed column statistics.

- ``KLL``: the KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016;
  "KLL±" VLDB 2021 — PAPERS.md).  Mergeable: per-batch partials combine
  associatively, so Ray Data can build one per batch in ``map_batches``
  and reduce them in a tiny final stage (SURVEY §2.7).
- ``HLL``: HyperLogLog (Flajolet et al. 2007) with linear-counting
  small-range correction.  Registers merge with elementwise max.

Both are pure-Python/numpy, deterministic (seeded), and pickle-friendly
(they travel through the object store as one binary cell per batch).
"""

from __future__ import annotations

import numpy as np

# -- 64-bit mixing (splitmix64, public domain construction) -----------------

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 values."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return x ^ (x >> np.uint64(31))


# The hash IMPLEMENTATION is resolved once at import: every bucketed
# exchange in the engine assumes equal keys hash equally on every task
# (bucket_of's single-recipe mandate).  A per-call try/except fallback
# could silently switch one task to a different hash function on a
# transient import failure — equal keys would then co-locate nothing,
# with no error anywhere.  Workers run the same image, so import-time
# resolution is consistent cluster-wide; a transient failure AFTER a
# successful import raises instead of degrading.
try:
    import polars as _pl
except Exception:  # polars genuinely absent from the environment
    _pl = None


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string/binary sequence.
    Polars' vectorized hash when the module imported (fast path), else
    a blake2b fallback — chosen ONCE at import, never per call."""
    if _pl is not None:
        s = _pl.Series(values if not hasattr(values, "to_pylist")
                       else values.to_pylist())
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    import hashlib

    out = np.empty(len(values), np.uint64)
    it = values.to_pylist() if hasattr(values, "to_pylist") else values
    for i, v in enumerate(it):
        if v is None:
            out[i] = 0
        else:
            b = v if isinstance(v, bytes) else str(v).encode()
            h = hashlib.blake2b(b, digest_size=8,
                                salt=seed.to_bytes(8, "little"))
            out[i] = np.frombuffer(h.digest(), np.uint64)[0]
    return out


# ---------------------------------------------------------------------------
# KLL quantile sketch
# ---------------------------------------------------------------------------


class KLL:
    """KLL sketch over float64 values.  ``k`` controls accuracy
    (~1.65/sqrt(k) rank error at k=200 ⇒ ~1% — plenty for drift/verdict
    thresholds).  Deterministic via a per-instance seeded RNG so reruns
    reproduce checkpointed stats."""

    C = 2.0 / 3.0

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._rng = np.random.default_rng(seed)
        self._min = np.inf
        self._max = -np.inf

    # -- capacity of a level (deeper levels shrink geometrically) ----------
    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        return max(2, int(np.ceil(self.k * (self.C ** (height - level - 1)))))

    def update_many(self, values: np.ndarray) -> None:
        vals = values[~np.isnan(values)] if values.dtype.kind == "f" else values
        if len(vals) == 0:
            return
        self.n += len(vals)
        self._min = min(self._min, float(vals.min()))
        self._max = max(self._max, float(vals.max()))
        self.compactors[0].extend(vals.tolist())
        self._compress()

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _compress(self) -> None:
        while self._size() > sum(self._capacity(i) for i in range(len(self.compactors))):
            for level, c in enumerate(self.compactors):
                if len(c) > self._capacity(level):
                    if level + 1 == len(self.compactors):
                        self.compactors.append([])
                    c.sort()
                    offset = int(self._rng.integers(0, 2))
                    self.compactors[level + 1].extend(c[offset::2])
                    self.compactors[level] = []
                    break
            else:
                break

    def merge(self, other: "KLL") -> "KLL":
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        while len(self.compactors) < len(other.compactors):
            self.compactors.append([])
        for level, c in enumerate(other.compactors):
            self.compactors[level].extend(c)
        self._compress()
        return self

    def _weighted(self):
        items, weights = [], []
        for level, c in enumerate(self.compactors):
            items.extend(c)
            weights.extend([1 << level] * len(c))
        if not items:
            return np.empty(0), np.empty(0)
        items = np.asarray(items, np.float64)
        weights = np.asarray(weights, np.float64)
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    def quantile(self, q: float) -> float:
        items, weights = self._weighted()
        if len(items) == 0:
            return float("nan")
        if q <= 0:
            return self._min
        if q >= 1:
            return self._max
        cum = np.cumsum(weights)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target))
        return float(items[min(idx, len(items) - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, value: float) -> float:
        """Approximate fraction of values <= value."""
        items, weights = self._weighted()
        if len(items) == 0:
            return float("nan")
        idx = np.searchsorted(items, value, side="right")
        total = weights.sum()
        return float(weights[:idx].sum() / total) if total else float("nan")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% standard error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) & _MASK
        # rho = position of leftmost 1-bit in the remaining 64-p bits
        nbits = 64 - self.p
        rho = np.full(len(h), nbits + 1, np.uint8)
        found = np.zeros(len(h), bool)
        for bit in range(nbits):
            mask = (~found) & (((rest >> np.uint64(63 - bit)) & np.uint64(1)) == 1)
            rho[mask] = bit + 1
            found |= mask
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)


class MisraGries:
    """Mergeable Misra-Gries heavy-hitters summary over string items.

    Holds at most ``k`` counters.  Guarantees after any sequence of
    updates/merges: for every item (tracked or dropped),
    ``count(item) >= est(item) >= count(item) - err`` where ``err`` is
    the tracked total decrement and a dropped item has est 0.  Hence
    ``candidates(threshold)`` is a guaranteed SUPERSET of the true
    over-threshold items ONLY when ``threshold > err`` — an item whose
    entire count was absorbed by decrements cannot be named at all.
    Callers must check ``err`` against their threshold
    (stages.text.heavy_hitter_terms raises when the bound is void).

    Merge (Agarwal et al., "Mergeable Summaries"): sum counters
    pairwise, then subtract the (k+1)-th largest count from all and
    drop non-positives; errors add."""

    __slots__ = ("k", "counters", "err")

    def __init__(self, k: int = 1024):
        self.k = k
        self.counters: dict[str, int] = {}
        self.err = 0

    def add_counts(self, items, counts) -> None:
        """Bulk update with pre-aggregated (item, count) pairs (the
        per-batch path: callers value_count first, so each distinct
        item costs one dict op, not one per occurrence)."""
        c = self.counters
        for it, n in zip(items, counts):
            n = int(n)
            if it in c:
                c[it] += n
            else:
                c[it] = n
        self._shrink()

    def _shrink(self) -> None:
        c = self.counters
        if len(c) <= self.k:
            return
        # subtract the (k+1)-th largest count from everyone; drop <= 0.
        # One such step restores the invariant after bulk inserts and
        # adds exactly that median-ish value to the error bound.
        vals = sorted(c.values(), reverse=True)
        cut = vals[self.k]
        self.counters = {it: n - cut for it, n in c.items() if n > cut}
        self.err += cut

    def merge(self, other: "MisraGries") -> "MisraGries":
        c = self.counters
        for it, n in other.counters.items():
            c[it] = c.get(it, 0) + n
        self.err += other.err
        self._shrink()
        return self

    def candidates(self, threshold: int) -> list[str]:
        """Every item whose TRUE count could reach ``threshold``."""
        return [it for it, n in self.counters.items()
                if n + self.err >= threshold]


class Bloom:
    """Fixed-size Bloom filter over pre-hashed uint64 keys, mergeable
    by bitwise OR (per-block partials -> one driver OR -> broadcast).

    No false negatives ever: a key that was added always tests
    present, so "absent" is a PROOF of non-membership — the property
    bloom-pruned joins rely on.  False-positive rate ~=
    (1 - e^(-k*n/m))^k; callers that need exactness must verify the
    "present" set (stages.joins.bloom_semi_join does).

    Vectorized: the k derived hashes come from splitmix64 re-seeding,
    bit scatter/gather via uint64 word ops (``np.bitwise_or.at``)."""

    __slots__ = ("m", "k", "words")

    def __init__(self, m_bits: int = 1 << 22, k: int = 4):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        self.m = m_bits
        self.k = k
        self.words = np.zeros(m_bits // 64, np.uint64)

    def _positions(self, hashes: np.ndarray, i: int) -> np.ndarray:
        seed = np.uint64(0x9E3779B97F4A7C15 * (i + 1) & ((1 << 64) - 1))
        return splitmix64(hashes ^ seed) % np.uint64(self.m)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        for i in range(self.k):
            pos = self._positions(h, i)
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        out = np.ones(len(h), bool)
        for i in range(self.k):
            pos = self._positions(h, i)
            bit = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "Bloom") -> "Bloom":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("Bloom parameters must match to merge")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self


class CountMin:
    """Count-Min sketch over pre-hashed uint64 keys — mergeable by
    elementwise ADD (per-block partials → one driver add → broadcast
    for estimate lookups).  The sketch the heavy-hitter family lacks:
    Misra-Gries names candidates, CountMin answers point frequency
    queries for ANY key with a one-sided guarantee.

    Guarantees (Cormode & Muthukrishnan): estimates never undercount
    — ``estimate(x) >= count(x)`` always — and overcount by at most
    ``e/width × N`` with probability ``1 − (1/e)^depth`` (N = total
    added).  Mergeability is exact: add-then-merge ≡ one sketch over
    the concatenated stream.

    Vectorized: the depth row-hashes come from splitmix64 re-seeding,
    updates via ``np.add.at`` with pre-aggregated counts."""

    __slots__ = ("width", "depth", "table", "total")

    def __init__(self, width: int = 1 << 14, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), np.int64)
        self.total = 0

    def _positions(self, hashes: np.ndarray, i: int) -> np.ndarray:
        seed = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & ((1 << 64) - 1))
        return (splitmix64(hashes ^ seed) % np.uint64(self.width)).astype(
            np.int64)

    def add_hashes(self, hashes: np.ndarray,
                   counts: np.ndarray | None = None) -> None:
        h = hashes.astype(np.uint64, copy=False)
        c = (np.ones(len(h), np.int64) if counts is None
             else counts.astype(np.int64, copy=False))
        for i in range(self.depth):
            np.add.at(self.table[i], self._positions(h, i), c)
        self.total += int(c.sum())

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
        for i in range(self.depth):
            np.minimum(est, self.table[i][self._positions(h, i)], out=est)
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("CountMin parameters must match to merge")
        self.table += other.table
        self.total += other.total
        return self
