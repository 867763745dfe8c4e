"""Sharded mutable content index — the one state shape the Dataset API
cannot express (a shared index that later batches must see), so this is
the engine's deliberate raw-`ray.remote` escape hatch (everything else
in peri_ray is Dataset-native).

Use case: incremental crawl dedup — build the index from yesterday's
corpus, probe (or probe-and-add) today's increment.  Content is stored
as 64-bit hashes sharded across N actors by ``hash % N``; each shard
serializes its own updates, so concurrent ingest keeps exact-dedup
semantics (exactly one winner per hash) with no global lock.  Memory
per shard = 8+ bytes per distinct document, horizontally sharded — the
index for 10^12 docs spreads across the cluster instead of living in
one process.

64-bit hashing trades a ~n²/2^64 false-duplicate probability for the
8-byte footprint (the standard dedup trade; ~1e-13 at a billion docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _shard_cls():
    import ray

    @ray.remote(num_cpus=0.25)
    class _IndexShard:
        """Owns one partition of the hash space.  Calls on one actor
        are serialized by Ray, which is exactly the consistency the
        mutable set needs."""

        def __init__(self):
            self.seen: set[int] = set()

        def add(self, hashes: np.ndarray) -> np.ndarray:
            """Insert; returns per-hash 'was already present' (within
            this call, later duplicates of an earlier element count as
            present — first occurrence wins)."""
            s = self.seen
            out = np.empty(len(hashes), bool)
            for i, h in enumerate(hashes.tolist()):
                out[i] = h in s
                s.add(h)
            return out

        def contains(self, hashes: np.ndarray) -> np.ndarray:
            s = self.seen
            return np.fromiter((h in s for h in hashes.tolist()), bool,
                               len(hashes))

        def size(self) -> int:
            return len(self.seen)

    return _IndexShard


class TextHashIndex:
    """Driver-side handle to the shard actors.  Build with
    :meth:`add_dataset` (streams — the corpus never materializes),
    probe with :meth:`mark_duplicates`."""

    def __init__(self, n_shards: int = 8):
        cls = _shard_cls()
        self.shards = [cls.remote() for _ in range(n_shards)]
        self.n_shards = n_shards

    def _apply(self, method: str, add: bool):
        shards, n = self.shards, self.n_shards

        def _f(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
            import ray

            from peri_ray.state.sketches import hash_strings

            txt = t.column(text_col)
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            valid = pc.is_valid(txt).to_numpy(zero_copy_only=False)
            h = np.zeros(t.num_rows, np.uint64)
            if valid.any():
                h_valid = hash_strings(txt.drop_null(), seed=11)
                h[valid] = h_valid
            sid = (h % np.uint64(n)).astype(np.int64)
            dup = np.zeros(t.num_rows, bool)
            refs, slots = [], []
            for s in range(n):
                pos = np.flatnonzero(valid & (sid == s))
                if len(pos):
                    fn = getattr(shards[s], method)
                    refs.append(fn.remote(h[pos]))
                    slots.append(pos)
            for pos, res in zip(slots, ray.get(refs)):
                dup[pos] = res
            return pa.table({id_col: t.column(id_col),
                             "duplicate": pa.array(dup)})

        return _f

    def add_dataset(self, ds, text_col: str = "text",
                    id_col: str = "doc_id", batch_size: int | None = 8192):
        """Stream a corpus into the index; returns the number of rows
        ingested (consumes the pipeline)."""
        fn = self._apply("add", True)
        out = ds.map_batches(lambda t: fn(t, text_col, id_col),
                             batch_format="pyarrow", batch_size=batch_size)
        return out.count()

    def mark_duplicates(self, ds, text_col: str = "text",
                        id_col: str = "doc_id",
                        batch_size: int | None = 8192):
        """(id, duplicate) per row: is the row's text already indexed?
        Read-only — does not mutate the index; null text is never a
        duplicate."""
        fn = self._apply("contains", False)
        return ds.map_batches(lambda t: fn(t, text_col, id_col),
                              batch_format="pyarrow", batch_size=batch_size)

    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))
