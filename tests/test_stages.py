"""Tests for the [NORTH] table-level operators, training-data stages,
tooling parity (walker / JSON Schema), checkpoint/resume, and the
per-row invariant (byte-identical text per url, BASELINE.json
input_hint)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# stats + sketches
# ---------------------------------------------------------------------------


class TestStats:
    def test_exact_stats_match_arrow(self):
        from peri_ray.stages.stats import column_stats

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity"])
        st = column_stats(ds, ["l_quantity"], with_sketches=False)["l_quantity"]
        import pyarrow.parquet as pq
        import pyarrow.compute as pc

        t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_quantity"])
        col = t.column("l_quantity")
        assert st["count"] == len(col)
        assert st["null_count"] == col.null_count
        assert st["min"] == pc.min(col).as_py()
        assert st["max"] == pc.max(col).as_py()
        assert abs(st["sum"] - pc.sum(col).as_py()) < 1e-6

    def test_sketches_accuracy(self):
        from peri_ray.stages.stats import column_stats

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_orderkey"])
        st = column_stats(ds, ["l_quantity", "l_orderkey"])
        # l_quantity uniform 1..50 → q50 ≈ 25, ndv ≈ 50
        assert 20 <= st["l_quantity"]["quantiles"]["0.5"] <= 30
        assert 40 <= st["l_quantity"]["ndv"] <= 60

    def test_kll_merge_associative(self):
        from peri_ray.state.sketches import KLL

        rng = np.random.default_rng(1)
        data = rng.normal(0, 1, 30_000)
        whole = KLL()
        whole.update_many(data)
        parts = [KLL(seed=i) for i in range(3)]
        for i, p in enumerate(parts):
            p.update_many(data[i * 10_000:(i + 1) * 10_000])
        merged = parts[0].merge(parts[1]).merge(parts[2])
        for q in (0.1, 0.5, 0.9):
            assert abs(merged.quantile(q) - np.quantile(data, q)) < 0.1

    def test_hll_estimate(self):
        from peri_ray.state.sketches import HLL, hash_strings

        h = HLL()
        h.add_hashes(hash_strings([f"v{i}" for i in range(20_000)]))
        assert abs(h.estimate() - 20_000) / 20_000 < 0.05


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------


class TestChecks:
    def test_duplicate_keys_exact(self):
        from peri_ray.stages.checks import duplicate_keys

        ds = rd.from_items([{"k": "a"}, {"k": "b"}, {"k": "a"}, {"k": "c"}, {"k": "a"}])
        dups = {r["k"]: r["cnt"] for r in duplicate_keys(ds, "k").take_all()}
        assert dups == {"a": 3}

    def test_uniqueness_check_pass(self):
        from peri_ray.stages.checks import uniqueness_check

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        out = uniqueness_check(ds, "doc_id")
        assert out["passed"] and out["duplicate_keys"] == 0

    def test_referential_broadcast(self):
        from peri_ray.stages.checks import referential_check

        orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
        cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
        assert referential_check(orders, "o_custkey", cust)["passed"]
        # and a failing case
        bad = referential_check(orders, "o_custkey", [1, 2, 3])
        assert not bad["passed"] and bad["violating_rows"] > 0

    def test_drift_psi(self):
        from peri_ray.stages.checks import psi, kl_divergence

        same = {"a": 50, "b": 50}
        assert psi(same, {"a": 0.5, "b": 0.5}) < 1e-9
        shifted = {"a": 90, "b": 10}
        assert psi(shifted, {"a": 0.5, "b": 0.5}) > 0.2
        assert kl_divergence(shifted, {"a": 0.5, "b": 0.5}) > 0.1

    def test_drift_detects_drifted_generator(self):
        from peri_ray.generate import web_pages_dataset, LANG_REFERENCE_HIST
        from peri_ray.stages.checks import drift_check

        # threshold 0.15 sits well between the generators' scores
        # (ok ~0.062, drifted ~0.252): at 0.25 the drifted margin was
        # 0.0023 and the per-(seed, first-index) RNG flipped it when
        # Ray's dynamic block splitting regrouped batches under load
        ok = web_pages_dataset(5000, seed=3).select_columns(["lang"])
        assert drift_check(ok, "lang", LANG_REFERENCE_HIST, threshold=0.15)["passed"]
        drifted = web_pages_dataset(5000, seed=3, drifted=True).select_columns(["lang"])
        assert not drift_check(drifted, "lang", LANG_REFERENCE_HIST, threshold=0.15)["passed"]


# ---------------------------------------------------------------------------
# dedup / similarity / text
# ---------------------------------------------------------------------------


class TestDedup:
    def test_exact_dedup(self):
        from peri_ray.stages.dedup import exact_dedup_keepers, exact_duplicate_ids

        rows = [
            {"doc_id": 1, "text": "hello world"},
            {"doc_id": 2, "text": "unique one"},
            {"doc_id": 3, "text": "hello world"},
            {"doc_id": 4, "text": "hello world"},
        ]
        ds = rd.from_items(rows)
        keep = sorted(r["keep_id"] for r in exact_dedup_keepers(ds).take_all())
        assert keep == [1, 2]
        victims = sorted(r["doc_id"] for r in exact_duplicate_ids(ds).take_all())
        assert victims == [3, 4]

    def test_minhash_finds_near_dups(self):
        from peri_ray.stages.dedup import minhash_lsh_candidates, verify_candidates

        base = "the quick brown fox jumps over the lazy dog " * 10
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("lazy", "sleepy", 1)},  # near-dup
            {"doc_id": 3, "text": "completely different content about physics and math"},
        ]
        ds = rd.from_items(rows)
        cands = minhash_lsh_candidates(ds, bands=16, num_perm=64)
        verified = verify_candidates(ds, cands, threshold=0.7)
        pairs = {(r["id_a"], r["id_b"]) for r in verified.take_all()}
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)

    def test_simhash_near_dups(self):
        from peri_ray.stages.dedup import simhash_near_dups

        rng = np.random.default_rng(3)
        words = [f"w{rng.integers(0, 100000)}" for _ in range(300)]
        base = " ".join(words)
        near = " ".join(words[:-1] + ["changed"])  # one token edit → tiny hamming
        far = " ".join(f"v{rng.integers(0, 100000)}" for _ in range(300))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": far},
        ]
        pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(rd.from_items(rows)).take_all()}
        assert (1, 2) in pairs
        # unrelated docs must NOT pair (regression: uint64 vote wraparound
        # collapsed every odd-shingle-count doc onto the all-ones hash)
        assert all(3 not in p for p in pairs)

    def test_vectorized_hamming_matches_scalar(self):
        # the in-bucket verify's XOR+unpackbits popcount must agree
        # with the scalar hamming64 reference bit-for-bit, including
        # sign-bit (bit 63) differences
        from peri_ray.stages.dedup import hamming64

        rng = np.random.default_rng(17)
        fa = rng.integers(0, 1 << 63, size=200, dtype=np.int64)
        fb = rng.integers(0, 1 << 63, size=200, dtype=np.int64)
        fa[:20] = -fa[:20]  # exercise negative int64 fingerprints
        x = (fa.view(np.uint64) ^ fb.view(np.uint64)).view(
            np.uint8).reshape(-1, 8)
        vec = np.unpackbits(x, axis=1).sum(axis=1, dtype=np.int32)
        ref = np.array([hamming64(int(a), int(b))
                        for a, b in zip(fa, fb)], np.int32)
        assert (vec == ref).all()

    def test_hot_bucket_capped_star_pairs(self):
        # VERDICT r1 item 2: 1K copies of one text must not emit O(n²)
        # pairs — oversized LSH buckets downgrade to star pairs anchored
        # at the min id, preserving cluster connectivity transitively
        from peri_ray.stages.dedup import (
            minhash_lsh_candidates, simhash_near_dups, verify_candidates,
        )

        boiler = "cookie policy please accept our terms and conditions " * 20
        rows = [{"doc_id": i, "text": boiler} for i in range(1000)]
        rows.append({"doc_id": 5000, "text": "completely unrelated physics content"})
        ds = rd.from_items(rows, parallelism=4)

        cands = minhash_lsh_candidates(ds, bands=16, num_perm=64)
        cand_rows = cands.take_all()
        # star pairs per band bucket, deduped → ≤ n-1 pairs, not ~500K
        assert 0 < len(cand_rows) <= 999
        assert all(r["id_a"] == 0 for r in cand_rows)

        verified = verify_candidates(ds, cands, threshold=0.8)
        vrows = verified.take_all()
        assert len(vrows) == len(cand_rows)
        assert all(r["jaccard"] == 1.0 for r in vrows)

        spairs = simhash_near_dups(ds).take_all()
        assert 0 < len(spairs) <= 999
        assert all(5000 not in (r["id_a"], r["id_b"]) for r in spairs)

    def test_verify_dedupe_false_matches_deduped(self):
        # regression (round-2 review): with dedupe=False a pair occurs
        # once per matching band; the slot-keyed pivot must not pair a
        # text with itself (which verified below-threshold pairs at 1.0)
        from peri_ray.stages.dedup import minhash_lsh_candidates, verify_candidates

        base = "the quick brown fox jumps over the lazy dog " * 10
        mid = base.replace("lazy dog", "sly cat").replace("quick", "slow")
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("lazy", "sleepy", 1)},
            {"doc_id": 3, "text": mid},  # similar enough to collide in bands
            {"doc_id": 4, "text": "unrelated text about particle physics"},
        ]
        ds = rd.from_items(rows)
        got = {}
        for dedupe in (True, False):
            c = minhash_lsh_candidates(ds, bands=16, num_perm=64, dedupe=dedupe)
            v = verify_candidates(ds, c, threshold=0.9)
            got[dedupe] = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
                           for r in v.take_all()}
        assert got[True] == got[False]
        assert all(j < 1.0 or a == 1 and b == 2 for a, b, j in got[True])

    def test_verify_candidates_no_candidates(self):
        from peri_ray.stages.dedup import minhash_lsh_candidates, verify_candidates

        rows = [
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta"},
            {"doc_id": 2, "text": "one two three four five six seven eight nine"},
        ]
        ds = rd.from_items(rows)
        cands = minhash_lsh_candidates(ds, bands=16, num_perm=64)
        assert verify_candidates(ds, cands, threshold=0.8).count() == 0

    def test_connected_components_chain_and_star(self):
        from peri_ray.stages.dedup import connected_components

        # chain 1-2-3-4 plus star 10-(11,12), singleton edge 20-21
        pairs = rd.from_items([
            {"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 3},
            {"id_a": 3, "id_b": 4},
            {"id_a": 10, "id_b": 11}, {"id_a": 10, "id_b": 12},
            {"id_a": 20, "id_b": 21},
        ])
        want = {1: 1, 2: 1, 3: 1, 4: 1,
                10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
        # driver union-find fast path
        labels = {r["doc_id"]: r["label"]
                  for r in connected_components(pairs).take_all()}
        assert labels == want
        # distributed label-propagation path (forced)
        labels = {r["doc_id"]: r["label"]
                  for r in connected_components(
                      pairs, driver_threshold=0).take_all()}
        assert labels == want

    def test_near_dedup_victims_end_to_end(self):
        from peri_ray.stages.dedup import near_dedup_victims

        base = "the quick brown fox jumps over the lazy dog " * 10
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("lazy", "sleepy", 1)},
            {"doc_id": 3, "text": base.replace("quick", "rapid", 1)},
            {"doc_id": 4, "text": "completely different content about physics"},
        ]
        victims = sorted(r["doc_id"] for r in near_dedup_victims(
            rd.from_items(rows), threshold=0.7).take_all())
        # 1,2,3 form one near-dup cluster (transitively) → keep 1
        assert victims == [2, 3]

    def test_hamming64_sign_bit(self):
        # regression (ADVICE r2): signed-int64 fingerprints whose bit 63
        # differs must popcount correctly — bin() of a negative XOR
        # renders sign-magnitude and grossly miscounts
        from peri_ray.stages.dedup import hamming64

        fa = int(np.uint64(0x8000_0000_0000_0001).astype(np.int64))  # negative
        fb = 0x0000_0000_0000_0001
        assert hamming64(fa, fb) == 1
        fa2 = int(np.uint64(0xFFFF_FFFF_FFFF_0000).astype(np.int64))
        assert hamming64(fa2, 0) == 48
        assert hamming64(5, 5) == 0

    def test_simhash_fingerprints_distinct_for_unrelated(self):
        from peri_ray.stages.dedup import simhash_fingerprints

        rows = [
            {"doc_id": i, "text": f"document {i} about {t} with unique trailing token zz{i}"}
            for i, t in enumerate(
                ["astronomy stars galaxies", "cooking pasta sauces",
                 "football leagues scores", "quantum chromodynamics lattice",
                 "gardening soil compost", "violin concerto baroque",
                 "databases indexing btrees"]
            )
        ]
        fps = [r["simhash"] for r in simhash_fingerprints(rd.from_items(rows)).take_all()]
        assert len(set(fps)) == len(fps)
        # pairwise hamming must be substantial for unrelated texts
        import numpy as np

        h = np.asarray(fps, np.int64).view(np.uint64)
        for i in range(len(h)):
            for j in range(i + 1, len(h)):
                assert bin(int(h[i] ^ h[j])).count("1") >= 8


class TestSimilarity:
    def test_brute_force_topk_exact(self):
        from peri_ray.stages.similarity import brute_force_topk

        rng = np.random.default_rng(0)
        vecs = rng.normal(size=(200, 16)).astype(np.float32)
        ds = rd.from_items([
            {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)
        ])
        res = brute_force_topk(ds, vecs[:2], k=5)
        # the query vector itself must be its own top-1
        assert res[0][0][0] == 0
        assert res[1][0][0] == 1
        # verify against numpy full ranking
        m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = m[:2] @ m.T
        for qi in range(2):
            expect = set(np.argsort(-sims[qi])[:5].tolist())
            got = {v for v, _ in res[qi]}
            assert got == expect

    def test_embedding_near_dups(self):
        from peri_ray.stages.similarity import embedding_near_dups

        rng = np.random.default_rng(0)
        a = rng.normal(size=16).astype(np.float32)
        rows = [
            {"vec_id": 1, "embedding": a.tolist()},
            {"vec_id": 2, "embedding": (a + 0.01 * rng.normal(size=16).astype(np.float32)).tolist()},
            {"vec_id": 3, "embedding": rng.normal(size=16).astype(np.float32).tolist()},
        ]
        pairs = embedding_near_dups(rd.from_items(rows), threshold=0.99).take_all()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    def test_banded_topk_dedupes_and_finds_close_neighbors(self):
        # a candidate entering several tables must appear ONCE in the
        # top-k (merge dedupe), and near-identical neighbors (the
        # regime banded tables serve) must be found
        from peri_ray.stages.similarity import lsh_bucketed_topk

        rng = np.random.default_rng(3)
        base = rng.normal(size=(2, 24)).astype(np.float32)
        rows = []
        vid = 0
        for qi in range(2):
            for _ in range(5):  # 5 close neighbors per query
                v = base[qi] + 0.05 * rng.normal(size=24).astype(np.float32)
                rows.append({"vec_id": vid, "embedding": v.tolist()})
                vid += 1
        for _ in range(200):
            rows.append({"vec_id": vid,
                         "embedding": rng.normal(size=24).astype(
                             np.float32).tolist()})
            vid += 1
        res = lsh_bucketed_topk(rd.from_items(rows), base, k=5,
                                n_planes=8, n_tables=6, n_probe_bits=0)
        for qi in range(2):
            ids = [v for v, _ in res[qi]]
            assert len(ids) == len(set(ids))  # dedupe across tables
            want = set(range(qi * 5, qi * 5 + 5))
            assert len(set(ids) & want) >= 4  # close neighbors found

    def test_multi_table_lsh_recall_beats_single(self):
        # banded OR-construction: recall 1-(1-p^planes)^tables.  Plant
        # 60 moderately-perturbed near-dup pairs (cosine ~0.96: far
        # enough from 1.0 that single-table 10-plane LSH misses many)
        # and require the 4-table variant to find strictly more, with
        # every found pair exact-verified >= threshold.
        from peri_ray.stages.similarity import embedding_near_dups

        rng = np.random.default_rng(7)
        rows, truth = [], set()
        vid = 0
        for _ in range(60):
            a = rng.normal(size=32)
            a /= np.linalg.norm(a)
            b = a + 0.30 * rng.normal(size=32) / np.sqrt(32)
            b /= np.linalg.norm(b)
            # truth = pairs comfortably ABOVE the 0.93 cut (margin vs
            # the engine's float32 boundary arithmetic)
            if float(a @ b) >= 0.945:
                truth.add((vid, vid + 1))
            rows.append({"vec_id": vid, "embedding": a.astype(np.float32).tolist()})
            rows.append({"vec_id": vid + 1, "embedding": b.astype(np.float32).tolist()})
            vid += 2
        for _ in range(100):  # background noise vectors
            v = rng.normal(size=32)
            rows.append({"vec_id": vid, "embedding": (v / np.linalg.norm(v)).astype(np.float32).tolist()})
            vid += 1
        ds = rd.from_items(rows)
        single = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(
            ds, threshold=0.93, n_planes=10).take_all()}
        multi = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(
            ds, threshold=0.93, n_planes=10, n_tables=6).take_all()}
        assert len(truth) >= 20, "fixture degenerate"
        assert len(multi & truth) > len(single & truth)
        assert len(multi & truth) >= 0.8 * len(truth)


class TestText:
    def test_token_count_matches_duckdb(self):
        import duckdb

        from peri_ray.stages.text import token_count_batch

        t = pa.table({"doc_id": [1, 2, 3], "text": ["a b  c", "  hello ", "one"]})
        out = token_count_batch(t)
        got = dict(zip(out.column("doc_id").to_pylist(), out.column("n_tokens").to_pylist()))
        want = {
            r[0]: r[1]
            for r in duckdb.sql(
                "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) "
                "FROM t GROUP BY ALL"
            ).fetchall()
        }
        assert got == want

    def test_quality_and_langid_run(self):
        from peri_ray.stages.text import QualityScorer, LangId

        t = pa.table({"text": ["the cat and the dog sat on the mat", "der und die das ich nicht"]})
        q = QualityScorer()(t)
        assert q.column("stop_ratio").to_pylist()[0] > 0.3
        l = LangId()(t)
        assert l.column("lang_guess").to_pylist() == ["en", "de"]

    def test_quality_scorer_matches_scalar_reference(self):
        # the vectorized scorer (VERDICT r1 item 6) must produce the
        # exact signals the original per-row regex implementation did
        import re

        from peri_ray.stages.text import QualityScorer, _STOPWORDS

        texts = [
            "the cat and the dog sat on the mat",
            "",
            None,
            "'quoted' words don't break tokenizing!!!",
            "    ",
            "x",
            "a b c d e f g the the the of of in",
            "punctuation!!! ??? ;;; ,,, ... --- ###",
            "MiXeD CaSe Words And THE Of IN",
            "numbers 123 456 mixed with words 789",
        ]
        word_re = re.compile(r"[a-zA-Z']+")
        punct_re = re.compile(r"[^\w\s]")
        exp_stop, exp_mwl, exp_punct = [], [], []
        for t in texts:
            sr = mwl = pr = 0.0
            if t:
                words = word_re.findall(t.lower())
                if words:
                    sr = sum(w in _STOPWORDS for w in words) / len(words)
                    mwl = float(np.mean([len(w) for w in words]))
                pr = len(punct_re.findall(t)) / max(1, len(t))
            exp_stop.append(sr)
            exp_mwl.append(mwl)
            exp_punct.append(pr)

        out = QualityScorer()(pa.table({"text": pa.array(texts, pa.string())}))
        np.testing.assert_allclose(out.column("stop_ratio").to_pylist(), exp_stop, atol=1e-12)
        np.testing.assert_allclose(out.column("mean_word_len").to_pylist(), exp_mwl, atol=1e-12)
        np.testing.assert_allclose(out.column("punct_ratio").to_pylist(), exp_punct, atol=1e-12)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


class TestMultimodal:
    def test_fake_decode_plumbing(self):
        from peri_ray.stages.multimodal import decode_images, media_table_from_binary

        t = media_table_from_binary([1, 2], [b"payload-one", b"payload-two-longer"])
        ds = rd.from_arrow(t)
        out = decode_images(ds, decoder="fake", concurrency=1, batch_size=2).take_all()
        assert len(out) == 2
        assert all(r["width"] > 0 and len(r["features"]) == 16 for r in out)

    def test_real_decoder_raises(self):
        from peri_ray.stages.multimodal import ImageDecoder, media_table_from_binary

        dec = ImageDecoder(decoder="real")
        t = media_table_from_binary([1], [b"x"])
        with pytest.raises(NotImplementedError):
            dec(t)

    def test_uniform_payloads_never_hash(self):
        # review regression: constant-feature payloads (all-zero vs
        # all-0xFF bytes) binarize to all-zero bits and collided at
        # Hamming 0; no-signal rows are dropped instead
        from peri_ray.stages.multimodal import (media_table_from_binary,
                                                perceptual_hash_audio,
                                                perceptual_hash_images)

        ds = rd.from_arrow(media_table_from_binary(
            [1, 2, 3], [b"\x00" * 512, b"\xff" * 512, b"ab" * 256 + b"zz"]))
        img = {r["media_id"] for r in perceptual_hash_images(ds).take_all()}
        aud = {r["media_id"] for r in perceptual_hash_audio(ds).take_all()}
        assert 1 not in img and 2 not in img
        assert 1 not in aud and 2 not in aud
        assert 3 in img and 3 in aud  # non-uniform payload still hashes

    def test_audio_phash_family(self):
        from peri_ray.stages.multimodal import (media_table_from_binary,
                                                perceptual_hash_audio)

        rng = np.random.default_rng(37)
        payloads = [rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
                    for _ in range(6)]
        near = bytearray(payloads[2])
        near[100] ^= 0xFF
        ids = list(range(6)) + [50, 51, 52]
        pls = payloads + [bytes(near), None, b""]
        ds = rd.from_arrow(media_table_from_binary(ids, pls, kind="audio"))
        rows = {r["media_id"]: r["phash"]
                for r in perceptual_hash_audio(ds).take_all()}
        assert 51 not in rows and 52 not in rows
        # one flipped byte of 4096: at most one 64-window energy moves
        x = np.uint64(rows[2]) ^ np.uint64(rows[50])
        ham = bin(int(x)).count("1")
        assert ham <= 2

    def test_phash_near_dups_finds_byte_level_twins(self):
        from peri_ray.stages.dedup import hamming_near_dups_on_hashes
        from peri_ray.stages.multimodal import (media_table_from_binary,
                                                perceptual_hash_images)

        rng = np.random.default_rng(31)
        payloads = [rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
                    for _ in range(10)]
        # planted: exact copy of #0, near-copy of #1 with 4 flipped
        # bytes, plus null/empty rows that must be dropped, not hashed
        near = bytearray(payloads[1])
        for i in (7, 99, 512, 2000):
            near[i] ^= 0xFF
        ids = list(range(10)) + [100, 101, 102, 103]
        pls = payloads + [payloads[0], bytes(near), None, b""]
        ds = rd.from_arrow(media_table_from_binary(ids, pls))
        hashes = perceptual_hash_images(ds, decoder="fake")
        rows = {r["media_id"]: r["phash"] for r in hashes.take_all()}
        assert 102 not in rows and 103 not in rows  # null/empty dropped
        assert rows[100] == rows[0]                 # exact copy: same hash
        pairs = sorted((r["id_a"], r["id_b"]) for r in
                       hamming_near_dups_on_hashes(
                           rd.from_arrow(pa.table({
                               "media_id": pa.array(list(rows), pa.int64()),
                               "phash": pa.array(list(rows.values()),
                                                 pa.int64()),
                           })), "phash", "media_id", bands=4).take_all())
        assert (0, 100) in pairs   # identical payloads
        assert (1, 101) in pairs   # 4 flipped bytes of 4096
        # unrelated random payloads don't pair
        assert all({a, b} in ({0, 100}, {1, 101}) for a, b in pairs)

    def test_frame_sampler(self):
        from peri_ray.stages.multimodal import FrameSampler, media_table_from_binary

        t = media_table_from_binary([7], [b"x" * 3500], kind="video")
        out = FrameSampler(every_ms=1000)(t)
        assert out.column("media_id").to_pylist() == [7, 7, 7, 7]
        assert out.column("frame_ms").to_pylist() == [0, 1000, 2000, 3000]


# ---------------------------------------------------------------------------
# walker + JSON Schema
# ---------------------------------------------------------------------------


class TestWalker:
    SPEC = {
        "a": ("required", "string"),
        "nested": {"b": ("required", ("integer", ("gte", 0)))},
        "c": "float",
    }

    def test_identity(self):
        from peri_ray.walker import walk

        assert walk(self.SPEC, lambda x: x) == self.SPEC

    def test_make_all_optional(self):
        from peri_ray.walker import make_all_optional

        out = make_all_optional(self.SPEC)
        assert out["a"] == "string"
        assert out["nested"]["b"] == ("integer", ("gte", 0))

    def test_drop_and_rename(self):
        from peri_ray.walker import drop_fields, rename_fields

        assert "c" not in drop_fields(self.SPEC, {"c"})
        renamed = rename_fields(self.SPEC, {"a": "alpha"})
        assert "alpha" in renamed and "a" not in renamed


class TestJsonSchema:
    def test_roundtrip(self):
        from peri_ray.jsonschema import to_json_schema, from_json_schema

        spec = {
            "name": ("required", ("string", ("min", 2))),
            "age": ("integer", ("range", (0, 150))),
            "role": ("enum", ["admin", "user"]),
            "tags": ("list", "string", {"max": 5}),
            "score": ("float", ("gt", 0.0)),
        }
        js = to_json_schema(spec)
        assert js["properties"]["name"]["minLength"] == 2
        assert js["required"] == ["name"]
        assert js["properties"]["age"]["minimum"] == 0
        back = from_json_schema(js)
        assert back["name"] == ("required", ("string", ("min", 2)))
        assert back["role"] == ("enum", ["admin", "user"])
        assert back["tags"] == ("list", "string", {"max": 5})

    def test_decoded_spec_validates_data(self):
        from peri_ray import compile_spec
        from peri_ray.jsonschema import from_json_schema

        js = {
            "type": "object",
            "properties": {"n": {"type": "integer", "minimum": 5}},
            "required": ["n"],
        }
        plan = compile_spec(from_json_schema(js))
        out, viols = plan.run_batch(pa.table({"n": [7, 3, None]}))
        assert out.column("valid").to_pylist() == [True, False, False]


# ---------------------------------------------------------------------------
# checkpoint / resume + flagship invariants
# ---------------------------------------------------------------------------


class TestCheckpointResume:
    def test_resume_skips_completed(self, tmp_path):
        from peri_ray.state.checkpoint import CheckpointDir, plan_hash, run_partitioned

        ckpt = CheckpointDir(str(tmp_path / "ck"))
        phash = plan_hash({"a": "string"})
        calls = []

        def process(frag, out_dir):
            calls.append(frag)
            with open(os.path.join(out_dir, "out.txt"), "w") as f:
                f.write(frag)
            return {"rows": 1}

        run_partitioned(["f1", "f2"], ckpt, phash, process)
        assert calls == ["f1", "f2"]
        run_partitioned(["f1", "f2", "f3"], ckpt, phash, process)
        assert calls == ["f1", "f2", "f3"]  # only f3 re-ran
        # plan change invalidates
        run_partitioned(["f1"], ckpt, plan_hash({"a": "integer"}), process)
        assert calls.count("f1") == 2

    def test_sanitization_collisions_stay_distinct(self, tmp_path):
        # regression (round-3 review): '/'->'_' alone mapped 'a/b' and
        # 'a_b' to one manifest/data path — the second fragment read as
        # already-done and was silently skipped
        from peri_ray.state.checkpoint import CheckpointDir, plan_hash, run_partitioned

        ckpt = CheckpointDir(str(tmp_path / "ck"))
        phash = plan_hash({"x": 1})
        calls = []

        def process(frag, out_dir):
            calls.append(frag)
            return {"rows": 1}

        frags = ["data/a/b.parquet", "data/a_b.parquet", "p:q", "p_q"]
        run_partitioned(frags, ckpt, phash, process)
        assert calls == frags
        assert len({m["fragment"] for m in ckpt.read_manifests()}) == 4
        assert len({ckpt.fragment_dir(f) for f in frags}) == 4

    def test_partitioned_flagship_empty_fragment(self, tmp_path):
        # regression (round-2 review): a 0-row fragment must write a
        # rows=0 manifest, not crash on Dataset.sum() returning None
        import pyarrow.parquet as pq

        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        p = str(tmp_path / "empty.parquet")
        pq.write_table(empty, p)
        from peri_ray.pipelines.flagship import partitioned_flagship

        m = partitioned_flagship(
            [p], str(tmp_path / "ck"),
            spec={"doc_id": ("required", "integer"), "text": "string"},
            id_column="doc_id",
        )
        assert len(m) == 1 and m[0]["rows"] == 0 and m[0]["valid_rows"] == 0

    def test_partitioned_flagship_resume(self, tmp_path):
        from peri_ray.pipelines.flagship import partitioned_flagship

        ck = str(tmp_path / "fck")
        m1 = partitioned_flagship(
            [f"{SF}/documents.parquet"], ck,
            spec={"doc_id": ("required", "integer"), "text": ("required", "string")},
            id_column="doc_id",
        )
        assert len(m1) == 1 and m1[0]["rows"] == 500 and m1[0]["valid_rows"] == 500
        # rerun: manifest present → no reprocessing, same manifests returned
        m2 = partitioned_flagship(
            [f"{SF}/documents.parquet"], ck,
            spec={"doc_id": ("required", "integer"), "text": ("required", "string")},
            id_column="doc_id",
        )
        assert m2 == m1


class TestFlagshipInvariant:
    def test_text_byte_identical_per_url(self):
        """input_hint per-row invariant: validation never mutates `text`
        (no default/transform on it) — byte-identical per url."""
        from peri_ray.generate import web_pages_dataset, WEB_PAGES_SPEC, extract_text
        from peri_ray.validate import validate_dataset, validated_dataset

        ds = web_pages_dataset(2000, seed=9).materialize()
        before = {r["url"]: r["text"] for r in ds.take_all()}
        combined = validate_dataset(ds, WEB_PAGES_SPEC, id_column="url")
        after = validated_dataset(combined).take_all()
        assert len(after) == 2000
        for r in after:
            assert before[r["url"]] == r["text"]
            assert extract_text(r["html"]) == r["text"]

    def test_flagship_verdict_shape(self):
        from peri_ray.generate import web_pages_dataset
        from peri_ray.pipelines.flagship import run_flagship

        v = run_flagship(web_pages_dataset(3000, seed=5))
        assert v["rows"] == 3000
        assert v["valid_rows"] + v["invalid_rows"] == 3000
        rule_ids = {c["rule_id"] for c in v["checks"]}
        assert rule_ids == {"unique:url", "ref:lang", "drift:lang:psi"}


class TestFunctionRegistry:
    """MFA-style named callbacks (SURVEY §2.8): specs reference
    registered functions by name, staying serializable."""

    def test_custom_by_name(self):
        from peri_ray.functions import register_function
        from peri_ray import compile_spec

        register_function("is_odd", lambda v: v % 2 == 1 or ("must be odd", {}))
        plan = compile_spec({"n": ("custom", "is_odd")})
        out, viols = plan.run_batch(pa.table({"n": [3, 4]}))
        assert out.column("valid").to_pylist() == [True, False]
        assert viols.column("message").to_pylist() == ["must be odd"]

    def test_transform_by_name(self):
        from peri_ray.functions import register_function, vec
        from peri_ray import compile_spec
        import pyarrow.compute as pc

        register_function("reverse_domain",
                          vec(lambda arr: pc.utf8_reverse(arr)))
        plan = compile_spec({"s": ("string", ("transform", "reverse_domain"))})
        out, _ = plan.run_batch(pa.table({"s": ["abc"]}))
        assert out.column("s").to_pylist() == ["cba"]

    def test_unregistered_name_raises(self):
        from peri_ray import compile_spec

        plan = compile_spec({"n": ("custom", "nope_missing")})
        with pytest.raises(KeyError):
            plan.run_batch(pa.table({"n": [1]}))


class TestSources:
    def test_json_csv_roundtrip(self, tmp_path, ray_session):
        import json

        from peri_ray.sources import read_csv_table, read_json_table

        rows = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
        jp = tmp_path / "t.jsonl"
        jp.write_text("\n".join(json.dumps(r) for r in rows))
        ds = read_json_table(str(jp), columns=["a"])
        assert sorted(r["a"] for r in ds.take_all()) == [1, 2]
        assert ds.schema().names == ["a"]

        cp = tmp_path / "t.csv"
        cp.write_text("a,b\n1,x\n2,y\n")
        ds2 = read_csv_table(str(cp), columns=["b"])
        assert sorted(r["b"] for r in ds2.take_all()) == ["x", "y"]

    def test_partitioned_violation_sink(self, tmp_path, ray_session):
        import ray.data as rd

        from peri_ray.sources import write_violations
        from peri_ray.validate import validate_dataset

        ds = rd.from_items(
            [{"doc_id": 1, "n": -5, "s": "ok"},
             {"doc_id": 2, "n": 3, "s": ""}]
        )
        combined = validate_dataset(
            ds,
            {"n": ("integer", ("gte", 0)), "s": ("string", ("min", 1))},
            mode="permissive", id_column="doc_id",
        )
        out = write_violations(combined, str(tmp_path / "viols"))
        # hive-partitioned by rule_id → per-rule directories
        parts = sorted(p.name for p in (tmp_path / "viols").iterdir())
        assert any("integer.gte" in p for p in parts)
        assert any("string.min" in p for p in parts)
        back = rd.read_parquet(out).take_all()
        assert len(back) == 2


class TestTopKPerGroup:
    def test_matches_row_number_reference(self):
        import duckdb

        from peri_ray.stages.stats import top_k_per_group

        rng = np.random.default_rng(7)
        n = 2000
        t = pa.table({
            "source": pa.array([f"s{int(v)}" for v in rng.integers(0, 12, n)]),
            "doc_id": pa.array(range(n), pa.int64()),
            # few distinct values → heavy ties exercise the tiebreak
            "n_chars": pa.array(rng.integers(0, 9, n), pa.int64()),
        })
        ds = rd.from_arrow(t).repartition(8)  # multi-block: partials merge
        got = sorted(
            (r["source"], r["doc_id"], r["n_chars"])
            for r in top_k_per_group(ds, "source", "n_chars", k=3,
                                     tiebreak="doc_id").take_all())
        want = sorted(duckdb.sql(
            "SELECT source, doc_id, n_chars FROM ("
            "SELECT *, row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id) rn FROM t) WHERE rn <= 3"
        ).fetchall())
        assert got == want

    def test_ascending_and_small_groups(self):
        from peri_ray.stages.stats import top_k_per_group

        t = pa.table({
            "k": pa.array(["a", "a", "b"]),
            "v": pa.array([5, 1, 9], pa.int64()),
            "id": pa.array([1, 2, 3], pa.int64()),
        })
        got = sorted((r["k"], r["v"]) for r in top_k_per_group(
            rd.from_arrow(t), "k", "v", k=1, descending=False,
            tiebreak="id").take_all())
        assert got == [("a", 1), ("b", 9)]


class TestTemporal:
    def test_tumbling_window_counts(self):
        from peri_ray.stages.temporal import tumbling_window_counts

        base = 1_700_000_000 - (1_700_000_000 % 3600)  # hour-aligned
        rows = [
            {"ts": (base + s) * 1_000_000, "event_type": et}
            for s, et in [(0, "a"), (10, "a"), (3599, "b"),
                          (3600, "a"), (7200, None), (7260, None)]
        ]
        t = pa.table({
            "ts": pa.array([r["ts"] for r in rows], pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        })
        out = tumbling_window_counts(rd.from_arrow(t), "ts", "event_type", 3600)
        got = {(r["window_start"], r["event_type"]): r["cnt"]
               for r in out.take_all()}
        assert got == {(base, "a"): 2, (base, "b"): 1,
                       (base + 3600, "a"): 1, (base + 7200, None): 2}

    def test_sessionize_gaps_and_multiuser(self):
        from peri_ray.stages.temporal import sessionize

        M = 1_000_000
        rows = [  # user 1: two sessions (gap 31 min); user 2: one
            (1, 0), (1, 60 * M), (1, (60 + 31 * 60) * M),
            (2, 0), (2, 1800 * M),  # exactly the gap → same session
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([1_700_000_000 * M + r[1] for r in rows],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        out = sessionize(rd.from_arrow(t), "ts", "user_id", gap_s=1800)
        got = sorted((r["user_id"], r["session_id"], r["n_events"])
                     for r in out.take_all())
        assert got == [(1, 1, 2), (1, 2, 1), (2, 1, 2)]

    def test_windowed_drift_flags_only_bad_window(self):
        from peri_ray.stages.temporal import windowed_drift

        M = 1_000_000
        day = 86400
        base = (1_700_000_000 // day) * day
        rows = []
        # day 0: balanced a/b; day 1: all a (drifted)
        for i in range(50):
            rows.append((base + i, "a" if i % 2 else "b"))
        for i in range(50):
            rows.append((base + day + i, "a"))
        t = pa.table({
            "ts": pa.array([r[0] * M for r in rows], pa.int64()).cast(pa.timestamp("us")),
            "k": pa.array([r[1] for r in rows], pa.string()),
        })
        out = windowed_drift(rd.from_arrow(t), "ts", "k",
                             {"a": 0.5, "b": 0.5}, window_s=day,
                             threshold=0.25)
        got = {r["window_start"]: (r["psi"], r["passed"]) for r in out.take_all()}
        assert got[base][1] is True and got[base][0] < 0.01
        assert got[base + day][1] is False and got[base + day][0] > 0.25

    def test_range_join_count_inclusive_bounds(self):
        from peri_ray.stages.temporal import range_join_count

        M = 1_000_000
        T0 = 1_700_000_000 * M
        left = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([7, 7, 9], pa.int64()),
            "ts": pa.array([T0 + 100, T0, T0], pa.int64()).cast(pa.timestamp("us")),
        })
        right = pa.table({
            "k": pa.array([7, 7, 7], pa.int64()),
            "rts": pa.array([T0, T0 + 50, T0 + 100],
                            pa.int64()).cast(pa.timestamp("us")),
        })
        out = range_join_count(rd.from_arrow(left), rd.from_arrow(right),
                               "k", "k", "ts", "rts",
                               lo_offset_s=-0.0001, hi_offset_s=0,
                               left_cols=["event_id"])
        got = {r["event_id"]: r["n_in_range"] for r in out.take_all()}
        # event 1 at T0+100 with lo=-100us: rts in [T0, T0+100] → all 3
        assert got[1] == 3
        # event 2 at T0: rts in [T0-100us, T0] → only rts=T0
        assert got[2] == 1
        # key 9 has no right rows
        assert got[3] == 0

    def test_asof_join_matches_floor(self):
        from peri_ray.stages.temporal import asof_join

        M = 1_000_000
        T0 = 1_700_000_000 * M
        left = pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([7, 7, 7, 9], pa.int64()),
            "ts": pa.array([T0 + 50, T0 + 150, T0 - 10, T0],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        right = pa.table({
            "k": pa.array([7, 7, 8], pa.int64()),
            "rts": pa.array([T0, T0 + 100, T0],
                            pa.int64()).cast(pa.timestamp("us")),
        })
        out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                        "k", "k", "ts", "rts", left_cols=["event_id"])
        got = {r["event_id"]: r["asof_ts"] for r in out.take_all()}
        import datetime

        def us(v):
            return None if v is None else int(v.timestamp() * M) if isinstance(v, datetime.datetime) else v
        assert us(got[1]) == T0          # floor match
        assert us(got[2]) == T0 + 100    # latest ≤ ts
        assert got[3] is None            # before any right row
        assert got[4] is None            # key with no right rows


class TestTemporalFuzz:
    """Property fuzz: each temporal operator must agree with a
    brute-force per-row Python reference on random event streams
    (random keys, clustered + uniform timestamps, duplicates, ties)."""

    from hypothesis import given, settings, strategies as st

    _events = st.lists(
        st.tuples(st.integers(0, 5),                      # key
                  st.integers(0, 10_000)),                # seconds offset
        min_size=1, max_size=120,
    )
    _rights = st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10_000)),
        min_size=0, max_size=80,
    )

    @given(ev=_events)
    @settings(max_examples=20, deadline=None)
    def test_sessionize_fuzz(self, ev):
        from peri_ray.stages.temporal import sessionize

        M = 1_000_000
        T0 = 1_700_000_000 * M
        gap_s = 600
        t = pa.table({
            "user_id": pa.array([k for k, _ in ev], pa.int64()),
            "ts": pa.array([T0 + s * M for _, s in ev],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        got = sorted((r["user_id"], r["session_id"], r["n_events"])
                     for r in sessionize(rd.from_arrow(t), "ts", "user_id",
                                         gap_s=gap_s).take_all())
        # brute-force reference
        want = []
        by_user: dict[int, list[int]] = {}
        for k, s in ev:
            by_user.setdefault(k, []).append(T0 + s * M)
        for k, tss in by_user.items():
            tss.sort()
            sid, n = 1, 1
            for prev, cur in zip(tss, tss[1:]):
                if cur - prev > gap_s * M:
                    want.append((k, sid, n))
                    sid += 1
                    n = 1
                else:
                    n += 1
            want.append((k, sid, n))
        assert got == sorted(want)

    @given(ev=_events, rts=_rights)
    @settings(max_examples=20, deadline=None)
    def test_asof_and_range_fuzz(self, ev, rts):
        from peri_ray.stages.temporal import asof_join, range_join_count

        M = 1_000_000
        T0 = 1_700_000_000 * M
        left = pa.table({
            "event_id": pa.array(range(len(ev)), pa.int64()),
            "k": pa.array([k for k, _ in ev], pa.int64()),
            "ts": pa.array([T0 + s * M for _, s in ev],
                           pa.int64()).cast(pa.timestamp("us")),
        })
        right = pa.table({
            "k": pa.array([k for k, _ in rts], pa.int64()),
            "rts": pa.array([T0 + s * M for _, s in rts],
                            pa.int64()).cast(pa.timestamp("us")),
        })
        lds, rds = rd.from_arrow(left), rd.from_arrow(right)

        got_asof = {r["event_id"]: r["asof_ts"]
                    for r in asof_join(lds, rds, "k", "k", "ts", "rts",
                                       left_cols=["event_id"]).take_all()}
        lo_s, hi_s = -3600, 0
        got_rng = {r["event_id"]: r["n_in_range"]
                   for r in range_join_count(lds, rds, "k", "k", "ts", "rts",
                                             lo_s, hi_s,
                                             left_cols=["event_id"]).take_all()}
        assert set(got_asof) == set(range(len(ev)))
        for i, (k, s) in enumerate(ev):
            lts = T0 + s * M
            cand = [T0 + rs * M for rk, rs in rts if rk == k]
            prior = [c for c in cand if c <= lts]
            want_asof = max(prior) if prior else None
            va = got_asof[i]
            va_us = None if va is None else (
                va if isinstance(va, int) else int(va.timestamp() * M))
            assert va_us == want_asof, (i, k, s)
            want_n = sum(1 for c in cand
                         if lts + lo_s * M <= c <= lts + hi_s * M)
            assert got_rng[i] == want_n, (i, k, s)


class TestWinnowing:
    def test_shared_passages_detected(self):
        from peri_ray.stages.text import shared_passage_pairs

        base = "the quick brown fox jumps over the lazy dog and keeps running far away"
        rows = [
            {"doc_id": 1, "text": base + " ending one"},
            {"doc_id": 2, "text": "entirely different words about mathematics and physics theory"},
            {"doc_id": 3, "text": "prefix text then " + base},
        ]
        pairs = {(r["id_a"], r["id_b"])
                 for r in shared_passage_pairs(rd.from_items(rows), min_shared=3).take_all()}
        assert (1, 3) in pairs
        assert all(2 not in p for p in pairs)

    def test_rolling_hash_matches_sequential_recurrence(self):
        # the vectorized prefix-product hash must equal the classic
        # (h·B − drop·B^(k-1)·B + add) recurrence bit-for-bit
        from peri_ray.stages.text import _rolling_hashes, _WINNOW_B

        rng = np.random.default_rng(11)
        for k in (3, 8, 32):
            for n_bytes in (k, k + 1, 2 * k + 1, 300):
                b = rng.integers(0, 256, n_bytes).astype(np.uint64)
                got = _rolling_hashes(b, k)
                B = np.uint64(_WINNOW_B)
                Bk = B ** np.uint64(k - 1)
                n = n_bytes - k + 1
                with np.errstate(over="ignore"):
                    exp = np.zeros(n, np.uint64)
                    cur = np.uint64(0)
                    for j in range(k):
                        cur = cur * B + b[j]
                    exp[0] = cur
                    for i in range(1, n):
                        cur = (cur - b[i - 1] * Bk) * B + b[i + k - 1]
                        exp[i] = cur
                assert (got == exp).all(), (k, n_bytes)

    def test_winnow_batch_matches_per_doc_reference(self):
        # the whole-batch concatenated implementation must reproduce the
        # original per-doc loop exactly (ids, fingerprints, positions)
        from peri_ray.stages.text import winnow_batch, _rolling_hashes

        def reference(table, k, window):
            ids = table.column("doc_id").to_pylist()
            rows = []
            for did, t in zip(ids, table.column("text").to_pylist()):
                if not t:
                    continue
                b = np.frombuffer(t.encode("utf-8", "ignore"), np.uint8).astype(np.uint64)
                n = len(b) - k + 1
                if n <= 0:
                    continue
                hashes = _rolling_hashes(b, k)
                if n <= window:
                    sel = np.array([int(np.argmin(hashes))])
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
                    mins = sw.argmin(axis=1) + np.arange(len(sw))
                    sel = np.unique(mins)
                rows += [(did, int(np.int64(hashes[s])), int(s)) for s in sel]
            return sorted(rows)

        rng = np.random.default_rng(42)
        vocab = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "ümlaut"]
        texts = []
        for i in range(60):
            n_words = int(rng.integers(0, 40))
            texts.append(" ".join(rng.choice(vocab, n_words)) if n_words else "")
        texts[3] = None
        texts[7] = "ab"      # shorter than k
        texts[11] = "abcdefgh"  # exactly k bytes for k=8
        t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        for k, window in ((8, 16), (5, 4), (8, 64)):
            out = winnow_batch(t, k=k, window=window)
            got = sorted(zip(out.column("doc_id").to_pylist(),
                             out.column("fingerprint").to_pylist(),
                             out.column("pos").to_pylist()))
            assert got == reference(t, k, window), (k, window)

    def test_winnow_self_coverage(self):
        from peri_ray.stages.text import winnow_batch

        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": ["some reasonably long text " * 8]})
        out = winnow_batch(t)
        # winnowing guarantees ≥1 selection per window span
        assert out.num_rows >= 5
        assert set(out.column_names) == {"doc_id", "fingerprint", "pos"}


class TestIVF:
    def test_ivf_matches_brute_force_with_full_probe(self):
        from peri_ray.stages.similarity import brute_force_topk, ivf_topk

        rng = np.random.default_rng(4)
        vecs = rng.normal(size=(300, 16)).astype(np.float32)
        rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
        ds = rd.from_items(rows)
        q = vecs[:2]
        exact = brute_force_topk(rd.from_items(rows), q, k=5)
        # nprobe == n_cells → scans everything → must equal brute force
        approx = ivf_topk(ds, q, k=5, n_cells=4, nprobe=4, train_sample=300)
        for e, a in zip(exact, approx):
            assert [i for i, _ in e] == [i for i, _ in a]

    def test_ivf_partial_probe_recalls_self(self):
        from peri_ray.stages.similarity import ivf_topk

        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(400, 16)).astype(np.float32)
        rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
        ds = rd.from_items(rows)
        q = vecs[10:12]
        res = ivf_topk(ds, q, k=3, n_cells=8, nprobe=2, train_sample=400)
        # the query vector itself lives in its own top cell → rank-0 hit
        assert res[0][0][0] == 10
        assert res[1][0][0] == 11


class TestCrashResume:
    def test_kill_mid_run_then_resume_identical(self, tmp_path):
        """SURVEY §5.2.5: kill after K partitions, rerun, verify the final
        manifests equal a clean run's (idempotent fragments + atomic
        manifest writes)."""
        from peri_ray.state.checkpoint import CheckpointDir, plan_hash, run_partitioned

        phash = plan_hash({"a": "string"})

        def make_process(crash_on=None):
            def process(frag, out_dir):
                if frag == crash_on:
                    raise RuntimeError("simulated worker loss")
                with open(os.path.join(out_dir, "out.txt"), "w") as f:
                    f.write(frag)
                return {"rows": len(frag)}
            return process

        frags = ["f1", "f2", "f3"]
        # crashed run: dies on f2 after f1 completed
        ck1 = CheckpointDir(str(tmp_path / "crashed"))
        with pytest.raises(RuntimeError):
            run_partitioned(frags, ck1, phash, make_process(crash_on="f2"))
        done = {m["fragment"] for m in ck1.read_manifests()}
        assert done == {"f1"}
        # no half-written f2 data dir survives the crash
        assert not os.path.exists(ck1.fragment_dir("f2"))
        # resume with a healthy process
        resumed = run_partitioned(frags, ck1, phash, make_process())
        # clean run for comparison
        ck2 = CheckpointDir(str(tmp_path / "clean"))
        clean = run_partitioned(frags, ck2, phash, make_process())
        strip = lambda ms: sorted(
            {k: v for k, v in m.items() if k != "written_at"}.items() for m in ms
        )
        assert strip(resumed) == strip(clean)


class TestSkewedKeys:
    def test_duplicate_detection_exact_under_zipf_skew(self):
        """Salted/bucketed two-phase aggregation must stay EXACT when one
        key dominates (SURVEY §7.6.7)."""
        import collections

        from peri_ray.stages.checks import duplicate_keys

        rng = np.random.default_rng(11)
        # zipf-ish: key 0 takes ~40% of rows
        keys = [f"host{int(k)}" for k in
                np.minimum(rng.zipf(1.3, size=20_000) - 1, 50)]
        truth = {k: c for k, c in collections.Counter(keys).items() if c > 1}
        ds = rd.from_items([{"k": k} for k in keys])
        got = {r["k"]: r["cnt"] for r in duplicate_keys(ds, "k", n_buckets=16).take_all()}
        assert got == truth


class TestShuffledReferential:
    def test_matches_broadcast_path(self):
        from peri_ray.stages.checks import (
            referential_violations,
            referential_violations_shuffled,
        )

        orders = rd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        nation = rd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey"])
        b = sorted(r["o_orderkey"] for r in referential_violations(
            orders, "o_custkey", nation, columns=["o_orderkey"]).take_all())
        s = sorted(r["o_orderkey"] for r in referential_violations_shuffled(
            orders, "o_custkey", nation, columns=["o_orderkey"]).take_all())
        assert b == s and len(b) > 0

    def test_null_keys_pass(self):
        from peri_ray.stages.checks import referential_violations_shuffled

        fact = rd.from_items([{"k": None, "x": 1}, {"k": "a", "x": 2}, {"k": "z", "x": 3}])
        dim = rd.from_items([{"key": "a"}, {"key": "b"}])
        bad = referential_violations_shuffled(fact, "k", dim, columns=["x"]).take_all()
        assert [(r["k"], r["x"]) for r in bad] == [("z", 3)]


class TestJsonSchemaTemporal:
    def test_temporal_bounds_roundtrip(self):
        import datetime

        from peri_ray.jsonschema import from_json_schema, to_json_schema

        spec = {
            "ts": ("datetime", ("gte", datetime.datetime(1995, 1, 1))),
            "d": ("date", ("range", (datetime.date(2000, 1, 1),
                                     datetime.date(2001, 1, 1)))),
        }
        assert from_json_schema(to_json_schema(spec)) == spec


class TestJsonColumn:
    def test_parse_and_validate_nested(self, ray_session):
        from peri_ray.sources import parse_json_column
        from peri_ray.validate import validate_dataset

        ds = rd.from_items([
            {"id": 1, "props": '{"k": 10}'},
            {"id": 2, "props": '{"k": 99}'},
            {"id": 3, "props": None},
        ])
        parsed = parse_json_column(ds, "props", drop_source=True)
        combined = validate_dataset(
            parsed,
            {"props_parsed": {"k": ("required", ("integer", ("range", (0, 50))))}},
            mode="permissive", id_column="id",
        )
        rows = sorted(combined.take_all(), key=lambda r: r["id"])
        # null parent passes (optional-by-default); k=99 violates range
        assert [r["valid"] for r in rows] == [True, False, True]


class TestTransformAwareUniqueness:
    def test_duplicates_found_post_transform(self, ray_session):
        """Regression: a spec transform on the id column (url
        normalization) must make uniqueness see POST-transform values."""
        from peri_ray.pipelines.flagship import run_flagship

        ds = rd.from_items([
            {"url": "a ", "lang": "en", "text": "x"},
            {"url": "a", "lang": "en", "text": "x"},
            {"url": "b", "lang": "en", "text": "y"},
        ])
        spec = {"url": ("required", ("string", ("transform", "trim"))),
                "lang": ("enum", ["en"]), "text": "string"}
        v = run_flagship(ds, spec=spec, id_column="url",
                         lang_reference={"en": 1.0}, drift_threshold=10.0)
        uniq = next(c for c in v["checks"] if c["rule_id"] == "unique:url")
        assert not uniq["passed"] and uniq["duplicate_keys"] == 1


class TestMultimodalExtended:
    def test_resize_aspect_preserving(self, ray_session):
        from peri_ray.stages.multimodal import (
            decode_images,
            media_table_from_binary,
            resize_images,
        )

        t = media_table_from_binary([1, 2], [b"abcdefgh" * 10, b"zz" * 50])
        ds = rd.from_arrow(t)
        decoded = decode_images(ds, decoder="fake", concurrency=2, batch_size=8)
        resized = resize_images(decoded, max_side=64, concurrency=2).take_all()
        for r in resized:
            assert 1 <= r["resized_w"] <= 64 and 1 <= r["resized_h"] <= 64
            # aspect ratio preserved within rounding
            assert abs(r["resized_w"] / r["resized_h"]
                       - r["width"] / r["height"]) < 0.2

    def test_audio_features_shape(self, ray_session):
        from peri_ray.stages.multimodal import (
            extract_audio_features,
            media_table_from_binary,
        )

        t = media_table_from_binary([1, 2], [bytes(range(200)), b"\x00" * 64],
                                    kind="audio")
        out = extract_audio_features(rd.from_arrow(t), n_frames=4,
                                     concurrency=2).take_all()
        assert all(len(r["audio_features"]) == 4 for r in out)
        assert out[0]["audio_ms"] == 200
        # silence has zero energy
        assert all(v == 0.0 for v in out[1]["audio_features"])


class TestCosineSimilarityJoin:
    def test_vs_brute_force(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.similarity import cosine_similarity_join

        rng = np.random.default_rng(5)
        n, d = 90, 16
        m = rng.normal(size=(n, d))
        # plant some near-duplicates so the join is non-trivial
        m[7] = m[3] + rng.normal(scale=0.05, size=d)
        m[51] = m[20] + rng.normal(scale=0.05, size=d)
        ids = np.arange(100, 100 + n)
        tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                        "embedding": pa.array(list(m.astype(np.float32)),
                                              pa.list_(pa.float32()))})
        ds = rd.from_arrow(tbl)
        # threshold 0.0 included: review regression — np.triu zero-fill
        # used to emit self-pairs and fabricated zero-cos duplicates
        for threshold, block_rows in [(0.5, 16), (0.9, 7), (0.2, 200),
                                      (0.0, 33)]:
            got = {(r["id_a"], r["id_b"])
                   for r in cosine_similarity_join(
                       ds, threshold, block_rows=block_rows).take_all()}
            x = m.astype(np.float32).astype(np.float64)
            xh = x / np.linalg.norm(x, axis=1, keepdims=True)
            s = np.round(xh @ xh.T, 6)
            want = {(int(ids[i]), int(ids[j]))
                    for i in range(n) for j in range(i + 1, n)
                    if s[i, j] >= threshold}
            assert got == want, (threshold, block_rows)


class TestCosineJoinBipartite:
    def test_null_embedding_rows_dropped(self, ray_session):
        # review regression: a null list desynced _as_matrix's reshape
        # from the id column; SQL NULL-comparison semantics drop the
        # row, so the engine must too
        import ray.data as rd

        from peri_ray.stages.similarity import cosine_join_bipartite

        left = pa.table({
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], None, [0.0, 1.0]],
                                  pa.list_(pa.float64()))})
        right = pa.table({
            "vec_id": pa.array([10, 11], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], None],
                                  pa.list_(pa.float64()))})
        got = sorted((r["id_a"], r["id_b"])
                     for r in cosine_join_bipartite(
                         rd.from_arrow(left), rd.from_arrow(right),
                         0.9).take_all())
        assert got == [(1, 10)]

    def test_vs_brute_force_cross_only(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.similarity import cosine_join_bipartite

        rng = np.random.default_rng(13)
        nl, nr, d = 70, 40, 12
        L = rng.normal(size=(nl, d))
        R = rng.normal(size=(nr, d))
        # planted cross hits AND a left-side duplicate pair that must
        # NOT appear (cross pairs only)
        R[5] = L[10] + rng.normal(scale=0.03, size=d)
        R[20] = L[33]
        L[11] = L[10]
        lids = np.arange(nl)
        rids = np.arange(500, 500 + nr)

        def mk(ids, m):
            return rd.from_arrow(pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float64()))}))

        for threshold in (0.9, 0.5, 0.0):
            got = {(r["id_a"], r["id_b"])
                   for r in cosine_join_bipartite(
                       mk(lids, L), mk(rids, R), threshold,
                       max_block_rows=16).take_all()}
            ln = L / np.linalg.norm(L, axis=1, keepdims=True)
            rn = R / np.linalg.norm(R, axis=1, keepdims=True)
            s = np.round(ln @ rn.T, 6)
            want = {(int(lids[i]), int(rids[j]))
                    for i in range(nl) for j in range(nr)
                    if s[i, j] >= threshold}
            assert got == want, threshold
            assert all(a < 500 <= b for a, b in got)


class TestKMeans:
    def test_vs_numpy_reference(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.similarity import kmeans_fit

        rng = np.random.default_rng(3)
        k, iters, d = 4, 6, 8
        centers = rng.normal(scale=4.0, size=(k, d))
        x = np.concatenate([c + rng.normal(size=(30, d)) for c in centers])
        ids = np.arange(len(x), dtype=np.int64)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(x.astype(np.float32)),
                                  pa.list_(pa.float32()))})).repartition(7)
        assigned, cents, inertia = kmeans_fit(ds, k=k, iters=iters,
                                              batch_size=32)
        got = {r["vec_id"]: r["cluster"] for r in assigned.take_all()}

        # numpy reference: same seeding (k smallest ids), same updates
        xx = x.astype(np.float32).astype(np.float64)
        c = xx[:k].copy()
        for _ in range(iters):
            d2 = ((xx[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
            for ci in range(k):
                if (lab == ci).any():
                    c[ci] = xx[lab == ci].mean(axis=0)
        lab = (((xx[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)).argmin(axis=1)
        want = {int(i): int(l) for i, l in zip(ids, lab)}
        assert got == want
        assert np.allclose(cents, c, atol=1e-8)
        assert inertia > 0


class TestQuantization:
    def test_int8_roundtrip_error_bounded(self, ray_session):
        from peri_ray.stages.similarity import dequantize_matrix, quantize_embeddings

        rng = np.random.default_rng(8)
        vecs = rng.normal(0, 3, size=(100, 32)).astype(np.float32)
        rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(100)]
        q = quantize_embeddings(rd.from_items(rows))
        t = pa.concat_tables(list(q.iter_batches(batch_format="pyarrow")))
        back = dequantize_matrix(t.combine_chunks())
        orig = np.stack([np.asarray(r, np.float32) for r in t.column("embedding").to_pylist()])
        # per-element error ≤ scale/2 = max_abs/254
        max_abs = np.abs(orig).max(axis=1)
        assert np.all(np.abs(back - orig) <= (max_abs[:, None] / 254) + 1e-6)
        # cosine similarity preserved to ~1e-3
        def _n(m): return m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = (_n(back) * _n(orig)).sum(axis=1)
        assert cos.min() > 0.999


class TestJsonColumnSchemaStability:
    def test_fixed_type_across_blocks(self, ray_session):
        """Regression: all-null or missing-key blocks must not diverge
        the parsed struct type (inferred once on the driver)."""
        from peri_ray.sources import parse_json_column

        rows = ([{"id": i, "props": '{"k": 1}'} for i in range(20)]
                + [{"id": 100 + i, "props": None} for i in range(20)]
                + [{"id": 200 + i, "props": "{}"} for i in range(20)])
        ds = rd.from_items(rows).repartition(6)
        parsed = parse_json_column(ds, "props", drop_source=True)
        t = pa.concat_tables(list(parsed.iter_batches(batch_format="pyarrow")),
                             promote_options="none")
        assert t.num_rows == 60

    def test_all_null_requires_explicit_type(self, ray_session):
        from peri_ray.sources import parse_json_column

        ds = rd.from_items([{"id": 1, "props": None}])
        with pytest.raises(ValueError, match="value_type"):
            parse_json_column(ds, "props")
        out = parse_json_column(
            ds, "props", value_type=pa.struct([("k", pa.int64())])
        ).take_all()
        assert out[0]["props_parsed"] is None


class TestJsonSchemaRoundTripMore:
    def test_numeric_neq_roundtrip(self):
        import json

        from peri_ray.jsonschema import from_json_schema, to_json_schema

        spec = {"n": ("integer", ("neq", 5))}
        assert from_json_schema(json.loads(json.dumps(to_json_schema(spec)))) == spec

    def test_temporal_literal_roundtrip(self):
        import datetime
        import json

        from peri_ray.jsonschema import from_json_schema, to_json_schema

        spec = {"ts": ("literal", datetime.datetime(2000, 1, 1))}
        blob = json.dumps(to_json_schema(spec))  # must not raise
        assert from_json_schema(json.loads(blob)) == spec


class TestActorPoolValidation:
    def test_actor_pool_matches_task_pool(self, ray_session):
        from peri_ray.validate import validate_dataset

        rows = [{"id": i, "v": i - 5} for i in range(200)]
        spec = {"v": ("integer", ("gte", 0))}
        a = validate_dataset(rd.from_items(rows), spec, mode="permissive",
                             id_column="id", concurrency=2)
        b = validate_dataset(rd.from_items(rows), spec, mode="permissive",
                             id_column="id")
        va = sorted((r["id"], r["valid"]) for r in a.take_all())
        vb = sorted((r["id"], r["valid"]) for r in b.take_all())
        assert va == vb


class TestPartitionedFlagshipMultiFragment:
    def test_three_fragments_with_resume(self, tmp_path, ray_session):
        """Per-fragment lineage over a sharded input: three parquet
        shards, first run completes two then 'crashes'; resume finishes
        the third; manifests carry per-fragment rows/valid counts."""
        import pyarrow.parquet as pq

        from peri_ray.generate import _GenBatch
        from peri_ray.pipelines.flagship import partitioned_flagship
        from peri_ray.state.checkpoint import CheckpointDir

        spec = {"url": ("required", "string"), "lang": "string"}
        shards = []
        for i in range(3):
            t = _GenBatch(7 + i, False)(
                pa.table({"id": pa.array(range(i * 500, i * 500 + 500), pa.int64())})
            ).select(["url", "lang", "text"])
            p = tmp_path / f"shard{i}.parquet"
            pq.write_table(t, p)
            shards.append(str(p))

        ck = str(tmp_path / "ck")
        # first run over only two shards (simulates dying before the third)
        m1 = partitioned_flagship(shards[:2], ck, spec=spec, id_column="url")
        assert len(m1) == 2 and all(m["rows"] == 500 for m in m1)
        done_before = {m["fragment"] for m in m1}

        # resume over all three: only the missing shard processes
        m2 = partitioned_flagship(shards, ck, spec=spec, id_column="url")
        assert len(m2) == 3
        assert {m["fragment"] for m in m2} >= done_before
        # completed fragments kept their original manifests (not re-run)
        by_frag1 = {m["fragment"]: m["written_at"] for m in m1}
        by_frag2 = {m["fragment"]: m["written_at"] for m in m2}
        for f in done_before:
            assert by_frag2[f] == by_frag1[f]
        # outputs on disk per fragment
        ckpt = CheckpointDir(ck)
        for m in m2:
            assert os.path.isdir(ckpt.fragment_dir(m["fragment"]))


class TestActorPoolEagerSpecErrors:
    def test_bad_spec_raises_on_driver(self, ray_session):
        from peri_ray import InvalidSchemaError
        from peri_ray.validate import validate_dataset

        ds = rd.from_items([{"v": 1}])
        with pytest.raises(InvalidSchemaError):
            validate_dataset(ds, {"v": ("integer", ("frobnicate", 1))},
                             concurrency=2)


class TestTextHashIndex:
    def test_build_then_probe(self, ray_session):
        import ray.data as rd

        from peri_ray.state.index import TextHashIndex

        idx = TextHashIndex(n_shards=3)
        base = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["alpha", "beta", None, "gamma"]})).repartition(2)
        assert idx.add_dataset(base) == 4
        assert idx.size() == 3  # null never indexed
        probe = rd.from_arrow(pa.table({
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": ["beta", "delta", None, "alpha"]}))
        got = {r["doc_id"]: r["duplicate"]
               for r in idx.mark_duplicates(probe).take_all()}
        assert got == {10: True, 11: False, 12: False, 13: True}
        # probe is read-only
        assert idx.size() == 3

    def test_concurrent_ingest_exactly_one_winner(self, ray_session):
        import ray.data as rd

        from peri_ray.state.index import TextHashIndex

        idx = TextHashIndex(n_shards=2)
        # 300 rows, 30 distinct texts, many blocks ingesting concurrently
        texts = [f"t{i % 30}" for i in range(300)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(300), pa.int64()),
            "text": texts})).repartition(12)
        idx.add_dataset(ds)
        assert idx.size() == 30


class TestCoerceStrings:
    def test_grammar_edges(self, ray_session):
        import ray.data as rd

        from peri_ray.sources import coerce_string_columns

        ints = ["123", "+5", "-0", "1e5", " 42", "42 ", "",
                "12345678901234567890123", None, "007"]
        floats = ["3.14", ".5", "10.", "-2.0", "1e3", "15", None, "1.2.3"]
        bools = ["true", "false", "True", "1", "", None, "truex", "false"]
        n = max(len(ints), len(floats), len(bools))
        ints += [None] * (n - len(ints))
        floats += [None] * (n - len(floats))
        bools += [None] * (n - len(bools))
        ds = rd.from_arrow(pa.table({"i": pa.array(ints, pa.string()),
                                     "f": pa.array(floats, pa.string()),
                                     "b": pa.array(bools, pa.string())}))
        out = coerce_string_columns(
            ds, {"i": "integer", "f": "float", "b": "boolean"}).take_all()
        got_i = [r["i"] for r in out]
        got_f = [r["f"] for r in out]
        got_b = [r["b"] for r in out]
        assert got_i == [123, 5, 0, None, None, None, None, None, None, 7]
        assert got_f == [3.14, None, None, -2.0, None, 15.0, None, None,
                         None, None]
        assert got_b == [True, False, None, None, None, None, None, False,
                         None, None]


class TestJoinAuto:
    def test_right_outer(self, ray_session):
        import pytest
        import ray.data as rd

        from peri_ray.stages.joins import broadcast_join, hash_join

        fact = rd.from_arrow(pa.table({
            "fk": pa.array([1, 2, 2], pa.int64()),
            "x": pa.array([10, 20, 21], pa.int64())}))
        dim = rd.from_arrow(pa.table({
            "k": pa.array([2, 3], pa.int64()),
            "label": ["b", "c"]}))
        got = sorted(((r["fk"], r["x"], r["label"]) for r in hash_join(
            fact, dim, "fk", "k", ["x"], ["label"], how="right").take_all()),
            key=str)
        assert got == sorted([(2, 20, "b"), (2, 21, "b"), (3, None, "c")],
                             key=str)
        with pytest.raises(ValueError):
            broadcast_join(fact, dim, "fk", "k", ["label"], how="right")

    def test_strategies_agree(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.joins import join_auto

        fact = rd.from_arrow(pa.table({
            "fk": pa.array([1, 2, 2, 3, 9, None], pa.int64()),
            "x": pa.array([10, 20, 21, 30, 90, 0], pa.int64())}))
        dim = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "label": ["a", "b", "c", "d"]}))

        for how in ("inner", "left", "semi", "anti"):
            small = join_auto(fact, dim, "fk", "k", ["x"], ["label"], how=how)
            forced = join_auto(fact, dim, "fk", "k", ["x"], ["label"],
                               how=how, broadcast_max_rows=0)
            a = sorted(((r["fk"], r["x"], r.get("label"))
                        for r in small.take_all()), key=str)
            b = sorted(((r["fk"], r["x"], r.get("label"))
                        for r in forced.take_all()), key=str)
            assert a == b, how


class TestDatasetDiff:
    def test_empty_sides(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.joins import dataset_diff

        full = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                       "v": ["a", "b"]}))
        empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                        "v": pa.array([], pa.string())}))
        assert {r["k"]: r["status"]
                for r in dataset_diff(full, empty, "k", ["v"]).take_all()} \
            == {1: "removed", 2: "removed"}
        assert {r["k"]: r["status"]
                for r in dataset_diff(empty, full, "k", ["v"]).take_all()} \
            == {1: "added", 2: "added"}

    def test_fuzz_vs_brute_force(self, ray_session):
        import random

        import ray.data as rd

        from peri_ray.stages.joins import dataset_diff

        rng = random.Random(21)
        for trial in range(3):
            keys_a = rng.sample(range(200), 80)
            keys_b = rng.sample(range(200), 80)
            va = {k: (rng.choice(["x", "y", None]), rng.randint(0, 3))
                  for k in keys_a}
            vb = {k: (rng.choice(["x", "y", None]), rng.randint(0, 3))
                  for k in keys_b}
            a = rd.from_arrow(pa.table({
                "k": pa.array(keys_a, pa.int64()),
                "s": pa.array([va[k][0] for k in keys_a], pa.string()),
                "i": pa.array([va[k][1] for k in keys_a], pa.int64()),
            })).repartition(4)
            b = rd.from_arrow(pa.table({
                "k": pa.array(keys_b, pa.int64()),
                "s": pa.array([vb[k][0] for k in keys_b], pa.string()),
                "i": pa.array([vb[k][1] for k in keys_b], pa.int64()),
            })).repartition(3)
            want = {}
            for k in set(keys_a) | set(keys_b):
                if k not in vb:
                    want[k] = "removed"
                elif k not in va:
                    want[k] = "added"
                elif va[k] != vb[k]:
                    want[k] = "changed"
            got = {r["k"]: r["status"]
                   for r in dataset_diff(a, b, "k", ["s", "i"]).take_all()}
            assert got == want, trial

    def test_semantics(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.joins import dataset_diff

        a = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": ["same", "old", None, "x", None],
            "w": pa.array([10, 20, 30, 40, 50], pa.int64()),
        })).repartition(3)
        b = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 5, 9], pa.int64()),
            "v": ["same", "new", None, None, "born"],
            "w": pa.array([10, 20, 31, 50, 90], pa.int64()),
        })).repartition(2)
        got = {r["k"]: r["status"]
               for r in dataset_diff(a, b, "k", ["v", "w"]).take_all()}
        # k=1 identical → absent; k=3 null v both but w differs → changed;
        # k=5 null v both, w same → absent
        assert got == {2: "changed", 3: "changed", 4: "removed", 9: "added"}


class TestJoins:
    def _fact(self):
        return rd.from_arrow(pa.table({
            "fk": pa.array([1, 2, 2, 3, None, 9], pa.int64()),
            "payload": ["a", "b", "c", "d", "e", "f"],
        })).repartition(3)

    def _dim(self):
        return rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "name": ["one", "two", "three", "four"],
        }))

    def test_broadcast_inner(self):
        from peri_ray.stages.joins import broadcast_join

        out = broadcast_join(self._fact(), self._dim(), "fk", "k",
                             ["k", "name"]).take_all()
        got = sorted((r["payload"], r["name"]) for r in out)
        assert got == [("a", "one"), ("b", "two"), ("c", "two"), ("d", "three")]

    def test_broadcast_left_keeps_unmatched_with_nulls(self):
        from peri_ray.stages.joins import broadcast_join

        out = broadcast_join(self._fact(), self._dim(), "fk", "k",
                             ["k", "name"], how="left").take_all()
        by_payload = {r["payload"]: r["name"] for r in out}
        assert len(out) == 6
        assert by_payload["e"] is None and by_payload["f"] is None
        assert by_payload["c"] == "two"

    def test_broadcast_semi_anti(self):
        from peri_ray.stages.joins import broadcast_join

        semi = broadcast_join(self._fact(), self._dim(), "fk", "k",
                              ["k"], how="semi").take_all()
        assert sorted(r["payload"] for r in semi) == ["a", "b", "c", "d"]
        anti = broadcast_join(self._fact(), self._dim(), "fk", "k",
                              ["k"], how="anti").take_all()
        # null fk passes (FK semantics), 9 is the only true orphan
        assert sorted(r["payload"] for r in anti) == ["f"]

    def test_broadcast_dim_dedupe_is_deterministic(self):
        from peri_ray.stages.joins import broadcast_join

        dup_dim = rd.from_arrow(pa.table({
            "k": pa.array([2, 2, 1], pa.int64()),
            "name": ["zz", "aa", "one"],
        }))
        out = broadcast_join(self._fact(), dup_dim, "fk", "k",
                             ["k", "name"]).take_all()
        # first row per key after sort: (2, "aa") wins over (2, "zz")
        assert {r["name"] for r in out if r["fk"] == 2} == {"aa"}

    def test_hash_join_matches_broadcast(self):
        from peri_ray.stages.joins import broadcast_join, hash_join

        fact, dim = self._fact(), self._dim()
        h = hash_join(fact, dim, "fk", "k", ["payload"], ["name"],
                      how="inner", n_buckets=4).take_all()
        b = broadcast_join(self._fact(), self._dim(), "fk", "k",
                           ["k", "name"]).take_all()
        assert sorted((r["payload"], r["name"]) for r in h) == \
            sorted((r["payload"], r["name"]) for r in b)

    def test_hash_join_left_and_semi_and_anti(self):
        from peri_ray.stages.joins import hash_join

        left = hash_join(self._fact(), self._dim(), "fk", "k",
                         ["payload"], ["name"], how="left",
                         n_buckets=4).take_all()
        assert len(left) == 6
        assert {r["payload"]: r["name"] for r in left}["f"] is None
        semi = hash_join(self._fact(), self._dim(), "fk", "k",
                         ["payload"], [], how="semi", n_buckets=4).take_all()
        assert sorted(r["payload"] for r in semi) == ["a", "b", "c", "d"]
        anti = hash_join(self._fact(), self._dim(), "fk", "k",
                         ["payload"], [], how="anti", n_buckets=4).take_all()
        assert sorted(r["payload"] for r in anti) == ["f"]

    def test_hash_join_many_to_many(self):
        from peri_ray.stages.joins import hash_join

        left = rd.from_arrow(pa.table({"k": pa.array([7, 7], pa.int64()),
                                       "l": ["x", "y"]}))
        right = rd.from_arrow(pa.table({"k": pa.array([7, 7, 7], pa.int64()),
                                        "r": ["p", "q", "s"]}))
        out = hash_join(left, right, "k", "k", ["l"], ["r"],
                        how="inner", n_buckets=2).take_all()
        assert len(out) == 6  # full m×n fan-out per key


class TestGroupedCentroids:
    def test_centroids_and_malformed_skip(self):
        from peri_ray.stages.similarity import grouped_centroids

        t = pa.table({
            "label": pa.array([0, 0, 1, None, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 3.0], [3.0, 5.0], [2.0, 2.0], [9.0, 9.0], [1.0]],
                pa.list_(pa.float32())),
        })
        out = grouped_centroids(rd.from_arrow(t).repartition(2),
                                dim=2, label_col="label")
        rows = {r["label"]: r for r in out.to_pylist()}
        assert rows[0]["cnt"] == 2 and rows[0]["centroid"] == [2.0, 4.0]
        assert rows[1]["cnt"] == 1 and rows[1]["centroid"] == [2.0, 2.0]
        # null label + wrong-dim vector both skipped and counted
        assert rows[0]["skipped"] == 2

    def test_element_null_rows_skipped(self):
        from peri_ray.stages.similarity import grouped_centroids

        t = pa.table({
            "label": pa.array([5, 5], pa.int64()),
            "embedding": pa.array([[1.0, None], [4.0, 6.0]],
                                  pa.list_(pa.float64())),
        })
        out = grouped_centroids(rd.from_arrow(t), dim=2).to_pylist()
        assert out[0]["cnt"] == 1 and out[0]["centroid"] == [4.0, 6.0]
        assert out[0]["skipped"] == 1


class TestSlidingWindows:
    def test_overlap_counts(self):
        from peri_ray.stages.temporal import sliding_window_counts

        # events at 00:30 and 01:30; 2h windows sliding hourly
        ts = pa.array([1800 * 1_000_000, 5400 * 1_000_000],
                      pa.timestamp("us"))
        t = pa.table({"ts": ts, "k": ["a", "a"]})
        out = sliding_window_counts(rd.from_arrow(t), "ts", "k",
                                    window_s=7200, slide_s=3600).take_all()
        got = {r["window_start"]: r["cnt"] for r in out}
        # window [-3600,3600) sees t=1800; [0,7200) sees both; [3600,10800) sees 5400
        assert got == {-3600: 1, 0: 2, 3600: 1}

    def test_equals_tumbling_when_no_overlap(self):
        from peri_ray.stages.temporal import (sliding_window_counts,
                                              tumbling_window_counts)

        rng = np.random.default_rng(3)
        ts = pa.array((rng.integers(0, 86400, 500) * 1_000_000).astype("int64"),
                      pa.timestamp("us"))
        t = pa.table({"ts": ts, "k": rng.choice(["x", "y"], 500)})
        ds = rd.from_arrow(t).repartition(4)
        slide = sorted((r["window_start"], r["k"], r["cnt"]) for r in
                       sliding_window_counts(ds, "ts", "k", 3600, 3600).take_all())
        tumb = sorted((r["window_start"], r["k"], r["cnt"]) for r in
                      tumbling_window_counts(ds, "ts", "k", 3600).take_all())
        assert slide == tumb

    def test_window_must_divide(self):
        from peri_ray.stages.temporal import sliding_window_counts

        with pytest.raises(ValueError):
            sliding_window_counts(rd.from_arrow(pa.table({"ts": [], "k": []})),
                                  "ts", "k", window_s=5000, slide_s=3600)


class TestStratifiedSample:
    def test_exact_per_stratum_counts_and_determinism(self):
        from peri_ray.stages.stats import stratified_sample

        t = pa.table({
            "doc_id": pa.array(range(100), pa.int64()),
            "lang": pa.array(["en"] * 60 + ["de"] * 35 + ["pt"] * 5),
        })
        a = stratified_sample(rd.from_arrow(t).repartition(5),
                              "lang", k=10, id_col="doc_id").take_all()
        b = stratified_sample(rd.from_arrow(t).repartition(2),
                              "lang", k=10, id_col="doc_id").take_all()
        by_lang: dict = {}
        for r in a:
            by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
        assert {k: len(v) for k, v in by_lang.items()} == \
            {"en": 10, "de": 10, "pt": 5}
        # identical selection regardless of block layout
        assert sorted((r["lang"], r["doc_id"]) for r in a) == \
            sorted((r["lang"], r["doc_id"]) for r in b)

    def test_seed_changes_selection(self):
        from peri_ray.stages.stats import stratified_sample

        t = pa.table({
            "doc_id": pa.array(range(50), pa.int64()),
            "lang": pa.array(["en"] * 50),
        })
        a = {r["doc_id"] for r in stratified_sample(
            rd.from_arrow(t), "lang", 10, "doc_id", seed=1).take_all()}
        b = {r["doc_id"] for r in stratified_sample(
            rd.from_arrow(t), "lang", 10, "doc_id", seed=2).take_all()}
        assert a != b


class TestTermDF:
    def test_df_counts_distinct_docs(self):
        from peri_ray.stages.text import term_document_frequency

        t = pa.table({"text": ["a b a", "b c", None, "  a  "]})
        out = term_document_frequency(rd.from_arrow(t).repartition(2)).take_all()
        got = {r["term"]: r["df"] for r in out}
        assert got == {"a": 2, "b": 2, "c": 1}

    def test_min_df_prunes_tail(self):
        from peri_ray.stages.text import term_document_frequency

        t = pa.table({"text": ["x y", "x z", "x"]})
        out = term_document_frequency(rd.from_arrow(t), min_df=2).take_all()
        assert {r["term"]: r["df"] for r in out} == {"x": 3}

    def test_matches_duckdb_on_real_docs(self):
        import duckdb

        from peri_ray.stages.text import term_document_frequency

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
        got = {r["term"]: r["df"]
               for r in term_document_frequency(ds).take_all()}
        want = {r[0]: r[1] for r in duckdb.sql(
            "SELECT word, count(DISTINCT doc_id) FROM (SELECT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS word "
            f"FROM '{SF}/documents.parquet' WHERE text IS NOT NULL) "
            "GROUP BY word").fetchall()}
        assert got == want


class TestCentsSums:
    def test_layout_independent_and_sql_round(self):
        # sum_cents must be identical at any block layout (integer
        # adds) and use SQL ROUND ties (half away from zero)
        import duckdb

        from peri_ray.stages.stats import exact_stats_table

        vals = [0.005, 0.015, -0.005, 1.13, 2.87, 0.125, 1e8 + 0.005,
                None] + [round(0.01 * i, 2) for i in range(500)]
        t = pa.table({"v": pa.array(vals, pa.float64())})
        want = duckdb.sql(
            "SELECT CAST(sum(CAST(ROUND(v * 100) AS BIGINT)) AS BIGINT) "
            "FROM t").fetchone()[0]
        for parts in (1, 4, 13):
            out = exact_stats_table(rd.from_arrow(t).repartition(parts),
                                    ["v"], cents_sums=True)
            assert out.column("sum_cents").to_pylist() == [want], parts


class TestGroupedStats:
    def test_merge_across_blocks_with_nulls(self):
        from peri_ray.stages.stats import grouped_stats

        t = pa.table({
            "g": ["a", "a", "b", "b", "a"],
            "v": pa.array([1.0, None, 5.0, 3.0, 10.0], pa.float64()),
        })
        out = grouped_stats(rd.from_arrow(t).repartition(3), "g", ["v"])
        rows = {r["key"]: r for r in out.to_pylist()}
        assert rows["a"]["cnt"] == 2 and rows["a"]["null_count"] == 1
        assert rows["a"]["min_v"] == 1.0 and rows["a"]["max_v"] == 10.0
        assert rows["a"]["sum_v"] == 11.0
        assert rows["b"]["min_v"] == 3.0 and rows["b"]["sum_v"] == 8.0

    def test_all_null_group(self):
        from peri_ray.stages.stats import grouped_stats

        t = pa.table({"g": ["z", "z"],
                      "v": pa.array([None, None], pa.float64())})
        out = grouped_stats(rd.from_arrow(t), "g", ["v"]).to_pylist()
        assert out[0]["cnt"] == 0 and out[0]["null_count"] == 2
        assert out[0]["min_v"] is None and out[0]["sum_v"] is None

    def test_cents_sums_exact_int64(self):
        from peri_ray.stages.stats import grouped_stats

        # 0.125 is a dyadic .xx5 tie: half-away rounds to 13 cents
        # (numpy/Arrow default half-even would give 12)
        t = pa.table({
            "g": ["a", "a", "b"],
            "v": pa.array([0.125, 1.10, 2.00], pa.float64()),
        })
        out = grouped_stats(rd.from_arrow(t).repartition(2), "g", ["v"],
                            cents_sums=True)
        assert out.schema.field("sum_v").type == pa.int64()
        rows = {r["key"]: r for r in out.to_pylist()}
        assert rows["a"]["sum_v"] == 13 + 110
        assert rows["b"]["sum_v"] == 200
        # min/max stay on the raw (un-scaled) values
        assert rows["a"]["min_v"] == 0.125 and rows["a"]["max_v"] == 1.10


class TestNumericHistogram:
    def test_bins_merge_across_blocks(self):
        from peri_ray.stages.stats import numeric_histogram

        t = pa.table({"v": pa.array([-5.0, 1.0, 9.9, 10.0, 25.0, None],
                                    pa.float64())})
        out = numeric_histogram(rd.from_arrow(t).repartition(3), "v", 10.0)
        got = {r["bin"]: r["cnt"] for r in out.to_pylist()}
        assert got == {-1: 1, 0: 2, 1: 1, 2: 1}


class TestZscoreOutliers:
    def test_flags_extreme_rows_only(self):
        from peri_ray.stages.stats import zscore_outliers

        vals = [10.0] * 50 + [1000.0]
        t = pa.table({"id": pa.array(range(51), pa.int64()),
                      "v": pa.array(vals, pa.float64())})
        out = zscore_outliers(rd.from_arrow(t).repartition(4), "v", "id",
                              threshold=3.0).take_all()
        assert [r["id"] for r in out] == [50]

    def test_null_and_empty(self):
        from peri_ray.stages.stats import zscore_outliers

        t = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "v": pa.array([None, None], pa.float64())})
        out = zscore_outliers(rd.from_arrow(t), "v", "id").take_all()
        assert out == []


class TestJaccardSimilarityJoin:
    """Exact AllPairs prefix-filtered set-similarity join
    (dedup.jaccard_similarity_join): recall AND precision vs brute
    force, plus degenerate inputs."""

    @staticmethod
    def _brute(docs, threshold):
        import re

        ws = re.compile(r"\s+")

        def bg(s):
            tk = ws.split(s.strip())
            return {x + " " + y for x, y in zip(tk, tk[1:])}

        sets = [(i, bg(x)) for i, x in docs if x is not None]
        sets = [(i, s) for i, s in sets if s]
        out = []
        for a in range(len(sets)):
            ia, sa = sets[a]
            for b in range(a + 1, len(sets)):
                ib, sb = sets[b]
                j = len(sa & sb) / len(sa | sb)
                if j >= threshold:
                    out.append((min(ia, ib), max(ia, ib), round(j, 6)))
        return sorted(out)

    @staticmethod
    def _run(docs, threshold):
        from peri_ray.stages.dedup import jaccard_similarity_join

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }))
        got = jaccard_similarity_join(ds, threshold=threshold)
        return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 6))
                      for r in got.take_all())

    def test_random_corpus_matches_brute_force(self):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for i in range(60):
            n = int(rng.integers(5, 30))
            docs.append((i, " ".join(rng.choice(vocab, n))))
        # planted near-dups: copies with small edits
        for j, (src, mut) in enumerate([(3, 0), (10, 1), (10, 2), (25, 3)]):
            tk = docs[src][1].split()
            for _ in range(mut):
                tk[int(rng.integers(0, len(tk)))] = str(rng.choice(vocab))
            docs.append((100 + j, " ".join(tk)))
        got = self._run(docs, 0.5)
        want = self._brute(docs, 0.5)
        assert got == want
        assert len(want) >= 4  # the planted dups actually show up

    def test_degenerate_docs(self):
        docs = [
            (1, "alpha beta gamma alpha beta"),
            (2, "alpha beta gamma alpha beta"),   # exact dup -> J=1.0
            (3, "single"),                        # no bigrams
            (4, ""),                              # empty
            (5, "   "),                           # whitespace only
            (6, None),                            # null text
            (7, "alpha beta"),                    # one bigram
            (8, "alpha  beta"),                   # multi-space same bigram
        ]
        got = self._run(docs, 0.5)
        want = self._brute(docs, 0.5)
        assert got == want
        assert (1, 2, 1.0) in got
        assert (7, 8, 1.0) in got  # \s+ collapses runs, both sides agree

    def test_high_threshold_prefix_still_complete(self):
        # t=0.9: prefix length ~ n/10 — the sharpest recall stress
        rng = np.random.default_rng(11)
        vocab = [f"t{i}" for i in range(8)]
        base = " ".join(rng.choice(vocab, 40))
        docs = [(0, base)]
        tk = base.split()
        tk[5] = "t0"
        docs.append((1, " ".join(tk)))          # near-identical
        docs.append((2, " ".join(reversed(tk))))  # same tokens, new bigrams
        for i in range(3, 20):
            docs.append((i, " ".join(rng.choice(vocab, 30))))
        assert self._run(docs, 0.9) == self._brute(docs, 0.9)


class TestJaccardJoinBipartite:
    """Cross-corpus (R-S) exact similarity join
    (dedup.jaccard_similarity_join_bipartite): recall/precision vs a
    brute-force cross join, and NO same-side pairs."""

    @staticmethod
    def _brute_cross(left, right, threshold):
        import re

        ws = re.compile(r"\s+")

        def s(x):
            tk = ws.split(x.strip())
            return {a + " " + b for a, b in zip(tk, tk[1:])}

        out = []
        for la, ta in left:
            if ta is None or not s(ta):
                continue
            for rb, tb in right:
                if tb is None or not s(tb):
                    continue
                j = len(s(ta) & s(tb)) / len(s(ta) | s(tb))
                if j >= threshold:
                    out.append((la, rb, round(j, 6)))
        return sorted(out)

    @staticmethod
    def _run(left, right, threshold):
        from peri_ray.stages.dedup import jaccard_similarity_join_bipartite

        def mk(docs):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }))

        got = jaccard_similarity_join_bipartite(mk(left), mk(right),
                                                threshold=threshold)
        return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 6))
                      for r in got.take_all())

    def test_cross_pairs_match_brute_force_no_same_side(self):
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(10)]
        left = [(i, " ".join(rng.choice(vocab, int(rng.integers(5, 25)))))
                for i in range(40)]
        # same-side near-dups on the LEFT: must never be reported
        left.append((90, left[0][1]))
        left.append((91, left[0][1] + " w0"))
        # right side: copies of some left docs (cross hits), fresh docs
        right = [(200 + i, left[i][1]) for i in (2, 7, 11)]
        right += [(300, right[0][1])]  # same-side dup on the RIGHT
        right += [(400 + i,
                   " ".join(rng.choice(vocab, int(rng.integers(5, 25)))))
                  for i in range(20)]
        got = self._run(left, right, 0.6)
        want = self._brute_cross(left, right, 0.6)
        assert got == want
        # the planted cross copies are found…
        assert all(any(g[0] == i and g[1] == 200 + i for g in got)
                   for i in (2, 7, 11))
        # …and ids in each output column come from the right side space
        assert all(a < 200 and b >= 200 for a, b, _ in got)

    def test_id_offset_guard_raises(self):
        import pytest as _pt

        from peri_ray.stages.dedup import (BIPARTITE_ID_OFFSET,
                                           jaccard_similarity_join_bipartite)

        big = rd.from_arrow(pa.table({
            "doc_id": pa.array([BIPARTITE_ID_OFFSET + 1], pa.int64()),
            "text": pa.array(["alpha beta gamma"], pa.string()),
        }))
        ok = rd.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["alpha beta gamma"], pa.string()),
        }))
        with _pt.raises(Exception):
            jaccard_similarity_join_bipartite(big, ok).take_all()

    def test_degenerate_sides(self):
        # empty/null/no-bigram docs on either side never pair
        left = [(1, "alpha beta gamma delta epsilon"), (2, None), (3, "x")]
        right = [(10, "alpha beta gamma delta epsilon"), (11, ""), (12, "   ")]
        got = self._run(left, right, 0.8)
        assert got == [(1, 10, 1.0)]


class TestMinhashIndexProbe:
    """Persisted signature index + probe (dedup.write_minhash_index /
    probe_minhash_index): probe results must equal the direct
    two-sided computation over the same signatures."""

    @staticmethod
    def _mk(docs):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }))

    def _expected(self, base, new, bands, threshold):
        """In-process twin built from the SAME library primitives."""
        from peri_ray.stages.dedup import MinHasher, _explode_bands

        mh = MinHasher()
        sigs = {}
        for side, docs in (("b", base), ("n", new)):
            t = pa.table({"doc_id": pa.array([i for i, _ in docs], pa.int64()),
                          "text": pa.array([x for _, x in docs], pa.string())})
            out = mh(t)
            mat = out.column("minhash").combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).reshape(len(docs), -1)
            bt = _explode_bands(out, "doc_id", bands)
            buckets = {}
            for i, (bnd, bh) in enumerate(zip(bt.column("band").to_pylist(),
                                              bt.column("band_hash").to_pylist())):
                did = bt.column("doc_id").to_pylist()[i]
                buckets.setdefault((bnd, bh), set()).add(did)
            sigs[side] = ({i: mat[r] for r, (i, _) in enumerate(docs)}, buckets)
        (bs, bb), (ns, nb) = sigs["b"], sigs["n"]
        cands = set()
        for key, bids in bb.items():
            nids = nb.get(key)
            if nids:
                cands.update((a, c) for a in bids for c in nids)
        out = []
        for a, c in cands:
            est = float((bs[a] == ns[c]).mean())
            if est >= threshold:
                out.append((a, c, est))
        return sorted(out)

    def test_probe_equals_direct(self, tmp_path):
        from peri_ray.stages.dedup import (probe_minhash_index,
                                           write_minhash_index)

        rng = np.random.default_rng(21)
        vocab = [f"w{i}" for i in range(12)]
        base = [(i, " ".join(rng.choice(vocab, int(rng.integers(8, 30)))))
                for i in range(40)]
        # new crawl: exact recrawls of 3 base docs + fresh pages
        new = [(500 + i, base[i][1]) for i in (1, 4, 9)]
        new += [(600 + i, " ".join(rng.choice(vocab, int(rng.integers(8, 30)))))
                for i in range(15)]
        idx = str(tmp_path / "mh_idx")
        write_minhash_index(self._mk(base), idx)
        got = sorted(
            (r["id_a"], r["id_b"], r["est_jaccard"])
            for r in probe_minhash_index(self._mk(new), idx, bands=8,
                                         threshold=0.5).take_all())
        want = self._expected(base, new, bands=8, threshold=0.5)
        assert got == want
        # exact recrawls agree on every slot and are all flagged
        for i in (1, 4, 9):
            assert (i, 500 + i, 1.0) in got

    def test_empty_and_null_texts_never_flag(self, tmp_path):
        # review regression: null and '' degenerate to the same single
        # empty shingle; unverified signature agreement scored any two
        # of them est=1.0 until the signing maps dropped them
        from peri_ray.stages.dedup import (probe_minhash_index,
                                           write_minhash_index)

        base = [(1, None), (2, ""), (3, "alpha beta gamma delta epsi")]
        new = [(100, ""), (101, None), (102, "zeta eta theta iota kappa")]
        idx = str(tmp_path / "mh_idx3")
        write_minhash_index(self._mk(base), idx)
        got = probe_minhash_index(self._mk(new), idx,
                                  threshold=0.5).take_all()
        assert got == []

    def test_negative_new_ids_raise(self, tmp_path):
        # review regression: a negative right id shifts to a value
        # still below the offset and would silently land on the LEFT
        # side — the guard must raise instead
        import pytest as _pt

        from peri_ray.stages.dedup import (probe_minhash_index,
                                           write_minhash_index)

        base = [(1, "alpha beta gamma delta epsilon")]
        new = [(-2, "alpha beta gamma delta epsilon")]
        idx = str(tmp_path / "mh_idx4")
        write_minhash_index(self._mk(base), idx)
        with _pt.raises(Exception):
            probe_minhash_index(self._mk(new), idx).take_all()

    def test_probe_deterministic_across_runs(self, tmp_path):
        from peri_ray.stages.dedup import (probe_minhash_index,
                                           write_minhash_index)

        base = [(i, f"alpha beta gamma delta epsilon {i % 3}")
                for i in range(12)]
        new = [(100 + i, f"alpha beta gamma delta epsilon {i % 3}")
               for i in range(12)]
        idx = str(tmp_path / "mh_idx2")
        write_minhash_index(self._mk(base), idx)

        def run():
            return sorted((r["id_a"], r["id_b"], r["est_jaccard"])
                          for r in probe_minhash_index(
                              self._mk(new), idx, threshold=0.9).take_all())

        a, b = run(), run()
        assert a == b and len(a) > 0


class TestContainmentJoinBipartite:
    """Asymmetric containment join (dedup.containment_join_bipartite):
    C(frag in doc) = |∩| / |frag bigrams| vs brute force."""

    @staticmethod
    def _brute(frags, corpus, threshold):
        import re

        ws = re.compile(r"\s+")

        def s(x):
            tk = ws.split(x.strip())
            return {a + " " + b for a, b in zip(tk, tk[1:])}

        out = []
        for fa, ta in frags:
            if ta is None or not s(ta):
                continue
            for cb, tb in corpus:
                if tb is None or not s(tb):
                    continue
                c = len(s(ta) & s(tb)) / len(s(ta))
                if c >= threshold:
                    out.append((fa, cb, round(c, 6)))
        return sorted(out)

    @staticmethod
    def _run(frags, corpus, threshold):
        from peri_ray.stages.dedup import containment_join_bipartite

        def mk(docs):
            return rd.from_arrow(pa.table({
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }))

        got = containment_join_bipartite(mk(frags), mk(corpus),
                                         threshold=threshold)
        return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 6))
                      for r in got.take_all())

    def test_fragments_found_in_containers_vs_brute(self):
        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(10)]
        corpus = [(100 + i,
                   " ".join(rng.choice(vocab, int(rng.integers(10, 40)))))
                  for i in range(30)]
        # fragments: leading slices of some docs (containment 1.0 in
        # their source), plus random fragments
        frags = [(i, " ".join(corpus[i][1].split()[:6])) for i in (0, 5, 9)]
        frags += [(50, " ".join(rng.choice(vocab, 5))), (51, None), (52, "x")]
        got = self._run(frags, corpus, 0.9)
        want = self._brute(frags, corpus, 0.9)
        assert got == want
        # every sliced fragment is found in its own source at C = 1.0
        assert all(any(g == (i, 100 + i, 1.0) for g in got) for i in (0, 5, 9))

    def test_asymmetry(self):
        # frag ⊂ doc gives 1.0; the REVERSE direction must not qualify
        frags = [(1, "a b c")]
        corpus = [(10, "a b c d e f g h i j k")]
        assert self._run(frags, corpus, 0.9) == [(1, 10, 1.0)]
        got_rev = self._run([(2, corpus[0][1])], [(20, frags[0][1])], 0.9)
        assert got_rev == []


class TestInterarrival:
    def test_gaps_vs_brute(self):
        from peri_ray.stages.temporal import interarrival_stats

        rng = np.random.default_rng(3)
        users = rng.integers(0, 8, 200)
        ts = rng.integers(0, 10**9, 200) * 1_000_000
        # ties: duplicate some timestamps within a user
        ts[10] = ts[11] = ts[12]
        users[10] = users[11] = users[12] = 5
        t = pa.table({"user_id": pa.array(users, pa.int64()),
                      "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
        got = {r["user_id"]: (r["n_gaps"], r["sum_gap_us"], r["max_gap_us"])
               for r in interarrival_stats(rd.from_arrow(t)).take_all()}
        want = {}
        for u in set(users.tolist()):
            v = np.sort(ts[users == u])
            if len(v) < 2:
                continue
            d = np.diff(v)
            want[u] = (len(d), int(d.sum()), int(d.max()))
        assert got == want

    def test_single_event_and_null_ts(self):
        from peri_ray.stages.temporal import interarrival_stats

        t = pa.table({
            "user_id": pa.array([1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array([100, 200, None, 300, 300], pa.int64()).cast(
                pa.timestamp("us")),
        })
        got = {r["user_id"]: (r["n_gaps"], r["sum_gap_us"], r["max_gap_us"])
               for r in interarrival_stats(rd.from_arrow(t)).take_all()}
        # user 1: one event -> none; user 2: one non-null -> none;
        # user 3: tie -> one zero gap
        assert got == {3: (1, 0, 0)}


class TestExactQuantiles:
    def test_matches_percentile_disc(self):
        import duckdb

        from peri_ray.stages.stats import exact_quantiles

        rng = np.random.default_rng(5)
        v = rng.integers(0, 40, 5000).astype(np.float64)
        v[::97] = np.nan  # nulls must be excluded
        col = pa.array([None if np.isnan(x) else float(x) for x in v],
                       pa.float64())
        ds = rd.from_arrow(pa.table({"x": col}))
        got = exact_quantiles(ds, ["x"], qs=(0.1, 0.5, 0.9))
        want = duckdb.sql(
            "SELECT quantile_disc(x, 0.1), quantile_disc(x, 0.5), "
            "quantile_disc(x, 0.9) FROM (SELECT unnest(?) AS x)",
            params=[col.to_pylist()]).fetchone()
        assert got.column("value").to_pylist() == [float(w) for w in want]

    def test_distinct_cap_raises(self):
        from peri_ray.stages.stats import exact_quantiles

        ds = rd.from_arrow(pa.table(
            {"x": pa.array(np.arange(100, dtype=np.float64))}))
        with pytest.raises(ValueError, match="distinct"):
            exact_quantiles(ds, ["x"], max_distinct=10)


class TestRollup:
    def test_levels_consistent_and_match_duckdb(self):
        import duckdb
        import pyarrow.compute as pc

        from peri_ray.stages.stats import rollup_counts

        rng = np.random.default_rng(9)
        k1 = rng.choice(["a", "b", None], 300, p=[0.45, 0.45, 0.1])
        k2 = rng.integers(0, 4, 300)
        val = rng.normal(100, 10, 300).round(3)
        t = pa.table({"k1": pa.array(k1.tolist(), pa.string()),
                      "k2": pa.array(k2, pa.int64()),
                      "v": pa.array(val, pa.float64())})
        got = rollup_counts(rd.from_arrow(t), "k1", "k2", "v")
        got = got.set_column(3, "sum_v", pc.round(got.column("sum_v"), ndigits=6))
        gdf = got.to_pandas().sort_values(["k1", "k2"], ignore_index=True)
        want = duckdb.sql("""
            SELECT CASE WHEN GROUPING(k1)=1 THEN 'ALL'
                        ELSE COALESCE(k1,'NULL') END AS k1,
                   CASE WHEN GROUPING(k2)=1 THEN 'ALL'
                        ELSE CAST(k2 AS VARCHAR) END AS k2,
                   count(v) AS cnt, ROUND(sum(v), 6) AS sum_v
              FROM t GROUP BY ROLLUP(k1, k2)
        """).df().sort_values(["k1", "k2"], ignore_index=True)
        assert gdf["k1"].tolist() == want["k1"].tolist()
        assert gdf["k2"].tolist() == want["k2"].tolist()
        assert gdf["cnt"].tolist() == want["cnt"].tolist()
        assert np.allclose(gdf["sum_v"], want["sum_v"], atol=1e-6)
        # internal consistency: level sums reconcile
        fine = gdf[(gdf.k1 != "ALL") & (gdf.k2 != "ALL")]
        mid = gdf[(gdf.k1 != "ALL") & (gdf.k2 == "ALL")]
        top = gdf[(gdf.k1 == "ALL")]
        assert fine.cnt.sum() == mid.cnt.sum() == top.cnt.sum()


class TestTfidfTopTerms:
    def test_matches_brute_force(self):
        import math

        from peri_ray.stages.text import tfidf_top_terms

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(15)]
        docs = [(i, " ".join(rng.choice(vocab, int(rng.integers(4, 25)))))
                for i in range(40)]
        docs.append((40, None))
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string())}))
        got = sorted((r["doc_id"], r["term"], r["score"])
                     for r in tfidf_top_terms(ds, k=2).take_all())
        # brute force
        toks = {i: t.split() for i, t in docs if t is not None}
        n = len(toks)
        df = {}
        for tk in toks.values():
            for w in set(tk):
                df[w] = df.get(w, 0) + 1
        want = []
        for i, tk in toks.items():
            tf = {}
            for w in tk:
                tf[w] = tf.get(w, 0) + 1
            scored = sorted(
                ((round(c * math.log(n * 1.0 / df[w]), 6), w)
                 for w, c in tf.items()),
                key=lambda x: (-x[0], x[1]))
            want.extend((i, w, s) for s, w in scored[:2])
        assert got == sorted(want)


class TestPivotCounts:
    def test_wide_counts_with_other_and_nulls(self):
        from peri_ray.stages.stats import pivot_counts

        t = pa.table({
            "r": pa.array(["x", "x", "y", "y", "y", None], pa.string()),
            "c": pa.array(["a", "b", "a", "z", None, "a"], pa.string()),
        })
        got = pivot_counts(rd.from_arrow(t), "r", "c", ["a", "b"])
        rows = {r["r"]: (r["cnt_a"], r["cnt_b"], r["cnt_other"])
                for r in got.to_pylist()}
        assert rows == {"x": (1, 1, 0), "y": (1, 0, 2), "NULL": (1, 0, 0)}


class TestGroupedDistinctCount:
    def test_matches_duckdb(self):
        import duckdb

        from peri_ray.stages.stats import grouped_distinct_count

        rng = np.random.default_rng(17)
        t = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], 2000).tolist(),
                          pa.string()),
            "v": pa.array([None if x == 0 else int(x)
                           for x in rng.integers(0, 50, 2000)], pa.int64()),
        })
        got = sorted((r["k"], r["ndv"]) for r in
                     grouped_distinct_count(rd.from_arrow(t), "k", "v")
                     .to_pylist())
        want = sorted(duckdb.sql(
            "SELECT k, count(DISTINCT v) FROM t GROUP BY k").fetchall())
        assert got == [(k, int(n)) for k, n in want]


class TestFunnel:
    def test_funnel_semantics(self):
        from peri_ray.stages.temporal import funnel_counts

        rows = [
            # user 1: full ordered funnel
            (1, 10, "click"), (1, 20, "view"), (1, 30, "purchase"),
            # user 2: click then purchase, no view -> stops at 1
            (2, 10, "click"), (2, 30, "purchase"),
            # user 3: view before click -> stops at 1 (first click later ok?)
            (3, 10, "view"), (3, 20, "click"),
            # user 4: tie between click and view -> strict < fails at 2
            (4, 10, "click"), (4, 10, "view"),
            # user 5: no funnel events at all
            (5, 10, "signup"),
            # user 6: click->view->purchase with earlier repeats
            (6, 5, "click"), (6, 7, "view"), (6, 6, "click"), (6, 9, "purchase"),
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows],
                           pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        })
        got = {r["step"]: r["n_users"] for r in funnel_counts(
            rd.from_arrow(t), ["click", "view", "purchase"]).take_all()}
        # step1: users 1,2,3,4,6 clicked = 5
        # step2: first view strictly after first click: 1, 6 -> 2
        #   (3: view precedes click; 4: tie)
        # step3: purchase strictly after: 1, 6 -> 2
        assert got == {1: 5, 2: 2, 3: 2}


class TestRunningTotals:
    def test_matches_brute_force_with_ties(self):
        from peri_ray.stages.temporal import running_totals

        rng = np.random.default_rng(21)
        n = 400
        users = rng.integers(0, 6, n)
        ts = rng.integers(0, 50, n) * 1_000_000  # many ties
        ids = rng.permutation(n)
        vals = np.round(rng.normal(10, 5, n), 3)
        vals[::53] = np.nan
        t = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_id": pa.array(ids, pa.int64()),
            "value": pa.array([None if np.isnan(x) else float(x)
                               for x in vals], pa.float64()),
        })
        got = {r["event_id"]: (r["user_id"], r["run_sum_micro"])
               for r in running_totals(rd.from_arrow(t)).take_all()}
        want = {}
        for u in set(users.tolist()):
            m = (users == u) & ~np.isnan(vals)
            order = np.lexsort((ids[m], ts[m]))
            micro = np.floor(vals[m][order] * 1e6 + 0.5).astype(np.int64)
            run = np.cumsum(micro)
            for eid, rs in zip(ids[m][order], run):
                want[int(eid)] = (int(u), int(rs))
        assert got == want


class TestGroupedExactQuantiles:
    def test_matches_duckdb_per_group(self):
        import duckdb

        from peri_ray.stages.stats import grouped_exact_quantiles

        rng = np.random.default_rng(23)
        t = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], 3000).tolist(),
                          pa.string()),
            "v": pa.array([None if x == 99 else float(x)
                           for x in rng.integers(0, 30, 3000)], pa.float64()),
        })
        got = sorted((r["k"], r["q"], r["value"]) for r in
                     grouped_exact_quantiles(rd.from_arrow(t), "k", "v",
                                             qs=(0.5, 0.9)).to_pylist())
        want = sorted(duckdb.sql("""
            SELECT k, 0.5 AS q, CAST(quantile_disc(v, 0.5) AS DOUBLE)
              FROM t GROUP BY k
            UNION ALL
            SELECT k, 0.9, CAST(quantile_disc(v, 0.9) AS DOUBLE)
              FROM t GROUP BY k""").fetchall())
        assert got == [(k, float(q), float(v)) for k, q, v in want]


class TestSetDifferenceComposition:
    def test_anti_join_distinct_users(self):
        from peri_ray.pipelines import queries as q

        # build a miniature events table where the difference is nonzero
        import tempfile

        import pyarrow.parquet as pq

        rows = [
            (1, "click"), (1, "purchase"),
            (2, "click"), (2, "click"),     # clicker, never purchased
            (3, "purchase"),
            (4, "click"), (4, "view"),      # clicker, never purchased
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
        })
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, f"{d}/events.parquet")
            out = q.clicked_no_purchase(d)
        assert sorted(out.column("user_id").to_pylist()) == [2, 4]


class TestMisraGries:
    def test_superset_guarantee_under_merge(self):
        from peri_ray.state.sketches import MisraGries

        rng = np.random.default_rng(29)
        # zipf-ish stream split across 10 partial sketches with tiny k
        items = [f"t{i}" for i in
                 (rng.zipf(1.3, 20000) % 40)]
        true = {}
        for it in items:
            true[it] = true.get(it, 0) + 1
        parts = []
        for chunk in np.array_split(np.array(items), 10):
            mg = MisraGries(8)
            vals, cnts = np.unique(chunk, return_counts=True)
            mg.add_counts(vals.tolist(), cnts)
            parts.append(mg)
        merged = parts[0]
        for p in parts[1:]:
            merged.merge(p)
        assert merged.err > 0  # decrements actually happened (k << vocab)
        # superset guarantee holds for every threshold ABOVE the error
        for threshold in (merged.err + 1, merged.err * 2, 10**6):
            cands = set(merged.candidates(threshold))
            hot = {it for it, n in true.items() if n >= threshold}
            assert hot <= cands  # never a false negative past err
        # estimates never exceed true counts, undercount bounded by err
        for it, est in merged.counters.items():
            assert est <= true[it] <= est + merged.err


class TestHeavyHitterTerms:
    def test_exact_even_with_tiny_k(self):
        from peri_ray.stages.text import heavy_hitter_terms

        rng = np.random.default_rng(31)
        vocab = [f"w{i}" for i in range(25)]
        weights = np.linspace(5, 0.2, 25)
        weights /= weights.sum()
        docs = [" ".join(rng.choice(vocab, 30, p=weights))
                for _ in range(200)]
        ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
        true = {}
        for d in docs:
            for w in d.split():
                true[w] = true.get(w, 0) + 1
        threshold = 300
        want = sorted((w, n) for w, n in true.items() if n >= threshold)
        # adequate k: candidates form a verified superset, result exact
        got = sorted((r["term"], r["n"]) for r in heavy_hitter_terms(
            ds, threshold=threshold, k=64, batch_size=32).take_all())
        assert got == want
        assert len(want) >= 3

    def test_undersized_k_raises_instead_of_losing_hitters(self):
        from peri_ray.stages.text import heavy_hitter_terms

        rng = np.random.default_rng(33)
        vocab = [f"w{i}" for i in range(200)]
        docs = [" ".join(rng.choice(vocab, 50)) for _ in range(100)]
        ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
        with pytest.raises(ValueError, match="superset guarantee"):
            heavy_hitter_terms(ds, threshold=3, k=4, batch_size=16).take_all()


class TestJaccardJoinThresholdSweep:
    def test_thresholds_match_brute_force(self):
        rng = np.random.default_rng(37)
        vocab = [f"v{i}" for i in range(10)]
        docs = [(i, " ".join(rng.choice(vocab, int(rng.integers(3, 20)))))
                for i in range(45)]
        # planted duplicate cluster
        tk = docs[7][1].split()
        docs.append((90, " ".join(tk)))
        tk[0] = "v0"
        docs.append((91, " ".join(tk)))
        run = TestJaccardSimilarityJoin._run
        brute = TestJaccardSimilarityJoin._brute
        for t in (0.3, 0.55, 0.75, 0.95):
            assert run(docs, t) == brute(docs, t), f"threshold {t}"


class TestBloom:
    def test_no_false_negatives_and_merge(self):
        from peri_ray.state.sketches import Bloom, hash_strings

        rng = np.random.default_rng(41)
        added = [f"k{i}" for i in rng.integers(0, 10**6, 500)]
        others = [f"x{i}" for i in range(2000)]
        parts = []
        for chunk in np.array_split(np.array(added), 4):
            b = Bloom(1 << 14, 4)
            b.add_hashes(hash_strings(pa.array(chunk.tolist())))
            parts.append(b)
        merged = parts[0]
        for p in parts[1:]:
            merged.merge(p)
        assert merged.contains_hashes(
            hash_strings(pa.array(added))).all()  # never a false negative
        fp = merged.contains_hashes(hash_strings(pa.array(others))).mean()
        assert fp < 0.1  # sized for ~sub-percent; loose bound for safety

    def test_tiny_filter_saturates_but_stays_correct(self):
        from peri_ray.state.sketches import Bloom, hash_strings

        b = Bloom(64, 2)
        keys = pa.array([f"k{i}" for i in range(500)])
        b.add_hashes(hash_strings(keys))
        assert b.contains_hashes(hash_strings(keys)).all()


class TestBloomSemiJoin:
    def test_exact_at_any_fp_rate(self):
        from peri_ray.stages.joins import bloom_semi_join

        rng = np.random.default_rng(43)
        fact = pa.table({
            "fk": pa.array(rng.integers(0, 1000, 5000), pa.int64()),
            "v": pa.array(rng.normal(size=5000)),
        })
        dim_keys = sorted(rng.choice(1000, 40, replace=False).tolist())
        dim = pa.table({"k": pa.array(dim_keys, pa.int64())})
        want = fact.filter(
            __import__("pyarrow.compute", fromlist=["is_in"]).is_in(
                fact.column("fk"), value_set=pa.array(dim_keys, pa.int64())))
        # saturated 64-bit bloom (every probe a false positive) AND a
        # well-sized one must both give the exact semi join
        for m_bits in (64, 1 << 16):
            got = bloom_semi_join(rd.from_arrow(fact), rd.from_arrow(dim),
                                  "fk", "k", ["v"], m_bits=m_bits,
                                  k_hashes=2)
            g = sorted((r["fk"], round(r["v"], 9)) for r in got.take_all())
            w = sorted((a.as_py(), round(b.as_py(), 9))
                       for a, b in zip(want.column("fk"), want.column("v")))
            assert g == w, f"m_bits={m_bits}"


class TestNtile:
    def test_uneven_buckets_match_duckdb(self):
        import duckdb

        from peri_ray.stages.stats import ntile_per_group

        rng = np.random.default_rng(47)
        n = 700
        t = pa.table({
            "k": pa.array(rng.integers(0, 9, n), pa.int64()),  # sizes < and > 4
            "v": pa.array(rng.integers(0, 10, n).astype(np.float64)),  # ties
            "id": pa.array(rng.permutation(n), pa.int64()),
        })
        got = sorted((r["id"], r["k"], r["tile"]) for r in ntile_per_group(
            rd.from_arrow(t), "k", "v", "id", n_tiles=4).take_all())
        want = sorted(duckdb.sql(
            "SELECT id, k, ntile(4) OVER (PARTITION BY k ORDER BY v, id) "
            "FROM t").fetchall())
        assert got == [(a, b, int(c)) for a, b, c in want]

    def test_groups_smaller_than_tiles(self):
        import duckdb

        from peri_ray.stages.stats import ntile_per_group

        t = pa.table({
            "k": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
            "v": pa.array([5.0, 1.0, 9.0, 2.0, 2.0, 1.0]),
            "id": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        })
        got = sorted((r["id"], r["tile"]) for r in ntile_per_group(
            rd.from_arrow(t), "k", "v", "id", n_tiles=4).take_all())
        want = sorted(duckdb.sql(
            "SELECT id, ntile(4) OVER (PARTITION BY k ORDER BY v, id) "
            "FROM t").fetchall())
        assert got == [(a, int(b)) for a, b in want]


class TestTextSinks:
    def test_jsonl_and_csv_round_trip(self, tmp_path):
        from peri_ray.sources import read_csv_table, read_json_table, write_csv, write_jsonl

        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "name": pa.array(["a", "b", None], pa.string()),
        })
        ds = rd.from_arrow(t)
        jd = str(tmp_path / "j")
        cd = str(tmp_path / "c")
        write_jsonl(ds, jd)
        write_csv(ds, cd)
        back_j = sorted((r["id"], r["name"]) for r in read_json_table(jd).take_all())
        back_c = sorted((r["id"], r["name"]) for r in read_csv_table(cd).take_all())
        assert back_j == [(1, "a"), (2, "b"), (3, None)]
        # CSV has no null literal: a null string round-trips as ""
        assert back_c == [(1, "a"), (2, "b"), (3, "")]

    def test_csv_rejects_nested(self, tmp_path):
        from peri_ray.sources import write_csv

        t = pa.table({"v": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
        with pytest.raises(ValueError, match="nested"):
            write_csv(rd.from_arrow(t), str(tmp_path / "x"))


class TestFullOuterJoin:
    def test_unmatched_both_sides(self):
        from peri_ray.stages.joins import broadcast_join, hash_join

        left = pa.table({"k": pa.array([1, 2, 3, None], pa.int64()),
                         "lv": pa.array([10, 20, 30, 40], pa.int64())})
        right = pa.table({"rk": pa.array([2, 3, 5], pa.int64()),
                          "rv": pa.array(["b", "c", "e"], pa.string())})
        got = sorted(
            ((r["k"], r["lv"], r["rv"]) for r in hash_join(
                rd.from_arrow(left), rd.from_arrow(right), "k", "rk",
                ["lv"], ["rv"], how="full").take_all()),
            key=lambda x: (x[0] is None, x))
        # matched 2,3; left-only 1 and null-key; right-only 5
        assert got == [(1, 10, None), (2, 20, "b"), (3, 30, "c"),
                       (5, None, "e"), (None, 40, None)]
        with pytest.raises(ValueError, match="hash_join"):
            broadcast_join(rd.from_arrow(left), rd.from_arrow(right),
                           "k", "rk", ["rv"], how="full")


class TestJaccardTruncatedRankTable:
    def test_tiny_rank_table_still_exact(self):
        from peri_ray.stages.dedup import jaccard_similarity_join

        rng = np.random.default_rng(53)
        vocab = [f"u{i}" for i in range(14)]
        docs = [(i, " ".join(rng.choice(vocab, int(rng.integers(6, 25)))))
                for i in range(50)]
        docs.append((100, docs[4][1]))  # exact dup
        brute = TestJaccardSimilarityJoin._brute(docs, 0.6)
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string())}))
        got = jaccard_similarity_join(ds, threshold=0.6, max_rank_terms=3)
        rows = sorted((r["id_a"], r["id_b"], round(r["jaccard"], 6))
                      for r in got.take_all())
        assert rows == brute


class TestRankPerGroup:
    def test_rank_and_dense_rank_match_duckdb(self):
        import duckdb

        from peri_ray.stages.stats import rank_per_group

        rng = np.random.default_rng(59)
        n = 500
        t = pa.table({
            "k": pa.array(rng.integers(0, 7, n), pa.int64()),
            "v": pa.array(rng.integers(0, 8, n).astype(np.float64)),  # ties
            "id": pa.array(rng.permutation(n), pa.int64()),
        })
        for method, sqlfn in (("rank", "rank()"), ("dense_rank", "dense_rank()")):
            got = sorted((r["id"], r["rnk"]) for r in rank_per_group(
                rd.from_arrow(t), "k", "v", "id", method=method).take_all())
            want = sorted(duckdb.sql(
                f"SELECT id, {sqlfn} OVER (PARTITION BY k ORDER BY v) "
                "FROM t").fetchall())
            assert got == [(a, int(b)) for a, b in want], method

    def test_descending(self):
        from peri_ray.stages.stats import rank_per_group

        t = pa.table({
            "k": pa.array([1, 1, 1], pa.int64()),
            "v": pa.array([5.0, 9.0, 9.0]),
            "id": pa.array([1, 2, 3], pa.int64()),
        })
        got = {r["id"]: r["rnk"] for r in rank_per_group(
            rd.from_arrow(t), "k", "v", "id", descending=True).take_all()}
        assert got == {2: 1, 3: 1, 1: 3}


class TestChiSquare:
    def test_matches_scipy_free_reference(self):
        from peri_ray.stages.checks import chi_square_independence

        rng = np.random.default_rng(61)
        # dependent columns: b correlates with a
        a = rng.choice(["x", "y", "z"], 2000)
        b = np.where(rng.random(2000) < 0.7, a, rng.choice(["x", "y", "z"], 2000))
        t = pa.table({"a": pa.array(a.tolist(), pa.string()),
                      "b": pa.array(b.tolist(), pa.string())})
        r = chi_square_independence(rd.from_arrow(t), "a", "b")
        # brute-force chi2
        cats_a, cats_b = sorted(set(a)), sorted(set(b))
        obs = np.zeros((3, 3))
        for x, y in zip(a, b):
            obs[cats_a.index(x), cats_b.index(y)] += 1
        exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
        want = ((obs - exp) ** 2 / exp).sum()
        assert abs(r["chi2"] - want) < 1e-9
        assert r["dof"] == 4 and r["n"] == 2000
        assert r["chi2"] > 100  # strongly dependent

    def test_degenerate_single_category(self):
        from peri_ray.stages.checks import chi_square_independence

        t = pa.table({"a": pa.array(["x"] * 10, pa.string()),
                      "b": pa.array(["p", "q"] * 5, pa.string())})
        r = chi_square_independence(rd.from_arrow(t), "a", "b")
        assert r == {"chi2": 0.0, "dof": 0, "n": 10}


class TestCollectSorted:
    def test_order_and_ties(self):
        from peri_ray.stages.stats import collect_sorted

        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["b", "a", "c", "x", "y", None],
                                   pa.string()),
            "ts": pa.array([20, 10, 10, 5, 5, 1], pa.int64()).cast(
                pa.timestamp("us")),
            "event_id": pa.array([100, 101, 99, 7, 6, 1], pa.int64()),
        })
        got = {r["user_id"]: r["seq"] for r in collect_sorted(
            rd.from_arrow(t), "user_id", "event_type", "ts",
            "event_id").take_all()}
        # user 1: ts=10 tie broken by id (99 -> c, 101 -> a), then b
        # user 2: ts tie broken by id (6 -> y, 7 -> x)
        # user 3: only a null value -> excluded entirely
        assert got == {1: "c,a,b", 2: "y,x"}


class TestCompositeKeyUniqueness:
    def test_duplicates_and_nulls(self):
        from peri_ray.stages.checks import duplicate_composite_keys

        t = pa.table({
            "a": pa.array([1, 1, 1, 2, None, None], pa.int64()),
            "b": pa.array(["x", "x", "y", "x", "z", "z"], pa.string()),
        })
        got = sorted(
            ((r["a"], r["b"], r["cnt"]) for r in duplicate_composite_keys(
                rd.from_arrow(t), ["a", "b"]).take_all()),
            key=lambda x: (x[0] is None, x))
        # (1,x) twice; (null,z) twice (SQL GROUP BY groups nulls)
        assert got == [(1, "x", 2), (None, "z", 2)]


class TestCumulativeDistinct:
    def test_first_seen_reduction(self):
        from peri_ray.stages.temporal import cumulative_distinct

        day = 86_400_000_000
        rows = [
            (1, 0), (1, day * 3),          # user 1 first on day 0
            (2, day), (2, day),            # user 2 first on day 1
            (3, day), (4, day * 3),        # two more
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")),
        })
        got = [(r["day"], r["cum_users"]) for r in cumulative_distinct(
            rd.from_arrow(t)).to_pylist()]
        assert got == [(0, 1), (86400, 3), (86400 * 3, 4)]


class TestRetentionCohorts:
    def test_cross_block_activity_dedupes(self):
        from peri_ray.stages.temporal import retention_cohorts

        day = 86_400_000_000
        # user 1: cohort day0, active day0 + day2 (twice, across blocks)
        # user 2: cohort day2, active day2 only
        rows = [(1, 0), (1, day * 2), (1, day * 2 + 5), (2, day * 2)]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")),
        })
        ds = rd.from_arrow(t).repartition(4)  # force cross-block repeats
        got = sorted((r["cohort"], r["off"], r["n_users"])
                     for r in retention_cohorts(ds).to_pylist())
        d = 86400
        assert got == [(0, 0, 1), (0, 2 * d, 1), (2 * d, 0, 1)]


class TestExactQuantileContinuous:
    def test_continuous_matches_duckdb(self):
        import duckdb

        from peri_ray.stages.stats import exact_quantile_continuous

        rng = np.random.default_rng(67)
        v = rng.normal(50, 20, 20000)  # all-distinct continuous values
        t = pa.table({"x": pa.array(v, pa.float64())})
        ds = rd.from_arrow(t).repartition(8)
        got = exact_quantile_continuous(ds, "x", qs=(0.01, 0.5, 0.999),
                                        batch_size=2048)
        want = duckdb.sql(
            "SELECT quantile_disc(x, 0.01), quantile_disc(x, 0.5), "
            "quantile_disc(x, 0.999) FROM t").fetchone()
        assert got.column("value").to_pylist() == list(want)

    def test_nulls_and_tiny_input(self):
        from peri_ray.stages.stats import exact_quantile_continuous

        t = pa.table({"x": pa.array([None, 3.0, 1.0, None, 2.0],
                                    pa.float64())})
        got = exact_quantile_continuous(rd.from_arrow(t), "x", qs=(0.5,))
        assert got.column("value").to_pylist() == [2.0]


class TestMadOutliers:
    def test_robust_to_heavy_tail(self):
        from peri_ray.stages.stats import mad_outliers

        rng = np.random.default_rng(71)
        v = rng.normal(0, 1, 5000)
        v[:20] = 1000.0  # extreme cluster that would wreck mean/std
        t = pa.table({"id": pa.array(np.arange(len(v)), pa.int64()),
                      "v": pa.array(v, pa.float64())})
        out = mad_outliers(rd.from_arrow(t), "v", "id", k=10.0).take_all()
        ids = {r["id"] for r in out}
        assert set(range(20)) <= ids          # the planted cluster flagged
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        want = {i for i, x in enumerate(v) if abs(x - med) > 10.0 * mad}
        assert ids == want                     # exact agreement w/ numpy


class TestPercentRankCumeDist:
    def test_match_duckdb(self):
        import duckdb

        from peri_ray.stages.stats import rank_per_group

        rng = np.random.default_rng(73)
        n = 400
        t = pa.table({
            "k": pa.array(rng.integers(0, 6, n), pa.int64()),
            "v": pa.array(rng.integers(0, 9, n).astype(np.float64)),
            "id": pa.array(rng.permutation(n), pa.int64()),
        })
        # include a singleton group (percent_rank defined as 0)
        t = pa.concat_tables([t, pa.table({
            "k": pa.array([99], pa.int64()),
            "v": pa.array([5.0]), "id": pa.array([9999], pa.int64())})])
        for method, sqlfn in (("percent_rank", "percent_rank()"),
                              ("cume_dist", "cume_dist()")):
            got = sorted((r["id"], r["rnk"]) for r in rank_per_group(
                rd.from_arrow(t), "k", "v", "id", method=method).take_all())
            want = sorted(duckdb.sql(
                f"SELECT id, {sqlfn} OVER (PARTITION BY k ORDER BY v) "
                "FROM t").fetchall())
            assert got == [(a, float(b)) for a, b in want], method


class TestBenford:
    def test_benford_compliant_vs_uniform(self):
        from peri_ray.stages.checks import benford_check

        rng = np.random.default_rng(79)
        # log-uniform data follows Benford; uniform data does not
        benford = np.exp(rng.uniform(np.log(1), np.log(10**6), 20000))
        uniform = rng.uniform(100, 999, 20000)
        chi_b = benford_check(rd.from_arrow(
            pa.table({"v": pa.array(benford)})), "v").column("chi2")[0].as_py()
        chi_u = benford_check(rd.from_arrow(
            pa.table({"v": pa.array(uniform)})), "v").column("chi2")[0].as_py()
        assert chi_b < 50          # close to expectation
        assert chi_u > 1000        # grossly off
        t = benford_check(rd.from_arrow(
            pa.table({"v": pa.array(benford)})), "v")
        assert t.column("digit").to_pylist() == list(range(1, 10))
        assert sum(t.column("cnt").to_pylist()) == 20000


class TestCurationPipeline:
    def test_gate_attribution_and_dedup(self):
        from peri_ray.pipelines.curation import run_curation

        spec = {
            "doc_id": ("required", "integer"),
            "text": ("required", ("string", ("min", 1))),
            "lang": ("enum", ["en", "de"]),
            "n_chars": ("integer", ("gte", 0)),
        }
        long = "x" * 150
        rows = [
            (1, long, "en", 150),          # curated (keeper of dup pair)
            (2, long, "en", 150),          # exact dup victim
            (3, long + "y", "de", 151),    # curated
            (4, "", "en", 0),              # invalid (min 1)
            (5, long, "xx", 150),          # invalid (enum)
            (6, long, None, 150),          # no lang
            (7, "short", "en", 5),         # too short
            (8, long, "en", None),         # too short (null n_chars)
        ]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        })
        curated, rep = run_curation(rd.from_arrow(t), spec)
        assert rep == {"input_rows": 8, "invalid": 2, "no_lang": 1,
                       "too_short": 2, "exact_dups": 1, "curated_rows": 2}
        ids = sorted(r["doc_id"] for r in curated.take_all())
        assert ids == [1, 3]
        total = sum(v for k, v in rep.items()
                    if k not in ("input_rows", "curated_rows"))
        assert total + rep["curated_rows"] == rep["input_rows"]


class TestVerifyCandidatesProperties:
    def test_random_candidates_match_direct_scoring(self):
        # the reworked (per-pair-bucket replication) verify must agree
        # with direct scoring on random corpora + random candidate
        # sets including duplicate pairs, ids absent from the corpus,
        # and null texts — for BOTH the plain metric and the
        # exchange-prepared TokenBigramJaccard path
        from peri_ray.stages.dedup import (NgramJaccard,
                                           TokenBigramJaccard,
                                           verify_candidates)

        rng = np.random.default_rng(23)
        words = [f"w{i}" for i in range(40)]
        for trial in range(3):
            n = int(rng.integers(20, 60))
            texts = [None if rng.random() < 0.1 else
                     " ".join(rng.choice(words,
                                         size=int(rng.integers(2, 30))))
                     for _ in range(n)]
            docs = pa.table({
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            })
            m_pairs = int(rng.integers(5, 40))
            ida = rng.integers(0, n + 5, size=m_pairs)   # +5: unknown ids
            idb = rng.integers(0, n + 5, size=m_pairs)
            keep = ida != idb
            ida, idb = ida[keep], idb[keep]
            # inject duplicates (multi-band candidate feeds)
            ida = np.concatenate([ida, ida[:3]])
            idb = np.concatenate([idb, idb[:3]])
            cands = pa.table({"id_a": pa.array(ida, pa.int64()),
                              "id_b": pa.array(idb, pa.int64())})
            lookup = {i: (t or "") for i, t in enumerate(texts)}
            for metric in (NgramJaccard(5), TokenBigramJaccard()):
                got = {(r["id_a"], r["id_b"]): r["jaccard"]
                       for r in verify_candidates(
                           rd.from_arrow(docs), rd.from_arrow(cands),
                           threshold=0.3, metric=metric).take_all()}
                want = {}
                for a, b in {(int(x), int(y))
                             for x, y in zip(ida, idb)}:
                    j = metric(lookup.get(a, ""), lookup.get(b, ""))
                    if j >= 0.3:
                        want[(a, b)] = j
                assert got == want, (trial, type(metric).__name__)


class TestJaccardExactThresholdBoundary:
    def test_pair_at_exactly_threshold_survives(self):
        # A subset pair with J = 28/35 = 0.8 EXACTLY: float t*max
        # computes 28.000000000000004 and un-slacked bounds drop it
        from peri_ray.stages.dedup import jaccard_similarity_join

        a_tokens = [f"w{i:02d}" for i in range(29)]   # 28 bigrams
        b_tokens = a_tokens + [f"x{i}" for i in range(7)]  # 35 bigrams
        docs = [(1, " ".join(a_tokens)), (2, " ".join(b_tokens))]
        # background docs so the DF table isn't degenerate
        rng = np.random.default_rng(83)
        for i in range(3, 20):
            docs.append((i, " ".join(rng.choice(a_tokens[:10], 8))))
        got = TestJaccardSimilarityJoin._run(docs, 0.8)
        want = TestJaccardSimilarityJoin._brute(docs, 0.8)
        assert (1, 2, 0.8) in want      # the fixture really is boundary
        assert got == want


class TestGroupedQuantilesNullKey:
    def test_null_key_groups_like_sql(self):
        import duckdb

        from peri_ray.stages.stats import grouped_exact_quantiles

        t = pa.table({
            "k": pa.array(["a", "a", None, None, "b"], pa.string()),
            "v": pa.array([1.0, 3.0, 5.0, 7.0, 9.0], pa.float64()),
        })
        got = sorted(((r["k"], r["q"], r["value"]) for r in
                      grouped_exact_quantiles(rd.from_arrow(t), "k", "v",
                                              qs=(0.5,)).to_pylist()),
                     key=lambda x: (x[0] is None, x))
        want = sorted(duckdb.sql(
            "SELECT k, 0.5, CAST(quantile_disc(v, 0.5) AS DOUBLE) "
            "FROM t GROUP BY k").fetchall(),
            key=lambda x: (x[0] is None, x))
        assert got == [(k, float(q), float(v)) for k, q, v in want]


class TestCurationFuzz:
    def test_random_corpora_match_brute_force(self):
        from peri_ray.pipelines.curation import run_curation

        spec = {
            "doc_id": ("required", "integer"),
            "text": ("required", ("string", ("min", 1))),
            "lang": ("enum", ["en", "de"]),
            "n_chars": ("integer", ("gte", 0)),
        }
        rng = np.random.default_rng(89)
        for trial in range(4):
            n = int(rng.integers(40, 120))
            texts = []
            pool = ["x" * 150, "y" * 200, "short", ""]
            for _ in range(n):
                r = rng.random()
                texts.append(None if r < 0.05 else
                             pool[int(rng.integers(0, len(pool)))])
            langs = [None if rng.random() < 0.15 else
                     (["en", "de", "zz"][int(rng.integers(0, 3))])
                     for _ in range(n)]
            chars = [None if rng.random() < 0.1 else
                     (len(t) if t else 0) for t in texts]
            t = pa.table({
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(chars, pa.int64()),
            })
            curated, rep = run_curation(rd.from_arrow(t).repartition(4), spec)
            # brute force, same gate order
            inv = no_lang = short = 0
            eligible = []
            for i in range(n):
                tx, lg, nc = texts[i], langs[i], chars[i]
                valid = (tx is not None and len(tx) >= 1
                         and (lg is None or lg in ("en", "de"))
                         and (nc is None or nc >= 0))
                if not valid:
                    inv += 1
                elif lg is None:
                    no_lang += 1
                elif nc is None or nc < 100:
                    short += 1
                else:
                    eligible.append((i, tx))
            keep = {}
            for i, tx in eligible:
                keep.setdefault(tx, i)
            dups = len(eligible) - len(keep)
            assert rep == {"input_rows": n, "invalid": inv,
                           "no_lang": no_lang, "too_short": short,
                           "exact_dups": dups,
                           "curated_rows": len(keep)}, f"trial {trial}"
            got_ids = sorted(r["doc_id"] for r in curated.take_all())
            assert got_ids == sorted(keep.values()), f"trial {trial}"


class TestPartitionedCuration:
    SPEC = {
        "doc_id": ("required", "integer"),
        "text": ("required", ("string", ("min", 1))),
        "lang": ("enum", ["en", "de"]),
        "n_chars": ("integer", ("gte", 0)),
    }

    @staticmethod
    def _fragments(tmp_path):
        import pyarrow.parquet as pq

        long = "x" * 150
        # duplicates deliberately CROSS fragments (dedup must be global)
        frags = [
            [(1, long, "en", 150), (2, long + "a", "en", 151),
             (3, "", "en", 0)],
            [(4, long, "de", 150), (5, long + "b", None, 151),
             (6, "tiny", "en", 4)],
            [(7, long + "a", "de", 151), (8, long + "c", "en", 151)],
        ]
        paths = []
        for i, rows in enumerate(frags):
            t = pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array([r[3] for r in rows], pa.int64()),
            })
            p = str(tmp_path / f"frag{i}.parquet")
            pq.write_table(t, p)
            paths.append(p)
        return paths

    def test_matches_streaming_and_resumes(self, tmp_path):
        from peri_ray.pipelines.curation import (partitioned_curation,
                                                 run_curation)
        from peri_ray.sources import read_table

        paths = self._fragments(tmp_path)
        ck = str(tmp_path / "ckpt")
        res = partitioned_curation(paths, ck, self.SPEC)
        # parity with the streaming form over the concatenated corpus
        union = read_table(paths[0]).union(read_table(paths[1]),
                                           read_table(paths[2]))
        _, want = run_curation(union, self.SPEC)
        assert res["report"] == want
        # dups 1/4 (same text) and 2/7 (same text) cross fragments:
        # victims are global, keepers are min-id
        curated_dirs = [os.path.join(d, "curated")
                        for d in res["output_dirs"]]
        curated_ids = sorted(
            r["doc_id"]
            for d in curated_dirs if os.path.isdir(d)
            for r in rd.read_parquet(d).take_all())
        assert curated_ids == [1, 2, 8]
        assert len(res["phase1"]) == 3 and len(res["phase2"]) == 3

        # full rerun: every fragment skipped (manifests unchanged)
        before = {m["fragment"]: m["written_at"]
                  for m in res["phase1"] + res["phase2"]}
        res2 = partitioned_curation(paths, ck, self.SPEC)
        after = {m["fragment"]: m["written_at"]
                 for m in res2["phase1"] + res2["phase2"]}
        assert after == before
        assert res2["report"] == want

        # mid-phase-2 kill: drop one curated manifest; resume re-runs
        # ONLY that fragment and the report is identical
        from peri_ray.state.checkpoint import CheckpointDir

        ckpt = CheckpointDir(ck)
        victim_frag = res["phase2"][1]["fragment"]
        ckpt.invalidate(victim_frag)
        res3 = partitioned_curation(paths, ck, self.SPEC)
        assert res3["report"] == want
        changed = {f for f, ts in
                   {m["fragment"]: m["written_at"]
                    for m in res3["phase1"] + res3["phase2"]}.items()
                   if ts != before[f]}
        assert changed == {victim_frag}

    def test_random_corpora_match_streaming(self, tmp_path):
        # fuzz: random corpus, random fragmentation — the partitioned
        # report must equal the streaming run_curation report exactly
        import pyarrow.parquet as pq

        from peri_ray.pipelines.curation import (partitioned_curation,
                                                 run_curation)
        from peri_ray.sources import read_table

        rng = np.random.default_rng(101)
        for trial in range(2):
            n = int(rng.integers(60, 140))
            pool = ["x" * 150, "y" * 200, "z" * 180, "short", ""]
            t = pa.table({
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array(
                    [None if rng.random() < 0.05 else
                     pool[int(rng.integers(0, len(pool)))]
                     for _ in range(n)], pa.string()),
                "lang": pa.array(
                    [None if rng.random() < 0.15 else
                     ["en", "de", "zz"][int(rng.integers(0, 3))]
                     for _ in range(n)], pa.string()),
                "n_chars": pa.array(
                    [int(rng.integers(0, 250)) for _ in range(n)],
                    pa.int64()),
            })
            k = int(rng.integers(2, 5))
            cuts = sorted(rng.choice(range(1, n), size=k - 1,
                                     replace=False).tolist()) + [n]
            paths, lo = [], 0
            for fi, hi in enumerate(cuts):
                p = str(tmp_path / f"t{trial}_f{fi}.parquet")
                pq.write_table(t.slice(lo, hi - lo), p)
                paths.append(p)
                lo = hi
            _, want = run_curation(rd.from_arrow(t), self.SPEC)
            res = partitioned_curation(
                paths, str(tmp_path / f"ck{trial}"), self.SPEC)
            assert res["report"] == want, f"trial {trial}"


class TestRepetitionSignals:
    def test_ratios_match_brute_force(self):
        import duckdb

        from peri_ray.stages.text import repetition_signal_batch

        texts = ["a b a b a", "x y z", "w", "", None,
                 "q q q q", "one two one two three"]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        out = repetition_signal_batch(t)
        for r in out.to_pylist():
            tx = r["text"]
            if tx is None:
                assert r["n_words"] == 0 and r["dup_word_ratio"] == 0.0
                continue
            words = tx.strip().split() or [""]
            bigr = list(zip(words, words[1:]))
            assert r["n_words"] == len(words)
            assert r["dup_word_ratio"] == round(1 - len(set(words)) / len(words), 6)
            want_b = round(1 - len(set(bigr)) / len(bigr), 6) if bigr else 0.0
            assert r["dup_bigram_ratio"] == want_b

    def test_sql_twin_exact(self):
        import duckdb

        from peri_ray.stages.text import repetition_signal_batch

        t = pa.table({"doc_id": [1, 2], "text": ["a a b b a", "p q p q"]})
        out = repetition_signal_batch(t)
        want = duckdb.sql(
            "SELECT doc_id, ROUND(1 - count(DISTINCT w) * 1.0 / count(*), 6) "
            "FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w "
            "FROM t) GROUP BY doc_id ORDER BY doc_id"
        ).fetchall()
        got = {r["doc_id"]: r["dup_word_ratio"] for r in out.to_pylist()}
        for doc_id, ratio in want:
            assert got[doc_id] == ratio


class TestPII:
    def test_scan_counts(self):
        from peri_ray.stages.pii import pii_scan_batch

        t = pa.table({"text": [
            "mail bob.smith+x@corp.example.org or alice@ex.io now",
            "server at 192.168.0.1 and 10.0.0.255",
            "call +1 555-0142 or +49 123-4567",
            "nothing here",
            None,
        ]})
        out = pii_scan_batch(t)
        assert out.column("n_email").to_pylist() == [2, 0, 0, 0, 0]
        assert out.column("n_ipv4").to_pylist() == [0, 2, 0, 0, 0]
        assert out.column("n_phone").to_pylist() == [0, 0, 2, 0, 0]

    def test_redact_order_and_nulls(self):
        from peri_ray.stages.pii import pii_redact_batch

        t = pa.table({"text": [
            "bob@ex.io at 10.0.0.1 dial +1 555-0100",
            None,
        ]})
        out = pii_redact_batch(t)
        assert out.column("text").to_pylist() == [
            "<EMAIL> at <IP> dial <PHONE>", None]

    def test_matches_duckdb_regex(self):
        import duckdb

        from peri_ray.stages.pii import EMAIL_RE, pii_scan_batch

        t = pa.table({"text": ["a@b.co c@d.org", "x@y", "no"]})
        got = pii_scan_batch(t).column("n_email").to_pylist()
        want = [r[0] for r in duckdb.sql(
            f"SELECT len(regexp_extract_all(text, '{EMAIL_RE}')) FROM t"
        ).fetchall()]
        assert got == want


class TestNormalizeText:
    def test_unicode_nfc_and_whitespace(self):
        from peri_ray.stages.text import normalize_text_batch

        decomposed = "école"          # e + combining acute
        t = pa.table({"text": [
            "  hello \t\t world \n",
            decomposed,
            "a\x00b\x1fc",
            None,
            "",
        ]})
        out = normalize_text_batch(t)
        got = out.column("text").to_pylist()
        assert got[0] == "hello world"
        assert got[1] == "école"       # composed é, NFC
        assert got[2] == "a b c"
        assert got[3] is None
        assert got[4] == ""

    def test_casefold_and_duckdb_parity(self):
        import duckdb

        from peri_ray.stages.text import normalize_text_batch

        t = pa.table({"text": ["  MiXeD \t CaSe  ", "Straße"]})
        got = normalize_text_batch(t, casefold=True).column("text").to_pylist()
        want = [r[0] for r in duckdb.sql(
            "SELECT lower(trim(regexp_replace(nfc_normalize(text), "
            "'[\\t\\n\\f\\r ]+', ' ', 'g'), ' ')) FROM t").fetchall()]
        assert got == want


class TestLineDedup:
    def test_semantics(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.dedup import line_dedup

        docs = [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),
            (3, "alpha\nbeta"),
            (4, None),
            (5, "epsilon\nepsilon"),
            (6, ""),
            (7, ""),
        ]
        ds = rd.from_arrow(pa.table({"doc_id": [d for d, _ in docs],
                                     "text": [t for _, t in docs]}))
        out = {r["doc_id"]: r["text"] for r in line_dedup(ds).take_all()}
        assert out == {1: "alpha\nbeta\ngamma", 2: "delta", 3: "",
                       4: None, 5: "epsilon", 6: "", 7: ""}

    def test_fuzz_vs_brute_force(self, ray_session):
        import random

        import ray.data as rd

        from peri_ray.stages.dedup import line_dedup

        rng = random.Random(7)
        vocab = ["aa", "bb", "cc", "dd", ""]
        for trial in range(3):
            docs = []
            for i in range(40):
                n = rng.randint(1, 5)
                docs.append((i, "\n".join(rng.choice(vocab) for _ in range(n))))
            # brute force: global first occurrence by (doc, idx)
            seen = set()
            want = {}
            for i, tx in docs:
                kept = []
                for ln in tx.split("\n"):
                    if ln not in seen:
                        seen.add(ln)
                        kept.append(ln)
                want[i] = "\n".join(kept)
            ds = rd.from_arrow(pa.table({"doc_id": [d for d, _ in docs],
                                         "text": [t for _, t in docs]}))
            got = {r["doc_id"]: r["text"] for r in line_dedup(ds, n_buckets=8).take_all()}
            assert got == want, f"trial {trial}"


class TestGroupedKLL:
    def test_accuracy_per_group(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import grouped_kll_quantiles

        rng = np.random.default_rng(8)
        keys, vals = [], []
        dists = {"a": (0.0, 1.0), "b": (10.0, 2.0), "c": (-5.0, 0.5)}
        for k, (mu, sd) in dists.items():
            keys += [k] * 4000
            vals += list(rng.normal(mu, sd, 4000))
        tbl = pa.table({"k": keys, "v": pa.array(vals, pa.float64())})
        out = {r["k"]: r for r in grouped_kll_quantiles(
            rd.from_arrow(tbl).repartition(6), "k", "v",
            qs=(0.5, 0.9)).take_all()}
        for k, (mu, sd) in dists.items():
            sub = np.array(vals[:0])
            sub = np.array([v for kk, v in zip(keys, vals) if kk == k])
            assert out[k]["n"] == 4000
            assert abs(out[k]["q_0_5"] - np.quantile(sub, 0.5)) < 0.3 * sd
            assert abs(out[k]["q_0_9"] - np.quantile(sub, 0.9)) < 0.3 * sd


    def test_null_group_key(self, ray_session):
        # review regression: null dictionary indices became INT64_MIN
        import ray.data as rd

        from peri_ray.stages.stats import grouped_kll_quantiles

        tbl = pa.table({"k": ["a", None, "a", None, "b"] * 20,
                        "v": pa.array([float(i) for i in range(100)])})
        out = {r["k"]: r["n"] for r in grouped_kll_quantiles(
            rd.from_arrow(tbl).repartition(3), "k", "v",
            qs=(0.5,)).take_all()}
        assert out == {"a": 40, None: 40, "b": 20}


class TestGroupedVariance:
    def test_vs_numpy(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import grouped_variance

        rng = np.random.default_rng(4)
        keys = [["a", "b", "c"][i % 3] for i in range(300)]
        vals = rng.normal(scale=3.0, size=300)
        vals[5] = np.nan  # nulls excluded
        tbl = pa.table({"k": keys,
                        "v": pa.array([None if np.isnan(v) else float(v)
                                       for v in vals], pa.float64())})
        out = {r["k"]: (r["n"], r["var_samp"], r["stddev_samp"])
               for r in grouped_variance(
                   rd.from_arrow(tbl).repartition(5), "k", "v").to_pylist()}
        for k in ("a", "b", "c"):
            sub = np.array([v for kk, v in zip(keys, vals)
                            if kk == k and not np.isnan(v)])
            n, var, std = out[k]
            assert n == len(sub)
            assert abs(var - round(sub.var(ddof=1), 6)) <= 1e-6
            assert abs(std - round(sub.std(ddof=1), 6)) <= 1e-6

    def test_degenerate(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import grouped_variance

        tbl = pa.table({"k": ["a", "b", "b"],
                        "v": pa.array([1.0, 2.0, 2.0], pa.float64())})
        out = {r["k"]: (r["var_samp"], r["stddev_samp"])
               for r in grouped_variance(rd.from_arrow(tbl), "k", "v").to_pylist()}
        assert out["a"] == (None, None)  # n < 2
        assert out["b"] == (0.0, 0.0)  # constant


class TestBigramNLL:
    def test_vs_brute_force(self, ray_session):
        import math
        from collections import Counter

        import ray.data as rd

        from peri_ray.stages.text import bigram_nll_scores

        texts = ["a b a b c", "b c d", None, "x", "a b"]
        ds = rd.from_arrow(pa.table({"doc_id": list(range(5)),
                                     "text": texts})).repartition(3)
        got = {r["doc_id"]: (r["n_bigrams"], r["nll2"])
               for r in bigram_nll_scores(ds).take_all()}
        model = Counter()
        for tx in texts:
            if tx is None:
                continue
            w = tx.split()
            model.update(zip(w, w[1:]))
        total = sum(model.values())
        want = {}
        for i, tx in enumerate(texts):
            if tx is None:
                continue
            w = tx.split()
            bgs = list(zip(w, w[1:]))
            if not bgs:
                continue  # <2 tokens -> no row
            s = sum(-math.log(model[b] / total) for b in bgs)
            want[i] = (len(bgs), s / len(bgs))
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert abs(got[i][1] - want[i][1]) < 1e-12


class TestPackingManifest:
    def test_singleton_buckets(self, ray_session):
        # review regression: one doc per bucket used to be dropped
        # (min_run=2) and all-singleton shuffle groups crashed _pack
        import ray.data as rd

        from peri_ray.stages.text import pack_sequence_manifest

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["a b c", "d e", "f", "g h i j"]}))
        got = {(r["b"], r["seq_idx"]): (r["n_tokens"], r["n_docs"])
               for r in pack_sequence_manifest(ds, 2, n_buckets=4).take_all()}
        assert got == {(0, 0): (2, 1), (0, 1): (1, 1), (1, 0): (2, 1),
                       (2, 0): (1, 1), (3, 0): (2, 1), (3, 1): (2, 1)}

    def test_all_null_texts(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.text import pack_sequence_manifest

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, None], pa.string())}))
        assert pack_sequence_manifest(ds, 16, n_buckets=4).take_all() == []

    def test_fuzz_vs_brute_force(self, ray_session):
        import random

        import ray.data as rd

        from peri_ray.stages.text import pack_sequence_manifest

        rng = random.Random(9)
        for trial, (seq_len, n_buckets, blocks) in enumerate(
                [(16, 4, 3), (7, 2, 5), (64, 8, 1)]):
            docs = []
            for i in range(60):
                nt = rng.randint(1, 30)
                docs.append((i * 3 + 1, " ".join("w" for _ in range(nt))))
            docs.append((500, None))
            ds = rd.from_arrow(pa.table({
                "doc_id": [d for d, _ in docs],
                "text": [t for _, t in docs]})).repartition(blocks)
            got = {(r["b"], r["seq_idx"]): (r["n_tokens"], r["n_docs"])
                   for r in pack_sequence_manifest(
                       ds, seq_len, n_buckets=n_buckets).take_all()}
            # brute force
            want = {}
            from collections import defaultdict
            streams = defaultdict(list)
            for d, tx in docs:
                if tx is None:
                    continue
                streams[d % n_buckets].append((d, len(tx.split())))
            for b, lst in streams.items():
                lst.sort()
                pos = 0
                docs_in = defaultdict(set)
                for d, n in lst:
                    for s in range(pos // seq_len, (pos + n - 1) // seq_len + 1):
                        docs_in[s].add(d)
                    pos += n
                n_seq = -(-pos // seq_len)
                for s in range(n_seq):
                    nt = seq_len if s < n_seq - 1 else pos - (n_seq - 1) * seq_len
                    want[(b, s)] = (nt, len(docs_in[s]))
            assert got == want, trial


class TestUnigramNLL:
    def test_vs_brute_force(self, ray_session):
        import math

        import ray.data as rd

        from peri_ray.stages.text import unigram_nll_scores

        texts = ["a a b", "b c", None, "", "c c c a"]
        ds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": texts}))
        got = {r["doc_id"]: (r["n_tokens"], r["nll"])
               for r in unigram_nll_scores(ds).take_all()}
        # corpus tokens: a:3 b:2 c:4 '':1  total=10
        freq = {"a": 3, "b": 2, "c": 4, "": 1}
        total = 10
        for i, tx in enumerate(texts):
            if tx is None:
                assert got[i] == (0, None)
                continue
            toks = tx.strip().split(" ") if tx.strip() else [""]
            want = sum(-math.log(freq[w] / total) for w in toks) / len(toks)
            assert got[i][0] == len(toks)
            assert abs(got[i][1] - want) < 1e-12, i

    def test_max_vocab_oov(self, ray_session):
        import math

        import ray.data as rd

        from peri_ray.stages.text import unigram_nll_scores

        ds = rd.from_arrow(pa.table({"doc_id": [0, 1],
                                     "text": ["a a a b b", "c"]}))
        got = {r["doc_id"]: r["nll"]
               for r in unigram_nll_scores(ds, max_vocab=2).take_all()}
        # vocab keeps a(3), b(2); c is OOV with 1 pseudo-count of 6
        total = 6
        w0 = (3 * -math.log(3 / total) + 2 * -math.log(2 / total)) / 5
        w1 = -math.log(1 / total)
        assert abs(got[0] - w0) < 1e-12
        assert abs(got[1] - w1) < 1e-12


class TestBoilerplateRemoval:
    def test_semantics(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.dedup import remove_boilerplate_lines

        docs = [
            (1, "content one\nfooter\nnav"),
            (2, "content two\nfooter\nnav"),
            (3, "content three\nfooter"),
            (4, None),
            (5, "footer\nfooter"),  # df counts DISTINCT docs: df=4 total
            (6, ""),
        ]
        ds = rd.from_arrow(pa.table({"doc_id": [d for d, _ in docs],
                                     "text": [t for _, t in docs]}))
        out = {r["doc_id"]: r["text"]
               for r in remove_boilerplate_lines(ds, min_df=3).take_all()}
        # footer df=4 (docs 1,2,3,5) → removed everywhere; nav df=2 stays
        assert out == {1: "content one\nnav", 2: "content two\nnav",
                       3: "content three", 4: None, 5: "", 6: ""}

    def test_min_df_one_removes_everything(self, ray_session):
        # review regression: singleton lines skipped the victim fn
        import ray.data as rd

        from peri_ray.stages.dedup import remove_boilerplate_lines

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["only once\nshared", "shared"]}))
        out = {r["doc_id"]: r["text"]
               for r in remove_boilerplate_lines(ds, min_df=1).take_all()}
        assert out == {1: "", 2: ""}

    def test_fuzz_vs_brute_force(self, ray_session):
        import random

        import ray.data as rd

        from peri_ray.stages.dedup import remove_boilerplate_lines

        rng = random.Random(11)
        vocab = ["aa", "bb", "cc", "dd", "ee", ""]
        for trial, min_df in [(0, 2), (1, 3), (2, 5)]:
            docs = []
            for i in range(40):
                n = rng.randint(1, 5)
                docs.append((i, "\n".join(rng.choice(vocab) for _ in range(n))))
            from collections import defaultdict
            in_docs = defaultdict(set)
            for i, tx in docs:
                for ln in tx.split("\n"):
                    in_docs[ln].add(i)
            want = {}
            for i, tx in docs:
                kept = [ln for ln in tx.split("\n")
                        if len(in_docs[ln]) < min_df]
                want[i] = "\n".join(kept)
            ds = rd.from_arrow(pa.table({"doc_id": [d for d, _ in docs],
                                         "text": [t for _, t in docs]}))
            got = {r["doc_id"]: r["text"]
                   for r in remove_boilerplate_lines(
                       ds, min_df=min_df, n_buckets=8).take_all()}
            assert got == want, f"trial {trial}"


class TestContamination:
    def test_known_overlap(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.dedup import contamination_counts

        bench = rd.from_arrow(pa.table({
            "doc_id": [100],
            "text": ["the quick brown fox jumps over the lazy dog"]}))
        train = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "quick brown fox jumps over cliffs",   # 1 shared 5-gram
                "the quick brown fox jumps over the lazy dog",  # full copy
                "completely different words here entirely now",
                None,
            ]}))
        out = {r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
               for r in contamination_counts(train, bench, n=5).take_all()}
        # doc2: 5 distinct 5-grams in a 9-word doc
        assert out[1] == (1, True)
        assert out[2] == (5, True)
        assert out[3] == (0, False)
        assert out[4] == (0, False)

    def test_fuzz_vs_brute_force(self, ray_session):
        import random

        import ray.data as rd

        from peri_ray.stages.dedup import contamination_counts

        rng = random.Random(3)
        vocab = [f"w{i}" for i in range(12)]

        def grams(tx, n=3):
            ws = tx.split()
            return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

        bdocs = [" ".join(rng.choice(vocab) for _ in range(8)) for _ in range(5)]
        tdocs = [" ".join(rng.choice(vocab) for _ in range(10)) for _ in range(30)]
        bg = set().union(*[grams(b) for b in bdocs])
        want = {i: len(grams(t) & bg) for i, t in enumerate(tdocs)}
        bench = rd.from_arrow(pa.table({"doc_id": list(range(100, 105)),
                                        "text": bdocs}))
        train = rd.from_arrow(pa.table({"doc_id": list(range(30)),
                                        "text": tdocs}))
        got = {r["doc_id"]: r["n_shared_grams"]
               for r in contamination_counts(train, bench, n=3).take_all()}
        assert got == want


class TestHashWeightedSample:
    def test_rates_and_determinism(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import hash_weighted_sample

        n = 20000
        t = pa.table({"doc_id": list(range(n)),
                      "src": ["a" if i % 2 else "b" for i in range(n)]})
        rates = {"a": 0.25, "b": 0.75}
        ds = rd.from_arrow(t)
        got1 = sorted(r["doc_id"] for r in
                      hash_weighted_sample(ds, rates, "src", "doc_id").take_all())
        # determinism across a different block layout
        ds2 = rd.from_arrow(t).repartition(7)
        got2 = sorted(r["doc_id"] for r in
                      hash_weighted_sample(ds2, rates, "src", "doc_id").take_all())
        assert got1 == got2
        a = sum(1 for i in got1 if i % 2)
        b = len(got1) - a
        assert abs(a / (n / 2) - 0.25) < 0.02
        assert abs(b / (n / 2) - 0.75) < 0.02

    def test_missing_group_dropped(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import hash_weighted_sample

        t = pa.table({"doc_id": [1, 2, 3], "src": ["a", "zzz", None]})
        out = hash_weighted_sample(rd.from_arrow(t), {"a": 1.0}, "src", "doc_id")
        assert [r["doc_id"] for r in out.take_all()] == [1]

    def test_temperature_rates(self):
        from peri_ray.stages.stats import temperature_rates

        counts = {"big": 1_000_000, "small": 1_000}
        r = temperature_rates(counts, alpha=0.5)
        # alpha<1 upweights the small source
        assert r["small"] > r["big"]
        # expected kept total ~ input total
        exp = sum(r[k] * counts[k] for k in counts)
        assert abs(exp - sum(counts.values())) / sum(counts.values()) < 0.05
        # alpha=1 keeps everything (rates cap at 1)
        assert temperature_rates(counts, alpha=1.0) == {"big": 1.0, "small": 1.0}


class TestGroupedCorr:
    def test_matches_numpy_and_degenerates(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import grouped_corr

        rng = np.random.default_rng(5)
        x = rng.normal(10, 3, 500)
        y = 2 * x + rng.normal(0, 1, 500)
        t = pa.table({
            "k": ["a"] * 500 + ["const", "const", "single"],
            "x": np.concatenate([x, [1.0, 1.0], [3.0]]),
            "y": np.concatenate([y, [2.0, 5.0], [4.0]]),
        })
        out = {r["k"]: (r["n"], r["corr"])
               for r in grouped_corr(rd.from_arrow(t).repartition(4),
                                     "k", "x", "y").to_pylist()}
        want = round(float(np.corrcoef(x, y)[0, 1]), 6)
        assert out["a"][0] == 500 and abs(out["a"][1] - want) <= 1e-6
        assert out["const"] == (2, None)   # zero variance in x
        assert out["single"] == (1, None)  # n < 2

    def test_null_rows_excluded(self, ray_session):
        import ray.data as rd

        from peri_ray.stages.stats import grouped_corr

        t = pa.table({"k": ["g"] * 4,
                      "x": [1.0, 2.0, None, 3.0],
                      "y": [2.0, 4.0, 9.0, None]})
        out = grouped_corr(rd.from_arrow(t), "k", "x", "y").to_pylist()
        assert out == [{"k": "g", "n": 2, "corr": 1.0}]


class TestHashSplit:
    def test_partition_is_exhaustive_and_layout_stable(self):
        from peri_ray.stages.stats import hash_split_summary

        t = pa.table({
            "doc_id": pa.array(range(2000), pa.int64()),
            "n_chars": pa.array([i % 7 for i in range(2000)], pa.int64()),
        })
        a = hash_split_summary(rd.from_arrow(t).repartition(7),
                               "doc_id", "n_chars")
        b = hash_split_summary(rd.from_arrow(t).repartition(2),
                               "doc_id", "n_chars")
        assert a.to_pylist() == b.to_pylist()
        rows = {r["split"]: r for r in a.to_pylist()}
        assert sum(r["n_rows"] for r in rows.values()) == 2000
        assert sum(r["sum_val"] for r in rows.values()) == \
            sum(i % 7 for i in range(2000))
        # ~80/10/10 with integer-hash jitter
        assert rows["train"]["n_rows"] > rows["val"]["n_rows"]
        assert rows["train"]["n_rows"] > rows["test"]["n_rows"]

    def test_nulls_count_as_zero_and_rows_still_counted(self):
        from peri_ray.stages.stats import hash_split_summary

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "n_chars": pa.array([10, None, 5], pa.int64())})
        out = hash_split_summary(rd.from_arrow(t), "doc_id", "n_chars")
        rows = out.to_pylist()
        assert sum(r["n_rows"] for r in rows) == 3
        assert sum(r["sum_val"] for r in rows) == 15


class TestMovingWindow:
    def test_matches_brute_force(self):
        from peri_ray.stages.temporal import moving_window_sums

        rng = np.random.default_rng(7)
        n = 400
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 50, n), pa.timestamp("us")),
            "value": pa.array(rng.normal(0, 5, n)),
        })
        out = {r["event_id"]: (r["win_sum_micro"], r["win_n"])
               for r in moving_window_sums(
                   rd.from_arrow(t).repartition(5), window=3).take_all()}
        # brute force per user
        rows = sorted(zip(t.column("user_id").to_pylist(),
                          t.column("ts").to_pylist(),
                          t.column("event_id").to_pylist(),
                          t.column("value").to_pylist()))
        import collections
        hist: dict = collections.defaultdict(list)
        for u, ts, i, v in rows:
            micro = int(np.floor(v * 1e6 + 0.5)) if v >= 0 \
                else int(np.ceil(v * 1e6 - 0.5))
            hist[u].append((i, micro))
            frame = hist[u][-3:]
            assert out[i] == (sum(m for _, m in frame), len(frame))
        assert len(out) == n

    def test_nulls_excluded_and_window_one(self):
        from peri_ray.stages.temporal import moving_window_sums

        t = pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, None, 1, 1], pa.int64()),
            "ts": pa.array([10, 20, None, 40], pa.timestamp("us")),
            "value": pa.array([1.5, 2.0, 3.0, None]),
        })
        out = moving_window_sums(rd.from_arrow(t), window=1).take_all()
        assert [(r["event_id"], r["win_sum_micro"], r["win_n"])
                for r in out] == [(1, 1500000, 1)]


class TestMinMaxNormalize:
    def test_matches_brute_force_with_nulls_and_constant_group(self):
        from peri_ray.stages.stats import minmax_normalize

        t = pa.table({
            "id": pa.array(range(8), pa.int64()),
            "k": pa.array(["a", "a", "a", "b", "b", "c", None, None]),
            "v": pa.array([1.0, 3.0, None, 5.0, 5.0, 2.0, 0.0, 4.0]),
        })
        out = {r["id"]: r["norm_value"]
               for r in minmax_normalize(rd.from_arrow(t).repartition(3),
                                         "k", "v", "id").take_all()}
        assert out[0] == 0.0 and out[1] == 1.0
        assert out[2] is None          # null value
        assert out[3] is None and out[4] is None  # constant group
        assert out[5] is None          # singleton group (span 0)
        assert out[6] == 0.0 and out[7] == 1.0    # null key is a group


class TestGini:
    def test_uniform_and_concentrated(self):
        from peri_ray.stages.stats import gini_concentration

        uniform = pa.table({"k": ["a"] * 10 + ["b"] * 10 + ["c"] * 10})
        g = gini_concentration(rd.from_arrow(uniform), "k").to_pylist()[0]
        assert g == {"gini": 0.0, "n_groups": 3}

        skew = pa.table({"k": ["a"] * 98 + ["b", "c"]})
        g2 = gini_concentration(rd.from_arrow(skew), "k").to_pylist()[0]
        # brute force: counts [1, 1, 98] ascending
        n, tot = 3, 100
        expect = (2 * (1 * 1 + 2 * 1 + 3 * 98) - (n + 1) * tot) / (n * tot)
        assert g2["gini"] == expect and g2["gini"] > 0.6

    def test_empty_input_yields_null(self):
        from peri_ray.stages.stats import gini_concentration

        t = pa.table({"k": pa.array([], pa.string())})
        g = gini_concentration(rd.from_arrow(t), "k").to_pylist()[0]
        assert g == {"gini": None, "n_groups": 0}


class TestExpectationSuite:
    def _table(self):
        return pa.table({
            "id": pa.array([1, 2, 3, 4, 5, 5, None], pa.int64()),
            "lang": pa.array(["en", "de", None, "xx", "en", "en", "fr"]),
            "n": pa.array([10, -3, 5, None, 200, 7, 1], pa.int64()),
        })

    def test_all_forms(self):
        from peri_ray.stages.expect import expectation_suite

        ds = rd.from_arrow(self._table()).repartition(3)
        out = expectation_suite(ds, [
            ("row_count_between", 1, 100),
            ("null_fraction_at_most", "lang", 0.2),
            ("min_gte", "n", 0),
            ("max_lte", "n", 100),
            ("values_between", "n", 0, 100),
            ("values_in_set", "lang", ["en", "de", "fr"]),
            ("unique", "id"),
        ]).to_pylist()
        by = {r["check_id"]: r for r in out}
        # verdicts in input order
        assert [r["check_id"] for r in out] == [
            "row_count_between", "null_fraction_at_most:lang",
            "min_gte:n", "max_lte:n", "values_between:n",
            "values_in_set:lang", "unique:id"]
        assert by["row_count_between"] == {
            "check_id": "row_count_between", "observed": 7, "passed": True}
        # 1 null of 7 rows > 0.2 floor-micro threshold
        assert by["null_fraction_at_most:lang"]["observed"] == 1
        assert by["null_fraction_at_most:lang"]["passed"] is True  # 1/7 ≈ 0.143
        assert by["min_gte:n"] == {
            "check_id": "min_gte:n", "observed": 1, "passed": False}
        assert by["max_lte:n"] == {
            "check_id": "max_lte:n", "observed": 1, "passed": False}
        assert by["values_between:n"]["observed"] == 2   # -3 and 200; null skipped
        assert by["values_in_set:lang"]["observed"] == 1  # "xx"; null skipped
        assert by["unique:id"] == {
            "check_id": "unique:id", "observed": 1, "passed": False}

    def test_fraction_boundary_is_floor_micro_exact(self):
        from peri_ray.stages.expect import expectation_suite

        # 1 null of 8 rows = 0.125 exactly; threshold 0.125 passes,
        # anything below fails (floor to integer micro-units, no float ==)
        t = pa.table({"x": pa.array([None] + [1] * 7, pa.int64())})
        ds = rd.from_arrow(t)
        ok = expectation_suite(ds, [("null_fraction_at_most", "x", 0.125)])
        assert ok.to_pylist()[0]["passed"] is True
        bad = expectation_suite(ds, [("null_fraction_at_most", "x", 0.124999)])
        assert bad.to_pylist()[0]["passed"] is False

    def test_unique_only_and_empty_suite(self):
        from peri_ray.stages.expect import expectation_suite

        t = pa.table({"k": pa.array([1, 1, 1, 2, None, None], pa.int64())})
        out = expectation_suite(rd.from_arrow(t).repartition(2),
                                [("unique", "k")]).to_pylist()
        # three 1s -> 2 extra; nulls never count
        assert out == [{"check_id": "unique:k", "observed": 2,
                        "passed": False}]


class TestModePerGroup:
    def test_ties_and_nulls(self):
        from peri_ray.stages.stats import mode_per_group

        t = pa.table({
            "k": pa.array([1, 1, 1, 2, 2, 2, 2, 3, None, None], pa.int64()),
            "v": pa.array(["b", "a", "b", "x", "y", "x", "y",
                           None, "z", "z"]),
        })
        out = {r["k"]: (r["mode"], r["n"])
               for r in mode_per_group(rd.from_arrow(t).repartition(3),
                                       "k", "v").take_all()}
        assert out[1] == ("b", 2)
        assert out[2] == ("x", 2)      # tie x/y at 2 -> smaller value
        assert 3 not in out            # all-null values: no mode row
        assert out[None] == ("z", 2)   # null key is a group

    def test_partials_merge_across_blocks(self):
        from peri_ray.stages.stats import mode_per_group

        # "a" wins only after merging counts split across blocks
        t = pa.table({"k": ["g"] * 6,
                      "v": ["a", "b", "b", "a", "a", "c"]})
        out = mode_per_group(rd.from_arrow(t).repartition(6),
                             "k", "v").take_all()
        assert out == [{"k": "g", "mode": "a", "n": 3}]


class TestRepairEnum:
    def test_invalid_replaced_nulls_kept(self):
        from peri_ray.stages.checks import repair_enum

        t = pa.table({
            "id": pa.array(range(8), pa.int64()),
            "lang": pa.array(["en", "en", "de", "zz", None, "xx",
                              "de", "de"]),
        })
        out = {r["id"]: r["lang"]
               for r in repair_enum(rd.from_arrow(t).repartition(2),
                                    "lang", ["en", "de", "fr"]).take_all()}
        # mode of valid = de (3 > 2)
        assert out[3] == "de" and out[5] == "de"
        assert out[4] is None
        assert out[0] == "en" and out[2] == "de"

    def test_mode_tie_breaks_to_smallest(self):
        from peri_ray.stages.checks import repair_enum

        t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                      "lang": pa.array(["fr", "de", "??"])})
        out = repair_enum(rd.from_arrow(t), "lang",
                          ["de", "fr"]).take_all()
        assert {r["id"]: r["lang"] for r in out}[2] == "de"

    def test_no_valid_values_raises(self):
        from peri_ray.stages.checks import repair_enum

        t = pa.table({"lang": pa.array(["xx", "yy"])})
        with pytest.raises(ValueError):
            repair_enum(rd.from_arrow(t), "lang", ["en"])


class TestPercentileCont:
    def test_matches_numpy_interpolation(self):
        from peri_ray.stages.stats import percentile_cont_continuous

        rng = np.random.default_rng(7)
        v = rng.normal(50, 12, 10_001)
        t = pa.table({"value": pa.array(v, pa.float64())})
        out = percentile_cont_continuous(
            rd.from_arrow(t).repartition(8), "value",
            qs=(0.25, 0.5, 0.75)).to_pylist()
        got = {r["q"]: r["value"] for r in out}
        s = np.sort(v)
        import math
        for q in (0.25, 0.5, 0.75):
            rn = (len(s) - 1) * q
            frn, crn = math.floor(rn), math.ceil(rn)
            want = (s[frn] if frn == crn
                    else s[frn] * (crn - rn) + s[crn] * (rn - frn))
            assert got[q] == want

    def test_even_count_median_interpolates(self):
        from peri_ray.stages.stats import percentile_cont_continuous

        t = pa.table({"value": pa.array([1.0, 2.0, 10.0, 100.0])})
        out = percentile_cont_continuous(rd.from_arrow(t), "value",
                                         qs=(0.5,)).to_pylist()
        assert out[0]["value"] == 2.0 * 0.5 + 10.0 * 0.5

    def test_nulls_skipped_and_empty(self):
        from peri_ray.stages.stats import percentile_cont_continuous

        t = pa.table({"value": pa.array([None, 5.0, None], pa.float64())})
        out = percentile_cont_continuous(rd.from_arrow(t), "value",
                                         qs=(0.5,)).to_pylist()
        assert out == [{"q": 0.5, "value": 5.0}]
        empty = pa.table({"value": pa.array([], pa.float64())})
        assert percentile_cont_continuous(
            rd.from_arrow(empty), "value").num_rows == 0


class TestSaltedHashJoin:
    def _fixture(self):
        rng = np.random.default_rng(3)
        # Zipf-ish: key 7 owns half the fact side
        keys = np.where(rng.random(4000) < 0.5, 7,
                        rng.integers(0, 200, 4000))
        fact = pa.table({
            "k": pa.array(keys, pa.int64()),
            "x": pa.array(np.arange(4000), pa.int64()),
        })
        dim = pa.table({
            "dk": pa.array(np.arange(0, 150), pa.int64()),  # 150..199 unmatched
            "seg": pa.array([f"s{i % 5}" for i in range(150)]),
        })
        return fact, dim

    def _sorted(self, ds):
        rows = [tuple(sorted(r.items())) for r in ds.take_all()]
        return sorted(rows)

    @pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
    def test_equals_plain_hash_join(self, how):
        from peri_ray.stages.joins import hash_join, salted_hash_join

        fact_t, dim_t = self._fixture()
        fact, dim = rd.from_arrow(fact_t).repartition(5), rd.from_arrow(dim_t)
        plain = hash_join(fact, dim, "k", "dk", ["x"], ["seg"], how=how)
        salted = salted_hash_join(fact, dim, "k", "dk", ["x"], ["seg"],
                                  how=how, replication=4,
                                  hot_threshold=500)
        assert self._sorted(salted) == self._sorted(plain)

    def test_explicit_hot_keys_and_rejections(self):
        from peri_ray.stages.joins import hash_join, salted_hash_join

        fact_t, dim_t = self._fixture()
        fact, dim = rd.from_arrow(fact_t).repartition(5), rd.from_arrow(dim_t)
        salted = salted_hash_join(fact, dim, "k", "dk", ["x"], ["seg"],
                                  how="inner", replication=8,
                                  hot_keys=["7"])
        plain = hash_join(fact, dim, "k", "dk", ["x"], ["seg"], how="inner")
        assert self._sorted(salted) == self._sorted(plain)
        with pytest.raises(ValueError):
            salted_hash_join(fact, dim, "k", "dk", ["x"], ["seg"],
                             how="full")
        with pytest.raises(ValueError):
            salted_hash_join(fact, dim, "k", "dk", ["x"], ["seg"],
                             replication=1)

    def test_detect_hot_keys_superset_and_bound(self):
        from peri_ray.stages.joins import detect_hot_keys

        t = pa.table({"k": pa.array([1] * 900 + list(range(2, 102)),
                                    pa.int64())})
        ds = rd.from_arrow(t).repartition(4)
        hot = detect_hot_keys(ds, "k", hot_threshold=500, mg_k=64)
        assert "1" in hot
        # 500 keys × count 2 with a tiny summary: the shrink cut is 2,
        # so err reaches the threshold and the superset guarantee is
        # void -> must raise, never silently miss
        u = pa.table({"k": pa.array(sorted(range(500)) * 2, pa.int64())})
        with pytest.raises(ValueError):
            detect_hot_keys(rd.from_arrow(u), "k",
                            hot_threshold=2, mg_k=4)


class TestStatsCombineLevel:
    def test_combine_level_identical_exact_fields(self):
        from peri_ray.stages.stats import column_stats

        rng = np.random.default_rng(5)
        t = pa.table({
            "a": pa.array(rng.integers(0, 1000, 5000), pa.int64()),
            "b": pa.array([f"v{i % 97}" for i in range(5000)]),
        })
        ds = rd.from_arrow(t).repartition(16)
        flat = column_stats(ds, ["a", "b"], combine_batch=None)
        tree = column_stats(ds, ["a", "b"], combine_batch=3)
        for c in ("a", "b"):
            for f in ("count", "null_count", "min", "max", "sum"):
                assert flat[c].get(f) == tree[c].get(f), (c, f)
        # sketches stay valid mergeable summaries: ndv within HLL error
        assert abs(tree["b"]["ndv"] - 97) / 97 < 0.15
        assert abs(tree["a"]["quantiles"]["0.5"] - 500) < 60


class TestRangePartitionedSink:
    def test_roundtrip_balance_and_pruned_read(self, tmp_path):
        from peri_ray.sources import read_key_range, write_range_partitioned

        rng = np.random.default_rng(11)
        vals = rng.uniform(0, 1000, 20_000)
        vals[:50] = np.nan  # null keys
        t = pa.table({
            "k": pa.array([None if np.isnan(v) else float(v) for v in vals],
                          pa.float64()),
            "i": pa.array(np.arange(20_000), pa.int64()),
        })
        out = str(tmp_path / "ranged")
        man = write_range_partitioned(rd.from_arrow(t).repartition(8),
                                      "k", out, n_ranges=8)
        assert man["n_ranges"] == 8 and len(man["splits"]) == 7

        # round-trip: every row lands somewhere exactly once
        back = rd.read_parquet(out)
        assert back.count() == 20_000
        assert sorted(r["i"] for r in back.select_columns(["i"]).take_all()) \
            == list(range(20_000))

        # balance: each range within 3x KLL error of the fair share
        import collections
        sizes = collections.Counter(
            r["range_id"] for r in back.select_columns(["range_id"]).take_all())
        fair = 20_000 / 8
        assert all(abs(c - fair) < fair * 0.5 for c in sizes.values()), sizes

        # pruned read: exact [lo, hi] semantics, boundaries included
        lo, hi = man["splits"][1], man["splits"][4]
        got = read_key_range(out, lo, hi).take_all()
        want = [r for r in t.to_pylist()
                if r["k"] is not None and lo <= r["k"] <= hi]
        assert sorted(r["i"] for r in got) == sorted(r["i"] for r in want)
        # nulls excluded from bounded reads, present in full read-back
        full = read_key_range(out, None, None).take_all()
        assert len(full) == 20_000
        assert sum(1 for r in full if r["k"] is None) == 50

    def test_all_null_key_raises(self, tmp_path):
        from peri_ray.sources import write_range_partitioned

        t = pa.table({"k": pa.array([None, None], pa.float64()),
                      "i": pa.array([0, 1], pa.int64())})
        with pytest.raises(ValueError):
            write_range_partitioned(rd.from_arrow(t), "k",
                                    str(tmp_path / "x"))

    def test_temporal_key_roundtrip(self, tmp_path):
        # timestamp keys: splits/bounds are epoch values in the
        # column's native unit (µs for timestamp[us])
        import datetime as dt

        from peri_ray.sources import read_key_range, write_range_partitioned

        base = dt.datetime(2024, 1, 1)
        stamps = [base + dt.timedelta(hours=int(h)) for h in range(2000)]
        stamps[7] = None
        t = pa.table({
            "ts": pa.array(stamps, pa.timestamp("us")),
            "i": pa.array(np.arange(2000), pa.int64()),
        })
        out = str(tmp_path / "ts_ranged")
        man = write_range_partitioned(rd.from_arrow(t).repartition(4),
                                      "ts", out, n_ranges=4)
        assert len(man["splits"]) == 3
        full = read_key_range(out, None, None).take_all()
        assert len(full) == 2000

        lo_dt, hi_dt = stamps[100], stamps[500]
        lo = lo_dt.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
        hi = hi_dt.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
        got = sorted(r["i"] for r in read_key_range(out, lo, hi).take_all())
        want = sorted(i for i, s in enumerate(stamps)
                      if s is not None and lo_dt <= s <= hi_dt)
        assert got == want


class TestGroupedHLL:
    def test_estimates_within_error(self):
        from peri_ray.stages.stats import grouped_hll_ndv

        rng = np.random.default_rng(13)
        # group a: 1000 distinct; group b: 50 distinct; null key group: 10
        keys = ["a"] * 5000 + ["b"] * 2000 + [None] * 100
        vals = (list(rng.integers(0, 1000, 5000))
                + list(rng.integers(10_000, 10_050, 2000))
                + list(rng.integers(20_000, 20_010, 100)))
        t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
        out = {r["k"]: r["ndv"]
               for r in grouped_hll_ndv(rd.from_arrow(t).repartition(7),
                                        "k", "v").take_all()}
        true = {"a": len(set(vals[:5000])), "b": len(set(vals[5000:7000])),
                None: len(set(vals[7000:]))}
        for k, exact in true.items():
            assert abs(out[k] - exact) / exact < 0.1, (k, out[k], exact)

    def test_string_values_and_null_values_skipped(self):
        from peri_ray.stages.stats import grouped_hll_ndv

        t = pa.table({"k": ["g"] * 6,
                      "v": pa.array(["x", "y", None, "x", "z", None])})
        out = grouped_hll_ndv(rd.from_arrow(t), "k", "v").take_all()
        assert out == [{"k": "g", "ndv": 3}]


class TestChangesetCastValidate:
    def test_cast_errors_and_spec_violations_combine(self):
        from peri_ray.changeset import cast_and_validate

        t = pa.table({
            "k": pa.array(["1", "2x", None, "4", "5"]),
            "v": pa.array(["1.5", "2.0", "3.0", "-9.5", "oops"]),
        })
        spec = {"k": ("required", "integer"),
                "v": ("float", ("gte", 0.0))}
        out = cast_and_validate(rd.from_arrow(t).repartition(2), spec=spec,
                                cast_rules={"k": "integer", "v": "float"},
                                id_column="k").take_all()
        by = {r["record_id"]: r for r in out}
        # row "1": clean
        assert by["1"]["valid"] is True and by["1"]["violations"] == []
        assert by["1"]["k"] == 1 and by["1"]["v"] == 1.5
        # row "2x": cast error on k -> ONLY "is invalid" (the required
        # check on the nulled cell is superseded, Ecto parity)
        r2 = [r for r in out if r["k"] is None and r["v"] == 2.0][0]
        msgs = {(v["rule_id"], v["message"]) for v in r2["violations"]}
        assert msgs == {("cast:k", "is invalid")}
        assert r2["valid"] is False
        # row None k: null is NOT a cast error, but required fires
        r3 = [r for r in out if r["v"] == 3.0][0]
        assert all(not v["rule_id"].startswith("cast") for v in r3["violations"])
        assert r3["valid"] is False
        # row "4": casts fine, spec gte violation
        assert by["4"]["valid"] is False
        assert by["4"]["violations"][0]["rule_id"] != "cast:v"
        # row "5": v cast error -> nulled; gte on null passes, but the
        # cast error still invalidates the row
        assert by["5"]["valid"] is False
        assert {v["rule_id"] for v in by["5"]["violations"]} == {"cast:v"}
        actual = by["5"]["violations"][0]["actual"]
        assert actual == "oops" and by["5"]["violations"][0]["expected"] == "float"

    def test_typed_output_schema(self):
        from peri_ray.changeset import cast_and_validate

        t = pa.table({"k": pa.array(["7"]), "v": pa.array(["1.25"])})
        ds = cast_and_validate(rd.from_arrow(t),
                               spec={"k": "integer", "v": "float"},
                               cast_rules={"k": "integer", "v": "float"})
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        assert types["k"] == pa.int64() and types["v"] == pa.float64()


class TestLocfFill:
    def test_fill_fenced_at_key_runs(self):
        from peri_ray.stages.temporal import locf_fill

        t = pa.table({
            "u": pa.array([1, 1, 1, 1, 2, 2, None, None], pa.int64()),
            "ts": pa.array([1, 2, 3, 4, 1, 2, 1, 2], pa.int64()),
            "id": pa.array(list(range(8)), pa.int64()),
            "v": pa.array([10.0, None, None, 40.0, None, 5.0, None, 7.0],
                          pa.float64()),
        })
        out = {r["id"]: r["v"]
               for r in locf_fill(rd.from_arrow(t).repartition(3), "u",
                                  ["ts"], "v", "id").take_all()}
        assert out[0] == 10.0 and out[1] == 10.0 and out[2] == 10.0
        assert out[3] == 40.0
        assert out[4] is None        # leading null: no prior obs for key 2
        assert out[5] == 5.0
        assert out[6] is None and out[7] == 7.0  # null key is its own run

    def test_matches_brute_force(self):
        from peri_ray.stages.temporal import locf_fill

        rng = np.random.default_rng(17)
        n = 3000
        u = rng.integers(0, 40, n)
        ts = rng.permutation(n)
        v = rng.uniform(0, 1, n)
        mask = rng.random(n) < 0.4
        vv = [None if m else float(x) for m, x in zip(mask, v)]
        t = pa.table({"u": pa.array(u, pa.int64()),
                      "ts": pa.array(ts, pa.int64()),
                      "id": pa.array(np.arange(n), pa.int64()),
                      "v": pa.array(vv, pa.float64())})
        got = {r["id"]: r["v"]
               for r in locf_fill(rd.from_arrow(t).repartition(6), "u",
                                  ["ts"], "v", "id").take_all()}
        # brute force per key
        import collections
        byk = collections.defaultdict(list)
        for i in range(n):
            byk[int(u[i])].append(i)
        want = {}
        for k, idxs in byk.items():
            last = None
            for i in sorted(idxs, key=lambda i: int(ts[i])):
                if vv[i] is not None:
                    last = vv[i]
                want[i] = last
        assert got == want


class TestLagColumn:
    def test_lag_and_lead_fenced(self):
        from peri_ray.stages.temporal import lag_column

        t = pa.table({
            "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([1, 2, 3, 1, 2], pa.int64()),
            "id": pa.array(list(range(5)), pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 1.0, 2.0], pa.float64()),
        })
        lag1 = {r["id"]: r["lag_v"]
                for r in lag_column(rd.from_arrow(t).repartition(2), "u",
                                    ["ts"], "v", "id", offset=1).take_all()}
        assert lag1 == {0: None, 1: 10.0, 2: 20.0, 3: None, 4: 1.0}
        lead1 = {r["id"]: r["lag_v"]
                 for r in lag_column(rd.from_arrow(t), "u", ["ts"], "v",
                                     "id", offset=-1).take_all()}
        assert lead1 == {0: 20.0, 1: 30.0, 2: None, 3: 2.0, 4: None}
        lag3 = {r["id"]: r["lag_v"]
                for r in lag_column(rd.from_arrow(t), "u", ["ts"], "v",
                                    "id", offset=3).take_all()}
        assert all(v is None for v in lag3.values())


class TestEditDistanceJoin:
    def test_matches_brute_force_d1(self):
        from peri_ray.stages.dedup import edit_distance_join

        names = ["kitten", "sitten", "sittin", "kittens", "apple",
                 "appl", "xyz", "kitte", "aple", "mitten"]
        t = pa.table({"id": pa.array(range(len(names)), pa.int64()),
                      "name": pa.array(names)})
        got = {(r["id_a"], r["id_b"])
               for r in edit_distance_join(
                   rd.from_arrow(t).repartition(3), "name", "id",
                   max_dist=1).take_all()}
        import itertools as it
        def lev(a, b):
            import numpy as _np
            d = _np.arange(len(b) + 1)
            for i, ca in enumerate(a, 1):
                prev, d[0] = d[0], i
                for j, cb in enumerate(b, 1):
                    prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                           prev + (ca != cb))
            return d[len(b)]
        want = {(i, j) for i, j in it.combinations(range(len(names)), 2)
                if lev(names[i], names[j]) <= 1}
        assert got == want and len(want) >= 4

    def test_d2_and_guards(self):
        from peri_ray.stages.dedup import edit_distance_join

        names = ["abcdef", "abXdYf", "abcdxy", "zzzzzz"]
        t = pa.table({"id": pa.array(range(4), pa.int64()),
                      "name": pa.array(names)})
        got = {(r["id_a"], r["id_b"])
               for r in edit_distance_join(rd.from_arrow(t), "name", "id",
                                           max_dist=2).take_all()}
        assert (0, 1) in got and (0, 2) in got and (3, 0) not in got

        long = pa.table({"id": pa.array([0], pa.int64()),
                         "name": pa.array(["x" * 100])})
        import ray.exceptions
        with pytest.raises(Exception):
            edit_distance_join(rd.from_arrow(long), "name", "id",
                               max_len=64).take_all()

    def test_nulls_skipped(self):
        from peri_ray.stages.dedup import edit_distance_join

        t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                      "name": pa.array(["abc", None, "abd"])})
        got = edit_distance_join(rd.from_arrow(t), "name", "id").take_all()
        assert {(r["id_a"], r["id_b"]) for r in got} == {(0, 2)}


class TestKnnGraph:
    def test_matches_brute_force(self):
        from peri_ray.stages.similarity import knn_graph

        rng = np.random.default_rng(23)
        n, d, k = 120, 16, 5
        m = rng.normal(size=(n, d))
        t = pa.table({
            "vec_id": pa.array(np.arange(n) * 7, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float64())),
        })
        out = knn_graph(rd.from_arrow(t).repartition(4), k=k,
                        block_rows=30).take_all()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(
                (r["cos"], r["neighbor_id"]))
        # brute force with the same (rounded cos desc, id asc) order
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = np.round(norm @ norm.T, 6)
        np.fill_diagonal(s, -np.inf)
        ids = np.arange(n) * 7
        for qi in range(n):
            order = sorted(range(n), key=lambda j: (-s[qi, j], ids[j]))[:k]
            want = [(s[qi, j], ids[j]) for j in order]
            have = sorted(got[ids[qi]], key=lambda x: (-x[0], x[1]))
            assert have == want, (qi, have[:2], want[:2])
        assert all(len(v) == k for v in got.values())


class TestFdViolations:
    def test_detects_multi_valued_keys(self):
        from peri_ray.stages.checks import fd_violations

        t = pa.table({
            "a": pa.array(["x", "x", "x", "y", "y", "z", None, "w"]),
            "b": pa.array(["1", "2", "1", "7", "7", None, "5", "9"]),
        })
        out = {r["a"]: r["n_dep"]
               for r in fd_violations(rd.from_arrow(t).repartition(3),
                                      "a", "b").take_all()}
        # x -> {1,2} violates; y -> {7} holds; z has only null dep;
        # null key excluded; w single
        assert out == {"x": 2}

    def test_cross_block_pairs_merge(self):
        from peri_ray.stages.checks import fd_violations

        # same (a,b) pair split across blocks must NOT count twice
        t = pa.table({"a": ["k"] * 6, "b": ["1", "1", "1", "2", "2", "2"]})
        out = fd_violations(rd.from_arrow(t).repartition(6),
                            "a", "b").take_all()
        assert out == [{"a": "k", "n_dep": 2}]


class TestBudgetSubset:
    def _brute(self, ids, w, budget):
        # prefix-scan semantics (SQL: WHERE running_sum <= budget):
        # the first overflowing row STOPS the scan
        order = sorted(range(len(ids)), key=lambda i: (-w[i], ids[i]))
        keep, c = [], 0
        for i in order:
            if c + w[i] > budget:
                break
            c += w[i]
            keep.append(ids[i])
        return sorted(keep)

    def test_matches_cumulative_scan(self):
        from peri_ray.stages.stats import budget_subset_ids

        rng = np.random.default_rng(29)
        n = 2000
        ids = rng.permutation(n) * 3
        w = rng.integers(1, 40, n)
        t = pa.table({"id": pa.array(ids, pa.int64()),
                      "w": pa.array(w, pa.int64())})
        for budget in (0, 17, 5000, 20_000, 10**9):
            got = sorted(r["id"] for r in budget_subset_ids(
                rd.from_arrow(t).repartition(5), "w", "id",
                budget).take_all())
            assert got == self._brute(list(ids), list(w), budget), budget

    def test_zero_weights_kept_and_negative_raise(self):
        from peri_ray.stages.stats import budget_subset_ids

        t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                      "w": pa.array([5, 0, 0, 5], pa.int64())})
        got = sorted(r["id"] for r in budget_subset_ids(
            rd.from_arrow(t), "w", "id", 10).take_all())
        assert got == [1, 2, 3, 4]
        bad = pa.table({"id": pa.array([1], pa.int64()),
                        "w": pa.array([-2], pa.int64())})
        with pytest.raises(ValueError):
            budget_subset_ids(rd.from_arrow(bad), "w", "id", 10)


class TestReviewRegressions:
    def test_grouped_hll_null_key_single_bucket(self):
        # judge-style repro: a null-key run sharing a bucket with a
        # non-null key must not poison concat_tables with a null-typed
        # key column
        from peri_ray.stages.stats import grouped_hll_ndv

        t = pa.table({"k": pa.array(["a"] * 5 + [None] * 5),
                      "v": pa.array(list(range(5)) + list(range(3)) + [0, 1],
                                    pa.int64())})
        out = {r["k"]: r["ndv"]
               for r in grouped_hll_ndv(rd.from_arrow(t), "k", "v",
                                        n_buckets=1).take_all()}
        assert out == {"a": 5, None: 3}

    def test_grouped_hll_float_values(self):
        from peri_ray.stages.stats import grouped_hll_ndv

        t = pa.table({"k": ["g"] * 4,
                      "v": pa.array([1.25, 2.5, 1.25, 3.75], pa.float64())})
        out = grouped_hll_ndv(rd.from_arrow(t), "k", "v").take_all()
        assert out == [{"k": "g", "ndv": 3}]

    def test_grouped_kll_null_key_single_bucket(self):
        from peri_ray.stages.stats import grouped_kll_quantiles

        t = pa.table({"k": pa.array(["a"] * 4 + [None] * 4),
                      "v": pa.array([1.0, 2, 3, 4, 10, 20, 30, 40])})
        out = {r["k"]: r["n"]
               for r in grouped_kll_quantiles(rd.from_arrow(t), "k", "v",
                                              n_buckets=1).take_all()}
        assert out == {"a": 4, None: 4}


class TestUnnestList:
    def test_explode_semantics(self):
        from peri_ray.stages.stats import unnest_list

        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "xs": pa.array([[10, None, 30], None, []],
                           pa.list_(pa.int64())),
        })
        out = unnest_list(rd.from_arrow(t).repartition(2), "xs",
                          ["id"]).take_all()
        rows = sorted((r["id"], r["idx"], r["value"]) for r in out)
        # null list -> no rows; empty list -> no rows; null element kept
        assert rows == [(1, 1, 10), (1, 2, None), (1, 3, 30)]


class TestCompressionRatio:
    def test_repetitive_compresses_below_random(self):
        from peri_ray.stages.text import add_compression_ratio

        rng = np.random.default_rng(31)
        rand = "".join(chr(97 + c) for c in rng.integers(0, 26, 4000))
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(["spam " * 800, rand, None, ""])})
        out = {r["doc_id"]: r["zlib_ratio"]
               for r in add_compression_ratio(
                   rd.from_arrow(t)).take_all()}
        assert out[1] < 0.05          # pure repetition
        assert out[2] > 0.5           # random letters barely compress
        assert out[3] is None and out[4] is None


class TestAsofForward:
    def test_forward_vs_backward(self):
        from peri_ray.stages.temporal import asof_join

        def _ts(vals):
            return pa.array(np.array(vals, "datetime64[us]"))

        left = pa.table({
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "lts": _ts(["2024-01-01T00:00:05", "2024-01-01T00:00:10",
                        "2024-01-01T00:00:20", "2024-01-01T00:00:05"]),
            "lid": pa.array([0, 1, 2, 3], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "rts": _ts(["2024-01-01T00:00:08", "2024-01-01T00:00:15"]),
        })
        fwd = {r["lid"]: r["asof_ts"]
               for r in asof_join(rd.from_arrow(left), rd.from_arrow(right),
                                  "k", "k", "lts", "rts", ["lid"],
                                  direction="forward").take_all()}
        import datetime as dt
        t08 = dt.datetime(2024, 1, 1, 0, 0, 8)
        t15 = dt.datetime(2024, 1, 1, 0, 0, 15)
        assert fwd[0] == t08            # next right at/after 00:05
        assert fwd[1] == t15
        assert fwd[2] is None           # nothing after 00:20
        assert fwd[3] is None           # key 2 has no rights
        bwd = {r["lid"]: r["asof_ts"]
               for r in asof_join(rd.from_arrow(left), rd.from_arrow(right),
                                  "k", "k", "lts", "rts", ["lid"]).take_all()}
        assert bwd[0] is None and bwd[1] == t08 and bwd[2] == t15
        with pytest.raises(ValueError):
            asof_join(rd.from_arrow(left), rd.from_arrow(right),
                      "k", "k", "lts", "rts", direction="sideways")


class TestLagColumnFuzz:
    def test_matches_brute_force_random(self):
        from peri_ray.stages.temporal import lag_column

        rng = np.random.default_rng(41)
        n = 2500
        u = rng.integers(0, 30, n)
        ts = rng.permutation(n)
        v = np.where(rng.random(n) < 0.2, np.nan, rng.uniform(0, 1, n))
        vv = [None if np.isnan(x) else float(x) for x in v]
        t = pa.table({"u": pa.array(u, pa.int64()),
                      "ts": pa.array(ts, pa.int64()),
                      "id": pa.array(np.arange(n), pa.int64()),
                      "v": pa.array(vv, pa.float64())})
        for off in (1, 2, -3):
            got = {r["id"]: r["lag_v"]
                   for r in lag_column(rd.from_arrow(t).repartition(5),
                                       "u", ["ts"], "v", "id",
                                       offset=off).take_all()}
            import collections
            byk = collections.defaultdict(list)
            for i in range(n):
                byk[int(u[i])].append(i)
            want = {}
            for k, idxs in byk.items():
                seq = sorted(idxs, key=lambda i: int(ts[i]))
                for pos, i in enumerate(seq):
                    src = pos - off
                    want[i] = vv[seq[src]] if 0 <= src < len(seq) else None
            assert got == want, off


class TestAsofNullLeftRows:
    def test_null_key_or_ts_left_rows_kept(self):
        from peri_ray.stages.temporal import asof_join

        def _ts(vals):
            return pa.array(np.array(vals, "datetime64[us]"))

        left = pa.table({
            "k": pa.array([1, None, 1], pa.int64()),
            "lts": pa.array([np.datetime64("2024-01-01T00:00:10", "us"),
                             np.datetime64("2024-01-01T00:00:10", "us"),
                             None], pa.timestamp("us")),
            "lid": pa.array([0, 1, 2], pa.int64()),
        })
        right = pa.table({"k": pa.array([1], pa.int64()),
                          "rts": _ts(["2024-01-01T00:00:08"])})
        out = {r["lid"]: r["asof_ts"]
               for r in asof_join(rd.from_arrow(left), rd.from_arrow(right),
                                  "k", "k", "lts", "rts",
                                  ["lid"]).take_all()}
        import datetime as dt
        assert out[0] == dt.datetime(2024, 1, 1, 0, 0, 8)
        assert out[1] is None and out[2] is None  # LEFT JOIN kept
        assert len(out) == 3


class TestPmiCollocations:
    def test_matches_brute_force(self):
        from peri_ray.stages.text import pmi_collocations
        import math

        texts = ["a b a b c", "a b x", "c c c", None, ""]
        t = pa.table({"text": pa.array(texts)})
        out = {r["bigram"]: (r["n"], r["pmi"])
               for r in pmi_collocations(rd.from_arrow(t).repartition(2),
                                         min_count=2).take_all()}
        # brute force
        toks = [s.strip().split() if s is not None else None for s in texts]
        toks = [x if x != [] else [""] for x in toks if x is not None]
        uni = {}
        for tk in toks:
            for w in tk:
                uni[w] = uni.get(w, 0) + 1
        n_u = sum(uni.values())
        bgs = {}
        for tk in toks:
            for x, y in zip(tk, tk[1:]):
                bgs[x + " " + y] = bgs.get(x + " " + y, 0) + 1
        n_bg = sum(bgs.values())
        want = {}
        for b, c in bgs.items():
            if c >= 2:
                x, y = b.split(" ", 1)
                want[b] = (c, round(math.log(
                    (c * 1.0 / n_bg)
                    / ((uni[x] * 1.0 / n_u) * (uni[y] * 1.0 / n_u))), 6))
        assert out == want and "a b" in out


class TestStandardizeEmbeddings:
    def test_zscores_and_constant_dim(self):
        from peri_ray.stages.similarity import standardize_embeddings

        rng = np.random.default_rng(43)
        m = rng.normal(3, 2, (50, 4))
        m[:, 2] = 7.0  # constant dimension -> null z
        t = pa.table({
            "vec_id": pa.array(np.arange(50), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float64())),
        })
        out = standardize_embeddings(
            rd.from_arrow(t).repartition(4)).take_all()
        assert len(out) == 200
        mean = m.mean(axis=0)
        std = m.std(axis=0)
        for r in out[:40] + out[-40:]:
            i, d = r["vec_id"], r["idx"] - 1
            if d == 2:
                assert r["z"] is None
            else:
                want = round((m[i, d] - mean[d]) / std[d], 6)
                assert abs(r["z"] - want) <= 1e-6


class TestDupNgramCoverage:
    """duplicate_ngram_coverage — Lee et al. 2022-style per-doc
    duplicated-fraction signal (text.py); the driver oracle
    `dup_ngram_coverage_docs` hash-checks the sf tables."""

    def _run(self, texts, n=2, ids=None):
        from peri_ray.stages.text import duplicate_ngram_coverage

        ids = ids if ids is not None else list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        out = duplicate_ngram_coverage(
            rd.from_arrow(t).repartition(2), n=n).take_all()
        return {r["doc_id"]: (r["total_grams"], r["shared_grams"],
                              r["dup_coverage"]) for r in out}

    def test_hand_checked_bigrams(self):
        # doc0: grams {a b, b c}; doc1: {a b, b d}; doc2: {x y}
        got = self._run(["a b c", "a b d", "x y"], n=2)
        assert got == {0: (2, 1, 0.5), 1: (2, 1, 0.5), 2: (1, 0, 0.0)}

    def test_null_and_short_docs_excluded(self):
        # doc1 null, doc2 has 1 token (no bigram) — neither appears
        got = self._run(["a b", None, "solo", "a b"], n=2)
        assert got == {0: (1, 1, 1.0), 3: (1, 1, 1.0)}

    def test_distinct_grams_within_doc(self):
        # repeated gram inside ONE doc does not count as shared
        got = self._run(["p q p q", "r s"], n=2)
        # doc0 distinct bigrams: {p q, q p}; none shared with doc1
        assert got == {0: (2, 0, 0.0), 1: (1, 0, 0.0)}

    def test_matches_brute_force_on_real_docs(self):
        import re as _re
        from collections import Counter

        import pyarrow.parquet as pq

        from peri_ray.stages.text import duplicate_ngram_coverage

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = {r["doc_id"]: (r["total_grams"], r["shared_grams"],
                             r["dup_coverage"])
               for r in duplicate_ngram_coverage(ds, n=5).take_all()}

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
        grams = {}
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            if txt is None:
                continue
            # Arrow RE2 \s is ASCII — spell the class out (CLAUDE.md)
            ws = _re.split(r"[\t\n\f\r ]+", txt.strip())
            gs = {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)}
            if gs:
                grams[did] = gs
        dfc = Counter(g for gs in grams.values() for g in gs)
        want = {did: (len(gs), sum(1 for g in gs if dfc[g] >= 2),
                      float(sum(1 for g in gs if dfc[g] >= 2))
                      / float(len(gs)))
                for did, gs in grams.items()}
        assert got == want


class TestNormalizedDedup:
    """normalize-then-dedup composition (queries.dedup_normalized_docs
    wires it over documents with a doc_id-derived messy rendering)."""

    def test_messy_and_clean_renderings_merge(self):
        from peri_ray.stages.dedup import exact_dedup_keepers
        from peri_ray.stages.text import normalize_text_batch

        # doc 0 and doc 1 are the SAME content in different renderings;
        # doc 2 is distinct.  Raw exact dedup keeps all three.
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["hello   world", "\t Hello  WORLD \n", "other doc"],
        })
        norm = normalize_text_batch(t, "text", out_col="norm",
                                    casefold=True)
        kept = {r["keep_id"] for r in exact_dedup_keepers(
            rd.from_arrow(norm.select(["doc_id", "norm"])),
            "norm", "doc_id").take_all()}
        assert kept == {0, 2}

        raw_kept = {r["keep_id"] for r in exact_dedup_keepers(
            rd.from_arrow(t), "text", "doc_id").take_all()}
        assert raw_kept == {0, 1, 2}


class TestDupSpanRemoval:
    """remove_duplicate_ngram_spans (dedup.py) — ExactSubstr-shaped
    duplicated-token-span removal; driver oracle
    `dup_span_removal_docs` hash-checks the sf tables."""

    def _run(self, texts, n=3, ids=None):
        from peri_ray.stages.dedup import remove_duplicate_ngram_spans

        ids = ids if ids is not None else list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        out = remove_duplicate_ngram_spans(
            rd.from_arrow(t).repartition(2), n=n).take_all()
        return {r["doc_id"]: (r["clean_text"], r["n_removed"])
                for r in out}

    def test_shared_span_removed_from_both(self):
        got = self._run(["x a b c y", "z a b c w", "p q r"], n=3)
        assert got == {0: ("x y", 3), 1: ("z w", 3), 2: ("p q r", 0)}

    def test_overlapping_spans_merge_coverage(self):
        # "a b c d" shares both "a b c" and "b c d" with the others —
        # coverage is the union, not double-removed
        got = self._run(["a b c d", "a b c", "b c d"], n=3)
        assert got == {0: ("", 4), 1: ("", 3), 2: ("", 3)}

    def test_within_doc_repeat_not_duplicated(self):
        # the gram repeats only INSIDE doc0 — df counts distinct docs
        got = self._run(["a b c a b c", "x y z"], n=3)
        assert got[0] == ("a b c a b c", 0)

    def test_null_text_excluded_short_doc_kept(self):
        got = self._run(["a b", None, "a b"], n=3)
        # no 3-grams at all; null doc contributes no output row
        assert got == {0: ("a b", 0), 2: ("a b", 0)}

    def test_matches_brute_force_on_real_docs(self):
        import re as _re
        from collections import Counter

        import pyarrow.parquet as pq

        from peri_ray.stages.dedup import remove_duplicate_ngram_spans

        N = 5
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in remove_duplicate_ngram_spans(ds, n=N).take_all()}

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
        docs = {}
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            if txt is None:
                continue
            docs[did] = _re.split(r"[\t\n\f\r ]+", txt.strip())
        dfc = Counter()
        for ws in docs.values():
            for g in {" ".join(ws[i:i + N]) for i in range(len(ws) - N + 1)}:
                dfc[g] += 1
        want = {}
        for did, ws in docs.items():
            cov = [False] * len(ws)
            for i in range(len(ws) - N + 1):
                if dfc[" ".join(ws[i:i + N])] >= 2:
                    for k in range(i, i + N):
                        cov[k] = True
            want[did] = (" ".join(w for w, c in zip(ws, cov) if not c),
                         sum(cov))
        assert got == want


class TestBM25TopK:
    """bm25_topk (text.py) — two streaming passes, zero shuffles;
    driver oracle `bm25_top_docs` hash-checks the score doubles."""

    def test_ranking_semantics(self):
        from peri_ray.stages.text import bm25_topk

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["cat cat cat", "cat dog", "dog dog", "fish"],
        })
        out = bm25_topk(rd.from_arrow(t), ["cat"], k=3)
        ids = out.column("doc_id").to_pylist()
        ranks = out.column("rank").to_pylist()
        # doc1 (tf=3, same length class) outranks doc2 (tf=1);
        # docs without the term don't appear
        assert ids[0] == 1 and 2 in ids and 3 not in ids and 4 not in ids
        assert ranks == list(range(1, len(ids) + 1))

    def test_block_layout_invariance(self):
        from peri_ray.stages.text import bm25_topk

        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        a = bm25_topk(ds, ["spark", "window"], k=10).to_pylist()
        b = bm25_topk(ds.repartition(7), ["spark", "window"],
                      k=10).to_pylist()
        assert a == b

    def test_matches_brute_force(self):
        import math
        import re as _re

        import pyarrow.parquet as pq

        from peri_ray.stages.text import bm25_topk

        terms, k1, b = ["spark", "merge"], 1.2, 0.75
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = [(r["doc_id"], r["score"]) for r in
               bm25_topk(ds, terms, k=15).to_pylist()]

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
        docs = {did: _re.split(r"[\t\n\f\r ]+", txt.strip())
                for did, txt in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist())
                if txt is not None}
        n = len(docs)
        avgdl = float(sum(len(w) for w in docs.values())) / float(n)
        dfs = {term: sum(1 for ws in docs.values() if term in ws)
               for term in terms}
        want = []
        for did, ws in docs.items():
            score = 0.0
            for term in terms:
                tf = float(ws.count(term))
                if tf == 0.0:
                    continue
                idf = math.log((float(n - dfs[term]) + 0.5)
                               / (float(dfs[term]) + 0.5) + 1.0)
                norm = k1 * (1.0 - b + b * (float(len(ws)) / avgdl))
                score = score + idf * (tf * (k1 + 1.0)) / (tf + norm)
            if score > 0.0:
                want.append((did, score))
        want.sort(key=lambda r: (-r[1], r[0]))
        assert got == want[:15]


class TestPageRank:
    """pagerank (similarity.py) — hybrid driver/distributed synchronous
    PageRank; `knn_pagerank_embeddings` wires it over the kNN graph."""

    def _edges(self, pairs):
        t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                      "dst": pa.array([b for _, b in pairs], pa.int64())})
        return rd.from_arrow(t).repartition(2)

    def test_cycle_is_uniform(self):
        from peri_ray.stages.similarity import pagerank

        out = {r["node"]: r["pr"] for r in pagerank(
            self._edges([(0, 1), (1, 2), (2, 0)]), iters=7).take_all()}
        assert set(out) == {0, 1, 2}
        for v in out.values():
            assert abs(v - 1.0 / 3.0) < 1e-12

    def test_matches_power_iteration(self):
        from peri_ray.stages.similarity import pagerank

        rng = np.random.default_rng(7)
        n, k = 40, 3
        pairs = [(u, int(v)) for u in range(n)
                 for v in rng.choice(
                     [x for x in range(n) if x != u], k, replace=False)]
        got = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), damping=0.85, iters=6).take_all()}

        pr = np.full(n, 1.0 / n)
        outdeg = np.zeros(n, np.int64)
        for u, _ in pairs:
            outdeg[u] += 1
        for _ in range(6):
            s = np.zeros(n)
            for u, v in pairs:
                s[v] += pr[u] / outdeg[u]
            pr = (1 - 0.85) / n + 0.85 * s
        for i in range(n):
            assert abs(got[i] - pr[i]) < 1e-12

    def test_distributed_path_matches_driver(self):
        from peri_ray.stages.similarity import pagerank

        rng = np.random.default_rng(11)
        n, k = 30, 3
        pairs = [(u, int(v)) for u in range(n)
                 for v in rng.choice(
                     [x for x in range(n) if x != u], k, replace=False)]
        a = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=4).take_all()}
        b = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=4,
            driver_threshold=0).take_all()}
        assert set(a) == set(b)
        for node in a:
            assert abs(a[node] - b[node]) < 1e-9

    def test_dangling_node_raises(self):
        from peri_ray.stages.similarity import pagerank

        with pytest.raises(ValueError, match="dangling"):
            pagerank(self._edges([(0, 1)]), iters=2).take_all()
        with pytest.raises(ValueError, match="dangling"):
            pagerank(self._edges([(0, 1)]), iters=2,
                     driver_threshold=0).take_all()

    def test_dangling_redistribute_matches_reference(self):
        from peri_ray.stages.similarity import pagerank

        # 2 is dangling: its mass must spread uniformly each round
        pairs = [(0, 1), (0, 2), (1, 2)]
        d, n, iters = 0.85, 3, 5
        pr = np.full(n, 1.0 / n)
        for _ in range(iters):
            s = np.zeros(n)
            s[1] += pr[0] / 2
            s[2] += pr[0] / 2 + pr[1]
            s += pr[2] / n
            pr = (1 - d) / n + d * s
        drv = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=iters,
            dangling="redistribute").take_all()}
        dist = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=iters, dangling="redistribute",
            driver_threshold=0).take_all()}
        for i in range(n):
            assert abs(drv[i] - pr[i]) < 1e-12
            assert abs(dist[i] - pr[i]) < 1e-9
        assert abs(sum(drv.values()) - 1.0) < 1e-12
        assert abs(sum(dist.values()) - 1.0) < 1e-9

    def test_redistribute_is_noop_without_dangling(self):
        from peri_ray.stages.similarity import pagerank

        pairs = [(0, 1), (1, 2), (2, 0)]
        a = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=3).take_all()}
        b = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=3,
            dangling="redistribute").take_all()}
        assert a == b

    def test_bad_dangling_mode_raises(self):
        from peri_ray.stages.similarity import pagerank

        with pytest.raises(ValueError, match="redistribute"):
            pagerank(self._edges([(0, 1)]), dangling="drop")

    def test_personalized_matches_reference(self):
        from peri_ray.stages.similarity import pagerank

        # node 3 dangles; restart AND dangling mass return to seeds
        pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (4, 0)]
        n, d, iters = 5, 0.85, 5
        tele = np.zeros(n)
        tele[[0, 4]] = 0.5
        outdeg = np.zeros(n)
        for u, _ in pairs:
            outdeg[u] += 1
        pr = tele.copy()
        for _ in range(iters):
            s = np.zeros(n)
            for u, v in pairs:
                s[v] += pr[u] / outdeg[u]
            s = s + pr[3] * tele
            pr = (1 - d) * tele + d * s
        drv = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=iters, seeds=[0, 4],
            dangling="redistribute").take_all()}
        dist = {r["node"]: r["pr"] for r in pagerank(
            self._edges(pairs), iters=iters, seeds=[0, 4],
            dangling="redistribute", driver_threshold=0).take_all()}
        for i in range(n):
            assert abs(drv[i] - pr[i]) < 1e-12
            assert abs(dist[i] - pr[i]) < 1e-9
        assert abs(sum(dist.values()) - 1.0) < 1e-9

    def test_personalized_phantom_seed_raises(self):
        from peri_ray.stages.similarity import pagerank

        for kw in ({}, {"driver_threshold": 0}):
            with pytest.raises(ValueError, match="seed node"):
                pagerank(self._edges([(0, 1), (1, 0)]), iters=1,
                         seeds=[99], **kw).take_all()

    def test_mass_conserved_on_knn_graph(self):
        from peri_ray.stages.similarity import knn_graph, pagerank

        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        edges = knn_graph(ds, k=4).map_batches(
            lambda t: pa.table({"src": t.column("query_id"),
                                "dst": t.column("neighbor_id")}),
            batch_format="pyarrow")
        out = pagerank(edges, iters=3).take_all()
        total = sum(r["pr"] for r in out)
        # every node has out-degree k — no dangling leakage
        assert abs(total - 1.0) < 1e-9


class TestLabelPropagation:
    """label_propagation (similarity.py) — synchronous majority-vote
    label spreading; `knn_label_spread_embeddings` wires it over the
    kNN graph with an unrolled SQL twin."""

    def _run(self, edges, seeds, **kw):
        from peri_ray.stages.similarity import label_propagation

        e = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                      "dst": pa.array([b for _, b in edges], pa.int64())})
        s = pa.table({"node": pa.array([n for n, _ in seeds], pa.int64()),
                      "label": pa.array([l for _, l in seeds], pa.int64())})
        out = label_propagation(rd.from_arrow(e).repartition(2),
                                rd.from_arrow(s), **kw).take_all()
        return {r["node"]: r["label"] for r in out}

    def test_synchronous_rounds(self):
        # path a->b->c (each node's out-neighbors): c is seeded;
        # after 1 iter only b learns; after 2, a learns through b
        edges = [(0, 1), (1, 2), (2, 1)]
        assert self._run(edges, [(2, 7)], iters=1) == {1: 7, 2: 7}
        assert self._run(edges, [(2, 7)], iters=2) == {0: 7, 1: 7, 2: 7}

    def test_majority_and_tiebreak(self):
        # node 0 sees labels {5, 5, 9} -> majority 5;
        # node 10 sees {5, 9} -> tie, smallest label wins
        edges = [(0, 1), (0, 2), (0, 3), (10, 1), (10, 3)]
        got = self._run(edges, [(1, 5), (2, 5), (3, 9)], iters=1)
        assert got[0] == 5 and got[10] == 5

    def test_seeds_never_change(self):
        # seed node 0 is surrounded by label-9 neighbors; stays 1
        edges = [(0, 1), (0, 2)]
        got = self._run(edges, [(0, 1), (1, 9), (2, 9)], iters=3)
        assert got[0] == 1

    def test_distributed_matches_driver(self):
        rng = np.random.default_rng(13)
        n, k = 40, 3
        edges = [(u, int(v)) for u in range(n)
                 for v in rng.choice(
                     [x for x in range(n) if x != u], k, replace=False)]
        seeds = [(int(i), int(i % 4)) for i in range(0, n, 5)]
        a = self._run(edges, seeds, iters=3)
        b = self._run(edges, seeds, iters=3, driver_threshold=0)
        assert a == b


class TestChunkDocuments:
    """chunk_documents (text.py) — overlapping token windows; driver
    oracle `chunked_documents` hash-checks the sf tables."""

    def _run(self, texts, window, stride, ids=None):
        from peri_ray.stages.text import chunk_documents

        ids = ids if ids is not None else list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        out = chunk_documents(rd.from_arrow(t).repartition(2),
                              window=window, stride=stride).take_all()
        return sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"],
                       r["n_tokens"]) for r in out)

    def test_hand_checked_windows(self):
        got = self._run(["a b c d e"], window=3, stride=2)
        assert got == [(0, 0, "a b c", 3), (0, 1, "c d e", 3),
                       (0, 2, "e", 1)]

    def test_short_and_null_docs(self):
        got = self._run(["a b", None, "x"], window=3, stride=2)
        assert got == [(0, 0, "a b", 2), (2, 0, "x", 1)]

    def test_matches_brute_force_on_real_docs(self):
        import re as _re

        import pyarrow.parquet as pq

        from peri_ray.stages.text import chunk_documents

        W, S = 32, 24
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"],
                      r["n_tokens"]) for r in
                     chunk_documents(ds, window=W, stride=S).take_all())
        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
        want = []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            if txt is None:
                continue
            ws = _re.split(r"[\t\n\f\r ]+", txt.strip())
            for ci, s in enumerate(range(0, len(ws), S)):
                piece = ws[s:s + W]
                want.append((did, ci, " ".join(piece), len(piece)))
        assert got == sorted(want)


class TestDupNgramFuzz:
    """Property fuzz: coverage and span removal must agree with the
    brute-force reference on random tiny corpora (tiny vocab to force
    collisions; empty strings, repeats, single tokens)."""

    from hypothesis import given, settings, strategies as st

    _corpus = st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]),
                 min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=14,
    )

    @staticmethod
    def _brute(texts, n):
        from collections import Counter

        docs = {i: t.split(" ") if t else [""] for i, t in enumerate(texts)}
        grams = {i: {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)}
                 for i, ws in docs.items()}
        dfc = Counter(g for gs in grams.values() for g in gs)
        cov, spans = {}, {}
        for i, ws in docs.items():
            gs = grams[i]
            if gs:
                sh = sum(1 for g in gs if dfc[g] >= 2)
                cov[i] = (len(gs), sh, float(sh) / float(len(gs)))
            covered = [False] * len(ws)
            for j in range(len(ws) - n + 1):
                if dfc[" ".join(ws[j:j + n])] >= 2:
                    for k in range(j, j + n):
                        covered[k] = True
            spans[i] = (" ".join(w for w, c in zip(ws, covered) if not c),
                        sum(covered))
        return cov, spans

    @given(texts=_corpus)
    @settings(max_examples=15, deadline=None)
    def test_coverage_and_span_removal_fuzz(self, texts):
        from peri_ray.stages.dedup import remove_duplicate_ngram_spans
        from peri_ray.stages.text import duplicate_ngram_coverage

        n = 2
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": texts})
        ds = rd.from_arrow(t).repartition(2)
        want_cov, want_spans = self._brute(texts, n)
        got_cov = {r["doc_id"]: (r["total_grams"], r["shared_grams"],
                                 r["dup_coverage"])
                   for r in duplicate_ngram_coverage(ds, n=n).take_all()}
        assert got_cov == want_cov
        got_spans = {r["doc_id"]: (r["clean_text"], r["n_removed"])
                     for r in
                     remove_duplicate_ngram_spans(ds, n=n).take_all()}
        assert got_spans == want_spans


class TestEmbeddingOutliers:
    """embedding_outliers query composition — distance-to-own-centroid
    with an exact p95 gate; oracled at every SF, brute-forced here."""

    def test_matches_brute_force(self):
        import pyarrow.parquet as pq

        from peri_ray.pipelines.queries import embedding_outliers

        got = {r["vec_id"]: (r["label"], r["d"]) for r in
               embedding_outliers(SF).take_all()}

        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
        rows = [(v, np.asarray(e, np.float64), l)
                for v, e, l in zip(t.column("vec_id").to_pylist(),
                                   t.column("embedding").to_pylist(),
                                   t.column("label").to_pylist())
                if l is not None and e is not None and len(e) == 64
                and not any(x is None for x in e)]
        cents = {}
        for _, e, l in rows:
            s, c = cents.get(l, (np.zeros(64), 0))
            cents[l] = (s + e, c + 1)
        cents = {l: np.round(s / c, 6) for l, (s, c) in cents.items()}
        ds = sorted(
            (float(np.round(np.sqrt(((e - cents[l]) ** 2).sum()), 6)), v, l)
            for v, e, l in rows)
        thr = ds[max(1, int(np.ceil(len(ds) * 0.95))) - 1][0]
        want = {v: (l, d) for d, v, l in ds if d > thr}
        assert got == want


class TestLeakageFreeSplit:
    """leakage_free_split — near-dup clusters must land in ONE split."""

    def test_cluster_cosplit_on_real_docs(self):
        from peri_ray.pipelines.queries import leakage_free_split
        from peri_ray.stages.dedup import near_dedup_victims

        split = {r["doc_id"]: r["split"]
                 for r in leakage_free_split(SF).take_all()}
        # every doc appears exactly once
        import pyarrow.parquet as pq
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        assert set(split) == set(t.column("doc_id").to_pylist())

        # victims (non-keeper cluster members) share their keeper's split
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        from peri_ray.stages.dedup import (connected_components,
                                           minhash_lsh_candidates,
                                           verify_candidates)
        cands = minhash_lsh_candidates(ds, dedupe=False)
        verified = verify_candidates(ds, cands, threshold=0.8, k=5)
        labels = {r["doc_id"]: r["label"]
                  for r in connected_components(verified).take_all()}
        assert labels, "fixture should contain at least one near-dup pair"
        for doc, lab in labels.items():
            assert split[doc] == split[lab], (doc, lab)


class TestDupSpanHotKey:
    """Skew guard: a gram present in EVERY doc (universal boilerplate)
    routes all its occurrences into one gram bucket — the whole-bucket
    vectorized span pass must stay correct and the rebuild must remove
    it everywhere."""

    def test_universal_boilerplate_gram(self):
        from peri_ray.stages.dedup import remove_duplicate_ngram_spans

        n_docs = 300
        texts = [f"u{i} v{i} subscribe to our newsletter w{i}"
                 for i in range(n_docs)]
        t = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                      "text": texts})
        out = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in
               remove_duplicate_ngram_spans(
                   rd.from_arrow(t).repartition(8), n=4).take_all()}
        assert len(out) == n_docs
        for i in range(n_docs):
            # the shared 4-gram "subscribe to our newsletter" covers
            # exactly those 4 tokens in every doc
            assert out[i] == (f"u{i} v{i} w{i}", 4)


class TestGroupedRegression:
    def test_matches_numpy_polyfit(self):
        from peri_ray.stages.stats import grouped_regression

        rng = np.random.default_rng(7)
        n = 4000
        key = rng.integers(0, 3, n)
        x = rng.integers(1, 50, n).astype(np.float64)
        # y known linear in x + noise, values with 2 decimals
        y = np.round(3.5 * x + 10.0 + rng.normal(0, 2, n), 2)
        t = pa.table({"g": pa.array([f"k{int(k)}" for k in key]),
                      "x": pa.array(x), "y": pa.array(y)})
        out = grouped_regression(rd.from_arrow(t), "g", "x", "y",
                                 x_scale=1, y_scale=100).to_pylist()
        assert len(out) == 3
        for row in out:
            m = key == int(row["g"][1])
            # polyfit over the quantized values the stage actually uses
            yq = np.round(y[m] * 100) / 100
            slope, icept = np.polyfit(x[m], yq, 1)
            assert abs(row["slope"] - slope) < 1e-6
            assert abs(row["intercept"] - icept) < 1e-6
            assert row["n"] == int(m.sum())

    def test_nulls_and_degenerate(self):
        from peri_ray.stages.stats import grouped_regression

        t = pa.table({
            "g": pa.array(["a", "a", "a", "b", "b", "c"]),
            "x": pa.array([1.0, 2.0, None, 5.0, 5.0, 1.0]),
            "y": pa.array([2.0, 4.0, 9.0, 1.0, 3.0, None]),
        })
        out = {r["g"]: r for r in grouped_regression(
            rd.from_arrow(t), "g", "x", "y").to_pylist()}
        assert out["a"]["n"] == 2 and abs(out["a"]["slope"] - 2.0) < 1e-12
        # zero x-variance -> null slope/intercept
        assert out["b"]["slope"] is None
        # group with all rows null-filtered disappears (SQL WHERE
        # before GROUP BY)
        assert "c" not in out

    def test_block_layout_independent(self):
        """Python-int merge: same answer at 1 block and 16 blocks."""
        from peri_ray.stages.stats import grouped_regression

        rng = np.random.default_rng(3)
        t = pa.table({"g": pa.array(["z"] * 1000),
                      "x": pa.array(rng.integers(0, 9, 1000).astype(float)),
                      "y": pa.array(np.round(rng.normal(5, 2, 1000), 2))})
        a = grouped_regression(rd.from_arrow(t), "g", "x", "y").to_pylist()
        b = grouped_regression(rd.from_arrow(t).repartition(16),
                               "g", "x", "y", batch_size=64).to_pylist()
        assert a == b


class TestDriftAdditions:
    def test_js_divergence_properties(self):
        from peri_ray.stages.checks import js_divergence
        import math

        same = {"a": 50, "b": 50}
        assert js_divergence(same, {"a": 0.5, "b": 0.5}) < 1e-9
        # symmetric
        p, q = {"a": 90, "b": 10}, {"a": 30, "b": 70}
        assert abs(js_divergence(p, q) - js_divergence(q, p)) < 1e-12
        # bounded by ln 2 even for disjoint supports (eps floor)
        dis = js_divergence({"a": 1}, {"b": 1})
        assert 0 < dis <= math.log(2) + 1e-9

    def test_binned_psi_detects_shift(self):
        from peri_ray.stages.checks import binned_psi_drift

        rng = np.random.default_rng(11)
        ids = np.arange(2000, dtype=np.int64)
        # even ids ~ N(50, 10), odd ids ~ N(80, 10): strong drift
        v = np.where(ids % 2 == 0, rng.normal(50, 10, 2000),
                     rng.normal(80, 10, 2000))
        t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
        out = binned_psi_drift(rd.from_arrow(t), "v", bin_width=10.0,
                               split_col="id").to_pylist()[0]
        assert out["psi"] > 0.5
        assert out["n_left"] == 1000 and out["n_right"] == 1000
        # identical halves -> ~0
        base = rng.normal(50, 10, 1000)
        v2 = np.empty(2000)
        v2[ids % 2 == 0] = base
        v2[ids % 2 == 1] = base
        t2 = pa.table({"id": pa.array(ids), "v": pa.array(v2)})
        flat = binned_psi_drift(rd.from_arrow(t2), "v", bin_width=10.0,
                                split_col="id").to_pylist()[0]
        assert flat["psi"] < 0.05

    def test_ks_matches_bruteforce(self):
        from peri_ray.stages.checks import ks_two_sample

        rng = np.random.default_rng(5)
        ids = np.arange(3000, dtype=np.int64)
        v = np.round(np.where(ids % 2 == 0, rng.normal(5, 1, 3000),
                              rng.normal(5.5, 1, 3000)), 2)
        t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
        out = ks_two_sample(rd.from_arrow(t), "v", split_col="id",
                            split_mod=2, scale=100).to_pylist()[0]
        # brute force over quantized values
        vi = np.round(v * 100).astype(np.int64)
        left, right = np.sort(vi[ids % 2 == 0]), np.sort(vi[ids % 2 == 1])
        grid = np.unique(vi)
        f1 = np.searchsorted(left, grid, side="right") / len(left)
        f2 = np.searchsorted(right, grid, side="right") / len(right)
        d = np.abs(f1 - f2)
        assert abs(out["ks"] - d.max()) < 1e-12
        assert out["at_value"] == grid[int(d.argmax())] / 100.0
        assert out["n_left"] == len(left) and out["n_right"] == len(right)

    def test_ks_distinct_cap_raises(self):
        from peri_ray.stages.checks import ks_two_sample

        t = pa.table({"id": pa.array(np.arange(100, dtype=np.int64)),
                      "v": pa.array(np.arange(100, dtype=np.float64))})
        with pytest.raises(ValueError, match="max_distinct"):
            ks_two_sample(rd.from_arrow(t), "v", split_col="id",
                          max_distinct=10)


class TestCovariancePca:
    def _ds(self, n=300, d=8, seed=9):
        rng = np.random.default_rng(seed)
        # correlated data so PCA has a meaningful top component
        base = rng.normal(0, 1, (n, 2))
        mix = rng.normal(0, 0.1, (2, d)) + np.array([[1.0] * d, [0.0] * d])
        m = (base @ mix + rng.normal(0, 0.05, (n, d))).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in m],
                                  pa.list_(pa.float32())),
        })
        return t, m.astype(np.float64)

    def test_covariance_matches_numpy(self):
        from peri_ray.stages.similarity import embedding_covariance

        t, m = self._ds()
        out = embedding_covariance(rd.from_arrow(t), dim=8,
                                   scale=1000).to_pylist()
        q = np.floor(np.abs(m) * 1000 + 0.5) * np.sign(m)  # the stage's units
        ref = np.cov(q, rowvar=False, bias=True) / 1e6
        assert len(out) == 8 * 9 // 2
        for r in out:
            assert abs(r["cov"] - ref[r["i"], r["j"]]) < 1e-9
            assert r["n"] == len(m)

    def test_covariance_layout_independent(self):
        from peri_ray.stages.similarity import embedding_covariance

        t, _ = self._ds()
        a = embedding_covariance(rd.from_arrow(t), dim=8).to_pylist()
        b = embedding_covariance(rd.from_arrow(t).repartition(16), dim=8,
                                 batch_size=32).to_pylist()
        ka = {(r["i"], r["j"]): r["cov"] for r in a}
        kb = {(r["i"], r["j"]): r["cov"] for r in b}
        assert ka == kb  # exact equality: integer sums

    def test_malformed_vectors_skipped(self):
        from peri_ray.stages.similarity import embedding_covariance

        t = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], None, [3.0, 4.0, 5.0]],
                                  pa.list_(pa.float32())),
        })
        out = embedding_covariance(rd.from_arrow(t), dim=2).to_pylist()
        assert all(r["n"] == 1 for r in out)

    def test_pca_matches_numpy(self):
        from peri_ray.stages.similarity import pca_project, pca_components

        t, m = self._ds()
        comps, ratios = pca_components(rd.from_arrow(t), k=3, dim=8)
        # numpy reference over the stage's quantized units (the stage
        # accumulates exact integer sums of round(v*1e4) values)
        mq = np.floor(np.abs(m) * 10_000 + 0.5) * np.sign(m) / 10_000
        vals, vecs = np.linalg.eigh(np.cov(mq, rowvar=False, bias=True))
        order = np.argsort(vals)[::-1][:3]
        ref = vecs[:, order].T
        for r in range(3):
            j = int(np.argmax(np.abs(ref[r])))
            if ref[r, j] < 0:
                ref[r] = -ref[r]
        assert np.allclose(comps, ref, atol=1e-8)
        assert ratios[0] > ratios[1] >= ratios[2] > 0
        # projection: every row equals (v - mean) @ comps.T?  the stage
        # projects RAW vectors (no centering) — verify against that
        out = {r["vec_id"]: r["pc"] for r in
               pca_project(rd.from_arrow(t), k=3, dim=8).take_all()}
        proj = m @ comps.T
        for i in range(len(m)):
            assert np.allclose(out[i], proj[i], atol=1e-8)

    def test_pca_sign_deterministic_across_layouts(self):
        from peri_ray.stages.similarity import pca_components

        t, _ = self._ds(seed=21)
        c1, _ = pca_components(rd.from_arrow(t), k=2, dim=8)
        c2, _ = pca_components(rd.from_arrow(t).repartition(8), k=2, dim=8,
                               batch_size=16)
        assert np.allclose(c1, c2, atol=1e-10)


class TestWassersteinFragments:
    def test_w1_matches_bruteforce(self):
        from peri_ray.stages.checks import wasserstein_two_sample

        rng = np.random.default_rng(13)
        ids = np.arange(2000, dtype=np.int64)
        v = np.round(np.where(ids % 2 == 0, rng.normal(10, 2, 2000),
                              rng.normal(11, 2, 2000)), 2)
        t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
        out = wasserstein_two_sample(rd.from_arrow(t), "v",
                                     split_col="id").to_pylist()[0]
        # brute force: integrate |F1-F2| over the quantized axis
        vi = np.round(v * 100).astype(np.int64)
        a, b = np.sort(vi[ids % 2 == 0]), np.sort(vi[ids % 2 == 1])
        grid = np.unique(vi)
        f1 = np.searchsorted(a, grid, side="right") / len(a)
        f2 = np.searchsorted(b, grid, side="right") / len(b)
        ref = float(np.sum(np.abs(f1 - f2)[:-1] * np.diff(grid))) / 100
        assert abs(out["w1"] - ref) < 1e-10
        # identical samples -> 0
        base = v[:1000]
        w = np.empty(2000)
        w[ids % 2 == 0] = base
        w[ids % 2 == 1] = base
        t2 = pa.table({"id": pa.array(ids), "v": pa.array(w)})
        z = wasserstein_two_sample(rd.from_arrow(t2), "v",
                                   split_col="id").to_pylist()[0]
        assert z["w1"] == 0.0

    def test_w1_layout_independent(self):
        from peri_ray.stages.checks import wasserstein_two_sample

        rng = np.random.default_rng(17)
        ids = np.arange(1000, dtype=np.int64)
        v = np.round(rng.normal(5, 1, 1000), 2)
        t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
        a = wasserstein_two_sample(rd.from_arrow(t), "v",
                                   split_col="id").to_pylist()
        b = wasserstein_two_sample(rd.from_arrow(t).repartition(16), "v",
                                   split_col="id",
                                   batch_size=64).to_pylist()
        assert a == b  # exact: integer numerator + one division

    def test_fragment_anomaly_flags_planted_shift(self):
        from peri_ray.stages.checks import fragment_anomaly_report

        rng = np.random.default_rng(23)
        frag = np.repeat(np.arange(10, dtype=np.int64), 200)
        x = rng.integers(100, 200, 2000).astype(np.float64)
        x[frag == 7] += 30  # planted mean shift
        t = pa.table({"frag": pa.array(frag), "x": pa.array(x)})
        out = {r["frag"]: r for r in fragment_anomaly_report(
            rd.from_arrow(t), "frag", "x",
            z_thresh=3.0).to_pylist()}
        assert out[7]["flagged"] and out[7]["z"] > 3.0
        assert sum(r["flagged"] for r in out.values()) <= 2
        assert all(r["n"] == 200 for r in out.values())

    def test_fragment_anomaly_rejects_fractional(self):
        from peri_ray.stages.checks import fragment_anomaly_report

        t = pa.table({"frag": pa.array([0, 0], pa.int64()),
                      "x": pa.array([1.5, 2.0])})
        with pytest.raises(Exception):
            fragment_anomaly_report(rd.from_arrow(t), "frag", "x")


class TestTwoSampleDegenerate:
    def test_one_sided_and_empty_inputs_yield_null_rows(self):
        """Review regression: one-sided splits crashed with
        ZeroDivisionError; empty value columns with TypeError."""
        from peri_ray.stages.checks import ks_two_sample, \
            wasserstein_two_sample

        all_even = pa.table({"id": pa.array([0, 2, 4], pa.int64()),
                             "v": pa.array([1.0, 2.0, 3.0])})
        for fn in (ks_two_sample, wasserstein_two_sample):
            row = fn(rd.from_arrow(all_even), "v",
                     split_col="id").to_pylist()[0]
            assert row["n_left"] == 3 and row["n_right"] == 0
            assert row.get("ks", row.get("w1")) is None
        all_null = pa.table({"id": pa.array([0, 1], pa.int64()),
                             "v": pa.array([None, None], pa.float64())})
        row = ks_two_sample(rd.from_arrow(all_null), "v",
                            split_col="id").to_pylist()[0]
        assert row["ks"] is None and row["n_left"] == 0

    def test_w1_single_distinct_value_is_zero(self):
        from peri_ray.stages.checks import wasserstein_two_sample

        t = pa.table({"id": pa.array([0, 1, 2, 3], pa.int64()),
                      "v": pa.array([5.0] * 4)})
        row = wasserstein_two_sample(rd.from_arrow(t), "v",
                                     split_col="id").to_pylist()[0]
        assert row["w1"] == 0.0


class TestCountMin:
    def test_never_undercounts_and_merge_exact(self):
        from peri_ray.state.sketches import CountMin, hash_strings
        import pyarrow as pa_

        rng = np.random.default_rng(3)
        # adversarially small width so collisions are guaranteed
        keys = np.array([f"k{i}" for i in range(5000)])
        counts = rng.integers(1, 50, 5000)
        h = hash_strings(pa_.array(keys.tolist(), pa_.string()))
        one = CountMin(width=256, depth=4)
        one.add_hashes(h, counts)
        # split-and-merge must equal the single-stream sketch exactly
        a, b = CountMin(256, 4), CountMin(256, 4)
        a.add_hashes(h[:2500], counts[:2500])
        b.add_hashes(h[2500:], counts[2500:])
        a.merge(b)
        assert np.array_equal(a.table, one.table) and a.total == one.total
        est = one.estimate_hashes(h)
        assert (est >= counts).all()  # one-sided guarantee
        # error bound: overcount <= e/width * N for most keys
        over = est - counts
        bound = np.e / 256 * counts.sum()
        assert (over <= bound).mean() > 0.95

    def test_param_mismatch_raises(self):
        from peri_ray.state.sketches import CountMin

        with pytest.raises(ValueError):
            CountMin(256, 4).merge(CountMin(512, 4))

    def test_stage_self_evaluation(self):
        from peri_ray.stages.text import cms_term_estimates

        t = pa.table({"text": pa.array(
            ["apple banana apple", "banana apple", None, "cherry"] * 50)})
        out = cms_term_estimates(rd.from_arrow(t), threshold=50,
                                 width=1 << 12).to_pylist()
        by = {r["term"]: r for r in out}
        assert by["apple"]["n_exact"] == 150
        assert by["banana"]["n_exact"] == 100
        assert all(r["n_cms"] >= r["n_exact"] for r in out)


class TestWeightedSample:
    def _brute(self, ids, w, k, seed):
        import pyarrow as pa_
        from peri_ray.state.sketches import hash_strings

        h = hash_strings(pa_.array([f"{i}\x1f{seed}" for i in ids],
                                   pa_.string()))
        u = (h.astype(np.float64) + 1.0) / 2.0**64
        keys = np.log(u) / w
        order = np.lexsort((ids, -keys))
        return [int(ids[i]) for i in order[:k]]

    def test_matches_bruteforce_and_layouts(self):
        from peri_ray.stages.stats import weighted_sample

        rng = np.random.default_rng(2)
        ids = np.arange(3000, dtype=np.int64)
        w = rng.integers(1, 100, 3000).astype(np.float64)
        t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
        got = [r["doc_id"] for r in weighted_sample(
            rd.from_arrow(t), "w", "doc_id", k=25, seed=9).to_pylist()]
        assert got == self._brute(ids, w, 25, 9)
        got16 = [r["doc_id"] for r in weighted_sample(
            rd.from_arrow(t).repartition(16), "w", "doc_id", k=25,
            seed=9, batch_size=128).to_pylist()]
        assert got16 == got

    def test_inclusion_monotone_in_weight(self):
        """Statistically: a weight-100 item should appear in far more
        seeded samples than a weight-1 item."""
        from peri_ray.stages.stats import weighted_sample

        ids = np.arange(200, dtype=np.int64)
        w = np.where(ids < 100, 1.0, 100.0)
        t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
        heavy = light = 0
        for seed in range(20):
            picked = {r["doc_id"] for r in weighted_sample(
                rd.from_arrow(t), "w", "doc_id", k=20,
                seed=seed).to_pylist()}
            heavy += sum(1 for p in picked if p >= 100)
            light += sum(1 for p in picked if p < 100)
        assert heavy > light * 5

    def test_null_and_nonpositive_weights_excluded(self):
        from peri_ray.stages.stats import weighted_sample

        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "w": pa.array([1.0, None, 0.0, -2.0])})
        out = weighted_sample(rd.from_arrow(t), "w", "doc_id", k=10)
        assert [r["doc_id"] for r in out.to_pylist()] == [1]

    def test_md5_variant_matches_bruteforce_and_layouts(self):
        import hashlib

        from peri_ray.stages.stats import weighted_sample_md5

        rng = np.random.default_rng(3)
        ids = np.arange(2000, dtype=np.int64)
        w = rng.integers(1, 100, 2000).astype(np.float64)
        t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
        h = np.array([int(hashlib.md5(f"{i}#9".encode()).hexdigest()[:16],
                          16) for i in ids], np.uint64)
        keys = np.log((h.astype(np.float64) + 0.5) / 2.0**64) / w
        order = np.lexsort((ids, -keys))
        want = [int(ids[i]) for i in order[:25]]
        got = [r["doc_id"] for r in weighted_sample_md5(
            rd.from_arrow(t), "w", "doc_id", k=25, seed=9).to_pylist()]
        assert got == want
        got16 = [r["doc_id"] for r in weighted_sample_md5(
            rd.from_arrow(t).repartition(16), "w", "doc_id", k=25,
            seed=9, batch_size=128).to_pylist()]
        assert got16 == want


class TestOrcIpcRoundTrip:
    def _tbl(self):
        return pa.table({
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i}" if i % 10 else None
                              for i in range(100)]),
            "score": pa.array([i / 7 for i in range(100)], pa.float64()),
        })

    def test_orc_roundtrip_pruned(self, tmp_path):
        from peri_ray.sources import read_orc_table, write_orc

        t = self._tbl()
        out = str(tmp_path / "orc")
        write_orc(rd.from_arrow(t).repartition(4), out)
        back = read_orc_table(out)
        rows = sorted(back.take_all(), key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in rows] == list(range(100))
        assert rows[0]["text"] is None and rows[1]["text"] == "doc 1"
        pruned = read_orc_table(out, columns=["doc_id"])
        assert set(pruned.take_all()[0].keys()) == {"doc_id"}

    def test_ipc_roundtrip_pruned(self, tmp_path):
        from peri_ray.sources import read_ipc_table, write_ipc

        t = self._tbl()
        out = str(tmp_path / "ipc")
        write_ipc(rd.from_arrow(t).repartition(4), out)
        back = read_ipc_table(out, columns=["doc_id", "score"])
        rows = sorted(back.take_all(), key=lambda r: r["doc_id"])
        assert len(rows) == 100
        assert abs(rows[7]["score"] - 1.0) < 1e-12
        assert "text" not in rows[0]


class TestParquetFilterPushdown:
    def test_filter_pushes_to_scan(self):
        import pyarrow.dataset as pads
        from peri_ray.sources import read_table

        flt = pads.field("n_chars") > 200
        ds = read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "n_chars"], filter=flt)
        rows = ds.take_all()
        assert rows and all(r["n_chars"] > 200 for r in rows)
        # same answer as post-hoc filtering
        full = read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "n_chars"]).take_all()
        want = sorted(r["doc_id"] for r in full if r["n_chars"] > 200)
        assert sorted(r["doc_id"] for r in rows) == want


class TestIntervalOverlapJoin:
    def _run(self, left_rows, right_rows, **kw):
        from peri_ray.stages.temporal import interval_overlap_join

        def tbl(rows):
            return rd.from_arrow(pa.table({
                "k": pa.array([r[0] for r in rows]),
                "id": pa.array([r[1] for r in rows], pa.int64()),
                "start": pa.array([r[2] for r in rows], pa.int64()),
                "end": pa.array([r[3] for r in rows], pa.int64()),
            }))

        out = interval_overlap_join(tbl(left_rows), tbl(right_rows),
                                    key="k", l_id="id", r_id="id", **kw)
        return sorted((r["k"], r["id_a"], r["id_b"])
                      for r in out.take_all())

    def test_fuzz_vs_bruteforce(self):
        rng = np.random.default_rng(31)
        L, R = [], []
        for i in range(400):
            k = f"u{rng.integers(0, 12)}"
            s = int(rng.integers(0, 1000))
            e = s + int(rng.integers(1, 60))
            (L if i % 2 == 0 else R).append((k, i, s, e))
        want = sorted(
            (lk, li, ri)
            for (lk, li, ls, le) in L
            for (rk, ri, rs, re) in R
            if lk == rk and ls < re and rs < le)
        assert self._run(L, R) == want

    def test_half_open_touching_intervals_do_not_overlap(self):
        # [0,10) and [10,20): share only the boundary -> no pair
        out = self._run([("a", 1, 0, 10)], [("a", 2, 10, 20)])
        assert out == []
        out2 = self._run([("a", 1, 0, 11)], [("a", 2, 10, 20)])
        assert out2 == [("a", 1, 2)]

    def test_hot_key_pair_cap_raises(self):
        L = [("hot", i, 0, 100) for i in range(0, 200, 2)]
        R = [("hot", i, 0, 100) for i in range(1, 200, 2)]
        with pytest.raises(Exception, match="candidate"):
            self._run(L, R, max_pairs_per_key=50)


class TestEmbeddingDrift:
    def test_matches_numpy_and_layouts(self):
        from peri_ray.stages.similarity import embedding_drift

        rng = np.random.default_rng(41)
        a = rng.normal(0, 1, (300, 8)).astype(np.float32)
        b = (rng.normal(0, 1, (200, 8)) + 0.5).astype(np.float32)

        def tbl(m):
            return pa.table({"embedding": pa.array(
                [r.tolist() for r in m], pa.list_(pa.float32()))})

        out = embedding_drift(rd.from_arrow(tbl(a)), rd.from_arrow(tbl(b)),
                              dim=8, scale=1000).to_pylist()[0]
        qa = np.floor(np.abs(a.astype(np.float64)) * 1000 + 0.5) * np.sign(a)
        qb = np.floor(np.abs(b.astype(np.float64)) * 1000 + 0.5) * np.sign(b)
        ref = np.linalg.norm(qa.mean(axis=0) - qb.mean(axis=0)) / 1000
        assert abs(out["mean_shift_l2"] - ref) < 1e-9
        assert out["n_a"] == 300 and out["n_b"] == 200
        # layout independence: exact equality
        out2 = embedding_drift(
            rd.from_arrow(tbl(a)).repartition(8),
            rd.from_arrow(tbl(b)).repartition(8),
            dim=8, scale=1000, batch_size=32).to_pylist()[0]
        assert out2 == out

    def test_empty_side_null(self):
        from peri_ray.stages.similarity import embedding_drift

        t = pa.table({"embedding": pa.array([[0.0] * 8],
                                            pa.list_(pa.float32()))})
        empty = pa.table({"embedding": pa.array([], pa.list_(pa.float32()))})
        out = embedding_drift(rd.from_arrow(t), rd.from_arrow(empty),
                              dim=8).to_pylist()[0]
        assert out["mean_shift_l2"] is None and out["n_b"] == 0


class TestTriangleCount:
    def test_k4_with_noise(self):
        from peri_ray.stages.similarity import triangle_count

        edges = [(f"v{i}", f"v{j}") for i in range(4) for j in range(4)
                 if i != j]  # K4, both directions (dups)
        edges += [("v0", "v9"), ("v5", "v5")]  # dangling + self loop
        t = pa.table({"a": pa.array([e[0] for e in edges]),
                      "b": pa.array([e[1] for e in edges])})
        out = triangle_count(rd.from_arrow(t)).to_pylist()[0]
        assert out == {"n_edges": 7, "n_triangles": 4}

    def test_fuzz_vs_bruteforce(self):
        from itertools import combinations
        from peri_ray.stages.similarity import triangle_count

        rng = np.random.default_rng(19)
        verts = [f"n{i}" for i in range(12)]
        eset = {tuple(sorted(rng.choice(verts, 2, replace=False)))
                for _ in range(40)}
        want = sum(1 for x, y, z in combinations(sorted(verts), 3)
                   if (x, y) in eset and (x, z) in eset and (y, z) in eset)
        t = pa.table({"a": pa.array([e[0] for e in eset]),
                      "b": pa.array([e[1] for e in eset])})
        out = triangle_count(rd.from_arrow(t).repartition(4)).to_pylist()[0]
        assert out["n_triangles"] == want
        assert out["n_edges"] == len(eset)


class TestZoneMaps:
    def test_zone_pruning_correct_and_effective(self, tmp_path):
        from peri_ray.sources import read_zone_pruned, write_range_partitioned
        import json

        # value correlates with key, so zone pruning on `v` is effective
        n = 4000
        k = np.arange(n, dtype=np.float64)
        v = k * 2 + (np.arange(n) % 7)  # roughly key-correlated
        t = pa.table({"k": pa.array(k), "v": pa.array(v),
                      "payload": pa.array([f"p{i}" for i in range(n)])})
        out = str(tmp_path / "zoned")
        man = write_range_partitioned(rd.from_arrow(t), "k", out,
                                      n_ranges=8, zone_cols=["v"])
        assert "zones" in man and len(man["zones"]["v"]) == man["n_ranges"]
        # predicate on the NON-key column only
        got = sorted(r["k"] for r in read_zone_pruned(
            out, {"v": (1000.0, 1200.0)}).take_all())
        want = sorted(float(x) for x, val in zip(k, v)
                      if 1000.0 <= val <= 1200.0)
        assert got == want
        # pruning is real: most zones excluded for this narrow box
        zones = man["zones"]["v"]
        hit = sum(1 for z in zones
                  if z is not None and not (z[1] < 1000.0 or z[0] > 1200.0))
        assert hit <= 2
        # manifest round-trips through json (sibling path, not in layout)
        with open(out + ".ranges.json") as f:
            assert json.load(f)["zones"]["v"] == zones

    def test_combined_key_and_zone_predicates(self, tmp_path):
        from peri_ray.sources import read_zone_pruned, write_range_partitioned

        n = 1000
        t = pa.table({"k": pa.array(np.arange(n, dtype=np.float64)),
                      "v": pa.array(np.arange(n, dtype=np.float64) % 100)})
        out = str(tmp_path / "zoned2")
        write_range_partitioned(rd.from_arrow(t), "k", out, n_ranges=4,
                                zone_cols=["v"])
        got = sorted(r["k"] for r in read_zone_pruned(
            out, {"k": (100.0, 400.0), "v": (0.0, 10.0)}).take_all())
        want = sorted(float(i) for i in range(100, 401) if i % 100 <= 10)
        assert got == want
        # fully-pruned predicate returns an empty Dataset, not an error
        assert read_zone_pruned(out, {"v": (1e9, 2e9)}).count() == 0


class TestCompaction:
    def test_compact_preserves_content(self, tmp_path):
        from peri_ray.sources import compact_parquet, read_table

        t = pa.table({"id": pa.array(range(5000), pa.int64()),
                      "v": pa.array([i * 0.5 for i in range(5000)])})
        src = str(tmp_path / "small")
        rd.from_arrow(t).repartition(64).write_parquet(src)
        out = str(tmp_path / "compact")
        rep = compact_parquet(src, out, target_rows_per_file=2000)
        assert rep["rows"] == 5000
        assert rep["files_in"] >= 32 and rep["files_out"] <= 4
        got = sorted(r["id"] for r in read_table(out).take_all())
        assert got == list(range(5000))


class TestGlobalRank:
    """stats.global_rank — exact distributed ORDER BY (TeraSort shape)."""

    def _brute(self, rows, desc):
        # python reference: nulls first asc / last desc, ties by id
        def k(r):
            if r["v"] is None:
                return (0 if not desc else 1, 0, r["i"])
            return (1 if not desc else 0,
                    -r["v"] if desc else r["v"], r["i"])
        return {r["i"]: n + 1 for n, r in enumerate(sorted(rows, key=k))}

    def _run(self, rows, desc, **kw):
        from peri_ray.stages.stats import global_rank

        ds = rd.from_items(rows, override_num_blocks=4)
        out = global_rank(ds, "v", "i", descending=desc, **kw).take_all()
        assert len(out) == len(rows)
        got = {r["i"]: r["rank"] for r in out}
        assert got == self._brute(rows, desc)

    def test_asc_with_nulls_and_ties(self):
        rng = np.random.default_rng(7)
        rows = [{"i": i,
                 "v": None if i % 11 == 0 else int(rng.integers(0, 20))}
                for i in range(300)]
        self._run(rows, desc=False, n_ranges=8)

    def test_desc_with_nulls_and_ties(self):
        rng = np.random.default_rng(8)
        rows = [{"i": i,
                 "v": None if i % 13 == 0 else float(rng.integers(0, 15))}
                for i in range(250)]
        self._run(rows, desc=True, n_ranges=8)

    def test_constant_key_degenerates_to_one_range(self):
        rows = [{"i": i, "v": 5} for i in range(50)]
        self._run(rows, desc=False, n_ranges=8)

    def test_layout_independence(self):
        from peri_ray.stages.stats import global_rank

        rows = [{"i": i, "v": (i * 37) % 10} for i in range(200)]
        ranks = []
        for blocks in (1, 7):
            ds = rd.from_items(rows, override_num_blocks=blocks)
            out = global_rank(ds, "v", "i", n_ranges=4).take_all()
            ranks.append(sorted((r["i"], r["rank"]) for r in out))
        assert ranks[0] == ranks[1]

    def test_temporal_key(self):
        from peri_ray.stages.stats import global_rank

        ts = pa.array([3, 1, 2, None, 1], pa.timestamp("us"))
        t = pa.table({"i": pa.array([0, 1, 2, 3, 4]), "v": ts})
        out = global_rank(rd.from_arrow(t), "v", "i",
                          n_ranges=4).take_all()
        got = {r["i"]: r["rank"] for r in out}
        # nulls first, then epoch order, ties by id
        assert got == {3: 1, 1: 2, 4: 3, 2: 4, 0: 5}


class TestBloomIndex:
    def test_probe_exact_at_any_fp_rate(self, tmp_path):
        from peri_ray.stages.dedup import (bloom_probe_exact_dups,
                                           write_bloom_index)

        base_rows = [{"doc_id": i, "text": f"base doc {i}"}
                     for i in range(200)]
        base = rd.from_items(base_rows, override_num_blocks=3)
        stem = str(tmp_path / "idx")
        # 64-bit bitmap for 200 keys: saturated, fp rate near 1 —
        # the exact verify must still refute every false positive
        write_bloom_index(base, stem, m_bits=64, k_hashes=2)

        new_rows = ([{"doc_id": 1000 + i, "text": f"base doc {i}"}
                     for i in range(0, 50)] +          # true dups
                    [{"doc_id": 2000 + i, "text": f"fresh doc {i}"}
                     for i in range(80)] +             # new content
                    [{"doc_id": 3000, "text": None}])  # null text
        new = rd.from_items(new_rows, override_num_blocks=2)
        base2 = rd.from_items(base_rows, override_num_blocks=3)
        out = {r["doc_id"]: r["duplicate"]
               for r in bloom_probe_exact_dups(new, stem, base2).take_all()}
        assert len(out) == len(new_rows)
        for i in range(50):
            assert out[1000 + i] is True
        for i in range(80):
            assert out[2000 + i] is False
        assert out[3000] is False

    def test_absent_rows_skip_exchange(self, tmp_path):
        # generous bitmap: disjoint new content should all be clean
        # (proving no false negatives AND that fp pruning works)
        from peri_ray.stages.dedup import (bloom_probe_exact_dups,
                                           write_bloom_index)

        base = rd.from_items([{"doc_id": i, "text": f"b{i}"}
                              for i in range(100)])
        stem = str(tmp_path / "idx2")
        write_bloom_index(base, stem, m_bits=1 << 16, k_hashes=4)
        new = rd.from_items([{"doc_id": 500 + i, "text": f"n{i}"}
                             for i in range(100)])
        base2 = rd.from_items([{"doc_id": i, "text": f"b{i}"}
                               for i in range(100)])
        out = bloom_probe_exact_dups(new, stem, base2).take_all()
        assert all(r["duplicate"] is False for r in out)
        assert len(out) == 100


class TestSemDeDup:
    def _vecs(self):
        rng = np.random.default_rng(3)
        rows = []
        # two far-apart centers, each with a tight near-dup clump of 4
        # plus 20 scattered singletons around it
        for c, center in enumerate([np.array([10.0, 0, 0, 0]),
                                    np.array([0, 10.0, 0, 0])]):
            base = 100 * c
            clump = center + rng.normal(0, 0.01, (4, 4))
            for i, v in enumerate(clump):
                rows.append({"vec_id": base + i,
                             "embedding": v.astype(np.float32).tolist()})
            for i in range(20):
                v = center + rng.normal(0, 3.0, 4)
                rows.append({"vec_id": base + 10 + i,
                             "embedding": v.astype(np.float32).tolist()})
        return rows

    def test_pairs_subset_of_exact_and_victims(self):
        from peri_ray.stages.similarity import (cosine_similarity_join,
                                                semdedup_pairs,
                                                semdedup_victims)

        rows = self._vecs()
        thr = 0.999
        ds = rd.from_items(rows, override_num_blocks=3)
        exact = {(r["id_a"], r["id_b"]) for r in
                 cosine_similarity_join(ds, threshold=thr).take_all()}
        ds2 = rd.from_items(rows, override_num_blocks=3)
        sem = {(r["id_a"], r["id_b"]) for r in
               semdedup_pairs(ds2, threshold=thr, k_clusters=2,
                              iters=8).take_all()}
        assert sem <= exact
        # both clumps' pairs are within-cluster: full recall here
        for base in (0, 100):
            clump = {(a, b) for a in range(base, base + 4)
                     for b in range(a + 1, base + 4)}
            assert clump <= sem
        ds3 = rd.from_items(rows, override_num_blocks=3)
        victims = sorted(r["vec_id"] for r in semdedup_victims(
            ds3, threshold=thr, k_clusters=2, iters=8).take_all())
        # min id of each clump is kept; the other three are victims
        assert set(victims) >= {1, 2, 3, 101, 102, 103}
        assert 0 not in victims and 100 not in victims

    def test_oversized_cluster_raises(self):
        from peri_ray.stages.similarity import semdedup_pairs

        rows = [{"vec_id": i, "embedding": [1.0, 0.0]} for i in range(40)]
        ds = rd.from_items(rows)
        with pytest.raises(Exception, match="max_cluster"):
            semdedup_pairs(ds, threshold=0.5, k_clusters=1,
                           max_cluster=10).take_all()


class TestLogReg:
    def _data(self, n=400, seed=5):
        rng = np.random.default_rng(seed)
        x1 = rng.normal(0, 1, n)
        x2 = rng.normal(0, 1, n)
        # true boundary 2*x1 - x2 + 0.5, with a little noise
        y = (2 * x1 - x2 + 0.5 + rng.normal(0, 0.3, n)) > 0
        return [{"i": i, "x1": float(x1[i]), "x2": float(x2[i]),
                 "y": int(y[i])} for i in range(n)]

    def test_fit_matches_single_process_reference(self):
        from peri_ray.stages.learn import logreg_fit

        rows = self._data()
        ds = rd.from_items(rows, override_num_blocks=4)
        w, losses = logreg_fit(ds, ["x1", "x2"], "y", iters=40, lr=1.0)

        X = np.column_stack([[r["x1"] for r in rows],
                             [r["x2"] for r in rows],
                             np.ones(len(rows))])
        yv = np.array([r["y"] for r in rows], float)
        wr = np.zeros(3)
        for _ in range(40):
            p = 1 / (1 + np.exp(-(X @ wr)))
            wr -= 1.0 * (X.T @ (p - yv)) / len(yv)
        # identical math; only float association order differs
        assert np.allclose(w, wr, rtol=1e-8, atol=1e-10)
        assert losses[-1] < losses[0]

    def test_score_and_accuracy(self):
        from peri_ray.stages.learn import logreg_fit, logreg_score

        rows = self._data(seed=9)
        ds = rd.from_items(rows, override_num_blocks=3)
        w, _ = logreg_fit(ds, ["x1", "x2"], "y", iters=80, lr=1.5)
        scored = {r["i"]: r["score"] for r in logreg_score(
            rd.from_items(rows), w, ["x1", "x2"], "i").take_all()}
        hits = sum((scored[r["i"]] > 0.5) == bool(r["y"]) for r in rows)
        assert hits / len(rows) > 0.9
        assert all(0.0 <= s <= 1.0 for s in scored.values())

    def test_empty_raises(self):
        from peri_ray.stages.learn import logreg_fit

        t = pa.table({"x1": pa.array([], pa.float64()),
                      "y": pa.array([], pa.int8())})
        with pytest.raises(ValueError, match="empty"):
            logreg_fit(rd.from_arrow(t), ["x1"], "y", iters=1)


class TestGraphDegreeStats:
    def test_known_graph(self):
        from peri_ray.stages.similarity import graph_degree_stats

        # a->b, b->a (reciprocal pair), a->c, c->d; self loop + null
        # dropped at ingest
        t = pa.table({
            "src": pa.array(["a", "b", "a", "c", "x", None]),
            "dst": pa.array(["b", "a", "c", "d", "x", "q"]),
        })
        out = graph_degree_stats(rd.from_arrow(t), n_buckets=4).to_pylist()[0]
        assert out["n_edges"] == 4
        assert out["n_reciprocal"] == 2
        assert out["reciprocity"] == 0.5
        # edge list (outdeg(src), indeg(dst)): a->b (2,1), b->a (1,1),
        # a->c (2,1), c->d (1,1): x = [2,1,2,1], y = [1,1,1,1] -> y
        # constant -> assortativity undefined
        assert out["assortativity"] is None

    def test_fuzz_vs_numpy(self):
        from peri_ray.stages.similarity import graph_degree_stats

        rng = np.random.default_rng(23)
        eset = {(f"n{a}", f"n{b}")
                for a, b in rng.integers(0, 15, size=(120, 2)) if a != b}
        t = pa.table({"src": pa.array([e[0] for e in eset]),
                      "dst": pa.array([e[1] for e in eset])})
        out = graph_degree_stats(
            rd.from_arrow(t).repartition(5), n_buckets=8).to_pylist()[0]

        od, idg = {}, {}
        for s, d in eset:
            od[s] = od.get(s, 0) + 1
            idg[d] = idg.get(d, 0) + 1
        x = np.array([od[s] for s, d in sorted(eset)], np.float64)
        y = np.array([idg[d] for s, d in sorted(eset)], np.float64)
        n_rec = sum(1 for s, d in eset if (d, s) in eset)
        assert out["n_edges"] == len(eset)
        assert out["n_reciprocal"] == n_rec
        assert out["reciprocity"] == pytest.approx(n_rec / len(eset))
        want = np.corrcoef(x, y)[0, 1]
        assert out["assortativity"] == pytest.approx(want, rel=1e-9)

    def test_duplicate_edges_rejected_upstream_contract(self):
        # the docstring contract says callers pass DISTINCT edges;
        # verify the two metrics stay consistent when they do (dedupe
        # first) vs a raw duplicated list (which double-counts)
        from peri_ray.stages.dedup import dedupe_pairs
        from peri_ray.stages.similarity import graph_degree_stats

        t = pa.table({"id_a": pa.array([1, 1, 2], pa.int64()),
                      "id_b": pa.array([2, 2, 1], pa.int64())})
        ded = dedupe_pairs(rd.from_arrow(t))
        out = graph_degree_stats(ded, src_col="id_a",
                                 dst_col="id_b", n_buckets=4).to_pylist()[0]
        assert out["n_edges"] == 2 and out["n_reciprocal"] == 2
        assert out["reciprocity"] == 1.0


class TestHITS:
    """hits_scores (similarity.py) — hybrid driver/distributed hubs &
    authorities; `host_hits_outlinks` wires it over the host graph."""

    def _edges(self, pairs):
        t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                      "dst": pa.array([b for _, b in pairs], pa.int64())})
        return rd.from_arrow(t).repartition(2)

    def _reference(self, pairs, n, iters):
        h = np.ones(n, np.float64)
        a = np.zeros(n, np.float64)
        for _ in range(iters):
            a = np.zeros(n, np.float64)
            for u, v in pairs:
                a[v] += h[u]
            a /= np.linalg.norm(a)
            h = np.zeros(n, np.float64)
            for u, v in pairs:
                h[u] += a[v]
            h /= np.linalg.norm(h)
        return h, a

    def test_star_graph(self):
        from peri_ray.stages.similarity import hits_scores

        # 0,1,2 all point at 3: 3 is the sole authority, 0/1/2 equal hubs
        out = {r["node"]: r for r in hits_scores(
            self._edges([(0, 3), (1, 3), (2, 3)]), iters=4).take_all()}
        assert out[3]["auth"] == pytest.approx(1.0)
        assert out[3]["hub"] == 0.0
        for i in range(3):
            assert out[i]["hub"] == pytest.approx(1 / np.sqrt(3))
            assert out[i]["auth"] == 0.0

    def test_matches_reference_iteration(self):
        from peri_ray.stages.similarity import hits_scores

        rng = np.random.default_rng(31)
        n = 25
        pairs = sorted({(int(a), int(b))
                        for a, b in rng.integers(0, n, size=(120, 2))
                        if a != b})
        h, a = self._reference(pairs, n, 5)
        got = {r["node"]: r for r in hits_scores(
            self._edges(pairs), iters=5).take_all()}
        for i in range(n):
            if i not in got:  # isolated node (no edges at all)
                assert h[i] == 0.0 and a[i] == 0.0
                continue
            assert got[i]["hub"] == pytest.approx(h[i], abs=1e-12)
            assert got[i]["auth"] == pytest.approx(a[i], abs=1e-12)

    def test_distributed_path_matches_driver(self):
        from peri_ray.stages.similarity import hits_scores

        rng = np.random.default_rng(37)
        pairs = sorted({(int(a), int(b))
                        for a, b in rng.integers(0, 20, size=(90, 2))
                        if a != b})
        a = {r["node"]: r for r in hits_scores(
            self._edges(pairs), iters=3).take_all()}
        b = {r["node"]: r for r in hits_scores(
            self._edges(pairs), iters=3, n_buckets=8,
            driver_threshold=0).take_all()}
        assert set(a) == set(b)
        for node in a:
            assert a[node]["hub"] == pytest.approx(b[node]["hub"], abs=1e-9)
            assert a[node]["auth"] == pytest.approx(b[node]["auth"], abs=1e-9)

    def test_empty_and_bad_iters(self):
        from peri_ray.stages.similarity import hits_scores

        t = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        assert hits_scores(rd.from_arrow(t)).count() == 0
        with pytest.raises(ValueError, match="iters"):
            hits_scores(self._edges([(0, 1)]), iters=0)


class TestFDReport:
    def test_holds_and_violations(self):
        from peri_ray.stages.checks import fd_report

        t = pa.table({
            "a": pa.array([1, 1, 2, 2, 3, None, 4], pa.int64()),
            "b": pa.array(["x", "x", "y", "z", "w", "q", None]),
        })
        ds = rd.from_arrow(t).repartition(3)
        out = fd_report([
            ("t.a->b", ds, "a", "b"),   # a=2 maps to {y,z}: violated
            ("t.b->a", ds, "b", "a"),   # x->1, y->2, z->2, w->3: holds
        ], n_buckets=4).to_pylist()
        by = {r["pair"]: r for r in out}
        # null lhs (None,q) and null rhs (4,None) rows are vacuous
        assert by["t.a->b"]["lhs_distinct"] == 3
        assert by["t.a->b"]["violating_lhs"] == 1
        assert by["t.a->b"]["fd_holds"] is False
        assert by["t.b->a"]["lhs_distinct"] == 4
        assert by["t.b->a"]["violating_lhs"] == 0
        assert by["t.b->a"]["fd_holds"] is True

    def test_cross_batch_lhs_not_double_counted(self):
        from peri_ray.stages.checks import fd_report

        # the same (l, r) pair repeated across many blocks must count
        # once, and an l whose two r values live in DIFFERENT blocks
        # must still be seen as violating (the bucket co-locates them)
        n = 500
        t = pa.table({
            "a": pa.array([i % 7 for i in range(n)], pa.int64()),
            "b": pa.array(["r0" if (i % 7) or (i % 2 == 0) else "r1"
                           for i in range(n)]),
        })
        out = fd_report([("p", rd.from_arrow(t).repartition(8),
                          "a", "b")], n_buckets=4).to_pylist()[0]
        assert out["lhs_distinct"] == 7
        assert out["violating_lhs"] == 1   # only a=0 maps to {r0, r1}
        assert out["fd_holds"] is False


class TestKCore:
    """kcore_members (similarity.py) — hybrid peeling of the
    undirected k-core; `host_kcore_members` wires it over hosts."""

    def _edges(self, pairs):
        t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                      "dst": pa.array([b for _, b in pairs], pa.int64())})
        return rd.from_arrow(t).repartition(2)

    @staticmethod
    def _brute(pairs, k):
        eset = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        while True:
            deg = {}
            for a, b in eset:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            weak = {n for n, d in deg.items() if d < k}
            if not weak:
                return set(deg)
            eset = {e for e in eset
                    if e[0] not in weak and e[1] not in weak}

    def test_clique_with_tail(self):
        from peri_ray.stages.similarity import kcore_members

        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
                 (3, 4), (4, 5)]
        got = {r["node"] for r in kcore_members(
            self._edges(pairs), k=3).take_all()}
        assert got == {0, 1, 2, 3}
        # k=1 keeps everything; k=4 empties (max clique is 4 = deg 3)
        assert {r["node"] for r in kcore_members(
            self._edges(pairs), k=1).take_all()} == set(range(6))
        assert kcore_members(self._edges(pairs), k=4).count() == 0

    def test_reverse_duplicates_collapse(self):
        from peri_ray.stages.similarity import kcore_members

        # u->v and v->u are ONE undirected edge: a reciprocal pair has
        # degree 1 each, so k=2 must be empty
        out = kcore_members(self._edges([(7, 8), (8, 7)]), k=2)
        assert out.count() == 0

    def test_fuzz_vs_bruteforce(self):
        from peri_ray.stages.similarity import kcore_members

        rng = np.random.default_rng(41)
        pairs = [(int(a), int(b))
                 for a, b in rng.integers(0, 18, size=(70, 2)) if a != b]
        for k in (2, 3, 4):
            got = {r["node"] for r in kcore_members(
                self._edges(pairs), k=k).take_all()}
            assert got == self._brute(pairs, k)

    def test_distributed_path_matches_driver(self):
        from peri_ray.stages.similarity import kcore_members

        rng = np.random.default_rng(43)
        pairs = [(int(a), int(b))
                 for a, b in rng.integers(0, 16, size=(60, 2)) if a != b]
        a = {r["node"] for r in kcore_members(
            self._edges(pairs), k=3).take_all()}
        b = {r["node"] for r in kcore_members(
            self._edges(pairs), k=3, n_buckets=8,
            driver_threshold=0).take_all()}
        assert a == b == self._brute(pairs, 3)

    def test_max_rounds_raises(self):
        from peri_ray.stages.similarity import kcore_members

        # a path graph peels one layer per round from each end
        pairs = [(i, i + 1) for i in range(12)]
        with pytest.raises(ValueError, match="max_rounds"):
            kcore_members(self._edges(pairs), k=2,
                          driver_threshold=0, max_rounds=2)


class TestReconciliationCheck:
    def _run(self, det, mas, tol=0):
        from peri_ray.stages.checks import reconciliation_check

        d = rd.from_arrow(pa.table({
            "k": pa.array([x[0] for x in det], pa.int64()),
            "cents": pa.array([x[1] for x in det], pa.int64())}))
        m = rd.from_arrow(pa.table({
            "k": pa.array([x[0] for x in mas], pa.int64()),
            "declared": pa.array([x[1] for x in mas], pa.int64())}))
        return {r["key"]: r for r in reconciliation_check(
            d.repartition(3), m, "k", "cents", "declared",
            tol_cents=tol, n_buckets=4).take_all()}

    def test_matching_orders_pass(self):
        # order 1 sums exactly; order 2 off by 5; order 3 has NO
        # detail rows (computed 0); detail 4 has no master (ignored)
        out = self._run(
            det=[(1, 100), (1, 250), (2, 40), (4, 7)],
            mas=[(1, 350), (2, 45), (3, 10)])
        assert set(out) == {2, 3}
        assert out[2]["computed_cents"] == 40
        assert out[2]["diff_cents"] == 5
        assert out[3]["declared_cents"] == 10
        assert out[3]["computed_cents"] == 0
        assert out[3]["diff_cents"] == 10

    def test_tolerance_absorbs_small_diffs(self):
        out = self._run(det=[(1, 95), (2, 80)],
                        mas=[(1, 100), (2, 95)], tol=5)
        assert set(out) == {2}
        assert out[2]["diff_cents"] == 15

    def test_cross_block_detail_sums(self):
        # the same key's detail rows spread over many blocks must sum
        # once through the bucket exchange, not per block
        det = [(7, 1)] * 200
        out = self._run(det=det, mas=[(7, 200)])
        assert out == {}
        out = self._run(det=det, mas=[(7, 199)])
        assert out[7]["diff_cents"] == -1


class TestContingency:
    def test_counts_and_expected(self):
        from peri_ray.stages.stats import (chi_square_stat,
                                           contingency_profile)

        t = pa.table({
            "x": pa.array(["a", "a", "a", "b", "b", None, "a"]),
            "y": pa.array(["u", "u", "v", "u", "v", "u", None]),
        })
        out = contingency_profile(rd.from_arrow(t).repartition(3),
                                  "x", "y")
        cells = {(r["val_a"], r["val_b"]): r for r in out.to_pylist()}
        # valid rows: (a,u)x2 (a,v) (b,u) (b,v) -> n=5
        assert len(cells) == 4
        assert cells[("a", "u")]["observed"] == 2
        assert cells[("a", "v")]["observed"] == 1
        assert cells[("b", "u")]["observed"] == 1
        assert cells[("b", "v")]["observed"] == 1
        # marginals: rt(a)=3 rt(b)=2 ct(u)=3 ct(v)=2
        assert cells[("a", "u")]["expected_num"] == 9
        assert cells[("b", "v")]["expected_num"] == 4
        assert all(r["n_total"] == 5 for r in cells.values())

        st = chi_square_stat(out)
        # chi2 vs hand computation: e = [1.8, 1.2, 1.2, 0.8]
        want = ((2 - 1.8) ** 2 / 1.8 + (1 - 1.2) ** 2 / 1.2
                + (1 - 1.2) ** 2 / 1.2 + (1 - 0.8) ** 2 / 0.8)
        assert st["chi2"] == pytest.approx(want)
        assert st["dof"] == 1
        assert st["n"] == 5

    def test_zero_cell_in_cross_product(self):
        from peri_ray.stages.stats import contingency_profile

        t = pa.table({"x": pa.array(["a", "b"]),
                      "y": pa.array(["u", "v"])})
        out = contingency_profile(rd.from_arrow(t), "x", "y").to_pylist()
        assert len(out) == 4  # (a,v) and (b,u) present with observed 0
        zeros = [r for r in out if r["observed"] == 0]
        assert {(r["val_a"], r["val_b"]) for r in zeros} == {("a", "v"),
                                                             ("b", "u")}

    def test_max_cells_guard(self):
        from peri_ray.stages.stats import contingency_profile

        t = pa.table({"x": pa.array([str(i) for i in range(40)]),
                      "y": pa.array([str(i) for i in range(40)])})
        with pytest.raises(ValueError, match="max_cells"):
            contingency_profile(rd.from_arrow(t), "x", "y", max_cells=100)


class TestCorrMatrix:
    def test_matches_numpy(self):
        from peri_ray.stages.stats import corr_matrix

        rng = np.random.default_rng(47)
        n = 3000
        x = rng.normal(10, 2, n).round(2)
        y = (2 * x + rng.normal(0, 1, n)).round(2)
        z = rng.normal(0, 1, n).round(2)
        t = pa.table({"x": pa.array(x), "y": pa.array(y),
                      "z": pa.array(z)})
        out = {(r["col_x"], r["col_y"]): r for r in corr_matrix(
            rd.from_arrow(t).repartition(6),
            [("x", 100), ("y", 100), ("z", 100)]).to_pylist()}
        xi = np.round(x * 100)
        yi = np.round(y * 100)
        zi = np.round(z * 100)
        assert out[("x", "y")]["corr"] == pytest.approx(
            np.corrcoef(xi, yi)[0, 1], abs=1e-12)
        assert out[("x", "z")]["corr"] == pytest.approx(
            np.corrcoef(xi, zi)[0, 1], abs=1e-12)
        assert out[("x", "y")]["corr"] > 0.9
        assert abs(out[("x", "z")]["corr"]) < 0.1
        assert all(r["n"] == n for r in out.values())

    def test_layout_independent_exact(self):
        from peri_ray.stages.stats import corr_matrix

        rng = np.random.default_rng(53)
        x = rng.normal(0, 3, 999).round(3)
        y = rng.normal(0, 3, 999).round(3)
        t = pa.table({"x": pa.array(x), "y": pa.array(y)})
        a = corr_matrix(rd.from_arrow(t).repartition(1),
                        [("x", 1000), ("y", 1000)]).to_pylist()[0]
        b = corr_matrix(rd.from_arrow(t).repartition(13),
                        [("x", 1000), ("y", 1000)],
                        batch_size=37).to_pylist()[0]
        # integer moments: bit-identical across any block layout
        assert a["corr"] == b["corr"]

    def test_nulls_listwise_and_degenerate(self):
        from peri_ray.stages.stats import corr_matrix

        t = pa.table({
            "x": pa.array([1.0, 2.0, None, 4.0]),
            "y": pa.array([1.0, 1.0, 1.0, 1.0]),  # zero variance
        })
        out = corr_matrix(rd.from_arrow(t), [("x", 1), ("y", 1)]).to_pylist()[0]
        assert out["n"] == 3
        assert out["corr"] is None
        with pytest.raises(ValueError, match="two columns"):
            corr_matrix(rd.from_arrow(t), [("x", 1)])


class TestPatternProfile:
    def test_signatures(self):
        from peri_ray.stages.checks import pattern_profile

        t = pa.table({"v": pa.array([
            "Customer#000000001", "Customer#000000002", "ACME-42",
            "acme-42", None, "a1B2", "  x",
        ])})
        out = pattern_profile(rd.from_arrow(t).repartition(3), "v")
        got = {r["pattern"]: r["cnt"] for r in out.to_pylist()}
        assert got == {"Aa#9": 2, "A-9": 1, "a-9": 1, "a9A9": 1,
                       "  a": 1}
        assert all(r["column"] == "v" for r in out.to_pylist())

    def test_max_patterns_guard(self):
        from peri_ray.stages.checks import pattern_profile

        # unique punctuation layouts -> unique signatures
        t = pa.table({"v": pa.array(["#" * i for i in range(1, 60)])})
        with pytest.raises(ValueError, match="free text"):
            pattern_profile(rd.from_arrow(t), "v", max_patterns=10)


class TestSeedLinkDistance:
    """seed_link_distance (similarity.py) — hybrid multi-source BFS;
    `seed_link_distance_hosts` wires it with a recursive-CTE oracle."""

    def _edges(self, pairs):
        t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                      "dst": pa.array([b for _, b in pairs], pa.int64())})
        return rd.from_arrow(t).repartition(2)

    @staticmethod
    def _brute(pairs, seeds, max_hops):
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        for h in range(1, max_hops + 1):
            nxt = {d for s, d in pairs if s in frontier} - set(dist)
            if not nxt:
                break
            for v in nxt:
                dist[v] = h
            frontier = nxt
        return dist

    def test_chain_and_unreachable(self):
        from peri_ray.stages.similarity import seed_link_distance

        pairs = [(0, 1), (1, 2), (2, 3), (5, 6)]  # 5,6 unreachable
        got = {r["node"]: r["hops"] for r in seed_link_distance(
            self._edges(pairs), seeds=[0], max_hops=8).take_all()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}
        # max_hops truncation
        got = {r["node"]: r["hops"] for r in seed_link_distance(
            self._edges(pairs), seeds=[0], max_hops=2).take_all()}
        assert got == {0: 0, 1: 1, 2: 2}

    def test_multi_seed_min_and_cycle(self):
        from peri_ray.stages.similarity import seed_link_distance

        pairs = [(0, 1), (1, 2), (2, 0), (3, 2)]  # cycle + side seed
        got = {r["node"]: r["hops"] for r in seed_link_distance(
            self._edges(pairs), seeds=[0, 3], max_hops=8).take_all()}
        assert got == {0: 0, 3: 0, 1: 1, 2: 1}

    def test_fuzz_and_distributed_parity(self):
        from peri_ray.stages.similarity import seed_link_distance

        rng = np.random.default_rng(59)
        pairs = sorted({(int(a), int(b))
                        for a, b in rng.integers(0, 30, size=(80, 2))
                        if a != b})
        seeds = [pairs[0][0], pairs[-1][0]]
        want = self._brute(pairs, seeds, 5)
        a = {r["node"]: r["hops"] for r in seed_link_distance(
            self._edges(pairs), seeds=seeds, max_hops=5).take_all()}
        b = {r["node"]: r["hops"] for r in seed_link_distance(
            self._edges(pairs), seeds=seeds, max_hops=5,
            n_buckets=8, driver_threshold=0).take_all()}
        assert a == want
        assert b == want

    def test_bad_seed_raises(self):
        from peri_ray.stages.similarity import seed_link_distance

        with pytest.raises(ValueError, match="seed"):
            seed_link_distance(self._edges([(0, 1)]), seeds=[99],
                               max_hops=3).take_all()
        with pytest.raises(ValueError, match="seed"):
            seed_link_distance(self._edges([(0, 1)]), seeds=[99],
                               max_hops=3, driver_threshold=0).take_all()


class TestClampRepair:
    def test_clamp_bounds_and_nulls(self):
        from peri_ray.stages.checks import clamp_repair

        t = pa.table({"v": pa.array([-5.0, 0.0, 50.0, 100.0, 150.0,
                                     None])})
        out = clamp_repair(rd.from_arrow(t).repartition(2),
                           "v", 0.0, 100.0)
        got = [r["v"] for r in out.take_all()]
        assert sorted([x for x in got if x is not None]) == \
            [0.0, 0.0, 50.0, 100.0, 100.0]
        assert got.count(None) == 1
        with pytest.raises(ValueError, match="lo"):
            clamp_repair(rd.from_arrow(t), "v", 5.0, 1.0)

    def test_nan_passes_through(self):
        from peri_ray.stages.checks import clamp_repair

        t = pa.table({"v": pa.array([float("nan"), -1.0])})
        got = [r["v"] for r in clamp_repair(
            rd.from_arrow(t), "v", 0.0, 10.0).take_all()]
        assert sorted(x for x in got if x == x) == [0.0]
        assert sum(1 for x in got if x != x) == 1


class TestCusumDaily:
    def _ds(self, day_counts):
        import datetime
        days, tss = [], []
        for d, c in day_counts.items():
            base = datetime.datetime.fromisoformat(d + "T06:00:00")
            tss.extend(base + datetime.timedelta(minutes=i)
                       for i in range(c))
        return rd.from_arrow(pa.table({
            "ts": pa.array(tss, pa.timestamp("us"))})).repartition(3)

    def test_level_shift_peaks_at_shift(self):
        from peri_ray.stages.temporal import cusum_daily_counts

        # 5 quiet days of 10, then 5 loud days of 30: mean 20, the
        # CUSUM must peak on the last day after rising from day 6
        dc = {f"2024-01-0{i}": 10 for i in range(1, 6)}
        dc.update({f"2024-01-1{i}": 30 for i in range(5)})
        out = cusum_daily_counts(self._ds(dc)).to_pylist()
        assert [r["day"] for r in out] == sorted(dc)
        assert all(r["x"] == dc[r["day"]] for r in out)
        s = [r["cusum_num"] for r in out]
        # quiet days: 10*10-200 = -100 each -> pinned at 0
        assert s[:5] == [0, 0, 0, 0, 0]
        # loud days: +100 each, cumulative
        assert s[5:] == [100, 200, 300, 400, 500]

    def test_flat_series_stays_zero(self):
        from peri_ray.stages.temporal import cusum_daily_counts

        dc = {f"2024-02-0{i}": 7 for i in range(1, 7)}
        out = cusum_daily_counts(self._ds(dc)).to_pylist()
        assert all(r["cusum_num"] == 0 for r in out)


class TestEwmaDaily:
    _ds = TestCusumDaily._ds

    def test_recurrence_and_flags(self):
        from peri_ray.stages.temporal import ewma_daily_counts

        # 8, 8, 8, then a 3x burst day, then back
        dc = {"2024-03-01": 8, "2024-03-02": 8, "2024-03-03": 8,
              "2024-03-04": 24, "2024-03-05": 8}
        out = ewma_daily_counts(self._ds(dc)).to_pylist()
        assert [r["day"] for r in out] == sorted(dc)
        # hand-threaded recurrence: s1=8; s stays 8 until the burst
        s = 8.0
        exp = [8.0]
        for x in (8, 8, 24, 8):
            exp.append((x + 7.0 * s) / 8.0)
            s = exp[-1]
        assert [r["ewma"] for r in out] == exp
        # dev vs the PREVIOUS smoothed level
        assert out[3]["dev"] == 24 - 8.0
        # burst day: 5*|16| > 8 -> flagged.  Return day: s4 = 10,
        # dev = -2, 5*2 = 10 > 10 is False -> NOT flagged (strict >)
        assert [r["flag"] for r in out] == [False, False, False,
                                            True, False]

    def test_flat_series_never_flags(self):
        from peri_ray.stages.temporal import ewma_daily_counts

        dc = {f"2024-02-0{i}": 7 for i in range(1, 7)}
        out = ewma_daily_counts(self._ds(dc)).to_pylist()
        assert all(not r["flag"] for r in out)
        assert all(r["ewma"] == 7.0 for r in out)
        assert all(r["dev"] == 0.0 for r in out)


class TestConditionalNullRates:
    def test_rates_per_class(self):
        from peri_ray.stages.stats import conditional_null_rates

        t = pa.table({
            "src": pa.array(["a", "a", "a", "b", "b", None]),
            "x": pa.array([1.0, None, None, 1.0, 1.0, None]),
            "y": pa.array(["u", "v", "w", None, "z", "q"]),
        })
        out = conditional_null_rates(
            rd.from_arrow(t).repartition(2), "src", ["x", "y"])
        got = {(r["cond_value"], r["column"]): r for r in out.to_pylist()}
        assert got[("a", "x")]["nulls"] == 2
        assert got[("a", "x")]["null_rate"] == pytest.approx(2 / 3)
        assert got[("a", "y")]["nulls"] == 0
        assert got[("b", "y")]["null_rate"] == pytest.approx(0.5)
        # null conditioning value groups under real NULL
        assert got[(None, "x")]["n"] == 1
        assert got[(None, "x")]["nulls"] == 1

    def test_max_groups_guard(self):
        from peri_ray.stages.stats import conditional_null_rates

        t = pa.table({"src": pa.array([str(i) for i in range(50)]),
                      "x": pa.array([1.0] * 50)})
        with pytest.raises(ValueError, match="enum-like"):
            conditional_null_rates(rd.from_arrow(t), "src", ["x"],
                                   max_groups=10)


class TestReadability:
    def test_known_values(self):
        from peri_ray.stages.text import readability_scores

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "The cat sat. The dog ran!",  # 6 words, 2 sentences
                "no terminators here",        # 3 words, floor 1 sent
                "!!! ...",                    # 0 words -> null
            ]),
        })
        out = {r["doc_id"]: r for r in readability_scores(
            rd.from_arrow(t)).take_all()}
        r1 = out[1]
        assert (r1["words"], r1["sentences"]) == (6, 2)
        # vowel groups: the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
        assert r1["syllables"] == 6
        assert r1["flesch"] == pytest.approx(
            206.835 - 1.015 * 3.0 - 84.6 * 1.0)
        r2 = out[2]
        assert (r2["words"], r2["sentences"]) == (3, 1)
        assert out[3]["words"] == 0
        assert out[3]["flesch"] is None


class TestMirrorSites:
    def test_merged_raw_slots_equal_union_signature(self):
        from peri_ray.stages.dedup import (MinHasher, _shingle_hashes,
                                           densify_rotation)

        mh = MinHasher(num_perm=32, k=4, densify=False)
        ta, tb = "the quick brown fox jumps", "over the lazy dog again"
        sa, sb = _shingle_hashes([ta, tb], 4)
        raw = mh._signatures([sa, sb])
        merged = densify_rotation(np.minimum(raw[0:1], raw[1:2]))
        union = densify_rotation(
            mh._signatures([np.concatenate([sa, sb])]))
        assert (merged == union).all()

    def test_planted_mirror_hosts(self):
        from peri_ray.stages.dedup import mirror_site_pairs

        rng = np.random.default_rng(61)
        vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox",
                 "golf", "hotel", "india", "julia", "kilo", "lima"]

        def page(n=30):
            return " ".join(rng.choice(vocab, n))

        rows_key, rows_text = [], []
        shared = [page() for _ in range(6)]
        for key in (1, 2):  # mirrors: same pages, different split
            for p in shared:
                rows_key.append(key)
                rows_text.append(p)
        for key in (3, 4, 5, 6):
            for _ in range(6):
                rows_key.append(key)
                rows_text.append(page())
        t = pa.table({"host_key": pa.array(rows_key, pa.int64()),
                      "text": pa.array(rows_text)})
        out = mirror_site_pairs(rd.from_arrow(t).repartition(4),
                                threshold=0.9, n_buckets=8).take_all()
        assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
        assert out[0]["est_jaccard"] == 1.0


class TestHLLOverlap:
    def test_estimate_accuracy(self):
        from peri_ray.stages.checks import hll_overlap_estimate

        n_a, n_b, n_common = 30_000, 20_000, 8_000
        a = [f"common{i}" for i in range(n_common)] + \
            [f"a{i}" for i in range(n_a - n_common)]
        b = [f"common{i}" for i in range(n_common)] + \
            [f"b{i}" for i in range(n_b - n_common)]
        da = rd.from_arrow(pa.table({"u": pa.array(a)})).repartition(4)
        db = rd.from_arrow(pa.table({"u": pa.array(b)})).repartition(3)
        out = hll_overlap_estimate(da, db, "u", "u").to_pylist()[0]
        assert out["ndv_a"] == pytest.approx(n_a, rel=0.03)
        assert out["ndv_b"] == pytest.approx(n_b, rel=0.03)
        assert out["est_overlap"] == pytest.approx(n_common, rel=0.15)
        assert out["est_containment_a"] == pytest.approx(
            n_common / n_a, rel=0.15)

    def test_disjoint_sets_near_zero(self):
        from peri_ray.stages.checks import hll_overlap_estimate

        da = rd.from_arrow(pa.table(
            {"u": pa.array([f"x{i}" for i in range(5000)])}))
        db = rd.from_arrow(pa.table(
            {"u": pa.array([f"y{i}" for i in range(5000)])}))
        out = hll_overlap_estimate(da, db, "u", "u").to_pylist()[0]
        # sketch noise only: well under 2% of either side
        assert out["est_overlap"] < 200


class TestProfilingFuzz:
    """Randomized DuckDB twins for the session-9 profiling operators —
    nulls, duplicates and degenerate shapes beyond the fixed cases."""

    def test_fd_report_random_frames(self):
        import duckdb
        from peri_ray.stages.checks import fd_report

        rng = np.random.default_rng(67)
        for trial in range(5):
            n = int(rng.integers(20, 300))
            lhs = rng.integers(0, 8, n).astype(object)
            rhs = rng.choice(["p", "q", "r", None], n)
            lhs[rng.random(n) < 0.1] = None
            t = pa.table({"a": pa.array(list(lhs), pa.int64()),
                          "b": pa.array(list(rhs), pa.string())})
            got = fd_report(
                [("x", rd.from_arrow(t).repartition(4), "a", "b")],
                n_buckets=4).to_pylist()[0]
            want = duckdb.arrow(t).query("t", """
                SELECT CAST(count(*) AS BIGINT) AS nl,
                       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS nv
                  FROM (SELECT a, count(DISTINCT b) AS d FROM t
                         WHERE a IS NOT NULL AND b IS NOT NULL
                         GROUP BY a)""").fetchall()[0]
            assert (got["lhs_distinct"], got["violating_lhs"]) == want, \
                f"trial {trial}"

    def test_contingency_random_frames(self):
        import duckdb
        from peri_ray.stages.stats import contingency_profile

        rng = np.random.default_rng(71)
        for trial in range(4):
            n = int(rng.integers(30, 400))
            a = rng.choice(["u", "v", "w", None], n)
            b = rng.choice(["x", "y", None], n)
            t = pa.table({"a": pa.array(list(a), pa.string()),
                          "b": pa.array(list(b), pa.string())})
            got = contingency_profile(
                rd.from_arrow(t).repartition(3), "a", "b").to_pylist()
            want = duckdb.arrow(t).query("t", """
                WITH f AS (SELECT a, b FROM t
                            WHERE a IS NOT NULL AND b IS NOT NULL),
                o AS (SELECT a, b, count(*) AS c FROM f GROUP BY a, b),
                ra AS (SELECT a, count(*) AS rt FROM f GROUP BY a),
                cb AS (SELECT b, count(*) AS ct FROM f GROUP BY b),
                nn AS (SELECT count(*) AS n FROM f)
                SELECT ra.a, cb.b, COALESCE(o.c, 0), ra.rt * cb.ct, nn.n
                  FROM ra CROSS JOIN cb CROSS JOIN nn
                  LEFT JOIN o ON o.a = ra.a AND o.b = cb.b
                 ORDER BY 1, 2""").fetchall()
            got_rows = [(r["val_a"], r["val_b"], r["observed"],
                         r["expected_num"], r["n_total"]) for r in got]
            assert got_rows == want, f"trial {trial}"

    def test_reconciliation_random_frames(self):
        import duckdb
        from peri_ray.stages.checks import reconciliation_check

        rng = np.random.default_rng(73)
        for trial in range(4):
            nd, nm = int(rng.integers(10, 200)), int(rng.integers(5, 40))
            det = pa.table({
                "k": pa.array(rng.integers(0, nm + 5, nd), pa.int64()),
                "cents": pa.array(rng.integers(-50, 200, nd), pa.int64())})
            mas = pa.table({
                "k": pa.array(np.arange(nm), pa.int64()),
                "declared": pa.array(rng.integers(-20, 400, nm),
                                     pa.int64())})
            tol = int(rng.integers(0, 30))
            got = sorted(
                (r["key"], r["declared_cents"], r["computed_cents"])
                for r in reconciliation_check(
                    rd.from_arrow(det).repartition(3),
                    rd.from_arrow(mas), "k", "cents", "declared",
                    tol_cents=tol, n_buckets=4).take_all())
            con = duckdb.connect()
            con.register("det", det)
            con.register("mas", mas)
            want = sorted(con.execute(f"""
                SELECT m.k, m.declared,
                       COALESCE(s.c, 0)
                  FROM mas m LEFT JOIN (SELECT k, sum(cents) AS c
                                          FROM det GROUP BY k) s
                    ON m.k = s.k
                 WHERE abs(m.declared - COALESCE(s.c, 0)) > {tol}
            """).fetchall())
            assert got == want, f"trial {trial}"


class TestExpectationSuiteExtensions:
    def test_new_forms(self):
        from peri_ray.stages.expect import expectation_suite

        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "code": pa.array(["ab", "cd", "XY", "ef", None, "gh"]),
            "amt": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
            "grp": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "tag": pa.array(["x", "x", "y", "y", "z", "w"]),
        })
        ds = rd.from_arrow(t).repartition(3)
        out = {r["check_id"]: r for r in expectation_suite(ds, [
            ("regex_match_fraction_at_least", "code", "^[a-z]{2}$", 0.6),
            ("regex_match_fraction_at_least", "code", "^[a-z]{2}$", 0.7),
            ("int_sum_between", "amt", 200, 220),
            ("int_sum_between", "amt", 1, 100),
            ("distinct_count_between", "code", 5, 10),
            ("distinct_count_between", "grp", 3, 3),
            ("fd_holds", "grp", "tag"),
            ("fd_holds", "id", "tag"),
        ], n_buckets=4).to_pylist()}
        # 4 of 6 rows match the regex: 0.666… >= 0.6 but < 0.7
        r = out["regex_match_fraction_at_least:code"]
        assert r["observed"] == 4
        # duplicate check_id: the second overwrote in the dict — both
        # rows exist in the table; re-pull per position instead
        tbl = expectation_suite(ds, [
            ("regex_match_fraction_at_least", "code", "^[a-z]{2}$", 0.6),
            ("regex_match_fraction_at_least", "code", "^[a-z]{2}$", 0.7),
        ], n_buckets=4).to_pylist()
        assert tbl[0]["passed"] is True
        assert tbl[1]["passed"] is False
        assert out["int_sum_between:amt"]["observed"] == 210
        assert out["distinct_count_between:code"]["observed"] == 5
        assert out["distinct_count_between:grp"]["passed"] is True
        # grp 3 maps to {z, w}: violated; id is a key: holds
        assert out["fd_holds:grp->tag"]["observed"] == 1
        assert out["fd_holds:grp->tag"]["passed"] is False
        assert out["fd_holds:id->tag"]["passed"] is True


class TestReconciliationNullDeclared:
    def test_null_declared_master_is_reported(self):
        from peri_ray.stages.checks import reconciliation_check

        d = rd.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "cents": pa.array([10, 10], pa.int64())}))
        m = rd.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "declared": pa.array([10, None], pa.int64())}))
        out = {r["key"]: r for r in reconciliation_check(
            d, m, "k", "cents", "declared", n_buckets=4).take_all()}
        # key 1 reconciles; key 2's NULL declared can never reconcile
        assert set(out) == {2}
        assert out[2]["declared_cents"] is None
        assert out[2]["computed_cents"] == 10
        assert out[2]["diff_cents"] is None


class TestTermIndex:
    def test_write_probe_and_or(self, tmp_path):
        from peri_ray.stages.text import probe_term_index, write_term_index

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["apple banana", "banana cherry",
                              "apple cherry banana", None, "  "]),
        })
        out = str(tmp_path / "tix")
        man = write_term_index(rd.from_arrow(t).repartition(3), out,
                               n_shards=8)
        # distinct postings: doc1{apple,banana} doc2{banana,cherry}
        # doc3{apple,cherry,banana} = 7; null/blank docs contribute 0
        assert man["postings"] == 7
        got = {r["doc"] for r in probe_term_index(
            out, ["apple", "banana"], mode="and").take_all()}
        assert got == {1, 3}
        got = {r["doc"] for r in probe_term_index(
            out, ["apple", "cherry"], mode="or").take_all()}
        assert got == {1, 2, 3}
        # absent term: AND empties, OR unaffected
        assert probe_term_index(out, ["apple", "zzz"],
                                mode="and").count() == 0
        with pytest.raises(ValueError, match="mode"):
            probe_term_index(out, ["apple"], mode="xor")

    def test_duplicate_tokens_one_posting(self, tmp_path):
        from peri_ray.stages.text import probe_term_index, write_term_index

        t = pa.table({"doc_id": pa.array([9], pa.int64()),
                      "text": pa.array(["dup dup dup dup"])})
        out = str(tmp_path / "tix2")
        man = write_term_index(rd.from_arrow(t), out, n_shards=4)
        assert man["postings"] == 1
        assert {r["doc"] for r in probe_term_index(
            out, ["dup"]).take_all()} == {9}


class TestTakedownPurge:
    def test_copies_purged_with_originals(self):
        from peri_ray.stages.checks import takedown_purge

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(["secret", "other", "secret", "third",
                              None, "fourth"]),
        })
        tomb = rd.from_arrow(pa.table({"doc_id": pa.array([1],
                                                          pa.int64())}))
        out = {r["doc_id"] for r in takedown_purge(
            rd.from_arrow(t).repartition(3), tomb).take_all()}
        # doc 1 tombstoned; doc 3 is a verbatim copy of its text;
        # null-text doc 5 survives (null never equals a dead text)
        assert out == {2, 4, 5, 6}

    def test_empty_tombstones_noop(self):
        from peri_ray.stages.checks import takedown_purge

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a", "b"])})
        tomb = rd.from_arrow(pa.table({"doc_id": pa.array([],
                                                          pa.int64())}))
        assert takedown_purge(rd.from_arrow(t), tomb).count() == 2


class TestTermIndexManifest:
    def test_rebuild_prunes_stale_shards(self, tmp_path):
        from peri_ray.stages.text import probe_term_index, write_term_index

        out = str(tmp_path / "tix3")
        full = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": pa.array(["alpha beta", "gamma"])})
        write_term_index(rd.from_arrow(full), out, n_shards=4)
        # rebuild with gamma's doc deleted: its shard may now be
        # empty; the probe must NOT resurrect the stale posting
        small = pa.table({"doc_id": pa.array([1], pa.int64()),
                          "text": pa.array(["alpha beta"])})
        man = write_term_index(rd.from_arrow(small), out, n_shards=4)
        assert man["postings"] == 2
        assert probe_term_index(out, ["gamma"]).count() == 0
        assert {r["doc"] for r in probe_term_index(
            out, ["alpha"]).take_all()} == {1}

    def test_manifest_missing_file_raises(self, tmp_path):
        import json
        import os

        from peri_ray.stages.text import probe_term_index, write_term_index

        out = str(tmp_path / "tix4")
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["lonely"])})
        man = write_term_index(rd.from_arrow(t), out, n_shards=4)
        (s,) = man["shards"]
        os.remove(os.path.join(out, f"shard_{s:05d}.parquet"))
        with pytest.raises(FileNotFoundError, match="corrupt"):
            probe_term_index(out, ["lonely"]).take_all()
        # hash-probe drift detection
        j = json.load(open(out + ".index.json"))
        j["hash_probe"] = j["hash_probe"] + 1
        json.dump(j, open(out + ".index.json", "w"))
        with pytest.raises(ValueError, match="hash"):
            probe_term_index(out, ["lonely"])


class TestTermIndexFuzz:
    def test_random_corpora_vs_duckdb(self, tmp_path):
        import duckdb

        from peri_ray.stages.text import probe_term_index, write_term_index

        rng = np.random.default_rng(79)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        for trial in range(3):
            n = int(rng.integers(10, 80))
            texts = [" ".join(rng.choice(vocab,
                                         int(rng.integers(1, 8))))
                     if rng.random() > 0.1 else None for _ in range(n)]
            t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                          "text": pa.array(texts, pa.string())})
            out = str(tmp_path / f"fz{trial}")
            write_term_index(rd.from_arrow(t).repartition(3), out,
                             n_shards=8)
            q = [str(x) for x in rng.choice(vocab, 2, replace=False)]
            for mode, op in (("and", " AND "), ("or", " OR ")):
                got = {r["doc"] for r in probe_term_index(
                    out, q, mode=mode).take_all()}
                cond = op.join(
                    "list_contains(regexp_split_to_array(trim(text),"
                    f" '\\s+'), '{term}')" for term in q)
                want = {r[0] for r in duckdb.arrow(t).query(
                    "t", f"SELECT doc_id FROM t WHERE text IS NOT "
                         f"NULL AND ({cond})").fetchall()}
                assert got == want, (trial, mode)


class TestTermIndexIncremental:
    def test_base_plus_delta_union(self, tmp_path):
        from peri_ray.stages.text import probe_term_index, write_term_index

        base = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": pa.array(["alpha beta", "beta gamma"])})
        delta = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                          "text": pa.array(["alpha gamma", "delta"])})
        b, d = str(tmp_path / "base"), str(tmp_path / "delta")
        write_term_index(rd.from_arrow(base), b, n_shards=8)
        write_term_index(rd.from_arrow(delta), d, n_shards=4)
        got = {r["doc"] for r in probe_term_index(
            [b, d], ["alpha"], mode="and").take_all()}
        assert got == {1, 10}
        got = {r["doc"] for r in probe_term_index(
            [b, d], ["beta", "gamma"], mode="and").take_all()}
        assert got == {2}
        got = {r["doc"] for r in probe_term_index(
            [b, d], ["delta", "alpha"], mode="or").take_all()}
        assert got == {1, 10, 11}


class TestBM25ProbeIndex:
    def test_matches_two_pass_bm25(self, tmp_path):
        from peri_ray.stages.text import (bm25_probe_index, bm25_topk,
                                          write_term_index)

        rng = np.random.default_rng(83)
        vocab = ["spark", "window", "merge", "row", "col", "agg"]
        n = 300
        texts = [" ".join(rng.choice(vocab, int(rng.integers(3, 25))))
                 for _ in range(n)]
        texts[5] = None
        t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        ds = rd.from_arrow(t).repartition(5)
        out = str(tmp_path / "bmix")
        write_term_index(ds, out, n_shards=8)

        terms = ["spark", "merge"]
        want = bm25_topk(ds, terms, k=15).to_pylist()
        got = bm25_probe_index(out, terms, k=15,
                               n_buckets=8).to_pylist()
        assert len(got) == len(want) == 15
        for g, w in zip(got, want):
            assert g["doc"] == w["doc_id"]
            assert g["rank"] == w["rank"]
            assert g["score"] == w["score"]  # bit-identical expression

    def test_rare_and_absent_terms(self, tmp_path):
        from peri_ray.stages.text import bm25_probe_index, write_term_index

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["needle in hay", "hay hay hay",
                              "just hay"]),
        })
        out = str(tmp_path / "bmix2")
        write_term_index(rd.from_arrow(t), out, n_shards=4)
        got = bm25_probe_index(out, ["needle"], k=5,
                               n_buckets=4).to_pylist()
        assert [r["doc"] for r in got] == [1]
        assert bm25_probe_index(out, ["absent"], k=5,
                                n_buckets=4).num_rows == 0


class TestCompactTermIndexes:
    def test_compacted_equals_fresh_build(self, tmp_path):
        from peri_ray.stages.text import (bm25_probe_index,
                                          compact_term_indexes,
                                          probe_term_index,
                                          write_term_index)

        rng = np.random.default_rng(89)
        vocab = ["spark", "window", "merge", "row", "col"]
        texts = [" ".join(rng.choice(vocab, int(rng.integers(2, 15))))
                 for _ in range(120)]
        full = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                         "text": pa.array(texts)})
        base_t, delta_t = full.slice(0, 80), full.slice(80)
        b, d, m, f = (str(tmp_path / x) for x in
                      ("base", "delta", "merged", "fresh"))
        write_term_index(rd.from_arrow(base_t), b, n_shards=8)
        write_term_index(rd.from_arrow(delta_t), d, n_shards=8)
        man_m = compact_term_indexes([b, d], m)
        man_f = write_term_index(rd.from_arrow(full), f, n_shards=8)
        assert man_m["postings"] == man_f["postings"]
        assert man_m["n_docs"] == man_f["n_docs"]
        assert man_m["sum_dl"] == man_f["sum_dl"]
        # boolean + ranked probes identical to the fresh build
        for q in (["spark"], ["merge", "window"]):
            gm = {r["doc"] for r in probe_term_index(m, q).take_all()}
            gf = {r["doc"] for r in probe_term_index(f, q).take_all()}
            assert gm == gf
        rm = bm25_probe_index(m, ["spark", "merge"], k=10).to_pylist()
        rf = bm25_probe_index(f, ["spark", "merge"], k=10).to_pylist()
        assert rm == rf


class TestPhraseIndex:
    def test_bigram_index_exact_phrase(self, tmp_path):
        from peri_ray.stages.text import probe_term_index, write_term_index

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["big data pipeline", "data big pipeline",
                              "big   data", "pipeline"]),
        })
        out = str(tmp_path / "bg")
        man = write_term_index(rd.from_arrow(t), out, ngram=2,
                               n_shards=4)
        # bigrams: doc1 {big data, data pipeline}, doc2 {data big,
        # big pipeline}, doc3 {big data} (multi-space collapses),
        # doc4 none
        assert man["postings"] == 5
        got = {r["doc"] for r in probe_term_index(
            out, ["big data"]).take_all()}
        assert got == {1, 3}  # word order matters: doc2 excluded
        # doclen = bigram positions: doc4 has 1 token -> 0 positions
        assert man["sum_dl"] == 2 + 2 + 1 + 0


class TestIVFIndex:
    def _vectors(self, rng, n=400, d=16, clusters=5):
        cents = rng.normal(0, 5, (clusters, d))
        X = cents[rng.integers(0, clusters, n)] + rng.normal(0, 0.3,
                                                             (n, d))
        return pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in
                                   X.astype(np.float32)]),
        })

    def test_full_probe_equals_brute_force(self, tmp_path):
        from peri_ray.stages.similarity import (brute_force_topk,
                                                probe_ivf_index,
                                                write_ivf_index)

        rng = np.random.default_rng(97)
        t = self._vectors(rng)
        ds = rd.from_arrow(t).repartition(4)
        out = str(tmp_path / "ivf")
        man = write_ivf_index(ds, out, n_cells=8, train_sample=200)
        assert sum(man["cell_counts"].values()) == 400
        q = np.stack([np.asarray(t.column("embedding")[i].as_py(),
                                 np.float32) for i in (0, 7)])
        exact = brute_force_topk(ds, q, 5)
        got = probe_ivf_index(out, q, k=5, nprobe=8)  # all cells
        for e, g in zip(exact, got):
            assert [x[0] for x in e] == [x[0] for x in g]

    def test_pruned_probe_recall(self, tmp_path):
        from peri_ray.stages.similarity import (brute_force_topk,
                                                probe_ivf_index,
                                                write_ivf_index)

        rng = np.random.default_rng(101)
        t = self._vectors(rng)
        ds = rd.from_arrow(t).repartition(4)
        out = str(tmp_path / "ivf2")
        write_ivf_index(ds, out, n_cells=8, train_sample=200)
        q = np.stack([np.asarray(t.column("embedding")[i].as_py(),
                                 np.float32) for i in (3, 11, 42)])
        exact = brute_force_topk(ds, q, 10)
        got = probe_ivf_index(out, q, k=10, nprobe=3)
        hits = total = 0
        for e, g in zip(exact, got):
            es, gs = {x[0] for x in e}, {x[0] for x in g}
            hits += len(es & gs)
            total += len(es)
        # well-separated clusters: pruned probe keeps high recall
        assert hits / total >= 0.9


class TestIVFAppend:
    def test_append_equals_combined_probe(self, tmp_path):
        from peri_ray.stages.similarity import (append_ivf_index,
                                                brute_force_topk,
                                                probe_ivf_index,
                                                write_ivf_index)

        rng = np.random.default_rng(103)
        cents = rng.normal(0, 5, (4, 12))
        X = cents[rng.integers(0, 4, 300)] + rng.normal(0, 0.3, (300, 12))
        full = pa.table({
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([r.tolist() for r in
                                   X.astype(np.float32)])})
        base_t, delta_t = full.slice(0, 200), full.slice(200)
        out = str(tmp_path / "ivfapp")
        man0 = write_ivf_index(rd.from_arrow(base_t), out, n_cells=6,
                               train_sample=150)
        man1 = append_ivf_index(out, rd.from_arrow(delta_t))
        assert sum(man1["cell_counts"].values()) == 300
        assert man1["centroids"] == man0["centroids"]  # frozen
        q = np.stack([X[5].astype(np.float32),
                      X[250].astype(np.float32)])
        exact = brute_force_topk(rd.from_arrow(full), q, 5)
        got = probe_ivf_index(out, q, k=5, nprobe=6)  # all cells
        for e, g in zip(exact, got):
            assert [x[0] for x in e] == [x[0] for x in g]


class TestKAnonymity:
    def test_violations_and_counts(self):
        # group (1, d1): 5 rows, 2 sensitive values -> clean (absent)
        # group (2, d1): 2 rows -> k-violation
        # group (3, d1): 5 rows all same sensitive -> l-violation only
        rows = []
        for s in ["a", "a", "a", "b", "b"]:
            rows.append({"uid": 1, "day": "d1", "s": s})
        rows += [{"uid": 2, "day": "d1", "s": "a"},
                 {"uid": 2, "day": "d1", "s": "b"}]
        for _ in range(5):
            rows.append({"uid": 3, "day": "d1", "s": "a"})
        from peri_ray.stages.pii import k_anonymity_report

        out = {(r["uid"], r["day"]): r for r in k_anonymity_report(
            rd.from_items(rows, parallelism=3), ["uid", "day"], "s",
            k=5, l=2).take_all()}
        assert set(out) == {(2, "d1"), (3, "d1")}
        assert out[(2, "d1")]["n"] == 2
        assert out[(2, "d1")]["k_violation"] is True
        assert out[(2, "d1")]["l_violation"] is False
        assert out[(3, "d1")]["n"] == 5
        assert out[(3, "d1")]["n_sensitive"] == 1
        assert out[(3, "d1")]["k_violation"] is False
        assert out[(3, "d1")]["l_violation"] is True

    def test_null_conventions(self):
        # null quasi forms its own group; null sensitive not counted
        rows = [{"uid": None, "day": "d", "s": "a"},
                {"uid": None, "day": "d", "s": None}]
        from peri_ray.stages.pii import k_anonymity_report

        out = k_anonymity_report(rd.from_items(rows), ["uid", "day"],
                                 "s", k=5, l=2).take_all()
        assert len(out) == 1
        assert out[0]["n"] == 2 and out[0]["n_sensitive"] == 1


class TestSCD2History:
    def test_intervals_versions_changes(self):
        from peri_ray.stages.temporal import scd2_history

        rows = [
            {"id": 1, "k": "u", "ts": 10, "a": "x"},
            {"id": 2, "k": "u", "ts": 20, "a": "x"},   # unchanged
            {"id": 3, "k": "u", "ts": 30, "a": "y"},   # changed
            {"id": 4, "k": "v", "ts": 5, "a": None},   # first+null: not changed
            {"id": 5, "k": "v", "ts": 7, "a": None},   # null==null: not changed
            {"id": 6, "k": "w", "ts": 1, "a": "z"},    # singleton
        ]
        out = {r["id"]: r for r in scd2_history(
            rd.from_items(rows, parallelism=3), "k", "ts", "a", "id"
        ).take_all()}
        assert out[1]["valid_to"] == 20 and out[1]["version"] == 1
        assert out[1]["changed"] is True        # NULL IS DISTINCT FROM 'x'
        assert out[2]["changed"] is False and out[2]["version"] == 2
        assert out[3]["changed"] is True and out[3]["is_current"] is True
        assert out[3]["valid_to"] is None
        assert out[4]["changed"] is False       # NULL vs missing-prev NULL
        assert out[5]["changed"] is False
        assert out[6]["version"] == 1 and out[6]["is_current"] is True

    def test_tie_break_on_id(self):
        from peri_ray.stages.temporal import scd2_history

        rows = [{"id": 2, "k": 1, "ts": 10, "a": "b"},
                {"id": 1, "k": 1, "ts": 10, "a": "a"}]
        out = {r["id"]: r for r in scd2_history(
            rd.from_items(rows), "k", "ts", "a", "id").take_all()}
        assert out[1]["version"] == 1 and out[2]["version"] == 2
        assert out[1]["valid_to"] == 10 and out[2]["valid_to"] is None


class TestDedupExampleWeights:
    def test_weights_and_null_cluster(self):
        from peri_ray.stages.dedup import dedup_example_weights

        rows = [{"doc_id": 1, "text": "a"}, {"doc_id": 2, "text": "a"},
                {"doc_id": 3, "text": "b"}, {"doc_id": 4, "text": None},
                {"doc_id": 5, "text": None}, {"doc_id": 6, "text": None}]
        out = {r["doc_id"]: r for r in dedup_example_weights(
            rd.from_items(rows, parallelism=3)).take_all()}
        assert len(out) == 6
        assert out[1]["cluster_size"] == 2 and out[1]["weight"] == 0.5
        assert out[3]["cluster_size"] == 1 and out[3]["weight"] == 1.0
        assert out[4]["cluster_size"] == 3
        assert out[5]["weight"] == 1.0 / 3.0


class TestBPETrain:
    @staticmethod
    def _ref_bpe(word_counts, n_merges):
        # independent Sennrich-style reference: space-joined symbol
        # strings + anchored regex replacement (different mechanics
        # from the engine's tuple-walk implementation)
        import re

        vocab = {" ".join(list(w)) + " </w>": c
                 for w, c in word_counts.items()}
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for word, c in vocab.items():
                syms = word.split()
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pairs[p] = pairs.get(p, 0) + c
            if not pairs:
                break
            (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((a, b, cnt))
            pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b)
                             + r"(?!\S)")
            vocab = {pat.sub(a + b, w): c for w, c in vocab.items()}
        return merges

    def test_matches_reference(self):
        from peri_ray.stages.text import bpe_train

        corpus = ["low low low low low",
                  "lower lower widest widest widest",
                  "newest newest newest newest newest newest"]
        wc = {}
        for line in corpus:
            for w in line.split():
                wc[w] = wc.get(w, 0) + 1
        ref = self._ref_bpe(wc, 8)
        got = bpe_train(rd.from_items([{"text": c} for c in corpus],
                                      parallelism=2), n_merges=8)
        eng = list(zip(got.column("left").to_pylist(),
                       got.column("right").to_pylist(),
                       got.column("pair_count").to_pylist()))
        assert eng == ref
        assert got.column("rank").to_pylist() == list(range(len(ref)))

    def test_encode_counts(self):
        from peri_ray.stages.text import bpe_encode_counts, bpe_train

        corpus = ["ab ab ab ab", "ab cd"]
        ds = rd.from_items([{"doc_id": i, "text": c}
                            for i, c in enumerate(corpus)])
        merges = bpe_train(ds, n_merges=2)
        # merges: ('a','b') then ('ab','</w>') -> "ab" is ONE token
        out = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_encode_counts(ds, merges).take_all()}
        assert out[0] == 4          # four fully-merged "ab" tokens
        assert out[1] == 1 + 3      # "ab" + c,d,</w> unmerged

    def test_vocab_cap_keeps_top(self):
        from peri_ray.stages.text import bpe_word_counts

        rows = [{"text": "x x x y y z"}]
        t = bpe_word_counts(rd.from_items(rows), max_word_vocab=2)
        assert t.column("word").to_pylist() == ["x", "y"]
        assert t.column("n").to_pylist() == [3, 2]


class TestThresholdSweep:
    def test_exact_confusion_counts(self):
        from peri_ray.stages.learn import threshold_sweep

        rows = [{"s": 0.9, "y": True}, {"s": 0.8, "y": False},
                {"s": 0.2, "y": True}, {"s": 0.1, "y": False},
                {"s": None, "y": True}, {"s": 0.5, "y": None}]
        t = threshold_sweep(rd.from_items(rows, parallelism=2),
                            "s", "y", [0.5])
        r = t.to_pylist()[0]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 1)
        assert r["precision"] == 0.5 and r["recall"] == 0.5

    def test_zero_denominator_is_null(self):
        from peri_ray.stages.learn import threshold_sweep

        rows = [{"s": 0.1, "y": False}]
        r = threshold_sweep(rd.from_items(rows), "s", "y",
                            [0.5]).to_pylist()[0]
        assert r["precision"] is None and r["recall"] is None
        assert r["tn"] == 1


class TestRollingDistinct:
    @staticmethod
    def _brute(pairs, w):
        days = sorted({d for _, d in pairs})
        out = {}
        for wd in days:
            out[wd] = len({u for u, d in pairs if wd - w + 1 <= d <= wd})
        return out

    def _run(self, pairs, w):
        import numpy as np

        from peri_ray.stages.temporal import rolling_distinct_counts

        rows = [{"user_id": u,
                 "ts": np.datetime64(int(d), "D").astype(
                     "datetime64[us]").item()}
                for u, d in pairs]
        got = rolling_distinct_counts(
            rd.from_items(rows, parallelism=3), window_days=w)
        import numpy as _np

        return {(_np.datetime64(r["day"]) - _np.datetime64("1970-01-01"))
                .astype(int): r["n_keys"] for r in got.to_pylist()}

    def test_hand_case(self):
        pairs = [(1, 0), (1, 3), (2, 3), (1, 20)]
        got = self._run(pairs, 7)
        assert got == self._brute(pairs, 7)
        assert got[0] == 1 and got[3] == 2 and got[20] == 1

    def test_fuzz_vs_brute(self):
        import random

        rng = random.Random(7)
        pairs = [(rng.randrange(8), rng.randrange(25)) for _ in range(200)]
        for w in (1, 3, 7):
            assert self._run(pairs, w) == self._brute(pairs, w)


class TestZOrderSink:
    def test_roundtrip_and_box_pruning(self, tmp_path):
        import numpy as np

        from peri_ray.sources import read_zone_pruned, \
            write_zorder_partitioned

        rng = np.random.RandomState(3)
        n = 4000
        t = pa.table({"x": pa.array(rng.permutation(n).astype("int64")),
                      "y": pa.array(rng.permutation(n).astype("int64")),
                      "v": pa.array(np.arange(n, dtype="int64"))})
        out = str(tmp_path / "zo")
        man = write_zorder_partitioned(rd.from_arrow(t).repartition(8),
                                       ["x", "y"], out, n_ranges=16)
        assert man["zorder"]["keys"] == ["x", "y"]

        # exact box read == brute filter
        box = {"x": (100, 400), "y": (1000, 1400)}
        got = sorted(r["v"] for r in read_zone_pruned(
            out, box, columns=["x", "y", "v"]).take_all())
        want = sorted(int(v) for x, y, v in zip(
            t.column("x").to_pylist(), t.column("y").to_pylist(),
            t.column("v").to_pylist())
            if 100 <= x <= 400 and 1000 <= y <= 1400)
        assert got == want and len(want) > 0

        # the zone maps must actually prune: with independent uniform
        # keys a ~7.5% x 10% box must skip most of the 16 z-ranges
        zones = man["zones"]
        survivors = 0
        for i in range(man["n_ranges"]):
            keep = True
            for col, (lo, hi) in box.items():
                if zones[col][i] is not None:
                    zlo, zhi = zones[col][i]
                    if zhi < lo or zlo > hi:
                        keep = False
            survivors += keep
        assert survivors <= man["n_ranges"] // 2

    def test_rejects_bad_args(self, tmp_path):
        import pytest as _pt

        from peri_ray.sources import write_zorder_partitioned

        t = pa.table({"x": pa.array([1, 2]), "y": pa.array([3, 4])})
        with _pt.raises(ValueError):
            write_zorder_partitioned(rd.from_arrow(t), ["x"],
                                     str(tmp_path / "a"))
        with _pt.raises(ValueError):
            write_zorder_partitioned(rd.from_arrow(t), ["x", "y"],
                                     str(tmp_path / "b"), bits=32)


class TestNegativeSamples:
    def test_collision_and_self_exclusion(self):
        from peri_ray.stages.dedup import negative_samples

        # ids 0..3; texts: 0 and 2 share content
        rows = [{"doc_id": 0, "text": "same"},
                {"doc_id": 1, "text": "b"},
                {"doc_id": 2, "text": "same"},
                {"doc_id": 3, "text": "d"}]
        # mult=1, step=2, seed=0, n_ids=4: anchor a -> cands a (self,
        # dropped) and (a+2)%4 (the content twin for anchors 0 and 2)
        out = {(r["anchor_id"], r["negative_id"])
               for r in negative_samples(
                   rd.from_items(rows, parallelism=2), k=2, n_ids=4,
                   mult=1, step=2, seed=0).take_all()}
        # 0->2 and 2->0 are content collisions; 1->3 and 3->1 survive
        assert out == {(1, 3), (3, 1)}


class TestTimeWindowSums:
    def test_matches_bruteforce(self):
        from peri_ray.stages.temporal import time_window_sums

        # ts values are "epoch microseconds"; window_s=5 -> 5e6 units
        rng = __import__("random").Random(7)
        rows = [{"event_id": i, "user_id": rng.randrange(4),
                 "ts": rng.randrange(0, 40) * 1_000_000,
                 "value": rng.choice([1.0, 2.5, -3.25])}
                for i in range(120)]
        out = {r["event_id"]: r for r in time_window_sums(
            rd.from_items(rows, parallelism=5), window_s=5,
            id_col="event_id").take_all()}
        assert len(out) == 120
        for r in rows:
            frame = [x for x in rows if x["user_id"] == r["user_id"]
                     and r["ts"] - 5_000_000 <= x["ts"] <= r["ts"]]
            assert out[r["event_id"]]["win_n"] == len(frame)
            assert out[r["event_id"]]["win_sum_micro"] == sum(
                round(x["value"] * 1e6) for x in frame)

    def test_equal_ts_peers_share_frame(self):
        from peri_ray.stages.temporal import time_window_sums

        rows = [{"event_id": 1, "user_id": 9, "ts": 10_000_000,
                 "value": 1.0},
                {"event_id": 2, "user_id": 9, "ts": 10_000_000,
                 "value": 2.0},
                {"event_id": 3, "user_id": 9, "ts": 16_000_000,
                 "value": 4.0}]
        out = {r["event_id"]: r for r in time_window_sums(
            rd.from_items(rows), window_s=5).take_all()}
        # RANGE peers: both ts=10 rows see BOTH peers
        assert out[1]["win_n"] == 2 and out[2]["win_n"] == 2
        assert out[1]["win_sum_micro"] == 3_000_000
        # ts=16 window [11,16]: peers at 10 fall out
        assert out[3]["win_n"] == 1
        assert out[3]["win_sum_micro"] == 4_000_000

    def test_null_rows_excluded(self):
        from peri_ray.stages.temporal import time_window_sums

        rows = [{"event_id": 1, "user_id": 1, "ts": 1_000_000,
                 "value": 1.0},
                {"event_id": 2, "user_id": 1, "ts": None, "value": 1.0},
                {"event_id": 3, "user_id": 1, "ts": 2_000_000,
                 "value": None},
                {"event_id": 4, "user_id": None, "ts": 2_000_000,
                 "value": 1.0}]
        out = time_window_sums(rd.from_items(rows), window_s=60).take_all()
        assert sorted(r["event_id"] for r in out) == [1]


class TestPointInTimeJoin:
    def _hist(self):
        # user 1: zero-width peer at ts=5 (v1), then [5,9) (v2),
        # GAP [9,12), then open [12,None) (v3)
        return [
            {"k": 1, "vf": 5, "vt": 5, "version": 1},
            {"k": 1, "vf": 5, "vt": 9, "version": 2},
            {"k": 1, "vf": 12, "vt": None, "version": 3},
            {"k": 2, "vf": 100, "vt": None, "version": 1},
        ]

    def test_containment_gap_and_open(self):
        from peri_ray.stages.temporal import point_in_time_join

        probes = [
            {"pid": 10, "k": 1, "pts": 1},    # before first -> null
            {"pid": 11, "k": 1, "pts": 5},    # zero-width peer -> v2
            {"pid": 12, "k": 1, "pts": 8},    # inside [5,9) -> v2
            {"pid": 13, "k": 1, "pts": 10},   # gap -> null
            {"pid": 14, "k": 1, "pts": 500},  # open current -> v3
            {"pid": 15, "k": 3, "pts": 5},    # unknown key -> null
        ]
        out = {r["pid"]: r for r in point_in_time_join(
            rd.from_items(probes, parallelism=3),
            rd.from_items(self._hist(), parallelism=2),
            key_col="k", probe_ts="pts", probe_id="pid",
            valid_from="vf", valid_to="vt",
            right_cols=["version"]).take_all()}
        assert len(out) == 6
        assert out[10]["version"] is None
        assert out[11]["version"] == 2
        assert out[12]["version"] == 2
        assert out[13]["version"] is None
        assert out[14]["version"] == 3
        assert out[15]["version"] is None

    def test_shadowed_payload_rejected(self):
        import pytest

        from peri_ray.stages.temporal import point_in_time_join

        with pytest.raises(ValueError):
            point_in_time_join(None, None, key_col="k", probe_ts="pts",
                               probe_id="pid", right_cols=["pid"])


class TestNgramNovelty:
    def test_novel_fractions(self):
        from peri_ray.stages.text import ngram_novelty

        base = [{"doc_id": 1, "text": "a b c d"},
                {"doc_id": 2, "text": "c d e"}]
        # base bigrams: {a b, b c, c d, d e}
        delta = [{"doc_id": 10, "text": "a b c"},     # a b, b c -> 0 novel
                 {"doc_id": 11, "text": "e f g"},     # e f, f g -> 2 novel
                 {"doc_id": 12, "text": "c d x"},     # c d old, d x novel
                 {"doc_id": 13, "text": "solo"},      # no bigram -> absent
                 {"doc_id": 14, "text": "a b a b"}]   # distinct: a b, b a
        out = {r["doc_id"]: r for r in ngram_novelty(
            rd.from_items(base, parallelism=2),
            rd.from_items(delta, parallelism=3), n=2).take_all()}
        assert set(out) == {10, 11, 12, 14}
        assert out[10]["novel_grams"] == 0 and out[10]["total_grams"] == 2
        assert out[11]["novel_grams"] == 2 and out[11]["novelty"] == 1.0
        assert out[12]["novel_grams"] == 1 and out[12]["total_grams"] == 2
        # "a b a b": distinct grams {a b, b a}; "b a" is novel
        assert out[14]["total_grams"] == 2 and out[14]["novel_grams"] == 1

    def test_empty_base_is_all_novel(self):
        from peri_ray.stages.text import ngram_novelty

        base = [{"doc_id": 1, "text": None}]
        delta = [{"doc_id": 2, "text": "x y z"}]
        out = ngram_novelty(rd.from_items(base), rd.from_items(delta),
                            n=2).take_all()
        assert len(out) == 1 and out[0]["novelty"] == 1.0


class TestLexicalDiversity:
    def test_ttr(self):
        from peri_ray.stages.text import lexical_diversity

        rows = [{"doc_id": 1, "text": "a b a b a"},
                {"doc_id": 2, "text": "  x  "},
                {"doc_id": 3, "text": None},
                {"doc_id": 4, "text": "p q r"}]
        out = {r["doc_id"]: r for r in lexical_diversity(
            rd.from_items(rows, parallelism=2)).take_all()}
        assert set(out) == {1, 2, 4}
        assert out[1]["n_tokens"] == 5 and out[1]["n_types"] == 2
        assert out[1]["ttr"] == 2.0 / 5.0
        assert out[2]["n_tokens"] == 1 and out[2]["n_types"] == 1
        assert out[4]["ttr"] == 1.0


class TestMutualInformation:
    def test_independent_and_deterministic(self):
        import math

        from peri_ray.stages.stats import (contingency_profile,
                                           mutual_information_stat)

        # independent 2x2: MI == 0
        rows = [{"a": x, "b": y} for x in ("p", "q") for y in ("u", "v")
                for _ in range(10)]
        out = mutual_information_stat(contingency_profile(
            rd.from_items(rows, parallelism=3), "a", "b")).to_pylist()[0]
        assert out["mi"] == 0.0 and out["theil_u"] == 0.0
        # deterministic mapping: MI == H(a), U == 1
        rows = ([{"a": "p", "b": "u"}] * 30) + ([{"a": "q", "b": "v"}] * 10)
        out = mutual_information_stat(contingency_profile(
            rd.from_items(rows, parallelism=3), "a", "b")).to_pylist()[0]
        h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert out["mi"] == round(h, 6) and out["theil_u"] == 1.0

    def test_empty(self):
        from peri_ray.stages.stats import mutual_information_stat

        import pyarrow as _pa
        empty = _pa.table({"val_a": _pa.array([], _pa.string()),
                           "val_b": _pa.array([], _pa.string()),
                           "observed": _pa.array([], _pa.int64()),
                           "expected_num": _pa.array([], _pa.int64()),
                           "n_total": _pa.array([], _pa.int64())})
        out = mutual_information_stat(empty).to_pylist()[0]
        assert out["n"] == 0 and out["mi"] is None


class TestZipfSlope:
    def test_matches_numpy_reference(self):
        import math

        from peri_ray.stages.text import zipf_slope

        # counts 16,8,4,2 over terms a<b<c<d -> ranks 1..4
        rows = [{"doc_id": 1, "text": " ".join(["a"] * 16 + ["b"] * 8)},
                {"doc_id": 2, "text": " ".join(["c"] * 4 + ["d"] * 2)}]
        out = zipf_slope(rd.from_items(rows, parallelism=2),
                         k=10).to_pylist()[0]
        xs = [math.log(r) for r in (1, 2, 3, 4)]
        ys = [math.log(c) for c in (16, 8, 4, 2)]
        n = 4.0
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        ref = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert out["k"] == 4 and out["slope"] == round(ref, 6)

    def test_degenerate_single_term(self):
        from peri_ray.stages.text import zipf_slope

        out = zipf_slope(rd.from_items([{"doc_id": 1, "text": "a a a"}]),
                         k=5).to_pylist()[0]
        assert out["k"] == 1 and out["slope"] is None


class TestMultiQueryRRF:
    def test_fusion_math(self):
        from peri_ray.stages.text import multi_query_rrf

        # doc 1 matches ONLY query A's terms, doc 2 only B's, doc 3 both
        rows = [{"doc_id": 1, "text": "apple apple apple"},
                {"doc_id": 2, "text": "pear pear pear"},
                {"doc_id": 3, "text": "apple pear"},
                {"doc_id": 4, "text": "nothing here"}]
        out = multi_query_rrf(rd.from_items(rows, parallelism=2),
                              [["apple"], ["pear"]], k_each=10,
                              k=10, c=60).to_pylist()
        got = {r["doc_id"]: r for r in out}
        assert set(got) == {1, 2, 3}
        # doc 3 ranks 2nd in both lists (tf 1 vs 3): 2/(60+2)
        assert got[3]["rrf"] == 1.0 / 62.0 + 1.0 / 62.0
        # docs 1 and 2 rank 1st in exactly one list each: tie on rrf,
        # broken by doc_id — 1 before 2
        assert got[1]["rrf"] == got[2]["rrf"] == 1.0 / 61.0
        assert got[1]["rank"] < got[2]["rank"]
        # the both-lists doc wins overall
        assert got[3]["rank"] == 1

    def test_k_truncation(self):
        from peri_ray.stages.text import multi_query_rrf

        rows = [{"doc_id": i, "text": "w " * (i + 1)} for i in range(6)]
        out = multi_query_rrf(rd.from_items(rows), [["w"]], k_each=10,
                              k=3).to_pylist()
        assert len(out) == 3 and [r["rank"] for r in out] == [1, 2, 3]


class TestPeakWindowRate:
    def test_peak_and_count(self):
        from peri_ray.stages.temporal import peak_window_rate

        # user 1: burst of 3 within 5s, then isolated; user 2: steady
        rows = [
            {"event_id": 1, "user_id": 1, "ts": 0},
            {"event_id": 2, "user_id": 1, "ts": 2_000_000},
            {"event_id": 3, "user_id": 1, "ts": 4_000_000},
            {"event_id": 4, "user_id": 1, "ts": 60_000_000},
            {"event_id": 5, "user_id": 2, "ts": 0},
            {"event_id": 6, "user_id": 2, "ts": 30_000_000},
        ]
        out = {r["user_id"]: r for r in peak_window_rate(
            rd.from_items(rows, parallelism=3), window_s=5).take_all()}
        assert out[1]["peak"] == 3 and out[1]["n_events"] == 4
        assert out[2]["peak"] == 1 and out[2]["n_events"] == 2

    def test_count_only_mode_skips_value_filter(self):
        from peri_ray.stages.temporal import time_window_sums

        rows = [{"event_id": 1, "user_id": 1, "ts": 0, "value": None}]
        out = time_window_sums(
            rd.from_items(rows).map_batches(
                lambda t: t.select(["event_id", "user_id", "ts"]),
                batch_format="pyarrow"),
            window_s=5, value_col=None).take_all()
        assert len(out) == 1 and out[0]["win_n"] == 1
        assert "win_sum_micro" not in out[0]


class TestWelchTTwoSample:
    def test_matches_scipy_style_reference(self):
        import math

        from peri_ray.stages.checks import welch_t_two_sample

        rng = __import__("random").Random(3)
        rows = [{"event_id": i,
                 "value": (10.0 if i % 2 == 0 else 12.0)
                 + rng.randrange(-100, 101) / 100.0}
                for i in range(400)]
        out = welch_t_two_sample(
            rd.from_items(rows, parallelism=4), "value",
            split_col="event_id", split_mod=2, scale=100).to_pylist()[0]
        # independent reference from the raw cents
        a = [round(r["value"] * 100) for r in rows if r["event_id"] % 2 == 0]
        b = [round(r["value"] * 100) for r in rows if r["event_id"] % 2 == 1]
        def mv(x):
            n = len(x)
            m = sum(x) / n
            v = sum((xi - m) ** 2 for xi in x) / (n - 1)
            return n, m, v
        na, ma, va = mv(a)
        nb, mb, vb = mv(b)
        se = math.sqrt(va / na + vb / nb)
        assert out["n_a"] == na and out["n_b"] == nb
        assert abs(out["t_stat"] - (ma - mb) / se) < 1e-9 * abs(out["t_stat"])
        assert out["t_stat"] < -10  # the planted 2.0 shift dominates

    def test_degenerate_small_side(self):
        from peri_ray.stages.checks import welch_t_two_sample

        rows = [{"event_id": 0, "value": 1.0},
                {"event_id": 2, "value": 2.0},
                {"event_id": 1, "value": 5.0}]
        out = welch_t_two_sample(rd.from_items(rows), "value",
                                 split_col="event_id",
                                 split_mod=2).to_pylist()[0]
        assert out["n_b"] == 1 and out["t_stat"] is None
        assert out["var_b"] is None and out["mean_b"] == 500.0


class TestDowAnomalies:
    def test_z_against_reference(self):
        import math

        from peri_ray.stages.temporal import dow_anomalies

        # two Mondays (counts 2, 4) + one Sunday (count 3)
        rows = []
        for day, n in [("2026-01-05", 2), ("2026-01-12", 4),
                       ("2026-01-04", 3)]:
            for i in range(n):
                rows.append({"ts": __import__("datetime").datetime
                             .fromisoformat(f"{day}T0{i}:00:00")})
        out = {r["day"]: r for r in dow_anomalies(
            rd.from_items(rows, parallelism=2)).to_pylist()}
        assert out["2026-01-04"]["dow"] == 0   # Sunday (SQL convention)
        assert out["2026-01-05"]["dow"] == 1
        assert out["2026-01-04"]["z"] is None  # single observation
        # Mondays: mean 3, sample sd sqrt(2)
        assert abs(out["2026-01-05"]["z"] + 1 / math.sqrt(2)) < 1e-12
        assert abs(out["2026-01-12"]["z"] - 1 / math.sqrt(2)) < 1e-12


class TestHillTail:
    def test_pareto_alpha(self):
        import math

        from peri_ray.stages.web import hill_tail_estimator

        import pyarrow as _pa
        # exact geometric degrees: d_i = 2^(10-i) -> ln(d_i/d_k) linear
        vals = [2 ** (10 - i) for i in range(10)]
        t = _pa.table({"host": [f"h{i}" for i in range(10)],
                       "in_links": _pa.array(vals, _pa.int64())})
        out = hill_tail_estimator(t, k=10).to_pylist()[0]
        sl = sum(math.log(v / vals[-1]) for v in vals[:-1])
        assert out["k"] == 10 and out["d_k"] == vals[-1]
        assert out["alpha"] == round(9 / sl, 6)

    def test_degenerate_flat(self):
        from peri_ray.stages.web import hill_tail_estimator

        import pyarrow as _pa
        t = _pa.table({"host": ["a", "b", "c"],
                       "in_links": _pa.array([5, 5, 5], _pa.int64())})
        out = hill_tail_estimator(t, k=3).to_pylist()[0]
        assert out["alpha"] is None and out["d_k"] == 5


class TestLinearInterpolate:
    def test_blend_edges_and_ties(self):
        from peri_ray.stages.temporal import linear_interpolate

        rows = [
            # user 1: null at ts=4 between (0, 10.0) and (10, 20.0)
            {"event_id": 1, "user_id": 1, "ts": 0, "v": 10.0},
            {"event_id": 2, "user_id": 1, "ts": 4_000_000, "v": None},
            {"event_id": 3, "user_id": 1, "ts": 10_000_000, "v": 20.0},
            # leading/trailing nulls stay null
            {"event_id": 4, "user_id": 2, "ts": 0, "v": None},
            {"event_id": 5, "user_id": 2, "ts": 1_000_000, "v": 7.0},
            {"event_id": 6, "user_id": 2, "ts": 2_000_000, "v": None},
            # equal neighbor timestamps degenerate to prev
            {"event_id": 7, "user_id": 3, "ts": 5, "v": 1.0},
            {"event_id": 8, "user_id": 3, "ts": 5, "v": None},
            {"event_id": 9, "user_id": 3, "ts": 5, "v": 3.0},
        ]
        out = {r["event_id"]: r["v_filled"] for r in linear_interpolate(
            rd.from_items(rows, parallelism=3)).take_all()}
        assert out[2] == 10.0 + (20.0 - 10.0) * (4.0 / 10.0)
        assert out[4] is None and out[6] is None and out[5] == 7.0
        assert out[8] == 1.0

    def test_cross_user_no_bleed(self):
        from peri_ray.stages.temporal import linear_interpolate

        rows = [{"event_id": 1, "user_id": 1, "ts": 0, "v": 5.0},
                {"event_id": 2, "user_id": 2, "ts": 1, "v": None},
                {"event_id": 3, "user_id": 3, "ts": 2, "v": 9.0}]
        out = {r["event_id"]: r["v_filled"] for r in linear_interpolate(
            rd.from_items(rows)).take_all()}
        assert out[2] is None


class TestBucketedDiskJoin:
    def test_roundtrip_and_mismatch_guard(self, tmp_path):
        import pytest

        from peri_ray.sources import write_bucketed
        from peri_ray.stages.joins import bucketed_disk_join

        a = rd.from_items([{"k": i, "x": i * 10} for i in range(40)],
                          parallelism=4)
        b = rd.from_items([{"k": i, "y": f"v{i}"} for i in range(0, 40, 2)],
                          parallelism=3)
        da = write_bucketed(a, str(tmp_path / "a"), "k", n_buckets=8)
        db = write_bucketed(b, str(tmp_path / "b"), "k", n_buckets=8)
        out = {r["k"]: r for r in bucketed_disk_join(
            da, db, left_cols=["x"], right_cols=["y"]).take_all()}
        assert len(out) == 20
        assert out[6]["x"] == 60 and out[6]["y"] == "v6"
        # mismatched bucket count fails loudly
        dc = write_bucketed(b, str(tmp_path / "c"), "k", n_buckets=4)
        with pytest.raises(ValueError):
            bucketed_disk_join(da, dc)

    def test_empty_intersection(self, tmp_path):
        from peri_ray.sources import write_bucketed
        from peri_ray.stages.joins import bucketed_disk_join

        a = rd.from_items([{"k": 1, "x": 1}])
        b = rd.from_items([{"k": 2, "y": 2}])
        da = write_bucketed(a, str(tmp_path / "a"), "k", n_buckets=8)
        db = write_bucketed(b, str(tmp_path / "b"), "k", n_buckets=8)
        out = bucketed_disk_join(da, db, left_cols=["x"],
                                 right_cols=["y"]).take_all()
        assert out == []


class TestMeanImputationNullGroup:
    def test_all_null_group_stays_null(self):
        # via the query-level composition: group with no observed
        # values has no mean -> stays null (LEFT JOIN semantics)
        import pyarrow as _pa

        from peri_ray.pipelines.queries import mean_imputed_values_events
        import tempfile, os
        import pyarrow.parquet as pq

        td = tempfile.mkdtemp()
        t = _pa.table({
            "event_id": _pa.array([9, 18, 1, 2], _pa.int64()),
            "event_type": _pa.array(["x", "x", "y", "y"]),
            "value": _pa.array([1.0, 2.0, 3.0, 5.0]),
        })
        pq.write_table(t, os.path.join(td, "events.parquet"))
        out = {r["event_id"]: r for r in
               mean_imputed_values_events(td).take_all()}
        # ids 9 and 18 are nulled (both %9==0) and group x has NO
        # observed values -> stay null; group y untouched
        assert out[9]["v_filled"] is None and out[18]["v_filled"] is None
        assert out[1]["v_filled"] == 3.0 and out[2]["v_filled"] == 5.0


class TestJaroWinklerJoin:
    def test_kernel_matches_duckdb_randomized(self):
        import random

        import duckdb

        from peri_ray.stages.dedup import jaro_winkler

        con = duckdb.connect()
        rng = random.Random(11)
        for _ in range(800):
            n1, n2 = rng.randint(0, 14), rng.randint(0, 14)
            a = "".join(rng.choice("abcde ") for _ in range(n1))
            b = "".join(rng.choice("abcde ") for _ in range(n2))
            d = con.execute("select jaro_winkler_similarity(?, ?)",
                            [a, b]).fetchone()[0]
            assert jaro_winkler(a, b) == pytest.approx(d, abs=1e-12), \
                (a, b)

    def test_join_finds_planted_typos_exactly(self):
        from peri_ray.stages.dedup import jaro_winkler, jaro_winkler_join

        names = ["jonathan archer", "jonathon archer",   # 1-char swap
                 "kathryn janeway", "kathryn janewai",   # tail typo
                 "benjamin sisko", "xqz vw"]             # unrelated
        ids = list(range(len(names)))
        t = pa.table({"id": pa.array(ids, pa.int64()),
                      "name": pa.array(names, pa.string())})
        thr = 0.871234567
        want = {(i, j) for i in ids for j in ids if i < j
                and jaro_winkler(names[i], names[j]) >= thr}
        got = {(r["id_a"], r["id_b"]) for r in jaro_winkler_join(
            rd.from_arrow(t).repartition(3), "name", "id",
            threshold=thr, n_buckets=4).take_all()}
        assert got == want
        assert (0, 1) in got and (2, 3) in got
        assert not any(5 in p for p in got)

    def test_threshold_guard(self):
        from peri_ray.stages.dedup import jaro_winkler_join

        t = pa.table({"id": pa.array([1], pa.int64()),
                      "name": pa.array(["x"], pa.string())})
        with pytest.raises(ValueError, match="0.82"):
            jaro_winkler_join(rd.from_arrow(t), "name", "id",
                              threshold=0.8)

    def test_nulls_and_empties_excluded(self):
        from peri_ray.stages.dedup import jaro_winkler_join

        t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                      "name": pa.array(["same name", "same name",
                                        None, ""], pa.string())})
        got = {(r["id_a"], r["id_b"]) for r in jaro_winkler_join(
            rd.from_arrow(t), "name", "id", n_buckets=2).take_all()}
        assert got == {(1, 2)}


class TestSkyline:
    def _brute(self, m):
        import numpy as np

        n = len(m)
        keep = set()
        for i in range(n):
            if not any(j != i and np.all(m[j] >= m[i])
                       and np.any(m[j] > m[i]) for j in range(n)):
                keep.add(i)
        return keep

    def test_kernel_matches_brute_force(self):
        import numpy as np

        from peri_ray.stages.stats import skyline_indices

        rng = np.random.default_rng(13)
        for _ in range(60):
            n = int(rng.integers(1, 50))
            d = int(rng.integers(1, 4))
            m = rng.integers(0, 5, size=(n, d)).astype(float)
            got = set(skyline_indices(m).tolist())
            assert got == self._brute(m)

    def test_max_skyline_guard(self):
        import numpy as np
        import pytest

        from peri_ray.stages.stats import skyline_indices

        # perfectly anti-correlated: every point is on the frontier
        n = 50
        m = np.column_stack([np.arange(n), -np.arange(n)]).astype(float)
        with pytest.raises(ValueError, match="max_skyline"):
            skyline_indices(m, max_skyline=10)

    def test_distributed_matches_brute_incl_min_and_nulls(self):
        import numpy as np

        from peri_ray.stages.stats import skyline

        rng = np.random.default_rng(29)
        n = 400
        a = rng.integers(0, 40, n).astype(float)
        b = rng.integers(0, 40, n).astype(float)
        a[::37] = np.nan  # -> null criterion rows excluded
        t = pa.table({"id": pa.array(range(n), pa.int64()),
                      "a": pa.array(a, pa.float64(), from_pandas=True),
                      "b": pa.array(b, pa.float64(), from_pandas=True)})
        got = skyline(rd.from_arrow(t).repartition(7),
                      {"a": "max", "b": "min"}, ["id"])
        valid = [i for i in range(n) if not np.isnan(a[i])]
        m = {i: np.array([a[i], -b[i]]) for i in valid}
        want = {i for i in valid
                if not any(j != i and np.all(m[j] >= m[i])
                           and np.any(m[j] > m[i]) for j in valid)}
        assert set(got.column("id").to_pylist()) == want
        assert sorted(got.column_names) == ["a", "b", "id"]

    def test_equal_rows_all_survive(self):
        from peri_ray.stages.stats import skyline

        t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                      "x": pa.array([5.0, 5.0, 1.0], pa.float64())})
        got = skyline(rd.from_arrow(t).repartition(2), {"x": "max"}, ["id"])
        assert sorted(got.column("id").to_pylist()) == [1, 2]


class TestGreedyCoverage:
    def _brute(self, texts, k):
        """Reference greedy over exact gram STRING sets."""
        grams = {}
        for i, s in enumerate(texts):
            if s is None:
                continue
            ws = s.strip().split()
            gs = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
            if gs:
                grams[i] = gs
        covered: set = set()
        chosen: list = []
        for step in range(1, k + 1):
            cand = [(len(g - covered), -i) for i, g in grams.items()
                    if i not in {c[1] for c in chosen}]
            if not cand:
                break
            gain, negi = max(cand)
            chosen.append((step, -negi, gain))
            covered |= grams[-negi]
        return chosen

    def test_matches_reference_greedy(self):
        import numpy as np

        from peri_ray.stages.text import greedy_coverage_select

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(12)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 9)))
                 or None for _ in range(80)]
        texts[5] = None           # null text never eligible
        texts[6] = "solo"         # 1 token -> no bigram, never eligible
        t = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        got = greedy_coverage_select(
            rd.from_arrow(t).repartition(5), k=6, n=2)
        rows = list(zip(got.column("step").to_pylist(),
                        got.column("doc_id").to_pylist(),
                        got.column("gain").to_pylist()))
        assert rows == self._brute(texts, 6)
        assert all(r[1] not in (5, 6) for r in rows)

    def test_layout_invariant(self):
        import numpy as np

        from peri_ray.stages.text import greedy_coverage_select

        rng = np.random.default_rng(3)
        vocab = [f"t{i}" for i in range(8)]
        texts = [" ".join(rng.choice(vocab, size=6)) for _ in range(50)]
        t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        a = greedy_coverage_select(rd.from_arrow(t), k=3, n=2)
        b = greedy_coverage_select(rd.from_arrow(t).repartition(9),
                                   k=3, n=2)
        assert a.to_pylist() == b.to_pylist()

    def test_fewer_eligible_than_k_stops(self):
        from peri_ray.stages.text import greedy_coverage_select

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a b c", "a b"], pa.string())})
        got = greedy_coverage_select(rd.from_arrow(t), k=5, n=2)
        assert got.num_rows == 2
        assert got.column("step").to_pylist() == [1, 2]
        # second pick's grams are fully covered -> gain 0, still chosen
        assert got.column("gain").to_pylist() == [2, 0]


class TestJoinCardinality:
    def test_matches_brute_force_incl_skew_and_nulls(self):
        import numpy as np

        from peri_ray.stages.joins import join_cardinality

        rng = np.random.default_rng(17)
        lk = rng.integers(0, 12, 300).astype(object)
        rk = rng.integers(5, 20, 200).astype(object)
        lk[::23] = None      # null keys never join, never counted
        rk[::17] = None
        lk[:60] = 7          # planted hot key
        lt = pa.table({"a": pa.array(list(lk), pa.int64())})
        rt = pa.table({"b": pa.array(list(rk), pa.int64())})
        got = join_cardinality(rd.from_arrow(lt).repartition(5),
                               rd.from_arrow(rt).repartition(3),
                               "a", "b", n_buckets=8).to_pylist()[0]
        from collections import Counter
        cl = Counter(k for k in lk if k is not None)
        cr = Counter(k for k in rk if k is not None)
        prods = {k: cl[k] * cr[k] for k in cl if k in cr}
        assert got["left_keys"] == len(cl)
        assert got["right_keys"] == len(cr)
        assert got["common_keys"] == len(prods)
        assert got["join_rows"] == sum(prods.values())
        assert got["max_key_rows"] == max(prods.values())
        # the probe must predict the real join size exactly
        from peri_ray.stages.joins import hash_join
        joined = hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                           "a", "b", [], [], how="inner")
        assert joined.count() == got["join_rows"]

    def test_disjoint_sides(self):
        from peri_ray.stages.joins import join_cardinality

        lt = pa.table({"a": pa.array([1, 2], pa.int64())})
        rt = pa.table({"b": pa.array([3, 4, 4], pa.int64())})
        got = join_cardinality(rd.from_arrow(lt), rd.from_arrow(rt),
                               "a", "b").to_pylist()[0]
        assert got == {"left_keys": 2, "right_keys": 2,
                       "common_keys": 0, "join_rows": 0,
                       "max_key_rows": 0}


class TestTermCooccurrence:
    def test_matches_brute_force(self):
        from collections import Counter
        from itertools import combinations

        from peri_ray.stages.text import term_cooccurrence

        texts = ["a b c", "b c d", "a  b", "c", None, "", "d d d b"]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        want = Counter()
        total = sum(s is not None for s in texts)
        for s in texts:
            if s is None:
                continue
            terms = sorted(set(s.strip().split()) or {""})
            # the tokenizer twin yields [''] for empty text
            if not s.strip():
                terms = [""]
            for a, b in combinations(terms, 2):
                want[(a, b)] += 1
        support = int(0.375 * total)
        want = {k: v for k, v in want.items() if v >= support}
        got = {(r["term_a"], r["term_b"]): r["n_docs"]
               for r in term_cooccurrence(
                   rd.from_arrow(t).repartition(3),
                   min_frac=0.375).take_all()}
        assert got == want

    def test_pair_construction_no_self_pairs(self):
        from peri_ray.stages.text import term_cooccurrence

        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["x x x y"], pa.string())})
        got = term_cooccurrence(rd.from_arrow(t),
                                min_frac=0.0).take_all()
        assert got == [{"term_a": "x", "term_b": "y", "n_docs": 1}]


class TestBinnedCompaction:
    def test_plan_first_fit_decreasing(self):
        from peri_ray.sources import plan_compaction

        sizes = {"a": 60, "b": 40, "c": 35, "d": 30, "e": 150, "f": 5}
        bins = plan_compaction(sizes, target_bytes=100)
        # oversize file isolated; everything else packs under target
        assert ["e"] in bins
        tot = lambda b: sum(sizes[n] for n in b)  # noqa: E731
        assert all(tot(b) <= 100 for b in bins if b != ["e"])
        assert sorted(n for b in bins for n in b) == sorted(sizes)
        assert bins == plan_compaction(dict(reversed(sizes.items())), 100)

    def test_compact_roundtrip_and_resume(self, tmp_path):
        import json
        import os

        import pyarrow.parquet as pq

        from peri_ray.sources import compact_parquet_binned

        src = tmp_path / "in"
        out = tmp_path / "out"
        src.mkdir()
        rows = []
        for i in range(6):
            n = 50 * (i + 1)
            t = pa.table({"id": pa.array(range(i * 1000, i * 1000 + n),
                                         pa.int64()),
                          "v": pa.array([f"s{j}" for j in range(n)],
                                        pa.string())})
            pq.write_table(t, src / f"f{i}.parquet")
            rows += t.column("id").to_pylist()
        rep = compact_parquet_binned(str(src), str(out),
                                     target_bytes=6000)
        assert rep["files_in"] == 6
        assert rep["rows"] == len(rows)
        outs = sorted(os.listdir(out))
        assert len(outs) == rep["files_out"] < 6
        got = []
        for f in outs:
            got += pq.read_table(out / f).column("id").to_pylist()
        assert sorted(got) == sorted(rows)
        man = json.load(open(str(out) + ".compaction.json"))
        assert sum(len(b["sources"]) for b in man["bins"].values()) == 6

        # rerun: identical plan -> every bin skipped, outputs untouched
        mtimes = {f: os.path.getmtime(out / f) for f in outs}
        rep2 = compact_parquet_binned(str(src), str(out),
                                      target_bytes=6000)
        assert rep2["skipped"] == rep2["files_out"] == rep["files_out"]
        assert rep2["rows"] == rep["rows"]
        assert {f: os.path.getmtime(out / f) for f in outs} == mtimes

        # delete one shard -> only that bin is rebuilt
        os.remove(out / outs[0])
        rep3 = compact_parquet_binned(str(src), str(out),
                                      target_bytes=6000)
        assert rep3["skipped"] == rep["files_out"] - 1
        got3 = []
        for f in sorted(os.listdir(out)):
            got3 += pq.read_table(out / f).column("id").to_pylist()
        assert sorted(got3) == sorted(rows)


class TestLOF:
    def _ref_lof(self, vecs, ids, k):
        """Reference LOF over rounded cosine distances (same chain)."""
        import numpy as np

        u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = np.round(u @ u.T, 6)
        n = len(ids)
        nbrs = {}
        for i in range(n):
            order = sorted((j for j in range(n) if j != i),
                           key=lambda j: (-cos[i, j], ids[j]))[:k]
            nbrs[i] = order
        kdist = {i: 1.0 - min(cos[i, j] for j in nbrs[i]) for i in nbrs}
        lrd = {i: k / sum(max(kdist[j], 1.0 - cos[i, j])
                          for j in nbrs[i]) for i in nbrs}
        return {ids[i]: round(sum(lrd[j] for j in nbrs[i]) / (k * lrd[i]),
                              6) for i in nbrs}

    def test_matches_reference_and_flags_planted_outlier(self):
        import numpy as np

        from peri_ray.stages.similarity import lof_scores

        rng = np.random.default_rng(41)
        base = rng.normal(0, 1, 8)
        cluster = base + rng.normal(0, 0.05, size=(30, 8))
        outlier = -base.reshape(1, 8)      # opposite direction
        vecs = np.vstack([cluster, outlier])
        ids = list(range(31))
        t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array(
                          [list(map(float, v)) for v in vecs],
                          pa.list_(pa.float64()))})
        got = {r["vec_id"]: r["lof"] for r in lof_scores(
            rd.from_arrow(t).repartition(4), k=5).take_all()}
        want = self._ref_lof(vecs, ids, 5)
        assert set(got) == set(want)
        for i in got:
            assert abs(got[i] - want[i]) <= 2e-6, (i, got[i], want[i])
        # the planted opposite-direction point is the clear max
        assert max(got, key=got.get) == 30
        assert got[30] > 2.0
        assert np.median([v for i, v in got.items() if i != 30]) < 1.5


class TestHapaxRate:
    def test_counts_and_single_division(self):
        from peri_ray.stages.text import hapax_rate

        texts = ["a b c a b c", "a b c d e", None, "x"]
        # trigrams: "a b c"x2(doc0) +1(doc1)=3, "b c a", "c a b",
        # "b c d", "c d e"; doc3 too short
        t = pa.table({"text": pa.array(texts, pa.string())})
        got = hapax_rate(rd.from_arrow(t).repartition(2),
                         n=3).to_pylist()[0]
        assert got["n_types"] == 5
        assert got["n_hapax"] == 4
        assert got["hapax_rate"] == 4.0 / 5.0

    def test_empty_corpus(self):
        from peri_ray.stages.text import hapax_rate

        t = pa.table({"text": pa.array([None, "one two"], pa.string())})
        got = hapax_rate(rd.from_arrow(t), n=3).to_pylist()[0]
        assert got == {"n_types": 0, "n_hapax": 0, "hapax_rate": None}


class TestMMRRerank:
    def test_diversity_displaces_redundant_candidate(self):
        from peri_ray.stages.text import mmr_rerank

        # docs 1/2 exact duplicates (jaccard 1.0), both top-relevant;
        # at lam=0.2 the diversity penalty displaces the duplicate, so
        # step 2 must take the diverse doc 3 instead of doc 2
        texts = {
            1: "spark window merge spark window merge",
            2: "spark window merge spark window merge",
            3: "spark alpha beta gamma delta",
            4: "unrelated words entirely here",
        }
        t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                      "text": pa.array(list(texts.values()),
                                       pa.string())})
        got = mmr_rerank(rd.from_arrow(t).repartition(2),
                         ["spark", "window", "merge"],
                         k_candidates=4, k_select=3, lam=0.2)
        ids = got.column("doc_id").to_pylist()
        assert got.column("step").to_pylist() == [1, 2, 3]
        assert ids[0] == 1               # most relevant, tie -> min id
        assert ids[1] == 3               # diversity beats the duplicate
        # at lam=1.0 (pure relevance) the duplicate wins step 2 instead
        pure = mmr_rerank(rd.from_arrow(t), ["spark", "window", "merge"],
                          k_candidates=4, k_select=2, lam=1.0)
        assert pure.column("doc_id").to_pylist()[1] == 2

    def test_fewer_candidates_than_k_select(self):
        from peri_ray.stages.text import mmr_rerank

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["spark a", "nothing"],
                                       pa.string())})
        got = mmr_rerank(rd.from_arrow(t), ["spark"],
                         k_candidates=5, k_select=4)
        assert got.num_rows == 1          # only one scoring candidate
        assert got.column("doc_id").to_pylist() == [1]


class TestEvolvedReader:
    def test_union_by_name_pad_and_promote(self, tmp_path):
        import pyarrow.parquet as pq

        from peri_ray.sources import read_table_evolved

        a = tmp_path / "a.parquet"
        b = tmp_path / "b.parquet"
        c = tmp_path / "c.parquet"
        pq.write_table(pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "v": pa.array([1.5, 2.5], pa.float32())}), a)
        pq.write_table(pa.table({
            "id": pa.array([3], pa.int64()),
            "w": pa.array(["x"], pa.string())}), b)
        pq.write_table(pa.table({
            "id": pa.array([4], pa.int64()),
            "v": pa.array([4.0], pa.float64()),
            "w": pa.array(["y"], pa.string())}), c)
        ds = read_table_evolved([str(a), str(b), str(c)])
        t = pa.Table.from_pylist(ds.take_all())
        rows = sorted(t.to_pylist(), key=lambda r: r["id"])
        assert rows == [
            {"id": 1, "v": 1.5, "w": None},
            {"id": 2, "v": 2.5, "w": None},
            {"id": 3, "v": None, "w": "x"},
            {"id": 4, "v": 4.0, "w": "y"},
        ]
        sch = {f.name: f.type for f in read_table_evolved(
            [str(a), str(b), str(c)]).schema().base_schema}
        assert sch["id"] == pa.int64() and sch["v"] == pa.float64()

    def test_column_pruning_and_explicit_target(self, tmp_path):
        import pyarrow.parquet as pq

        from peri_ray.sources import read_table_evolved

        a = tmp_path / "a.parquet"
        pq.write_table(pa.table({"id": pa.array([1], pa.int32()),
                                 "v": pa.array([2], pa.int64())}), a)
        ds = read_table_evolved([str(a)], columns=["id"])
        assert ds.take_all() == [{"id": 1}]
        tgt = pa.schema([("id", pa.int64()), ("z", pa.string())])
        ds2 = read_table_evolved([str(a)], target_schema=tgt)
        assert ds2.take_all() == [{"id": 1, "z": None}]

    def test_incompatible_dtypes_raise_at_plan_time(self, tmp_path):
        import pyarrow.parquet as pq
        import pytest

        from peri_ray.sources import read_table_evolved

        a = tmp_path / "a.parquet"
        b = tmp_path / "b.parquet"
        pq.write_table(pa.table({"v": pa.array([1], pa.int64())}), a)
        pq.write_table(pa.table({"v": pa.array(["s"], pa.string())}), b)
        with pytest.raises(Exception):
            read_table_evolved([str(a), str(b)])


class TestWeightedQuantiles:
    def test_matches_brute_force_weighted_disc(self):
        import numpy as np

        from peri_ray.stages.stats import weighted_quantiles

        rng = np.random.default_rng(23)
        v = rng.integers(0, 50, 500)
        w = rng.integers(0, 9, 500)
        t = pa.table({"v": pa.array(v, pa.int64()),
                      "w": pa.array(w, pa.int64())})
        got = weighted_quantiles(rd.from_arrow(t).repartition(6),
                                 "v", "w", qs_eighths=(1, 4, 6))
        order = np.argsort(v, kind="stable")
        sv, sw = v[order], w[order]
        cum = np.cumsum(sw)
        tot = cum[-1]
        for q, val in zip(got.column("q").to_pylist(),
                          got.column("v").to_pylist()):
            n = int(round(q * 8))
            idx = int(np.searchsorted(8 * cum, n * tot, side="left"))
            assert val == sv[idx]

    def test_weight_concentration_moves_the_median(self):
        from peri_ray.stages.stats import weighted_quantiles

        # 9 rows of value 1 with weight 1; 1 row of value 100 with
        # weight 91 -> weighted median is 100, unweighted would be 1
        t = pa.table({"v": pa.array([1] * 9 + [100], pa.int64()),
                      "w": pa.array([1] * 9 + [91], pa.int64())})
        got = weighted_quantiles(rd.from_arrow(t), "v", "w",
                                 qs_eighths=(4,))
        assert got.to_pylist() == [{"q": 0.5, "v": 100}]

    def test_distinct_cap_raises(self):
        import pytest

        from peri_ray.stages.stats import weighted_quantiles

        t = pa.table({"v": pa.array(range(100), pa.int64()),
                      "w": pa.array([1] * 100, pa.int64())})
        with pytest.raises(ValueError, match="max_distinct"):
            weighted_quantiles(rd.from_arrow(t), "v", "w",
                               max_distinct=10)


class TestSourceAblation:
    def test_dependent_source_raises_target_nll(self):
        from peri_ray.stages.text import source_ablation_nll

        # target docs (id % 17 == 0 -> ids 0, 17) speak "rare" words
        # that only srcA provides elsewhere; ablating srcA must yield
        # the max NLL
        rows = [
            (0, "srcA", "rare words rare words"),    # target
            (17, "srcB", "rare words common stuff"),  # target
            (1, "srcA", "rare words rare rare"),
            (2, "srcB", "common stuff common stuff"),
            (3, "srcC", "common stuff things"),
        ]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string())})
        got = {r["source"]: r["nll_micro"]
               for r in source_ablation_nll(
                   rd.from_arrow(t).repartition(2)).to_pylist()}
        assert set(got) == {"srcA", "srcB", "srcC"}
        assert got["srcA"] == max(got.values())

    def test_matches_reference_formula(self):
        import math
        from collections import Counter

        from peri_ray.stages.text import source_ablation_nll

        import numpy as np
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(9)]
        rows = [(i, f"s{i % 3}",
                 " ".join(rng.choice(vocab, size=6))) for i in range(40)]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string())})
        got = {r["source"]: r["nll_micro"]
               for r in source_ablation_nll(
                   rd.from_arrow(t).repartition(3)).to_pylist()}
        cnt, scnt, tcnt = Counter(), Counter(), Counter()
        for i, s, txt in rows:
            for w in txt.split():
                cnt[w] += 1
                scnt[(s, w)] += 1
                if i % 17 == 0:
                    tcnt[w] += 1
        v, tot = len(cnt), sum(cnt.values())
        for s in {r[1] for r in rows}:
            ts = sum(c for (s2, _), c in scnt.items() if s2 == s)
            want = -sum(c * int(round(1e6 * math.log(
                float(cnt[w] - scnt.get((s, w), 0) + 1)
                / float(tot - ts + v)))) for w, c in tcnt.items())
            assert got[s] == want


class TestMonotonicViolations:
    def _mk(self, rows):
        return pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "o": pa.array([r[1] for r in rows], pa.int64()),
            "id": pa.array(range(len(rows)), pa.int64()),
            "v": pa.array([r[2] for r in rows], pa.float64())})

    def test_counts_and_null_steps(self):
        from peri_ray.stages.temporal import monotonic_violations

        rows = [
            (1, 0, 1.0), (1, 1, 2.0), (1, 2, 1.5),   # one decrease
            (2, 0, 1.0), (2, 1, None), (2, 2, 0.5),  # null not comparable
            (3, 0, 5.0), (3, 1, 5.0), (3, 2, 6.0),   # clean (non-strict)
        ]
        got = {r["k"]: (r["n_steps"], r["n_decreases"])
               for r in monotonic_violations(
                   rd.from_arrow(self._mk(rows)).repartition(3),
                   "k", ["o", "id"], "v").take_all()}
        assert got == {1: (2, 1)}   # key 2: no comparable decrease;
        # key 3: equal step allowed when strict=False

    def test_strict_counts_equal_steps(self):
        from peri_ray.stages.temporal import monotonic_violations

        rows = [(3, 0, 5.0), (3, 1, 5.0), (3, 2, 6.0)]
        got = monotonic_violations(rd.from_arrow(self._mk(rows)),
                                   "k", ["o", "id"], "v",
                                   strict=True).take_all()
        assert got == [{"k": 3, "n_steps": 2, "n_decreases": 1}]

    def test_order_independence_of_input_layout(self):
        import numpy as np

        from peri_ray.stages.temporal import monotonic_violations

        rng = np.random.default_rng(9)
        rows = [(int(rng.integers(0, 12)), int(rng.integers(0, 50)),
                 float(rng.integers(0, 100))) for _ in range(300)]
        a = monotonic_violations(rd.from_arrow(self._mk(rows)),
                                 "k", ["o", "id"], "v").take_all()
        shuf = [rows[i] for i in rng.permutation(len(rows))]
        # ids must travel with their rows for identical (o, id) order
        t = pa.table({
            "k": pa.array([r[0] for r in shuf], pa.int64()),
            "o": pa.array([r[1] for r in shuf], pa.int64()),
            "id": pa.array([rows.index(r) for r in shuf], pa.int64()),
            "v": pa.array([r[2] for r in shuf], pa.float64())})
        b = monotonic_violations(rd.from_arrow(t).repartition(7),
                                 "k", ["o", "id"], "v").take_all()
        key = lambda r: r["k"]  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)


class TestMutationRobustness:
    def test_report_structure_and_monotone_decline(self):
        from peri_ray.pipelines.queries import dedup_mutation_robustness

        got = dedup_mutation_robustness(
            "/root/testdata/sf0.001").to_pylist()
        assert [r["rate_pct"] for r in got] == [0, 4, 10, 20]
        assert all(r["planted"] > 0 for r in got)
        by_rate = {r["rate_pct"]: r for r in got}
        # undamaged copies are exact duplicates -> perfect recall
        assert by_rate[0]["recall"] == 1.0
        # recall never recovers as damage grows
        rec = [r["recall"] for r in got]
        assert all(a >= b for a, b in zip(rec, rec[1:]))
        assert all(r["found"] <= r["planted"] for r in got)


class TestOrphanHosts:
    def test_planted_orphan_half_recovered(self):
        from peri_ray.pipelines.queries import orphan_hosts_docs

        got = orphan_hosts_docs("/root/testdata/sf0.001").take_all()
        hosts = {r["host"] for r in got}
        # clustered fixture links only into h0..h24 — the odd half
        # h25..h49 is exactly the orphan set
        assert hosts == {f"h{i}.example.com" for i in range(25, 50)}
        assert all(r["n_pages"] > 0 for r in got)


class TestBinnedCompactionReplan:
    def test_replan_removes_orphan_shards_and_tmps(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        from peri_ray.sources import compact_parquet_binned

        src = tmp_path / "in"
        out = tmp_path / "out"
        src.mkdir()
        rows = []
        for i in range(5):
            t = pa.table({"id": pa.array(
                range(i * 100, i * 100 + 80), pa.int64())})
            pq.write_table(t, src / f"f{i}.parquet")
            rows += t.column("id").to_pylist()
        rep1 = compact_parquet_binned(str(src), str(out),
                                      target_bytes=1500)
        assert rep1["files_out"] > 1
        # simulate a crashed task leftover
        (out / "part-99999.parquet.tmp").write_bytes(b"junk")
        # re-plan with a huge target -> 1 bin; orphans must vanish
        rep2 = compact_parquet_binned(str(src), str(out),
                                      target_bytes=1 << 30)
        assert rep2["files_out"] == 1
        files = sorted(os.listdir(out))
        assert files == ["part-00000.parquet"]
        got = pq.read_table(out / files[0]).column("id").to_pylist()
        assert sorted(got) == sorted(rows)   # no duplicated rows


class TestTVHellinger:
    def test_matches_closed_form(self):
        from peri_ray.stages.checks import tv_hellinger_drift

        # side 0 (even ids): a,a,b ; side 1 (odd ids): a,b,b,c
        t = pa.table({
            "id": pa.array([0, 2, 4, 1, 3, 5, 7], pa.int64()),
            "k": pa.array(["a", "a", "b", "a", "b", "b", "c"],
                          pa.string())})
        got = tv_hellinger_drift(rd.from_arrow(t).repartition(3),
                                 "k", "id").to_pylist()[0]
        import math
        pa_, pb_ = {"a": 2 / 3, "b": 1 / 3, "c": 0.0}, \
            {"a": 1 / 4, "b": 2 / 4, "c": 1 / 4}
        tv = 0.5 * sum(abs(pa_[k] - pb_[k]) for k in "abc")
        bc = sum(math.sqrt(pa_[k] * pb_[k]) for k in "abc")
        assert abs(got["tv"] - tv) < 1e-12
        assert abs(got["hellinger"]
                   - round(math.sqrt(1 - bc), 6)) <= 1e-6

    def test_identical_distributions_zero(self):
        from peri_ray.stages.checks import tv_hellinger_drift

        t = pa.table({"id": pa.array(range(8), pa.int64()),
                      "k": pa.array(list("aabb" * 2), pa.string())})
        got = tv_hellinger_drift(rd.from_arrow(t), "k",
                                 "id").to_pylist()[0]
        assert got["tv"] == 0.0 and got["hellinger"] == 0.0


class TestWaterfill:
    def test_closed_cases_and_invariants(self):
        import numpy as np

        from peri_ray.stages.stats import waterfill_allocation

        assert waterfill_allocation({"a": 2, "b": 100}, 10) == \
            {"a": 2, "b": 8}
        assert waterfill_allocation({"a": 5, "b": 7, "c": 100}, 18) == \
            {"a": 5, "b": 6, "c": 6}
        # under-budget: everyone keeps everything
        assert waterfill_allocation({"a": 3, "b": 4}, 100) == \
            {"a": 3, "b": 4}
        rng = np.random.default_rng(7)
        for _ in range(200):
            k = int(rng.integers(1, 10))
            counts = {f"s{i}": int(rng.integers(0, 200))
                      for i in range(k)}
            b = int(rng.integers(0, 600))
            alloc = waterfill_allocation(counts, b)
            assert set(alloc) == set(counts)
            assert all(0 <= alloc[s] <= counts[s] for s in counts)
            used = sum(alloc.values())
            assert used <= max(b, 0) or sum(counts.values()) <= b
            # maximality: no uncapped source could take one more token
            if sum(counts.values()) > b:
                cap = max(alloc.values(), default=0)
                assert sum(min(n, cap + 1)
                           for n in counts.values()) > b or \
                    all(alloc[s] == counts[s] for s in counts)

    def test_distributed_allocation_matches_driver(self):
        from peri_ray.stages.stats import (budget_allocation,
                                           waterfill_allocation)

        texts = {"sA": "one two three four", "sB": "a b",
                 "sC": "x " * 20}
        rows = [(s, texts[s]) for s in texts for _ in range(3)]
        t = pa.table({"source": pa.array([r[0] for r in rows]),
                      "text": pa.array([r[1] for r in rows])})
        got = budget_allocation(rd.from_arrow(t).repartition(3), 1, 2)
        counts = {r["source"]: r["n_tokens"] for r in got.to_pylist()}
        want = waterfill_allocation(counts,
                                    sum(counts.values()) * 1 // 2)
        assert {r["source"]: r["alloc"]
                for r in got.to_pylist()} == want


class TestReferenceEditMatches:
    def test_matches_and_counts(self):
        from peri_ray.stages.dedup import reference_edit_matches

        vals = ["brand.com", "brand.com", "brandx.com", "brnd.com",
                "other.org", None, "grand.com"]
        t = pa.table({"host": pa.array(vals, pa.string())})
        got = {(r["host"], r["ref"]): (r["dist"], r["n_pages"])
               for r in reference_edit_matches(
                   rd.from_arrow(t).repartition(3), "host",
                   ["brand.com"]).take_all()}
        assert got == {
            ("brand.com", "brand.com"): (0, 2),
            ("brandx.com", "brand.com"): (1, 1),   # one insertion
            ("brnd.com", "brand.com"): (1, 1),     # one deletion
            ("grand.com", "brand.com"): (1, 1),    # one substitution
        }

    def test_max_dist_two_reports_minimal_distance(self):
        from peri_ray.stages.dedup import reference_edit_matches

        t = pa.table({"host": pa.array(["brzzd.com"], pa.string())})
        got = reference_edit_matches(rd.from_arrow(t), "host",
                                     ["brand.com"],
                                     max_dist=2).take_all()
        assert got == [{"host": "brzzd.com", "ref": "brand.com",
                        "dist": 2, "n_pages": 1}]


class TestGroupedSkyline:
    def test_matches_per_group_brute_force(self):
        import numpy as np

        from peri_ray.stages.stats import grouped_skyline

        rng = np.random.default_rng(31)
        n = 300
        g = rng.integers(0, 4, n)
        a = rng.integers(0, 25, n).astype(float)
        b = rng.integers(0, 25, n).astype(float)
        t = pa.table({"g": pa.array(g, pa.int64()),
                      "id": pa.array(range(n), pa.int64()),
                      "a": pa.array(a, pa.float64()),
                      "b": pa.array(b, pa.float64())})
        got = {(r["g"], r["id"]) for r in grouped_skyline(
            rd.from_arrow(t).repartition(6), "g",
            {"a": "max", "b": "max"}, ["id"]).take_all()}
        want = set()
        for i in range(n):
            dom = any(g[j] == g[i] and a[j] >= a[i] and b[j] >= b[i]
                      and (a[j] > a[i] or b[j] > b[i])
                      for j in range(n) if j != i)
            if not dom:
                want.add((int(g[i]), i))
        assert got == want


class TestVocabGrowth:
    def test_first_seen_fractions(self):
        import datetime as dt

        from peri_ray.stages.text import vocab_growth

        rows = [
            ("2024-01-05", "a b"),
            ("2024-01-20", "b c"),
            ("2024-02-10", "b d"),    # b old, d new
            ("2024-03-01", "a e f"),  # a old, e f new
        ]
        t = pa.table({
            "warc_ts": pa.array(
                [dt.datetime.fromisoformat(r[0]) for r in rows],
                pa.timestamp("us")),
            "text": pa.array([r[1] for r in rows], pa.string())})
        got = {r["month"]: r for r in vocab_growth(
            rd.from_arrow(t).repartition(2)).to_pylist()}
        assert got["2024-01"] == {"month": "2024-01", "n_terms": 3,
                                  "n_new": 3, "new_frac": 1.0}
        assert got["2024-02"] == {"month": "2024-02", "n_terms": 2,
                                  "n_new": 1, "new_frac": 0.5}
        assert got["2024-03"]["n_new"] == 2
        assert got["2024-03"]["n_terms"] == 3


class TestDistinctiveTerms:
    def test_planted_slice_vocabulary_surfaces(self):
        from peri_ray.stages.text import distinctive_terms

        rows = (
            [("sA", "quantum flux quantum widget")] * 5
            + [("sB", "common words common widget")] * 5
            + [("sC", "common words common stuff")] * 5)
        t = pa.table({"source": pa.array([r[0] for r in rows]),
                      "text": pa.array([r[1] for r in rows])})
        got = distinctive_terms(rd.from_arrow(t).repartition(3),
                                k=2).to_pylist()
        top = {r["source"]: r["term"] for r in got if r["rank"] == 1}
        # 'quantum' is exclusive to sA and twice as frequent there
        assert top["sA"] == "quantum"
        assert all(r["score_micro"] == int(r["score_micro"])
                   for r in got)
        assert {r["rank"] for r in got} == {1, 2}


class TestSyndicationMatrix:
    def test_shared_openings_counted_distinct(self):
        from peri_ray.stages.text import syndication_matrix

        rows = [
            ("sA", "the quick brown fox jumps high"),
            ("sA", "the quick brown fox jumps again"),   # same opening
            ("sB", "the quick brown fox jumps far"),
            ("sC", "the quick brown fox jumps too"),
            ("sB", "something else entirely here now"),
            ("sC", "short doc"),                         # < 5 tokens
        ]
        t = pa.table({"source": pa.array([r[0] for r in rows]),
                      "text": pa.array([r[1] for r in rows])})
        got = {(r["src_a"], r["src_b"]): r["n_shared"]
               for r in syndication_matrix(
                   rd.from_arrow(t).repartition(3), n=5).take_all()}
        # one distinct shared opening across each source pair
        assert got == {("sA", "sB"): 1, ("sA", "sC"): 1,
                       ("sB", "sC"): 1}

    def test_degenerate_boilerplate_raises(self):
        import pytest

        from peri_ray.stages.text import syndication_matrix

        rows = [(f"s{i}", "common opening words here now")
                for i in range(10)]
        t = pa.table({"source": pa.array([r[0] for r in rows]),
                      "text": pa.array([r[1] for r in rows])})
        with pytest.raises(Exception, match="max_run"):
            syndication_matrix(rd.from_arrow(t), n=5,
                               max_run=4).take_all()


class TestHostConcentration:
    def test_pareto_k_on_driver_gate_data(self):
        from peri_ray.pipelines.queries import host_concentration_docs

        got = host_concentration_docs(
            "/root/testdata/sf0.001").to_pylist()[0]
        # 50 hosts, near-uniform volume -> half needs about half of them
        assert got["total_hosts"] == 50
        assert 1 <= got["k_hosts_50"] <= 50
        assert got["total_pages"] > 0
        # exact integer rule: top-k cumulative doubles past the total
        import duckdb

        from __ray_entry__ import oracle_sql
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        want = con.execute(
            oracle_sql()["host_concentration_docs"]).fetchone()
        assert (got["k_hosts_50"], got["total_hosts"],
                got["total_pages"]) == want


# ---------------------------------------------------------------------------
# round-4 ADVICE closures
# ---------------------------------------------------------------------------


class TestAdviceR3Closures:
    def test_skyline_real_nan_excluded_like_null(self):
        """A literal NaN (not a pandas-converted null) in a criterion
        must be dropped: numpy dominance would keep it forever while
        the NOT EXISTS twin sorts NaN above everything (ADVICE r3)."""
        from peri_ray.stages.stats import skyline

        t = pa.table({
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "a": pa.array([1.0, float("nan"), 3.0, 2.0], pa.float64()),
            "b": pa.array([5.0, 9.0, 1.0, 2.0], pa.float64())})
        got = skyline(rd.from_arrow(t).repartition(2),
                      {"a": "max", "b": "max"}, ["id"])
        # row 2 (NaN) excluded; among 1/3/4: 3 dominates nothing over
        # 1? (3,1) vs (1,5): neither dominates; (2,2) vs (3,1)/(1,5):
        # not dominated -> frontier {1,3,4}
        assert sorted(got.column("id").to_pylist()) == [1, 3, 4]

    def test_evolved_reader_skips_file_with_no_requested_columns(
            self, tmp_path, monkeypatch):
        """A file holding none of the requested columns must not be
        read at all — its all-null part comes from the footer row
        count (ADVICE r3: columns=None fallback read EVERYTHING)."""
        import pyarrow.parquet as pq

        import peri_ray.sources as src

        a = tmp_path / "a.parquet"
        b = tmp_path / "b.parquet"
        pq.write_table(pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "html": pa.array([b"x", b"y"], pa.binary())}), a)
        pq.write_table(pa.table({
            "html": pa.array([b"p", b"q", b"r"], pa.binary())}), b)

        opened = []
        real = src.read_table

        def _spy(path, columns=None, **kw):
            opened.append((os.path.basename(path), tuple(columns or ())))
            return real(path, columns=columns, **kw)

        monkeypatch.setattr(src, "read_table", _spy)
        ds = src.read_table_evolved([str(a), str(b)], columns=["id"])
        rows = ds.take_all()
        assert sorted((r["id"] is None, r.get("id")) for r in rows) == [
            (False, 1), (False, 2), (True, None), (True, None),
            (True, None)]
        # only file a was opened, pruned to id; b never touched
        assert opened == [("a.parquet", ("id",))]

    def test_source_ablation_empty_target_returns_zero_rows(self):
        from peri_ray.stages.text import source_ablation_nll

        # no doc_id % 17 == 0 -> empty target slice -> empty result,
        # matching the twin's JOIN over an empty tgt (ADVICE r3)
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "source": pa.array(["s1", "s2", "s1"], pa.string()),
            "text": pa.array(["a b", "c d", "e f"], pa.string())})
        got = source_ablation_nll(rd.from_arrow(t))
        assert got.num_rows == 0
        assert got.column_names == ["source", "n_target_tokens",
                                    "nll_micro"]

    def test_micro_half_away_rounding(self):
        from peri_ray.stages.text import _micro_half_away

        assert _micro_half_away(2.5) == 3
        assert _micro_half_away(-2.5) == -3
        assert _micro_half_away(2.4) == 2
        assert _micro_half_away(-2.4) == -2
        assert _micro_half_away(0.5) == 1
        assert _micro_half_away(-0.5) == -1
        assert _micro_half_away(0.0) == 0

    def test_tv_drift_negative_ids_dropped_from_both_halves(self):
        """SQL `id % 2 = 0/1` drops negative odd keys entirely
        (-3 % 2 = -1 in DuckDB); floor modulo would route them to
        side 1 (ADVICE r3)."""
        from peri_ray.stages.checks import tv_hellinger_drift

        # even ids (incl. -4): side 0 = a,a ; odd positive: side 1 = b
        # negative odd (-3 -> c) must vanish, not pollute side 1
        t = pa.table({
            "id": pa.array([0, -4, 1, -3], pa.int64()),
            "k": pa.array(["a", "a", "b", "c"], pa.string())})
        got = tv_hellinger_drift(rd.from_arrow(t).repartition(2),
                                 "k", "id").to_pylist()[0]
        # side a: {a:2}, side b: {b:1} -> TV = 1.0 exactly; if c leaked
        # into side 1, TV would be 1.0 still but hellinger differs:
        # with c: sqrt(1 - 0) over 3 cats vs 2 -> check hellinger too
        assert got["tv"] == 1.0
        import math
        assert abs(got["hellinger"] - round(math.sqrt(1.0), 6)) <= 1e-9


class TestStagedBlockRefsFallback:
    def test_public_api_path_matches_private(self):
        """VERDICT r3 item 3: a Ray upgrade that drops the private
        iter_internal_ref_bundles must degrade to to_arrow_refs with
        identical join results."""
        import peri_ray.stages.similarity as sim

        rng = np.random.default_rng(11)
        m = rng.normal(size=(60, 8))
        # plant near-duplicate pairs
        m[10] = m[3] + 0.001
        m[40] = m[22] + 0.001
        t = pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float64()))})
        ds = rd.from_arrow(t).repartition(5)

        def _run():
            out = sim.cosine_similarity_join(ds, threshold=0.98)
            return sorted((r["id_a"], r["id_b"], r["cos"])
                          for r in out.take_all())

        want = _run()
        assert len(want) >= 2
        sim._USE_PRIVATE_BUNDLES = False
        try:
            got = _run()
        finally:
            sim._USE_PRIVATE_BUNDLES = True
        assert got == want

    def test_knn_graph_under_public_path(self):
        import peri_ray.stages.similarity as sim

        rng = np.random.default_rng(7)
        m = rng.normal(size=(40, 6))
        t = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float64()))})
        ds = rd.from_arrow(t).repartition(4)
        want = sorted((r["query_id"], r["neighbor_id"])
                      for r in sim.knn_graph(ds, k=3).take_all())
        sim._USE_PRIVATE_BUNDLES = False
        try:
            got = sorted((r["query_id"], r["neighbor_id"])
                         for r in sim.knn_graph(ds, k=3).take_all())
        finally:
            sim._USE_PRIVATE_BUNDLES = True
        assert got == want


class TestScaleInventory:
    def test_every_materialize_site_is_documented(self):
        """Every materialize()/take_all()/iter_rows() site in the
        library must have a bound-argument row in SCALE.md's residual
        inventory (VERDICT r3 item 8) — a new site without a row, or a
        stale row, fails here."""
        import ast

        sites = set()
        for root, _, files in os.walk("/root/repo/peri_ray"):
            for f in files:
                if not f.endswith(".py"):
                    continue
                p = os.path.join(root, f)
                rel = os.path.relpath(p, "/root/repo")
                tree = ast.parse(open(p).read())

                def walk(node, stack, rel=rel):
                    if isinstance(node, (ast.FunctionDef,
                                         ast.AsyncFunctionDef,
                                         ast.ClassDef)):
                        stack = stack + [node.name]
                    for child in ast.iter_child_nodes(node):
                        walk(child, stack)
                    if (isinstance(node, ast.Attribute) and node.attr in
                            ("materialize", "take_all", "iter_rows")):
                        sites.add((rel, ".".join(stack) or "<module>"))

                walk(tree, [])

        documented = set()
        for line in open("/root/repo/SCALE.md"):
            if line.startswith("| `peri_ray/"):
                parts = [c.strip() for c in line.split("|")]
                documented.add((parts[1].strip("`"), parts[2].strip("`")))

        undocumented = sites - documented
        stale = documented - sites
        assert not undocumented, (
            f"materialize/take_all/iter_rows sites missing a SCALE.md "
            f"inventory row: {sorted(undocumented)}")
        assert not stale, (
            f"SCALE.md inventory rows with no matching site (update the "
            f"table): {sorted(stale)}")


class TestCharEntropy:
    def test_matches_brute_force_and_edge_cases(self):
        import math
        from collections import Counter

        from peri_ray.stages.text import char_entropy_scores

        texts = ["aaaa", "abab", "ab\ncd ü€", None, "", "x",
                 "the quick brown fox", "ü" * 7]
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        got = {r["doc_id"]: (r["n_chars_counted"], r["char_entropy"])
               for r in char_entropy_scores(
                   rd.from_arrow(t).repartition(3)).take_all()}
        # null + empty excluded
        assert set(got) == {0, 1, 2, 5, 6, 7}
        for i in got:
            cnt = Counter(texts[i])
            n = float(len(texts[i]))
            h = math.log(n) - sum(c * math.log(c)
                                  for c in cnt.values()) / n
            assert got[i][0] == len(texts[i])
            assert abs(got[i][1] - round(h, 6)) <= 1.1e-6
        # degenerate single-char runs score exactly 0
        assert got[0][1] == 0.0
        assert got[5][1] == 0.0
        assert got[7][1] == 0.0
        # uniform 2-symbol doc = ln 2
        assert abs(got[1][1] - round(math.log(2), 6)) <= 1e-9


class TestHostCaptureGaps:
    def test_gaps_singletons_and_ties(self):
        import datetime

        from peri_ray.stages.web import host_capture_gaps

        us = lambda s: datetime.datetime(2024, 1, 1) + \
            datetime.timedelta(seconds=s)
        rows = [
            ("a", us(0), 1), ("a", us(10), 2), ("a", us(40), 3),
            ("b", us(5), 4),                       # singleton
            ("c", us(7), 5), ("c", us(7), 6),      # tie -> gap 0
        ]
        t = pa.table({
            "host": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
            "doc_id": pa.array([r[2] for r in rows], pa.int64())})
        got = {r["host"]: r for r in host_capture_gaps(
            rd.from_arrow(t).repartition(3)).take_all()}
        assert got["a"]["n_captures"] == 3
        assert got["a"]["min_gap_us"] == 10_000_000
        assert got["a"]["max_gap_us"] == 30_000_000
        assert got["b"]["n_captures"] == 1
        assert got["b"]["min_gap_us"] is None
        assert got["c"]["min_gap_us"] == 0
        assert got["c"]["max_gap_us"] == 0


class TestStatsLayoutIndependence:
    def test_exact_stats_cents_identical_at_any_block_layout(self):
        """VERDICT r3 item 1 'done' criterion: the hash-compared
        integer-cents sums must be bit-identical at different block
        layouts (float sum_num is association-order sensitive; the
        cents path must not be)."""
        from peri_ray.stages.stats import exact_stats_table

        rng = np.random.default_rng(17)
        t = pa.table({
            "a": pa.array(rng.normal(1e6, 1e5, 10_000).round(2),
                          pa.float64()),
            "b": pa.array(rng.uniform(-5, 5, 10_000).round(4),
                          pa.float64())})
        outs = []
        for parts in (1, 3, 17):
            out = exact_stats_table(rd.from_arrow(t).repartition(parts),
                                    ["a", "b"], cents_sums=True)
            rows = sorted(out.to_pylist(), key=lambda r: r["column"])
            outs.append([(r["column"], r["cnt"], r["null_count"],
                          r["min_v"], r["max_v"], r["sum_cents"])
                         for r in rows])
        assert outs[0] == outs[1] == outs[2]


class TestCharEntropyFastPath:
    def test_ascii_fast_path_equals_utf32_fallback(self):
        """The zero-copy ASCII path (int32 doc<<8|byte composites)
        must produce bit-identical entropies to the UTF-32 fallback:
        force the fallback by appending one non-ASCII doc to the same
        ASCII rows and compare the shared rows."""
        import numpy as np

        from peri_ray.stages.text import char_entropy_scores

        rng = np.random.default_rng(23)
        ascii_texts = ["".join(rng.choice(list("abcdef gh"), 40))
                       for _ in range(50)]
        t_fast = pa.table({
            "doc_id": pa.array(range(50), pa.int64()),
            "text": pa.array(ascii_texts, pa.string())})
        # one ü forces every batch containing it onto the fallback;
        # single block => the whole table takes the UTF-32 path
        t_slow = pa.table({
            "doc_id": pa.array(list(range(50)) + [99], pa.int64()),
            "text": pa.array(ascii_texts + ["ü" * 7], pa.string())})
        fast = {r["doc_id"]: r["char_entropy"]
                for r in char_entropy_scores(
                    rd.from_arrow(t_fast).repartition(1)).take_all()}
        slow = {r["doc_id"]: r["char_entropy"]
                for r in char_entropy_scores(
                    rd.from_arrow(t_slow).repartition(1)).take_all()}
        for i in range(50):
            assert fast[i] == slow[i]


# ---------------------------------------------------------------------------
# round-5: driver-gate prefix contract
# ---------------------------------------------------------------------------


class TestDriverPrefix:
    def test_prefix_is_first_50_all_oracled_and_rotated(self):
        """The correctness driver samples list(queries())[:50].  Round 5
        rotates the prefix so the gate finally sees the round-2/3/4
        families: all 50 prefix entries must carry DuckDB oracles, and
        at least 35 must be families the r2-r4 gate never checked
        (VERDICT r4 'Next round' item 1)."""
        import __ray_entry__ as e

        qs = e.queries()
        assert len(qs) == 330
        prefix = list(qs)[:50]
        assert prefix == e._DRIVER_PREFIX
        osql = e.oracle_sql()
        assert all(k in osql for k in prefix)
        # the r2-r4 driver sample (frozen since round 2)
        old_sample = {
            "validate_documents_violations", "conforms_documents",
            "filter_valid_documents", "strict_projection_documents",
            "transform_upcase_lang", "default_fill_quality",
            "events_enum_violations", "events_value_range_violations",
            "lineitem_constraint_counts", "dependent_flag_mismatch_count",
            "multi_dispatch_events", "cond_purchase_value",
            "referential_lineitem_orders", "nation_region_fk",
            "customer_name_regex_violations", "part_size_conformity",
            "orders_status_enum_histogram", "seeded_sample_documents",
            "orders_key_multiple_of", "orders_date_violations",
            "supplier_acctbal_violations", "supplier_nation_fk",
            "events_value_either_bounds", "embedding_len_conformity",
            "doc_text_min_violations", "props_k_range_violations",
            "referential_docs_lang", "referential_orders_customer",
            "referential_orders_customer_shuffled", "duplicate_user_ids",
            "duplicate_doc_ids", "lang_histogram", "event_type_histogram",
            "exact_stats_lineitem", "psi_event_type", "dedup_exact_docs",
            "exact_dedup_victims", "windowed_event_counts",
            "session_stats", "asof_event_orders",
            "windowed_drift_event_type", "range_count_event_orders",
            "ann_topk_exact", "bpe_token_counts",
            "quantized_embedding_norms", "drift_lang_documents",
            "enrich_orders_customer", "enrich_events_customer",
            "join_lineitem_orders", "customers_with_orders"}
        fresh = [k for k in prefix if k not in old_sample]
        assert len(fresh) >= 35
        # every key appears exactly once and nothing was dropped
        assert len(set(qs)) == 330


# ---------------------------------------------------------------------------
# round-5: max_driver_groups guard on key-cardinality driver merges
# ---------------------------------------------------------------------------


class TestDriverGroupGuard:
    """VERDICT r4 'What's wrong' 1: host/key-cardinality driver merges
    must raise loudly (like exact_quantiles.max_distinct) instead of
    silently OOMing the driver on a pathological key domain."""

    def test_guard_helper_raises_past_limit(self):
        import pytest

        from peri_ray.stages.dedup import guard_driver_groups

        guard_driver_groups(10, "x", max_driver_groups=10)  # at limit ok
        with pytest.raises(ValueError, match="max_driver_groups"):
            guard_driver_groups(11, "x", max_driver_groups=10)

    def test_each_site_trips_with_lowered_limit(self, monkeypatch):
        import pytest

        from peri_ray.pipelines.queries import (hill_tail_hosts,
                                                host_concentration_docs,
                                                host_dup_rate,
                                                host_gini_docs,
                                                host_lang_entropy)
        from peri_ray.stages import dedup

        monkeypatch.setattr(dedup, "MAX_DRIVER_GROUPS", 3)
        sf = "/root/testdata/sf0.001"
        for name, fn in [("host_gini_docs", host_gini_docs),
                         ("host_concentration_docs",
                          host_concentration_docs),
                         ("host_dup_rate", host_dup_rate),
                         ("host_lang_entropy", host_lang_entropy),
                         ("hill_tail_hosts", hill_tail_hosts)]:
            with pytest.raises(ValueError, match=name):
                fn(sf)

    def test_vocab_growth_trips_with_lowered_limit(self, monkeypatch):
        import pytest

        from peri_ray.pipelines.queries import vocab_growth_monthly
        from peri_ray.stages import dedup

        monkeypatch.setattr(dedup, "MAX_DRIVER_GROUPS", 2)
        with pytest.raises(ValueError, match="vocab_growth"):
            vocab_growth_monthly("/root/testdata/sf0.001")

    def test_sites_unchanged_below_limit(self):
        """With the production limit, the guarded queries still match
        their oracles (covered by the harness) — here just re-run one
        end-to-end for a smoke signal."""
        from peri_ray.pipelines.queries import host_gini_docs

        t = host_gini_docs("/root/testdata/sf0.001")
        assert t.num_rows == 1
        assert t.column("n_hosts").to_pylist()[0] == 50


class TestKMeansHistory:
    def test_history_out_collects_non_increasing_sse(self):
        from peri_ray.stages.similarity import kmeans_fit

        rng = np.random.default_rng(5)
        X = rng.normal(size=(200, 8)).astype(np.float64)
        t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                      "embedding": pa.array([list(r) for r in X],
                                            pa.list_(pa.float64()))})
        hist = []
        assigned, cents, inertia = kmeans_fit(
            rd.from_arrow(t).repartition(3), k=4, iters=6,
            history_out=hist)
        assert len(hist) == 6
        assert hist[-1] == inertia
        for a, b in zip(hist, hist[1:]):
            assert b <= a * (1 + 1e-12) + 1e-9
        assert assigned.count() == 200


class TestCompatResume:
    """Round-5: spec_compat wired into checkpoint resume —
    accept_compatible_plans reuses CLEAN fragments computed under a
    compatible (loosened) plan instead of re-running them."""

    def _shards(self, tmp_path):
        import pyarrow.parquet as pq

        a = str(tmp_path / "a.parquet")  # clean under min 5
        b = str(tmp_path / "b.parquet")  # one violation under min 5
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["hello world", "abcdef", "12345"],
                             pa.string())}), a)
        pq.write_table(pa.table({
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": pa.array(["ok long enough", "abc"], pa.string())}), b)
        return a, b

    OLD = {"doc_id": ("required", "integer"),
           "text": ("required", ("string", ("min", 5)))}
    NEW = {"doc_id": ("required", "integer"),
           "text": ("required", ("string", ("min", 1)))}  # loosened

    def test_loosened_spec_reuses_clean_fragment_only(self, tmp_path):
        import json as _json
        import os as _os

        from peri_ray.pipelines.flagship import (merge_partition_verdict,
                                                 partitioned_flagship)
        from peri_ray.state.checkpoint import CheckpointDir, plan_hash

        a, b = self._shards(tmp_path)
        ck = str(tmp_path / "ck")
        # "killed" first run under OLD spec: only fragment A completed
        m1 = partitioned_flagship([a], ck, spec=self.OLD,
                                  id_column="doc_id")
        assert len(m1) == 1 and m1[0]["valid_rows"] == 3
        old_hash = m1[0]["plan_hash"]
        ckpt = CheckpointDir(ck)
        frag_a = _os.path.normpath(a).lstrip(_os.sep)
        mtime_a = _os.path.getmtime(ckpt._manifest_path(frag_a))

        # resume BOTH shards under the LOOSENED spec with opt-in
        m2 = partitioned_flagship([a, b], ck, spec=self.NEW,
                                  id_column="doc_id",
                                  accept_compatible_plans=True)
        assert len(m2) == 2
        by_frag = {m["fragment"]: m for m in m2}
        # A reused: manifest untouched, original plan lineage kept
        assert _os.path.getmtime(ckpt._manifest_path(frag_a)) == mtime_a
        assert by_frag[frag_a]["plan_hash"] == old_hash
        # B ran fresh under the new plan — its short row is now valid
        frag_b = _os.path.normpath(b).lstrip(_os.sep)
        assert by_frag[frag_b]["plan_hash"] == plan_hash(self.NEW)
        assert by_frag[frag_b]["rows"] == 2
        assert by_frag[frag_b]["valid_rows"] == 2
        # merged verdict identical to a from-scratch clean run
        clean = partitioned_flagship([a, b], str(tmp_path / "ck2"),
                                     spec=self.NEW, id_column="doc_id")
        want = merge_partition_verdict(clean)
        got = merge_partition_verdict(m2)
        assert got == want and got["passed"]
        # spec snapshots exist for both plans
        assert ckpt.load_spec(old_hash) is not None
        raw = _json.load(open(_os.path.join(ck, "specs",
                                            f"{old_hash}.json")))
        assert raw["#"] == "d"

    def test_violating_fragment_reruns_even_if_compatible(self, tmp_path):
        import os as _os

        from peri_ray.pipelines.flagship import partitioned_flagship
        from peri_ray.state.checkpoint import CheckpointDir, plan_hash

        a, b = self._shards(tmp_path)
        ck = str(tmp_path / "ck")
        m1 = partitioned_flagship([b], ck, spec=self.OLD,
                                  id_column="doc_id")
        assert m1[0]["valid_rows"] == 1  # "abc" fails min 5
        # loosened resume MUST re-run b: its stale verdict over-reports
        m2 = partitioned_flagship([b], ck, spec=self.NEW,
                                  id_column="doc_id",
                                  accept_compatible_plans=True)
        assert m2[0]["plan_hash"] == plan_hash(self.NEW)
        assert m2[0]["valid_rows"] == 2
        _ = CheckpointDir, _os

    def test_tightened_or_optout_reruns_clean_fragment(self, tmp_path):
        from peri_ray.pipelines.flagship import partitioned_flagship
        from peri_ray.state.checkpoint import plan_hash

        a, _b = self._shards(tmp_path)
        tight = {"doc_id": ("required", "integer"),
                 "text": ("required", ("string", ("min", 6)))}
        ck = str(tmp_path / "ck")
        partitioned_flagship([a], ck, spec=self.OLD, id_column="doc_id")
        # tightened spec: NOT compatible -> re-run despite the flag
        m = partitioned_flagship([a], ck, spec=tight, id_column="doc_id",
                                 accept_compatible_plans=True)
        assert m[0]["plan_hash"] == plan_hash(tight)
        assert m[0]["valid_rows"] == 2  # "12345" fails min 6
        # and without the flag, a loosened spec also re-runs (default
        # exact-hash behavior unchanged)
        ck2 = str(tmp_path / "ck2")
        partitioned_flagship([a], ck2, spec=self.OLD, id_column="doc_id")
        m2 = partitioned_flagship([a], ck2, spec=self.NEW,
                                  id_column="doc_id")
        assert m2[0]["plan_hash"] == plan_hash(self.NEW)


class TestChunkedBlockKernels:
    """Round-5: the block-pair kernels chunk the matmul (bounded
    transients); forcing tiny chunks must give bit-identical results
    to the unchunked path for both the threshold join and the
    running-top-k kNN merge."""

    def _vectors(self, n=150, d=16, seed=23):
        rng = np.random.default_rng(seed)
        m = rng.normal(size=(n, d))
        return m, pa.table({
            "vec_id": pa.array(np.arange(n) * 7, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float64()))})

    def test_knn_graph_chunked_equals_brute_force(self, monkeypatch):
        from peri_ray.stages import similarity as sim

        monkeypatch.setattr(sim, "_CHUNK_TARGET_DOUBLES", 64)
        monkeypatch.setattr(sim, "_CHUNK_MIN_STEP", 7)
        n, k = 150, 5
        m, t = self._vectors(n)
        out = sim.knn_graph(rd.from_arrow(t).repartition(4), k=k,
                            block_rows=60).take_all()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(
                (r["cos"], r["neighbor_id"]))
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = np.round(norm @ norm.T, 6)
        np.fill_diagonal(s, -np.inf)
        ids = np.arange(n) * 7
        for qi in range(n):
            order = sorted(range(n), key=lambda j: (-s[qi, j], ids[j]))[:k]
            want = [(s[qi, j], ids[j]) for j in order]
            have = sorted(got[ids[qi]], key=lambda x: (-x[0], x[1]))
            assert have == want
        assert all(len(v) == k for v in got.values())

    def test_cosine_join_chunked_equals_unchunked(self, monkeypatch):
        from peri_ray.stages import similarity as sim

        m, t = self._vectors(120)
        ds = rd.from_arrow(t).repartition(3)
        base = {(r["id_a"], r["id_b"], r["cos"]) for r in
                sim.cosine_similarity_join(ds, threshold=0.3,
                                           block_rows=50).take_all()}
        monkeypatch.setattr(sim, "_CHUNK_TARGET_DOUBLES", 64)
        monkeypatch.setattr(sim, "_CHUNK_MIN_STEP", 7)
        ds2 = rd.from_arrow(t).repartition(3)
        tiny = {(r["id_a"], r["id_b"], r["cos"]) for r in
                sim.cosine_similarity_join(ds2, threshold=0.3,
                                           block_rows=50).take_all()}
        assert tiny == base and len(base) > 0


class TestRowTopK:
    """The sampled-threshold top-k must be exact for any data,
    including heavy value ties (threshold == many candidates) and
    wide rows that trigger the prune path."""

    def _brute(self, s, k):
        rows, n = s.shape
        out = []
        for i in range(rows):
            order = sorted(range(n), key=lambda j: (-s[i, j], j))[:k]
            out.append([(s[i, j], j) for j in order])
        return out

    def test_wide_ties_and_narrow_agree_with_brute_force(self, monkeypatch):
        from peri_ray.stages import similarity as sim

        rng = np.random.default_rng(7)
        # force the prune path at modest width
        monkeypatch.setattr(sim, "_TOPK_SAMPLE", 32)
        for rows, n, k, discrete in ((40, 500, 5, True),
                                     (17, 4097, 7, False),
                                     (3, 9, 5, True),
                                     (5, 3, 4, False)):
            vals = (rng.integers(0, 4, size=(rows, n)).astype(np.float64)
                    if discrete else rng.normal(size=(rows, n)))
            vals[0, : min(n, 3)] = -np.inf  # padding path
            cols, topv = sim._row_topk(vals, k)
            want = self._brute(vals, k)
            for i in range(rows):
                got = [(topv[i, j], int(cols[i, j]))
                       for j in range(cols.shape[1])
                       if np.isfinite(topv[i, j])]
                expect = [(v, c) for v, c in want[i] if np.isfinite(v)]
                assert got == expect, (i, got[:3], expect[:3])
