"""Dedup / text-analysis / similarity-search operators vs brute-force
numpy/python oracles on the provided testdata tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def embs():
    return pq.read_table(f"{SF}/embeddings.parquet").to_pandas()


class TestText:
    def test_lang_id_samples(self, ray_session):
        # the synthetic corpus uses one shared vocabulary for all lang
        # labels, so accuracy is tested on real multilingual samples
        import ray.data as rd
        from gdal_ray.functions.text import lang_id_batch
        samples = [
            ("en", "the cat is on the mat and it is happy that the sun is out"),
            ("de", "der hund ist nicht mit der katze und das ist ein problem für den mann"),
            ("fr", "le chat est dans la maison et les enfants sont dans le jardin pour une heure"),
            ("es", "el perro y el gato están en la casa con un niño que no es feliz"),
        ]
        t = pa.table({"text": [s for _, s in samples]})
        ds = rd.from_arrow(t)
        out = ds.map_batches(lang_id_batch, batch_format="pyarrow").to_pandas()
        # from_arrow preserves row order within the single block
        assert out.pred_lang.tolist() == [l for l, _ in samples]

    def test_lang_id_corpus_deterministic(self, ray_session):
        import ray.data as rd
        from gdal_ray.functions.text import lang_id_batch
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(lang_id_batch, batch_format="pyarrow").to_pandas()
        assert set(out.pred_lang) <= {"en", "de", "fr", "es", "it", "und"}

    def test_quality_features(self, ray_session):
        import ray.data as rd
        from gdal_ray.functions.text import quality_batch
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(quality_batch, batch_format="pyarrow").to_pandas()
        assert {"n_tokens", "alpha_ratio", "punct_ratio",
                "stopword_ratio", "mean_word_len"} <= set(out.columns)
        assert ((out.alpha_ratio >= 0) & (out.alpha_ratio <= 1)).all()
        assert (out.n_tokens >= 1).all()

    def test_fingerprint_deterministic(self):
        from gdal_ray.functions.text import fingerprint
        a = fingerprint("the quick brown fox jumps over the lazy dog" * 10)
        b = fingerprint("the quick brown fox jumps over the lazy dog" * 10)
        c = fingerprint("a different text entirely with other content here" * 10)
        assert a == b != c


class TestExactDedup:
    def test_exact_dedup(self, ray_session, docs):
        import ray.data as rd
        from gdal_ray.functions.dedup import exact_dedup
        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        out = exact_dedup(ds).to_pandas()
        expect = docs.groupby("text")["doc_id"].min().sort_values()
        assert sorted(out["doc_id"]) == sorted(expect)


class TestMinHash:
    def test_signature_similarity_estimate(self):
        from gdal_ray.functions.dedup import MinHasher, jaccard, ngram_set
        h = MinHasher(n_perm=128, shingle_k=5)
        a = "the quick brown fox jumps over the lazy dog and runs away fast"
        b = "the quick brown fox jumps over the lazy cat and runs away fast"
        sa, sb = h.signature(a), h.signature(b)
        est = (sa == sb).mean()
        true = jaccard(ngram_set(a, 5), ngram_set(b, 5))
        assert abs(est - true) < 0.15

    def test_lsh_finds_near_dups(self, ray_session):
        import ray.data as rd
        from gdal_ray.functions.dedup import minhash_candidates
        base = "this is a long document about machine learning pipelines " * 5
        rng = np.random.default_rng(11)
        rows = []
        for i in range(20):
            if i < 3:  # 3 near-identical docs
                rows.append({"doc_id": i, "text": base + f" tail{i}"})
            else:  # genuinely unrelated: random word soup per doc
                words = ["".join(rng.choice(list("abcdefghijklmnop"), 7))
                         for _ in range(60)]
                rows.append({"doc_id": i, "text": " ".join(words)})
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = minhash_candidates(ds, jaccard_threshold=0.7).to_pandas()
        got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
        assert {(0, 1), (0, 2), (1, 2)} <= got
        # unrelated docs must not pair with the near-dup cluster
        for a, b in got:
            assert a < 3 and b < 3


class TestVerifyPairs:
    def test_coshuffle_matches_broadcast(self, ray_session, docs):
        """The 100 TB co-shuffle verify path returns byte-identical
        verified pairs to the broadcast-dict path on the same LSH
        candidates (texts never leave the cluster, two bounded
        exchanges)."""
        import ray.data as rd
        from gdal_ray.functions.dedup import (minhash_candidates,
                                              verify_pairs_chargram,
                                              verify_pairs_coshuffle)
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        cands = minhash_candidates(ds, jaccard_threshold=0.35).materialize()
        lookup = dict(zip(docs["doc_id"], docs["text"]))
        want = verify_pairs_chargram(cands, lookup, k=5, threshold=0.5) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        got = verify_pairs_coshuffle(
            cands, rd.read_parquet(f"{SF}/documents.parquet",
                                   columns=["doc_id", "text"]),
            k=5, threshold=0.5).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert len(got) == len(want) and len(got) > 0
        pd.testing.assert_frame_equal(got[["id_a", "id_b", "jaccard"]],
                                      want[["id_a", "id_b", "jaccard"]])

    def test_dispatcher_picks_broadcast_below_limit(self, ray_session):
        import ray.data as rd
        from gdal_ray.functions.dedup import minhash_candidates, verify_pairs
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        cands = minhash_candidates(ds, jaccard_threshold=0.35).materialize()
        small = verify_pairs(cands, ds, threshold=0.5).to_pandas()
        big = verify_pairs(cands, ds, threshold=0.5,
                           broadcast_limit=0).to_pandas()
        assert sorted(map(tuple, small[["id_a", "id_b"]].to_numpy())) \
            == sorted(map(tuple, big[["id_a", "id_b"]].to_numpy()))


class TestSimHash:
    def test_near_dup_detection(self, ray_session):
        import ray.data as rd
        from gdal_ray.functions.dedup import simhash, simhash_near_dups
        base = "a fairly long sentence used to compute a stable simhash value " * 4
        rows = [{"doc_id": 0, "text": base},
                {"doc_id": 1, "text": base.replace("stable", "steady")},
                {"doc_id": 2, "text": "something else entirely different " * 8}]
        d01 = bin(simhash(rows[0]["text"]) ^ simhash(rows[1]["text"])).count("1")
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = simhash_near_dups(ds, max_hamming=max(3, d01)).to_pandas()
        got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
        assert (0, 1) in got
        assert (0, 2) not in got and (1, 2) not in got


class TestEmbeddingDedup:
    def test_vs_bruteforce(self, ray_session, embs):
        # the natural corpus has no pairs at 0.95 — inject 5 near-copies
        import ray.data as rd
        from gdal_ray.functions.dedup import embedding_near_dups
        rng = np.random.default_rng(3)
        df = embs[["vec_id", "embedding"]].copy()
        extra = []
        for i in range(5):
            v = np.asarray(df.iloc[i]["embedding"], dtype=np.float64)
            noisy = v + rng.normal(0, 0.01 * np.linalg.norm(v) / np.sqrt(len(v)),
                                   size=len(v))
            extra.append({"vec_id": 100000 + i, "embedding": noisy.tolist()})
        big = pd.concat([df, pd.DataFrame(extra)], ignore_index=True)
        thr = 0.95
        ds = rd.from_arrow(pa.Table.from_pandas(big))
        out = embedding_near_dups(ds, threshold=thr).to_pandas()
        got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
        mat = np.stack(big["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = mat @ mat.T
        ii, jj = np.nonzero(np.triu(cos >= thr, k=1))
        ids = big["vec_id"].to_numpy()
        expect = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
                  for i, j in zip(ii, jj)}
        assert len(expect) >= 5
        # all found pairs must be true; LSH recall must be reasonable
        assert got <= expect
        assert len(got) / len(expect) > 0.5


class TestANN:
    def test_brute_topk_exact(self, ray_session, embs):
        import ray.data as rd
        from gdal_ray.functions.ann import brute_topk
        ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        mat = np.stack(embs["embedding"].to_numpy()).astype(np.float64)
        ids = embs["vec_id"].to_numpy()
        queries = mat[:3]
        out = brute_topk(ds, queries, k=5).to_pandas()
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for qi in range(3):
            cos = unit @ unit[qi]
            expect = set(ids[np.argsort(-cos)[:5]])
            got = set(out[out.qid == qi]["vec_id"].astype(int))
            assert got == expect

    def test_ivf_recall(self, ray_session, embs):
        import ray.data as rd
        from gdal_ray.functions.ann import ivf_topk
        ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        mat = np.stack(embs["embedding"].to_numpy()).astype(np.float64)
        ids = embs["vec_id"].to_numpy()
        queries = mat[:3]
        out = ivf_topk(ds, queries, k=5, nlist=8, nprobe=4)  # pandas now
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        recalls = []
        for qi in range(3):
            cos = unit @ unit[qi]
            expect = set(ids[np.argsort(-cos)[:5]])
            got = set(out[out.qid == qi]["vec_id"].astype(int))
            recalls.append(len(got & expect) / 5)
        assert np.mean(recalls) >= 0.6, recalls

    def test_ivf_bounded_tasks_exact_when_all_probed(self, ray_session, embs):
        """No search task ever holds more than batch_size vectors (the
        score fn raises if one does), and with nprobe = nlist the
        bucketed path returns the EXACT brute-force top-k."""
        import ray.data as rd
        from gdal_ray.functions.ann import ivf_topk
        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        mat = np.stack(embs["embedding"].to_numpy()).astype(np.float64)
        ids = embs["vec_id"].to_numpy()
        queries = mat[:4]
        out = ivf_topk(ds, queries, k=5, nlist=8, nprobe=8, batch_size=64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for qi in range(4):
            cos = unit @ unit[qi]
            expect = set(ids[np.argsort(-cos)[:5]])
            got = set(out[out.qid == qi]["vec_id"].astype(int))
            assert got == expect


class TestPQAnn:
    """Product quantization ANN (ADC + exact re-rank)."""

    def _emb(self):
        import ray.data as rd
        return rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def test_refined_equals_exact(self, ray_session):
        import numpy as np
        from gdal_ray.functions.ann import brute_topk, pq_topk
        emb = self._emb()
        df = emb.to_pandas()
        queries = np.stack(df["embedding"].iloc[[3, 77, 150]]).astype(float)
        exact = brute_topk(emb, queries, k=10).to_pandas()
        ref = pq_topk(emb, queries, k=10, m_sub=16, n_centroids=32,
                      oversample=16, refine=True).to_pandas()
        for q in range(3):
            a = set(exact[exact.qid == q]["vec_id"])
            b = set(ref[ref.qid == q]["vec_id"])
            assert a == b, q                 # generous oversample → exact

    def test_adc_only_recall_floor(self, ray_session):
        import numpy as np
        from gdal_ray.functions.ann import brute_topk, pq_topk
        emb = self._emb()
        df = emb.to_pandas()
        queries = np.stack(df["embedding"].iloc[[3, 77, 150, 260, 333,
                                                 444]]).astype(float)
        exact = brute_topk(emb, queries, k=10).to_pandas()
        adc = pq_topk(emb, queries, k=10, m_sub=16, n_centroids=32,
                      oversample=8, refine=False).to_pandas()
        rec = []
        for q in range(6):
            a = set(exact[exact.qid == q]["vec_id"])
            b = set(adc[adc.qid == q]["vec_id"])
            rec.append(len(a & b) / 10)
        assert sum(rec) / len(rec) >= 0.4    # raw-ADC floor, no re-rank

    def test_codebook_shapes(self):
        import numpy as np
        from gdal_ray.functions.ann import pq_train
        import pytest as _pytest
        sample = np.random.default_rng(0).normal(0, 1, (256, 64))
        books = pq_train(sample, m_sub=8, n_centroids=16)
        assert books.shape == (8, 16, 8)
        with _pytest.raises(ValueError, match="divisible"):
            pq_train(sample, m_sub=7)
