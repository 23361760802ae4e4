"""Similarity search over embedding columns: brute-force cosine top-k
(broadcast query matrix) and an IVF-style bucketed variant for scale.

The brute-force path is the exactness baseline: the query matrix ships
once via ray.put, each batch does one numpy matmul, and a global
sort/limit (or per-query groupby top-k for many queries) finishes. The
IVF path clusters vectors into nlist buckets (k-means-lite on a sample)
and probes only the nprobe nearest buckets — the 10^12-scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(n, 1e-300)


def brute_topk(ds, queries: np.ndarray, k: int = 10, *,
               vec_col="embedding", id_col="vec_id"):
    """Exact top-k cosine for each query row (queries: (nq, dim)).

    Per-batch: candidates = per-batch top-k per query (nq×k rows per
    batch); global: groupby(qid) top-k merge. Partial top-k inside
    map_batches keeps the shuffle tiny (combiner pattern)."""
    import ray

    qunit = _unit(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qunit)
    nq = len(qunit)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        ids = t[id_col].to_numpy()
        cos = q @ mat.T  # (nq, nbatch)
        kk = min(k, cos.shape[1])
        top = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        vid = ids[top.ravel()]
        sim = np.take_along_axis(cos, top, axis=1).ravel()
        return pa.table({"qid": pa.array(qid, pa.int64()),
                         id_col: pa.array(vid),
                         "cos_sim": pa.array(sim, pa.float64())})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.nlargest(k, "cos_sim")

    return ds.map_batches(score, batch_format="pyarrow") \
        .groupby("qid").map_groups(topk, batch_format="pandas")


def kmeans_lite(sample: np.ndarray, nlist: int, iters: int = 8,
                seed: int = 42) -> np.ndarray:
    """Tiny k-means for IVF centroids (deterministic, numpy-only)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)),
                             replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_topk(ds, queries: np.ndarray, k: int = 10, *, nlist: int = 16,
             nprobe: int = 4, vec_col="embedding", id_col="vec_id",
             train_sample: int = 2048):
    """IVF-bucketed approximate top-k: train centroids on a driver-side
    sample (small), broadcast them, bucket all vectors by nearest
    centroid (groupby), search only the nprobe closest buckets per
    query."""
    import ray

    sample_rows = ds.limit(train_sample).select_columns([vec_col]).take_all()
    sample = np.stack([np.asarray(r[vec_col]) for r in sample_rows]).astype(np.float64)
    cent = kmeans_lite(_unit(sample), nlist)
    cref = ray.put(cent)
    qunit = _unit(np.asarray(queries, dtype=np.float64))
    # which buckets each query probes
    qd = ((qunit[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_of_bucket: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for b in row:
            probe_of_bucket.setdefault(int(b), []).append(qi)
    pref = ray.put((qunit, probe_of_bucket))

    def bucketize(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        b = d.argmin(axis=1).astype(np.int64)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         id_col: t[id_col],
                         "unit": pa.array(list(mat), pa.list_(pa.float64()))})

    def search(g: pd.DataFrame) -> pd.DataFrame:
        q, pob = ray.get(pref)
        bucket = int(g["bucket"].iloc[0])
        qids = pob.get(bucket, [])
        if not qids:
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "cos_sim": pd.Series([], dtype="float64")})
        mat = np.stack(g["unit"].to_numpy())
        ids = g[id_col].to_numpy()
        cos = q[qids] @ mat.T
        kk = min(k, cos.shape[1])
        top = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        return pd.DataFrame({
            "qid": pd.Series(np.repeat(qids, kk), dtype="int64"),
            id_col: pd.Series(ids[top.ravel()], dtype="int64"),
            "cos_sim": pd.Series(np.take_along_axis(cos, top, axis=1).ravel(),
                                 dtype="float64")})

    cands = ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(search, batch_format="pandas")
    # final per-query merge: candidates are BOUNDED (≤ nq × k per
    # probed bucket), so the combine is a driver-side pandas top-k —
    # a second Ray sort exchange would cost more than the whole result
    df = cands.to_pandas()
    if df.empty:
        return df
    out = (df.sort_values(["qid", "cos_sim", id_col],
                          ascending=[True, False, True])
           .groupby("qid", sort=True).head(k).reset_index(drop=True))
    return out
