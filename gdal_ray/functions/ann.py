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
             train_sample: int = 2048, batch_size: int | None = None):
    """IVF-bucketed approximate top-k: train centroids on a driver-side
    sample (small), broadcast them, and score each batch AGAINST ONLY
    the queries probing the buckets present in that batch.

    No vector ever crosses a shuffle and no task holds more than one
    batch of vectors (the round-2 version put ~N/nlist full vectors into
    a single ``groupby(bucket)`` group — an OOM at corpus scale). The
    per-batch partials (≤ nq×k candidate rows each) merge with a tiny
    ``groupby(qid)`` top-k, same combiner shape as :func:`brute_topk`,
    so the driver only ever sees ≤ nq×k result rows."""
    import ray

    sample_rows = ds.limit(train_sample).select_columns([vec_col]).take_all()
    sample = np.stack([np.asarray(r[vec_col]) for r in sample_rows]).astype(np.float64)
    cent = kmeans_lite(_unit(sample), nlist)
    qunit = _unit(np.asarray(queries, dtype=np.float64))
    # which buckets each query probes
    qd = ((qunit[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_of_bucket: dict[int, np.ndarray] = {}
    for b in np.unique(probes):
        probe_of_bucket[int(b)] = np.nonzero((probes == b).any(axis=1))[0]
    pref = ray.put((cent, qunit, probe_of_bucket))
    empty = pa.table({"qid": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64()),
                      "cos_sim": pa.array([], pa.float64())})

    def score(t: pa.Table) -> pa.Table:
        if batch_size is not None and t.num_rows > batch_size:
            raise AssertionError(
                f"ivf score task saw {t.num_rows} vectors > "
                f"batch_size {batch_size}")
        c, q, pob = ray.get(pref)
        mat = _unit(np.stack(t[vec_col].to_pylist()).astype(np.float64))
        ids = t[id_col].to_numpy()
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        b = d.argmin(axis=1).astype(np.int64)
        qids_out, vids_out, sims_out = [], [], []
        for bucket in np.unique(b):
            qids = pob.get(int(bucket))
            if qids is None:
                continue
            idx = np.nonzero(b == bucket)[0]
            cos = q[qids] @ mat[idx].T          # (nq_probing, n_in_bucket)
            kk = min(k, cos.shape[1])
            top = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
            qids_out.append(np.repeat(qids, kk))
            vids_out.append(ids[idx][top.ravel()])
            sims_out.append(np.take_along_axis(cos, top, axis=1).ravel())
        if not qids_out:
            return empty
        return pa.table({
            "qid": pa.array(np.concatenate(qids_out).astype(np.int64)),
            id_col: pa.array(np.concatenate(vids_out)),
            "cos_sim": pa.array(np.concatenate(sims_out), pa.float64())})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos_sim", id_col],
                             ascending=[False, True]).head(k)

    kwargs = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    cands = ds.map_batches(score, **kwargs) \
        .groupby("qid").map_groups(topk, batch_format="pandas")
    # ≤ nq × k rows after the per-query merge — the result itself
    df = cands.to_pandas()
    if df.empty or "qid" not in df.columns:
        return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "cos_sim": pd.Series([], dtype="float64")})
    return (df.sort_values(["qid", "cos_sim", id_col],
                           ascending=[True, False, True])
            .reset_index(drop=True))
