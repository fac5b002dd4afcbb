"""Similarity search: exact brute-force oracle + LSH recall sanity."""

import numpy as np
import pytest

from city2graph_spark.pipeline.simsearch import ann_lsh_candidates, cosine_topk


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((120, 16))
    rows = [(int(i), [float(v) for v in mat[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, mat


def test_cosine_topk_matches_numpy(emb_df):
    df, mat = emb_df
    got = {(r.qid, r.nid, r.rnk) for r in cosine_topk(df, 4).collect()}
    m = mat.astype(np.float32).astype(np.float64)  # match float storage
    sims = (m @ m.T) / (np.linalg.norm(m, axis=1)[:, None]
                        * np.linalg.norm(m, axis=1)[None, :])
    np.fill_diagonal(sims, -np.inf)
    want = set()
    for i in range(len(m)):
        order = np.lexsort((np.arange(len(m)), -sims[i]))[:4]
        for rnk, j in enumerate(order, start=1):
            want.add((i, int(j), rnk))
    assert got == want


def test_cosine_topk_never_collects_build(emb_df, monkeypatch):
    """The default path is the chunked block-nested GEMM — the build
    relation must never transit the driver (round-1 scale-killer)."""
    import city2graph_spark.pipeline.simsearch as ss
    df, _ = emb_df

    def boom(*a, **k):
        raise AssertionError("_collect_matrix called on the chunked path")

    monkeypatch.setattr(ss, "_collect_matrix", boom)
    assert ss.cosine_topk(df, 3).count() == 120 * 3


def test_cosine_topk_chunked_equals_broadcast(emb_df):
    """Many tiny chunks (rows_per_chunk=17 → multi-block merge) must give
    the identical ranking as the broadcast small-index path."""
    from city2graph_spark.pipeline.simsearch import cosine_topk_broadcast
    df, _ = emb_df
    a = {(r.qid, r.nid, r.rnk)
         for r in cosine_topk(df, 5, rows_per_chunk=17).collect()}
    b = {(r.qid, r.nid, r.rnk)
         for r in cosine_topk_broadcast(df, 5).collect()}
    assert a == b


def test_lsh_candidates_deterministic_and_relevant(emb_df):
    df, mat = emb_df
    a = {(r.id_a, r.id_b) for r in ann_lsh_candidates(df, n_planes=6).collect()}
    b = {(r.id_a, r.id_b) for r in ann_lsh_candidates(df, n_planes=6).collect()}
    assert a == b and len(a) > 0
    # candidate pairs should be more similar on average than random pairs
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ m.T
    cand_mean = np.mean([sims[i, j] for i, j in a])
    assert cand_mean > sims[np.triu_indices(len(m), 1)].mean()
