"""Similarity search: brute-force exactness + IVF recall."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import similarity


def make_embeddings(n, d, seed):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in mat], pa.list_(pa.float64())
            ),
        }
    )
    return mat, rd.from_arrow(tbl).repartition(4)


def exact_topk(mat, q, k):
    qn = q / np.linalg.norm(q)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ qn
    return np.lexsort((np.arange(len(mat)), -sims))[:k]


def test_bruteforce_matches_numpy():
    mat, ds = make_embeddings(500, 16, seed=7)
    rng = np.random.default_rng(8)
    q = rng.standard_normal((2, 16))
    out = similarity.knn_bruteforce(ds, q, k=5).take_all()
    for qi in range(2):
        got = [r["vec_id"] for r in sorted(
            (r for r in out if r["query_id"] == qi), key=lambda r: r["rank"])]
        want = exact_topk(mat, q[qi], 5).tolist()
        assert got == want


def test_ivf_recall():
    mat, ds = make_embeddings(800, 16, seed=17)
    rng = np.random.default_rng(18)
    q = rng.standard_normal((3, 16))
    bf = similarity.knn_bruteforce(ds, q, k=10).take_all()
    ivf = similarity.knn_ivf(ds, q, k=10, n_clusters=8, n_probe=4).take_all()
    recalls = []
    for qi in range(3):
        b = {r["vec_id"] for r in bf if r["query_id"] == qi}
        v = {r["vec_id"] for r in ivf if r["query_id"] == qi}
        recalls.append(len(b & v) / len(b))
    assert np.mean(recalls) >= 0.5, recalls


def test_kmeans_deterministic():
    _, ds = make_embeddings(300, 8, seed=27)
    c1 = similarity.kmeans_fit(ds, 4, n_iters=3, seed=5)
    c2 = similarity.kmeans_fit(ds, 4, n_iters=3, seed=5)
    assert np.allclose(c1, c2)
