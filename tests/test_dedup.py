"""Dedup operators: exact, MinHash-LSH, SimHash, embedding near-dup."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import dedup


def docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the window and the birds sing in the morning light over the quiet town"
)


def test_exact_dedup():
    texts = [BASE, "unique one", BASE, "unique two", BASE, "unique one"]
    out = dedup.exact_dedup(rd.from_arrow(docs_table(texts)), num_partitions=2)
    rows = {r["keep_id"]: r["n_dups"] for r in out.take_all()}
    assert rows == {0: 3, 1: 2, 3: 1}


def test_minhash_lsh_finds_near_dups():
    near = BASE.replace("morning", "evening")  # one-word edit
    texts = [BASE, near, "completely different text about graphs and rays " * 3,
             "another unrelated document mentioning arrow tables and batches"]
    out = dedup.minhash_lsh_dedup(
        rd.from_arrow(docs_table(texts)), num_partitions=2, threshold=0.5
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert clusters.get(0) == 0 and clusters.get(1) == 0
    assert 2 not in clusters and 3 not in clusters


def test_minhash_signature_jaccard_estimate():
    mh = dedup.MinHasher(num_perm=128, shingle_k=5)
    a = mh.signature(BASE)
    b = mh.signature(BASE.replace("morning", "evening"))
    c = mh.signature("totally different content with no overlap whatsoever here")
    sim_ab = (a == b).mean()
    sim_ac = (a == c).mean()
    assert sim_ab > 0.5
    assert sim_ac < 0.2


def test_simhash_dedup():
    near = BASE + " extra"
    texts = [BASE, near, "completely different text about distributed dataflow systems"]
    out = dedup.simhash_dedup(
        rd.from_arrow(docs_table(texts)), hamming_k=3, num_partitions=2
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert clusters.get(0) == 0 and clusters.get(1) == 0
    assert 2 not in clusters


def test_embedding_neardup():
    rng = np.random.default_rng(5)
    base = rng.standard_normal(32)
    vecs = [
        base,
        base + rng.standard_normal(32) * 0.01,  # near-dup of 0
        rng.standard_normal(32),
        rng.standard_normal(32),
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    out = dedup.embedding_neardup(
        rd.from_arrow(tbl), threshold=0.95, num_partitions=2
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert clusters.get(0) == 0 and clusters.get(1) == 0
    assert 2 not in clusters and 3 not in clusters


def test_ngram_jaccard_dedup():
    near = BASE.replace("morning", "evening")  # one-word edit, high Jaccard
    texts = [BASE, near, "completely different text about graphs and rays " * 3,
             "another unrelated document mentioning arrow tables and batches"]
    out = dedup.ngram_jaccard_dedup(
        rd.from_arrow(docs_table(texts)), threshold=0.6, num_partitions=2
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert clusters.get(0) == 0 and clusters.get(1) == 0
    assert 2 not in clusters and 3 not in clusters


def test_ngram_jaccard_exact_values():
    # identical docs → Jaccard 1.0; survives any threshold
    texts = [BASE, BASE, "something else entirely different here today"]
    out = dedup.ngram_jaccard_dedup(
        rd.from_arrow(docs_table(texts)), threshold=0.99, num_partitions=2
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert clusters == {0: 0, 1: 0}
