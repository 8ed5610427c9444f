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


def test_decontaminate_planted_overlap():
    """A train doc sharing exactly one 8-gram with the eval set is flagged
    with n_shared=1; disjoint docs and sub-8-token overlaps are not."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.dedup import decontaminate

    bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    train_rows = {
        1: bench,                                            # full copy
        2: "x y z alpha bravo charlie delta echo foxtrot golf hotel q",  # one 8-gram
        3: "alpha bravo charlie delta echo foxtrot golf",    # only 7 shared tokens
        4: "totally different text with many many words here indeed",
        5: "pad " * 3 + bench + " tail",                     # embedded copy
    }
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(train_rows), pa.int64()),
                "text": pa.array(list(train_rows.values()), pa.string()),
            }
        )
    ).repartition(3)
    eval_ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([100], pa.int64()),
             "text": pa.array([bench], pa.string())}
        )
    )
    got = (
        decontaminate(train, eval_ds, n=8)
        .to_pandas()
        .set_index("doc_id")["n_shared"]
        .to_dict()
    )
    # bench has 10 tokens -> 3 distinct 8-grams; doc 1 shares all 3,
    # doc 2 shares 1, doc 5 contains the full bench -> 3
    assert got == {1: 3, 2: 1, 5: 3}


def test_decontaminate_empty_eval_flags_nothing():
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.dedup import decontaminate

    train = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()),
             "text": pa.array(["some words here that are fine ok yes sure"], pa.string())}
        )
    )
    eval_ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    assert decontaminate(train, eval_ds, n=8).count() == 0


def test_decontaminate_property_vs_bruteforce():
    """Property (random corpora): the hash-space decontamination equals a
    brute-force Python n-gram set intersection for every (train, eval)
    pair — distinct shared-gram counts included."""
    import pyarrow as pa
    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    from linkgraph.dedup import decontaminate

    token = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])

    def grams(text, n):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    @settings(max_examples=15, deadline=None)
    @given(
        train=st.lists(
            st.lists(token, min_size=0, max_size=12), min_size=1, max_size=5
        ),
        ev=st.lists(
            st.lists(token, min_size=0, max_size=12), min_size=1, max_size=3
        ),
        n=st.integers(2, 4),
    )
    def check(train, ev, n):
        ttexts = [" ".join(d) for d in train]
        etexts = [" ".join(d) for d in ev]
        tr = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(ttexts)), pa.int64()),
                    "text": pa.array(ttexts, pa.string()),
                }
            )
        )
        e = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(etexts)), pa.int64()),
                    "text": pa.array(etexts, pa.string()),
                }
            )
        )
        df = decontaminate(tr, e, n=n).to_pandas()
        got = (
            {}
            if len(df) == 0  # empty Dataset -> schema-less DataFrame
            else dict(zip(df["doc_id"].astype(int), df["n_shared"].astype(int)))
        )
        eset = set().union(*(grams(t, n) for t in etexts)) if etexts else set()
        want = {
            i: len(grams(t, n) & eset)
            for i, t in enumerate(ttexts)
            if grams(t, n) & eset
        }
        assert got == want

    check()
