"""Text analysis: quality features, language id, token counts, fingerprints."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import textstats


def docs(texts, langs=None):
    t = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if langs:
        t["lang"] = pa.array(langs, pa.string())
    return rd.from_arrow(pa.table(t))


def test_quality_scores():
    ds = docs(
        [
            "The quick brown fox jumps over the lazy dog and the cat watches it closely.",
            "1234 5678 9012 3456 7890",
            "",
        ]
    )
    rows = {r["doc_id"]: r for r in textstats.quality_scores(ds, concurrency=1).take_all()}
    assert rows[0]["quality"] > rows[1]["quality"]
    assert rows[0]["stop_ratio"] > 0.2
    assert rows[1]["digit_ratio"] > 0.5
    assert rows[2]["n_chars"] == 0


def test_lang_id_roundtrip():
    en = ["the cat and the dog are in the house with the children today"] * 30
    de = ["der hund und die katze sind mit den kindern in dem haus heute"] * 30
    fr = ["le chien et le chat sont dans la maison avec les enfants aujourd'hui"] * 30
    texts = en + de + fr
    langs = ["en"] * 30 + ["de"] * 30 + ["fr"] * 30
    ds = docs(texts, langs)
    profiles = textstats.train_lang_profiles(ds, sample_per_lang=10)
    out = textstats.lang_id(ds, profiles, concurrency=1).take_all()
    correct = sum(
        1 for r in out if r["pred_lang"] == langs[r["doc_id"]]
    )
    assert correct / len(out) > 0.95


def test_token_stats():
    ds = docs(["hello world foo", "it's a test-case with 42 numbers"])
    rows = {r["doc_id"]: r for r in textstats.token_stats(ds, concurrency=1).take_all()}
    assert rows[0]["n_tokens_ws"] == 3
    assert rows[0]["n_tokens_bpe"] == 3
    assert rows[1]["n_tokens_ws"] == 6
    assert rows[1]["n_tokens_bpe"] >= 7  # apostrophe + hyphen split


def test_fingerprints_stable_and_discriminative():
    a = "some long document text that should produce a stable fingerprint set"
    b = a  # identical
    c = "a completely different document with other words entirely in it"
    ds = docs([a, b, c])
    rows = {r["doc_id"]: list(r["fp"]) for r in textstats.fingerprints(ds).take_all()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


def test_lang_id_large_string_offsets():
    """large_string columns carry int64 offsets; LangId must read them as
    such (a blind int32 read silently corrupts the trigram counts)."""
    import ray

    en = ["the cat and the dog are in the house with the children today"] * 10
    de = ["der hund und die katze sind mit den kindern in dem haus heute"] * 10
    ds = docs(en + de, ["en"] * 10 + ["de"] * 10)
    profiles = textstats.train_lang_profiles(ds, sample_per_lang=10)
    ident = textstats.LangId(ray.put(profiles))

    texts = en[:3] + de[:3]
    small = pa.table(
        {"doc_id": pa.array(range(6), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    large = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    got_small = ident(small).to_pandas()
    got_large = ident(large).to_pandas()
    assert got_small.equals(got_large)
    assert list(got_large["pred_lang"]) == ["en"] * 3 + ["de"] * 3
    # sliced large_string (nonzero array offset) must also parse correctly
    got_sliced = ident(large.slice(2)).to_pandas().reset_index(drop=True)
    assert got_sliced.equals(got_large.iloc[2:].reset_index(drop=True))


# --- winnowing fingerprints (MOSS local selection) ---------------------------

def test_winnow_guarantee_shared_substring_shares_fp():
    """The winnowing guarantee: a shared substring of length >= window+k-1
    must produce at least one shared fingerprint."""
    from linkgraph.textstats import winnow_fingerprints

    k, window = 9, 16
    shared = "the quick brown fox jumps over the lazy dog!"  # 45 >= 16+9-1
    a = "AAAA completely different prefix " + shared + " tail one xxxxx"
    b = "BBBB other start material here.. " + shared + " different end"
    t = pa.table({"doc_id": np.array([0, 1], dtype=np.int64),
                  "text": [a, b]})
    out = winnow_fingerprints(rd.from_arrow(t), k=k, window=window).take_all()
    fps = {r["doc_id"]: set(r["fp"]) for r in out}
    assert fps[0] & fps[1], "guaranteed shared fingerprint missing"


def test_winnow_containment_is_subset():
    """A contiguous substring-copy's fingerprints are a subset of the
    source's (every window of the copy is a window of the source)."""
    from linkgraph.textstats import winnow_fingerprints

    src = " ".join(f"token{i} filler words" for i in range(40))
    copy = src[100:260]
    t = pa.table({"doc_id": np.array([0, 1], dtype=np.int64),
                  "text": [src, copy]})
    out = winnow_fingerprints(rd.from_arrow(t), k=9, window=16).take_all()
    fps = {r["doc_id"]: set(r["fp"]) for r in out}
    assert fps[1] <= fps[0]


def test_winnow_deterministic_across_partitioning():
    from linkgraph.textstats import winnow_fingerprints

    texts = [f"document {i} " + " ".join(f"w{i}{j}" for j in range(30))
             for i in range(40)]
    t = pa.table({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    a = {r["doc_id"]: tuple(r["fp"]) for r in
         winnow_fingerprints(rd.from_arrow(t).repartition(1)).take_all()}
    b = {r["doc_id"]: tuple(r["fp"]) for r in
         winnow_fingerprints(rd.from_arrow(t).repartition(7)).take_all()}
    assert a == b


def test_winnow_copy_detect_clusters_exact_and_contained():
    from linkgraph.dedup import winnow_copy_detect

    base = " ".join(f"sentence {i} about distributed dataflow" for i in range(20))
    texts = [
        base,                      # 0: source
        base,                      # 1: exact copy -> cluster with 0
        base[50:400],              # 2: contained chunk -> cluster with 0 at thr 1.0
        "totally unrelated text " * 20,   # 3: no cluster
        "another independent document body " * 15,  # 4: no cluster
    ]
    t = pa.table({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    out = winnow_copy_detect(
        rd.from_arrow(t).repartition(3), threshold=1.0, num_partitions=2
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert clusters.get(0) == 0 and clusters.get(1) == 0 and clusters.get(2) == 0
    assert 3 not in clusters and 4 not in clusters
