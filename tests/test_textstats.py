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
