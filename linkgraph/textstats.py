"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

North-star additions (training-data pipeline).  All stages are actor-pool
``map_batches`` classes whose state (compiled regexes, trained trigram
profiles, stopword sets) is built once per actor; per-batch work is
vectorized pandas/numpy where the operation allows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph.runtime import resolve_concurrency

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"},
    "fr": {"le", "la", "les", "et", "un", "une", "de", "des", "est", "dans"},
    "es": {"el", "la", "los", "las", "y", "un", "una", "de", "es", "en"},
}


class QualityScorer:
    """(doc_id, text) → per-doc quality features + composite score.

    Features follow the usual crawled-corpus heuristics: length, mean word
    length, punctuation ratio, digit ratio, stopword ratio, uppercase ratio.
    """

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"[A-Za-z]+")
        self.stop = set().union(*_STOPWORDS.values())

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, np.int64)
        n_words = np.zeros(n, np.int64)
        mean_wlen = np.zeros(n)
        punct_ratio = np.zeros(n)
        digit_ratio = np.zeros(n)
        stop_ratio = np.zeros(n)
        upper_ratio = np.zeros(n)
        for i, s in enumerate(texts):
            n_chars[i] = len(s)
            if not s:
                continue
            words = self.word.findall(s)
            n_words[i] = len(words)
            mean_wlen[i] = float(np.mean([len(w) for w in words])) if words else 0.0
            arr = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
            punct_ratio[i] = float(
                np.isin(arr, np.frombuffer(b".,;:!?'\"()-", np.uint8)).mean()
            )
            digit_ratio[i] = float(((arr >= 48) & (arr <= 57)).mean())
            upper_ratio[i] = float(((arr >= 65) & (arr <= 90)).mean())
            if words:
                stop_ratio[i] = sum(w.lower() in self.stop for w in words) / len(words)
        # composite in [0,1]: long enough, word-like, some stopwords, not noisy
        score = (
            np.clip(n_chars / 500.0, 0, 1) * 0.3
            + np.clip(stop_ratio * 4, 0, 1) * 0.3
            + (1 - np.clip(punct_ratio * 5, 0, 1)) * 0.2
            + (1 - np.clip(digit_ratio * 5, 0, 1)) * 0.2
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_words": n_words,
                "mean_word_len": mean_wlen,
                "punct_ratio": punct_ratio,
                "digit_ratio": digit_ratio,
                "stop_ratio": stop_ratio,
                "upper_ratio": upper_ratio,
                "quality": score,
            }
        )


def quality_scores(
    ds: rd.Dataset, *, concurrency: int | tuple[int, int] | None = None, batch_size: int = 4096
) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=resolve_concurrency(concurrency),
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# language id (char-trigram profiles)
# ---------------------------------------------------------------------------

def _trigram_counts(text: str, dim: int = 4096) -> np.ndarray:
    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    if len(b) < 3:
        return np.zeros(dim)
    win = np.lib.stride_tricks.sliding_window_view(b, 3).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (
            win[:, 0] * np.uint64(16777619)
            + win[:, 1] * np.uint64(31)
            + win[:, 2]
        )
        h ^= h >> np.uint64(15)
        h *= np.uint64(0x2C1B3C6D)
    idx = (h % np.uint64(dim)).astype(np.int64)
    return np.bincount(idx, minlength=dim).astype(np.float64)


def train_lang_profiles(
    ds: rd.Dataset, *, sample_per_lang: int = 200, seed: int = 41, dim: int = 4096
) -> dict[str, np.ndarray]:
    """Per-language normalized trigram profiles from a labeled corpus
    (supervised by the ``lang`` column), trained distributed.

    One small ``groupby('lang').count()`` sizes a per-language sampling
    rate targeting ~``sample_per_lang`` docs per language; one
    ``map_batches`` pass then selects docs by **id hash** (crc32 of the
    ``doc_id`` — deterministic regardless of block structure or
    parallelism, unlike per-block RNG, and unbiased under duplicate
    texts) and emits per-block per-language summed trigram vectors.  Only those tiny partials (≤ blocks × languages rows of a
    ``dim``-float vector) reach the driver, which sums and normalizes —
    the corpus text itself never leaves the workers, so the pass streams
    at any corpus size.
    """
    lang_counts = {
        r["lang"]: r["count()"]
        for r in ds.groupby("lang").count().take_all()
    }
    # crc32(text || seed) is uniform on [0, 2^32); keep a doc when the
    # hash falls below rate × 2^32
    thresholds = {
        lang: int(min(1.0, sample_per_lang / max(n, 1)) * (1 << 32))
        for lang, n in lang_counts.items()
    }

    def block_partials(t: pa.Table) -> pa.Table:
        import zlib

        salt = str(seed).encode()
        acc: dict[str, np.ndarray] = {}
        cnt: dict[str, int] = {}
        for doc_id, text, lang in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist()
        ):
            if zlib.crc32(str(doc_id).encode() + salt) >= thresholds[lang]:
                continue
            v = _trigram_counts(text, dim)
            acc[lang] = acc.get(lang, np.zeros(dim)) + v
            cnt[lang] = cnt.get(lang, 0) + 1
        langs = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array([cnt[l] for l in langs], pa.int64()),
                "vec": pa.array(
                    [acc[l].tolist() for l in langs], pa.list_(pa.float64())
                ),
            }
        )

    profiles: dict[str, np.ndarray] = {}
    for b in (
        ds.select_columns(["doc_id", "text", "lang"])
        .map_batches(block_partials, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        vecs = np.asarray(b["vec"].to_pylist(), dtype=np.float64)
        for i, lang in enumerate(b["lang"].to_pylist()):
            profiles[lang] = profiles.get(lang, np.zeros(dim)) + vecs[i]
    for lang, v in profiles.items():
        n = np.linalg.norm(v)
        profiles[lang] = v / n if n else v
    return profiles


class LangId:
    """(doc_id, text) → (doc_id, pred_lang, confidence) by trigram cosine."""

    def __init__(self, profiles_ref, dim: int = 4096) -> None:
        profiles = ray.get(profiles_ref)
        self.langs = sorted(profiles)
        self.mat = np.stack([profiles[l] for l in self.langs])
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        preds, confs = [], []
        for s in texts:
            v = _trigram_counts(s, self.dim)
            n = np.linalg.norm(v)
            if n == 0:
                preds.append("und")
                confs.append(0.0)
                continue
            sims = self.mat @ (v / n)
            i = int(np.argmax(sims))
            preds.append(self.langs[i])
            confs.append(float(sims[i]))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
                "confidence": pa.array(confs, pa.float64()),
            }
        )


def lang_id(
    ds: rd.Dataset,
    profiles: dict[str, np.ndarray],
    *,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    ref = ray.put(profiles)
    return ds.select_columns(["doc_id", "text"]).map_batches(
        LangId,
        fn_constructor_kwargs={"profiles_ref": ref},
        batch_format="pyarrow",
        concurrency=resolve_concurrency(concurrency),
    )


# ---------------------------------------------------------------------------
# token counting (BPE-ish regex + whitespace)
# ---------------------------------------------------------------------------

class TokenCounter:
    """(doc_id, text) → whitespace tokens + GPT-style regex token count."""

    def __init__(self) -> None:
        import re

        # a BPE-ish pretokenizer: words, numbers, punctuation runs, spaces
        self.bpe = re.compile(
            r"""'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"""
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ws = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        bpe = pa.array(
            [len(self.bpe.findall(s)) for s in t["text"].to_pylist()], pa.int64()
        )
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens_ws": ws, "n_tokens_bpe": bpe}
        )


def token_stats(
    ds: rd.Dataset, *, concurrency: int | tuple[int, int] | None = None
) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        TokenCounter, batch_format="pyarrow", concurrency=resolve_concurrency(concurrency)
    )


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash + winnowing)
# ---------------------------------------------------------------------------

def fingerprints(
    ds: rd.Dataset, *, k: int = 9, window: int = 16, n_keep: int = 8
) -> rd.Dataset:
    """(doc_id, fp list<int64>) k-min content sketch over k-gram hashes.

    The ``n_keep`` smallest distinct k-gram hashes per document — a compact,
    order-independent content sketch usable for copy detection (shared fp →
    candidate pair, resolvable with the same star-pair + CC machinery as
    dedup.py).  ``window`` is reserved for a winnowing variant.
    """
    from linkgraph.dedup import _char_shingles

    def fp_block(t: pa.Table) -> pa.Table:
        out = []
        for s in t["text"].to_pylist():
            h = _char_shingles(s, k)  # sorted unique uint64
            if len(h) == 0:
                out.append(np.zeros(n_keep, dtype=np.int64))
                continue
            keep = (h >> np.uint64(1)).astype(np.int64)[:n_keep]
            if len(keep) < n_keep:
                keep = np.pad(keep, (0, n_keep - len(keep)))
            out.append(keep)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fp": pa.array([list(map(int, o)) for o in out], pa.list_(pa.int64(), n_keep)),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        fp_block, batch_format="pyarrow"
    )
