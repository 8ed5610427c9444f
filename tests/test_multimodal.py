"""Multimodal plumbing: fake codec, features, resize, stub behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph import multimodal as mm


def test_synth_media_schema():
    t = mm.synth_media(10, seed=1)
    assert t.schema.equals(mm.MEDIA_SCHEMA)
    kinds = set(t["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_media_features():
    t = mm.synth_media(12, seed=2)
    feats = mm.media_features(rd.from_arrow(t), concurrency=1).take_all()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    import json

    for i, meta in enumerate(t["meta"].to_pylist()):
        m = json.loads(meta)
        if by_id[i]["kind"] == "image":
            assert by_id[i]["width"] == m["width"]
            assert by_id[i]["height"] == m["height"]
        assert 0 <= by_id[i]["mean_val"] <= 255


def test_resize_images():
    t = mm.synth_media(9, seed=3)
    out = mm.resize_images(rd.from_arrow(t), 8, 8, concurrency=1).take_all()
    n_images = sum(1 for k in t["kind"].to_pylist() if k == "image")
    assert len(out) == n_images
    for r in out:
        kind, arr, meta = mm._decode(r["payload"])
        assert arr.shape == (8, 8)


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm._decode(b"\x89PNG\r\n\x1a\nrest-of-a-png")


def test_decode_deterministic():
    t1 = mm.synth_media(5, seed=7)
    t2 = mm.synth_media(5, seed=7)
    assert t1.equals(t2)


def test_frame_sampling():
    import numpy as np
    import ray.data as rd

    from linkgraph import multimodal as mm

    media = rd.from_arrow(mm.synth_media(70, seed=5))
    frames = mm.sample_frames(media, n_out=4, concurrency=1).to_pandas()
    vids = {r["media_id"] for _, r in frames.iterrows()}
    assert vids == {i for i in range(70) if i % 7 == 6}
    # each sampled frame is a decodable image of the parent video's size
    row = frames.iloc[0]
    kind, arr, meta = mm._decode(row["payload"])
    assert kind == "image"
    src = mm.synth_media(70, seed=5)
    _, varr, vmeta = mm._decode(src["payload"][int(row["media_id"])].as_py())
    assert arr.shape == varr.shape[1:]
    assert np.array_equal(arr, varr[int(row["frame_idx"])])
    # ≤ 4 uniformly spaced distinct frames per video
    counts = frames.groupby("media_id").size()
    assert (counts <= 4).all() and (counts >= 1).all()


def test_media_features_includes_video():
    import ray.data as rd

    from linkgraph import multimodal as mm

    media = rd.from_arrow(mm.synth_media(30, seed=3))
    out = mm.media_features(media, concurrency=1).to_pandas()
    assert len(out) == 30
    assert set(out[out["kind"] == "video"]["media_id"]) == {
        i for i in range(30) if i % 7 == 6
    }
