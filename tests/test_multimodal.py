"""Multimodal column plumbing (binary media + Arrow feature UDFs)."""

from __future__ import annotations

import pytest

from dle.operators.multimodal import (
    decode_image, extract_features, frame_sample, synth_media,
)

SF = "/root/testdata/sf0.001"


def test_media_and_features(spark):
    media = synth_media(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert media.count() == 2 * n_docs  # image + audio per doc
    feats = extract_features(media)
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r["feat"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feat"])
        assert r["n_bytes"] > 0 and len(r["bytes_sha"]) == 16
    # determinism: same doc+kind -> same feature under repartition
    a = {(r["doc_id"], r["kind"]): tuple(r["feat"])
         for r in feats.collect()}
    b = {(r["doc_id"], r["kind"]): tuple(r["feat"])
         for r in extract_features(media.repartition(16)).collect()}
    assert a == b


def test_decoder_is_explicit_stub(spark):
    media = synth_media(spark, SF).limit(1)
    with pytest.raises(Exception) as ei:
        extract_features(media, use_decoder=True).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_frame_sampling(spark):
    media = synth_media(spark, SF)
    frames = frame_sample(media, every_k=50)
    rows = frames.select("doc_id", "n_frames", "frame_i").collect()
    assert rows
    for r in rows:
        assert 0 <= r["frame_i"] < r["n_frames"]
        assert r["frame_i"] % 50 == 0
