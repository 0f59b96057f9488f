"""Multimodal columns (round brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas UDFs over ``mapInPandas``.

The Spark-side plumbing — schema, batch shape, partition behavior,
deterministic fake features — is real and tested; the actual
image/audio DECODE is stubbed (`decode_image` raises
NotImplementedError) because no codec libraries exist in this
container. Swapping the stub for PIL/ffmpeg changes one function, not
the plan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("doc_id bigint, kind string, media binary, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("doc_id bigint, kind string, n_bytes int, "
                  "bytes_sha string, feat array<float>")


def synth_media(spark, sf_dir: str, kinds=("image", "audio")) -> DataFrame:
    """Deterministic fake media blobs derived from documents: payload =
    utf-8 text bytes wrapped in a fake header (stands in for
    jpeg/wav bytes); metadata columns are derived arithmetically."""
    from .. import sqlgen
    sqlgen.register_tables(spark, sf_dir)
    docs = spark.table("documents")

    def gen(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for k in kinds:
                    blob = (f"\x89{k.upper()}\r\n".encode()
                            + text.encode("utf-8"))
                    rows.append({
                        "doc_id": int(doc_id), "kind": k,
                        "media": blob,
                        "width": 64 + int(doc_id) % 512,
                        "height": 64 + (int(doc_id) * 7) % 512,
                        "n_frames": 1 if k == "image"
                        else 1 + int(doc_id) % 120,
                    })
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(blob: bytes) -> np.ndarray:
    """REAL DECODE STUB — no codec libs in this container. The
    production implementation decodes to an HxWx3 uint8 array."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg (not in sandbox); "
        "extract_features uses the deterministic fake path instead")


def _fake_feature(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding/feature extractor:
    md5-seeded, so tests and the partition-invariance gate hold."""
    h = hashlib.md5(blob).digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype=np.uint32).astype(np.float64)
    return (arr / np.float64(2 ** 32)).astype(np.float32).tolist()


def extract_features(media: DataFrame, use_decoder: bool = False
                     ) -> DataFrame:
    """Feature-extraction stage: one Arrow batch in, one out. With
    `use_decoder=True` it calls the (stubbed) real decoder — the plan
    shape is identical either way."""

    def run(it):
        for pdf in it:
            feats, shas, nbytes = [], [], []
            for blob in pdf["media"]:
                b = bytes(blob)
                if use_decoder:
                    decode_image(b)  # raises in sandbox by design
                feats.append(_fake_feature(b))
                shas.append(hashlib.sha256(b).hexdigest()[:16])
                nbytes.append(len(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "kind": pdf["kind"],
                "n_bytes": nbytes, "bytes_sha": shas, "feat": feats})

    return media.mapInPandas(
        run, "doc_id bigint, kind string, n_bytes int, "
             "bytes_sha string, feat array<float>")


def resize(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: aspect-preserving target dims (the real op
    decodes + PIL-resizes; sandbox stand-in downsamples the payload by
    byte stride so batch shapes and payload-size accounting are real).
    Output schema mirrors the input with new dims + resized payload."""

    def run(it):
        for pdf in it:
            ws, hs, blobs = [], [], []
            for w, h, blob in zip(pdf["width"], pdf["height"],
                                  pdf["media"]):
                w, h = int(w), int(h)
                scale = max(w, h) / float(max_side)
                if scale <= 1.0:
                    nw, nh, nb = w, h, bytes(blob)
                else:
                    nw = max(1, int(w / scale))
                    nh = max(1, int(h / scale))
                    stride = max(1, int(scale))
                    nb = bytes(blob)[::stride]  # deterministic stand-in
                ws.append(nw)
                hs.append(nh)
                blobs.append(nb)
            out = pdf.copy()
            out["width"] = ws
            out["height"] = hs
            out["media"] = blobs
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode n_frames into sampled
    frame indexes (the decode of each frame is the same stub)."""
    from pyspark.sql import functions as F
    return (media.where("kind != 'image'")
            .withColumn("frame_i", F.explode(F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_k)))))
