"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Additive surface for training-data pipelines (not in the reference).
Design: media travels as ``binary`` columns with a metadata struct
(mime, width/height/duration, codec); decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
the heavy work is vectorized per batch and the plan stays partition-
parallel (no shuffle: every stage is a narrow map).

The container ships no image/audio codecs, so the actual byte→pixels
decode is STUBBED: ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) produces stable
arrays — the Spark-side plumbing (schemas, batch shapes, UDF
signatures, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def media_schema(extra_fields: Optional[list] = None) -> T.StructType:
    fields = [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
    return T.StructType(fields + (extra_fields or []))


def with_content_meta(
    df: DataFrame, content_col: str = "content", digest: str = "sha1"
) -> DataFrame:
    """Cheap native metadata: byte length + content digest — no Python.

    ``digest="sha256"`` is the engine-portable choice (DuckDB has no
    sha1), used by the oracle-checked ``multimodal_meta`` query.
    """
    if digest == "sha256":
        dig = F.sha2(F.col(content_col), 256)
    elif digest == "sha1":
        dig = F.sha1(F.col(content_col))
    else:
        raise ValueError(f"unsupported digest {digest!r}: use 'sha256' or 'sha1'")
    return df.withColumn("n_bytes", F.length(F.col(content_col))).withColumn(
        digest, dig
    )


def _fake_pixels(content: bytes, width: int, height: int):
    """Deterministic stand-in decoder: seed from content hash."""
    import numpy as np

    seed = int.from_bytes(hashlib.sha1(content or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    out_width: int = 32,
    out_height: int = 32,
    fake: bool = False,
) -> DataFrame:
    """binary → resized RGB tensor (flattened array<int>) + dims.

    Real decode requires an image codec (PIL/opencv — not in this
    container): raises NotImplementedError unless ``fake=True``.
    The mapInPandas pipeline shape is identical for the real thing —
    swap ``_fake_pixels`` for ``PIL.Image.open(...).resize(...)``.
    """
    other = [c for c in df.columns if c != content_col]
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in other]
        + ["width int", "height int", "pixels array<int>"]
    )

    def decode(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        if not fake:
            raise NotImplementedError(
                "image decode requires an image codec (PIL/opencv), not present in this container"
            )
        for pdf in batches:
            pixels = [
                _fake_pixels(c, out_width, out_height).ravel().tolist()
                for c in pdf[content_col]
            ]
            out = pdf[other].copy()
            out["width"] = out_width
            out["height"] = out_height
            out["pixels"] = pixels
            yield out

    return df.mapInPandas(decode, schema=schema)


def image_features(
    df: DataFrame,
    pixels_col: str = "pixels",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-image channel means/stds from the decoded tensor — a
    vectorized Arrow stage (numpy over the batch)."""
    schema = f"{id_col} long, mean_r double, mean_g double, mean_b double, std double"

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mats = [np.asarray(p, dtype="float64").reshape(-1, 3) for p in pdf[pixels_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mean_r": [m[:, 0].mean() for m in mats],
                    "mean_g": [m[:, 1].mean() for m in mats],
                    "mean_b": [m[:, 2].mean() for m in mats],
                    "std": [m.std() for m in mats],
                }
            )

    return df.select(id_col, pixels_col).mapInPandas(feats, schema=schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video → one row per sampled frame (id, frame_idx, frame bytes).
    STUB decode; real impl swaps in pyav/ffmpeg.  Output is exploded
    rows so downstream image ops apply unchanged."""
    schema = f"{id_col} long, frame_idx int, frame binary"

    def sample(batches):
        import pandas as pd

        if not fake:
            raise NotImplementedError("video decode requires ffmpeg/pyav, not present in this container")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                n_frames = (len(content or b"") % 5) + 1  # deterministic fake
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.sha1((content or b"") + bytes([i])).digest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(sample, schema=schema)


def decode_audio(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    sample_rate: int = 16000,
    fake: bool = False,
) -> DataFrame:
    """Audio bytes → mono PCM float array (stubbed like decode_image)."""
    schema = f"{id_col} long, sample_rate int, samples array<float>"

    def decode(batches):
        import numpy as np
        import pandas as pd

        if not fake:
            raise NotImplementedError("audio decode requires a codec (soundfile/ffmpeg), not present")
        for pdf in batches:
            sams = []
            for c in pdf[content_col]:
                seed = int.from_bytes(hashlib.sha1(c or b"").digest()[:4], "big")
                rng = np.random.default_rng(seed)
                sams.append(rng.standard_normal(64).astype("float32").tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "sample_rate": sample_rate, "samples": sams})

    return df.select(id_col, content_col).mapInPandas(decode, schema=schema)
