"""Multimodal columns: images/audio/video as opaque binary + metadata.

Contract: a multimodal table carries ``content binary`` plus typed
metadata columns (mime, width/height or sample rate, …). Decode and
feature extraction run as Arrow-batched pandas functions over
``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partition sizing) is real; the codec call itself is stubbed because
image/audio libraries are not in this environment (clearly marked
below; swap ``_decode_stub`` for PIL/libav in production).

Scale notes: binary payloads dominate partition size — the reader
caps ``maxPartitionBytes`` thinking in payload bytes, and
``mapInPandas`` streams batches so a partition never fully
materializes in Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the decoded-image feature output.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake in lieu of a codec library.

    Replace with a real decode (PIL.Image.open / torchaudio / pyav).
    The fake derives (width, height, 4-dim feature) from payload bytes
    so tests are deterministic end-to-end.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    head = payload[:16].ljust(16, b"\0")
    feature = [float(head[i]) / 255.0 for i in (0, 5, 10, 15)]
    return width, height, feature


def attach_binary_metadata(
    df: DataFrame, content_col: str = "content", mime: str = "application/octet-stream"
) -> DataFrame:
    """Cheap JVM-side metadata: byte length + mime tag (no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(content_col)).cast("long"),
            "mime": F.lit(mime),
        }
    )


def extract_image_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize binary images via mapInPandas.

    Input: (id_col long, content binary, [mime string]). Output:
    IMAGE_FEATURES_SCHEMA. The decode is per-row Python by necessity
    (codec call); Arrow batching keeps transfer cost amortized.
    """
    has_mime = "mime" in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                width, height, feature = _decode_stub(payload)
                rows.append(
                    {
                        "item_id": row[id_col],
                        "mime": row["mime"] if has_mime else None,
                        "n_bytes": len(payload),
                        "width": width,
                        "height": height,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    cols = [id_col, content_col] + (["mime"] if has_mime else [])
    return df.select(*cols).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index. Frame *decode* is the same stub; the
    exploded (item, frame_no) shape and downstream partitioning are
    the real contract."""
    n_frames = (F.length(F.col(content_col)) % 100 + 1).alias("n_frames")
    frames = df.select(F.col(id_col), F.col(content_col), n_frames).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
    return frames
