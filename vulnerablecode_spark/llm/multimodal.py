"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of typed metadata. The decode / feature-extract step is the ONLY
Python in this package's hot path and runs as an Arrow-batched
``mapInPandas`` so batches (not rows) cross the JVM↔Python boundary.

The actual media decoding is STUBBED (codec libraries are not available in
this environment): ``decode_media_meta`` derives deterministic fake
dimensions from the payload bytes, and ``decode_media_real`` raises
NotImplementedError at the exact point a real decoder (PIL/ffmpeg) would
plug in. The Spark-side plumbing — schema, batching, partitioning — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("byte_len", LongType()),
    StructField("media_format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_frames", LongType()),
])


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of the text
    standing in for image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_media_real(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real decoder plug point (PIL.Image.open / av.open / soundfile)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_media_meta (deterministic fake) instead"
    )


def extract_media_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode stage: (id, payload) → typed media metadata.

    Arrow batches flow in as pandas DataFrames; at 100 TB this runs one
    Python worker per core with zero driver involvement. Swap the fake
    decode below for ``decode_media_real`` when codecs exist.

    The closure is deliberately self-contained (no references to this
    module's globals) so cloudpickle ships it BY VALUE — Python workers
    don't need the package on their import path.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd  # worker-side import only

        def fake_meta(byte_len: int) -> tuple[str, int, int, int]:
            # deterministic stand-in for a real media decoder
            fmt = ("img", "audio", "video")[byte_len % 3]
            return (fmt, byte_len % 640 + 16, (byte_len * 7) % 480 + 16,
                    byte_len % 16 + 1)

        for pdf in batches:
            byte_len = pdf[payload_col].map(len).astype("int64")
            meta = byte_len.map(fake_meta)
            yield _pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "byte_len": byte_len,
                "media_format": meta.map(lambda m: m[0]),
                "width": meta.map(lambda m: m[1]).astype("int64"),
                "height": meta.map(lambda m: m[2]).astype("int64"),
                "n_frames": meta.map(lambda m: m[3]).astype("int64"),
            })

    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col), F.col(payload_col))
        # single-file inputs arrive as one partition — spread so one Python
        # worker per core decodes an Arrow batch stream
        .repartition(n)
        .mapInPandas(decode, MEDIA_META_SCHEMA)
    )
