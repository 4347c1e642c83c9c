"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is STUBBED: ``decode_image_stub`` computes deterministic
pseudo-features (byte length, first byte, crc-ish checksum) from the raw
bytes. The Spark-side plumbing — schema, Arrow batch shape, UDF signature,
partition behavior — is real and tested; swapping the stub for a real decoder
is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# metadata columns a multimodal table carries next to the blob
MEDIA_META_SCHEMA = "struct<kind:string,width:int,height:int,sample_rate:int>"


def attach_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Test fixture: fabricate a binary ``media`` column (utf-8 bytes of the
    text — a deterministic fake payload) + typed metadata."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.expr(
            "named_struct('kind', 'image', 'width', cast(n_chars % 640 as int), "
            "'height', cast(n_chars % 480 as int), 'sample_rate', cast(null as int))"
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: a real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` → (width, height, mode-features).
    Raises nothing here; returns deterministic pseudo-features."""
    if payload is None:
        return (0, -1, 0)
    n = len(payload)
    first = payload[0] if n else -1
    checksum = sum(payload) % 65536
    return (n, first, checksum)


def extract_media_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Arrow-batched feature extraction over the binary column. One
    ``mapInPandas`` pass; per-batch numpy/bytes work, no per-row Spark round
    trips. Output adds (n_bytes, first_byte, checksum)."""
    base_fields = list(df.schema.fields)
    schema = StructType(
        base_fields
        + [
            StructField("n_bytes", LongType()),
            StructField("first_byte", IntegerType()),
            StructField("checksum", IntegerType()),
        ]
    )
    cols = [f.name for f in base_fields]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(b) for b in pdf[media_col]]
            pdf = pdf[cols].copy()
            pdf["n_bytes"] = [f[0] for f in feats]
            pdf["first_byte"] = [f[1] for f in feats]
            pdf["checksum"] = [f[2] for f in feats]
            yield pdf

    return df.mapInPandas(mapper, schema=schema)


def decode_image(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real image decode — requires PIL, which is not in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires pillow; use extract_media_features (stub) "
            "in this environment"
        ) from e
    raise NotImplementedError("real decoder wiring is environment-specific")
