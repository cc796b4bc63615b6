"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
kernels over ``mapInArrow`` so bytes never round-trip through per-row
Python.

STUB NOTICE: real codecs (PIL/torchaudio/ffmpeg) are not available in this
container. :func:`extract_features` therefore uses a clearly-marked
deterministic fake decoder (seeded from the payload hash) so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is real
and tested; :func:`decode_image` raises ``NotImplementedError`` unless a
codec library is importable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16


def attach_media(df: DataFrame, payload_expr: str, media_type: str = "image",
                 out_col: str = "media") -> DataFrame:
    """Wrap a binary payload with typed metadata: struct(bytes, type, size)."""
    return df.withColumn(out_col, F.struct(
        F.expr(payload_expr).alias("bytes"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.expr(payload_expr)).alias("n_bytes"),
    ))


def decode_image(data: bytes):
    """Real image decode — requires a codec library (absent in sandbox)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed in this "
            "environment; extract_features uses the deterministic stub") from e
    import io
    from PIL import Image
    return Image.open(io.BytesIO(data))


def extract_features(df: DataFrame, media_col: str = "media",
                     dim: int = FEATURE_DIM, out_col: str = "features") -> DataFrame:
    """Deterministic fake feature extraction over binary payloads.

    Stand-in for a real encoder: features = seeded-PRNG(xxh64(payload)).
    The Arrow plumbing (ListArray construction, batch shape, schema) is the
    real production path; only the decode math is fake.
    """
    import pyarrow as pa

    from ..hashing import xxh64_bytes

    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{in_fields}, {out_col} array<float>"

    def run(batches):
        for batch in batches:
            media = batch.column(media_col)
            if hasattr(media, "combine_chunks"):
                media = media.combine_chunks()
            payloads = media.field("bytes")
            feats = np.empty((batch.num_rows, dim), dtype=np.float32)
            for i in range(batch.num_rows):  # hash per payload; decode is I/O-bound anyway
                data = payloads[i].as_py() or b""
                seed = xxh64_bytes(data)
                feats[i] = np.random.default_rng(seed).standard_normal(dim)
            cols = [batch.column(j) for j in range(batch.num_columns)]
            cols.append(pa.array(feats.tolist(), pa.list_(pa.float32())))
            yield pa.record_batch(cols, names=list(batch.schema.names) + [out_col])

    return df.mapInArrow(run, schema)


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Aggregate payload stats (exact; SQL-oracle-checkable)."""
    return df.select(
        F.count("*").alias("n_media"),
        F.sum(F.col(f"{media_col}.n_bytes")).alias("total_bytes"),
        F.max(F.col(f"{media_col}.n_bytes")).alias("max_bytes"),
    )
