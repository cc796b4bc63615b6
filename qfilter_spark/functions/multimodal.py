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

    Stand-in for a real encoder. The payload hash is computed JVM-side
    (``F.xxhash64(media.bytes)`` inside whole-stage codegen — bytes are
    never touched by Python), and the feature math is a fully vectorized
    numpy mix of that 64-bit seed: ``dim`` batched XXH64 passes mapped to
    [-1, 1). The Arrow plumbing (ListArray construction from flat buffers,
    batch shape, schema) is the real production path; only the decode math
    is fake — see the module STUB NOTICE.
    """
    import pyarrow as pa

    from ..hashing import xxh64_u64

    seeded = df.withColumn("__seed", F.xxhash64(F.col(f"{media_col}.bytes")))
    in_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{in_fields}, {out_col} array<float>"

    def run(batches):
        for batch in batches:
            n = batch.num_rows
            seeds = (batch.column("__seed").to_numpy(zero_copy_only=False)
                     .astype(np.int64).view(np.uint64))
            feats = np.empty((n, dim), dtype=np.float32)
            for j in range(dim):  # dim vectorized passes, no per-row Python
                u = xxh64_u64(seeds, np.uint64(1 + j)).astype(np.float64) / 2.0**64
                feats[:, j] = (2.0 * u - 1.0).astype(np.float32)
            keep = [k for k, nm in enumerate(batch.schema.names) if nm != "__seed"]
            cols = [batch.column(k) for k in keep]
            names = [batch.schema.names[k] for k in keep]
            offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
            cols.append(pa.ListArray.from_arrays(
                offsets, pa.array(feats.ravel(), pa.float32())))
            yield pa.record_batch(cols, names=names + [out_col])

    return seeded.mapInArrow(run, schema)


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Aggregate payload stats (exact; SQL-oracle-checkable)."""
    return df.select(
        F.count("*").alias("n_media"),
        F.sum(F.col(f"{media_col}.n_bytes")).alias("total_bytes"),
        F.max(F.col(f"{media_col}.n_bytes")).alias("max_bytes"),
    )
