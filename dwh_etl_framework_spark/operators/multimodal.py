"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2c X4).

Model: media is an opaque ``binary`` column + a typed metadata struct —
the layout a 100 TB multimodal corpus actually uses (bytes inline for small
assets, or a URI column + bytes fetched in the UDF for large ones).

The *decode* step (image decode, audio resample, video frame-sample) needs
codec libraries that are not in this container, so `decode_media` is a
clearly-marked STUB: with ``fake=True`` (default) it produces a
deterministic fake "decode" (byte-statistics standing in for pixels) so the
Spark-side plumbing — schema, Arrow batching, mapInPandas signature,
partition behavior — is real and tested end-to-end; with ``fake=False`` it
raises NotImplementedError at the exact spot a real
``PIL.Image.open``/``soundfile.read`` call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the extracted features (what a real image decoder would emit)
MEDIA_FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    "width int, height int, checksum bigint, features array<double>"
)


def attach_media_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat the document text's UTF-8 bytes as an opaque

    media blob with typed metadata — the schema shape of a real multimodal
    table (blob + struct metadata), built from driver fixtures only."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("media_bytes", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(blob).alias("n_bytes"),
            F.lit(1).alias("n_channels"),
        ),
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media_bytes",
    fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract media blobs with mapInPandas (Arrow-batched).

    Real decoders plug in at the marked point; the deterministic fake
    derives "dimensions" and a feature vector from byte statistics so tests
    can assert exact values. Runs embarrassingly parallel: one Python worker
    per input partition, batch-columnar transfer both ways.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # REAL DECODER GOES HERE, e.g.:
                #   img = PIL.Image.open(io.BytesIO(row_bytes)); ...
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "run with fake=True for the deterministic stub"
                )
            blobs = pdf[bytes_col]
            n_bytes = blobs.map(len)
            checksum = blobs.map(lambda b: sum(b) % (1 << 31))
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image/fake",
                    "n_bytes": n_bytes.astype("int32"),
                    # fake "decode": dimensions derived from byte length
                    "width": (n_bytes % 640).astype("int32"),
                    "height": (n_bytes // 640 + 1).astype("int32"),
                    "checksum": checksum.astype("int64"),
                    "features": [
                        [float(b[i % len(b)]) for i in range(feature_dim)]
                        if len(b) > 0
                        else [0.0] * feature_dim
                        for b in blobs
                    ],
                }
            )
            yield out

    return df.mapInPandas(extract, schema=MEDIA_FEATURES_SCHEMA)
