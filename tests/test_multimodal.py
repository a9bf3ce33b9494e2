"""Multimodal plumbing (X4): binary columns, mapInPandas feature extraction

(deterministic stub), NotImplementedError gate for real decoders."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dwh_etl_framework_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello world"), Row(doc_id=2, text="")]
    )
    return multimodal.attach_media_columns(df, "text")


def test_attach_media_schema(media):
    dt = dict(media.dtypes)
    assert dt["media_bytes"] == "binary"
    assert dt["media_meta"].startswith("struct<mime:string,n_bytes:int")
    row = {r.doc_id: r for r in media.collect()}
    assert bytes(row[1].media_bytes) == b"hello world"
    assert row[1].media_meta.n_bytes == 11
    assert row[2].media_meta.n_bytes == 0


def test_decode_media_deterministic_stub(media):
    out = {r.doc_id: r for r in multimodal.decode_media(media).collect()}
    r1 = out[1]
    blob = b"hello world"
    assert r1.n_bytes == len(blob)
    assert r1.checksum == sum(blob) % (1 << 31)
    assert r1.width == len(blob) % 640
    assert r1.height == len(blob) // 640 + 1
    assert r1.features == [float(blob[i % len(blob)]) for i in range(8)]
    # empty blob: zero features, no crash
    assert out[2].features == [0.0] * 8


def test_decode_media_real_path_is_marked_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        multimodal.decode_media(media, fake=False).collect()
