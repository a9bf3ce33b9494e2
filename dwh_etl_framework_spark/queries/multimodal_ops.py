"""Multimodal query-surface entries (X4) wired to operators/multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_framework_spark.operators import multimodal
from dwh_etl_framework_spark.queries.registry import fixtures, query


@query(
    "x11_binary_columns",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
           sha256(text) AS content_sha,
           lower(hex(CAST(substring(text, 1, 8) AS BLOB))) AS head_hex
    FROM documents
    """,
)
def x11_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 opaque binary columns with typed metadata: encode → byte length,

    content hash, head bytes — the JVM-side half of the multimodal model
    (hashes/lengths never leave the executors as Python objects)."""
    t = fixtures(spark, sf_dir)
    blob = F.encode(F.col("text"), "UTF-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "head_hex"
        ),
    )


@query("x12_media_features", oracle=None)
def x12_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 decode/feature-extract via mapInPandas (Arrow batches).

    The decode is a deterministic STUB (no codec libs in this container —
    operators/multimodal.decode_media marks where the real decoder goes);
    the Spark plumbing (schema, batching, partition-parallel UDF) is real.
    No SQL oracle: mapInPandas is not SQL-expressible; exact values are
    asserted in tests/test_multimodal.py."""
    t = fixtures(spark, sf_dir)
    media = multimodal.attach_media_columns(t.documents, "text")
    return multimodal.decode_media(media, fake=True).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-6 real-decode tier: synthesized uncompressed blobs cross Arrow as
# binary columns, get parsed by the REAL decoders in operators/multimodal.py,
# and the extracted features hash-match closed-form SQL oracles computed
# straight from the generator arithmetic — so a header off-by-one, a channel
# stride bug, or a frame-sampling error breaks the driver hash.
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd

from collections.abc import Iterator

#: x74 image geometry derives from doc_id so shapes vary per row; pixels are
#: the LCG byte stream b[i] = (doc_id·31 + i·7) mod 256.
_IMG = dict(w_base=16, w_mod=16, h_base=12, h_mod=8)
#: x75 audio: mono PCM16 @16 kHz, s[i] = ((doc_id·131 + i·17) mod 65536) − 32768.
_AUD_RATE = 16_000
#: x76 video: fixed 16×12 frames, stride-3 temporal sampling,
#: frame f byte j = (doc_id·31 + f·97 + j·7) mod 256.
_VID = dict(w=8, h=6, f_base=6, f_mod=8, stride=3)


def _synth_then(decoder):
    """Two-stage mapInPandas pipeline builder: stage 1 synthesizes blobs
    (pandas → Arrow binary), stage 2 runs the real parser + feature
    reductions. Separate stages on purpose: the bytes genuinely cross the
    executor boundary as an Arrow binary column between them."""

    def run(docs, synth, schema):
        # NO _spread here (round-15 A/B, reverted): repartitioning the
        # single-split fixture scan to 32 tasks parallelizes the two
        # Python stages when workers are warm (0.96 → 0.64 s isolated),
        # but at bench cadence the idle Python workers are reaped
        # between reps and every run respawns 32 of them — the timed
        # median went BIMODAL (0.64 s warm / 2-7 s respawn, bench
        # median 1.36 s vs 0.96 s before). At corpus scale inputs
        # arrive pre-split, so the local repartition is the only case
        # the change affected — and it lost. (OPTIMIZATION_r15.md)
        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "blob": [synth(int(d)) for d in pdf["doc_id"]],
                    }
                )

        def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = [decoder(int(d), bytes(b)) for d, b in zip(pdf["doc_id"], pdf["blob"])]
                yield pd.DataFrame([r for sub in rows for r in sub])

        blobs = docs.mapInPandas(enc, schema="doc_id bigint, blob binary")
        return blobs.mapInPandas(dec, schema=schema)

    return run


def _img_shape(doc_id: int) -> tuple[int, int]:
    return (
        _IMG["w_base"] + doc_id % _IMG["w_mod"],
        _IMG["h_base"] + doc_id % _IMG["h_mod"],
    )


def _synth_ppm(doc_id: int) -> bytes:
    w, h = _img_shape(doc_id)
    i = np.arange(w * h * 3, dtype=np.int64)
    pix = ((doc_id * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)
    return multimodal.encode_ppm(w, h, pix)


def _img_features(doc_id: int, blob: bytes) -> list[dict]:
    w, h, pix = multimodal.decode_ppm(blob)
    pix64 = pix.astype(np.int64)
    npix = w * h
    means = pix64.sum(axis=(0, 1))  # per-channel sums
    r = pix64[:, :, 0]
    top, left = slice(0, h // 2), slice(0, w // 2)
    bot, right = slice(h // 2, h), slice(w // 2, w)
    quad = lambda ys, xs: int(
        r[ys, xs].sum() * 1_000_000 // (r[ys, xs].shape[0] * r[ys, xs].shape[1])
    )
    return [
        dict(
            doc_id=doc_id,
            width=w,
            height=h,
            mean_r_ppm=int(means[0] * 1_000_000 // npix),
            mean_g_ppm=int(means[1] * 1_000_000 // npix),
            mean_b_ppm=int(means[2] * 1_000_000 // npix),
            q_tl_ppm=quad(top, left),
            q_tr_ppm=quad(top, right),
            q_bl_ppm=quad(bot, left),
            q_br_ppm=quad(bot, right),
        )
    ]


@query(
    "x74_image_decode",
    oracle=f"""
    WITH geom AS (
        SELECT doc_id,
               {_IMG['w_base']} + doc_id % {_IMG['w_mod']} AS w,
               {_IMG['h_base']} + doc_id % {_IMG['h_mod']} AS h
        FROM documents
    ),
    px AS (
        SELECT g.doc_id, g.w, g.h,
               k % g.w AS x, k // g.w AS y,
               (g.doc_id * 31 + (3 * k) * 7) % 256 AS r,
               (g.doc_id * 31 + (3 * k + 1) * 7) % 256 AS gr,
               (g.doc_id * 31 + (3 * k + 2) * 7) % 256 AS b
        FROM geom g, LATERAL (SELECT unnest(range(0, g.w * g.h)) AS k)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(SUM(r) * 1000000 // COUNT(*) AS BIGINT) AS mean_r_ppm,
           CAST(SUM(gr) * 1000000 // COUNT(*) AS BIGINT) AS mean_g_ppm,
           CAST(SUM(b) * 1000000 // COUNT(*) AS BIGINT) AS mean_b_ppm,
           CAST(SUM(CASE WHEN y < h // 2 AND x < w // 2 THEN r END) * 1000000
                // SUM(CASE WHEN y < h // 2 AND x < w // 2 THEN 1 END)
                AS BIGINT) AS q_tl_ppm,
           CAST(SUM(CASE WHEN y < h // 2 AND x >= w // 2 THEN r END) * 1000000
                // SUM(CASE WHEN y < h // 2 AND x >= w // 2 THEN 1 END)
                AS BIGINT) AS q_tr_ppm,
           CAST(SUM(CASE WHEN y >= h // 2 AND x < w // 2 THEN r END) * 1000000
                // SUM(CASE WHEN y >= h // 2 AND x < w // 2 THEN 1 END)
                AS BIGINT) AS q_bl_ppm,
           CAST(SUM(CASE WHEN y >= h // 2 AND x >= w // 2 THEN r END) * 1000000
                // SUM(CASE WHEN y >= h // 2 AND x >= w // 2 THEN 1 END)
                AS BIGINT) AS q_br_ppm
    FROM px
    GROUP BY doc_id
    """,
)
def x74_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 REAL image decode: per-doc PPM (P6) blobs — header + raw RGB,

    shapes varying per doc — cross Arrow as binary, get parsed by
    ``decode_ppm`` (an independent parser, not the encoder inverted), and
    reduce to per-channel and per-quadrant integer ppm means (the
    "resize to 2×2" block reduction). The oracle recomputes every feature
    from the generator arithmetic alone, so encode, Arrow transfer,
    header parse, channel stride, and quadrant coordinate math must ALL
    be right for the hash to match. Scale shape: two map-only
    mapInPandas stages, embarrassingly parallel, no shuffle at all."""
    t = fixtures(spark, sf_dir)
    run = _synth_then(_img_features)
    return run(
        t.documents.select("doc_id"),
        _synth_ppm,
        "doc_id bigint, width int, height int, "
        "mean_r_ppm bigint, mean_g_ppm bigint, mean_b_ppm bigint, "
        "q_tl_ppm bigint, q_tr_ppm bigint, q_bl_ppm bigint, q_br_ppm bigint",
    )


def _aud_n(doc_id: int) -> int:
    # sized so the closed-form oracle stays tractable in DuckDB at sf1
    # (50k docs x <=1000 samples = 50M generated rows); the decode path
    # is length-independent, so smaller payloads lose no coverage
    return 400 + (doc_id % 300) * 2


def _synth_wav(doc_id: int) -> bytes:
    i = np.arange(_aud_n(doc_id), dtype=np.int64)
    s = (((doc_id * 131 + i * 17) % 65536) - 32768).astype(np.int16)
    return multimodal.encode_wav_pcm16(_AUD_RATE, s)


def _aud_features(doc_id: int, blob: bytes) -> list[dict]:
    rate, s = multimodal.decode_wav_pcm16(blob)
    s64 = s.astype(np.int64)
    neg = s64 < 0
    return [
        dict(
            doc_id=doc_id,
            sample_rate=rate,
            n_samples=len(s),
            duration_ms=int(len(s) * 1000 // rate),
            peak_abs=int(np.abs(s64).max()),
            sum_abs=int(np.abs(s64).sum()),
            n_zero_cross=int((neg[1:] != neg[:-1]).sum()),
        )
    ]


@query(
    "x75_audio_decode",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, i,
               ((doc_id * 131 + i * 17) % 65536) - 32768 AS v
        FROM documents,
             LATERAL (SELECT unnest(range(0, 400 + (doc_id % 300) * 2))
                      AS i)
    ),
    lagd AS (
        SELECT doc_id, i, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM s
    )
    SELECT doc_id,
           {_AUD_RATE} AS sample_rate,
           CAST(COUNT(*) AS INTEGER) AS n_samples,
           CAST(COUNT(*) * 1000 // {_AUD_RATE} AS BIGINT) AS duration_ms,
           CAST(MAX(abs(v)) AS BIGINT) AS peak_abs,
           CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
           CAST(SUM(CASE WHEN pv IS NOT NULL
                          AND (pv < 0) <> (v < 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_cross
    FROM lagd
    GROUP BY doc_id
    """,
)
def x75_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 REAL audio decode: per-doc mono PCM16 WAV blobs (hand-packed

    RIFF header) cross Arrow as binary and get parsed by the stdlib
    ``wave`` module — an independent parser from the struct-built encoder
    — then reduce to duration, peak, total magnitude, and zero-crossing
    count (all integers). The oracle recomputes from the sample
    generator; a wrong data-chunk offset, byte order, or sample width
    shifts every feature. Map-only, shuffle-free, Arrow-batched."""
    t = fixtures(spark, sf_dir)
    run = _synth_then(_aud_features)
    return run(
        t.documents.select("doc_id"),
        _synth_wav,
        "doc_id bigint, sample_rate int, n_samples int, duration_ms bigint, "
        "peak_abs bigint, sum_abs bigint, n_zero_cross bigint",
    )


def _vid_frames(doc_id: int) -> int:
    return _VID["f_base"] + doc_id % _VID["f_mod"]


def _synth_rvid(doc_id: int) -> bytes:
    w, h, n = _VID["w"], _VID["h"], _vid_frames(doc_id)
    f = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(h * w * 3, dtype=np.int64)[None, :]
    pix = ((doc_id * 31 + f * 97 + j * 7) % 256).astype(np.uint8)
    return multimodal.encode_rvid(w, h, pix.reshape(n, h, w, 3))


def _vid_features(doc_id: int, blob: bytes) -> list[dict]:
    w, h, frames = multimodal.decode_rvid(blob)
    n = frames.shape[0]
    out = []
    for f in range(0, n, _VID["stride"]):
        s = int(frames[f].astype(np.int64).sum())
        out.append(
            dict(
                doc_id=doc_id,
                frame_idx=f,
                n_frames=n,
                mean_ppm=s * 1_000_000 // (w * h * 3),
            )
        )
    return out


@query(
    "x76_video_framesample",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               {_VID['f_base']} + doc_id % {_VID['f_mod']} AS n_frames
        FROM documents
    ),
    fr AS (
        SELECT g.doc_id, g.n_frames, f
        FROM g, LATERAL (SELECT unnest(range(0, g.n_frames)) AS f)
        WHERE f % {_VID['stride']} = 0
    ),
    px AS (
        SELECT doc_id, n_frames, f,
               (doc_id * 31 + f * 97 + j * 7) % 256 AS v
        FROM fr,
             LATERAL (SELECT unnest(range(0, {_VID['w'] * _VID['h'] * 3}))
                      AS j)
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(MAX(n_frames) AS INTEGER) AS n_frames,
           CAST(SUM(v) * 1000000 // COUNT(*) AS BIGINT) AS mean_ppm
    FROM px
    GROUP BY doc_id, f
    """,
)
def x76_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 REAL video frame-sampling: per-doc RVID blobs (magic + u16

    geometry header + concatenated raw RGB frames, 6–13 frames each)
    cross Arrow as binary, get parsed by ``decode_rvid``, and every
    3rd frame reduces to an integer ppm mean — the temporal-sampling +
    per-frame-features shape of a real video featurizer. The oracle
    recomputes from the frame generator; a header-size or frame-stride
    bug shifts every sampled frame's mean. Map-only, shuffle-free."""
    t = fixtures(spark, sf_dir)
    run = _synth_then(_vid_features)
    return run(
        t.documents.select("doc_id"),
        _synth_rvid,
        "doc_id bigint, frame_idx int, n_frames int, mean_ppm bigint",
    )
