"""Multimodal queries: binary media columns + typed metadata, decoded /
feature-extracted in Arrow-batched ``mapInPandas`` (operators.multimodal).

The synthetic media payload is ``unhex(md5(text))`` (16 deterministic
bytes per document) so the mapInPandas plumbing is exercised end-to-end
while staying verifiable against a DuckDB oracle that recomputes the same
metadata from the md5 hex directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import (
    DECODE_SCHEMA,
    FEATURE_SCHEMA,
    decode_batches,
    feature_batches,
)
from .base import t

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


def _media(spark, sf):
    """(doc_id, media_blob): the opaque binary media column."""
    return t(spark, sf, "documents").select(
        "doc_id", F.unhex(F.md5("text")).alias("media_blob")
    )


# ---------------------------------------------------------------- m01
@q(
    "m01_media_decode",
    oracle="""
SELECT doc_id,
       (('0x' || substr(md5(text), 1, 4))::INT % 1920 + 16) AS width,
       (('0x' || substr(md5(text), 5, 4))::INT % 1080 + 16) AS height,
       (['png','jpeg','webp','gif'])
         [('0x' || substr(md5(text), 9, 2))::INT % 4 + 1] AS format,
       16 AS n_bytes
FROM documents
""",
)
def m01(spark, sf):
    """Media decode via mapInPandas: binary blob -> (width, height,
    format, n_bytes) typed metadata.  Real plumbing, stubbed codec
    (operators/multimodal.py)."""
    return _media(spark, sf).mapInPandas(decode_batches, DECODE_SCHEMA)


# ---------------------------------------------------------------- m02
@q(
    "m02_media_feature",
    oracle="""
WITH b AS (
  SELECT doc_id, md5(text) AS h FROM documents
)
SELECT doc_id,
       list_sum(list_transform(generate_series(1, 16),
                i -> ('0x' || substr(h, 2*i - 1, 2))::BIGINT))::DOUBLE
         / 16.0 AS mean_byte,
       16 AS n_bytes
FROM b
""",
)
def m02(spark, sf):
    """Per-blob feature extraction (mean byte value) via mapInPandas --
    the Arrow-batched stand-in for an embedding model over media."""
    return _media(spark, sf).mapInPandas(feature_batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------- m03
_FPS = 30
_STRIDE = 15


@q(
    "m03_frame_sample",
    oracle=f"""
SELECT doc_id,
       unnest(generate_series(0, (n_chars % 120 + 1) * {_FPS} - 1,
                              {_STRIDE})) AS frame_idx
FROM documents
""",
)
def m03(spark, sf):
    """Video frame sampling plan: fake duration (n_chars-derived), 30 fps,
    every 15th frame -> exploded (doc_id, frame_idx) work list.

    At scale this work list is what gets repartitioned to decode
    executors -- the explode is the fan-out operator, one row per frame
    task, and the per-frame decode is the same mapInPandas shape as m01.
    """
    d = t(spark, sf, "documents")
    dur = F.col("n_chars") % 120 + 1
    return d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), dur * _FPS - 1, F.lit(_STRIDE))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------- m04
_MAX_SIDE = 256


@q(
    "m04_media_resize",
    oracle=f"""
WITH meta AS (
  SELECT doc_id,
         (('0x' || substr(md5(text), 1, 4))::INT % 1920 + 16) AS w,
         (('0x' || substr(md5(text), 5, 4))::INT % 1080 + 16) AS h
  FROM documents
)
SELECT doc_id, w AS width, h AS height,
       CASE WHEN greatest(w, h) <= {_MAX_SIDE} THEN w
            ELSE (w * {_MAX_SIDE}) // greatest(w, h) END AS new_width,
       CASE WHEN greatest(w, h) <= {_MAX_SIDE} THEN h
            ELSE (h * {_MAX_SIDE}) // greatest(w, h) END AS new_height,
       16 AS n_bytes
FROM meta
""",
)
def m04(spark, sf):
    """Media resize via mapInPandas: decode metadata, compute the
    aspect-preserving fit-within-{max}px target dims (pure integer
    math), and re-emit the blob (pixel resample is the stubbed codec
    step, operators/multimodal.py resize_batches).  The registered
    query projects the metadata; the binary output column is exercised
    by the unit tests (bytes round-trip the Arrow boundary).

    Scale shape: identical envelope to m01 — column-pruned
    (doc_id, blob) scan, bounded Arrow batches, one output row per
    input row, no shuffle."""
    from ..operators.multimodal import RESIZE_SCHEMA, resize_batches

    return (
        _media(spark, sf)
        .mapInPandas(resize_batches(_MAX_SIDE), RESIZE_SCHEMA)
        .select(
            "doc_id", "width", "height", "new_width", "new_height",
            "n_bytes",
        )
    )


# ---------------------------------------------------------------- m05
@q(
    "m05_audio_segments",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         ([16000, 22050, 44100])
           [('0x' || substr(md5(text), 11, 2))::INT % 3 + 1] AS sample_rate,
         (n_chars % 30 + 1) AS dur_s
  FROM documents
),
seg AS (
  SELECT doc_id, sample_rate,
         CAST(dur_s * sample_rate AS BIGINT) AS n_samples,
         sample_rate // 40 AS win,
         sample_rate // 100 AS hop
  FROM meta
)
SELECT doc_id, sample_rate, n_samples,
       CAST(win AS INTEGER) AS win,
       CAST(hop AS INTEGER) AS hop,
       CAST(CASE WHEN n_samples >= win
                 THEN (n_samples - win) // hop + 1 ELSE 0 END
            AS INTEGER) AS n_frames
FROM seg
""",
)
def m05(spark, sf):
    """Audio segmentation plan: typed metadata for an opaque audio blob
    (sample rate md5-derived, duration n_chars-derived — the m01
    deterministic-fake pattern, codecs are not in this container) and
    the standard 25 ms window / 10 ms hop framing every feature
    pipeline (fbank/MFCC/wav2vec) uses:
    n_frames = (n_samples - win) div hop + 1.

    The frame WORK LIST (doc_id x frame_idx explode, m03's shape) and
    the per-frame feature kernel (mapInPandas, m01's shape) reuse the
    existing operators; this query is the per-document segmentation
    contract they fan out from. Pure integer math, scan-local, zero
    shuffle."""
    d = t(spark, sf, "documents")
    sr = F.expr(
        "element_at(array(16000, 22050, 44100), "
        "CAST(conv(substring(md5(text), 11, 2), 16, 10) AS INT) % 3 + 1)"
    )
    seg = d.select(
        "doc_id", sr.alias("sample_rate"), (F.col("n_chars") % 30 + 1).alias("dur_s")
    ).select(
        "doc_id",
        "sample_rate",
        (F.col("dur_s") * F.col("sample_rate")).cast("bigint").alias("n_samples"),
        F.expr("sample_rate div 40").cast("int").alias("win"),
        F.expr("sample_rate div 100").cast("int").alias("hop"),
    )
    return seg.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "win",
        "hop",
        F.when(
            F.col("n_samples") >= F.col("win"),
            F.expr("(n_samples - win) div hop + 1"),
        )
        .otherwise(0)
        .cast("int")
        .alias("n_frames"),
    )
