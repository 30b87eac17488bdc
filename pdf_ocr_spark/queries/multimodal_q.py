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


# ---------------------------------------------------------------- m06
# Shot/scene segmentation over the sampled frame stream — the standard
# video-curation pass (PySceneDetect-style content detector shape,
# public): per-frame feature -> consecutive-frame difference -> boundary
# threshold -> cumulative shot id.  The per-frame "luma" is the m01
# deterministic-fake pattern (no codecs in the container): frames inside
# the same 450-frame block share a hash-derived luma, so differences are
# zero within a shot and hash-random across shot changes.
_SHOT_FRAMES = 450  # 15 s at 30 fps
_SCENE_TH = 8


_M06_ORACLE_TMPL = """
WITH frames AS ({m03}),
lu AS (
  SELECT doc_id, frame_idx,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
                             CAST(frame_idx // {shot} AS VARCHAR)),
                         1, 2))::INT AS luma
  FROM frames
),
d AS (
  SELECT doc_id, frame_idx, luma,
         COALESCE(abs(luma - lag(luma) OVER w), 0) AS diff
  FROM lu
  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
)
SELECT doc_id, frame_idx, luma,
       (diff >= {th}) AS is_boundary,
       CAST(sum(CASE WHEN diff >= {th} THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY frame_idx
                  ROWS UNBOUNDED PRECEDING) AS INTEGER) AS shot_id
FROM d
"""


@q(
    "m06_scene_segments",
    oracle=_M06_ORACLE_TMPL.format(
        m03=ORACLE["m03_frame_sample"], shot=_SHOT_FRAMES, th=_SCENE_TH
    ),
)
def m06(spark, sf):
    """Scene/shot segmentation: per-frame luma difference over the m03
    sampled-frame stream, boundary where the difference crosses the
    threshold, shot id = running boundary count per video.

    Scale shape: ONE doc_id exchange; lag and the running shot counter
    share the same (doc_id, frame_idx) sort — exactly how a production
    video pipeline orders per-video frame streams (each video's frames
    are processed as one partition-local sequential scan; videos
    distribute freely).  The luma itself would come from the m01
    mapInPandas decode at frame grain; here it is the deterministic
    fake so the windowed segmentation logic is fully oracle-checked.
    """
    from pyspark.sql import Window as W

    frames = QUERIES["m03_frame_sample"](spark, sf)
    lu = frames.withColumn(
        "luma",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("doc_id").cast("string"),
                        F.expr(
                            f"cast(frame_idx div {_SHOT_FRAMES} as string)"
                        ),
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("int"),
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    d = lu.withColumn(
        "diff",
        F.coalesce(
            F.abs(F.col("luma") - F.lag("luma").over(w)), F.lit(0)
        ),
    )
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return d.select(
        "doc_id",
        "frame_idx",
        "luma",
        (F.col("diff") >= _SCENE_TH).alias("is_boundary"),
        F.sum(
            F.when(F.col("diff") >= _SCENE_TH, 1).otherwise(0)
        )
        .over(wc)
        .cast("int")
        .alias("shot_id"),
    )


# ---------------------------------------------------------------- m07
# Perceptual image near-dup (dHash, the crawl-scale image dedup): a 9x8
# luma grid per image -> 64 horizontal-gradient bits -> d07's 4x16-bit
# pigeonhole block join (Hamming <= 3 implies at least one equal block)
# -> exact Hamming verify on candidates only.  No codecs in the
# container, so the "decoded luma" is the m01 deterministic-fake
# pattern: lum(r, c) = first md5 byte of (src:r:c), identically
# computable in both engines.  Every 97th doc pair (doc_id % 97 in
# {0, 3}) shares an injected identical image so the accept branch is
# exercised (Hamming 0); random 16-bit block collisions exercise the
# reject branch (Hamming ~32).
_M07_HAMMING = 3

_M07_SRC = (
    "CASE WHEN doc_id % 97 IN (0, 3)"
    " THEN concat('img-', CAST(doc_id div 97 AS STRING))"
    " ELSE text END"
)
_M07_SQL_SRC = (
    "CASE WHEN doc_id % 97 IN (0, 3)"
    " THEN 'img-' || CAST(doc_id // 97 AS VARCHAR)"
    " ELSE text END"
)


def _m07_lum(r: str, c: str) -> str:
    """Spark fake-luma expression: first md5 byte of (s:r:c)."""
    return (
        "CAST(conv(substring(md5(concat(s, ':', CAST(" + r
        + " AS STRING), ':', CAST(" + c + " AS STRING))), 1, 2), 16, 10)"
        " AS INT)"
    )


def _m07_sql_lum(r: str, c: str) -> str:
    return (
        "(('0x' || substr(md5(s || ':' || CAST(" + r
        + " AS VARCHAR) || ':' || CAST(" + c + " AS VARCHAR)), 1, 2))::INT)"
    )


_M07_ORACLE = f"""
WITH src AS (SELECT doc_id, {_M07_SQL_SRC} AS s FROM documents),
bits AS (
  SELECT doc_id, u.b, v.i,
         CASE WHEN {_m07_sql_lum("2 * u.b + v.i // 8", "v.i % 8 + 1")}
                 > {_m07_sql_lum("2 * u.b + v.i // 8", "v.i % 8")}
              THEN (1 << v.i) ELSE 0 END AS w
  FROM src,
       unnest(generate_series(0, 3)) AS u(b),
       unnest(generate_series(0, 15)) AS v(i)
),
blocks AS (SELECT doc_id, b, CAST(sum(w) AS BIGINT) AS h
           FROM bits GROUP BY doc_id, b),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM blocks a JOIN blocks c
    ON a.b = c.b AND a.h = c.h AND a.doc_id < c.doc_id
),
ham AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(sum(bit_count(xor(x.h, y.h))) AS INTEGER) AS hamming
  FROM cand
  JOIN blocks x ON x.doc_id = cand.doc_a
  JOIN blocks y ON y.doc_id = cand.doc_b AND y.b = x.b
  GROUP BY cand.doc_a, cand.doc_b
)
SELECT doc_a, doc_b, hamming, hamming <= {_M07_HAMMING} AS is_dup
FROM ham
"""


@q("m07_image_phash_dedup", oracle=_M07_ORACLE)
def m07(spark, sf):
    """dHash image near-dup: per image a 4x16-bit gradient fingerprint,
    pigeonhole block equi-join for candidates, exact Hamming verify.

    Scale shape (d07's): fingerprints are 4 rows/doc; candidates come
    from the (block_idx, block_value) equi-join — 2^16 buckets per
    block, never all-pairs; the Hamming verify joins blocks back for
    CANDIDATES only (4 rows/side/pair).  The blocks relation feeds the
    bucket join and both verify sides — persisted.  Fake luma keeps
    the whole plan JVM-side; with real codecs only the luma stage
    becomes an Arrow-batched mapInPandas (m01's plumbing), the joins
    are unchanged."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.expr(_M07_SRC).alias("s")
    )
    fold = (
        "aggregate(sequence(0, 15), 0, (acc, i) -> acc + IF("
        + _m07_lum("2 * b + i div 8", "i % 8 + 1")
        + " > "
        + _m07_lum("2 * b + i div 8", "i % 8")
        + ", shiftleft(1, i), 0))"
    )
    blocks = (
        d.select(
            "doc_id", "s", F.explode(F.expr("sequence(0, 3)")).alias("b")
        )
        .select("doc_id", "b", F.expr(fold).cast("long").alias("h"))
        .persist()
    )
    a, c = blocks.alias("a"), blocks.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.h") == F.col("c.h"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    x, y = blocks.alias("x"), blocks.alias("y")
    return (
        cand.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b"))
            & (F.col("y.b") == F.col("x.b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.bit_count(F.col("x.h").bitwiseXOR(F.col("y.h"))))
            .cast("int")
            .alias("hamming")
        )
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            (F.col("hamming") <= _M07_HAMMING).alias("is_dup"),
        )
    )
