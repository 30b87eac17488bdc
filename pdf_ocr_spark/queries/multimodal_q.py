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


# ---------------------------------------------------------------- m08
# Media<->text caption pairing over INTERLEAVED documents — the
# image-text pair mining pass of multimodal curation (public: MMC4
# "Multimodal C4", Zhu et al. 2023 — bipartite image/sentence
# assignment by CLIP score; OBELICS, Laurencon et al. 2023).  The
# interleaved span stream is derived deterministically from each
# document (sentences of 8 words; 1-3 media spans anchored after
# md5-chosen sentences — the m01 fake pattern, no codecs in this
# container), the "CLIP score" is an md5-derived integer milli-score
# over (media_ref, sentence text) with an adjacency bonus on the
# anchor sentence, and the assignment is MMC4's: each image picks its
# best-scoring sentence within a +/-1 window of its anchor, then each
# sentence keeps only its best image (one round of conflict
# resolution).  Integer scores end-to-end — no float hash drift
# between engines.
_M08_WORDS = 8  # words per sentence span
_M08_BONUS = 500  # adjacency bonus (anchor sentence), milli


def _m08_sql_int(expr: str, n: int) -> str:
    """DuckDB: first n md5 hex chars of expr as an integer."""
    return f"(('0x' || substr(md5({expr}), 1, {n}))::INT)"


_M08_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
  FROM documents
),
base AS (
  SELECT doc_id, w,
         CAST((len(w) + {_M08_WORDS - 1}) // {_M08_WORDS} AS INTEGER)
           AS n_sent,
         {_m08_sql_int("CAST(doc_id AS VARCHAR)", 2)} % 3 + 1 AS n_media
  FROM d
),
media AS (
  SELECT doc_id, w, n_sent, u.k,
         'img://' || CAST(doc_id AS VARCHAR) || '/'
                  || CAST(u.k AS VARCHAR) AS media_ref,
         {_m08_sql_int(
             "CAST(doc_id AS VARCHAR) || '#' || CAST(u.k AS VARCHAR)", 4
         )} % n_sent AS anchor
  FROM base, unnest(generate_series(0, n_media - 1)) AS u(k)
),
cand AS (
  SELECT doc_id, k, media_ref, anchor, v.cseq,
         array_to_string(
           list_slice(w, {_M08_WORDS} * v.cseq + 1,
                         {_M08_WORDS} * v.cseq + {_M08_WORDS}),
           ' ') AS sent_text
  FROM media,
       unnest(generate_series(greatest(anchor - 1, 0),
                              least(anchor + 1, n_sent - 1))) AS v(cseq)
),
scored AS (
  SELECT doc_id, k, media_ref, cseq, sent_text,
         {_m08_sql_int("media_ref || '|' || sent_text", 6)} % 1000
           + CASE WHEN cseq = anchor THEN {_M08_BONUS} ELSE 0 END
           AS score_milli
  FROM cand
),
chosen AS (
  SELECT doc_id, k, media_ref, cseq AS sent_seq, sent_text AS caption,
         score_milli,
         row_number() OVER (PARTITION BY doc_id, k
                            ORDER BY score_milli DESC, cseq) AS rn
  FROM scored
)
SELECT doc_id, media_ref,
       CAST(sent_seq AS INTEGER) AS sent_seq, caption,
       CAST(score_milli AS INTEGER) AS score_milli,
       row_number() OVER (PARTITION BY doc_id, sent_seq
                          ORDER BY score_milli DESC, k) = 1 AS kept
FROM chosen WHERE rn = 1
"""


@q("m08_caption_pair", oracle=_M08_ORACLE)
def m08(spark, sf):
    """Caption pairing on interleaved docs (MMC4-style): every media
    span scores the sentences within +/-1 of its insertion anchor
    (md5 milli-score + anchor bonus), picks its argmax, and each
    sentence keeps at most one image (best score wins).

    Scale shape: candidate generation is ANCHOR-RESTRICTED — at most
    3 sentence candidates per media span, never media x all-sentences
    — and is computed INSIDE the document row (the words array rides
    the media explode; sentence text is a slice, no sentence-relation
    join, zero join shuffles).  The two argmax passes are window
    functions whose partition keys share the doc_id prefix; the
    windowed relation is media-grain (<= 3 rows/doc), a tiny fraction
    of corpus bytes.  With a real CLIP model only the scoring column
    becomes an Arrow-batched pandas UDF (m01's plumbing); candidate
    restriction and both windows are unchanged."""
    from pyspark.sql import Window as W

    nw = _M08_WORDS
    base = t(spark, sf, "documents").select(
        "doc_id",
        F.split(F.coalesce("text", F.lit("")), " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.expr(f"CAST((size(w) + {nw - 1}) div {nw} AS INT)").alias(
            "n_sent"
        ),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
                16,
                10,
            ).cast("int")
            % 3
            + 1
        ).alias("n_media"),
    )
    media = base.select(
        "doc_id",
        "w",
        "n_sent",
        F.explode(F.expr("sequence(0, n_media - 1)")).alias("k"),
    ).select(
        "doc_id",
        "w",
        "n_sent",
        "k",
        F.concat(
            F.lit("img://"),
            F.col("doc_id").cast("string"),
            F.lit("/"),
            F.col("k").cast("string"),
        ).alias("media_ref"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % F.col("n_sent")
        ).alias("anchor"),
    )
    scored = media.select(
        "doc_id",
        "k",
        "media_ref",
        "anchor",
        F.explode(
            F.expr(
                "sequence(greatest(anchor - 1, 0),"
                " least(anchor + 1, n_sent - 1))"
            )
        ).alias("cseq"),
        F.col("w"),
    ).select(
        "doc_id",
        "k",
        "media_ref",
        "anchor",
        "cseq",
        F.expr(
            f"array_join(slice(w, {nw} * cseq + 1, {nw}), ' ')"
        ).alias("sent_text"),
    ).select(
        "doc_id",
        "k",
        "media_ref",
        "cseq",
        "sent_text",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat("media_ref", F.lit("|"), "sent_text")),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("int")
            % 1000
            + F.when(F.col("cseq") == F.col("anchor"), _M08_BONUS)
            .otherwise(0)
        ).alias("score_milli"),
    )
    w1 = W.partitionBy("doc_id", "k").orderBy(
        F.col("score_milli").desc(), "cseq"
    )
    chosen = (
        scored.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w2 = W.partitionBy("doc_id", "cseq").orderBy(
        F.col("score_milli").desc(), "k"
    )
    return chosen.select(
        "doc_id",
        "media_ref",
        F.col("cseq").cast("int").alias("sent_seq"),
        F.col("sent_text").alias("caption"),
        F.col("score_milli").cast("int"),
        (F.row_number().over(w2) == 1).alias("kept"),
    )


# ---------------------------------------------------------------- m09
# Interleave profile + document gate — the structural filter every
# interleaved-corpus build runs before training (public: OBELICS
# filters image-wall documents; MMC4 caps images/doc): per document
# the media density, the longest consecutive media run, the
# text/media alternation count, and a keep verdict.  Runs entirely
# INSIDE the document row with array higher-order functions — a pure
# scan-side map, zero shuffle, embarrassingly parallel at any scale.
_M09_MAX_RUN = 2
_M09_LO, _M09_HI = 20, 500  # keep band, media permille


_M09_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
  FROM documents
),
base AS (
  SELECT doc_id,
         CAST((len(w) + {_M08_WORDS - 1}) // {_M08_WORDS} AS INTEGER)
           AS n_sent,
         {_m08_sql_int("CAST(doc_id AS VARCHAR)", 2)} % 3 + 1 AS n_media
  FROM d
),
anch AS (
  SELECT doc_id, n_sent, n_media,
         list_transform(generate_series(0, n_media - 1), k ->
           {_m08_sql_int(
               "CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR)", 4
           )} % n_sent) AS anchors
  FROM base
),
kinds AS (
  SELECT doc_id, n_sent, n_media,
         flatten(list_transform(generate_series(0, n_sent - 1), i ->
           list_prepend('text',
             list_transform(list_filter(anchors, a -> a = i),
                            a -> 'media')))) AS ks
  FROM anch
),
seq AS (
  SELECT doc_id, ks[u.i] AS kind, u.i
  FROM kinds, unnest(generate_series(1, len(ks))) AS u(i)
),
runs AS (
  SELECT doc_id,
         CAST(max(cnt) AS INTEGER) AS max_media_run
  FROM (
    SELECT doc_id, grp, count(*) AS cnt
    FROM (SELECT doc_id, i,
                 i - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY i) AS grp
          FROM seq WHERE kind = 'media')
    GROUP BY doc_id, grp)
  GROUP BY doc_id
),
alt AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN chg THEN 1 ELSE 0 END) AS INTEGER)
           AS n_alternations,
         max(CASE WHEN i = mx THEN kind END) = 'media'
           AS ends_with_media
  FROM (
    SELECT doc_id, kind, i,
           kind <> lag(kind) OVER (PARTITION BY doc_id ORDER BY i)
             AS chg,
           max(i) OVER (PARTITION BY doc_id) AS mx
    FROM seq)
  GROUP BY doc_id
)
SELECT k.doc_id,
       k.n_sent AS n_text,
       CAST(k.n_media AS INTEGER) AS n_media,
       CAST(k.n_sent + k.n_media AS INTEGER) AS n_spans,
       CAST(k.n_media * 1000 // (k.n_sent + k.n_media) AS INTEGER)
         AS media_permille,
       r.max_media_run,
       a.n_alternations,
       a.ends_with_media,
       (k.n_media * 1000 // (k.n_sent + k.n_media)
          BETWEEN {_M09_LO} AND {_M09_HI})
         AND r.max_media_run <= {_M09_MAX_RUN} AS keep
FROM kinds k
JOIN runs r USING (doc_id)
JOIN alt a USING (doc_id)
"""


@q("m09_interleave_profile", oracle=_M09_ORACLE)
def m09(spark, sf):
    """Interleave profile (OBELICS/MMC4-style structural gate): per
    interleaved document the text/media span counts, media density
    (integer permille), longest consecutive media run, alternation
    count, and the keep verdict (density in band, no media wall).

    Scale shape: the whole profile is computed with array
    higher-order functions INSIDE the document row — aggregate() for
    the run-length maximum, filter(sequence) for alternations — so
    the physical plan is scan -> project: ZERO shuffles, no window,
    no explode.  The DuckDB twin deliberately takes the relational
    route (unnest + gaps-and-islands windows) so the two engines
    cross-check each other's formulation."""
    nw = _M08_WORDS
    base = t(spark, sf, "documents").select(
        "doc_id",
        F.split(F.coalesce("text", F.lit("")), " ").alias("w"),
    ).select(
        "doc_id",
        F.expr(f"CAST((size(w) + {nw - 1}) div {nw} AS INT)").alias(
            "n_sent"
        ),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
                16,
                10,
            ).cast("int")
            % 3
            + 1
        ).alias("n_media"),
    )
    anchor_expr = (
        "transform(sequence(0, n_media - 1), k ->"
        " CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '#',"
        " CAST(k AS STRING))), 1, 4), 16, 10) AS INT) % n_sent)"
    )
    kinds = base.select(
        "doc_id",
        "n_sent",
        "n_media",
        F.expr(
            "flatten(transform(sequence(0, n_sent - 1), i ->"
            " concat(array('text'),"
            f" transform(filter({anchor_expr}, a -> a = i),"
            " a -> 'media'))))"
        ).alias("ks"),
    )
    run = (
        "aggregate(ks, named_struct('run', 0, 'best', 0), (acc, x) ->"
        " named_struct("
        "   'run',  IF(x = 'media', acc.run + 1, 0),"
        "   'best', greatest(acc.best, IF(x = 'media', acc.run + 1, 0))),"
        " acc -> acc.best)"
    )
    # size(ks) = n_sent + n_media >= 2 always (both counts >= 1), so
    # sequence(2, size(ks)) never descends.
    alt = (
        "size(filter(sequence(2, size(ks)), j ->"
        " element_at(ks, j) != element_at(ks, j - 1)))"
    )
    permille = "CAST(n_media * 1000 div (n_sent + n_media) AS INT)"
    return kinds.select(
        "doc_id",
        F.col("n_sent").alias("n_text"),
        F.col("n_media").cast("int"),
        (F.col("n_sent") + F.col("n_media")).cast("int").alias("n_spans"),
        F.expr(permille).alias("media_permille"),
        F.expr(run).cast("int").alias("max_media_run"),
        F.expr(alt).cast("int").alias("n_alternations"),
        F.expr("element_at(ks, size(ks)) = 'media'").alias(
            "ends_with_media"
        ),
        F.expr(
            f"{permille} BETWEEN {_M09_LO} AND {_M09_HI}"
            f" AND {run} <= {_M09_MAX_RUN}"
        ).alias("keep"),
    )


# ---------------------------------------------------------------- x18
# Composed interleaved image-text pair export — the end product of the
# multimodal curation funnel (what LAION/MMC4-style pair datasets ship):
# keep only documents that pass the m09 structural gate, then emit
# their m08-kept caption pairs as the training-pairs table.  The
# oracle composes the two member oracles (each independently
# hash-green) through the identical keep/kept algebra, so the export
# is value-hash-pinned end to end.
_X18_ORACLE = f"""
WITH pairs AS (
{_M08_ORACLE}
),
gate AS (
{_M09_ORACLE}
)
SELECT p.doc_id, p.media_ref, p.sent_seq, p.caption, p.score_milli,
       g.media_permille
FROM pairs p JOIN gate g ON g.doc_id = p.doc_id
WHERE p.kept AND g.keep
"""


@q("x18_interleaved_pairs", oracle=_X18_ORACLE)
def x18(spark, sf):
    """Interleaved image-text pair export: m09's structural gate
    (density band, no media walls) semi-joined onto m08's kept caption
    pairs — the composed pair-dataset product.

    Scale shape: both sides are doc/media-grain relations (tiny
    fractions of corpus bytes); the compose is ONE doc_id equi-join.
    The media_permille column rides along so downstream mixture
    sampling can stratify pairs by document media density without
    re-deriving the profile."""
    pairs = QUERIES["m08_caption_pair"](spark, sf).filter(F.col("kept"))
    gate = (
        QUERIES["m09_interleave_profile"](spark, sf)
        .filter(F.col("keep"))
        .select("doc_id", "media_permille")
    )
    return pairs.join(gate, "doc_id").select(
        "doc_id",
        "media_ref",
        "sent_seq",
        "caption",
        "score_milli",
        "media_permille",
    )


# ---------------------------------------------------------------- m10
# Two-budget multimodal sequence packing — t13's streaming
# concatenation packing extended with the budget interleaved training
# actually binds on: every image costs a fixed number of sequence
# positions (its visual-token patch count: Flamingo/IDEFICS-style
# encoders), and a sequence also caps the NUMBER of images.  A
# document opens a new bin when EITHER budget fills first:
# bin = greatest(token-start div BIN, image-start div IMG_CAP) over
# per-language cumulative sums — pure window math, deterministic in
# both engines.
_M10_BIN = 2048  # sequence positions per packed bin
_M10_IMG_COST = 64  # positions per image (visual tokens)
_M10_IMG_CAP = 8  # images per bin

_M10_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tok,
         {_m08_sql_int("CAST(doc_id AS VARCHAR)", 2)} % 3 + 1 AS n_media
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tok, n_media,
         n_tok + {_M10_IMG_COST} * n_media AS cost,
         sum(n_tok + {_M10_IMG_COST} * n_media)
           OVER w AS c_cost,
         sum(n_media) OVER w AS c_img
  FROM d
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT doc_id, lang,
       CAST(n_tok AS INTEGER) AS n_tok,
       CAST(n_media AS INTEGER) AS n_media,
       CAST(cost AS INTEGER) AS cost,
       CAST((c_cost - cost) // {_M10_BIN} AS INTEGER) AS bin_tok,
       CAST((c_img - n_media) // {_M10_IMG_CAP} AS INTEGER) AS bin_img,
       CAST(greatest((c_cost - cost) // {_M10_BIN},
                     (c_img - n_media) // {_M10_IMG_CAP}) AS INTEGER)
         AS bin
FROM c
"""


@q("m10_multimodal_packing", oracle=_M10_ORACLE)
def m10(spark, sf):
    """Two-budget multimodal packing: per-language streaming
    concatenation where each image costs {ic} sequence positions and a
    bin caps BOTH total positions ({bin}) and image count ({cap});
    bin = whichever budget the document's start position crosses
    first.

    Scale shape (t13's): ONE per-language Exchange; both cumulative
    sums share the same (lang, doc_id) window sort, so the second
    budget is free.  Per-shard packing is how production packing runs
    anyway — a global order would serialize the corpus."""
    from pyspark.sql import Window as W

    d = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
                16,
                10,
            ).cast("int")
            % 3
            + 1
        ).alias("n_media"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cost = F.col("n_tok") + _M10_IMG_COST * F.col("n_media")
    c = d.select(
        "doc_id",
        "lang",
        "n_tok",
        "n_media",
        cost.alias("cost"),
        F.sum(cost).over(w).alias("c_cost"),
        F.sum("n_media").over(w).alias("c_img"),
    )
    bin_tok = F.expr(f"(c_cost - cost) div {_M10_BIN}")
    bin_img = F.expr(f"(c_img - n_media) div {_M10_IMG_CAP}")
    return c.select(
        "doc_id",
        "lang",
        F.col("n_tok").cast("int"),
        F.col("n_media").cast("int"),
        F.col("cost").cast("int"),
        bin_tok.cast("int").alias("bin_tok"),
        bin_img.cast("int").alias("bin_img"),
        F.greatest(bin_tok, bin_img).cast("int").alias("bin"),
    )


m10.__doc__ = m10.__doc__.format(
    ic=_M10_IMG_COST, bin=_M10_BIN, cap=_M10_IMG_CAP
)
