"""Training-data deduplication operators over the ``documents`` table.

Large-scale pipelines dedup before training; the reference (a per-document
extractor) has no cross-doc dedup, so these are the Spark-native additions
the north_star's 10^12-doc corpus needs.  Every operator is pure DataFrame
API (no Python UDFs) so Catalyst/Tungsten run the whole plan JVM-side, and
each has a DuckDB oracle twin.

Cross-engine portable primitives (identical in Spark and DuckDB):
  - tokens:   regexp_extract_all(lower(text), '[a-z0-9]+')
  - H32(s):   first 8 hex chars of md5(s) as a bigint
              Spark  conv(substring(md5(s),1,8),16,10)::bigint
              DuckDB ('0x' || substr(md5(s),1,8))::BIGINT
  - minhash:  lexicographic min over md5 hex strings (uniform => valid
              min-wise hash, no integer math needed)

Scale notes (100 TB): every step is shuffle-on-key with map-side partial
aggregation; candidate generation is banded LSH so the pairwise join is on
(band_id, band_key) buckets, never all-pairs; exact-jaccard verification
joins only LSH candidates.  Band rows r=2/bands b=8 are tuned for the tiny
test corpus -- at production scale raise r (e.g. 4x32) to keep bucket sizes
bounded; skewed buckets are then the only hotspot and AQE handles them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import SQL_NORM_HASH, norm_hash, spread, t

QUERIES = {}
ORACLE = {}


def q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle:
            ORACLE[name] = oracle
        return fn

    return reg


# ---------------------------------------------------------------- helpers
TOKEN_RE = "[a-z0-9]+"


def _tokens(col="text"):
    return F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_RE), 0)


def _h32(col):
    """Portable 32-bit hash of a string column (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


SQL_TOKENS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def sql_h32(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}),1,8))::BIGINT)"


def _shingles(tok_col="toks"):
    """Distinct word 3-grams from a token array (empty if < 3 tokens)."""
    expr = (
        f"array_distinct(transform(sequence(1, size({tok_col})-2), "
        f"i -> concat_ws(' ', {tok_col}[i-1], {tok_col}[i], {tok_col}[i+1])))"
    )
    return F.when(F.size(F.col(tok_col)) >= 3, F.expr(expr)).otherwise(
        F.array().cast("array<string>")
    )


SQL_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(toks)-2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)


def _doc_shingles(spark, sf):
    """(doc_id, lang, sh) exploded distinct word-3-gram shingles."""
    return (
        spread(t(spark, sf, "documents").select("doc_id", "lang", "text"))
        .select("doc_id", "lang", _tokens().alias("toks"))
        .select("doc_id", "lang", F.explode(_shingles()).alias("sh"))
    )


SQL_DOC_SHINGLES = f"""
  SELECT doc_id, lang, unnest({SQL_SHINGLES}) AS sh
  FROM (SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents)
"""


# ---------------------------------------------------------------- d01
@q(
    "d01_exact_dedup",
    oracle=f"""
SELECT {SQL_NORM_HASH.format(col="text")} AS norm_hash,
       min(doc_id) AS keeper_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def d01(spark, sf):
    """Exact dedup: hash-groupBy on whitespace-normalized text.

    Scale: one shuffle on a uniform 128-bit key; partial agg map-side;
    at 10^12 docs this is the cheapest possible dedup (no pairwise work).
    """
    d = t(spark, sf, "documents")
    return d.groupBy(norm_hash().alias("norm_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------- d02
_N_HASH = 16
_BANDS = 8  # 2 rows per band


def _sql_minhash_sig() -> str:
    mins = ",\n         ".join(
        f"min(md5({i} || '#' || sh)) AS h{i}" for i in range(_N_HASH)
    )
    return f"SELECT doc_id, {mins}\n  FROM doc_sh GROUP BY doc_id"


def _sql_bands(src: str = "sig") -> str:
    """Banded-signature arms over the source CTE ``src`` (parameterized
    so callers banding a differently-named signature CTE never resort
    to textual surgery on the template)."""
    arms = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {j} AS band_id,"
        f" md5(h{2 * j} || h{2 * j + 1}) AS band_key FROM {src}"
        for j in range(_BANDS)
    )
    return arms


@q(
    "d02_minhash_lsh_dedup",
    oracle=f"""
WITH doc_sh AS ({SQL_DOC_SHINGLES}),
sig AS ({_sql_minhash_sig()}),
bands AS ({_sql_bands()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN doc_sh sa ON sa.doc_id = c.doc_a
  JOIN doc_sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
""",
)
def d02(spark, sf):
    """MinHash+LSH near-dup: shingle -> 16 minhashes -> 8 banded buckets ->
    bucket self-join -> exact-Jaccard verify of candidates only.

    Minhash value = lexicographic min of md5('<seed>#'||shingle) hex strings
    (uniform hash => valid min-wise sampling, portable across engines).
    Scale: the only joins are equi-joins on band buckets and on shingles
    restricted to candidates; no all-pairs stage anywhere.  The exploded
    shingle table feeds four branches (signatures, sizes, both verify-join
    sides) -> persist it so tokenize+explode runs once; the production
    pipeline materializes it to storage between stages for the same reason.
    """
    doc_sh = _doc_shingles(spark, sf).drop("lang").persist()
    # sig is tiny (one row/doc) but expensive (16 min-aggs over the
    # shingle explosion) and feeds BOTH sides of the band self-join:
    # persist it or the aggregation runs twice.
    sig = doc_sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("sh")))).alias(f"h{i}")
            for i in range(_N_HASH)
        ]
    ).persist()
    stack_args = ", ".join(
        f"{j}, md5(concat(h{2 * j}, h{2 * j + 1}))" for j in range(_BANDS)
    )
    bands = sig.select(
        "doc_id",
        F.expr(f"stack({_BANDS}, {stack_args}) AS (band_id, band_key)"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa, sb = doc_sh.alias("sa"), doc_sh.alias("sb")
    inter = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.sh") == F.col("sa.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    return (
        inter.join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("za.n") + F.col("zb.n") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------- d03
_SIM_BITS = 16
_SIM_HAMMING = 3


def _sql_simhash() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN ({sql_h32('tok')} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SIM_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIM_BITS)
    )
    return f"""
toks AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS tok
  FROM documents
),
sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums)
"""


@q(
    "d03_simhash_dedup",
    oracle=f"""
WITH {_sql_simhash()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIM_HAMMING}
""",
)
def d03(spark, sf):
    """SimHash near-dup: 16-bit token-frequency simhash per doc, pairs at
    hamming distance <= 3.

    Scale: the fingerprint build is one shuffle; at 10^12 docs the pair
    stage would pivot to bucketing on (simhash >> k) prefixes instead of
    the demo self-join (same semantics, bounded buckets).
    """
    toks = (
        t(spark, sf, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .withColumn("h", _h32(F.col("tok")))
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {b}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_SIM_BITS)
        ]
    )
    fp_expr = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_SIM_BITS)
    )
    fp = sums.select(
        "doc_id", F.expr(f"CAST({fp_expr} AS BIGINT)").alias("simhash")
    )
    a, b = fp.alias("a"), fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= _SIM_HAMMING)
    )


# ---------------------------------------------------------------- d04
@q(
    "d04_ngram_jaccard_dedup",
    oracle=f"""
WITH doc_sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM doc_sh a
  JOIN doc_sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) >= 0.01
""",
)
def d04(spark, sf):
    """Exact n-gram Jaccard within a blocking key (lang): the inverted-index
    formulation -- join on shingle, never all-pairs.

    Scale: pair generation is an equi-join on (sh, lang); hot shingles are
    the skew risk -> production variant drops shingles with document
    frequency above a cap (they contribute ~0 to Jaccard), which also
    bounds the join fan-out.
    """
    doc_sh = _doc_shingles(spark, sf).persist()
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = doc_sh.alias("a"), doc_sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    jac = F.col("n_inter").cast("double") / (
        F.col("za.n") + F.col("zb.n") - F.col("n_inter")
    )
    return (
        inter.join(za, F.col("za.doc_id") == F.col("doc_a"))
        .join(zb, F.col("zb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.01)
    )


# ---------------------------------------------------------------- d05
@q(
    "d05_embedding_cosine_dedup",
    oracle="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= 0.25
""",
)
def d05(spark, sf):
    """Embedding-cosine near-dup within a blocking key (label).

    Cosine is computed JVM-side with higher-order array functions
    (zip_with + aggregate) -- no Python in the loop.  Scale: blocking key
    bounds the pair count; production variant blocks on LSH buckets
    (see s02) instead of a given label.
    """
    e = t(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    na = F.expr("sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x))")
    nb = F.expr("sqrt(aggregate(b.v, 0D, (acc, x) -> acc + x * x))")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot / (na * nb)).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.25)
    )


# ---------------------------------------------------------------- d06
@q(
    "d06_simhash_bucketed",
    oracle=f"""
WITH {_sql_simhash()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIM_HAMMING}
""",
)
def d06(spark, sf):
    """SimHash near-dup at scale: pigeonhole block bucketing instead of
    the all-pairs self-join (d03's documented production path -- same
    result set, so it shares d03's oracle).

    The 16-bit fingerprint splits into 4 disjoint 4-bit blocks; any pair
    within hamming distance <= 3 differs in at most 3 blocks, so it
    AGREEES on at least one block (pigeonhole).  Candidates = equi-join
    on (block_idx, block_value); the exact hamming filter then runs only
    on candidates.  At 10^12 docs each bucket holds N/2^4 docs per block
    -- production uses 64-bit fingerprints with 4x16-bit blocks, giving
    2^16 buckets per block and candidate sets ~N^2/2^18 of all-pairs.
    """
    toks = (
        t(spark, sf, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .withColumn("h", _h32(F.col("tok")))
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {b}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_SIM_BITS)
        ]
    )
    fp_expr = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_SIM_BITS)
    )
    fp = sums.select(
        "doc_id", F.expr(f"CAST({fp_expr} AS BIGINT)").alias("simhash")
    ).persist()
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.expr(
            "explode(transform(sequence(0, 3), "
            "i -> struct(i as blk, shiftright(simhash, i * 4) & 15 as val)))"
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.blk").alias("blk"),
             F.col("b.val").alias("val"))
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= _SIM_HAMMING)
        .distinct()
    )


# ---------------------------------------------------------------- d07
# Production-setting SimHash (the d06 docstring's scale configuration):
# 64-bit fingerprint, 4 x 16-bit pigeonhole blocks -> 2^16 buckets per
# block, candidate sets ~N^2/2^18 of all-pairs. The fingerprint is kept
# as FOUR 16-bit block-value columns (not one packed word): block values
# ARE the bucket join keys, and 16-bit blocks never touch the BIGINT
# sign bit in either engine. 64 hash bits come from two portable 32-bit
# md5-prefix hashes (module docstring H32, chars 1-8 and 9-16).
_WIDE_BLOCKS = 4
_WIDE_BLOCK_BITS = 16
_WIDE_HAMMING = 3


def _wide_bit_sql(b: int) -> str:
    src, sh = ("h1", b) if b < 32 else ("h2", b - 32)
    return f"(({src} >> {sh}) & 1)"


def _sql_wide_simhash() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN {_wide_bit_sql(b)} = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64)
    )
    blks = ",\n       ".join(
        "("
        + " + ".join(
            f"(CASE WHEN s{_WIDE_BLOCK_BITS * k + j} > 0 THEN {1 << j}"
            " ELSE 0 END)"
            for j in range(_WIDE_BLOCK_BITS)
        )
        + f") AS blk{k}"
        for k in range(_WIDE_BLOCKS)
    )
    return f"""
toks AS (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents),
bits AS (SELECT doc_id,
                (('0x' || substr(md5(tok),1,8))::BIGINT) AS h1,
                (('0x' || substr(md5(tok),9,8))::BIGINT) AS h2
         FROM toks),
sums AS (SELECT doc_id, {sums} FROM bits GROUP BY doc_id),
fp AS (SELECT doc_id,
       {blks}
       FROM sums)
"""


_SQL_WIDE_HAM = " + ".join(
    f"bit_count(xor(a.blk{k}, b.blk{k}))" for k in range(_WIDE_BLOCKS)
)


@q(
    "d07_simhash_wide",
    oracle=f"""
WITH {_sql_wide_simhash()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({_SQL_WIDE_HAM} AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE {_SQL_WIDE_HAM} <= {_WIDE_HAMMING}
""",
)
def d07(spark, sf):
    """SimHash near-dup at the production setting: 64-bit fingerprint,
    4 x 16-bit pigeonhole blocks. Any pair within hamming <= 3 agrees on
    at least one block, so candidates are the (block_idx, block_value)
    equi-join buckets; the exact hamming filter runs on candidates only.
    One fingerprint shuffle + one bounded-bucket join — the shape that
    survives 10^12 docs (d03 is the all-pairs demo twin; d06 the 16-bit
    oracle-parity variant)."""
    toks = (
        spread(t(spark, sf, "documents").select("doc_id", "text"))
        .select("doc_id", F.explode(_tokens()).alias("tok"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
            .cast("long")
            .alias("h1"),
            F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10)
            .cast("long")
            .alias("h2"),
        )
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"{_wide_bit_sql(b)} = 1"), 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    blk_exprs = [
        " + ".join(
            f"(CASE WHEN s{_WIDE_BLOCK_BITS * k + j} > 0 THEN {1 << j}"
            " ELSE 0 END)"
            for j in range(_WIDE_BLOCK_BITS)
        )
        for k in range(_WIDE_BLOCKS)
    ]
    fp = sums.select(
        "doc_id",
        *[F.expr(e).cast("long").alias(f"blk{k}") for k, e in enumerate(blk_exprs)],
    ).persist()
    blocks = fp.select(
        "doc_id",
        *[f"blk{k}" for k in range(_WIDE_BLOCKS)],
        F.expr(
            f"explode(transform(sequence(0, {_WIDE_BLOCKS - 1}),"
            " i -> struct(i as bi,"
            f" CASE i {' '.join(f'WHEN {k} THEN blk{k}' for k in range(_WIDE_BLOCKS))}"
            " END as bv)))"
        ).alias("b"),
    ).select(
        "doc_id",
        *[f"blk{k}" for k in range(_WIDE_BLOCKS)],
        F.col("b.bi").alias("bi"),
        F.col("b.bv").alias("bv"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.blk{k}").bitwiseXOR(F.col(f"b.blk{k}"))
        )
        for k in range(_WIDE_BLOCKS)
    )
    return (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _WIDE_HAMMING)
        .distinct()
    )


# ------------------------------------------------------------- d08
_D08_N = 8  # words per contamination n-gram
_D08_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
snip AS (SELECT w[5:24] AS s FROM w WHERE doc_id % 101 = 0),
eg AS (
  SELECT DISTINCT unnest(
    [array_to_string(s[i:i+7], ' ') for i in range(1, len(s) - 6)]
  ) AS g
  FROM snip WHERE len(s) >= 8
),
tg AS (
  SELECT doc_id, unnest(
    [array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]
  ) AS g
  FROM w WHERE len(w) >= 8
)
SELECT tg.doc_id, CAST(COUNT(DISTINCT tg.g) AS BIGINT) AS n_hits
FROM tg JOIN eg USING (g)
GROUP BY tg.doc_id
"""


@q("d08_decontaminate", oracle=_D08_ORACLE)
def d08(spark, sf):
    """Training-set decontamination: drop/flag training documents that
    share any length-8 word n-gram with a benchmark item (the standard
    eval-contamination rule used for LLM training corpora). The
    benchmark side is built deterministically from every 101st
    document's words 5-24 — a 'benchmark question' drawn from the
    corpus, so contamination is guaranteed non-trivial (the source doc
    and its duplicates overlap it).

    Scale shape: the eval gram set is benchmark-sized (MBs even for
    thousand-task suites), so it broadcasts; the 100-TB training side
    is a scan + generated-column explode filtered by the broadcast
    hash join — NO shuffle of the big side except the final per-doc
    count, which partial-aggregates map-side. At production the grams
    would be xxhash64-ed before the join (joining 64-bit ints, not
    strings); raw grams here keep the DuckDB twin collision-free.

    Emits (doc_id, n_hits) for contaminated docs only."""
    docs = t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    snip = (
        docs.filter(F.col("doc_id") % 101 == 0)
        .select(F.slice("w", 5, 20).alias("s"))
        .filter(F.size("s") >= _D08_N)
    )
    egrams = snip.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size(s) - {_D08_N - 1}),"
                f" i -> concat_ws(' ', slice(s, i, {_D08_N})))"
            )
        ).alias("g")
    ).distinct()
    tgrams = docs.filter(F.size("w") >= _D08_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {_D08_N - 1}),"
                f" i -> concat_ws(' ', slice(w, i, {_D08_N})))"
            )
        ).alias("g"),
    )
    return (
        tgrams.join(F.broadcast(egrams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


# ------------------------------------------------------------- d09
# Line-level boilerplate dedup (the RefinedWeb / CCNet rule, public):
# a "line" repeated across many documents is navigation/boilerplate
# ("subscribe to our newsletter", cookie banners) and is stripped from
# every document that carries it, preserving the order of the lines
# that remain.  documents.text carries no newlines, so — like t10/t11 —
# lines are synthesized deterministically: 10-word chunks, plus a
# shared boilerplate line injected at the FRONT of every doc_id % 3
# == 0 doc and a second one at the BACK of every doc_id % 5 == 0 doc.
_D09_DF = 20           # doc-frequency threshold: line is boilerplate
_D09_BP1 = "subscribe to our newsletter for updates"
_D09_BP2 = "copyright footer all rights reserved"


def _d09_lines_spark(d):
    """(doc_id, lines array<string>) with deterministic decoration."""
    d = d.withColumn("w", F.split("text", " ")).withColumn(
        "nl", F.expr("CAST(ceil(size(w) / 10.0) AS INT)")
    )
    return d.withColumn(
        "lines",
        F.expr(
            "concat("
            f" CASE WHEN doc_id % 3 = 0 THEN array('{_D09_BP1}')"
            "   ELSE array() END,"
            " transform(sequence(1, nl),"
            "   i -> array_join(slice(w, (i - 1) * 10 + 1, 10), ' ')),"
            f" CASE WHEN doc_id % 5 = 0 THEN array('{_D09_BP2}')"
            "   ELSE array() END)"
        ),
    ).select("doc_id", "lines")


_D09_LINES_SQL = f"""
dec AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(ceil(len(string_split(text, ' ')) / 10.0) AS INTEGER) AS nl
  FROM documents
),
docline AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN ['{_D09_BP1}'] ELSE [] END)
         || list_transform(generate_series(1, nl),
              i -> array_to_string(list_slice(w, (i-1)*10 + 1, i*10), ' '))
         || (CASE WHEN doc_id % 5 = 0 THEN ['{_D09_BP2}'] ELSE [] END)
           AS lines
  FROM dec
)
"""

_D09_ORACLE = f"""
WITH {_D09_LINES_SQL},
df AS (
  SELECT line, count(DISTINCT doc_id) AS n_docs
  FROM docline, unnest(lines) AS u(line)
  GROUP BY line HAVING count(DISTINCT doc_id) >= {_D09_DF}
),
bl AS (SELECT coalesce(list(line), []) AS bl FROM df)
SELECT doc_id,
       CAST(len(lines) AS INTEGER) AS n_lines,
       CAST(len(list_filter(lines, x -> list_contains(bl, x)))
            AS INTEGER) AS n_boiler,
       COALESCE(array_to_string(
         list_filter(lines, x -> NOT list_contains(bl, x)),
         chr(10)), '') AS clean_text
FROM docline, bl
"""


@q("d09_line_dedup", oracle=_D09_ORACLE)
def d09(spark, sf):
    """Line-level boilerplate removal (RefinedWeb/CCNet): strip every
    line whose document frequency >= {df} while preserving the order of
    the surviving lines, emitting per-doc line counts plus the cleaned
    text.

    Scale shape — the two-phase heavy-hitter pattern: phase 1 computes
    line -> doc-frequency with map-side partial aggregation (per-doc
    DISTINCT lines first, so a line repeated inside one doc counts
    once) and keeps only lines over the threshold — by construction a
    TINY relation (true boilerplate is a few thousand distinct lines
    even at 100 TB; at production the line would be xxhash64-ed and the
    threshold estimated by a count-min sketch to bound phase-1 state).
    Phase 2 folds that blocklist to ONE array row, broadcasts it, and
    filters each document's line array JVM-side (higher-order filter) —
    the big side is never shuffled and never exploded twice.  Order
    preservation is free: lines never leave their document row."""
    lines = _d09_lines_spark(
        t(spark, sf, "documents").select("doc_id", "text")
    )
    df = (
        lines.select(
            "doc_id", F.explode(F.array_distinct("lines")).alias("line")
        )
        .groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= _D09_DF)
    )
    bl = df.agg(
        F.coalesce(
            F.collect_list("line"), F.expr("array()")
        ).alias("bl")
    )
    return (
        lines.crossJoin(F.broadcast(bl))
        .select(
            "doc_id",
            F.size("lines").cast("int").alias("n_lines"),
            F.expr(
                "size(filter(lines, x -> array_contains(bl, x)))"
            ).cast("int").alias("n_boiler"),
            F.expr(
                "array_join(filter(lines,"
                " x -> NOT array_contains(bl, x)), '\n')"
            ).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------- d10
_D10_K = 8  # duplicated-substring length in words (Lee et al. use 50
#             BPE tokens; the short synthetic docs need a smaller k to
#             exercise the operator — same code path, any k)

_D10_ORACLE = f"""
WITH d AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w
           FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(w, i, i + {_D10_K - 1}), ' ') AS gram
  FROM d, unnest(CASE WHEN len(w) >= {_D10_K}
                      THEN generate_series(1, len(w) - {_D10_K - 1})
                      ELSE [] END) AS u(i)
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
  FROM g
),
cut AS (
  SELECT doc_id, count(*) AS n_dup_occ, list(pos ORDER BY pos) AS starts
  FROM occ WHERE rk >= 2 GROUP BY doc_id
),
cov AS (
  SELECT doc_id, n_dup_occ,
         list_distinct(flatten(list_transform(
           starts, p -> generate_series(p, p + {_D10_K - 1})))) AS covered
  FROM cut
)
SELECT d.doc_id,
       CAST(len(d.w) AS INTEGER) AS n_words,
       CAST(COALESCE(cov.n_dup_occ, 0) AS INTEGER) AS n_dup_occ,
       CAST(COALESCE(len(cov.covered), 0) AS INTEGER) AS n_cut_words,
       COALESCE(array_to_string(
         list_filter(d.w, (x, i) ->
           NOT list_contains(COALESCE(cov.covered, []), i)),
         ' '), '') AS clean_text
FROM d LEFT JOIN cov USING (doc_id)
"""


@q("d10_substring_dedup", oracle=_D10_ORACLE)
def d10(spark, sf):
    """Substring-level exact dedup (public: Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr): every {k}-word window that occurs more than once in
    the corpus — across documents OR within one — keeps only its FIRST
    occurrence (global (doc_id, pos) order); every later occurrence's
    word span is cut from its document.  Emits per-doc occurrence/word
    cut counts and the cleaned text with the survivors in original
    order.

    Spark-first shape replacing the paper's monolithic suffix array:
    (1) one narrow map builds rolling word windows per doc (positions
    ride along, no second scan); (2) ONE shuffle — the window
    row_number over gram — finds every non-first occurrence (at
    production the gram is a 128-bit hash, so the shuffle carries 16
    bytes + ids per window, and a df-capped heavy-hitter pass like
    d04's prunes degenerate grams first); (3) cut positions fold back
    to doc grain (second small shuffle, output-sized), where covered
    indices expand JVM-side (flatten/sequence) and the doc's word
    array is index-filtered in place — documents are never exploded
    to word grain for reassembly, so the big side shuffles only its
    duplicated window ids, never text."""
    d = t(spark, sf, "documents").select(
        "doc_id",
        F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("w"),
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(w) >= {_D10_K} THEN"
                f" transform(sequence(1, size(w) - {_D10_K - 1}),"
                f" i -> concat_ws(' ', slice(w, i, {_D10_K})))"
                f" ELSE CAST(array() AS array<string>) END"
            )
        ).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("gram").orderBy("doc_id", "pos")
    )
    cut = (
        grams.withColumn("rk", rk)
        .where(F.col("rk") >= 2)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_occ"),
            F.sort_array(F.collect_list("pos")).alias("starts"),
        )
    )
    cov = cut.select(
        "doc_id",
        "n_dup_occ",
        F.expr(
            f"array_distinct(flatten(transform("
            f"starts, p -> sequence(p, p + {_D10_K - 1}))))"
        ).alias("covered"),
    )
    return (
        d.join(cov, "doc_id", "left")
        .withColumn(
            "covered",
            F.coalesce("covered", F.expr("CAST(array() AS array<int>)")),
        )
        .select(
            "doc_id",
            F.size("w").cast("int").alias("n_words"),
            F.coalesce("n_dup_occ", F.lit(0)).cast("int").alias("n_dup_occ"),
            F.size("covered").cast("int").alias("n_cut_words"),
            F.expr(
                "array_join(filter(w,"
                " (x, i) -> NOT array_contains(covered, i + 1)), ' ')"
            ).alias("clean_text"),
        )
    )


# -------------------------------------------------------------- d11
@q(
    "d11_incremental_dedup",
    oracle="""
WITH k AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 5 THEN md5('__boilerplate__')
              WHEN doc_id % 2 = 1 AND doc_id % 13 = 3
                THEN md5('__batch_dup__')
              ELSE md5(text) END AS content_key,
         doc_id % 2 = 1 AS is_new
  FROM documents
),
prior AS (
  SELECT content_key, min(doc_id) AS prior_holder
  FROM k WHERE NOT is_new GROUP BY content_key
),
nw AS (
  SELECT doc_id, content_key,
         ROW_NUMBER() OVER (PARTITION BY content_key
                            ORDER BY doc_id) AS rn,
         MIN(doc_id) OVER (PARTITION BY content_key) AS batch_holder
  FROM k WHERE is_new
)
SELECT n.doc_id, n.content_key,
       CASE WHEN p.prior_holder IS NOT NULL THEN 'dup_prior'
            WHEN n.rn > 1 THEN 'dup_batch'
            ELSE 'kept' END AS verdict,
       CAST(COALESCE(p.prior_holder,
                     CASE WHEN n.rn > 1 THEN n.batch_holder
                          ELSE n.doc_id END) AS BIGINT) AS holder
FROM nw n LEFT JOIN prior p USING (content_key)
""",
)
def d11(spark, sf):
    """Incremental (snapshot-vs-index) exact dedup — the continuous-
    ingest pattern: a NEW batch of documents is deduplicated against
    the content-hash index of the PRIOR corpus AND within itself, so
    re-crawled pages never re-enter the corpus. Verdicts: 'dup_prior'
    (hash already indexed; holder = the indexed doc), 'dup_batch'
    (first seen in this batch by a lower doc_id), 'kept' (novel —
    these rows become the index increment for the next batch).

    The synthetic corpus has no cross-doc duplicate texts, so two
    deterministic collision classes are injected from doc_id (the t10
    decoration pattern, identical expression in both engines): a
    boilerplate key shared across prior+batch (doc_id % 11 = 5) and a
    batch-only key (odd doc_id % 13 = 3) — all three verdicts fire in
    any corpus slice. Prior/batch membership is doc_id parity.

    Scale shape: ONE shuffle on the content hash serves the
    prior-index left join AND the within-batch first-occurrence
    window (same key, the sort-merge join output stays partitioned).
    At 100 TB the prior index is a hash-bucketed table, so its side of
    the join needs no exchange at all, and the batch side — the small
    side in steady-state ingest — is the only thing shuffled."""
    boiler = F.md5(F.lit("__boilerplate__"))
    batchd = F.md5(F.lit("__batch_dup__"))
    k = t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 5, boiler)
        .when(
            (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 13 == 3),
            batchd,
        )
        .otherwise(F.md5("text"))
        .alias("content_key"),
        (F.col("doc_id") % 2 == 1).alias("is_new"),
    )
    prior = (
        k.filter(~F.col("is_new"))
        .groupBy("content_key")
        .agg(F.min("doc_id").alias("prior_holder"))
    )
    from pyspark.sql import Window as W

    wk = W.partitionBy("content_key").orderBy("doc_id")
    nw = (
        k.filter("is_new")
        .withColumn("rn", F.row_number().over(wk))
        .withColumn(
            "batch_holder",
            F.min("doc_id").over(W.partitionBy("content_key")),
        )
    )
    j = nw.join(prior, "content_key", "left")
    return j.select(
        "doc_id",
        "content_key",
        F.when(F.col("prior_holder").isNotNull(), "dup_prior")
        .when(F.col("rn") > 1, "dup_batch")
        .otherwise("kept")
        .alias("verdict"),
        F.coalesce(
            "prior_holder",
            F.when(F.col("rn") > 1, F.col("batch_holder")).otherwise(
                F.col("doc_id")
            ),
        )
        .cast("long")
        .alias("holder"),
    )


# ---------------------------------------------------------------- d12
# End-to-end fuzzy-dedup funnel — the production composition (cf.
# NeMo-Curator / BigCode dedup pipelines, public): MinHash+LSH candidate
# generation -> exact-Jaccard verification (both = d02) -> connected
# components of the verified near-dup graph -> keep the min doc_id per
# cluster.  d02 emits pairs, x05 clusters a different (inverted-index)
# edge set; this operator is the full funnel at DOC grain over the
# WHOLE corpus: singletons ride through as their own component.
_D12_TH = 0.02

_D12_ORACLE_TMPL = """
WITH RECURSIVE d02 AS ({d02}),
pairs AS (SELECT doc_a, doc_b FROM d02 WHERE jaccard >= {th}),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
  SELECT a, a FROM und UNION SELECT b, b FROM und
  UNION
  SELECT reach.node, und.b FROM reach JOIN und ON und.a = reach.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT doc_id, lang, component,
       CAST(count(*) OVER (PARTITION BY component) AS INTEGER) AS csize,
       (doc_id = component) AS keep
FROM (
  SELECT d.doc_id, d.lang, COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
"""


@q(
    "d12_fuzzy_dedup_funnel",
    oracle=_D12_ORACLE_TMPL.format(
        d02=ORACLE["d02_minhash_lsh_dedup"], th=_D12_TH
    ),
)
def d12(spark, sf):
    """Fuzzy-dedup funnel: LSH candidates -> verified pairs (d02) ->
    connected components -> one canonical survivor per cluster, emitted
    at doc grain over the whole corpus (singletons keep themselves).

    Scale shape: candidate generation and verification are d02's
    banded equi-joins (no all-pairs anywhere); clustering runs on the
    PAIR set (orders of magnitude smaller than the corpus) via
    min-label propagation with per-round lineage truncation; the final
    doc-grain left join is corpus-scan + broadcast-or-shuffle on the
    tiny label relation, and the cluster-size window shuffles doc ids
    only.  Keep policy (min doc_id per component) is the standard
    deterministic survivor rule.
    """
    from pyspark.sql import Window as W

    from .base import min_label_components

    pairs = QUERIES["d02_minhash_lsh_dedup"](spark, sf).filter(
        F.col("jaccard") >= _D12_TH
    )
    labels = min_label_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    d = t(spark, sf, "documents").select("doc_id", "lang")
    joined = d.join(
        labels, d.doc_id == labels.node, "left"
    ).select(
        "doc_id",
        "lang",
        F.coalesce("component", "doc_id").alias("component"),
    )
    wk = W.partitionBy("component")
    return joined.select(
        "doc_id",
        "lang",
        "component",
        F.count("*").over(wk).cast("int").alias("csize"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


# -------------------------------------------------------------- d13
# Incremental FUZZY dedup — d11's snapshot-vs-batch protocol applied
# to the MinHash+LSH family: the prior snapshot's BAND ROWS are the
# materialized LSH index (at production: a stored table keyed by
# (band_id, band_key)); a new batch computes its own bands, probes the
# index for batch-vs-prior candidates, self-joins for batch-vs-batch
# candidates, exact-Jaccard-verifies candidates only, and each new doc
# gets the d11 verdict: dup_prior (holder = smallest verified prior
# dup), dup_batch (holder = smallest verified smaller-id batch dup),
# else kept.  Integer milli Jaccard keeps the verify threshold exact
# cross-engine.
_D13_TH_MILLI = 20  # d12's 0.02 corpus-tuned verify threshold


_D13_ORACLE = f"""
WITH doc_sh AS ({SQL_DOC_SHINGLES}),
sig AS ({_sql_minhash_sig()}),
bands AS ({_sql_bands()}),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT b.doc_id AS new_id, p.doc_id AS old_id
  FROM bands b JOIN bands p
    ON p.band_id = b.band_id AND p.band_key = b.band_key
  WHERE b.doc_id % 2 = 1
    AND (p.doc_id % 2 = 0 OR p.doc_id < b.doc_id)
),
ver AS (
  SELECT c.new_id, c.old_id,
         CAST(1000 * count(*) //
              (za.n + zb.n - count(*)) AS INTEGER) AS jac_milli
  FROM cand c
  JOIN doc_sh sa ON sa.doc_id = c.new_id
  JOIN doc_sh sb ON sb.doc_id = c.old_id AND sb.sh = sa.sh
  JOIN sizes za ON za.doc_id = c.new_id
  JOIN sizes zb ON zb.doc_id = c.old_id
  GROUP BY c.new_id, c.old_id, za.n, zb.n
),
hit AS (SELECT * FROM ver WHERE jac_milli >= {_D13_TH_MILLI}),
roll AS (
  SELECT new_id,
         min(CASE WHEN old_id % 2 = 0 THEN old_id END) AS prior_holder,
         min(CASE WHEN old_id % 2 = 1 THEN old_id END) AS batch_holder,
         max(jac_milli) AS best_jac_milli
  FROM hit GROUP BY new_id
)
SELECT d.doc_id,
       CASE WHEN r.prior_holder IS NOT NULL THEN 'dup_prior'
            WHEN r.batch_holder IS NOT NULL THEN 'dup_batch'
            ELSE 'kept' END AS verdict,
       CAST(COALESCE(r.prior_holder, r.batch_holder, d.doc_id)
            AS BIGINT) AS holder,
       CAST(COALESCE(r.best_jac_milli, 0) AS INTEGER) AS best_jac_milli
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN roll r ON r.new_id = d.doc_id
"""


@q("d13_incremental_lsh", oracle=_D13_ORACLE)
def d13(spark, sf):
    """Incremental MinHash+LSH dedup: a new batch (odd doc_id) probes
    the prior snapshot's materialized band index (even doc_id) and
    itself, exact-verifies candidates only, and each new doc gets the
    dup_prior / dup_batch / kept verdict with its canonical holder.

    Scale shape: the index probe is the SAME (band_id, band_key)
    equi-join as d02 — at production the prior bands are a stored
    table, so only the BATCH side computes signatures each run
    (incremental cost is O(batch), not O(corpus)); the verify joins
    touch candidates only; the verdict rollup is one new_id-grain
    aggregate.  The shingle relation feeds signatures + both verify
    sides — persisted, like d02."""
    doc_sh = _doc_shingles(spark, sf).drop("lang").persist()
    sig = doc_sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}#"), F.col("sh")))
            ).alias(f"h{i}")
            for i in range(_N_HASH)
        ]
    )
    stack = ", ".join(
        f"{j}, md5(concat(h{2 * j}, h{2 * j + 1}))" for j in range(_BANDS)
    )
    bands = sig.select(
        "doc_id",
        F.expr(f"stack({_BANDS}, {stack})").alias("band_id", "band_key"),
    ).persist()
    b, p = bands.alias("b"), bands.alias("p")
    cand = (
        b.filter(F.col("b.doc_id") % 2 == 1)
        .join(
            p,
            (F.col("p.band_id") == F.col("b.band_id"))
            & (F.col("p.band_key") == F.col("b.band_key")),
        )
        .filter(
            (F.col("p.doc_id") % 2 == 0)
            | (F.col("p.doc_id") < F.col("b.doc_id"))
        )
        .select(
            F.col("b.doc_id").alias("new_id"),
            F.col("p.doc_id").alias("old_id"),
        )
        .distinct()
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa, sb = doc_sh.alias("sa"), doc_sh.alias("sb")
    ver = (
        cand.join(sa, F.col("sa.doc_id") == F.col("new_id"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("old_id"))
            & (F.col("sb.sh") == F.col("sa.sh")),
        )
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("n_inter"))
        .join(sizes.withColumnRenamed("doc_id", "new_id"), "new_id")
        .withColumnRenamed("n", "na")
        .join(sizes.withColumnRenamed("doc_id", "old_id"), "old_id")
        .withColumnRenamed("n", "nb")
        .select(
            "new_id",
            "old_id",
            F.expr(
                "CAST(1000 * n_inter div (na + nb - n_inter) AS INT)"
            ).alias("jac_milli"),
        )
        .filter(F.col("jac_milli") >= _D13_TH_MILLI)
    )
    roll = ver.groupBy("new_id").agg(
        F.min(
            F.when(F.col("old_id") % 2 == 0, F.col("old_id"))
        ).alias("prior_holder"),
        F.min(
            F.when(F.col("old_id") % 2 == 1, F.col("old_id"))
        ).alias("batch_holder"),
        F.max("jac_milli").alias("best_jac_milli"),
    )
    new_docs = t(spark, sf, "documents").filter(
        F.col("doc_id") % 2 == 1
    ).select("doc_id")
    return new_docs.join(
        roll, new_docs.doc_id == roll.new_id, "left"
    ).select(
        "doc_id",
        F.when(F.col("prior_holder").isNotNull(), "dup_prior")
        .when(F.col("batch_holder").isNotNull(), "dup_batch")
        .otherwise("kept")
        .alias("verdict"),
        F.coalesce("prior_holder", "batch_holder", "doc_id")
        .cast("long")
        .alias("holder"),
        F.coalesce("best_jac_milli", F.lit(0))
        .cast("int")
        .alias("best_jac_milli"),
    )


# -------------------------------------------------------------- d14
# LSH quality audit (public: the banding S-curve analysis from Mining
# of Massive Datasets ch.3 — every LSH deployment validates its
# (bands, rows) choice empirically): compare d02's banded CANDIDATE
# pairs against the exact-Jaccard TRUTH pairs at the verify
# threshold, per pair — the false-negative pairs (truth the bands
# missed) and false-positive candidates (bucket collisions below
# threshold) are exactly what the S-curve trades.  Truth enumeration
# rides the inverted-index join (only pairs sharing >= 1 shingle can
# have jac > 0 — d04's machinery and its df-cap note apply at
# scale); no all-pairs stage anywhere.
_D14_TH_MILLI = 20  # the d12/d13 verify threshold


_D14_ORACLE = f"""
WITH doc_sh AS ({SQL_DOC_SHINGLES}),
sig AS ({_sql_minhash_sig()}),
bands AS ({_sql_bands()}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
shared AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
  FROM doc_sh sa
  JOIN doc_sh sb ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT s.doc_a, s.doc_b,
         CAST(1000 * s.n_inter //
              (za.n + zb.n - s.n_inter) AS INTEGER) AS jac_milli
  FROM shared s
  JOIN sizes za ON za.doc_id = s.doc_a
  JOIN sizes zb ON zb.doc_id = s.doc_b
),
uni AS (
  SELECT COALESCE(j.doc_a, c.doc_a) AS doc_a,
         COALESCE(j.doc_b, c.doc_b) AS doc_b,
         COALESCE(j.jac_milli, 0) AS jac_milli,
         COALESCE(j.jac_milli, 0) >= {_D14_TH_MILLI} AS is_truth,
         c.doc_a IS NOT NULL AS is_cand
  FROM jac j FULL JOIN cand c
    ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
)
SELECT doc_a, doc_b, jac_milli, is_truth, is_cand
FROM uni WHERE is_truth OR is_cand
"""


@q("d14_lsh_quality", oracle=_D14_ORACLE)
def d14(spark, sf):
    """LSH parameter validation: every pair that is exact-Jaccard
    truth (>= the verify threshold) OR a banded candidate, flagged
    with both memberships and its exact milli Jaccard — recall
    misses (truth without candidate) and bucket false positives
    (candidate below threshold) are read directly off the flags,
    which is how a production pipeline validates its (bands, rows)
    choice against the S-curve before committing to an index build.

    Scale shape: candidates are d02's banded equi-join; truth pairs
    come from the shingle inverted-index join (pairs sharing >= 1
    shingle only; d04's df-cap prunes degenerate shingles at scale);
    ONE full outer join at pair grain merges the two sets.  The
    shingle relation feeds signatures, sizes, and the truth join —
    persisted once, like d02."""
    doc_sh = _doc_shingles(spark, sf).drop("lang").persist()
    sig = doc_sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}#"), F.col("sh")))
            ).alias(f"h{i}")
            for i in range(_N_HASH)
        ]
    )
    stack_args = ", ".join(
        f"{j}, md5(concat(h{2 * j}, h{2 * j + 1}))" for j in range(_BANDS)
    )
    bands = sig.select(
        "doc_id",
        F.expr(f"stack({_BANDS}, {stack_args}) AS (band_id, band_key)"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa, sb = doc_sh.alias("sa"), doc_sh.alias("sb")
    jac = (
        sa.join(
            sb,
            (F.col("sb.sh") == F.col("sa.sh"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_inter"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n", "na")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n", "nb")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(1000 * n_inter div (na + nb - n_inter) AS INT)"
            ).alias("jac_milli"),
        )
    )
    j, c = jac.alias("j"), cand.alias("c")
    uni = j.join(
        c,
        (F.col("c.doc_a") == F.col("j.doc_a"))
        & (F.col("c.doc_b") == F.col("j.doc_b")),
        "full",
    ).select(
        F.coalesce("j.doc_a", "c.doc_a").alias("doc_a"),
        F.coalesce("j.doc_b", "c.doc_b").alias("doc_b"),
        F.coalesce("j.jac_milli", F.lit(0)).alias("jac_milli"),
        (
            F.coalesce("j.jac_milli", F.lit(0)) >= _D14_TH_MILLI
        ).alias("is_truth"),
        F.col("c.doc_a").isNotNull().alias("is_cand"),
    )
    return uni.filter(F.col("is_truth") | F.col("is_cand"))


# -------------------------------------------------------------- d15
# b-bit minwise hashing (public: Li & König 2010, "b-Bit Minwise
# Hashing") — the signature-compression production trick: store only
# the LOWEST bit of each of 64 minhashes, packed into two 32-bit
# words per document (~32x smaller than the full md5 signatures),
# and estimate resemblance from bit agreement with the b=1 closed
# form E[agree/n] = (1+J)/2  =>  J_est = 2*agree/n - 1, where
# agree = 64 - popcount(xor(words)) — the production estimator
# spelled identically in BOTH engines.  The audit runs it against
# EXACT Jaccard on d02's candidate pairs, integer milli throughout.
_D15_N = 64  # minhashes (bits per signature)


def _d15_word_sql(lo: int) -> str:
    """DuckDB: 32 parity bits of per-seed minimum md5s, packed."""
    return " + ".join(
        f"(('0x' || substr(min(md5({lo + i} || '#' || sh)), 32, 1))"
        f"::BIGINT % 2) * {1 << i}"
        for i in range(32)
    )


_D15_ORACLE = f"""
WITH doc_sh AS ({SQL_DOC_SHINGLES}),
sig AS (
  SELECT doc_id, {_d15_word_sql(0)} AS w0, {_d15_word_sql(32)} AS w1
  FROM doc_sh GROUP BY doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
msig AS ({_sql_minhash_sig()}),
bands AS ({_sql_bands(src="msig")}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         {_D15_N} - bit_count(xor(sa.w0, sb.w0))
                  - bit_count(xor(sa.w1, sb.w1)) AS n_agree
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
),
exact AS (
  SELECT c.doc_a, c.doc_b,
         CAST(1000 * count(*) //
              (za.n + zb.n - count(*)) AS BIGINT) AS jac_milli
  FROM cand c
  JOIN doc_sh sa ON sa.doc_id = c.doc_a
  JOIN doc_sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  JOIN sizes za ON za.doc_id = c.doc_a
  JOIN sizes zb ON zb.doc_id = c.doc_b
  GROUP BY c.doc_a, c.doc_b, za.n, zb.n
)
SELECT a.doc_a, a.doc_b, CAST(a.n_agree AS INTEGER) AS n_agree,
       CAST(2000 * a.n_agree // {_D15_N} - 1000 AS BIGINT)
         AS est_milli,
       COALESCE(x.jac_milli, 0) AS jac_milli,
       CAST(2000 * a.n_agree // {_D15_N} - 1000
            - COALESCE(x.jac_milli, 0) AS BIGINT) AS err_milli
FROM agree a
LEFT JOIN exact x ON x.doc_a = a.doc_a AND x.doc_b = a.doc_b
"""


@q("d15_bbit_minhash", oracle=_D15_ORACLE)
def d15(spark, sf):
    """b-bit minwise signatures: 64 one-bit minhashes per document
    packed into two 32-bit words (the at-rest form, ~32x smaller
    than full md5 signatures), the closed-form resemblance estimate
    J = 2*agree/64 - 1 with agree = 64 - popcount(xor) per candidate
    pair, and its milli error against exact Jaccard — the
    compression-vs-accuracy audit run before swapping full
    signatures for b-bit ones.

    Scale shape: signatures are ONE groupBy over the shingle stream
    (64 min-aggs folded straight into two packed words — nothing
    wider than (doc_id, w0, w1) ever shuffles or joins); agreement
    is popcount(xor) on the two-word join, the production estimator
    verbatim; the exact side reuses d02's candidate-restricted
    verify joins."""
    doc_sh = _doc_shingles(spark, sf).drop("lang").persist()

    def word(lo):
        return " + ".join(
            f"(CAST(conv(substring(min(md5(concat('{lo + i}', '#',"
            f" sh))), 32, 1), 16, 10) AS BIGINT) % 2) * {1 << i}"
            for i in range(32)
        )

    sig = doc_sh.groupBy("doc_id").agg(
        F.expr(word(0)).alias("w0"), F.expr(word(32)).alias("w1")
    )
    msig = doc_sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}#"), F.col("sh")))
            ).alias(f"h{i}")
            for i in range(_N_HASH)
        ]
    )
    stack_args = ", ".join(
        f"{j}, md5(concat(h{2 * j}, h{2 * j + 1}))" for j in range(_BANDS)
    )
    bands = msig.select(
        "doc_id",
        F.expr(f"stack({_BANDS}, {stack_args}) AS (band_id, band_key)"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("w0").alias("aw0"),
        F.col("w1").alias("aw1"),
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("w0").alias("cw0"),
        F.col("w1").alias("cw1"),
    )
    agree = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"CAST({_D15_N} - bit_count(aw0 ^ cw0)"
                f" - bit_count(aw1 ^ cw1) AS INT)"
            ).alias("n_agree"),
        )
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    xa, xb = doc_sh.alias("xa"), doc_sh.alias("xb")
    exact = (
        cand.join(xa, F.col("xa.doc_id") == F.col("doc_a"))
        .join(
            xb,
            (F.col("xb.doc_id") == F.col("doc_b"))
            & (F.col("xb.sh") == F.col("xa.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n", "na")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n", "nb")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(1000 * n_inter div (na + nb - n_inter) AS BIGINT)"
            ).alias("jac_milli"),
        )
    )
    est = F.expr(f"CAST(2000 * n_agree div {_D15_N} - 1000 AS BIGINT)")
    return agree.join(exact, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        "n_agree",
        est.alias("est_milli"),
        F.coalesce("jac_milli", F.lit(0)).alias("jac_milli"),
        (est - F.coalesce("jac_milli", F.lit(0)))
        .cast("long")
        .alias("err_milli"),
    )
