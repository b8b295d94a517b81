"""Deduplication family for large-scale corpus curation.

Beyond the reference's operator set (its dedup is the S4 filename
window, SURVEY.md §2.1), a 100 TB training-data pipeline needs
content-level dedup. Five strategies, each Spark-first:

  * exact        — hash-groupBy on md5(text); map-side partial agg,
                   one shuffle on the hash key.
  * n-gram Jaccard — word-bigram shingles, exploded + self-joined on
                   shingle, pair-level intersection counts vs a
                   pre-aggregated per-doc shingle count (broadcast).
                   Quadratic only within shingle buckets, never a full
                   cross join.
  * MinHash+LSH  — K min-hash signatures (lexicographic min of keyed
                   md5 over shingles — string mins, portable to any
                   SQL engine), banded into B buckets; candidate pairs
                   are an equi-join on (band_id, band_key). This is
                   the scale path: cost ~ bucket sizes, not n².
  * SimHash      — 16-bit simhash from per-word md5 bits (bitwise agg
                   in pure Catalyst expressions); near-dup candidates
                   = pairs with hamming distance <= 2 via bit_count(xor).
  * embedding    — cosine near-dup pairs over the embeddings table
                   (see similarity.py for the ANN machinery).

At 10^12 docs: exact/minhash/simhash shuffle once on a well-spread
key; the Jaccard self-join is bounded by shingle-frequency capping
(drop shingles that occur in > MAX_DF docs — standard posting-list
pruning, applied here too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MAX_DF = 50  # drop shingles occurring in more docs than this (posting cap)
JACCARD_THRESHOLD = 0.5
MINHASH_K = 4  # 2 bands x 2 rows
SIM_BITS = 16
HAMMING_MAX = 2


def _docs(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if spread:
        # Pre-explode hash partitioning on the groupBy key: the shingle
        # explode fans each doc into ~n_words rows, and the signature
        # groupBy(doc_id) that follows would shuffle that fan-out. By
        # partitioning on doc_id *before* the explode, the exploded
        # output keeps hashpartitioning(doc_id) and the aggregation
        # needs no second exchange — the only shuffled rows are the
        # small pre-explode docs. At 10^12 docs this is the difference
        # between shuffling docs and shuffling shingles (~100x).
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, "doc_id")
    return df


def _shingles_col():
    """Distinct word-bigram shingles of ``text`` (JVM-side).

    zip_with over two slices beats transform(sequence, element_at) ~2x
    in interpreted higher-order-function eval (no per-element index
    array or bounds-checked element_at)."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    return F.array_distinct(
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )


# --- exact dedup -----------------------------------------------------------

def q_dd_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
    )


SQL_DD_EXACT = """
SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
"""


# --- n-gram Jaccard ---------------------------------------------------------

def q_dd_ngram_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir, spread=True).select("doc_id", _shingles_col().alias("sh"))
    sizes = docs.select("doc_id", F.size("sh").alias("n_sh"))
    posting = (
        docs.select("doc_id", F.explode("sh").alias("s"))
        # posting-list cap: drop ubiquitous shingles (bounded join fan-out)
        .withColumn("df", F.count("*").over(Window.partitionBy("s")))
        .filter(F.col("df") <= MAX_DF)
        .select("doc_id", "s")
    )
    a = posting.alias("a")
    b = posting.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    out = (
        inter.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("d1", "d2", "jaccard")
    )
    return out


SQL_DD_JACCARD = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS s
  FROM documents
), sizes AS (
  SELECT doc_id, len(s) AS n_sh FROM sh
), posting AS (
  SELECT doc_id, unnest(s) AS s FROM sh
), capped AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM posting)
  WHERE df <= {MAX_DF}
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, round(n_inter::DOUBLE / (s1.n_sh + s2.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE round(n_inter::DOUBLE / (s1.n_sh + s2.n_sh - n_inter), 4) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH -----------------------------------------------------------

def _minhash_sigs(docs: DataFrame) -> DataFrame:
    """K lexicographic-min keyed-md5 signatures per doc (string mins —
    portable, no hash-function mismatch between engines)."""
    exploded = docs.select("doc_id", F.explode(_shingles_col()).alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")).cast("binary"))).alias(f"sig{i}")
        for i in range(MINHASH_K)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def q_dd_minhash_sigs(spark, sf_dir):
    return _minhash_sigs(_docs(spark, sf_dir, spread=True))


SQL_DD_MINHASH_SIGS = """
WITH posting AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(string_split(text, ' '))),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))) AS s
  FROM documents
)
SELECT doc_id,
       min(md5('0|' || s)) AS sig0, min(md5('1|' || s)) AS sig1,
       min(md5('2|' || s)) AS sig2, min(md5('3|' || s)) AS sig3
FROM posting GROUP BY doc_id
"""


def q_dd_minhash_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs: 2 bands of 2 rows; a pair is a candidate
    when it collides in either band. The join key is (band, key) so
    the shuffle spreads across bands — no n² compare."""
    sigs = _minhash_sigs(_docs(spark, sf_dir, spread=True))
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("b0|"), "sig0", F.lit("|"), "sig1"),
                F.concat(F.lit("b1|"), "sig2", F.lit("|"), "sig3"),
            )
        ).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


SQL_DD_MINHASH_LSH = """
WITH posting AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(string_split(text, ' '))),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]))) AS s
  FROM documents
), sigs AS (
  SELECT doc_id,
         min(md5('0|' || s)) AS sig0, min(md5('1|' || s)) AS sig1,
         min(md5('2|' || s)) AS sig2, min(md5('3|' || s)) AS sig3
  FROM posting GROUP BY doc_id
), bands AS (
  SELECT doc_id, 'b0|' || sig0 || '|' || sig1 AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, 'b1|' || sig2 || '|' || sig3 AS band_key FROM sigs
)
SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


# --- SimHash ------------------------------------------------------------------

def _simhash_col():
    """16-bit simhash over the word multiset: bit k of the result is 1
    when more words hash (md5 16-bit prefix) with bit k set than not.
    Pure Catalyst: transform + aggregate over a sequence of bits."""
    words = F.split(F.col("text"), " ")
    hashes = F.transform(
        words,
        lambda w: F.conv(F.substring(F.md5(w.cast("binary")), 1, 4), 16, 10).cast("long"),
    )
    def bit_vote(b):
        ones = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)),
        )
        return F.when(ones * 2 >= F.size(words), F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
    out = F.lit(0).cast("long")
    for b in range(SIM_BITS):
        out = out + bit_vote(b)
    return out


def q_dd_simhash(spark, sf_dir):
    return _docs(spark, sf_dir, spread=True).select("doc_id", _simhash_col().alias("simhash"))


def _simhash_sql_expr() -> str:
    bits = []
    for b in range(SIM_BITS):
        bits.append(
            f"(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> {b}) & 1)) "
            f">= len(hs) THEN {2 ** b} ELSE 0 END)"
        )
    return " + ".join(bits)


SQL_DD_SIMHASH = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> ('0x' || substr(md5(w), 1, 4))::BIGINT) AS hs
  FROM documents
)
SELECT doc_id, CAST({_simhash_sql_expr()} AS BIGINT) AS simhash FROM h
"""


def q_dd_simhash_pairs(spark, sf_dir):
    sigs = q_dd_simhash(spark, sf_dir)
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"), "hamming")
    )


SQL_DD_SIMHASH_PAIRS = f"""
WITH s AS ({SQL_DD_SIMHASH})
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
"""


# --- embedding cosine near-dup ------------------------------------------------

def q_dd_embedding_neardup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
    )
    norm = lambda x: F.sqrt(dot(x, x))  # noqa: E731
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (norm(F.col("a.v")) * norm(F.col("b.v"))), 4
            ),
        )
        .filter(F.col("cos") >= 0.3)
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"), "cos")
    )


SQL_DD_EMB = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       round(list_cosine_similarity(a.v, b.v), 4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3
"""


QUERIES = {
    "dd_exact": q_dd_exact,
    "dd_ngram_jaccard": q_dd_ngram_jaccard,
    "dd_minhash_sigs": q_dd_minhash_sigs,
    "dd_minhash_lsh_pairs": q_dd_minhash_lsh_pairs,
    "dd_simhash": q_dd_simhash,
    "dd_simhash_pairs": q_dd_simhash_pairs,
    "dd_embedding_neardup": q_dd_embedding_neardup,
}

ORACLES = {
    "dd_exact": SQL_DD_EXACT,
    "dd_ngram_jaccard": SQL_DD_JACCARD,
    "dd_minhash_sigs": SQL_DD_MINHASH_SIGS,
    "dd_minhash_lsh_pairs": SQL_DD_MINHASH_LSH,
    "dd_simhash": SQL_DD_SIMHASH,
    "dd_simhash_pairs": SQL_DD_SIMHASH_PAIRS,
    "dd_embedding_neardup": SQL_DD_EMB,
}
