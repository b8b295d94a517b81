"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; the scale path
is random-hyperplane LSH bucketing (candidates = one equi-join on the
bucket id instead of an n x n cross product). At 10^12 rows the
brute-force variant exists only for per-query probes against a small
broadcast query set; the LSH variant is the table-vs-table path.

All float outputs are rounded to 4 decimals and every ordering uses
the rounded value + vec_id tie-break, so Spark and the DuckDB oracle
select identical row sets.

The hyperplanes are deterministic module constants; the oracle SQL is
generated from the same constants (single source of truth).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 8
TOPK = 10
KNN_QUERIES = (0, 1, 2)
KNN_K = 5


def _plane(i: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1]^DIM."""
    out = []
    for j in range(DIM):
        h = int.from_bytes(
            hashlib.sha256(f"plane|{i}|{j}".encode()).digest()[:4], "big"
        )
        out.append(round(h / 2**31 - 1.0, 6))
    return out

PLANES = [_plane(i) for i in range(N_PLANES)]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z)


def _lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def _query_vec(spark, sf_dir, vec_id: int) -> list[float]:
    row = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") == vec_id)
        .select(F.col("embedding").cast("array<double>"))
        .first()
    )
    return list(row[0])


def _cos_to_query(df: DataFrame, qv: list[float]):
    q = _lit_vec(qv)
    return F.round(_dot(F.col("v"), q) / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(q, q))), 4)


# --- brute-force top-k ------------------------------------------------------

def q_sim_topk_bruteforce(spark, sf_dir):
    """Top-K cosine neighbors of vec 0: full scan + TakeOrdered (no
    shuffle beyond the final top-k reduce)."""
    qv = _query_vec(spark, sf_dir, 0)
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    return (
        emb.withColumn("cos", _cos_to_query(emb, qv))
        .select("vec_id", "cos")
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(TOPK)
    )


SQL_SIM_TOPK = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4) AS cos
FROM embeddings e, q WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id ASC LIMIT {TOPK}
"""


# --- kNN join over a broadcast query set -------------------------------------

def q_sim_knn_join(spark, sf_dir):
    """K nearest neighbors for each of a small query set: broadcast
    the queries, rank per query with a window — the
    many-queries-vs-big-table shape (queries always broadcastable)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin(list(KNN_QUERIES))).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(F.col("vec_id") != F.col("query_id"))
    pairs = pairs.withColumn(
        "cos",
        F.round(
            _dot(F.col("v"), F.col("qv"))
            / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
            4,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "vec_id", "cos", "rank")
    )


SQL_SIM_KNN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, KNN_QUERIES))})
), scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank
  FROM scored) WHERE rank <= {KNN_K}
"""


# --- LSH-bucketed ANN (the scale path) ---------------------------------------

def _bucket_col(v):
    """8-bit random-hyperplane signature of vector column ``v``."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(PLANES):
        out = out + F.when(_dot(v, _lit_vec(plane)) >= 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def q_sim_lsh_buckets(spark, sf_dir):
    """Bucket histogram — the partition-pruning structure of the ANN
    index (each bucket is an independently scannable cell)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.withColumn("bucket", _bucket_col(F.col("v")))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def _sql_dot(vec_expr: str, plane: list[float]) -> str:
    lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
    return f"list_dot_product({vec_expr}, {lit})"


def _sql_bucket(vec_expr: str) -> str:
    parts = [
        f"(CASE WHEN {_sql_dot(vec_expr, plane)} >= 0 THEN {2 ** i} ELSE 0 END)"
        for i, plane in enumerate(PLANES)
    ]
    return "(" + " + ".join(parts) + ")"


SQL_SIM_LSH_BUCKETS = f"""
SELECT CAST({_sql_bucket("embedding::DOUBLE[]")} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings GROUP BY 1
"""


def q_sim_lsh_ann(spark, sf_dir):
    """ANN candidates for query vec 0: only vectors in the query's LSH
    bucket are scored — the bucket equi-filter replaces the full scan
    (on a cluster: a partition-pruned read of one bucket cell)."""
    qv = _query_vec(spark, sf_dir, 0)
    qbucket = 0
    for i, plane in enumerate(PLANES):
        if sum(a * b for a, b in zip(qv, plane)) >= 0:
            qbucket += 2 ** i
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    bucketed = emb.withColumn("bucket", _bucket_col(F.col("v")))
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .withColumn("cos", _cos_to_query(bucketed, qv))
        .select("vec_id", "cos")
    )


def _sql_lsh_ann() -> str:
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {_sql_bucket("v")} AS b FROM q)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4) AS cos
FROM embeddings e, q, qb
WHERE e.vec_id <> 0 AND {_sql_bucket("e.embedding::DOUBLE[]")} = qb.b
"""


# --- IVF ANN (coarse quantizer + probed inverted lists) ----------------------

IVF_K = 16
IVF_NPROBE = 2
CENTROID_IDS = tuple(3 + 7 * i for i in range(IVF_K))


def _cos_cols(a, b):
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 4)


def q_sim_ivf_ann(spark, sf_dir):
    """IVF: a deterministic 16-centroid coarse quantizer (centroids =
    fixed vec_ids, broadcast); every vector is assigned to its nearest
    centroid (inverted lists); a query scores only the IVF_NPROBE
    nearest lists. At 10^12 rows the assignment is a write-time
    partition column (`PARTITIONED BY (cent_id)`) and a probe is a
    partition-pruned scan of nprobe/K of the table; here the same
    plan shape is a broadcast join + window argmin."""
    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.col("vec_id").isin(list(CENTROID_IDS))).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "cos_c", _cos_cols(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cent_id").asc())
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cent_id")
    )
    qv = _query_vec(spark, sf_dir, 0)
    q = _lit_vec(qv)
    wp = Window.orderBy(F.round(_dot(F.col("cv"), q) / (F.sqrt(_dot(F.col("cv"), F.col("cv"))) * F.sqrt(_dot(q, q))), 4).desc(), F.col("cent_id").asc())
    probes = (
        cents.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("cent_id")
    )
    return (
        assign.join(F.broadcast(probes), "cent_id")
        .filter(F.col("vec_id") != 0)
        .withColumn("cos", _cos_to_query(assign, qv))
        .select("vec_id", "cent_id", "cos")
    )


SQL_SIM_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cent_id, v AS cv FROM e
      WHERE vec_id IN ({", ".join(map(str, CENTROID_IDS))})),
assign AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
                      c.cent_id ASC) AS rn
    FROM e CROSS JOIN c) WHERE rn = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
probes AS (
  SELECT cent_id FROM (
    SELECT c.cent_id,
           row_number() OVER (ORDER BY
             round(list_cosine_similarity(c.cv, q.qv), 4) DESC,
             c.cent_id ASC) AS rn
    FROM c, q) WHERE rn <= {IVF_NPROBE}
)
SELECT a.vec_id, a.cent_id,
       round(list_cosine_similarity(a.v, q.qv), 4) AS cos
FROM assign a JOIN probes USING (cent_id) CROSS JOIN q
WHERE a.vec_id <> 0
"""


QUERIES = {
    "sim_topk_bruteforce": q_sim_topk_bruteforce,
    "sim_knn_join": q_sim_knn_join,
    "sim_lsh_buckets": q_sim_lsh_buckets,
    "sim_lsh_ann": q_sim_lsh_ann,
    "sim_ivf_ann": q_sim_ivf_ann,
}

ORACLES = {
    "sim_topk_bruteforce": SQL_SIM_TOPK,
    "sim_knn_join": SQL_SIM_KNN,
    "sim_lsh_buckets": SQL_SIM_LSH_BUCKETS,
    "sim_lsh_ann": _sql_lsh_ann(),
    "sim_ivf_ann": SQL_SIM_IVF,
}
