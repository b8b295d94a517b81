"""Text-analysis operators for corpus curation: language ID, quality
scoring, token counting, document fingerprinting.

All four stay entirely JVM-side (split/filter/aggregate higher-order
functions — whole-stage codegen, no Python in the hot path), which is
the difference between "works" and "works at 100 TB" for per-document
scalar features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EN_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
DE_STOP = ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"]

BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
FP_MOD = 1_000_000_007
FP_BASE = 31


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _words():
    return F.split(F.col("text"), " ")


def _stop_hits(stoplist: list[str]):
    arr = F.array(*[F.lit(w) for w in stoplist])
    return F.size(F.filter(_words(), lambda w: F.array_contains(arr, w)))


# --- token counting ----------------------------------------------------------

def q_ta_token_count(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(_words()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


SQL_TA_TOKENS = rf"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars
FROM documents
"""


# --- quality scoring -----------------------------------------------------------

def q_ta_quality(spark, sf_dir):
    words = _words()
    n_tokens = F.size(words)
    n_chars_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    stop_ratio = F.round(_stop_hits(EN_STOP) / n_tokens, 4)
    avg_len = F.round(n_chars_nospace / n_tokens, 4)
    return _docs(spark, sf_dir).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ((n_tokens >= 20) & (n_tokens <= 500) & (stop_ratio >= 0.05)).alias("passes_quality"),
    )


_EN_LIST = ", ".join(f"'{w}'" for w in EN_STOP)

SQL_TA_QUALITY = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         length(replace(text, ' ', '')) AS nc
  FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS INT) AS n_tokens,
       round(nc::DOUBLE / len(ws), 4) AS avg_token_len,
       round(len(list_filter(ws, w -> w IN ({_EN_LIST})))::DOUBLE / len(ws), 4)
           AS stopword_ratio,
       (len(ws) >= 20 AND len(ws) <= 500
        AND round(len(list_filter(ws, w -> w IN ({_EN_LIST})))::DOUBLE / len(ws), 4) >= 0.05)
           AS passes_quality
FROM t
"""


# --- language ID (stopword-hit heuristic) ---------------------------------------

def q_ta_lang_id(spark, sf_dir):
    en, de, fr = _stop_hits(EN_STOP), _stop_hits(DE_STOP), _stop_hits(FR_STOP)
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("agrees_with_label"),
    )


def _hits_sql(stoplist: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in stoplist)
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({lst})))"


SQL_TA_LANG = f"""
SELECT doc_id,
       CAST({_hits_sql(EN_STOP)} AS INT) AS en_hits,
       CAST({_hits_sql(DE_STOP)} AS INT) AS de_hits,
       CAST({_hits_sql(FR_STOP)} AS INT) AS fr_hits,
       CASE WHEN {_hits_sql(EN_STOP)} >= {_hits_sql(DE_STOP)}
             AND {_hits_sql(EN_STOP)} >= {_hits_sql(FR_STOP)}
             AND {_hits_sql(EN_STOP)} > 0 THEN 'en'
            WHEN {_hits_sql(DE_STOP)} >= {_hits_sql(FR_STOP)}
             AND {_hits_sql(DE_STOP)} > 0 THEN 'de'
            WHEN {_hits_sql(FR_STOP)} > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred,
       (CASE WHEN {_hits_sql(EN_STOP)} >= {_hits_sql(DE_STOP)}
             AND {_hits_sql(EN_STOP)} >= {_hits_sql(FR_STOP)}
             AND {_hits_sql(EN_STOP)} > 0 THEN 'en'
            WHEN {_hits_sql(DE_STOP)} >= {_hits_sql(FR_STOP)}
             AND {_hits_sql(DE_STOP)} > 0 THEN 'de'
            WHEN {_hits_sql(FR_STOP)} > 0 THEN 'fr'
            ELSE 'und' END = lang) AS agrees_with_label
FROM documents
"""


# --- rolling-hash document fingerprint -------------------------------------------

def q_ta_fingerprint(spark, sf_dir):
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )
    return _docs(spark, sf_dir).select("doc_id", fp.alias("fingerprint"))


SQL_TA_FP = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                          c -> ascii(c)::BIGINT)),
         (acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD}) AS fingerprint
FROM documents
"""


QUERIES = {
    "ta_token_count": q_ta_token_count,
    "ta_quality": q_ta_quality,
    "ta_lang_id": q_ta_lang_id,
    "ta_fingerprint": q_ta_fingerprint,
}

ORACLES = {
    "ta_token_count": SQL_TA_TOKENS,
    "ta_quality": SQL_TA_QUALITY,
    "ta_lang_id": SQL_TA_LANG,
    "ta_fingerprint": SQL_TA_FP,
}
