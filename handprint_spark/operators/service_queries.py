"""X1/X4/X5 service-normalizer pipelines as oracle-checked queries.

The golden tests (tests/test_normalizers_golden.py) prove the
``from_json`` pipelines in operators/normalize_json.py byte-match the
reference's dev/services/sample-output fixtures. These queries put the
same pipelines under the driver's DuckDB value-hash gate: each builds
deterministic service-shaped JSON from the ``documents`` table
(``to_json`` of an explicit struct — the same raw-JSON round trip the
reference's ``-j`` reuse path exercises, manager.py:281-285), parses
it with the full X-pipeline, and reduces to scalar columns an
independent ANSI-SQL formulation can reproduce exactly.

Exactness policy (see relational.py header): every float that reaches
the output goes through integer-valued paths — percent coordinates are
p/100 with width 1000 / height 800 so pixel corners are exactly
10*p / 8*p after F.rint (banker's, = Python round, C7), and scores are
re-scaled to integers with rint(score*100).

Coverage: X1 kind filter F3 (PAGE block dropped) + C7 corner math +
C11 confidence rescale + A3 trailing-newline full text; X4 nested
block/paragraph/word/symbol flatten + C9 symbol concat + F6 <4-vertex
guard (one word deliberately malformed) + the paragraph-confidence
quirk (google.py:174) + W4 page-1-only (a decoy page 2 must be
ignored); X5 line/word box emission quirks (empty line text, score
1.0 — microsoft.py:125-126) + the W1 (y, x) reading-order sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from handprint_spark.operators.normalize_json import (
    parse_amazon,
    parse_google,
    parse_microsoft,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _score_sum_x100(boxes: Column) -> Column:
    """Sum of box scores as an exact integer: rint(score*100) per box."""
    return F.aggregate(
        boxes,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.rint(b["score"] * 100).cast("long"),
    )


# --- X5 Microsoft + W1 ------------------------------------------------------

def _ms_line(d: Column, text: Column, i: int) -> Column:
    x = (d * 13 + i * 57) % 100
    y = (d * 37 + i * 101) % 200
    bb = F.array(x, y, x + 10, y, x + 10, y + 5, x, y + 5)
    words = F.array(
        *[
            F.struct(
                F.array(x + j, y + j).cast("array<int>").alias("boundingBox"),
                F.concat(F.lit(f"w{i}"), F.lit(str(j))).alias("text"),
                (((d + F.lit(10 * i + j)) % 97) / 100.0).alias("confidence"),
            )
            for j in (0, 1)
        ]
    )
    ltext = F.concat(F.lit(f"L{i} "), F.substring(text, 1 + i * 10, 10))
    return F.struct(
        bb.cast("array<int>").alias("boundingBox"),
        ltext.alias("text"),
        words.alias("words"),
    )


def _ms_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents -> synthetic Microsoft JSON -> parse_microsoft."""
    d = F.col("doc_id")
    raw = F.to_json(
        F.struct(
            F.struct(
                F.array(
                    F.struct(
                        F.array(*[_ms_line(d, F.col("text"), i) for i in range(3)]).alias(
                            "lines"
                        )
                    )
                ).alias("readResults")
            ).alias("analyzeResult")
        )
    )
    src = _docs(spark, sf_dir).select("doc_id", raw.alias("raw"))
    return parse_microsoft(src, "raw")


def q_x5_microsoft_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synthetic lines per document in scrambled spatial order;
    the W1 comparator must recover top-to-bottom/left-to-right."""
    parsed = _ms_parsed(spark, sf_dir)
    return parsed.select(
        "doc_id",
        F.col("text").alias("reading_order_text"),
        F.size("boxes").alias("n_boxes"),
        _score_sum_x100(F.col("boxes")).alias("score_sum_x100"),
    )


# Line i's (x, y): x = (d*13 + 57i) % 100, y = (d*37 + 101i) % 200 — the y
# values of the three lines are pairwise distinct mod 200 (differences
# 101, 2, 101), so (y, x) ordering is total. Line boxes score 1.0 each;
# word (i, j) confidence = ((d + 10i + j) % 97)/100.
SQL_X5 = """
WITH lines AS (
  SELECT doc_id,
         i,
         (doc_id*13 + i*57) % 100 AS x,
         (doc_id*37 + i*101) % 200 AS y,
         'L' || i || ' ' || substr(text, 1 + i*10, 10) AS ltext
  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
)
SELECT doc_id,
       string_agg(ltext, chr(10) ORDER BY y, x) AS reading_order_text,
       CAST(9 AS INT) AS n_boxes,
       CAST(300 + sum((doc_id + 10*i) % 97) + sum((doc_id + 10*i + 1) % 97)
            AS BIGINT) AS score_sum_x100
FROM lines
GROUP BY doc_id
"""


# --- X1 Amazon (Textract shape) --------------------------------------------

_AMZ_W, _AMZ_H = 1000, 800


def _amz_poly(d: Column, base: int) -> Column:
    """4-vertex percent polygon; X=p/100 (p = (d*7+base+k)%100),
    Y=q/100 (q = (d*11+base+k)%100) — exact pixels 10p, 8q."""
    return F.array(
        *[
            F.struct(
                (((d * 7 + base + k) % 100) / 100.0).alias("X"),
                (((d * 11 + base + k) % 100) / 100.0).alias("Y"),
            )
            for k in range(4)
        ]
    )


def q_x1_amazon_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PAGE block (must be dropped by F3), two LINE and three WORD
    blocks per document; C7 corner math and C11 rescale must be exact."""
    d = F.col("doc_id")
    page = F.struct(
        F.lit(None).cast("string").alias("Text"),
        F.lit("PAGE").alias("BlockType"),
        F.lit(None).cast("double").alias("Confidence"),
        F.struct(F.lit(None).cast(
            "array<struct<X:double,Y:double>>").alias("Polygon")).alias("Geometry"),
    )
    lines = [
        F.struct(
            F.concat(F.lit(f"A{i} "), F.substring("text", 1 + i * 8, 8)).alias("Text"),
            F.lit("LINE").alias("BlockType"),
            ((d + i) % 101).cast("double").alias("Confidence"),
            F.struct(_amz_poly(d, i * 4).alias("Polygon")).alias("Geometry"),
        )
        for i in (0, 1)
    ]
    words = [
        F.struct(
            F.lit(f"aw{j}").alias("Text"),
            F.lit("WORD").alias("BlockType"),
            ((d * 2 + j) % 101).cast("double").alias("Confidence"),
            F.struct(_amz_poly(d, 8 + j * 4).alias("Polygon")).alias("Geometry"),
        )
        for j in (0, 1, 2)
    ]
    raw = F.to_json(F.struct(F.array(page, *lines, *words).alias("Blocks")))
    src = _docs(spark, sf_dir).select(
        "doc_id",
        raw.alias("raw"),
        F.lit(_AMZ_W).alias("width"),
        F.lit(_AMZ_H).alias("height"),
    )
    parsed = parse_amazon(src, "raw", "width", "height", "textract")
    bb_sum = F.aggregate(
        F.col("boxes"),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.aggregate(b["bb"], F.lit(0).cast("long"), lambda a, v: a + v),
    )
    return parsed.select(
        "doc_id",
        F.col("text").alias("full_text"),
        F.size("boxes").alias("n_boxes"),
        bb_sum.alias("bb_sum"),
        _score_sum_x100(F.col("boxes")).alias("score_sum_x100"),
    )


# Block polygons: LINE i uses base=4i, WORD j uses base=8+4j; vertex k
# contributes 10*((d*7+base+k)%100) + 8*((d*11+base+k)%100) pixels.
# A3 appends a trailing newline after the LINE join (amazon.py:151-153).
SQL_X1 = """
WITH blk AS (
  SELECT doc_id, base FROM documents
  CROSS JOIN (SELECT unnest([0, 4, 8, 12, 16]) AS base)
), corners AS (
  SELECT doc_id,
         sum(10*((doc_id*7 + base + k) % 100) + 8*((doc_id*11 + base + k) % 100))
           AS bb_sum
  FROM blk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
  GROUP BY doc_id
)
SELECT d.doc_id,
       'A0 ' || substr(d.text, 1, 8) || chr(10) ||
       'A1 ' || substr(d.text, 9, 8) || chr(10) AS full_text,
       CAST(5 AS INT) AS n_boxes,
       CAST(c.bb_sum AS BIGINT) AS bb_sum,
       CAST((d.doc_id % 101) + ((d.doc_id + 1) % 101)
            + (d.doc_id*2 % 101) + ((d.doc_id*2 + 1) % 101) + ((d.doc_id*2 + 2) % 101)
            AS BIGINT) AS score_sum_x100
FROM documents d JOIN corners c USING (doc_id)
"""


# --- X4 Google ---------------------------------------------------------------

def _g_vertices(d: Column, base: int, n: int = 4) -> Column:
    return F.array(
        *[
            F.struct(
                ((d + base + k) % 50).cast("int").alias("x"),
                ((d * 3 + base + k) % 60).cast("int").alias("y"),
            )
            for k in range(n)
        ]
    )


def _g_word(d: Column, text: Column, b: int, j: int, n_vertices: int) -> Column:
    pos = 1 + (2 * b + j) * 2
    return F.struct(
        F.struct(_g_vertices(d, 10 + b * 4 + j, n_vertices).alias("vertices")).alias(
            "bounding_box"
        ),
        F.array(
            F.struct(F.substring(text, pos, 1).alias("text")),
            F.struct(F.substring(text, pos + 1, 1).alias("text")),
        ).alias("symbols"),
    )


def q_x4_google_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two blocks x one paragraph x two words (symbol-concat texts);
    word (1,1) has only 3 vertices so the F6 guard must drop it; a
    decoy second page must be ignored (W4); every word inherits its
    paragraph's confidence (google.py:174 quirk)."""
    d, text = F.col("doc_id"), F.col("text")

    def para(b: int) -> Column:
        words = F.array(
            _g_word(d, text, b, 0, 4),
            _g_word(d, text, b, 1, 3 if b == 1 else 4),
        )
        return F.struct(
            (((d * 5 + b) % 100) / 100.0).alias("confidence"),
            F.struct(_g_vertices(d, b * 4).alias("vertices")).alias("bounding_box"),
            words.alias("words"),
        )

    def block(b: int) -> Column:
        return F.struct(F.array(para(b)).alias("paragraphs"))

    page1 = F.struct(F.array(block(0), block(1)).alias("blocks"))
    decoy = F.struct(F.array(block(0)).alias("blocks"))  # W4: must be ignored
    raw = F.to_json(
        F.struct(
            F.struct(
                F.substring(text, 1, 40).alias("text"),
                F.array(page1, decoy).alias("pages"),
            ).alias("full_text_annotation")
        )
    )
    src = _docs(spark, sf_dir).select("doc_id", raw.alias("raw"))
    parsed = parse_google(src, "raw")
    return parsed.select(
        "doc_id",
        F.col("text").alias("full_text"),
        F.size("boxes").alias("n_boxes"),
        F.array_join(F.transform("boxes", lambda b: b["text"]), "|").alias("word_concat"),
        _score_sum_x100(F.col("boxes")).alias("score_sum_x100"),
    )


# Boxes in order: para0(''), w00, w01, para1(''), w10 — w11 dropped by
# the <4-vertex guard. Word (b, j) text = substr(text, 1+(2b+j)*2, 2).
# Scores: para b confidence (d*5+b)%100 / 100, inherited by its words →
# block0 contributes 3x, block1 (one word dropped) 2x.
SQL_X4 = """
SELECT doc_id,
       substr(text, 1, 40) AS full_text,
       CAST(5 AS INT) AS n_boxes,
       '|' || substr(text, 1, 2) || '|' || substr(text, 3, 2) || '||' ||
         substr(text, 5, 2) AS word_concat,
       CAST(3*((doc_id*5) % 100) + 2*((doc_id*5 + 1) % 100) AS BIGINT)
         AS score_sum_x100
FROM documents
"""


# --- F1/F2: nested box confidence-threshold + kind filters -------------------

F1_THRESHOLD = 0.5


def q_f1_f2_box_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (score >= threshold, images.py:256) and F2 (kind selection,
    images.py:259-267) as higher-order ``F.filter`` over the nested box
    array — the filters run inside the array, no explode/re-group."""
    parsed = _ms_parsed(spark, sf_dir)
    kept = F.filter(
        F.col("boxes"),
        lambda b: (b["kind"] == "word") & (b["score"] >= F.lit(F1_THRESHOLD)),
    )
    return parsed.select(
        "doc_id",
        F.size(kept).alias("n_kept"),
        _score_sum_x100(kept).alias("score_sum_x100"),
    )


# Word (i, j) score = ((doc_id + 10i + j) % 97)/100; kept when >= 0.5.
# Line boxes (kind='line', score 1.0) are excluded by the kind filter.
SQL_F1_F2 = f"""
WITH w AS (
  SELECT doc_id, (doc_id + 10*i + j) % 97 AS c
  FROM documents
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
  CROSS JOIN (SELECT unnest([0, 1]) AS j)
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE c >= {int(F1_THRESHOLD * 100)}) AS INT) AS n_kept,
       CAST(coalesce(sum(c) FILTER (WHERE c >= {int(F1_THRESHOLD * 100)}), 0)
            AS BIGINT) AS score_sum_x100
FROM w GROUP BY doc_id
"""


# --- layout parse: line-box -> paragraph clustering ---------------------------

# A new paragraph starts when the vertical whitespace between two
# consecutive line boxes exceeds the line height — the gap rule every
# PDF layout analyzer (XY-cut, docstrum) applies on its vertical pass.
LAY_LINES = 10
LAY_LINE_H = 12
LAY_LINE_STEP = 18  # baseline-to-baseline: 6 px of normal leading


def q_lay_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout parse (north_rule: "PDF/layout parse"): cluster a page's
    line boxes into paragraphs by vertical-gap analysis. Line i sits at
    y = 18*i plus a 25 px paragraph break after one or two
    doc-dependent lines; a new paragraph opens when the whitespace gap
    above a line exceeds the line height. The clustering is the
    sessionization idiom applied to geometry — lag window + cumulative
    break flags + per-paragraph rollup, all inside ONE
    hashpartitioning(doc_id) exchange (plan-asserted), the shape that
    holds when every one of 10^12 pages carries its own box list."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id")
    brk1 = F.col("doc_id") % 7 + 1  # in [1, 8]: always interior
    brk2 = F.col("doc_id") % 3 + 5  # in [5, 7]: may collide with brk1
    lines = docs.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.lit(LAY_LINES - 1))).alias("line_no", "i"),
    ).select(
        "doc_id",
        "line_no",
        (
            F.col("i") * LAY_LINE_STEP
            + F.when(F.col("i") > brk1, 25).otherwise(0)
            + F.when(F.col("i") > brk2, 25).otherwise(0)
        ).alias("y"),
    )
    w = Window.partitionBy("doc_id").orderBy("line_no")
    gapped = lines.withColumn(
        "new_para",
        (
            F.col("y") - (F.lag("y").over(w) + LAY_LINE_H) > LAY_LINE_H
        ).cast("int"),
    ).withColumn(
        "para_id",
        F.sum(F.coalesce("new_para", F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    return gapped.groupBy("doc_id", "para_id").agg(
        F.min("line_no").alias("first_line"),
        F.count("*").cast("int").alias("n_lines"),
        F.min("y").alias("y_top"),
        (F.max("y") + LAY_LINE_H).alias("y_bottom"),
    )


SQL_LAY_PARAGRAPHS = f"""
WITH lines AS (
  SELECT doc_id, i AS line_no,
         i * {LAY_LINE_STEP}
           + CASE WHEN i > doc_id % 7 + 1 THEN 25 ELSE 0 END
           + CASE WHEN i > doc_id % 3 + 5 THEN 25 ELSE 0 END AS y
  FROM documents, unnest(generate_series(0, {LAY_LINES - 1})) AS t(i)
),
gapped AS (
  SELECT doc_id, line_no, y,
         CASE WHEN y - (lag(y) OVER (PARTITION BY doc_id ORDER BY line_no)
                        + {LAY_LINE_H}) > {LAY_LINE_H}
              THEN 1 ELSE 0 END AS new_para
  FROM lines
),
paras AS (
  SELECT doc_id, line_no, y,
         sum(new_para) OVER (PARTITION BY doc_id ORDER BY line_no
                             ROWS UNBOUNDED PRECEDING) AS para_id
  FROM gapped
)
SELECT doc_id, CAST(para_id AS INT) AS para_id,
       CAST(min(line_no) AS INT) AS first_line,
       CAST(count(*) AS INT) AS n_lines,
       CAST(min(y) AS INT) AS y_top,
       CAST(max(y) + {LAY_LINE_H} AS INT) AS y_bottom
FROM paras GROUP BY doc_id, para_id
"""


# --- layout parse: XY-cut horizontal pass (column detection) ------------------

# A column break is a vertical whitespace gutter in the page's
# x-projection wider than LAY_GAP_MIN — XY-cut's horizontal cut rule.
LAY_WORDS = 12       # word boxes per synthetic page
LAY_WORD_W = 30      # box width
LAY_WORD_STEP = 40   # x grid pitch (10 px inter-word gap)
LAY_COL_SHIFT = 80   # extra shift after the column split (gutter = 90)
LAY_GAP_MIN = 30     # minimum whitespace to call a gutter
LAY_ROWS = 4         # visual rows per page
LAY_ROW_H = 15


def _lay_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word boxes: 12 boxes on an x grid; two of three
    pages are two-column (split point doc-dependent in [4, 8]), which
    opens a 90 px gutter; one-column pages keep the uniform 10 px gap."""
    x_l = (
        F.col("j") * LAY_WORD_STEP
        + F.when(
            (F.col("doc_id") % 3 != 0) & (F.col("j") >= F.col("doc_id") % 5 + 4),
            LAY_COL_SHIFT,
        ).otherwise(0)
    ).cast("int")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(LAY_WORDS - 1))).alias("j"))
        .select(
            "doc_id",
            "j",
            x_l.alias("x_l"),
            (x_l + LAY_WORD_W).alias("x_r"),
            (F.col("j") % LAY_ROWS * LAY_ROW_H).cast("int").alias("y"),
        )
    )


def _lay_col_ids(boxes: DataFrame) -> DataFrame:
    """Shared x-gutter column detection (the XY-cut horizontal pass):
    cumulative-max reach over the x-sorted boxes, a gutter flag when a
    box's left edge clears the reach by more than LAY_GAP_MIN, and the
    running sum as col_id. ONE definition consumed by both
    q_lay_columns and q_lay_reading_order — two hand-copies of this
    window algebra (with cosmetically different null handling) were a
    drift risk between the pair and their two SQL oracles."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("x_l", "j")
    reach = F.max("x_r").over(w.rowsBetween(Window.unboundedPreceding, -1))
    return boxes.withColumn(
        "new_col",
        F.coalesce((F.col("x_l") - reach > LAY_GAP_MIN).cast("int"), F.lit(0)),
    ).withColumn(
        "col_id",
        F.sum("new_col").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def q_lay_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XY-cut horizontal pass: detect text columns as gutters in the
    x-projection of a page's word boxes. Running max of box right
    edges over the x-sorted boxes (cumulative max, not lag — robust to
    boxes nested inside a column's extent), a new column opens when a
    box's left edge clears that reach by more than LAY_GAP_MIN, then a
    per-column rollup. One hashpartitioning(doc_id) exchange
    (plan-asserted) — the same single-shuffle shape as
    ``q_lay_paragraphs``' vertical pass; together they are the XY-cut
    recursion's two primitives."""
    cols = _lay_col_ids(_lay_boxes(spark, sf_dir))
    return cols.groupBy("doc_id", "col_id").agg(
        F.count("*").cast("int").alias("n_words"),
        F.min("x_l").alias("x_left"),
        F.max("x_r").alias("x_right"),
    )


def q_lay_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-aware reading order: the reference's _sorted_by_position
    top-to-bottom/left-to-right sort (main_body.py reading-order rule)
    breaks on multi-column pages — a straight (y, x) sort interleaves
    the columns. Detect columns first (the SHARED _lay_col_ids
    x-gutter pass), then rank column-major: (col_id, y, x). Both
    windows partition by doc_id, so Catalyst plans ONE exchange and
    two in-partition sorts (plan-asserted)."""
    from pyspark.sql import Window

    cols = _lay_col_ids(_lay_boxes(spark, sf_dir))
    rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("col_id", "y", "x_l", "j")
    )
    return cols.select(
        "doc_id",
        F.col("j").alias("word_id"),
        "col_id",
        "y",
        "x_l",
        rank.alias("read_rank"),
    )


_SQL_LAY_BOXES = f"""
  SELECT doc_id, j,
         CAST(j * {LAY_WORD_STEP}
              + CASE WHEN doc_id % 3 != 0 AND j >= doc_id % 5 + 4
                     THEN {LAY_COL_SHIFT} ELSE 0 END AS INT) AS x_l,
         CAST(j * {LAY_WORD_STEP}
              + CASE WHEN doc_id % 3 != 0 AND j >= doc_id % 5 + 4
                     THEN {LAY_COL_SHIFT} ELSE 0 END + {LAY_WORD_W} AS INT) AS x_r,
         CAST(j % {LAY_ROWS} * {LAY_ROW_H} AS INT) AS y
  FROM documents, unnest(generate_series(0, {LAY_WORDS - 1})) AS t(j)
"""

SQL_LAY_COLUMNS = f"""
WITH boxes AS ({_SQL_LAY_BOXES}),
marked AS (
  SELECT doc_id, j, x_l, x_r,
         CASE WHEN x_l - max(x_r) OVER (PARTITION BY doc_id ORDER BY x_l, j
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   > {LAY_GAP_MIN} THEN 1 ELSE 0 END AS new_col
  FROM boxes
),
cols AS (
  SELECT doc_id, x_l, x_r,
         sum(new_col) OVER (PARTITION BY doc_id ORDER BY x_l, j
                            ROWS UNBOUNDED PRECEDING) AS col_id
  FROM marked
)
SELECT doc_id, CAST(col_id AS INT) AS col_id,
       CAST(count(*) AS INT) AS n_words,
       CAST(min(x_l) AS INT) AS x_left,
       CAST(max(x_r) AS INT) AS x_right
FROM cols GROUP BY doc_id, col_id
"""

SQL_LAY_READING_ORDER = f"""
WITH boxes AS ({_SQL_LAY_BOXES}),
marked AS (
  SELECT doc_id, j, x_l, x_r, y,
         CASE WHEN x_l - max(x_r) OVER (PARTITION BY doc_id ORDER BY x_l, j
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   > {LAY_GAP_MIN} THEN 1 ELSE 0 END AS new_col
  FROM boxes
),
cols AS (
  SELECT doc_id, j, x_l, y,
         CAST(sum(new_col) OVER (PARTITION BY doc_id ORDER BY x_l, j
                                 ROWS UNBOUNDED PRECEDING) AS INT) AS col_id
  FROM marked
)
SELECT doc_id, CAST(j AS INT) AS word_id, col_id, y, x_l,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY col_id, y, x_l, j) AS INT) AS read_rank
FROM cols
"""


QUERIES = {
    "x1_amazon_parse": q_x1_amazon_parse,
    "x4_google_parse": q_x4_google_parse,
    "x5_microsoft_parse": q_x5_microsoft_parse,
    "f1_f2_box_filters": q_f1_f2_box_filters,
    "lay_paragraphs": q_lay_paragraphs,
    "lay_columns": q_lay_columns,
    "lay_reading_order": q_lay_reading_order,
}

ORACLES = {
    "x1_amazon_parse": SQL_X1,
    "x4_google_parse": SQL_X4,
    "x5_microsoft_parse": SQL_X5,
    "f1_f2_box_filters": SQL_F1_F2,
    "lay_paragraphs": SQL_LAY_PARAGRAPHS,
    "lay_columns": SQL_LAY_COLUMNS,
    "lay_reading_order": SQL_LAY_READING_ORDER,
}
