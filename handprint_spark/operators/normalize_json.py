"""X1–X5 as Spark-native ``from_json`` pipelines (SURVEY.md §2.9).

The reference proves its parse stage is a pure function of the raw
service JSON (the ``-j`` reuse path re-parses saved JSON with no
network — manager.py:281-285). Here that stage is pure *Catalyst*: an
explicit StructType per service shape, higher-order array functions
for the kind filters (F2/F3), corner math (C7/C8), vertex guards (F6),
confidence rescale (C11), full-text assembly (A3), and the W1
reading-order sort — zero Python in the parse.

Rounding parity note (SURVEY.md §7): the reference computes Amazon
pixel corners with Python ``int(round(X*w))`` — banker's rounding.
Spark's ROUND is HALF_UP, but ``rint`` is HALF_EVEN (Java Math.rint),
which matches Python ``round()`` on doubles exactly; the corner math
therefore uses F.rint, never F.round.

Parity is asserted in tests: for every service, this JVM pipeline's
(text, boxes) equals kernels/normalizers.py (which byte-matches the
reference's own sample-output goldens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BOX_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("bb", T.ArrayType(T.IntegerType())),
            T.StructField("text", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
)

# --- service JSON schemas ---------------------------------------------------

_POLY = T.ArrayType(T.StructType([T.StructField("X", T.DoubleType()), T.StructField("Y", T.DoubleType())]))


def _amazon_schema(result_key: str, value_key: str, block_key: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                result_key,
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(value_key, T.StringType()),
                            T.StructField(block_key, T.StringType()),
                            T.StructField("Confidence", T.DoubleType()),
                            T.StructField(
                                "Geometry",
                                T.StructType([T.StructField("Polygon", _POLY)]),
                            ),
                        ]
                    )
                ),
            )
        ]
    )


TEXTRACT_SCHEMA = _amazon_schema("Blocks", "BlockType", "Text")
REKOGNITION_SCHEMA = _amazon_schema("TextDetections", "Type", "DetectedText")

_VERTICES = T.ArrayType(
    T.StructType([T.StructField("x", T.IntegerType()), T.StructField("y", T.IntegerType())])
)
_GOOGLE_WORD = T.StructType(
    [
        T.StructField("bounding_box", T.StructType([T.StructField("vertices", _VERTICES)])),
        T.StructField("symbols", T.ArrayType(T.StructType([T.StructField("text", T.StringType())]))),
    ]
)
GOOGLE_SCHEMA = T.StructType(
    [
        T.StructField(
            "full_text_annotation",
            T.StructType(
                [
                    T.StructField("text", T.StringType()),
                    T.StructField(
                        "pages",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "blocks",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "paragraphs",
                                                        T.ArrayType(
                                                            T.StructType(
                                                                [
                                                                    T.StructField("confidence", T.DoubleType()),
                                                                    T.StructField(
                                                                        "bounding_box",
                                                                        T.StructType(
                                                                            [T.StructField("vertices", _VERTICES)]
                                                                        ),
                                                                    ),
                                                                    T.StructField("words", T.ArrayType(_GOOGLE_WORD)),
                                                                ]
                                                            )
                                                        ),
                                                    )
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

_MS_WORD = T.StructType(
    [
        T.StructField("boundingBox", T.ArrayType(T.IntegerType())),
        T.StructField("text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)
MICROSOFT_SCHEMA = T.StructType(
    [
        T.StructField(
            "analyzeResult",
            T.StructType(
                [
                    T.StructField(
                        "readResults",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "lines",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("boundingBox", T.ArrayType(T.IntegerType())),
                                                    T.StructField("text", T.StringType()),
                                                    T.StructField("words", T.ArrayType(_MS_WORD)),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        )
    ]
)


# --- Amazon (X1-X3) -----------------------------------------------------------

def _amazon_corners(poly: Column, width: Column, height: Column) -> Column:
    """C7: percent -> pixel flat corner list; [] when any vertex lacks
    X or Y (F6 guard). F.rint == Python round() (banker's)."""
    complete = F.forall(poly, lambda p: p["X"].isNotNull() & p["Y"].isNotNull())
    flat = F.flatten(
        F.transform(
            poly,
            lambda p: F.array(
                F.rint(p["X"] * width).cast("int"), F.rint(p["Y"] * height).cast("int")
            ),
        )
    )
    return F.when(poly.isNotNull() & complete, flat).otherwise(F.array().cast("array<int>"))


def amazon_boxes(blocks: Column, width: Column, height: Column, value_key: str, block_key: str) -> Column:
    """F3 kind filter + C7 corners + C11 rescale -> unified box array.
    Boxes with an empty corner list are dropped (amazon.py:143-148)."""
    wanted = F.filter(
        blocks,
        lambda b: b[value_key].isNotNull() & F.lower(b[value_key]).isin("word", "line"),
    )
    built = F.transform(
        wanted,
        lambda b: F.struct(
            F.lower(b[value_key]).alias("kind"),
            _amazon_corners(b["Geometry"]["Polygon"], width, height).alias("bb"),
            F.coalesce(b[block_key], F.lit("")).alias("text"),
            (b["Confidence"] / 100).alias("score"),
        ),
    )
    return F.filter(built, lambda x: F.size(x["bb"]) > 0)


def amazon_full_text(blocks: Column, value_key: str, block_key: str) -> Column:
    """A3: LINE texts in service order, each followed by '\\n' (the
    trailing newline is part of the contract, amazon.py:149-153)."""
    # block_key non-null too: the reference appends nothing for a LINE
    # block with no Text (amazon.py:149-153) — keeping such a line made
    # a single text-less LINE emit '\n' where Python emits ''
    lines = F.filter(
        blocks,
        lambda b: b[value_key].isNotNull()
        & (F.lower(b[value_key]) == "line")
        & b[block_key].isNotNull(),
    )
    texts = F.transform(lines, lambda b: b[block_key])
    return F.when(F.size(lines) > 0, F.concat(F.array_join(texts, "\n"), F.lit("\n"))).otherwise(
        F.lit("")
    )


def parse_amazon(
    df: DataFrame, json_col: str, width_col: str, height_col: str, variant: str = "textract"
) -> DataFrame:
    if variant == "textract":
        schema, rk, vk, bk = TEXTRACT_SCHEMA, "Blocks", "BlockType", "Text"
    else:
        schema, rk, vk, bk = REKOGNITION_SCHEMA, "TextDetections", "Type", "DetectedText"
    parsed = df.withColumn("_raw", F.from_json(F.col(json_col), schema))
    blocks = F.coalesce(F.col("_raw")[rk], F.array().cast(schema[rk].dataType))
    return parsed.withColumn(
        "text", amazon_full_text(blocks, vk, bk)
    ).withColumn(
        "boxes", amazon_boxes(blocks, F.col(width_col), F.col(height_col), vk, bk)
    ).drop("_raw")


# --- Google (X4) ----------------------------------------------------------------

def _google_corners(vertices: Column) -> Column:
    """C8 + F6: flat int corners; [] when <4 vertices or any x/y missing."""
    ok = (F.size(vertices) >= 4) & F.forall(
        vertices, lambda v: v["x"].isNotNull() & v["y"].isNotNull()
    )
    flat = F.flatten(F.transform(vertices, lambda v: F.array(v["x"], v["y"])))
    return F.when(vertices.isNotNull() & ok, flat).otherwise(F.array().cast("array<int>"))


def parse_google(df: DataFrame, json_col: str) -> DataFrame:
    parsed = df.withColumn("_raw", F.from_json(F.col(json_col), GOOGLE_SCHEMA))
    fta = F.col("_raw")["full_text_annotation"]
    page1 = F.element_at(fta["pages"], 1)  # W4: first page only
    # coalesce per element: Spark's flatten returns NULL when any
    # element array is null, so ONE block without 'paragraphs' (or,
    # below, one paragraph without 'words') would null the whole boxes
    # column and drop every other block's boxes — the Python
    # normalizer keeps them (parity verified live on malformed JSON).
    paras_t = (
        GOOGLE_SCHEMA["full_text_annotation"]
        .dataType["pages"]
        .dataType.elementType["blocks"]
        .dataType.elementType["paragraphs"]
        .dataType
    )
    paras = F.flatten(
        F.transform(
            page1["blocks"],
            lambda b: F.coalesce(b["paragraphs"], F.array().cast(paras_t)),
        )
    )

    def para_boxes(p):
        para = F.array(
            F.struct(
                F.lit("para").alias("kind"),
                _google_corners(p["bounding_box"]["vertices"]).alias("bb"),
                F.lit("").alias("text"),
                p["confidence"].alias("score"),
            )
        )
        words = F.transform(
            p["words"],
            lambda w: F.struct(
                F.lit("word").alias("kind"),
                _google_corners(w["bounding_box"]["vertices"]).alias("bb"),
                F.array_join(F.transform(w["symbols"], lambda s: s["text"]), "").alias("text"),
                p["confidence"].alias("score"),  # the paragraph's confidence — reference quirk
            ),
        )
        return F.concat(
            para,
            F.coalesce(
                F.filter(words, lambda x: F.size(x["bb"]) > 0),
                F.array().cast(BOX_TYPE),
            ),
        )

    boxes = F.when(
        page1.isNotNull(),
        F.coalesce(F.flatten(F.transform(paras, para_boxes)), F.array().cast(BOX_TYPE)),
    ).otherwise(F.array().cast(BOX_TYPE))
    return parsed.withColumn("text", F.coalesce(fta["text"], F.lit(""))).withColumn(
        "boxes", boxes
    ).drop("_raw")


# --- Microsoft (X5) + W1 ----------------------------------------------------------

def microsoft_reading_order(lines: Column) -> Column:
    """W1: sort lines by (y, x) = (boundingBox[1], boundingBox[0]) —
    top-to-bottom then left-to-right — and join texts. array_sort with
    a comparator; 1-based element_at."""
    def cmp(l, r):
        ly, ry = F.element_at(l["boundingBox"], 2), F.element_at(r["boundingBox"], 2)
        lx, rx = F.element_at(l["boundingBox"], 1), F.element_at(r["boundingBox"], 1)
        return (
            F.when(ly < ry, -1)
            .when(ly > ry, 1)
            .when(lx < rx, -1)
            .when(lx > rx, 1)
            .otherwise(0)
        )

    ordered = F.array_sort(lines, cmp)
    return F.array_join(F.transform(ordered, lambda x: x["text"]), "\n")


def parse_microsoft(df: DataFrame, json_col: str) -> DataFrame:
    parsed = df.withColumn("_raw", F.from_json(F.col(json_col), MICROSOFT_SCHEMA))
    read1 = F.element_at(F.col("_raw")["analyzeResult"]["readResults"], 1)  # W4
    lines = read1["lines"]

    def line_boxes(ln):
        line = F.array(
            F.struct(
                F.lit("line").alias("kind"),
                ln["boundingBox"].alias("bb"),
                F.lit("").alias("text"),  # microsoft.py:125-126: empty text,
                F.lit(1.0).alias("score"),  # score 1.0 — reference quirk
            )
        )
        words = F.transform(
            ln["words"],
            lambda w: F.struct(
                F.lit("word").alias("kind"),
                w["boundingBox"].alias("bb"),
                w["text"].alias("text"),
                w["confidence"].alias("score"),
            ),
        )
        # a line without 'words' must not null the whole boxes column
        # (flatten null-propagates) — the line box itself still counts
        return F.concat(line, F.coalesce(words, F.array().cast(BOX_TYPE)))

    boxes = F.when(
        lines.isNotNull(),
        F.coalesce(F.flatten(F.transform(lines, line_boxes)), F.array().cast(BOX_TYPE)),
    ).otherwise(F.array().cast(BOX_TYPE))
    text = F.when(lines.isNotNull(), microsoft_reading_order(lines)).otherwise(F.lit(""))
    return parsed.withColumn("text", text).withColumn("boxes", boxes).drop("_raw")


PARSERS = {
    "amazon-textract": lambda df, c, w, h: parse_amazon(df, c, w, h, "textract"),
    "amazon-rekognition": lambda df, c, w, h: parse_amazon(df, c, w, h, "rekognition"),
    "google": lambda df, c, w, h: parse_google(df, c),
    "microsoft": lambda df, c, w, h: parse_microsoft(df, c),
}
