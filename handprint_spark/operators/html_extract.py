"""Main-content extraction over HTML documents: DOM-heuristic block
classification, link-density boilerplate strip, outlink graph, and
token-window chunking for training-data prep.

This is the north_rule's named capability ("HTML boilerplate strip,
DOM heuristics") re-expressed Spark-first. The extractor is the
line-mode DOM heuristic used by readability/trafilatura-style
main-content extractors over pretty-printed crawl HTML: each
block-level line is classified by (a) its opening tag (chrome tags —
nav/aside/footer/header/script/style/title — are never content),
(b) its visible-text length (headings and stubs below
MIN_CONTENT_CHARS are dropped), and (c) its anchor-text link density
(a block whose text is mostly links — share bars, related-link rails —
is boilerplate even inside a content tag). It complements
``ta_boilerplate_strip`` (text_analysis.py), which is the CCNet-style
*cross-document* line-frequency strip; this module is the
*within-document* DOM-structural strip.

Scale notes (the part that matters at 100 TB):

- ``main_content`` is ZERO-SHUFFLE: parse → classify → filter →
  reassemble happens inside one projection over the html column using
  Catalyst higher-order functions (transform/filter/array_join), so
  the whole extractor is whole-stage-codegen JVM work with no
  exchange, no Python, and no per-block row blowup. Asserted in
  tests/test_plans.py.
- ``parse_blocks`` (the exploded per-block diagnostic view) is a
  narrow posexplode — still no exchange.
- ``outlinks`` shuffles once, on the href key (well-spread: hrefs
  embed doc-derived ids), with map-side partial aggregation.
- ``chunk_tokens`` is the training-data chunker: fixed token windows
  with overlap, derived per-doc with sequence/transform/slice HOFs
  and one narrow explode — the shape a 10^12-doc pretokenization job
  needs (no window functions, no sort, no shuffle).

Because the sandbox corpus has no real HTML, the html column is
SYNTHESIZED deterministically from the documents table (identically
in the Spark path and the DuckDB oracle): per-doc chrome (head/nav/
aside/share-bar/footer) around the document text split into two
<p> blocks, one carrying an inline <a> link. The extraction logic is
generic line-mode HTML processing — nothing about it assumes the
synthetic grammar beyond one-block-per-line layout.

Reference parity note: the reference (caltechlibrary/handprint) has
no HTML surface; this module is additive engine surface mandated by
the task's north_rule, with the reference's per-service normalization
analog being normalize_json.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Chrome tags: a line opening with one of these is never main content.
BOILER_TAGS = [
    "html",
    "head",
    "nav",
    "aside",
    "footer",
    "header",
    "script",
    "style",
    "title",
]
# Visible-text floor: blocks shorter than this (headings, stubs,
# timestamps) are dropped. trafilatura's default min_extracted_size
# is the same order of magnitude.
MIN_CONTENT_CHARS = 40
# Anchor-text share above which a block is a link rail, not content.
MAX_LINK_DENSITY = 0.35

# Token-window chunking for pretokenized training shards.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

_TAG_RE = r"^<([a-zA-Z0-9]+)"
_SCRIPT_RE = r"<script[^>]*>.*?</script>"
_ANYTAG_RE = r"<[^>]*>"
_ANCHOR_TEXT_RE = r"<a [^>]*>([^<]*)</a>"
_HREF_RE = r'href="([^"]*)"'


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def htmlized(docs: DataFrame) -> DataFrame:
    """Attach a deterministic synthetic ``html`` column: realistic
    pretty-printed page chrome around the document text. Mirrored
    byte-for-byte by the oracle's ``html`` CTE — keep both in sync."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    half = (n / 2).cast("int")
    s = lambda c: c.cast("string")  # noqa: E731
    line = [
        F.concat(F.lit('<html lang="'), F.col("lang"), F.lit('">')),
        F.concat(
            F.lit("<head><title>doc "),
            s(F.col("doc_id")),
            F.lit("</title><script>var x=1;</script></head>"),
        ),
        F.concat(
            F.lit('<nav><a href="/">home</a> <a href="/'),
            F.col("source"),
            F.lit('">'),
            F.col("source"),
            F.lit('</a> <a href="/tags/'),
            F.col("lang"),
            F.lit('">'),
            F.col("lang"),
            F.lit("</a></nav>"),
        ),
        F.concat(
            F.lit("<h1>"),
            F.array_join(F.slice(words, 1, F.least(F.lit(3), n)), " "),
            F.lit("</h1>"),
        ),
        F.concat(F.lit("<p>"), F.array_join(F.slice(words, 1, half), " "), F.lit("</p>")),
        F.concat(
            F.lit("<p>"),
            F.array_join(F.slice(words, half + 1, n - half), " "),
            F.lit(' See <a href="/doc/'),
            s(F.col("doc_id") * 7 % 1000),
            F.lit('">related docs</a> here</p>'),
        ),
        F.concat(
            F.lit('<aside><a href="/ad/'),
            s(F.col("doc_id") % 7),
            F.lit('">sponsored</a></aside>'),
        ),
        F.lit('<div class="share"><a href="/s/t">tweet this</a> <a href="/s/f">share</a></div>'),
        F.concat(F.lit("<footer>(c) 2026 "), F.col("source"), F.lit("</footer>")),
        F.lit("</html>"),
    ]
    return docs.withColumn("html", F.concat_ws("\n", *line))


# The oracle-side mirror of htmlized(): one CTE reused by every query.
_SQL_HTML_CTE = """
w AS (
  SELECT doc_id, text, lang, source, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n,
         len(string_split(text, ' ')) // 2 AS h
  FROM documents
),
html AS (
  SELECT doc_id, concat_ws(chr(10),
    '<html lang="' || lang || '">',
    '<head><title>doc ' || doc_id || '</title><script>var x=1;</script></head>',
    '<nav><a href="/">home</a> <a href="/' || source || '">' || source
        || '</a> <a href="/tags/' || lang || '">' || lang || '</a></nav>',
    '<h1>' || array_to_string(list_slice(ws, 1, least(3, n)), ' ') || '</h1>',
    '<p>' || array_to_string(list_slice(ws, 1, h), ' ') || '</p>',
    '<p>' || array_to_string(list_slice(ws, h + 1, n), ' ')
        || ' See <a href="/doc/' || (doc_id * 7) % 1000 || '">related docs</a> here</p>',
    '<aside><a href="/ad/' || doc_id % 7 || '">sponsored</a></aside>',
    '<div class="share"><a href="/s/t">tweet this</a> <a href="/s/f">share</a></div>',
    '<footer>(c) 2026 ' || source || '</footer>',
    '</html>') AS html
  FROM w
)
"""


# --- line-mode DOM heuristics (shared Column builders) -----------------------

def _tag(line: Column) -> Column:
    """Opening tag of a block line ('' for closing-tag / bare lines)."""
    return F.lower(F.regexp_extract(line, _TAG_RE, 1))


def _visible(line: Column) -> Column:
    """Visible text: inline <script> payloads removed first (their
    bodies are NOT visible text), then every remaining tag stripped."""
    return F.trim(F.regexp_replace(F.regexp_replace(line, _SCRIPT_RE, ""), _ANYTAG_RE, ""))


def _link_len(line: Column) -> Column:
    """Total anchor-text length in the line (0 when no anchors)."""
    matches = F.regexp_extract_all(line, F.lit(_ANCHOR_TEXT_RE), F.lit(1))
    return F.coalesce(F.length(F.array_join(matches, "")), F.lit(0))


def _is_boiler(tag: Column, vis_len: Column, link_len: Column) -> Column:
    density = link_len / F.greatest(vis_len, F.lit(1))
    return (
        tag.isin(BOILER_TAGS)
        | (vis_len < MIN_CONTENT_CHARS)
        | (density > MAX_LINK_DENSITY)
    )


_SQL_BOILER_TAGS = ", ".join(f"'{t}'" for t in BOILER_TAGS)


# --- hx_parse_blocks: exploded per-block diagnostic view ----------------------

def q_hx_parse_blocks(spark, sf_dir):
    """Per-(doc, line) block classification — the diagnostic view a
    crawl-extraction pipeline inspects to tune thresholds. Narrow
    posexplode; classification is pure Catalyst regexp work."""
    lines = htmlized(_docs(spark, sf_dir)).select(
        "doc_id", F.posexplode(F.split(F.col("html"), "\n")).alias("pos", "line")
    )
    tag = _tag(F.col("line"))
    vis = _visible(F.col("line"))
    link_len = _link_len(F.col("line"))
    return lines.select(
        "doc_id",
        (F.col("pos") + 1).alias("line_no"),
        tag.alias("tag"),
        vis.alias("text"),
        F.length(vis).alias("text_len"),
        link_len.alias("link_len"),
        F.round(link_len / F.greatest(F.length(vis), F.lit(1)), 4).alias("link_density"),
        _is_boiler(tag, F.length(vis), link_len).alias("is_boiler"),
    )


SQL_HX_PARSE_BLOCKS = f"""
WITH {_SQL_HTML_CTE},
lines AS (
  SELECT doc_id, unnest(string_split(html, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(html, chr(10))))) AS line_no
  FROM html
),
blocks AS (
  SELECT doc_id, line_no,
    lower(regexp_extract(line, '{_TAG_RE}', 1)) AS tag,
    trim(regexp_replace(regexp_replace(line, '{_SCRIPT_RE}', '', 'g'),
                        '{_ANYTAG_RE}', '', 'g')) AS vis,
    coalesce(length(array_to_string(
        regexp_extract_all(line, '{_ANCHOR_TEXT_RE}', 1), '')), 0) AS link_len
  FROM lines
)
SELECT doc_id, CAST(line_no AS INT) AS line_no, tag, vis AS text,
  CAST(length(vis) AS INT) AS text_len,
  CAST(link_len AS INT) AS link_len,
  round(link_len / greatest(length(vis), 1), 4) AS link_density,
  (tag IN ({_SQL_BOILER_TAGS})
   OR length(vis) < {MIN_CONTENT_CHARS}
   OR link_len / greatest(length(vis), 1) > {MAX_LINK_DENSITY}) AS is_boiler
FROM blocks
"""


# --- hx_main_content: the zero-shuffle extractor ------------------------------

def main_content(docs_with_html: DataFrame) -> DataFrame:
    """Main-content extraction as ONE projection: split → classify →
    filter → reassemble entirely with higher-order functions, so a
    10^12-page crawl pays a scan and zero exchanges. The struct field
    names inside the lambda never leave this expression."""
    lines = F.split(F.col("html"), "\n")
    blocks = F.transform(
        lines,
        lambda l: F.struct(
            _tag(l).alias("tag"),
            _visible(l).alias("vis"),
            _link_len(l).alias("link_len"),
        ),
    )
    content = F.filter(
        blocks, lambda b: ~_is_boiler(b["tag"], F.length(b["vis"]), b["link_len"])
    )
    return docs_with_html.select(
        "doc_id",
        F.array_join(F.transform(content, lambda b: b["vis"]), "\n").alias("main_text"),
        F.size(lines).alias("n_blocks"),
        F.size(content).alias("n_content_blocks"),
        F.round(F.lit(1.0) - F.size(content) / F.size(lines), 4).alias("boiler_ratio"),
    )


def q_hx_main_content(spark, sf_dir):
    return main_content(htmlized(_docs(spark, sf_dir)))


SQL_HX_MAIN_CONTENT = f"""
WITH {_SQL_HTML_CTE},
parsed AS (
  SELECT doc_id,
    list_transform(string_split(html, chr(10)), l -> struct_pack(
      tag := lower(regexp_extract(l, '{_TAG_RE}', 1)),
      vis := trim(regexp_replace(regexp_replace(l, '{_SCRIPT_RE}', '', 'g'),
                                 '{_ANYTAG_RE}', '', 'g')),
      link_len := coalesce(length(array_to_string(
          regexp_extract_all(l, '{_ANCHOR_TEXT_RE}', 1), '')), 0)
    )) AS blocks
  FROM html
),
scored AS (
  SELECT doc_id, blocks,
    list_filter(blocks, b -> NOT (
      b.tag IN ({_SQL_BOILER_TAGS})
      OR length(b.vis) < {MIN_CONTENT_CHARS}
      OR b.link_len / greatest(length(b.vis), 1) > {MAX_LINK_DENSITY})) AS content
  FROM parsed
)
SELECT doc_id,
  array_to_string(list_transform(content, b -> b.vis), chr(10)) AS main_text,
  CAST(len(blocks) AS INT) AS n_blocks,
  CAST(len(content) AS INT) AS n_content_blocks,
  round(1.0 - len(content)::DOUBLE / len(blocks), 4) AS boiler_ratio
FROM scored
"""


# --- hx_outlinks: crawl link graph -------------------------------------------

def q_hx_outlinks(spark, sf_dir):
    """Outlink aggregation: every href in the corpus → reference count
    and distinct referencing docs. The crawl-frontier / in-degree
    primitive. One shuffle on the href key (well spread); map-side
    partial aggregation halves what crosses the wire."""
    links = htmlized(_docs(spark, sf_dir)).select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("html"), F.lit(_HREF_RE), F.lit(1))).alias(
            "href"
        ),
    )
    return links.groupBy("href").agg(
        F.count("*").alias("n_refs"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


SQL_HX_OUTLINKS = f"""
WITH {_SQL_HTML_CTE},
links AS (
  SELECT doc_id, unnest(regexp_extract_all(html, '{_HREF_RE}', 1)) AS href
  FROM html
)
SELECT href, count(*) AS n_refs, count(DISTINCT doc_id) AS n_docs
FROM links GROUP BY href
"""


# --- hx_anchor_text: inbound anchor-text aggregation ---------------------------

_ANCHOR_FULL_RE = r'<a href="[^"]*"[^>]*>[^<]*</a>'
_ANCHOR_INNER_RE = r">([^<]*)</a>"


def q_hx_anchor_text(spark, sf_dir):
    """(href, anchor, n_refs, n_docs): inbound anchor-text table — for
    every link target, what the web calls it and from how many pages.
    The signal anchor-text corpora (MS MARCO-style query synthesis,
    link-based page classification) are built from, and the natural
    companion to hx_outlinks (which counts edges but drops the text).

    Shape: full anchor snippets come from one regexp_extract_all over
    the html column (href and inner text must be captured from the
    SAME tag, so the snippet — not the page — is the extraction unit),
    then one narrow explode and two per-snippet extracts, all
    whole-stage codegen. ONE shuffle on the (href, anchor) key with
    map-side partial aggregation; anchor keys embed doc-derived ids so
    the key space grows with the corpus — no skew cliff at 10^12 docs."""
    anchors = (
        htmlized(_docs(spark, sf_dir))
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("html"), F.lit(_ANCHOR_FULL_RE), F.lit(0))
            ).alias("a"),
        )
        .select(
            "doc_id",
            F.regexp_extract(F.col("a"), _HREF_RE, 1).alias("href"),
            F.regexp_extract(F.col("a"), _ANCHOR_INNER_RE, 1).alias("anchor"),
        )
    )
    return anchors.groupBy("href", "anchor").agg(
        F.count("*").alias("n_refs"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


SQL_HX_ANCHOR_TEXT = f"""
WITH {_SQL_HTML_CTE},
snip AS (
  SELECT doc_id, unnest(regexp_extract_all(html, '{_ANCHOR_FULL_RE}')) AS a
  FROM html
),
pairs AS (
  SELECT doc_id, regexp_extract(a, 'href="([^"]*)"', 1) AS href,
         regexp_extract(a, '{_ANCHOR_INNER_RE}', 1) AS anchor
  FROM snip
)
SELECT href, anchor, count(*) AS n_refs, count(DISTINCT doc_id) AS n_docs
FROM pairs GROUP BY href, anchor
"""


# --- hx_url_canonicalize: crawl-frontier URL normalization --------------------

_URL_HEAD_RE = r"^([^/]+//[^/?#]+)"
# Anchored to the param delimiter and delimiter-preserving: without
# the ([?&]) anchor, any param whose NAME merely ends in "ref" (pref,
# xref, href) had its tail eaten, corrupting the page identity URL-
# dedup keys on. Applied THREE times on both engines — a consuming
# match eats the "&" the NEXT tracking param needs, so each global
# pass strips only alternate members of an adjacent run (RE2 has no
# lookbehind, so the oracle cannot mirror a lookbehind form; identical
# passes keep the engines byte-equal). A run of k adjacent tracking
# params halves per pass (k -> floor(k/2)), so three passes cover
# runs up to SEVEN adjacent params — past the full five-member
# utm_source/medium/campaign/term/content set that two passes
# (runs <= 3) left residue on, breaking canonical_url idempotence.
_TRACKING_RE = r"([?&])(utm_[a-z]+|ref)=[^&#]*&?"


def canonical_url(url: Column) -> Column:
    """Crawl-frontier URL canonicalization, pure Catalyst regexps:
    lowercase scheme+host, drop the fragment, strip default ports
    (:80 http / :443 https), strip the www. prefix, remove tracking
    params (utm_*, ref) while keeping meaningful ones, tidy dangling
    ?/& and a trailing slash. The normalization every dedup/frontier
    stage runs before keying on URL — zero shuffle as a projection."""
    lowered = F.concat(
        F.lower(F.regexp_extract(url, _URL_HEAD_RE, 1)),
        F.regexp_replace(url, _URL_HEAD_RE, ""),
    )
    no_frag = F.regexp_replace(lowered, r"#.*$", "")
    no_port = F.regexp_replace(
        F.regexp_replace(no_frag, r"^(https://[^/?#]+):443", "$1"),
        r"^(http://[^/?#]+):80",
        "$1",
    )
    no_www = F.regexp_replace(no_port, r"^(https?://)www\.", "$1")
    no_tracking = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(no_www, _TRACKING_RE, "$1"), _TRACKING_RE, "$1"),
        _TRACKING_RE,
        "$1",
    )
    return F.regexp_replace(F.regexp_replace(no_tracking, r"[?&]$", ""), r"/$", "")


def _messy_urls(docs: DataFrame) -> DataFrame:
    """Deterministic messy-URL synthesis: four real-world variant
    shapes of the same logical page (doc_id // 4), mirrored in the
    oracle's raw CTE."""
    page = (F.col("doc_id") / 4).cast("long").cast("string")
    variant = F.col("doc_id") % 4
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example.COM:443/doc/"),
                page,
                F.lit("?utm_source=feed&ref=x#frag"),
            ),
        )
        .when(variant == 1, F.concat(F.lit("https://www.example.com/doc/"), page, F.lit("/")))
        .when(
            variant == 2,
            F.concat(
                F.lit("http://Example.com:80/doc/"),
                page,
                F.lit("?id="),
                page,
                F.lit("&utm_campaign=y"),
            ),
        )
        .otherwise(F.concat(F.lit("https://example.com/doc/"), page))
    )
    return docs.select("doc_id", url.alias("url"))


def q_hx_url_canonicalize(spark, sf_dir):
    """Canonicalize + group: per-doc canonical URL and the dup-group
    verdict (is_keeper = lowest doc_id in the canonical group). The
    canonical projection is zero-shuffle; the keeper verdict is one
    window exchange on the canonical key — well spread, since
    canonical URLs are near-unique by construction of any real crawl."""
    from pyspark.sql import Window

    urls = _messy_urls(_docs(spark, sf_dir)).withColumn(
        "canon_url", canonical_url(F.col("url"))
    )
    w = Window.partitionBy("canon_url")
    return urls.select(
        "doc_id",
        "url",
        "canon_url",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"),
        F.count("*").over(w).cast("int").alias("n_variants"),
    )


# The raw/canon CTE pair is shared by SQL_HX_URL_CANON and
# SQL_HX_URL_REVISIT so the oracle-side canonicalizer can never drift
# between the two queries that key on it.
_SQL_MESSY_CANON_CTES = r"""raw AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/doc/' || (doc_id // 4) || '?utm_source=feed&ref=x#frag'
      WHEN 1 THEN 'https://www.example.com/doc/' || (doc_id // 4) || '/'
      WHEN 2 THEN 'http://Example.com:80/doc/' || (doc_id // 4) || '?id=' || (doc_id // 4) || '&utm_campaign=y'
      ELSE 'https://example.com/doc/' || (doc_id // 4)
    END AS url
  FROM documents
),
canon AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(url, '^([^/]+//[^/?#]+)',
                                 lower(regexp_extract(url, '^([^/]+//[^/?#]+)', 1))),
                  '#.*$', ''),
                '^(https://[^/?#]+):443', '\1'),
              '^(http://[^/?#]+):80', '\1'),
            '^(https?://)www\.', '\1'),
          '([?&])(utm_[a-z]+|ref)=[^&#]*&?', '\1', 'g'),
        '([?&])(utm_[a-z]+|ref)=[^&#]*&?', '\1', 'g'),
      '([?&])(utm_[a-z]+|ref)=[^&#]*&?', '\1', 'g'),
    '[?&]$', ''), '/$', '') AS canon_url
  FROM raw
)"""

SQL_HX_URL_CANON = f"""
WITH {_SQL_MESSY_CANON_CTES}
SELECT doc_id, url, canon_url,
  doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS is_keeper,
  CAST(count(*) OVER (PARTITION BY canon_url) AS INT) AS n_variants
FROM canon
"""


REVISIT_BASE_EPOCH = 1_700_000_000


def q_hx_url_revisit(spark, sf_dir):
    """Cross-snapshot URL revisit dedup — latest-fetch-wins. A crawl
    refetches the same logical page across snapshots; before any
    content-level dedup a pipeline collapses the revisit history to
    ONE row per canonical URL, keeping the NEWEST fetch (the rule
    CommonCrawl-style corpus builds apply; distinct from
    ``q_hx_url_canonicalize``'s lowest-id keeper, which is the
    identity-grouping diagnostic — this is the temporal production
    rule). Reference analog: S8's skip-if-cached decision
    (handprint/main_body.py:132-145) inverted to prefer the freshest
    artifact for one target rather than any cached one.

    Fetch times are synthesized deterministically (REVISIT_BASE_EPOCH
    + variant-day offset + doc_id — unique per row, so the group max
    is unique and latest-wins needs no tie-break; the oracle mirrors
    the formula). Per row: the canonical key, the fetch epoch, the
    latest-wins verdict, how many OTHER snapshots the crawl holds for
    the page, and the row's staleness behind the freshest fetch.

    Scale shape: the canonical projection is zero-shuffle; the
    verdict is ONE window exchange keyed on canonical URL — keys are
    near-unique in a real crawl and group size is bounded by the
    snapshot count per URL (tens, not millions), so the exchange is
    well-spread with no skew hazard at 10^12 fetch records.
    """
    from pyspark.sql import Window

    fetch_epoch = (
        F.lit(REVISIT_BASE_EPOCH)
        + (F.col("doc_id") % 4) * 86_400
        + F.col("doc_id")
    ).cast("long")
    urls = _messy_urls(_docs(spark, sf_dir)).select(
        "doc_id",
        canonical_url(F.col("url")).alias("canon_url"),
        fetch_epoch.alias("fetch_epoch"),
    )
    w = Window.partitionBy("canon_url")
    return urls.select(
        "doc_id",
        "canon_url",
        "fetch_epoch",
        (F.col("fetch_epoch") == F.max("fetch_epoch").over(w)).alias("is_latest"),
        (F.count("*").over(w) - 1).cast("int").alias("n_revisits"),
        (F.max("fetch_epoch").over(w) - F.col("fetch_epoch")).alias("staleness_s"),
    )


SQL_HX_URL_REVISIT = f"""
WITH {_SQL_MESSY_CANON_CTES},
fetched AS (
  SELECT doc_id, canon_url,
         CAST({REVISIT_BASE_EPOCH} + (doc_id % 4) * 86400 + doc_id AS BIGINT)
           AS fetch_epoch
  FROM canon
)
SELECT doc_id, canon_url, fetch_epoch,
  fetch_epoch = max(fetch_epoch) OVER (PARTITION BY canon_url) AS is_latest,
  CAST(count(*) OVER (PARTITION BY canon_url) - 1 AS INT) AS n_revisits,
  CAST(max(fetch_epoch) OVER (PARTITION BY canon_url) - fetch_epoch AS BIGINT)
    AS staleness_s
FROM fetched
"""


# --- refetch-priority scheduling ----------------------------------------------
#
# The crawl-ops stage downstream of revisit dedup: score each
# canonical URL by its OBSERVED change rate across held snapshots and
# bucket it for the refetch scheduler (hot = re-crawl often, cold =
# archival cadence) — the freshness-scheduling counterpart of
# hx_host_budget's politeness cap. Per-snapshot content identity is
# synthesized deterministically (url-class by canonical-key length:
# static / changes-every-snapshot / changes-every-2nd), mirrored in
# the oracle CTE; the operator itself — distinct-version counting and
# the change-rate verdict per URL — is ONE groupBy on the near-unique
# canonical key (bounded group size = snapshot count; no skew hazard).

REFETCH_HOT = 0.6  # change_rate >= HOT -> 'hot'; > 0 -> 'warm'; else 'cold'
#   (the snapshot histories here hold <= 4 fetches, so observable
#   rates are coarse {0, 1/3, 1/2, 2/3, 1}; 0.6 puts the every-2nd-
#   snapshot class in 'warm' and every-snapshot churn in 'hot')


def q_hx_refetch_priority(spark, sf_dir):
    """(canon_url, n_snapshots, n_versions, change_rate, priority):
    per-URL refetch schedule classes from observed snapshot deltas."""
    variant = F.col("doc_id") % 4
    vclass = F.length(F.col("canon_url")) % 3
    version = (
        F.when(vclass == 0, F.lit(0))
        .when(vclass == 1, variant)
        .otherwise(F.floor(variant / 2))
    )
    urls = _messy_urls(_docs(spark, sf_dir)).select(
        canonical_url(F.col("url")).alias("canon_url"),
        F.col("doc_id"),
    )
    g = (
        urls.select("canon_url", version.alias("version"))
        .groupBy("canon_url")
        .agg(
            F.count("*").cast("int").alias("n_snapshots"),
            F.count_distinct("version").cast("int").alias("n_versions"),
        )
    )
    change_rate = F.round(
        (F.col("n_versions") - 1)
        / F.greatest(F.col("n_snapshots") - 1, F.lit(1)),
        4,
    )
    return g.select(
        "canon_url",
        "n_snapshots",
        "n_versions",
        change_rate.alias("change_rate"),
        F.when(change_rate >= REFETCH_HOT, F.lit("hot"))
        .when(change_rate > 0, F.lit("warm"))
        .otherwise(F.lit("cold"))
        .alias("priority"),
    )


SQL_HX_REFETCH_PRIORITY = f"""
WITH {_SQL_MESSY_CANON_CTES},
versioned AS (
  SELECT canon_url,
         CASE length(canon_url) % 3
           WHEN 0 THEN 0
           WHEN 1 THEN doc_id % 4
           ELSE CAST(floor((doc_id % 4) / 2.0) AS BIGINT) END AS version
  FROM canon
),
g AS (
  SELECT canon_url, CAST(count(*) AS INT) AS n_snapshots,
         CAST(count(DISTINCT version) AS INT) AS n_versions
  FROM versioned GROUP BY canon_url
)
SELECT canon_url, n_snapshots, n_versions,
       round((n_versions - 1)::DOUBLE / greatest(n_snapshots - 1, 1), 4)
           AS change_rate,
       CASE WHEN round((n_versions - 1)::DOUBLE / greatest(n_snapshots - 1, 1), 4)
                 >= {REFETCH_HOT} THEN 'hot'
            WHEN round((n_versions - 1)::DOUBLE / greatest(n_snapshots - 1, 1), 4)
                 > 0 THEN 'warm'
            ELSE 'cold' END AS priority
FROM g
"""


# --- ct_chunk_tokens: token-window chunking -----------------------------------

def chunk_tokens(
    docs: DataFrame, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Fixed token windows with overlap (chunk=32, stride=24 ⇒ 8-token
    overlap), the standard shape for pretokenized LM training shards.
    Chunk boundaries come from sequence/transform/slice HOFs + one
    narrow explode: no window function, no sort, no shuffle — a
    10^12-doc pretokenization pays exactly one scan. Delegates to
    ``chunk_array`` (whitespace accounting); ``q_ct_chunk_bpe`` runs
    the SAME core over trained-BPE symbol sequences."""
    return chunk_array(
        docs.select("doc_id", F.split(F.col("text"), " ").alias("_toks")),
        "_toks",
        chunk,
        stride,
    )


def chunk_array(
    docs: DataFrame, toks_col: str, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Windowing core over any (doc_id, <token array>) frame — one
    definition shared by the whitespace and BPE-symbol chunkers, so
    switching token accounting can never drift the layout rule."""
    words = F.col(toks_col)
    n = F.size(words)
    n_chunks = (F.floor((F.greatest(n - chunk, F.lit(0)) + stride - 1) / stride) + 1).cast(
        "int"
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride + 1).cast("int").alias("begin_tok"),
            F.slice(words, i * stride + 1, chunk).alias("toks"),
        ),
    )
    return docs.select("doc_id", F.explode(spans).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.begin_tok").alias("begin_tok"),
        F.size("c.toks").alias("n_tokens"),
        F.array_join("c.toks", " ").alias("chunk_text"),
    )


def q_ct_chunk_tokens(spark, sf_dir):
    return chunk_tokens(_docs(spark, sf_dir))


SQL_CT_CHUNK_TOKENS = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents
),
counted AS (
  SELECT doc_id, ws, n,
         (greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1
             AS n_chunks
  FROM w
),
chunks AS (
  SELECT doc_id, ws, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM counted
)
SELECT doc_id,
  CAST(chunk_id AS INT) AS chunk_id,
  CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT) AS begin_tok,
  CAST(len(list_slice(ws, chunk_id * {CHUNK_STRIDE} + 1,
                      least(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n))) AS INT)
      AS n_tokens,
  array_to_string(list_slice(ws, chunk_id * {CHUNK_STRIDE} + 1,
                             least(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)), ' ')
      AS chunk_text
FROM chunks
"""


def q_ct_chunk_bpe(spark, sf_dir):
    """Token-window chunking with REAL (trained-BPE) token accounting:
    the SAME windowing core as ``ct_chunk_tokens`` over each doc's
    trained symbol sequence (``bpe_symbol_docs``) — whitespace counts
    under-charge rare words, so word-windowed chunks overflow a real
    context window; symbol-windowed ones cannot. One doc_id exchange
    for the sequence assembly + the zero-shuffle windowing."""
    from .text_analysis import bpe_symbol_docs

    return chunk_array(bpe_symbol_docs(spark, sf_dir), "toks")


def _sql_ct_chunk_bpe() -> str:
    from .text_analysis import _sql_bpe_rounds, _sql_bpe_symbol_docs

    return f"""
WITH {_sql_bpe_rounds()},
{_sql_bpe_symbol_docs()},
counted AS (
  SELECT doc_id, ws, len(ws) AS n,
         (greatest(len(ws) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1
             AS n_chunks
  FROM seq
),
chunks AS (
  SELECT doc_id, ws, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM counted
)
SELECT doc_id,
  CAST(chunk_id AS INT) AS chunk_id,
  CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT) AS begin_tok,
  CAST(len(list_slice(ws, chunk_id * {CHUNK_STRIDE} + 1,
                      least(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n))) AS INT)
      AS n_tokens,
  array_to_string(list_slice(ws, chunk_id * {CHUNK_STRIDE} + 1,
                             least(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n)), ' ')
      AS chunk_text
FROM chunks
"""


# --- per-host crawl budgeting --------------------------------------------------

HOST_BUDGET = 25  # pages kept per host


def q_hx_host_budget(spark, sf_dir):
    """Per-host crawl budget: keep the top HOST_BUDGET pages per host
    by size (n_chars desc, doc_id tiebreak) — the politeness/diversity
    cap every frontier applies so one giant host cannot dominate the
    corpus.

    Host synthesis is skewed on purpose (host_id = least(doc_id % 16,
    7): seven 1/16-weight hosts and one 9/16-weight heavy host) because
    the real web is zipf in host size, and a naive
    Window.partitionBy(host) ships EVERY page of the heavy host to one
    task. The skew-safe shape used here is two-phase top-K: rank
    within (host, input partition) first — keys spread across the
    cluster — keep only local ranks <= K, then rank the <= K x
    n_partitions survivors per host. The heavy host's global window
    sees at most K x partitions rows regardless of corpus size. Host
    totals come from a separate partial-aggregated groupBy (map-side
    combine handles the skew natively) broadcast back onto the
    survivors; that second pass is deliberate and cheap — it is
    column-pruned to doc_id alone (host derives from it), unlike the
    top-K pass which carries the payload columns, and a full per-host
    count cannot be recovered after the local top-K filter."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("site"), F.least(F.col("doc_id") % 16, F.lit(7)), F.lit(".com")
        ).alias("host"),
    )
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    local = (
        docs.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "local_rank",
            F.row_number().over(Window.partitionBy("host", "pid").orderBy(*order)),
        )
        .filter(F.col("local_rank") <= HOST_BUDGET)
        .drop("pid", "local_rank")
    )
    ranked = local.withColumn(
        "page_rank",
        F.row_number().over(Window.partitionBy("host").orderBy(*order)).cast("int"),
    ).filter(F.col("page_rank") <= HOST_BUDGET)
    totals = docs.groupBy("host").agg(F.count("*").cast("int").alias("host_pages"))
    return ranked.join(F.broadcast(totals), "host").select(
        "doc_id", "host", "n_chars", "page_rank", "host_pages"
    )


SQL_HX_HOST_BUDGET = f"""
WITH pages AS (
  SELECT doc_id, n_chars,
         'site' || least(doc_id % 16, 7) || '.com' AS host
  FROM documents
),
ranked AS (
  SELECT doc_id, host, n_chars,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY n_chars DESC, doc_id) AS INT) AS page_rank,
         CAST(count(*) OVER (PARTITION BY host) AS INT) AS host_pages
  FROM pages
)
SELECT doc_id, host, n_chars, page_rank, host_pages
FROM ranked WHERE page_rank <= {HOST_BUDGET}
"""


# --- hx_pagerank: link-graph authority score ----------------------------------
#
# The crawl-curation authority signal (Common Crawl's harmonic-
# centrality / PageRank host rankings) over the corpus's own link
# graph — the one quality feature that needs an ITERATIVE plan, so it
# exercises a shape nothing else in the registry does: per round, one
# equi-join (rank lookup by edge source) + one well-spread groupBy
# (mass arriving per target), rank frames lineage-truncated between
# rounds exactly like the connected-components loop (dedup.py).
#
# Determinism across engines: rank mass is EXACT fixed-point
# (PR_MICRO = 10^12 micro-units, integer `div` for the damping and
# out-degree splits, integer sums) — order-independent, so Spark and
# DuckDB agree digit-for-digit with no float-rounding contract.
#
# Scale shape at 10^12 docs: edges are materialized once (the
# out-degree join is pre-fused); each round shuffles the rank table on
# its key and the contributions on dst — both well-spread; the
# iteration count is fixed (PR_ITERS), not convergence-polled, so the
# job graph is static. Dangling mass: every synthetic doc carries an
# outlink (out-degree ≥ 1); links to ids absent from the corpus drop
# their mass at the final left join (the standard open-web
# approximation), identically in the oracle.

PR_ITERS = 3
PR_MICRO = 1_000_000_000_000
_PR_DOC_LINK_RE = r"/doc/([0-9]+)"


def q_hx_pagerank(spark, sf_dir):
    """(doc_id, pr_micro): damped PageRank (d = 0.85) after PR_ITERS
    synchronous rounds over the parsed /doc/N link graph, in exact
    integer micro-units. The corpus size enters as two scalar
    constants (uniform init, teleport term) from a parquet
    count-star — row-group metadata, not a data scan."""
    docs = htmlized(_docs(spark, sf_dir))
    n = docs.sparkSession.read.parquet(f"{sf_dir}/documents.parquet").count()
    teleport = (15 * PR_MICRO // 100) // n
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.regexp_extract_all(F.col("html"), F.lit(_PR_DOC_LINK_RE), F.lit(1))
        ).alias("dst_s"),
    ).select("src", F.col("dst_s").cast("long").alias("dst"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_w = edges.join(outdeg, "src").localCheckpoint(eager=False)
    nodes = docs.select("doc_id")
    ranks = nodes.select("doc_id", F.lit(PR_MICRO // n).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        arriving = (
            edges_w.join(ranks, edges_w["src"] == ranks["doc_id"])
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("(85 * pr) div (100 * outdeg)").alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.join(arriving, "doc_id", "left")
            .select(
                "doc_id",
                (F.lit(teleport) + F.coalesce(F.col("m"), F.lit(0)))
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("doc_id", F.col("pr").alias("pr_micro"))


def _pr_round_sql(prev: str) -> str:
    return f"""
  SELECT d.doc_id,
         (SELECT 150000000000 // count(*) FROM documents)
           + coalesce(s.m, 0) AS pr
  FROM documents d LEFT JOIN (
    SELECT e.dst AS doc_id, sum((85 * r.pr) // (100 * e.outdeg)) AS m
    FROM edges_w e JOIN {prev} r ON r.doc_id = e.src
    GROUP BY e.dst
  ) s USING (doc_id)
"""


SQL_HX_PAGERANK = f"""
WITH {_SQL_HTML_CTE},
edges AS (
  SELECT doc_id AS src,
         CAST(unnest(regexp_extract_all(html, '{_PR_DOC_LINK_RE}', 1)) AS BIGINT) AS dst
  FROM html
),
edges_w AS (
  SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg FROM edges
),
r0 AS (
  SELECT doc_id,
         CAST({PR_MICRO} AS BIGINT) // (SELECT count(*) FROM documents) AS pr
  FROM documents
),
r1 AS ({_pr_round_sql("r0")}),
r2 AS ({_pr_round_sql("r1")}),
r3 AS ({_pr_round_sql("r2")})
SELECT doc_id, CAST(pr AS BIGINT) AS pr_micro FROM r3
"""


# --- hx_tables: table-structure recovery --------------------------------------
#
# Tables are the one DOM structure a line-mode extractor flattens
# badly: cell text concatenated in document order loses the (row, col)
# grid that gives it meaning. Structure recovery — emitting one row
# per CELL with its grid coordinates — is its own extraction op
# (what table-aware corpus builds run next to main-content). The
# table-bearing HTML here is derived per doc inside the query
# (deterministic 2x3 grid from the doc's leading words, '-'-padded),
# self-contained so the shared chrome CTE and every other hx_* oracle
# stay byte-identical.

TBL_ROWS = 2
TBL_COLS = 3
_TR_RE = r"<tr>(.*?)</tr>"
_TD_RE = r"<td>([^<]*)</td>"


def q_hx_tables(spark, sf_dir):
    """(doc_id, row_idx, col_idx, cell): the recovered cell grid.
    Extraction is the real operator under test — the <tr> snippets
    come from one non-greedy regexp_extract_all (row text must bind
    its OWN cells, so the row snippet is the extraction unit — the
    same same-tag argument as hx_anchor_text), then per-row cell
    extraction; posexplode supplies both grid coordinates. Narrow
    end-to-end: two explodes, zero shuffles, zero Python at any
    corpus size."""
    words = F.split(F.col("text"), " ")
    cell = lambda i: F.coalesce(F.get(words, i), F.lit("-"))  # noqa: E731
    tr = lambda r: F.concat(  # noqa: E731
        F.lit("<tr>"),
        *[
            F.concat(F.lit("<td>"), cell(r * TBL_COLS + c), F.lit("</td>"))
            for c in range(TBL_COLS)
        ],
        F.lit("</tr>"),
    )
    html_t = F.concat(
        F.lit("<table>"), *[tr(r) for r in range(TBL_ROWS)], F.lit("</table>")
    )
    # inject html_t via a projection first (the expr() below reads it)
    rows = (
        _docs(spark, sf_dir)
        .select("doc_id", html_t.alias("html_t"))
        .select(
            "doc_id",
            F.posexplode(F.expr(f"regexp_extract_all(html_t, '{_TR_RE}', 1)")).alias(
                "row_idx", "tr"
            ),
        )
    )
    return rows.select(
        "doc_id",
        "row_idx",
        F.posexplode(F.expr(f"regexp_extract_all(tr, '{_TD_RE}', 1)")).alias(
            "col_idx", "cell"
        ),
    ).select(
        "doc_id",
        F.col("row_idx").cast("int").alias("row_idx"),
        F.col("col_idx").cast("int").alias("col_idx"),
        "cell",
    )


def _sql_hx_tables() -> str:
    # rebuild per-row <tr> wrapping by position
    trs = " || ".join(
        "'<tr>' || "
        + " || ".join(
            "'<td>' || coalesce(ws[{i}], '-') || '</td>'".format(i=r * TBL_COLS + c + 1)
            for c in range(TBL_COLS)
        )
        + " || '</tr>'"
        for r in range(TBL_ROWS)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         '<table>' || {trs} || '</table>' AS html_t
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
rows_x AS (
  SELECT doc_id, i - 1 AS row_idx,
         regexp_extract_all(html_t, '{_TR_RE}', 1)[i] AS tr
  FROM t, LATERAL unnest(generate_series(1,
         len(regexp_extract_all(html_t, '{_TR_RE}', 1)))) AS u(i)
)
SELECT doc_id, CAST(row_idx AS INT) AS row_idx,
       CAST(j - 1 AS INT) AS col_idx,
       regexp_extract_all(tr, '{_TD_RE}', 1)[j] AS cell
FROM rows_x, LATERAL unnest(generate_series(1,
       len(regexp_extract_all(tr, '{_TD_RE}', 1)))) AS v(j)
"""


QUERIES = {
    "hx_main_content": q_hx_main_content,
    "hx_parse_blocks": q_hx_parse_blocks,
    "hx_outlinks": q_hx_outlinks,
    "hx_anchor_text": q_hx_anchor_text,
    "hx_url_canonicalize": q_hx_url_canonicalize,
    "hx_url_revisit": q_hx_url_revisit,
    "hx_refetch_priority": q_hx_refetch_priority,
    "ct_chunk_tokens": q_ct_chunk_tokens,
    "ct_chunk_bpe": q_ct_chunk_bpe,
    "hx_host_budget": q_hx_host_budget,
    "hx_tables": q_hx_tables,
    "hx_pagerank": q_hx_pagerank,
}

ORACLES = {
    "hx_main_content": SQL_HX_MAIN_CONTENT,
    "hx_parse_blocks": SQL_HX_PARSE_BLOCKS,
    "hx_outlinks": SQL_HX_OUTLINKS,
    "hx_anchor_text": SQL_HX_ANCHOR_TEXT,
    "hx_url_canonicalize": SQL_HX_URL_CANON,
    "hx_url_revisit": SQL_HX_URL_REVISIT,
    "hx_refetch_priority": SQL_HX_REFETCH_PRIORITY,
    "ct_chunk_tokens": SQL_CT_CHUNK_TOKENS,
    "ct_chunk_bpe": _sql_ct_chunk_bpe(),
    "hx_host_budget": SQL_HX_HOST_BUDGET,
    "hx_tables": _sql_hx_tables(),
    "hx_pagerank": SQL_HX_PAGERANK,
}
