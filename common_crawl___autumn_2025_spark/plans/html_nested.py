"""HTML extraction (U2/U3) and nested-document queries (S7/F24).

The HTML pipeline mirrors the reference's ``ScrapeToMarkdown``
(``Scrape_Utils.py:38-91``: strip script/style/nav/footer/header/
form/aside, then extract text) and ``html_tags.py:16-69`` (tag-scoped
title extraction). Here the HTML is synthesized around the
``documents`` text so the extraction is oracle-checkable: both
engines run the IDENTICAL RE2-safe regexes (no backreferences — RE2,
DuckDB's engine, has none).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register

_HTML = (
    "'<html><head><title>doc ' || CAST(doc_id AS VARCHAR) || '</title></head>"
    "<body><script>var x=1;</script><nav>menu links</nav><p>' || text || "
    "'</p><footer>copyright foo</footer></body></html>'"
)

_STRIP_BLOCKS = (
    "regexp_replace(regexp_replace(regexp_replace({h}, "
    "'<script[^>]*>[^<]*</script>', ' ', 'g'), "
    "'<nav[^>]*>[^<]*</nav>', ' ', 'g'), "
    "'<footer[^>]*>[^<]*</footer>', ' ', 'g')"
)


@register(
    "u02_html_to_text",
    f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(
             {_STRIP_BLOCKS.format(h=_HTML)},
             '<[^>]+>', ' ', 'g'), ' +', ' ', 'g')) AS extracted
    FROM documents
    """,
)
def u02_html_to_text(spark, sf_dir):
    """U2: HTML → text extraction as a JVM regex chain (block strip →
    tag strip → whitespace collapse). The reference does this per-row
    in Python with BeautifulSoup+html2text; declarative regexes keep
    it in whole-stage codegen."""
    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><script>var x=1;</script>"
              "<nav>menu links</nav><p>"),
        F.col("text"),
        F.lit("</p><footer>copyright foo</footer></body></html>"),
    )
    stripped = html
    for tag in ("script", "nav", "footer"):
        stripped = F.regexp_replace(
            stripped, f"<{tag}[^>]*>[^<]*</{tag}>", " "
        )
    text = F.trim(
        F.regexp_replace(F.regexp_replace(stripped, "<[^>]+>", " "), " +", " ")
    )
    return docs.select("doc_id", text.alias("extracted"))


@register(
    "u03_tag_scoped_extract",
    f"""
    SELECT doc_id,
           regexp_extract({_HTML}, '<title>([^<]*)</title>', 1) AS title,
           regexp_extract({_HTML}, '<p>([^<]*)</p>', 1) AS body_text
    FROM documents
    """,
)
def u03_tag_scoped_extract(spark, sf_dir):
    """U3: tag-scoped extraction (title/body — reference
    ``html_tags.py:16-69``)."""
    docs = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><script>var x=1;</script>"
              "<nav>menu links</nav><p>"),
        F.col("text"),
        F.lit("</p><footer>copyright foo</footer></body></html>"),
    )
    return docs.select(
        "doc_id",
        F.regexp_extract(html, "<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(html, "<p>([^<]*)</p>", 1).alias("body_text"),
    )


@register(
    "s07_nested_flatten",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM orders
    """,
)
def s07_nested_flatten(spark, sf_dir):
    """S7: nest rows into array-of-structs per entity, then flatten
    back via explode — the reference's trial-document shape
    (``pd.json_normalize`` / nested scraper results,
    ``Scrape_Utils.py:178-202``). The oracle checks the roundtrip is
    lossless (flatten(nest(x)) == x)."""
    orders = load(spark, sf_dir, "orders")
    nested = orders.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(F.struct("o_orderkey", "o_totalprice"))
        ).alias("orders_arr")
    )
    return nested.select(
        "o_custkey", F.explode("orders_arr").alias("o")
    ).select(
        "o_custkey",
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.col("o.o_totalprice").alias("o_totalprice"),
    )


@register(
    "f24_json_array_decode",
    """
    SELECT doc_id,
           json_extract_string('["' || source || '","' || lang || '"]', '$[0]')
             AS first_tag,
           CAST(2 AS INT) AS n_tags
    FROM documents
    """,
)
def f24_json_array_decode(spark, sf_dir):
    """F24: JSON-encoded-array-in-string decode — the reference's
    ``sic_code_no`` field is the string '["62020"]'
    (``scraper_results_Random_CH.json:10``)."""
    from pyspark.sql import types as T

    docs = load(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('["'), F.col("source"), F.lit('","'), F.col("lang"), F.lit('"]')
    )
    arr = F.from_json(payload, T.ArrayType(T.StringType()))
    return docs.select(
        "doc_id",
        arr[0].alias("first_tag"),
        F.size(arr).alias("n_tags"),
    )
