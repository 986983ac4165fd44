"""Scalar-function catalog — SURVEY.md §2.8 (F1-F26) as queries.

Grouped into themed queries so each built-in function surface
(string / URL / date / array / JSON / math) is exercised and
oracle-checked. All JVM-side built-ins — no Python in any of these.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register
from .relational import ASOF


@register(
    "f01_string_basics",
    """
    SELECT doc_id,
           lower(substring(text, 1, 20)) AS head_lower,
           length(text) AS text_len,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           trim(substring(text, 1, 12)) AS head_trim,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_code
    FROM documents
    """,
)
def f01_string_basics(spark, sf_dir):
    """F1/F11-F15: lower, length, tokenize-count, trim, zero-pad
    (refs: Matching_P1.py:21-23; Common_Crawl_EDA.py:22-23;
    combine_trustpilot_with_CH.py:11-12; Scrape_Utils.py:262-265)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head_lower"),
        F.length("text").alias("text_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.trim(F.substring("text", 1, 12)).alias("head_trim"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_code"),
    )


@register(
    "f02_suffix_strip_normalize",
    """
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(lower(c_name),
                            ' (limited liability partnership|limited|ltd|llp)$', ''),
             '[^a-z0-9]', '') AS clean_name
    FROM customer
    """,
)
def f02_suffix_strip_normalize(spark, sf_dir):
    """F2/F3: ordered company-suffix strip (longest first) + keep-alnum
    normalize (ref Matching_P1.py:27-41 — order matters: 'limited
    liability partnership' before 'limited'/'ltd'/'llp'; alternation
    encodes the same precedence)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(
                F.lower("c_name"),
                " (limited liability partnership|limited|ltd|llp)$",
                "",
            ),
            "[^a-z0-9]",
            "",
        ).alias("clean_name"),
    )


@register(
    "f05_url_parsing",
    """
    SELECT doc_id,
           'http://www.' || source || '.example.co.uk/path/' ||
             CAST(doc_id AS VARCHAR) AS url,
           'www.' || source || '.example.co.uk' AS host,
           source AS domain_fragment
    FROM documents
    """,
)
def f05_url_parsing(spark, sf_dir):
    """F5-F7: host extraction + domain fragment via Spark's parse_url
    (ref urlparse(x).netloc, Common_Crawl_EDA.py:28; domain fragment
    Matching_P1.py:171-183). URLs synthesized from `source` so the
    oracle can derive the same values by construction."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://www."),
        F.col("source"),
        F.lit(".example.co.uk/path/"),
        F.col("doc_id").cast("string"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    fragment = F.split(F.regexp_replace(host, r"^www\.", ""), r"\.")[0]
    return docs.select(
        "doc_id",
        url.alias("url"),
        host.alias("host"),
        fragment.alias("domain_fragment"),
    )


@register(
    "f10_regexp_extract",
    """
    SELECT p_partkey,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word
    FROM part
    """,
)
def f10_regexp_extract(spark, sf_dir):
    """F10: regex extraction (ref SIC 4-digit prefix Visuals.py:70;
    company-number regex company_number_scrape.py:10)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


@register(
    "f16_array_ops",
    """
    SELECT p_partkey,
           array_to_string(list_sort(string_split(p_name, ' ')), '|')
             AS tokens_sorted,
           array_to_string(string_split(p_name, ' '), ', ') AS name_joined,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_parts
    FROM part
    """,
)
def f16_array_ops(spark, sf_dir):
    """F16/F17: split-to-array + array_join (refs Scrape_Utils.py:266,
    Matching_with_recursion.py:257).

    The array itself is materialized JVM-side (split/sort_array) but the
    output columns are all scalar: the driver's hash canonicalizer cannot
    sort raw ARRAY columns, so we emit the sorted token list re-joined as
    a string instead of the list object.
    """
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_join(F.sort_array(F.split("p_name", " ")), "|").alias(
            "tokens_sorted"
        ),
        F.array_join(F.split("p_name", " "), ", ").alias("name_joined"),
        F.size(F.split("p_name", " ")).alias("n_parts"),
    )


@register(
    "f18_safe_slug",
    """
    SELECT doc_id,
           regexp_replace('http://' || source || '.com/a b?q=1',
                          '[^a-zA-Z0-9]', '_', 'g') AS slug
    FROM documents
    """,
)
def f18_safe_slug(spark, sf_dir):
    """F18: safe-filename slug (ref Scrape_Utils.py:155-158)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.concat(F.lit("http://"), F.col("source"), F.lit(".com/a b?q=1")),
            "[^a-zA-Z0-9]",
            "_",
        ).alias("slug"),
    )


@register(
    "f20_date_functions",
    f"""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '{ASOF} 00:00:00') AS BIGINT)
             AS days_old,
           round(date_diff('day', o_orderdate, TIMESTAMP '{ASOF} 00:00:00')
                 / 365.0, 4) AS age_years
    FROM orders
    """,
)
def f20_date_functions(spark, sf_dir):
    """F20-F22: date parts, datediff-based age (ref
    Companies_House_EDA.py:37-47, Visuals.py:56-58; 'today' pinned)."""
    asof = F.lit(ASOF).cast("timestamp")
    days = F.datediff(asof, F.col("o_orderdate")).cast("long")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        days.alias("days_old"),
        F.round(days / 365.0, 4).alias("age_years"),
    )


@register(
    "f23_json_fence_strip",
    """
    SELECT event_id,
           CAST(json_extract_string(
             regexp_replace(regexp_replace('```json ' || props || ' ```',
                            '^```(json)?\\s*', ''), '\\s*```$', ''),
             '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def f23_json_fence_strip(spark, sf_dir):
    """F23: LLM-reply markdown-fence stripping + JSON field parse
    (ref parse_llm_output, Matching_P1.py:125-169). Fences are
    synthesized around the props payload, then stripped — exactly the
    reference's regex dance."""
    fenced = F.concat(F.lit("```json "), F.col("props"), F.lit(" ```"))
    stripped = F.regexp_replace(
        F.regexp_replace(fenced, r"^```(json)?\s*", ""), r"\s*```$", ""
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object(stripped, "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "f26_math_ratio",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5)
             / 10000 AS charged,
           floor(l_discount / (l_tax + 0.01) * 10000 + 0.5) / 10000
             AS disc_tax_ratio
    FROM lineitem
    """,
)
def f26_math_ratio(spark, sf_dir):
    """F26: plain column arithmetic (ref similarity-ratio math,
    Matching_P1.py:74-81). Rounding is floor(x*1e4+0.5)/1e4 on BOTH
    sides: pure float64 ops are bit-identical across engines, while
    round() differs at shortest-decimal-repr ties (Spark rounds the
    printed repr via BigDecimal, DuckDB rounds the binary value)."""
    li = load(spark, sf_dir, "lineitem")
    charged = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    ratio = F.col("l_discount") / (F.col("l_tax") + 0.01)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(charged * 10000 + 0.5) / 10000).alias("charged"),
        (F.floor(ratio * 10000 + 0.5) / 10000).alias("disc_tax_ratio"),
    )
