"""Text-analysis operators over ``documents``: language ID, quality
scoring, token counting, fingerprinting, hash-gate sampling, sequence
packing, repetition gating — the per-document scoring stages of a
training-data pipeline. All value-checked against full DuckDB oracles
(the rolling fingerprint and hash-gate sampling via the xxh64/modular
SQL unrolls).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.xxh64_sql import xxh64_ctes
from ..plans import load, register, spread_if_large

# marker-word heuristic language ID (n-gram heuristic family;
# deterministic, works on any text — the reference seeds langdetect
# for the same determinism goal, Common_Crawl_EDA.py:4-6)
LANG_MARKERS = [
    ("en", (" the ", " and ")),
    ("de", (" der ", " und ")),
    ("es", (" el ", " los ")),
    ("fr", (" le ", " les ")),
]


def predicted_lang_expr(text_col: str = "text"):
    """The t01 marker-token language rule as a reusable Column
    (first matching family wins) — shared with e08's datasheet so
    the rule lives in exactly one place."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    expr = F.lit("und")
    for lang, markers in reversed(LANG_MARKERS):
        cond = None
        for m in markers:
            c = F.contains(padded, F.lit(m))
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, lang).otherwise(expr)
    return expr


def predicted_lang_sql(x: str = "text") -> str:
    """The same rule as DuckDB CASE text, generated from the SAME
    LANG_MARKERS table the engine expression reads."""
    whens = "\n             ".join(
        "WHEN "
        + " OR ".join(
            f"contains(' ' || {x} || ' ', '{m}')" for m in markers
        )
        + f" THEN '{lang}'"
        for lang, markers in LANG_MARKERS
    )
    return f"CASE\n             {whens}\n             ELSE 'und'\n           END"


@register(
    "t01_language_id",
    f"""
    SELECT doc_id, lang,
           {predicted_lang_sql("text")} AS predicted_lang
    FROM documents
    """,
)
def t01_language_id(spark, sf_dir):
    """Marker-token language ID (first matching family wins)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", "lang", predicted_lang_expr().alias("predicted_lang")
    )


def quality_gate_expr(text):
    """The t02 pass/fail gate as a reusable Column expression (shared
    with e07's ship gate so the rule lives in exactly one place)."""
    n_words = F.size(F.split(text, " "))
    n_punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    return n_words.between(20, 1000) & (n_punct * 10 < F.length(text))


# the same gate as DuckDB SQL text ({x} = text expression) — spliced
# by t02's oracle and e07's composed oracle
QUALITY_GATE_SQL = (
    "(len(string_split({x}, ' ')) BETWEEN 20 AND 1000"
    " AND length(regexp_replace({x}, '[a-zA-Z0-9 ]', '', 'g')) * 10"
    " < length({x}))"
)


@register(
    "t02_quality_score",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(CAST(length(text) AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1), 4) AS avg_word_len,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
                 AND length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 10
                     < length(text)
                THEN TRUE ELSE FALSE END AS passes_quality
    FROM documents
    """,
)
def t02_quality_score(spark, sf_dir):
    """Quality scoring: length, punctuation ratio, average word
    length, and a pass/fail gate (the length/punct heuristics family;
    reference analog: short-page filter, Visuals.py:131)."""
    text = F.col("text")
    n_words = F.size(F.split(text, " "))
    n_punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    # scale-adaptive spread before the regex scan: a single-row-group
    # parquet file is ONE input split, serializing the per-row regex
    # (sf1.0: 1.23->0.42 s); below ~1024 docs/core the exchange is
    # not worth it and the scan stays as-is (r7)
    return spread_if_large(
        load(spark, sf_dir, "documents"), sf_dir, "documents", key="doc_id"
    ).select(
        "doc_id",
        n_words.alias("n_words"),
        F.length(text).cast("long").alias("n_chars_actual"),
        F.round(n_punct * 1.0 / F.greatest(F.length(text), F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(
            F.length(text).cast("double") / F.greatest(n_words, F.lit(1)), 4
        ).alias("avg_word_len"),
        quality_gate_expr(text).alias("passes_quality"),
    )


@register(
    "t03_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS INT) AS bpe_ish_tokens
    FROM documents
    """,
)
def t03_token_count(spark, sf_dir):
    """Token counting: whitespace split + a BPE-ish regex tokenizer
    (letters / digits / single punctuation)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
            )
        ).alias("bpe_ish_tokens"),
    )


@register(
    "t04_fingerprint_md5",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
    FROM documents
    """,
)
def t04_fingerprint_md5(spark, sf_dir):
    """Normalized-content fingerprint: keep-alnum normalize (F3) then
    digest — the canonical-form dedup key."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")).alias(
            "fingerprint"
        ),
    )


def _t05_oracle_sql() -> str:
    """Full VALUE oracle for the rolling fingerprint: the base-257
    window-8 polynomial mod 2^61-1 is pure integer arithmetic, so
    each window hash unrolls to an 8-term HUGEINT sum (the per-step
    modular reduction in the Python implementation is equivalent to
    one final ``%`` — mod distributes over the polynomial). Both
    engines iterate UNICODE CODEPOINTS (Python ``ord`` == DuckDB
    ``ord`` over character-indexed ``substr``); sub-window docs are
    NUL-padded to 8 on both sides; NULL text yields NULL fp via the
    left join."""
    mod = (1 << 61) - 1
    terms = " + ".join(
        f"ord(substr(w.s, w.i + {j}, 1))::HUGEINT * {pow(257, 7 - j)}::HUGEINT"
        for j in range(8)
    )
    return f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 8 THEN text
                  ELSE rpad(text, 8, chr(0)) END AS s
      FROM documents WHERE text IS NOT NULL
    ),
    w AS (
      SELECT doc_id, s,
             unnest(generate_series(1, length(s) - 7)) AS i
      FROM d
    ),
    win AS (SELECT w.doc_id, CAST(({terms}) % {mod} AS BIGINT) AS h FROM w),
    fps AS (SELECT doc_id, min(h) AS fp FROM win GROUP BY doc_id)
    SELECT doc.doc_id, fps.fp
    FROM documents doc LEFT JOIN fps ON doc.doc_id = fps.doc_id
    ORDER BY doc.doc_id
    """


@register("t05_rolling_fingerprint", _t05_oracle_sql())
def t05_rolling_fingerprint(spark, sf_dir):
    """Winnowing-style rolling-hash fingerprint (Arrow UDF); the
    DuckDB oracle (``_t05_oracle_sql``) value-checks every window
    hash via the unrolled polynomial."""
    from ..functions.text import rolling_fingerprint_udf

    return (
        load(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", rolling_fingerprint_udf(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


# -- training-mixture sampling & packing --------------------------------

# per-language keep rates in basis points of 10^4: downsample the
# dominant language, keep the tails — the mixture-rebalancing step a
# multilingual training pipeline runs between scoring and packing
SAMPLE_RATES_BP = {"en": 3000, "de": 8000, "es": 8000, "fr": 8000,
                   "zh": 8000}
SAMPLE_DEFAULT_BP = 5000
_SIGNED64 = (
    "CASE WHEN h >= 9223372036854775808 "
    "THEN CAST(h - 18446744073709551616 AS BIGINT) "
    "ELSE CAST(h AS BIGINT) END"
)


def _t06_oracle_sql() -> str:
    """Value oracle for the hash-gate sampler: the gate is
    ``pmod(xxhash64(doc_id), 10^4)`` — XXH64 comes from the SQL
    unroll in ``functions/xxh64_sql.py``, converted to Spark's
    signed view before the positive-mod so both engines gate on the
    identical residue."""
    hx, hf = xxh64_ctes("t6h", "base", ["doc_id", "lang"])
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}"
        for lang, bp in SAMPLE_RATES_BP.items()
    )
    return f"""
    WITH base AS (
      SELECT doc_id, lang, CAST(doc_id AS VARCHAR) AS s FROM documents
    ),
    {hx},
    gated AS (
      SELECT doc_id, lang,
             (({_SIGNED64} % 10000) + 10000) % 10000 AS gate
      FROM {hf}
    )
    SELECT doc_id, lang FROM gated
    WHERE gate < CASE {cases} ELSE {SAMPLE_DEFAULT_BP} END
    ORDER BY doc_id
    """


@register("t06_stratified_sample", _t06_oracle_sql())
def t06_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling by language: keep a doc iff
    ``pmod(xxhash64(doc_id), 10^4) < rate_bp[lang]``.

    The 100 TB shape is the whole point: the gate is a pure map-side
    filter on a JVM hash of the key — NO shuffle, NO sample() RNG
    (reproducible across runs, executors, and retries), NO
    per-stratum pass; rebalancing a 100 TB multilingual corpus costs
    one scan. Rates are per-stratum basis points (en downsampled,
    tail languages kept at 80%)."""
    docs = load(spark, sf_dir, "documents")
    rate = F.lit(SAMPLE_DEFAULT_BP)
    for lang, bp in reversed(list(SAMPLE_RATES_BP.items())):
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    gate = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(10000))
    return (
        docs.where(gate < rate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


PACK_BUCKETS = 8            # parallel packing streams (scale knob:
                            # ~corpus_tokens / budget / packs_per_task)
PACK_BUDGET_TOKENS = 2048   # context-window token budget per pack


def _t07_oracle_sql() -> str:
    hx, hf = xxh64_ctes("t7h", "base", ["doc_id"])
    return f"""
    WITH base AS (
      SELECT doc_id, CAST(doc_id AS VARCHAR) AS s FROM documents
    ),
    toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    {hx},
    keyed AS (
      SELECT h.doc_id,
             ((({_SIGNED64}) % {PACK_BUCKETS}) + {PACK_BUCKETS})
               % {PACK_BUCKETS} AS bucket,
             {_SIGNED64} AS hkey
      FROM {hf} h
    ),
    cums AS (
      SELECT k.doc_id, k.bucket, t.n_tokens,
             SUM(t.n_tokens) OVER (
               PARTITION BY k.bucket ORDER BY k.hkey, k.doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM keyed k JOIN toks t ON k.doc_id = t.doc_id
    )
    SELECT doc_id, CAST(bucket AS INT) AS bucket,
           CAST((cum - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT)
             AS pack_id,
           n_tokens
    FROM cums ORDER BY doc_id
    """


@register("t07_sequence_pack", _t07_oracle_sql())
def t07_sequence_pack(spark, sf_dir):
    """Concatenate-then-chunk shard assignment (sequence packing):
    docs are dealt into ``PACK_BUCKETS`` deterministic hash streams,
    ordered pseudo-randomly inside each stream (same xxhash64 key),
    and cut into packs every ``PACK_BUDGET_TOKENS`` whitespace
    tokens — ``pack_id = tokens_before_me // budget``, the standard
    pretraining packing where the loader concatenates a stream and
    splits at window boundaries.

    100 TB shape: one shuffle on ``bucket`` + a window cumsum per
    stream. The bucket count is the scale knob — size it so one
    stream's packs fit a task (at 10^11 docs that is ~10^5 buckets,
    not 8); the hash deal keeps streams balanced with no skew key
    (the hash IS the partition key), and the whole assignment is
    reproducible across runs and retries because nothing samples."""
    docs = load(spark, sf_dir, "documents")
    hkey = F.xxhash64(F.col("doc_id").cast("string"))
    keyed = docs.select(
        "doc_id",
        F.pmod(hkey, F.lit(PACK_BUCKETS)).cast("int").alias("bucket"),
        hkey.alias("hkey"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    ).repartition(PACK_BUCKETS, "bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "bucket",
            F.floor(
                (F.col("cum") - F.col("n_tokens")) / PACK_BUDGET_TOKENS
            ).cast("long").alias("pack_id"),
            "n_tokens",
        )
        .orderBy("doc_id")
    )


def _t08_oracle_sql() -> str:
    """DuckDB twin of the repetition signals: identical token/bigram
    grouping, identical float arithmetic (integer counts divided as
    doubles in the same order), 1-token docs get bigram fraction 0
    via the same left join + coalesce."""
    return """
    WITH lists AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS l
      FROM documents WHERE text IS NOT NULL
    ),
    toks AS (SELECT doc_id, unnest(l) AS tok FROM lists),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    tok_stats AS (
      SELECT doc_id, SUM(c) AS total, COUNT(*) AS dist, MAX(c) AS topc
      FROM tc GROUP BY doc_id
    ),
    bgs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)),
                                   i -> l[i] || ' ' || l[i + 1])) AS bg
      FROM lists WHERE len(l) >= 2
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY doc_id, bg),
    bg_stats AS (
      SELECT doc_id, SUM(c) AS btotal, MAX(c) AS btopc
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.total AS BIGINT) AS n_tokens,
           1.0 - CAST(t.dist AS DOUBLE) / t.total AS dup_token_frac,
           CAST(t.topc AS DOUBLE) / t.total AS top_token_frac,
           COALESCE(CAST(b.btopc AS DOUBLE) / b.btotal, 0.0)
             AS top_bigram_frac,
           (1.0 - CAST(t.dist AS DOUBLE) / t.total <= 0.6
            AND CAST(t.topc AS DOUBLE) / t.total <= 0.12
            AND COALESCE(CAST(b.btopc AS DOUBLE) / b.btotal, 0.0) <= 0.06)
             AS keep
    FROM tok_stats t LEFT JOIN bg_stats b USING (doc_id)
    WHERE t.total >= 1
    ORDER BY doc_id
    """


@register("t08_repetition_filter", _t08_oracle_sql())
def t08_repetition_filter(spark, sf_dir):
    """Gopher-style repetition quality gate, the curation signal the
    line-based originals reduce to on single-line web text: per doc,
    the duplicate-token fraction (1 - distinct/total), the most
    frequent token's share, and the most frequent bigram's share,
    plus a ``keep`` verdict under fixed thresholds (<=0.6 / <=0.12 /
    <=0.06 — chosen to split the corpus, not pass it wholesale).

    100 TB shape: two partial-agg groupBys keyed by (doc_id, gram) —
    map-side combine absorbs the repetition being measured, so the
    shuffle carries distinct grams, not tokens — joined back on
    doc_id. Counts stay integers until one final double division in
    a fixed order, making the floats bit-identical to the oracle."""
    lists = (
        load(spark, sf_dir, "documents")
        .where("text IS NOT NULL")
        .selectExpr(
            "doc_id", "filter(split(text, ' '), t -> t <> '') AS l"
        )
    )
    tok_stats = (
        lists.select("doc_id", F.explode("l").alias("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("total"),
            F.count("*").alias("dist"),
            F.max("count").alias("topc"),
        )
    )
    bg_stats = (
        lists.where(F.size("l") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1), i ->"
                    " concat(element_at(l, i), ' ', element_at(l, i + 1)))"
                )
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("btotal"), F.max("count").alias("btopc"))
    )
    dup = F.lit(1.0) - F.col("dist").cast("double") / F.col("total")
    topt = F.col("topc").cast("double") / F.col("total")
    topb = F.coalesce(
        F.col("btopc").cast("double") / F.col("btotal"), F.lit(0.0)
    )
    return (
        tok_stats.join(bg_stats, "doc_id", "left")
        .where(F.col("total") >= 1)
        .select(
            "doc_id",
            F.col("total").cast("long").alias("n_tokens"),
            dup.alias("dup_token_frac"),
            topt.alias("top_token_frac"),
            topb.alias("top_bigram_frac"),
            ((dup <= 0.6) & (topt <= 0.12) & (topb <= 0.06)).alias("keep"),
        )
        .orderBy("doc_id")
    )


# -- t09: benchmark decontamination ------------------------------------------

NGRAM = 5          # overlap gram width (decontamination passes use
                   # 8-13-gram windows on real corpora; 5 keeps the
                   # sf docs' 10-99-token texts in range)
EVAL_MAX_ID = 10   # docs with doc_id < EVAL_MAX_ID form the held-out
                   # "benchmark" split; the rest are training docs

_T09_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, unnest(list_transform(range(1, len(l) - {NGRAM} + 2),
         i -> array_to_string(l[i:i+{NGRAM}-1], ' '))) AS gram
  FROM t WHERE len(l) >= {NGRAM}
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < {EVAL_MAX_ID}),
tr AS (SELECT doc_id, gram FROM g WHERE doc_id >= {EVAL_MAX_ID})
SELECT doc_id,
       count(*) AS n_grams,
       count(*) FILTER (gram IN (SELECT gram FROM ev)) AS hit_grams,
       (count(*) FILTER (gram IN (SELECT gram FROM ev))) > 0 AS contaminated
FROM tr
GROUP BY doc_id
ORDER BY doc_id
"""


@register("t09_decontaminate", _T09_ORACLE)
def t09_decontaminate(spark, sf_dir):
    """Benchmark decontamination: per training doc, how many of its
    sliding NGRAM-token windows also occur in the held-out eval split
    (doc_id < EVAL_MAX_ID) — the n-gram-overlap check every serious
    LLM corpus runs so evaluation data never leaks into training
    (the GPT-3/PaLM-style 'dirty document' pass). Output: per train
    doc, total grams, hit grams, and a contaminated verdict.

    Scale shape: grams leave the scan as xxhash64 digests; the eval
    side is DISTINCT digests of the benchmark split — benchmark
    suites are small by nature (a few million grams at most), so the
    explicit broadcast is the correct production hint, not just a
    small-scale convenience; the train side then needs only one
    partial-aggregated groupBy(doc_id), no gram shuffle at all. The
    DuckDB oracle matches on gram STRINGS — exact ground truth — so
    a digest collision would surface as a value mismatch."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    grams = (
        docs.withColumn("toks", F.split("text", " "))
        .where(F.size("toks") >= NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {NGRAM}),"
                    f" i -> xxhash64(concat_ws(' ', slice(toks, i+1, {NGRAM}))))"
                )
            ).alias("g"),
        )
    )
    ev = (
        grams.where(F.col("doc_id") < EVAL_MAX_ID)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = grams.where(F.col("doc_id") >= EVAL_MAX_ID)
    return (
        tr.join(F.broadcast(ev), on="g", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("hit_grams"),
        )
        .withColumn("contaminated", F.col("hit_grams") > 0)
        .orderBy("doc_id")
    )


# -- t10: PII redaction -------------------------------------------------------

# conservative patterns chosen to mean the SAME thing in Java regex
# (Spark) and RE2 (DuckDB) — agreement pytest-pinned on planted edge
# rows; exotic constructs (lookarounds, \p classes) are deliberately
# avoided because the two dialects diverge there
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"


def redaction_cols(text):
    """(clean_text, n_emails, n_phones) Column triple for the t10
    redaction rule — sequential passes, each count computed on the
    text that pass actually rewrote (see t10's docstring). Shared
    with e07's ship gate so the redaction rule lives here only."""
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(after_email, PII_PHONE, "<PHONE>")
    n_emails = F.size(
        F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))
    ).cast("long")
    n_phones = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_PHONE), F.lit(0))
    ).cast("long")
    return clean, n_emails, n_phones


# the same redaction as DuckDB SQL text (x = text expression) —
# built by concatenation, NOT str.format, because the PII regexes
# contain literal braces ({2,}); spliced by e07's oracle
def redact_clean_sql(x: str) -> str:
    return (
        "regexp_replace(regexp_replace(" + x + ", '" + PII_EMAIL
        + "', '<EMAIL>', 'g'), '" + PII_PHONE + "', '<PHONE>', 'g')"
    )


def redact_count_sql(x: str) -> str:
    return (
        "(len(regexp_extract_all(" + x + ", '" + PII_EMAIL + "'))"
        " + len(regexp_extract_all(regexp_replace(" + x + ", '"
        + PII_EMAIL + "', '<EMAIL>', 'g'), '" + PII_PHONE + "')))"
    )

_T10_ORACLE = f"""
WITH pass1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS after_email
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       regexp_replace(after_email, '{PII_PHONE}', '<PHONE>', 'g')
         AS clean_text,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(after_email, '{PII_PHONE}')) AS BIGINT)
         AS n_phones,
       (len(regexp_extract_all(text, '{PII_EMAIL}'))
        + len(regexp_extract_all(after_email, '{PII_PHONE}'))) > 0
         AS redacted
FROM pass1
ORDER BY doc_id
"""


@register("t10_pii_redaction", _T10_ORACLE)
def t10_pii_redaction(spark, sf_dir):
    """PII scrubbing, the redaction pass a training corpus runs before
    anything ships: emails and phone numbers replaced with typed
    placeholders plus per-doc match counts and a redacted flag.
    Pure JVM regexp_replace/regexp_extract_all — one codegen'd scan,
    no shuffle, no Python stage; at 100 TB this is scan-bound by
    construction. Replacement is sequential (email pass, then phone
    pass on the email-redacted text) and the COUNTS are computed on
    the same text each pass actually rewrote — emails on the
    original, phones on the post-email text — so n_emails/n_phones
    equal exactly the placeholders emitted even when a phone digit
    span abuts or sits inside an email match (counting both passes on
    the original text would disagree with the output there). The sf
    corpora contain no PII, so the catalog values check the regex
    DIALECT agreement (Java vs RE2) on real text; the planted pytest
    carries the redaction semantics."""
    clean, n_emails, n_phones = redaction_cols(F.col("text"))
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            clean.alias("clean_text"),
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
        )
        .withColumn(
            "redacted", (F.col("n_emails") + F.col("n_phones")) > 0
        )
        .orderBy("doc_id")
    )


# -- t12: corpus-fit unigram log-probability quality score --------------------

T12_VOCAB_K = 16  # vocab cap — sf vocab is ~31 tokens, so OOV is exercised


_T12_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    cnt AS (SELECT term, count(*) AS c FROM tk GROUP BY term),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cnt),
    vocab AS (
      SELECT term, ln(CAST(c AS DOUBLE) / (SELECT n FROM tot)) AS lp
      FROM cnt ORDER BY c DESC, term ASC LIMIT {T12_VOCAB_K}
    ),
    agg AS (
      SELECT tk.doc_id,
             count(*) AS n_toks,
             sum(CASE WHEN v.term IS NULL THEN 0.0 ELSE v.lp END) AS s_iv,
             sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tk LEFT JOIN vocab v ON tk.term = v.term
      GROUP BY tk.doc_id
    )
    SELECT doc_id,
           CAST(n_toks AS INT) AS n_toks,
           round((s_iv + n_oov * ln(1.0 / (SELECT n FROM tot))) / n_toks,
                 4) AS logprob_avg,
           round(CAST(n_oov AS DOUBLE) / n_toks, 4) AS oov_ratio
    FROM agg
"""


@register("t12_unigram_logprob", _T12_ORACLE)
def t12_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality scoring: fit a capped-vocabulary unigram
    model ON the corpus, then score every document by its mean token
    log-probability — the LM-perplexity quality filter of a
    training-data pipeline (the CCNet-style stage; here the model is
    corpus-fit so the operator is self-contained and value-oracled).

    Model: the top-K tokens (K = T12_VOCAB_K) by (count DESC, token
    ASC) get lp = ln(c/N); everything else scores the OOV floor
    ln(1/N). Output per doc: token count, mean logprob, OOV ratio
    (both rounded so the Spark/DuckDB float summation order cannot
    flip the hash).

    100 TB shape: two passes over the token stream, both shuffle-lean.
    Pass 1 (model fit) is a partial-agg count by term whose output is
    vocab-sized; the cap (64k in production, 16 here so the sf
    corpora exercise OOV) keeps the model a guaranteed broadcast.
    Pass 2 (scoring) is explode -> BROADCAST left join (no shuffle,
    skew-immune: stopwords hit a broadcast hash table) -> one per-doc
    partial agg. The scalar total N joins on a column-derived always-0
    key (e03's pattern) at VOCAB and DOC granularity only — never onto
    the token stream. At corpus scale pass 1 runs on a t06-style
    hash-gate sample instead of the full corpus; the catalog entry
    fits on everything so the oracle is exact.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    cnt = tok.groupBy("term").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n")).withColumn(
        "__k", F.pmod(F.col("n"), F.lit(1.0)).cast("int")
    )
    vocab = (
        cnt.orderBy(F.col("c").desc(), F.col("term"))
        .limit(T12_VOCAB_K)
        .withColumn("__k", F.pmod(F.col("c"), F.lit(1)).cast("int"))
        .join(F.broadcast(tot), "__k")
        .select(
            "term",
            F.log(F.col("c").cast("double") / F.col("n")).alias("lp"),
        )
    )
    agg = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.coalesce(F.col("lp"), F.lit(0.0))).alias("s_iv"),
            F.sum(
                F.when(F.col("lp").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .withColumn("__k", F.pmod(F.col("n_toks"), F.lit(1)).cast("int"))
        .join(F.broadcast(tot), "__k")
    )
    return agg.select(
        "doc_id",
        F.col("n_toks").cast("int").alias("n_toks"),
        F.round(
            (
                F.col("s_iv")
                + F.col("n_oov") * F.log(F.lit(1.0) / F.col("n"))
            )
            / F.col("n_toks"),
            4,
        ).alias("logprob_avg"),
        F.round(
            F.col("n_oov").cast("double") / F.col("n_toks"), 4
        ).alias("oov_ratio"),
    )


# -- t13: contamination attribution (per train x eval pair) --------------------

T13_TAU_NUM = 1    # flag when shared/n >= 1/2 — integer-ratio compare
T13_TAU_DEN = 2    # (2*shared >= n), identical in both engines

_T13_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(l) - {NGRAM} + 2),
         i -> array_to_string(l[i:i+{NGRAM}-1], ' '))) AS gram
  FROM t WHERE len(l) >= {NGRAM}
),
ev AS (SELECT doc_id AS eval_doc, gram FROM g WHERE doc_id < {EVAL_MAX_ID}),
tr AS (SELECT doc_id AS train_doc, gram FROM g WHERE doc_id >= {EVAL_MAX_ID}),
tn AS (SELECT train_doc, count(*) AS n FROM tr GROUP BY train_doc),
p AS (
  SELECT tr.train_doc, ev.eval_doc, CAST(count(*) AS BIGINT) AS shared_grams
  FROM tr JOIN ev ON tr.gram = ev.gram
  GROUP BY tr.train_doc, ev.eval_doc
)
SELECT p.train_doc, p.eval_doc, p.shared_grams,
       round(p.shared_grams / tn.n, 4) AS overlap_frac,
       {T13_TAU_DEN} * p.shared_grams >= {T13_TAU_NUM} * tn.n AS flagged
FROM p JOIN tn USING (train_doc)
ORDER BY train_doc, eval_doc
"""


@register("t13_contamination_pairs", _T13_ORACLE)
def t13_contamination_pairs(spark, sf_dir):
    """Contamination ATTRIBUTION: t09 says a training doc is dirty;
    this says by WHICH eval doc and how badly — the per-(train, eval)
    edge table with distinct-gram overlap counts and the fraction of
    the train doc's grams that leak, flagged at shared/n >= 1/2
    (integer-ratio compare, no float threshold drift). This is the
    table a decontamination audit actually reviews: t09's boolean
    cannot distinguish one stray quotation from a wholesale eval
    copy, and cannot tell WHICH benchmark to re-shard.

    Scale shape: gram sets are per-doc DISTINCT xxhash64 digests (the
    oracle matches on gram STRINGS, so a digest collision surfaces as
    a value mismatch); the eval side — (eval_doc, digest), small by
    benchmark nature — broadcasts; the only shuffles are the
    (train_doc, eval_doc) pair aggregation and the per-train-doc
    denominator count, both keyed by train_doc so the pair relation
    and the denominator co-partition for the final join. The train
    gram stream itself never shuffles."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    grams = (
        docs.withColumn("toks", F.split("text", " "))
        .where(F.size("toks") >= NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {NGRAM}),"
                    f" i -> xxhash64(concat_ws(' ', slice(toks, i+1, {NGRAM}))))"
                )
            ).alias("g"),
        )
        .distinct()
        # pin: the relation feeds three consumers (eval set, pair
        # join, denominator) — without this the gram explode and its
        # distinct shuffle re-run per branch (d03's sigs lesson)
        .localCheckpoint(eager=True)
    )
    ev = grams.where(F.col("doc_id") < EVAL_MAX_ID).select(
        F.col("doc_id").alias("eval_doc"), "g"
    )
    tr = grams.where(F.col("doc_id") >= EVAL_MAX_ID).select(
        F.col("doc_id").alias("train_doc"), "g"
    )
    tn = tr.groupBy("train_doc").agg(F.count("*").alias("n"))
    pairs = (
        tr.join(F.broadcast(ev), on="g")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("shared_grams"))
    )
    return (
        pairs.join(tn, on="train_doc")
        .select(
            "train_doc",
            "eval_doc",
            "shared_grams",
            F.round(F.col("shared_grams") / F.col("n"), 4).alias(
                "overlap_frac"
            ),
            (
                F.lit(T13_TAU_DEN) * F.col("shared_grams")
                >= F.lit(T13_TAU_NUM) * F.col("n")
            ).alias("flagged"),
        )
        .orderBy("train_doc", "eval_doc")
    )
