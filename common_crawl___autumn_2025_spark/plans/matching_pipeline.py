"""E3: the reference's end-to-end entity-matching pipeline as ONE
declarative query (reference lifecycle ``Matching_P1.py::main``,
:247-369 — explode scraped results → clean names → URL-similarity
match → content-containment match → LLM adjudication → per-entity
first match → recall).

Candidates are synthesized per entity from the entity's own name so
both engines derive identical inputs by construction: an exact-clean
candidate (similarity hit), a typo'd candidate (fuzzy hit), and an
unrelated-text candidate (miss). The LLM adjudicator is the
deterministic stub SURVEY §2.10-U7 prescribes (string in → boolean
out; here: md5-parity of the candidate — stable across engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load, register

_CLEAN = "regexp_replace(lower({x}), '[^a-z0-9]', '', 'g')"

_ORACLE = f"""
WITH entities AS (
  SELECT c_custkey AS entity_id,
         {_CLEAN.format(x="c_name")} AS clean_name
  FROM customer
),
candidates AS (
  SELECT entity_id, clean_name, 1 AS position, clean_name AS candidate
  FROM entities
  UNION ALL
  SELECT entity_id, clean_name, 2,
         substr(clean_name, 1, length(clean_name) - 2) || 'xx'
  FROM entities
  UNION ALL
  SELECT entity_id, clean_name, 3, 'unrelated directory listing text'
  FROM entities
),
scored AS (
  SELECT entity_id, position, candidate,
         (length(clean_name) + length(candidate)
          - levenshtein(clean_name, candidate)) * 10
           >= 9 * (length(clean_name) + length(candidate)) AS sim_match,
         contains('page about ' || candidate || ' company',
                  clean_name) AS content_match,
         (CAST(('0x' || substr(md5(candidate), 1, 2)) AS INTEGER) % 2) = 0
           AS llm_accepts
  FROM candidates
),
matched AS (
  SELECT entity_id, position, candidate,
         row_number() OVER (PARTITION BY entity_id ORDER BY position)
           AS rn
  FROM scored
  WHERE (sim_match OR content_match) AND llm_accepts
)
SELECT m.entity_id, m.position AS matched_position,
       round(CAST((SELECT count(DISTINCT entity_id) FROM matched) AS DOUBLE)
             / (SELECT count(*) FROM entities), 4) AS recall
FROM matched m WHERE m.rn = 1
"""


@register("e03_matching_pipeline", _ORACLE)
def e03_matching_pipeline(spark, sf_dir):
    """Explode candidates → similarity (integer-ratio levenshtein) →
    containment → stub adjudication → first-match-per-entity →
    recall, all in one plan. Every stage is JVM built-ins; the
    cross-engine adjudication stub is md5-parity (F23's parse
    contract is covered separately by f23)."""
    entities = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", "").alias("clean_name"),
    )
    mk = lambda pos, cand: entities.select(  # noqa: E731
        "entity_id", "clean_name", F.lit(pos).alias("position"), cand.alias("candidate")
    )
    candidates = (
        mk(1, F.col("clean_name"))
        .unionByName(
            mk(
                2,
                F.concat(
                    F.expr("substr(clean_name, 1, length(clean_name) - 2)"),
                    F.lit("xx"),
                ),
            )
        )
        .unionByName(mk(3, F.lit("unrelated directory listing text")))
    )
    la = F.length("clean_name")
    lb = F.length("candidate")
    lev = F.levenshtein(F.col("clean_name"), F.col("candidate"))
    scored = candidates.select(
        "entity_id",
        "position",
        "candidate",
        ((la + lb - lev) * 10 >= 9 * (la + lb)).alias("sim_match"),
        F.contains(
            F.concat(F.lit("page about "), F.col("candidate"), F.lit(" company")),
            F.col("clean_name"),
        ).alias("content_match"),
        (
            F.conv(F.substring(F.md5("candidate"), 1, 2), 16, 10).cast("int") % 2 == 0
        ).alias("llm_accepts"),
    )
    w = Window.partitionBy("entity_id").orderBy("position")
    matched = (
        scored.where((F.col("sim_match") | F.col("content_match")) & F.col("llm_accepts"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    # recall computed IN-PLAN — one execution, no driver-side count()
    # scalars. The single-row aggregates join back on an EQUI key so
    # Catalyst plans a BroadcastHashJoin, keeping e03's physical plan
    # free of BroadcastNestedLoopJoin — the shape that, on a
    # non-degenerate build side, is the classic 100x scale-killer.
    # The key must be column-derived (pmod(col, 1) == 0 at runtime):
    # a literal key gets constant-folded out of the join condition
    # and the join degenerates right back to a BNLJ cross product.
    def k0(col):
        return F.pmod(F.col(col), F.lit(1)).cast("int").alias("__k")

    stats = (
        matched.agg(F.count("*").alias("__nm"))
        .select(k0("__nm"), "__nm")
        .join(
            entities.agg(F.count("*").alias("__ne")).select(k0("__ne"), "__ne"),
            "__k",
        )
    )
    return matched.select("entity_id", "position", k0("entity_id")).join(
        F.broadcast(stats), "__k"
    ).select(
        "entity_id",
        F.col("position").alias("matched_position"),
        F.round(F.col("__nm") / F.col("__ne"), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# E4 (engine-new): the training-data CURATION pipeline end to end —
# what a 100 TB corpus run actually executes: score every document
# (language ID, quality gate, token count), drop near-duplicate
# non-representatives (connected components over Jaccard pairs,
# keeper = min id), aggregate the curated corpus per source.
# ---------------------------------------------------------------------------

def _e04_oracle():
    from ..operators.dedup import _D02_CTES

    return f"""
    WITH RECURSIVE {_D02_CTES},
    nodes AS (
      SELECT doc_a AS node FROM pairs UNION SELECT doc_b FROM pairs
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
    non_reps AS (SELECT node AS doc_id FROM comp WHERE node <> component),
    scored AS (
      SELECT doc_id, source,
             (contains(' ' || text || ' ', ' the ')
              OR contains(' ' || text || ' ', ' and ')) AS is_en,
             (len(string_split(text, ' ')) BETWEEN 20 AND 1000
              AND length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 10
                  < length(text)) AS ok,
             len(regexp_extract_all(text,
                 '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(bpe) AS BIGINT) AS total_tokens
    FROM scored
    WHERE is_en AND ok
      AND doc_id NOT IN (SELECT doc_id FROM non_reps)
    GROUP BY source
    """


@register("e04_curation_pipeline", _e04_oracle())
def e04_curation_pipeline(spark, sf_dir):
    """E4: the full curation flow in one plan — language gate (t01's
    en-marker rule), quality gate (t02), near-dup representative
    filter (d02 pairs -> connected components, keep only min-id
    representatives), BPE-ish token accounting (t03), per-source
    aggregate of the curated corpus. At 100 TB every stage keeps its
    scale shape: scoring is one codegen'd scan, the dup filter is the
    blocked pair join + the O(log n) large-star/small-star component
    rounds (d06 — duplicate chains at corpus scale can exceed any
    fixed diameter cap, so the curation path uses the star algorithm
    outright), the final aggregate is a partial+final groupBy."""
    from ..operators.dedup import dup_components_star, shingle_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    comps = dup_components_star(shingle_jaccard_pairs(docs))
    non_reps = comps.where(F.col("doc_id") != F.col("component")).select(
        "doc_id"
    )
    text = F.col("text")
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    is_en = F.contains(padded, F.lit(" the ")) | F.contains(
        padded, F.lit(" and ")
    )
    n_words = F.size(F.split(text, " "))
    n_punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    ok = n_words.between(20, 1000) & (n_punct * 10 < F.length(text))
    bpe = F.size(
        F.regexp_extract_all(
            text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
        )
    )
    kept = (
        docs.join(non_reps, on=["doc_id"], how="left_anti")
        .where(is_en & ok)
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("docs_kept"),
        F.sum(bpe).cast("long").alias("total_tokens"),
    )


def _e06_oracle():
    from ..operators.dedup import _D08_ORACLE
    from ..operators.textquality import (
        _T09_ORACLE,
        _t08_oracle_sql,
        EVAL_MAX_ID,
    )

    return f"""
WITH base AS (
  SELECT doc_id FROM documents
  WHERE text IS NOT NULL AND doc_id >= {EVAL_MAX_ID}
),
rep AS (SELECT doc_id, keep AS repetition_ok FROM ({_t08_oracle_sql()})),
dec AS (SELECT doc_id, NOT contaminated AS decontaminated_ok
        FROM ({_T09_ORACLE})),
sub AS (SELECT doc_id, keep AS substring_ok FROM ({_D08_ORACLE}))
SELECT b.doc_id,
       coalesce(rep.repetition_ok, TRUE) AS repetition_ok,
       coalesce(dec.decontaminated_ok, TRUE) AS decontaminated_ok,
       coalesce(sub.substring_ok, TRUE) AS substring_ok,
       (coalesce(rep.repetition_ok, TRUE)
        AND coalesce(dec.decontaminated_ok, TRUE)
        AND coalesce(sub.substring_ok, TRUE)) AS keep
FROM base b
LEFT JOIN rep USING (doc_id)
LEFT JOIN dec USING (doc_id)
LEFT JOIN sub USING (doc_id)
ORDER BY doc_id
"""


@register("e06_pretraining_keepset", _e06_oracle())
def e06_pretraining_keepset(spark, sf_dir):
    """E6: the modern pretraining keep-set in one value-checked plan —
    every training doc with its per-gate verdicts and the final keep
    decision: Gopher-style repetition gate (t08), benchmark
    decontamination (t09, NOT contaminated against the held-out
    split), and exact-substring duplication (d08's keep). e04 is the
    classic language/quality/near-dup curation; e06 is the
    complementary leakage-and-boilerplate pass a 100 TB corpus also
    runs — composed from the SAME registered operators, so each
    gate's scale shape is unchanged (partial-agg gram groupBys,
    broadcast eval digests, pinned chunk digests) and the composition
    itself is three doc_id-keyed joins of heavily-reduced per-doc
    verdict tables. Docs absent from a gate's output (too short to
    have a chunk or a gram) pass that gate by definition — absence of
    evidence of duplication/contamination, mirrored by the oracle's
    coalesce."""
    from ..operators.dedup import d08_exact_substring
    from ..operators.textquality import (
        EVAL_MAX_ID,
        t08_repetition_filter,
        t09_decontaminate,
    )

    base = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.col("doc_id") >= EVAL_MAX_ID))
        .select("doc_id")
    )
    rep = t08_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("repetition_ok")
    )
    dec = t09_decontaminate(spark, sf_dir).select(
        "doc_id", (~F.col("contaminated")).alias("decontaminated_ok")
    )
    sub = d08_exact_substring(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("substring_ok")
    )
    return (
        base.join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .join(sub, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("repetition_ok", F.lit(True)).alias("repetition_ok"),
            F.coalesce("decontaminated_ok", F.lit(True)).alias(
                "decontaminated_ok"
            ),
            F.coalesce("substring_ok", F.lit(True)).alias("substring_ok"),
        )
        .withColumn(
            "keep",
            F.col("repetition_ok")
            & F.col("decontaminated_ok")
            & F.col("substring_ok"),
        )
        .orderBy("doc_id")
    )


def _e07_oracle():
    from ..operators.dedup import _D08_ORACLE
    from ..operators.textquality import (
        _T09_ORACLE,
        _t08_oracle_sql,
        EVAL_MAX_ID,
        QUALITY_GATE_SQL,
        redact_clean_sql,
        redact_count_sql,
    )

    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id >= {EVAL_MAX_ID}
),
rep AS (SELECT doc_id, keep AS repetition_ok FROM ({_t08_oracle_sql()})),
dec AS (SELECT doc_id, NOT contaminated AS decontaminated_ok
        FROM ({_T09_ORACLE})),
sub AS (SELECT doc_id, keep AS substring_ok FROM ({_D08_ORACLE}))
SELECT b.doc_id,
       {QUALITY_GATE_SQL.format(x='b.text')} AS quality_ok,
       coalesce(rep.repetition_ok, TRUE) AS repetition_ok,
       coalesce(dec.decontaminated_ok, TRUE) AS decontaminated_ok,
       coalesce(sub.substring_ok, TRUE) AS substring_ok,
       ({QUALITY_GATE_SQL.format(x='b.text')}
        AND coalesce(rep.repetition_ok, TRUE)
        AND coalesce(dec.decontaminated_ok, TRUE)
        AND coalesce(sub.substring_ok, TRUE)) AS keep,
       {redact_count_sql('b.text')} > 0 AS redacted,
       {redact_clean_sql('b.text')} AS clean_text
FROM base b
LEFT JOIN rep USING (doc_id)
LEFT JOIN dec USING (doc_id)
LEFT JOIN sub USING (doc_id)
ORDER BY b.doc_id
"""


@register("e07_ship_gate", _e07_oracle())
def e07_ship_gate(spark, sf_dir):
    """E7: the FULL ship gate — the per-document table a curation run
    actually writes before training data leaves the pipeline. One row
    per training doc with every gate verdict and the shippable
    payload: quality (t02's pass/fail), repetition (t08),
    decontamination (t09), exact-substring duplication (d08), the
    composed ``keep``, plus t10's PII-redacted ``clean_text`` and a
    ``redacted`` flag. e06 answers "which docs survive the leakage
    gates"; e07 adds the quality gate and the redacted text itself —
    keep ∧ reasons ∧ payload in one table.

    Composition discipline: the reduced verdict relations come from
    the SAME registered operators (t08/t09/d08, identical scale
    shapes), while the per-doc quality gate and redaction are
    computed INLINE on the base scan via the shared expression
    helpers (``quality_gate_expr``, ``redaction_cols`` — one
    definition per rule, engine and SQL). Inline matters at 100 TB:
    the wide ``clean_text`` column is derived in the scan's
    projection and shuffles ONCE in the doc_id-keyed join of the
    three narrow verdict tables — joining a separate t02/t10 output
    back would shuffle the full text twice for no information."""
    from ..operators.dedup import d08_exact_substring
    from ..operators.textquality import (
        EVAL_MAX_ID,
        quality_gate_expr,
        redaction_cols,
        t08_repetition_filter,
        t09_decontaminate,
    )

    clean, n_emails, n_phones = redaction_cols(F.col("text"))
    base = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.col("doc_id") >= EVAL_MAX_ID))
        .select(
            "doc_id",
            quality_gate_expr(F.col("text")).alias("quality_ok"),
            ((n_emails + n_phones) > 0).alias("redacted"),
            clean.alias("clean_text"),
        )
    )
    rep = t08_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("repetition_ok")
    )
    dec = t09_decontaminate(spark, sf_dir).select(
        "doc_id", (~F.col("contaminated")).alias("decontaminated_ok")
    )
    sub = d08_exact_substring(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("substring_ok")
    )
    return (
        base.join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .join(sub, "doc_id", "left")
        .select(
            "doc_id",
            "quality_ok",
            F.coalesce("repetition_ok", F.lit(True)).alias("repetition_ok"),
            F.coalesce("decontaminated_ok", F.lit(True)).alias(
                "decontaminated_ok"
            ),
            F.coalesce("substring_ok", F.lit(True)).alias("substring_ok"),
            (
                F.col("quality_ok")
                & F.coalesce("repetition_ok", F.lit(True))
                & F.coalesce("decontaminated_ok", F.lit(True))
                & F.coalesce("substring_ok", F.lit(True))
            ).alias("keep"),
            "redacted",
            "clean_text",
        )
        .orderBy("doc_id")
    )


# -- e08: corpus datasheet ----------------------------------------------------

def _e08_oracle_sql() -> str:
    from ..operators.textquality import QUALITY_GATE_SQL, predicted_lang_sql

    return f"""
    WITH d AS (
      SELECT {predicted_lang_sql('text')} AS predicted_lang,
             len(string_split(text, ' ')) AS ws_tokens,
             {QUALITY_GATE_SQL.format(x='text')} AS q,
             md5(text) AS digest
      FROM documents WHERE text IS NOT NULL
    ),
    w AS (
      SELECT predicted_lang, ws_tokens, q,
             count(*) OVER (PARTITION BY digest) AS copies
      FROM d
    )
    SELECT predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(count(*) FILTER (q) AS BIGINT) AS quality_pass,
           CAST(count(*) FILTER (copies > 1) AS BIGINT) AS dup_docs,
           round((count(*) FILTER (q)) / count(*), 4) AS quality_rate,
           round((count(*) FILTER (copies > 1)) / count(*), 4) AS dup_rate
    FROM w
    GROUP BY predicted_lang
    ORDER BY predicted_lang
    """


@register("e08_corpus_datasheet", _e08_oracle_sql())
def e08_corpus_datasheet(spark, sf_dir):
    """The corpus DATASHEET: the per-language summary table a
    curation run publishes alongside shipped training data — doc and
    token volumes, quality-gate pass rate, exact-duplicate rate. The
    'datasheets for datasets' deliverable, and the table every
    downstream consumer reads before anything else.

    Composition discipline (e06/e07's rule): every statistic is the
    SAME shared rule its standalone operator uses — language is
    ``predicted_lang_expr`` (t01), quality is ``quality_gate_expr``
    (t02), tokens are t03's whitespace count, duplication is d01's
    digest rule — one definition per rule, spliced into both engines,
    so the datasheet can never drift from the operators it
    summarizes.

    100 TB shape: two shuffles total — one digest-keyed exchange for
    the duplicate window (d01's shape: 16-byte keys, text projected
    away) and one partial-aggregated groupBy on the tiny language
    key. Everything else is a single codegen'd scan."""
    from ..operators.textquality import predicted_lang_expr, quality_gate_expr

    docs = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            predicted_lang_expr().alias("predicted_lang"),
            F.size(F.split("text", " ")).alias("ws_tokens"),
            quality_gate_expr(F.col("text")).alias("q"),
            F.md5("text").alias("digest"),
        )
    )
    w = Window.partitionBy("digest")
    return (
        docs.withColumn("copies", F.count("*").over(w))
        .groupBy("predicted_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.count_if(F.col("q")).alias("quality_pass"),
            F.count_if(F.col("copies") > 1).alias("dup_docs"),
        )
        .select(
            "predicted_lang",
            "n_docs",
            "total_ws_tokens",
            "quality_pass",
            "dup_docs",
            F.round(F.col("quality_pass") / F.col("n_docs"), 4).alias(
                "quality_rate"
            ),
            F.round(F.col("dup_docs") / F.col("n_docs"), 4).alias("dup_rate"),
        )
        .orderBy("predicted_lang")
    )
