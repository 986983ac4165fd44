"""Typed readers — the engine's ingestion surface (SURVEY.md §2.1).

Replaces the reference's ad-hoc pandas reads with explicit-schema,
Catalyst-prunable Spark reads:

- S1/S4: CSV with an explicit StructType (never infer join keys —
  the reference's one dtype override, ``combine_trustpilot_with_CH.py:7``,
  exists precisely because inference corrupted a zero-padded key);
- S2/S11: projection at scan (Catalyst prunes columns; ``usecols``
  analog, ``Scrape_Utils.py:383,473``);
- S5: the row-iterator DictReader loop (``Scrape_Utils.py:252-272``)
  becomes a declarative read + trim/split — no row loop;
- S6/S7: multiLine JSON with explicit nested schema + flatten
  (``Matching_P1.py:250-258``, ``pd.json_normalize`` analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    columns: list[str] | None = None,
) -> DataFrame:
    """S1/S2/S4: explicit-schema CSV scan with optional projection."""
    df = spark.read.csv(path, header=header, schema=schema)
    return df.select(*columns) if columns else df


def read_csv_normalized(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    trim_columns: list[str] = (),
    split_columns: dict[str, str] | None = None,
) -> DataFrame:
    """S5: declarative replacement for the reference's DictReader row
    loop — trim fields, split comma-lists to arrays, drop empties."""
    df = spark.read.csv(path, header=True, schema=schema)
    for c in trim_columns:
        df = df.withColumn(c, F.trim(F.col(c)))
    for c, sep in (split_columns or {}).items():
        df = df.withColumn(
            c,
            F.filter(
                F.transform(F.split(F.col(c), sep), lambda x: F.trim(x)),
                lambda x: x != "",
            ),
        )
    return df


# Nested trial-document schema (FIXTURES.md D; mirrors the reference's
# scraper_results_Random_CH.json:1-30 structure)
TRIAL_SCHEMA = T.StructType(
    [
        T.StructField("trial_number", T.LongType()),
        T.StructField(
            "ground_truth_data",
            T.StructType(
                [
                    T.StructField("company_number", T.StringType()),
                    T.StructField("company_name", T.StringType()),
                    T.StructField("postcode", T.StringType()),
                    T.StructField("sic_code_desc", T.StringType()),
                    # deliberately a JSON-encoded-array STRING (F24)
                    T.StructField("sic_code_no", T.StringType()),
                ]
            ),
        ),
        T.StructField("search_query_used", T.StringType()),
        T.StructField(
            "scraped_results",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("position", T.LongType()),
                        T.StructField("title", T.StringType()),
                        T.StructField("link", T.StringType()),
                        T.StructField("filename", T.StringType()),
                        T.StructField("markdown_content", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_trials(spark: SparkSession, path: str) -> DataFrame:
    """S6: nested JSON document source with explicit schema."""
    return spark.read.schema(TRIAL_SCHEMA).json(path, multiLine=True)


def flatten_trials(trials: DataFrame) -> DataFrame:
    """S7: explode array-of-structs + flatten + decode the
    JSON-in-string SIC array (F24)."""
    return (
        trials.select(
            "trial_number",
            F.col("ground_truth_data.company_number").alias("company_number"),
            F.col("ground_truth_data.company_name").alias("company_name"),
            F.from_json(
                F.col("ground_truth_data.sic_code_no"),
                T.ArrayType(T.StringType()),
            ).alias("sic_codes"),
            F.explode_outer("scraped_results").alias("r"),
        )
        .select(
            "trial_number",
            "company_number",
            "company_name",
            "sic_codes",
            F.col("r.position").alias("position"),
            F.col("r.link").alias("link"),
            F.col("r.markdown_content").alias("markdown_content"),
        )
    )
