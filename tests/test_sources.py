"""Source readers/sinks: CSV with dirty headers + zero-padded keys,
nested trial JSON, sink roundtrips (SURVEY §2.1)."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from common_crawl___autumn_2025_spark.sources.readers import (
    TRIAL_SCHEMA,
    flatten_trials,
    read_csv,
    read_csv_normalized,
    read_trials,
)
from common_crawl___autumn_2025_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_explicit_schema_preserves_padded_keys(spark, tmpdir):
    """The reference's join bug: inferred dtypes strip leading zeros
    from company numbers (combine_trustpilot_with_CH.py:7,11-12).
    Explicit string schema keeps them."""
    path = os.path.join(tmpdir, "companies.csv")
    with open(path, "w") as f:
        f.write(" CompanyNumber,name\n00123456,Acme Ltd\n07654321,Beta LLP\n")
    schema = T.StructType(
        [
            T.StructField(" CompanyNumber", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    df = read_csv(spark, path, schema)
    rows = {r[" CompanyNumber"] for r in df.collect()}
    assert rows == {"00123456", "07654321"}  # zeros intact
    # projection pushdown path
    only = read_csv(spark, path, schema, columns=["name"])
    assert only.columns == ["name"]


def test_csv_normalized_replaces_row_loop(spark, tmpdir):
    path = os.path.join(tmpdir, "sic.csv")
    with open(path, "w") as f:
        f.write('num,sic_text\n1," 62020 , 62090 , "\n2,"  58290 "\n')
    schema = T.StructType(
        [T.StructField("num", T.LongType()), T.StructField("sic_text", T.StringType())]
    )
    df = read_csv_normalized(
        spark, path, schema, split_columns={"sic_text": ","}
    )
    got = {r.num: list(r.sic_text) for r in df.collect()}
    assert got == {1: ["62020", "62090"], 2: ["58290"]}


def test_nested_trials_roundtrip(spark, tmpdir):
    trials = [
        {
            "trial_number": 1,
            "ground_truth_data": {
                "company_number": "00123456",
                "company_name": "Acme Ltd",
                "postcode": "AB1 2CD",
                "sic_code_desc": "software",
                "sic_code_no": '["62020"]',
            },
            "search_query_used": "acme ltd AB1 2CD site",
            "scraped_results": [
                {
                    "position": 1,
                    "title": "Acme",
                    "link": "http://acme.com",
                    "filename": "acme_com",
                    "markdown_content": "about acme 00123456",
                },
                {
                    "position": 2,
                    "title": "Dir",
                    "link": "http://dir.com/acme",
                    "filename": "dir_com",
                    "markdown_content": "directory listing",
                },
            ],
        },
        {  # trial with EMPTY results (reference trial 1 shape)
            "trial_number": 2,
            "ground_truth_data": {
                "company_number": "07654321",
                "company_name": "Beta LLP",
                "postcode": "ZZ9 9ZZ",
                "sic_code_desc": "retail",
                "sic_code_no": '["47110","47190"]',
            },
            "search_query_used": "beta llp",
            "scraped_results": [],
        },
    ]
    path = os.path.join(tmpdir, "trials.json")
    with open(path, "w") as f:
        json.dump(trials, f, indent=2)
    df = read_trials(spark, path)
    assert df.count() == 2
    flat = flatten_trials(df)
    rows = flat.collect()
    # trial 2 survives as a NULL-result row (explode_outer)
    t2 = [r for r in rows if r.trial_number == 2]
    assert len(t2) == 1 and t2[0].position is None
    assert t2[0].sic_codes == ["47110", "47190"]  # F24 decode from string
    t1 = sorted(
        (r for r in rows if r.trial_number == 1), key=lambda r: r.position
    )
    assert [r.position for r in t1] == [1, 2]
    assert t1[0].markdown_content == "about acme 00123456"


def test_sink_roundtrips(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, k string, v double"
    )
    pq = os.path.join(tmpdir, "p")
    write_parquet(df, pq, partition_by=["k"])
    assert sorted(
        (r.id, r.k, r.v) for r in spark.read.parquet(pq).collect()
    ) == [(1, "a", 1.5), (2, "b", 2.5)]

    cs = os.path.join(tmpdir, "c")
    write_csv(df, cs)
    back = spark.read.csv(cs, header=True, schema=df.schema)
    assert back.count() == 2

    js = os.path.join(tmpdir, "j")
    write_json(df, js)
    assert spark.read.schema(df.schema).json(js).count() == 2
