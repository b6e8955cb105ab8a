"""Preprocess-stage tests incl. the byte-identical-text invariant."""

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.functions.hashing import hash_string
from entity_resolution_pipeline_spark.operators.preprocess import (
    field_stats,
    preprocess_records,
    string_counts,
    strings_long,
    unique_strings,
)
from entity_resolution_pipeline_spark.sources.webpages import (
    generate_pages_pdf,
    web_pages_df,
)


def test_normalization_invariant_byte_identical(spark):
    """normalize(raw text) must byte-equal the generator's clean text per url."""
    truth = generate_pages_pdf(60, with_truth=True)
    wp = web_pages_df(spark, 60)
    rec = preprocess_records(wp).select("url", "norm_text").collect()
    expected = dict(zip(truth["url"], truth["clean_text"]))
    assert len(rec) == len(expected)
    for r in rec:
        assert r["norm_text"] == expected[r["url"]], r["url"]


def test_field_derivation_and_nulls(spark):
    wp = spark.createDataFrame(
        [
            ("u1", "Name: Smith, John; Title: essays of law; filler here"),
            ("u2", "Title: no name page;"),
            ("u3", "Name:  ; Title: blank name;"),
        ],
        "url string, text string",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    rows = {r["url"]: r for r in preprocess_records(wp).collect()}
    assert rows["u1"]["person"] == "Smith, John"
    assert rows["u1"]["title"] == "essays of law"
    assert rows["u1"]["provision"] is None
    assert rows["u1"]["composite"] == "Smith, John essays of law"
    assert rows["u2"]["person"] is None
    assert rows["u3"]["person"] is None  # '' -> NULL (reference :320-322)
    # hash matches the reference key derivation exactly
    assert rows["u1"]["person_h"] == hash_string("Smith, John")


def test_dedup_dimensions(spark):
    wp = spark.createDataFrame(
        [
            ("u1", "Name: A B; Title: T one;"),
            ("u2", "Name: a  b; Title: T one;"),  # same hash as 'A B' (case/ws)
            ("u3", "Name: C; Title: T two;"),
        ],
        "url string, text string",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    rec = preprocess_records(wp)
    long_df = strings_long(rec)
    us = {r["hash"]: r["value"] for r in unique_strings(long_df).collect()}
    sc = {r["hash"]: r["cnt"] for r in string_counts(long_df).collect()}
    h_ab = hash_string("A B")
    assert h_ab == hash_string("a  b")
    assert sc[h_ab] == 2
    assert us[h_ab] in ("A B", "a b")  # deterministic min
    fs = {r["field"]: r for r in field_stats(long_df).collect()}
    assert fs["person"]["total_occurrences"] == 3
    assert fs["person"]["distinct_values"] == 2
    assert fs["title"]["distinct_values"] == 2


def test_html_column_pruned_from_scan(spark, tmp_warehouse):
    """Scoring path must never read the html binary column (SURVEY §4):
    the parquet ReadSchema of the preprocess plan excludes html."""
    web_pages_df(spark, 10).write.mode("overwrite").parquet(tmp_warehouse + "/wp")
    wp = spark.read.parquet(tmp_warehouse + "/wp")
    plan = preprocess_records(wp)._jdf.queryExecution().executedPlan().toString()
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schemas, plan
    for ln in read_schemas:
        assert "html" not in ln, ln
    assert "text" in plan
