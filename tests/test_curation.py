"""Training-data curation operators: Gopher-style quality signals, PII
redaction, deterministic sampling (FIXTURES: crafted rows, hand-computed)."""

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.operators.sample import (
    sample_by_group,
    sample_rows,
    split_train_holdout,
    threshold_for,
)
from entity_resolution_pipeline_spark.operators.textstats import (
    gopher_quality,
    redact_pii,
)


class TestGopherQuality:
    def test_hand_computed_signals(self, spark):
        rows = [
            # 4 lines, 2 distinct ("dup\ndup" duplicated), one ends '...'
            (0, "dup line\ndup line\nend here...\nword word word"),
            # pure repetition: top word = 3/4
            (1, "spam spam spam other"),
            # symbols: 2x'#', 1x'…', 1x'...' over 2 words
            (2, "ab# cd# … ..."),
            (3, ""),
            (4, "12345 678 alpha"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in gopher_quality(df).collect()}

        r0 = out[0]
        assert r0["frac_dup_lines"] == 0.25  # 4 lines, 3 distinct
        assert r0["frac_ellipsis_lines"] == 0.25
        assert r0["n_words"] == 9

        r1 = out[1]
        assert r1["top_word_frac"] == 0.75
        assert r1["frac_alpha_words"] == 1.0

        r2 = out[2]
        assert r2["n_words"] == 4
        assert r2["symbol_word_ratio"] == 1.0  # (2 + 1 + 1) / 4
        assert r2["frac_alpha_words"] == 0.5  # 'ab#', 'cd#'

        r3 = out[3]
        assert r3["n_words"] == 0 and r3["top_word_frac"] == 0.0
        assert r3["frac_dup_lines"] == 0.0

        r4 = out[4]
        assert abs(r4["frac_alpha_words"] - 1 / 3) < 1e-9


class TestRedactPII:
    def test_redacts_and_counts(self, spark):
        rows = [
            (0, "mail me at jane.doe+x@example.co.uk or at 10.0.0.1 now"),
            (1, "account 123456789012 and phoneish 999888777666"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org and ip 192.168.1.254"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in redact_pii(df).collect()}
        assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 1
        assert "<EMAIL>" in out[0]["clean_text"] and "<IP>" in out[0]["clean_text"]
        assert "jane" not in out[0]["clean_text"]
        assert out[1]["n_longnums"] == 2
        assert out[1]["clean_text"].count("<ID>") == 2
        assert out[2]["clean_text"] == "no pii here at all"
        assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_longnums"] == 0
        assert out[3]["n_emails"] == 2 and out[3]["n_ips"] == 1

    def test_email_takes_precedence_over_digits(self, spark):
        df = spark.createDataFrame([(0, "x 1.2.3.4@host.com y")], "doc_id long, text string")
        r = redact_pii(df).collect()[0]
        assert r["n_emails"] == 1 and r["n_ips"] == 0


class TestDeterministicSampling:
    def _docs(self, spark, n=2000):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        )

    def test_sample_rows_rate_and_determinism(self, spark):
        df = self._docs(spark)
        s1 = sample_rows(df, 0.3, salt="a")
        ids1 = {r["doc_id"] for r in s1.collect()}
        ids2 = {r["doc_id"] for r in sample_rows(df, 0.3, salt="a").collect()}
        assert ids1 == ids2  # same salt -> identical set
        assert abs(len(ids1) / 2000 - 0.3) < 0.05
        # nested rate at 0.3 is a strict subset of rate 0.6 with the same salt
        ids_wide = {r["doc_id"] for r in sample_rows(df, 0.6, salt="a").collect()}
        assert ids1 <= ids_wide

    def test_different_salts_decorrelate(self, spark):
        df = self._docs(spark)
        a = {r["doc_id"] for r in sample_rows(df, 0.5, salt="a").collect()}
        b = {r["doc_id"] for r in sample_rows(df, 0.5, salt="b").collect()}
        inter = len(a & b) / 2000
        assert abs(inter - 0.25) < 0.05  # independent halves overlap ~25%

    def test_sample_by_group_rates(self, spark):
        df = self._docs(spark)  # 500 per source
        out = sample_by_group(
            df, "source", {"src0": 1.0, "src1": 0.5, "src2": 0.0},
            default_rate=0.2, key_col="doc_id", salt="g",
        )
        counts = {r["source"]: r["n"] for r in
                  out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts["src0"] == 500
        assert abs(counts.get("src1", 0) - 250) < 50
        assert "src2" not in counts
        assert abs(counts.get("src3", 0) - 100) < 40  # default rate

    def test_split_train_holdout(self, spark):
        df = self._docs(spark)
        out = split_train_holdout(df, holdout_frac=0.1, salt="sp")
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert counts["train"] + counts["holdout"] == 2000
        assert abs(counts["holdout"] / 2000 - 0.1) < 0.03
        # membership is stable across reruns and subsets
        again = {(r["doc_id"], r["split"]) for r in
                 split_train_holdout(df.limit(500), holdout_frac=0.1, salt="sp").collect()}
        full = {(r["doc_id"], r["split"]) for r in out.collect()}
        assert again <= full

    def test_threshold_exact_bounds(self):
        assert threshold_for(0.0) == 0
        assert threshold_for(1.0) == 1 << 60
        assert threshold_for(2.0) == 1 << 60
        assert threshold_for(-1.0) == 0
