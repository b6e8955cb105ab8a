"""Golden end-to-end + resume tests (SURVEY.md §5.2-5.4).

The F1 >= 0.99 acceptance gate (BASELINE.json north_rule) runs on the
deterministic synthetic corpus at matched blocking keys.
"""

import pyspark.sql.functions as F
import pytest

from entity_resolution_pipeline_spark.plans.pipeline import ERConfig, ERPipeline
from entity_resolution_pipeline_spark.sources.webpages import (
    labeled_pairs_pdf,
    web_pages_df,
)

N_ENT = 200
N_PAIRS = 800


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("erp_wh"))
    wp = web_pages_df(spark, N_ENT)
    lp = spark.createDataFrame(labeled_pairs_pdf(N_ENT, N_PAIRS))
    pipe = ERPipeline(spark, wh, ERConfig())
    result = pipe.run(wp, lp)
    return pipe, result, wp, lp, wh


def test_f1_gate(pipeline_run):
    _, result, *_ = pipeline_run
    ev = result["evaluation"]
    assert ev["blocked_pairs"]["f1"] >= 0.99, ev
    assert ev["blocked_pairs"]["precision"] >= 0.99, ev


def test_cluster_outputs(pipeline_run):
    pipe, result, *_ = pipeline_run
    clusters = pipe.catalog.read("clusters")
    n_pages = result["n_pages"]
    assert clusters.count() == n_pages  # every page assigned exactly once
    assert clusters.select("entity_id").distinct().count() == n_pages
    # ~200 entities -> between 180 and 260 clusters (nameless singletons add)
    assert 150 <= result["n_clusters"] <= n_pages


def test_manifest_lineage(pipeline_run):
    pipe, *_ = pipeline_run
    m = pipe.manifest.read()
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert {"preprocess", "blocking", "pairs", "score", "edges", "cluster"} <= stages
    ok = m.where(F.col("status") == "ok")
    # per-partition rows with metrics
    assert ok.where(F.col("wall_ms") >= 0).count() == ok.count()
    assert ok.where(F.col("partition_id") >= 0).count() == ok.count()
    assert ok.where(F.col("input_fingerprint").isNull()).count() == 0


def test_resume_skips_stages_and_reproduces(pipeline_run, spark):
    pipe, result, wp, lp, wh = pipeline_run
    clusters_before = {
        (r["entity_id"], r["cluster_id"])
        for r in pipe.catalog.read("clusters").collect()
    }
    pipe2 = ERPipeline(spark, wh, ERConfig())
    result2 = pipe2.run(wp, lp)
    m2 = pipe2.manifest.read().where(
        (F.col("run_id") == pipe2.manifest.run_id) & (F.col("status") == "skipped")
    )
    skipped = {r["stage"] for r in m2.select("stage").distinct().collect()}
    assert {"preprocess", "blocking", "pairs", "score", "edges", "cluster"} <= skipped
    clusters_after = {
        (r["entity_id"], r["cluster_id"])
        for r in pipe2.catalog.read("clusters").collect()
    }
    assert clusters_before == clusters_after
    assert result2["evaluation"] == result["evaluation"]


def test_resume_recomputes_on_input_change(pipeline_run, spark):
    """Changed input fingerprint must invalidate the preprocess skip."""
    pipe, _, wp, lp, wh = pipeline_run
    wp_changed = web_pages_df(spark, N_ENT + 5)
    pipe3 = ERPipeline(spark, wh, ERConfig())
    res3 = pipe3.run(wp_changed, lp)
    m3 = pipe3.manifest.read().where(F.col("run_id") == pipe3.manifest.run_id)
    pre = m3.where((F.col("stage") == "preprocess") & (F.col("status") == "ok"))
    assert pre.count() > 0  # recomputed, not skipped
    assert res3["n_pages"] > 0


def test_metadata_resume_skips_without_input_scan(spark, tmp_path_factory):
    """A resumed run over an UNCHANGED file manifest must decide to skip
    from file metadata alone — no scan of the input table. Proven the hard
    way: after the first run the input parquet files are overwritten with
    zero bytes IN PLACE (same path, size, mtime_ns), so any attempt to
    actually read them throws; a green second run is a no-scan proof."""
    import os

    wh = str(tmp_path_factory.mktemp("erp_wh_meta"))
    src = str(tmp_path_factory.mktemp("wp_src"))
    web_pages_df(spark, 40).write.mode("overwrite").parquet(src)
    lp = spark.createDataFrame(labeled_pairs_pdf(40, 200))

    wp1 = spark.read.parquet(src)
    pipe = ERPipeline(spark, wh, ERConfig())
    res1 = pipe.run(wp1, lp)

    schema = wp1.schema
    n_corrupted = 0
    for root, _, files in os.walk(src):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(root, fn)
            st = os.stat(p)
            with open(p, "r+b") as f:
                f.write(b"\x00" * st.st_size)
            os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
            n_corrupted += 1
    assert n_corrupted > 0

    # explicit schema: even DataFrame CREATION must not read a footer
    wp2 = spark.read.schema(schema).parquet(src)
    pipe2 = ERPipeline(spark, wh, ERConfig())
    res2 = pipe2.run(wp2, lp)
    m2 = pipe2.manifest.read().where(
        (F.col("run_id") == pipe2.manifest.run_id) & (F.col("status") == "skipped")
    )
    skipped = {r["stage"] for r in m2.select("stage").distinct().collect()}
    assert "preprocess" in skipped
    assert res2["n_pages"] == res1["n_pages"]
    assert res2["evaluation"] == res1["evaluation"]


def test_metadata_resume_detects_manifest_change(spark, tmp_path_factory):
    """Touching a file (mtime change) invalidates the metadata fingerprint;
    the content fingerprint then still detects identical content and skips,
    but only after a real scan — the documented two-level fallback."""
    import os
    import time as _time

    wh = str(tmp_path_factory.mktemp("erp_wh_meta2"))
    src = str(tmp_path_factory.mktemp("wp_src2"))
    web_pages_df(spark, 40).write.mode("overwrite").parquet(src)
    lp = spark.createDataFrame(labeled_pairs_pdf(40, 200))
    pipe = ERPipeline(spark, wh, ERConfig())
    pipe.run(spark.read.parquet(src), lp)

    for root, _, files in os.walk(src):
        for fn in files:
            if fn.endswith(".parquet"):
                os.utime(os.path.join(root, fn))  # content identical, mtime new
    _time.sleep(0.01)
    pipe2 = ERPipeline(spark, wh, ERConfig())
    pipe2.run(spark.read.parquet(src), lp)
    m2 = pipe2.manifest.read().where(F.col("run_id") == pipe2.manifest.run_id)
    # content fingerprint matched -> stage skipped (not recomputed)
    assert m2.where(
        (F.col("stage") == "preprocess") & (F.col("status") == "skipped")
    ).count() > 0


def test_resume_retrain_invalidates_scores(spark, tmp_path_factory):
    """Same pages + same blocking keys but a different trained model must
    recompute the score stage (the fingerprint mixes in the model digest)."""
    wh = str(tmp_path_factory.mktemp("erp_wh_retrain"))
    wp = web_pages_df(spark, 60)
    lp_pdf = labeled_pairs_pdf(60, 300)
    pipe = ERPipeline(spark, wh, ERConfig())
    pipe.run(wp, spark.createDataFrame(lp_pdf))
    scores1 = {
        (r["url1"], r["url2"]): r["confidence"]
        for r in pipe.catalog.read("scored_pairs").collect()
    }

    lp_flipped = lp_pdf.copy()
    lp_flipped["match"] = ~lp_flipped["match"].astype(bool)
    pipe2 = ERPipeline(spark, wh, ERConfig())
    pipe2.run(wp, spark.createDataFrame(lp_flipped))
    m2 = pipe2.manifest.read().where(F.col("run_id") == pipe2.manifest.run_id)
    score_ok = m2.where((F.col("stage") == "score") & (F.col("status") == "ok"))
    assert score_ok.count() > 0, "score stage must recompute after retraining"
    # upstream stages (same pages/keys) still skip
    skipped = {r["stage"] for r in m2.where(F.col("status") == "skipped").collect()}
    assert {"preprocess", "blocking", "pairs"} <= skipped
    scores2 = {
        (r["url1"], r["url2"]): r["confidence"]
        for r in pipe2.catalog.read("scored_pairs").collect()
    }
    assert scores1 != scores2, "flipped labels must change model scores"


def test_oversized_blocks_logged(pipeline_run):
    pipe, result, *_ = pipeline_run
    # the hot aggregator host is engineered into the fixture; with the
    # host|token key it may or may not exceed the cap, but the metrics key
    # must exist (no silent truncation path)
    assert "oversized_blocks" in result["metrics"]


def test_csv_export(pipeline_run, tmp_path_factory):
    """S7: cluster CSV export (clustering.py:1102-1136 analogue)."""
    pipe, result, *_ = pipeline_run
    out = str(tmp_path_factory.mktemp("csv_export"))
    pipe.export_clusters_csv(out)
    spark = pipe.spark
    back = spark.read.option("header", True).csv(out)
    assert back.columns == ["cluster_id", "entity_id"]
    # compare against the current clusters table (an earlier resume test may
    # have rerun the pipeline with a different corpus in this warehouse)
    assert back.count() == pipe.catalog.read("clusters").count()
    assert back.where("entity_id IS NULL OR cluster_id IS NULL").count() == 0


def test_uuid5_matches_python(spark):
    """F13: JVM uuid5 == Python uuid.uuid5 byte for byte (idempotent keys)."""
    import uuid

    from entity_resolution_pipeline_spark.operators.util import uuid5_col

    vals = ["", "abc", "https://ex.org/a?b=1", "Smith, John, 1840-1902", "ünïcodé ✓"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["u"] for r in df.select("s", uuid5_col("s").alias("u")).collect()}
    for v in vals:
        assert got[v] == str(uuid.uuid5(uuid.NAMESPACE_URL, v)), v


def test_merge_upsert(spark, tmp_path_factory):
    """S4: keyed upsert — matched keys replaced, unmatched kept, idempotent."""
    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("merge_wh")))
    cat.merge_upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
                     "t", ["k"])
    cat.merge_upsert(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
                     "t", ["k"])
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # idempotent: replaying the same batch changes nothing
    cat.merge_upsert(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
                     "t", ["k"])
    got2 = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got2 == got


def test_merge_upsert_crash_recovery(spark, tmp_path_factory):
    """A crash between the two swap renames leaves the table at the backup
    path; the next merge must restore it and proceed normally."""
    import os

    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("merge_crash_wh")))
    cat.merge_upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
                     "t", ["k"])
    # simulate the crash window: old table moved to backup, staging gone,
    # nothing at the primary path
    os.rename(cat.path("t"), cat.path("t__backup"))
    assert not cat.exists("t") and os.path.isdir(cat.path("t__backup"))
    cat.merge_upsert(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
                     "t", ["k"])
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # pre-crash rows recovered, merge applied
    assert not os.path.isdir(cat.path("t__backup"))


def test_fingerprint_files_semantics(spark, tmp_path_factory):
    """Stat-only manifest fingerprint: stable across re-reads, sensitive to
    content-size and mtime changes, None for in-memory frames."""
    import os

    from entity_resolution_pipeline_spark.sources.catalog import fingerprint_files

    d = str(tmp_path_factory.mktemp("fpf"))
    spark.range(100).write.mode("overwrite").parquet(d)
    fp1 = fingerprint_files(spark.read.parquet(d))
    fp2 = fingerprint_files(spark.read.parquet(d))
    assert fp1 is not None and fp1 == fp2
    # touching one data file changes the fingerprint
    for root, _, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet"):
                os.utime(os.path.join(root, fn))
                break
        break
    fp3 = fingerprint_files(spark.read.parquet(d))
    assert fp3 != fp1
    # in-memory frame: no file source -> None (caller falls back to content)
    assert fingerprint_files(spark.createDataFrame([(1,)], "x long")) is None
    # the QUERY PLAN participates: a different transformation over the SAME
    # files must not share a fingerprint (else resume would silently reuse
    # the first query's output for the second)
    fp_lim = fingerprint_files(spark.read.parquet(d).limit(5))
    fp_fil = fingerprint_files(spark.read.parquet(d).where("id > 10"))
    assert fp_lim != fp3 and fp_fil != fp3 and fp_lim != fp_fil


def test_fingerprint_files_object_store_metadata_path(spark, tmp_path_factory):
    """Non-local URIs must take the metadata (size, mtime) path — never
    degrade to None/content-scan just because os.stat can't see them. The
    object-store stat is injected (no s3 here); a changed etag/mtime flips
    the fingerprint."""
    from entity_resolution_pipeline_spark.sources.catalog import fingerprint_files

    d = str(tmp_path_factory.mktemp("fpf_s3"))
    spark.range(50).write.mode("overwrite").parquet(d)
    df = spark.read.parquet(d)
    local_uris = sorted(df.inputFiles())
    remote_map = {
        u: f"s3a://bucket/warehouse/{i}.parquet" for i, u in enumerate(local_uris)
    }
    df.inputFiles = lambda: [remote_map[u] for u in local_uris]  # type: ignore

    def stat_v1(_df, uri):
        assert uri.startswith("s3a://")  # proves the non-local branch is used
        return 1234, 99  # (size, mtime-or-etag) from the store's listing

    def stat_v2(_df, uri):
        return 1234, 100  # same size, newer mtime/etag

    fp_a = fingerprint_files(df, stat_fn=stat_v1)
    fp_b = fingerprint_files(df, stat_fn=stat_v1)
    fp_c = fingerprint_files(df, stat_fn=stat_v2)
    assert fp_a is not None and fp_a.startswith("meta:")
    assert fp_a == fp_b and fp_c != fp_a
    # default stat path on a real non-local URI goes through Hadoop's
    # FileSystem API — file:// handled there too, same status fields
    from entity_resolution_pipeline_spark.sources.catalog import _stat_uri

    size, mtime = _stat_uri(df, local_uris[0])
    import os as _os
    from urllib.parse import unquote, urlparse

    st = _os.stat(unquote(urlparse(local_uris[0]).path))
    assert size == st.st_size and mtime == st.st_mtime_ns


def test_table_diff(pipeline_run, spark):
    from entity_resolution_pipeline_spark.sources.catalog import table_diff

    a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    d = table_diff(a, b, ["k"])
    assert d["added"] == 1 and d["missing"] == 1
    assert d["added_sample"] == [(1,)]
    assert d["missing_sample"] == [(4,)]


def _norm_lp(lp):
    from entity_resolution_pipeline_spark.plans.pipeline import normalize_match

    return lp.select(
        F.least("left", "right").alias("url1"),
        F.greatest("left", "right").alias("url2"),
        normalize_match(F.col("match")).alias("label"),
    )


def test_misclassified_pairs_operator_surfaces_fns_with_evidence(pipeline_run):
    """With an impossible threshold EVERY label-1 pair becomes an error —
    scored ones as FN, never-blocked ones as FN_UNBLOCKED (blocking recall
    gaps must not be invisible) — all with fields and a feature row."""
    from entity_resolution_pipeline_spark.operators.analyze import misclassified_pairs
    from entity_resolution_pipeline_spark.operators.pairs import FEATURE_NAMES

    pipe, _, wp, lp, wh = pipeline_run
    scored = pipe.catalog.read("scored_pairs")
    records = pipe.catalog.read("records")
    lpn = _norm_lp(lp)
    errors = misclassified_pairs(scored, lpn, records, threshold=2.0)
    rows = errors.collect()
    expected = lpn.where(F.col("label") == 1).count()
    n_blocked = lpn.where(F.col("label") == 1).join(
        scored, ["url1", "url2"], "left_semi"
    ).count()
    assert expected > 0
    assert len(rows) == expected
    by_type = {}
    for r in rows:
        by_type[r["error_type"]] = by_type.get(r["error_type"], 0) + 1
        assert r["label"] == 1 and r["pred"] == 0
        assert len(r["features"]) == len(FEATURE_NAMES)
        assert r["person1"] is not None and r["person2"] is not None
    assert by_type.get("FN", 0) == n_blocked
    assert by_type.get("FN_UNBLOCKED", 0) == expected - n_blocked


def test_misclassified_pairs_keeps_unrecorded_labels(pipeline_run, spark):
    """A labeled positive whose url never made it into the records table
    (page filtered during preprocess) must still appear — as
    FN_UNRECORDED with NULL fields/features — not be silently dropped by
    the evidence joins."""
    from entity_resolution_pipeline_spark.operators.analyze import misclassified_pairs

    pipe, *_ = pipeline_run
    scored = pipe.catalog.read("scored_pairs")
    records = pipe.catalog.read("records")
    some_url = records.select("url").limit(1).collect()[0]["url"]
    ghost = spark.createDataFrame(
        [("http://ghost.example/filtered-out", some_url)], ["left", "right"]
    ).select(
        F.least("left", "right").alias("url1"),
        F.greatest("left", "right").alias("url2"),
        F.lit(1).alias("label"),
    )
    errors = misclassified_pairs(scored, ghost, records, threshold=0.9)
    rows = errors.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["error_type"] == "FN_UNRECORDED"
    assert r["pred"] == 0 and r["confidence"] is None
    assert r["features"] is None and r["person1"] is None


def test_pipeline_misclassification_analysis(pipeline_run):
    """Pipeline wiring: errors at the real threshold match a manual join and
    land in the misclassified_pairs catalog table + metrics."""
    pipe, _, wp, lp, wh = pipeline_run
    summary = pipe.analyze_misclassifications(lp)
    errors = pipe.catalog.read("misclassified_pairs")
    thr = pipe.config.decision_threshold
    scored = pipe.catalog.read("scored_pairs")
    expected = (
        _norm_lp(lp)
        .join(scored, ["url1", "url2"], "left")
        .where(
            F.coalesce(
                (F.col("confidence") >= thr).cast("int"), F.lit(0)
            ) != F.col("label")
        )
        .count()
    )
    assert errors.count() == expected
    assert sum(v["n"] for v in summary.values()) == expected
    for r in errors.collect():
        pred = 1 if (r["confidence"] is not None and r["confidence"] >= thr) else 0
        assert pred != r["label"]
        if pred == 1:
            assert r["error_type"] == "FP"
        else:
            assert r["error_type"] in ("FN", "FN_UNBLOCKED")
            assert (r["error_type"] == "FN_UNBLOCKED") == (r["confidence"] is None)
    assert "misclassification" in pipe.metrics


def test_markdown_run_report(pipeline_run):
    """§7.2 item 7: the report sink renders the run's metrics (incl. the F1
    gate value) to reports/run_<id>.md in the warehouse."""
    from entity_resolution_pipeline_spark.plans.report import write_run_report

    pipe, result, *_ = pipeline_run
    path = write_run_report(pipe)
    assert path.endswith(f"run_{pipe.manifest.run_id}.md")
    with open(path) as f:
        body = f.read()
    f1 = pipe.metrics["evaluation"]["blocked_pairs"]["f1"]
    assert f"F1 = {f1:.4f}" in body
    assert "## Stages" in body and "## Cluster size distribution" in body
    assert "## Feature importance" in body


def test_impute_enrichment(pipeline_run):
    """§2.10: imputation over the warehouse records fills missing fields."""
    pipe, *_ = pipeline_run
    counts = pipe.impute(fields=("provision",), sim_threshold=0.2)
    assert counts["provision"] >= 0
    if counts["provision"]:
        imp = pipe.catalog.read("imputed_provision")
        assert {"url", "imputed_value", "donor_count", "mean_sim"} <= set(imp.columns)
        assert imp.where("imputed_value IS NULL").count() == 0


def test_stat_uris_bulk_local(tmp_path):
    """_stat_uris: local file:// and bare paths stat without any Spark/JVM
    involvement (df is never touched), matching os.stat exactly."""
    import os as _os

    from entity_resolution_pipeline_spark.sources.catalog import _stat_uris

    p1 = tmp_path / "a.parquet"
    p2 = tmp_path / "b.parquet"
    p1.write_bytes(b"x" * 10)
    p2.write_bytes(b"y" * 20)
    uris = [f"file://{p1}", str(p2)]
    out = _stat_uris(None, uris)
    assert out[uris[0]] == (10, _os.stat(p1).st_mtime_ns)
    assert out[uris[1]] == (20, _os.stat(p2).st_mtime_ns)


def test_catalog_compact_small_files(spark, tmp_path_factory):
    """compact() rewrites a fragmented table into ~target-sized files:
    file count collapses, rows/values identical, crash-safe staging (no
    leftover __staging/__backup dirs)."""
    import os as _os

    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    wh = str(tmp_path_factory.mktemp("compact_wh"))
    cat = Catalog(spark, wh)
    # 12 appends x 4 partitions each -> dozens of tiny files
    for i in range(12):
        cat.append(spark.range(i * 100, (i + 1) * 100).repartition(4), "frag")

    def count_files(p):
        return sum(1 for _, _, fs in _os.walk(p) for f in fs
                   if f.endswith(".parquet"))

    before_files = count_files(cat.path("frag"))
    before_rows = sorted(r["id"] for r in cat.read("frag").collect())
    n_after = cat.compact("frag", target_file_mb=256)
    assert before_files >= 40 and n_after <= 2
    assert n_after == count_files(cat.path("frag"))
    assert sorted(r["id"] for r in cat.read("frag").collect()) == before_rows
    assert not _os.path.isdir(cat.path("frag__staging"))
    assert not _os.path.isdir(cat.path("frag__backup"))


def test_catalog_partitioned_write_prunes_scan(spark, tmp_path_factory):
    """partition_by layout must turn an equality filter into partition
    pruning at the scan (PartitionFilters in the plan, not a post-scan
    filter over every file) — the layout lever that lets a 100 TB table
    answer a single-source query by touching one directory."""
    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    wh = str(tmp_path_factory.mktemp("part_wh"))
    cat = Catalog(spark, wh)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cat.write(docs, "docs_by_source", partition_by=["source"])
    one = cat.read("docs_by_source").where(F.col("source") == "src3")
    jvm = spark.sparkContext._jvm
    plan = one._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "source" in pf_line, pf_line
    assert one.count() > 0


def test_catalog_compact_partitioned_preserves_layout(spark, tmp_path_factory):
    """ADVICE r4: compact() on a hive-partitioned table must re-write WITH
    the partitioning — the ``col=value`` dirs (and the partition pruning
    they enable) survive, values identical, file count not worse."""
    import os as _os

    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    wh = str(tmp_path_factory.mktemp("compact_part_wh"))
    cat = Catalog(spark, wh)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # repartition(8) -> several files inside every partition dir
    cat.write(docs.repartition(8), "dp", partition_by=["source"])
    assert cat.partition_columns("dp") == ["source"]

    def count_files(p):
        return sum(1 for _, _, fs in _os.walk(p) for f in fs
                   if f.endswith(".parquet"))

    before_files = count_files(cat.path("dp"))
    before = sorted((r["doc_id"], r["source"])
                    for r in cat.read("dp").select("doc_id", "source").collect())
    n_after = cat.compact("dp", target_file_mb=256)
    assert cat.partition_columns("dp") == ["source"], "partitioning flattened"
    assert n_after < before_files
    after = sorted((r["doc_id"], r["source"])
                   for r in cat.read("dp").select("doc_id", "source").collect())
    assert after == before
    # pruning still plans as a PartitionFilter after the rewrite
    one = cat.read("dp").where(F.col("source") == before[0][1])
    jvm = spark.sparkContext._jvm
    plan = one._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and "source" in pf_lines[0], plan


def test_catalog_compact_crash_recovery(spark, tmp_path_factory):
    """ADVICE r4: a compact killed between its two renames leaves the only
    copy at ``name__backup``; the next compact() heals it via the shared
    restore preamble instead of failing until manual repair."""
    import os as _os

    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    wh = str(tmp_path_factory.mktemp("compact_crash_wh"))
    cat = Catalog(spark, wh)
    cat.write(spark.range(500), "t")
    rows = sorted(r["id"] for r in cat.read("t").collect())
    # simulate the crash window: old table renamed to backup, new one not
    # yet swapped in (staging already gone)
    _os.rename(cat.path("t"), cat.path("t__backup"))
    assert not cat.exists("t")
    cat.compact("t", target_file_mb=256)
    assert cat.exists("t")
    assert sorted(r["id"] for r in cat.read("t").collect()) == rows
    assert not _os.path.isdir(cat.path("t__staging"))
    assert not _os.path.isdir(cat.path("t__backup"))


def test_confirmed_min_estimator():
    """bench._confirmed_min: an unconfirmed fast outlier is rejected, a
    reproduced min is kept, degenerate inputs fall back to plain min.
    First case is the literal r4 driver data that sat the scaling gate at
    exactly 0.80 (21.47 unreproduced vs a 25-27 s cluster)."""
    import bench

    assert bench._confirmed_min([21.47, 26.45, 26.59, 25.26]) == 25.26
    assert bench._confirmed_min([6.709, 6.71, 7.93]) == 6.709
    assert bench._confirmed_min([5.0]) == 5.0
    assert bench._confirmed_min([10.0, 20.0]) == 10.0


def test_catalog_compact_splits_oversized_partition(spark, tmp_path_factory):
    """Self-review r5: hashing on the partition columns alone can never
    split one value's rows across tasks — an oversized partition value
    came back as a single giant file. compact() must salt oversized
    values into ~target-sized files while keeping small values at one
    file and all rows intact."""
    import os as _os

    from entity_resolution_pipeline_spark.sources.catalog import Catalog

    wh = str(tmp_path_factory.mktemp("compact_split_wh"))
    cat = Catalog(spark, wh)
    big = spark.range(60000).select(
        "id", F.lit("big").alias("part"),
        F.repeat(F.md5(F.col("id").cast("string")), 6).alias("payload"),
    )
    small = spark.range(200).select(
        (F.col("id") + 1_000_000).alias("id"), F.lit("small").alias("part"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    cat.write(big.unionByName(small), "t", partition_by=["part"])
    n_rows_before = cat.read("t").count()
    sizes = cat._partition_leaf_sizes("t", 1)
    assert sizes[("big",)] > 2 * 1024 * 1024  # premise: big value >> target

    cat.compact("t", target_file_mb=1)

    def files_in(part):
        d = _os.path.join(cat.path("t"), f"part={part}")
        return [f for f in _os.listdir(d) if f.endswith(".parquet")]

    assert len(files_in("big")) >= 2, "oversized value not split"
    assert len(files_in("small")) == 1
    assert cat.read("t").count() == n_rows_before
    assert cat.partition_columns("t") == ["part"]
    # no helper columns leaked into the data
    assert not any(c.startswith("__") for c in cat.read("t").columns)
