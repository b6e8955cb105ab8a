"""Markdown run-report sink.

Spark-first analogue of the reference's consolidated report generator
(/root/reference/src/reporting.py:280-563): one operator that renders the
run's metrics — stage lineage, pair/score counts, evaluation confusion +
F1, cluster-size stats (A10), feature importance (W5/M7), and the
misclassification summary when present — into
``<warehouse>/reports/run_<run_id>.md``.

Everything driver-side is bounded: stage summaries are aggregates over the
manifest table, cluster stats are the single-row A10 aggregate, and the
feature table is fixed-width — no unbounded collect().
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame


def _md_table(rows: list[dict], columns: list[str]) -> str:
    out = ["| " + " | ".join(columns) + " |",
           "|" + "|".join("---" for _ in columns) + "|"]
    for r in rows:
        cells = []
        for c in columns:
            v = r.get(c)
            if isinstance(v, float):
                v = f"{v:.4f}"
            cells.append(str(v))
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def _df_table(df: DataFrame, limit: int = 50) -> str:
    cols = df.columns
    rows = [r.asDict() for r in df.limit(limit).collect()]
    return _md_table(rows, cols)


def write_run_report(pipeline, out_path: str | None = None) -> str:
    """Render the pipeline's current warehouse state to a markdown report.

    Returns the path written. ``pipeline`` is an
    :class:`~entity_resolution_pipeline_spark.plans.pipeline.ERPipeline`
    whose ``run()`` has completed against its warehouse.
    """
    from pyspark.sql import functions as F  # noqa: N812

    from ..operators.cluster import cluster_size_stats

    cat = pipeline.catalog
    run_id = pipeline.manifest.run_id
    if out_path is None:
        rep_dir = os.path.join(cat.warehouse, "reports")
        os.makedirs(rep_dir, exist_ok=True)
        out_path = os.path.join(rep_dir, f"run_{run_id}.md")

    lines = [f"# Entity-resolution run report — `{run_id}`", ""]
    lines.append(f"Generated: {time.strftime('%Y-%m-%d %H:%M:%S')}")
    lines.append("")

    # ---- stage lineage (manifest aggregate) ----
    m = pipeline.manifest.read()
    if m is not None:
        stage_rows = [
            r.asDict()
            for r in (
                m.where(F.col("run_id") == run_id)
                .groupBy("stage", "status")
                .agg(
                    F.sum("rows_out").alias("rows_out"),
                    F.max("wall_ms").alias("wall_ms"),
                    F.count(F.lit(1)).alias("partitions"),
                )
                .orderBy("stage", "status")
                .collect()
            )
        ]
        lines += ["## Stages", "",
                  _md_table(stage_rows,
                            ["stage", "status", "rows_out", "wall_ms", "partitions"]),
                  ""]

    # ---- headline metrics ----
    mt = pipeline.metrics
    headline = {
        k: mt[k]
        for k in ("candidate_pairs", "score_dup_ratio", "score_wall_s",
                  "pairs_scored_per_sec", "oversized_blocks_count")
        if k in mt
    }
    if headline:
        lines += ["## Metrics", "", "```json",
                  json.dumps(headline, indent=2, default=str), "```", ""]

    # ---- evaluation (M6) ----
    ev = mt.get("evaluation")
    if ev:
        lines.append("## Evaluation (pairwise, M6)")
        lines.append("")
        for scope in ("blocked_pairs", "all_pairs"):
            c = ev[scope]
            lines.append(
                f"- **{scope}**: F1 = {c['f1']:.4f}, precision = "
                f"{c['precision']:.4f}, recall = {c['recall']:.4f} "
                f"(tp={c['tp']} fp={c['fp']} fn={c['fn']} tn={c['tn']})"
            )
        lines.append("")
    for split in ("train", "test"):
        if split in mt:
            lines.append(f"- {split} confusion: "
                         + json.dumps({k: v for k, v in mt[split].items()
                                       if not isinstance(v, list)}, default=str))
    lines.append("")

    # ---- cluster stats (A10) ----
    if cat.exists("clusters"):
        lines += ["## Cluster size distribution (A10)", "",
                  _df_table(cluster_size_stats(cat.read("clusters"))), ""]

    # ---- feature importance (W5/M7) ----
    fi = mt.get("feature_importance")
    if fi:
        rows = [{"feature": n, "weight": w} for n, w in fi]
        lines += ["## Feature importance (M7)", "",
                  _md_table(rows, ["feature", "weight"]), ""]

    # ---- misclassification summary ----
    mc = mt.get("misclassification")
    if mc:
        lines += ["## Misclassification summary", "", "```json",
                  json.dumps(mc, indent=2, default=str), "```", ""]

    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path
