"""The end-to-end entity-resolution DAG (SURVEY.md §7.1).

    web_pages -> records -> blocking keys -> candidate pairs
              -> scores (distinct field-tuples, Arrow pass, broadcast LR)
              -> edges -> clusters -> evaluation

Lifecycle mirrors the reference pipeline (/root/reference/src/pipeline.py:98-190):
a linear list of named stages, each `read -> transform -> write table`,
individually skippable on resume. Completion probing = manifest rows with the
same input fingerprint + output table existence
(mirrors /root/reference/src/pipeline.py:230-261). Every stage appends
per-partition lineage + metrics rows (north_rule).

The classifier is trained driver-side on the labeled pairs (tiny — ~2k rows,
M1/M2) and broadcast into the scoring pass; everything else is distributed.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..operators import blocking as B  # noqa: N812
from ..operators import cluster as C  # noqa: N812
from ..operators import pairs as P  # noqa: N812
from ..operators.classify import (
    LRModel,
    balance_classes,
    confusion,
    feature_importance,
    fit_logistic_regression,
    precision_recall_curve,
    roc_auc,
    stratified_split,
)
from ..operators.preprocess import (
    field_hash_mapping,
    field_stats,
    preprocess_records,
    string_counts,
    strings_long,
    unique_strings,
)
from ..sources.catalog import Catalog, Manifest, fingerprint_df, fingerprint_files

STAGES = [
    "preprocess",
    "blocking",
    "pairs",
    "score",
    "edges",
    "cluster",
]


@dataclass
class ERConfig:
    decision_threshold: float = 0.90   # config.yml:129
    min_edge_weight: float = 0.5       # config.yml:135
    train_frac: float = 0.7            # config.yml:22
    seed: int = 42                     # config.yml:15
    # 32x8 (r=4): blocked-pairs F1 1.0000 at 200 and 1000 entities in the
    # round-4 A/B vs 64x16, at half the sketch + key fan-out cost
    lsh_num_perm: int = 32
    lsh_bands: int = 8
    max_block_size: int = 64
    transitivity_enabled: bool = False  # CC subsumes G2; kept as operator
    # M4 RFE: None = disabled, matching the reference's shipped config
    # (config.yml:105); an int selects down to that many features
    rfe_min_features: int | None = None
    extra: dict = field(default_factory=dict)


class ERPipeline:
    """Library API analogue of EntityResolutionIntegration
    (/root/reference/src/integration.py:30-117)."""

    def __init__(self, spark: SparkSession, warehouse: str, config: ERConfig | None = None,
                 run_id: str | None = None):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)
        self.manifest = Manifest(self.catalog, run_id=run_id)
        self.config = config or ERConfig()
        self.metrics: dict = {}

    # ---------- stage runner ----------

    def _table_fp(self, df: DataFrame, key_cols: list[str]) -> str:
        """Resume fingerprint for an INTERNAL catalog table: the stat-only
        file-manifest hash when the table is file-backed (it always is in
        the warehouse; in-memory only in unit-test paths), else the content
        hash. Internal tables are rewritten exactly when their stage reran,
        so the manifest is the right granularity — and probing it never
        re-scans a table that can be arbitrarily large. Conservative by
        design: a byte-identical rewrite changes the manifest and recomputes
        downstream (the input itself changed in that case anyway)."""
        return fingerprint_files(df) or fingerprint_df(df, key_cols)

    def _run_stage(self, stage: str, input_fp: str, rows_in: int, build_df, out_table: str,
                   force: bool = False) -> DataFrame:
        if not force and self.catalog.exists(out_table) and self.manifest.stage_complete(stage, input_fp):
            self.manifest.record_skipped(stage, input_fp)
            return self.catalog.read(out_table)
        t0 = time.time()
        df = build_df()
        self.catalog.write(df, out_table)
        out = self.catalog.read(out_table)
        wall_ms = int((time.time() - t0) * 1000)
        self.manifest.record_stage(stage, out, rows_in, wall_ms, input_fp)
        return out

    # ---------- full run ----------

    def run(self, web_pages: DataFrame, labeled_pairs: DataFrame | None = None,
            force: bool = False) -> dict:
        cfg = self.config
        # two-level resume fingerprinting for the (100 TB) input:
        # 1. metadata level — md5 of the source file manifest (path, size,
        #    mtime_ns): a stat-only probe, so deciding to SKIP the input
        #    never scans it. The parquet-dir analogue of comparing Iceberg
        #    snapshot ids.
        # 2. content level — only when the manifest changed (or the input is
        #    not file-backed): xxhash64(url,text) aggregate. Content-
        #    sensitive, catches rewritten-but-identical files, costs a scan.
        meta_fp = fingerprint_files(web_pages)
        if (
            not force
            and meta_fp is not None
            and self.catalog.exists("records")
            and self.manifest.stage_complete("preprocess", meta_fp)
        ):
            self.manifest.record_skipped("preprocess", meta_fp)
            records = self.catalog.read("records")
            input_fp = meta_fp
            n_pages = int(records.count())
        else:
            # content-sensitive fingerprint: url alone would silently reuse
            # stale records when the same urls arrive with changed text
            input_fp = fingerprint_df(web_pages, ["url", "text"])
            n_pages = int(input_fp.split(":")[0])
            records = self._run_stage(
                "preprocess", input_fp, n_pages,
                lambda: preprocess_records(web_pages), "records", force,
            )
            if meta_fp is not None:
                # register the manifest fingerprint too, so the NEXT run can
                # skip on metadata alone
                self.manifest.record_alias("preprocess", meta_fp)

        # dedup dimensions (A1-A4) — cheap, always rebuilt with records
        long_df = strings_long(records)
        self.catalog.write(unique_strings(long_df), "unique_strings")
        self.catalog.write(string_counts(long_df), "string_counts")
        self.catalog.write(field_hash_mapping(long_df), "field_hash_mapping")
        self.catalog.write(field_stats(long_df), "field_stats")

        rec_fp = self._table_fp(records, ["url", "person_h"])
        keys = self._run_stage(
            "blocking", rec_fp, n_pages,
            lambda: B.all_blocking_keys(records, num_perm=cfg.lsh_num_perm, bands=cfg.lsh_bands),
            "blocking_keys", force,
        )

        pair_handles: list = []

        def build_pairs():
            pairs, oversized = B.candidate_pairs(
                keys, max_block_size=cfg.max_block_size,
                cache_handles=pair_handles,
            )
            # persist oversized blocks as a catalog table so a resumed run
            # (pairs stage skipped) still reports them; metrics keeps only a
            # bounded sample — at 100 TB the full list can itself be large.
            self.catalog.write(oversized, "oversized_blocks")
            return pairs

        keys_fp = self._table_fp(keys, ["url", "key"])
        pairs = self._run_stage("pairs", keys_fp, -1, build_pairs, "candidate_pairs", force)
        for h in pair_handles:  # both outputs are materialized in catalog now
            h.unpersist()
        if self.catalog.exists("oversized_blocks"):
            over_df = self.catalog.read("oversized_blocks")
            self.metrics["oversized_blocks_count"] = int(over_df.count())
            self.metrics["oversized_blocks"] = [
                {"key": r["key"], "size": int(r["block_size"])}
                for r in over_df.orderBy(F.desc("block_size"), "key").limit(100).collect()
            ]
        n_pairs = pairs.count()
        self.metrics["candidate_pairs"] = int(n_pairs)

        # ---- train classifier on labeled pairs (driver-side, tiny) ----
        model = None
        if labeled_pairs is not None:
            model = self.train(records, labeled_pairs)
        else:
            model = self._load_model()
        if model is None:
            raise ValueError("no labeled pairs given and no saved model found")

        # the score-stage fingerprint mixes in the model digest: retraining
        # with new labels must invalidate cached scored_pairs even when the
        # blocking keys are unchanged.
        model_fp = model.digest()
        score_fp = f"{keys_fp}|score|{model_fp}"

        # pair_fields feeds both the distinct-tuple scoring and the join-back:
        # persist so the two consumers share one computation (on a cluster
        # this is a materialized intermediate table / exchange reuse).
        pair_fields = P.with_pair_key(P.attach_pair_fields(pairs, records)).persist()

        def build_scores():
            # adaptive: when pairs repeat the same field tuples heavily
            # (dup-heavy web corpora), score distinct tuples once and hash-
            # join back; at low dup ratios the dedup shuffle + join-back
            # costs more than rescoring (per-partition memos still dedupe
            # within tasks), so score pair rows directly.
            stats = pair_fields.agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct("pair_key").alias("d"),
            ).collect()[0]
            dup_ratio = stats["n"] / max(1, stats["d"])
            self.metrics["score_dup_ratio"] = round(float(dup_ratio), 3)
            if dup_ratio >= 3.0:
                distinct_tuples = pair_fields.select(
                    "pair_key", *P.PAIR_SIDE_COLS
                ).dropDuplicates(["pair_key"])
                scored_tuples = P.score(distinct_tuples, model.to_dict())
                return pair_fields.select("url1", "url2", "pair_key").join(
                    scored_tuples, "pair_key"
                ).select("url1", "url2", "confidence", "prefilter")
            # co-locate same-person rows first when the input is large: the
            # Python tsr kernel's cost is driven by per-partition memo hit
            # rates, and repartitioning by person measured ~1.7-2.3x faster
            # at 5.8M pairs; below ~2M rows the shuffle costs more than the
            # extra memo hits save (partitions already see most variants)
            src = pair_fields.repartition("person1") if stats["n"] >= 2_000_000 else pair_fields
            return P.score(
                src, model.to_dict(), passthrough=("url1", "url2")
            ).select("url1", "url2", "confidence", "prefilter")

        t_score0 = time.time()
        scored = self._run_stage("score", score_fp, int(n_pairs), build_scores, "scored_pairs", force)
        self.metrics["score_wall_s"] = time.time() - t_score0
        pair_fields.unpersist()
        self.metrics["pairs_scored_per_sec"] = (
            n_pairs / self.metrics["score_wall_s"] if self.metrics["score_wall_s"] > 0 else None
        )

        def build_edges():
            e = C.build_edges(scored, cfg.min_edge_weight, cfg.decision_threshold)
            if cfg.transitivity_enabled:
                e = C.transitivity_one_hop(e, cfg.min_edge_weight)
            return e

        edges = self._run_stage("edges", score_fp + "|edges", int(n_pairs), build_edges, "edges", force)

        def build_clusters():
            nodes = records.select(F.col("url").alias("node"))
            return C.assign_clusters(edges, nodes)

        clusters = self._run_stage("cluster", score_fp + "|cluster", int(n_pairs), build_clusters, "clusters", force)

        result = {
            "n_pages": n_pages,
            "candidate_pairs": int(n_pairs),
            "n_clusters": int(clusters.select("cluster_id").distinct().count()),
            "metrics": self.metrics,
        }
        if labeled_pairs is not None:
            result["evaluation"] = self.evaluate(clusters, labeled_pairs, pairs)
        return result

    # ---------- training ----------

    def featurize_labeled(self, records: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
        lp = labeled_pairs.select(
            F.least("left", "right").alias("url1"),
            F.greatest("left", "right").alias("url2"),
            normalize_match(F.col("match")).alias("label"),
        )
        wide = P.with_pair_key(P.attach_pair_fields(lp, records))
        feats = P.featurize(wide.select("pair_key", *P.PAIR_SIDE_COLS).dropDuplicates(["pair_key"]))
        return wide.select("url1", "url2", "label", "pair_key").join(feats, "pair_key")

    def train(self, records: DataFrame, labeled_pairs: DataFrame) -> LRModel:
        feat_df = self.featurize_labeled(records, labeled_pairs)
        rows = feat_df.select("url1", "url2", "features", "label", "prefilter").collect()
        # collect() row order follows partition order, which is not stable
        # across runs; the IRLS fit (via the stratified split) must see a
        # deterministic order or the model digest changes on every rerun
        rows.sort(key=lambda r: (r["url1"], r["url2"]))
        X = np.array([r["features"] for r in rows], dtype=np.float64)
        y = np.array([1.0 if r["label"] else 0.0 for r in rows])

        tr, te = stratified_split(y, self.config.train_frac, self.config.seed)
        # M3 guard-rail: degenerate label sets (single class / >10x skew) in
        # the train split are balanced before fitting (classification.py:
        # 415-471); evaluation below stays on the original, unbalanced rows
        # so the prefilter overrides remain row-aligned.
        X_fit, y_fit = balance_classes(X[tr], y[tr], seed=self.config.seed)
        if self.config.rfe_min_features is not None:
            # M4: select, fit on the subset, then re-embed into the full
            # feature space (dropped features get weight 0) so the
            # fixed-width scoring paths stay untouched
            from ..operators.classify import expand_model, rfe_select

            sel = rfe_select(X_fit, y_fit, self.config.rfe_min_features)
            sub = fit_logistic_regression(
                X_fit[:, sel], y_fit, c=1.0, balanced=True,
                feature_names=[P.FEATURE_NAMES[i] for i in sel],
            )
            model = expand_model(sub, sel, P.FEATURE_NAMES)
            self.metrics["rfe_selected"] = [P.FEATURE_NAMES[i] for i in sel]
        else:
            model = fit_logistic_regression(
                X_fit, y_fit, c=1.0, balanced=True, feature_names=P.FEATURE_NAMES
            )

        # test-split metrics with prefilter overrides (M6 semantics)
        pref = np.array([r["prefilter"] for r in rows], dtype=object)
        p = model.predict_proba(X)
        p = np.where(pref == "true", 1.0, np.where(pref == "false", 0.0, p))
        pred = (p >= self.config.decision_threshold).astype(int)
        self.metrics["train"] = confusion(y[tr], pred[tr])
        self.metrics["test"] = confusion(y[te], pred[te])
        self.metrics["test"]["roc_auc"] = roc_auc(y[te], p[te])
        self.metrics["test"]["pr_curve"] = precision_recall_curve(y[te], p[te], max_points=50)
        self.metrics["feature_importance"] = feature_importance(model)[:10]

        self._save_model(model)
        return model

    def _save_model(self, model: LRModel) -> None:
        import os

        with open(os.path.join(self.catalog.warehouse, "model.json"), "w") as f:
            json.dump(model.to_dict(), f)

    def _load_model(self) -> LRModel | None:
        import os

        path = os.path.join(self.catalog.warehouse, "model.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return LRModel.from_dict(json.load(f))

    # ---------- evaluation ----------

    def evaluate(self, clusters: DataFrame, labeled_pairs: DataFrame,
                 candidate_pairs: DataFrame | None = None) -> dict:
        """Pairwise F1 of predicted same-cluster vs labels (M6).

        Reported twice: on all labeled pairs, and restricted to labeled pairs
        that co-occur in at least one block ("at matched blocking keys", the
        BASELINE.json gate).
        """
        lp = labeled_pairs.select(
            F.least("left", "right").alias("url1"),
            F.greatest("left", "right").alias("url2"),
            normalize_match(F.col("match")).alias("label"),
        )
        c1 = clusters.select(F.col("entity_id").alias("url1"), F.col("cluster_id").alias("cid1"))
        c2 = clusters.select(F.col("entity_id").alias("url2"), F.col("cluster_id").alias("cid2"))
        joined = (
            lp.join(c1, "url1", "left")
            .join(c2, "url2", "left")
            .withColumn(
                "pred",
                (F.col("cid1").isNotNull() & (F.col("cid1") == F.col("cid2"))).cast("int"),
            )
        )
        if candidate_pairs is not None:
            blocked = joined.join(candidate_pairs, ["url1", "url2"], "left_semi")
        else:
            blocked = joined

        def conf_of(df: DataFrame) -> dict:
            r = df.agg(
                F.sum(((F.col("label") == 1) & (F.col("pred") == 1)).cast("long")).alias("tp"),
                F.sum(((F.col("label") == 0) & (F.col("pred") == 1)).cast("long")).alias("fp"),
                F.sum(((F.col("label") == 1) & (F.col("pred") == 0)).cast("long")).alias("fn"),
                F.sum(((F.col("label") == 0) & (F.col("pred") == 0)).cast("long")).alias("tn"),
            ).collect()[0]
            tp, fp, fn, tn = (int(r[k] or 0) for k in ("tp", "fp", "fn", "tn"))
            prec = tp / (tp + fp) if tp + fp else 0.0
            rec = tp / (tp + fn) if tp + fn else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            return {"tp": tp, "fp": fp, "fn": fn, "tn": tn,
                    "precision": prec, "recall": rec, "f1": f1}

        out = {"all_pairs": conf_of(joined), "blocked_pairs": conf_of(blocked)}
        self.metrics["evaluation"] = out
        return out

    def analyze_misclassifications(self, labeled_pairs: DataFrame) -> dict:
        """Misclassification analysis (reference misclass.py / analyze_pairs
        analogue): FP/FN labeled pairs joined back to both sides' fields,
        features, and confidence. Writes the ``misclassified_pairs`` table
        and returns per-error-type summary stats in ``metrics``."""
        from ..operators.analyze import error_summary, misclassified_pairs

        lp = labeled_pairs.select(
            F.least("left", "right").alias("url1"),
            F.greatest("left", "right").alias("url2"),
            normalize_match(F.col("match")).alias("label"),
        )
        errors = misclassified_pairs(
            self.catalog.read("scored_pairs"),
            lp,
            self.catalog.read("records"),
            threshold=self.config.decision_threshold,
        )
        self.catalog.write(errors, "misclassified_pairs")
        summary = error_summary(self.catalog.read("misclassified_pairs"))
        self.metrics["misclassification"] = summary
        return summary

    def impute(self, fields=("provision", "subjects"), method: str = "average",
               sim_threshold: float = 0.30, max_donors: int = 10) -> dict:
        """§2.10 vector hot-deck imputation over the preprocessed records.

        Stores imputed values in ``imputed_<field>`` tables; like the
        reference (imputation.py:335-431 + SURVEY §2.10), the scoring path
        keeps reading original hashes — imputation is an enrichment output.
        """
        from ..operators.embed import embed_unique_strings
        from ..operators.impute import impute_field

        records = self.catalog.read("records")
        us = self.catalog.read("unique_strings")
        emb = embed_unique_strings(us)
        emb.persist()
        counts = {}
        for field_name in fields:
            out = impute_field(
                records, emb, field_name,
                sim_threshold=sim_threshold, max_donors=max_donors, method=method,
            )
            self.catalog.write(out, f"imputed_{field_name}")
            counts[field_name] = int(self.catalog.read(f"imputed_{field_name}").count())
        emb.unpersist()
        self.metrics["imputed"] = counts
        return counts

    def export_clusters_csv(self, path: str) -> None:
        """S7: CSV export (cluster_id, entity_id) mirroring clustering.py:1102-1136."""
        self.catalog.read("clusters").select("cluster_id", "entity_id").write.mode(
            "overwrite"
        ).option("header", True).csv(path)


def normalize_match(col):
    """Truthy-string normalization (S2, parallel_features.py:386-411)."""
    return (
        F.when(F.lower(col.cast("string")).isin("true", "yes", "t", "y", "1", "match"), 1)
        .otherwise(0)
    )
