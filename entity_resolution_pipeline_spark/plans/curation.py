"""End-to-end corpus curation plan — the training-data funnel.

Composes the curation operators into the pipeline a web-scale pretraining
corpus actually goes through, in the cost-ordered sequence (cheap map-only
gates first, shuffle-bearing dedup after, so every expensive stage sees
only survivors):

    quality gate (Gopher signals, map-only)
      -> exact dedup (128-bit content key)
      -> near-dup clusters (MinHash-LSH + CC closure; keep canonical doc)
      -> decontamination vs an eval/holdout set (winnowed fingerprints)
      -> PII redaction (map-only rewrite)
      -> deterministic train/holdout split

Returns the curated DataFrame plus a funnel dict (rows surviving each
stage) — the no-silent-caps accounting: every drop is counted and
attributable. Each count is one bounded aggregate job; at 100 TB the
funnel numbers are exactly what an operator dashboard shows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..operators.dedup import exact_dedup, near_dup_clusters
from ..operators.sample import split_train_holdout
from ..operators.textstats import decontaminate, gopher_quality, redact_pii


@dataclass
class CurationConfig:
    min_words: int = 5
    max_top_word_frac: float = 0.5      # repetition gate
    min_alpha_word_frac: float = 0.5    # symbol-soup gate
    max_dup_line_frac: float = 0.5
    near_dup_method: str = "minhash"
    near_dup_kwargs: dict = field(default_factory=lambda: {"threshold": 0.7})
    redact: bool = True
    holdout_frac: float = 0.01
    split_salt: str = "curation-split"


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    config: CurationConfig | None = None,
) -> tuple[DataFrame, dict]:
    """documents (doc_id, text, ...) -> curated training table + funnel.

    Output columns: the input columns (text replaced by the redacted text
    when ``config.redact``), plus ``split`` ('train' | 'holdout').
    """
    cfg = config or CurationConfig()
    funnel: dict = {"input": docs.count()}

    # each survivor set is persisted and the stage count materializes it:
    # without this, every downstream funnel count (and the caller's first
    # action on the result) would re-run the whole upstream funnel —
    # gopher shuffle, dedup, and the MinHash sweep — from raw documents.
    # Intermediates unpersist as soon as the next stage is materialized;
    # the FINAL survivor set stays cached so materializing the returned
    # frame reads it (write the result, then let it age out or unpersist).
    cached: list[DataFrame] = []

    def _stage(df: DataFrame, label: str) -> DataFrame:
        df = df.persist()
        funnel[label] = df.count()
        if cached:
            cached.pop().unpersist()
        cached.append(df)
        return df

    # 1. quality gate — map-side signals, drops junk before any shuffle
    q = gopher_quality(docs)
    keep_q = q.where(
        (F.col("n_words") >= cfg.min_words)
        & (F.col("top_word_frac") <= cfg.max_top_word_frac)
        & (F.col("frac_alpha_words") >= cfg.min_alpha_word_frac)
        & (F.col("frac_dup_lines") <= cfg.max_dup_line_frac)
    ).select("doc_id")
    d = _stage(docs.join(keep_q, "doc_id", "left_semi"), "after_quality")

    # 2. exact dedup — keep the canonical (min doc_id) copy
    ex = exact_dedup(d)
    d = _stage(
        d.join(
            ex.where(F.col("doc_id") == F.col("keep_id")).select("doc_id"),
            "doc_id", "left_semi",
        ),
        "after_exact_dedup",
    )

    # 3. near-dup closure — keep one doc per connected near-dup cluster
    nd = near_dup_clusters(d, method=cfg.near_dup_method, **cfg.near_dup_kwargs)
    d = _stage(
        d.join(
            nd.where(F.col("doc_id") == F.col("keep_id")).select("doc_id"),
            "doc_id", "left_semi",
        ),
        "after_near_dup",
    )

    # 4. decontamination — drop anything sharing winnowed fingerprints
    # with the eval set
    if eval_docs is not None:
        dec = decontaminate(d, eval_docs)
        d = _stage(
            d.join(
                dec.where(~F.col("contaminated")).select("doc_id"),
                "doc_id", "left_semi",
            ),
            "after_decontaminate",
        )

    # 5. PII redaction — map-only text rewrite, row count unchanged
    if cfg.redact:
        red = redact_pii(d)
        other_cols = [c for c in d.columns if c != "text"]
        d = d.select(*other_cols).join(
            red.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        )

    # 6. deterministic split — decontamination-stable across reruns
    out = split_train_holdout(
        d, holdout_frac=cfg.holdout_frac, salt=cfg.split_salt
    )
    funnel["holdout"] = out.where(F.col("split") == "holdout").count()
    funnel["train"] = funnel[
        "after_decontaminate" if eval_docs is not None else "after_near_dup"
    ] - funnel["holdout"]
    return out, funnel
