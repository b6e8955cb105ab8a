"""Stage 4 — pairwise features, prefilters, and classifier scoring.

One Iterator-of-batches Arrow pass computes, per candidate pair, the
reference's 18 features (config order, /root/reference/config.yml:69-117 +
/root/reference/src/parallel_features.py:101-141):

    {person,title,provision,subjects,composite}_cosine   (string-estimated!)
    person_levenshtein, person_jaro_winkler               (token_sort_ratio!)
    six harmonic means, person_subjects_product, composite_subjects_ratio
    birth_year_match, death_year_match, has_birth_death_years

plus the three prefilters (P10-P12, parallel_features.py:1044-1110) that
short-circuit the classifier: exact-name-with-years -> auto-true, composite
equality -> auto-true, person Levenshtein-sim < 0.3 -> auto-false.
Prefiltered-true pairs enter clustering with weight 1.0
(/root/reference/src/clustering.py:261-281).

Scale notes (round-2 plan shape):
- person Levenshtein + the P12 prefilter are built-in JVM expressions
  (whole-stage codegen) computed in ``with_pair_key``.
- the ONLY Python kernels left are token_sort_ratio over *globally distinct*
  canonical string pairs per field (``tsr_table``) and year extraction over
  *distinct person strings* (``years_table``) — tiny dimension tables joined
  back onto pairs. Python work scales with unique field-value variants, not
  pair count.
- feature assembly, all three prefilters, and the z-scored LR sigmoid are
  pure JVM column expressions (``feature_columns`` / ``score``); the trained
  model's 18 weights are inlined as literals.
- callers additionally dedupe pairs to distinct field-hash tuples and
  hash-join scores back (pipeline.build_scores) — two nested levels of
  "compute once per distinct value".
- ``compute_features_row`` / ``_features_batch`` are retained as the
  reference row-wise / vectorized-batch implementations; pytest fuzzes all
  three paths against each other.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions.similarity import (
    harmonic_mean,
    indel_ratio,
    levenshtein_sim,
    ratio_capped,
)
from ..functions.years import extract_birth_death_years
from .classify import LRModel

FIELDS = ["composite", "person", "title", "provision", "subjects"]

FEATURE_NAMES = [
    "person_cosine",
    "title_cosine",
    "provision_cosine",
    "subjects_cosine",
    "composite_cosine",
    "person_levenshtein",
    "person_jaro_winkler",
    "person_title_harmonic",
    "person_provision_harmonic",
    "person_subjects_harmonic",
    "title_subjects_harmonic",
    "title_provision_harmonic",
    "provision_subjects_harmonic",
    "person_subjects_product",
    "composite_subjects_ratio",
    "birth_year_match",
    "death_year_match",
    "has_birth_death_years",
]

_HARMONIC_PAIRS = [
    ("person", "title"),
    ("person", "provision"),
    ("person", "subjects"),
    ("title", "subjects"),
    ("title", "provision"),
    ("provision", "subjects"),
]

# Columns shipped through Arrow to the scoring kernel: both sides' strings,
# JVM-precomputed equality flags, plus two JVM-precomputed hot-path values:
# ``person_lev`` (built-in codegen'd levenshtein — the round-1 throughput
# ceiling was this kernel in Python) and ``pf_false`` (the P12 dissimilarity
# prefilter, derived from person_lev). Hash columns stay JVM-side (they are
# 39-char decimal strings; shipping them halved Arrow-pipe throughput).
PAIR_SIDE_COLS = (
    [f + "1" for f in FIELDS]
    + [f + "2" for f in FIELDS]
    + [f + "_eq" for f in FIELDS]
    + ["person_lev", "pf_false"]
)


class _BatchMemo:
    """Per-partition caches for year extraction and string-pair similarities.

    Strings repeat across pairs far more than pairs repeat, so everything
    derivable from one string (years, token-sorted form, LCS char masks) is
    memoized per string and everything pairwise per unordered pair.
    """

    def __init__(self):
        self.years: dict[str, tuple] = {}
        self.lev: dict[tuple, float] = {}
        self.tsr: dict[tuple, float] = {}
        self.sorted_form: dict[str, str] = {}
        self.masks: dict[str, dict] = {}

    def get_years(self, s: str):
        y = self.years.get(s)
        if y is None:
            y = extract_birth_death_years(s)
            self.years[s] = y
        return y

    def get_lev(self, s1: str, s2: str) -> float:
        k = (s1, s2) if s1 <= s2 else (s2, s1)
        v = self.lev.get(k)
        if v is None:
            v = levenshtein_sim(s1, s2)
            self.lev[k] = v
        return v

    def _sorted(self, s: str) -> str:
        t = self.sorted_form.get(s)
        if t is None:
            t = " ".join(sorted(s.split()))
            self.sorted_form[s] = t
        return t

    def get_tsr(self, s1: str, s2: str) -> float:
        k = (s1, s2) if s1 <= s2 else (s2, s1)
        v = self.tsr.get(k)
        if v is None:
            # token_sort_ratio = indel ratio of the token-sorted forms
            t1, t2 = self._sorted(s1), self._sorted(s2)
            if t1 == t2:
                v = 1.0
            else:
                v = indel_ratio(t1, t2, mask_cache=self.masks)
            self.tsr[k] = v
        return v

    def bulk_tsr(self, items) -> None:
        """Pre-fill the tsr memo for many (s1, s2) pairs at once.

        Misses route through the numpy-batched LCS kernel
        (similarity.lcs_lens_batch) instead of one scalar bigint loop per
        pair — value-identical (ratio computed from the same integer LCS
        with the same float expression), ~3x faster at the distinct-pair
        volumes the scoring kernel sees. Token-sorted forms are deduped
        (LCS and the length sum are symmetric, so the canonical
        orientation shares work without changing the value).
        """
        from ..functions.similarity import lcs_lens_batch

        miss: dict = {}
        for s1, s2 in items:
            k = (s1, s2) if s1 <= s2 else (s2, s1)
            if k not in self.tsr and k not in miss:
                miss[k] = None
        if not miss:
            return
        tasks: dict = {}
        key_tp = []
        for k in miss:
            t1, t2 = self._sorted(k[0]), self._sorted(k[1])
            tp = (t1, t2) if t1 <= t2 else (t2, t1)
            key_tp.append((k, tp))
            if tp not in tasks:
                tasks[tp] = 1.0 if t1 == t2 else None
        todo = [tp for tp, v in tasks.items() if v is None]
        if todo:
            lens = lcs_lens_batch(todo, mask_cache=self.masks)
            for tp, lcs in zip(todo, lens.tolist()):
                lensum = len(tp[0]) + len(tp[1])
                tasks[tp] = (
                    1.0 if lensum == 0
                    else 1.0 - (lensum - 2 * lcs) / lensum
                )
        for k, tp in key_tp:
            self.tsr[k] = tasks[tp]


def compute_features_row(row: dict, memo: _BatchMemo) -> tuple[list[float], str | None]:
    """(18 features, prefilter in {'true','false',None}) for one pair.

    Reference row-wise implementation (semantics of
    _construct_feature_vector + _apply_prefilters): features only computed
    when both sides present; else 0.0. The production path is the vectorized
    ``_features_batch`` below — tests fuzz the two against each other.

    ``row`` may carry JVM-precomputed ``person_lev``; if absent it is derived
    here (hash-equal pairs short-circuit to 1.0 — the reference compares the
    single shared unique_strings representative for both sides).
    """
    fv = [0.0] * len(FEATURE_NAMES)
    idx = {n: i for i, n in enumerate(FEATURE_NAMES)}

    p1, p2 = row["person1"], row["person2"]

    def person_lev() -> float:
        v = row.get("person_lev")
        if v is not None and not (isinstance(v, float) and np.isnan(v)):
            return float(v)
        if row["person_eq"]:
            return 1.0
        return memo.get_lev(p1, p2)

    # --- prefilters (ordered exactly as the reference) ---
    # equality flags are hash equality (case/ws-insensitive) computed JVM-side
    prefilter = None
    if row["person_eq"] and p1 is not None:
        b, d = memo.get_years(p1)
        if b is not None or d is not None:
            prefilter = "true"
    if prefilter is None and row["composite_eq"]:
        prefilter = "true"
    if prefilter is None and p1 is not None and p2 is not None:
        max_len = max(len(p1), len(p2))
        if max_len == 0 or person_lev() < 0.3:
            prefilter = "false"

    # --- person string similarities ---
    if p1 is not None and p2 is not None:
        fv[idx["person_levenshtein"]] = person_lev()
        fv[idx["person_jaro_winkler"]] = 1.0 if row["person_eq"] else memo.get_tsr(p1, p2)

    # --- birth/death year features ---
    if p1 is not None and p2 is not None:
        b1, d1 = memo.get_years(p1)
        b2, d2 = memo.get_years(p2)
        fv[idx["birth_year_match"]] = 1.0 if (b1 is not None and b2 is not None and b1 == b2) else 0.0
        fv[idx["death_year_match"]] = 1.0 if (d1 is not None and d2 is not None and d1 == d2) else 0.0
        has_years = (b1 is not None or d1 is not None) and (b2 is not None or d2 is not None)
        fv[idx["has_birth_death_years"]] = 1.0 if has_years else 0.0

    # --- string-estimated "cosine" per field ---
    sims: dict[str, float] = {}
    for f in ["person", "title", "provision", "subjects", "composite"]:
        s1, s2 = row[f + "1"], row[f + "2"]
        if s1 is None or s2 is None:
            continue
        if row[f + "_eq"]:
            sim = 1.0
        elif f == "person":
            sim = person_lev()
        else:
            sim = memo.get_tsr(s1, s2)
        sims[f] = sim
        fv[idx[f + "_cosine"]] = sim

    # --- interactions ---
    for f1, f2 in _HARMONIC_PAIRS:
        if f1 in sims and f2 in sims:
            fv[idx[f"{f1}_{f2}_harmonic"]] = harmonic_mean(sims[f1], sims[f2])
    if "person" in sims and "subjects" in sims:
        fv[idx["person_subjects_product"]] = sims["person"] * sims["subjects"]
    if "composite" in sims and "subjects" in sims:
        fv[idx["composite_subjects_ratio"]] = ratio_capped(sims["composite"], sims["subjects"])

    return fv, prefilter


_IDX = {n: i for i, n in enumerate(FEATURE_NAMES)}


def _obj_col(pdf: pd.DataFrame, c: str) -> tuple[np.ndarray, np.ndarray]:
    """(object ndarray with NaN normalized to None, not-null mask) — the
    mask rides along so callers never re-scan the object array per row."""
    s = pdf[c]
    a = s.to_numpy(dtype=object, copy=True)
    na = s.isna().to_numpy()
    if na.any():
        a[na] = None
    return a, ~na


def _pair_sim_gather(
    s1: np.ndarray, s2: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, int, list]:
    """Group the (s1[i], s2[i]) rows of ``idx`` by DISTINCT unordered pair.

    Returns (inv, unique_pair_count, unique_pairs) where ``unique_pairs``
    is a list of (a, b) tuples and ``inv`` maps each idx row to its pair's
    position — so a similarity computed once per distinct pair scatters
    back with one fancy index instead of a dict lookup per row.
    pd.factorize + integer pair codes do the dedup at C speed.
    """
    m = idx.size
    alls = np.empty(2 * m, dtype=object)
    alls[:m] = s1[idx]
    alls[m:] = s2[idx]
    codes, uniq = pd.factorize(alls)
    ca, cb = codes[:m], codes[m:]
    lo = np.minimum(ca, cb).astype(np.int64)
    hi = np.maximum(ca, cb).astype(np.int64)
    up, inv = np.unique((lo << 32) | hi, return_inverse=True)
    ua = uniq[(up >> 32).astype(np.intp)]
    ub = uniq[(up & 0xFFFFFFFF).astype(np.intp)]
    return inv, len(up), list(zip(ua.tolist(), ub.tolist()))


def _features_batch(pdf: pd.DataFrame, memo: _BatchMemo) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized feature assembly: numpy masks + per-*unique* Python kernels.

    The only row loops left run over rows that genuinely need a Python
    similarity (non-hash-equal pairs) or a year extraction, and each call is
    a memo-dict hit after the first occurrence of a string (pair).
    """
    n = len(pdf)
    X = np.zeros((n, len(FEATURE_NAMES)))

    cols = {c: _obj_col(pdf, c) for f in FIELDS for c in (f + "1", f + "2")}
    strs = {c: v[0] for c, v in cols.items()}
    notna = {c: v[1] for c, v in cols.items()}
    eq = {f: pdf[f + "_eq"].fillna(False).to_numpy(dtype=bool) for f in FIELDS}
    plev = pd.to_numeric(pdf["person_lev"], errors="coerce").to_numpy(dtype=np.float64)
    pf_false = pdf["pf_false"].fillna(False).to_numpy(dtype=bool)

    # both-sides-present masks straight from the isna masks _obj_col
    # already computed (the former per-row generator scans re-walked every
    # object array)
    present = {f: notna[f + "1"] & notna[f + "2"] for f in FIELDS}

    # --- per-field similarity (the f_cosine features) ---
    # Every miss row is grouped by DISTINCT unordered string pair first
    # (_pair_sim_gather: factorize + integer pair codes, C speed); the tsr
    # memo is bulk-filled through the numpy-batched LCS kernel once per
    # batch, then each field's values gather back with ONE fancy index.
    # The former code did a memoized-dict call PER ROW (~4 per pair row —
    # the second-largest kernel cost after the LCS itself).
    gathers = {}
    bulk_items = []
    for f in FIELDS:
        if f == "person":
            continue
        need = np.flatnonzero(present[f] & ~eq[f])
        if need.size:
            inv, _, upairs = _pair_sim_gather(strs[f + "1"], strs[f + "2"], need)
            gathers[f] = (need, inv, upairs)
            bulk_items.extend(upairs)
    pp = present["person"]
    need_p = np.flatnonzero(pp & ~eq["person"])
    if need_p.size:
        inv, _, upairs = _pair_sim_gather(strs["person1"], strs["person2"], need_p)
        gathers["person"] = (need_p, inv, upairs)
        bulk_items.extend(upairs)
    memo.bulk_tsr(bulk_items)

    sims = {}
    for f in FIELDS:
        sim = np.zeros(n)
        if f == "person":
            # JVM-precomputed (eq-pairs already short-circuited to 1.0)
            sim = np.where(np.isnan(plev), 0.0, plev)
        else:
            sim[eq[f] & present[f]] = 1.0
            if f in gathers:
                need, inv, upairs = gathers[f]
                vals = np.fromiter(
                    (memo.get_tsr(a, b) for a, b in upairs),
                    dtype=np.float64,
                    count=len(upairs),
                )
                sim[need] = vals[inv]
        sims[f] = sim
        X[:, _IDX[f + "_cosine"]] = sim

    X[:, _IDX["person_levenshtein"]] = sims["person"]

    # person_jaro_winkler: 1.0 on hash equality, else token_sort_ratio
    pjw = np.zeros(n)
    pjw[eq["person"] & pp] = 1.0
    if "person" in gathers:
        need, inv, upairs = gathers["person"]
        vals = np.fromiter(
            (memo.get_tsr(a, b) for a, b in upairs),
            dtype=np.float64,
            count=len(upairs),
        )
        pjw[need] = vals[inv]
    X[:, _IDX["person_jaro_winkler"]] = pjw

    # --- birth/death years: one extraction per DISTINCT person string
    # (factorize), scattered back by code — not two memo calls per row ---
    by1 = np.full(n, np.nan)
    dy1 = np.full(n, np.nan)
    by2 = np.full(n, np.nan)
    dy2 = np.full(n, np.nan)
    has1 = np.zeros(n, dtype=bool)
    has2 = np.zeros(n, dtype=bool)
    p_rows = np.flatnonzero(pp)
    if p_rows.size:
        m = p_rows.size
        alls = np.empty(2 * m, dtype=object)
        alls[:m] = strs["person1"][p_rows]
        alls[m:] = strs["person2"][p_rows]
        codes, uniq = pd.factorize(alls)
        ub = np.full(len(uniq), np.nan)
        ud = np.full(len(uniq), np.nan)
        for j, s in enumerate(uniq.tolist()):
            b, d = memo.get_years(s)
            if b is not None:
                ub[j] = b
            if d is not None:
                ud[j] = d
        uhas = ~np.isnan(ub) | ~np.isnan(ud)
        c1, c2 = codes[:m], codes[m:]
        by1[p_rows] = ub[c1]
        dy1[p_rows] = ud[c1]
        by2[p_rows] = ub[c2]
        dy2[p_rows] = ud[c2]
        has1[p_rows] = uhas[c1]
        has2[p_rows] = uhas[c2]
    X[:, _IDX["birth_year_match"]] = (~np.isnan(by1) & ~np.isnan(by2) & (by1 == by2)).astype(float)
    X[:, _IDX["death_year_match"]] = (~np.isnan(dy1) & ~np.isnan(dy2) & (dy1 == dy2)).astype(float)
    X[:, _IDX["has_birth_death_years"]] = (has1 & has2).astype(float)

    # --- interactions (sims are 0.0 when a side is missing, matching the
    # row-wise semantics: harmonic/product/ratio all collapse to 0.0) ---
    for f1, f2 in _HARMONIC_PAIRS:
        a, b = sims[f1], sims[f2]
        both = (a > 0) & (b > 0)
        h = np.zeros(n)
        np.divide(2.0 * a * b, a + b, out=h, where=both)
        X[:, _IDX[f"{f1}_{f2}_harmonic"]] = h
    X[:, _IDX["person_subjects_product"]] = np.where(
        present["person"] & present["subjects"], sims["person"] * sims["subjects"], 0.0
    )
    ratio = np.zeros(n)
    np.divide(sims["composite"], sims["subjects"], out=ratio, where=sims["subjects"] > 0)
    X[:, _IDX["composite_subjects_ratio"]] = np.where(
        present["composite"] & present["subjects"], np.minimum(ratio, 10.0), 0.0
    )

    # --- prefilters, in reference order (P10 -> P11 -> P12) ---
    pref = np.full(n, None, dtype=object)
    # person_eq implies both persons present; years come from side 1 (P10)
    p10 = eq["person"] & pp & has1
    pref[p10] = "true"
    undecided = pref == None  # noqa: E711 (elementwise)
    pref[undecided & eq["composite"]] = "true"
    undecided = pref == None  # noqa: E711
    pref[undecided & pf_false] = "false"
    return X, pref


FEATURIZE_SCHEMA = StructType(
    [
        StructField("pair_key", StringType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("prefilter", StringType()),
    ]
)

SCORE_SCHEMA = StructType(
    [
        StructField("pair_key", StringType()),
        StructField("confidence", DoubleType()),
        StructField("prefilter", StringType()),
    ]
)


def with_pair_key(df: DataFrame) -> DataFrame:
    """Single join key over the 10-field-hash tuple + JVM equality flags.

    The eq flags keep the 39-char decimal hash strings out of the Arrow
    transfer to the scoring kernel (they exist only for equality tests).
    """
    out = df.withColumn(
        "pair_key",
        F.sha1(
            F.concat_ws(
                "",
                *[F.coalesce(F.col(f + "_h1"), F.lit("NULL")) for f in FIELDS],
                *[F.coalesce(F.col(f + "_h2"), F.lit("NULL")) for f in FIELDS],
            )
        ),
    )
    for f in FIELDS:
        out = out.withColumn(
            f + "_eq",
            F.coalesce(F.col(f + "_h1") == F.col(f + "_h2"), F.lit(False)),
        )
    # person Levenshtein similarity JVM-side (whole-stage codegen) — the
    # heaviest round-1 Python kernel. person_eq short-circuits to 1.0: the
    # reference looks both sides up from unique_strings by normalized hash,
    # so hash-equal pairs compare one shared representative (sim 1.0).
    p1, p2 = F.col("person1"), F.col("person2")
    max_len = F.greatest(F.length(p1), F.length(p2))
    lev_sim = F.when(F.col("person_eq"), F.lit(1.0)).otherwise(
        F.when(max_len == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.levenshtein(p1, p2).cast("double") / max_len.cast("double")
        )
    )
    out = out.withColumn(
        "person_lev",
        F.when(p1.isNotNull() & p2.isNotNull(), lev_sim).otherwise(
            F.lit(None).cast("double")
        ),
    )
    # P12 person-dissimilarity auto-FALSE (parallel_features.py:1044-1110):
    # both sides present and (max_len == 0 or lev < 0.3)
    out = out.withColumn(
        "pf_false",
        F.when(
            p1.isNotNull() & p2.isNotNull(),
            (max_len == 0) | (F.col("person_lev") < 0.3),
        ).otherwise(F.lit(False)),
    )
    # the 39-char hash strings exist only to derive pair_key + eq flags:
    # nothing downstream reads them, and leaving them in made every
    # materialized pair_fields table (and its re-read) carry ~20 dead
    # string columns per row
    return out.drop(*[f + "_h1" for f in FIELDS], *[f + "_h2" for f in FIELDS])


_TSR_SCHEMA = StructType(
    [
        StructField("s1", StringType()),
        StructField("s2", StringType()),
        StructField("tsr_sim", DoubleType()),
    ]
)


def tsr_table(pairs: DataFrame) -> DataFrame:
    """distinct canonical (s1 <= s2) string pairs -> token_sort_ratio.

    THE remaining Python kernel of the scoring path. Because it runs over
    *globally distinct* string pairs (not per pair row, not per Arrow
    batch), Python work scales with the number of unique field-value
    variants in the corpus — at 100 TB that is orders of magnitude below
    the pair count. Everything downstream is JVM expressions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo = _BatchMemo()
        for pdf in batches:
            s1 = pdf["s1"].to_numpy(dtype=object)
            s2 = pdf["s2"].to_numpy(dtype=object)
            yield pd.DataFrame(
                {
                    "s1": pdf["s1"],
                    "s2": pdf["s2"],
                    "tsr_sim": [memo.get_tsr(a, b) for a, b in zip(s1, s2)],
                }
            )

    return pairs.mapInPandas(run, schema=_TSR_SCHEMA)


_YEARS_SCHEMA = StructType(
    [
        StructField("p", StringType()),
        StructField("birth_y", DoubleType()),
        StructField("death_y", DoubleType()),
        StructField("has_years", DoubleType()),
    ]
)


def years_table(persons: DataFrame) -> DataFrame:
    """distinct person strings -> (birth, death, has_years) via the
    15-pattern regex ladder (F9) — one Arrow pass over unique values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo = _BatchMemo()
        for pdf in batches:
            ps = pdf["p"].to_numpy(dtype=object)
            ys = [memo.get_years(s) for s in ps]
            yield pd.DataFrame(
                {
                    "p": pdf["p"],
                    "birth_y": [float(b) if b is not None else np.nan for b, _ in ys],
                    "death_y": [float(d) if d is not None else np.nan for _, d in ys],
                    "has_years": [
                        1.0 if (b is not None or d is not None) else 0.0 for b, d in ys
                    ],
                }
            )

    return persons.mapInPandas(run, schema=_YEARS_SCHEMA)


def _attach_sim_dims(src: DataFrame) -> DataFrame:
    """Join the per-field tsr dimension tables + the person years dimension
    onto the pair rows. Dims are tiny relative to pairs (distinct variants),
    so Catalyst broadcasts them at test scale; at 100 TB they become
    dim-side shuffle joins — still pairs-dominated."""
    out = src
    for f in FIELDS:
        if f == "person":
            continue  # person uses JVM levenshtein (person_lev)
        s1, s2 = F.col(f + "1"), F.col(f + "2")
        need = src.where(s1.isNotNull() & s2.isNotNull() & ~F.col(f + "_eq")).select(
            F.least(s1, s2).alias("s1"), F.greatest(s1, s2).alias("s2")
        ).distinct()
        dim = tsr_table(need).withColumnsRenamed({"tsr_sim": f + "_tsr"})
        out = out.join(
            dim,
            (F.least(F.col(f + "1"), F.col(f + "2")) == F.col("s1"))
            & (F.greatest(F.col(f + "1"), F.col(f + "2")) == F.col("s2")),
            "left",
        ).drop("s1", "s2")
    # person_jaro_winkler needs person tsr for non-eq pairs
    p1, p2 = F.col("person1"), F.col("person2")
    pneed = src.where(p1.isNotNull() & p2.isNotNull() & ~F.col("person_eq")).select(
        F.least(p1, p2).alias("s1"), F.greatest(p1, p2).alias("s2")
    ).distinct()
    pdim = tsr_table(pneed).withColumnsRenamed({"tsr_sim": "person_tsr"})
    out = out.join(
        pdim,
        (F.least(p1, p2) == F.col("s1")) & (F.greatest(p1, p2) == F.col("s2")),
        "left",
    ).drop("s1", "s2")
    # years: one dim, joined for each side
    persons = (
        src.select(p1.alias("p")).where(p1.isNotNull())
        .unionByName(src.select(p2.alias("p")).where(p2.isNotNull()))
        .distinct()
    )
    ydim = years_table(persons)
    y1 = ydim.select(
        F.col("p").alias("person1"), F.col("birth_y").alias("by1"),
        F.col("death_y").alias("dy1"), F.col("has_years").alias("hy1"),
    )
    y2 = ydim.select(
        F.col("p").alias("person2"), F.col("birth_y").alias("by2"),
        F.col("death_y").alias("dy2"), F.col("has_years").alias("hy2"),
    )
    return out.join(y1, "person1", "left").join(y2, "person2", "left")


def feature_columns() -> dict[str, Column]:
    """The 18 features + prefilter as JVM column expressions over a pair row
    that carries eq flags, person_lev/pf_false, the joined *_tsr sims and
    the joined year columns. Semantics identical to compute_features_row
    (pytest fuzzes the two against each other)."""
    sims: dict[str, Column] = {}
    for f in FIELDS:
        s1, s2 = F.col(f + "1"), F.col(f + "2")
        if f == "person":
            sims[f] = F.coalesce(F.col("person_lev"), F.lit(0.0))
        else:
            sims[f] = (
                F.when(F.col(f + "_eq"), 1.0)
                .when(s1.isNotNull() & s2.isNotNull(), F.coalesce(F.col(f + "_tsr"), F.lit(0.0)))
                .otherwise(0.0)
            )
    cols: dict[str, Column] = {}
    for f in FIELDS:
        cols[f + "_cosine"] = sims[f]
    cols["person_levenshtein"] = sims["person"]
    p1, p2 = F.col("person1"), F.col("person2")
    cols["person_jaro_winkler"] = (
        F.when(F.col("person_eq"), 1.0)
        .when(p1.isNotNull() & p2.isNotNull(), F.coalesce(F.col("person_tsr"), F.lit(0.0)))
        .otherwise(0.0)
    )
    for f1, f2 in _HARMONIC_PAIRS:
        a, b = sims[f1], sims[f2]
        cols[f"{f1}_{f2}_harmonic"] = F.when((a > 0) & (b > 0), 2.0 * a * b / (a + b)).otherwise(0.0)
    cols["person_subjects_product"] = sims["person"] * sims["subjects"]
    cols["composite_subjects_ratio"] = F.when(
        sims["subjects"] > 0, F.least(sims["composite"] / sims["subjects"], F.lit(10.0))
    ).otherwise(0.0)
    both_p = p1.isNotNull() & p2.isNotNull()
    cols["birth_year_match"] = F.when(
        both_p & F.col("by1").isNotNull() & (F.col("by1") == F.col("by2")), 1.0
    ).otherwise(0.0)
    cols["death_year_match"] = F.when(
        both_p & F.col("dy1").isNotNull() & (F.col("dy1") == F.col("dy2")), 1.0
    ).otherwise(0.0)
    cols["has_birth_death_years"] = F.when(
        both_p & (F.coalesce(F.col("hy1"), F.lit(0.0)) > 0)
        & (F.coalesce(F.col("hy2"), F.lit(0.0)) > 0),
        1.0,
    ).otherwise(0.0)
    return cols


def prefilter_column() -> Column:
    """P10 -> P11 -> P12, in reference order, as one JVM expression."""
    return (
        F.when(F.col("person_eq") & (F.coalesce(F.col("hy1"), F.lit(0.0)) > 0), "true")
        .when(F.col("composite_eq"), "true")
        .when(F.col("pf_false"), "false")
        .otherwise(F.lit(None).cast("string"))
    )


def featurize(df: DataFrame, strategy: str | None = None) -> DataFrame:
    """pairs-with-fields -> (pair_key, features array, prefilter).

    Same two strategies as ``score`` (value-identical, pytest-pinned):
    ``dims`` joins per-field distinct-string-pair sim dimensions and
    assembles in JVM; ``arrow`` is one mapInPandas pass (default — fewer
    shuffles, and the training sets this feeds are small)."""
    strategy = strategy or os.environ.get("SPARK_GRAFT_SCORE_STRATEGY", "arrow")
    if strategy == "dims":
        src = df.select("pair_key", *PAIR_SIDE_COLS)
        wide = _attach_sim_dims(src)
        cols = feature_columns()
        feats = F.array(*[cols[n].cast("double") for n in FEATURE_NAMES])
        return wide.select(
            "pair_key", feats.alias("features"), prefilter_column().alias("prefilter")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo = _BatchMemo()
        for pdf in batches:
            X, pref = _features_batch(pdf, memo)
            yield pd.DataFrame(
                {"pair_key": pdf["pair_key"], "features": list(X), "prefilter": pref}
            )

    src = df.select("pair_key", *PAIR_SIDE_COLS)
    return src.mapInPandas(run, schema=FEATURIZE_SCHEMA)


def score_dims(
    df: DataFrame, model_dict: dict, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Dim-table strategy: Python kernels over globally-distinct string
    pairs, everything else JVM (see module docstring)."""
    model = LRModel.from_dict(model_dict)
    src = df.select("pair_key", *passthrough, *PAIR_SIDE_COLS)
    wide = _attach_sim_dims(src)
    cols = feature_columns()
    z = F.lit(float(model.intercept))
    for i, name in enumerate(FEATURE_NAMES):
        w = float(model.weights[i])
        mu = float(model.means[i])
        sd = float(model.stds[i]) or 1.0
        z = z + F.lit(w) * ((cols[name].cast("double") - F.lit(mu)) / F.lit(sd))
    pref = prefilter_column()
    conf = (
        F.when(pref == "true", 1.0)
        .when(pref == "false", 0.0)
        .otherwise(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    )
    return wide.select(
        "pair_key", *passthrough, conf.alias("confidence"), pref.alias("prefilter")
    )


def score_arrow(
    df: DataFrame, model_dict: dict, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Arrow-batch strategy: one mapInPandas pass over pair rows using the
    vectorized batch kernel (per-partition memo dicts dedupe string work).
    No extra shuffles/joins — wins when the distinct string-pair dims are
    NOT much smaller than the pair rows themselves.

    ``passthrough`` string columns (e.g. url1/url2) ride through the Arrow
    pass so low-dup-ratio callers can skip the dedup + join-back entirely.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = LRModel.from_dict(model_dict)
        memo = _BatchMemo()
        for pdf in batches:
            X, pref = _features_batch(pdf, memo)
            p = model.predict_proba(X)
            conf = np.where(pref == "true", 1.0, np.where(pref == "false", 0.0, p))
            out = {"pair_key": pdf["pair_key"]}
            for c in passthrough:
                out[c] = pdf[c]
            out["confidence"] = conf
            out["prefilter"] = pref
            yield pd.DataFrame(out)

    schema = (
        "pair_key string, "
        + "".join(f"{c} string, " for c in passthrough)
        + "confidence double, prefilter string"
    )
    src = df.select("pair_key", *passthrough, *PAIR_SIDE_COLS)
    return src.mapInPandas(run, schema=schema)


def score(df: DataFrame, model_dict: dict, strategy: str | None = None,
          passthrough: tuple[str, ...] = ()) -> DataFrame:
    """pairs-with-fields -> (pair_key, confidence, prefilter).

    confidence = 1.0 / 0.0 for prefiltered pairs, else sigmoid(LR). Two
    physically different but value-identical plans (pytest pins them to the
    same row-wise reference):

    - ``dims``  : Python only over globally-distinct string pairs; feature
      assembly + sigmoid in JVM. Scales with unique field-value variants —
      the 100 TB shape when variants << pairs.
    - ``arrow`` : single mapInPandas pass, per-partition memo dedupe. Fewer
      shuffles; wins when pair rows are already near-distinct (measured
      faster at bench scale, see BENCH/BASELINE.md round-2 A/B).
    """
    strategy = strategy or os.environ.get("SPARK_GRAFT_SCORE_STRATEGY", "arrow")
    if strategy == "dims":
        return score_dims(df, model_dict, passthrough=passthrough)
    return score_arrow(df, model_dict, passthrough=passthrough)


def attach_pair_fields(pairs: DataFrame, records: DataFrame) -> DataFrame:
    """(url1, url2) x records^2 -> wide pair rows with both sides' fields.

    Two hash joins against the record table (J4); record side is the smaller
    relation, so at 100 TB this is a shuffle join on url with AQE; at test
    scale Catalyst broadcasts it.
    """
    side_cols = ["url"] + FIELDS + [f + "_h" for f in FIELDS]
    r1 = records.select(
        *[F.col(c).alias(c + "1" if c != "url" else "url1") for c in side_cols]
    )
    r1 = r1.select("url1", *[F.col(f + "1").alias(f + "1") for f in FIELDS],
                   *[F.col(f + "_h1").alias(f + "_h1") for f in FIELDS])
    r2 = records.select(
        *[F.col(c).alias(c + "2" if c != "url" else "url2") for c in side_cols]
    )
    r2 = r2.select("url2", *[F.col(f + "2").alias(f + "2") for f in FIELDS],
                   *[F.col(f + "_h2").alias(f + "_h2") for f in FIELDS])
    return pairs.join(r1, "url1").join(r2, "url2")
