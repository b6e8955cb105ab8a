"""Text normalization and analysis kernels.

``normalize_text`` carries the byte-identical-text-per-url invariant
(reference semantics: /root/reference/src/batch_preprocessing.py:431-448 —
``str(x).strip()`` then ``re.sub(r'\\s+', ' ', ...)`` with *Python* ``re``
whitespace classes, which differ from Java regex on some unicode spaces; that
is why the Spark-side wrapper is a pandas UDF using this function rather than
``regexp_replace``).

Also hosts the training-data text-analysis kernels (language-ID heuristic,
quality scores, token counting, rolling-hash fingerprints) used by
``operators/textstats.py``.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")

# BPE-ish pretokenizer: word pieces, numbers, or single non-space symbols
# (a simplified public GPT-2-style pattern using only `re`-supported classes).
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_PUNCT_RE = re.compile(r"[^\w\s]")

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": {
        "the", "of", "and", "to", "a", "in", "is", "it", "that", "for",
        "was", "on", "are", "as", "with", "his", "they", "at", "be", "this",
    },
    "fr": {
        "le", "la", "les", "de", "des", "un", "une", "et", "est", "que",
        "dans", "pour", "sur", "avec", "pas", "au", "ce", "il", "elle", "du",
    },
    "de": {
        "der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit",
        "sich", "auf", "nicht", "ein", "eine", "als", "auch", "es", "an", "im",
    },
    "es": {
        "el", "la", "los", "las", "de", "y", "en", "que", "es", "un",
        "una", "por", "con", "no", "para", "se", "del", "su", "al", "lo",
    },
}


def normalize_text(text: object) -> str:
    """Reference-exact normalization: strip + collapse ``\\s+`` to one space."""
    if text is None:
        return ""
    if not isinstance(text, str):
        text = str(text)
    normalized = text.strip()
    normalized = _WS_RE.sub(" ", normalized)
    return normalized


def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokens of normalized text."""
    t = normalize_text(text)
    return t.split(" ") if t else []


def tokenize_bpeish(text: str) -> list[str]:
    """BPE-ish regex pretokenization (letters / digits / single symbols)."""
    if not text:
        return []
    return _BPE_RE.findall(text)


def detect_language(text: str) -> str:
    """Stopword-ratio language heuristic. Returns ISO code or 'und'."""
    tokens = [t.lower() for t in tokenize_ws(text)]
    if not tokens:
        return "und"
    best_lang = "und"
    best_hits = 0
    # iterate in sorted lang order with strict > so ties keep the first
    # (lexicographically smallest) language — same tie-break as the JVM
    # operator in operators/textstats.py (which counts distinct stopword
    # *types*; this counts occurrences — that divergence stays documented).
    for lang, sw in sorted(STOPWORDS.items()):
        hits = sum(1 for t in tokens if t in sw)
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    # require at least 2% stopword coverage to claim a language
    if best_hits / len(tokens) < 0.02:
        return "und"
    return best_lang


def quality_scores(text: str) -> dict:
    """Cheap document-quality signals (length / punct / stopword ratios)."""
    t = normalize_text(text)
    tokens = t.split(" ") if t else []
    n_chars = len(t)
    n_tokens = len(tokens)
    n_punct = len(_PUNCT_RE.findall(t))
    lower = [w.lower() for w in tokens]
    n_stop = sum(1 for w in lower if w in STOPWORDS["en"])
    mean_word_len = (sum(len(w) for w in tokens) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / n_tokens) if n_tokens else 0.0,
        "mean_word_len": mean_word_len,
    }


_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def fingerprint(text: str, window: int = 8) -> int:
    """Deterministic rolling-hash document fingerprint.

    Polynomial rolling hash over whitespace tokens; the fingerprint is the
    minimum window hash (a 1-permutation winnowing sketch). Stable across
    processes (no PYTHONHASHSEED dependence).
    """
    tokens = tokenize_ws(text.lower() if text else "")
    if not tokens:
        return 0
    token_hashes = []
    for tok in tokens:
        h = 0
        for b in tok.encode("utf-8"):
            h = (h * _FP_BASE + b) % _FP_MOD
        token_hashes.append(h + 1)
    if len(token_hashes) <= window:
        windows = [token_hashes]
    else:
        windows = [
            token_hashes[i : i + window]
            for i in range(len(token_hashes) - window + 1)
        ]
    best = None
    for w in windows:
        h = 0
        for x in w:
            h = (h * _FP_BASE + x) % _FP_MOD
        if best is None or h < best:
            best = h
    return best
