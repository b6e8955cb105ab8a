"""Birth/death-year extraction from person-name strings.

Behavioral re-implementation of the reference's ordered 15-pattern chain
(/root/reference/src/birth_death_regexes.py:13-147): first matching pattern
wins; ``_clean_year`` takes the first digit group as int. Also the
year-stripping name normalizer used for the normalized-name blocking key
(same file, :197-225).

Pure Python ``re`` — used from pandas UDFs only (ordered first-match with 15
alternatives is clearer here than a regexp_extract chain, per SURVEY.md §2.7).
"""

from __future__ import annotations

import re

_Y = r"(\d{2,4}(?:\?|\s+or\s+\d{1,4})?)"
_APPROX = r"(?:approximately|ca\.|circa)"
_DASH = r"[-–—]"

# Ordered exactly as the reference builds them (patterns 1..15).
_PATTERNS = [re.compile(p) for p in (
    rf"{_Y}\s*{_DASH}\s*{_APPROX}\s+{_Y}",                       # 1
    rf"{_APPROX}\s+{_Y}\s*{_DASH}\s*{_APPROX}\s+{_Y}",           # 2
    rf"{_APPROX}\s+{_Y}\s*{_DASH}\s*{_Y}",                       # 3
    rf"{_Y}\s*{_DASH}\s*{_Y}",                                   # 4
    rf"{_DASH}\s*{_APPROX}\s+{_Y}",                              # 5
    rf"{_DASH}\s*{_Y}",                                          # 6
    rf"{_APPROX}\s+{_Y}\s*{_DASH}",                              # 7
    rf"{_Y}\s*{_DASH}",                                          # 8
    rf"(?:b\.|born)\s+(?:{_APPROX}\s+)?{_Y}|(?:d\.|died)\s+(?:{_APPROX}\s+)?{_Y}",  # 9
    rf"{_APPROX}\s+{_Y}",                                        # 10
    rf"\(\s*{_Y}\s*{_DASH}\s*{_Y}\s*\)",                         # 11
    rf"\(\s*{_Y}\s*{_DASH}\s*\)",                                # 12
    rf"\(\s*{_DASH}\s*{_Y}\s*\)",                                # 13
    rf"(?:fl\.|floruit)\s+{_Y}\s*{_DASH}\s*{_Y}",                # 14
    rf"(?:fl\.|floruit)\s+{_Y}",                                 # 15
)]

_DIGITS_RE = re.compile(r"\d+")
_PAREN_YEARS_RE = re.compile(r"\(\s*\d{2,4}\s*[-–—]?\s*\d{0,4}\s*\)")
_TRAILING_COMMA_RE = re.compile(r",\s*$")
_WS_RE = re.compile(r"\s+")


def _clean_year(year_str: str | None) -> int | None:
    if not year_str:
        return None
    digits = _DIGITS_RE.findall(year_str)
    if not digits:
        return None
    year = int(digits[0])
    return year if year else None


def extract_birth_death_years(name_string: str | None) -> tuple[int | None, int | None]:
    """First-match-wins extraction over the ordered pattern chain.

    Group handling mirrors the reference exactly, including the quirky
    single-group disambiguation by substring tests on the raw name.
    """
    if not name_string:
        return None, None
    for pattern in _PATTERNS:
        match = pattern.search(name_string)
        if not match:
            continue
        groups = match.groups()
        birth_year = None
        death_year = None
        if len(groups) >= 2 and groups[0] and groups[1]:
            birth_year = _clean_year(groups[0])
            death_year = _clean_year(groups[1])
        elif len(groups) >= 1:
            # The reference always reads groups[0] here — so e.g. "d. 1920"
            # (pattern 9's second alternative, groups=(None, '1920')) yields
            # (None, None). Reproduced deliberately for score parity.
            lower = name_string.lower()
            if "born" in lower or "b." in lower:
                birth_year = _clean_year(groups[0])
            elif "died" in lower or "d." in lower or "-" in name_string:
                death_year = _clean_year(groups[0])
            elif "fl." in lower or "floruit" in lower:
                birth_year = _clean_year(groups[0])
        return birth_year, death_year
    return None, None


def has_years(name_string: str | None) -> bool:
    b, d = extract_birth_death_years(name_string)
    return b is not None or d is not None


def normalize_name(name_string: str | None) -> str:
    """Strip year patterns from a name (blocking-key normalizer)."""
    if not name_string:
        return ""
    normalized = name_string
    for pattern in _PATTERNS:
        normalized = pattern.sub("", normalized)
    normalized = _PAREN_YEARS_RE.sub("", normalized)
    normalized = _TRAILING_COMMA_RE.sub("", normalized.strip())
    normalized = _WS_RE.sub(" ", normalized).strip()
    return normalized
