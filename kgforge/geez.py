"""Ethiopian (Geez) calendar date parsing.

Re-implements ``dataparser/EthiopianDateParser.scala`` (the 5 date regex
families :27-47, Ethiopian-calendar validation incl. the Pagume 13th month
:80-124, and the JDN-based Ethiopian→Gregorian conversion :126-162) plus
``util/GeezNumberUtils.scala`` (Geez numeral → integer, recursive
multiplier decomposition over ፻=100 and ፼=10000).

Standalone parser functions: the engine's corpora carry en/de/fr today, so
this is wired the way the reference wires it — ``dates.find_date`` calls it
only for Amharic input (an ``am`` corpus is a data change, not a code
change).
"""

from __future__ import annotations

import re

from .namespaces import XSD_DATE

GEEZ_DIGITS: dict[str, int] = {
    "፩": 1, "፪": 2, "፫": 3, "፬": 4, "፭": 5, "፮": 6, "፯": 7, "፰": 8, "፱": 9,
    "፲": 10, "፳": 20, "፴": 30, "፵": 40, "፶": 50, "፷": 60, "፸": 70, "፹": 80,
    "፺": 90, "፻": 100, "፼": 10000,
}

ETHIOPIAN_MONTHS: dict[str, int] = {
    "መስከረም": 1, "ጥቅምት": 2, "ኅዳር": 3, "ታኅሳስ": 4, "ጥር": 5, "የካቲት": 6,
    "መጋቢት": 7, "ሚያዝያ": 8, "ግንቦት": 9, "ሰኔ": 10, "ሐምሌ": 11, "ነሐሴ": 12,
    "ጳጉሜ": 13,
}

_MONTH_ALT = "|".join(ETHIOPIAN_MONTHS)
_GEEZ_RUN = "[፩-፼]+"
_DAY = r"(?:0?[1-9]|[12][0-9]|3[01])"
_YEAR = rf"(?:\d{{4}}|{_GEEZ_RUN})"
_GREGORIAN_INDICATOR = "እ.ኤ.አ"  # "according to the Europeans" marker

# the 5 families (EthiopianDateParser.scala:27-47)
_D1 = re.compile(rf"\b({_DAY})\b[-/\s]\b(0?[1-9]|1[0-2]|13)\b[-/\s]({_YEAR})")
_D2 = re.compile(rf"({_MONTH_ALT})[\s/-](\b{_DAY}\b)[\s/-]({_YEAR})")
_D3 = re.compile(rf"(\b{_DAY}\b)[\s/-]({_MONTH_ALT})[\s/-]({_YEAR})")
_D4 = re.compile(rf"({_MONTH_ALT})[\s/-]({_GEEZ_RUN}|{_DAY})[\s/-]({_YEAR})")
_D5 = re.compile(rf"({_GEEZ_RUN}|{_DAY})[\s/-]({_MONTH_ALT})[\s/-]({_YEAR})")


def geez_to_int(s: str) -> int | None:
    """GeezNumberUtils.convertGeezToArabicNumeral: decompose on the
    RIGHTMOST ፼ (10000) first, then the rightmost ፻ (100), recursively:
    value = left·multiplier + right; a run without multipliers sums."""
    try:
        arr = [GEEZ_DIGITS[ch] for ch in s.strip()]
    except KeyError:
        return None
    if not arr:
        return None

    def calc(lo: int, hi: int) -> int:
        if lo > hi:
            return 0
        for mult in (10000, 100):
            for i in range(hi, lo - 1, -1):
                if arr[i] == mult:
                    left = calc(lo, i - 1) or 1
                    return left * mult + calc(i + 1, hi)
        return sum(arr[lo : hi + 1])

    return calc(0, len(arr) - 1)


def is_valid_ethiopian_date(year: int, month: int, day: int) -> bool:
    """EthiopianDateParser.isValidEthiopianCalendarDate (:80-124): 13 months,
    days ≤30; Pagume has 5 days (6 in leap years, year % 4 == 3)."""
    if year <= 0 or not 1 <= month <= 13 or not 1 <= day <= 30:
        return False
    if month == 13:
        if day > 6:
            return False
        if year % 4 != 3 and day > 5:
            return False
    return True


def ethiopian_to_gregorian(year: int, month: int, day: int) -> tuple[int, int, int]:
    """JDN round-trip (EthiopianDateParser.scala:126-162)."""
    epoch = 1723856
    jdn = (epoch + 365) + 365 * (year - 1) + (year // 4) + 30 * month + day - 31
    q = jdn + 0.5
    z = int(q)
    w = int((z - 1867216.25) / 36524.25)
    x = w // 4
    a = z + 1 + w - x
    b = a + 1524
    c = int((b - 122.1) / 365.25)
    d = int(365.25 * c)
    e = int((b - d) / 30.6001)
    f = int(30.6001 * e)
    g_day = int(b - d - f + (q - z))
    g_month = e - 1 if e - 1 <= 12 else e - 13
    # Divergence (documented): the reference tests the ETHIOPIAN month here
    # (EthiopianDateParser.scala:152), which shifts Meskerem/Tikimt dates a
    # year forward; the JDN→Gregorian algorithm requires the GREGORIAN month
    # (1 Meskerem 2013 EC = 11 Sep 2020, not 2021).
    g_year = c - 4715 if g_month <= 2 else c - 4716
    return g_year, g_month, g_day


def _num(s: str) -> int | None:
    return int(s) if s.isdigit() else geez_to_int(s)


def find_geez_date(text: str, datatype: str = XSD_DATE) -> tuple[str, str] | None:
    """Amharic/Geez date in text → Gregorian (lexical, xsd:date).
    Values flagged with the Gregorian indicator እ.ኤ.አ are left to the
    standard DateTimeParser (EthiopianDateParser.findGeezDate :193-216)."""
    if _GREGORIAN_INDICATOR in text:
        return None
    ymd = None
    m = _D1.search(text)
    if m:
        ymd = (_num(m.group(3)), int(m.group(2)), int(m.group(1)))
    if ymd is None:
        for pat, mi, di in ((_D2, 1, 2), (_D4, 1, 2)):
            m = pat.search(text)
            if m:
                ymd = (_num(m.group(3)), ETHIOPIAN_MONTHS.get(m.group(mi), 0), _num(m.group(di)))
                break
    if ymd is None:
        for pat in (_D3, _D5):
            m = pat.search(text)
            if m:
                ymd = (_num(m.group(3)), ETHIOPIAN_MONTHS.get(m.group(2), 0), _num(m.group(1)))
                break
    if ymd is None or any(v is None for v in ymd):
        return None
    y, mo, d = ymd
    if not is_valid_ethiopian_date(y, mo, d):
        return None
    gy, gm, gd = ethiopian_to_gregorian(y, mo, d)
    return f"{gy:04d}-{gm:02d}-{gd:02d}", XSD_DATE
