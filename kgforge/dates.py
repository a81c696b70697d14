"""DateTimeParser port: all regex families + the template-date path.

Re-implements ``dataparser/DateTimeParser.scala`` (the 8 ``DateRegex``
families :49-80, day-month / month-year / year fallbacks :72-80 and
:323-383, era sign handling :391-406) and the template path
``catchTemplate`` (:108-189) with the en/de/fr tables from
``config/dataparser/DateTimeParserConfig.scala`` (monthsMap, eraStrMap,
cardinalityRegexMap, templateDateMap).

Pure Python over raw strings — runs inside the existing Arrow-batched UDF
stages; regexes are module-level, compiled once per executor.

Semantics:

- ``strict=True`` (InfoboxExtractor cascade, InfoboxExtractor.scala:39-42
  builds its DateTimeParsers with strict=true): the whole value must be the
  date (only surrounding whitespace/brackets allowed).
- ``strict=False`` (SimplePropertyMapping / PersondataExtractor): the date
  may appear anywhere in the value.
- The target datatype drives both the fallback chain (gYear → month-year →
  bare year, gMonthDay → day-month, gYearMonth → month-year;
  DateTimeParser.scala:208-227) and the lexical form of the result.
- Template dates ({{Birth date|1980|1|1}}, {{Start date|...}}, the
  text-carrying {{Birth-date|3 June 1981}} family) are tried FIRST
  (DateTimeParser.parse :82-106 scans TemplateNodes before text). Template
  names go through the template-redirect resolver when one is supplied
  (catchTemplate resolves via context.redirects, :110).

Divergence kept from round 1 (documented in SURVEY §7): the INFOBOX cascade
does not fall back to bare-year gYear typing — every integer-looking value
would otherwise become a gYear instead of xsd:integer. Mapping rules with an
explicit gYear range DO parse bare years here.
"""

from __future__ import annotations

import datetime
import re
from collections.abc import Callable

from .namespaces import XSD_DATE, XSD_GMONTHDAY, XSD_GYEAR, XSD_GYEARMONTH

# --- language tables (DateTimeParserConfig.monthsMap en/de/fr) -------------
MONTHS: dict[str, int] = {}
for _k, _m in enumerate(
    "january february march april may june july august september october november december".split()
):
    MONTHS[_m] = _k + 1
for _k, _m in enumerate(
    "januar februar märz maerz april mai juni juli august september oktober november dezember".split()
):
    # de table has 13 entries (märz/maerz both map to 3)
    MONTHS.setdefault(_m, _k + 1 if _k < 3 else _k)
for _k, _m in enumerate(
    "janvier février mars avril mai juin juillet août septembre octobre novembre décembre".split()
):
    MONTHS.setdefault(_m, _k + 1)
# es / it / pt / nl / pl month + era tables are LANGUAGE-SCOPED (the
# reference's monthsMap/eraStrMap are per-language): merging them into the
# shared table caused cross-language false positives ('Mayo 1984' — the
# clinic, not the month — parsing as 1984-05 in English text).  They merge
# over the default only when find_date is called with that lang.
LANG_EXTRA_MONTHS: dict[str, dict[str, int]] = {
    lang: {m: k + 1 for k, m in enumerate(tbl.split())}
    for lang, tbl in {
        "es": "enero febrero marzo abril mayo junio julio agosto septiembre octubre noviembre diciembre",
        "it": "gennaio febbraio marzo aprile maggio giugno luglio agosto settembre ottobre novembre dicembre",
        "pt": "janeiro fevereiro março abril maio junho julho agosto setembro outubro novembro dezembro",
        "nl": "januari februari maart april mei juni juli augustus september oktober november december",
        "pl": "stycznia lutego marca kwietnia maja czerwca lipca sierpnia września października listopada grudnia",
    }.items()
}

# Round-5 tranche (DateTimeParserConfig.monthsMap rows for the next
# minidump languages; explicit dicts where the reference table carries
# declined/abbreviated/alternate forms):
LANG_EXTRA_MONTHS.update({
    "sv": {m: k + 1 for k, m in enumerate(
        "januari februari mars april maj juni juli augusti september oktober november december".split())},
    "id": {m: k + 1 for k, m in enumerate(
        "januari februari maret april mei juni juli agustus september oktober november desember".split())},
    "eo": {m: k + 1 for k, m in enumerate(
        "januaro februaro marto aprilo majo junio julio aŭgusto septembro oktobro novembro decembro".split())},
    "sk": {m: k + 1 for k, m in enumerate(
        "január február marec apríl máj jún júl august september október november december".split())},
    "bg": {m: k + 1 for k, m in enumerate(
        "януари февруари март април май юни юли август септември октомври ноември декември".split())},
    "mk": {m: k + 1 for k, m in enumerate(
        "јануари февруари март април мај јуни јули август септември октомври ноември декември".split())},
    "hr": {m: k + 1 for k, m in enumerate(
        "siječanj veljača ožujak travanj svibanj lipanj srpanj kolovoz rujan listopad studeni prosinac".split())},
    "cs": {m: k + 1 for k, m in enumerate(
        "leden únor březen duben květen červen červenec srpen září říjen listopad prosinec".split())},
    "ru": {
        **{m: k + 1 for k, m in enumerate(
            "январь февраль март апрель май июнь июль август сентябрь октябрь ноябрь декабрь".split())},
        **{m: k + 1 for k, m in enumerate(
            "янв фев мар апр мая июн июл авг сен окт ноя дек".split())},
        **{m: k + 1 for k, m in enumerate(  # genitive forms
            "января февраля марта апреля мая июня июля августа сентября октября ноября декабря".split())},
    },
    "uk": {
        **{m: k + 1 for k, m in enumerate(
            "січень лютий березень квітень травень червень липень серпень вересень жовтень листопад грудень".split())},
        **{m: k + 1 for k, m in enumerate(  # genitive forms
            "січня лютого березня квітня травня червня липня серпня вересня жовтня листопада грудня".split())},
    },
    "el": {
        **{m: k + 1 for k, m in enumerate(
            "ιανουάριος φεβρουάριος μάρτιος απρίλιος μάιος ιούνιος ιούλιος αύγουστος σεπτέμβριος οκτώβριος νοέμβριος δεκέμβριος".split())},
        **{m: k + 1 for k, m in enumerate(  # genitive forms
            "ιανουαρίου φεβρουαρίου μαρτίου απριλίου μαΐου ιουνίου ιουλίου αυγούστου σεπτεμβρίου οκτωβρίου νοεμβρίου δεκεμβρίου".split())},
        "μάϊος": 5, "μαίου": 5,
    },
    "gl": {
        **{m: k + 1 for k, m in enumerate(
            "xaneiro febreiro marzo abril maio xuño xullo agosto setembro outubro novembro decembro".split())},
        **{m: k + 1 for k, m in enumerate(
            "xan feb mar abr mai xuñ xul ago set out nov dec".split())},
    },
    "ga": {m: k + 1 for k, m in enumerate(
        "eanáir feabhra marta aibreán bealtaine meitheamh iúil lúnasa meán_fómhair deireadh_fómhair samhain nollaig"
        .replace("_", "\x00").split())} | {"meán fómhair": 9, "deireadh fómhair": 10},
    "ar": {  # both Maghrebi and Mashriqi month-name families
        **dict(zip("جانفي فيفري مارس أفريل ماي جوان جويلية أوت سبتمبر أكتوبر نوفمبر ديسمبر".split(), range(1, 13))),
        **dict(zip("يناير فبراير مارس أبريل مايو يونيو يوليو أغسطس شتنبر أكتوبر نونبر دجنبر".split(), range(1, 13))),
        "يوليوز": 7, "غشت": 8,
    },
    "ja": {
        **{f"{k}月": k for k in range(1, 13)},
        **dict(zip("一月 二月 三月 四月 五月 六月 七月 八月 九月 十月 十一月 十二月".split(), range(1, 13))),
    },
    # final tranche — the last three monthsMap languages (am carries both
    # the transliterated-English and Ge'ez-script forms, as the reference
    # row does)
    "am": {
        **{m: k + 1 for k, m in enumerate(
            "january february march april may june july august september october november december".split())},
        **{m: k + 1 for k, m in enumerate(
            "ጃንዩወሪ ፌብሩወሪ ማርች ኤፕሪል ሜይ ጁን ጁላይ ኦገስት ሴፕተምበር ኦክቶበር ኖቬምበር ዲሴምበር".split())},
    },
    "eu": {m: k + 1 for k, m in enumerate(
        "urtarrila otsaila martxoa apirila maiatza ekaina uztaila abuztua iraila urria azaroa abendua".split())},
    "hi": {m: k + 1 for k, m in enumerate(
        "जनवरी फरवरी मार्च अप्रैल मई जून जुलाई अगस्त सितम्बर अक्टूबर नवंबर दिसंबर".split())},
})
# the placeholder multi-word hack above must not leak: drop any key with a NUL
for _lg in ("ga",):
    LANG_EXTRA_MONTHS[_lg] = {k: v for k, v in LANG_EXTRA_MONTHS[_lg].items() if "\x00" not in k}

# eraStrMap: en + de/fr era strings → sign (-1 = BC); other languages scoped
ERAS: dict[str, int] = {
    "bce": -1, "bc": -1, "ac": -1, "ce": 1, "ad": 1,
    "v. chr.": -1, "v.chr.": -1, "n. chr.": 1, "n.chr.": 1,
    "av. j.-c.": -1, "ap. j.-c.": 1,
}
_LATIN_ERAS = {"a.c.": -1, "dc": 1, "d.c.": 1, "a.d.": 1}
LANG_EXTRA_ERAS: dict[str, dict[str, int]] = {
    "es": _LATIN_ERAS,
    "pt": _LATIN_ERAS,
    "it": {**_LATIN_ERAS, "pev": -1, "p.e.v.": -1, "ev": 1, "e.v.": 1},
    "nl": {"v.c.": -1, "n.c.": 1, "voor chr.": -1, "na chr.": 1},
    "pl": {"p.n.e.": -1, "n.e.": 1},
    # round-5 tranche (eraStrMap rows, regex-escapes unescaped, lowercased
    # — _era_sign matches on the lowercased literal)
    "sv": {"f.kr.": -1, "e.kr.": 1, "f.v.t.": -1, "e.v.t.": 1},
    "bg": {"пр.н.е.": -1},
    "el": {"πχ": -1, "π.χ.": -1, "π.χ": -1, "μχ": 1, "μ.χ.": 1, "μ.χ": 1},
    "eo": {"a.k.": -1, "p.k.": -1},
    "ga": {"b.c.": -1, "r.c.": -1, "r. chr.": -1, "bc": -1, "rc": -1,
           "a.d.": 1, "ad": 1, "i.c.": 1, "ic": 1},
    "gl": {"ac": -1, "a.c.": -1, "dc": 1, "d.c.": 1, "aec": -1,
           "a.e.c.": -1, "ec": 1, "e.c.": 1},
    "ja": {"前": -1, "b.c.": -1, "西暦": 1},
    "ar": {"ق.م.": -1, "م.": 1},
    # final tranche — the last two eraStrMap languages
    "eu": {"k.a.": -1, "a. d.": 1},
    "hi": {"ई.पू.": -1, "bc": -1, "ई॰": 1, "ce": 1, "ad": 1, "ac": -1},
}

# cardinalityRegexMap en + fr ('er|nd|ème') + de/cs ('\.')
_CARD_BASE = r"st|nd|rd|th|er|ème"
_CARD = rf"(?:{_CARD_BASE})"

# per-language ordinal-suffix fragments (cardinalityRegexMap,
# DateTimeParserConfig.scala:76-92) — merged over the shared default when
# patterns compile for that language (same union pragmatism as the month
# tables; the reference is per-language only)
LANG_CARDINALITY: dict[str, str] = {
    "el": "η|ης",
    "eo": "-a|-an",
    "es": "°|\\.°|°\\.",
    "eu": "\\.",
    "ga": "ú",
    "gl": "°|\\.°|°\\.|ª|\\.ª|ª\\.|º|\\.º|º\\.",
    "hi": "वॉ",
    "it": "°|\\.°|°\\.",
    "nl": "ste|de|e",
    "pt": "°|\\.°|°\\.",
    "sk": "\\.",
    "sv": ":e",
}

_F = re.IGNORECASE | re.UNICODE


def _compile_patterns(months: dict[str, int], eras: dict[str, int], card: str = _CARD):
    """The 8 DateRegex families + fallbacks (DateTimeParser.scala:49-80)
    compiled for ONE month/era table set — the reference builds its parser
    per language the same way; per-language sets are cached below."""
    from types import SimpleNamespace

    _CARD = card  # shadow the module default inside the f-string patterns
    M = "|".join(sorted((re.escape(m) for m in months), key=len, reverse=True))
    E = "|".join(sorted((re.escape(e) for e in eras), key=len, reverse=True))
    return SimpleNamespace(
        months=months,
        eras=eras,
        # R1: "8 June 07" (2-digit year, century heuristic :244-250)
        r1=re.compile(rf"([0-9]{{1,2}})\s*({M})\s*([0-9]{{2}})(?!\d)(?!\s*(?:{E}))", _F),
        # R2: "[[29 January]] [[300 AD]]", "3 June 1981"
        r2=re.compile(
            rf"(?<!\d)\[?\[?([0-9]{{1,2}})(?:\.|{_CARD})?\s*({M})\]?\]?,? \[?\[?(-?[0-9]{{1,4}})\s*({E})?\]?\]?(?!\d)",
            _F,
        ),
        # R3: "[[January 20]] [[1995 AD]]", "January 20 1995"
        r3=re.compile(
            rf"\[?\[?({M})\s*,?\s+([0-9]{{1,2}})\]?\]?(?:{_CARD})?\s*[.,]?\s+\[?\[?([0-9]{{1,4}})\s*({E})?\]?\]?",
            _F,
        ),
        # R4: "24-06-1867", "24/06/1867" (day-month-year)
        r4=re.compile(r"(?<!\d)([0-9]{1,2})[-/]([0-9]{1,2})[-/]([0-9]{3,4})(?!\d)", _F),
        # R5: "24-june-1867", "24|juillet|1867"
        r5=re.compile(rf"(?<!\d)([0-9]{{1,2}})[-/|]({M})[-/|]([0-9]{{3,4}})(?!\d)", _F),
        # R6: "1990 06 24", "1990-06-24", "1977-01-01 00:00:00"
        r6=re.compile(r"(?<!\d)([0-9]{3,4})[-/\s]([0-9]{1,2})[-/\s]([0-9]{1,2})(?!\d)", _F),
        # R7: "20 de Janeiro de 1999"
        r7=re.compile(
            rf"(?<!\d)\[?\[?([0-9]{{1,2}})(?:\.|{_CARD})?\s*d?e?\s*({M})\]?\]?\s*d?e?\s*\[?\[?([0-9]{{1,4}})\s*\]?\]?(?!\d)",
            _F,
        ),
        # R8: "1520, March 16"
        r8=re.compile(rf"([0-9]{{3,4}}),?\s+({M})\s+([0-9]{{1,2}})(?:{_CARD})?", _F),
        # fallback families (DateTimeParser.scala:72-80)
        dm1=re.compile(rf"({M})\]?\]?\s*\[?\[?([1-9]|0[1-9]|[12][0-9]|3[01])(?!\d)", _F),
        dm2=re.compile(
            rf"(?<!\d)([1-9]|0[1-9]|[12][0-9]|3[01])\s*(?:{_CARD})?\]?\]?\s*(?:of)?\s*\[?\[?({M})\]?\]?",
            _F,
        ),
        my=re.compile(rf"({M})\]?\]?,?\s*\[?\[?([0-9]{{1,4}})\s*({E})?", _F),
        y=re.compile(rf"(?<![\d\w])(-?\d{{1,4}})(?!\d)\s*({E})?", _F),
        y2=re.compile(rf"({E})\s*(?<!\d)(\d{{1,4}})(?!\d)", _F),
    )


_DEFAULT_PATS = _compile_patterns(MONTHS, ERAS)


def _patterns_for(lang: str | None):
    """Default (en/de/fr) tables, or the default merged with the
    language-scoped extras — compiled once per language, cached."""
    if (
        lang not in LANG_EXTRA_MONTHS
        and lang not in LANG_EXTRA_ERAS
        and lang not in LANG_CARDINALITY
    ):
        return _DEFAULT_PATS
    if lang not in _PATS_CACHE:
        months = dict(MONTHS)
        for m, k in LANG_EXTRA_MONTHS.get(lang, {}).items():
            months.setdefault(m, k)
        eras = dict(ERAS)
        for e, sgn in LANG_EXTRA_ERAS.get(lang, {}).items():
            eras.setdefault(e, sgn)
        card = _CARD
        if lang in LANG_CARDINALITY:
            card = f"(?:{_CARD_BASE}|{LANG_CARDINALITY[lang]})"
        _PATS_CACHE[lang] = _compile_patterns(months, eras, card)
    return _PATS_CACHE[lang]


_PATS_CACHE: dict = {}


def _era_sign(era: str | None, eras: dict[str, int] | None = None) -> int:
    if not era:
        return 1
    return (eras if eras is not None else ERAS).get(era.strip().lower(), 1)


def _valid(year: int | None, month: int | None, day: int | None) -> bool:
    """Date-component validation (the reference's util/Date.scala uses a
    non-lenient GregorianCalendar; invalid lexical forms must not be
    emitted)."""
    if month is not None and not 1 <= month <= 12:
        return False
    if day is not None:
        if month is not None and year is not None and year >= 1:
            try:
                datetime.date(year, month, day)
            except ValueError:
                return False
        elif not 1 <= day <= 31:
            return False
    if year is not None and year == 0:
        return False
    return True


def _render(year, month, day, datatype: str) -> tuple[str, str] | None:
    """(y, m, d, target datatype) → (lexical form, datatype IRI)."""
    if not _valid(year, month, day):
        return None

    def y4(y):
        return ("-" if y < 0 else "") + f"{abs(y):04d}"

    if datatype == XSD_DATE:
        if year is None or month is None or day is None:
            return None
        return f"{y4(year)}-{month:02d}-{day:02d}", XSD_DATE
    if datatype == XSD_GYEARMONTH:
        if year is None or month is None:
            return None
        return f"{y4(year)}-{month:02d}", XSD_GYEARMONTH
    if datatype == XSD_GMONTHDAY:
        if month is None or day is None:
            return None
        return f"--{month:02d}-{day:02d}", XSD_GMONTHDAY
    if datatype == XSD_GYEAR:
        if year is None:
            return None
        return y4(year), XSD_GYEAR
    return None


def _whole(pattern: re.Pattern, text: str):
    """strict mode: the match must cover the whole (stripped) input."""
    m = pattern.match(text)
    return m if m and m.end() == len(text) else None


def _catch_date(text: str, strict: bool, p=None):
    """The 8-family chain (catchDate, DateTimeParser.scala:240-321) →
    (year, month, day) or None."""
    p = p or _DEFAULT_PATS
    months, eras = p.months, p.eras
    find: Callable = (lambda pt: _whole(pt, text)) if strict else (lambda pt: pt.search(text))
    m = find(p.r1)
    if m:
        mon = months.get(m.group(2).lower())
        if mon:
            yy = int(m.group(3))
            century = 1900 if yy > 20 else 2000  # :244-250 century heuristic
            return century + yy, mon, int(m.group(1))
    m = find(p.r2)
    if m:
        mon = months.get(m.group(2).lower())
        if mon:
            return _era_sign(m.group(4), eras) * int(m.group(3)), mon, int(m.group(1))
    m = find(p.r3)
    if m:
        mon = months.get(m.group(1).lower())
        if mon:
            return _era_sign(m.group(4), eras) * int(m.group(3)), mon, int(m.group(2))
    m = find(p.r4)
    if m:
        return int(m.group(3)), int(m.group(2)), int(m.group(1))
    m = find(p.r5)
    if m:
        mon = months.get(m.group(2).lower())
        if mon:
            return int(m.group(3)), mon, int(m.group(1))
    m = find(p.r6)
    if m:
        return int(m.group(1)), int(m.group(2)), int(m.group(3))
    m = find(p.r7)
    if m:
        mon = months.get(m.group(2).lower())
        if mon and m.group(3):
            return int(m.group(3)), mon, int(m.group(1))
    m = find(p.r8)
    if m:
        mon = months.get(m.group(2).lower())
        if mon:
            return int(m.group(1)), mon, int(m.group(3))
    return None


def _find_in_text(text: str, datatype: str, strict: bool, p=None) -> tuple[str, str] | None:
    """findDate (DateTimeParser.scala:191-228): full-date chain first, then
    datatype-specific fallbacks."""
    p = p or _DEFAULT_PATS
    months, eras = p.months, p.eras
    t = text.strip()
    if not t:
        return None
    ymd = _catch_date(t, strict, p)
    if ymd:
        r = _render(ymd[0], ymd[1], ymd[2], datatype)
        if r:
            return r
    find: Callable = (lambda pt: _whole(pt, t)) if strict else (lambda pt: pt.search(t))
    if datatype == XSD_GMONTHDAY:
        for pat, mi, di in ((p.dm1, 1, 2), (p.dm2, 2, 1)):
            m = find(pat)
            if m:
                mon = months.get(m.group(mi).lower())
                if mon:
                    r = _render(None, mon, int(m.group(di)), XSD_GMONTHDAY)
                    if r:
                        return r
        return None
    if datatype in (XSD_GYEARMONTH, XSD_GYEAR):
        m = find(p.my)
        if m:
            mon = months.get(m.group(1).lower())
            if mon:
                r = _render(_era_sign(m.group(3), eras) * int(m.group(2)), mon, None, datatype)
                if r:
                    return r
        if datatype == XSD_GYEAR:
            m = find(p.y)
            if m:
                r = _render(_era_sign(m.group(2), eras) * int(m.group(1)), None, None, XSD_GYEAR)
                if r:
                    return r
            m = find(p.y2)
            if m:
                r = _render(_era_sign(m.group(1), eras) * int(m.group(2)), None, None, XSD_GYEAR)
                if r:
                    return r
    return None


# --- template path (catchTemplate + DateTimeParserConfig.templateDateMap) --

# en templateDateMap subset: positional year/month/day templates + the
# text-carrying -date family.
TEMPLATE_DATES: dict[str, dict[str, str]] = {
    **{
        name: {"year": "1", "month": "2", "day": "3"}
        for name in (
            "birth date and age", "birth date and age2", "start date and age",
            "death date and age", "end date and age", "birth date",
            "death date", "bda", "dda", "dob", "start date", "end date",
        )
    },
    **{name: {"text": "1"} for name in ("birth-date", "start-date", "death-date", "end-date")},
    # conditional property-number mapping (DateTimeParser.scala:129-147):
    # {{birthDeathAge|B|y|m|d|...}} reads 2/3/4, otherwise 4/5/6
    "birthdeathage": {
        "ifPropertyNum": "1", "ifPropertyNumHasValue": "B",
        "year": "2", "month": "3", "day": "4",
        "elseYear": "4", "elseMonth": "5", "elseDay": "6",
    },
}

# language-scoped template tables (templateDateMap per language,
# DateTimeParserConfig.scala:150-200) — looked up BEFORE the shared/en
# table when find_date is given a lang.  Specs without a 'day' role render
# partial dates (gYear/gYearMonth) only, like the reference's optional
# Date components.
TEMPLATE_DATES_BY_LANG: dict[str, dict[str, dict[str, str]]] = {
    "fr": {
        **{
            name: {"year": "3", "month": "2", "day": "1"}
            for name in ("date", "date de naissance", "date de décès", "date sport")
        },
        "date début": {"year": "1", "month": "2", "day": "3"},
        "birth date and age": {"year": "1", "month": "2", "day": "3"},
        # conditional: {{Naissance décès âge|N|d|m|y|...}} vs |…|d|m|y at 5/6/7
        "naissance décès âge": {
            "ifPropertyNum": "1", "ifPropertyNumHasValue": "N",
            "year": "4", "month": "3", "day": "2",
            "elseYear": "7", "elseMonth": "6", "elseDay": "5",
        },
        "année de naissance et âge": {"year": "1", "month": "2"},
        "année de décès et âge": {"year": "1", "month": "3"},
    },
    "el": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in (
                "ημερομηνία γέννησης και ηλικία", "ημερομηνία θανάτου και ηλικία",
                "ημερομηνία εκκίνησης και ηλικία", "ημερομηνία γέννησης",
                "ηθηλ", "ηγη",
            )
        },
    },
    "ca": {
        **{
            name: {"year": "3", "month": "2", "day": "1"}
            for name in (
                "edat", "data naixement i edat", "data naixement",
                "data defunció i edat", "data defunció", "data d'inici i edat",
            )
        },
    },
    "cs": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in (
                "datum narození a věk", "datum narození", "datum úmrtí a věk",
                "datum úmrtí", "věk v letech a dnech", "věk ve dnech", "věk",
            )
        },
    },
    "eu": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in ("adina", "adin parentesigabea", "data")
        },
    },
    "ja": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in ("生年月日と年齢", "生年月日と馬齢", "年数")
        },
        **{
            name: {"year": "4", "month": "5", "day": "6"}
            for name in ("生年月日と年齢2", "死亡年月日と没年齢",
                         "死亡年月日と没馬齢", "没年齢", "没年齢2")
        },
        "年": {"year": "1"},
    },
    # final tranche — the remaining 11 templateDateMap languages (keys
    # lowercased: the lookup lowercases template names, and the reference's
    # own mixed-case ru/uk/nl keys only ever matched because its
    # decodedName lowercases the first letter of single-word names)
    "ar": {
        name: {"year": "1", "month": "2", "day": "3"}
        for name in ("تاريخ الازدياد و العمر", "تاريخ الوفاة و العمر",
                     "تاريخ الولادة", "تاريخ الوفاة", "تاريخ الازدياد",
                     "تاريخ البدأ")
    },
    "bg": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in ("дата на раждане и години", "дата на раждане",
                         "дата на смърт и години", "дата на смърт")
        },
        "роден": {"year": "3", "month": "2", "day": "1"},
    },
    # NOTE: the reference's ga rows key the roles as bliain/mí/lá
    # (DateTimeParserConfig.scala ga block) — its own reader only consults
    # "year"/"month"/"day" (DateTimeParser.scala:125-127), so those rows are
    # inert config. Reproduced verbatim for parity: same inert behavior.
    "ga": {
        name: {"bliain": "1", "mí": "2", "lá": "3"}
        for name in ("dáta breithe agus aois", "dáta breithe")
    },
    "id": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in ("mula tanggal dan usia", "tanggal lahir dan umur",
                         "tanggal kematian dan umur", "umur pada tanggal",
                         "umur", "tanggal lahir dan umur2/doc",
                         "tanggal lahir dan umur2", "birth date and age",
                         "birth date and age2", "death date and age",
                         "birth date", "death date", "bda", "dob",
                         "start date")
        },
        "lahirmati": {"year": "2", "month": "3", "day": "4"},
    },
    "it": {
        **{
            name: {"year": "3", "month": "2", "day": "1"}
            for name in ("data nascita", "data di nascita", "data di morte",
                         "morte")
        },
        "nascita anno": {"year": "1"},
        "nascita mese": {"month": "1"},
        "nascita giorno": {"day": "1"},
    },
    "nl": {
        name: {"year": "3", "month": "2", "day": "1"}
        for name in ("geboren", "geboortedatum", "overleden", "sterfdatum",
                     "overlijdensdatum", "overlijddatum", "datumbegin",
                     "begindatum", "einddatum", "datumeind", "datum begin",
                     "datum eind", "datum afbeelding")
    },
    "pt": {
        name: {"year": "1", "month": "2", "day": "3"}
        for name in ("nascimento", "dni", "dnibr", "dataext", "falecimento",
                     "morte", "falecimento2", "dtlink", "dtext")
    },
    "ru": {
        **{
            name: {"year": "3", "month": "2", "day": "1"}
            for name in ("возраст", "датарождения", "датасмерти",
                         "прошло лет", "умер", "родился")
        },
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in ("start date", "start date and age")
        },
    },
    "sk": {
        name: {"year": "1", "month": "2", "day": "3"}
        for name in ("počiatočný dátum a vek", "dátum narodenia a vek",
                     "dnv", "vek", "vek v dňoch", "vek v rokoch a dňoch",
                     "dátum úmrtia a vek", "dúv")
    },
    "sl": {
        name: {"year": "1", "month": "2", "day": "3"}
        for name in ("datum rojstva", "datum rojstva in starost",
                     "datum rojstva in starost2", "datum smrti",
                     "datum smrti in starost", "starost na datum",
                     "starost v letih in dnevih", "starost")
    },
    "uk": {
        **{
            name: {"year": "1", "month": "2", "day": "3"}
            for name in ("дата з віком", "вік", "age", "дата смерті з віком")
        },
        **{
            name: {"year": "3", "month": "2", "day": "1"}
            for name in ("дата народження", "народився", "дата смерті")
        },
    },
}

_TPL_RE = re.compile(r"\{\{([^{}|]+)((?:\|[^{}]*)*)\}\}")


def _template_params(body: str) -> dict[str, str]:
    """'|a|b|k=v' → {'1': a, '2': b, 'k': v} (positional keys 1..n, the same
    assignment the wikitext parser uses)."""
    out: dict[str, str] = {}
    pos = 0
    for part in body.split("|")[1:]:
        if "=" in part:
            k, v = part.split("=", 1)
            out.setdefault(k.strip(), v.strip())
        else:
            pos += 1
            out.setdefault(str(pos), part.strip())
    return out


def _catch_template(
    text: str, datatype: str, resolve: Callable[[str], str] | None,
    lang: str | None = None, p=None,
) -> tuple[str, str] | None:
    """First date-carrying template in the value (catchTemplate,
    DateTimeParser.scala:108-189). ``resolve`` maps a template name through
    the Template-namespace redirect map (context.redirects.resolve, :110).
    The language-scoped template table is consulted first; the shared/en
    table stays as fallback (the reference is per-language only — the union
    is this engine's en-default pragmatism, documented)."""
    p = p or _patterns_for(lang)
    lang_specs = TEMPLATE_DATES_BY_LANG.get(lang or "", {})
    for m in _TPL_RE.finditer(text):
        name = m.group(1).strip().lower()
        if resolve is not None:
            name = resolve(name).strip().lower()
        spec = lang_specs.get(name) or TEMPLATE_DATES.get(name)
        if spec is None:
            continue
        params = _template_params(m.group(2))
        if "text" in spec:
            inner = params.get(spec["text"], "")
            r = _find_in_text(inner, datatype, strict=False, p=p)
            if r:
                return r
            continue
        yk, mk, dk = spec.get("year", ""), spec.get("month", ""), spec.get("day", "")
        if "ifPropertyNum" in spec:
            probe = params.get(spec["ifPropertyNum"], "")
            if probe != spec.get("ifPropertyNumHasValue", ""):
                yk, mk, dk = spec.get("elseYear", ""), spec.get("elseMonth", ""), spec.get("elseDay", "")
        y = params.get(yk, "")
        mo = params.get(mk, "")
        d = params.get(dk, "")
        # specs may omit 'month'/'day' roles (année de naissance et âge,
        # ja 年) — partial dates render for gYear/gYearMonth targets only
        if not (y and (mo or not mk) and (d or not dk)):
            continue
        try:
            month = (p.months.get(mo.lower()) or int(mo)) if mo else None
            ym = p.y.match(y.strip())
            if not ym:
                continue
            year = _era_sign(ym.group(2), p.eras) * int(ym.group(1))
            r = _render(year, month, int(d) if d else None, datatype)
            if r:
                return r
        except (ValueError, TypeError):
            continue
    return None


def merge_date_parts(parts: list[tuple[str, str]], target: str) -> tuple[str, str] | None:
    """Date.merge (util/Date.scala, used by CombineDateMapping.scala:48-55):
    combine partial dates (gYear + gMonthDay, …) into one value of the
    target datatype. Later parts win on field conflicts."""
    y = mo = d = None

    def year_of(lex: str) -> tuple[int, str]:
        neg = lex.startswith("-")
        return (-1 if neg else 1), (lex[1:] if neg else lex)

    for lex, dt in parts:
        if dt == XSD_GYEAR:
            sign, body = year_of(lex)
            y = sign * int(body)
        elif dt == XSD_GYEARMONTH:
            sign, body = year_of(lex)
            yy, mm = body.split("-")
            y, mo = sign * int(yy), int(mm)
        elif dt == XSD_GMONTHDAY:
            mo, d = int(lex[2:4]), int(lex[5:7])
        elif dt == XSD_DATE:
            sign, body = year_of(lex)
            yy, mm, dd = body.split("-")
            y, mo, d = sign * int(yy), int(mm), int(dd)
    return _render(y, mo, d, target)


def find_date(
    text: str,
    datatype: str = XSD_DATE,
    strict: bool = False,
    resolve_template: Callable[[str], str] | None = None,
    lang: str | None = None,
) -> tuple[str, str] | None:
    """One value → (lexical form, datatype IRI) or None.

    DateTimeParser.parse (:82-106): template children first, then the text
    regex chain with datatype-driven fallbacks. For Amharic input the Geez
    calendar parser runs first (findDate :195-201, language == "am").
    """
    if not text:
        return None
    if lang == "am":
        from .geez import find_geez_date

        r = find_geez_date(text, datatype)
        if r:
            return r
    if not any(ch.isdigit() for ch in text):
        return None  # every (non-Geez) date family requires digits
    pats = _patterns_for(lang)
    if "{{" in text:
        r = _catch_template(text, datatype, resolve_template, lang, pats)
        if r:
            return r
    return _find_in_text(text, datatype, strict, pats)
