"""Data parsers: the value-typing cascade (SURVEY.md §2.4).

Scalar parsing functions with the semantics of the reference's
``dataparser/*.scala`` suite, applied in the exact precedence of
``InfoboxExtractor.extractValue`` (InfoboxExtractor.scala:179-197):

    unit value → date → single coordinate → number (int, double) → rank
    → links (object, external) → plain string (langString)

Everything is plain Python executed inside ONE vectorized pandas UDF per
exploded infobox property — an Arrow batch in, an Arrow batch out; no
row-at-a-time Python UDFs. Unit tables and regex families are module-level
constants compiled once per executor.
"""

from __future__ import annotations

import re
import urllib.parse

from .namespaces import (
    MAIN,
    RDF_LANGSTRING,
    XSD_DATE,
    XSD_DOUBLE,
    XSD_GYEARMONTH,
    XSD_INTEGER,
    normalize_title,
    property_base,
    resource_base,
    split_namespace,
    title_with_namespace,
    wiki_encode,
)
from .dates import find_date
from .vocab import fmt_double

DBPEDIA_DT = "http://dbpedia.org/datatype/"

# unit token → (standard unit of its dimension, factor to that standard)
# (OntologyDatatypes / UnitValueParser.scala:38-99 tables; config-driven —
# extend by adding rows). Case-sensitive where SI prefixes collide (MW/mW).
# Temperature lives in AFFINE_UNITS below: °C/°F→K need offsets, not factors.
UNITS: dict[str, tuple[str, float]] = {
    # Area → squareMetre
    "km2": ("squareMetre", 1e6),
    "km²": ("squareMetre", 1e6),
    "sqkm": ("squareMetre", 1e6),
    "m2": ("squareMetre", 1.0),
    "m²": ("squareMetre", 1.0),
    "ha": ("squareMetre", 1e4),
    "sqmi": ("squareMetre", 2589988.110336),
    "acre": ("squareMetre", 4046.8564224),
    "acres": ("squareMetre", 4046.8564224),
    "sqft": ("squareMetre", 0.09290304),
    "ft2": ("squareMetre", 0.09290304),
    "ft²": ("squareMetre", 0.09290304),
    "mi²": ("squareMetre", 2589988.110336),
    "cm2": ("squareMetre", 1e-4),
    "cm²": ("squareMetre", 1e-4),
    "mm2": ("squareMetre", 1e-6),
    "mm²": ("squareMetre", 1e-6),
    # Length → metre
    "km": ("metre", 1000.0),
    "m": ("metre", 1.0),
    "cm": ("metre", 0.01),
    "mm": ("metre", 0.001),
    "mi": ("metre", 1609.344),
    "miles": ("metre", 1609.344),
    "ft": ("metre", 0.3048),
    "in": ("metre", 0.0254),
    "yd": ("metre", 0.9144),
    "nmi": ("metre", 1852.0),
    # Mass → kilogram
    "kg": ("kilogram", 1.0),
    "g": ("kilogram", 0.001),
    "mg": ("kilogram", 1e-6),
    "t": ("kilogram", 1000.0),
    "lb": ("kilogram", 0.45359237),
    "lbs": ("kilogram", 0.45359237),
    "oz": ("kilogram", 0.028349523125),
    # Time → second
    "s": ("second", 1.0),
    "ms": ("second", 0.001),
    "min": ("second", 60.0),
    "h": ("second", 3600.0),
    # Speed → kilometrePerHour
    "km/h": ("kilometrePerHour", 1.0),
    "kmh": ("kilometrePerHour", 1.0),
    "mph": ("kilometrePerHour", 1.609344),
    "m/s": ("kilometrePerHour", 3.6),
    # Volume → cubicMetre
    "m3": ("cubicMetre", 1.0),
    "m³": ("cubicMetre", 1.0),
    "km3": ("cubicMetre", 1e9),
    "km³": ("cubicMetre", 1e9),
    "cm3": ("cubicMetre", 1e-6),
    "cm³": ("cubicMetre", 1e-6),
    "mm3": ("cubicMetre", 1e-9),
    "mm³": ("cubicMetre", 1e-9),
    "l": ("cubicMetre", 0.001),
    "ml": ("cubicMetre", 1e-6),
    "ft3": ("cubicMetre", 0.028316846592),
    "USgal": ("cubicMetre", 0.003785411784),
    "usgal": ("cubicMetre", 0.003785411784),
    "gal": ("cubicMetre", 0.003785411784),
    # Power → watt
    "W": ("watt", 1.0),
    "kW": ("watt", 1e3),
    "MW": ("watt", 1e6),
    "GW": ("watt", 1e9),
    # Energy → joule
    "J": ("joule", 1.0),
    "kJ": ("joule", 1e3),
    "MJ": ("joule", 1e6),
    "kWh": ("joule", 3.6e6),
    # Information → byte
    "KB": ("byte", 1e3),
    "MB": ("byte", 1e6),
    "GB": ("byte", 1e9),
    "TB": ("byte", 1e12),
}

# affine unit token → (standard unit, scale, offset): si = v*scale + offset
# (SimplePropertyMapping.scala:244-276 + OntologyDatatypes Temperature —
# conversion FUNCTIONS, not factors; K = C + 273.15, K = (F + 459.67)·5/9)
AFFINE_UNITS: dict[str, tuple[str, float, float]] = {}
for _words, _std, _scale, _offset in (
    ("K kelvin kelvins", "kelvin", 1.0, 0.0),
    ("°C ℃ celsius centigrade", "kelvin", 1.0, 273.15),
    ("°F ℉ fahrenheit", "kelvin", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
):
    for _w in _words.split():
        AFFINE_UNITS[_w] = (_std, _scale, _offset)

# inconvertible unit datatypes (OntologyDatatypes InconvertibleUnitDatatype:
# currencies have no fixed conversion — the value is kept IN its unit with a
# unit datatype IRI instead of being standardized; no SI value → no
# specific-property emission)
INCONVERTIBLE_UNITS: dict[str, str] = {
    "usd": "http://dbpedia.org/datatype/usDollar",
    "$": "http://dbpedia.org/datatype/usDollar",
    "us$": "http://dbpedia.org/datatype/usDollar",
    "eur": "http://dbpedia.org/datatype/euro",
    "€": "http://dbpedia.org/datatype/euro",
    "gbp": "http://dbpedia.org/datatype/poundSterling",
    "£": "http://dbpedia.org/datatype/poundSterling",
    "jpy": "http://dbpedia.org/datatype/japaneseYen",
    "¥": "http://dbpedia.org/datatype/japaneseYen",
}

# standard unit → dimension label (ontology UnitProperty `dimension =` values;
# drives the dimension check in the mapping engine: a Mass value can not fill
# an Area-ranged property — UnitValueParser.scala:38-60 unit/datatype check)
DIMENSION_OF_STANDARD = {
    "squareMetre": "Area",
    "metre": "Length",
    "kilogram": "Mass",
    "second": "Time",
    "kilometrePerHour": "Speed",
    "cubicMetre": "Volume",
    "watt": "Power",
    "joule": "Energy",
    "byte": "InformationUnit",
    "kelvin": "Temperature",
}

# spelled-out unit words (UnitValueParser label tables): share the UNITS
# dimension/factor model
for _words, _std, _f in (
    ("metre metres meter meters", "metre", 1.0),
    ("kilometre kilometres kilometer kilometers", "metre", 1000.0),
    ("centimetre centimetres centimeter centimeters", "metre", 0.01),
    ("millimetre millimetres millimeter millimeters", "metre", 0.001),
    ("micrometre micrometres micrometer micrometers µm", "metre", 1e-6),
    ("nanometre nanometres nanometer nanometers nm", "metre", 1e-9),
    ("mile", "metre", 1609.344),
    ("feet foot", "metre", 0.3048),
    ("inch inches", "metre", 0.0254),
    ("yard yards", "metre", 0.9144),
    ("gram grams gramme grammes", "kilogram", 0.001),
    ("kilogram kilograms kilogramme kilogrammes", "kilogram", 1.0),
    ("tonne tonnes", "kilogram", 1000.0),
    ("pound pounds", "kilogram", 0.45359237),
    ("hectare hectares", "squareMetre", 1e4),
    ("litre litres liter liters", "cubicMetre", 0.001),
):
    for _w in _words.split():
        UNITS.setdefault(_w, (_std, _f))

# 's' alone requires whitespace before the unit so plural/decade strings
# ('1990s') don't parse as seconds; every other unit allows the glued form
# ('10m', '12km2' — UnitValueParser accepts both).
_S_FREE_ALT = "|".join(
    sorted((re.escape(u) for u in (set(UNITS) | set(AFFINE_UNITS)) if u != "s"),
           key=len, reverse=True)
)


def _unit_lookup(token: str) -> tuple[str, float, float] | None:
    """Unified (standard, scale, offset) lookup across the factor and affine
    tables."""
    if token in AFFINE_UNITS:
        return AFFINE_UNITS[token]
    u = UNITS.get(token)
    if u is not None:
        return u[0], u[1], 0.0
    return None
_UNIT_RE = re.compile(
    rf"^(-?(?:[0-9][0-9,\. ]*?|\.[0-9]+))(?:\s*({_S_FREE_ALT})|\s+(s))\s*\.?$"
)
# imperial length pair: '5 ft 10 in', '6 feet 6 inch', "6' 6''", '15ft 10in'
# → one metres value (UnitValueParser.scala:200-223 amount-pair merge)
_FT_IN_RE = re.compile(
    r"^(\d+(?:\.\d+)?)\s*(?:ft\.?|feet|foot|')\s*"
    r"(?:(\d+(?:\.\d+)?)\s*(?:in\.?|inch|inches|''|″))?\s*$"
)
# unit-carrying templates: {{convert|N|unit|...}} / {{height|ft=6|in=6}}
# (UnitValueParser.scala:102-175 catchTemplate path)
_CONVERT_TPL_RE = re.compile(r"\{\{\s*(?:convert|cvt)\s*\|([^{}]*)\}\}", re.IGNORECASE)
_HEIGHT_TPL_RE = re.compile(r"\{\{\s*height\s*\|([^{}]*)\}\}", re.IGNORECASE)


def _unit_template_value(v: str) -> tuple[float, str] | None:
    m = _CONVERT_TPL_RE.search(v)
    if m:
        parts = [p.strip() for p in m.group(1).split("|")]
        pos = [p for p in parts if "=" not in p]
        if len(pos) >= 2:
            num = _parse_double(pos[0])
            unit = _unit_lookup(pos[1])
            if num is not None and unit is not None:
                return num * unit[1] + unit[2], unit[0]
    m = _HEIGHT_TPL_RE.search(v)
    if m:
        total, std = 0.0, None
        for p in m.group(1).split("|"):
            if "=" not in p:
                continue
            k, val = p.split("=", 1)
            u = UNITS.get(k.strip())
            n = _parse_double(val.strip())
            if u is None or n is None:
                continue
            if std is None:
                std = u[0]
            if u[0] == std:
                total += n * u[1]
        if std is not None:
            return total, std
    return None


def parse_unit_value(s: str) -> tuple[float, str] | None:
    """'12 km2' → (12e6, 'squareMetre'): SI-standardized value + dimension's
    standard unit (UnitValueParser.scala:38-99 convert-to-standard path).
    Template carriers ({{convert}}, {{height}}) are tried first, then the
    imperial pair merge, then plain number+unit."""
    v = s.strip()
    if not v or not any(ch.isdigit() for ch in v):
        return None  # every unit form carries a number
    if "{{" in v:
        t = _unit_template_value(v)
        if t is not None:
            return t
    m = _FT_IN_RE.match(v)
    if m:
        inches = float(m.group(2)) if m.group(2) else 0.0
        return float(m.group(1)) * 0.3048 + inches * 0.0254, "metre"
    m = _UNIT_RE.match(v)
    if not m:
        return None
    num = _parse_double(m.group(1).strip())
    if num is None:
        return None
    std_unit, scale, offset = _unit_lookup(m.group(2) or m.group(3))
    return num * scale + offset, std_unit


# currency forms: '$100', 'US$ 1,000', '100 USD', '€5.5' — prefix or suffix
_CURRENCY_ALT = "|".join(sorted((re.escape(u) for u in INCONVERTIBLE_UNITS),
                                key=len, reverse=True))
_CURRENCY_RE = re.compile(
    rf"^(?:({_CURRENCY_ALT})\s*([0-9][0-9,\. ]*)|([0-9][0-9,\. ]*?)\s*({_CURRENCY_ALT}))\s*$",
    re.IGNORECASE,
)


# loose in-text form: '[[Pound sterling|£]] 17.3 million (2008)',
# '{{profit}} 358600000 [[United States dollar|USD]]' — after markup strip
_CURRENCY_LOOSE_RE = re.compile(
    rf"(?:({_CURRENCY_ALT})\s*|\b)([0-9][0-9,\.]*)"
    rf"(?:\s*(million|billion|trillion|thousand))?\s*(?:({_CURRENCY_ALT})\b)?",
    re.IGNORECASE,
)
_SCALE_FACTORS = {"thousand": 1e3, "million": 1e6, "billion": 1e9, "trillion": 1e12}


def parse_inconvertible_unit(s: str, loose: bool = True) -> tuple[float, str] | None:
    """InconvertibleUnitDatatype pass-through (SimplePropertyMapping.scala:
    244-276 + OntologyDatatypes): currencies keep their value IN the unit and
    get a unit-datatype IRI; no SI standardization, no specific-property
    emission. → (value, datatype IRI) or None.

    Handles the anchored form ('$100', '100 USD') and — only when ``loose``
    — the in-text form the reference's UnitValueParser test table carries
    ('[[Pound sterling|£]] 17.3 million (2008)') by stripping markup first
    and applying the ParserUtils scale words. Callers with NO declared
    Currency range pass loose=False so prose like 'born in 1990 USD' on an
    unranged unit property cannot emit a spurious currency literal."""
    v = s.strip()
    m = _CURRENCY_RE.match(v)
    if m:
        token = (m.group(1) or m.group(4)).lower()
        num = _parse_double((m.group(2) or m.group(3)).strip())
        if num is None:
            return None
        return num, INCONVERTIBLE_UNITS[token]
    if loose and any(ch.isdigit() for ch in v):
        plain = _TPL_RE.sub(" ", v)
        plain = _STRIP_LINK_RE.sub(r"\1", plain)
        plain = re.sub(r"\([^()]*\)", " ", plain)
        for lm in _CURRENCY_LOOSE_RE.finditer(plain):
            token = (lm.group(1) or lm.group(4) or "").lower()
            if not token:
                continue
            num = _parse_double(lm.group(2).strip())
            if num is None:
                continue
            if lm.group(3):
                num *= _SCALE_FACTORS[lm.group(3).lower()]
            return num, INCONVERTIBLE_UNITS[token]
    return None
_INT_RE = re.compile(r"^[-+]?[0-9][0-9,\. ]*$")
_RANK_RE = re.compile(r"^([0-9]+)\s?(?:st|nd|rd|th)\b", re.IGNORECASE)
_WIKILINK_RE = re.compile(r"^\[\[([^\]\|]+)(?:\|[^\]]*)?\]\]$")
_EXTLINK_RE = re.compile(r"^\[((?:https?|ftp)://[^\s\]]+)(?:\s[^\]]*)?\]$")
_STRIP_LINK_RE = re.compile(r"\[\[(?:[^\]\|]*\|)?([^\]\|]*)\]\]")
_STRIP_EXT_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+(?:\s([^\]]*))?\]")
_TAG_RE = re.compile(r"</?[A-Za-z][^>]*>")
_TPL_RE = re.compile(r"\{\{[^{}]*\}\}")

_SPLIT_WORDS_RE = re.compile(r"_+|\s+|-|:+")  # InfoboxExtractorConfig.SplitWordsRegex
_TRAILING_NUM_RE = re.compile(r"[0-9]+$")     # InfoboxExtractorConfig.TrailingNumberRegex
_BR_SPLIT_RE = re.compile(r"<br\s*/?>", re.IGNORECASE)  # splitPropertyNodeRegexInfobox


def property_iri(lang: str, key: str) -> str:
    """camelCase + trailing-digit strip (InfoboxExtractor.getPropertyUri,
    InfoboxExtractor.scala:289-301)."""
    words = [w for w in _SPLIT_WORDS_RE.split(key.lower().strip()) if w]
    if not words:
        return property_base(lang)
    camel = words[0] + "".join(w[:1].upper() + w[1:] for w in words[1:])
    camel = _TRAILING_NUM_RE.sub("", camel)
    # percent-encode WITHOUT the first-letter capitalization of wiki_encode
    # (getPropertyUri applies cleanSpace, not wikiEncode)
    return property_base(lang) + urllib.parse.quote(camel.replace(" ", "_"), safe="!$&'()*+,-./:;=@_~")


def property_label(key: str) -> str:
    """getPropertyLabel (InfoboxExtractor.scala:303-314)."""
    return _TRAILING_NUM_RE.sub("", key.replace("_", " ")).strip()


def _parse_int(s: str) -> int | None:
    """IntegerParser (dataparser/IntegerParser.scala:29-63), en-locale
    large-number handling: ','=thousands separator, '.'=decimal point."""
    c = s.replace(",", "").replace(" ", "").lstrip("+")
    if re.fullmatch(r"-?\d+", c):
        try:
            return int(c)
        except ValueError:
            return None
    return None


def _parse_double(s: str) -> float | None:
    c = s.replace(",", "").replace(" ", "").lstrip("+")
    if re.fullmatch(r"-?\d*\.\d+|-?\d+\.?", c):
        try:
            return float(c)
        except ValueError:
            return None
    return None


_DURATION_HMS_RE = re.compile(r"^(\d+):(\d{1,2})(?::(\d{1,2}))?$")
# months ≈ 30.4375 days, years ≈ 365.25 days (DurationParser.scala:187-189)
_DUR_SEC = {"second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0,
            "month": 86400.0 * 30.4375, "year": 86400.0 * 365.25}


def _dur_table(pairs: dict[str, str]) -> dict[str, float]:
    return {w: _DUR_SEC[u] for w, u in pairs.items()}


# en table (DurationParserConfig.scala:9-41) + ms kept from round 2
_DURATION_UNITS = {
    "ms": 0.001, "millisecond": 0.001, "milliseconds": 0.001,
    **_dur_table({
        "s": "second", "sec": "second", "secs": "second",
        "second": "second", "seconds": "second", '"': "second",
        "m": "minute", "min": "minute", "min.": "minute", "mins": "minute",
        "minu": "minute", "minute": "minute", "minutes": "minute", "'": "minute",
        "h": "hour", "hr": "hour", "hr.": "hour", "hrs": "hour", "hrs.": "hour",
        "hour": "hour", "hours": "hour",
        "d": "day", "d.": "day", "day": "day", "days": "day",
        "month": "month", "months": "month",
        "y": "year", "yr": "year", "year": "year", "years": "year",
    }),
}
# language-scoped tables REPLACE the default (timesMap.getOrElse(lang, en),
# DurationParser.scala:19) — de/fr/es from DurationParserConfig.scala:136-381
LANG_DURATION_UNITS: dict[str, dict[str, float]] = {
    "de": _dur_table({
        "sekunde": "second", "sekunden": "second", "sek": "second", "s": "second",
        "minute": "minute", "minuten": "minute", "m": "minute", "min": "minute",
        "min.": "minute", "mins": "minute",
        "stunde": "hour", "stunden": "hour", "std": "hour", "std.": "hour", "h": "hour",
        "tag": "day", "tage": "day",
        "monat": "month", "monate": "month",
        "jahr": "year", "jahre": "year",
    }),
    "fr": _dur_table({
        "seconde": "second", "secondes": "second", "sec": "second", "s": "second", '"': "second",
        "minute": "minute", "minutes": "minute", "min": "minute", "m": "minute", "'": "minute",
        "heure": "hour", "heures": "hour", "h": "hour",
        "jour": "day", "jours": "day", "j": "day",
        "mois": "month",
        "an": "year", "ans": "year", "année": "year", "années": "year",
    }),
    "es": _dur_table({
        "segundo": "second", "segundos": "second", "seg": "second", "segs": "second",
        "minuto": "minute", "minutos": "minute", "min": "minute", "mins": "minute",
        "hora": "hour", "horas": "hour",
        "dia": "day", "dias": "day", "día": "day", "días": "day",
        "mes": "month", "meses": "month",
        "año": "year", "años": "year",
    }),
    # round-5 tranche (DurationParserConfig.timesMap rows)
    "it": _dur_table({
        "secondo": "second", "secondi": "second", "sec": "second", "s": "second",
        "minuto": "minute", "minuti": "minute", "min": "minute", "m": "minute",
        "ora": "hour", "ore": "hour", "h": "hour",
        "giorno": "day", "giorni": "day", "g": "day", "gg": "day",
        "mese": "month", "mesi": "month", "anno": "year", "anni": "year",
    }),
    "nl": _dur_table({
        "seconde": "second", "seconden": "second", "sec": "second", "s": "second",
        "minuut": "minute", "minuten": "minute", "m": "minute", "min": "minute",
        "min.": "minute", "mins": "minute",
        "uur": "hour", "uren": "hour", "h": "hour",
        "dag": "day", "dagen": "day", "maand": "month", "maanden": "month",
        "jaar": "year", "jaren": "year", "jr": "year", "jr.": "year",
    }),
    "pt": _dur_table({
        "segundo": "second", "segundos": "second", "seg": "second",
        "segs": "second", "s": "second",
        "minuto": "minute", "minutos": "minute", "min": "minute", "m": "minute",
        "hora": "hour", "horas": "hour", "hrs": "hour", "hr": "hour", "h": "hour",
        "dia": "day", "dias": "day",
        "mes": "month", "meses": "month", "mês": "month",
        "ano": "year", "anos": "year", "año": "year", "años": "year",
    }),
    "cs": _dur_table({
        "s": "second", "sekunda": "second", "sekundy": "second",
        "vteřina": "second", "vteřiny": "second",
        "m": "minute", "minuta": "minute", "minuty": "minute",
        "h": "hour", "hodina": "hour", "hodiny": "hour",
        "d": "day", "den": "day", "dny": "day",
        "měsíc": "month", "měsíce": "month",
        "rok": "year", "roky": "year", "y": "year",
    }),
    "el": _dur_table({
        "δευτερόλεπτο": "second", "δευτερολεπτο": "second",
        "δευτερόλεπτα": "second", "δευτερολεπτα": "second",
        "δεύτερα": "second", "δ": "second", "δδ": "second",
        "λεπτό": "minute", "λεπτο": "minute", "λεπτά": "minute",
        "λεπτα": "minute", "λ": "minute", "λλ": "minute",
        "ώρα": "hour", "ωρα": "hour", "ώρες": "hour", "ωρες": "hour",
        "ω": "hour", "ωω": "hour",
        "ημέρα": "day", "ημερα": "day", "ημέρες": "day", "ημερες": "day",
        "η": "day", "ηη": "day",
        "μήνας": "month", "μήνα": "month", "μήνες": "month",
        "μηνας": "month", "μηνα": "month", "μηνες": "month",
        "μ": "month", "μμ": "month",
        "χρόνος": "year", "χρόνοι": "year", "χρόνια": "year",
        "χρονος": "year", "χρονοι": "year", "χρονια": "year",
        "έτος": "year", "έτη": "year", "ετος": "year", "ετη": "year",
        "ε": "year", "εε": "year",
    }),
    "ga": _dur_table({
        "soicind": "second", "s": "second", "soicindí": "second",
        "nóiméad": "minute", "nóim": "minute", "nóiméid": "minute",
        "uair": "hour", "uaireanta": "hour", "uair an chloig": "hour",
        "lá": "day", "laethanta": "day", "mí": "month", "míonna": "month",
        "bliain": "year", "blianta": "year",
    }),
    "gl": _dur_table({
        "segundo": "second", "segundos": "second", "s": "second",
        "seg": "second", "segs": "second",
        "minuto": "minute", "minutos": "minute", "m": "minute",
        "min": "minute", "mins": "minute", "'": "minute",
        "h": "hour", "hora": "hour", "horas": "hour",
        "d": "day", "día": "day", "días": "day",
        "mes": "month", "meses": "month", "ano": "year", "anos": "year",
    }),
    "mk": _dur_table({
        "секунда": "second", "секунди": "second",
        "минута": "minute", "минути": "minute",
        "саат": "hour", "саати": "hour",
        "ден": "day", "денови": "day",
        "месец": "month", "месеци": "month",
        "година": "year", "години": "year",
    }),
    "ar": _dur_table({
        "ثانية": "second", "ثا": "second", "ثواني": "second",
        "دقيقة": "minute", "د": "minute", "دقائق": "minute",
        "ساعة": "hour", "سا": "hour", "ساعات": "hour",
        "يوم": "day", "أيام": "day",
        "شهر": "month", "شهور": "month",
        "سنة": "year", "عام": "year", "سنوات": "year", "أعوام": "year",
        "حول": "year",
    }),
    "id": _dur_table({
        "detik": "second", "menit": "minute", "jam": "hour",
        "hari": "day", "bulan": "month", "tahun": "year",
    }),
    "hi": _dur_table({
        "सेकेंड": "second", "सेकेण्ड": "second", "s": "second",
        "मिनट": "minute", "'": "minute", "′": "minute", "m": "minute",
        "घंटा": "hour", "दिन": "day", "महीना": "month", "वर्ष": "year",
    }),
    "am": _dur_table({
        "ሰከንድ": "second", "ሴኮንድ": "second", "ሴኮንዶች": "second",
        "ደቂቃ": "minute", "ደቂቃዎች": "minute",
        "ሰአት": "hour", "ሰዓታት": "hour", "ሰዓት": "hour",
        "ቀን": "day", "ቀናት": "day", "ቀኖች": "day", "ቀናቶች": "day",
        "ወር": "month", "ወራት": "month", "ወሮች": "month",
        "አመት": "year", "ዓመት": "year", "ዓመታት": "year",
    }),
}
# unit token: letters INCLUDING combining marks (Python's \w excludes the
# Mc-category vowel signs Devanagari units are written with — 'मिनट' would
# otherwise truncate at its first matra)
_DURATION_NU_RE = re.compile(
    r"(\d+(?:\.\d+)?)\s*((?:[^\W\d_]|[ऀ-ॿ])+\.?|['\"]{1,2})", re.UNICODE
)

_BOOL_TRUE = frozenset(("yes", "true"))
_BOOL_FALSE = frozenset(("no", "false"))

# scale-word tables are LANGUAGE-scoped (ParserUtilsConfig.scalesMap with
# en fallback, ParserUtils.scala:16) — they contain false friends: de
# 'billion' is 10^12 while the en word is 10^9, so a merged table cannot
# represent both.  Patterns compile per table, cached.
_SCALE_WORDS = {  # en (ParserUtilsConfig.scala:8-17)
    "thousand": 1e3, "million": 1e6, "mio": 1e6, "mln": 1e6,
    "billion": 1e9, "bln": 1e9, "trillion": 1e12, "quadrillion": 1e15,
}
LANG_SCALE_WORDS: dict[str, dict[str, float]] = {
    "de": {"tausend": 1e3, "million": 1e6, "mio": 1e6, "mio.": 1e6,
           "milliarde": 1e9, "mrd": 1e9, "mrd.": 1e9, "billion": 1e12},
    "fr": {"mille": 1e3, "million": 1e6, "millions": 1e6,
           "million de": 1e6, "million d'": 1e6, "millions de": 1e6,
           "millions d'": 1e6, "milliard": 1e9, "milliards": 1e9,
           "milliard de": 1e9, "milliard d'": 1e9, "milliards de": 1e9,
           "milliards d'": 1e9, "mrd": 1e9, "billion": 1e12, "trillion": 1e18},
    "es": {"mil": 1e3, "millón": 1e6, "millones": 1e6, "mill.": 1e6,
           "millardo": 1e9, "billón": 1e12, "trillón": 1e18,
           "cuatrillón": 1e24},
    "it": {"mille": 1e3, "milione": 1e6, "milioni": 1e6, "milioni di": 1e6,
           "mln": 1e6, "miliardo": 1e9, "miliardi": 1e9, "miliardi di": 1e9,
           "bilione": 1e12},
    "nl": {"honderd": 1e2, "duizend": 1e3, "miljoen": 1e6, "mio": 1e6,
           "mln": 1e6, "miljard": 1e9, "milj.": 1e9, "mrd": 1e9,
           "biljard": 1e12, "triljoen": 1e15},
    "pl": {"tysiąc": 1e3, "tysiące": 1e3, "tysięcy": 1e3, "tys": 1e3,
           "tyś": 1e3, "milion": 1e6, "miliony": 1e6, "milionów": 1e6,
           "mln": 1e6, "miliard": 1e9, "miliardy": 1e9, "miliardów": 1e9,
           "mld": 1e9, "bilion": 1e12, "biliony": 1e12, "bilionów": 1e12,
           "bln": 1e12},
    "pt": {"mil": 1e3, "milhão": 1e6, "mil milhões": 1e9, "bilhão": 1e9,
           "bilhões": 1e9, "bilião": 1e12, "biliões": 1e12,
           "trilhão": 1e12, "trilhões": 1e12, "mil bilhões": 1e15,
           "quatrilhão": 1e15, "quatrilhões": 1e15, "trilião": 1e18,
           "triliões": 1e18},
    # round-5 tranche (ParserUtilsConfig.scaleValues rows, exponents → 10^n)
    "uk": {"тисяча": 1e3, "млн": 1e6, "мільйон": 1e6, "млрд": 1e9,
           "мільярд": 1e9, "більйон": 1e9, "трильйон": 1e12, "трлн": 1e12},
    "bg": {"млрд": 1e9, "трлн.": 1e12},
    "el": {"χιλιάδες": 1e3, "χιλιαδες": 1e3, "εκατομμύρια": 1e6,
           "εκατομμυρια": 1e6, "δισεκατομμύρια": 1e9, "δισεκατομμυρια": 1e9,
           "δισ.": 1e9, "τρισεκατομμύρια": 1e12, "τρισεκατομμυρια": 1e12,
           "τετράκις εκατομμύρια": 1e15},
    "eo": {"mil": 1e3, "miliono": 1e6, "miliardo": 1e9, "biliono": 1e12,
           "biliardo": 1e15, "triliono": 1e18},
    "ga": {"míle": 1e3, "milliún": 1e6, "billiún": 1e9, "míle milliún": 1e9,
           "trilliún": 1e12, "cuaidrilliún": 1e15},
    "gl": {"mil": 1e3, "miles": 1e3, "milleiro": 1e3, "milleiros": 1e3,
           "millar": 1e3, "millares": 1e3, "millón": 1e6, "millóns": 1e6,
           "mil millóns": 1e9, "miles de millóns": 1e9, "billón": 1e12,
           "billóns": 1e12, "mil billóns": 1e15, "miles de billóns": 1e15,
           "trillón": 1e18, "trillóns": 1e18, "cuadrillón": 1e24,
           "cuadrillóns": 1e24},
    "ca": {"milion": 1e6, "milions": 1e6, "milion de": 1e6, "milion d'": 1e6,
           "milions de": 1e6, "milions d'": 1e6, "bilion": 1e9,
           "bilions": 1e9, "bilion de": 1e9, "bilion d'": 1e9,
           "bilions de": 1e9, "bilions d'": 1e9},
    "ar": {"عشرة": 1e1, "مئة": 1e2, "ألف": 1e3, "مليون": 1e6, "مليار": 1e9,
           "بليون": 1e9, "تريليون": 1e12, "كوادريليون": 1e15},
    "am": {"አስር": 1e1, "መቶ": 1e2, "መቶዎች": 1e2, "thousand": 1e3, "ሺህ": 1e3,
           "million": 1e6, "mln": 1e6, "ሚሊዮን": 1e6, "billion": 1e9,
           "ቢሊዮን": 1e9, "bln": 1e9, "trillion": 1e12, "ትሪሊዮን": 1e12,
           "quadrillion": 1e15, "ኳድሪሊየን": 1e15},
}


def _scale_pats(lang: str | None):
    key = lang if lang in LANG_SCALE_WORDS else ""
    if key not in _SCALE_PATS_CACHE:
        words = LANG_SCALE_WORDS.get(key, _SCALE_WORDS)
        pat = re.compile(
            r"^([-+]?[0-9][0-9,\. ]*)\s*("
            + "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True))
            + r")s?$",
            re.IGNORECASE,
        )
        _SCALE_PATS_CACHE[key] = (pat, words)
    return _SCALE_PATS_CACHE[key]


_SCALE_PATS_CACHE: dict = {}


def parse_boolean(s: str) -> bool | None:
    """BooleanParser (dataparser/BooleanParser.scala:15-27): isolated
    yes/true/no/false."""
    w = s.strip().lower()
    if w in _BOOL_TRUE:
        return True
    if w in _BOOL_FALSE:
        return False
    return None


def parse_duration(s: str, lang: str | None = None) -> float | None:
    """DurationParser (dataparser/DurationParser.scala:23-55): 'h:mm:ss' or
    '<N> <unit>' sequences → seconds.  The unit-word table is language-
    scoped and REPLACES the en default when ``lang`` has one (the
    reference's timesMap.getOrElse)."""
    units = LANG_DURATION_UNITS.get(lang or "", _DURATION_UNITS)
    v = s.strip()
    m = _DURATION_HMS_RE.match(v)
    if m:
        h, mnt = int(m.group(1)), int(m.group(2))
        sec = int(m.group(3)) if m.group(3) else 0
        if m.group(3) is None:
            # m:ss when the first field is small? reference treats 2-field
            # as minutes:seconds only for known contexts; we use h:mm
            return float(h * 3600 + mnt * 60)
        return float(h * 3600 + mnt * 60 + sec)
    total = 0.0
    found = False
    for num, unit in _DURATION_NU_RE.findall(v):
        f = units.get(unit.lower())
        if f is None:
            return None
        total += float(num) * f
        found = True
    return total if found else None


def parse_scaled_number(s: str, lang: str | None = None) -> float | None:
    """'1.2 million' → 1200000.0 (ParserUtils number-word tables, the
    language's table replacing the en default when one exists)."""
    pat, words = _scale_pats(lang)
    m = pat.match(s.strip())
    if not m:
        return None
    base = _parse_double(m.group(1).strip())
    if base is None:
        return None
    return base * words[m.group(2).lower()]


def parse_enumeration(s: str, values: dict[str, str]) -> str | None:
    """EnumerationParser (dataparser/EnumerationParser.scala): map a literal
    against an ontology enumeration datatype's allowed values."""
    return values.get(s.strip().lower())


# {{flagicon|COUNTRY}} → country title (FlagTemplateParser semantics;
# per-language code tables are config)
_FLAG_CODES = {
    "usa": "United States", "uk": "United Kingdom", "ger": "Germany",
    "fra": "France", "esp": "Spain", "ita": "Italy",
}
# per-language flag template names (templateNameMap,
# FlagTemplateParserConfig.scala:10-41); unknown languages fall back to en
_FLAG_TEMPLATES = {
    "en": frozenset(("flagicon", "flag", "flagcountry")),
    "es": frozenset(("bandera", "bandera2")),
    "eu": frozenset(("bandera",)),
    "fr": frozenset(("drapeau", "drapeau2")),
    "ja": frozenset(("flagicon", "flagicon2", "flag", "flagcountry")),
    "pl": frozenset(("państwo", "państwol", "państwolink", "bandera")),
    "sv": frozenset(("flagga",)),
}


_FLAG_CODE_TABLES: dict[str, dict[str, str]] = {}


def _flag_codes(lang: str | None) -> dict[str, str]:
    """ISO3-code → localized country name for ``lang``
    (FlagTemplateParserConfig.baseLangCodeMap, harvested to
    fixtures/flag_codes.json by tools/harvest_flag_codes.py). Languages
    without a table use the built-in en sample + passthrough (the reference
    falls back to JDK Locale display names there — unavailable offline,
    documented divergence)."""
    if not _FLAG_CODE_TABLES:
        import json
        import os

        path = os.path.join(os.path.dirname(__file__), "fixtures", "flag_codes.json")
        try:
            with open(path, encoding="utf-8") as fh:
                _FLAG_CODE_TABLES.update(json.load(fh))
        except OSError:
            pass
        _FLAG_CODE_TABLES.setdefault("", {})
    return _FLAG_CODE_TABLES.get(lang or "", {})


def parse_flag_template(name: str, first_param: str, lang: str | None = None) -> str | None:
    """dataparser/FlagTemplateParser.scala: flagicon/flag templates name a
    country by code or full name; template names AND code tables are per
    language with an en fallback."""
    names = _FLAG_TEMPLATES.get(lang or "en", _FLAG_TEMPLATES["en"])
    if name.strip().lower() not in names:
        return None
    v = first_param.strip()
    if not v:
        return None
    by_code = _flag_codes(lang).get(v.upper())
    if by_code:
        return by_code
    return _FLAG_CODES.get(v.lower(), v[0].upper() + v[1:])


def parse_date(s: str, strict: bool = True, resolve_template=None, lang: str | None = None) -> tuple[str, str] | None:
    """DateTimeParser facade for the value cascade: full-date families (all
    8, kgforge/dates.py) incl. the template-date path, then a gYearMonth
    fallback ('June 1984' → gYearMonth — the reference's InfoboxExtractor
    runs its xsd:date then gYearMonth parsers in sequence,
    InfoboxExtractor.scala:39-42,184-191). Bare years still do NOT become
    gYear here (SURVEY §7 divergence: every integer would type as gYear);
    mapping rules with an explicit gYear range parse years via find_date."""
    r = find_date(s, XSD_DATE, strict=strict, resolve_template=resolve_template, lang=lang)
    if r:
        return r
    return find_date(s, XSD_GYEARMONTH, strict=strict, resolve_template=resolve_template, lang=lang)


# --- free-text geo coordinates ---------------------------------------------
# GeoCoordinateParser free-text families (GeoCoordinateParser.scala:34-48):
# DMS pair "51º12'00''N 3º13'E", German slash form "20/35/16/S 5/10//W",
# and a decimal pair "51.2 N 3.21 E".  Hemisphere letters are LANGUAGE-
# scoped (longitudeLetterMap/latitudeLetterMap,
# GeoCoordinateParserConfig.scala:19-65): 'O' means east in af/de/fr/nl
# (Ost/Oos/Oost) but WEST in es/it/pt (Oeste/Ovest); non-Latin scripts
# carry their own letters (bg И/З С/Ю, ja 東/西 北/南, pl wsch/zach
# płn/płd, …) — the pattern set compiles per letter set, cached, with
# multi-character letters as longest-first alternations.
_LON_EXTRA: dict[str, dict[str, str]] = {
    "af": {"O": "E"},
    "de": {"O": "E"}, "fr": {"O": "E"}, "nl": {"O": "E"},
    "es": {"O": "W"}, "it": {"O": "W"}, "pt": {"O": "W"},
    "ar": {"شرق": "E", "غرب": "W"},
    "bg": {"И": "E", "З": "W"},
    "cs": {"V": "E", "Z": "W"},
    "hi": {"पू": "E", "प": "W"},
    "ja": {"東": "E", "西": "W"},
    "ko": {"동": "E", "서": "W", "東": "E", "西": "W"},
    "mk": {"И": "E", "З": "W"},
    "pl": {"wsch": "E", "zach": "W"},
    "ru": {"В": "E", "З": "W"},
    "zh": {"东": "E", "西": "W", "東": "E", "西": "W"},
}
_LAT_EXTRA: dict[str, dict[str, str]] = {
    "ar": {"شمال": "N", "جنوب": "S"},
    "bg": {"С": "N", "Ю": "S"},
    "hi": {"उ": "N", "द": "S"},
    "ja": {"北": "N", "南": "S"},
    "ko": {"북": "N", "남": "S", "北": "N", "南": "S"},
    "mk": {"С": "N", "Ј": "S"},
    "pl": {"płn": "N", "płd": "S"},
    "ru": {"С": "N", "Ю": "S"},
    "zh": {"北": "N", "南": "S"},
}


def _alt(letters: dict[str, str]) -> str:
    return "|".join(sorted((re.escape(x) for x in letters), key=len, reverse=True))


def _geo_pats(lang: str | None):
    extra = {
        **_LON_EXTRA.get(lang or "", {}),
        **_LAT_EXTRA.get(lang or "", {}),
    }
    key = "".join(sorted(extra))
    if key not in _GEO_PATS_CACHE:
        lon = _alt({"E": "E", "W": "W", **_LON_EXTRA.get(lang or "", {})})
        lat = _alt({"N": "N", "S": "S", **_LAT_EXTRA.get(lang or "", {})})
        _GEO_PATS_CACHE[key] = (
            re.compile(
                rf"([0-9]{{1,2}})[º°]\s?([0-9]{{1,2}})['′/]\s?([0-9]{{1,2}}(?:\.[0-9]{{1,2}})?)?[\"″']*\s?({lat})"
                rf"[\s,]+([0-9]{{1,3}})[º°]\s?([0-9]{{1,2}})['′/]\s?([0-9]{{1,2}}(?:\.[0-9]{{1,2}})?)?[\"″']*\s?({lon})"
            ),
            re.compile(
                rf"(\d{{1,2}})/(\d{{1,2}})/(\d{{0,2}}(?:\.\d{{1,2}})?)/?\s?({lat})"
                rf"[\s,]+(\d{{1,3}})/(\d{{1,2}})/(\d{{0,2}}(?:\.\d{{1,2}})?)/?\s?({lon})"
            ),
            re.compile(
                rf"(-?[0-9]{{1,2}}(?:\.[0-9]+)?)\s?[º°]?\s?({lat})[\s,]+(-?[0-9]{{1,3}}(?:\.[0-9]+)?)\s?[º°]?\s?({lon})"
            ),
            re.compile(rf"([0-9]{{1,2}})/([0-9]{{1,2}})/([0-9]{{0,2}}(?:\.[0-9]{{1,2}})?)/?\s?({lat})"),
            re.compile(
                rf"([0-9]{{1,3}})/([0-9]{{1,2}})/([0-9]{{0,2}}(?:\.[0-9]{{1,2}})?)/?\s?({lon})"
            ),
        )
    return _GEO_PATS_CACHE[key], extra


_GEO_PATS_CACHE: dict = {}
(_DMS_PAIR_RE, _SLASH_PAIR_RE, _DEC_PAIR_RE, _SINGLE_LAT_RE, _SINGLE_LON_RE) = _geo_pats(None)[0]


def _dms(deg, minute, sec, hem, extra=None) -> float:
    hem = (extra or {}).get(hem, hem)
    v = float(deg) + float(minute) / 60.0 + (float(sec) if sec else 0.0) / 3600.0
    return -v if hem in ("S", "W") else v


def parse_geo_text(s: str, lang: str | None = None) -> tuple[float, float] | None:
    """Free-text coordinate pair → (lat, lon) (GeoCoordinateParser
    parseGeoCoordinate over text nodes, longitude letters per language)."""
    (dms_re, slash_re, dec_re, _, _), extra = _geo_pats(lang)
    m = dms_re.search(s) or slash_re.search(s)
    if m:
        lat = _dms(m.group(1), m.group(2), m.group(3), m.group(4), extra)
        lon = _dms(m.group(5), m.group(6), m.group(7), m.group(8), extra)
        if abs(lat) <= 90.0 and abs(lon) <= 180.0:
            return lat, lon
        return None
    m = dec_re.search(s)
    if m:
        lat_hem = extra.get(m.group(2), m.group(2))
        lon_hem = extra.get(m.group(4), m.group(4))
        lat = float(m.group(1)) * (-1 if lat_hem == "S" else 1)
        lon = float(m.group(3)) * (-1 if lon_hem == "W" else 1)
        if abs(lat) <= 90.0 and abs(lon) <= 180.0:
            return lat, lon
    return None


def parse_single_coordinate(s: str, kind: str, lang: str | None = None) -> float | None:
    """One latitude OR longitude (SingleGeoCoordinateParser). kind =
    'lat' | 'lon'. Accepts the slash DMS form or a plain decimal."""
    v = s.strip()
    (_, _, _, lat_re, lon_re), extra = _geo_pats(lang)
    pat = lat_re if kind == "lat" else lon_re
    m = pat.search(v)
    if m:
        val = _dms(m.group(1), m.group(2), m.group(3), m.group(4), extra)
    else:
        d = _parse_double(v)
        if d is None:
            return None
        val = d
    limit = 90.0 if kind == "lat" else 180.0
    return val if abs(val) <= limit else None


def plain_string(s: str) -> str:
    """StringParser (dataparser/StringParser.scala:15-53): plain text of the
    value — links → labels, templates/tags dropped, emphasis stripped."""
    t = _TPL_RE.sub("", s)
    t = _STRIP_LINK_RE.sub(r"\1", t)
    t = _STRIP_EXT_RE.sub(lambda m: m.group(1) or "", t)
    t = _TAG_RE.sub(" ", t)
    t = t.replace("'''", "").replace("''", "")
    return " ".join(t.split())


def type_value(lang: str, value: str, resolve_template=None) -> tuple[str, str | None] | None:
    """One infobox property value → (lexical value, datatype IRI | None).
    None result ⇒ nothing parseable (no quad). datatype None ⇒ IRI object.
    Cascade order = InfoboxExtractor.extractValue (:179-197).
    ``resolve_template`` maps template names through Template-ns redirects
    for the date parsers' template path."""
    v = value.strip()
    if not v:
        return None
    # 1. unit value (UnitValueParser: convert to the dimension's standard unit)
    uv = parse_unit_value(v)
    if uv is not None:
        si, std_unit = uv
        return fmt_double(si), DBPEDIA_DT + std_unit
    # 2. dates
    d = parse_date(v, resolve_template=resolve_template, lang=lang)
    if d:
        return d
    # 3. single coordinate — handled by GeoExtractor path; skipped here
    # 4. number
    if _INT_RE.match(v):
        iv = _parse_int(v)
        if iv is not None:
            return str(iv), XSD_INTEGER
        dv = _parse_double(v)
        if dv is not None:
            return fmt_double(dv), XSD_DOUBLE
    # 5. rank ("5th")
    m = _RANK_RE.match(v)
    if m:
        return m.group(1), XSD_INTEGER
    # 6. links — object (internal) then external (ObjectParser / LinkParser)
    m = _WIKILINK_RE.match(v)
    if m:
        ns, rest = split_namespace(m.group(1).split("#")[0])
        title = normalize_title(rest)
        if title:
            return resource_base(lang) + wiki_encode(title_with_namespace(ns, title)), None
    m = _EXTLINK_RE.match(v)
    if m:
        return m.group(1), None
    # 7. langString fallback
    p = plain_string(v)
    if p:
        return p, RDF_LANGSTRING
    return None


