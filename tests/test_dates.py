"""DateTimeParser port: the en rows of the reference's DateTimeParserTest
(core/src/test/scala/.../dataparser/DateTimeParserTest.scala, parser built
non-strict at :749) plus strict-mode cascade checks."""

import pytest

from kgforge.dates import find_date
from kgforge.namespaces import XSD_DATE, XSD_GMONTHDAY, XSD_GYEAR, XSD_GYEARMONTH


def lex(text, dt, strict=False):
    r = find_date(text, dt, strict=strict)
    return r[0] if r else None


# (datatype, input, expected) — ported 1:1 from DateTimeParserTest.scala
EN_CASES = [
    (XSD_GYEAR, "2008", "2008"),
    (XSD_GYEAR, "20 BC", "-0020"),
    (XSD_GYEAR, "20008", None),
    (XSD_GYEAR, "20000 BC", None),
    (XSD_GYEAR, "0000", None),
    (XSD_GYEAR, "20 AD", "0020"),
    (XSD_GYEAR, "AD 20", "0020"),
    (XSD_GYEAR, "20 CE", "0020"),
    (XSD_GYEAR, "20 BCE", "-0020"),
    (XSD_GYEAR, "[[20 BCE]]", "-0020"),
    (XSD_GMONTHDAY, "4th of July", "--07-04"),
    (XSD_GMONTHDAY, "32nd of July", None),
    (XSD_GMONTHDAY, "February ", None),
    (XSD_GMONTHDAY, "May 1", "--05-01"),
    (XSD_GMONTHDAY, "December 3rd", "--12-03"),
    (XSD_GYEARMONTH, "June 2007", "2007-06"),
    (XSD_GYEARMONTH, "June 2007 BC", "-2007-06"),
    (XSD_GYEARMONTH, "June, 2007", "2007-06"),
    (XSD_GYEARMONTH, "Bradley's Barn, [[Mt. Juliet]], [[Tennessee]], October 1969", "1969-10"),
    (XSD_GYEARMONTH, "December 1959, at Dukoff Studios, [[Miami, Florida|Miami, Fla.]]", "1959-12"),
    (XSD_DATE, "June, 21 2007", "2007-06-21"),
    (XSD_DATE, "June, 31 2007", None),
    (XSD_DATE, "February, 30 2007", None),
    (XSD_DATE, "June, 21 2007 09:32", "2007-06-21"),
    (XSD_DATE, "28 June 548 (aged 48)", "0548-06-28"),
    (XSD_DATE, "1st May 2006", "2006-05-01"),
    (XSD_DATE, "6 June 07", "2007-06-06"),
    (XSD_DATE, "10/01/2007", "2007-01-10"),
    (XSD_DATE, "10-01-2200", "2200-01-10"),
    (XSD_DATE, "[[13991-10-25]]", None),
    (XSD_DATE, "19999-12-24", None),
    (XSD_DATE, "00-44-00000", None),
    (XSD_DATE, "010/10/20072", None),
    (XSD_DATE, "[[September 26]] , 1995", "1995-09-26"),
    (XSD_DATE, "[[1st May]] [[2006]]", "2006-05-01"),
    (XSD_DATE, "1990 06 24", "1990-06-24"),
    (XSD_DATE, "1990-06-24", "1990-06-24"),
    (XSD_DATE, "1977-01-01 00:00:00.000000", "1977-01-01"),
    (XSD_DATE, "24-june-1867", "1867-06-24"),
    (XSD_DATE, "1520, March 16", "1520-03-16"),
    # template path
    (XSD_DATE, "{{birth date |1912|10|12|}}", "1912-10-12"),
    (XSD_DATE, "{{Birth date|1974|8|16|df=no}}", "1974-08-16"),
    (XSD_DATE, "{{start date|2006|9|16}}", "2006-09-16"),
    (XSD_DATE, "{{Bda|1981|06|03}}", "1981-06-03"),
    (XSD_DATE, "{{Bda|1981|06|03|mf=y}}", "1981-06-03"),
    (XSD_DATE, "{{Birth date|df=y|1879|3|14}}", "1879-03-14"),
    (XSD_DATE, "{{Birth date|df=yes|1879|3|14}}", "1879-03-14"),
    (XSD_DATE, "{{Birth date| df=yes |1879|3|14}}", "1879-03-14"),
    (XSD_DATE, "{{Birth date | 1993 | 2 | 24 | df=yes }}", "1993-02-24"),
    (XSD_DATE, "{{birth date and age|1941|2|20}}", "1941-02-20"),
    (XSD_DATE, "{{Dda|1966|7|19|1887|5|21|df=yes}}", "1966-07-19"),
    (XSD_DATE, "{{Death date|1993|2|4|df=yes}}", "1993-02-04"),
    (XSD_DATE, "{{Death date and age|df=yes|1955|4|18|1879|3|14}}", "1955-04-18"),
    (XSD_DATE, "{{birthDeathAge|1976|1|1|2007|1|1}}", "2007-01-01"),
    (XSD_DATE, "{{birthDeathAge|B|1976|1|1|2007|1|1}}", "1976-01-01"),
    (XSD_DATE, "{{birth-date|January 16, 1948}}", "1948-01-16"),
    (XSD_DATE, "{{death-date|January 16, 1948 }} (aged {{age|1878|7|13|1948|1|16}})", "1948-01-16"),
]


@pytest.mark.parametrize("dt,text,expected", [(c[0], c[1], c[2]) for c in EN_CASES])
def test_reference_table(dt, text, expected):
    assert lex(text, dt) == expected


def test_strict_mode_rejects_embedded_dates():
    """InfoboxExtractor builds its date parsers strict: surrounding prose
    must reject the value."""
    assert lex("28 June 548 (aged 48)", XSD_DATE, strict=True) is None
    assert lex("28 June 548", XSD_DATE, strict=True) == "0548-06-28"
    assert lex("{{birth date|1912|10|12}}", XSD_DATE, strict=True) == "1912-10-12"


def test_template_redirect_resolution():
    """catchTemplate resolves the template name through the Template-ns
    redirect map before the templateDateMap lookup
    (DateTimeParser.scala:110)."""
    resolver = {"geburtsdatum": "birth date"}.get

    def resolve(name):
        return resolver(name, name)

    assert find_date("{{Geburtsdatum|1980|5|17}}", XSD_DATE) is None
    r = find_date("{{Geburtsdatum|1980|5|17}}", XSD_DATE, resolve_template=resolve)
    assert r == ("1980-05-17", XSD_DATE)


def test_parse_date_facade_gyearmonth_fallback():
    from kgforge.dataparsers import parse_date

    assert parse_date("17 June 1984") == ("1984-06-17", XSD_DATE)
    assert parse_date("June 1984") == ("1984-06", XSD_GYEARMONTH)
    assert parse_date("{{birth date|1984|6|17}}") == ("1984-06-17", XSD_DATE)
    assert parse_date("2020-99-99") is None


# ---------------------------------------------------------------------------
# language-scoped template tables (DateTimeParserConfig.templateDateMap,
# DateTimeParserTest fr/el/ja rows ported 1:1)
# ---------------------------------------------------------------------------

LANG_CASES = [
    ("fr", XSD_DATE, "{{Date|18|03|1996}}", "1996-03-18"),
    ("fr", XSD_DATE, "{{date|19|septembre|1996}}", "1996-09-19"),
    ("fr", XSD_DATE, "15 mars 44 av. J.-C.", "-0044-03-15"),
    ("fr", XSD_DATE, "15 mars 44 ap. J.-C.", "0044-03-15"),
    ("fr", XSD_DATE, "15 mars 44", "1944-03-15"),
    ("fr", XSD_DATE, "{{Date de naissance|1|1|-711}}", "-0711-01-01"),
    ("fr", XSD_DATE, "15", None),
    ("fr", XSD_DATE, "15.25", None),
    ("fr", XSD_DATE, "15,25", None),
    ("el", XSD_DATE, "{{ηθηλ|1996|03|18}}", "1996-03-18"),
    ("ja", XSD_DATE, "{{生年月日と年齢|1989|7|23}}", "1989-07-23"),
    # partial specs: year(+month) only -> render only for gYear/gYearMonth
    ("fr", XSD_GYEARMONTH, "{{Année de naissance et âge|1996|3}}", "1996-03"),
    ("fr", XSD_DATE, "{{Année de naissance et âge|1996|3}}", None),
    ("ja", XSD_GYEAR, "{{年|1989}}", "1989"),
    # the en/default table still applies under a language scope
    ("fr", XSD_DATE, "{{Start date|1996|3|18}}", "1996-03-18"),
    # final tranche — the 11 remaining templateDateMap languages
    ("ar", XSD_DATE, "{{تاريخ الولادة|1996|3|18}}", "1996-03-18"),
    ("bg", XSD_DATE, "{{Дата на раждане|1996|3|18}}", "1996-03-18"),
    ("bg", XSD_DATE, "{{роден|18|3|1996}}", "1996-03-18"),
    ("id", XSD_DATE, "{{Tanggal lahir dan umur|1996|3|18}}", "1996-03-18"),
    ("id", XSD_DATE, "{{lahirmati|x|1996|3|18}}", "1996-03-18"),
    ("it", XSD_DATE, "{{Data di nascita|18|3|1996}}", "1996-03-18"),
    ("it", XSD_GYEAR, "{{nascita anno|1996}}", "1996"),
    ("nl", XSD_DATE, "{{geboren|18|3|1996}}", "1996-03-18"),
    ("pt", XSD_DATE, "{{Nascimento|1996|3|18}}", "1996-03-18"),
    ("ru", XSD_DATE, "{{ДатаРождения|18|3|1996}}", "1996-03-18"),
    ("ru", XSD_DATE, "{{Start date|1996|3|18}}", "1996-03-18"),
    ("sk", XSD_DATE, "{{Dátum narodenia a vek|1996|3|18}}", "1996-03-18"),
    ("sl", XSD_DATE, "{{Datum rojstva|1996|3|18}}", "1996-03-18"),
    ("uk", XSD_DATE, "{{Дата народження|18|3|1996}}", "1996-03-18"),
    ("uk", XSD_DATE, "{{Вік|1996|3|18}}", "1996-03-18"),
    # ga rows are inert in the reference (Irish role keys its reader never
    # consults, DateTimeParser.scala:125-127) — reproduced: no extraction
    ("ga", XSD_DATE, "{{dáta breithe|1996|3|18}}", None),
]


@pytest.mark.parametrize("lang,dt,text,want", LANG_CASES)
def test_language_scoped_template_dates(lang, dt, text, want):
    from kgforge.dates import find_date

    r = find_date(text, dt, strict=False, lang=lang)
    assert (r[0] if r else None) == want


@pytest.mark.parametrize(
    "lang,dt,text,want",
    [
        ("es", XSD_DATE, "15 marzo 44", "1944-03-15"),
        ("it", XSD_DATE, "15 marzo 44", "1944-03-15"),
        ("nl", XSD_DATE, "15 maart 1944", "1944-03-15"),
        ("pl", XSD_DATE, "15 marca 1944", "1944-03-15"),
        ("pt", XSD_DATE, "15 janeiro 1944", "1944-01-15"),
        ("pl", XSD_GYEAR, "44 p.n.e.", "-0044"),
        (None, XSD_GYEAR, "44 v.Chr.", "-0044"),   # de era stays in default
        ("es", XSD_GYEAR, "44 A.C.", "-0044"),
        ("pt", XSD_GYEAR, "44 D.C.", "0044"),
        # language-SCOPED tables must not leak into other languages'
        # parsing (the reference's monthsMap is per language): 'Mayo' the
        # clinic / 'Maja' the name must not become May in default text
        (None, XSD_GYEARMONTH, "Mayo 1984", None),
        (None, XSD_GYEARMONTH, "Maja 1990", None),
        ("en", XSD_DATE, "15 maart 1944", None),
        # round-5 tranche (DateTimeParserConfig.monthsMap/eraStrMap rows)
        ("ru", XSD_DATE, "3 июня 1981", "1981-06-03"),
        ("ru", XSD_DATE, "3 июнь 1981", "1981-06-03"),     # nominative
        ("uk", XSD_DATE, "24 серпня 1991", "1991-08-24"),
        ("sv", XSD_DATE, "15 maj 1648", "1648-05-15"),
        ("sv", XSD_GYEAR, "44 f.Kr.", "-0044"),
        ("sv", XSD_GYEAR, "44 e.Kr.", "0044"),
        ("id", XSD_DATE, "17 agustus 1945", "1945-08-17"),
        ("hr", XSD_DATE, "1 siječanj 2000", "2000-01-01"),
        ("cs", XSD_DATE, "28 říjen 1918", "1918-10-28"),
        ("el", XSD_DATE, "25 μαρτίου 1821", "1821-03-25"),
        ("el", XSD_GYEAR, "480 ΠΧ", "-0480"),
        ("gl", XSD_DATE, "17 xuño 1982", "1982-06-17"),
        ("gl", XSD_GYEAR, "218 a.C.", "-0218"),
        ("ga", XSD_DATE, "1 bealtaine 1937", "1937-05-01"),
        ("ga", XSD_DATE, "9 meán fómhair 1948", "1948-09-09"),
        ("bg", XSD_DATE, "3 март 1878", "1878-03-03"),
        ("bg", XSD_GYEAR, "681 пр.н.е.", "-0681"),
        ("mk", XSD_DATE, "2 август 1903", "1903-08-02"),
        ("sk", XSD_DATE, "1 január 1993", "1993-01-01"),
        ("eo", XSD_DATE, "15 decembro 1859", "1859-12-15"),
        ("ar", XSD_DATE, "14 يناير 2011", "2011-01-14"),
        # (year-first CJK ordering '1945年8月' is outside the reference's
        # regex families too — ja full dates go through templateDateMap)
        ("ja", XSD_GYEARMONTH, "8月 1945", "1945-08"),
        ("ja", XSD_GYEAR, "西暦 2001", "2001"),
        # scoping: Russian genitive months never fire outside ru
        ("en", XSD_DATE, "3 июня 1981", None),
        (None, XSD_GYEARMONTH, "maj 1648", None),
        # final tranche — am / eu / hi complete the monthsMap (26/26) and
        # eu / hi the eraStrMap (17/17)
        ("am", XSD_DATE, "11 ሜይ 1991", "1991-05-11"),
        ("eu", XSD_DATE, "15 maiatza 1648", "1648-05-15"),
        ("eu", XSD_GYEAR, "44 K.a.", "-0044"),
        ("hi", XSD_DATE, "15 अगस्त 1947", "1947-08-15"),
        ("hi", XSD_GYEAR, "56 ई.पू.", "-0056"),
        # per-language cardinality suffixes (cardinalityRegexMap)
        ("sv", XSD_DATE, "15:e maj 1648", "1648-05-15"),
        ("nl", XSD_DATE, "1e januari 2000", "2000-01-01"),
        ("ga", XSD_DATE, "9ú bealtaine 1948", "1948-05-09"),
    ],
)
def test_language_scoped_month_and_era_tables(lang, dt, text, want):
    from kgforge.dates import find_date

    r = find_date(text, dt, strict=False, lang=lang)
    assert (r[0] if r else None) == want


def test_language_tables_reach_the_production_cascade(spark=None):
    """The fr template table must fire through the PRODUCTION entry points
    (type_value / type_by_range / parse_date), not only via find_date."""
    from kgforge.dataparsers import parse_date, type_value
    from kgforge.mapping_engine import type_by_range

    assert parse_date("{{Date|18|03|1996}}", strict=False, lang="fr") == (
        "1996-03-18", XSD_DATE
    )
    assert type_value("fr", "{{Date|18|03|1996}}") == ("1996-03-18", XSD_DATE)
    r = type_by_range("fr", "{{Date de naissance|1|1|-711}}", "datatype", XSD_DATE)
    assert r is not None and r[0] == "-0711-01-01"
    # es month names reach the free-text chain through the cascade
    assert type_value("es", "15 marzo 1944")[0] == "1944-03-15"
    # and stay scoped: the en cascade does not see them
    assert type_value("en", "15 marzo 1944") in (None, ("15 marzo 1944", None)) or \
        type_value("en", "15 marzo 1944")[1] != XSD_DATE
