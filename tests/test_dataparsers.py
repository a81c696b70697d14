"""Value-typing cascade tests (ports of the reference's DataParser test
tables — core/src/test/scala/.../dataparser/*Test.scala)."""

from kgforge.dataparsers import parse_date, plain_string, property_iri, property_label, type_value
from kgforge.namespaces import (
    RDF_LANGSTRING,
    XSD_DATE,
    XSD_DOUBLE,
    XSD_GYEARMONTH,
    XSD_INTEGER,
)


def test_property_iri_camelcase_and_digit_strip():
    # InfoboxExtractor.getPropertyUri (InfoboxExtractor.scala:289-301)
    pb = "http://dbpedia.org/property/"
    assert property_iri("en", "population") == pb + "population"
    assert property_iri("en", "area_km2") == pb + "areaKm"
    assert property_iri("en", "leader_name1") == pb + "leaderName"
    assert property_iri("en", "Leader Name") == pb + "leaderName"
    assert property_iri("de", "name") == "http://de.dbpedia.org/property/name"


def test_property_label():
    assert property_label("area_km2") == "area km"
    assert property_label("leader_name1") == "leader name"


def test_integer_parsing():
    assert type_value("en", "12,345") == ("12345", XSD_INTEGER)
    assert type_value("en", "-7") == ("-7", XSD_INTEGER)


def test_double_parsing():
    assert type_value("en", "33.5") == ("33.5", XSD_DOUBLE)


def test_rank():
    assert type_value("en", "5th") == ("5", XSD_INTEGER)
    assert type_value("en", "23rd largest") == ("23", XSD_INTEGER)


def test_unit_values_standardized():
    # UnitValueParser semantics: convert to standard unit of the dimension
    v, dt = type_value("en", "33.5 km2")
    assert dt == "http://dbpedia.org/datatype/squareMetre"
    assert v == repr(33.5 * 1e6)
    v, dt = type_value("en", "34 m")
    assert (v, dt) == ("34.0", "http://dbpedia.org/datatype/metre")
    v, dt = type_value("en", "3 km")
    assert (v, dt) == ("3000.0", "http://dbpedia.org/datatype/metre")


def test_dates():
    assert parse_date("3 June 1981") == ("1981-06-03", XSD_DATE)
    assert parse_date("June 3, 1981") == ("1981-06-03", XSD_DATE)
    assert parse_date("1981-06-03") == ("1981-06-03", XSD_DATE)
    assert parse_date("June 1981") == ("1981-06", XSD_GYEARMONTH)
    assert parse_date("12345") is None  # bare numbers are NOT dates
    # de/fr month names
    assert parse_date("3. März 1981") == ("1981-03-03", XSD_DATE)


def test_object_link():
    v, dt = type_value("en", "[[Other Page]]")
    assert (v, dt) == ("http://dbpedia.org/resource/Other_Page", None)
    v, dt = type_value("de", "[[Anderes|label]]")
    assert (v, dt) == ("http://de.dbpedia.org/resource/Anderes", None)


def test_external_link():
    v, dt = type_value("en", "[http://www.example.org/x]")
    assert (v, dt) == ("http://www.example.org/x", None)


def test_langstring_fallback():
    v, dt = type_value("en", "Just some '''text''' here")
    assert (v, dt) == ("Just some text here", RDF_LANGSTRING)


def test_empty_and_template_only_values_drop():
    assert type_value("en", "") is None
    assert type_value("en", "{{coord|1|2|N|3|4|E}}") is None


def test_plain_string():
    assert plain_string("a [[B|bee]] c [http://x.org ex] d") == "a bee c ex d"


def test_duration():
    from kgforge.dataparsers import parse_duration

    assert parse_duration("1:30:05") == 5405.0
    assert parse_duration("2:15") == 8100.0
    assert parse_duration("90 min") == 5400.0
    assert parse_duration("1 h 30 min") == 5400.0
    assert parse_duration("no duration") is None


def test_duration_language_tables_round5():
    from kgforge.dataparsers import parse_duration as p

    assert p("90 menit", lang="id") == 5400.0
    assert p("2 ore", lang="it") == 7200.0
    assert p("3 uur", lang="nl") == 10800.0
    assert p("2 horas", lang="pt") == 7200.0
    assert p("5 minuty", lang="cs") == 300.0
    assert p("2 ώρες", lang="el") == 7200.0
    assert p("3 nóiméad", lang="ga") == 180.0
    assert p("2 саати", lang="mk") == 7200.0
    assert p("3 دقائق", lang="ar") == 180.0
    assert p("2 मिनट", lang="hi") == 120.0  # Mc vowel signs in the token
    assert p("1 ደቂቃ", lang="am") == 60.0
    # scoped: id 'jam' is not an en unit
    assert p("2 jam") is None


def test_boolean():
    from kgforge.dataparsers import parse_boolean

    assert parse_boolean(" Yes ") is True
    assert parse_boolean("FALSE") is False
    assert parse_boolean("maybe") is None


def test_scaled_numbers():
    from kgforge.dataparsers import parse_scaled_number

    assert parse_scaled_number("1.2 million") == 1.2e6
    assert parse_scaled_number("3 thousand") == 3e3
    assert parse_scaled_number("7") is None


def test_enumeration():
    from kgforge.dataparsers import parse_enumeration

    enum = {"male": "M", "female": "F"}
    assert parse_enumeration(" Male ", enum) == "M"
    assert parse_enumeration("other", enum) is None


def test_flag_template():
    from kgforge.dataparsers import parse_flag_template

    assert parse_flag_template("flagicon", "GER") == "Germany"
    assert parse_flag_template("flagicon", "atlantis") == "Atlantis"
    assert parse_flag_template("infobox x", "GER") is None


def test_unit_requires_space_for_short_units():
    """'1990s' is a decade, not 1990 seconds (UnitValueParser only accepts a
    unit token separated from the number)."""
    from kgforge.dataparsers import parse_unit_value, type_value

    assert parse_unit_value("1990s") is None
    assert parse_unit_value("1960s") is None
    r = type_value("en", "1990s")
    assert r is None or "second" not in (r[1] or "")
    assert parse_unit_value("30 s") == (30.0, "second")
    assert parse_unit_value("12km2") == (12e6, "squareMetre")


def test_ft_in_merge():
    """'5 ft 10 in' merges into one metres value
    (UnitValueParser.scala:200-223)."""
    from kgforge.dataparsers import parse_unit_value

    si, unit = parse_unit_value("5 ft 10 in")
    assert unit == "metre"
    assert abs(si - (5 * 0.3048 + 10 * 0.0254)) < 1e-12
    si2, unit2 = parse_unit_value("6 ft")
    assert (si2, unit2) == (6 * 0.3048, "metre")


def test_unit_value_parser_reference_subset():
    """Ported UnitValueParserTest rows (anchored-value forms; our cascade
    anchors the value, the reference also scans embedded text)."""
    from kgforge.dataparsers import parse_unit_value

    def si(s):
        r = parse_unit_value(s)
        return None if r is None else round(r[0], 6)

    assert si("10m") == 10.0
    assert si(".5 km") == 500.0
    assert si("10metres") == 10.0
    assert si("1 metre") == 1.0
    assert si("{{convert|1610|mm|in|1|abbr=on}}") == 1.61
    assert si("{{convert|112|mm|in|abbr=on}}") == 0.112
    assert si("{{convert|112|in|mm|abbr=on}}") == 2.8448
    assert si("6 ft 6 in") == 1.9812
    assert si("6 feet 6 inch") == 1.9812
    assert si("6' 6''") == 1.9812
    assert si("6'") == 1.8288
    assert si("10 in") == 0.254
    assert si("15ft 10in") == 4.826
    assert si("{{height|ft=6|in=6}}dgjhgj34") == 1.9812
    assert si("{{height|m=1.77|precision=0}}") == 1.77
    assert abs(parse_unit_value("500 nm")[0] - 5e-7) < 1e-12
    assert parse_unit_value("The 22 nanometer node") is None  # anchored divergence
    assert parse_unit_value("1990s") is None


def test_dimension_check_rejects_wrong_unit():
    """A Mass value cannot fill an Area-ranged unit property
    (UnitValueParser unit-vs-datatype check)."""
    from kgforge.mapping_engine import type_by_range

    assert type_by_range("en", "5 kg", "unit", "Area") is None
    v, dt, si = type_by_range("en", "5 km2", "unit", "Area")
    assert si == 5e6
    v2, dt2, si2 = type_by_range("en", "5 ft 10 in", "unit", "Length")
    assert round(si2, 4) == 1.778


def test_geo_text_parsers():
    """GeoCoordinateParser free-text DMS + SingleGeoCoordinateParser
    (GeoCoordinateParser.scala:34-48, SingleGeoCoordinateParser.scala:46-53)."""
    from kgforge.dataparsers import parse_geo_text, parse_single_coordinate

    lat, lon = parse_geo_text("51º12'00''N 3º13'00''E")
    assert abs(lat - 51.2) < 1e-9 and abs(lon - (3 + 13 / 60)) < 1e-9
    lat, lon = parse_geo_text("20/35/16/S 5/10//W")
    assert lat < 0 and lon < 0
    lat, lon = parse_geo_text("51.2 N 3.21 E")
    assert (lat, lon) == (51.2, 3.21)
    assert parse_geo_text("no coords here") is None
    assert parse_single_coordinate("52/31/12/N", "lat") is not None
    assert parse_single_coordinate("-33.5", "lat") == -33.5
    assert parse_single_coordinate("190.0", "lon") is None


def test_merge_date_parts():
    from kgforge.dates import merge_date_parts
    from kgforge.namespaces import XSD_DATE, XSD_GMONTHDAY, XSD_GYEAR

    assert merge_date_parts([("2044", XSD_GYEAR), ("--06-17", XSD_GMONTHDAY)], XSD_DATE) == (
        "2044-06-17", XSD_DATE)
    assert merge_date_parts([("2044", XSD_GYEAR)], XSD_DATE) is None


def test_temperature_affine_units():
    """Affine temperature conversions (SimplePropertyMapping.scala:244-276 +
    OntologyDatatypes Temperature functions): K = C + 273.15,
    K = (F + 459.67)*5/9 — offsets, not factors."""
    from kgforge.dataparsers import parse_unit_value

    assert parse_unit_value("300 K") == (300.0, "kelvin")
    v, std = parse_unit_value("30 °C")
    assert std == "kelvin" and abs(v - 303.15) < 1e-9
    v, std = parse_unit_value("212 °F")
    assert std == "kelvin" and abs(v - 373.15) < 1e-9
    v, std = parse_unit_value("-40 fahrenheit")
    v2, _ = parse_unit_value("-40 celsius")
    assert abs(v - v2) < 1e-9  # -40 is where the scales cross
    v, std = parse_unit_value("{{convert|100|°C|F}}")
    assert std == "kelvin" and abs(v - 373.15) < 1e-9
    # '1990s' must still not parse (decade, not seconds) and K needs the unit
    assert parse_unit_value("1990s") is None


def test_temperature_ranged_property():
    from kgforge.mapping_engine import type_by_range
    from kgforge.vocab import fmt_double

    v, dt, si = type_by_range("en", "30 °C", "unit", "Temperature")
    assert v == fmt_double(303.15) and dt.endswith("#double") and abs(si - 303.15) < 1e-9
    # dimension check: a temperature cannot fill an Area-ranged property
    assert type_by_range("en", "30 °C", "unit", "Area") is None


def test_inconvertible_currency_passthrough():
    """InconvertibleUnitDatatype: currencies keep their value in-unit with a
    datatype IRI; no SI value -> no specialized predicate."""
    from kgforge.dataparsers import parse_inconvertible_unit
    from kgforge.mapping_engine import type_by_range
    from kgforge.vocab import fmt_double

    assert parse_inconvertible_unit("$1,500") == (1500.0, "http://dbpedia.org/datatype/usDollar")
    assert parse_inconvertible_unit("100 USD") == (100.0, "http://dbpedia.org/datatype/usDollar")
    assert parse_inconvertible_unit("€5.5") == (5.5, "http://dbpedia.org/datatype/euro")
    assert parse_inconvertible_unit("plain text") is None
    v, dt, si = type_by_range("en", "US$ 250", "unit", "Currency")
    assert v == fmt_double(250.0) and dt == "http://dbpedia.org/datatype/usDollar" and si is None
    # a currency cannot fill a Mass-ranged unit property
    assert type_by_range("en", "$250", "unit", "Mass") is None
    # loose IN-TEXT currency only applies under an explicit Currency range:
    # prose on an UNRANGED unit property must not emit a spurious literal
    # (ADVICE r3) — the anchored form still passes through
    assert parse_inconvertible_unit("born in 1990 USD prose", loose=False) is None
    assert type_by_range("en", "born in 1990 USD prose", "unit", "") is None
    assert type_by_range("en", "100 USD", "unit", "")[1] == "http://dbpedia.org/datatype/usDollar"
    # in-text form still parses when the range IS Currency
    assert type_by_range("en", "worth [[US dollar|$]] 17.3 million (2008)", "unit",
                         "Currency") is not None


def test_duration_language_scoped_tables():
    from kgforge.dataparsers import parse_duration

    # widened en table: months/years with the reference's day constants
    assert parse_duration("2 years") == 2 * 86400 * 365.25
    assert parse_duration("3 months") == 3 * 86400 * 30.4375
    assert parse_duration("90 min.") == 5400.0
    # language tables REPLACE the default (timesMap.getOrElse semantics)
    assert parse_duration("90 Minuten", lang="de") == 5400.0
    assert parse_duration("2 heures", lang="fr") == 7200.0
    assert parse_duration("1 año", lang="es") == 86400 * 365.25
    assert parse_duration("2 hours", lang="de") is None  # en word absent in de


def test_geo_longitude_letters_language_scoped():
    from kgforge.dataparsers import parse_geo_text, parse_single_coordinate

    # 'O' is east in de/fr/nl, WEST in es/it, invalid in the default
    assert parse_geo_text("51.2 N 3.21 O", lang="de") == (51.2, 3.21)
    assert parse_geo_text("51.2 N 3.21 O", lang="fr") == (51.2, 3.21)
    assert parse_geo_text("51.2 N 3.21 O", lang="es") == (51.2, -3.21)
    assert parse_geo_text("51.2 N 3.21 O", lang="it") == (51.2, -3.21)
    assert parse_geo_text("51.2 N 3.21 O") is None
    assert parse_geo_text("51.2 N 3.21 E") == (51.2, 3.21)  # default unchanged
    assert parse_single_coordinate("5/10/30/O", "lon", lang="de") == 5.175000000000001
    assert parse_single_coordinate("5/10/30/O", "lon") is None
    # final tranche: the full latitude + longitude letter maps
    # (GeoCoordinateParserConfig.scala:19-65), incl. non-Latin scripts and
    # multi-character letters
    assert parse_geo_text("51.2 С 3.21 В", lang="ru") == (51.2, 3.21)
    assert parse_geo_text("51.2 Ю 3.21 З", lang="ru") == (-51.2, -3.21)
    assert parse_geo_text("35.6 北 139.7 東", lang="ja") == (35.6, 139.7)
    assert parse_geo_text("52.2 płn 21.0 wsch", lang="pl") == (52.2, 21.0)
    assert parse_geo_text("52.2 płd 21.0 zach", lang="pl") == (-52.2, -21.0)
    assert parse_geo_text("28.6 उ 77.2 पू", lang="hi") == (28.6, 77.2)
    assert parse_geo_text("41.9 С 22.0 И", lang="mk") == (41.9, 22.0)
    assert parse_geo_text("37.5 북 127.0 동", lang="ko") == (37.5, 127.0)
    assert parse_geo_text("39.9 北 116.4 东", lang="zh") == (39.9, 116.4)
    assert parse_geo_text("50.1 N 14.4 V", lang="cs") == (50.1, 14.4)
    assert parse_geo_text("33.9 S 18.4 O", lang="af") == (-33.9, 18.4)
    assert parse_geo_text("38.7 N 9.1 O", lang="pt") == (38.7, -9.1)
    # localized letters never leak into the default tables
    assert parse_geo_text("35.6 北 139.7 東") is None


def test_scale_words_language_scoped():
    from kgforge.dataparsers import parse_scaled_number as p

    assert p("1.2 million") == 1.2e6
    assert p("3 billion") == 3e9
    # false friend: the German word 'Billion' is 10^12 (ParserUtilsConfig)
    assert p("2 billion", lang="de") == 2e12
    assert p("7 tausend", lang="de") == 7e3
    assert p("7 tausend") is None  # de word no longer in the default table
    assert p("5 millions de", lang="fr") == 5e6
    assert p("1 mil milhões", lang="pt") == 1e9
    assert p("3 millón", lang="es") == 3e6
    # round-5 tranche (uk/bg/el/eo/ga/gl/ca/ar/am)
    assert p("5 мільйон", lang="uk") == 5e6
    assert p("2 млрд", lang="bg") == 2e9
    assert p("3 δισ.", lang="el") == 3e9
    assert p("1.5 miliardo", lang="eo") == 1.5e9
    assert p("2 milliún", lang="ga") == 2e6
    assert p("4 mil millóns", lang="gl") == 4e9
    assert p("3 milions de", lang="ca") == 3e6
    assert p("7 مليون", lang="ar") == 7e6
    assert p("2 ሚሊዮን", lang="am") == 2e6
    # scoped: uk word not visible in the default table
    assert p("5 мільйон") is None


def test_flag_template_names_language_scoped():
    from kgforge.dataparsers import parse_flag_template as p

    assert p("flagicon", "France") == "France"
    assert p("drapeau", "France", lang="fr") == "France"
    assert p("drapeau", "France") is None          # fr-only name, en fallback
    assert p("bandera", "Chile", lang="es") == "Chile"
    assert p("flagga", "Sverige", lang="sv") == "Sverige"
    # r5: ja resolves through its harvested localized code table now
    assert p("flag", "usa", lang="ja") == "アメリカ合衆国"
    assert p("drapeau", "FRA", lang="fr") == "France"
    assert p("bandera", "DEU", lang="es") == "Alemania"
    assert p("flagicon", "GRC", lang="el") == "Ελλάδα"
    assert p("flagicon", "Atlantis") == "Atlantis"  # passthrough unchanged
