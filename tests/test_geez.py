"""Ethiopian calendar parsing: Geez numeral table ported from
GeezNumberUtilsTest.scala; calendar conversion + validation from
EthiopianDateParser.scala."""

import pytest

from kgforge.geez import (
    ethiopian_to_gregorian,
    find_geez_date,
    geez_to_int,
    is_valid_ethiopian_date,
)

GEEZ_CASES = [
    ("፪", 2), ("፲", 10), ("፻፯", 107), ("፻፲፫", 113), ("፰፻፺፰", 898),
    ("፲፩፼፲፩፻፲፩፼፲፩፻፲፩", 1111111111), ("፲፪፻፴፬", 1234), ("፼፳፫፻፵፭", 12345),
    ("፯፻፷፭፼፵፫፻፳፩", 7654321), ("፲፯፻፷፭፼፵፫፻፳፩", 17654321),
    ("፶፩፻፷፩፼፶፩፻፴፩", 51615131), ("፴፻፴", 3030), ("፫፼፴፫፻፴፫፼፴፫፻፴፫", 333333333),
]


@pytest.mark.parametrize("geez,expected", GEEZ_CASES)
def test_geez_numerals(geez, expected):
    assert geez_to_int(geez) == expected


def test_geez_rejects_unknown():
    assert geez_to_int("abc") is None


def test_validation():
    assert is_valid_ethiopian_date(2013, 2, 21)
    assert not is_valid_ethiopian_date(2013, 14, 1)
    assert not is_valid_ethiopian_date(2013, 13, 6)   # 2013 % 4 != 3
    assert is_valid_ethiopian_date(2015, 13, 6)       # leap (2015 % 4 == 3)
    assert not is_valid_ethiopian_date(2015, 13, 7)


def test_conversion_known_dates():
    # Ethiopian new year 1 Meskerem 2013 = 11 September 2020 (Gregorian)
    assert ethiopian_to_gregorian(2013, 1, 1) == (2020, 9, 11)
    # 1 Meskerem 2012 = 12 September 2019 (post-leap shift)
    assert ethiopian_to_gregorian(2012, 1, 1) == (2019, 9, 12)


def test_find_geez_date_forms():
    assert find_geez_date("ጥቅምት 21 2013") == ("2020-10-31", find_geez_date("ጥቅምት 21 2013")[1])
    assert find_geez_date("21-ጥቅምት-2013") == find_geez_date("ጥቅምት/21/2013")
    assert find_geez_date("ጥቅምት ፳፩ ፳፻፲፫") == find_geez_date("ጥቅምት 21 2013")
    assert find_geez_date("21 13 2013") is None or find_geez_date("21 13 2013") is None
    # Gregorian indicator suppresses the Geez parse
    assert find_geez_date("እ.ኤ.አ ጥቅምት 21 2013") is None
    assert find_geez_date("no date") is None
