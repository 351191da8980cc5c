"""Vietnamese number verbalization (viettts_tpu/text/numbers.py)."""

import pytest

from viettts_tpu.text import (
    expand_numbers,
    normalize_text,
    number_to_vietnamese,
    text_to_tokens,
)


@pytest.mark.parametrize(
    "n, words",
    [
        (0, "không"),
        (5, "năm"),
        (10, "mười"),
        (11, "mười một"),
        (15, "mười lăm"),
        (20, "hai mươi"),
        (21, "hai mươi mốt"),
        (24, "hai mươi tư"),
        (25, "hai mươi lăm"),
        (99, "chín mươi chín"),
        (100, "một trăm"),
        (105, "một trăm linh năm"),
        (110, "một trăm mười"),
        (115, "một trăm mười lăm"),
        (121, "một trăm hai mươi mốt"),
        (1000, "một nghìn"),
        (1005, "một nghìn không trăm linh năm"),
        (1050, "một nghìn không trăm năm mươi"),
        (2345, "hai nghìn ba trăm bốn mươi lăm"),
        (10000, "mười nghìn"),
        (1000000, "một triệu"),
        (1002003, "một triệu không trăm linh hai nghìn không trăm linh ba"),
        (1500000000, "một tỷ năm trăm triệu"),
        (-7, "âm bảy"),
    ],
)
def test_number_to_vietnamese(n, words):
    assert number_to_vietnamese(n) == words


def test_expand_plain_integer():
    assert expand_numbers("tôi có 25 quả") == "tôi có hai mươi lăm quả"


def test_expand_decimal_comma():
    assert expand_numbers("nặng 3,5 kg") == "nặng ba phẩy năm kg"
    # fractional part with leading zero reads digit by digit
    assert expand_numbers("0,05 %") == "không phẩy không năm %"


def test_expand_grouped_thousands():
    assert (
        expand_numbers("giá 1.234.567 đồng")
        == "giá một triệu hai trăm ba mươi tư nghìn năm trăm sáu mươi bảy"
        " đồng"
    )


def test_leading_zero_reads_digits():
    # phone-number style input
    assert expand_numbers("gọi 0912") == "gọi không chín một hai"


def test_digit_free_text_unchanged():
    s = "hôm qua em tới trường, mẹ dắt tay từng bước."
    assert expand_numbers(s) == s


def test_normalize_text_speaks_numbers():
    out = normalize_text("ngày 15 tháng 3")
    assert "mười lăm" in out and "ba" in out
    # and the tokens are non-empty speech (digits used to be dropped)
    toks = text_to_tokens(normalize_text("123"))
    assert len(toks) > 4


def test_normalize_text_parity_without_digits():
    s = "Hôm nay, trời ĐẸP."
    assert normalize_text(s, numbers=True) == normalize_text(s, numbers=False)


def test_ambiguous_dot_decimal_fallback():
    """Dot decimals like "3.5" match neither the grouped-thousands nor the
    plain-integer patterns; the fallback reads them as whole + digitwise
    fraction instead of silently dropping the digits at tokenization."""
    assert expand_numbers("3.5") == "ba phẩy năm"
    assert expand_numbers("1.23") == "một phẩy hai ba"
    # malformed grouping: still verbalized, never dropped
    out = expand_numbers("12.34.56")
    assert not any(c.isdigit() for c in out)
    assert out.startswith("mười hai phẩy")
    # trailing-dot numbers keep the sentence period
    out2 = expand_numbers("giá 3.5.")
    assert "ba phẩy năm" in out2 and not any(c.isdigit() for c in out2)
