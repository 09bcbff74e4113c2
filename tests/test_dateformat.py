"""Date-format inference parity — all 18 reference suites
(/root/reference/internal/date/date_test.go:15-545) ported verbatim."""

import pytest

from goskyr_spark.config import CoveredDateParts as P
from goskyr_spark.kernels.dateformat import (
    get_date_format,
    get_date_format_multi,
    most_occ,
)

CASES = [
    # (input, parts, expected_format, expected_lang)
    ("March", P(month=True), "January", "en_US"),
    ("February", P(month=True), "January", "en_US"),
    ("April", P(month=True), "January", "en_US"),
    ("May", P(month=True), "January", "en_US"),
    ("3", P(day=True), "2", ""),
    ("04", P(day=True), "2", ""),
    ("16", P(day=True), "2", ""),
    ("19:45", P(time=True), "15:04", ""),
    ("23:30", P(time=True), "15:04", ""),
    ("Wednesday, 1 march om 21u00", P(day=True, month=True, time=True),
     "Monday, 2 January om 15u04", "en_US"),
    ("Thursday, 2 march om 21u00", P(day=True, month=True, time=True),
     "Monday, 2 January om 15u04", "en_US"),
    ("Sunday, 5 march om 21u01", P(day=True, month=True, time=True),
     "Monday, 2 January om 15u04", "en_US"),
    ("17-03-2023 20:30", P(day=True, month=True, year=True, time=True),
     "2-1-2006 15:04", ""),
    ("25-03-2023 20:30", P(day=True, month=True, year=True, time=True),
     "2-1-2006 15:04", ""),
    ("29 April", P(day=True, month=True), "2 January", "en_US"),
    ("2 September", P(day=True, month=True), "2 January", "en_US"),
    ("12 May", P(day=True, month=True), "2 January", "en_US"),
    ("Fr. 17. Mär. 2023", P(day=True, month=True, year=True),
     "Mon. 2. Jan. 2006", "de_DE"),
    ("Sa. 18. Mär. 2023", P(day=True, month=True, year=True),
     "Mon. 2. Jan. 2006", "de_DE"),
    ("Fr. 24. Mär. 2023", P(day=True, month=True, year=True),
     "Mon. 2. Jan. 2006", "de_DE"),
    ("Samedi 18 mars 2023", P(day=True, month=True, year=True),
     "Monday 2 January 2006", "fr_FR"),
    ("Vendredi 24 mars 2023", P(day=True, month=True, year=True),
     "Monday 2 January 2006", "fr_FR"),
    ("Samedi 25 mars 2023", P(day=True, month=True, year=True),
     "Monday 2 January 2006", "fr_FR"),
    ("Dimanche 26 mars 2023", P(day=True, month=True, year=True),
     "Monday 2 January 2006", "fr_FR"),
    ("ab 23 Uhr", P(time=True), "ab 15 Uhr", ""),
    ("ab 21 Uhr", P(time=True), "ab 15 Uhr", ""),
    ("March 17 @ 5:00 pm", P(day=True, month=True, time=True),
     "January 2 @ 15:04 pm", "en_US"),
    ("March 18 @ 11:30 pm", P(day=True, month=True, time=True),
     "January 2 @ 15:04 pm", "en_US"),
    ("April 1 @ 8:00 pm", P(day=True, month=True, time=True),
     "January 2 @ 15:04 pm", "en_US"),
    ("2.1.2012 Beginn: 15:04 Uhr", P(day=True, month=True, year=True,
                                     time=True),
     "2.1.2006 Beginn: 15:04 Uhr", ""),
    ("30.11.2022 Beginn: 11:30 Uhr", P(day=True, month=True, year=True,
                                       time=True),
     "2.1.2006 Beginn: 15:04 Uhr", ""),
    ("2.5.1994 Beginn: 6:13 Uhr", P(day=True, month=True, year=True,
                                    time=True),
     "2.1.2006 Beginn: 15:04 Uhr", ""),
    ("20:00h", P(time=True), "15:04h", ""),
    ("23:30h", P(time=True), "15:04h", ""),
    ("do 23 maart 2023", P(day=True, month=True, year=True),
     "Mon 2 January 2006", "nl_BE"),
    ("wo 5 april 2023", P(day=True, month=True, year=True),
     "Mon 2 January 2006", "nl_BE"),
    ("za 22 april 2023", P(day=True, month=True, year=True),
     "Mon 2 January 2006", "nl_BE"),
    ("7.30pm", P(time=True), "15.04pm", ""),
    ("9pm", P(time=True), "15pm", ""),
    ("19:30 Uhr", P(time=True), "15:04 Uhr", ""),
    ("20 Uhr", P(time=True), "15 Uhr", ""),
    ("DOORS: 7:30PM", P(time=True), "DOORS: 15:04PM", ""),
    ("DOORS: 5AM", P(time=True), "DOORS: 15PM", ""),
    ("DOORS: 11:00AM", P(time=True), "DOORS: 15:04PM", ""),
    ("nedeľa 25.02.2024 @18:00", P(day=True, month=True, year=True,
                                   time=True),
     "Monday 2.1.2006 @15:04", "sk_SK"),
    ("piatok 01.03.2024 @20:00", P(day=True, month=True, year=True,
                                   time=True),
     "Monday 2.1.2006 @15:04", "sk_SK"),
    ("štvrtok 07.03.2024 @18:30", P(day=True, month=True, year=True,
                                    time=True),
     "Monday 2.1.2006 @15:04", "sk_SK"),
    ("Mi. 04/12/2024", P(day=True, month=True, year=True),
     "Mon. 2/1/2006", "de_DE"),
    ("Sa. 07/12/2024", P(day=True, month=True, year=True),
     "Mon. 2/1/2006", "de_DE"),
    ("Sa. 18/01/2024", P(day=True, month=True, year=True),
     "Mon. 2/1/2006", "de_DE"),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_get_date_format(case):
    inp, parts, want_fmt, want_lang = case
    fmt, lang = get_date_format(inp, parts)
    assert fmt == want_fmt
    assert lang == want_lang


def test_empty_input():
    fmt, lang = get_date_format("", P(day=True))
    assert fmt == "unknown format. please specify manually"
    assert lang == ""


def test_multi_vote():
    fmt, lang = get_date_format_multi(
        ["Fr. 17. Mär. 2023", "Sa. 18. Mär. 2023", "bogus"],
        P(day=True, month=True, year=True))
    assert fmt == "Mon. 2. Jan. 2006"
    assert lang == "de_DE"


def test_most_occ():
    assert most_occ(["a", "b", "a"]) == "a"
    assert most_occ([]) is None
