"""Range-selector unit tests (the reference's pure-Python date-logic
test pattern, stats/user/tests/test_listening_activity_range_selector.py)."""

from __future__ import annotations

from datetime import datetime

from listenbrainz_server_spark.plans.ranges import resolve_range

ANCHOR = datetime(2024, 3, 13, 15, 30, 45)  # a Wednesday


def test_all_time_floor():
    frm, to = resolve_range(ANCHOR, "all_time")
    assert frm == datetime(2002, 1, 1)
    assert to > ANCHOR


def test_week_is_last_complete_week():
    frm, to = resolve_range(ANCHOR, "week")
    assert frm == datetime(2024, 3, 4)  # previous Monday
    assert to == datetime(2024, 3, 11)  # this week's Monday


def test_this_week_starts_monday():
    frm, to = resolve_range(ANCHOR, "this_week")
    assert frm == datetime(2024, 3, 11)


def test_month_is_last_complete_month():
    frm, to = resolve_range(ANCHOR, "month")
    assert (frm, to) == (datetime(2024, 2, 1), datetime(2024, 3, 1))


def test_year_is_last_complete_year():
    frm, to = resolve_range(ANCHOR, "year")
    assert (frm, to) == (datetime(2023, 1, 1), datetime(2024, 1, 1))


def test_quarter_boundaries():
    frm, to = resolve_range(ANCHOR, "quarter")
    assert (frm, to) == (datetime(2023, 10, 1), datetime(2024, 1, 1))
    frm2, to2 = resolve_range(datetime(2024, 5, 1), "quarter")
    assert (frm2, to2) == (datetime(2024, 1, 1), datetime(2024, 4, 1))


def test_anchored_not_wall_clock():
    """Ranges derive from the data's latest timestamp, not today."""
    old_anchor = datetime(2019, 6, 15)
    frm, to = resolve_range(old_anchor, "month")
    assert (frm, to) == (datetime(2019, 5, 1), datetime(2019, 6, 1))


def test_half_yearly_boundaries():
    """stats/__init__.py:118-127: Jan-Jun anchor -> last year's Jul-Dec;
    Jul-Dec anchor -> this year's Jan-Jun."""
    frm, to = resolve_range(ANCHOR, "half_yearly")  # March anchor
    assert (frm, to) == (datetime(2023, 7, 1), datetime(2024, 1, 1))
    frm2, to2 = resolve_range(datetime(2024, 9, 2), "half_yearly")
    assert (frm2, to2) == (datetime(2024, 1, 1), datetime(2024, 7, 1))
