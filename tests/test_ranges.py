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


def test_activity_ranges_doubled_windows_and_edges():
    """resolve_activity_range implements the listening-activity range
    table (doubled comparison windows, partial-day exclusion) with the
    reference's boundary quirks: an anchor exactly ON a period
    boundary extends one more period back, so the previous complete
    period is always fully inside the window."""
    from datetime import datetime

    from listenbrainz_server_spark.plans.ranges import resolve_activity_range

    # Tuesday anchor: previous Monday through the anchor day's midnight.
    frm, to, g = resolve_activity_range(datetime(2024, 1, 30, 23, 59), "this_week")
    assert (frm, to, g) == (datetime(2024, 1, 22), datetime(2024, 1, 30), "day")

    # Monday anchor: one more week back (the reference's MO(-1) rule).
    frm, to, g = resolve_activity_range(datetime(2024, 1, 29, 12, 0), "this_week")
    assert (frm, to) == (datetime(2024, 1, 15), datetime(2024, 1, 29))

    # 1st-of-month anchor: two months back.
    frm, to, g = resolve_activity_range(datetime(2024, 3, 1, 8, 0), "this_month")
    assert (frm, to) == (datetime(2024, 1, 1), datetime(2024, 3, 1))

    # Jan-1 anchor: two years back, month buckets.
    frm, to, g = resolve_activity_range(datetime(2024, 1, 1, 0, 5), "this_year")
    assert (frm, to, g) == (datetime(2022, 1, 1), datetime(2024, 1, 1), "month")

    # week: two COMPLETE weeks ending on a Monday boundary.
    frm, to, g = resolve_activity_range(datetime(2024, 1, 30, 23, 59), "week")
    assert (frm, to, g) == (datetime(2024, 1, 15), datetime(2024, 1, 29), "day")

    # year: two complete years, month buckets.
    frm, to, g = resolve_activity_range(datetime(2024, 6, 15), "year")
    assert (frm, to, g) == (datetime(2022, 1, 1), datetime(2024, 1, 1), "month")

    # quarter boundaries map onto the reference's two-quarter table.
    frm, to, g = resolve_activity_range(datetime(2024, 2, 10), "quarter")
    assert (frm, to) == (datetime(2023, 7, 1), datetime(2024, 1, 1))
    frm, to, g = resolve_activity_range(datetime(2024, 11, 2), "quarter")
    assert (frm, to) == (datetime(2024, 4, 1), datetime(2024, 10, 1))

    # half_yearly: previous complete half, month buckets.
    frm, to, g = resolve_activity_range(datetime(2024, 8, 1), "half_yearly")
    assert (frm, to, g) == (datetime(2023, 7, 1), datetime(2024, 7, 1), "month")
