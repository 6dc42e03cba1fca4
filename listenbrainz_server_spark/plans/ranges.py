"""Stats range selection, anchored to the latest event.

Port of the reference's range-resolution semantics
(listenbrainz_spark/stats/__init__.py:150-218): ranges are anchored to
the **latest listen timestamp**, not wall clock — a stats job run over
a stale dataset still produces the ranges its data supports. The
``all_time`` floor is the LAST_FM_FOUNDING_YEAR constant
(listenbrainz_spark/constants.py:1).
"""

from __future__ import annotations

from datetime import datetime, timedelta

ALL_TIME_FLOOR_YEAR = 2002  # LAST_FM_FOUNDING_YEAR analog


def month_floor(dt: datetime) -> datetime:
    return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)


def week_floor(dt: datetime) -> datetime:
    d = dt.replace(hour=0, minute=0, second=0, microsecond=0)
    return d - timedelta(days=d.weekday())


def year_floor(dt: datetime) -> datetime:
    return dt.replace(
        month=1, day=1, hour=0, minute=0, second=0, microsecond=0
    )


def resolve_range(anchor: datetime, range_name: str) -> tuple[datetime, datetime]:
    """[from, to) for a named range, anchored at the latest event time.

    ``week``/``month``/``year`` are the last *complete* period before
    the anchor's current one (stats/__init__.py semantics);
    ``this_week``/``this_month``/``this_year`` are the running period;
    ``all_time`` starts at the founding-year floor.
    """
    if range_name == "all_time":
        return (datetime(ALL_TIME_FLOOR_YEAR, 1, 1), anchor + timedelta(seconds=1))
    if range_name == "this_week":
        return (week_floor(anchor), anchor + timedelta(seconds=1))
    if range_name == "this_month":
        return (month_floor(anchor), anchor + timedelta(seconds=1))
    if range_name == "this_year":
        return (year_floor(anchor), anchor + timedelta(seconds=1))
    if range_name == "week":
        end = week_floor(anchor)
        return (end - timedelta(days=7), end)
    if range_name == "month":
        end = month_floor(anchor)
        prev = (end - timedelta(days=1)).replace(day=1)
        return (prev, end)
    if range_name == "quarter":
        end_month = (month_floor(anchor).month - 1) // 3 * 3 + 1
        end = month_floor(anchor).replace(month=end_month)
        start_month = end_month - 3
        start = (
            end.replace(year=end.year - 1, month=start_month + 12)
            if start_month < 1
            else end.replace(month=start_month)
        )
        return (start, end)
    if range_name == "half_yearly":
        # Previous complete half-year (stats/__init__.py:118-127):
        # Jan-Jun anchor → last year's Jul-Dec; Jul-Dec anchor → Jan-Jun.
        yf = year_floor(anchor)
        end = yf if anchor.month <= 6 else yf.replace(month=7)
        start = end.replace(year=end.year - 1, month=7) if end.month == 1 else yf
        return (start, end)
    if range_name == "year":
        end = year_floor(anchor)
        return (end.replace(year=end.year - 1), end)
    raise ValueError(f"unknown range: {range_name}")


def _day_floor(dt: datetime) -> datetime:
    return dt.replace(hour=0, minute=0, second=0, microsecond=0)


def _month_add(dt: datetime, months: int) -> datetime:
    y, m = divmod(dt.year * 12 + (dt.month - 1) + months, 12)
    return dt.replace(year=y, month=m + 1)


def resolve_activity_range(
    anchor: datetime, range_name: str
) -> tuple[datetime, datetime, str]:
    """[from, to) + bucket granularity for the LISTENING-ACTIVITY
    family, which deliberately diverges from ``resolve_range``
    (stats/common/listening_activity.py:60-185): every range spans the
    CURRENT period plus the PREVIOUS one (the UI renders the delta),
    "this_*" ranges end at the latest day's midnight (the partial day
    is excluded), and bucket steps follow the reference's table — days
    for week/month/quarter, months for half-year/year, years for
    all_time.
    """
    day0 = _day_floor(anchor)
    monday = week_floor(anchor)

    if range_name == "this_week":
        frm = monday - timedelta(days=14) if day0 == monday else monday - timedelta(days=7)
        return frm, day0, "day"
    if range_name == "this_month":
        mf = month_floor(anchor)
        frm = _month_add(mf, -2) if day0 == mf else _month_add(mf, -1)
        return frm, day0, "day"
    if range_name == "this_year":
        yf = year_floor(anchor)
        frm = yf.replace(year=yf.year - 2) if day0 == yf else yf.replace(year=yf.year - 1)
        return frm, day0, "month"
    if range_name == "week":
        # 14 days preserves the weekday, so this IS week_floor(d0-14d).
        frm = monday - timedelta(days=14)
        return frm, frm + timedelta(days=14), "day"
    if range_name == "month":
        frm = _month_add(month_floor(anchor), -2)
        return frm, _month_add(frm, 2), "day"
    if range_name == "quarter":
        m = anchor.month
        if m <= 3:
            frm = year_floor(anchor).replace(year=anchor.year - 1, month=7)
        elif m <= 6:
            frm = year_floor(anchor).replace(year=anchor.year - 1, month=10)
        elif m <= 9:
            frm = year_floor(anchor)
        else:
            frm = year_floor(anchor).replace(month=4)
        return frm, _month_add(frm, 6), "day"
    if range_name == "half_yearly":
        frm = (
            year_floor(anchor).replace(year=anchor.year - 1)
            if anchor.month <= 6
            else year_floor(anchor).replace(year=anchor.year - 1, month=7)
        )
        return frm, _month_add(frm, 12), "month"
    if range_name == "year":
        frm = year_floor(anchor).replace(year=anchor.year - 2)
        return frm, frm.replace(year=frm.year + 2), "month"
    if range_name == "all_time":
        return (
            datetime(ALL_TIME_FLOOR_YEAR, 1, 1),
            anchor + timedelta(seconds=1),
            "year",
        )
    raise ValueError(f"unknown listening-activity range: {range_name}")
