"""Game-clock arithmetic as pure Column expressions.

The reference implements these as row-wise Python (``utils/utils.py:19-27``
applied via ``df.apply(..., axis=1)``) — here they are Column exprs so
they stay inside whole-stage codegen. Three time encodings exist
(SURVEY.md §1.2): countdown clock 'MM:SS', integer seconds from game
start, and tenths-of-a-second from game start; helpers convert between
them explicitly so the x10 boundary is typed, not implicit.

Regulation periods (1-4) are 12 minutes = 720 s; overtime periods are
5 minutes = 300 s.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REGULATION_PERIOD_S = 720
OT_PERIOD_S = 300
REGULATION_TOTAL_S = 4 * REGULATION_PERIOD_S  # 2880


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def period_start_seconds(period: Column | str) -> Column:
    """Absolute second at which ``period`` begins."""
    p = _col(period)
    return F.when(p <= 4, (p - 1) * REGULATION_PERIOD_S).otherwise(
        REGULATION_TOTAL_S + (p - 5) * OT_PERIOD_S
    )


def period_length_seconds(period: Column | str) -> Column:
    p = _col(period)
    return F.when(p <= 4, F.lit(REGULATION_PERIOD_S)).otherwise(F.lit(OT_PERIOD_S))


def clock_to_seconds(period: Column | str, clock: Column | str) -> Column:
    """Countdown 'MM:SS' game clock -> absolute seconds from game start.

    Mirrors reference ``utils/utils.py:19-27``:
    periods<=4: (p-1)*720 + (720 - (mm*60+ss)); OT: 2880 + (p-5)*300 + (300 - ...).
    """
    parts = F.split(_col(clock), ":")
    # F.get + try_cast, not getItem + cast: ANSI mode raises on a
    # malformed clock ('12', '', '7:xx'); null-tolerant access makes
    # one bad row a NULL seconds value instead of a job-wide crash
    # (the reference's per-row loop failed only the offending game)
    remaining = (
        F.get(parts, 0).try_cast("long") * 60 + F.get(parts, 1).try_cast("long")
    )
    return (period_start_seconds(period) + period_length_seconds(period) - remaining).cast("long")


def period_time_bounds(period: Column | str) -> tuple[Column, Column]:
    """Period -> [start, end) bounds in TENTHS of a second
    (reference ``etl/players_on_court_at_start_of_period.py:22-32``)."""
    start = period_start_seconds(period) * 10
    end = (period_start_seconds(period) + period_length_seconds(period)) * 10
    return start.cast("long"), end.cast("long")


def seconds_to_tenths(seconds: Column | str) -> Column:
    """The explicit seconds -> tenths boundary (reference multiplies by 10
    inline at ``etl/play_by_play_with_players.py:101-103``)."""
    return (_col(seconds) * 10).cast("long")
