"""GAME_ID positional decoding as Column expressions.

GAME_ID is a zero-padded 10-char STRING (e.g. '0022400061'): char at
0-based index 2 encodes the season type, chars 3:5 the 2-digit season
start year. Mirrors reference ``utils/utils.py:66-79``; implemented
with substring/concat/when — no UDF. Any cast of GAME_ID to int breaks
this decoding silently (SURVEY.md §7.4), so these helpers only accept
string columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEASON_TYPE_BY_DIGIT = {
    "1": "Pre Season",
    "2": "Regular Season",
    "4": "Playoffs",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def season_from_game_id(game_id: Column | str) -> Column:
    """'0022400061' -> '2024-25': '20' + chars[3:5] + '-' + (year+1) % 100."""
    gid = _col(game_id)
    yy = F.substring(gid, 4, 2)  # 1-based substring: chars 3:5 of the 0-based spec
    # digit guard + try_cast: a malformed GAME_ID ('', too-short,
    # non-digits) must decode to a NULL season — not raise
    # CAST_INVALID_INPUT under ANSI mode ('20bc'), and not alias the
    # empty string to year 20 ('20' + '' casts fine)
    start_year = F.when(
        yy.rlike("^[0-9]{2}$"), F.concat(F.lit("20"), yy).try_cast("int")
    )
    end_two = F.lpad(((start_year + 1) % 100).cast("string"), 2, "0")
    return F.concat(start_year.cast("string"), F.lit("-"), end_two)


def current_season(today: "datetime.date | None" = None) -> str:
    """Driver-side default-season helper: month > August rolls into the
    new season (reference ``api/smart.py:118-127``) — e.g. 2026-08 ->
    '2025-26', 2026-09 -> '2026-27'."""
    import datetime

    d = today or datetime.date.today()
    start = d.year if d.month > 8 else d.year - 1
    return f"{start}-{(start + 1) % 100:02d}"


def season_type_from_game_id(game_id: Column | str) -> Column:
    """0-based char 2: '1' -> Pre Season, '2' -> Regular Season, '4' -> Playoffs, else NULL."""
    digit = F.substring(_col(game_id), 3, 1)
    expr = F.lit(None).cast("string")
    for d, name in reversed(SEASON_TYPE_BY_DIGIT.items()):
        expr = F.when(digit == d, name).otherwise(expr)
    return expr
