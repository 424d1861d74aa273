from .ids import add_id, fill_nulls, stamp  # noqa: F401
from .timeops import clock_to_seconds, period_time_bounds, seconds_to_tenths  # noqa: F401
from .gameid import season_from_game_id, season_type_from_game_id  # noqa: F401
