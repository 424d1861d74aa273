from .windows import tumbling_agg, sliding_agg, stream_tumbling_counts  # noqa: F401
