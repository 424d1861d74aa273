from .resultset import decode_result_sets, result_set_df  # noqa: F401
