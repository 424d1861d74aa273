from .incremental import delta_filter, assert_unique_key, merge_upsert, insert_ignore  # noqa: F401
from .rollup import rollup_stints, explode_stints  # noqa: F401
