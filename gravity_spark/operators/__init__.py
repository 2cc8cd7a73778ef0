from gravity_spark.operators.filters import (  # noqa: F401
    accept_filter,
    reject_filter,
    delete_dml_columns,
    rename_dml_columns,
    apply_filter_chain,
)
from gravity_spark.operators.collapse import collapse_last_write_wins  # noqa: F401
from gravity_spark.operators.upsert import merge_changes  # noqa: F401
from gravity_spark.operators.router import route  # noqa: F401
