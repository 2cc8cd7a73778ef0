from gravity_spark.core.envelope import MSG_SCHEMA, events_to_changes  # noqa: F401
from gravity_spark.core.matchers import glob_to_regex, compile_matchers  # noqa: F401
