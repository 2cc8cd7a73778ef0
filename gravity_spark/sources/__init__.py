from gravity_spark.sources.batch import (  # noqa: F401
    chunked_scan,
    detect_scan_column,
    scan_bounds,
    jdbc_partitioned_reader,
    snapshot_table,
)
