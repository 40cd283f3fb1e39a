from mysql_time_machine_spark.functions.core import (  # noqa: F401
    blob_hex,
    changed_cells,
    classify_event,
    content_sha256,
    daily_bucket_utc,
    delete_projection,
    enum_decode,
    namespace_route,
    salt_key,
    salted_shuffle_key,
    ts_to_epoch,
)
