from bifrost_spark.operators.lww import events_to_ops, resolve_lww  # noqa: F401
