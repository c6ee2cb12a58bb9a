from feature_extraction_spark.ops.levels import keys_for, with_entity_keys  # noqa: F401
