from data_validator_spark.fixtures.clips import ClipsConfig, generate_clips  # noqa: F401
