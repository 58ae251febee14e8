from data_validator_spark.audio import codecs, synth  # noqa: F401
