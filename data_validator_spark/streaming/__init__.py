from data_validator_spark.streaming.incremental import (
    CLIPS_STREAM_SCHEMA,
    QueryGroup,
    clips_stream,
    run_incremental,
    validate_stream,
    windowed_verdicts,
)
from data_validator_spark.streaming.stateful import streaming_dedup_flags

__all__ = [
    "CLIPS_STREAM_SCHEMA",
    "QueryGroup",
    "clips_stream",
    "validate_stream",
    "windowed_verdicts",
    "run_incremental",
    "streaming_dedup_flags",
]
