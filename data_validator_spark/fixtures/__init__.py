from data_validator_spark.fixtures.clips import (  # noqa: F401
    ClipsConfig,
    generate_clips,
    generate_golden,
    generate_transcripts_ref,
    write_fixture,
)
