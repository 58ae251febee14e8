from data_validator_spark.plans.validation import (  # noqa: F401
    ValidationConfig,
    ValidationResult,
    run_validation,
)
from data_validator_spark.plans.manifest import CheckpointManifest, run_resumable  # noqa: F401
