from data_validator_spark.functions.scalars import (  # noqa: F401
    age_years,
    coerce_bool,
    nan_normalize,
    normalize_language,
    pseudonymize,
    rename_snake,
)
