"""data_validator_spark — a from-scratch PySpark-native schema + constraint
validation engine over tables of audio clip + transcript pairs.

Re-expresses the validation semantics of the reference pipeline
(levante-framework/data-validator: Pydantic row-at-a-time validation,
see /root/reference/validators/core_models.py) as declarative
pyspark.sql DataFrame expressions plus Arrow-vectorized pandas UDFs.

Design commitments (SURVEY.md §1.4, §4):
- DataFrame/Catalyst only — no RDDs, no driver-side row loops.
- Rules compile to Column expressions (stay inside whole-stage codegen);
  Python appears only in Arrow-batched pandas UDFs for audio decode.
- Hard/soft/warning outcome tiers with ';'-joined message labels in
  declared rule order (reference: core_models.py:586-597).
- Resumable via a per-partition checkpoint manifest.
"""

__version__ = "0.1.0"
