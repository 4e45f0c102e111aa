"""PySpark-native schema + constraint validation engine for pre-tokenized
training-sequence tables.

Brand-new engine (NOT a port) with the data-quality capabilities of the
reference `JonusNattapong/UltraGenDataset-Datachecker` (pandas, single
process), re-expressed Spark-first: one fused multi-aggregate pass per
partition, violation rows, weighted quality scores, drift checks, and a
checkpoint manifest for resumable runs.

Reference semantics (file:line cites into /root/reference/) are documented in
each module; see SURVEY.md for the full map.
"""

from ultragendataset_datachecker_spark.config import EngineConfig
from ultragendataset_datachecker_spark.engine import ValidationEngine, ValidationResult

__all__ = ["EngineConfig", "ValidationEngine", "ValidationResult"]
__version__ = "0.1.0"
