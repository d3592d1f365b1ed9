"""theta_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the text-information-extraction capabilities of uukuguy/theta.

Reference semantics are documented in SURVEY.md with file:line citations into
/root/reference; the architecture here is Spark-first (DataFrame/SQL +
Arrow-batched pandas UDFs), not a port of the reference's PyTorch pipeline.
"""

__version__ = "0.1.0"

from theta_spark.config import PipelineConfig  # noqa: F401
