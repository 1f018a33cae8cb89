"""data_validation_engine_spark — a PySpark-native data validation engine.

A from-scratch rebuild of the capabilities of
NHSDigital/data-validation-engine (reference at /root/reference), designed
Spark-first: every operator is a lazy DataFrame transformation optimised by
Catalyst/AQE, messages are DataFrames (never driver row loops), and row
validation is compiled to native Column expressions rather than per-row
Python.

Public surface:
- :mod:`entities` — the entity namespace (dict of DataFrames + refdata).
- :mod:`steps` — the relational step vocabulary (configs + engine).
- :mod:`contract` — declarative schema validation + cast compilation.
- :mod:`sources` / :mod:`sinks` — readers and writers.
- :mod:`functions` — the shipped scalar function library (Column exprs).
- :mod:`llmops` — large-scale training-data operators (dedup, similarity,
  text analysis, multimodal plumbing).
- :mod:`merge` — incremental maintenance (MERGE upsert, CDC apply).
- :mod:`streaming` — Structured Streaming lift of rule programs.
- :mod:`scale` — explicit 100 TB layout/skew/compaction levers.
"""

__version__ = "0.2.0"

from data_validation_engine_spark.entities import EntityManager
from data_validation_engine_spark.steps.engine import StepEngine

__all__ = [
    "EntityManager",
    "StepEngine",
    "__version__",
    # heavier layers import on demand:
    #   dischema.load_dischema / pipeline.run_pipeline / pipeline.process_landing
    #   llmops.* / streaming.* / files.*
]
