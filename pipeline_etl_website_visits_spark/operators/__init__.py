"""Reusable distributed operators (merge/upsert, dedup, similarity, text,
graph, skyline, layout, multimodal, skew, range joins).

These are the engine's "custom operators": everything Spark lacks as a
single built-in, composed from DataFrame primitives so Catalyst still owns
the physical plan. No RDDs; Python UDFs only where genuinely unavoidable
(none so far — the whole surface is built-ins + higher-order functions).
"""

from pipeline_etl_website_visits_spark.operators.merge import merge_upsert  # noqa: F401
