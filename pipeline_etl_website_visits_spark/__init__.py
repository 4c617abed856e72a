"""pipeline_etl_website_visits_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``CodeGeasrb/pipeline-etl-website-visits`` (a Prefect/pandas micro-batch ETL:
CSV visit reports -> validate -> split valid/invalid -> normalize/cast ->
aggregate visits per email -> upsert consolidated visitor table + append
stats/errors/control-log), re-expressed Spark-first:

- Declarative DataFrame/SQL plans (Catalyst handles pushdown/pruning/joins).
- Structured Streaming file source replaces the file-per-micro-batch
  dispatcher (reference flows/orchestrator_flow.py:36-45).
- A join-based merge/upsert operator replaces the reference's MySQL MERGE
  (reference utils/utils_load.py:43-84).
- North-star extensions for LLM-scale data pipelines: dedup (exact/minhash/
  simhash/jaccard), similarity search over embeddings, text analysis,
  multimodal binary-column plumbing.

Nothing here is a translation of the reference's code; citations in
docstrings are *behavioral* anchors (what to compute), per SURVEY.md.
"""

__version__ = "0.1.0"

from pipeline_etl_website_visits_spark.session import get_spark  # noqa: F401
from pipeline_etl_website_visits_spark.tables import TABLES, load_tables, register_views  # noqa: F401
