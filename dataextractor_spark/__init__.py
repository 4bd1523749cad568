"""dataextractor_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(scudellerlemos/dataextractor, surveyed in SURVEY.md) as an idiomatic
Spark engine: DataFrame/SQL on Catalyst for relational work, Structured
Streaming for event-time analytics, and pyspark.ml / pandas-UDF backed
operators for the LLM-data-pipeline tier (dedup, similarity search,
text analysis, multimodal columns).

Design rules (SURVEY.md §4):
- DataFrame-first; RDDs only inside connectors.
- Catalyst does pushdown/pruning/join-selection; we declare, it plans.
- Broadcast small dims, partition big facts, AQE on everywhere.
- Python UDFs only where built-ins can't express the semantics, and
  then always Arrow-batched (pandas_udf / mapInPandas).

Intermediate pinning (the repo-wide ``localCheckpoint(eager=False)``
idiom): when one bounded intermediate feeds two or more consumers,
Spark re-derives it per consumer, so operators pin it once via a lazy
localCheckpoint. The trade-off, documented here once for every pin
site: localCheckpoint truncates lineage to NON-REPLICATED executor
storage, so losing an executor fails the query instead of recomputing
it — free and correct on the single-JVM local[*] topology this repo
benches on, but a fault-tolerance trade on a multi-node cluster.
Cluster deployments that prefer recomputable lineage should swap the
idiom for reliable ``checkpoint()`` (needs a checkpoint dir) or
``persist(StorageLevel.MEMORY_AND_DISK_2)``; the pinned tables are
all bounded (sub-corpus-sized by construction), so either alternative
changes cost, not semantics.
"""

__version__ = "0.1.0"

from dataextractor_spark.catalog import TABLES, load_table, tables
from dataextractor_spark.session import get_session

__all__ = ["TABLES", "load_table", "tables", "get_session", "__version__"]
