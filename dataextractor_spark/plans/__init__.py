"""Physical-plan utilities: inspection helpers and layout strategies
(bucketing) that eliminate shuffles at scale."""

from dataextractor_spark.plans.inspect import physical_plan, shuffle_exchange_count
from dataextractor_spark.plans.bucketing import write_bucketed, read_bucketed

__all__ = [
    "physical_plan",
    "shuffle_exchange_count",
    "write_bucketed",
    "read_bucketed",
]
