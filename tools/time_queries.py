"""Quick subset timer: bench.py methodology (restage + noop sink +
min over interleaved reps) for a named list of queries. For fast
optimization iteration only — the round's evidence numbers come from
`bench.py` / `bench.py --compare`, not this.

Usage: python tools/time_queries.py QUERY [QUERY ...] [--reps 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from dataextractor_spark.registry import load_all  # noqa: E402
from dataextractor_spark.session import get_session  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_session(
        app_name="dataextractor-spark-subset-timer",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"},
    )
    from bench import restage_fixtures

    env_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = restage_fixtures(spark, env_dir)
    specs = load_all()
    specs["flagship_pricing_summary"].fn(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    best: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
    out = {n: round(v, 3) for n, v in best.items()}
    out["_total"] = round(sum(best.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
