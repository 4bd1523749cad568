"""Per-job/per-stage profiler for registry queries (optimization round).

Runs named queries through the same restaged layout and noop sink as
bench.py, but with the Spark UI enabled, and prints each query's job
breakdown from the UI REST API: job duration, stage task time, shuffle
read/write bytes, and input bytes. This is guide §1 ("measure first" /
"start with the UI") done programmatically, since the sandbox has no
browser.

Usage:
    python tools/profile_query.py QUERY [QUERY ...] [--reps 2]

Writes nothing tracked; prints a readable table per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from dataextractor_spark.registry import load_all  # noqa: E402
from dataextractor_spark.session import get_session  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    spark = get_session(
        app_name="dataextractor-spark-profile",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.ui.enabled": "true",
        },
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    from bench import restage_fixtures  # noqa: E402

    env_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = restage_fixtures(spark, env_dir)
    specs = load_all()

    # warm codegen/JVM once
    specs["flagship_pricing_summary"].fn(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in args:
        fn = specs[name].fn
        best = None
        best_window = None
        for rep in range(reps):
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            jobs_after = [
                j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before
            ]
            if best is None or dt < best:
                best = dt
                best_window = jobs_after
        print(f"\n=== {name}: wall {best:.3f}s over {len(best_window)} jobs ===")
        total_job = 0.0
        for j in sorted(best_window, key=lambda j: j["jobId"]):
            sub = j.get("submissionTime")
            comp = j.get("completionTime")
            dur = "?"
            if sub and comp:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (
                    datetime.strptime(comp.replace("GMT", ""), fmt[:-2])
                    - datetime.strptime(sub.replace("GMT", ""), fmt[:-2])
                ).total_seconds()
                total_job += d
                dur = f"{d:6.3f}"
            print(
                f"  job {j['jobId']:>4} {dur}s tasks={j['numTasks']:>4} "
                f"stages={len(j['stageIds'])} desc={j.get('description','')[:60]}"
            )
            for sid in sorted(j["stageIds"]):
                try:
                    sts = _api(base, f"/stages/{sid}")
                except Exception:
                    continue
                for st in sts:
                    if st["status"] == "SKIPPED":
                        print(f"    stage {sid:>4} SKIPPED")
                        continue
                    print(
                        f"    stage {sid:>4} {st['status']:>9} "
                        f"tasks={st['numCompleteTasks']:>4} "
                        f"exec_ms={st.get('executorRunTime',0):>7} "
                        f"cpu_ms={st.get('executorCpuTime',0)//1000000:>7} "
                        f"in={st.get('inputBytes',0):>10} "
                        f"sh_r={st.get('shuffleReadBytes',0):>9} "
                        f"sh_w={st.get('shuffleWriteBytes',0):>9} "
                        f"  {st.get('name','')[:50]}"
                    )
        gap = best - total_job
        print(f"  sum(job durations)={total_job:.3f}s  driver gap={gap:.3f}s")


if __name__ == "__main__":
    main()
