#!/usr/bin/env python
"""Driver-contract simulation: run the FULL `__spark_entry__` surface
the way the external harness does and write `DRIVER_SIM_r{N}.json`.

This mechanizes the per-round manual sweep of rounds 7-11 (same spirit
as tools/rotate_priority_order.py for the rotation): a VANILLA
SparkSession — not dataextractor_spark.session.get_session, because
the driver builds its own — with a hostile non-UTC session timezone,
then for every `queries()` entry either the strict driver-mode DuckDB
comparison (tests/oracle.py `compare_to_oracle`: columns + row count +
tolerant values + typed canonical hash form) or, for the rows-only
class, a positive-row-count check. Record format matches the driver's
CORRECTNESS_r{N}.json per-query schema exactly, wrapped with the sweep
metadata header the DRIVER_SIM files carry.

    python tools/driver_sim.py 12            # writes DRIVER_SIM_r12.json
    python tools/driver_sim.py 12 --dry-run  # run + print, write nothing

Run EXCLUSIVELY: several registry queries sink to fixed /tmp paths, so
two concurrent sweeps (or a sweep next to the pytest suite) race each
other (.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
SESSION_TZ = "America/New_York"  # hostile tz probe, per the verify skill


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 1 or not args[0].isdigit():
        print(__doc__, file=sys.stderr)
        return 1
    round_no = int(args[0])
    dry_run = "--dry-run" in sys.argv

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", SESSION_TZ)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from tests.oracle import compare_to_oracle

    t0 = time.time()
    entry_rows = len(entry_mod.entry(spark).collect())
    assert entry_rows > 0, "entry() returned no rows"

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    records: dict[str, dict] = {}
    n_green = 0
    for name, fn in qs.items():
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            if name in oracles:
                sr, orr = compare_to_oracle(fn(spark, SF_DIR), oracles[name], SF_DIR)
                rec.update(
                    rows_match=True,
                    schema_match=True,
                    hash_match=True,
                    spark_rows=sr,
                    oracle_rows=orr,
                )
                n_green += 1
            else:
                sr = fn(spark, SF_DIR).count()
                rec.update(spark_rows=sr, err="no_oracle")
                if isinstance(sr, int) and sr > 0:
                    n_green += 1
        except Exception as exc:  # record reds, never abort the sweep
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        records[name] = rec
        flag = "ok" if rec["err"] in (None, "no_oracle") else "RED"
        if flag == "RED" or len(records) % 50 == 0:
            print(f"[{len(records)}/{len(qs)}] {name}: {flag}", file=sys.stderr)

    out = {
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "session_tz": SESSION_TZ,
        "n_queries": len(qs),
        "n_green": n_green,
        "queries": records,
    }
    reds = {n: r["err"] for n, r in records.items() if r["err"] not in (None, "no_oracle")}
    print(
        json.dumps(
            {
                "n_queries": len(qs),
                "n_green": n_green,
                "reds": reds,
                "entry_rows": entry_rows,
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )
    if not dry_run:
        path = ROOT / f"DRIVER_SIM_r{round_no:02d}.json"
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path.name}", file=sys.stderr)
    return 0 if not reds else 2


if __name__ == "__main__":
    raise SystemExit(main())
