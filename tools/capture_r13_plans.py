"""Capture `.explain("formatted")` snapshots for the r13 optimization
round's evidence files: plans/r13/<query>_<tag>.txt.

Usage:
    python tools/capture_r13_plans.py TAG QUERY [QUERY ...]

TAG is `before` or `after`. Captured at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1, unrestaged — plan shape does not depend on the
file split). One session for all queries.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from dataextractor_spark.registry import load_all  # noqa: E402
from dataextractor_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(
        app_name="dataextractor-spark-plan-capture",
        extra_conf={"spark.sql.maxToStringFields": "400"},
    )
    specs = load_all()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
