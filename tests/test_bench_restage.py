"""bench.py restage plumbing: the unsplit-table byte copy must handle
both fixture layouts (plain single-file parquet and directory-style
Spark-written tables) — the round-8 copyfile-only branch raised
IsADirectoryError on the latter."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from bench import _copy_fixture


def _tiny_table() -> pa.Table:
    return pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})


def test_copy_fixture_plain_file(tmp_path):
    src = str(tmp_path / "t.parquet")
    dst = str(tmp_path / "out" / "t.parquet")
    os.makedirs(tmp_path / "out")
    pq.write_table(_tiny_table(), src)
    _copy_fixture(src, dst)
    assert pq.read_table(dst).equals(_tiny_table())


def test_copy_fixture_directory_layout(tmp_path):
    # a Spark-written table: a directory of part files plus _SUCCESS
    src = tmp_path / "t.parquet"
    src.mkdir()
    pq.write_table(_tiny_table(), str(src / "part-00000.parquet"))
    (src / "_SUCCESS").touch()
    dst = str(tmp_path / "out" / "t.parquet")
    os.makedirs(tmp_path / "out")
    _copy_fixture(str(src), dst)
    assert os.path.isdir(dst) and os.path.exists(os.path.join(dst, "_SUCCESS"))
    assert pq.read_table(os.path.join(dst, "part-00000.parquet")).equals(
        _tiny_table()
    )


def test_bench_detail_record_provenance():
    """The tracked BENCH_detail.json is a cross-round record the judge
    diffs, so its provenance must prove it came from an explicit
    `bench.py --record` run at a commit that is an ancestor of HEAD
    (r10 verdict item 5): a record produced by a plain run (the r9
    clobber), by a hand edit, or carried over from an unrelated branch
    fails fast here instead of at judge time."""
    import json
    import pathlib
    import re
    import subprocess

    root = pathlib.Path(__file__).resolve().parent.parent
    prov = json.load(open(root / "BENCH_detail.json"))["provenance"]
    m = re.fullmatch(
        r"bench\.py --record at git ([0-9a-f]{7,40}), sf=[0-9.]+, reps=\d+",
        prov,
    )
    assert m, f"not a --record provenance stamp: {prov!r}"
    sha = m.group(1)
    res = subprocess.run(
        ["git", "merge-base", "--is-ancestor", sha, "HEAD"],
        cwd=root,
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert res.returncode == 0, (
        f"record provenance commit {sha} is not an ancestor of HEAD: "
        f"{res.stderr.strip() or res.stdout.strip()}"
    )
