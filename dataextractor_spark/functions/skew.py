"""Skew mitigation: salted joins for hot keys (SURVEY.md §4 'skewed
keys hurt').

AQE's skew-join splitting handles sort-merge skew automatically; the
explicit salting here is for the cases AQE can't fix — e.g. a
broadcast-infeasible dim joined on a key where a handful of values
carry most of the fact table. Salting fans each hot key out to
``n_salts`` sub-keys (fact side: deterministic hash-salt; dim side:
replicated across all salts), so no single task owns a whole hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_expr(cols: list[str], n_salts: int) -> Column:
    # deterministic per-row salt: stable across retries/replays, unlike
    # rand() — a replayed task must land rows in the same partition.
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def _with_hot_flag(df: DataFrame, key: str, hot_df: DataFrame) -> DataFrame:
    """Mark each row hot/cold via a BROADCAST join against the hot-key
    set, so the hot keys never leave the cluster as Python values —
    the salting plan stays fully lazy/distributed no matter how the
    hot set was derived (typically a frequency-histogram aggregate).
    The hot frame is deduped defensively: a duplicate hot key in a
    left marker join would duplicate data rows."""
    if len(hot_df.columns) != 1:
        raise ValueError(
            "hot_keys DataFrame must have exactly one column (the key "
            f"values); got {len(hot_df.columns)}: {hot_df.columns} — "
            "silently using the first column would mis-flag rows if it "
            "is not the key (e.g. an un-projected frequency histogram)"
        )
    hk = F.broadcast(
        hot_df.select(F.col(hot_df.columns[0]).alias("_hot_key"))
        .dropDuplicates()
        .withColumn("_is_hot", F.lit(True))
    )
    return (
        df.join(hk, df[key] == hk["_hot_key"], "left")
        .drop("_hot_key")
        .withColumn("_is_hot", F.coalesce(F.col("_is_hot"), F.lit(False)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_keys,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on key with hot-key salting.

    ``hot_keys`` is either a single-column DataFrame of hot key values
    (preferred at scale: the hot set stays a distributed/broadcast
    relation end-to-end — never ``collect()``-ed into driver Python —
    so the salting works even if 'hot' means millions of keys) or a
    plain Python list (convenient for tests / truly static sets).
    Fact rows with a hot key get salt = hash(all fact columns) mod n;
    cold rows salt 0. Dim rows for hot keys are replicated across all
    n salts (cold: salt 0 only) — the dim grows by |hot|×(n-1) rows,
    negligible for real dims. Result is row-identical to the plain
    join (tests/test_plans.py proves it), but the hot key's work is
    spread over n tasks instead of one straggler.

    Fact-preserving modes run as a single salted join. Right/full
    outer need one extra step: a replicated hot-key dim row that
    matches no fact row in SOME salt would emit one null-extended row
    PER UNMATCHED SALT — and filtering the null-extended rows to a
    designated salt is NOT a fix, because a matched hot key whose
    fact rows happen to miss that salt would still emit a spurious
    null row. The correct decomposition separates "dim key absent
    from fact" (an un-salted property of the key) from the salted
    match itself:

        right outer = salted INNER  ∪  null-extend(dim ⟕̸ fact-keys)
        full  outer = salted LEFT   ∪  null-extend(dim ⟕̸ fact-keys)

    where ``fact-keys`` is ``fact.select(key).distinct()`` — the
    dedup's map-side partial aggregation collapses each hot key
    within every input partition BEFORE the shuffle, so deriving it
    is skew-free by construction, and the anti-join that finds
    never-matched dim rows (including NULL-key dim rows, which never
    equi-match) runs on keyspace-sized inputs. The price is one extra
    scan of the fact table for the key set; the single-pass
    alternative (post-join per-dim-row matched-anywhere aggregation)
    would shuffle the full join output instead.
    """
    fact_preserving = {
        "inner",
        "left",
        "left_outer",
        "left_semi",
        "left_anti",
        "cross",
    }
    dim_extending = {"right", "right_outer", "full", "full_outer", "outer"}
    if how not in fact_preserving | dim_extending:
        raise ValueError(
            f"salted_join supports {sorted(fact_preserving | dim_extending)}; "
            f"got how={how!r}"
        )
    if how in dim_extending:
        base = "inner" if how in ("right", "right_outer") else "left"
        matched = salted_join(
            fact, dim, fact_key, dim_key, hot_keys, n_salts=n_salts, how=base
        )
        fact_keys = fact.select(fact_key).distinct()
        unmatched_dim = dim.join(
            fact_keys, dim[dim_key] == fact_keys[fact_key], "left_anti"
        )
        null_extended = unmatched_dim.select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in fact.schema.fields
            ],
            *dim.columns,
        )
        # positional union: both branches emit fact.columns + dim.columns
        # in order (duplicate names between fact and dim stay positional,
        # matching the plain outer join's column layout)
        return matched.union(null_extended)
    reserved = {"_salt", "_salts", "_is_hot", "_hot_key"}
    clash = reserved & (set(fact.columns) | set(dim.columns))
    if clash:
        raise ValueError(
            f"salted_join reserves column names {sorted(reserved)} for its "
            f"salt/hot-flag plumbing; input already has {sorted(clash)} — "
            "rename or drop them first (an ambiguous-reference error or a "
            "silently dropped caller column would follow otherwise)"
        )
    fact_cols = list(fact.columns)
    if isinstance(hot_keys, DataFrame):
        fact_h = _with_hot_flag(fact, fact_key, hot_keys)
        dim_h = _with_hot_flag(dim, dim_key, hot_keys)
        is_hot_fact = is_hot_dim = F.col("_is_hot")
    else:
        fact_h, dim_h = fact, dim
        is_hot_fact = F.col(fact_key).isin(hot_keys)
        is_hot_dim = F.col(dim_key).isin(hot_keys)
    fact_s = fact_h.withColumn(
        "_salt",
        F.when(is_hot_fact, _salt_expr(fact_cols, n_salts)).otherwise(
            F.lit(0)
        ),
    ).drop("_is_hot")
    dim_s = (
        dim_h.withColumn(
            "_salts",
            F.when(
                is_hot_dim, F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("_is_hot")
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts")
    )
    joined = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["_salt"] == dim_s["_salt"]),
        how,
    )
    return joined.drop("_salt")
