"""Property-based tests (hypothesis): normalizer round-trips and dedup
idempotence (SURVEY.md §5.5)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dataextractor_spark.etl.normalize import (
    flatten_array_column,
    normalize_json_records,
    unpivot_dict,
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

record = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=0, max_value=2**40),
        "name": st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            max_size=12,
        ),
        "score": st.one_of(
            st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)
        ),
    }
)


@settings(**_SETTINGS)
@given(st.lists(record, min_size=1, max_size=20))
def test_normalize_roundtrip(spark, recs):
    """list-of-dicts → typed DataFrame → rows: ids and names survive
    exactly; both payload forms (objects and JSON text) agree."""
    schema = "id BIGINT, name STRING, score DOUBLE"
    out1 = normalize_json_records(spark, recs, schema=schema)
    out2 = normalize_json_records(spark, json.dumps(recs), schema=schema)
    got1 = sorted((r.id, r.name) for r in out1.collect())
    got2 = sorted((r.id, r.name) for r in out2.collect())
    want = sorted((r["id"], r["name"]) for r in recs)
    assert got1 == want and got2 == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.integers(-1000, 1000), max_size=8)),
        min_size=1,
        max_size=15,
    )
)
def test_flatten_matches_python_semantics(spark, arrays):
    """flatten(n=5) ≡ arr[i] if i < len else None, for every input."""
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "id int, arr array<int>"
    )
    out = {r.id: r for r in flatten_array_column(df, "arr", "x", 5).collect()}
    for i, a in enumerate(arrays):
        for k in range(1, 6):
            want = a[k - 1] if a is not None and len(a) >= k else None
            assert out[i][f"x_{k}"] == want


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.text(st.characters(whitelist_categories=("Nd", "Ll")), min_size=1, max_size=6),
        st.text(max_size=10),
        min_size=1,
        max_size=12,
    )
)
def test_unpivot_dict_roundtrip(spark, d):
    out = unpivot_dict(spark, d, key_col="k", value_col="v")
    assert {(r.k, r.v) for r in out.collect()} == set(d.items())


@settings(**_SETTINGS)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=30))
def test_dedup_idempotent(spark, texts):
    """dropDuplicates is idempotent and keeps exactly the distinct
    set — applying it twice changes nothing."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    once = df.dropDuplicates(["t"])
    twice = once.dropDuplicates(["t"])
    assert once.count() == len(set(texts))
    assert sorted(r.t for r in once.collect()) == sorted(r.t for r in twice.collect())


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_cosine_similarity_bounds(spark, vecs):
    """cosine ∈ [-1, 1] (within fp tolerance) and cos(v, v) = 1 for
    nonzero v — over arbitrary float32 vectors."""
    from dataextractor_spark.functions.vector import cosine_similarity

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, v array<float>"
    )
    pairs = df.alias("a").crossJoin(df.alias("b")).select(
        F.col("a.id").alias("ia"),
        F.col("b.id").alias("ib"),
        cosine_similarity("a.v", "b.v").alias("cos"),
    )
    for r in pairs.collect():
        if r.cos is not None:
            assert -1.0 - 1e-9 <= r.cos <= 1.0 + 1e-9
            if r.ia == r.ib:
                assert abs(r.cos - 1.0) < 1e-9


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        min_size=1,
        max_size=120,
    )
)
def test_chunking_reconstructs_token_stream(spark, tokens):
    """Overlap-chunking invariant: dropping the first `overlap` tokens
    of every chunk after the first and concatenating reproduces the
    original token sequence exactly — no span lost or duplicated at
    any boundary, for any document length (including docs shorter
    than one window)."""
    from pyspark.sql import functions as F

    chunk, overlap = 32, 8
    stride = chunk - overlap
    text = " ".join(tokens)
    d = spark.createDataFrame([(0, text)], "doc_id long, text string")
    toks = F.split("text", " ")
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.size(toks) - overlap) / F.lit(float(stride))),
    )
    rows = (
        d.select(
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("i"),
        )
        .select(
            "i",
            F.slice(F.col("toks"), F.col("i").cast("int") * stride + 1, chunk).alias(
                "piece"
            ),
        )
        .orderBy("i")
        .collect()
    )
    rebuilt = []
    for r in rows:
        piece = list(r.piece)
        rebuilt.extend(piece if r.i == 0 else piece[overlap:])
    assert rebuilt == tokens


_SQUEEZE = "filter(w, (x, i) -> i = 0 OR x <> w[i - 1])"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
        min_size=1,
        max_size=30,
    )
)
def test_collapse_repeats_fixed_point(spark, toks):
    """The stutter-squeeze expression behind text_collapse_repeats is
    idempotent (a second application changes nothing), matches the
    obvious sequential Python fold, and preserves first occurrences in
    order."""
    df = spark.createDataFrame([(toks,)], "w ARRAY<STRING>")
    once = df.select(F.expr(_SQUEEZE).alias("w"))
    twice = once.select(F.expr(_SQUEEZE).alias("w"))
    got_once = once.first().w
    got_twice = twice.first().w
    want = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
    assert got_once == want
    assert got_twice == got_once
