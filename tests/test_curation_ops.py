"""Contract tests for the round-3 curation/graph additions beyond
what the DuckDB oracle already pins (tests/test_correctness.py runs
every registered query against its oracle; these assert the semantic
invariants the oracle comparison alone can't express).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataextractor_spark.functions.pagerank import pagerank
from dataextractor_spark.registry import load_all
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_pagerank_mass_conserved_and_hubs(spark, registry):
    """With no dangling nodes, total rank mass is exactly the initial
    1.0 each sweep redistributes; and the 50×-fewer supplier nodes
    must each carry more rank than any part node (hub effect)."""
    out = registry["graph_pagerank"].fn(spark, SF_SMALL).collect()
    by_type = {r["node_type"]: r for r in out}
    assert set(by_type) == {"part", "supplier"}
    total = by_type["part"]["rank_mass"] + by_type["supplier"]["rank_mass"]
    assert abs(total - 1.0) < 1e-4
    assert by_type["supplier"]["min_rank"] > by_type["part"]["max_rank"]


def test_pagerank_uniform_on_regular_graph(spark):
    """On a k-regular symmetric graph (a cycle), PageRank is exactly
    the uniform distribution at every sweep — a closed-form pin of
    the damping/normalization arithmetic."""
    n = 12
    edges = spark.createDataFrame(
        [(str(i), str((i + 1) % n)) for i in range(n)]
        + [(str((i + 1) % n), str(i)) for i in range(n)],
        "src string, dst string",
    )
    ranks = pagerank(edges, iterations=4).collect()
    assert len(ranks) == n
    for r in ranks:
        assert abs(r["rank"] - 1.0 / n) < 1e-12


def test_pii_redaction_hits_every_doc(spark, registry):
    """Each doc is seeded with exactly one email + one phone, so the
    redactor must report emails_found == phones_found == n_docs and
    every doc changed — zero misses, zero spurious extra matches."""
    rows = registry["text_pii_redact"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["emails_found"] == r["n_docs"]
        assert r["phones_found"] == r["n_docs"]
        assert r["docs_changed"] == r["n_docs"]


def test_gopher_gate_partitions_corpus(spark, registry):
    """The gate's funnel must account for every document (n_pass ≤
    n_docs, per-rule fails ≤ n_docs) and actually discriminate on
    this corpus (some pass, some fail overall)."""
    rows = registry["text_gopher_filters"].fn(spark, SF_SMALL).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_pass = sum(r["n_pass"] for r in rows)
    assert 0 < n_pass < n_docs
    for r in rows:
        for c in ("fail_len", "fail_mean_wlen", "fail_ttr", "fail_stopword"):
            assert 0 <= r[c] <= r["n_docs"]


def test_merge_upsert_accounting(spark, registry):
    """updated+unchanged must equal the base row count (MERGE never
    drops or duplicates base rows), and inserted keys are disjoint
    from the base key space (the +1e8 offset)."""
    from dataextractor_spark.catalog import load_table

    base_n = load_table(spark, SF_SMALL, "orders").count()
    rows = {r["action"]: r for r in
            registry["etl_merge_upsert"].fn(spark, SF_SMALL).collect()}
    assert rows["updated"]["n_rows"] + rows["unchanged"]["n_rows"] == base_n
    assert rows["inserted"]["min_key"] >= 100000000
    assert rows["updated"]["max_key"] < 100000000


def test_scalar_subquery_rows_are_group_maxima(spark, registry):
    """Every returned part's price equals its brand's max price."""
    from dataextractor_spark.catalog import load_table

    out = registry["subquery_scalar_correlated"].fn(spark, SF_SMALL)
    brand_max = (
        load_table(spark, SF_SMALL, "part")
        .groupBy("p_brand")
        .agg(F.max("p_retailprice").alias("mx"))
    )
    bad = out.join(brand_max, "p_brand").filter(
        F.col("top_price") != F.col("mx")
    )
    assert bad.count() == 0


def test_span_extract_spans_are_real(spark, registry):
    """The reported spans must be literally true of the texts: slicing
    doc_a at [start_a, start_a+span) and doc_b at [start_b, ...) must
    yield the SAME token sequence — checked in plain Python for the
    top 5 spans, independent of both engines' SQL."""
    from dataextractor_spark.catalog import load_table

    spans = registry["dedup_span_extract"].fn(spark, SF_SMALL).collect()
    assert spans, "fixture corpus is known to contain duplicated spans"
    texts = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    for s in spans[:5]:
        assert s["span_tokens"] >= 8  # k-gram floor
        assert s["doc_a"] < s["doc_b"]
        a = texts[s["doc_a"]][s["start_a"] - 1 : s["start_a"] - 1 + s["span_tokens"]]
        b = texts[s["doc_b"]][s["start_b"] - 1 : s["start_b"] - 1 + s["span_tokens"]]
        assert a == b and len(a) == s["span_tokens"]


def test_decontaminate_bounds_and_split(spark, registry):
    """Contamination counts are bounded by the train split size, and
    the train split excludes every doc_id%17 eval doc (no self-hits:
    an eval doc can never be reported as contaminated train)."""
    from dataextractor_spark.catalog import load_table

    rows = registry["text_decontaminate"].fn(spark, SF_SMALL).collect()
    d = load_table(spark, SF_SMALL, "documents")
    n_train_total = d.filter(
        (F.col("doc_id") % 17 != 0) & (F.size(F.split("text", " ")) >= 8)
    ).count()
    assert sum(r["n_train"] for r in rows) == n_train_total
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_train"]
        assert 0.0 <= r["contamination_rate"] <= 1.0


def test_mixture_sampling_fills_quotas(spark, registry):
    """Every source must contribute exactly its weighted quota (the
    fixture's sources are large enough), quotas follow the 1+n%4
    weight cycle over the 120-doc budget, and no source is dropped."""
    rows = registry["sample_mixture_weights"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_taken"] == r["quota"] <= r["n_avail"]
    assert sorted({r["quota"] for r in rows}) == [2, 4, 7, 9]
    assert sum(r["n_taken"] for r in rows) == 110


def test_pq_codes_and_error_identity(spark):
    """PQ invariants on the real corpus: codes are m ints in
    [0, ksub); the per-corpus total reconstruction error equals the
    sum of the m sliced sub-problems' k-means inertias (the defining
    identity of product quantization); and a learned codebook never
    reconstructs worse than its seed-only (0-sweep) starting point."""
    from dataextractor_spark.catalog import load_table
    from dataextractor_spark.functions.kmeans import inertia
    from dataextractor_spark.functions.pq import pq_encode, pq_fit

    e = load_table(spark, SF_SMALL, "embeddings")
    m, ksub, dim = 4, 16, 64
    books = pq_fit(e, m=m, ksub=ksub, dim=dim, max_iter=2)
    enc = pq_encode(e, books)
    rows = enc.select("code", "recon_err").collect()
    for r in rows:
        assert len(r["code"]) == m
        assert all(0 <= c < ksub for c in r["code"])
        assert r["recon_err"] >= 0.0

    total_err = sum(r["recon_err"] for r in rows)
    ds = dim // m
    inertia_sum = sum(
        inertia(
            e.select(F.slice("embedding", j * ds + 1, ds).alias("sub")),
            books[j],
            vec_col="sub",
        )
        for j in range(m)
    )
    assert abs(total_err - inertia_sum) < 1e-6 * max(total_err, 1.0)

    seed_books = pq_fit(e, m=m, ksub=ksub, dim=dim, max_iter=0)
    seed_err = (
        pq_encode(e, seed_books).agg(F.sum("recon_err")).first()[0]
    )
    assert total_err <= seed_err + 1e-9

    books2 = pq_fit(e, m=m, ksub=ksub, dim=dim, max_iter=2)
    assert books2 == books  # deterministic fit


def test_pq_adc_equals_reconstruction_distance(spark, registry):
    """ADC's defining identity: the reported distance for (query,
    candidate) must equal the exact L2² between the query's raw vector
    and the candidate's PQ RECONSTRUCTION (sub-centroids selected by
    its codes) — recomputed here in plain Python for every reported
    pair."""
    from dataextractor_spark.catalog import load_table
    from dataextractor_spark.functions.pq import pq_encode, pq_fit

    m, ksub, dim = 4, 16, 64
    ds = dim // m
    e = load_table(spark, SF_SMALL, "embeddings")
    books = pq_fit(e, m=m, ksub=ksub, dim=dim, max_iter=4)
    codes = {
        r["vec_id"]: r["code"] for r in pq_encode(e, books).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}

    out = registry["sim_pq_adc_search"].fn(spark, SF_SMALL).collect()
    assert out and len({r["query_id"] for r in out}) == 3
    for r in out:
        qv = vecs[r["query_id"]]
        recon = [
            v
            for j in range(m)
            for v in books[j][codes[r["vec_id"]][j]]
        ]
        d2 = sum((float(a) - b) ** 2 for a, b in zip(qv, recon))
        assert abs(d2 - r["adc_dist"]) < 1e-4, (r, d2)
