"""Tests for the Layer C dedup + similarity operators: hash-based variants
are validated against their exact counterparts (minhash vs true Jaccard,
LSH vs brute force), which is the check the DuckDB oracle can't do."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from ed_clickhouse_spark.operators.similarity import brute_force_topk, lsh_bucket_topk
from ed_clickhouse_spark.suite._util import t


def test_exact_dedup_keeps_min_id_and_counts(spark):
    df = spark.createDataFrame(
        [(3, "hello world"), (1, "hello world"), (2, "unique text"),
         (5, "hello   world")],  # extra whitespace normalizes equal
        "doc_id long, text string",
    )
    out = exact_dedup(df).collect()
    got = {r["doc_id"]: r["dup_count"] for r in out}
    assert got == {1: 3, 2: 1}


def test_minhash_estimates_track_true_jaccard(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    true = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    assert true, "fixture should contain near-dup pairs"
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs).collect()
    }
    # every strongly-similar pair must be found by LSH, with a sane estimate
    for pair, j in true.items():
        assert pair in est, f"LSH missed near-dup pair {pair} (jaccard={j})"
        assert abs(est[pair] - j) < 0.35  # 32 perms -> sigma ~ 0.09


def test_minhash_identical_docs_have_identical_signatures(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")],
        "doc_id long, text string",
    )
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_simhash_near_docs_close_in_hamming(spark):
    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(49)) + " other"
    far = " ".join(f"zzz{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    h = {r["id"]: r["simhash"] for r in simhash(df).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(h[1], h[2]) < hamming(h[1], h[3])
    assert hamming(h[1], h[2]) <= 8


def _qc(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    return q, c


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    np = pytest.importorskip("numpy")
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    q, c = _qc(spark, sf_dir)
    got = brute_force_topk(q, c, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["c_id"], r["cos_sim"]))
    for qid, hits in by_q.items():
        qv = vecs[qid]
        sims = {
            cid: float(qv @ v / (math.sqrt(qv @ qv) * math.sqrt(v @ v)))
            for cid, v in vecs.items()
            if cid != qid
        }
        expected = sorted(sims, key=lambda cid: (-round(sims[cid], 6), cid))[:3]
        assert [cid for cid, _ in hits] == expected
        for cid, s in hits:
            assert abs(s - sims[cid]) < 1e-5


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    q, c = _qc(spark, sf_dir)
    exact = {(r["q_id"], r["c_id"]) for r in brute_force_topk(q, c, k=5).collect()}
    approx = {(r["q_id"], r["c_id"]) for r in lsh_bucket_topk(q, c, k=5, dim=64).collect()}
    recall = len(exact & approx) / len(exact)
    # random 64-dim embeddings are a worst case for LSH; demand usable recall
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_brute_force_topk_query_cap(spark):
    import pytest

    from ed_clickhouse_spark.operators.similarity import brute_force_topk

    q = spark.range(10).select(
        F.col("id").alias("q_id"), F.array(F.lit(1.0)).alias("q_vec")
    )
    c = spark.range(5).select(
        F.col("id").alias("c_id"), F.array(F.lit(1.0)).alias("c_vec")
    )
    with pytest.raises(ValueError, match="max_queries"):
        brute_force_topk(q, c, k=1, max_queries=5)


def test_ivf_topk_recall_and_exhaustive_exactness(spark):
    from ed_clickhouse_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    exact = {(r["q_id"], r["c_id"]) for r in brute_force_topk(q, c, k=5).collect()}

    # probing every cell degenerates to exact search — must match brute force
    full = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(q, c, k=5, n_lists=8, n_probe=8).collect()
    }
    assert full == exact

    # partial probe trades recall for scan fraction, and keeps a useful floor
    part = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(q, c, k=5, n_lists=8, n_probe=4).collect()
    }
    recall = len(exact & part) / len(exact)
    assert recall >= 0.4  # random-ish vectors; real clusters recall far higher


def test_ivf_assign_string_ids(spark):
    """ivf_assign derives the id column type from the schema — string doc
    ids must survive the mapInPandas round trip, not be coerced to long."""
    import numpy as np

    from ed_clickhouse_spark.operators.similarity import ivf_assign

    df = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.0, 1.0])],
        "doc_id string, vec array<double>",
    )
    cent = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = {r.doc_id: r.list_id for r in ivf_assign(df, cent, "doc_id", "vec").collect()}
    assert rows == {"doc-a": 0, "doc-b": 1}


def test_dedup_clusters_components(spark):
    """Min-label propagation finds components of a path graph (worst-case
    diameter) and leaves disjoint components separate."""
    from ed_clickhouse_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # path 1-2-3-4-5 (diameter 4), triangle 10-11-12, isolated pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_max_iter_cap(spark):
    """A tiny max_iter still returns labels (partial convergence), and
    the default converges on a long path."""
    from ed_clickhouse_spark.operators.dedup import dedup_clusters

    edges = [(i, i + 1) for i in range(1, 12)]  # path of 12 nodes
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    full = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert set(full.values()) == {1}


def _pq_frames(spark):
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.catalog import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    return q, c


def test_pq_codes_well_formed(spark):
    from ed_clickhouse_spark.operators.pq import pq_encode, pq_train

    _q, c = _pq_frames(spark)
    books = pq_train(c, m=8, k=16, iters=1)
    assert books.shape == (8, 16, 8)
    codes = pq_encode(c, books).collect()
    assert len(codes) == c.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= v < 16 for v in r["codes"])


def test_pq_exhaustive_rerank_equals_brute_force(spark):
    """With rerank = |corpus|, every corpus vector is exactly re-scored,
    so the PQ pipeline must reproduce brute force bit-for-bit — the
    plumbing-correctness check (ADC only selects, rerank decides)."""
    from ed_clickhouse_spark.operators.pq import pq_topk
    from ed_clickhouse_spark.operators.similarity import brute_force_topk

    q, c = _pq_frames(spark)
    n = c.count()
    pq = {
        (r["q_id"], r["c_id"], r["cos_sim"])
        for r in pq_topk(q, c, k=5, n_codes=16, iters=1, rerank=n).collect()
    }
    bf = {
        (r["q_id"], r["c_id"], r["cos_sim"])
        for r in brute_force_topk(
            q, c, k=5, q_id="q_id", c_id="c_id", q_vec="q_vec", c_vec="c_vec"
        ).collect()
    }
    assert pq == bf


def test_pq_recall_floor(spark):
    """ADC top-100 + exact rerank reaches >=0.9 recall@5 on the synthetic
    embeddings (deterministic training -> the measured 0.967 is stable;
    random unit vectors are PQ's worst case, real embeddings do better)."""
    from ed_clickhouse_spark.operators.pq import pq_topk
    from ed_clickhouse_spark.operators.similarity import brute_force_topk

    q, c = _pq_frames(spark)
    pq = {
        (r["q_id"], r["c_id"])
        for r in pq_topk(q, c, k=5, n_codes=32, iters=2, rerank=100).collect()
    }
    bf = {
        (r["q_id"], r["c_id"])
        for r in brute_force_topk(
            q, c, k=5, q_id="q_id", c_id="c_id", q_vec="q_vec", c_vec="c_vec"
        ).collect()
    }
    assert len(pq & bf) / len(bf) >= 0.9


def test_exact_cosine_pairs_matches_bruteforce(spark, sf_dir):
    """exact_cosine_pairs finds every pair brute-force finds (and only
    those), and the collect guard fails fast."""
    import pytest
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.catalog import read_table
    from ed_clickhouse_spark.operators.similarity import exact_cosine_pairs

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in exact_cosine_pairs(emb, 0.3).collect()
    }
    # reference: plain SQL theta-join on the same rounded cosine
    emb.createOrReplaceTempView("__ecp")
    want = {
        (r["a"], r["b"])
        for r in spark.sql(
            """
            SELECT x.vec_id a, y.vec_id b FROM __ecp x JOIN __ecp y
            ON x.vec_id < y.vec_id
            WHERE ROUND(
              aggregate(zip_with(x.vec, y.vec, (p,q) -> p*q), 0.0d, (s,v) -> s+v)
              / (sqrt(aggregate(transform(x.vec, p -> p*p), 0.0d, (s,v) -> s+v))
                 * sqrt(aggregate(transform(y.vec, p -> p*p), 0.0d, (s,v) -> s+v))),
              6) >= 0.3
            """
        ).collect()
    }
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="max_vectors"):
        exact_cosine_pairs(emb, 0.3, max_vectors=3).collect()


def test_brute_force_topk_string_ids(spark):
    """id columns keep their schema type: string doc-ids work end-to-end
    (the output schema is derived from the inputs, not hardcoded int64)."""
    from ed_clickhouse_spark.operators.similarity import brute_force_topk

    q = spark.createDataFrame(
        [("qa", [1.0, 0.0]), ("qb", [0.0, 1.0])], ["q_id", "q_vec"]
    )
    c = spark.createDataFrame(
        [("c1", [1.0, 0.1]), ("c2", [0.1, 1.0]), ("c3", [0.7, 0.7])],
        ["c_id", "c_vec"],
    )
    got = brute_force_topk(q, c, k=1).collect()
    assert dict(got[0].asDict(), **{}) and {r["q_id"]: r["c_id"] for r in got} == {
        "qa": "c1", "qb": "c2"
    }
    types = dict((f.name, f.dataType.simpleString())
                 for f in brute_force_topk(q, c, k=1).schema.fields)
    assert types["q_id"] == "string" and types["c_id"] == "string"


def test_excise_repeated_passages(spark):
    """Span excision: duplicated 3-grams vanish everywhere except the
    lowest-doc_id keeper; overlapping spans union; short docs and
    unique docs pass through byte-identical."""
    from ed_clickhouse_spark.operators.dedup import excise_repeated_passages

    boiler = "terms of service apply here now"  # 6 tokens
    docs = [
        (1, f"alpha beta {boiler} gamma"),       # keeper of the boilerplate
        (2, f"delta {boiler} epsilon zeta"),     # boilerplate excised
        (3, "unique words only in this document"),
        (4, "tiny doc"),                          # < n tokens: no grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in excise_repeated_passages(
            df, "doc_id", "text", n=3, min_docs=2
        ).collect()
    }
    assert len(out) == 4
    # keeper keeps everything
    assert out[1] == (f"alpha beta {boiler} gamma", 0)
    # doc 2: every token covered by some duplicated 3-gram is gone;
    # 'delta', 'epsilon', 'zeta' never sit inside a shared 3-gram window
    # that doc 1 also has... the shared grams are the 4 windows inside
    # the 6-token boilerplate, covering exactly those 6 tokens.
    assert out[2] == ("delta epsilon zeta", 6)
    assert out[3] == ("unique words only in this document", 0)
    assert out[4] == ("tiny doc", 0)
