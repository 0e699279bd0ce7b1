"""Similarity search over embedding columns (Layer C).

Two tiers, as a 100 TB pipeline needs:
  * brute-force cosine top-k — exact, O(n*q); fine when the query set is
    small (broadcast) or as the verification tier;
  * LSH-bucketed (random hyperplane signs) — candidates meet only inside
    a bucket; recall tuned by n_planes/n_tables.

Dot products run JVM-side via zip_with + aggregate (whole-stage codegen),
never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.joins import topk_per_group


def _dot(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity between two array<double> columns (JVM fold —
    deterministic left-to-right summation order)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    round_to: int = 6,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors: the query matrix is collected and
    broadcast (it must be the small side); each corpus partition scores
    ALL queries with one BLAS matmul inside mapInPandas and keeps only
    its per-partition top-k per query (argpartition), so the final merge
    ranks at most k * n_partitions rows per query.

    The query side is collected to the driver — contract-bound to small
    query sets. ``max_queries`` fails fast (before the collect) instead
    of letting an oversized query frame OOM the driver; raise it
    explicitly if your driver is sized for more, or use
    :func:`lsh_bucket_topk` for large-by-large.

    Scale: the corpus never shuffles for scoring; Python is the right
    tool here BECAUSE of Arrow+BLAS — the pure-JVM higher-order-fold
    version evaluates lambdas interpretively and measured ~100x slower
    at 4M pairs (80 s -> <1 s at sf0.1)."""
    import numpy as np

    # ONE guarded job instead of count-then-collect: limit(max+1) keeps
    # the driver transfer bounded (executeTake stops at max_queries + 1
    # rows), and a full result proves the query side exceeded the cap —
    # same fail-fast, one Spark job fewer per invocation.
    q_rows = queries.select(q_id, q_vec).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk collects the query side to the driver: the "
            f"query side exceeds max_queries={max_queries} rows (stopped "
            f"counting at {len(q_rows)}). Use lsh_bucket_topk for large "
            f"query sets, or raise max_queries if the driver can hold them."
        )
    # id dtypes come from the frames' schemas — int64 and string ids
    # both work (numpy object arrays broadcast fine in the mask below)
    q_id_type = dict(queries.dtypes)[q_id]
    c_id_type = dict(corpus.dtypes)[c_id]
    q_ids = np.asarray([r[q_id] for r in q_rows])
    q_mat = np.array([r[q_vec] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat / q_norm[:, None]))

    def score(batches):
        import pandas as pd

        ids, qn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[c_id].to_numpy()
            c_mat = np.array(list(pdf[c_vec]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm[c_norm == 0] = 1.0
            sims = qn @ (c_mat / c_norm[:, None]).T  # (n_q, n_c)
            sims[ids[:, None] == c_ids[None, :]] = -np.inf  # mask self-pairs
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(ids, kk)
            out_c = c_ids[top.ravel()]
            out_s = np.take_along_axis(sims, top, axis=1).ravel()
            keep = np.isfinite(out_s)
            yield pd.DataFrame(
                {q_id: out_q[keep], c_id: out_c[keep], "cos_sim": np.round(out_s[keep], round_to)}
            )

    scored = corpus.select(c_id, c_vec).mapInPandas(
        score, schema=f"{q_id} {q_id_type}, {c_id} {c_id_type}, cos_sim double"
    )
    return topk_per_group(
        scored, keys=[q_id], order=[F.col("cos_sim").desc(), F.col(c_id)], k=k
    )


def _blas_pair_scores(
    cand: DataFrame,
    q_id: str,
    c_id: str,
    q_vec: str,
    c_vec: str,
    round_to: int = 6,
) -> DataFrame:
    """Rowwise cosine of co-located (query, candidate) vector pairs in
    Arrow-batched BLAS — the shared scoring tail of every candidate-
    generation tier (IVF / LSH / near-dup). The candidates were already
    joined, so this adds no data movement; the JVM HOF fold evaluates
    its lambdas interpretively and measured ~30% slower end-to-end."""
    import numpy as np
    import pandas as pd

    rt = int(round_to)

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[q_vec]), dtype=np.float64)
            y = np.array(list(pdf[c_vec]), dtype=np.float64)
            sim = np.einsum("ij,ij->i", x, y) / (
                np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
            )
            yield pd.DataFrame(
                {q_id: pdf[q_id], c_id: pdf[c_id], "cos_sim": np.round(sim, rt)}
            )

    types = dict(cand.dtypes)
    return cand.select(q_id, q_vec, c_id, c_vec).mapInPandas(
        _score, schema=f"{q_id} {types[q_id]}, {c_id} {types[c_id]}, cos_sim double"
    )


def ivf_assign(
    df: DataFrame,
    centroids,  # np.ndarray (n_lists, dim), L2-normalized
    id_col: str,
    vec_col: str,
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids (cosine).
    Centroids broadcast; scoring is per-partition BLAS in mapInPandas —
    the vectors never shuffle for assignment."""
    import numpy as np

    bc = df.sparkSession.sparkContext.broadcast(centroids)

    def assign(batches):
        import pandas as pd

        cent = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norm = np.linalg.norm(mat, axis=1)
            norm[norm == 0] = 1.0
            sims = (mat / norm[:, None]) @ cent.T  # (n, n_lists)
            p = min(n_probe, sims.shape[1])
            lists = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), p),
                    vec_col: [v for v in pdf[vec_col] for _ in range(p)],
                    "list_id": lists.ravel().astype(np.int64),
                }
            )

    types = dict(zip(df.columns, (f.dataType.simpleString() for f in df.schema.fields)))
    return df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} {types[id_col]}, {vec_col} {types[vec_col]}, list_id long"
    )


def ivf_centroids(
    corpus: DataFrame,
    n_lists: int,
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    iters: int = 1,
):
    """Deterministic IVF centroids: seed with the ``n_lists`` corpus
    vectors of smallest md5(id) (a uniform, engine-portable pseudo-random
    sample), then ``iters`` Lloyd refinements. Each refinement assigns
    every vector to its nearest centroid (per-partition BLAS, no shuffle)
    and recomputes means with posexplode -> groupBy(list, pos) partial
    avgs — one shuffle of n_lists*dim cells, not of the vectors.

    Returns an L2-normalized numpy array (n_lists, dim). Float-sum order
    in the mean can wiggle final low bits across cluster layouts; IVF is
    an approximate index, so assignments near cell borders may differ —
    recall bounds, not exact results, are the contract."""
    import numpy as np

    seed_rows = (
        corpus.select(c_id, c_vec)
        .orderBy(F.md5(F.col(c_id).cast("string")), F.col(c_id))
        .limit(n_lists)
        .collect()
    )
    cent = np.array([r[c_vec] for r in seed_rows], dtype=np.float64)
    norms = np.linalg.norm(cent, axis=1)
    norms[norms == 0] = 1.0
    cent = cent / norms[:, None]
    spark = corpus.sparkSession
    for _ in range(iters):
        # Lloyd pass fused into ONE mapInPandas (r12, guide §4/§2.3 —
        # the same shape as pq_train): each partition assigns its
        # vectors (BLAS) and emits per-list partial sums + counts, so
        # the Arrow boundary carries n_partitions*n_lists rows of
        # (list, count, sum-vector) instead of every corpus vector
        # coming back out, and the exchange aggregates n_lists*dim
        # cells instead of corpus*dim exploded values. The mean's
        # low-bit float-sum order differs from the previous avg()
        # (see the docstring's determinism note) — assignments on real
        # corpora sit far from cell borders; verified output-identical
        # on all three test scales.
        bc = spark.sparkContext.broadcast(cent)

        def partials(batches):
            import pandas as pd

            cm = bc.value  # (n_lists, dim)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf[c_vec]), dtype=np.float64)
                norm = np.linalg.norm(mat, axis=1)
                norm[norm == 0] = 1.0
                lists = ((mat / norm[:, None]) @ cm.T).argmax(axis=1)
                out_l, out_n, out_s = [], [], []
                for li in np.unique(lists):
                    mask = lists == li
                    out_l.append(int(li))
                    out_n.append(int(mask.sum()))
                    out_s.append(mat[mask].sum(axis=0).tolist())
                yield pd.DataFrame({"list_id": out_l, "n": out_n, "vsum": out_s})

        plain = (
            corpus.select(c_vec)
            .mapInPandas(partials, schema="list_id long, n long, vsum array<double>")
            .select("list_id", "n", F.posexplode("vsum").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.sum("n").alias("cnt"), F.sum("x").alias("sx"))
            .collect()
        )
        new = cent.copy()  # empty cells keep their previous centroid
        for r in plain:
            if r["cnt"]:
                new[r["list_id"], r["pos"]] = r["sx"] / r["cnt"]
        norms = np.linalg.norm(new, axis=1)
        norms[norms == 0] = 1.0
        cent = new / norms[:, None]
        bc.destroy()
    return cent


# (index_key, n_lists, iters, id_col, vec_col) -> trained centroid matrix
_IVF_INDEX_CACHE: dict = {}


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_lists: int = 16,
    n_probe: int = 4,
    iters: int = 1,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    round_to: int = 6,
    index_key: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine: partition the corpus
    into ``n_lists`` centroid cells, probe each query's ``n_probe``
    nearest cells, exact-score only the candidates met there.

    The third ANN tier next to brute-force (exact, small query side) and
    LSH (no training): IVF scans ~n_probe/n_lists of the corpus per
    query, with recall controlled by n_probe. Scale shape: centroid
    assignment is a per-partition BLAS pass (no shuffle of the corpus);
    the probe is an equi-join on list_id — shuffle keyed on the cell id,
    candidates bounded by cell sizes, never all-pairs.

    ``index_key``: opt-in centroid memoization — an IVF INDEX is built
    once and probed many times, so repeated queries against the same
    immutable corpus should not retrain Lloyd every call. The caller
    owns cache correctness: the key must change when the corpus does
    (e.g. the warehouse path + snapshot id)."""
    import numpy as np

    cache_id = (
        None
        if index_key is None
        else (index_key, n_lists, iters, c_id, c_vec)
    )
    cent = _IVF_INDEX_CACHE.get(cache_id) if cache_id else None
    if cent is None:
        cent = ivf_centroids(corpus, n_lists, c_id, c_vec, iters=iters)
        if cache_id:
            _IVF_INDEX_CACHE[cache_id] = cent

    # Fused probe (r12, guide §4 / §8 "move heavy bytes once"): when the
    # query side fits the driver (one guarded executeTake job, the
    # brute_force_topk cap), assign the queries driver-side and run
    # assignment + candidate generation + exact scoring as ONE
    # mapInPandas over the corpus — the corpus vectors cross the Arrow
    # boundary once and never come back out. The pre-r12 shape
    # (assign mapInPandas -> list_id join -> scoring mapInPandas)
    # round-tripped every corpus vector out of Python and back in, and
    # at local scale the planner even broadcast-collected the whole
    # assigned corpus as the join's build side. Scoring arithmetic is
    # the exact _blas_pair_scores kernel (same einsum over the same raw
    # float64 pair arrays, same 6-dp round), and the query-side
    # assignment replicates ivf_assign's numpy ops — outputs verified
    # identical at all three test scales. Query sides over the cap fall
    # back to the distributed list_id-join path below.
    q_rows = queries.select(q_id, q_vec).limit(100_001).collect()
    if len(q_rows) <= 100_000:
        q_id_type = dict(queries.dtypes)[q_id]
        c_id_type = dict(corpus.dtypes)[c_id]
        q_ids = np.asarray([r[q_id] for r in q_rows])
        rt = int(round_to)
        if len(q_rows):
            q_mat = np.array([r[q_vec] for r in q_rows], dtype=np.float64)
            norm = np.linalg.norm(q_mat, axis=1)
            norm[norm == 0] = 1.0
            sims = (q_mat / norm[:, None]) @ cent.T  # same as ivf_assign
            p = min(n_probe, sims.shape[1])
            probed = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            # list_id -> (query row indices probing it)
            by_list: dict = {}
            for qi in range(len(q_rows)):
                for li in probed[qi]:
                    by_list.setdefault(int(li), []).append(qi)
        else:
            q_mat = np.zeros((0, cent.shape[1]))
            by_list = {}
        bc = corpus.sparkSession.sparkContext.broadcast(
            (cent, q_ids, q_mat, by_list)
        )

        def probe(batches):
            import pandas as pd

            cm, ids, qm, bl = bc.value
            for pdf in batches:
                if not len(pdf) or not bl:
                    continue
                c_ids = pdf[c_id].to_numpy()
                c_mat = np.array(list(pdf[c_vec]), dtype=np.float64)
                nrm = np.linalg.norm(c_mat, axis=1)
                nrm[nrm == 0] = 1.0
                lists = ((c_mat / nrm[:, None]) @ cm.T).argmax(axis=1)
                out_q, out_c, out_x, out_y = [], [], [], []
                for li in np.unique(lists):
                    qidx = bl.get(int(li))
                    if not qidx:
                        continue
                    mask = lists == li
                    mem_ids = c_ids[mask]
                    mem = c_mat[mask]
                    n_m = len(mem_ids)
                    for qi in qidx:
                        out_q.append(np.repeat(ids[qi], n_m))
                        out_c.append(mem_ids)
                        out_x.append(np.broadcast_to(qm[qi], mem.shape))
                        out_y.append(mem)
                if not out_q:
                    continue
                x = np.concatenate(out_x)
                y = np.concatenate(out_y)
                # the exact _blas_pair_scores arithmetic on raw vectors
                sim = np.einsum("ij,ij->i", x, y) / (
                    np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
                )
                oq = np.concatenate(out_q)
                oc = np.concatenate(out_c)
                keep = oq != oc  # self-pair filter, as the join's q!=c
                if keep.any():
                    yield pd.DataFrame(
                        {
                            q_id: oq[keep],
                            c_id: oc[keep],
                            "cos_sim": np.round(sim[keep], rt),
                        }
                    )

        scored = corpus.select(c_id, c_vec).mapInPandas(
            probe, schema=f"{q_id} {q_id_type}, {c_id} {c_id_type}, cos_sim double"
        )
        return topk_per_group(
            scored, keys=[q_id], order=[F.col("cos_sim").desc(), F.col(c_id)], k=k
        )

    c_asg = ivf_assign(corpus, cent, c_id, c_vec, n_probe=1)
    q_asg = ivf_assign(queries, cent, q_id, q_vec, n_probe=n_probe)
    # Distributed fallback for query sides past the driver cap: the
    # probe is an equi-join on list_id. No dropDuplicates after scoring:
    # the corpus side is assigned with n_probe=1, so a (q, c) pair can
    # meet in at most ONE list (c has exactly one list_id; the query's
    # probed lists are distinct) — the previous dedup was a provable
    # no-op costing one (q,c)-keyed exchange + first() aggregate.
    cand = q_asg.join(c_asg, "list_id").filter(F.col(q_id) != F.col(c_id))
    scored = _blas_pair_scores(cand, q_id, c_id, q_vec, c_vec, round_to)
    return topk_per_group(
        scored, keys=[q_id], order=[F.col("cos_sim").desc(), F.col(c_id)], k=k
    )


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 4,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH. Each of
    ``n_tables`` hash tables keys on the sign pattern of ``n_planes``
    fixed pseudo-random projections; a pair is a candidate if it collides
    in ANY table (OR-construction — recall grows with tables, precision
    with planes). Deterministic planes (hash-seeded) — reproducible.

    Scale: replaces the cross join with an equi join on (table, bucket) —
    shuffle cost O(n * n_tables), candidate cost = sum of bucket^2 sizes."""
    qb = queries.withColumn(
        "__b", _hyperplane_sig_expr(q_vec, dim, n_planes, n_tables)
    )
    cb = corpus.withColumn("__b", _hyperplane_sig_expr(c_vec, dim, n_planes, n_tables))
    cand = (
        # bounded: the query side is max_queries-guarded upstream
        cb.join(F.broadcast(qb), cb["__b"] == qb["__b"])
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, q_vec, c_vec)
        .dropDuplicates([q_id, c_id])
    )
    scored = _blas_pair_scores(cand, q_id, c_id, q_vec, c_vec)
    return topk_per_group(
        scored, keys=[q_id], order=[F.col("cos_sim").desc(), F.col(c_id)], k=k
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= thr) —
    the last rung of the dedup ladder (semantic dups that survive text
    normalization).

    LSH buckets generate candidates (OR over ``n_tables`` sign-pattern
    tables — high table count because near-dups at 0.95 cosine collide
    in almost every table, so recall is ~1 while the join stays linear);
    exact cosine then filters. At 100 TB this is the only viable shape:
    the all-pairs check is quadratic, the bucket join is not."""
    a = df.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    b = df.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))

    qa = a.withColumn("__b", _hyperplane_sig_expr("q_vec", dim, n_planes, n_tables))
    qb = b.withColumn("__b", _hyperplane_sig_expr("c_vec", dim, n_planes, n_tables))
    pairs = (
        qa.join(qb, (qa["__b"] == qb["__b"]) & (F.col("q_id") < F.col("c_id")))
        .select("q_id", "c_id", "q_vec", "c_vec")
        .dropDuplicates(["q_id", "c_id"])
    )
    return (
        _blas_pair_scores(pairs, "q_id", "c_id", "q_vec", "c_vec")
        .select(
            F.col("q_id").alias("id_a"),
            F.col("c_id").alias("id_b"),
            "cos_sim",
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Scalar quantization of an embedding column to ``bits``-bit integer
    codes (faiss-SQ-style with a global [min, max] range): the 100 TB
    storage/IO lever — an int8 corpus is 4x smaller than float32, and
    ANN pre-scoring over codes touches a quarter of the bytes, with the
    float tier kept only for re-scoring survivors.

    Returns ``(quantized, params)``:
      * ``quantized`` = input columns + ``qvec array<int>`` (codes in
        [0, 2^bits - 1]) + ``recon_err`` (RMS of value - dequantized);
      * ``params`` = 1-row (vmin, vmax, scale).

    code = round((v - vmin) / scale), scale = (vmax - vmin)/(2^bits - 1);
    dequant = vmin + code * scale. The range pass is one global min/max
    aggregate over exploded values (two-phase, tiny shuffle) broadcast
    back — at 100 TB run the range pass on a sample or fix the range by
    contract. All codegen array exprs; deterministic and engine-portable
    (the oracle reproduces identical codes in SQL)."""
    levels = (1 << bits) - 1
    vals = df.select(F.explode(vec_col).alias("v"))
    params = vals.agg(
        F.min("v").cast("double").alias("vmin"),
        F.max("v").cast("double").alias("vmax"),
    ).select(
        "vmin", "vmax", ((F.col("vmax") - F.col("vmin")) / levels).alias("scale")
    )
    q = F.transform(
        vec_col,
        lambda v: F.round((v - F.col("vmin")) / F.col("scale")).cast("int"),
    )
    deq = F.transform("qvec", lambda c: F.col("vmin") + c * F.col("scale"))
    err = F.sqrt(
        F.aggregate(
            F.zip_with(vec_col, deq, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.size(vec_col)
    )
    quantized = (
        # bounded: params is a 1-row min/max aggregate
        df.crossJoin(F.broadcast(params))
        .withColumn("qvec", q)
        .withColumn("recon_err", err)
        .drop("vmin", "vmax", "scale")
    )
    return quantized, params


def _hyperplane_sig_expr(vec: str, dim: int, n_planes: int, n_tables: int) -> Column:
    """Explode column of (tbl, bkt) sign-pattern signatures, built as ONE
    SQL expression string parsed JVM-side. The F.when/F.aggregate/F.zip_with
    equivalent costs hundreds of Py4J round trips (n_tables * n_planes
    lambda expressions) — measured ~2.5 s of driver-side plan-build per
    query at n_tables=4; the single expr() parse is ~50 ms. Values are
    bit-identical (same doubles via Double.parseDouble of repr())."""
    tables = []
    for t in range(n_tables):
        planes = _pseudo_planes(n_planes, dim, seed=t)
        bits = []
        for plane in planes:
            arr = ", ".join(f"CAST('{w!r}' AS DOUBLE)" for w in plane)
            bits.append(
                f"IF(aggregate(zip_with({vec}, array({arr}), (x, y) -> x * y), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= 0, '1', '0')"
            )
        tables.append(f"named_struct('tbl', {t}, 'bkt', concat({', '.join(bits)}))")
    return F.explode(F.expr("array(" + ", ".join(tables) + ")"))


def _pseudo_planes(n_planes: int, dim: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a splitmix64-style
    integer mix (public constants) — no numpy RNG state, reproducible."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            z = ((seed * 7_368_787 + p) * 1_000_003 + d + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
            z = (z ^ (z >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            row.append((z / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def exact_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_to: int = 6,
    max_vectors: int = 200_000,
) -> DataFrame:
    """ALL pairs with cosine >= threshold, exactly — the deliberately-
    exact verifier tier of semantic dedup (the scale path generates
    candidates with :func:`embedding_near_dup_pairs` first; this tier
    re-scores candidates or, at validation scale, the whole corpus).

    Quadratic FLOPs but linear data movement: the corpus is broadcast
    once as a dense matrix and each partition BLAS-multiplies its own
    rows against it — no shuffle, no cartesian join node, per-partition
    emission of only the above-threshold pairs. Cosine is rounded
    BEFORE thresholding so boundary membership is engine-portable.
    ``max_vectors`` fails fast before the broadcast collect — at corpus
    sizes past it, go through embedding_near_dup_pairs candidates."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # one guarded job (see brute_force_topk): executeTake stops at the
    # cap, and an over-full result IS the fail-fast signal
    rows = df.select(id_col, vec_col).limit(max_vectors + 1).collect()
    if len(rows) > max_vectors:
        raise ValueError(
            f"exact_cosine_pairs broadcasts the whole corpus: the corpus "
            f"exceeds max_vectors={max_vectors} vectors (stopped counting "
            f"at {len(rows)}). Use embedding_near_dup_pairs to generate "
            f"candidates at scale."
        )
    id_type = dict(df.dtypes)[id_col]
    ids = np.asarray([r[id_col] for r in rows])
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)
    rt = int(round_to)

    def score(batches):
        all_ids, m = b_ids.value, b_mat.value
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            sims = np.round(x @ m.T, rt)
            xid = pdf[id_col].to_numpy()
            for i in range(len(xid)):
                mask = (sims[i] >= thr) & (all_ids > xid[i])
                if mask.any():
                    yield pd.DataFrame(
                        {
                            "id_a": xid[i],
                            "id_b": all_ids[mask],
                            "cos_sim": sims[i][mask],
                        }
                    )

    return df.select(id_col, vec_col).mapInPandas(
        score, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def flag_near_benchmark(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    round_to: int = 6,
    max_bench: int = 100_000,
) -> DataFrame:
    """Semantic decontamination: for every corpus vector, its nearest
    BENCHMARK vector and cosine — rows at or above ``threshold`` are
    contamination (eval items paraphrased into the training set, which
    n-gram decontamination misses). The benchmark side is broadcast
    (eval sets are small by construction — the guard fails fast
    otherwise); the corpus streams through per-partition BLAS and NEVER
    shuffles — the only shape that works when the corpus is 100 TB and
    the benchmark is a few thousand rows. Ties on similarity break to
    the smallest benchmark id in both engines."""
    import numpy as np
    import pandas as pd

    # one guarded job: TakeOrdered collects at most max_bench + 1 sorted
    # rows; an over-full result IS the fail-fast signal
    rows = bench.select(id_col, vec_col).orderBy(id_col).limit(max_bench + 1).collect()
    if len(rows) > max_bench:
        raise ValueError(
            f"flag_near_benchmark broadcasts the benchmark side: the "
            f"benchmark exceeds max_bench={max_bench} rows (stopped "
            f"counting at {len(rows)})."
        )
    bench_id_type = dict(bench.dtypes)[id_col]
    corpus_id_type = dict(corpus.dtypes)[id_col]
    b_ids = np.asarray([r[id_col] for r in rows])
    b_mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    b_mat = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((b_ids, b_mat))
    thr, rt = float(threshold), int(round_to)

    def score(batches):
        ids, m = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            sims = np.round(x @ m.T, rt)
            best = sims.argmax(axis=1)  # ties -> lowest index = lowest id
            best_sim = sims[np.arange(len(x)), best]
            keep = best_sim >= thr
            if keep.any():
                yield pd.DataFrame(
                    {
                        "corpus_id": pdf[id_col].to_numpy()[keep],
                        "bench_id": ids[best[keep]],
                        "cos_sim": best_sim[keep],
                    }
                )

    return corpus.select(id_col, vec_col).mapInPandas(
        score,
        schema=f"corpus_id {corpus_id_type}, bench_id {bench_id_type}, cos_sim double",
    )
