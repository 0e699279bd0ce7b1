"""A/B exact_dedup shapes (VERDICT r11 #4): full-row min_by(struct)
SortAggregate (current) vs narrow two-pass (min-id+count per fp, join
winners back). Two corpus shapes, realistic ~1KB texts, noop sink."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.operators.text import fingerprint

spark = get_spark("ab_q44")
spark.range(1).count()

def make_corpus(n_rows, n_distinct):
    # ~1KB pseudo-text per distinct value, deterministic
    words = F.transform(
        F.sequence(F.lit(0), F.lit(120)),
        lambda i: F.substring(F.md5(((F.col("id") % n_distinct) * 1000 + i).cast("string")), 1, 8),
    )
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            (F.col("id") % 7).alias("source"),
        )
        .localCheckpoint()  # materialize so generation isn't timed
    )

def variant_a(df):  # current: full-row min_by struct aggregate
    fp = fingerprint("text")
    cols = df.columns
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(
            F.min_by(F.struct(*[F.col(c) for c in cols]), F.col("doc_id")).alias("__row"),
            F.count("*").alias("dup_count"),
        )
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols], "dup_count")
    )

def variant_b(df):  # narrow two-pass: min-id winners + join back
    fp = fingerprint("text")
    cols = df.columns
    w = (
        df.select(fp.alias("__fp"), F.col("doc_id"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("__win"), F.count("*").alias("dup_count"))
        .select("__win", "dup_count")
    )
    return df.join(w, df["doc_id"] == w["__win"]).select(*cols, "dup_count")

for shape, (n, d) in {"dup_heavy": (400_000, 40_000), "mostly_unique": (400_000, 400_000)}.items():
    corpus = make_corpus(n, d)
    corpus.count()
    for name, fn in (("A_minby", variant_a), ("B_twopass", variant_b)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(corpus).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"{shape} {name}: runs={[round(r,3) for r in runs]} best={min(runs):.3f}")
    # sanity: same result set
    na = variant_a(corpus).count(); nb = variant_b(corpus).count()
    assert na == nb == d, (na, nb, d)
    corpus.unpersist()
print("outputs-equal-count OK")
