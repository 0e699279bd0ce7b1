"""A/B unigram_logprob's doc_words persist (VERDICT r11 #6): persist
(current, r11) vs recompute-per-consumer (r10 shape) at a corpus large
enough that the cache write either pays for itself or doesn't.
Synthetic: n_docs docs x ~220 tokens from a 30k-word Zipf-ish vocab."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ed_clickhouse_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

spark = get_spark("ab_unigram")
spark.range(1).count()

# Zipf-ish: word index = hash^2 folding concentrates mass on low indices
words = F.transform(
    F.sequence(F.lit(0), F.lit(220)),
    lambda i: F.concat(
        F.lit("w"),
        (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(173))
         * F.pmod(F.xxhash64(F.col("id") * 7919 + i), F.lit(173))).cast("string"),
    ),
)
corpus = (
    spark.range(N_DOCS)
    .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
    .localCheckpoint()
)
corpus.count()


def build(df, persist: bool):
    from ed_clickhouse_spark.operators._cache import pin
    from ed_clickhouse_spark.operators.text import tokens

    doc_words = (
        df.select(F.col("doc_id").alias("id"), F.explode(tokens("text")).alias("w"))
        .groupBy("id", "w")
        .agg(F.count("*").alias("tf"))
    )
    if persist:
        doc_words = pin(doc_words)
    vocab = doc_words.groupBy("w").agg(F.sum("tf").alias("cf"))
    total = doc_words.agg(F.sum("tf").alias("__total"))
    scored = (
        doc_words.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            (F.sum(F.col("tf") * F.log(F.col("cf") / F.col("__total"))) / F.sum("tf")).alias("__alp"),
        )
    )
    return scored.select(F.col("id").alias("doc_id"), "n_tok", F.round("__alp", 6).alias("avg_logprob"))


for name, persist in (("PERSIST", True), ("RECOMPUTE", False)):
    runs = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build(corpus, persist).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(f"{name} n_docs={N_DOCS}: runs={[round(r, 3) for r in runs]} best={min(runs):.3f}")
