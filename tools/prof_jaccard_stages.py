import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.suite._util import t
from ed_clickhouse_spark.operators.dedup import _spread, shingles
from ed_clickhouse_spark.operators._cache import pin

spark = get_spark("prof_q45")
spark.range(1).count()
sf_dir = "/root/testdata/sf0.1"

for rep in range(3):
    spark.catalog.clearCache()
    d = t(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    sh = _spread(d).select(F.col("doc_id").alias("id"), F.explode(shingles("text", 3)).alias("__s")).select("id", F.xxhash64("__s").alias("sh"))
    grouped = sh.groupBy("sh").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    grouped = grouped.where(F.size("ids") <= 10)
    grouped = pin(grouped)
    n_g = grouped.count()
    t1 = time.perf_counter()
    sizes = grouped.select(F.explode("ids").alias("id")).groupBy("id").agg(F.count("*").alias("n_sh"))
    combos = F.flatten(F.transform(F.col("ids"), lambda x, i: F.transform(F.slice(F.col("ids"), i + 2, F.size("ids")), lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    pairs = pin(grouped.where(F.size("ids") > 1).select(F.explode(combos).alias("p")).groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")).agg(F.count("*").alias("inter")))
    n_p = pairs.count()
    t2 = time.perf_counter()
    pair_ids = pairs.select(F.col("id_a").alias("id")).union(pairs.select(F.col("id_b").alias("id"))).distinct()
    sizes_small = pin(sizes.join(pair_ids, "id", "left_semi"))
    sa = sizes_small.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes_small.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (pairs.join(sa, "id_a").join(sb, "id_b")
           .withColumn("jaccard", F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6))
           .filter(F.col("jaccard") >= 0.5).select("id_a", "id_b", "jaccard"))
    n_o = out.count()
    t3 = time.perf_counter()
    print(f"rep{rep}: grouped {t1-t0:.3f}s ({n_g} rows)  pairs {t2-t1:.3f}s ({n_p})  tail {t3-t2:.3f}s ({n_o})  total {t3-t0:.3f}s")
