"""Sub-stage profile of candidate_pairs at bench scale: where do the ~4s go?"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from entity_resolution_pipeline_spark.operators import blocking as B
    from entity_resolution_pipeline_spark.operators.preprocess import preprocess_records
    from entity_resolution_pipeline_spark.sources.webpages import web_pages_df

    records = preprocess_records(web_pages_df(spark, 4000)).persist()
    records.count()
    keys = B.all_blocking_keys(records).persist()
    keys.count()

    def t(label, df):
        t0 = time.time()
        n = df.count()
        print(f"{label}: {time.time()-t0:.2f}s n={n}", flush=True)

    for rep in range(2):
        print(f"--- rep {rep}", flush=True)
        keyed = keys.select("url", "key", F.xxhash64("key").alias("kh"))
        sized = keyed.withColumn(
            "block_size", F.count(F.lit(1)).over(Window.partitionBy("kh"))
        ).persist()
        t("window_count(sized)", sized)
        ok = sized.where(
            (F.col("block_size") <= 64) & (F.col("block_size") >= 2)
        ).select("url", "kh")
        a, b_ = ok.alias("a"), ok.alias("b")
        raw = (
            a.join(b_, "kh")
            .where(F.col("a.url") < F.col("b.url"))
            .select(F.col("a.url").alias("url1"), F.col("b.url").alias("url2"))
        )
        t("selfjoin_raw", raw)
        t("selfjoin_distinct", raw.distinct())
        sized.unpersist()
        # full operator
        t0 = time.time()
        pairs, oversized = B.candidate_pairs(keys, max_block_size=64)
        n = pairs.count()
        print(f"full_candidate_pairs: {time.time()-t0:.2f}s n={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
