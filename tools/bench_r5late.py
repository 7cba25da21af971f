#!/usr/bin/env python
"""Real-scale timing for the round-5 late operator wave — geo family,
categorize_text, ip_prefix, frequent_item_sets, join-field — at
sf0.1 (100k events / 5k docs / 150k orders), best-of-N, one JSON
line. Run on a quiet machine (the bench.py discipline)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "12")
    reps = int(os.environ.get("BENCH_REPS", "3"))

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from engine import geo
    from engine.joinfield import has_child
    from engine.pipeline import itemsets
    from engine.pipeline.curation import ip_prefix_agg
    from engine.pipeline.textstats import categorize_text
    from engine.session import get_spark

    spark = get_spark(app="bench-r5late", master=f"local[{cpus}]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for df in (events, docs, cust, orders):
        df.count()                                  # warm the scans

    timings: dict[str, float] = {}
    counters: dict[str, int] = {}

    def bench(name, fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            n = fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        counters[name] = n

    bench("geo_distance_topk", lambda: geo.geo_distance_query(
        events, *em.GEO_CENTER_A, em.GEO_RADIUS_KM, em.GEO_TOPK).count())
    bench("geohash_grid_p4", lambda: geo.geohash_grid(
        events, top_n=100, precision=4).count())
    bench("geotile_grid_z7", lambda: geo.geotile_grid(events, 7).count())
    bench("geo_rings", lambda: geo.geo_distance_rings(
        events, *em.GEO_CENTER_B, em.GEO_RING_EDGES).count())
    bench("categorize_text", lambda: categorize_text(
        events.select(F.concat_ws(" ", "event_type", "props")
                      .alias("msg")), text_col="msg").count())
    bench("ip_prefix", lambda: ip_prefix_agg(events, 8).count())
    bench("frequent_item_sets", lambda: itemsets.frequent_item_sets(
        docs, min_support=em.FIS_MIN_SUPPORT, top_n=em.FIS_TOPN).count())
    bench("has_child", lambda: has_child(
        cust, orders, "c_custkey", "o_custkey",
        F.col("o_totalprice") >= F.lit(em.HAS_CHILD_PRICE_FLOOR),
        F.floor(F.col("o_totalprice") * F.lit(1e6) + F.lit(0.5)),
        score_mode="sum", min_children=em.HAS_CHILD_MIN_CHILDREN,
        k=em.HAS_CHILD_K).count())

    # ---- closing wave: polygon / line / shape / ip_range / ML aggs
    from engine.pipeline.curation import ip_range_agg, random_sampler_agg
    from engine.streaming import bucket_correlation, change_point_agg

    bench("geo_polygon", lambda: geo.geo_polygon(
        events, em.GEO_POLYGON_M).count())
    bench("geo_line", lambda: geo.geo_line(
        events, em.GEO_LINE_SIZE).count())
    bench("geo_shape_counts", lambda: geo.geo_shape_counts(
        events, em.GEO_ENV_Q, em.GEO_ENV_DW_MOD,
        em.GEO_ENV_DH_MOD).count())
    bench("ip_range", lambda: ip_range_agg(events, em.IP_RANGES).count())
    bench("random_sampler", lambda: random_sampler_agg(
        events, em.RANDOM_SAMPLER_P).count())
    bench("bucket_correlation", lambda: bucket_correlation(events).count())
    bench("change_point", lambda: change_point_agg(events).count())

    print(json.dumps({"metric": "r5late_total",
                      "value": round(sum(timings.values()), 3),
                      "unit": "sec", "queries": timings,
                      "rows": counters, "sf": sf_dir, "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
