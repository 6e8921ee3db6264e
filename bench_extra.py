"""Extra benchmarks for optimization work (guide §1.4): per-query
isolation with the noop sink, best-of-N legs with the same load/steal
gating as bench.py. NOT the frozen driver bench — bench.py stays the
measured artifact; this file exists so optimization evidence in
OPTIMIZATION_r07.md can cite noop-sink numbers without touching it.

Usage:
    python bench_extra.py [query ...]          # default: the heavy set
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py sim_semdedup sim_pq

Prints one JSON line: {"queries": {name: best_sec}, "legs": {...}}.
"""

from __future__ import annotations

import json
import os
import sys

from bench import _timed_leg

DEFAULT = [
    "sim_kmeans_assign", "sim_ann_kmeans", "sim_semdedup", "sim_pq",
    "dedup_ngram_pairs", "dedup_minhash_lsh", "ta_bpe_train",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_legs = int(os.environ.get("SPARK_GRAFT_EXTRA_LEGS", "3"))
    names = sys.argv[1:] or DEFAULT

    from extract_text_spark.queries import QUERIES
    from extract_text_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 32))
    timings: dict[str, float] = {}
    legs: dict[str, list[list[float]]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")

        def _leg(n=name):
            # noop sink: computes every column of every row, discards —
            # count() would let the optimizer prune (guide §1.4)
            QUERIES[n](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()

        legs[name] = [_timed_leg(_leg) for _ in range(n_legs)]
        timings[name] = round(min(s for s, *_ in legs[name]), 3)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"queries": timings, "legs": legs}))


if __name__ == "__main__":
    main()
