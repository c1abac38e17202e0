"""Per-round benchmark harness (driver contract).

Runs (a) the frontier crawl bench on a deterministic synthetic Common-Crawl
style corpus and (b) the headline operator queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1), on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON
line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "frontier": {"urls": N, "seconds": s, "urls_per_sec": r}}

Corpus size scales with env:
  SPARK_GRAFT_BENCH_HOSTS (default 100), SPARK_GRAFT_BENCH_IPP (default 40).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_crawl_bench(spark, n_hosts: int, ipp: int, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from upton_spark.crawler import Crawler
    from upton_spark.sources.corpus import synth_pages, synth_seeds

    corpus_path = os.path.join(workdir, f"corpus_{n_hosts}_{ipp}")
    if not os.path.exists(corpus_path):
        synth_pages(spark, n_hosts=n_hosts, instances_per_host=ipp).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    pages = spark.read.parquet(corpus_path)
    seeds = synth_seeds(n_hosts, ipp)

    # warmup: tiny crawl to populate the Python worker pool / codegen caches
    # so we measure steady-state throughput, not JVM+fork warmup
    Crawler(spark, pages, seeds[: max(2, n_hosts // 50)]).crawl()

    t0 = time.time()
    crawler = Crawler(spark, pages, seeds, expected_url_capacity=1 << 20)
    result = crawler.crawl()
    n_extracted = result.extracted.count()
    n_frontier = result.frontier.count()
    dt = time.time() - t0
    urls = n_frontier + n_extracted  # scheduled + extracted
    return {
        "hosts": n_hosts,
        "instances_per_host": ipp,
        "frontier_rows": n_frontier,
        "extracted_rows": n_extracted,
        "urls": urls,
        "seconds": round(dt, 2),
        "urls_per_sec": round(urls / dt, 1),
    }


HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "top_revenue_orders",
    "region_rollup_sales",
    "host_stats",
    "politeness_admission",
    "latest_event_per_user",
    "sessionization",
    "hourly_events",
    "exact_dup_groups",
    "token_stats",
    "minhash_near_dups",
    "simhash",
    "embedding_topk",
    "embedding_lsh_buckets",
    "fingerprint_rolling",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    n_hosts = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "300"))
    ipp = int(os.environ.get("SPARK_GRAFT_BENCH_IPP", "60"))
    workdir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/upton_spark_bench")
    os.makedirs(workdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from upton_spark.plans.session import get_spark

    spark = get_spark("upton_spark_bench", cores=cpus, shuffle_partitions=cpus)

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0

    frontier_stats = run_crawl_bench(spark, n_hosts, ipp, workdir)
    timings["frontier_crawl"] = frontier_stats["seconds"]
    total += frontier_stats["seconds"]

    for name in HEADLINE_QUERIES:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 2)
        total += dt

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "frontier throughput (URLs scheduled+extracted/sec) + headline operator suite",
                "value": round(total, 2),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "frontier": frontier_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
