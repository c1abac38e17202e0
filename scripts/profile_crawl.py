"""Per-phase wall-clock profile of the bench crawl at one parallelism level.

Usage: python scripts/profile_crawl.py <cores>

Breaks the scaling-bench workload (scripts/scaling_bench.py) into its
driver-visible phases so the N- vs 4N-core comparison (see scaling_bench.py) shows which phase
fails to scale (serial driver work vs parallel extraction work). Run it at
two levels and diff the phase columns.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_HOSTS = int(os.environ.get("SPARK_GRAFT_SCALE_HOSTS", "600"))
IPP = int(os.environ.get("SPARK_GRAFT_SCALE_IPP", "100"))
PARAGRAPHS = int(os.environ.get("SPARK_GRAFT_SCALE_PARAGRAPHS", "600"))
CORPUS = os.environ.get(
    "SPARK_GRAFT_SCALE_CORPUS",
    f"/tmp/upton_spark_bench/scale_corpus_{N_HOSTS}x{IPP}x{PARAGRAPHS}",
)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from pyspark.sql import functions as F

    from upton_spark.crawler import Crawler
    from upton_spark.plans.session import get_spark
    from upton_spark.sources.corpus import synth_seeds

    spark = get_spark(f"profile_{cores}", cores=cores, shuffle_partitions=cores)
    pages = spark.read.parquet(CORPUS)
    seeds = synth_seeds(N_HOSTS, IPP)

    # warmup (same as bench)
    wres = Crawler(
        spark, pages, seeds[: max(4, N_HOSTS // 50)], assume_unique_urls=True,
        pages_path=CORPUS,
    ).crawl()
    wres.extracted.agg(F.sum(F.length("text"))).collect()

    marks: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        t = time.time()
        marks[name] = round(t - t0, 2)
        return t

    t_start = t0 = time.time()
    crawler = Crawler(
        spark, pages, seeds, expected_url_capacity=1 << 21, assume_unique_urls=True,
        pages_path=CORPUS,
    )
    seen = crawler._empty_seen()
    t0 = mark("init", t0)
    links, seen = crawler.run_index_phase(seen)
    t0 = mark("index_phase", t0)
    frontier = crawler.build_frontier(links)
    t0 = mark("build_frontier", t0)
    frontier, seen = crawler.run_fetch_rounds(frontier, seen)
    t0 = mark("fetch_rounds", t0)
    slim = frontier.select("url", "seed_id", "instance_index", "pagination_index", "status")
    extracted = crawler.extract(crawler.attach_bodies(slim))
    t0 = mark("plan_extract", t0)
    row = extracted.agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("text_bytes")
    ).collect()[0]
    t0 = mark("extract_action", t0)
    n_frontier = frontier.count()
    t0 = mark("frontier_count", t0)
    total = round(time.time() - t_start, 2)
    urls = row["n"] + n_frontier
    print(
        "PROFILE "
        + json.dumps(
            {
                "cores": cores,
                "total": total,
                "urls": urls,
                "urls_per_sec": round(urls / total, 1),
                "phases": marks,
            }
        )
    )


if __name__ == "__main__":
    main()
