"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N vs 4N executor comparison needs a cluster; the sandbox evidence
(per the driver instruction recorded in BASELINE.md) is the same crawl job
on the same corpus at local[8] vs local[32]. Each run happens in its own
subprocess (one SparkSession per JVM), measures steady-state throughput
(a small warmup crawl first — worker-pool fork + codegen warmup is session
setup, not per-URL work), and the parent writes BENCH/BASELINE.md.

Usage:
  python scripts/scaling_bench.py            # full: corpus gen + 8 + 32
  python scripts/scaling_bench.py --run 8    # child mode (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS", "/tmp/upton_spark_bench/scale_corpus")
N_HOSTS = int(os.environ.get("SPARK_GRAFT_SCALE_HOSTS", "600"))
IPP = int(os.environ.get("SPARK_GRAFT_SCALE_IPP", "100"))
PARAGRAPHS = int(os.environ.get("SPARK_GRAFT_SCALE_PARAGRAPHS", "30"))
CORES = [8, 32]


def gen_corpus() -> None:
    from upton_spark.plans.session import get_spark
    from upton_spark.sources.corpus import synth_pages

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark("scale_corpus_gen", cores=32, shuffle_partitions=32)
    synth_pages(
        spark, n_hosts=N_HOSTS, instances_per_host=IPP, paragraphs=PARAGRAPHS
    ).write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_child(cores: int) -> None:
    from upton_spark.crawler import Crawler
    from upton_spark.plans.session import get_spark
    from upton_spark.sources.corpus import synth_seeds

    spark = get_spark(f"scale_{cores}", cores=cores, shuffle_partitions=cores)
    pages = spark.read.parquet(CORPUS)
    seeds = synth_seeds(N_HOSTS, IPP)
    Crawler(spark, pages, seeds[: max(4, N_HOSTS // 50)]).crawl()  # warmup

    t0 = time.time()
    crawler = Crawler(spark, pages, seeds, expected_url_capacity=1 << 21)
    result = crawler.crawl()
    n_extracted = result.extracted.count()
    n_frontier = result.frontier.count()
    dt = time.time() - t0
    urls = n_extracted + n_frontier
    print(
        "SCALING_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "urls": urls,
                "seconds": round(dt, 2),
                "urls_per_sec": round(urls / dt, 1),
            }
        )
    )


def main() -> None:
    if "--run" in sys.argv:
        run_child(int(sys.argv[sys.argv.index("--run") + 1]))
        return
    gen_corpus()
    results = {}
    for cores in CORES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores)],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd="/root/repo",
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("SCALING_RESULT ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise RuntimeError(f"child {cores} failed")
        results[cores] = json.loads(line[-1].removeprefix("SCALING_RESULT "))
        print(results[cores])

    lo, hi = CORES
    r_lo, r_hi = results[lo]["urls_per_sec"], results[hi]["urls_per_sec"]
    efficiency = (r_hi / r_lo) / (hi / lo)
    md = f"""# BENCH — measured throughput & scaling (engine)

Workload: frontier crawl (schedule + fetch-join + byte-identical CSS
extraction) over a deterministic synthetic Common-Crawl-style corpus of
{N_HOSTS} hosts x ~{IPP} pages (Zipf host skew, ~{PARAGRAPHS}-paragraph pages),
{results[lo]['urls']} URLs scheduled+extracted. Same corpus, same seed list,
same politeness budget at both parallelism levels; steady-state measurement
(warmup crawl excluded). Sandbox stand-in for N vs 4N executors per
BASELINE.md ("Sandbox scaling evidence").

| parallelism | URLs | seconds | URLs/sec |
|---|---|---|---|
| local[{lo}] | {results[lo]['urls']} | {results[lo]['seconds']} | {r_lo} |
| local[{hi}] | {results[hi]['urls']} | {results[hi]['seconds']} | {r_hi} |

**Scaling efficiency ({lo} -> {hi} cores): {efficiency:.2f}**
(north_rule threshold: >= 0.8)

Reference comparison: the reference's serial loop is analytically bounded at
1/sleep pages/s (~0.033 at its 30 s default; <= ~50/s even with sleep 0 due
to single-threaded parse+IO). The engine's single-node steady state above is
{r_hi:.0f} URLs/s at local[{hi}].

Reproduce: `python scripts/scaling_bench.py` (corpus cached at {CORPUS}).
"""
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
