"""Regenerate PLANS.md: the executed-plan evidence for the headline
operators — what `.explain("formatted")` proves about each shape claim
(broadcast vs shuffle, pushdown, codegen spans, TakeOrdered, no
CartesianProduct). Run after plan-affecting changes:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

CLAIMS = {
    "q1_pricing_summary": (
        "filter pushdown + whole-stage codegen (the *(n) stage markers)",
        ["PushedFilters", "*(1)"],
    ),
    "top_revenue_orders": (
        "top-k plans as TakeOrderedAndProject (no global sort/window)",
        ["TakeOrderedAndProject"],
    ),
    "hot_hosts_topk": (
        "skew monitor is also TakeOrdered — no single-task host histogram",
        ["TakeOrderedAndProject"],
    ),
    "rich_customers_with_orders": (
        "dim joins broadcast (BroadcastHashJoin, no corpus shuffle)",
        ["BroadcastHashJoin"],
    ),
    "minhash_near_dups": (
        "band-bucket join only — no CartesianProduct / nested-loop pair join",
        ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    ),
    "semantic_dedup": (
        "cluster-bucketed pair join — no CartesianProduct",
        ["!CartesianProduct"],
    ),
    "repetition_stats": (
        "linear explode+groupBy counting (partial-agg HashAggregates), no "
        "Python eval, no per-row quadratic array_distinct/filter lambdas",
        ["HashAggregate", "!array_distinct", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "pii_scrub": (
        "all-codegen scrub: no Python eval in the scan",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "c4_clean": (
        "map-only line cleaning: no Exchange, no Python eval",
        ["!Exchange", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "blocklist_gate": (
        "host blocklist broadcast-joins onto the frontier",
        ["BroadcastHashJoin"],
    ),
    "exact_substring_dedup": (
        "span discovery is hash-grouped, never pairwise",
        ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    ),
    "gopher_quality": (
        "structural quality rules are map-only codegen: no Exchange, no Python",
        ["!Exchange", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "lm_perplexity": (
        "O(n_buckets) LM model broadcast back onto the gram stream — "
        "no model-side shuffle",
        ["BroadcastHashJoin"],
    ),
    "planned_admission": (
        "budget dim broadcast onto the frontier; blocklist is codegen rlike "
        "(no Python, no pairwise)",
        ["BroadcastHashJoin", "!BatchEvalPython", "!CartesianProduct"],
    ),
    "bpe_token_stats": (
        "real BPE runs Arrow-batched (ArrowEvalPython), never row-at-a-time "
        "BatchEvalPython",
        ["ArrowEvalPython", "!BatchEvalPython"],
    ),
    "cdc_chunks": (
        "content-defined chunking is a map-only array pipeline over the "
        "Arrow-batched hash stream — no shuffle before the explode, "
        "nothing pairwise",
        ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    ),
    "hits_planned_admission": (
        "HITS scoring + admission: per-iteration join-agg shuffles and the "
        "per-host round window, no CartesianProduct (the only cross join is "
        "the broadcast 1-row normalization scalar), no Python eval",
        ["Window", "!CartesianProduct", "!BatchEvalPython"],
    ),
    "media_real_decode": (
        "real decode runs Arrow-batched in one mapInPandas stage",
        ["MapInPandas", "!BatchEvalPython"],
    ),
    "sitemap_discovery": (
        "Sitemap: directive extraction is codegen regexp over the "
        "dedup-latest body — no Python eval",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "surt_keys": (
        "SURT sort keys are pure codegen string work — no Python; the only "
        "Exchange is the oracle contract's ORDER BY (rangepartitioning), "
        "not the operator",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "host_split": (
        "host-disjoint split assignment is map-only codegen (md5/conv/pmod)"
        " — no Python; the only Exchange is the oracle contract's ORDER BY",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "main_content": (
        "boilerplate removal is ONE Arrow mapInPandas stage + the per-url "
        "aggregate — never row-at-a-time Python, nothing pairwise",
        ["MapInPandas", "!BatchEvalPython", "!CartesianProduct"],
    ),
    "anchor_stats": (
        "links collapse to (target, anchor) partial-agg counts BEFORE the "
        "per-target window — the window input is bounded by anchor "
        "vocabulary, not inlink count; no Python, nothing pairwise",
        ["HashAggregate", "Window", "!BatchEvalPython", "!CartesianProduct"],
    ),
    "cdx_index": (
        "CDX generation is map-only codegen (surt regexps, date_format, "
        "md5) + ONE final range sort — no Python, nothing pairwise",
        ["rangepartitioning", "!BatchEvalPython", "!ArrowEvalPython",
         "!CartesianProduct"],
    ),
    "text_normalize": (
        "the NFC step is the single Arrow stage; control strip / ws "
        "collapse / lowercase stay codegen — never row-at-a-time Python, "
        "no shuffle besides the contract ORDER BY",
        ["ArrowEvalPython", "!BatchEvalPython"],
    ),
    "sitemap_entries": (
        "url-block split + per-field extracts are codegen regexps over the "
        "dedup-latest sitemap body — no Python eval",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "sitemap_planned_admission": (
        "publisher priorities join the frontier then the per-host round "
        "window — no Python, nothing pairwise",
        ["Window", "!BatchEvalPython", "!CartesianProduct"],
    ),
    "meta_refresh": (
        "redirect extraction is two codegen regexps + ONE Arrow resolve "
        "batch — map-only (the lone Exchange is the contract ORDER BY), "
        "never row-at-a-time Python",
        ["ArrowEvalPython", "!BatchEvalPython"],
    ),
    "discovery_chain": (
        "robots->sitemap->schedule end-to-end stays codegen regexps + the "
        "per-host window; the discovery semi-join never becomes pairwise, "
        "no Python anywhere",
        ["Window", "!BatchEvalPython", "!ArrowEvalPython",
         "!CartesianProduct"],
    ),
    "trap_scores": (
        "trap heuristics are pure codegen (parse_url + array ops + one "
        "regexp) — no Python; the lone Exchange is the contract ORDER BY",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "domain_split": (
        "site-disjoint split = the same broadcast suffix match + codegen "
        "md5 bucket — still no explode, no SortMergeJoin, no Python",
        ["BroadcastHashJoin", "!SortMergeJoin", "!Generate",
         "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "registrable_domains": (
        "eTLD+1 longest-suffix match is broadcast depth dims over codegen "
        "array slices — no explode, no window, no SortMergeJoin, no Python",
        ["BroadcastHashJoin", "!SortMergeJoin", "!Generate",
         "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "sniff_type": (
        "magic-byte sniffing is pure codegen (hex-prefix probes + the "
        "anchored pair-regex NUL test) — no Python at all; the lone "
        "Exchange is the contract ORDER BY",
        ["!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "canonical_links": (
        "rel=canonical extraction is two codegen regexps + ONE Arrow "
        "resolve batch — map-only, never row-at-a-time Python",
        ["ArrowEvalPython", "!BatchEvalPython"],
    ),
    "redirect_chains": (
        "pointer doubling: a fixed log2(max_hops) join ladder, no Python, "
        "nothing pairwise",
        ["!BatchEvalPython", "!ArrowEvalPython", "!CartesianProduct"],
    ),
    "change_rate": (
        "Poisson λ̂ estimation is ONE partial-agg groupBy over the "
        "observation log + codegen arithmetic — no Python, no window",
        ["HashAggregate", "!BatchEvalPython", "!ArrowEvalPython", "!Window"],
    ),
    "freshness_planned_admission": (
        "staleness scoring rides a 1-row broadcast scalar (the injected "
        "decision instant) + the per-host admission window — no Python, "
        "no pairwise join",
        ["Window", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "shard_manifest": (
        "shard placement is map-only codegen (md5→conv→pmod); the manifest "
        "is one 16-group partial aggregate — no Python",
        ["HashAggregate", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "adaptive_delay": (
        "latency-adaptive politeness is one |hosts|-row partial aggregate "
        "with codegen clamping — no Python, no window",
        ["HashAggregate", "!BatchEvalPython", "!ArrowEvalPython", "!Window"],
    ),
    "tfidf_keywords": (
        "corpus size N arrives broadcast (1-row nested-loop side, never a "
        "row-multiplying CartesianProduct); the whole tf/df/score chain is "
        "JVM-side — no Python",
        ["BroadcastNestedLoopJoin", "!CartesianProduct", "!BatchEvalPython",
         "!ArrowEvalPython"],
    ),
    "inverted_index": (
        "postings build is partial-aggregable groupBys only — no window "
        "sort, no Python; head-term sharding happens in the grouping key",
        ["HashAggregate", "!Window", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "dup_representatives": (
        "keep-best-copy is one struct-min aggregate over the component "
        "join — no window, no pairwise join shapes",
        ["!Window", "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    ),
    "compression_ratio": (
        "one Arrow deflate stage; ratio arithmetic codegen (int64 div), "
        "no row-at-a-time Python",
        ["ArrowEvalPython", "!BatchEvalPython"],
    ),
    "charset_stats": (
        "WHATWG charset sniff is pure codegen (hex BOM probe + one "
        "regexp over the cast head) + one small rollup — no Python",
        ["!BatchEvalPython", "!ArrowEvalPython", "HashAggregate"],
    ),
    "host_graph": (
        "domain-level webgraph: PSL match broadcast-only, one site-pair "
        "partial aggregate — the exchange carries site pairs, not URLs; "
        "no window, no Python",
        ["BroadcastHashJoin", "HashAggregate", "!Window",
         "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "incremental_dedup": (
        "new-vs-history dedup is a band-bucket join — no CartesianProduct "
        "/ nested-loop pair join; texts shuffle only for candidate pairs",
        ["!CartesianProduct", "!BroadcastNestedLoopJoin"],
    ),
    "corpus_pipeline": (
        "normalize -> quality -> dedup -> rollup composes with codegen "
        "stages, a partial-aggregable min-join for first-occurrence keep "
        "(no window), and no Python anywhere",
        ["HashAggregate", "!Window", "!BatchEvalPython", "!ArrowEvalPython"],
    ),
    "embedding_sq8": (
        "SQ8 quantize + dequant fidelity is map-only codegen array math — "
        "no Python, nothing pairwise",
        ["!BatchEvalPython", "!ArrowEvalPython", "!CartesianProduct"],
    ),
    "mirror_hosts": (
        "mirror pairs meet on the shared content hash, never hosts^2 — "
        "no CartesianProduct, no Python",
        ["!CartesianProduct", "!BroadcastNestedLoopJoin",
         "!BatchEvalPython", "!ArrowEvalPython"],
    ),
}


def main() -> None:
    import __spark_entry__ as entrymod
    from upton_spark.plans.session import get_spark

    spark = get_spark("dump_plans", cores=8, shuffle_partitions=8)
    queries = entrymod.queries()
    out = [
        "# PLANS — executed-plan evidence for the headline shape claims",
        "",
        "Generated by `scripts/dump_plans.py` (sf0.01 inputs; plans are",
        "data-size independent apart from AQE partition counts). Each",
        "section states the claim, the mechanical check applied to the",
        "executed plan, and the plan itself.",
        "",
    ]
    failures = []
    for name, (claim, checks) in CLAIMS.items():
        df = queries[name](spark, SF_DIR)
        df.collect()  # finalize AQE so codegen spans / final joins are visible
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip volatile ids for a stable-ish artifact
        clean = re.sub(r"#\d+L?", "#_", plan)
        clean = re.sub(r"\[plan_id=\d+\]", "[plan_id=_]", clean)
        status = []
        for c in checks:
            want_absent = c.startswith("!")
            token = c.lstrip("!")
            present = token in plan
            ok = (not present) if want_absent else present
            status.append(f"{'NOT ' if want_absent else ''}{token}: {'OK' if ok else 'VIOLATED'}")
            if not ok:
                failures.append((name, c))
        out += [
            f"## {name}",
            "",
            f"**Claim:** {claim}",
            "",
            "**Checks:** " + "; ".join(status),
            "",
            "```",
            clean.rstrip()[:4000],
            "```",
            "",
        ]
    open("PLANS.md", "w").write("\n".join(out))
    print("PLANS.md written;", "FAILURES: " + str(failures) if failures else "all checks OK")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
