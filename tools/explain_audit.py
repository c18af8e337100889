"""Physical-plan audit for the headline queries.

For each audited query, prints plan-hygiene facts the scale design
depends on:
- ReadSchema width at the parquet scans (column pruning reached the scan)
- PushedFilters present where the query filters a base table
- join strategies (broadcast vs sort-merge) and exchange count
- whole-stage codegen coverage

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from graphchi_cpp_spark.session import get_spark

# the 10 most expensive BENCH queries (descending r6/r7 cost) first,
# then the rest of the headline set
AUDIT = [
    "triangle_count",
    "itemsim2rating",
    "msf",
    "ngram_jaccard_dedup",
    "pagerank",
    "scc",
    "wcc",
    "als_rmse_history",
    "als_coord_rmse_history",
    "streaming_pagerank",
    "itemcf_jaccard",
    "minhash_dedup",
    "degree_distribution",
    "topk_per_user",
    "minhash_lsh_candidates",
    "simhash",
    "ann_lsh_topk",
    "ann_cosine_topk",
    "token_stats",
    "events_hourly",
    "sessionize",
    "ann_ivf_topk",
    "repetition_stats",
    "clean_corpus",
]


def audit(name: str, plan: str) -> dict:
    return {
        "query": name,
        "exchanges": plan.count("Exchange "),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": plan.count("Scan parquet"),
        "pushed_filters": plan.count("PushedFilters: ["),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]{0,120})", plan),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or AUDIT
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        info = audit(name, plan)
        schemas = info.pop("read_schemas")
        print(f"{name}: {info}")
        for s in schemas[:4]:
            print(f"    scan reads: {s}")


if __name__ == "__main__":
    main()
