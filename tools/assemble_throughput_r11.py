"""Assembler for THROUGHPUT_r11.json: prior-round artifact + new logs.

Reads THROUGHPUT_r10.json as the evidence base (its retained samples
are treated as one legacy batch per row) and merges any number of new
bench_throughput.py logs, whose rows carry per-invocation batch ids —
samples from distinct batches concatenate, cumulative re-prints within
one batch collapse to the latest. Medians and derived throughputs are
recomputed over the merged sample sets.

Usage: python tools/assemble_throughput_r11.py [--reset op1,op2] [log ...] THROUGHPUT_r11.json

--reset drops the BASE artifact's retained samples for the named ops
(prefix match on the *_runs field) before merging: required when an
op's implementation changed between rounds — the old samples measure
the old code, and a median over both implementations describes neither.
New-log samples for the op are kept regardless.
"""

from __future__ import annotations

import json
import statistics
import sys

BASE = "THROUGHPUT_r10.json"

# (median_s field, throughput field, seconds -> items/s)
RECOMPUTE = {
    "pagerank": ("pagerank_3iter_s", "pagerank_edges_per_s_per_iter",
                 lambda m, s: int(3 * m / s)),
    "wcc": ("wcc_s", "wcc_edges_per_s", lambda m, s: int(m / s)),
    "wcc_star": ("wcc_star_s", "wcc_star_edges_per_s", lambda m, s: int(m / s)),
    "triangles": ("triangles_s", "triangles_edges_per_s", lambda m, s: int(m / s)),
    "als": ("als_3iter_s", "als_ratings_per_s_per_iter",
            lambda m, s: int(3 * m / s)),
    "als_d5": ("als_d5_3iter_s", "als_d5_ratings_per_s_per_iter",
               lambda m, s: int(3 * m / s)),
    "minhash_dedup": ("minhash_dedup_s", "minhash_dedup_docs_per_s",
                      lambda m, s: int(m / s)),
    "ngram_jaccard_dedup": ("ngram_jaccard_dedup_s",
                            "ngram_jaccard_dedup_docs_per_s",
                            lambda m, s: int(m / s)),
    "ngram_jaccard_dedup_forced_pruning": (
        "ngram_jaccard_dedup_forced_pruning_s",
        "ngram_jaccard_dedup_forced_pruning_docs_per_s",
        lambda m, s: int(m / s)),
    "clean_corpus": ("clean_corpus_s", "clean_corpus_docs_per_s",
                     lambda m, s: int(m / s)),
    "simhash": ("simhash_s", "simhash_docs_per_s", lambda m, s: int(m / s)),
    "shard_ingest": ("shard_ingest_s", "shard_ingest_edges_per_s",
                     lambda m, s: int(m / s)),
    "streaming_exact_dedup": ("streaming_exact_dedup_s",
                              "streaming_exact_dedup_docs_per_s",
                              lambda m, s: int(m / s)),
    "streaming_lsh_candidates": ("streaming_lsh_candidates_s",
                                 "streaming_lsh_candidates_docs_per_s",
                                 lambda m, s: int(m / s)),
    "streaming_lsh_batched": ("streaming_lsh_batched_s",
                              "streaming_lsh_batched_docs_per_s",
                              lambda m, s: int(m / s)),
}


def log_rows(path: str) -> list[dict]:
    out = []
    with open(path, errors="replace") as f:
        text = f.read().replace("\r", "\n")
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main():
    args = sys.argv[1:]
    reset: set[str] = set()
    if args and args[0] == "--reset":
        reset = {x for x in args[1].split(",") if x}
        args = args[2:]
    out_path = args[-1]
    logs = args[:-1]
    base = json.load(open(BASE))

    # size-key -> field -> {batch: samples}; seeded from the base artifact
    sections = {
        "throughput_scaling": ("n_edges", {}),
        "dedup_throughput": ("n_docs", {}),
        "shard_ingest": ("n_edges", {}),
        "streaming_throughput": ("n_docs", {}),
    }
    rows_by_key: dict[tuple[str, int], dict] = {}
    contribs: dict[tuple[str, int], dict[str, dict]] = {}
    for section, (size_field, _) in sections.items():
        for row in base.get(section, []):
            key = (section, row[size_field])
            rows_by_key[key] = dict(row)
            per_key = contribs.setdefault(key, {})
            for k, v in row.items():
                if k.endswith("_runs") and isinstance(v, list):
                    if any(k == f"{op}_runs" for op in reset):
                        # implementation changed this round: the base
                        # samples measure the old code — drop them AND
                        # their derived fields (recomputed from new
                        # logs if any arrive; a stale median without
                        # backing samples must not survive). Exact op
                        # match: resetting `wcc` must not drop
                        # `wcc_star` samples.
                        rows_by_key[key].pop(k, None)
                        for op in reset:
                            if k == f"{op}_runs" and op in RECOMPUTE:
                                s_field, tp_field, _ = RECOMPUTE[op]
                                rows_by_key[key].pop(s_field, None)
                                rows_by_key[key].pop(tp_field, None)
                        continue
                    per_key.setdefault(k, {})["r09"] = v

    def classify(r: dict) -> tuple[str, int] | None:
        if "n_docs" in r and any(k.startswith("streaming_") for k in r):
            return ("streaming_throughput", r["n_docs"])
        if "n_docs" in r:
            return ("dedup_throughput", r["n_docs"])
        if "shard_ingest_s" in r:
            return ("shard_ingest", r["n_edges"])
        if "n_edges" in r:
            return ("throughput_scaling", r["n_edges"])
        return None

    for p in logs:
        for r in log_rows(p):
            key = classify(r)
            if key is None:
                continue
            merged = rows_by_key.setdefault(
                key, {sections[key[0]][0]: key[1]}
            )
            per_key = contribs.setdefault(key, {})
            batch = r.get("batch") or f"legacy:{p}"
            for k, v in r.items():
                if k == "batch":
                    continue
                if k.endswith("_runs") and isinstance(v, list):
                    per_key.setdefault(k, {})[batch] = v
                    merged[k] = [
                        s for vs in per_key[k].values() for s in vs
                    ]
                elif v is not None or k not in merged:
                    merged[k] = v

    # recompute medians + derived throughput over merged samples
    for (section, size_key), merged in rows_by_key.items():
        m = size_key
        for op, (s_field, tp_field, derive) in RECOMPUTE.items():
            runs = merged.get(f"{op}_runs")
            if runs:
                med = statistics.median(runs)
                merged[s_field] = med
                merged[tp_field] = derive(m, med) if med > 0 else None
                merged["runs_per_workload"] = None  # varies; see *_runs

    out = {
        "round": 10,
        "method": base.get("method", "")
        + " Round 11: merged with new batch-tagged samples; triangles "
        "remeasured at 30M/100M/300M on the r11 join-fallback (oriented "
        "table reused, no global sort above the broadcast limit — the "
        "path 100TB actually runs; VERDICT r10 task 3), wcc_star "
        "remeasured on the r11 folded round-signature loop."
        + (
            f" Reset (implementation changed r10, old samples dropped): "
            f"{sorted(reset)}."
            if reset
            else ""
        ),
    }
    for section, (size_field, _) in sections.items():
        out[section] = sorted(
            (r for (s, _), r in rows_by_key.items() if s == section),
            key=lambda r: r[size_field],
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
