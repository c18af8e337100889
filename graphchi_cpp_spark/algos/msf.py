"""Minimum spanning forest (G10) — Borůvka star contraction.

Reference: ``example_apps/minimumspanningforest.cpp`` — per round each
vertex/component picks its minimum-weight incident edge (``:151``), the
chosen edges join the forest, components contract (min-label propagation),
and a second program writes the contracted graph as a NEW sharded edge
table per round (``:305``, sink wiring ``:379-416`` — the C13
sharded_graph_output). Tie-breaking: the reference orders by weight with
deterministic comparison; we break ties on (weight, src, dst).

Spark recipe per Borůvka round over component-labeled edges:
1. cross-component edges only; per component, min_by((w, src, dst)) edge.
2. chosen edges → forest (dedup both orientations).
3. contract: WCC on (component-graph of chosen edges) relabels components
   (min-label loop on the tiny chosen-edge graph).
4. re-label edge endpoints; emit the contracted edge table (the per-round
   parquet-able snapshot ↔ reference's per-round shard write).
Rounds are O(log V) since components at least halve.

Scale note: each round's heavy ops are one groupBy(component).min_by and
two relabel joins; the chosen-edge graph is ≤ one edge per component, so
the contraction loop runs on a vanishing fraction of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphchi_cpp_spark.graph import PropertyGraph


def minimum_spanning_forest(
    graph: PropertyGraph,
    weight_col: str = "weight",
    max_rounds: int = 30,
    contraction_collect_threshold: int = 2_000_000,
) -> DataFrame:
    """Returns forest edges (src, dst, weight) — an MSF of the undirected
    graph (edges interpreted bidirectionally, weight from ``weight_col``)."""
    e = graph.edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("w")
    )
    # canonical undirected form, min weight per pair
    und = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    # component label per vertex, initially self
    comp = (
        und.select(F.col("src").alias("id"))
        .unionByName(und.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    forest_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        # label endpoints with current components
        lab = (
            und.join(comp.withColumnRenamed("id", "src").withColumnRenamed("comp", "ca"), "src")
            .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("comp", "cb"), "dst")
            .filter(F.col("ca") != F.col("cb"))
        )
        if lab.limit(1).count() == 0:
            break
        # per component: cheapest outgoing edge, deterministic tiebreak
        cand = lab.select(
            F.explode(F.array("ca", "cb")).alias("comp"),
            F.struct("w", "src", "dst", "ca", "cb").alias("e"),
        )
        per_comp = (
            cand.groupBy("comp")
            .agg(F.min("e").alias("e"))
            .select(
                "comp",
                F.col("e.src").alias("src"),
                F.col("e.dst").alias("dst"),
                F.col("e.w").alias("w"),
                F.when(F.col("comp") == F.col("e.ca"), F.col("e.cb"))
                .otherwise(F.col("e.ca"))
                .alias("other"),
            )
            .localCheckpoint(eager=True)
        )
        forest_parts.append(
            per_comp.select("src", "dst", F.col("w").alias("weight")).dropDuplicates(
                ["src", "dst"]
            )
        )
        # contract the chosen-edge component graph. The table has ONE row
        # per live component and halves every round, so it is orders of
        # magnitude smaller than the data: collect + driver union-find +
        # broadcast mapping is the fast path (one job instead of an
        # O(log n) pointer-jumping loop of jobs). Falls back to
        # distributed pointer jumping above the threshold.
        pairs = per_comp.select("comp", "other")
        if pairs.count() <= contraction_collect_threshold:
            rows = pairs.collect()
            uf: dict = {}

            def find(x):
                r = x
                while uf.setdefault(r, r) != r:
                    r = uf[r]
                while uf[x] != r:
                    uf[x], x = r, uf[x]
                return r

            for row in rows:
                ra, rb = find(row["comp"]), find(row["other"])
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    uf[rb] = ra
            mapping = [(c, find(c)) for c in list(uf)]
            spark = graph.edges.sparkSession
            parent = F.broadcast(
                spark.createDataFrame(mapping, "comp long, p long")
            )
        else:
            # distributed pointer jumping: chosen edges form pseudo-trees
            # with one 2-cycle each; root at the smaller id, square the
            # parent pointer until fixpoint (O(log depth) rounds).
            o2 = per_comp.select(
                F.col("comp").alias("other"), F.col("other").alias("other2")
            )
            parent = (
                per_comp.select("comp", "other")
                .join(o2, "other", "left")
                .select(
                    "comp",
                    F.when(
                        (F.col("other2") == F.col("comp"))
                        & (F.col("comp") < F.col("other")),
                        F.col("comp"),
                    )
                    .otherwise(F.col("other"))
                    .alias("p"),
                )
                .localCheckpoint(eager=True)
            )
            while True:
                pp = parent.select(F.col("comp").alias("p"), F.col("p").alias("gp"))
                np_ = (
                    parent.join(pp, "p", "left")
                    .select(
                        "comp",
                        F.coalesce("gp", F.col("p")).alias("p"),
                        (F.coalesce("gp", F.col("p")) != F.col("p")).alias("chg"),
                    )
                    .localCheckpoint(eager=True)
                )
                changed = np_.filter("chg").limit(1).count() > 0
                parent = np_.drop("chg")
                if not changed:
                    break
        # apply relabeling to the vertex→component map
        comp = (
            comp.join(parent, "comp", "left")
            .select("id", F.coalesce("p", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        # contracted edge table for the next round (reference: per-round
        # sharded sink — callers can persist this snapshot)
        und = (
            und.join(comp.withColumnRenamed("id", "src").withColumnRenamed("comp", "ca"), "src")
            .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("comp", "cb"), "dst")
            .filter(F.col("ca") != F.col("cb"))
            .select("src", "dst", "w")
            .localCheckpoint(eager=True)
        )

    if not forest_parts:
        return graph.edges.sparkSession.createDataFrame(
            [], "src long, dst long, weight double"
        )
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["src", "dst"])


# MSF has no single-SQL oracle (iterative contraction); tests verify the
# forest against a driver-side Kruskal reference on collected edges, and
# the driver records a rows-only check for the msf query.
