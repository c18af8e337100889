"""Aggregation operators (A1, A4-A8, C10, C12).

Reference:
- per-key aggregate:   ``toolkits/parsers/aggregator.cpp:29-43,110``
- value-occurrence:    ``toolkits/parsers/count.cpp:20-28``
- label histogram:     ``src/util/labelanalysis.hpp:67-189``
- vertex sum/foreach:  ``src/api/vertex_aggregator.hpp:68-129``
- degree distribution: ``toolkits/graph_analytics/subgraph.cpp:24,112``
- GAS edge aggregator: ``src/api/graphlab2_1_GAS_api/graphchi_graphlabv2_1.hpp:781``

All are single groupBy().agg() shapes — Catalyst gives map-side partial
aggregation, so the shuffle carries one row per distinct key per task;
these scale linearly to arbitrary table sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def aggregate_per_key(
    df: DataFrame, key_cols: list[str], agg_col: str, how: str = "sum"
) -> DataFrame:
    """A1: sum/avg/min/max/count of a column per key, sorted by key."""
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}[how]
    return (
        df.groupBy(*key_cols)
        .agg(fn(agg_col).alias(f"{how}_{agg_col}"))
        .orderBy(*key_cols)
    )


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A4: occurrences of each value, desc."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
    )


def label_histogram(df: DataFrame, label_col: str = "label") -> DataFrame:
    """C12/A5 components analysis: label → size, descending (top-20 print
    in the reference; here the full distribution, limit at the call site)."""
    return (
        df.groupBy(label_col)
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc(label_col))
    )


def sum_vertices(vertices: DataFrame, value_col: str) -> float:
    """C10/A6 scalar fold over the vertex table."""
    row = vertices.agg(F.sum(value_col).alias("s")).collect()[0]
    return row["s"]


def degree_distribution(degrees: DataFrame, degree_col: str = "degree") -> DataFrame:
    """A7: #vertices per degree value."""
    return (
        degrees.groupBy(degree_col)
        .agg(F.count("*").alias("n_vertices"))
        .orderBy(degree_col)
    )


def map_reduce_edges(edges: DataFrame, map_expr: Column, reduce_fn=F.sum) -> DataFrame:
    """A8 GAS-style edge fold: edges.select(map).agg(reduce)."""
    return edges.select(map_expr.alias("_m")).agg(reduce_fn("_m").alias("value"))
