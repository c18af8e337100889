"""Top-K operators (C11/A2/A3).

Reference:
- global top-K vertices: ``src/util/toplist.hpp:72-153`` (windowed scan +
  K-merge over the vertex value file).
- per-key top-K: ``toolkits/parsers/topk.cpp:29-33`` (K largest (to,val)
  per from-key).

Spark-first: global top-K = orderBy().limit(k) — Spark runs this as a
distributed TakeOrdered (per-partition top-k then merge on the driver),
exactly the reference's windowed merge but parallel. Per-key top-K =
window ranking, which Catalyst executes as one shuffle on the key with
in-partition sort — no driver involvement.

Determinism: ties broken by ascending id (the reference relies on scan
order; we make the tiebreak explicit so double-runs diff-equal,
``unittest.sh:25-28`` determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_k_vertices(
    vertices: DataFrame, value_col: str, k: int, id_col: str = "id"
) -> DataFrame:
    """Global K best vertices by value, desc, deterministic tiebreak on id."""
    return vertices.orderBy(F.desc(value_col), F.asc(id_col)).limit(k)


def top_k_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """K best rows per key (A2). Adds a ``rank`` column (1-based).

    Scale note: single hash-shuffle on key_col; skewed keys are bounded
    because the sort is per-partition and rank<=k prunes early under
    whole-stage codegen (rank stops consuming after k rows per key when
    the optimizer applies the window-group-limit rewrite in Spark 3.5+).
    """
    order = [
        F.asc(order_col) if ascending else F.desc(order_col),
    ]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
