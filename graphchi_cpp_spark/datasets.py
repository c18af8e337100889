"""Canonical graph / ratings views over the driver's testdata tables.

GraphChi consumes edge-list files; the driver provides TPC-H-ish parquet
(region nation customer supplier part orders lineitem events documents
embeddings). These helpers derive deterministic graph-shaped views that
both the Spark queries and the DuckDB oracle SQL share, so correctness
can be hash-compared:

- ``bipartite``: customer → supplier edges (who bought from whom), the
  primary directed graph (customers are sources, suppliers sinks —
  exercises dangling-vertex handling like the reference's web graphs).
- ``cosupply``: supplier — supplier undirected edges (two suppliers that
  supply the same part) — unipartite, triangle-rich, for triangle
  counting / k-cores / community detection.
- ``ratings``: (user, item, rating) bipartite ratings derived from
  lineitem quantities — the smallnetflix analog for the CF toolkit
  (reference input: ``toolkits/collaborative_filtering/io.hpp:252``).

Supplier vertex ids are offset by SUPPLIER_OFFSET into the customer id
space, mirroring the reference's bipartite M+N id packing
(``toolkits/collaborative_filtering/common.hpp:56``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SUPPLIER_OFFSET = 1_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS); Spark 4 rejects it unless
    # nanos are read as long — set defensively (the driver's session may
    # not have it), runtime-settable, no-op otherwise
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- #
# customer→supplier bipartite digraph
# --------------------------------------------------------------------- #
def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=custkey, dst=suppkey+OFFSET, weight=#lineitems) distinct edges.

    Scale note: one shuffle join orders⋈lineitem on orderkey (both sides
    co-partitioned by the join key at write time in a real deployment →
    bucketed, shuffle-free) followed by a partial-aggregated groupBy.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(SUPPLIER_OFFSET)).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )


BIPARTITE_EDGES_SQL = f"""
    SELECT o_custkey AS src,
           l_suppkey + {SUPPLIER_OFFSET} AS dst,
           CAST(count(*) AS DOUBLE) AS weight
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
"""


# --------------------------------------------------------------------- #
# supplier—supplier co-supply graph (undirected, oriented src<dst)
# --------------------------------------------------------------------- #
def cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier pairs sharing a part, oriented src < dst.

    Scale note: the self-join on partkey explodes quadratically per part
    (hub parts ~ skew) — project to distinct (partkey, suppkey) FIRST to
    shrink the join input, then let AQE skew-split the join.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, F.col("a.l_partkey") == F.col("b.l_partkey"))
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )


COSUPPLY_EDGES_SQL = """
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
"""


# --------------------------------------------------------------------- #
# CF ratings (smallnetflix analog)
# --------------------------------------------------------------------- #
def ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, rating∈[1,5]) from lineitem quantity, duplicates averaged."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(
            (1.0 + (F.avg("l_quantity") % 4.0)).alias("rating")
        )
    )


RATINGS_SQL = """
    SELECT o_custkey AS user,
           l_partkey AS item,
           1.0 + fmod(avg(l_quantity), 4.0) AS rating
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
"""


# --------------------------------------------------------------------- #
# order-flow digraph (cyclic — for SCC / random walks)
# --------------------------------------------------------------------- #
def orderflow_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer→customer graph with cycles: each order sends an
    edge from its customer to a price-derived pseudo-target customer.
    Deterministic double arithmetic — identical in Spark and DuckDB."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    n = customer.count()  # driver-side scalar, deterministic
    return (
        orders.select(
            F.col("o_custkey").alias("src"),
            F.pmod(F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(n)).alias(
                "dst"
            ),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


ORDERFLOW_EDGES_SQL = """
    SELECT DISTINCT o_custkey AS src,
           CAST(round(o_totalprice * 100) AS BIGINT)
               % (SELECT count(*) FROM customer) AS dst
    FROM orders
    WHERE o_custkey != CAST(round(o_totalprice * 100) AS BIGINT)
                       % (SELECT count(*) FROM customer)
"""
