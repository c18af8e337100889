"""graphchi_cpp_spark — a PySpark-native graph analytics engine.

Re-expresses the full capability surface of GraphChi (graphchi-cpp, OSDI'12
Parallel Sliding Windows engine) on top of Spark DataFrames:

- Property graph = vertex/edge DataFrames (``graph.PropertyGraph``).
- The single computation primitive (reference
  ``src/api/graphchi_program.hpp:87`` update(v, ctx)) becomes a BSP
  aggregate-messages / Pregel loop (``pregel.Pregel``) built from
  join + groupBy().agg(), with Catalyst optimizing every superstep.
- Algorithms (PageRank, WCC, SCC, LPA, triangles, k-cores, MSF, random
  walks, ...) are thin recipes over that substrate (``algos/``).
- The collaborative-filtering toolkit (ALS, item-CF, baselines,
  recommendations, eval) lives in ``cf/``.
- Sources/sinks for the reference's text formats in ``sources/``.
- Streaming graph ingestion (dynamic engine equivalent) in ``streaming/``.
- Large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) in ``operators/``.

Design rules (enforced throughout):
- DataFrame/SQL first; no RDDs; Python UDFs only where expression DSL
  genuinely cannot express the semantics (then Arrow-batched pandas UDFs).
- Iterative loops are driver-side with localCheckpoint() lineage cuts.
- Frontier (selective-scheduling, reference ``src/engine/bitset_scheduler.hpp``)
  filtering so convergent algorithms do not do full passes.
"""

from graphchi_cpp_spark.graph import PropertyGraph
from graphchi_cpp_spark.pregel import Pregel, aggregate_messages

__all__ = ["PropertyGraph", "Pregel", "aggregate_messages"]
__version__ = "0.1.0"
