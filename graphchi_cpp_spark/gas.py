"""GAS (gather-apply-scatter) public API — the reference's program shape.

Reference: ``src/api/graphlab2_1_GAS_api/graphchi_graphlabv2_1.hpp``
(ivertex_program ``:326-393``: gather_edges/gather/apply/scatter;
``signal`` messaging ``:239-256``) and the functional kernel
(``src/api/functional/functional_api.hpp:55-75``:
initial_value/op_neighborval/plus/compute_vertexvalue/value_to_neighbor).
Both reference sync modes (semi-sync / bulk-sync) collapse to one BSP
mode here (SURVEY §3.2).

This is a thin veneer over ``pregel.Pregel`` keeping the GraphChi
vocabulary: gather direction = which join side emits messages, the
gather/sum pair = message expression + aggregate, apply = vertex update,
scatter+signal = the frontier condition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from graphchi_cpp_spark.graph import PropertyGraph
from graphchi_cpp_spark.pregel import Pregel


def run_gas(
    graph: PropertyGraph,
    vertex_col: str,
    initial: Column,
    gather: Column,
    sum_agg: Column,
    apply: Column,
    gather_direction: str = "in",
    signal_condition: Column | None = None,
    num_iterations: int = 10,
    tol: float | None = None,
) -> DataFrame:
    """Run a GAS program; returns the final vertex DataFrame.

    - ``gather``: expression over src()/dst()/edge() — the per-edge
      gather value (reference ``gather()``).
    - ``sum_agg``: commutative aggregate over msg() (reference ``+=``).
    - ``apply``: vertex update over msg() and vertex columns.
    - ``gather_direction``: 'in' gathers over in-edges (messages flow
      src→dst), 'out' over out-edges (dst→src), mirroring
      ``gather_edges`` (IN_EDGES/OUT_EDGES).
    - ``signal_condition``: when set, only signaled (active) vertices'
      edges participate next superstep and the program halts when no
      vertex is signaled — the scheduler bitset (C4).
    """
    vertices = graph.vertices
    if "id" not in vertices.columns:
        raise ValueError("graph.vertices must carry an 'id' column")
    p = Pregel(graph.edges, vertices).with_vertex_column(
        vertex_col, initial, apply
    ).agg_msgs(sum_agg)
    if gather_direction == "in":
        p = p.send_msg_to_dst(gather)
    elif gather_direction == "out":
        p = p.send_msg_to_src(gather)
    else:
        raise ValueError("gather_direction must be 'in' or 'out'")
    if signal_condition is not None:
        p = p.with_frontier(active_after_update=signal_condition)
    return p.run(
        max_iter=num_iterations,
        tol=tol,
        tol_col=vertex_col if tol is not None else None,
    )
