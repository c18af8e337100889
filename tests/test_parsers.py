

def test_consecutive_matrix_market_roundtrip(spark, tmp_path):
    """Write a sparse-id MM file, read it back through the one-call
    compose: ids densify to consecutive 0-based per-domain spaces and
    the (relabeled) entries survive the round trip."""
    from graphchi_cpp_spark.sources.matrix_market import write_matrix_market
    from graphchi_cpp_spark.sources.parsers import consecutive_matrix_market

    # sparse user/item ids (0-based: 0, 7, 41 / 2, 99)
    ratings = spark.createDataFrame(
        [(0, 2, 5.0), (7, 99, 3.0), (41, 2, 1.0), (7, 2, 2.0)],
        ["user", "item", "rating"],
    )
    path = str(tmp_path / "sparse.mm")
    write_matrix_market(ratings, path)
    edges, src_map, dst_map = consecutive_matrix_market(spark, path)
    got = {(r["src"], r["dst"]): r["rating"] for r in edges.collect()}
    # per-domain consecutive: users {0,7,41}->{0,1,2}, items {2,99}->{0,1}
    assert got == {(0, 0): 5.0, (1, 1): 3.0, (2, 0): 1.0, (1, 0): 2.0}
    assert {r["orig"]: r["dense_id"] for r in src_map.collect()} == {
        0: 0, 7: 1, 41: 2,
    }
    assert {r["orig"]: r["dense_id"] for r in dst_map.collect()} == {2: 0, 99: 1}
    # single shared space: ids 0,2,7,41,99 -> 0..4
    edges1, m1, m2 = consecutive_matrix_market(spark, path, single_domain=True)
    assert {r["orig"]: r["dense_id"] for r in m1.collect()} == {
        0: 0, 2: 1, 7: 2, 41: 3, 99: 4,
    }
    got1 = {(r["src"], r["dst"]): r["rating"] for r in edges1.collect()}
    assert got1 == {(0, 1): 5.0, (2, 4): 3.0, (3, 1): 1.0, (2, 1): 2.0}
