import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from graphchi_cpp_spark.session import get_spark

    s = get_spark("graphchi-tests", cpus="8", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con


def assert_df_matches_oracle(spark_df, duck_con, sql, float_ndigits=None):
    """Order-insensitive comparison mirroring the driver's check:
    row count + column names + per-row values."""
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)
    sdf, ddf = sdf[cols], ddf[cols]

    def canon(df):
        rows = []
        for tup in df.itertuples(index=False):
            row = []
            for v in tup:
                if isinstance(v, float) and float_ndigits is not None:
                    v = round(v, float_ndigits)
                row.append(str(v))
            rows.append("|".join(row))
        return sorted(rows)

    srows, drows = canon(sdf), canon(ddf)
    assert len(srows) == len(drows), f"row count {len(srows)} != {len(drows)}"
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"first mismatches: {mismatches[:5]}"
