"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_duckdb_oracle(spark, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    assert _rows(scols, srows) == _rows(dcols, drows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subj", "pred", "obj", "edge_id"]


def test_rows_only_queries_run(spark):
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            assert fn(spark, SF_DIR).count() >= 0, name
