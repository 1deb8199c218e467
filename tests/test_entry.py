"""Local mirror of the driver's correctness gate: every queries() entry runs
at sf0.001 and, when an oracle exists, must match DuckDB row-for-row
(columns sorted by name, rows sorted — the driver's order-insensitive
value-hash comparison)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("RIFY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) if not math.isnan(v) else "nan"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in order], out


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    import pyarrow as pa

    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    # the driver's value hash is DTYPE-sensitive (a DuckDB HUGEINT sum vs a
    # Spark BIGINT hashes differently even when values are equal), so the
    # local mirror must compare arrow dtypes too, not just Python values
    spd = QUERIES[name](spark, SF_DIR).toPandas()[sorted(scols)]
    dpd = duck.execute(ORACLES[name]).df()[sorted(dcols)]
    sschema = pa.Table.from_pandas(spd, preserve_index=False).schema
    dschema = pa.Table.from_pandas(dpd, preserve_index=False).schema
    mism = [
        (f.name, str(f.type), str(dschema.field(f.name).type))
        for f in sschema
        if f.type != dschema.field(f.name).type
    ]
    assert not mism, f"{name}: arrow dtype mismatch (spark vs oracle): {mism}"
    sc, sr = _normalize(scols, srows)
    dc, dr = _normalize(dcols, drows)
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    if sr != dr:
        diff = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, e.g. {diff}")


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
