"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(columns)), key=lambda k: columns[k])
    out = []
    for row in rows:
        vals = []
        for k in order:
            v = row[k]
            if isinstance(v, float):
                # normalize -0.0 and represent consistently
                if v == 0:
                    v = 0.0
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    import os

    # SPARK_GRAFT_MASTER=spark://host:port replays the gate on a real
    # cluster (multi-executor correctness validation, BASELINE.md B22)
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    builder = (
        SparkSession.builder.master(master)
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("spark://"):
        builder = (
            builder.config(
                "spark.executorEnv.PYTHONPATH", os.path.abspath(".")
            )
            .config("spark.executorEnv.PYSPARK_PYTHON", sys.executable)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {t_spark:.1f}s)")
            continue
        try:
            cur = con.sql(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rows {len(srows)} != {len(drows)}")
            failures.append(name)
            continue
        sn = normalize([list(r) for r in srows], scols)
        dn = normalize([list(r) for r in drows], dcols)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures.append(name)
            continue
        print(f"OK    {name}: {len(srows)} rows match ({t_spark:.1f}s)")

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
