"""Data-skipping probe for Z-/Hilbert-ordered parquet layout (BASELINE B28).

Writes sf0.1 lineitem three ways — natural order, sorted on l_partkey
only, Hilbert-ordered on (l_partkey, l_suppkey) — then, from the actual
parquet row-group MIN/MAX statistics (pyarrow), computes how many row
groups a box predicate on BOTH columns could skip in each layout, and
times the corresponding Spark filtered scans (PushedFilters active).

Usage: python tools/probe_zorder.py [sf_dir]
"""

import glob
import sys
import time

sys.path.insert(0, ".")

import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def rowgroup_overlap(path_glob: str, preds: dict[str, tuple[float, float]]):
    total = kept = rows_total = rows_kept = 0
    for f in sorted(glob.glob(path_glob)):
        pf = pq.ParquetFile(f)
        schema_idx = {
            pf.schema_arrow.names[i]: i
            for i in range(len(pf.schema_arrow.names))
        }
        for rg in range(pf.num_row_groups):
            meta = pf.metadata.row_group(rg)
            total += 1
            rows_total += meta.num_rows
            overlap = True
            for col, (lo, hi) in preds.items():
                st = meta.column(schema_idx[col]).statistics
                if st is None:
                    continue
                if st.max < lo or st.min > hi:
                    overlap = False
                    break
            if overlap:
                kept += 1
                rows_kept += meta.num_rows
    return total, kept, rows_total, rows_kept


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tsne_flink_spark.sources.layout import write_zordered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # small row groups so skipping granularity is visible at sf0.1
    spark.conf.set("spark.hadoop.parquet.block.size", str(256 * 1024))

    li.repartition(64).write.mode("overwrite").parquet("/tmp/li_natural")
    (
        li.repartitionByRange(64, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet("/tmp/li_single")
    )
    write_zordered(li, "/tmp/li_zorder", ["l_partkey", "l_suppkey"],
                   n_files=64)

    pk = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    pk_hi, sk_hi = pk[0], pk[1]
    pk_box = (0.45 * pk_hi, 0.55 * pk_hi)
    sk_box = (0.45 * sk_hi, 0.55 * sk_hi)
    scenarios = {
        "partkey only": {"l_partkey": pk_box},
        "suppkey only": {"l_suppkey": sk_box},
        "both (box)": {"l_partkey": pk_box, "l_suppkey": sk_box},
    }
    for sname, preds in scenarios.items():
        print(f"\npredicate: {sname}")
        for name, pat in (
            ("natural", "/tmp/li_natural/*.parquet"),
            ("single-col sort", "/tmp/li_single/*.parquet"),
            ("hilbert zorder", "/tmp/li_zorder/*.parquet"),
        ):
            t, k, rt, rk = rowgroup_overlap(pat, preds)
            print(
                f"  {name:16s} row groups kept {k}/{t} "
                f"({100*k/max(t,1):.0f}%), rows scanned {rk}/{rt} "
                f"({100*rk/max(rt,1):.0f}%)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
