"""Table profiling: per-column null/distinct/min/max/mean statistics —
the data-quality snapshot every ingestion pipeline runs before training.

The table is melted in one scan — each row explodes into one
``(column, value)`` struct per profiled column — and a single
``groupBy("column")`` computes every statistic.  With exactly ONE
distinct aggregate, Catalyst plans the standard two-stage rewrite:
map-side partial dedup on (column, value), one shuffle bounded by the
number of DISTINCT (column, value) pairs (not rows), final merge per
column.  The first cut instead asked for eleven ``count(distinct)``s in
one wide aggregate; the EXPAND plan that produces multiplies every row
eleven-fold and shuffles all of it — measured 24 s vs 1 s for this melt
formulation on sf0.1 lineitem.  No Python UDFs.

Numeric min/max/mean are emitted as DOUBLE and string min/max as separate
VARCHAR fields — casting doubles to display strings is engine-specific
(shortest-round-trip vs %g formats) and would break exact oracle parity.
Timestamps and dates profile as wall-clock strings (timezone-independent
in both engines, unlike epoch arithmetic on NTZ columns).

Scale note: exact ``count(distinct)`` is the right default at TPC-H-ish
cardinalities; at 100 TB swap in the HLL sketch path
(``__spark_entry__.q_sketch_distinct_check`` shows the verified-invariant
pattern for approximate distinct counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num, mean_num,
    min_str, max_str) for every requested column.

    Numeric (and timestamp, as epoch seconds) columns fill the ``_num``
    fields; string columns fill the ``_str`` fields; the inapplicable
    family is NULL.  ``n_distinct`` is exact and excludes NULLs (the
    ANSI ``count(distinct)`` convention in both Spark and DuckDB).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    cells = []
    for c in cols:
        dt = fields[c]
        col = F.col(c)
        if isinstance(dt, _NUMERIC):
            vnum, vstr = col.cast("double"), F.lit(None).cast("string")
        else:
            # timestamps/dates (and everything else) profile as wall-clock
            # STRINGS: an epoch-seconds representation goes through the
            # session timezone for NTZ columns (see sources/readers.
            # load_events) and would break oracle parity in non-UTC
            # sessions; the string cast is timezone-independent and
            # formats identically in Spark and DuckDB
            vnum, vstr = F.lit(None).cast("double"), col.cast("string")
        cells.append(
            F.struct(
                F.lit(c).alias("column"),
                vnum.alias("vnum"),
                vstr.alias("vstr"),
            )
        )
    melted = df.select(F.explode(F.array(*cells)).alias("cell")).select(
        F.col("cell.column").alias("column"),
        F.col("cell.vnum").alias("vnum"),
        F.col("cell.vstr").alias("vstr"),
    )
    # one string key carries distinctness for both families: Spark's
    # double->string cast is shortest-round-trip (injective), so distinct
    # keys == distinct doubles; count_distinct skips NULLs, matching the
    # ANSI convention the oracle uses
    vkey = F.coalesce(F.col("vnum").cast("string"), F.col("vstr"))
    agg = melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(vkey.isNull(), 1).otherwise(0))
        .cast("long").alias("n_nulls"),
        F.count_distinct(vkey).cast("long").alias("n_distinct"),
        F.min("vnum").alias("min_num"),
        F.max("vnum").alias("max_num"),
        # the mean sums via DECIMAL, not double: double partial sums are
        # summation-order-dependent (distributed tree vs the oracle's
        # sequential scan) and the 6th rounded decimal flips on boundary
        # values (seen on sf0.01 l_discount).  Decimal addition is exact
        # and associative, so both engines produce the identical sum; one
        # final double division and round are then bit-deterministic.
        F.round(
            F.sum(F.col("vnum").cast("decimal(30,10)")).cast("double")
            / F.count("vnum"),
            6,
        ).alias("mean_num"),
        F.min("vstr").alias("min_str"),
        F.max("vstr").alias("max_str"),
    )
    # an EMPTY table still profiles as one row per column (counts 0,
    # extrema NULL) — the groupBy alone would emit nothing.  Deliberate
    # divergence from a bare SQL aggregate, whose sum() over zero rows is
    # NULL: a profiler reporting "0 nulls in 0 rows" is the useful answer.
    base = df.sparkSession.createDataFrame(
        [(c,) for c in cols], "column string"
    )
    return base.join(agg, "column", "left").select(
        "column",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_num", "max_num", "mean_num", "min_str", "max_str",
    )


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    relation: str,
) -> DataFrame:
    """One audit row (relation, n_child, n_orphans, n_null_fk) for a
    foreign-key relationship: child rows whose non-null FK matches no
    parent key (a LEFT ANTI join — at scale the parent key column is
    the only thing shuffled from the parent side thanks to column
    pruning), plus the null-FK count separated out (a null FK is a
    modeling question, not a broken reference).  Chain several with
    unionByName for a whole-schema integrity report — the data-quality
    gate every ingestion pipeline runs before publishing a snapshot."""
    nn = child.where(F.col(fk_col).isNotNull())
    orphans = nn.join(
        parent.select(F.col(pk_col).alias(fk_col)).distinct(),
        fk_col,
        "left_anti",
    )
    return (
        orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        .crossJoin(
            F.broadcast(
                child.agg(
                    F.count(F.lit(1)).cast("long").alias("n_child"),
                    # coalesce: sum() over an EMPTY child is NULL, but an
                    # audit row should read (0, 0, 0), not (0, 0, NULL)
                    F.coalesce(
                        F.sum(F.col(fk_col).isNull().cast("int")), F.lit(0)
                    )
                    .cast("long")
                    .alias("n_null_fk"),
                )
            )
        )
        .select(
            F.lit(relation).alias("relation"),
            "n_child",
            "n_orphans",
            "n_null_fk",
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., status) for every row whose presence or content differs
    between two table snapshots: ``added`` (key only in ``new``),
    ``removed`` (only in ``old``), ``changed`` (present in both, some
    ``compare_cols`` value differs — NULL-safe comparison, so NULL ->
    value and value -> NULL both count as changes).  Unchanged rows are
    dropped: the output is the CDC delta an ingestion pipeline audits
    before publishing a snapshot ("this refresh deleted 3% of the
    corpus — expected?"), or feeds an incremental downstream merge.

    ``compare_cols`` defaults to every shared non-key column.  Scale:
    ONE co-partitioned full-outer shuffle join on the keys — the
    canonical snapshot-diff shape; on bucketed/pre-partitioned tables
    the exchange disappears, and at any scale the shuffle carries only
    the key + compared columns (column pruning).  Deterministic column
    comparisons (no hashing), so a DuckDB oracle replays the diff
    exactly."""
    if not key_cols:
        raise ValueError("table_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c
            for c in new.columns
            if c not in key_cols and c in set(old.columns)
        ]
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_o"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_n"),
    )
    j = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return j.select(*key_cols, status.alias("status")).where(
        F.col("status").isNotNull()
    )


def key_skew(df: DataFrame, key_col: str, top: int = 5) -> DataFrame:
    """One row of partition-skew diagnostics for a prospective
    shuffle/join key: distinct key count, max and mean rows per key,
    the skew ratio max/mean (the number AQE's skew-join mitigation
    cares about), and the share of all rows held by the ``top`` hottest
    keys — the pre-flight check before choosing a join/bucketing key at
    100 TB.  One groupBy(key) count plus a constant-size aggregate;
    the top-share rides a TakeOrderedAndProject, never a global sort."""
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    # empty-input guards: sum()/max() over zero keys are NULL and the
    # ratio divisors hit 0/0 — an audit row should read all-zeros instead
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.max("__c"), F.lit(0)).cast("long").alias("max_per_key"),
    )
    topk = (
        counts.orderBy(F.col("__c").desc(), F.col(key_col))
        .limit(top)
        .agg(
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("__topc")
        )
    )
    nonzero = F.col("n_rows") > 0
    return (
        stats.crossJoin(F.broadcast(topk))
        .select(
            "n_keys",
            "n_rows",
            "max_per_key",
            F.round(
                F.when(
                    nonzero,
                    F.col("n_rows").cast("double")
                    / F.col("n_keys").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mean_per_key"),
            F.round(
                F.when(
                    nonzero,
                    F.col("max_per_key").cast("double")
                    * F.col("n_keys").cast("double")
                    / F.col("n_rows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("skew_ratio"),
            F.round(
                F.when(
                    nonzero,
                    F.col("__topc").cast("double")
                    / F.col("n_rows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_share"),
        )
    )


def categorical_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One audit row (n, k_a, k_b, mi, nmi, cramers_v) quantifying the
    association between two categorical columns — the LEAKAGE /
    confound detector a training-data pipeline runs before stratifying
    or splitting on a column ("is `source` secretly determined by
    `lang`?  then a per-source split leaks language identity").

    - ``mi``: mutual information (nats) of the empirical joint;
    - ``nmi``: MI / min(H(a), H(b)) in [0, 1] (0 = independent,
      1 = one column determines the other);
    - ``cramers_v``: sqrt(chi2 / (n * (min(k_a, k_b) - 1))), the
      chi-squared effect size in [0, 1].

    Dataflow: one groupBy(a, b) count (map-side-combinable; shuffle
    <= k_a * k_b rows regardless of input size) and two bounded
    marginal rollups of it — no second scan of the fact table.  Pure
    deterministic arithmetic over exact counts: a DuckDB oracle
    replays it to the last rounded digit.

    NULL policy: rows where either column is NULL are EXCLUDED up
    front (complete-case analysis, the standard contingency-table
    convention).  Keeping them half-way — NULL groups in the marginals
    but dropped by the equi-joins — would make the joint sum to < 1
    and let mi go negative; callers who want NULL as a real category
    should fillna a sentinel first."""
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    joint = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("double").alias("__c"))
    from tsne_flink_spark.operators.optimize import materialize

    joint = materialize(joint)  # referenced by joint/marginal/total aggs
    ma = joint.groupBy("__a").agg(F.sum("__c").alias("__ca"))
    mb = joint.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    n = joint.agg(F.sum("__c").alias("__n"))
    j = (
        joint.join(F.broadcast(ma), "__a")
        .join(F.broadcast(mb), "__b")
        .crossJoin(F.broadcast(n))
    )
    p = F.col("__c") / F.col("__n")
    mi_term = p * F.log(
        (F.col("__c") * F.col("__n")) / (F.col("__ca") * F.col("__cb"))
    )
    # chi2 over ALL cells (incl. empty ones, whose (0-E)^2/E = E) via the
    # exact identity sum (O-E)^2/E = n * sum_observed O^2/(ca*cb) - n —
    # summing (O-E)^2/E over observed cells only would drop the empty
    # cells' expected mass
    chi_term = F.pow(F.col("__c"), 2) / (F.col("__ca") * F.col("__cb"))
    ha_term = -(F.col("__ca") / F.col("__n")) * F.log(
        F.col("__ca") / F.col("__n")
    )
    hb_term = -(F.col("__cb") / F.col("__n")) * F.log(
        F.col("__cb") / F.col("__n")
    )
    agg = j.agg(
        F.max("__n").alias("n"),
        F.count_distinct("__a").cast("long").alias("k_a"),
        F.count_distinct("__b").cast("long").alias("k_b"),
        F.sum(mi_term).alias("mi"),
        (F.max("__n") * F.sum(chi_term) - F.max("__n")).alias("chi2"),
    )
    hs = (
        ma.crossJoin(F.broadcast(n))
        .agg(F.sum(ha_term).alias("h_a"))
        .crossJoin(
            F.broadcast(
                mb.crossJoin(F.broadcast(n)).agg(F.sum(hb_term).alias("h_b"))
            )
        )
    )
    denom = F.col("n") * (
        F.least(F.col("k_a"), F.col("k_b")) - F.lit(1)
    ).cast("double")
    return agg.crossJoin(F.broadcast(hs)).select(
        F.col("n").cast("long").alias("n"),
        "k_a",
        "k_b",
        F.round("mi", 6).alias("mi"),
        F.round(
            F.when(
                F.least("h_a", "h_b") > 0,
                F.col("mi") / F.least("h_a", "h_b"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("nmi"),
        F.round(
            F.when(denom > 0, F.sqrt(F.col("chi2") / denom)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("cramers_v"),
    )
