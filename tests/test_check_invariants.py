"""Second-scale invariant gates for the approximate dedup/ANN operators.

The driver's correctness gate runs the `_check` queries only at sf0.01;
band mistuning or candidate-loss regressions that only manifest at larger
corpora would previously be caught by the driver, not CI.  Here each
invariant query (a 1-row DataFrame whose every value is 0 when the
operator is sound AND complete) runs at BOTH sf0.01 and sf0.1.
"""

import os

import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

CHECKS = [
    "minhash_dedup_check",
    "simhash_dedup_check",
    "embedding_dedup_check",
    "ann_lsh_check",
    "ann_ivf_check",
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", CHECKS)
def test_check_invariant_zero_at_scale(spark, name, sf_dir):
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    row = entry.queries()[name](spark, sf_dir).collect()
    assert len(row) == 1, (name, sf_dir, row)
    bad = {c: v for c, v in row[0].asDict().items() if v != 0}
    assert not bad, f"{name} @ {sf_dir}: nonzero invariant fields {bad}"
