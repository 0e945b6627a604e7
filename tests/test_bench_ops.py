"""No-Spark tests for tools/bench_ops.py (the folded bench-chore CLI)
and the bench.py flagship host sampler (VERDICT r14 items 1 + 10)."""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import bench_ops  # noqa: E402


def test_comparable28_is_the_frozen_r1_set():
    """The anchor set must stay bit-identical to BENCH_r01.json's query
    list — that identity is what makes the subtotal comparable to the
    65.1 s round-1 anchor."""
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_r01.json")
    d = json.load(open(path))
    m = re.search(r'\{"metric": "total_wall.*\}', d["tail"])
    r1 = json.loads(m.group(0))
    assert list(r1["queries"]) == bench_ops.COMPARABLE28
    assert len(bench_ops.COMPARABLE28) == 28
    assert abs(r1["value"] - bench_ops.R1_ANCHOR_SEC) < 1e-9


def test_comparable28_queries_registered():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    missing = set(bench_ops.COMPARABLE28) - set(qs)
    assert not missing, f"anchor queries missing from registry: {missing}"
    missing_dup = set(bench_ops.DUP_FAMILY) - set(qs)
    assert not missing_dup, f"dup-family queries missing: {missing_dup}"


def test_tail_record_decode_survives_truncation():
    """The calib reader must skip the head-truncated first record the
    2,000-byte tail capture can produce and still find the summary."""
    good = json.dumps({"metric": "total_wall_sec_headline_queries", "value": 1.0})
    truncated = 'ry_wall_sec_values","values":[1,2,3]}'
    recs = bench_ops._tail_records(f"{truncated}\n{good}\n")
    assert len(recs) == 1
    assert recs[0]["metric"] == "total_wall_sec_headline_queries"


def test_median_helper():
    assert bench_ops._median([3.0, 1.0, 2.0]) == 2.0
    assert bench_ops._median([1.0, 2.0]) == 2.0


def test_flagship_host_sampler_collects_and_stops():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    s = bench.FlagshipHostSampler(interval=0.01)
    s.start()
    deadline = time.time() + 10
    while len(s.samples) < 2 and time.time() < deadline:
        time.sleep(0.05)
    stats = s.stop()
    assert stats["n"] >= 2
    assert 0 < stats["med"] <= stats["max"]
    assert not s.is_alive()
