"""Round-8 probe (VERDICT r7 #6): ExactSubstr fidelity — gram-cover vs
Lee et al.'s "maximal duplicated substrings >= l" removal set.

Claim (the documented equivalence): for remove-all-occurrences semantics
at threshold c, the two token sets are IDENTICAL.

  - every duplicated substring of length >= l (occurring >= c times)
    is a union of its l-grams, each of which occurs >= c times, so the
    gram cover contains the maximal-match cover;
  - every l-gram occurring >= c times IS a duplicated substring of
    length exactly l, contained in some maximal duplicated substring
    >= l, so the maximal-match cover contains the gram cover.

This probe checks the claim empirically on the sf0.1 corpus with an
INDEPENDENT reference: a suffix array + Kasai LCP over the tokenized
corpus (per-doc unique sentinels prevent cross-document windows).  A
token position p is in the maximal-match removal set iff some l-window
containing it starts a suffix whose LCP with an adjacent suffix in SA
order is >= l (i.e. that l-gram occurs at least twice).  The engine's
number comes from exact_substring_dedup's tokens_removed.  Any md5 gram
collision in the engine would surface here as engine > reference.

Usage: python tools/probe_substr_fidelity.py [l]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def suffix_array(a: np.ndarray) -> np.ndarray:
    """Doubling suffix array over an int array (O(n log^2 n) via argsort)."""
    n = len(a)
    rank = np.argsort(a, kind="stable")
    key = np.empty(n, dtype=np.int64)
    key[rank] = np.cumsum(np.r_[0, np.diff(a[rank]) != 0])
    k = 1
    while key.max() < n - 1:
        nxt = np.full(n, -1, dtype=np.int64)
        nxt[: n - k] = key[k:]
        order = np.lexsort((nxt, key))
        pair = np.stack([key[order], nxt[order]])
        new = np.empty(n, dtype=np.int64)
        new[order] = np.cumsum(
            np.r_[0, (np.diff(pair[0]) != 0) | (np.diff(pair[1]) != 0)]
        )
        key = new
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[key] = np.arange(n)
    return sa


def kasai_lcp(a: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP[i] = lcp(suffix sa[i-1], suffix sa[i]); LCP[0] = 0."""
    n = len(a)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and a[i + h] == a[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    )
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()

    # ---- independent reference: suffix array over the token stream ----
    t0 = time.time()
    vocab: dict[str, int] = {}
    stream: list[int] = []
    doc_of: list[int] = []
    starts: list[int] = []
    sep = -1
    for d, text in enumerate(texts):
        starts.append(len(stream))
        for tok in _WS.split(text or ""):
            if not tok:
                continue
            v = vocab.setdefault(tok, len(vocab))
            stream.append(v)
            doc_of.append(d)
        # unique sentinel per doc: no window crossing doc boundaries can
        # ever repeat
        stream.append(len(vocab) + len(starts))
        doc_of.append(-1)
    a = np.asarray(stream, dtype=np.int64)
    docv = np.asarray(doc_of, dtype=np.int64)
    sa = suffix_array(a)
    lcp = kasai_lcp(a, sa)
    n = len(a)
    # l-gram starting at q is duplicated iff lcp with either SA neighbor >= l
    dup_start = np.zeros(n, dtype=bool)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    ge = lcp >= l
    dup_at_rank = np.zeros(n, dtype=bool)
    dup_at_rank[1:] |= ge[1:]      # neighbor above
    dup_at_rank[:-1] |= ge[1:]     # neighbor below
    dup_start = dup_at_rank[rank]
    # a window starting at q is a real l-gram only if it stays in one doc
    in_doc = docv >= 0
    same_doc = np.ones(n, dtype=bool)
    for off in range(l):
        idx = np.minimum(np.arange(n) + off, n - 1)
        same_doc &= docv[idx] == docv
        same_doc &= (np.arange(n) + off) < n
    valid_start = dup_start & in_doc & same_doc
    # covered positions: p is removed iff any valid duplicated window
    # starting in [p-l+1, p] exists
    cov = np.zeros(n + l, dtype=np.int64)
    s_idx = np.flatnonzero(valid_start)
    np.add.at(cov, s_idx, 1)
    np.add.at(cov, s_idx + l, -1)
    covered = np.cumsum(cov[:n]) > 0
    ref_removed = int((covered & in_doc).sum())
    ref_sec = round(time.time() - t0, 1)

    # ---- the engine ----
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-substr-fidelity")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.substr import exact_substring_dedup

    docs = spark.createDataFrame(
        list(zip(ids, texts)), "doc_id bigint, text string"
    )
    t0 = time.time()
    eng_removed = int(
        exact_substring_dedup(docs, l=l)
        .agg(F.sum("tokens_removed").alias("s"))
        .first()["s"]
    )
    eng_sec = round(time.time() - t0, 1)

    out = {
        "l": l,
        "n_docs": len(ids),
        "n_tokens": int(in_doc.sum()),
        "engine_tokens_removed": eng_removed,
        "sa_maximal_tokens_removed": ref_removed,
        "equal": eng_removed == ref_removed,
        "engine_sec": eng_sec,
        "sa_reference_sec": ref_sec,
    }
    print(json.dumps(out))
    assert out["equal"], out


if __name__ == "__main__":
    main()
