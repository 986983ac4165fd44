"""Link-graph operators (g01/g02): independent numpy verification +
global invariants. The DuckDB oracle already value-checks both; this
file is a THIRD computation of the same numbers (dense numpy power
iteration) plus properties SQL can't express."""

import numpy as np
import pytest

from common_crawl___autumn_2025_spark.plans.graph import (
    g01_link_indegree,
    g02_pagerank,
    pagerank_ranks,
)


def _numpy_graph(n: int):
    """Edge list per the module's affine-modular rules."""
    src_list, dst_list = [], []
    for s in range(n):
        src_list.append(s)
        dst_list.append((s * 17 + 1) % n)
        if s % 3 != 0:
            src_list.append(s)
            dst_list.append((s * 31 + 7) % n)
        if s % 5 != 0:
            src_list.append(s)
            dst_list.append((s * 53 + 11) % n)
    return np.array(src_list), np.array(dst_list)


def _n_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_indegree_matches_numpy(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    src, dst = _numpy_graph(n)
    indeg = np.bincount(dst, minlength=n)
    # numpy top-25 with the same (indegree DESC, doc_id ASC) order
    order = np.lexsort((np.arange(n), -indeg))[:25]
    want = [(int(i), int(indeg[i])) for i in order]
    got = [
        (r.doc_id, r.indegree)
        for r in g01_link_indegree(spark, sf_dir).collect()
    ]
    assert got == want


def test_pagerank_matches_numpy(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    src, dst = _numpy_graph(n)
    outdeg = np.bincount(src, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        inflow = np.bincount(dst, weights=r[src] / outdeg[src], minlength=n)
        r = 0.15 / n + 0.85 * inflow
    rr = np.round(r, 6)
    order = np.lexsort((np.arange(n), -rr))[:25]
    want = [(int(i), float(rr[i])) for i in order]
    got = [
        (row.doc_id, row.pagerank)
        for row in g02_pagerank(spark, sf_dir).collect()
    ]
    assert got == want


def test_pagerank_mass_conserved(spark, sf_dir):
    """No dangling nodes by construction -> total rank mass stays
    exactly 1 through every iteration (sum r' = (1-d) + d * sum r)."""
    total = (
        pagerank_ranks(spark, sf_dir, iterations=2)
        .groupBy()
        .sum("rank")
        .collect()[0][0]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_more_iterations_converge(spark, sf_dir):
    """Successive iterates approach the fixed point: the L1 delta
    between iterations 3->4 is bounded by damping x the 2->3 delta
    (power-iteration contraction on the rank simplex)."""
    rs = [
        {
            r.id: r["rank"]
            for r in pagerank_ranks(spark, sf_dir, iterations=k).collect()
        }
        for k in (2, 3, 4)
    ]
    d23 = sum(abs(rs[1][i] - rs[0][i]) for i in rs[0])
    d34 = sum(abs(rs[2][i] - rs[1][i]) for i in rs[1])
    assert d34 <= 0.85 * d23 + 1e-12
