"""Scale-aware IVF/SemDeDup codebook (r5 verdict item #2).

The r5 audit's one latent scale-killer was the fixed 16-cell
codebook: with constant cells, intra-cell pair volume is quadratic in
the corpus. ``derived_n_cells`` makes cells grow with the corpus so
expected per-row candidate volume stays at ~TARGET_CELL_ROWS; these
tests pin that contract by doubling the corpus and asserting the
pair volume per row does NOT grow, plus the refined-codebook drop-in
path for v06 (r5 verdict item #7).
"""

import numpy as np
import pytest

from common_crawl___autumn_2025_spark.operators.similarity import (
    N_CELLS_MIN,
    TARGET_CELL_ROWS,
    derived_n_cells,
    ivf_assign_udfs,
    kmeans_refine,
    md5_rank_centroids,
    semantic_dedup,
)


def test_derived_n_cells_rule():
    assert derived_n_cells(0) == N_CELLS_MIN
    assert derived_n_cells(500) == N_CELLS_MIN          # sf0.01 corpus
    assert derived_n_cells(2000) == 2000 // TARGET_CELL_ROWS  # sf0.1
    assert derived_n_cells(10**9) == 10**9 // TARGET_CELL_ROWS
    # monotone, never below the floor
    assert derived_n_cells(10**6) >= derived_n_cells(10**5) >= N_CELLS_MIN


def _random_emb(spark, n, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cells_grow_with_corpus_pair_volume_bounded(spark):
    """Quadruple the corpus: the codebook must grow 4x and the
    intra-cell pair volume PER ROW (sum of per-cell count squared,
    divided by n — what the v06 self-join actually produces) must
    stay bounded near TARGET_CELL_ROWS instead of growing with n.
    This is the assertion that kills the fixed-cells quadratic."""
    per_row = {}
    for n in (1024, 4096):
        emb = _random_emb(spark, n)
        cents = md5_rank_centroids(emb)
        assert cents.shape[0] == derived_n_cells(n)
        cell_udf, _ = ivf_assign_udfs(cents, 1)
        counts = (
            emb.select(cell_udf("embedding").alias("cell"))
            .groupBy("cell")
            .count()
            .collect()
        )
        cs = np.array([r["count"] for r in counts], dtype=np.int64)
        assert int(cs.sum()) == n
        per_row[n] = float((cs**2).sum()) / n
        # bounded in absolute terms (measured ~66 on random vectors)
        assert per_row[n] <= 3 * TARGET_CELL_ROWS, per_row
    # and bounded RELATIVELY: 4x the corpus must not grow the per-row
    # candidate volume (fixed cells would grow it 4x)
    assert per_row[4096] <= 1.5 * per_row[1024], per_row


def test_explicit_n_cells_override(spark):
    emb = _random_emb(spark, 256)
    assert md5_rank_centroids(emb, n_cells=8).shape[0] == 8
    assert md5_rank_centroids(emb).shape[0] == N_CELLS_MIN


@pytest.mark.parametrize("refine_iters", [0, 1])
def test_v06_refined_codebook(spark, refine_iters):
    """v05's k-means-refined codebook drops into semantic_dedup
    without changing the plan or breaking the planted contract:
    every planted EXACT duplicate (identical vector, higher id) is
    detected regardless of the codebook — identical vectors get
    identical rounded assignment scores, hence the same cell — and
    its pair cosine is 1.0."""
    rng = np.random.default_rng(23)
    rows = []
    twins = []
    for g in range(12):
        v = rng.normal(size=64)
        v = [float(x) for x in v]
        lo, hi = 10 * g, 10 * g + 1
        rows.append((lo, v))
        rows.append((hi, v))  # exact duplicate
        twins.append((lo, hi))
    # filler singletons so cells aggregate beyond the twins
    for j in range(40):
        rows.append((1000 + j, [float(x) for x in rng.normal(size=64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = md5_rank_centroids(emb)
    if refine_iters:
        cents = kmeans_refine(emb, cents, iters=refine_iters)
    out = {r.dup_id: r for r in semantic_dedup(emb, centroids=cents).collect()}
    for lo, hi in twins:
        assert hi in out, (hi, sorted(out))
        assert out[hi].keep_id < hi
        assert out[hi].cosine >= 0.999999
