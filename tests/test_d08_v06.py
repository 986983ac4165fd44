"""d08 chunk-level exact-substring dedup + v06 semantic dedup.

Each operator is checked two ways: engine ≡ DuckDB oracle on the sf
testdata (the driver's contract), and exact expected values on a
PLANTED corpus where the duplicate structure is known by construction
(the semantics check the sf data can't pin, since its duplication is
incidental).
"""

import duckdb
import pytest

from common_crawl___autumn_2025_spark.operators.dedup import (
    _D08_ORACLE,
    CHUNK,
    d08_exact_substring,
)
from common_crawl___autumn_2025_spark.operators.similarity import (
    _V06_ORACLE,
    SEM_TAU,
    v06_semantic_dedup,
)


def _duck(sf_dir, tables=("documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_d08_engine_matches_oracle(spark, sf_dir):
    engine = [tuple(r) for r in d08_exact_substring(spark, sf_dir).collect()]
    con = _duck(sf_dir)  # named ref: the relation does not keep it alive
    oracle = [tuple(r) for r in con.sql(_D08_ORACLE).fetchall()]
    assert engine == oracle
    # the sf corpora contain incidental repeated 10-token chunks —
    # the operator must surface them, not report an all-zero column
    assert any(r[2] > 0 for r in engine)
    assert all(r[1] >= r[2] for r in engine)  # dup_chunks <= n_chunks


def test_d08_planted_duplicates(spark, tmp_path):
    """Known duplicate structure: doc 0 and doc 1 share one full chunk,
    doc 2 repeats its own first chunk (within-doc repetition counts —
    the ExactSubstr posture), doc 3 is all-unique, doc 4 is shorter
    than one chunk (excluded), doc 5 is NULL (excluded)."""
    w = [f"w{i}" for i in range(CHUNK)]  # one exact 10-token chunk
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    rows = [
        (0, " ".join(w) + " " + uniq("a", CHUNK)),        # shared + unique
        (1, uniq("b", CHUNK) + " " + " ".join(w)),        # unique + shared
        (2, " ".join(w * 2).replace("w", "x") + " tail"), # self-repeat ×2
        (3, uniq("c", 3 * CHUNK)),                        # 3 unique chunks
        (4, "too short"),                                 # < CHUNK tokens
        (5, None),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        sf + "/documents.parquet"
    )
    got = {r.doc_id: r for r in d08_exact_substring(spark, sf).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert (got[0].n_chunks, got[0].dup_chunks) == (2, 1)
    assert (got[1].n_chunks, got[1].dup_chunks) == (2, 1)
    assert (got[2].n_chunks, got[2].dup_chunks) == (2, 2)
    assert (got[3].n_chunks, got[3].dup_chunks) == (3, 0)
    assert got[0].dup_frac == 0.5 and got[0].keep
    assert got[2].dup_frac == 1.0 and not got[2].keep
    assert got[3].dup_frac == 0.0 and got[3].keep
    # engine ≡ oracle on the planted corpus too
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    oracle = [tuple(r) for r in con.sql(_D08_ORACLE).fetchall()]
    engine = [tuple(r) for r in d08_exact_substring(spark, sf).collect()]
    assert engine == oracle


def test_v06_engine_matches_oracle(spark, sf_dir):
    engine = [tuple(r) for r in v06_semantic_dedup(spark, sf_dir).collect()]
    con = _duck(sf_dir)
    oracle = [tuple(r) for r in con.sql(_V06_ORACLE).fetchall()]
    assert engine == oracle
    assert len(engine) > 0
    # each dup maps to exactly one keeper, and keeper id < dup id
    dups = [d for d, _, _ in engine]
    assert len(dups) == len(set(dups))
    assert all(k < d for d, k, _ in engine)
    assert all(c >= SEM_TAU for _, _, c in engine)


def test_v06_planted_semantic_dups(spark, tmp_path):
    """Three tight clusters of near-identical vectors (more vectors
    than N_CELLS, so cells genuinely aggregate). The operator's
    contract is CELL-local dedup (SemDeDup removes within-cluster-cell
    duplicates; a tight cluster may span several cells when several of
    its members are sampled as centroids), so the assertions are:
    every dup links to a LOWER id in its OWN planted cluster at
    cosine ~1, every cluster sheds at least one duplicate, and no
    cross-cluster link exists. Engine ≡ oracle on the planted corpus.
    32-dim keeps random cross-cluster cosines well under SEM_TAU."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    base = {
        10: rng.normal(size=32),
        30: rng.normal(size=32),
        50: rng.normal(size=32),
    }
    for lo, b in base.items():
        for j in range(8):  # ids lo..lo+7: near-identical
            v = b + rng.normal(scale=0.01, size=32)
            rows.append((lo + j, [float(x) for x in v]))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(sf + "/embeddings.parquet")
    rows_out = v06_semantic_dedup(spark, sf).collect()
    got = {r.dup_id: r.keep_id for r in rows_out}
    for lo in base:
        members = set(range(lo, lo + 8))
        dups_here = {d for d in got if d in members}
        assert dups_here, (lo, got)  # every cluster sheds duplicates
        assert lo not in got  # the minimal id is always a keeper
        # each dup's keeper is a lower id in the SAME planted cluster
        for d in dups_here:
            assert got[d] in members and got[d] < d, (d, got[d])
    assert all(r.cosine > 0.99 for r in rows_out)  # near-identical only
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    oracle = [tuple(r) for r in con.sql(_V06_ORACLE).fetchall()]
    engine = [tuple(r) for r in v06_semantic_dedup(spark, sf).collect()]
    assert engine == oracle


@pytest.mark.parametrize("parts", [2, 8])
def test_d08_deterministic_under_parallelism(spark, sf_dir, parts):
    """The COMPUTATION must be partitioning-invariant: vary the
    shuffle-partition count the operator's aggregations actually run
    under (not the finished result's layout) and compare."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        rows = sorted(tuple(r) for r in d08_exact_substring(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    ref = sorted(tuple(r) for r in d08_exact_substring(spark, sf_dir).collect())
    assert rows == ref
