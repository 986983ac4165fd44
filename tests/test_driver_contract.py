"""Driver-contract guard: every catalog entry must be consumable by
the correctness driver's canonicalizer.

The driver sorts columns by name and hashes values; a raw ARRAY/MAP/
STRUCT output column crashes it and aborts the ENTIRE correctness
run at that query (observed in round 2). Any entry can enter the
checked window in a future rotation (`plans/catalog.py:
_DRIVER_WINDOW_FIRST`), so the scalar-only rule is pinned for the
whole catalog, not just the current window — this is what makes a
registration-order rotation safe to do blind.
"""

from common_crawl___autumn_2025_spark.plans.catalog import QUERIES

_SCALAR_FORBIDDEN = ("array", "map", "struct")


def test_every_catalog_entry_has_scalar_only_schema(spark, sf_dir):
    bad = []
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if any(x in t for x in _SCALAR_FORBIDDEN):
                bad.append((name, f.name, t))
    assert not bad, f"non-scalar driver outputs: {bad}"


def test_driver_window_is_exactly_fifty_and_registered():
    from common_crawl___autumn_2025_spark.plans.catalog import (
        _DRIVER_WINDOW_FIRST,
    )

    # every windowed key exists (a typo would silently shrink the
    # checked window), the window fills the driver's 50 slots, and
    # registration order actually starts with it
    missing = [k for k in _DRIVER_WINDOW_FIRST if k not in QUERIES]
    assert not missing, missing
    assert len(_DRIVER_WINDOW_FIRST) == 50
    assert list(QUERIES)[:50] == _DRIVER_WINDOW_FIRST
