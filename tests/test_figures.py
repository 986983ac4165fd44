"""S13 figure sink: deterministic byte-identical SVG, well-formed
XML, geometry proportional to the data, the bounded-collect guard,
and the catalog manifest."""

import os
import xml.etree.ElementTree as ET

import pytest

from common_crawl___autumn_2025_spark.sources.figures import (
    MAX_POINTS,
    render_bar_svg,
    render_line_svg,
    save_figure,
)


def test_svg_deterministic_and_wellformed():
    labels = ["a", "b", "c&d", "<e>"]
    values = [3, 1, 4, 2]
    one = render_bar_svg(labels, values, "t <&> title")
    two = render_bar_svg(labels, values, "t <&> title")
    assert one == two  # byte-identical
    root = ET.fromstring(one)  # parses as XML (escaping correct)
    assert root.tag.endswith("svg")
    line = render_line_svg([1, 2, 3], [5.0, 2.5, 10.0], "l")
    assert line == render_line_svg([1, 2, 3], [5.0, 2.5, 10.0], "l")
    ET.fromstring(line)


def test_bar_geometry_proportional():
    svg = render_bar_svg(["x", "y"], [10, 5], "p")
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    bars = [
        e for e in root.iter(f"{ns}rect") if e.get("fill") == "steelblue"
    ]
    assert len(bars) == 2
    h = [float(b.get("height")) for b in bars]
    assert abs(h[0] - 2 * h[1]) < 0.05  # 10 vs 5 -> 2:1 heights


def test_max_points_guard():
    with pytest.raises(ValueError):
        render_bar_svg(
            [str(i) for i in range(MAX_POINTS + 1)],
            [1] * (MAX_POINTS + 1),
            "too big",
        )


def test_save_figure_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 3), ("b", 7)], "label string, cnt long"
    ).orderBy("label")
    path = str(tmp_path / "figs" / "demo.svg")
    manifest = save_figure(df, "bar", "label", "cnt", "demo", path)
    assert manifest == {
        "figure": "demo",
        "kind": "bar",
        "n_points": 2,
        "svg_bytes": os.path.getsize(path),
    }
    ET.parse(path)
    # sink refuses unreduced relations
    big = spark.range(MAX_POINTS + 1).selectExpr(
        "CAST(id AS STRING) AS label", "id AS cnt"
    )
    with pytest.raises(ValueError):
        save_figure(big, "bar", "label", "cnt", "big", str(tmp_path / "b.svg"))


def test_s13_catalog_manifest(spark, sf_dir):
    from common_crawl___autumn_2025_spark.plans.sources_catalog import (
        s13_figure_sink,
    )

    out = {r.figure: r for r in s13_figure_sink(spark, sf_dir).collect()}
    assert set(out) == {
        "crawl_word_count_distribution",
        "events_top_types",
        "orders_year_series",
    }
    assert out["orders_year_series"].kind == "line"
    assert all(r.n_points > 0 for r in out.values())
