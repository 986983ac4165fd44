"""S13 figure sink: render small AGGREGATE relations to SVG files.

The reference saves matplotlib PNGs of histogram / bar / line charts
over already-aggregated pandas series (Visuals.py:31-34 ``savefig``,
and the nine chart cells below it). The engine mirrors the semantics
— a figure is a SINK over a reduced relation — without matplotlib
(not in this environment, and a driver-side PNG rasterizer adds
nothing): charts are emitted as deterministic standalone SVG, which
is plain XML this module writes directly.

100 TB shape: the sink consumes the OUTPUT of an aggregation
(histogram bins, top-k counts, year rollups — relations the catalog
already computes distributively), never raw rows. ``collect`` here
is bounded by construction: ``MAX_POINTS`` guards against a caller
plotting an unreduced table, which is exactly the discipline the
reference follows (it plots ``value_counts().head(20)``, not the
frame).

Determinism: float formatting is pinned (``_fmt``), no timestamps,
no random ids — byte-identical SVG for identical input, so figure
bytes can be content-addressed and diffed like any other artifact.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

MAX_POINTS = 10_000  # a figure over more points than this is a bug

_W, _H = 640, 400
_ML, _MR, _MT, _MB = 70, 20, 40, 80  # margins: left/right/top/bottom


def _fmt(x: float) -> str:
    """Pinned numeric formatting for coordinates and tick labels."""
    return f"{x:.2f}".rstrip("0").rstrip(".")


def _axis_ticks(vmax: float, n: int = 5) -> list[float]:
    if vmax <= 0:
        return [0.0]
    step = vmax / n
    return [round(i * step, 6) for i in range(n + 1)]


def _frame(title: str, body: list[str]) -> str:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}">'
        f'<rect width="{_W}" height="{_H}" fill="white"/>'
        f'<text x="{_W // 2}" y="24" text-anchor="middle" '
        f'font-family="sans-serif" font-size="16">{escape(title)}</text>'
    )
    return head + "".join(body) + "</svg>"


def _plot_area():
    return _ML, _MT, _W - _MR, _H - _MB  # x0, y0, x1, y1


def _y_axis(vmax: float) -> list[str]:
    x0, y0, x1, y1 = _plot_area()
    parts = [
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="black"/>',
        f'<line x1="{x0}" y1="{y1}" x2="{x1}" y2="{y1}" stroke="black"/>',
    ]
    for t in _axis_ticks(vmax):
        y = y1 - (t / vmax) * (y1 - y0) if vmax else y1
        parts.append(
            f'<text x="{x0 - 6}" y="{_fmt(y + 4)}" text-anchor="end" '
            f'font-family="sans-serif" font-size="10">{_fmt(t)}</text>'
        )
        parts.append(
            f'<line x1="{x0 - 4}" y1="{_fmt(y)}" x2="{x0}" '
            f'y2="{_fmt(y)}" stroke="black"/>'
        )
    return parts


def render_bar_svg(labels, values, title: str) -> str:
    """Vertical bar chart (the reference's value_counts().plot(kind=
    'bar') / histplot shape: histogram bins are bars over bin
    labels)."""
    n = len(values)
    if n == 0:
        return _frame(title, [])
    if n > MAX_POINTS:
        raise ValueError(f"figure over {n} points; aggregate first")
    vmax = float(max(max(values), 0))
    x0, y0, x1, y1 = _plot_area()
    span = x1 - x0
    bw = span / n
    body = _y_axis(vmax)
    for i, (lab, v) in enumerate(zip(labels, values)):
        h = (float(v) / vmax) * (y1 - y0) if vmax else 0.0
        bx = x0 + i * bw
        body.append(
            f'<rect x="{_fmt(bx + bw * 0.1)}" y="{_fmt(y1 - h)}" '
            f'width="{_fmt(bw * 0.8)}" height="{_fmt(h)}" '
            f'fill="steelblue"/>'
        )
        cx = bx + bw / 2
        body.append(
            f'<text x="{_fmt(cx)}" y="{y1 + 12}" text-anchor="end" '
            f'font-family="sans-serif" font-size="9" transform='
            f'"rotate(-45 {_fmt(cx)} {y1 + 12})">{escape(str(lab))}</text>'
        )
    return _frame(title, body)


def render_line_svg(xs, ys, title: str) -> str:
    """Line chart (the reference's sorted value_counts().plot() year
    series). ``xs`` must be ascending numerics."""
    n = len(ys)
    if n == 0:
        return _frame(title, [])
    if n > MAX_POINTS:
        raise ValueError(f"figure over {n} points; aggregate first")
    vmax = float(max(max(ys), 0))
    xmin, xmax = float(min(xs)), float(max(xs))
    xspan = (xmax - xmin) or 1.0
    x0, y0, x1, y1 = _plot_area()
    pts = []
    for x, y in zip(xs, ys):
        px = x0 + (float(x) - xmin) / xspan * (x1 - x0)
        py = y1 - (float(y) / vmax) * (y1 - y0) if vmax else y1
        pts.append(f"{_fmt(px)},{_fmt(py)}")
    body = _y_axis(vmax)
    body.append(
        f'<polyline points="{" ".join(pts)}" fill="none" '
        f'stroke="steelblue" stroke-width="2"/>'
    )
    for x in (xmin, xmax):
        px = x0 + (float(x) - xmin) / xspan * (x1 - x0)
        body.append(
            f'<text x="{_fmt(px)}" y="{y1 + 14}" text-anchor="middle" '
            f'font-family="sans-serif" font-size="10">{_fmt(x)}</text>'
        )
    return _frame(title, body)


def save_figure(df, kind: str, x: str, y: str, title: str, path: str) -> dict:
    """Figure SINK: collect a REDUCED relation (bounded by
    ``MAX_POINTS``) and write one standalone SVG. Returns the
    manifest row (name, kind, points, bytes) the catalog face
    surfaces. ``df`` must already be ordered the way the chart should
    read — this sink adds no implicit sort."""
    rows = df.select(x, y).collect()
    if len(rows) > MAX_POINTS:
        raise ValueError(
            f"{len(rows)} rows for figure '{title}'; aggregate first"
        )
    xs = [r[0] for r in rows]
    ys = [float(r[1]) for r in rows]
    if kind == "bar":
        svg = render_bar_svg(xs, ys, title)
    elif kind == "line":
        svg = render_line_svg(xs, ys, title)
    else:
        raise ValueError(f"unknown figure kind: {kind}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = svg.encode("utf-8")
    with open(path, "wb") as f:
        f.write(data)
    return {
        "figure": os.path.splitext(os.path.basename(path))[0],
        "kind": kind,
        "n_points": len(rows),
        "svg_bytes": len(data),
    }
