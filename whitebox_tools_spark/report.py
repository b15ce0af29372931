"""HTML report sinks (reference src/rendering/{html,histogram,
line_graph,scattergram}.rs): the stats tools return DataFrames; these
helpers render those small AGGREGATE frames as self-contained HTML with
inline SVG — no plotting libraries, no external assets.

Scale note: every renderer collects the input, so callers pass the
already-aggregated report frame (a histogram's bins, a profile's
samples), never raw data; ``max_rows`` guards accidental misuse.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame

_MAX_ROWS = 100_000

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; color: #222; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #999; padding: 2px 8px; text-align: right; }}
th {{ background: #eee; }}
svg {{ background: #fff; border: 1px solid #ccc; }}
</style></head><body>
<h1>{title}</h1>
{body}
</body></html>
"""


def _collect(df: DataFrame, max_rows: int = _MAX_ROWS):
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report input exceeds {max_rows} rows — pass the aggregated "
            "report frame, not raw data"
        )
    return rows


def table_html(df: DataFrame, title: str = "Table") -> str:
    """Plain table section (the reference's tabular report blocks)."""
    rows = _collect(df)
    head = "".join(f"<th>{_html.escape(c)}</th>" for c in df.columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{_html.escape(str(v))}</td>" for v in r) + "</tr>"
        for r in rows
    )
    return _PAGE.format(
        title=_html.escape(title),
        body=f"<table><tr>{head}</tr>{body}</table>",
    )


def _svg_frame(w: int, h: int, inner: str) -> str:
    return f'<svg width="{w}" height="{h}" viewBox="0 0 {w} {h}">{inner}</svg>'


def histogram_html(
    df: DataFrame, bin_col: str = "bin", count_col: str = "n", title: str = "Histogram"
) -> str:
    """Bar-chart SVG from a binned frame (rendering/histogram.rs
    get_svg contract: bins on x, counts on y)."""
    rows = sorted(_collect(df), key=lambda r: r[bin_col])
    if not rows:
        return _PAGE.format(title=_html.escape(title), body="<p>empty</p>")
    w, h, pad = 640, 360, 40
    peak = max(r[count_col] for r in rows) or 1
    bw = (w - 2 * pad) / len(rows)
    bars = []
    for i, r in enumerate(rows):
        bh = (h - 2 * pad) * (r[count_col] / peak)
        bars.append(
            f'<rect x="{pad + i * bw:.1f}" y="{h - pad - bh:.1f}" '
            f'width="{max(bw - 1, 1):.1f}" height="{bh:.1f}" fill="#4878a8">'
            f"<title>{_html.escape(str(r[bin_col]))}: {r[count_col]}</title></rect>"
        )
    axis = (
        f'<line x1="{pad}" y1="{h - pad}" x2="{w - pad}" y2="{h - pad}" stroke="#222"/>'
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{h - pad}" stroke="#222"/>'
        f'<text x="{pad}" y="{pad - 8}" font-size="12">{peak}</text>'
    )
    return _PAGE.format(
        title=_html.escape(title), body=_svg_frame(w, h, "".join(bars) + axis)
    )


def _scaled_points(rows, x_col, y_col, w, h, pad):
    xs = [float(r[x_col]) for r in rows]
    ys = [float(r[y_col]) for r in rows]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    sx = (w - 2 * pad) / ((x1 - x0) or 1.0)
    sy = (h - 2 * pad) / ((y1 - y0) or 1.0)
    return [
        (pad + (x - x0) * sx, h - pad - (y - y0) * sy) for x, y in zip(xs, ys)
    ], (x0, x1, y0, y1)


def scattergram_html(
    df: DataFrame, x_col: str, y_col: str, title: str = "Scattergram"
) -> str:
    """Point-cloud SVG (rendering/scattergram.rs contract)."""
    rows = _collect(df)
    if not rows:
        return _PAGE.format(title=_html.escape(title), body="<p>empty</p>")
    w, h, pad = 640, 480, 40
    pts, (x0, x1, y0, y1) = _scaled_points(rows, x_col, y_col, w, h, pad)
    dots = "".join(
        f'<circle cx="{px:.1f}" cy="{py:.1f}" r="2" fill="#a84848" fill-opacity="0.6"/>'
        for px, py in pts
    )
    labels = (
        f'<text x="{pad}" y="{h - 8}" font-size="12">{x_col}: [{x0:g}, {x1:g}]</text>'
        f'<text x="8" y="{pad - 8}" font-size="12">{y_col}: [{y0:g}, {y1:g}]</text>'
    )
    return _PAGE.format(title=_html.escape(title), body=_svg_frame(w, h, dots + labels))


def line_graph_html(
    df: DataFrame,
    x_col: str,
    y_col: str,
    series_col: str | None = None,
    title: str = "Line graph",
) -> str:
    """Polyline SVG, one line per series (rendering/line_graph.rs)."""
    rows = _collect(df)
    if not rows:
        return _PAGE.format(title=_html.escape(title), body="<p>empty</p>")
    w, h, pad = 640, 480, 40
    pts, (x0, x1, y0, y1) = _scaled_points(rows, x_col, y_col, w, h, pad)
    groups: dict = {}
    for r, p in zip(rows, pts):
        key = r[series_col] if series_col else ""
        groups.setdefault(key, []).append((float(r[x_col]), p))
    palette = ["#4878a8", "#a84848", "#48a860", "#a89048", "#7848a8", "#48a0a8"]
    lines = []
    for i, (key, seq) in enumerate(sorted(groups.items(), key=lambda kv: str(kv[0]))):
        seq.sort(key=lambda t: t[0])
        path = " ".join(f"{px:.1f},{py:.1f}" for _, (px, py) in seq)
        color = palette[i % len(palette)]
        lines.append(
            f'<polyline points="{path}" fill="none" stroke="{color}" stroke-width="1.5">'
            f"<title>{_html.escape(str(key))}</title></polyline>"
        )
    labels = (
        f'<text x="{pad}" y="{h - 8}" font-size="12">{x_col}: [{x0:g}, {x1:g}]</text>'
        f'<text x="8" y="{pad - 8}" font-size="12">{y_col}: [{y0:g}, {y1:g}]</text>'
    )
    return _PAGE.format(
        title=_html.escape(title), body=_svg_frame(w, h, "".join(lines) + labels)
    )


def write_report(html_text: str, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(html_text)
