"""A10: report rendering (SURVEY.md §2.4) — the charts the reference's
scripts/visualize_*.py draw from benchmark CSVs.

Each renderer shapes its data exactly like the reference script it
mirrors, then draws with matplotlib when available. This container
ships no matplotlib, so a pure-stdlib SVG backend draws the same
chart (line/heatmap/grouped-bars) instead — real rendered output,
exercised by tests/test_plots.py, not an import-gated stub. The
data-shaping (the Spark part) happens in the harness/report
operators; this module is presentation only, driver-side, from
collected rows.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape


def _plt():
    """matplotlib handle, or None → the SVG fallback backend."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:  # pragma: no cover - env dependent
        return None


# ---------------------------------------------------------------- SVG backend
# Minimal chart emitter: enough geometry for the three reference chart
# shapes. Coordinates are plain floats in a fixed 700x400 viewport with
# a 60/20/40/50 (l/r/t/b) margin box.

_W, _H = 700.0, 400.0
_ML, _MR, _MT, _MB = 60.0, 20.0, 40.0, 50.0
_PW, _PH = _W - _ML - _MR, _H - _MT - _MB


def _svg_doc(body: list[str], title: str) -> str:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W:.0f}" '
        f'height="{_H:.0f}" viewBox="0 0 {_W:.0f} {_H:.0f}">'
        f'<rect width="{_W:.0f}" height="{_H:.0f}" fill="white"/>'
        f'<text x="{_W / 2:.1f}" y="24" text-anchor="middle" '
        f'font-size="15" font-family="sans-serif">{escape(title)}</text>'
    )
    return head + "".join(body) + "</svg>"


def _axes(xlabel: str, ylabel: str) -> list[str]:
    x0, y0, x1, y1 = _ML, _MT, _ML + _PW, _MT + _PH
    return [
        f'<line x1="{x0}" y1="{y1}" x2="{x1}" y2="{y1}" stroke="black"/>',
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="black"/>',
        f'<text x="{(x0 + x1) / 2:.1f}" y="{_H - 8:.1f}" text-anchor="middle" '
        f'font-size="12" font-family="sans-serif">{escape(xlabel)}</text>',
        f'<text x="14" y="{(y0 + y1) / 2:.1f}" text-anchor="middle" '
        f'font-size="12" font-family="sans-serif" '
        f'transform="rotate(-90 14 {(y0 + y1) / 2:.1f})">{escape(ylabel)}</text>',
    ]


def _scale(vals: list[float], log: bool = False):
    """Return value → pixel-fraction mapper over [0,1] with padding."""
    f = (lambda v: math.log10(v)) if log else (lambda v: v)
    lo, hi = min(f(v) for v in vals), max(f(v) for v in vals)
    if hi == lo:
        hi = lo + 1.0
    span = hi - lo
    return lambda v: (f(v) - lo) / span


def _svg_line_plot(
    xs: list[float], ys: list[float], *, log_x: bool, xlabel: str,
    ylabel: str, title: str, out: str,
) -> str:
    sx, sy = _scale(xs, log=log_x), _scale([0.0] + ys)
    pts = [
        (_ML + sx(x) * _PW, _MT + _PH - sy(y) * _PH) for x, y in zip(xs, ys)
    ]
    body = _axes(xlabel, ylabel)
    body.append(
        '<polyline fill="none" stroke="#1f77b4" stroke-width="2" points="'
        + " ".join(f"{px:.1f},{py:.1f}" for px, py in pts) + '"/>'
    )
    for (px, py), x in zip(pts, xs):
        body.append(f'<circle cx="{px:.1f}" cy="{py:.1f}" r="3.5" fill="#1f77b4"/>')
        body.append(
            f'<text x="{px:.1f}" y="{_MT + _PH + 16:.1f}" text-anchor="middle" '
            f'font-size="10" font-family="sans-serif">{escape(str(x))}</text>'
        )
    with open(out, "w") as fh:
        fh.write(_svg_doc(body, title))
    return out


def _viridis(t: float) -> str:
    """3-stop approximation of the viridis ramp (dark-purple → teal →
    yellow), good enough for a readable heatmap without matplotlib."""
    stops = [(68, 1, 84), (33, 145, 140), (253, 231, 37)]
    t = min(max(t, 0.0), 1.0) * 2
    i = min(int(t), 1)
    f = t - i
    r, g, b = (
        round(stops[i][c] + f * (stops[i + 1][c] - stops[i][c])) for c in range(3)
    )
    return f"rgb({r},{g},{b})"


def _svg_heatmap(
    values: list[list[float]], *, xticks: list[str], yticks: list[str],
    xlabel: str, ylabel: str, title: str, out: str,
) -> str:
    flat = [v for row in values for v in row if v == v]  # drop NaN
    lo, hi = min(flat), max(flat)
    span = (hi - lo) or 1.0
    cw, ch = _PW / len(xticks), _PH / len(yticks)
    body = _axes(xlabel, ylabel)
    for i, row in enumerate(values):
        for j, v in enumerate(row):
            fill = "#dddddd" if v != v else _viridis((v - lo) / span)
            body.append(
                f'<rect x="{_ML + j * cw:.1f}" y="{_MT + i * ch:.1f}" '
                f'width="{cw:.1f}" height="{ch:.1f}" fill="{fill}"/>'
            )
    for j, t in enumerate(xticks):
        body.append(
            f'<text x="{_ML + (j + 0.5) * cw:.1f}" y="{_MT + _PH + 16:.1f}" '
            f'text-anchor="middle" font-size="10" font-family="sans-serif">'
            f"{escape(t)}</text>"
        )
    for i, t in enumerate(yticks):
        body.append(
            f'<text x="{_ML - 6:.1f}" y="{_MT + (i + 0.5) * ch + 3:.1f}" '
            f'text-anchor="end" font-size="10" font-family="sans-serif">'
            f"{escape(t)}</text>"
        )
    with open(out, "w") as fh:
        fh.write(_svg_doc(body, title))
    return out


def _svg_grouped_bars(
    categories: list[str], series: dict[str, list[float]], *, ylabel: str,
    title: str, out: str,
) -> str:
    palette = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728"]
    sy = _scale([0.0] + [v for vs in series.values() for v in vs])
    n_cat, n_ser = len(categories), len(series)
    slot = _PW / n_cat
    bw = slot * 0.8 / n_ser
    body = _axes("", ylabel)
    for s, (name, vals) in enumerate(series.items()):
        color = palette[s % len(palette)]
        for c, v in enumerate(vals):
            h = sy(v) * _PH
            body.append(
                f'<rect class="bar" x="{_ML + c * slot + slot * 0.1 + s * bw:.1f}" '
                f'y="{_MT + _PH - h:.1f}" width="{bw:.1f}" height="{h:.1f}" '
                f'fill="{color}"/>'
            )
        body.append(
            f'<rect x="{_ML + _PW - 110:.1f}" y="{_MT + 8 + s * 16:.1f}" '
            f'width="10" height="10" fill="{color}"/>'
            f'<text x="{_ML + _PW - 96:.1f}" y="{_MT + 17 + s * 16:.1f}" '
            f'font-size="11" font-family="sans-serif">{escape(name)}</text>'
        )
    for c, cat in enumerate(categories):
        body.append(
            f'<text x="{_ML + (c + 0.5) * slot:.1f}" y="{_MT + _PH + 16:.1f}" '
            f'text-anchor="middle" font-size="10" font-family="sans-serif">'
            f"{escape(cat)}</text>"
        )
    with open(out, "w") as fh:
        fh.write(_svg_doc(body, title))
    return out


# ---------------------------------------------------------------- renderers


def plot_metadata_vs_width(rows: list[dict], out_path: str) -> str:
    """visualize_stats.py:30-106 shape: decode time vs num_columns,
    log-x line+markers."""
    xs = [r["num_columns"] for r in rows]
    ys = [r["total_decode_time_us"] / 1000 for r in rows]
    plt = _plt()
    if plt is None:
        return _svg_line_plot(
            xs, ys, log_x=True, xlabel="columns", ylabel="footer decode (ms)",
            title="Metadata decode time vs table width", out=out_path,
        )
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(xs, ys, marker="o")
    ax.set_xscale("log")
    ax.set_xlabel("columns")
    ax.set_ylabel("footer decode (ms)")
    ax.set_title("Metadata decode time vs table width")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_rowgroup_heatmap(rows: list[dict], out_path: str) -> str:
    """vizualize_row_groups.py:18 shape: decode time pivoted over
    row_group_size × page_size."""
    import pandas as pd

    df = pd.DataFrame(rows)
    pivot = df.pivot_table(
        index="row_group_size", columns="page_size",
        values="total_decode_time_ms", aggfunc="mean",
    )
    plt = _plt()
    if plt is None:
        return _svg_heatmap(
            [list(r) for r in pivot.values],
            xticks=[str(c) for c in pivot.columns],
            yticks=[str(i) for i in pivot.index],
            xlabel="page size (bytes)", ylabel="row group size (rows)",
            title="Decode time by row-group x page size", out=out_path,
        )
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(pivot.values, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(pivot.columns)), [str(c) for c in pivot.columns])
    ax.set_yticks(range(len(pivot.index)), [str(i) for i in pivot.index])
    ax.set_xlabel("page size (bytes)")
    ax.set_ylabel("row group size (rows)")
    fig.colorbar(im, label="decode ms")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def plot_compression_bars(rows: list[dict], out_path: str) -> str:
    """visualize_compression_benchmark.py shape: encode/decode grouped
    bars per codec."""
    codecs = [r["algorithm"] for r in rows]
    enc = [r["encoding_time_ms"] for r in rows]
    dec = [r["decoding_time_ms"] for r in rows]
    plt = _plt()
    if plt is None:
        return _svg_grouped_bars(
            codecs, {"encode": enc, "decode": dec}, ylabel="ms",
            title="Codec encode/decode time", out=out_path,
        )
    x = range(len(codecs))
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar([i - 0.2 for i in x], enc, width=0.4, label="encode")
    ax.bar([i + 0.2 for i in x], dec, width=0.4, label="decode")
    ax.set_xticks(list(x), codecs)
    ax.set_ylabel("ms")
    ax.legend()
    ax.set_title("Codec encode/decode time")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
