"""A10: report rendering (SURVEY.md §2.4) — the matplotlib charts the
reference's scripts/visualize_*.py draw from benchmark CSVs.

matplotlib is not installed in this container; every renderer is gated
behind an import-try and raises a clear error when unavailable. The
data-shaping (the Spark part) happens in the harness/report operators;
this module is presentation only, driver-side, from collected pandas.
"""

from __future__ import annotations


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as ex:  # pragma: no cover - env dependent
        raise ImportError(
            "matplotlib is not available in this environment; "
            "plot rendering (reference A10) is stubbed out"
        ) from ex


def plot_metadata_vs_width(rows: list[dict], out_png: str) -> str:
    """visualize_stats.py:30-106 shape: decode time vs num_columns,
    log-x bar/line."""
    plt = _plt()
    xs = [r["num_columns"] for r in rows]
    ys = [r["total_decode_time_us"] / 1000 for r in rows]
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(xs, ys, marker="o")
    ax.set_xscale("log")
    ax.set_xlabel("columns")
    ax.set_ylabel("footer decode (ms)")
    ax.set_title("Metadata decode time vs table width")
    fig.tight_layout()
    fig.savefig(out_png)
    plt.close(fig)
    return out_png


def plot_rowgroup_heatmap(rows: list[dict], out_png: str) -> str:
    """vizualize_row_groups.py:18 shape: decode time pivoted over
    row_group_size × page_size."""
    plt = _plt()
    import pandas as pd

    df = pd.DataFrame(rows)
    pivot = df.pivot_table(
        index="row_group_size", columns="page_size", values="total_decode_time_ms",
        aggfunc="mean",
    )
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(pivot.values, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(pivot.columns)), [str(c) for c in pivot.columns])
    ax.set_yticks(range(len(pivot.index)), [str(i) for i in pivot.index])
    ax.set_xlabel("page size (bytes)")
    ax.set_ylabel("row group size (rows)")
    fig.colorbar(im, label="decode ms")
    fig.tight_layout()
    fig.savefig(out_png)
    plt.close(fig)
    return out_png


def plot_compression_bars(rows: list[dict], out_png: str) -> str:
    """visualize_compression_benchmark.py shape: encode/decode grouped
    bars per codec."""
    plt = _plt()
    codecs = [r["algorithm"] for r in rows]
    enc = [r["encoding_time_ms"] for r in rows]
    dec = [r["decoding_time_ms"] for r in rows]
    x = range(len(codecs))
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar([i - 0.2 for i in x], enc, width=0.4, label="encode")
    ax.bar([i + 0.2 for i in x], dec, width=0.4, label="decode")
    ax.set_xticks(list(x), codecs)
    ax.set_ylabel("ms")
    ax.legend()
    ax.set_title("Codec encode/decode time")
    fig.tight_layout()
    fig.savefig(out_png)
    plt.close(fig)
    return out_png
