"""A10 smoke: each renderer draws a real chart file (SVG fallback in
this container; matplotlib PNG where available). Shapes mirror the
reference's scripts/visualize_stats.py:30-106 /
vizualize_row_groups.py:18 / visualize_compression_benchmark.py."""

import xml.etree.ElementTree as ET

from gresearch_parquet_benchmarking_spark.bench import plots

SVG_NS = "{http://www.w3.org/2000/svg}"


def _load(path):
    if path.endswith(".svg") or open(path, "rb").read(4) == b"<svg":
        return ET.parse(path).getroot()
    return None  # matplotlib PNG — existence is enough


def test_metadata_vs_width_renders(tmp_path):
    rows = [
        {"num_columns": n, "total_decode_time_us": 300.0 * n ** 0.9}
        for n in (10, 100, 1000, 10000)
    ]
    out = plots.plot_metadata_vs_width(rows, str(tmp_path / "meta.svg"))
    root = _load(out)
    if root is not None:
        polys = root.findall(f".//{SVG_NS}polyline")
        assert len(polys) == 1
        assert len(polys[0].get("points").split()) == 4  # one vertex per width
        assert len(root.findall(f".//{SVG_NS}circle")) == 4


def test_rowgroup_heatmap_renders(tmp_path):
    rows = [
        {"row_group_size": rg, "page_size": ps,
         "total_decode_time_ms": rg / ps * 1000 + ps / 1e4}
        for rg in (1000, 10000, 100000)
        for ps in (8192, 65536, 1048576)
    ]
    out = plots.plot_rowgroup_heatmap(rows, str(tmp_path / "heat.svg"))
    root = _load(out)
    if root is not None:
        # 3x3 cells + background rect
        rects = root.findall(f".//{SVG_NS}rect")
        assert len(rects) == 10
        fills = {r.get("fill") for r in rects}
        assert any(f.startswith("rgb(") for f in fills)  # ramp applied


def test_compression_bars_renders(tmp_path):
    rows = [
        {"algorithm": a, "encoding_time_ms": e, "decoding_time_ms": d}
        for a, e, d in [
            ("none", 2351, 293), ("snappy", 2362, 273),
            ("gzip", 3706, 455), ("brotli", 4421, 1230),
        ]
    ]
    out = plots.plot_compression_bars(rows, str(tmp_path / "codec.svg"))
    root = _load(out)
    if root is not None:
        bars = [r for r in root.findall(f".//{SVG_NS}rect") if r.get("class") == "bar"]
        assert len(bars) == 8  # 4 codecs x 2 series
        # bar heights ordered with the data: brotli encode tallest
        enc_heights = [float(b.get("height")) for b in bars[:4]]
        assert max(enc_heights) == enc_heights[3]
