"""Unit tests for bench.py's contention defenses (no Spark): adaptive
best-of trial extension, history-triggered re-measurement, and suspect
flagging. The r2 driver artifact recorded 5-100x inflated scans on a
contended host; these helpers are what keeps a r3+ artifact honest."""

from __future__ import annotations

import importlib

import bench


def setup_function(_fn):
    importlib.reload(bench)  # reset HISTORY / SUSPECTS module state


def test_best_extends_window_on_disturbed_trials():
    # disturbed first window (spread > SPREAD_LIMIT) triggers extension
    # and the clean extension trial wins
    seq = iter([10.0, 3.0, 9.0, 1.0])
    calls = []

    def thunk():
        v = next(seq, 1.0)
        calls.append(v)
        return v

    val = bench.best(thunk, trials=3, warmups=0)
    assert val == 1.0
    assert len(calls) > 3  # extended beyond the base window


def test_best_no_extension_when_quiet():
    seq = iter([1.0, 1.1, 1.05])
    val = bench.best(lambda: next(seq), trials=3, warmups=0)
    assert val == 1.0


def test_best_stops_extending_once_clean_trials_dominate():
    # One contaminated outlier in the window must not pin the spread
    # condition true forever: after `trials` clean extension trials the
    # k-smallest window is clean and extension stops (r3 advice — the
    # old max-over-all-vals check always burned all EXTRA_TRIALS).
    seq = iter([100.0, 1.0, 1.1, 1.0, 1.05, 1.02])
    calls = []

    def thunk():
        v = next(seq, 1.0)
        calls.append(v)
        return v

    val = bench.best(thunk, trials=3, warmups=0)
    assert val == 1.0
    # 3 base + enough extensions for 3 clean trials; NOT the full
    # 3 + EXTRA_TRIALS(4) = 7 the old check always reached
    assert len(calls) == 4, calls


def test_best_sub_resolution_zero_is_not_disturbed():
    # A raw 0.0 from a sub-µs thunk used to read as infinite spread and
    # force guaranteed extension; timings within timer resolution of
    # each other are clean.
    seq = iter([0.0, 2e-5, 5e-5])
    calls = []

    def thunk():
        v = next(seq, 1e-5)
        calls.append(v)
        return v

    bench.best(thunk, trials=3, warmups=0)
    assert len(calls) == 3, calls


def test_measured_remeasures_against_history_and_flags():
    out: dict = {}
    bench.HISTORY["x"] = 1.0
    # all trials contended at 10x history: re-measure happens, value
    # stays high -> recorded as measured AND flagged
    bench.measured(out, "x", lambda: 10.0, trials=2, warmups=0)
    assert out["x"] == 10.0  # never substitutes the historical number
    assert "x" in bench.SUSPECTS
    assert bench.HISTORY["x"] == 1.0  # best-ever retained


def test_measured_accepts_recovered_value():
    out: dict = {}
    bench.HISTORY["y"] = 1.0
    seq = iter([10.0, 10.0, 1.2, 1.2])  # first window contended, re-run clean

    def thunk():
        return next(seq, 1.2)

    bench.measured(out, "y", thunk, trials=2, warmups=0)
    assert out["y"] == 1.2
    assert "y" not in bench.SUSPECTS


def test_history_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "HISTORY_PATH", str(tmp_path / "h.json"))
    monkeypatch.setattr(bench, "SEED_HISTORY_PATH", str(tmp_path / "seed.json"))
    bench.HISTORY.update({"a": 0.5})
    bench._save_history()
    bench.HISTORY.clear()
    bench._load_history()
    assert bench.HISTORY == {"a": 0.5}


def test_seed_history_loads_and_local_best_wins(tmp_path, monkeypatch):
    import json

    monkeypatch.setattr(bench, "HISTORY_PATH", str(tmp_path / "h.json"))
    monkeypatch.setattr(bench, "SEED_HISTORY_PATH", str(tmp_path / "seed.json"))
    (tmp_path / "seed.json").write_text(json.dumps({"x": 1.0, "y": 2.0}))
    (tmp_path / "h.json").write_text(json.dumps({"y": 0.5}))
    bench.HISTORY.clear()
    bench._load_history()
    assert bench.HISTORY == {"x": 1.0, "y": 0.5}  # min of seed and local


def _compact_line(results: dict, suspects: list | None = None) -> tuple[dict, str]:
    """Mirror of main()'s compact-line construction (kept in sync by
    test_compact_line_* below failing if the constants drift)."""
    import json

    suspects = suspects or []
    compact = {
        "metric": "headline_queries_plus_io_median_total",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "sf": 0.1,
        "suspects_n": len(suspects),
        "contention_suspects": sorted(suspects)[: bench.SUSPECTS_COMPACT_MAX],
        "drift_vs_floor": 123.456,  # worst-case width
        "host": {"py": 123.456, "py_sat": 123.456, "mm": 123.456, "io": 123.456},
    }
    keep = [k for k in results if k in bench.HEADLINE or k in bench.COMPACT_IO_KEYS]
    spill = sorted(
        (k for k in keep if k not in bench.HEADLINE),
        key=bench.COMPACT_IO_KEYS.index,
    )
    spill_base = [k for k in spill if k not in bench.COMPACT_IO_DIAG_KEYS]
    spill_diag = [k for k in spill if k in bench.COMPACT_IO_DIAG_KEYS]
    compact["queries"] = {k: round(results[k], 4) for k in keep}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > bench.TAIL_BUDGET:
        compact["queries"] = {k: bench._sig4(v) for k, v in compact["queries"].items()}
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > bench.TAIL_BUDGET and spill_diag:
        compact["queries"].pop(spill_diag.pop())
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > bench.TAIL_BUDGET and compact["contention_suspects"]:
        compact["contention_suspects"].pop()
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > bench.TAIL_BUDGET and spill_base:
        compact["queries"].pop(spill_base.pop())
        line = json.dumps(compact, separators=(",", ":"))
    return compact, line


def test_compact_line_fits_driver_tail_capture():
    # worst case: every headline + compact-io key present with an
    # 8-char value — the printed line must stay under the ~2000-byte
    # window the driver records (BENCH_r01..r03 all overflowed it)
    results = {k: 123.4567 for k in bench.HEADLINE + bench.COMPACT_IO_KEYS}
    results.update({f"io_extra_{i}": 0.123456 for i in range(40)})  # full-detail-only keys
    compact, line = _compact_line(results)
    assert len(line) <= bench.TAIL_BUDGET
    # headline queries survive any trimming
    assert all(k in compact["queries"] for k in bench.HEADLINE)


def test_compact_line_spill_priority_under_long_suspect_list():
    """A long contention_suspects list must trim suspect NAMES, never a
    BASELINE comparable — the r12 driver run's 35-name list evicted all
    28 io/BASELINE keys from the driver-visible JSON (VERDICT r12 #2).
    Worst case here: 40 max-width suspect names + every headline and io
    key at max width. Every BASELINE comparable must survive and the
    true suspect count must stay in the line."""
    results = {k: 123.4567 for k in bench.HEADLINE + bench.COMPACT_IO_KEYS}
    suspects = [f"events_power_user_concentration_{i:02d}" for i in range(40)]
    compact, line = _compact_line(results, suspects)
    assert len(line) <= bench.TAIL_BUDGET
    baseline_keys = [
        k for k in bench.COMPACT_IO_KEYS if k not in bench.COMPACT_IO_DIAG_KEYS
    ]
    missing = [k for k in baseline_keys if k not in compact["queries"]]
    assert not missing, f"BASELINE comparables evicted: {missing}"
    # the count survives any trimming; the name list is capped
    assert compact["suspects_n"] == 40
    assert len(compact["contention_suspects"]) <= bench.SUSPECTS_COMPACT_MAX
    # diagnostics (layout/join) are the sacrificial rows
    dropped = [k for k in bench.COMPACT_IO_KEYS if k not in compact["queries"]]
    assert all(k in bench.COMPACT_IO_DIAG_KEYS for k in dropped)


def test_compact_line_clean_day_keeps_suspect_names_and_io_grid():
    """On a clean day (few suspects) the line keeps the named suspects
    AND every BASELINE comparable — trimming only ever reaches the
    layout/join diagnostics."""
    # realistic clean-day widths: headline rows ~1 s, io rows sub-1 s
    # (BENCH_r11's real line: 1889 B with 28 io keys and 0 suspects)
    results = {k: 1.2345 for k in bench.HEADLINE}
    results.update({k: 0.1234 for k in bench.COMPACT_IO_KEYS})
    suspects = ["unigram_logprob_score", "stream_stream_join"]
    compact, line = _compact_line(results, suspects)
    assert len(line) <= bench.TAIL_BUDGET
    assert compact["contention_suspects"] == sorted(suspects)
    baseline_keys = [
        k for k in bench.COMPACT_IO_KEYS if k not in bench.COMPACT_IO_DIAG_KEYS
    ]
    assert all(k in compact["queries"] for k in baseline_keys)


def test_drift_ratio_collection():
    """measured() records fresh/floor ratios for floored entries (and
    skips sub-20ms floors where timer noise dominates) — the feed for
    the drift_vs_floor artifact field that makes a uniform sub-3x
    host-warmth tax (the r5 drift cluster) visible."""
    bench.HISTORY.clear()
    bench.DRIFT_RATIOS.clear()
    out = {}
    bench.measured(out, "a", lambda: 1.2, trials=1, warmups=0, stat=bench.med)
    assert bench.DRIFT_RATIOS == []  # no floor yet
    bench.HISTORY["b"] = 1.0
    bench.measured(out, "b", lambda: 1.2, trials=1, warmups=0, stat=bench.med)
    bench.HISTORY["c"] = 0.01  # below DRIFT_MIN_FLOOR
    bench.measured(out, "c", lambda: 0.012, trials=1, warmups=0, stat=bench.med)
    assert len(bench.DRIFT_RATIOS) == 1
    assert abs(bench.DRIFT_RATIOS[0] - 1.2) < 1e-9
    bench.HISTORY.clear()
    bench.DRIFT_RATIOS.clear()


def test_saturated_loop_median_runs_bare_subprocesses():
    """py_sat's worker is a bare `python -c` loop (no heavy imports, no
    fork-with-threads hazards) returning a plausible per-process time;
    width=2 keeps the unit test cheap."""
    v = bench._saturated_loop_median(2)
    assert 0.05 < v < 30.0


def test_saturated_loop_survives_dead_probes(monkeypatch):
    """A probe subprocess dying (OOM/signal under the very pressure it
    measures) or printing garbage must not abort the run with
    ValueError — at the host_end call site that would lose a COMPLETED
    bench run (ADVICE r10). All-dead probes degrade to NaN."""
    import math

    monkeypatch.setattr(
        bench, "_SAT_LOOP_CODE", "import sys; sys.exit(3)"
    )
    assert math.isnan(bench._saturated_loop_median(2))
    monkeypatch.setattr(bench, "_SAT_LOOP_CODE", "print('not-a-float')")
    assert math.isnan(bench._saturated_loop_median(2))


def test_warm_circuit_orders_one_untimed_pass_first(monkeypatch):
    """VERDICT r10 #3: with the circuit ON (default), bench_queries
    executes EVERY query once before any trial (suite-warm JVM), then
    trials with warmups=0 — same 4 executions per key as the old
    per-key-warmup ordering, which ENGINE_BENCH_WARM_CIRCUIT=0
    restores."""
    seq: list[str] = []
    monkeypatch.setattr(bench, "HEADLINE", ["a", "b"])
    monkeypatch.setattr(bench, "FULL_ONLY_QUERIES", [])
    monkeypatch.setattr(bench, "all_queries", lambda: {"a": "fa", "b": "fb"})
    monkeypatch.setattr(bench, "release_persists", lambda: None)
    monkeypatch.setattr(
        bench, "_run_query_once", lambda fn, spark, sf: (seq.append(fn), 0.1)[1]
    )
    # swap in fresh containers so a mid-test assertion failure can't
    # leak fake 'a'/'b' history into later bench tests (ADVICE r11) —
    # monkeypatch restores the real objects even on failure
    monkeypatch.setattr(bench, "HISTORY", {})
    monkeypatch.setattr(bench, "DRIFT_RATIOS", {})

    monkeypatch.delenv("ENGINE_BENCH_WARM_CIRCUIT", raising=False)
    out = bench.bench_queries(None, "/x/sf0.1")
    assert set(out) == {"a", "b"}
    # one full untimed pass, THEN 3 trials per key
    assert seq == ["fa", "fb", "fa", "fa", "fa", "fb", "fb", "fb"]

    seq.clear()
    bench.HISTORY.clear()
    monkeypatch.setenv("ENGINE_BENCH_WARM_CIRCUIT", "0")
    bench.bench_queries(None, "/x/sf0.1")
    # old ordering: per-key warmup immediately before that key's trials
    assert seq == ["fa", "fa", "fa", "fa", "fb", "fb", "fb", "fb"]


def test_py_sat_max_skips_dead_batches():
    """ADVICE r11: a probe batch whose subprocesses all died yields
    NaN; max() must skip it (NaN would serialize as non-JSON `NaN` in
    the compact line). All-dead degrades to None (json null), never
    NaN."""
    nan = float("nan")
    assert bench._max_ignoring_nan([nan, 0.5]) == 0.5
    assert bench._max_ignoring_nan([0.4, nan]) == 0.4
    assert bench._max_ignoring_nan([0.4, 0.62]) == 0.62
    assert bench._max_ignoring_nan([nan, nan]) is None
    import json

    assert json.dumps(bench._max_ignoring_nan([nan, nan])) == "null"


def test_measured_records_timeline_offsets():
    """With RUN_T0 armed, measured() stamps each entry's finish offset
    into bench.AT (full-artifact timeline; the r10 mid-run host-shift
    evidence channel). With RUN_T0 unset (unit tests, partial runs) it
    stays silent."""
    bench.HISTORY.clear()
    bench.AT.clear()
    out = {}
    bench.measured(out, "x", lambda: 0.5, trials=1, warmups=0, stat=bench.med)
    assert "x" not in bench.AT  # RUN_T0 unset
    bench.RUN_T0 = __import__("time").perf_counter() - 7.0
    try:
        bench.measured(out, "y", lambda: 0.5, trials=1, warmups=0, stat=bench.med)
        assert 6.5 <= bench.AT["y"] <= 8.0
    finally:
        bench.RUN_T0 = None
        bench.AT.clear()
        bench.HISTORY.clear()


def test_sf_history_suffix_isolates_non_default_sf():
    assert bench._sf_hist_suffix("/root/testdata/sf0.1") == ""
    assert bench._sf_hist_suffix("/root/testdata/sf0.1/") == ""
    assert bench._sf_hist_suffix("/root/testdata/sf0.01") == "@sf0.01"


def test_measured_hkey_separates_histories():
    bench.HISTORY.clear()
    out = {}
    vals = iter([1.0, 10.0, 10.0])  # sf0.1 floor, then two sf0.01 trials
    bench.measured(out, "q", lambda: next(vals), trials=1, warmups=0, stat=bench.med)
    bench.measured(out, "q", lambda: next(vals), trials=1, warmups=0, stat=bench.med,
                   hkey="q@sf0.01")
    # the 10x-slower sf0.01 run is NOT suspect (different floor) and
    # does not overwrite the sf0.1 best-ever
    assert bench.SUSPECTS == []
    assert bench.HISTORY["q"] == 1.0 and bench.HISTORY["q@sf0.01"] == 10.0
