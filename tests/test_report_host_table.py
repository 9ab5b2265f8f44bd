"""Pin the cross-round host-normalization table (VERDICT r10 #6): it
must parse every committed BENCH_rN.json, emit one row per round, and
ratio host indexes only for rounds that carry a host block."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts_dev"))
sys.path.insert(0, str(REPO))


def _lines():
    import make_report

    return make_report.host_normalization_lines()


def test_one_row_per_committed_artifact(monkeypatch):
    monkeypatch.chdir(REPO)
    lines = _lines()
    rows = [ln for ln in lines if re.match(r"\| r\d+ \|", ln)]
    # canonical per-round artifacts only — companion runs at other core
    # counts (e.g. BENCH_r12_c8.json, the driver's 8-CPU leg) are reads
    # for the verdict, not rows in the 32-core host-normalization table
    arts = [
        p for p in REPO.glob("BENCH_r*.json") if re.search(r"_r\d+\.json$", p.name)
    ]
    assert len(rows) == len(arts)
    # rounds ascend
    nums = [int(re.match(r"\| r(\d+) ", ln).group(1)) for ln in rows]
    assert nums == sorted(nums)


def test_host_index_normalized_to_newest_host_round(monkeypatch):
    monkeypatch.chdir(REPO)
    rows = [ln for ln in _lines() if re.match(r"\| r\d+ \|", ln)]
    # the newest round with a host block must have host idx exactly 1;
    # rounds without a host block must show — in the host columns
    with_host = [ln for ln in rows if not ln.rstrip("| ").endswith("—")]
    assert with_host, "at least r10 carries a host block"
    last_cells = [c.strip() for c in with_host[-1].split("|")]
    assert last_cells[-2] == "1"
    no_host = [ln for ln in rows if ln.rstrip("| ").endswith("—")]
    for ln in no_host:
        cells = [c.strip() for c in ln.split("|")]
        assert cells[4] == cells[5] == "—"  # py / sat absent together


def test_splice_is_idempotent(monkeypatch, tmp_path):
    monkeypatch.chdir(REPO)
    import make_report

    text = (REPO / "REPORT.md").read_text()
    assert text.count(make_report.HOST_SECTION_BEGIN) == 1
    assert text.count(make_report.HOST_SECTION_END) == 1
    # splicing into a copy must not duplicate the section
    begin = text.index(make_report.HOST_SECTION_BEGIN)
    end = text.index(make_report.HOST_SECTION_END) + len(
        make_report.HOST_SECTION_END
    )
    spliced = (
        text[:begin] + "\n".join(make_report.host_normalization_lines()) + text[end:]
    )
    assert spliced.count(make_report.HOST_SECTION_BEGIN) == 1
