"""Pure-function tests for bench.py's calibration doc splicing.

The calibration block is measured by `bench.py --calibrate` (pinned
subprocesses — not run here); these tests pin the doc-maintenance
contract: the block is spliced idempotently via markers, lands before
the "Reading the numbers" section on first insert, and survives a
BASELINE.md regeneration by `--scaling` (which re-splices from
BENCH/calibration.json).
"""

import bench

CAL = {
    "n_rows": 400_000_000,
    "hash_rounds": 32,
    "base_cores": 2,
    "big_cores": 8,
    "efficiency": 0.934,
    "cpu_inflation": 1.02,
    "pinned": True,
    "levels": {
        "2": {
            "rows_hashed_per_sec": 8_000_000.0,
            "pass_times_s": [50.0, 49.5],
            "task_time": {"executor_cpu_time_ms": 99_000},
        },
        "8": {
            "rows_hashed_per_sec": 29_888_000.0,
            "pass_times_s": [13.4, 13.5],
            "task_time": {"executor_cpu_time_ms": 101_000},
        },
        "32": {
            "rows_hashed_per_sec": 100_000_000.0,
            "pass_times_s": [4.0],
            "task_time": {"executor_cpu_time_ms": 105_000},
        },
    },
}


def test_calibration_md_renders_all_levels_and_markers():
    block = bench.calibration_md(CAL)
    assert block.startswith(bench.CAL_BEGIN)
    assert block.endswith(bench.CAL_END)
    for c in (2, 8, 32):
        assert f"| local[{c}] |" in block
    assert "0.934" in block
    assert "400,000,000" in block


def test_calibration_md_handles_missing_executor_metrics():
    """When the REST metrics endpoint was unavailable, cpu_inflation is
    None and task_time is empty — the block must render 'n/a', never
    'Nonex' or a fake 0.0 cpu column (ADVICE r4)."""
    cal = dict(
        CAL,
        cpu_inflation=None,
        levels={
            c: dict(lv, task_time={}) for c, lv in CAL["levels"].items()
        },
    )
    block = bench.calibration_md(cal)
    assert "Nonex" not in block
    assert "(cpu-time inflation n/a)" in block
    assert "| n/a |" in block


def test_splice_inserts_before_reading_the_numbers():
    doc = "# BENCH\n\n## 2. Drain\ntable\n\n## Reading the numbers\n\n- x\n"
    block = bench.calibration_md(CAL)
    out = bench.splice_calibration(doc, block)
    assert out.index(bench.CAL_BEGIN) < out.index("## Reading the numbers")
    assert out.count(bench.CAL_BEGIN) == 1


def test_splice_is_idempotent_and_updates_in_place():
    doc = "# BENCH\n\n## Reading the numbers\n\n- x\n"
    once = bench.splice_calibration(doc, bench.calibration_md(CAL))
    cal2 = dict(CAL, efficiency=0.901)
    twice = bench.splice_calibration(once, bench.calibration_md(cal2))
    assert twice.count(bench.CAL_BEGIN) == 1
    assert "0.901" in twice and "0.934" not in twice
    # everything outside the markers is untouched
    assert twice.split(bench.CAL_BEGIN)[0] == once.split(bench.CAL_BEGIN)[0]
    assert twice.split(bench.CAL_END)[-1] == once.split(bench.CAL_END)[-1]


def test_splice_appends_when_no_anchor():
    doc = "# BENCH doc with no anchor\n"
    out = bench.splice_calibration(doc, bench.calibration_md(CAL))
    assert out.startswith(doc.rstrip())
    assert out.rstrip().endswith(bench.CAL_END)
