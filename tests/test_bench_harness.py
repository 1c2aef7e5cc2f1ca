"""Deadline discipline of the scaling harness (VERDICT r4 item 1).

The round-4 incident: a 16M-doc ``bench.py --scaling`` run outlived the
round and contaminated the driver's bench window.  The harness now owns a
wall-clock deadline — workers that would cross it are killed, completed
pairs are published as partial evidence, and a new pair starts only when
its budgeted time fits.  These tests pin that logic at the unit level with
stubbed workers (no Spark, no subprocesses), so a regression shows up in
seconds rather than in the next contaminated bench.
"""

from __future__ import annotations

import json

import pytest

import bench


def _fake_worker_factory(secs_by_cores, clock):
    """A stub for bench._run_worker: advances the fake clock and returns a
    plausible stats dict (docs_per_sec scaled so lo->hi speedup is 3.2x)."""

    def fake(n_cores, timeout_sec):
        if timeout_sec <= secs_by_cores[n_cores]:
            raise TimeoutError(
                f"scaling worker local[{n_cores}] exceeded {timeout_sec:.0f}s; killed"
            )
        clock["t"] += secs_by_cores[n_cores]
        return {
            "cores": n_cores,
            "sec": secs_by_cores[n_cores],
            "n_docs": 1000,
            "n_triples": 500,
            "docs_per_sec": 1000.0 / secs_by_cores[n_cores],
            "triples_per_sec": 500.0 / secs_by_cores[n_cores],
        }

    return fake


@pytest.fixture()
def harness(monkeypatch, capsys):
    """Patch the clock, the worker, calibration, and the BENCH.md writer;
    return a runner that executes bench.scaling() and parses its report."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(bench, "_hw_calibration", lambda lo, hi: {"stub": True})
    written = {}
    monkeypatch.setattr(bench, "_write_bench_md", lambda r: written.update(r))

    def run(secs_by_cores, deadline, pairs=3):
        monkeypatch.setenv("SPARK_KG_SCALE_DEADLINE_SEC", str(deadline))
        monkeypatch.setenv("SPARK_KG_SCALE_PAIRS", str(pairs))
        monkeypatch.setattr(
            bench, "_run_worker", _fake_worker_factory(secs_by_cores, clock)
        )
        bench.scaling("/unused")
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert written, "scaling() must publish BENCH.md"
        return report

    return run


def test_all_pairs_complete_full_publish(harness):
    r = harness({2: 100.0, 8: 31.25}, deadline=10_000, pairs=3)
    assert r["pairs_completed"] == 3
    assert r["partial"] is False
    assert r["speedup"] == 3.2
    assert r["scaling_efficiency"] == 0.8
    assert len(r["pair_speedups"]) == 3


def test_budget_guard_stops_before_overrunning_pair(harness):
    # pair costs 131.25s; deadline 200s: pair 1 completes, then
    # remaining (68.75) < 2.2 * slowest (288) -> stop, publish 1 pair.
    r = harness({2: 100.0, 8: 31.25}, deadline=200, pairs=3)
    assert r["pairs_completed"] == 1
    assert r["partial"] is True
    assert r["scaling_efficiency"] == 0.8


def test_worker_past_deadline_is_killed_and_partials_published(harness):
    # lo of pair 1 eats 90% of the deadline: pair 1 still completes (the
    # budget guard has no slowest-pair estimate yet), then pair 2's lo
    # worker gets a timeout below its need and dies -> partial publish.
    #
    # deadline=450: pair1 = 400+31.25 -> remaining 18.75 < worker need
    r = harness({2: 400.0, 8: 31.25}, deadline=450, pairs=3)
    assert r["pairs_completed"] == 1
    assert r["partial"] is True


def test_no_completed_pair_raises_instead_of_publishing(harness):
    with pytest.raises(SystemExit):
        harness({2: 500.0, 8: 100.0}, deadline=300, pairs=3)


def test_median_pair_is_reported(monkeypatch, capsys):
    """With per-pair noise, the published speedup is the median pair's."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(bench, "_hw_calibration", lambda lo, hi: {})
    monkeypatch.setattr(bench, "_write_bench_md", lambda r: None)
    monkeypatch.setenv("SPARK_KG_SCALE_DEADLINE_SEC", "100000")
    monkeypatch.setenv("SPARK_KG_SCALE_PAIRS", "3")
    # speedups per pair: 2.0, 4.0, 3.0 -> median 3.0
    lo_times = iter([100.0, 100.0, 100.0])
    hi_times = iter([50.0, 25.0, 100.0 / 3])

    def fake(n_cores, timeout_sec):
        t = next(lo_times) if n_cores == 2 else next(hi_times)
        clock["t"] += t
        return {
            "cores": n_cores, "sec": t, "n_docs": 1000, "n_triples": 1,
            "docs_per_sec": 1000.0 / t, "triples_per_sec": 1.0 / t,
        }

    monkeypatch.setattr(bench, "_run_worker", fake)
    bench.scaling("/unused")
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["pair_speedups"] == [2.0, 4.0, 3.0]
    assert r["speedup"] == 3.0
    assert r["partial"] is False


def test_partition_layout_scales_with_corpus():
    """Round-5 regression: a fixed cores*2 layout put 4M docs in one
    partition at 16M docs and halved the per-doc rate.  The layout must
    scale with data and be identical at both parallelism levels."""
    assert bench._scale_partitions(2, 8_000_000) == 16
    assert bench._scale_partitions(2, 16_000_000) == 32
    assert bench._scale_partitions(8, 16_000_000) == 32
    assert bench._scale_partitions(8, 100_000) == 16  # cores*2 floor
    # identical layout at both levels whenever data (not the floor) decides
    for n in (8_000_000, 16_000_000):
        assert bench._scale_partitions(2, n) == bench._scale_partitions(8, n)


def test_diag_runs_do_not_overwrite_bench_md(monkeypatch, capsys):
    """SPARK_KG_SCALE_DIAG=1 marks a diagnostic (non-production config)
    run: it must publish its JSON but never rewrite the published BENCH.md."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(bench, "_hw_calibration", lambda lo, hi: {})
    written = {}
    monkeypatch.setattr(bench, "_write_bench_md", lambda r: written.update(r))
    monkeypatch.setenv("SPARK_KG_SCALE_DEADLINE_SEC", "100000")
    monkeypatch.setenv("SPARK_KG_SCALE_PAIRS", "1")
    monkeypatch.setenv("SPARK_KG_SCALE_DIAG", "1")
    monkeypatch.setattr(
        bench, "_run_worker", _fake_worker_factory({2: 100.0, 8: 31.25}, clock)
    )
    bench.scaling("/unused")
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["scaling_efficiency"] == 0.8
    assert written == {}
