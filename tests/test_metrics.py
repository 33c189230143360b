"""Observability subsystem (utils/metrics.py): phases, counters, emission."""

import json

from noir_backend_using_gnark_tpu.utils import metrics


def setup_function(_):
    metrics.reset()
    metrics.enable(False)


def teardown_function(_):
    metrics.enable(False)
    metrics.reset()


def test_nested_phases_accumulate():
    with metrics.phase("prove"):
        with metrics.phase("round1"):
            pass
        with metrics.phase("round1"):
            pass
        with metrics.phase("round2"):
            pass
    snap = metrics.snapshot()
    assert "prove" in snap["phases"]
    children = snap["phases"]["prove"]["children"]
    assert children["round1"]["calls"] == 2
    assert children["round2"]["calls"] == 1
    assert snap["phases"]["prove"]["ms"] >= 0


def test_counters():
    metrics.count("constraints", 5)
    metrics.count("constraints", 3)
    metrics.count("msm.points", 1 << 10)
    snap = metrics.snapshot()
    assert snap["counters"]["constraints"] == 8
    assert snap["counters"]["msm.points"] == 1 << 10


def test_emission_is_one_json_line(capsys):
    metrics.enable(True)
    with metrics.phase("top"):
        with metrics.phase("inner"):
            metrics.count("things", 2)
    err = capsys.readouterr().err.strip().splitlines()
    assert len(err) == 1
    line = json.loads(err[0])
    assert line["event"] == "phase"
    assert line["name"] == "top"
    assert line["children"]["inner"]["calls"] == 1
    assert line["counters"]["things"] == 2


def test_no_emission_when_disabled(capsys):
    with metrics.phase("quiet"):
        pass
    assert capsys.readouterr().err.strip() == ""


def test_emission_is_per_call_not_cumulative(capsys):
    """Second top-level invocation must report ITS OWN ms/calls and
    counter deltas, not process-lifetime totals (ADVICE round 1)."""
    metrics.enable(True)
    for _ in range(2):
        with metrics.phase("prove"):
            with metrics.phase("inner"):
                metrics.count("points", 10)
    lines = [json.loads(l) for l in capsys.readouterr().err.strip().splitlines()]
    assert len(lines) == 2
    for line in lines:
        assert line["calls"] == 1
        assert line["children"]["inner"]["calls"] == 1
        assert line["counters"]["points"] == 10  # delta, not 20
    # the cumulative snapshot still aggregates
    snap = metrics.snapshot()
    assert snap["phases"]["prove"]["calls"] == 2
    assert snap["counters"]["points"] == 20


def test_gauge_is_last_value():
    metrics.gauge("prove.domain_n", 1024)
    metrics.gauge("prove.domain_n", 1024)
    assert metrics.snapshot()["gauges"]["prove.domain_n"] == 1024


def test_profiler_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("NOIRTPU_PROFILE", raising=False)
    with metrics.profiler_trace("prove"):
        x = 1
    assert x == 1


def test_prover_phases_recorded_end_to_end():
    # The instrumented prove() path is exercised by test_plonk /
    # test_programs; here just check the api-level phase names exist as
    # constants the instrumentation uses (cheap smoke, no jit).
    import inspect

    from noir_backend_using_gnark_tpu.plonk import prove as pr

    src = inspect.getsource(pr)
    for name in (
        "plonk.prove",
        "round1.wires",
        "round2.grand_product",
        "round3.quotient",
        "round4.evals",
        "round5.open",
    ):
        assert f'"{name}"' in src
