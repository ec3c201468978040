"""bench.py payload resilience (r10 VERDICT item 4): a transient Spark
failure inside the auto-vs-scalable cooldown rerun or the warm
re-measure must degrade THAT ROW, never abort the bench payload the
driver gate reads. No Spark session needed — `_score_auto_rows` takes
injectable rerun/warm callables."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def _battery(bench, auto_skewed: float = 10.0) -> dict:
    """A synthetic measured battery where every auto row breaches the
    vs-scalable band (forcing the rerun path) and every twin is clean."""
    out = {}
    for auto, twin in bench._AUTO_TWINS.items():
        out[auto] = {"benign": 1.0, "skewed": auto_skewed, "ratio": auto_skewed}
        out[twin] = {"benign": 1.0, "skewed": 1.0, "ratio": 1.0}
    return out


def test_failing_rerun_keeps_first_measurement(bench):
    """The rerun raising must keep the first measurement and still score
    the row — the r10 gate-risk window."""
    out = _battery(bench)

    def rerun_boom(name):
        raise RuntimeError("executor lost")

    def warm_ok(name):
        return 2.0

    scored = bench._score_auto_rows(out, rerun_boom, warm_ok, cooldown=0)
    for auto, twin in bench._AUTO_TWINS.items():
        row = scored[auto]
        # first measurement survives un-nested (no rerun landed)
        assert row["skewed"] == 10.0
        assert "first" not in row
        assert row["ratio_vs_scalable"] == 10.0
        assert row["skewed_warm"] == 2.0
        assert row["ratio_vs_scalable_warm"] == 2.0


def test_failing_warm_degrades_to_cold_numbers(bench):
    """warm_fn raising must fall back to the cold probe-overhead fields,
    not drop the row or raise."""
    out = _battery(bench)

    def rerun_ok(name):
        return {"benign": 1.0, "skewed": 3.0, "ratio": 3.0}

    def warm_boom(name):
        raise RuntimeError("noop sink died")

    scored = bench._score_auto_rows(out, rerun_ok, warm_boom, cooldown=0)
    for auto in bench._AUTO_TWINS:
        row = scored[auto]
        assert row["first"]["skewed"] == 10.0  # rerun nested the first
        assert row["skewed"] == 3.0
        assert row["ratio_vs_scalable"] == 3.0
        assert "skewed_warm" not in row
        assert row["probe_overhead_sec"] == row["probe_overhead_sec_cold"]
        assert row["probe_overhead_pct"] == row["probe_overhead_pct_cold"]


def test_everything_failing_still_returns_payload(bench):
    """Both callables raising on every row: the payload still returns
    with every row scored from its first measurement."""
    out = _battery(bench)

    def boom(name):
        raise RuntimeError("cluster gone")

    scored = bench._score_auto_rows(out, boom, boom, cooldown=0)
    assert set(scored) == set(out)
    for auto in bench._AUTO_TWINS:
        assert scored[auto]["ratio_vs_scalable"] == 10.0
        assert scored[auto]["probe_overhead_pct"] == scored[auto][
            "probe_overhead_pct_cold"
        ]


def test_clean_battery_skips_rerun(bench):
    """Rows inside the band must not trigger the cooldown rerun at all."""
    out = _battery(bench, auto_skewed=1.5)
    calls = []

    def rerun_spy(name):
        calls.append(name)
        return {"benign": 1.0, "skewed": 1.0, "ratio": 1.0}

    scored = bench._score_auto_rows(out, rerun_spy, lambda n: 1.2, cooldown=0)
    assert calls == []
    for auto in bench._AUTO_TWINS:
        assert scored[auto]["ratio_vs_scalable"] == 1.5
        assert scored[auto]["skewed_warm"] == 1.2


def test_error_rows_are_skipped_without_crash(bench):
    """A case whose measurement errored (``{"error": ...}``) or whose
    twin is missing must be skipped, not crash the scoring."""
    out = {}
    autos = list(bench._AUTO_TWINS.items())
    (a0, t0), rest = autos[0], autos[1:]
    out[a0] = {"error": "boom"}
    out[t0] = {"benign": 1.0, "skewed": 1.0, "ratio": 1.0}
    scored = bench._score_auto_rows(
        out, lambda n: {}, lambda n: 1.0, cooldown=0
    )
    assert "ratio_vs_scalable" not in scored[a0]


def test_warm_tuple_records_noise_floor(bench):
    """warm_fn returning (median, half-spread) must record the spread
    and flag an overhead under the combined noise floor as
    statistically zero."""
    out = _battery(bench, auto_skewed=1.5)
    for auto, twin in bench._AUTO_TWINS.items():
        out[auto]["skewed_spread"] = 0.2
        out[twin]["skewed_spread"] = 0.1
    scored = bench._score_auto_rows(
        out, lambda n: {}, lambda n: (1.1, 0.3), cooldown=0
    )
    for auto in bench._AUTO_TWINS:
        row = scored[auto]
        assert row["skewed_warm"] == 1.1
        assert row["skewed_warm_spread"] == 0.3
        # cold overhead 0.5 > 0.3 combined cold floor -> NOT within noise
        assert row["cold_overhead_within_noise"] is False
        # warm overhead 0.1 <= 0.3 + 0.1 -> within noise
        assert row["warm_overhead_within_noise"] is True


def test_float_warm_still_supported(bench):
    """Plain-float warm_fn keeps the legacy fields and adds no
    spread/noise keys."""
    out = _battery(bench, auto_skewed=1.5)
    scored = bench._score_auto_rows(
        out, lambda n: {}, lambda n: 1.2, cooldown=0
    )
    for auto in bench._AUTO_TWINS:
        row = scored[auto]
        assert row["skewed_warm"] == 1.2
        assert "skewed_warm_spread" not in row
        assert "warm_overhead_within_noise" not in row
        assert "cold_overhead_within_noise" not in row
