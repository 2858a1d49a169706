"""Tests for bench.py's always-land-a-headline machinery (VERDICT r4 #1).

Round 4's driver bench run timed out with nothing parsed (BENCH_r04:
rc=124, parsed=null); bench.py now guarantees a parseable headline line
inside any driver window via three layers (headline-first measurement,
wall-clock Budgeter, watchdog stale-emit). These tests pin the pure
logic of those layers plus the subsampled SNR oracles, all off-chip —
the reference's bench workflow always lands a JSON record
(kofft-bench/benches/bench_fft.rs:69-103), and this is the analogous
regression guard.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

import bench


@pytest.fixture(autouse=True)
def _reset_headline_state():
    with bench._HEADLINE_LOCK:
        saved = dict(bench._HEADLINE)
        bench._HEADLINE.update({"json": None, "printed": False})
    yield
    with bench._HEADLINE_LOCK:
        bench._HEADLINE.update(saved)


def test_headline_doc_schema_and_baseline_math():
    doc = bench._headline_doc(7.5e9)
    assert doc["metric"] == "c32_fft_2^20_points_per_sec_per_chip"
    assert doc["unit"] == "points/s"
    # vs_baseline is against the reference's measured 59.265 ms/op at
    # 2^20 (BASELINE.md:72)
    expected = 7.5e9 / ((1 << 20) / 59.265e-3)
    assert doc["vs_baseline"] == pytest.approx(expected, rel=1e-3)
    tagged = bench._headline_doc(1.0e9, {"stale_from": "t0"})
    assert tagged["stale_from"] == "t0"


def test_budgeter_soft_gate(monkeypatch):
    b = bench.Budgeter(100.0)  # soft gate at 80 s
    monkeypatch.setattr(bench, "elapsed", lambda: 10.0)
    assert b.ok("early_section")
    assert b.skipped == []
    monkeypatch.setattr(bench, "elapsed", lambda: 81.0)
    assert not b.ok("late_section")
    assert not b.ok("later_section")
    assert b.skipped == ["late_section", "later_section"]


def test_emit_headline_prints_parseable_json(capsys):
    with bench._HEADLINE_LOCK:
        bench._HEADLINE["json"] = bench._headline_doc(2.0e9)
    bench._emit_headline()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["value"] == pytest.approx(2.0e9)
    with bench._HEADLINE_LOCK:
        assert bench._HEADLINE["printed"]


def test_stale_headline_from_history(tmp_path, monkeypatch, capsys):
    # layer 3: with no fresh measurement, the watchdog emits the last
    # recorded 2^20 headline from benchmarks/latest.json tagged stale
    t_op_ns = 150e3  # 150 us/op
    hist = {
        "environment": {"timestamp": "2026-08-19T00:00:00"},
        "records": [{
            "library": "kofft_tpu", "transform": "complex",
            "size": 1 << 20, "mode": "single",
            "time_per_op_ns": t_op_ns,
        }],
    }
    (tmp_path / "benchmarks").mkdir()
    (tmp_path / "benchmarks" / "latest.json").write_text(json.dumps(hist))
    monkeypatch.chdir(tmp_path)
    doc = bench._stale_headline()
    assert doc is not None
    assert doc["stale_from"] == "2026-08-19T00:00:00"
    assert doc["value"] == pytest.approx((1 << 20) / (t_op_ns * 1e-9),
                                         rel=1e-3)
    bench._emit_headline()  # no fresh headline set -> falls back to stale
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["stale_from"] == "2026-08-19T00:00:00"


def test_stale_headline_missing_history(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)  # no benchmarks/ here
    assert bench._stale_headline() is None
    bench._emit_headline()       # must not raise, prints nothing
    assert capsys.readouterr().out == ""
    with bench._HEADLINE_LOCK:
        assert not bench._HEADLINE["printed"]


def _snr_full(x, y):
    err = np.abs(y - x) ** 2
    return 10.0 * np.log10(np.sum(np.abs(x) ** 2) / np.sum(err))


def test_snr_rows_2d_subsampled_oracle_matches_full():
    # the subsampled exact-row oracle (used where the full f64 fftn of a
    # 4096^2 image is host-minutes) must agree with the full oracle on a
    # size where the full oracle is cheap
    rng = np.random.default_rng(3)
    n = 64
    xr = rng.standard_normal((n, n)).astype(np.float32)
    xi = rng.standard_normal((n, n)).astype(np.float32)
    full = np.fft.fftn(xr.astype(np.complex128) + 1j * xi)
    # a "measured" output: the exact spectrum plus white f32-scale noise
    noise = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    got = full + 1e-6 * noise * np.sqrt(np.mean(np.abs(full) ** 2))
    s_sub = bench._snr_rows_2d(xr, xi, got.real, got.imag, n_rows=16)
    s_full = _snr_full(full, got)
    assert s_sub == pytest.approx(s_full, abs=3.0)  # dB, subsample jitter


def test_snr_rows_3d_subsampled_oracle_matches_full():
    rng = np.random.default_rng(4)
    n = 16
    xr = rng.standard_normal((n, n, n)).astype(np.float32)
    xi = rng.standard_normal((n, n, n)).astype(np.float32)
    full = np.fft.fftn(xr.astype(np.complex128) + 1j * xi)
    noise = (rng.standard_normal(full.shape)
             + 1j * rng.standard_normal(full.shape))
    got = full + 1e-6 * noise * np.sqrt(np.mean(np.abs(full) ** 2))
    s_sub = bench._snr_rows_3d(xr, xi, got.real, got.imag, n_slabs=8)
    s_full = _snr_full(full, got)
    assert s_sub == pytest.approx(s_full, abs=3.0)


def test_snr_rows_2d_exact_output_is_near_lossless():
    rng = np.random.default_rng(5)
    n = 32
    xr = rng.standard_normal((n, n)).astype(np.float32)
    xi = rng.standard_normal((n, n)).astype(np.float32)
    full = np.fft.fftn(xr.astype(np.complex128) + 1j * xi)
    s = bench._snr_rows_2d(xr, xi, full.real, full.imag, n_rows=8)
    assert s > 200.0  # exact rows -> only the oracle's own rounding
