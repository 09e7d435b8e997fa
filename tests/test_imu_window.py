"""IMU window selection: parity with the reference's linear-scan semantics
(Propagator::select_imu_readings, Propagator.cpp:81-181) and host-side
performance on realistic stream lengths (the searchsorted slicing must make
windowing O(F log N + F*W), not O(F*N))."""

import time

import numpy as np
import pytest

from cuahn_vio.pipeline.imu_window import build_imu_windows, select_imu_readings


def _interp(t0, m0, t1, m1, t):
    lam = (t - t0) / (t1 - t0)
    return (1.0 - lam) * m0 + lam * m1


def _select_linear_scan(imu_t, imu_w, imu_a, time0, time1):
    """The round-1 full-stream linear scan (bit-exact transcription of
    Propagator.cpp:81-181) — ground truth for the sliced fast path."""
    n = imu_t.shape[0]
    ts, ws, as_ = [], [], []
    for i in range(n - 1):
        if imu_t[i + 1] > time0 and imu_t[i] < time0:
            ts.append(time0)
            ws.append(_interp(imu_t[i], imu_w[i], imu_t[i + 1], imu_w[i + 1], time0))
            as_.append(_interp(imu_t[i], imu_a[i], imu_t[i + 1], imu_a[i + 1], time0))
            continue
        if imu_t[i] >= time0 and imu_t[i + 1] <= time1:
            ts.append(imu_t[i])
            ws.append(imu_w[i])
            as_.append(imu_a[i])
            continue
        if imu_t[i + 1] > time1:
            if imu_t[i] > time1 and i == 0:
                break
            elif imu_t[i] > time1:
                ts.append(time1)
                ws.append(_interp(imu_t[i - 1], imu_w[i - 1], imu_t[i], imu_w[i], time1))
                as_.append(_interp(imu_t[i - 1], imu_a[i - 1], imu_t[i], imu_a[i], time1))
            else:
                ts.append(imu_t[i])
                ws.append(imu_w[i])
                as_.append(imu_a[i])
            if ts and ts[-1] != time1:
                ts.append(time1)
                ws.append(_interp(imu_t[i], imu_w[i], imu_t[i + 1], imu_w[i + 1], time1))
                as_.append(_interp(imu_t[i], imu_a[i], imu_t[i + 1], imu_a[i + 1], time1))
            break
    if not ts:
        return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 3))
    t_arr = np.asarray(ts)
    w_arr = np.stack(ws)
    a_arr = np.stack(as_)
    keep = np.ones(t_arr.shape[0], bool)
    for i in range(t_arr.shape[0] - 1):
        if abs(t_arr[i + 1] - t_arr[i]) < 1e-12:
            keep[i + 1] = False
    return t_arr[keep], w_arr[keep], a_arr[keep]


def _random_stream(rng, n=400, hz=200.0):
    t = np.arange(n) / hz + rng.uniform(0, 1e-3, n).cumsum() * 0  # regular
    # jitter some timestamps to exercise irregular cadence
    t = t + rng.uniform(-1e-4, 1e-4, n)
    t.sort()
    w = rng.standard_normal((n, 3))
    a = rng.standard_normal((n, 3))
    return t, w, a


def test_select_matches_linear_scan_random_spans():
    rng = np.random.default_rng(0)
    t, w, a = _random_stream(rng)
    for _ in range(200):
        t0 = rng.uniform(t[0] - 0.1, t[-1] + 0.05)
        t1 = t0 + rng.uniform(1e-3, 0.3)
        ref = _select_linear_scan(t, w, a, t0, t1)
        got = select_imu_readings(t, w, a, t0, t1)
        assert got[0].shape == ref[0].shape, (t0, t1)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_select_matches_linear_scan_edges():
    rng = np.random.default_rng(1)
    t, w, a = _random_stream(rng, n=50, hz=100.0)
    cases = [
        (t[0] - 1.0, t[0] - 0.5),     # entirely before the stream
        (t[-1] + 0.1, t[-1] + 0.2),   # entirely after
        (t[3], t[7]),                 # exact sample boundaries
        (t[3] + 1e-6, t[3] + 2e-6),   # span inside a single interval
        (t[0] - 0.5, t[-1] + 0.5),    # span covering everything
        (t[10], t[10] + (t[11] - t[10]) / 2),  # start exact, end mid
    ]
    for t0, t1 in cases:
        ref = _select_linear_scan(t, w, a, t0, t1)
        got = select_imu_readings(t, w, a, t0, t1)
        assert got[0].shape == ref[0].shape, (t0, t1)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_build_windows_long_stream_is_fast():
    """3-minute 500 Hz stream, 20 Hz frames (VERDICT r1 weak #1: the full
    linear scan took minutes here) — must window in about a second."""
    hz, dur = 500.0, 180.0
    n = int(hz * dur)
    t = np.arange(n) / hz
    rng = np.random.default_rng(2)
    w = rng.standard_normal((n, 3)).astype(np.float64)
    a = rng.standard_normal((n, 3)).astype(np.float64)
    frame_t = np.arange(1.0, dur - 1.0, 1.0 / 20.0)
    start = time.perf_counter()
    win = build_imu_windows(t, w, a, float(frame_t[0]) - 0.05, frame_t,
                            max_steps=32)
    elapsed = time.perf_counter() - start
    assert elapsed < 2.0, f"windowing took {elapsed:.2f}s"
    # every frame fully covered: ~25 intervals of 2 ms each
    assert np.all(win.n_used >= 24)
    np.testing.assert_allclose(win.dt.sum(axis=1), 1.0 / 20.0, rtol=1e-6)
