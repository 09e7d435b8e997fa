"""Host-side IMU selection/windowing: dynamic streams -> static padded arrays.

The reference selects a variable-length list of IMU readings per camera frame
with boundary interpolation (Propagator::select_imu_readings,
Propagator.cpp:81-181, interpolate_data Propagator.h:179-189). Dynamic
shapes don't jit, so this module reproduces that selection ON THE HOST
(numpy, float64 timestamps) and emits fixed-size (frames, max_steps) arrays:
interval midpoints + dt, with dt = 0 padding that the device-side
``propagate_window`` treats as an exact no-op.

The midpoint convention implements imu_avg=true (Propagator.cpp:197-204):
the step consumes 0.5*(m_i + m_{i+1}); bias subtraction commutes.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ImuWindows(NamedTuple):
    w_mid: np.ndarray  # (F, T, 3) float32 midpoint gyro per interval
    a_mid: np.ndarray  # (F, T, 3) float32 midpoint accel
    dt: np.ndarray  # (F, T) float32 interval lengths; 0 = padding
    n_used: np.ndarray  # (F,) int32 number of real intervals per frame


def _interp(t0, m0, t1, m1, t):
    lam = (t - t0) / (t1 - t0)
    return (1.0 - lam) * m0 + lam * m1


def select_imu_readings(
    imu_t: np.ndarray, imu_w: np.ndarray, imu_a: np.ndarray, time0: float, time1: float
):
    """Replicates Propagator::select_imu_readings for one [time0, time1] span.

    Returns (t, w, a) arrays of the selected readings, including linearly
    interpolated boundary samples, or empty arrays if the span can't be
    covered (matching the reference's empty-return warnings).
    """
    # Narrow to the samples that can matter for [time0, time1] first —
    # the reference scans its (pruned, <=10 s) buffer linearly per frame
    # (Propagator.cpp:81-181); at 500 Hz x minutes-long sequences a full
    # scan per frame is O(F*N) on the host. searchsorted gives the same
    # selection from an O(log N) slice: start at the last sample <= time0
    # (the START-straddle partner), end one past the first sample >= time1
    # (the END-straddle partner).
    lo = max(int(np.searchsorted(imu_t, time0, side="right")) - 1, 0)
    hi = min(int(np.searchsorted(imu_t, time1, side="left")) + 2, imu_t.shape[0])
    imu_t = imu_t[lo:hi]
    imu_w = imu_w[lo:hi]
    imu_a = imu_a[lo:hi]

    n = imu_t.shape[0]
    ts, ws, as_ = [], [], []
    for i in range(n - 1):
        # START: split the measurement straddling time0 (Propagator.cpp:102-106)
        if imu_t[i + 1] > time0 and imu_t[i] < time0:
            ts.append(time0)
            ws.append(_interp(imu_t[i], imu_w[i], imu_t[i + 1], imu_w[i + 1], time0))
            as_.append(_interp(imu_t[i], imu_a[i], imu_t[i + 1], imu_a[i + 1], time0))
            continue
        # MIDDLE (Propagator.cpp:111-114)
        if imu_t[i] >= time0 and imu_t[i + 1] <= time1:
            ts.append(imu_t[i])
            ws.append(imu_w[i])
            as_.append(imu_a[i])
            continue
        # END: split the next measurement at time1 (Propagator.cpp:121-144)
        if imu_t[i + 1] > time1:
            if imu_t[i] > time1 and i == 0:
                break
            elif imu_t[i] > time1:
                ts.append(time1)
                ws.append(
                    _interp(imu_t[i - 1], imu_w[i - 1], imu_t[i], imu_w[i], time1)
                )
                as_.append(
                    _interp(imu_t[i - 1], imu_a[i - 1], imu_t[i], imu_a[i], time1)
                )
            else:
                ts.append(imu_t[i])
                ws.append(imu_w[i])
                as_.append(imu_a[i])
            if ts and ts[-1] != time1:
                ts.append(time1)
                ws.append(
                    _interp(imu_t[i], imu_w[i], imu_t[i + 1], imu_w[i + 1], time1)
                )
                as_.append(
                    _interp(imu_t[i], imu_a[i], imu_t[i + 1], imu_a[i + 1], time1)
                )
            break

    if not ts:
        return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 3))

    t_arr = np.asarray(ts)
    w_arr = np.stack(ws)
    a_arr = np.stack(as_)
    # drop zero-dt duplicates (Propagator.cpp:159-167)
    keep = np.ones(t_arr.shape[0], bool)
    for i in range(t_arr.shape[0] - 1):
        if abs(t_arr[i + 1] - t_arr[i]) < 1e-12:
            keep[i + 1] = False
    return t_arr[keep], w_arr[keep], a_arr[keep]


def build_imu_windows(
    imu_t: np.ndarray,
    imu_w: np.ndarray,
    imu_a: np.ndarray,
    t_start: float,
    frame_times: np.ndarray,
    max_steps: int = 32,
) -> ImuWindows:
    """Per-frame padded IMU windows for the whole sequence.

    Args:
        imu_t/imu_w/imu_a: full IMU stream (float64 times).
        t_start: filter start time (initialization time, IMU clock).
        frame_times: (F,) camera frame times ALREADY shifted into the IMU
            clock (t_cam + calib_dt, VioManager.cpp:58-59 via Propagator
            time0/time1 construction).
        max_steps: static per-frame interval capacity; raises if exceeded.
    """
    frames = len(frame_times)
    out_w = np.zeros((frames, max_steps, 3), np.float32)
    out_a = np.zeros((frames, max_steps, 3), np.float32)
    out_dt = np.zeros((frames, max_steps), np.float32)
    n_used = np.zeros(frames, np.int32)

    t_prev = t_start
    for f, t_frame in enumerate(frame_times):
        if t_frame <= t_prev:
            # out-of-order frame: no propagation (VioManager.cpp:207-210)
            continue
        ts, ws, as_ = select_imu_readings(imu_t, imu_w, imu_a, t_prev, t_frame)
        if ts.shape[0] >= 2:
            dts = np.diff(ts)
            mids_w = 0.5 * (ws[:-1] + ws[1:])
            mids_a = 0.5 * (as_[:-1] + as_[1:])
            k = dts.shape[0]
            if k > max_steps:
                raise ValueError(
                    f"frame {f}: {k} IMU intervals > max_steps={max_steps}; "
                    "raise max_steps"
                )
            out_w[f, :k] = mids_w
            out_a[f, :k] = mids_a
            out_dt[f, :k] = dts
            n_used[f] = k
        t_prev = t_frame

    return ImuWindows(w_mid=out_w, a_mid=out_a, dt=out_dt, n_used=n_used)
