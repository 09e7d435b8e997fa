"""Streaming pose recorder + process resource monitor.

Recorder rebuilds ov_eval's Recorder/pose_to_file sink (cuahn_ros/ov_eval/
src/utils/Recorder.h:131-149, pose_to_file.cpp:49-67): append
't x y z qx qy qz qw [cov21]' rows to a txt file as poses arrive, so a
long-running (or multi-process) evaluation can be tailed/consumed live and
survives a crash with all flushed rows intact.

ResourceMonitor rebuilds the psutil scripts (ov_eval/python/pid_sys.py:27,
pid_ros.py:34): periodic CPU%/RSS sampling of a target process, with
summary statistics — used to benchmark estimator resource usage.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

import numpy as np


class Recorder:
    """Append-only pose txt writer in the evaluation-contract schema
    (Recorder.h:131: '# timestamp(s) tx ty tz qx qy qz qw [upper-tri
    covariance: 3x3 ori, 3x3 pos]')."""

    def __init__(self, path: str, write_cov: bool = False):
        self.path = path
        self.write_cov = write_cov
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        self._f = open(path, "w")
        hdr = "# timestamp(s) tx ty tz qx qy qz qw"
        if write_cov:
            hdr += (
                " Pr11 Pr12 Pr13 Pr22 Pr23 Pr33 Pt11 Pt12 Pt13 Pt22 Pt23 Pt33"
            )
        self._f.write(hdr + "\n")
        self.count = 0

    def record(
        self,
        t: float,
        pose7: np.ndarray,
        cov_ori: Optional[np.ndarray] = None,
        cov_pos: Optional[np.ndarray] = None,
    ) -> None:
        """pose7 = [x y z qx qy qz qw]; covariances are 3x3 (upper
        triangles are written, Recorder.h:140-148)."""
        vals = [t] + [float(v) for v in pose7]
        if self.write_cov:
            co = np.zeros((3, 3)) if cov_ori is None else np.asarray(cov_ori)
            cp = np.zeros((3, 3)) if cov_pos is None else np.asarray(cov_pos)
            for c in (co, cp):
                vals += [c[0, 0], c[0, 1], c[0, 2], c[1, 1], c[1, 2], c[2, 2]]
        self._f.write(" ".join(f"{v:.9f}" for v in vals) + "\n")
        self._f.flush()
        self.count += 1

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ResourceMonitor:
    """Sample CPU percent and RSS of a process on a background thread
    (pid_sys.py:27-76 semantics: psutil Process, interval-based cpu_percent,
    memory_info().rss)."""

    def __init__(self, pid: Optional[int] = None, interval: float = 0.25):
        import psutil

        self.proc = psutil.Process(os.getpid() if pid is None else pid)
        self.interval = interval
        self.cpu: list[float] = []
        self.rss_mb: list[float] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _run(self):
        self.proc.cpu_percent(None)  # prime (first call returns 0.0)
        while not self._stop.is_set():
            time.sleep(self.interval)
            try:
                self.cpu.append(self.proc.cpu_percent(None))
                self.rss_mb.append(self.proc.memory_info().rss / 1e6)
            except Exception:
                break

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.interval + 1.0)
        if not self.cpu:
            return {"samples": 0}
        return {
            "samples": len(self.cpu),
            "cpu_mean_pct": float(np.mean(self.cpu)),
            "cpu_max_pct": float(np.max(self.cpu)),
            "rss_mean_mb": float(np.mean(self.rss_mb)),
            "rss_max_mb": float(np.max(self.rss_mb)),
        }

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.summary = self.stop()
