"""UZH-FPV ground-truth loading (dataset_reader.h:61-113 format).

The GT txt files ship with the reference
(cuahn_ros/ov_data/uzh_fpv/*_with_gt.txt): '# timestamp(s) tx ty tz qx qy qz
qw ...' rows at IMU rate. We reuse the generic pose loader and add the exact
state lookup the reference's RosVisualizer uses for its GT path.
"""

from __future__ import annotations

import numpy as np

from cuahn_vio.eval.traj_io import Trajectory, load_pose_file


def load_gt_file(path: str) -> Trajectory:
    """Ground-truth trajectory: times + [x y z qx qy qz qw] (JPL xyzw in
    files; these GT quats are Hamilton body->world stored xyzw per the
    UZH-FPV convention — eval treats both files identically, so conventions
    cancel)."""
    return load_pose_file(path)


def get_gt_state(traj: Trajectory, timestamp: float, tol: float = 0.005):
    """Exact-timestamp GT lookup (dataset_reader.h:113): nearest within tol
    seconds, or None."""
    idx = int(np.searchsorted(traj.times, timestamp))
    best, best_d = None, tol
    for i in (idx - 1, idx, idx + 1):
        if 0 <= i < len(traj.times):
            d = abs(traj.times[i] - timestamp)
            if d < best_d:
                best, best_d = i, d
    if best is None:
        return None
    return traj.times[best], traj.poses[best]
