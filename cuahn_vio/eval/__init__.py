from cuahn_vio.eval.traj_io import (  # noqa: F401
    Trajectory,
    load_euroc_csv,
    load_pose_file,
    load_timing_file,
    save_euroc_csv,
    save_pose_file,
    save_timing_file,
)
from cuahn_vio.eval.align import (  # noqa: F401
    align_trajectory,
    align_umeyama,
    apply_alignment,
    associate,
    associate_indices,
    get_best_yaw,
)
from cuahn_vio.eval.metrics import ResultTrajectory, Statistics  # noqa: F401
from cuahn_vio.eval.recorder import Recorder, ResourceMonitor  # noqa: F401
from cuahn_vio.eval.simulation import (  # noqa: F401
    ResultSimulation,
    StateGT,
    load_state_gt,
    save_state_gt,
)
