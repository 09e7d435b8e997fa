from cuahn_vio.data.gt_loader import get_gt_state, load_gt_file  # noqa: F401
from cuahn_vio.data.synthetic import (  # noqa: F401
    AnalyticTrajectory,
    SyntheticSequence,
    ground_texture,
    make_sequence,
    render_frame,
)
