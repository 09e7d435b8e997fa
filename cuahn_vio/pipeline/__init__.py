from cuahn_vio.pipeline.imu_window import (  # noqa: F401
    ImuWindows,
    build_imu_windows,
    select_imu_readings,
)
from cuahn_vio.pipeline.vio import (  # noqa: F401
    FrameOutput,
    VioCarry,
    VioConfig,
    make_vio_step,
    run_sequence,
)
from cuahn_vio.pipeline.runner import (  # noqa: F401
    RunnerOptions,
    RunResult,
    prepare_sequence,
    run_offline,
    run_stepwise,
)
