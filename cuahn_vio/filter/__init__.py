from cuahn_vio.filter.state import (  # noqa: F401
    CORNER_XY1,
    FOCAL,
    FOCAL2,
    FilterParams,
    FilterState,
    make_params,
    reset_4pt_offset,
)
from cuahn_vio.filter.propagate import (  # noqa: F401
    compute_jacobians,
    predict_mean,
    propagate_step,
    propagate_window,
)
from cuahn_vio.filter.update import hnet_update, propagated_offset8  # noqa: F401
from cuahn_vio.filter.initializer import (  # noqa: F401
    InitResult,
    initial_covariance,
    initial_state,
    try_initialize,
)
