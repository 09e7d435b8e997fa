from cuahn_vio.ops.pallas.warp_kernel import (  # noqa: F401
    homography_warp_pallas,
)
