"""TPU-native sparse-vision front-end.

Rebuilds the OpenVINS-inherited components the reference compiles into
`ov_core_lib` (SURVEY.md §2.4 "vestigial" rows — `track/` TrackKLT +
Grider_FAST, `feat/` FeatureInitializer, `cpi/` preintegration) as
fixed-shape, jittable JAX: batched features instead of per-feature OpenCV
calls, `lax` loops instead of dynamic iteration, masks instead of
variable-length containers.

The CUAHN pipeline itself never calls these (the homography network replaces
point tracking), but they complete the framework surface: a point-feature
front-end for non-planar scenes, triangulation for map points / loop-closure
geometry, and preintegrated IMU factors for the pose-graph smoother.
"""

from cuahn_vio.vision.detect import shi_tomasi_score, grid_detect
from cuahn_vio.vision.klt import build_pyramid, track_pyramidal
from cuahn_vio.vision.triangulate import triangulate_nview
from cuahn_vio.vision.preint import preintegrate, PreintFactor

__all__ = [
    "shi_tomasi_score",
    "grid_detect",
    "build_pyramid",
    "track_pyramidal",
    "triangulate_nview",
    "preintegrate",
    "PreintFactor",
]
