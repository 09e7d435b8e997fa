"""Filter health monitoring and re-initialization support.

The reference has NO divergence detection — its own shipped estimate ends in
NaNs (ov_data/uzh_fpv/stamped_traj_estimate.txt:1701, SURVEY.md §5.3), and
the re-init hook is an unimplemented comment (VioManager.h:139-140). Here:

- ``health_flags``: jittable per-frame checks (finite state, positive
  covariance diagonal, bounded covariance trace / velocity / height).
- The host runner can gate output on these and re-initialize (re-run the
  static initializer on fresh IMU) when a sequence diverges, so one bad
  sequence cannot poison batched evaluation collectives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cuahn_vio.filter.state import FilterState


class HealthFlags(NamedTuple):
    finite: jnp.ndarray  # () bool: all state entries finite
    cov_psd: jnp.ndarray  # () bool: covariance diagonal non-negative
    cov_bounded: jnp.ndarray  # () bool: trace below threshold
    speed_ok: jnp.ndarray  # () bool: |v| below physical bound
    height_ok: jnp.ndarray  # () bool: above the ground plane
    ok: jnp.ndarray  # () bool: all of the above


def health_flags(
    state: FilterState,
    max_cov_trace: float = 1e4,
    max_speed: float = 30.0,
    min_height: float = 0.01,
) -> HealthFlags:
    """Cheap invariant checks, safe to run inside the jitted step."""
    leaves = [state.p, state.q, state.v, state.ba, state.bg, state.off, state.cov]
    finite = jnp.array(True)
    for leaf in leaves:
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))
    diag = jnp.diagonal(state.cov)
    cov_psd = jnp.all(diag >= -1e-9)
    cov_bounded = jnp.trace(state.cov) < max_cov_trace
    speed_ok = jnp.linalg.norm(state.v) < max_speed
    # robocentric height = z of R p in world; q may be junk when not finite,
    # so this flag is meaningful only when ``finite`` holds
    from cuahn_vio.ops.quat import quat_to_rot

    height = (quat_to_rot(state.q) @ state.p)[2]
    height_ok = height > min_height
    ok = finite & cov_psd & cov_bounded & speed_ok & height_ok
    return HealthFlags(finite, cov_psd, cov_bounded, speed_ok, height_ok, ok)
