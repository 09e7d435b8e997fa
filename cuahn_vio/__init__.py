"""cuahn-vio_tpu: a TPU-native (JAX/XLA/Pallas) visual-inertial odometry framework.

A from-scratch rebuild of the capabilities of tudelft/CUAHN-VIO (reference:
content-and-uncertainty-aware homography network + robocentric EKF for
downward-facing drone cameras over planar ground), re-designed TPU-first:

- ``cuahn_vio.ops``      : Hamilton quaternion / SO(3) math, DLT homography
                           solve, homography image warping (XLA + Pallas).
- ``cuahn_vio.models``   : the 4-block cascaded UAHN homography network with
                           MC-dropout uncertainty, as a flax module with a
                           vmapped ensemble axis.
- ``cuahn_vio.filter``   : pure-functional 27-state robocentric EKF
                           (propagate / update / reset as jitted pure fns).
- ``cuahn_vio.pipeline`` : the per-frame ``vio_step`` and ``lax.scan``
                           sequence runner; batched multi-sequence execution.
- ``cuahn_vio.data``     : UZH-FPV ground-truth loading, IMU windowing, and a
                           homography-aware synthetic planar-scene generator.
- ``cuahn_vio.eval``     : trajectory alignment (umeyama/posyaw/se3/sim3),
                           ATE/RPE/NEES metrics, trajectory/timing file I/O
                           byte-compatible with the reference's ov_eval.
- ``cuahn_vio.parallel`` : device meshes, sequence-sharded evaluation, and
                           collective metric aggregation.
- ``cuahn_vio.train``    : self-supervised photometric + NLL training for the
                           network (the reference ships no training code).
"""

__version__ = "0.1.0"

import os as _os


def default_compile_cache_dir() -> str:
    """Host-fingerprinted cache path: XLA:CPU persists AOT executables
    whose machine features must match the executing host — loading an
    entry compiled on a different CPU generation SIGILLs/segfaults
    (cpu_aot_loader warns exactly this). Keying the directory by the CPU
    flags makes stale cross-host entries unreachable."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"/tmp/jax_cache_{fp}"
    except Exception:
        pass
    return "/tmp/jax_cache_generic"


def _enable_persistent_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache for every entry point.

    TPU compiles of the fused vio_step are expensive (minutes on a cold
    backend); the reference pays an analogous warm-up per process
    (HomographyNet.cpp:28-63 times its first traced-graph forward). Caching
    compiled executables on disk makes every CLI invocation after the first
    start in seconds. Opt out with CUAHN_VIO_NO_COMPILE_CACHE=1; relocate
    with CUAHN_VIO_COMPILE_CACHE=<dir>.
    """
    if _os.environ.get("CUAHN_VIO_NO_COMPILE_CACHE"):
        return
    # CPU-backend runs (tests, the driver's virtual-mesh dryrun) do NOT
    # use the cache: XLA:CPU AOT executable serialization is experimental
    # and segfaults intermittently inside serialize_executable, and CPU
    # compiles are cheap anyway. The cache exists for the TPU path, where
    # a cold vio_step compile costs minutes over the tunnel.
    if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "CUAHN_VIO_COMPILE_CACHE", default_compile_cache_dir()
            ),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
