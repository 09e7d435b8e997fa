"""Covariance-temperature fitting (eval/calibration.py): innovations drawn
from a KNOWN measurement covariance must recover the generating k."""

import numpy as np

from cuahn_vio.eval.calibration import (
    CHI2_8_MEDIAN,
    chi2_for_k,
    fit_k_net_cov,
)

FOCAL2 = 159.5 * 159.5


def _make_log(rng, k_true, f=4000):
    # per-frame network covariance (px^2), diagonal with spread
    net = np.zeros((f, 8, 8), np.float32)
    d = rng.uniform(0.5, 4.0, (f, 8)).astype(np.float32)
    for i in range(8):
        net[:, i, i] = d[:, i]
    cov_meas = np.tile(np.eye(8, dtype=np.float32) * 1e-6, (f, 1, 1))
    s_true = cov_meas + k_true * net / FOCAL2
    l = np.linalg.cholesky(s_true)
    inno = np.einsum("fij,fj->fi", l, rng.normal(size=(f, 8))).astype(
        np.float32
    )
    return inno, cov_meas, net


def test_fit_recovers_generating_temperature(rng):
    k_true = 37.0
    inno, cov_meas, net = _make_log(rng, k_true)
    res = fit_k_net_cov(inno, cov_meas, net)
    assert abs(res["k_net_cov"] - k_true) / k_true < 0.15
    assert abs(res["chi2_median"] - CHI2_8_MEDIAN) < 0.05


def test_chi2_monotone_in_k(rng):
    inno, cov_meas, net = _make_log(rng, 10.0, f=200)
    m = [np.median(chi2_for_k(inno, cov_meas, net, k)) for k in (1, 10, 100)]
    assert m[0] > m[1] > m[2]


def test_rejects_degenerate_log(rng):
    import pytest

    inno = np.zeros((5, 8), np.float32)
    z = np.zeros((5, 8, 8), np.float32)
    with pytest.raises(ValueError):
        fit_k_net_cov(inno, z, z)


def test_cov_inflation_scales_nees():
    """apply_cov_inflation scales block variances by the factors (cross
    blocks by the geometric mean) and preserves positive-definiteness;
    fit_cov_inflation's D P D algebra means NEES divides by the factor."""
    import numpy as np

    from cuahn_vio.eval.calibration import apply_cov_inflation, inflation_diag

    rng = np.random.default_rng(0)
    m = rng.normal(size=(15, 15))
    p = np.eye(15) * 0.1 + m @ m.T
    f = {"pos": 4.0, "ori": 9.0, "vel": 2.25}
    out = apply_cov_inflation(p[None], f)[0]
    np.testing.assert_allclose(out[0:3, 0:3], 4.0 * p[0:3, 0:3], rtol=1e-6)
    np.testing.assert_allclose(out[3:6, 3:6], 9.0 * p[3:6, 3:6], rtol=1e-6)
    np.testing.assert_allclose(out[6:9, 6:9], 2.25 * p[6:9, 6:9], rtol=1e-6)
    np.testing.assert_allclose(out[9:15, 9:15], p[9:15, 9:15], rtol=1e-6)
    # cross block pos/ori scaled by sqrt(4*9) = 6
    np.testing.assert_allclose(out[0:3, 3:6], 6.0 * p[0:3, 3:6], rtol=1e-6)
    assert np.all(np.linalg.eigvalsh(out) > 0)
    # NEES with the inflated covariance divides by the block factor
    e = rng.normal(size=3)
    nees0 = e @ np.linalg.solve(p[6:9, 6:9], e)
    nees1 = e @ np.linalg.solve(out[6:9, 6:9], e)
    np.testing.assert_allclose(nees1, nees0 / 2.25, rtol=1e-6)
    d = inflation_diag(f)
    assert d.shape == (15,)
