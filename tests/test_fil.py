"""Filter-in-the-loop trainer tests (train/fil.py): the window bank is
geometrically sane, and the FIL loss is finite and differentiable through
the full filter scan (network inside) on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuahn_vio.filter import make_params
from cuahn_vio.train.fil import FilConfig, build_window_bank, make_fil_loss
from cuahn_vio.pipeline.vio import VioConfig
from tests.test_propagate import T_ITOC


@pytest.fixture(scope="module")
def tiny_cfg():
    return FilConfig(
        window=2, batch_size=2, imu_substeps=4, blur_taps=1,
        exposure_s=0.0, img_hw=(64, 64),
    )


@pytest.fixture(scope="module")
def bank(tiny_cfg):
    return build_window_bank(n_windows=4, cfg=tiny_cfg, seed=3)


def test_bank_geometry(bank, tiny_cfg):
    w1 = tiny_cfg.window
    assert bank.tap_p.shape == (4, w1 + 1, 1, 3)
    assert bank.w_true.shape == (4, w1, 4, 3)
    assert np.all(np.isfinite(bank.gt_p))
    # heights above the rejection floor
    assert np.all(bank.gt_p[:, :, 2] > 0.5)
    # IMU integrates approximately to the frame-to-frame velocity change:
    # mean specific force minus gravity-in-body ~ acceleration
    dt_total = bank.dt.sum(axis=2)
    assert np.allclose(dt_total, 1.0 / 30.0, atol=1e-6)
    # quaternions normalized
    assert np.allclose(np.linalg.norm(bank.gt_q, axis=-1), 1.0, atol=1e-4)


def test_fil_loss_finite_and_differentiable(bank, tiny_cfg):
    from cuahn_vio.data.textures import get_texture_bank, train_indices
    from cuahn_vio.models.uahn import UAHN

    side = tiny_cfg.img_hw[0]
    model = UAHN(img_height=side, img_width=side)
    img = jnp.zeros((side, side), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, img,
    )["params"]

    t = np.asarray(T_ITOC)
    c_rot_i = jnp.array(t[:3, :3], jnp.float32)
    i_t_i2c = jnp.array(-t[:3, :3].T @ t[:3, 3], jnp.float32)
    fparams = make_params(T_ITOC, chi2_gate=100.0)

    bank_np = get_texture_bank()
    tex_bank = jnp.asarray(bank_np[:4])
    tex_idx = jnp.arange(2)

    loss_fn = make_fil_loss(
        model, fparams, tiny_cfg, VioConfig(update_gate_frames=-1),
        c_rot_i, i_t_i2c, tex_bank, tex_idx,
    )
    bank_slice = {
        k: jnp.asarray(v[: tiny_cfg.batch_size])
        for k, v in bank._asdict().items()
    }
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, bank_slice, jax.random.PRNGKey(7)
    )
    assert np.isfinite(float(loss))
    # gradient reaches the network: both the cascade fc and the block-4
    # variance head get nonzero gradient through the Kalman gain
    gnorm = jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    flat = jax.tree.leaves(gnorm)
    assert np.isfinite(flat).all()
    assert sum(flat) > 0.0
