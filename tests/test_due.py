"""DUE regression tests: the SVGP fits a smooth function, uncertainties
grow away from data, KL is positive, and the reference-signature wrapper
round-trips through save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.regression.due import (
    DueConfig,
    DueModel,
    SvgpParams,
    basic_due,
    rbf_kernel,
    svgp_kl,
    svgp_predict_f,
    train_due,
)


def make_data(n=600, d=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = np.sin(x[:, 0]) + 0.5 * x[:, 1] + 0.05 * rng.normal(size=n).astype(np.float32)
    return x, y.astype(np.float32)


def test_rbf_kernel_properties():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
    k = rbf_kernel(x, x, 1.0, 2.0)
    assert np.allclose(np.diag(np.asarray(k)), 2.0, atol=1e-5)
    assert np.allclose(np.asarray(k), np.asarray(k).T, atol=1e-6)
    eig = np.linalg.eigvalsh(np.asarray(k))
    assert eig.min() > -1e-4


def test_svgp_kl_nonnegative_and_zero_at_prior():
    m, f = 10, 4
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
    # q(u) = p(u): mean 0, S = chol(Kzz) -> KL ~ 0
    kzz = rbf_kernel(z, z, 1.0, 1.0) + 1e-5 * jnp.eye(m)
    p = SvgpParams(
        inducing=z,
        var_mean=jnp.zeros((m,)),
        var_chol=jnp.linalg.cholesky(kzz),
        log_lengthscale=jnp.zeros(()),
        log_outputscale=jnp.zeros(()),
        log_noise=jnp.zeros(()),
    )
    assert abs(float(svgp_kl(p))) < 1e-3
    p2 = p.replace(var_mean=jnp.ones((m,)))
    assert float(svgp_kl(p2)) > 0.01


def test_due_fits_and_calibrates():
    x, y = make_data()
    model = train_due(
        x, y,
        config=DueConfig(input_dim=x.shape[-1], features=32, depth=2, n_inducing=20),
        steps=400, batch_size=128, verbose=False,
    )
    mean, std = model.predict(x[:200])
    resid = mean - y[:200]
    # explains most of the variance
    r2 = 1 - resid.var() / y[:200].var()
    assert r2 > 0.5, r2
    # uncertainty grows far from the data manifold
    far = np.full((10, x.shape[-1]), 25.0, np.float32)
    _, std_far = model.predict(far)
    assert std_far.mean() > std.mean()


def test_basic_due_signature_and_roundtrip(tmp_path):
    x, y = make_data(n=300)
    dataset = [{"emb_smiles": x[i], "pic50": y[i]} for i in range(len(x))]
    save_path = str(tmp_path / "due_model.pkl")
    model, (y_test, mean, std) = basic_due(
        dataset, x_field="emb_smiles", y_field="pic50",
        save_as=save_path, steps=200, batch_size=64, depth=2,
    )
    assert len(y_test) == len(mean) == len(std) == int(0.03 * len(dataset))
    assert np.isfinite(mean).all() and (std > 0).all()

    loaded = DueModel.load(save_path)
    mean2, std2 = loaded.predict(x[:16])
    mean1, std1 = model.predict(x[:16])
    np.testing.assert_allclose(mean1, mean2, atol=1e-5)
    np.testing.assert_allclose(std1, std2, atol=1e-5)


def test_continue_training_uses_loaded_params(tmp_path):
    """load_as + continue_training must start from the checkpoint, not
    re-initialize (reference basic_due.py:157-172)."""
    from coati_tpu.regression.due import DueModel, train_due

    from coati_tpu.regression.due import DueConfig

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 8)).astype(np.float32)
    y = x[:, 0] * 2.0
    m0 = train_due(
        x, y, steps=5, batch_size=32, verbose=False,
        config=DueConfig(input_dim=8, n_inducing=16, features=16, depth=2),
    )
    m1 = train_due(x, y, steps=0, batch_size=32, verbose=False, init_model=m0)
    # zero extra steps -> identical params (continuation, not re-init)
    for a, b in zip(
        jax.tree_util.tree_leaves(m0.params), jax.tree_util.tree_leaves(m1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_target_rejected():
    from coati_tpu.regression.due import train_due

    x = np.zeros((16, 4), np.float32)
    y = np.zeros((16, 2), np.float32)
    with pytest.raises(ValueError, match="single-output"):
        train_due(x, y, steps=1, verbose=False)
    # K=1 column vectors squeeze fine
    from coati_tpu.regression.due import DueConfig

    train_due(
        x, np.zeros((16, 1), np.float32), steps=1, verbose=False,
        config=DueConfig(input_dim=4, n_inducing=8, features=8, depth=1),
    )


def test_remove_spectral_norm_preserves_predictions():
    from coati_tpu.regression.due import train_due

    from coati_tpu.regression.due import DueConfig

    rng = np.random.default_rng(1)
    x = rng.normal(size=(48, 6)).astype(np.float32)
    y = x[:, 1]
    m = train_due(
        x, y, steps=5, batch_size=24, verbose=False,
        config=DueConfig(input_dim=6, n_inducing=12, features=16, depth=2),
    )
    stripped = m.remove_spectral_norm()
    assert stripped.config.spectral_first is False
    a_mean, a_std = m.predict(x)
    b_mean, b_std = stripped.predict(x)
    np.testing.assert_allclose(a_mean, b_mean, atol=1e-5)
    np.testing.assert_allclose(a_std, b_std, atol=1e-5)


def test_old_pickle_without_mean_const_loads():
    """DueModel documents saved before SvgpParams.mean_const existed
    unpickle without __init__, so the field must be backfilled by
    __setstate__ (review round 2 regression)."""
    import pickle

    from coati_tpu.regression.due import SvgpParams

    p = SvgpParams(
        inducing=jnp.zeros((4, 3)), var_mean=jnp.zeros(4),
        var_chol=jnp.eye(4), log_lengthscale=jnp.zeros(()),
        log_outputscale=jnp.zeros(()), log_noise=jnp.zeros(()),
    )
    old = SvgpParams.__new__(SvgpParams)
    state = dict(p.__dict__)
    del state["mean_const"]  # what a pre-field pickle restores
    old.__dict__.update(state)
    loaded = pickle.loads(pickle.dumps(old))
    assert float(loaded.mean_const) == 0.0
    jax.tree_util.tree_map(lambda x: x.shape, loaded)  # flattens cleanly
