"""DUE: uncertainty-aware regression on COATI embeddings.

JAX re-implementation of the reference's DUE/DKL pipeline
(coati/models/regression/basic_due.py:14-198, after arXiv:2102.11409):
a Lipschitz-constrained FCResNet feature extractor (soft spectral
normalization, coeff 0.95) feeding a sparse variational GP (RBF kernel,
60 inducing points initialized by k-means, Gaussian likelihood), trained
end-to-end on the variational ELBO with Adam 1e-3. gpytorch/due/ignite
are replaced by ~200 lines of explicit SVGP math under jit.

`basic_due` keeps the reference signature and returns
(model, (y_test, mean, std)).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from coati_tpu.common.util import makedir
from coati_tpu.ops.layers import torch_linear_init

JITTER = 1e-5


# ---------------------------------------------------------- FCResNet


@struct.dataclass
class FcResNetParams:
    first_w: jnp.ndarray
    first_b: jnp.ndarray
    res_w: jnp.ndarray  # (depth, F, F)
    res_b: jnp.ndarray  # (depth, F)
    # power-iteration left singular vector estimates (non-trained state)
    u_first: jnp.ndarray
    u_res: jnp.ndarray  # (depth, F)


def init_fc_resnet(key, input_dim: int, features: int, depth: int) -> FcResNetParams:
    keys = jax.random.split(key, depth + 2)
    first_w, first_b = torch_linear_init(keys[0], input_dim, features)
    res = [torch_linear_init(keys[i + 1], features, features) for i in range(depth)]
    return FcResNetParams(
        first_w=first_w,
        first_b=first_b,
        res_w=jnp.stack([w for w, _ in res]),
        res_b=jnp.stack([b for _, b in res]),
        u_first=jax.random.normal(keys[-1], (features,)),
        u_res=jax.random.normal(keys[-1], (depth, features)),
    )


def _spectral_scale(w, u, coeff: float, n_iter: int = 2):
    """Soft spectral normalization (DUE): scale W by min(1, coeff/sigma),
    sigma estimated by power iteration. Returns (w_scaled, u_new)."""
    u = jax.lax.stop_gradient(u)
    w_sg = jax.lax.stop_gradient(w)
    for _ in range(n_iter):
        v = w_sg @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w_sg.T @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = v @ (w_sg @ u)
    scale = jnp.minimum(1.0, coeff / (jnp.abs(sigma) + 1e-12))
    return w * scale, u


def fc_resnet_apply(
    p: FcResNetParams,
    x: jnp.ndarray,
    coeff: float = 0.95,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    spectral_first: bool = True,
    spectral_residuals: bool = True,
) -> Tuple[jnp.ndarray, FcResNetParams]:
    """-> (features, params-with-updated-power-iteration-state).
    spectral_first=False skips the first layer's spectral scaling (the
    reference's remove_spectral_norm strips exactly that hook,
    basic_due.py:179-181; the residual layers keep theirs).
    spectral_residuals=False also skips the residual layers' scaling —
    used by models imported from published torch artifacts, where the
    eval-time spectral factor is folded into the stored weights
    (due_import.py)."""
    if spectral_first:
        w0, u0 = _spectral_scale(p.first_w, p.u_first, coeff)
    else:
        w0, u0 = p.first_w, p.u_first
    h = x @ w0 + p.first_b
    new_u = []
    for i in range(p.res_w.shape[0]):
        if spectral_residuals:
            wi, ui = _spectral_scale(p.res_w[i], p.u_res[i], coeff)
        else:
            wi, ui = p.res_w[i], p.u_res[i]
        new_u.append(ui)
        y = jax.nn.relu(h @ wi + p.res_b[i])
        if dropout_rate > 0 and rng is not None:
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, i), 1.0 - dropout_rate, y.shape
            )
            y = jnp.where(keep, y / (1.0 - dropout_rate), 0.0)
        h = h + y
    new_params = p.replace(u_first=u0, u_res=jnp.stack(new_u))
    return h, new_params


# ------------------------------------------------------------- SVGP


@struct.dataclass
class SvgpParams:
    inducing: jnp.ndarray  # (M, F)
    var_mean: jnp.ndarray  # (M,)
    var_chol: jnp.ndarray  # (M, M) lower-tri (raw; tril applied at use)
    log_lengthscale: jnp.ndarray
    log_outputscale: jnp.ndarray
    log_noise: jnp.ndarray
    # constant prior mean (gpytorch ConstantMean — trained in the
    # reference's GP, basic_due.py via due.dkl.GP); 0 for models trained
    # here before this field existed
    mean_const: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))

    def __setstate__(self, state):
        # DueModel.save pickles this dataclass instance directly, and
        # unpickling bypasses __init__/default_factory — backfill the
        # prior mean so pre-mean_const .pkl files keep loading.
        state.setdefault("mean_const", jnp.zeros(()))
        self.__dict__.update(state)


def rbf_kernel(x1, x2, lengthscale, outputscale):
    # HIGHEST precision: TPU matmuls default to bf16 inputs, whose ~1e-2
    # relative error on the cross term exceeds Kzz's smallest eigenvalue
    # for the published hcaii model — f32 cholesky then NaNs. The kernel
    # matrices here are tiny (M=60), so full-precision costs nothing.
    d2 = (
        jnp.sum(x1**2, -1)[:, None]
        + jnp.sum(x2**2, -1)[None, :]
        - 2.0 * jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)
    )
    return outputscale * jnp.exp(-0.5 * jnp.maximum(d2, 0.0) / lengthscale**2)


def svgp_predict_f(
    p: SvgpParams,
    feats: jnp.ndarray,
    jitter: float = JITTER,
    kxx_jitter: float = 0.0,
):
    """q(f) marginal mean/variance at the given features.

    `jitter` stabilizes the Kzz cholesky; `kxx_jitter` is added to the
    prior diagonal Kxx (gpytorch's VariationalStrategy adds its
    jitter_val, 1e-4, to BOTH — converted published models set these to
    match, models trained here keep the historical 1e-5 / 0 defaults)."""
    ls = jnp.exp(p.log_lengthscale)
    os_ = jnp.exp(p.log_outputscale)
    m = p.inducing.shape[0]
    kzz = rbf_kernel(p.inducing, p.inducing, ls, os_) + jitter * jnp.eye(m)
    kxz = rbf_kernel(feats, p.inducing, ls, os_)
    lzz = jnp.linalg.cholesky(kzz)
    # A = Kzz^-1 Kzx via triangular solves
    a = jax.scipy.linalg.cho_solve((lzz, True), kxz.T)  # (M, N)
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.matmul(a.T, p.var_mean, precision=hi) + p.mean_const
    s = jnp.tril(p.var_chol)
    kxx_diag = (os_ + kxx_jitter) * jnp.ones(feats.shape[0])
    var_prior_reduction = jnp.sum(kxz.T * a, axis=0)
    sa = jnp.matmul(s.T, a, precision=hi)  # (M, N)
    var = kxx_diag - var_prior_reduction + jnp.sum(sa**2, axis=0)
    return mean, jnp.maximum(var, 1e-10)


def svgp_kl(p: SvgpParams, jitter: float = JITTER):
    """KL(q(u) || p(u)) with p(u) = N(0, Kzz)."""
    ls = jnp.exp(p.log_lengthscale)
    os_ = jnp.exp(p.log_outputscale)
    m = p.inducing.shape[0]
    kzz = rbf_kernel(p.inducing, p.inducing, ls, os_) + jitter * jnp.eye(m)
    lzz = jnp.linalg.cholesky(kzz)
    s = jnp.tril(p.var_chol)
    # trace term: tr(Kzz^-1 S S^T)
    linv_s = jax.scipy.linalg.solve_triangular(lzz, s, lower=True)
    trace = jnp.sum(linv_s**2)
    # mahalanobis: m^T Kzz^-1 m
    linv_m = jax.scipy.linalg.solve_triangular(lzz, p.var_mean, lower=True)
    maha = jnp.sum(linv_m**2)
    logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diag(lzz)))
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diag(s)) + 1e-12))
    return 0.5 * (trace + maha - m + logdet_p - logdet_q)


@struct.dataclass
class DueParams:
    net: FcResNetParams
    gp: SvgpParams


@dataclass
class DueConfig:
    input_dim: int
    features: int = 256
    depth: int = 4
    n_inducing: int = 60
    coeff: float = 0.95
    dropout_rate: float = 0.03
    lr: float = 1e-3
    # False after remove_spectral_norm: the first layer's weight carries
    # its folded spectral scale and is applied as a plain linear map
    spectral_first: bool = True
    # False for models imported from published torch artifacts: the
    # eval-time spectral factor is folded into every residual weight
    spectral_residuals: bool = True
    # cholesky jitters (see svgp_predict_f); imported gpytorch models
    # use 1e-4 for both to match VariationalStrategy's jitter_val
    jitter: float = JITTER
    kxx_jitter: float = 0.0


class DueModel:
    """Trained DUE model: feature extractor + SVGP + Gaussian likelihood."""

    def __init__(self, params: DueParams, config: DueConfig):
        self.params = params
        self.config = config

    def predict(self, x: np.ndarray, batch_size: int = 4096):
        """-> (mean, std) of the predictive distribution (f, without
        observation noise — matching pred.mean/pred.stddev of the
        reference, basic_due.py:187-189)."""
        means, stds = [], []
        for i in range(0, len(x), batch_size):
            xb = jnp.asarray(x[i : i + batch_size], jnp.float32)
            feats, _ = fc_resnet_apply(
                self.params.net, xb, self.config.coeff,
                spectral_first=self.config.spectral_first,
                spectral_residuals=self.config.spectral_residuals,
            )
            mean, var = svgp_predict_f(
                self.params.gp, feats,
                jitter=self.config.jitter, kxx_jitter=self.config.kxx_jitter,
            )
            means.append(np.asarray(mean))
            stds.append(np.asarray(jnp.sqrt(var)))
        return np.concatenate(means), np.concatenate(stds)

    def __call__(self, x):
        return self.predict(np.asarray(x))

    def save(self, path: str):
        makedir(path, isfile=True)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "params": jax.tree_util.tree_map(np.asarray, self.params),
                    "config": self.config.__dict__,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "DueModel":
        with open(path, "rb") as f:
            blob = pickle.load(f)
        cfg = DueConfig(**blob["config"])
        params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        return cls(params, cfg)

    def remove_spectral_norm(self) -> "DueModel":
        """Fold the first layer's current spectral scale into its weight
        and stop re-normalizing it — the reference strips the torch
        spectral_norm hook from feature_extractor.first so the model is
        plainly differentiable (basic_due.py:176-181). Predictions are
        unchanged."""
        from dataclasses import replace as dc_replace

        w0, u0 = _spectral_scale(
            self.params.net.first_w, self.params.net.u_first, self.config.coeff
        )
        net = self.params.net.replace(first_w=w0, u_first=u0)
        return DueModel(
            self.params.replace(net=net),
            dc_replace(self.config, spectral_first=False),
        )


def _initial_values(x_feats: np.ndarray, n_inducing: int, seed: int = 0):
    """k-means inducing locations + mean-distance lengthscale (the DUE
    initial_values recipe)."""
    from scipy.cluster.vq import kmeans2

    n = min(1000, len(x_feats))
    idx = np.random.default_rng(seed).permutation(len(x_feats))[:n]
    sample = np.asarray(x_feats[idx], np.float64)
    centers, _ = kmeans2(sample, n_inducing, minit="points", seed=seed)
    # mean pairwise distance via the gram identity |x-y|^2 =
    # |x|^2 + |y|^2 - 2xy — the naive (n, n, F) broadcast is ~2 GB at
    # the default 1000x256 sample
    sq = np.sum(sample**2, axis=1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (sample @ sample.T), 0.0)
    lengthscale = float(np.mean(np.sqrt(d2)))
    return centers.astype(np.float32), max(lengthscale, 1e-2)


def _squeeze_targets(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """-> (N,) float targets; the SVGP is single-output, so multi-target
    label stacks are rejected loudly instead of mis-training."""
    y = np.asarray(y, np.float32)
    if y.ndim == 2 and y.shape[1] == 1:
        y = y[:, 0]
    if y.ndim != 1:
        raise ValueError(
            f"train_due fits a single-output GP; got targets of shape "
            f"{y.shape} — train one model per target"
        )
    if len(y) != len(x):
        raise ValueError(f"x/y length mismatch: {len(x)} vs {len(y)}")
    return y


def train_due(
    x: np.ndarray,
    y: np.ndarray,
    config: Optional[DueConfig] = None,
    steps: int = 2000,
    batch_size: int = 512,
    seed: int = 0,
    verbose: bool = True,
    init_model: Optional[DueModel] = None,
) -> DueModel:
    """Fit a DUE model with the variational ELBO under jit. Passing
    `init_model` continues training from its parameters (the reference's
    load_as + continue_training path, basic_due.py:157-172)."""
    x = np.asarray(x, np.float32)
    y = _squeeze_targets(x, y)
    key = jax.random.PRNGKey(seed)
    if init_model is not None:
        config = init_model.config
        params = init_model.params
    else:
        config = config or DueConfig(input_dim=x.shape[-1])
        net = init_fc_resnet(
            key, config.input_dim, config.features, config.depth
        )
        feats0, _ = fc_resnet_apply(net, jnp.asarray(x[:1000]), config.coeff)
        z0, ls0 = _initial_values(np.asarray(feats0), config.n_inducing, seed)
        gp = SvgpParams(
            inducing=jnp.asarray(z0),
            var_mean=jnp.zeros((config.n_inducing,)),
            var_chol=jnp.eye(config.n_inducing),
            log_lengthscale=jnp.asarray(np.log(ls0), jnp.float32),
            log_outputscale=jnp.zeros(()),
            log_noise=jnp.asarray(np.log(0.5), jnp.float32),
        )
        params = DueParams(net=net, gp=gp)
    optimizer = optax.adam(config.lr)
    opt_state = optimizer.init(params)
    n_data = len(x)

    @jax.jit
    def step(params, opt_state, rng, xb, yb):
        def elbo_loss(p):
            feats, new_net = fc_resnet_apply(
                p.net, xb, config.coeff, config.dropout_rate, rng,
                spectral_first=config.spectral_first,
                spectral_residuals=config.spectral_residuals,
            )
            mean, var = svgp_predict_f(
                p.gp, feats, jitter=config.jitter, kxx_jitter=config.kxx_jitter
            )
            noise = jnp.exp(p.gp.log_noise)
            # Gaussian expected log-likelihood (closed form)
            ell = -0.5 * (
                jnp.log(2 * jnp.pi * noise)
                + ((yb - mean) ** 2 + var) / noise
            )
            loss = -(jnp.mean(ell) * n_data - svgp_kl(p.gp, config.jitter)) / n_data
            return loss, new_net

        (loss, new_net), grads = jax.value_and_grad(elbo_loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # persist the power-iteration state outside the gradient path
        params = params.replace(
            net=params.net.replace(u_first=new_net.u_first, u_res=new_net.u_res)
        )
        return params, opt_state, loss

    rng = np.random.default_rng(seed)
    for it in range(int(steps)):
        idx = rng.integers(0, n_data, size=min(batch_size, n_data))
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, sub, jnp.asarray(x[idx]), jnp.asarray(y[idx])
        )
        if verbose and it % max(1, steps // 10) == 0:
            print(f"due step {it}: elbo loss {float(loss):.4f}")
    return DueModel(params, config)


def basic_due(
    dataset,
    x_field: str = "emb_smiles",
    y_field: Union[str, List[str]] = "pic50",
    save_as: str = "due_model.pkl",
    load_as: Optional[str] = None,
    continue_training: bool = False,
    steps: float = 1e5,
    depth: int = 4,
    batch_size: int = 512,
    remove_spectral_norm: bool = False,
    test_frac: float = 0.03,
    random_seed: int = 510,
):
    """Reference-signature DUE trainer (basic_due.py:14-198): splits the
    record list, trains (or loads), and returns
    (model, (y_test, mean, std))."""
    np.random.seed(seed=random_seed)
    x = np.stack([r[x_field] for r in dataset], 0)
    if isinstance(y_field, str):
        y = np.stack([r[y_field] for r in dataset], 0)
    else:
        y = np.stack(
            [np.stack([r[f] for f in y_field], -1) for r in dataset], 0
        )
    perm = np.random.permutation(len(dataset))
    test_idx = perm[: int(test_frac * len(dataset))]
    train_idx = perm[int(test_frac * len(dataset)) :]

    steps_per_epoch = max(1, len(train_idx) // batch_size)
    total_steps = int(steps // steps_per_epoch + 1) * steps_per_epoch
    # the reference runs `steps // len(train_loader) + 1` epochs; cap the
    # jitted loop at the equivalent number of minibatch steps
    total_steps = min(total_steps, int(steps))

    if load_as is not None:
        model = DueModel.load(load_as)
        if continue_training:
            # continue from the LOADED parameters (basic_due.py:157-172)
            model = train_due(
                x[train_idx], y[train_idx], steps=total_steps,
                batch_size=batch_size, seed=random_seed, init_model=model,
            )
            model.save(save_as)
    else:
        config = DueConfig(input_dim=x.shape[-1], depth=depth)
        model = train_due(
            x[train_idx], y[train_idx],
            config=config, steps=total_steps,
            batch_size=batch_size, seed=random_seed,
        )
        model.save(save_as)

    if remove_spectral_norm:
        model = model.remove_spectral_norm()

    mean, std = model.predict(x[test_idx])
    return model, (y[test_idx], mean, std)
