"""EGNN tests: numerical parity with the reference torch e3gnn_clip
(dense-masked vs sparse-neighborlist message passing must agree), E(3)
invariance of the pooled representation, and gradient-path semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coati_tpu.models.convert import convert_egnn
from coati_tpu.models.egnn import EgnnConfig, cubic_cutoff, egnn_forward, init_egnn

from .oracle import load

CFG = EgnnConfig(
    hidden_nf=32,
    n_layers=3,
    message_cutoff=5.0,
    instance_norm=True,
    torch_emb=False,
    residual=False,
    dropout=0.0,
    precision="highest",
    remat=False,
)


def make_pair(cfg=CFG, seed=0):
    e3 = load("ref_e3gnn_clip")
    torch.manual_seed(seed)
    ref = e3.e3gnn_clip(
        hidden_nf=cfg.hidden_nf,
        n_layers=cfg.n_layers,
        message_cutoff=cfg.message_cutoff,
        instance_norm=cfg.instance_norm,
        torch_emb=cfg.torch_emb,
        residual=cfg.residual,
        dropout=cfg.dropout,
        device="cpu",
    )
    ref.eval()
    return ref, convert_egnn(ref.state_dict(), cfg)


def random_mol_batch(batch=3, n_atoms=12, seed=1):
    rng = np.random.default_rng(seed)
    atoms = rng.integers(1, 9, size=(batch, n_atoms)).astype(np.int64)
    # ragged padding: zero out trailing atoms per row
    for i in range(batch):
        pad_from = rng.integers(n_atoms // 2, n_atoms + 1)
        atoms[i, pad_from:] = 0
    coords = rng.normal(scale=2.0, size=(batch, n_atoms, 3)).astype(np.float32)
    coords[atoms == 0] = 0.0
    return atoms, coords


def test_cubic_cutoff_matches_reference():
    gcl = load("ref_e_gcl_sparse")
    x = np.linspace(-1, 8, 200).astype(np.float32)
    ref = gcl.cubic_cutoff(torch.tensor(x), torch.tensor(5.0)).numpy()
    mine = np.asarray(cubic_cutoff(jnp.asarray(x), 5.0))
    np.testing.assert_allclose(mine, ref, atol=1e-6)


@pytest.mark.parametrize("residual", [False, True])
def test_forward_parity(residual):
    cfg = CFG.replace(residual=residual)
    ref, params = make_pair(cfg, seed=2)
    atoms, coords = random_mol_batch(seed=3)
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(atoms, dtype=torch.long), torch.tensor(coords)
        ).numpy()
    mine = np.asarray(egnn_forward(params, cfg, jnp.asarray(atoms), jnp.asarray(coords)))
    np.testing.assert_allclose(mine, ref_out, atol=3e-5, rtol=1e-4)


def test_forward_parity_no_instance_norm():
    cfg = CFG.replace(instance_norm=False)
    ref, params = make_pair(cfg, seed=4)
    atoms, coords = random_mol_batch(seed=5)
    with torch.no_grad():
        ref_out = ref(
            torch.tensor(atoms, dtype=torch.long), torch.tensor(coords)
        ).numpy()
    mine = np.asarray(egnn_forward(params, cfg, jnp.asarray(atoms), jnp.asarray(coords)))
    np.testing.assert_allclose(mine, ref_out, atol=3e-5, rtol=1e-4)


def test_e3_invariance():
    """The pooled representation must be invariant under global rotation +
    translation of the coordinates."""
    params = init_egnn(jax.random.PRNGKey(0), CFG)
    atoms, coords = random_mol_batch(seed=6)

    # random rotation via QR of a gaussian matrix
    q, _ = np.linalg.qr(np.random.default_rng(7).normal(size=(3, 3)))
    q = q.astype(np.float32)
    shifted = coords @ q.T + np.array([1.5, -2.0, 0.7], np.float32)
    shifted[atoms == 0] = 0.0  # padding rows stay zero (masked anyway)

    out_a = np.asarray(egnn_forward(params, CFG, jnp.asarray(atoms), jnp.asarray(coords)))
    out_b = np.asarray(egnn_forward(params, CFG, jnp.asarray(atoms), jnp.asarray(shifted)))
    np.testing.assert_allclose(out_a, out_b, atol=1e-4, rtol=1e-4)


def test_no_gradient_through_distances():
    """The reference computes distances under no_grad
    (e_gcl_sparse.py:199-203); coords must therefore receive ZERO gradient
    through the encoder (coordinates only enter via d^2 / cutoff)."""
    params = init_egnn(jax.random.PRNGKey(1), CFG)
    atoms, coords = random_mol_batch(seed=8)

    def loss(c):
        return jnp.sum(egnn_forward(params, CFG, jnp.asarray(atoms), c))

    g = np.asarray(jax.grad(loss)(jnp.asarray(coords)))
    assert np.allclose(g, 0.0), "coords must be gradient-isolated by default"


def test_remat_matches_no_remat():
    cfg_r = CFG.replace(remat=True)
    params = init_egnn(jax.random.PRNGKey(2), CFG)
    atoms, coords = random_mol_batch(seed=9)
    a = np.asarray(egnn_forward(params, CFG, jnp.asarray(atoms), jnp.asarray(coords)))
    b = np.asarray(egnn_forward(params, cfg_r, jnp.asarray(atoms), jnp.asarray(coords)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_padding_atoms_do_not_affect_output():
    """Extending the batch with extra padding columns must not change the
    pooled representation (static-shape bucketing safety)."""
    params = init_egnn(jax.random.PRNGKey(3), CFG)
    atoms, coords = random_mol_batch(seed=10)
    pad_atoms = np.concatenate([atoms, np.zeros((atoms.shape[0], 5), np.int64)], 1)
    pad_coords = np.concatenate(
        [coords, np.zeros((coords.shape[0], 5, 3), np.float32)], 1
    )
    a = np.asarray(egnn_forward(params, CFG, jnp.asarray(atoms), jnp.asarray(coords)))
    b = np.asarray(
        egnn_forward(params, CFG, jnp.asarray(pad_atoms), jnp.asarray(pad_coords))
    )
    np.testing.assert_allclose(a, b, atol=1e-5)
