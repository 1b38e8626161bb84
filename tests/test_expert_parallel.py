"""Expert-parallel MoE tests (parallel/ep.py, beyond-parity: the
reference has no MoE, SURVEY §2.2).

On the 8-device CPU mesh: routing respects capacity, dropped tokens
output zero, the load-balance aux is exact for a forced-uniform router,
and the expert-sharded forward + grads equal the single-device ones."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from coati_tpu.parallel.ep import (
    MoeParams,
    init_moe,
    make_ep_mesh,
    moe_mlp,
    shard_params_ep,
)
from coati_tpu.parallel.mesh import make_mesh, replicate_params


def test_moe_capacity_and_dropping():
    """With capacity 1 and all tokens routed to one expert, only the
    first token is processed; the rest combine to zero."""
    d, e = 8, 4
    params = init_moe(jax.random.PRNGKey(0), d, 16, e)
    # router forcing expert 0 for every token
    router = jnp.zeros((d, e)).at[:, 0].set(1.0)
    params = params.replace(router=router)
    x = jnp.ones((1, 8, d))
    out, _ = moe_mlp(params, x, capacity_factor=e / 8.0)  # cap = 1
    out = np.asarray(out[0])
    assert np.abs(out[0]).max() > 0
    np.testing.assert_allclose(out[1:], 0.0, atol=1e-6)


def test_moe_aux_loss_uniform_router():
    """A uniform router gives aux exactly... E * sum((1/E)*frac_tokens)
    = 1 when token fractions sum to 1 and gates are uniform."""
    d, e = 8, 4
    params = init_moe(jax.random.PRNGKey(0), d, 16, e)
    params = params.replace(router=jnp.zeros((d, e)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, d))
    _, aux = moe_mlp(params, x)
    assert float(aux) == pytest.approx(1.0, rel=1e-5)


def test_moe_processes_all_kept_tokens():
    """With ample capacity, every token gets its gate-weighted expert
    output (no silent drops)."""
    d, e = 16, 4
    params = init_moe(jax.random.PRNGKey(2), d, 32, e)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, d))
    out, _ = moe_mlp(params, x, capacity_factor=4.0)  # cap >= all tokens
    # brute-force per-token computation
    xf = np.asarray(x.reshape(-1, d))
    gates = jax.nn.softmax(xf @ np.asarray(params.router), axis=-1)
    want = np.zeros_like(xf)
    for n in range(xf.shape[0]):
        ei = int(np.argmax(gates[n]))
        h = np.asarray(
            jax.nn.gelu(
                xf[n] @ np.asarray(params.w_fc[ei]) + np.asarray(params.b_fc[ei]),
                approximate=True,
            )
        )
        want[n] = gates[n, ei] * (
            h @ np.asarray(params.w_out[ei]) + np.asarray(params.b_out[ei])
        )
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, d), want, atol=2e-5
    )


@pytest.mark.parametrize("expert_shards", [2, 4])
def test_ep_forward_matches_single_device(expert_shards):
    d, e = 16, 4
    params0 = jax.device_get(init_moe(jax.random.PRNGKey(4), d, 32, e))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, d))

    def fwd(params, x):
        out, aux = moe_mlp(params, x)
        return out, aux

    out_ref, aux_ref = jax.jit(fwd)(replicate_params(make_mesh(1), params0), x)

    mesh = make_ep_mesh(8, expert=expert_shards)
    params = shard_params_ep(mesh, params0)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out_ep, aux_ep = jax.jit(fwd)(params, xs)

    np.testing.assert_allclose(
        np.asarray(out_ep), np.asarray(out_ref), atol=2e-5
    )
    assert float(aux_ep) == pytest.approx(float(aux_ref), rel=1e-5)


def test_ep_grads_match_single_device():
    d, e = 16, 4
    params0 = jax.device_get(init_moe(jax.random.PRNGKey(6), d, 32, e))
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 16, d))

    def loss(params, x):
        out, aux = moe_mlp(params, x)
        return jnp.sum(out**2) + 0.01 * aux

    g_ref = jax.jit(jax.grad(loss))(replicate_params(make_mesh(1), params0), x)
    mesh = make_ep_mesh(8, expert=2)
    g_ep = jax.jit(jax.grad(loss))(
        shard_params_ep(mesh, params0),
        jax.device_put(x, NamedSharding(mesh, P("data"))),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(g_ref)),
        jax.tree_util.tree_leaves(jax.device_get(g_ep)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
