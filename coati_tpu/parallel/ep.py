"""Expert parallelism: a GShard-style MoE MLP with experts sharded over
an `expert` mesh axis (BEYOND-PARITY).

The reference has no mixture-of-experts anywhere (SURVEY §2.2 marks
EP "not required"), so nothing in the COATI recipes uses this; it
completes the framework's parallelism matrix (dp/tp/fsdp/pp/sp/ep) with
the TPU-canonical MoE formulation for recipes that outgrow a dense MLP:

  * top-1 router with a fixed per-expert CAPACITY (static shapes — the
    XLA requirement; overflow tokens are dropped, dropped tokens pass
    through the residual unchanged, GShard arXiv:2006.16668 §3.2);
  * dispatch/combine as one-hot einsums — the pattern XLA turns into
    all_to_all when the expert axis of the weights is sharded;
  * expert weights stacked (E, D, F) and sharded P("expert") — each
    device holds E/n_expert experts; GSPMD inserts the token exchange.

`moe_mlp` is the pure function; `shard_params_ep` places a stack of
expert weights; the equality test pins sharded == single-device
(tests/test_expert_parallel.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coati_tpu.ops.layers import gelu_tanh


@struct.dataclass
class MoeParams:
    router: jnp.ndarray  # (D, E)
    w_fc: jnp.ndarray  # (E, D, F)
    b_fc: jnp.ndarray  # (E, F)
    w_out: jnp.ndarray  # (E, F, D)
    b_out: jnp.ndarray  # (E, D)


def init_moe(
    key: jax.Array, d: int, hidden: int, n_experts: int
) -> MoeParams:
    k1, k2, k3 = jax.random.split(key, 3)
    scale_in = 1.0 / np.sqrt(d)
    scale_hid = 1.0 / np.sqrt(hidden)
    return MoeParams(
        router=jax.random.uniform(k1, (d, n_experts), jnp.float32, -scale_in, scale_in),
        w_fc=jax.random.uniform(
            k2, (n_experts, d, hidden), jnp.float32, -scale_in, scale_in
        ),
        b_fc=jnp.zeros((n_experts, hidden), jnp.float32),
        w_out=jax.random.uniform(
            k3, (n_experts, hidden, d), jnp.float32, -scale_hid, scale_hid
        ),
        b_out=jnp.zeros((n_experts, d), jnp.float32),
    )


def moe_mlp(
    params: MoeParams,
    x: jnp.ndarray,  # (B, T, D)
    capacity_factor: float = 1.25,
    precision=None,
):
    """Top-1 MoE MLP. Returns (out (B, T, D), aux_loss scalar).

    Routing: softmax gates over experts, each token goes to its argmax
    expert if it fits within capacity C = ceil(cf * B*T / E); overflow
    tokens contribute zero (residual carries them through). aux_loss is
    the GShard load-balance term mean(fraction_tokens * fraction_gates)
    * E (arXiv:2006.16668 eq. (4))."""
    b, t, d = x.shape
    e = params.router.shape[1]
    n_tok = b * t
    cap = int(np.ceil(capacity_factor * n_tok / e))
    xf = x.reshape(n_tok, d)

    logits = jnp.dot(xf.astype(jnp.float32), params.router, precision=precision)
    gates = jax.nn.softmax(logits, axis=-1)  # (N, E)
    expert_idx = jnp.argmax(gates, axis=-1)  # (N,)
    gate = jnp.take_along_axis(gates, expert_idx[:, None], axis=1)[:, 0]

    # position of each token within its expert's queue (stable order)
    onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.int32)  # (N, E)
    pos_in_expert = jnp.cumsum(onehot, axis=0) - onehot  # (N, E)
    pos = jnp.take_along_axis(pos_in_expert, expert_idx[:, None], axis=1)[:, 0]
    keep = pos < cap

    # dispatch tensor (N, E, C): token n -> slot (expert_idx[n], pos[n])
    disp = (
        jax.nn.one_hot(expert_idx, e, dtype=x.dtype)[:, :, None]
        * jax.nn.one_hot(pos, cap, dtype=x.dtype)[:, None, :]
        * keep[:, None, None].astype(x.dtype)
    )
    # (E, C, D) expert inputs — with w_fc sharded P("expert") GSPMD turns
    # this contraction + the expert matmuls into the EP all_to_all
    expert_in = jnp.einsum("nec,nd->ecd", disp, xf, precision=precision)
    h = gelu_tanh(
        jnp.einsum("ecd,edf->ecf", expert_in, params.w_fc, precision=precision)
        + params.b_fc[:, None, :]
    )
    expert_out = (
        jnp.einsum("ecf,efd->ecd", h, params.w_out, precision=precision)
        + params.b_out[:, None, :]
    )
    combine = disp * gate[:, None, None].astype(x.dtype)
    out = jnp.einsum("nec,ecd->nd", combine, expert_out, precision=precision)

    # load-balance auxiliary (differentiable through mean gates)
    frac_tokens = jnp.mean(onehot.astype(jnp.float32), axis=0)
    frac_gates = jnp.mean(gates, axis=0)
    aux = jnp.sum(frac_tokens * frac_gates) * e
    return out.reshape(b, t, d), aux


def make_ep_mesh(n_devices: Optional[int] = None, expert: int = 2) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % expert == 0, (n, expert)
    return Mesh(
        np.asarray(devices).reshape(n // expert, expert), ("data", "expert")
    )


def ep_param_specs(params: MoeParams) -> MoeParams:
    """Experts shard their leading (E) axis; the router replicates."""
    return MoeParams(
        router=P(),
        w_fc=P("expert"),
        b_fc=P("expert"),
        w_out=P("expert"),
        b_out=P("expert"),
    )


def shard_params_ep(mesh: Mesh, params: MoeParams) -> MoeParams:
    n_shards = mesh.shape["expert"]
    n_experts = params.w_fc.shape[0]
    assert n_experts % n_shards == 0, (
        f"n_experts {n_experts} must divide evenly into {n_shards} expert shards"
    )
    specs = ep_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
