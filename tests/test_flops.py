"""Verify the analytic FLOP formulas (training/flops.py) against XLA.

XLA's `compiled.cost_analysis()` is exact for straight-line programs but
counts a while-loop (lax.scan) body ONCE — which is exactly why
flops.py exists. So the check here builds UN-scanned programs (a Python
loop over layers, every layer inlined into the HLO) and differences the
XLA-counted FLOPs of an (L+1)-layer program against an L-layer program:
the difference is XLA's exact per-layer count, embed/decoder/head costs
cancel, and the analytic per-layer formula must match it up to the
elementwise work (layer norms, gelu/silu, softmax, residual adds) that
MFU accounting deliberately excludes.
"""

import jax
import jax.numpy as jnp
import pytest

from coati_tpu.models.egnn import (
    EgnnConfig,
    _egnn_layer,
    cubic_cutoff,
    init_egnn,
)
from coati_tpu.models.transformer import (
    TransformerConfig,
    _block_full,
    embed_tokens,
    init_transformer,
    layer_norm,
    linear,
)
from coati_tpu.ops.rotary import rotary_tables
from coati_tpu.training.diagnostics import compiled_cost
from coati_tpu.training.flops import (
    egnn_pass_flops,
    transformer_pass_flops,
)


def _xla_flops(fn, *args):
    _, cost = compiled_cost(jax.jit(fn), *args)
    flops = cost["flops"]
    if not jnp.isfinite(flops):
        pytest.skip("backend does not report cost_analysis flops")
    return float(flops)


# --------------------------------------------------------- transformer


def _unscanned_trunk(params, cfg, tokens, n_layer, with_head):
    """forward_hidden with the scan unrolled into straight-line HLO."""
    cos, sin = rotary_tables(cfg.n_seq, cfg.head_dim)
    x = embed_tokens(params, cfg, tokens)
    for i in range(n_layer):
        blk = jax.tree.map(lambda a, i=i: a[i], params.blocks)
        x = _block_full(x, blk, cfg, cos, sin)
    x = layer_norm(x, params.lnf_scale, params.lnf_bias)
    if with_head:
        x = linear(x, params.lm_head, None, cfg.mm_precision)
    return x


@pytest.mark.parametrize("batch,seq,d", [(4, 64, 128)])
def test_transformer_layer_flops(batch, seq, d):
    cfg = TransformerConfig(
        n_layer=2, n_embd=d, n_head=4, n_seq=seq, n_tok=96
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((batch, seq), jnp.int32)

    f1 = _xla_flops(
        lambda p, t: _unscanned_trunk(p, cfg, t, 1, False), params, tokens
    )
    f2 = _xla_flops(
        lambda p, t: _unscanned_trunk(p, cfg, t, 2, False), params, tokens
    )
    measured = f2 - f1
    analytic = transformer_pass_flops(1, d, batch, seq)
    # analytic counts matmuls only -> a strict lower bound; elementwise
    # (2 layer norms, rotary, softmax, gelu, residual adds) is the gap
    assert measured >= 0.999 * analytic
    assert measured <= 1.25 * analytic
    # and the matmul share must dominate: the excluded work stays small
    assert analytic / measured > 0.80


@pytest.mark.parametrize("batch,seq,d,n_tok", [(4, 64, 128, 96)])
def test_logits_head_flops(batch, seq, d, n_tok):
    cfg = TransformerConfig(
        n_layer=1, n_embd=d, n_head=4, n_seq=seq, n_tok=n_tok
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((batch, seq), jnp.int32)

    f_no = _xla_flops(
        lambda p, t: _unscanned_trunk(p, cfg, t, 1, False), params, tokens
    )
    f_head = _xla_flops(
        lambda p, t: _unscanned_trunk(p, cfg, t, 1, True), params, tokens
    )
    measured = f_head - f_no
    analytic = transformer_pass_flops(
        1, d, batch, seq, n_tok=n_tok, logits=True
    ) - transformer_pass_flops(1, d, batch, seq)
    # pure matmul difference -> exact
    assert measured == pytest.approx(analytic, rel=1e-6)


# --------------------------------------------------------------- egnn


def _unscanned_egnn_layers(params, cfg, h, d2, msg_weight, n_layers):
    """The scan body of egnn_forward, unrolled (preamble excluded —
    it cancels in the layer differencing)."""
    for i in range(n_layers):
        layer = jax.tree.map(lambda a, i=i: a[i], params.layers)
        h = _egnn_layer(h, layer, cfg, d2, msg_weight, None)
    return h


@pytest.mark.parametrize("residual", [False, True])
def test_egnn_layer_flops(residual):
    batch, natoms, hidden = 2, 32, 128
    # dense jnp path: the Pallas kernel is a custom call whose interior
    # is invisible to cost_analysis (the very undercount flops.py fixes)
    cfg = EgnnConfig(
        hidden_nf=hidden,
        n_layers=2,
        fused_messages=False,
        remat=False,
        residual=residual,
    )
    params = init_egnn(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (batch, natoms, hidden), jnp.float32)
    # residual h0 is the RAW embedding input (in_node_nf wide), not the
    # hidden state — see egnn_forward's `h0 = nodes`
    h0 = (
        jax.random.normal(key, (batch, natoms, cfg.in_node_nf), jnp.float32)
        if residual
        else None
    )
    d2 = jnp.abs(jax.random.normal(key, (batch, natoms, natoms)))
    msg_weight = cubic_cutoff(jnp.sqrt(d2), cfg.message_cutoff)

    def run(n):
        def fn(p, hh, dd, ww):
            x = hh
            for i in range(n):
                layer = jax.tree.map(lambda a, i=i: a[i], p.layers)
                x = _egnn_layer(x, layer, cfg, dd, ww, h0)
            return x

        return _xla_flops(fn, params, h, d2, msg_weight)

    measured = run(2) - run(1)
    # isolate the analytic per-layer term: pass minus embed/decoder
    analytic = egnn_pass_flops(
        1, hidden, batch, natoms, residual=residual
    ) - egnn_pass_flops(0, hidden, batch, natoms, residual=residual)
    assert measured >= 0.999 * analytic
    assert measured <= 1.25 * analytic
    assert analytic / measured > 0.80
