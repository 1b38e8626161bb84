"""Pipeline parallelism over the transformer trunk (BEYOND-PARITY).

The reference has no pipeline parallelism (SURVEY §2.2 — DDP only, and
~20M params need none). This module provides the seam for recipes that
outgrow one chip's HBM: a GPipe-style microbatched schedule over a
`pipe` mesh axis, built the TPU-native way — `shard_map` + collective
`ppermute` rotation, with the layer-stacked parameter layout
(models/transformer.py BlockParams, leading axis = layer) sharded
directly on the pipe axis. Composes with data parallelism on a
(data, pipe) mesh: the batch shards over `data`, the layer stack over
`pipe`.

Schedule (S stages, M microbatches, T = M + S - 1 ticks):

  tick t: stage s processes microbatch m = t - s (when 0 <= m < M);
  stage 0 ingests the embedding of microbatch t, every other stage the
  activation ppermuted from stage s-1 at tick t-1; the last stage
  accumulates its finished microbatch into the output buffer.

Each device runs an identical program (SPMD); inactive ticks compute on
garbage that is masked out of the output and never reaches the loss, so
JAX AD through the scan + ppermute yields exactly the pipelined
backward (bubble fraction (S-1)/(M+S-1), standard GPipe).

Like the reference's own deployment, this targets the transformer trunk
(the parameter-dominant component); the EGNN encoder and projection
heads stay data-parallel.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coati_tpu.models.transformer import (
    TransformerConfig,
    TransformerParams,
    _block_full,
    embed_tokens,
    layer_norm,
    stop_token_hidden,
)
from coati_tpu.ops.layers import cast_floats, linear
from coati_tpu.ops.rotary import rotary_tables


def make_pp_mesh(n_devices: Optional[int] = None, pipe: int = 2) -> Mesh:
    """(data = n/pipe) x (pipe) mesh; the pipe axis should map to
    neighboring ICI links (ppermute is nearest-neighbor traffic)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % pipe == 0, (n, pipe)
    return Mesh(np.asarray(devices).reshape(n // pipe, pipe), ("data", "pipe"))


def pp_param_specs(params: TransformerParams) -> TransformerParams:
    """PartitionSpecs: block stacks shard their LAYER axis over `pipe`
    (stage s holds layers [s*L/S, (s+1)*L/S)); everything else
    (embedding, final LN, lm_head) replicates."""
    specs = jax.tree_util.tree_map(lambda _: P(), params)
    return specs.replace(
        blocks=jax.tree_util.tree_map(lambda _: P("pipe"), params.blocks)
    )


def shard_params_pp(mesh: Mesh, params: TransformerParams) -> TransformerParams:
    n_stages = mesh.shape["pipe"]
    n_layer = params.blocks.w_attn.shape[0]
    assert n_layer % n_stages == 0, (
        f"n_layer {n_layer} must divide evenly into {n_stages} pipeline stages"
    )
    specs = pp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _stage_hidden(
    params: TransformerParams,
    cfg: TransformerConfig,
    tokens: jnp.ndarray,
    n_microbatches: int,
    n_stages: int,
    injection: Optional[jnp.ndarray],
    inject_token: Optional[int],
    pipe_axis: str,
):
    """Per-device GPipe schedule body. tokens: (B_local, T). Returns the
    final-LN hidden (B_local, T, D) — valid ONLY on the last stage (zeros
    elsewhere; callers mask or psum over the pipe axis)."""
    b, t = tokens.shape
    m_count, s_count = n_microbatches, n_stages
    assert b % m_count == 0, (b, m_count)
    bm = b // m_count
    params = cast_floats(params, cfg.compute_dtype)
    cos, sin = rotary_tables(cfg.n_seq, cfg.head_dim)
    cos = cos.astype(cfg.compute_dtype)
    sin = sin.astype(cfg.compute_dtype)
    s = jax.lax.axis_index(pipe_axis)

    # embedding stream: every stage computes it (one cheap gather); the
    # where-select below makes only stage 0's flow forward — which also
    # keeps the tok_emb gradient correct (zero cotangent elsewhere)
    emb = embed_tokens(params, cfg, tokens, injection, inject_token)
    emb = emb.reshape(m_count, bm, t, cfg.n_embd)

    def run_local_blocks(x):
        def body(x, blk):
            return _block_full(x, blk, cfg, cos, sin), None

        if cfg.remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, params.blocks)
        return x

    def tick(carry, tk):
        buf, out = carry
        m = tk - s  # microbatch index this stage handles at this tick
        feed = jax.lax.dynamic_index_in_dim(
            emb, jnp.clip(tk, 0, m_count - 1), 0, keepdims=False
        )
        x = jnp.where(s == 0, feed, buf)
        x = run_local_blocks(x)
        # last stage stores its finished microbatch
        write = jnp.clip(m, 0, m_count - 1)
        active = (m >= 0) & (m < m_count) & (s == s_count - 1)
        cur = jax.lax.dynamic_index_in_dim(out, write, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(active, x, cur), write, 0
        )
        # rotate activations one stage forward (ring; the wrap-around
        # edge only ever carries inactive garbage)
        buf = jax.lax.ppermute(
            x, pipe_axis, [(i, (i + 1) % s_count) for i in range(s_count)]
        )
        return (buf, out), None

    buf0 = jnp.zeros((bm, t, cfg.n_embd), cfg.compute_dtype)
    out0 = jnp.zeros((m_count, bm, t, cfg.n_embd), cfg.compute_dtype)
    (_, out), _ = jax.lax.scan(
        tick, (buf0, out0), jnp.arange(m_count + s_count - 1)
    )
    hidden = out.reshape(b, t, cfg.n_embd)
    hidden = layer_norm(hidden, params.lnf_scale, params.lnf_bias)
    # zero non-last stages so a plain psum broadcasts the real result
    return jnp.where(s == s_count - 1, hidden, jnp.zeros_like(hidden))


def make_pp_forward_logits(
    mesh: Mesh,
    cfg: TransformerConfig,
    params_template: TransformerParams,
    n_microbatches: int,
    inject_token: Optional[int] = None,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
):
    """Build a jitted pipelined forward: (params, tokens[, injection]) ->
    logits (B, T, V), numerically identical to transformer.forward_logits.
    Verification/inference convenience — the train step keeps the loss
    in-stage instead of broadcasting full logits."""
    n_stages = mesh.shape[pipe_axis]
    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    batch_spec = P(data_axis) if has_data else P()
    p_specs = pp_param_specs(params_template)
    with_injection = inject_token is not None

    def fn(params, tokens, injection=None):
        hidden = _stage_hidden(
            params, cfg, tokens, n_microbatches, n_stages,
            injection, inject_token, pipe_axis,
        )
        hidden = jax.lax.psum(hidden, pipe_axis)
        return linear(hidden, params.lm_head, None, cfg.mm_precision)

    if with_injection:
        mapped = shard_map(
            fn, mesh=mesh,
            in_specs=(p_specs, batch_spec, batch_spec),
            out_specs=batch_spec,
            check_vma=False,
        )
    else:
        mapped = shard_map(
            lambda p, tok: fn(p, tok), mesh=mesh,
            in_specs=(p_specs, batch_spec),
            out_specs=batch_spec,
            check_vma=False,
        )
    return jax.jit(mapped)


def pp_coati_param_specs(params):
    """PartitionSpecs for the COMPOSITE CoatiParams under DP x PP: the
    transformer block stack shards its layer axis over `pipe`; the EGNN
    encoder, projections, token MLP, embedding, final LN and lm_head
    replicate."""
    specs = jax.tree_util.tree_map(lambda _: P(), params)
    return specs.replace(xformer=pp_param_specs(params.xformer))


def shard_coati_params_pp(mesh: Mesh, params):
    n_stages = mesh.shape["pipe"]
    n_layer = params.xformer.blocks.w_attn.shape[0]
    assert n_layer % n_stages == 0, (n_layer, n_stages)
    specs = pp_coati_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_pp_coati_train_step(
    mesh: Mesh,
    model_cfg,
    params_template,
    optimizer: optax.GradientTransformation,
    *,
    stop_token: int,
    unk_token: int,
    p_clip_emb_smi: float,
    token_entropy_unit: float,
    n_microbatches: int,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
):
    """DP x PP train step for the FULL COATI model (clip_e2e.py:772-845):
    EGNN point encoder + both trunk passes + projections + AR and global
    CLIP losses — the composite step that actually pretrains, not just
    the bare trunk. (params, opt_state, rng, batch) -> (params,
    opt_state, metrics); batch = {raw_tokens, tokens, y_next, atoms,
    coords} sharded over `data`.

    Placement: both trunk passes (clean encode + injected AR) run
    through the GPipe schedule over `pipe`; the EGNN, projections and
    token MLP are replicated per stage (parameter-light, compute-cheap
    next to the trunk). Gradient correctness with redundant per-stage
    compute: exactly ONE stage's copy of each replicated computation
    receives cotangent — the embedding where-select masks injection use
    to stage 0, the AR loss masks to the last stage, and the CLIP term
    is explicitly masked to stage 0 — so `psum` over `pipe` on
    replicated leaves sums one real contribution plus zeros. AR loss is
    the global-valid-token mean and CLIP is over the `data`-gathered
    batch, matching the pjit train step exactly (equality-tested)."""
    n_stages = mesh.shape[pipe_axis]
    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    batch_spec = P(data_axis) if has_data else P()
    p_specs = pp_coati_param_specs(params_template)
    # differentiated path: never auto-select the flash prefill kernel
    # (its custom VJP replays the XLA forward — flash_attention.py)
    xcfg = model_cfg.xformer_config.replace(prefill_kernel="xla")

    from coati_tpu.models import coati as F

    def local_loss(params, rng, batch):
        s = jax.lax.axis_index(pipe_axis)
        if has_data:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        # ---- replicated encoders (every stage computes identically)
        h_e3gnn = F.encode_points(
            params, model_cfg, batch["atoms"], batch["coords"]
        )
        # ---- trunk pass 1 (clean tokens) through the pipe
        hidden = _stage_hidden(
            params.xformer, xcfg, batch["raw_tokens"], n_microbatches,
            n_stages, None, None, pipe_axis,
        )
        h_stop = stop_token_hidden(hidden, batch["raw_tokens"], stop_token)
        h_stop = jax.lax.psum(h_stop, pipe_axis)  # (B, D) from last stage
        proj = cast_floats(params.smiles_to_clip, xcfg.compute_dtype)
        h_smiles = F.apply_projection(
            proj, h_stop, model_cfg.old_architecture, xcfg.mm_precision
        )
        # ---- clip-token choice (identical across stages: same rng)
        point_tok = F.clip_to_special_token(params, h_e3gnn)
        smiles_tok = F.clip_to_special_token(params, h_smiles)
        pick_point = (
            jax.random.uniform(rng, (h_e3gnn.shape[0], 1)) > p_clip_emb_smi
        )
        clip_token = jnp.where(pick_point, point_tok, smiles_tok)
        # ---- trunk pass 2 (augmented tokens + injection) through the pipe
        hidden2 = _stage_hidden(
            params.xformer, xcfg, batch["tokens"], n_microbatches,
            n_stages, clip_token, unk_token, pipe_axis,
        )
        last = s == n_stages - 1
        logits = linear(
            hidden2, params.xformer.lm_head, None, xcfg.mm_precision
        )
        y_next = batch["y_next"]
        valid = y_next != -1
        safe = jnp.where(valid, y_next, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll_sum = jnp.where(last, jnp.sum(jnp.where(valid, nll, 0.0)), 0.0)
        count = jnp.where(last, jnp.sum(valid), 0)
        nll_sum = jax.lax.psum(nll_sum, pipe_axis)
        count = jax.lax.psum(count, pipe_axis)
        if has_data:
            nll_sum = jax.lax.psum(nll_sum, data_axis)
            count = jax.lax.psum(count, data_axis)
        ar = nll_sum / jnp.maximum(count, 1)
        # ---- global CLIP loss, masked to stage 0 so replicated-encoder
        # gradients are produced by exactly one stage
        bad_rows = jnp.sum(batch["tokens"], axis=-1) < 1
        if has_data:
            all_hs = jax.lax.all_gather(h_smiles, data_axis, axis=0, tiled=True)
            all_he = jax.lax.all_gather(h_e3gnn, data_axis, axis=0, tiled=True)
            all_bad = jax.lax.all_gather(bad_rows, data_axis, axis=0, tiled=True)
        else:
            all_hs, all_he, all_bad = h_smiles, h_e3gnn, bad_rows
        cl_local = jnp.where(
            s == 0, F.clip_loss(all_hs, all_he, all_bad), 0.0
        )
        cl = jax.lax.psum(cl_local, pipe_axis)
        loss = ar + cl * token_entropy_unit
        return loss, (ar, cl)

    def grad_fn(params, rng, batch):
        (loss, (ar, cl)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, rng, batch)

        def reduce_grad(g, spec):
            if has_data:
                g = jax.lax.psum(g, data_axis)
            if spec == P():  # replicated leaf: one stage holds the real grad
                g = jax.lax.psum(g, pipe_axis)
            return g

        grads = jax.tree_util.tree_map(reduce_grad, grads, p_specs)
        return loss, ar, cl, grads

    mapped_grads = shard_map(
        grad_fn, mesh=mesh,
        in_specs=(p_specs, P(), {k: batch_spec for k in
                                 ("raw_tokens", "tokens", "y_next",
                                  "atoms", "coords")}),
        out_specs=(P(), P(), P(), p_specs),
        check_vma=False,
    )

    def step(params, opt_state, rng, batch):
        loss, ar, cl, grads = mapped_grads(params, rng, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {
            "loss": loss, "ar_loss": ar, "clip_loss": cl
        }

    return jax.jit(step, donate_argnums=(0, 1))


def make_pp_ar_train_step(
    mesh: Mesh,
    cfg: TransformerConfig,
    params_template: TransformerParams,
    optimizer: optax.GradientTransformation,
    *,
    n_microbatches: int,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
):
    """Build the jitted DP x PP autoregressive train step:
    (params, opt_state, batch{tokens, y_next}) -> (params, opt_state,
    metrics).

    The cross-entropy is computed in-stage on the last pipeline stage
    (masked sum/count, psum'd to a global mean), so full logits never
    leave a device. The loss/grad runs inside shard_map; the optimizer
    update runs on the global sharded arrays under the same jit (GSPMD
    keeps elementwise updates sharded in place). Gradient reduction:
    every leaf psums over `data` (the forward's global-mean psum makes
    per-device grads exactly the local-batch contribution), and
    replicated leaves additionally psum over `pipe` (block grads are
    stage-local-complete by construction)."""
    # differentiated path: never auto-select the flash prefill kernel
    # (its custom VJP replays the XLA forward — flash_attention.py)
    cfg = cfg.replace(prefill_kernel="xla")
    n_stages = mesh.shape[pipe_axis]
    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    batch_spec = P(data_axis) if has_data else P()
    p_specs = pp_param_specs(params_template)

    def local_loss(params, tokens, y_next):
        hidden = _stage_hidden(
            params, cfg, tokens, n_microbatches, n_stages,
            None, None, pipe_axis,
        )
        last = jax.lax.axis_index(pipe_axis) == n_stages - 1
        logits = linear(hidden, params.lm_head, None, cfg.mm_precision)
        valid = y_next != -1
        safe = jnp.where(valid, y_next, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll_sum = jnp.where(last, jnp.sum(jnp.where(valid, nll, 0.0)), 0.0)
        count = jnp.where(last, jnp.sum(valid), 0)
        nll_sum = jax.lax.psum(nll_sum, pipe_axis)
        count = jax.lax.psum(count, pipe_axis)
        if has_data:
            nll_sum = jax.lax.psum(nll_sum, data_axis)
            count = jax.lax.psum(count, data_axis)
        return nll_sum / jnp.maximum(count, 1)

    def grad_fn(params, tokens, y_next):
        loss, grads = jax.value_and_grad(local_loss)(params, tokens, y_next)

        def reduce_grad(g, spec):
            if has_data:
                g = jax.lax.psum(g, data_axis)
            if spec == P():  # replicated leaf: sum the per-stage partials
                g = jax.lax.psum(g, pipe_axis)
            return g

        grads = jax.tree_util.tree_map(reduce_grad, grads, p_specs)
        return loss, grads

    mapped_grads = shard_map(
        grad_fn, mesh=mesh,
        in_specs=(p_specs, batch_spec, batch_spec),
        out_specs=(P(), p_specs),
        check_vma=False,
    )

    def step(params, opt_state, batch):
        loss, grads = mapped_grads(params, batch["tokens"], batch["y_next"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0, 1))
