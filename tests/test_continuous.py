"""Continuous-batching decode engine (serving/continuous.py):
ragged-position decode parity, engine-vs-sampler token equality, slot
recycling bookkeeping, and concurrent submission."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coati_tpu.models.sampler import generate_with_injection_batch
from coati_tpu.models.transformer import (
    TransformerConfig,
    decode_step,
    decode_step_ragged,
    init_transformer,
    make_empty_cache,
)
from coati_tpu.serving.continuous import ContinuousDecoder

STOP, PAD, UNK = 3, 0, 4
PREFIX = [5, UNK, 6]


def _cfg(**kw):
    base = dict(
        n_layer=2, n_embd=64, n_head=4, n_seq=32, n_tok=64,
    )
    base.update(kw)
    return TransformerConfig(**base)


@pytest.mark.parametrize("kv_dtype", ["compute", "int8"])
def test_ragged_equals_uniform(kv_dtype):
    """decode_step_ragged with a constant pos vector must reproduce
    decode_step exactly (logits and cache), fp32 and int8."""
    cfg = _cfg(kv_dtype=kv_dtype)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    b = 5
    token = jax.random.randint(jax.random.PRNGKey(1), (b,), 0, cfg.n_tok)
    cache_u = make_empty_cache(cfg, b)
    cache_r = make_empty_cache(cfg, b)
    for pos in (0, 1, 7):
        lg_u, cache_u = decode_step(
            params, cfg, token, jnp.asarray(pos), cache_u
        )
        lg_r, cache_r = decode_step_ragged(
            params, cfg, token, jnp.full((b,), pos, jnp.int32), cache_r
        )
        np.testing.assert_allclose(
            np.asarray(lg_r), np.asarray(lg_u), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(cache_r.data), np.asarray(cache_u.data)
        )
        token = jnp.argmax(lg_u, -1)


@pytest.mark.parametrize("kv_dtype", ["compute", "int8"])
def test_ring_equals_uniform(kv_dtype):
    """decode_step_ring at uniform positions with clock == lpos must
    reproduce decode_step exactly (the unwrapped ring is the linear
    cache)."""
    from coati_tpu.models.transformer import decode_step_ring

    cfg = _cfg(kv_dtype=kv_dtype)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    b = 5
    token = jax.random.randint(jax.random.PRNGKey(1), (b,), 0, cfg.n_tok)
    cache_u = make_empty_cache(cfg, b)
    cache_r = make_empty_cache(cfg, b)
    for pos in range(4):
        lg_u, cache_u = decode_step(
            params, cfg, token, jnp.asarray(pos), cache_u
        )
        lg_r, cache_r = decode_step_ring(
            params, cfg, token,
            jnp.full((b,), pos, jnp.int32), jnp.asarray(pos), cache_r,
        )
        np.testing.assert_allclose(
            np.asarray(lg_r), np.asarray(lg_u), atol=1e-5, rtol=1e-5
        )
        token = jnp.argmax(lg_u, -1)


def test_ring_wraparound():
    """A row whose history spans the ring seam must attend the same
    keys as a linear cache: advance a row past W_ring and compare
    against decode_step on a wide linear cache."""
    from coati_tpu.models.transformer import decode_step_ring

    cfg = _cfg(n_seq=64)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    b, w_ring, depth = 2, 16, 24  # history 10 < w_ring, total steps wrap
    keep = 10  # row restarted at step depth-keep so live history fits

    tok0 = jax.random.randint(jax.random.PRNGKey(1), (b,), 1, cfg.n_tok)
    cache_r = make_empty_cache(cfg, b, width=w_ring)
    cache_l = make_empty_cache(cfg, b, width=64)
    t_r = t_l = tok0
    lg_r = lg_l = None
    lpos = jnp.zeros((b,), jnp.int32)
    for step in range(depth):
        restart = step == depth - keep
        if restart:
            # "re-admission": logical position resets mid-ring
            lpos = jnp.zeros((b,), jnp.int32)
            t_r = tok0 + 1
            t_l = tok0 + 1
            cache_l = make_empty_cache(cfg, b, width=64)
        lg_r, cache_r = decode_step_ring(
            params, cfg, t_r, lpos, jnp.asarray(step % w_ring), cache_r
        )
        lg_l, cache_l = decode_step_ring(
            params, cfg, t_l, lpos,
            jnp.asarray(int(lpos[0])), cache_l,
        )
        np.testing.assert_allclose(
            np.asarray(lg_r), np.asarray(lg_l), atol=2e-5, rtol=2e-5
        )
        t_r = t_l = jnp.argmax(lg_l, -1)
        lpos = lpos + 1


def test_truly_ragged_positions():
    """Rows at DIFFERENT positions: each row's logits must equal the
    same row advanced through uniform decode_step calls on its own."""
    cfg = _cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    b = 3
    depths = [1, 3, 6]
    tok0 = jax.random.randint(jax.random.PRNGKey(1), (b,), 1, cfg.n_tok)

    # independently advance each row to its own depth (greedy)
    per_row_logits = []
    per_row_caches = []
    for row in range(b):
        cache = make_empty_cache(cfg, 1)
        t = tok0[row : row + 1]
        lg = None
        for pos in range(depths[row]):
            lg, cache = decode_step(params, cfg, t, jnp.asarray(pos), cache)
            t = jnp.argmax(lg, -1)
        per_row_logits.append(np.asarray(lg[0]))
        per_row_caches.append(cache)

    # replay the same trajectories through ONE ragged pool
    cache = make_empty_cache(cfg, b)
    pos = jnp.zeros((b,), jnp.int32)
    t = tok0
    lg_last = np.zeros((b, cfg.n_tok), np.float32)
    for step in range(max(depths)):
        active = np.asarray([step < d for d in depths])
        lg, cache2 = decode_step_ragged(params, cfg, t, pos, cache)
        # freeze retired rows: keep their cache/pos/token unchanged
        mask = jnp.asarray(active)
        cache = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                mask[None, None, :, None, None, None]
                if new.ndim == 6 else mask[None, None, :, None, None],
                new, old,
            ),
            cache2, cache,
        )
        lg_np = np.asarray(lg)
        lg_last = np.where(active[:, None], lg_np, lg_last)
        t = jnp.where(mask, jnp.argmax(lg, -1), t)
        pos = jnp.where(mask, pos + 1, pos)

    for row in range(b):
        np.testing.assert_allclose(
            lg_last[row], per_row_logits[row], atol=2e-5, rtol=2e-5
        )


def _greedy_reference(params, cfg, inj_rows):
    """Per-request greedy generation through the production sampler."""
    outs = []
    for row in inj_rows:
        toks = generate_with_injection_batch(
            params, cfg, jax.random.PRNGKey(0), PREFIX,
            jnp.asarray(row[None, :], jnp.float32),
            stop_token=STOP, pad_token=PAD, unk_token=UNK,
            k=1, inv_temp=2.0, total_len=cfg.n_seq,
        )
        outs.append(np.asarray(toks[0]))
    return outs


def _trim(tokens, w):
    """Engine rows end at stop (inclusive); sampler rows are width-W
    with pad after stop. Compare the generated region."""
    out = list(tokens)
    if STOP in out:
        out = out[: out.index(STOP) + 1]
    return out[:w]


def test_engine_matches_sampler_greedy():
    """k=1 engine output must equal the fused sampler's greedy output
    per request, while slots recycle (6 requests through 2 slots)."""
    cfg = _cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    inj = rng.normal(size=(6, cfg.n_embd)).astype(np.float32) * 2.0

    eng = ContinuousDecoder(
        params, cfg, PREFIX, n_slots=2, stop_token=STOP, pad_token=PAD,
        inject_token=UNK, k=1, inv_temp=2.0, segment_len=8,
    )
    rids = [eng.submit(inj[i]) for i in range(6)]
    results = eng.run_until_done()
    assert sorted(results) == sorted(rids)

    refs = _greedy_reference(params, cfg, inj)
    for rid, ref in zip(rids, refs):
        got = _trim(results[rid], cfg.n_seq)
        want = _trim(ref, cfg.n_seq)
        assert got == want, f"request {rid}: {got} != {want}"


def test_engine_int8_cache():
    cfg = _cfg(dtype="bfloat16", kv_dtype="int8")
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    inj = rng.normal(size=(3, cfg.n_embd)).astype(np.float32)
    eng = ContinuousDecoder(
        params, cfg, PREFIX, n_slots=2, stop_token=STOP, pad_token=PAD,
        inject_token=UNK, k=1, segment_len=4,
    )
    for i in range(3):
        eng.submit(inj[i])
    results = eng.run_until_done()
    assert len(results) == 3
    for toks in results.values():
        assert list(toks[:3]) == PREFIX


def test_per_request_max_new_tokens():
    """Budgeted requests retire at their own token budget while
    co-batched unbudgeted rows keep going (a random-weight model rarely
    emits [STOP], so the budgets bind)."""
    cfg = _cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    eng = ContinuousDecoder(
        params, cfg, PREFIX, n_slots=4, stop_token=STOP, pad_token=PAD,
        inject_token=UNK, k=5, segment_len=4,
    )
    budgets = [2, 6, 11, None]
    rids = [
        eng.submit(rng.normal(size=(cfg.n_embd,)), max_new_tokens=b)
        for b in budgets
    ]
    results = eng.run_until_done()
    for rid, b in zip(rids, budgets):
        toks = results[rid]
        cap = (b if b is not None else cfg.n_seq - len(PREFIX))
        assert len(toks) <= len(PREFIX) + cap
        if STOP not in list(toks):
            # budget-bound row: fills its budget exactly
            assert len(toks) == len(PREFIX) + cap


def test_concurrent_submission():
    """Producer threads submit while the engine thread drains — every
    request completes exactly once."""
    cfg = _cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    eng = ContinuousDecoder(
        params, cfg, PREFIX, n_slots=4, stop_token=STOP, pad_token=PAD,
        inject_token=UNK, k=1, segment_len=4,
    )
    rids, rid_lock = [], threading.Lock()

    def producer(n):
        for _ in range(n):
            r = eng.submit(rng.normal(size=(cfg.n_embd,)))
            with rid_lock:
                rids.append(r)

    threads = [threading.Thread(target=producer, args=(3,)) for _ in range(3)]
    for t in threads:
        t.start()
    # drive the engine while producers are racing
    for _ in range(300):
        alive = any(t.is_alive() for t in threads)
        eng.step()
        if not alive and not eng._pending and not eng.n_active:
            break
    for t in threads:
        t.join()
    results = eng.run_until_done()
    assert sorted(results) == sorted(rids)
    assert len(results) == 9


def _coati2_model():
    """Tiny REAL COATI2 (models/coati2.py) — the flagship published
    family (reference simple_coati2/transformer_only.py:43)."""
    from coati_tpu.models.coati2 import COATI2, Coati2Config, init_coati2
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=40, **get_vocab("coati2_12_12"))
    cfg = Coati2Config(
        n_layer_xformer=2, n_hidden_xformer=32, embed_dim=32, n_head=2,
        n_seq=40, n_tok=tok.n_token, precision="highest",
    )
    model = COATI2(init_coati2(jax.random.PRNGKey(3), cfg), cfg)
    return model, tok


def test_engine_matches_coati2_greedy():
    """The server's COATI2 continuous branch: engine k=1 output (raw
    h_coati submitted, coati_to_token applied INSIDE the admission
    program) must equal hcoati_to_2d_batch's k=1 tokens per request,
    while slots recycle (5 requests through 2 slots)."""
    from coati_tpu.models.coati2 import apply_swiglu_resnet

    model, tok = _coati2_model()
    cfg = model.config
    xcfg = cfg.xformer_config
    rng = np.random.default_rng(4)
    h = rng.normal(size=(5, cfg.embed_dim)).astype(np.float32)

    smiles_ref, tokens_ref = model.hcoati_to_2d_batch(
        h, tok, inv_temp=20.0, k=1, return_tokens=True, keep_special=True
    )

    prefix = list(tok.tokenize_text("[CLIP][UNK][SMILES]", pad=False))

    def inj_transform(hh):
        return apply_swiglu_resnet(
            model.params.coati_to_token, hh.astype(xcfg.compute_dtype),
            xcfg.mm_precision,
        )

    eng = ContinuousDecoder(
        model.params.xformer, xcfg, prefix, n_slots=2,
        stop_token=tok.stop_token, pad_token=tok.pad_token,
        inject_token=tok.unk_token, k=1, inv_temp=20.0, segment_len=8,
        inj_transform=inj_transform, inj_dim=cfg.embed_dim,
    )
    # budget below the cap: random weights never emit [STOP] at a
    # 4157-token vocab, and at the n_seq cap the two surfaces disagree
    # benignly (engine fills the final slot with a sampled token, the
    # sampler leaves pad) — every BUDGETED position must match exactly
    budget = 20
    rids = [eng.submit(h[i], max_new_tokens=budget) for i in range(5)]
    results = eng.run_until_done()
    assert sorted(results) == sorted(rids)
    stop = tok.stop_token
    for rid, ref in zip(rids, tokens_ref):
        got = list(results[rid])
        want = list(ref)
        if stop in want:
            want = want[: want.index(stop) + 1]
        want = want[: len(prefix) + budget]
        assert len(got) == len(want)
        assert got == want, f"request {rid}: {got} != {want}"
        # and the decoded string matches the reference decode surface
        assert tok.decode(got[len(prefix):], special=False) \
            == tok.decode(want[len(prefix):], special=False)


def test_engine_sharded_matches_single():
    """Slot pool sharded over an 8-device mesh (round 5: multi-device
    continuous serving): k=1 output token-identical to the 1-device
    engine while slots recycle (6 requests through 4 slots, pool padded
    to 8 rows for the mesh)."""
    from coati_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    inj = rng.normal(size=(6, cfg.n_embd)).astype(np.float32) * 2.0

    def run(mesh):
        eng = ContinuousDecoder(
            params, cfg, PREFIX, n_slots=4, stop_token=STOP, pad_token=PAD,
            inject_token=UNK, k=1, inv_temp=2.0, segment_len=8, mesh=mesh,
        )
        if mesh is not None:
            assert eng.n_rows % mesh.devices.size == 0
        rids = [eng.submit(inj[i]) for i in range(6)]
        return rids, eng.run_until_done()

    rids1, res1 = run(None)
    rids8, res8 = run(make_mesh(8))
    for a, b in zip(rids1, rids8):
        assert list(res1[a]) == list(res8[b]), (res1[a], res8[b])
