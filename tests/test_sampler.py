"""Sampler tests: greedy equivalence vs the torch oracle, decode-step
self-consistency vs the full forward, and stop/pad bookkeeping."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coati_tpu.models.convert import convert_transformer
from coati_tpu.models.sampler import (
    generate_prefix_batch,
    generate_with_injection_batch,
)
from coati_tpu.models.transformer import (
    TransformerConfig,
    decode_step,
    forward_logits,
    make_empty_cache,
    prefill,
)

from .oracle import load

CFG = TransformerConfig(
    n_layer=2, n_embd=32, n_head=2, n_seq=24, n_tok=40, precision="highest"
)
STOP, PAD, UNK = 2, 0, 1


def make_pair(seed=0):
    sx = load("ref_smiles_xformer")
    torch.manual_seed(seed)
    ref_cfg = sx.SmilesTransformerConfig(
        n_layer=CFG.n_layer,
        n_embd=CFG.n_embd,
        n_head=CFG.n_head,
        n_seq=CFG.n_seq,
        n_tok=CFG.n_tok,
        biases=True,
        norm_embed=False,
        device=torch.device("cpu"),
        dtype=torch.float32,
    )
    ref = sx.RotarySmilesTransformer(ref_cfg)
    ref.eval()
    return ref, convert_transformer(ref.state_dict(), CFG)


def test_decode_step_matches_full_forward():
    """Prefill + sequential decode_step logits == full-forward logits."""
    _, params = make_pair(seed=1)
    rng = np.random.default_rng(2)
    toks = rng.integers(3, CFG.n_tok, size=(3, 10)).astype(np.int32)
    full = np.asarray(forward_logits(params, CFG, jnp.asarray(toks)))

    p = 4
    cache = make_empty_cache(CFG, 3)
    hidden, cache = prefill(params, CFG, jnp.asarray(toks[:, :p]), cache=cache)
    logits_list = [np.asarray(hidden[:, -1] @ params.lm_head)]
    for pos in range(p, toks.shape[1]):
        logits, cache = decode_step(
            params, CFG, jnp.asarray(toks[:, pos]), jnp.asarray(pos), cache
        )
        logits_list.append(np.asarray(logits))
    stepped = np.stack(logits_list, axis=1)  # logits at positions p-1 .. T-1
    np.testing.assert_allclose(stepped, full[:, p - 1 :], atol=2e-5, rtol=1e-4)


def test_greedy_injection_matches_reference():
    """k=1 (deterministic) generation with payload injection must produce
    the exact token sequences the reference produces."""
    ref, params = make_pair(seed=3)
    b = 4
    prefix = [5, UNK, 6]
    payload = np.random.default_rng(4).normal(size=(b, CFG.n_embd)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.generate_top_k_with_inj_batch(
            prefix=prefix,
            stop_token=STOP,
            pad_token=PAD,
            inv_temp=1.0,
            k=1,
            inj_token=UNK,
            inj_payload=torch.tensor(payload),
        )
    mine = np.asarray(
        generate_with_injection_batch(
            params,
            CFG,
            jax.random.PRNGKey(0),
            prefix,
            jnp.asarray(payload),
            stop_token=STOP,
            pad_token=PAD,
            unk_token=UNK,
            k=1,
            inv_temp=1.0,
        )
    )
    for i in range(b):
        ref_row = ref_out[i]
        mine_row = list(mine[i][: len(ref_row)])
        assert mine_row == ref_row, (i, ref_row, mine_row)


def test_stop_pad_semantics():
    _, params = make_pair(seed=5)
    out = np.asarray(
        generate_with_injection_batch(
            params,
            CFG,
            jax.random.PRNGKey(1),
            [5, UNK, 6],
            jnp.asarray(np.random.default_rng(6).normal(size=(8, CFG.n_embd)), jnp.float32),
            stop_token=STOP,
            pad_token=PAD,
            unk_token=UNK,
            k=5,
            inv_temp=1.0,
        )
    )
    for row in out:
        stops = np.nonzero(row == STOP)[0]
        assert len(stops) >= 1  # every row terminates
        first = stops[0]
        # everything after the first stop is PAD
        assert np.all(row[first + 1 :] == PAD), row


def test_variable_prefix_preserved():
    _, params = make_pair(seed=7)
    prefixes = [[5, 6], [5, 6, 7, 8, 9], [5]]
    out = np.asarray(
        generate_prefix_batch(
            params,
            CFG,
            jax.random.PRNGKey(2),
            prefixes,
            stop_token=STOP,
            pad_token=PAD,
            k=4,
            inv_temp=2.0,
        )
    )
    for i, pf in enumerate(prefixes):
        assert list(out[i][: len(pf)]) == pf, (i, out[i], pf)
        stops = np.nonzero(out[i] == STOP)[0]
        assert len(stops) >= 1


def test_sampling_distribution_roughly_matches_reference():
    """Statistical check: first-token marginal distribution of my sampler
    vs the reference's multinomial(top-k softmax) on the same logits."""
    ref, params = make_pair(seed=8)
    prefix = [5, UNK, 6]
    payload = np.random.default_rng(9).normal(size=(1, CFG.n_embd)).astype(np.float32)
    k, inv_temp = 5, 2.0

    # reference first-token probabilities
    with torch.no_grad():
        x = ref.emb(torch.tensor([prefix], dtype=torch.long))
        x[0, 1] = torch.tensor(payload[0])
        logits = ref.xformer_blocks(x, apply_norm=True, output_logits=True)
        topv, topi = torch.topk(logits[0, len(prefix) - 1], k=k)
        ref_probs = torch.softmax(topv * inv_temp, dim=-1).numpy()
        ref_ids = topi.numpy()

    # empirical first-token frequencies from my sampler
    n = 4000
    out = np.asarray(
        generate_with_injection_batch(
            params,
            CFG,
            jax.random.PRNGKey(3),
            prefix,
            jnp.asarray(np.tile(payload, (n, 1))),
            stop_token=STOP,
            pad_token=PAD,
            unk_token=UNK,
            k=k,
            inv_temp=inv_temp,
        )
    )
    first = out[:, len(prefix)]
    for pid, p_ref in zip(ref_ids, ref_probs):
        p_emp = float((first == pid).mean())
        assert abs(p_emp - p_ref) < 0.05, (pid, p_ref, p_emp)


def test_int8_kv_cache_decode_close_to_fp32():
    """int8 KV cache (per-token-head symmetric quantization) must produce
    decode logits close to the fp32 cache, and greedy generations should
    agree on unambiguous steps."""
    _, params = make_pair(seed=21)
    cfg8 = CFG.replace(kv_dtype="int8")
    rng = np.random.default_rng(22)
    toks = rng.integers(3, CFG.n_tok, size=(3, 10)).astype(np.int32)
    p = 4

    def run(cfg):
        cache = make_empty_cache(cfg, 3)
        hidden, cache = prefill(params, cfg, jnp.asarray(toks[:, :p]), cache=cache)
        logits = [np.asarray(hidden[:, -1] @ params.lm_head)]
        for pos in range(p, toks.shape[1]):
            l, cache = decode_step(
                params, cfg, jnp.asarray(toks[:, pos]), jnp.asarray(pos), cache
            )
            logits.append(np.asarray(l))
        return np.stack(logits, 1)

    full = run(CFG)
    quant = run(cfg8)
    # prefill logits identical (exact K/V used); decoded positions close
    np.testing.assert_allclose(quant[:, 0], full[:, 0], atol=1e-5)
    err = np.abs(quant[:, 1:] - full[:, 1:]).max()
    ref_scale = np.abs(full).max()
    assert err / ref_scale < 0.05, (err, ref_scale)
    # greedy argmax agreement on the overwhelming majority of positions
    agree = (quant.argmax(-1) == full.argmax(-1)).mean()
    assert agree > 0.9, agree
    # bf16 scale storage (halves the (L,2,B,T,H) scale traffic) stays in
    # the same error envelope
    quant16 = run(cfg8.replace(kv_scale_dtype="bfloat16"))
    err16 = np.abs(quant16[:, 1:] - full[:, 1:]).max()
    assert err16 / ref_scale < 0.05, (err16, ref_scale)
    agree16 = (quant16.argmax(-1) == full.argmax(-1)).mean()
    assert agree16 > 0.9, agree16


def test_int8_generation_runs():
    _, params = make_pair(seed=23)
    cfg8 = CFG.replace(kv_dtype="int8")
    out = np.asarray(
        generate_with_injection_batch(
            params,
            cfg8,
            jax.random.PRNGKey(5),
            [5, UNK, 6],
            jnp.asarray(
                np.random.default_rng(24).normal(size=(4, CFG.n_embd)), jnp.float32
            ),
            stop_token=STOP,
            pad_token=PAD,
            unk_token=UNK,
            k=5,
            inv_temp=1.0,
        )
    )
    assert out.shape[0] == 4
    for row in out:
        assert (row == STOP).any()


def test_full_sequence_statistics_match_reference():
    """Beyond the first-token marginal: full-sequence statistics (length
    distribution, unigram token frequencies, stop rate) of my sampler vs
    the reference's loop on identical weights must agree within sampling
    noise (the SURVEY 'sampler equivalence' requirement)."""
    ref, params = make_pair(seed=31)
    prefix = [5, UNK, 6]
    n = 600
    payload = np.random.default_rng(32).normal(size=(1, CFG.n_embd)).astype(np.float32)
    k, inv_temp = 8, 1.5

    with torch.no_grad():
        ref_rows = ref.generate_top_k_with_inj_batch(
            prefix=prefix,
            stop_token=STOP,
            pad_token=PAD,
            inv_temp=inv_temp,
            k=k,
            inj_token=UNK,
            inj_payload=torch.tensor(np.tile(payload, (n, 1))),
        )
    mine = np.asarray(
        generate_with_injection_batch(
            params,
            CFG,
            jax.random.PRNGKey(33),
            prefix,
            jnp.asarray(np.tile(payload, (n, 1))),
            stop_token=STOP,
            pad_token=PAD,
            unk_token=UNK,
            k=k,
            inv_temp=inv_temp,
        )
    )

    def stats(rows):
        lengths, counts = [], np.zeros(CFG.n_tok)
        for row in rows:
            row = list(row)
            end = row.index(STOP) if STOP in row else len(row)
            gen = row[len(prefix) : end]
            lengths.append(len(gen))
            for t in gen:
                counts[t] += 1
        return np.mean(lengths), counts / max(counts.sum(), 1)

    len_ref, freq_ref = stats([list(r) for r in ref_rows])
    len_mine, freq_mine = stats(mine)
    # mean generated length within 15% (sampling noise at n=600)
    assert abs(len_mine - len_ref) / max(len_ref, 1) < 0.15, (len_mine, len_ref)
    # unigram distributions close in total variation
    tv = 0.5 * np.abs(freq_ref - freq_mine).sum()
    assert tv < 0.08, tv


def test_staged_decode_matches_single_stage_exact():
    """Staged cache-width growth is semantically exact: greedy outputs at
    fp32 must be identical to the single-stage loop."""
    from coati_tpu.models.sampler import auto_stage_widths, generate_tokens
    import functools

    _, params = make_pair(seed=41)
    cfg = CFG.replace(n_seq=96)
    pre = jnp.zeros((6, 96), jnp.int32).at[:, :3].set(jnp.asarray([5, UNK, 6]))
    g = functools.partial(
        generate_tokens,
        prefill_len=3, total_len=96, stop_token=STOP, pad_token=PAD,
        k=1, inv_temp=1.0,
    )
    lens = jnp.full((6,), 3, jnp.int32)
    single = np.asarray(g(params, cfg, jax.random.PRNGKey(0), pre, lens))
    staged = np.asarray(
        g(params, cfg, jax.random.PRNGKey(0), pre, lens, stage_widths=(32, 64, 96))
    )
    np.testing.assert_array_equal(single, staged)

    # schedule helper sanity
    assert auto_stage_widths(3, 32) is None
    ws = auto_stage_widths(3, 96)
    assert ws[-1] == 96 and all(ws[i] < ws[i + 1] for i in range(len(ws) - 1))


def test_fused_embed_decode_matches_two_call_path():
    """smiles_to_2d_batch (ONE device program) reproduces
    encode_tokens + hclip_to_2d_batch token-for-token with the same rng
    seed (fp32, no noise)."""
    import jax

    from coati_tpu.models.api import COATI
    from coati_tpu.models.coati import CoatiConfig, init_coati
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=48, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=16, n_embd_common=32, n_head=2, n_seq=48,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
    )
    params = init_coati(jax.random.PRNGKey(0), cfg)
    tokens = np.asarray(
        [tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
         for s in ["CCO", "CC", "CCC", "CNC"]], np.int32)

    m1 = COATI(params, cfg, seed=5)
    fused_smiles, fused_h = m1.smiles_to_2d_batch(
        tokens, tok, inv_temp=2.0, k=8, return_embeddings=True)

    m2 = COATI(params, cfg, seed=5)
    h = np.asarray(m2.encode_tokens(tokens, tok))
    two_call = m2.hclip_to_2d_batch(h, tok, inv_temp=2.0, k=8)

    np.testing.assert_allclose(fused_h, h, atol=1e-5)
    assert fused_smiles == two_call


def test_top_p_filter_matches_bruteforce():
    """Nucleus mask over top-k-filtered logits equals the brute-force
    sorted-cumsum definition."""
    from coati_tpu.ops.sampling import sample_top_k, top_k_filter, top_p_filter

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(16, 200)).astype(np.float32) * 3)
    k, top_p = 50, 0.8
    filtered = top_k_filter(logits, k)
    got = np.asarray(top_p_filter(filtered, top_p, k))
    # brute force per row
    probs = np.asarray(jax.nn.softmax(filtered, axis=-1))
    for r in range(probs.shape[0]):
        order = np.argsort(-probs[r])
        cum = np.cumsum(probs[r][order])
        keep = np.zeros_like(probs[r], dtype=bool)
        before = np.concatenate([[0.0], cum[:-1]])
        keep[order] = before < top_p
        assert keep.sum() >= 1
        finite = np.isfinite(got[r])
        np.testing.assert_array_equal(finite, keep)


def test_top_p_one_is_plain_top_k():
    from coati_tpu.ops.sampling import sample_top_k

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(8, 120)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    a = np.asarray(sample_top_k(key, logits, 40, 2.0, top_p=None))
    b = np.asarray(sample_top_k(key, logits, 40, 2.0, top_p=1.0))
    np.testing.assert_array_equal(a, b)


def test_generate_with_top_p_runs_and_narrows():
    """top_p decoding runs through the fused sampler; a tiny top_p
    collapses sampling to the argmax (different seeds agree)."""
    from coati_tpu.models.sampler import generate_tokens

    _, params = make_pair(seed=17)
    b = 6
    tokens0 = jnp.zeros((b, 24), jnp.int32).at[:, 0].set(5)
    plen = jnp.full((b,), 1, jnp.int32)
    import functools
    g = functools.partial(
        generate_tokens, prefill_len=1, total_len=24, stop_token=STOP,
        pad_token=PAD, k=20, inv_temp=1.0, top_p=1e-6,
    )
    a = np.asarray(g(params, CFG, jax.random.PRNGKey(5), tokens0, plen))
    b2 = np.asarray(g(params, CFG, jax.random.PRNGKey(9), tokens0, plen))
    np.testing.assert_array_equal(a, b2)


def test_sample_top_k_matches_reference_distribution():
    """Candidate-space sampling draws from EXACTLY
    multinomial(softmax(topk_logits * inv_temp)) — the reference
    distribution (smiles_xformer.py:305-311). Statistical check: 40k
    draws vs exact probabilities, binomial 4-sigma bound per token."""
    from coati_tpu.ops.sampling import sample_top_k

    rng = np.random.default_rng(3)
    vocab, k, inv_temp, n = 30, 10, 2.0, 40_000
    logits = jnp.asarray(rng.normal(size=(vocab,)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = np.asarray(
        jax.vmap(lambda kk: sample_top_k(kk, logits, k, inv_temp))(keys)
    )
    # exact reference probabilities
    vals, idxs = jax.lax.top_k(logits, k)
    probs = np.asarray(jax.nn.softmax(vals * inv_temp))
    counts = np.bincount(draws, minlength=vocab).astype(float)
    # nothing outside the top-k is ever drawn
    outside = np.ones(vocab, bool)
    outside[np.asarray(idxs)] = False
    assert counts[outside].sum() == 0
    for p, i in zip(probs, np.asarray(idxs)):
        sigma = np.sqrt(n * p * (1 - p))
        assert abs(counts[i] - n * p) < 4 * sigma + 1, (i, counts[i], n * p)


def test_sample_top_k_approx_threshold_distribution():
    """The approx path masks by approx_max_k's k-th VALUE (a superset
    of the true top-k — lowering recall can only admit extra
    candidates, never silence a true member). On CPU approx_max_k
    falls back to exact, so the draw must match the reference top-k
    distribution exactly (same statistical bound as the exact path)."""
    from coati_tpu.ops.sampling import sample_top_k

    rng = np.random.default_rng(7)
    vocab, k, inv_temp, n = 30, 10, 2.0, 40_000
    logits = jnp.asarray(rng.normal(size=(vocab,)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    draws = np.asarray(
        jax.vmap(
            lambda kk: sample_top_k(kk, logits, k, inv_temp, approx=True)
        )(keys)
    )
    vals, idxs = jax.lax.top_k(logits, k)
    probs = np.asarray(jax.nn.softmax(vals * inv_temp))
    counts = np.bincount(draws, minlength=vocab).astype(float)
    outside = np.ones(vocab, bool)
    outside[np.asarray(idxs)] = False
    assert counts[outside].sum() == 0
    for p, i in zip(probs, np.asarray(idxs)):
        sigma = np.sqrt(n * p * (1 - p))
        assert abs(counts[i] - n * p) < 4 * sigma + 1, (i, counts[i], n * p)


def test_topk_recall_plumbs_through_generate():
    """cfg.topk_recall reaches the sampler (no trace error) and, on the
    CPU exact fallback, any target yields identical tokens."""
    import functools

    from coati_tpu.models.sampler import generate_tokens

    _, params = make_pair(seed=23)
    b = 4
    tokens0 = jnp.zeros((b, 16), jnp.int32).at[:, 0].set(5)
    plen = jnp.full((b,), 1, jnp.int32)

    def gen(cfg):
        g = functools.partial(
            generate_tokens, prefill_len=1, total_len=16, stop_token=STOP,
            pad_token=PAD, k=8, inv_temp=1.0,
        )
        return np.asarray(g(params, cfg, jax.random.PRNGKey(3), tokens0, plen))

    cfg_hi = CFG.replace(topk_recall=0.95)
    cfg_lo = CFG.replace(topk_recall=0.7)
    np.testing.assert_array_equal(gen(cfg_hi), gen(cfg_lo))
