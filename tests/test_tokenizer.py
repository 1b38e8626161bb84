"""Tokenizer tests: matcher semantics vs reference trie oracle, round-trip
property tests, FIM decode, and vocab data integrity."""

import random
import string

import numpy as np
import pytest

from coati_tpu.tokenizers import available_vocabs, get_vocab
from coati_tpu.tokenizers.matcher import VocabMatcher
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

from .oracle import load, ref_tokenizer

SMILES_EXAMPLES = [
    "c1ccccc1",
    "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "OCC1OC(O)C(O)C(O)C1O",
    "C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "N[C@@H](C)C(=O)O",
    "C1CC1N2CC2",
    "c1ccc2c(c1)cccn2",
    "FC(F)(F)c1ccccc1Cl",
]


def make_tokenizer(vocab="mar", n_seq=256, side_tasks=True):
    return TrieTokenizer(n_seq=n_seq, side_tasks=side_tasks, **get_vocab(vocab))


# --------------------------------------------------------------- matcher


def _brute_force_leftmost_longest(vocab, text):
    """Executable spec: scan left to right, cut the longest vocab token
    starting at each position."""
    out, span_start, pos = [], 0, 0
    while pos < len(text):
        match = None
        for ln in range(min(len(text) - pos, max(map(len, vocab))), 0, -1):
            if text[pos : pos + ln] in vocab:
                match = text[pos : pos + ln]
                break
        if match is None:
            pos += 1
            continue
        if pos > span_start:
            out.append(text[span_start:pos])
        out.append(match)
        pos += len(match)
        span_start = pos
    if span_start < len(text):
        out.append(text[span_start:])
    return out


def test_matcher_implements_leftmost_longest():
    # NOTE: the reference HF-style trie is NOT used as oracle here because
    # it has a lookahead bug: with vocab containing 'a12', splitting
    # '...a132...' yields a bogus piece 'a132' (the lookahead resumes from a
    # stale pointer, skipping a char). Our matcher implements the intended
    # leftmost-longest semantics, checked against a brute-force spec.
    rng = random.Random(7)
    alphabet = "abcde[]()123"
    for trial in range(30):
        vocab = set()
        while len(vocab) < 25:
            n = rng.randint(1, 5)
            vocab.add("".join(rng.choice(alphabet) for _ in range(n)))
        mine = VocabMatcher()
        for tok in vocab:
            mine.add(tok)
        for _ in range(40):
            text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            assert mine.split(text) == _brute_force_leftmost_longest(vocab, text), (
                sorted(vocab),
                text,
            )


def test_matcher_matches_reference_trie_on_real_smiles():
    """On the real SMILES vocab the reference trie's lookahead bug does not
    trigger for typical molecules; require exact agreement there."""
    ref_trie_mod = load("ref_trie")
    vocab = get_vocab("mar")["smiles_tokens"]
    ref = ref_trie_mod.Trie()
    mine = VocabMatcher(vocab)
    for tok in vocab:
        ref.add(tok)
    for smi in SMILES_EXAMPLES:
        assert ref.split(smi) == mine.split(smi), smi


def test_fuzz_agreement_with_reference():
    """Seeded subset of scripts/fuzz_tokenizer.py (117,972 strings, zero
    divergences across all 9 vocabs — PARITY.md): pre_tokenize agreement
    with the reference TrieTokenizer on real ChEMBL molecules, vocab
    token concatenations, and random character strings."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "fuzz_tokenizer",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "fuzz_tokenizer.py"
        ),
    )
    fuzz = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fuzz)

    chembl = fuzz.chembl_corpus()[:200]
    for vocab_name in ["mar", "coati2_12_12"]:  # in-code + JSON-file vocab
        vocab = get_vocab(vocab_name)
        ref = fuzz.load_reference_tokenizer(vocab_name)
        mine = make_tokenizer(vocab_name)
        rng = random.Random(11)
        corpus = (
            chembl
            + fuzz.tokcat_corpus(vocab, 200, rng)
            + fuzz.chars_corpus(vocab, 200, rng)
        )
        assert corpus
        for text in corpus:
            assert ref.pre_tokenize(text) == mine.pre_tokenize(text), (
                vocab_name,
                text,
            )


def test_decode_batch_matches_scalar_decode():
    """decode_batch (the vectorized hot path of the generation APIs)
    must agree with per-row decode on every flag combination, including
    rows with FIM spans, early stops, and pads."""
    tok = make_tokenizer("mar", n_seq=32)
    rng = np.random.default_rng(5)
    rows = rng.integers(0, tok.n_token, size=(64, 20)).astype(np.int32)
    rows[::3, 10] = tok.stop_token  # early stop
    rows[::4, :3] = 0  # leading pads
    rows[5, 4] = tok.suffix_token  # FIM span rows
    rows[5, 8] = tok.middle_token
    rows[5, 12] = tok.stop_token
    rows[6, 2] = tok.suffix_token
    rows[6, 3] = tok.middle_token
    rows[7, 5] = -1  # y_next label sentinel: dropped like [PAD] (scalar t>0)
    for special in (True, False):
        for end_at_stop in (True, False):
            for de_fim in (True, False):
                want = [
                    tok.decode(
                        list(r),
                        special=special,
                        end_at_stop=end_at_stop,
                        de_fim=de_fim,
                    )
                    for r in rows
                ]
                got = tok.decode_batch(
                    rows, special=special, end_at_stop=end_at_stop, de_fim=de_fim
                )
                assert got == want, (special, end_at_stop, de_fim)


def test_decode_batch_rejects_out_of_range_ids():
    """Scalar decode raises on ids >= n_token (it indexes self.keys);
    decode_batch must raise too instead of silently clipping corrupted
    ids to the last vocab token (review round 2)."""
    tok = make_tokenizer("mar", n_seq=32)
    rows = np.zeros((2, 5), np.int32)
    rows[1, 2] = tok.n_token  # one past the vocabulary
    import pytest

    with pytest.raises(IndexError, match="out of range"):
        tok.decode_batch(rows)


def test_matcher_preserves_text():
    m = VocabMatcher(["[CLS]", "ab", "abc", "b"])
    for text in ["", "x", "abcab[CLS]zzb", "[CL", "aabbcc"]:
        assert "".join(m.split(text)) == text


# --------------------------------------------------------------- tokenizer


@pytest.mark.parametrize("vocab", ["mar", "mar_simple"])
def test_tokenize_matches_reference(vocab):
    side = vocab != "mar_simple"
    ref = ref_tokenizer(vocab, side_tasks=side)
    mine = make_tokenizer(vocab, side_tasks=side)
    for smi in SMILES_EXAMPLES:
        text = "[SMILES]" + smi + "[STOP]"
        assert mine.tokenize_text(text, pad=False) == ref.tokenize_text(
            text, pad=False
        ), smi
        assert mine.tokenize_text(text, pad=True) == ref.tokenize_text(text, pad=True)


def test_roundtrip_identity():
    tok = make_tokenizer("mar")
    for smi in SMILES_EXAMPLES:
        ids = tok.tokenize_text("[SMILES]" + smi + "[STOP]", pad=True)
        assert tok.decode(ids, special=False) == smi


def test_decode_matches_reference():
    ref = ref_tokenizer("mar")
    mine = make_tokenizer("mar")
    for smi in SMILES_EXAMPLES:
        ids = mine.tokenize_text("[SMILES]" + smi + "[STOP]", pad=True)
        for special in (True, False):
            assert mine.decode(ids, special=special) == ref.decode(
                ids, special=special
            )


def test_fim_decode_reorder():
    tok = make_tokenizer("mar")
    # [SMILES] c1 [SUFFIX] c1 [MIDDLE] cccc [STOP]  ->  c1ccccc1
    ids = tok.tokenize_text("[SMILES]c1[SUFFIX]c1[MIDDLE]cccc[STOP]", pad=False)
    assert tok.decode(ids, special=False, de_fim=True) == "c1ccccc1"
    ref = ref_tokenizer("mar")
    assert tok.decode(ids, special=False) == ref.decode(ids, special=False)
    assert tok.decode(ids, special=True) == ref.decode(ids, special=True)


def test_batch_smiles_shapes_and_bad_rows():
    tok = make_tokenizer("mar", n_seq=32)
    arr, bad = tok.batch_smiles(["C", "CCO", "☃"], skip_failed=True)
    assert bad == [2]
    assert arr.dtype == np.int32
    assert arr.shape[0] == 3  # bad row replaced by dummy 'C'
    assert tok.decode(list(arr[0]), special=False) == "C"


def test_oversized_raises():
    tok = make_tokenizer("mar", n_seq=2)
    with pytest.raises(ValueError):
        tok.tokenize_text("[SMILES]CCCCCCCCCC[STOP]", pad=False, range_check=True)


def test_all_vocabs_load_and_build():
    for name in available_vocabs():
        v = get_vocab(name)
        side = all(
            t in v["special_tokens"] for t in ("[GRAPH]", "[FORMULA]", "[SET]")
        )
        tok = TrieTokenizer(n_seq=64, side_tasks=side, **v)
        assert tok.n_token == len(v["special_tokens"]) + len(v["smiles_tokens"])


def test_vocab_sizes_match_reference():
    sv = load("ref_smiles_vocab").tokenizer_vocabs
    for name, ref_v in sv.items():
        mine = get_vocab(name)
        assert [t.strip() for t in ref_v["special_tokens"]] == mine["special_tokens"]
        assert [t.strip() for t in ref_v["smiles_tokens"]] == mine["smiles_tokens"]


def test_native_matcher_agrees_with_python():
    """When the C byte-trie is available it must agree with the Python
    scan on real-vocab inputs (the native path is exercised implicitly by
    all other tests; this pins the equivalence explicitly)."""
    from coati_tpu.native import load_fast_matcher

    if load_fast_matcher() is None:
        pytest.skip("no C compiler available")
    vocab = get_vocab("mar")["smiles_tokens"]
    m_native = VocabMatcher(vocab)
    m_py = VocabMatcher(vocab)
    m_py._native_dead = True
    rng = random.Random(3)
    alphabet = "CNOclnos()[]123=#@+-H"
    for smi in SMILES_EXAMPLES + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]:
        assert m_native.split(smi) == m_py.split(smi), smi


def test_matcher_survives_pickle():
    import pickle

    m = VocabMatcher(["ab", "b", "[CLS]"])
    before = m.split("ab[CLS]bx")
    m2 = pickle.loads(pickle.dumps(m))
    assert m2.split("ab[CLS]bx") == before


def test_trie_shim_matches_reference_cut_text():
    """The Trie compatibility shim (matcher.py) agrees with the reference
    Trie on cut_text and on real-vocab splits (trie.py:39,192)."""
    from coati_tpu.tokenizers.matcher import Trie

    ref_mod = load("ref_trie")
    tokens = ["[CLIP]", "[STOP]", "CC", "C", "Br", "c1ccccc1"]
    ours = Trie(tokens)
    ref = ref_mod.Trie()
    for t in tokens:
        ref.add(t)
    for text in ("abcdef", "x[CLIP]CCBr", ""):
        for offsets in ([], [2, 4], [0, len(text)]):
            offs = [o for o in offsets if o <= len(text)]
            assert ours.cut_text(text, list(offs)) == ref.cut_text(text, list(offs))
    for text in ("[CLIP]CCC[STOP]", "c1ccccc1Br", "CCBrCC"):
        assert ours.split(text) == ref.split(text)
