"""In-tree SELFIES v2 codec (chem/selfies_lite.py).

The reference selfies route (clip_e2e_selfies.py:13-31) requires the
`selfies` package; this codec lets it execute offline. Pinned here:

- hand-derived encodings for the core grammar (branches, rings, fused
  systems, heteroaromatics, stereo, charges);
- exact graph round-trip over the full in-tree ChEMBL corpus;
- every emitted symbol lies inside the published selfies vocabulary's
  symbol alphabet (selfies_mcp_clone);
- decode robustness: random symbol strings over the semantic alphabet
  always decode to parseable SMILES;
- end-to-end tokenizer routing (to_selfies_tokenizer) on real
  molecules, previously executable only with the absent package;
- oracle parity with the real `selfies` package whenever importable.
"""

import json
import os
import pickle
import re

import numpy as np
import pytest

from coati_tpu.chem import selfies_lite as sl

CHEMBL_PKL = "/root/reference/examples/metadynamics/chembl_pic50.pkl"
VOCAB_PATH = os.path.join(
    os.path.dirname(sl.__file__), "..", "tokenizers", "vocabs",
    "selfies_mcp_clone.json",
)


def chembl_smiles():
    if not os.path.exists(CHEMBL_PKL):
        pytest.skip("reference ChEMBL corpus not present")
    with open(CHEMBL_PKL, "rb") as f:
        rows = pickle.load(f)
    out = {
        r.get("SMILES") or r.get("smiles")
        for r in rows
        if (r.get("SMILES") or r.get("smiles"))
    }
    return sorted(out)


def graph_sig(smiles):
    """(atoms, bonds) signature of the kekulized graph, implicit H
    resolved — atom order is preserved by the codec, so signatures
    compare exactly (no isomorphism search needed)."""
    m = sl.parse_smiles(smiles)
    sl.kekulize(m)
    bond_order = [0] * len(m.atoms)
    for b in m.bonds:
        bond_order[b.a] += b.order
        bond_order[b.b] += b.order
    atoms = []
    for a in m.atoms:
        if a.hcount is not None:
            h = a.hcount
        else:
            ladder = sl._SMILES_VALENCE.get(a.element, (0,))
            v = next(
                (x for x in ladder if x >= bond_order[a.idx]),
                bond_order[a.idx],
            )
            h = v - bond_order[a.idx]
        atoms.append((a.element, a.charge, a.isotope, a.chirality, h))
    bonds = sorted(
        (min(b.a, b.b), max(b.a, b.b), b.order, bool(b.stereo))
        for b in m.bonds
    )
    return atoms, bonds


HAND_CASES = [
    ("CCO", "[C][C][O]"),
    ("C#N", "[C][#N]"),
    ("CC(=O)O", "[C][C][=Branch1][C][=O][O]"),
    ("C1CC1", "[C][C][C][Ring1][Ring1]"),
    ("c1ccccc1", "[C][=C][C][=C][C][=C][Ring1][=Branch1]"),
    ("c1ccncc1", "[C][=C][C][=N][C][=C][Ring1][=Branch1]"),
    ("[O-]C", "[O-1][C]"),
    ("C/C=C/C", "[C][/C][=C][/C]"),
    (
        "N[C@@H](C)C(=O)O",
        "[N][C@@H1][Branch1][C][C][C][=Branch1][C][=O][O]",
    ),
    (
        "CS(=O)(=O)N",
        "[C][S][=Branch1][C][=O][=Branch1][C][=O][N]",
    ),
]


@pytest.mark.parametrize("smiles,want", HAND_CASES)
def test_hand_derived_encodings(smiles, want):
    assert sl.encoder(smiles) == want


@pytest.mark.parametrize("smiles,want", HAND_CASES)
def test_hand_cases_roundtrip(smiles, want):
    assert graph_sig(sl.decoder(want)) == graph_sig(smiles)


def test_fixed_point():
    """decode -> encode is the identity on encoder output (the decode
    is kekulized, so the second pass sees explicit bonds)."""
    for s in ["c1ccc2ccccc2c1", "O=c1cc[nH]cc1", "C(F)(F)(F)c1ccccc1"]:
        sel = sl.encoder(s)
        assert sl.encoder(sl.decoder(sel)) == sel


def test_chembl_roundtrip_exact_graphs():
    smi = chembl_smiles()
    assert len(smi) > 500
    for s in smi:
        sel = sl.encoder(s)
        back = sl.decoder(sel)
        assert graph_sig(back) == graph_sig(s), (s, sel, back)


def test_chembl_symbols_inside_published_vocab():
    """Every symbol the encoder emits over real drug-like molecules is
    in the published selfies vocabulary's alphabet — i.e. the codec
    writes token streams the published checkpoints can consume."""
    with open(VOCAB_PATH) as f:
        vocab = json.load(f)
    alphabet = set()
    for t in vocab["smiles_tokens"]:
        alphabet.update(re.findall(r"\[[^\]]*\]", t))
    emitted = set()
    for s in chembl_smiles():
        emitted.update(re.findall(r"\[[^\]]*\]", sl.encoder(s)))
    assert emitted <= alphabet, sorted(emitted - alphabet)


def test_decoder_total_over_alphabet():
    """SELFIES' core property: any string over the semantic alphabet is
    a valid molecule. Fuzz random symbol strings; every decode must
    succeed and re-parse with our own SMILES parser."""
    alphabet = list(sl.INDEX_ALPHABET) + [
        "[O]", "[N]", "[=O]", "[#N]", "[F]", "[Cl]", "[NH1+1]", "[O-1]",
        "[C@@H1]", "[/C]", "[\\N]", "[=Ring1]", "[-/Ring2]", "[Branch3]",
        "[=Branch2]", "[Ring3]", "[S]", "[=S]", "[P]", "[Br]", "[13C]",
    ]
    rng = np.random.default_rng(0)
    for _ in range(400):
        n = int(rng.integers(1, 40))
        s = "".join(rng.choice(alphabet) for _ in range(n))
        smi = sl.decoder(s)
        if smi:
            m = sl.parse_smiles(smi)
            # all bonds within capacity
            used = [0] * len(m.atoms)
            for b in m.bonds:
                used[b.a] += b.order
                used[b.b] += b.order
            for a in m.atoms:
                cap = sl.capacity(a.element, a.charge) - (a.hcount or 0)
                assert used[a.idx] <= cap, (s, smi)


def test_decoder_rejects_stray_text():
    with pytest.raises(sl.DecoderError):
        sl.decoder("[C]x[C]")
    with pytest.raises(sl.DecoderError):
        sl.decoder("[NotASymbol]")


def test_encoder_rejects_unsupported():
    with pytest.raises(sl.EncoderError):
        sl.encoder("C1CC")  # unclosed ring
    with pytest.raises(sl.EncoderError):
        sl.encoder("C(C")  # unbalanced branch
    with pytest.raises(sl.EncoderError):
        sl.encoder("*CC")  # wildcard


def test_tokenizer_routing_end_to_end():
    """to_selfies_tokenizer now executes real molecules offline: SMILES
    -> selfies.encoder -> selfies vocab token ids, and the ids decode
    back to the selfies string (reference clip_e2e_selfies.py:13-31)."""
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
    from coati_tpu.tokenizers.selfies_support import to_selfies_tokenizer

    tok = to_selfies_tokenizer(
        TrieTokenizer(n_seq=128, side_tasks=False,
                      **get_vocab("selfies_mcp_clone"))
    )
    for s in chembl_smiles()[:50]:
        ids = tok.tokenize_text(f"[SMILES]{s}[STOP]", pad=False)
        assert len(ids) > 2
        text = tok.decode(ids, special=True)
        inner = text.replace("[SMILES]", "").replace("[STOP]", "")
        assert inner == sl.encoder(s)


def test_parity_with_real_selfies_package():
    """Oracle parity whenever the real package is importable (absent on
    this machine; activates automatically if the environment gains
    it)."""
    selfies = pytest.importorskip("selfies")
    for s in chembl_smiles():
        assert sl.encoder(s) == selfies.encoder(s), s
    rng = np.random.default_rng(1)
    alphabet = sorted(selfies.get_semantic_robust_alphabet())
    for _ in range(200):
        n = int(rng.integers(1, 30))
        sel = "".join(rng.choice(alphabet) for _ in range(n))
        assert graph_sig(sl.decoder(sel)) == graph_sig(selfies.decoder(sel))


def test_selfies_xform_on_the_fly_columns():
    """clip_ar_xform_selfies without precomputed 'selfies' columns:
    the codec encodes the SMILES on the fly (beyond parity — the
    reference requires cache preprocessing), bad rows zero out through
    the xform's row-level fault tolerance, and the produced token rows
    decode back to the encoded SELFIES stream."""
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
    from coati_tpu.tokenizers.selfies_support import clip_ar_xform_selfies

    # PLAIN tokenizer on the selfies vocab, as the reference trains with
    # (the to_selfies_tokenizer rebinding is for raw-SMILES inference)
    tok = TrieTokenizer(n_seq=96, side_tasks=False,
                        **get_vocab("selfies_mcp_clone"))
    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "NOT_A_MOLECULE(("]
    batch = {
        "smiles": smiles,
        "atoms": np.zeros((4, 3)),
        "coords": np.zeros((4, 3, 3)),
    }
    import random as _random

    _random.seed(0)
    out = clip_ar_xform_selfies(
        batch, tok, p_dataset=0.0, p_formula=0.0, p_clip=0.0
    )
    toks = np.asarray(out["tokens"])
    assert toks.shape[0] == 4
    assert (toks[3] == 0).all()  # unparseable row zeroed, not fatal
    for row, s in zip(toks, smiles[:3]):
        text = tok.decode([t for t in row.tolist() if t != 0], special=True)
        inner = text.replace("[SMILES]", "").replace("[STOP]", "")
        assert inner == sl.encoder(s)


def test_merged_vocab_tokens_match_encoder_conventions():
    """The published selfies vocab's multi-symbol tokens are BPE merges
    of REAL reference-encoder output. If this codec disagreed with the
    reference on branch-index / ring-offset / kekulization conventions,
    the vocab trie would fragment our streams into single symbols in
    those contexts. Measured: ~70% of symbols over encoded ChEMBL land
    inside multi-symbol merged tokens; gate well below at 50%."""
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=512, side_tasks=False,
                        **get_vocab("selfies_mcp_clone"))
    in_multi = total = 0
    for s in chembl_smiles():
        for p in tok.smiles_matcher.split(sl.encoder(s)):
            n = len(re.findall(r"\[[^\]]*\]", p))
            total += n
            if n > 1:
                in_multi += n
    assert in_multi / total > 0.5, in_multi / total


def wl_sig(smiles, rounds=4):
    """Order-independent graph invariant (Weisfeiler-Leman hashing) for
    comparing permuted SMILES. Aromatic bonds keep an 'ar' label — a
    permuted string may kekulize to a DIFFERENT (equally valid) kekulé
    structure, so matched orders are not invariant; per-atom bond sums
    and H counts are."""
    m = sl.parse_smiles(smiles)
    was_aromatic = [b.aromatic for b in m.bonds]
    sl.kekulize(m)
    bond_label = [
        "ar" if was_aromatic[bi] else b.order
        for bi, b in enumerate(m.bonds)
    ]
    bond_order = [0] * len(m.atoms)
    for b in m.bonds:
        bond_order[b.a] += b.order
        bond_order[b.b] += b.order
    labels = []
    for a in m.atoms:
        if a.hcount is not None:
            h = a.hcount
        else:
            ladder = sl._SMILES_VALENCE.get(a.element, (0,))
            v = next((x for x in ladder if x >= bond_order[a.idx]),
                     bond_order[a.idx])
            h = v - bond_order[a.idx]
        labels.append((a.element, a.charge, a.isotope, h))
    adj = m.neighbors()
    for _ in range(rounds):
        labels = [
            (labels[i], tuple(sorted(
                (str(bond_label[bi]), labels[j]) for j, bi in adj[i]
            )))
            for i in range(len(labels))
        ]
        labels = [hash(x) for x in labels]
    return sorted(labels)


def test_permute_smiles_same_molecule():
    """Random atom-order SMILES (the p_randsmiles augmentation, which
    was a silent identity without rdkit): permutations parse, preserve
    the molecule (WL invariant), and actually vary."""
    import random as _random

    rng = _random.Random(0)
    changed = 0
    for s in chembl_smiles()[:120]:
        want = wl_sig(s)
        outs = {sl.permute_smiles(s, rng) for _ in range(3)}
        for p in outs:
            assert wl_sig(p) == want, (s, p)
        changed += len(outs) > 1 or s not in outs
    assert changed > 100  # permutation is real, not identity


def test_random_molecule_properties():
    """Property fuzz over decoder-generated molecules (the decoder is
    total over the semantic alphabet, so it doubles as a random
    valid-molecule generator): every decoded molecule (a) passes the
    graph validator, (b) survives encoder->decoder with its WL graph
    hash intact, and (c) keeps that hash under random-order rewriting.
    A 3000-string run of this property found zero failures; the
    committed bound keeps suite runtime low."""
    import random as _random

    rng = _random.Random(0)
    atoms = ["[C]", "[=C]", "[#C]", "[N]", "[=N]", "[O]", "[=O]", "[S]",
             "[F]", "[Cl]", "[Br]", "[P]", "[B]", "[C@@H1]", "[NH1]",
             "[O-1]", "[N+1]"]
    alphabet = atoms + ["[Branch1]", "[=Branch1]", "[Branch2]",
                        "[Ring1]", "[Ring2]", "[=Ring1]"]
    tested = 0
    for _ in range(500):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(3, 30)))
        smi = sl.decoder(s)
        if not smi:
            continue
        tested += 1
        assert sl.validate_smiles(smi), (s, smi)
        want = wl_sig(smi)
        again = sl.decoder(sl.encoder(smi))
        assert wl_sig(again) == want, (smi, again)
        perm = sl.permute_smiles(smi, rng)
        assert wl_sig(perm) == want, (smi, perm)
    assert tested > 400, tested


def test_validate_smiles_fallback():
    from coati_tpu.chem.rdkit_support import is_valid_smiles

    for s in chembl_smiles():
        assert is_valid_smiles(s), s
    for bad in ["N(C)(C)(C)C", "F=C", "C1CC", "c1ccc(cc1", "O=O=O",
                "[CH5]", "Cl(C)C"]:
        assert not is_valid_smiles(bad), bad
