"""Fragment-recombination enumerator (chem/enumerate.py): the offline
corpus synthesizer standing in for the reference's multi-million-
molecule s3 datasets (reference coati/data/dataset.py:37-103).

The central invariant — every product is valence-correct by
construction because cut bonds and join bonds are both single — is
audited here with an explicit kekulized bond-order-sum check, not just
parseability."""

import pytest

from coati_tpu.chem.enumerate import (
    Fragment,
    build_fragment_library,
    combine,
    enumerate_corpus,
)
from coati_tpu.chem.graph_canon import canonical_smiles
from coati_tpu.chem.selfies_lite import (
    _SMILES_VALENCE,
    kekulize,
    parse_smiles,
    write_smiles,
)

SEEDS = [
    "CC(=O)Oc1ccccc1C(=O)O",            # aspirin
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",       # caffeine
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",       # procainamide
    "COc1ccc2cc(ccc2c1)C(C)C(=O)O",     # naproxen-ish
    "Clc1ccc(cc1)C(c1ccccc1)N1CCCC1",   # random amine
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",       # ibuprofen
    "O=C(Nc1ccc(F)cc1)c1cccnc1",        # amide + pyridine
    "CS(=O)(=O)N1CCC(CC1)Oc1ccccc1",    # sulfonamide ether
]


def audit_valence(smiles: str) -> None:
    """Kekulize and assert every neutral organic-subset atom's
    bond-order sum + explicit H fits a standard valence."""
    mol = parse_smiles(smiles)
    kekulize(mol)
    order_sum = [0] * len(mol.atoms)
    for bd in mol.bonds:
        order_sum[bd.a] += bd.order
        order_sum[bd.b] += bd.order
    for a, s in zip(mol.atoms, order_sum):
        if a.charge or a.element not in _SMILES_VALENCE:
            continue
        total = s + (a.hcount or 0)
        assert total <= max(_SMILES_VALENCE[a.element]), (
            f"{smiles}: atom {a.idx} ({a.element}) valence {total}"
        )


def test_library_fragments_round_trip():
    frags, pairs, canon = build_fragment_library(SEEDS)
    assert len(canon) == len(SEEDS)
    assert len(frags) > 20
    assert all(isinstance(p, tuple) and p[0] <= p[1] for p in pairs)
    for f in frags:
        # fragment graphs are themselves writable + canonicalizable
        s = write_smiles(f.mol)
        assert canonical_smiles(s) == canonical_smiles(s)
        assert 1 <= f.n_heavy <= 48
        assert f.mol.atoms[f.attach].isotope == 0  # tag rolled back


def test_products_are_valence_correct_and_canonical():
    frags, pairs, _ = build_fragment_library(SEEDS)
    import random

    rng = random.Random(7)
    n_checked = 0
    for _ in range(300):
        fa, fb = rng.choice(frags), rng.choice(frags)
        key = (min(fa.attach_symbol, fb.attach_symbol),
               max(fa.attach_symbol, fb.attach_symbol))
        if key not in pairs:
            continue
        smi = canonical_smiles(write_smiles(combine(fa, fb)))
        audit_valence(smi)
        # canonical = stable under re-canonicalization
        assert canonical_smiles(smi) == smi
        n_checked += 1
    assert n_checked > 100


def test_corpus_determinism_and_accounting():
    a = enumerate_corpus(SEEDS, n_target=200, seed=3)
    b = enumerate_corpus(SEEDS, n_target=200, seed=3)
    assert a["corpus"] == b["corpus"]
    s = a["stats"]
    assert s["n_corpus"] == 200
    assert s["n_corpus"] == len(set(a["corpus"]))
    # seeds (canonical, stereo-stripped) are part of the corpus
    assert set(a["seeds"]) <= set(a["corpus"])
    assert s["n_novel"] == s["n_corpus"] - len(a["seeds"])


def test_corpus_is_stereo_free_and_filtered():
    out = enumerate_corpus(
        SEEDS, n_target=150, seed=5,
        min_heavy=12, max_heavy=30,
        accept=lambda s: "Cl" not in s,
    )
    from coati_tpu.chem.selfies_lite import parse_smiles as ps

    for smi in out["corpus"]:
        assert "@" not in smi and "/" not in smi and "\\" not in smi
        assert "Cl" not in smi
        if smi not in out["seeds"]:
            assert 12 <= len(ps(smi).atoms) <= 30


def test_join_pair_restriction_blocks_unseeded_chemistry():
    # seeds contain no F-F, O-O, N-N cut bonds -> products can't either
    frags, pairs, _ = build_fragment_library(SEEDS)
    for bad in (("F", "F"), ("O", "O"), ("N", "N")):
        assert bad not in pairs
    out = enumerate_corpus(SEEDS, n_target=300, seed=11)
    for smi in out["corpus"]:
        mol = parse_smiles(smi)
        kekulize(mol)
        for bd in mol.bonds:
            ea = mol.atoms[bd.a].element
            eb = mol.atoms[bd.b].element
            assert (ea, eb) not in (("F", "F"),), smi


def test_charged_attachments_excluded():
    # a quaternary N+ seed: bonds at the charged atom are never cut
    frags, _, _ = build_fragment_library(["C[N+](C)(C)CCO"] + SEEDS[:2])
    for f in frags:
        assert f.mol.atoms[f.attach].charge == 0
