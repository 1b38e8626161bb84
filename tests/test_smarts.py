"""SMARTS-subset matcher (chem/smarts.py) — the in-tree substitute for
RDKit's substructure engine, powering Crippen logP and QED. Spec tests
are hand-derived matched-atom counts; the gated rdkit test asserts
GetSubstructMatches(uniquify=True) count agreement per pattern.
"""

import pytest

from coati_tpu.chem.aromaticity import perceive_aromaticity
from coati_tpu.chem.rdkit_support import HAS_RDKIT
from coati_tpu.chem.selfies_lite import parse_smiles
from coati_tpu.chem.smarts import (
    MolContext,
    SmartsError,
    add_explicit_hydrogens,
    compile_smarts,
)


def ctx_of(smiles: str, hydrogens: bool = False) -> MolContext:
    mol = parse_smiles(smiles)
    perceive_aromaticity(mol)
    if hydrogens:
        mol = add_explicit_hydrogens(mol)
    return MolContext(mol)


def count(pattern: str, smiles: str, hydrogens: bool = False) -> int:
    return compile_smarts(pattern).count_matches(ctx_of(smiles, hydrogens))


# ------------------------------------------------------------ atom prims

CASES = [
    # pattern, smiles, expected distinct-match count
    ("C", "CCO", 2),
    ("[#6]", "CCO", 2),
    ("[#8]", "CCO", 1),
    ("c", "c1ccccc1C", 6),
    ("a", "c1ccncc1", 6),
    ("A", "c1ccccc1CC", 2),
    ("[CH3]", "CC(C)C", 3),
    ("[CH1]", "CC(C)C", 1),
    ("[CX4]", "CC=C", 1),
    ("[CD1]", "CC(C)C", 3),
    ("[CD3]", "CC(C)C", 1),
    ("[v4]", "CC=C", 3),
    ("[R]", "C1CC1C", 3),
    ("[R0]", "C1CC1C", 1),
    ("[R2]", "c1ccc2ccccc2c1", 2),
    ("[r6]", "C1CCCCC1C2CC2", 6),
    ("[r3]", "C1CCCCC1C2CC2", 3),
    ("[O-]", "CC([O-])=O", 1),
    ("[N+]", "C[N+](C)(C)C", 1),
    ("[nH]", "c1cc[nH]c1", 1),
    ("[nH0]", "c1ccncc1", 1),
    # h<n> is EXACT implicit-H count (Daylight/RDKit); bare h is >= 1.
    # Bracket-specified Hs are explicit in RDKit, so [nH] has h0.
    ("[h]", "CCO", 3),
    ("[h1]", "CCO", 1),       # the OH oxygen only
    ("[h2]", "CCO", 1),       # the CH2 only
    ("[h3]", "CCO", 1),       # the CH3 only
    ("[h1]", "c1ccccc1C", 5),  # ring CHs; the substituted c is h0
    ("[h0]", "c1cc[nH]c1", 1),  # only [nH]: its H is explicit, h=0
    ("[!C;!c]", "CCOc1ccccc1", 1),
    ("[C,O]", "CCO", 3),
    ("[8C]", "C[8C]O", 1),  # isotope
]


@pytest.mark.parametrize("pattern,smiles,expected", CASES)
def test_atom_primitive_counts(pattern, smiles, expected):
    assert count(pattern, smiles) == expected, (pattern, smiles)


BOND_CASES = [
    ("C=C", "C=CC", 1),
    ("C-C", "C=CC", 1),
    ("C#N", "CC#N", 1),
    ("C~C", "C=CC", 2),
    ("c:c", "c1ccccc1", 6),
    ("C=O", "CC(=O)OC", 1),
    ("[#6]@[#6]", "C1CC1C", 3),      # ring bonds
    ("[#6]!@[#6]", "C1CC1C", 1),     # acyclic bond
    ("C-!@C", "C1CC1C", 1),
]


@pytest.mark.parametrize("pattern,smiles,expected", BOND_CASES)
def test_bond_primitive_counts(pattern, smiles, expected):
    assert count(pattern, smiles) == expected, (pattern, smiles)


def test_default_bond_single_or_aromatic():
    # bare adjacency matches aromatic bonds too (Daylight default)
    assert count("cc", "c1ccccc1") == 6
    assert count("CC", "C=C") == 0


def test_branches_and_rings():
    assert count("C(=O)O", "CC(=O)OC(C)=O") == 2
    assert count("c1ccccc1", "c1ccccc1-c1ccccc1") == 2
    assert count("C1CC1", "C1CC1C1CCC1") == 1


def test_recursive_smarts():
    # carbonyl carbon but not carboxyl
    assert count("[$(C=O);!$(C(=O)O)]", "CC(=O)C") == 1
    assert count("[$(C=O);!$(C(=O)O)]", "CC(=O)O") == 0
    # atom alpha to a carbonyl
    assert count("[CX4][$(C=O)]", "CC(=O)C") == 2


def test_two_letter_elements_beat_count_primitives():
    # Hg is mercury, not "H + garbage"; Rh is rhodium, not ring-count
    assert count("[Hg]", "C[Hg]C") == 1
    assert count("[Rh]", "C[Hg]C") == 0
    assert count("[Cl]", "CCl") == 1
    assert count("[Hg,Fe,Zn]", "C[Fe]C") == 1


def test_explicit_hydrogen_graphs():
    # on the H-augmented graph, [#1] matches every hydrogen atom
    assert count("[#1]", "CO", hydrogens=True) == 4
    assert count("[#1][#8]", "CO", hydrogens=True) == 1
    assert count("[#1][#6]", "CO", hydrogens=True) == 3


def test_charge_primitives():
    assert count("[+]", "C[N+](C)(C)C") == 1
    assert count("[-]", "CC([O-])=O") == 1
    assert count("[+2]", "[Ca+2]") == 1
    assert count("[N+0]", "CN") == 1


def test_uniquify_semantics():
    # benzene has 6 aromatic bonds -> 6 distinct {i,j} sets for 'cc'
    # (each unordered pair once, like GetSubstructMatches(uniquify=True))
    assert count("cc", "c1ccccc1") == 6
    # symmetric 3-atom chain: CCC in propane -> one distinct set
    assert count("CCC", "CCC") == 1


def test_errors():
    with pytest.raises(SmartsError):
        compile_smarts("C(")
    with pytest.raises(SmartsError):
        compile_smarts("C1CC")
    with pytest.raises(SmartsError):
        compile_smarts("")
    with pytest.raises(SmartsError):
        compile_smarts("CC.CC")  # disconnected unsupported


# ------------------------------------------------- gated rdkit oracle

needs_rdkit = pytest.mark.skipif(not HAS_RDKIT, reason="rdkit not installed")


@needs_rdkit
def test_counts_agree_with_rdkit():
    from rdkit import Chem

    mols = [
        "CC(=O)Oc1ccccc1C(=O)O",
        "Cn1c(=O)c2c(ncn2C)n(C)c1=O",
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
        "c1cc[nH]c1",
        "C[N+](C)(C)C",
        "OC(=O)C1CCC(CC1)C(=O)[O-]",
    ]
    pats = [p for p, _, _ in CASES] + [p for p, _, _ in BOND_CASES]
    for smi in mols:
        rmol = Chem.MolFromSmiles(smi)
        c = ctx_of(smi)
        for p in pats:
            rp = Chem.MolFromSmarts(p)
            want = len(
                set(frozenset(m) for m in rmol.GetSubstructMatches(rp))
            )
            got = compile_smarts(p).count_matches(c)
            assert got == want, (smi, p, got, want)


def test_ring_bond_count_primitive():
    """Lowercase `x` is ring-BOND count (Daylight ring connectivity),
    distinct from `X` total connections (regression: x silently aliased
    X, so [x2] matched nothing on cyclohexane)."""
    assert count("[x2]", "C1CCCCC1") == 6       # each ring C: 2 ring bonds
    assert count("[x2]", "CCCCCC") == 0         # chain: no ring bonds
    assert count("[x4]", "C1CCC2(CC1)CCCC2") == 1   # spiro center
    assert count("[x3]", "c1ccc2ccccc2c1") == 2     # fused bridgeheads
    assert count("[x]", "C1CC1C") == 3          # bare x: >= 1 ring bond
    assert count("[X4]", "C1CCCCC1") == 6       # X unchanged: 2 nb + 2 H
