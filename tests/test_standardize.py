"""Offline molecule standardization (chem/standardize.py) — the no-rdkit
substitute for the reference mol_standardize pipeline
(containers/rdkit_utils.py:227-248: SaltRemover -> largest fragment ->
Uncharger), surfaced through chem.rdkit_support.mol_standardize."""

import pytest

from coati_tpu.chem.graph_canon import canonical_smiles
from coati_tpu.chem.rdkit_support import HAS_RDKIT, mol_standardize
from coati_tpu.chem.standardize import split_fragments, standardize_smiles


def canon_eq(a, b):
    return canonical_smiles(a) == canonical_smiles(b)


def test_split_fragments():
    assert split_fragments("CCO") == ["CCO"]
    parts = split_fragments("CCO.Cl.[Na+]")
    assert len(parts) == 3
    assert canon_eq(parts[0], "CCO")


def test_salt_stripping():
    # hydrochloride salt of an amine
    assert canon_eq(standardize_smiles("NCCc1ccccc1.Cl"), "NCCc1ccccc1")
    # sodium salt: metal stripped, carboxylate neutralized
    assert canon_eq(standardize_smiles("CC(=O)[O-].[Na+]"), "CC(=O)O")
    # tosylate counterion
    out = standardize_smiles("Cc1ccc(cc1)S(=O)(=O)O.NCCO")
    assert canon_eq(out, "NCCO")
    # TFA salt
    assert canon_eq(
        standardize_smiles("OC(=O)C(F)(F)F.NC1CCCCC1"), "NC1CCCCC1"
    )
    # water of crystallization
    assert canon_eq(standardize_smiles("O.O.c1ccccc1CN"), "NCc1ccccc1")


def test_ionized_salt_forms_match():
    # chloride as anion, acetate as anion: charge-stripped canonical
    # matching catches both writings
    assert canon_eq(standardize_smiles("CCN.[Cl-]"), "CCN")
    assert canon_eq(standardize_smiles("CCN.CC(=O)[O-]"), "CCN")


def test_largest_fragment():
    # two non-salt fragments: larger survives
    assert canon_eq(
        standardize_smiles("c1ccccc1CCCC.CCO"), "CCCCc1ccccc1"
    )


def test_dont_remove_everything():
    # all-salt input keeps the largest salt instead of returning nothing
    out = standardize_smiles("Cl.CC(=O)O")
    assert out is not None
    assert canon_eq(out, "CC(=O)O")


def test_uncharge():
    assert canon_eq(standardize_smiles("CC(=O)[O-]"), "CC(=O)O")
    assert canon_eq(standardize_smiles("C[NH3+]"), "CN")
    # zwitterion: both sides neutralized (Uncharger core behavior)
    out = standardize_smiles("[NH3+]CC(=O)[O-]")
    assert canon_eq(out, "NCC(=O)O")
    # quaternary N+ has no H to give up: stays charged
    out = standardize_smiles("C[N+](C)(C)C")
    assert "+" in out


def test_aromatic_nh_preserved():
    # [nH] hydrogens are load-bearing (kekulizability); the uncharger
    # must not strip them from atoms it never touched.
    out = standardize_smiles("c1cc[nH]c1.Cl")  # pyrrole HCl
    assert out is not None and "[nH]" in out
    assert canon_eq(out, "c1cc[nH]c1")
    out = standardize_smiles("c1ccc2[nH]ccc2c1")  # indole, no salt
    assert out is not None and "[nH]" in out
    assert canon_eq(out, "c1ccc2[nH]ccc2c1")
    out = standardize_smiles("c1cnc[nH]1.O")  # imidazole hydrate
    assert out is not None and "[nH]" in out


def test_explicit_h_counts_preserved():
    # radical-style explicit H counts survive on untouched atoms
    out = standardize_smiles("[CH3]")
    assert out == "[CH3]"
    # ...but atoms the shuffle neutralized re-derive implicit H
    assert canon_eq(standardize_smiles("C[NH3+]"), "CN")


def test_largest_fragment_ignores_explicit_h():
    # [H]-laden small fragment must not beat a larger heavy-atom one
    out = standardize_smiles("C([H])([H])([H])O[H].CCCCCCN")
    assert canon_eq(out, "CCCCCCN")


def test_stereo_preserved():
    out = standardize_smiles("N[C@@H](C)C(=O)O.Cl")
    assert canon_eq(out, "N[C@@H](C)C(=O)O")
    assert canonical_smiles(out) != canonical_smiles("N[C@H](C)C(=O)O")


def test_bad_input():
    assert standardize_smiles("not a smiles ((") is None


def test_mol_standardize_wiring():
    if HAS_RDKIT:
        pytest.skip("exercises the no-rdkit fallback")
    out = mol_standardize("NCCc1ccccc1.Cl")
    assert isinstance(out, str)
    assert canon_eq(out, "NCCc1ccccc1")


@pytest.mark.skipif(not HAS_RDKIT, reason="rdkit absent")
@pytest.mark.parametrize(
    "smi",
    ["NCCc1ccccc1.Cl", "CC(=O)[O-].[Na+]", "O.O.c1ccccc1CN",
     "[NH3+]CC(=O)[O-]", "c1ccccc1CCCC.CCO"],
)
def test_agreement_with_rdkit(smi):
    from rdkit import Chem

    ours = standardize_smiles(smi)
    theirs = mol_standardize(Chem.MolFromSmiles(smi))
    assert Chem.CanonSmiles(ours) == Chem.MolToSmiles(theirs)
