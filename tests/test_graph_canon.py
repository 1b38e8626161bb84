"""In-tree canonical SMILES + circular fingerprints (chem/graph_canon.py,
chem/fingerprints.py) — the offline substitutes for RDKit's
Chem.CanonSmiles / GetMorganFingerprintAsBitVect that back
canon_smiles / canonicalize_or_self / identical_canonsmi / sim_mol /
mol_to_morgan (reference containers/rdkit_utils.py:82,94,104,140).

Pinned properties:
- canonical form is invariant under random atom-order rewriting
  (including tetrahedral and cis/trans stereo, via the writer's parity
  fixup) and idempotent, over hand cases and the full ChEMBL corpus;
- enantiomers stay distinct with use_chiral=True and collapse with
  use_chiral=False (reference identical_canonsmi useChiral semantics);
- fingerprints are permutation-invariant, deterministic across
  processes, and order similarity sensibly (self=1, analog>unrelated);
- when the real rdkit is importable, gated tests assert agreement:
  our canonical form maps to the same RDKit canonical SMILES as the
  input, and stereo permutations preserve RDKit identity.
"""

import os
import pickle
import random
import subprocess
import sys

import numpy as np
import pytest

from coati_tpu.chem import selfies_lite as sl
from coati_tpu.chem.fingerprints import (
    morgan_fingerprint,
    smiles_similarity,
    tanimoto,
)
from coati_tpu.chem.graph_canon import canonical_smiles
from coati_tpu.chem.rdkit_support import (
    HAS_RDKIT,
    canon_smiles,
    canonicalize_or_self,
    identical_canonsmi,
    mol_to_morgan,
    sim_mol,
)

CHEMBL_PKL = "/root/reference/examples/metadynamics/chembl_pic50.pkl"


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


EQUIV_GROUPS = [
    ["CCO", "OCC", "C(O)C"],
    ["CC(=O)O", "OC(C)=O", "C(C)(=O)O"],
    ["Cc1ccccc1", "c1ccccc1C", "c1ccc(C)cc1"],
    ["CC(C)Cc1ccc(cc1)C(C)C(=O)O", "OC(=O)C(C)c1ccc(CC(C)C)cc1"],
    ["CCO.CC", "CC.OCC"],
    ["[O-]C(=O)C", "CC([O-])=O"],
    # cross-form: kekulized and aromatic writings of one molecule unify
    # via rdkit-model aromaticity perception (chem/aromaticity.py)
    ["c1ccccc1", "C1=CC=CC=C1"],
    ["c1cc[nH]c1", "C1=CC=CN1"],
    ["c1ccncc1", "C1=CC=NC=C1"],
    ["c1ccoc1", "C1=CC=CO1"],
    ["c1ccsc1", "C1=CC=CS1"],
    ["c1c[nH]cn1", "C1=CN=CN1"],
    ["c1ccc2ccccc2c1", "C1=CC=C2C=CC=CC2=C1"],
    ["c1ccc2[nH]ccc2c1", "C1=CC=C2C(=C1)C=CN2"],
    ["O=c1cccc[nH]1", "O=C1C=CC=CN1"],
    ["Cn1c(=O)c2c(ncn2C)n(C)c1=O", "CN1C(=O)N(C)C2=C(C1=O)N(C)C=N2"],
    ["Cc1ccccc1", "CC1=CC=CC=C1"],
    ["CC(=O)Oc1ccccc1C(=O)O", "CC(=O)OC1=CC=CC=C1C(=O)O"],
]


@pytest.mark.parametrize("group", EQUIV_GROUPS)
def test_equivalent_writings_unify(group):
    forms = {canonical_smiles(s) for s in group}
    assert len(forms) == 1, (group, forms)


def test_idempotent_and_valid():
    for s in ["CCO", "c1ccccc1", "N[C@@H](C)C(=O)O", "F/C=C/F",
              "CC12CCC3c4cc(ccc4CCC3C1CCC2=O)O"]:
        c = canonical_smiles(s)
        assert canonical_smiles(c) == c
        assert sl.validate_smiles(c), c


def test_permutation_invariance_chembl():
    rng = random.Random(0)
    for s in chembl_smiles()[:250]:
        c0 = canonical_smiles(s)
        for _ in range(3):
            p = sl.permute_smiles(s, rng)
            assert canonical_smiles(p) == c0, (s, p)
        assert canonical_smiles(c0) == c0, s


def test_kekulize_invariance_chembl():
    """ChEMBL corpus: kekulizing a molecule and canonicalizing gives the
    same string as canonicalizing the aromatic dataset form — the
    unification property rdkit's CanonSmiles provides (reference
    containers/rdkit_utils.py:82) that makes SELFIES-decoded (kekulized)
    molecules dedup correctly against aromatic dataset forms."""
    for s in chembl_smiles()[:150]:
        m = sl.parse_smiles(s)
        sl.kekulize(m)
        kek = sl.write_smiles(m)
        assert canonical_smiles(kek) == canonical_smiles(s), (s, kek)


def test_aromatic_forms_stay_aromatic():
    """Perceived-aromatic rings write in aromatic (lowercase) form, and
    non-aromatic rings stay uppercase (fulvene must not aromatize)."""
    assert "c1" in canonical_smiles("C1=CC=CC=C1")
    assert "[nH]" in canonical_smiles("C1=CC=CN1")
    fulvene = canonical_smiles("C=C1C=CC=C1")
    assert "c" not in fulvene, fulvene
    cyclohexene = canonical_smiles("C1=CCCCC1")
    assert "c" not in cyclohexene, cyclohexene


def test_stereo_permutation_invariance():
    """Tetrahedral and cis/trans markers survive random rewriting: the
    writer re-orients @/@@ by permutation parity of the neighbor order
    (selfies_lite.write_smiles), so every permuted form canonicalizes
    back to the same string."""
    rng = random.Random(7)
    for s in [
        "N[C@@H](C)C(=O)O",
        "N[C@H](C)C(=O)O",
        "C[C@H]1CC[C@@H](N)CC1",
        "F/C=C/F",
        "F/C=C\\F",
        "CC/C=C(/C)CO",
        "O[C@@H]1CC[C@H](F)C1",
    ]:
        c0 = canonical_smiles(s)
        for _ in range(8):
            p = sl.permute_smiles(s, rng)
            assert canonical_smiles(p) == c0, (s, p, canonical_smiles(p))


def test_enantiomers_distinct_and_collapse():
    l_ala = "N[C@@H](C)C(=O)O"
    d_ala = "N[C@H](C)C(=O)O"
    assert canonical_smiles(l_ala) != canonical_smiles(d_ala)
    assert canonical_smiles(l_ala, use_chiral=False) == canonical_smiles(
        d_ala, use_chiral=False
    )
    cis, trans = "F/C=C\\F", "F/C=C/F"
    assert canonical_smiles(cis) != canonical_smiles(trans)
    assert canonical_smiles(cis, use_chiral=False) == canonical_smiles(
        trans, use_chiral=False
    )


def test_identical_canonsmi_offline():
    if HAS_RDKIT:
        pytest.skip("exercises the no-rdkit fallback")
    assert identical_canonsmi("CCO", "OCC")
    assert not identical_canonsmi("CCO", "CCN")
    assert not identical_canonsmi("N[C@@H](C)C(=O)O", "N[C@H](C)C(=O)O")
    assert identical_canonsmi(
        "N[C@@H](C)C(=O)O", "N[C@H](C)C(=O)O", use_chiral=0
    )


def test_canon_smiles_failure_semantics():
    if HAS_RDKIT:
        pytest.skip("exercises the no-rdkit fallback")
    assert canon_smiles("not a smiles !!") == "BAD_SMILES"
    # grammar outside the in-tree parser but syntactically plausible
    # passes through rather than being destroyed
    assert canon_smiles("C*") == "C*"
    assert canonicalize_or_self("not a smiles !!") == "not a smiles !!"
    assert canonicalize_or_self("OCC") == canonicalize_or_self("CCO")


# ---------------------------------------------------------- fingerprints


def test_fp_permutation_invariance():
    rng = random.Random(1)
    for s in chembl_smiles()[:120]:
        f0 = morgan_fingerprint(s)
        for _ in range(2):
            p = sl.permute_smiles(s, rng)
            assert np.array_equal(morgan_fingerprint(p), f0), (s, p)


def test_fp_similarity_structure():
    assert smiles_similarity("CCO", "CCO") == 1.0
    analog = smiles_similarity(
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O",  # ibuprofen
        "COc1ccc2cc(ccc2c1)C(C)C(=O)O",  # naproxen
    )
    unrelated = smiles_similarity("CC(C)Cc1ccc(cc1)C(C)C(=O)O", "NCCS")
    assert 0.15 < analog < 0.9
    assert unrelated < analog
    assert 0.0 <= unrelated <= 1.0


def test_fp_radius_and_bits():
    f2 = morgan_fingerprint("CC(C)Cc1ccc(cc1)C(C)C(=O)O", radius=2, n_bits=512)
    f3 = morgan_fingerprint("CC(C)Cc1ccc(cc1)C(C)C(=O)O", radius=3, n_bits=512)
    assert f2.shape == (512,) and f2.dtype == np.uint8
    assert f3.sum() >= f2.sum()  # more environments at higher radius
    assert set(np.unique(f2)) <= {0, 1}


def test_fp_cross_process_determinism():
    """FNV hashing, not builtin hash(): bit patterns are identical in a
    fresh interpreter with a different PYTHONHASHSEED."""
    s = "CC(C)Cc1ccc(cc1)C(C)C(=O)O"
    here = morgan_fingerprint(s).nonzero()[0].tolist()
    code = (
        "from coati_tpu.chem.fingerprints import morgan_fingerprint;"
        f"print(morgan_fingerprint({s!r}).nonzero()[0].tolist())"
    )
    env = dict(os.environ, PYTHONHASHSEED="12345")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert eval(out.stdout.strip()) == here


def test_sim_mol_and_mol_to_morgan_offline():
    if HAS_RDKIT:
        pytest.skip("exercises the no-rdkit fallback")
    assert sim_mol("CCO", "CCO") == 1.0
    assert 0.0 <= sim_mol("CCO", "c1ccccc1") < 1.0
    fp = mol_to_morgan("CCO", radius=2, n_bits=1024)
    assert fp.shape == (1024,) and fp.sum() > 0
    with pytest.raises(ImportError):
        mol_to_morgan("CCO", features=True)


# ------------------------------------------------- gated rdkit oracle


needs_rdkit = pytest.mark.skipif(not HAS_RDKIT, reason="rdkit not installed")


@needs_rdkit
def test_canonical_agrees_with_rdkit_identity():
    """Our canonical form must denote the SAME molecule as the input
    under RDKit's canonicalization — including absolute stereo. This is
    the oracle for the @/@@ parity convention that offline tests can
    only check for self-consistency."""
    from rdkit import Chem

    rng = random.Random(3)
    cases = [
        "N[C@@H](C)C(=O)O", "N[C@H](C)C(=O)O", "F/C=C/F", "F/C=C\\F",
        "C[C@H]1CC[C@@H](N)CC1",
    ] + chembl_smiles()[:100]
    for s in cases:
        c = canonical_smiles(s)
        assert Chem.CanonSmiles(c) == Chem.CanonSmiles(s), (s, c)
        p = sl.permute_smiles(s, rng)
        assert Chem.CanonSmiles(p) == Chem.CanonSmiles(s), (s, p)


@needs_rdkit
def test_fp_rank_agreement_with_rdkit():
    from rdkit import Chem
    from rdkit.Chem.AllChem import GetMorganFingerprintAsBitVect
    from rdkit import DataStructs

    probes = chembl_smiles()[:40]
    ref = "CC(C)Cc1ccc(cc1)C(C)C(=O)O"
    rfp = GetMorganFingerprintAsBitVect(Chem.MolFromSmiles(ref), 2, 2048)
    ours, theirs = [], []
    for s in probes:
        ours.append(smiles_similarity(ref, s))
        sfp = GetMorganFingerprintAsBitVect(Chem.MolFromSmiles(s), 2, 2048)
        theirs.append(DataStructs.TanimotoSimilarity(rfp, sfp))
    corr = np.corrcoef(ours, theirs)[0, 1]
    assert corr > 0.7, corr
