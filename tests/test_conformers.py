"""Offline distance-geometry conformers (chem/conformers.py) — VERDICT
r3 item 6: the 3D/point-encoder path runs from raw SMILES without
rdkit. Geometry sanity (bond-length RMS, clash-free), the reference
mol_to_atoms_coords contract (rdkit_utils.py:162-219), embed_points,
SMILES-only xform rows, EGNN consumption, and a gated rdkit-ETKDG
comparison."""

import numpy as np
import pytest

from coati_tpu.chem.conformers import (
    _bond_length,
    _HGraph,
    embed_conformer,
    embed_smiles_to_atoms_coords,
)
from coati_tpu.chem.selfies_lite import parse_smiles

try:
    from rdkit import Chem  # noqa: F401

    HAS_RDKIT = True
except Exception:  # noqa: BLE001
    HAS_RDKIT = False

MOLS = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Oc1ccccc1C(=O)O",
    "C1CCCCC1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "Cn1c(=O)c2c(ncn2C)n(C)c1=O",
    "C#N",
    "O=C(O)CN",
]


def _geometry_stats(s):
    atoms, coords, stress = embed_conformer(s)
    g = _HGraph(parse_smiles(s), True)
    rel = []
    bonded = set()
    for a, b, o, ar in g.edges:
        d = float(np.linalg.norm(coords[a] - coords[b]))
        ideal = _bond_length(g.elem[a], g.elem[b], o, ar)
        rel.append((d - ideal) / ideal)
        bonded.add((a, b))
        bonded.add((b, a))
    n = len(atoms)
    dist = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    nb = [dist[i, j] for i in range(n) for j in range(i + 1, n)
          if (i, j) not in bonded]
    return atoms, coords, np.asarray(rel), (min(nb) if nb else 9.0), stress


@pytest.mark.parametrize("smiles", MOLS)
def test_geometry_sane(smiles):
    atoms, coords, rel, min_nb, _ = _geometry_stats(smiles)
    assert np.isfinite(coords).all()
    assert np.sqrt((rel ** 2).mean()) < 0.05   # bond-length RMS < 5%
    assert np.abs(rel).max() < 0.10
    assert min_nb > 1.3                        # no nonbonded clashes
    assert atoms.dtype == np.uint8 and (atoms > 0).all()


def test_aromatic_rings_embed_uniform_bonds():
    """Aromatic bond lengths must be UNIFORM (~1.4 A, the 0.925 scale),
    not the kekulized 1.32/1.51 alternation: kekulize() clears aromatic
    flags while assigning alternating orders, so _HGraph must capture
    the flags first (regression: every aromatic training conformer was
    systematically distorted)."""
    from coati_tpu.chem.conformers import embed_conformer

    atoms, coords, _ = embed_conformer("c1ccccc1")
    heavy = [i for i, z in enumerate(atoms) if z != 1]
    ring = [
        np.linalg.norm(coords[heavy[i]] - coords[heavy[(i + 1) % 6]])
        for i in range(6)
    ]
    assert max(ring) - min(ring) < 0.12, ring
    assert 1.30 < np.mean(ring) < 1.50


def test_tiny_molecules_pad_coords_to_three_columns():
    """n < 3 atoms must still return (n, 3) coords (the reference
    contract); the MDS Gram matrix only has n-1 informative
    eigenvectors, so columns are zero-padded (regression: (1,1)/(2,2)
    shapes silently broadcast downstream)."""
    from coati_tpu.chem.conformers import embed_smiles_to_atoms_coords

    _, c = embed_smiles_to_atoms_coords("C", hydrogenate=False)
    assert c.shape == (1, 3)
    _, c = embed_smiles_to_atoms_coords("[H][H]", hydrogenate=False)
    assert c.shape == (2, 3)
    _, c = embed_smiles_to_atoms_coords("O", hydrogenate=False)
    assert c.shape == (1, 3)


def test_hydrogenate_layout_matches_addhs():
    """Heavy atoms first (parse order), hydrogens appended — the rdkit
    AddHs layout the reference data prep produces."""
    atoms, coords, _ = embed_conformer("CCO")
    assert list(atoms[:3]) == [6, 6, 8]
    assert (atoms[3:] == 1).all() and atoms.shape[0] == 9
    atoms_noh, _, _ = embed_conformer("CCO", hydrogenate=False)
    assert list(atoms_noh) == [6, 6, 8]


def test_contract_flags():
    """(atoms, coords[, adjacency][, morgan][, energy]) per the
    reference signature."""
    out = embed_smiles_to_atoms_coords("CCO")
    assert len(out) == 2
    out = embed_smiles_to_atoms_coords("CCO", adj_matrix=True)
    assert len(out) == 3 and out[2].shape == (9, 9)
    assert out[2].sum() == 2 * 8  # 8 bonds incl. hydrogens, symmetric
    out = embed_smiles_to_atoms_coords("CCO", do_morgan=True)
    assert len(out) == 3 and out[2].shape == (2048,)
    out = embed_smiles_to_atoms_coords("CCO", optimize=True, numConfs=3)
    assert len(out) == 3 and np.isfinite(out[2])  # stress surrogate


def test_deterministic():
    _, c1, _ = embed_conformer("CC(=O)Oc1ccccc1C(=O)O")
    _, c2, _ = embed_conformer("CC(=O)Oc1ccccc1C(=O)O")
    np.testing.assert_array_equal(c1, c2)


def test_mol_to_atoms_coords_dispatch():
    """The public quarantine entry works on SMILES with or without
    rdkit, and degrades to None on garbage (raise_on_failure=False)."""
    from coati_tpu.chem.rdkit_support import mol_to_atoms_coords

    out = mol_to_atoms_coords("CCO")
    assert out is not None
    atoms, coords = out[0], out[1]
    assert len(atoms) == len(coords) == 9
    assert mol_to_atoms_coords("not_a_smiles((") is None


def test_embed_points_offline():
    """generative/purifications.embed_points (reference
    coati_purifications.py:11) now runs from raw SMILES offline."""
    import jax

    from coati_tpu.generative.purifications import embed_points
    from coati_tpu.models.api import COATI
    from coati_tpu.models.coati import CoatiConfig, init_coati
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=32, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=16, n_embd_common=32, n_head=2, n_seq=32,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
    )
    model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    h = embed_points("CCO", model)
    assert h.shape[-1] == 32 and np.isfinite(h).all()


def test_xform_smiles_only_rows():
    """clip_ar_xform synthesizes atoms/coords for SMILES-only batches
    (VERDICT item 6 done-criterion)."""
    from coati_tpu.data.xform import clip_ar_xform
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=64, **get_vocab("mar"))
    batch = {"smiles": ["CCO", "c1ccccc1", "CC(=O)O"]}
    out = clip_ar_xform(batch, tok, p_clip=1.0, p_dataset=0.0,
                        p_formula=0.0)
    assert out["atoms"].shape[0] == 3
    assert out["coords"].shape == (*out["atoms"].shape, 3)
    assert (out["atoms"] > 0).any(axis=1).all()  # every row embedded
    assert out["tokens"].shape[0] == 3


def test_batch_pipe_smiles_only_rows_get_conformers():
    """REGRESSION (round 4): stack_batch ALWAYS emits atoms/coords
    columns — SMILES-only rows arrive at the xform as present-but-empty
    (B, 0) arrays, which the old key-presence guard missed. The
    trainer then fed all-zero atoms to the EGNN: h_e3gnn was
    row-constant, the CLIP loss floored at exactly ln(B), and its
    weighted noise gradient collapsed the SMILES encoder (the round-3
    1/554 greedy round-trip). Assert the trainer's exact path
    (batch_rows -> stack_batch -> clip_ar_xform) produces real
    conformers, and that a mixed batch keeps precomputed rows."""
    from coati_tpu.data.batch_pipe import batch_rows, stack_batch
    from coati_tpu.data.xform import clip_ar_xform
    from coati_tpu.tokenizers import get_vocab
    from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

    tok = TrieTokenizer(n_seq=64, **get_vocab("mar"))

    def xform(batch):
        return clip_ar_xform(batch, tok, p_clip=1.0, p_dataset=0.0,
                             p_formula=0.0)

    rows = [{"smiles": s, "source_collection": "chembl_mols"}
            for s in ("CCO", "c1ccccc1", "CC(=O)O", "CCN")]
    batches = list(batch_rows(iter(rows), batch_size=4, partition="raw",
                              xform_routine=xform,
                              required_fields=["smiles"]))
    assert len(batches) == 1
    out = batches[0]
    assert out["atoms"].shape[1] > 0
    assert (out["atoms"] > 0).any(axis=1).all()
    # CCO with hydrogens = 9 atoms; row alignment with smiles holds
    assert int((out["atoms"][0] > 0).sum()) == 9

    # mixed batch: a row with precomputed coords keeps them verbatim
    pre_atoms = np.array([6, 6, 8], np.int64)
    pre_coords = np.array([[0.0, 0, 0], [1.5, 0, 0], [2.2, 1.1, 0]])
    mixed = stack_batch([
        {"smiles": "CCO", "atoms": pre_atoms, "coords": pre_coords},
        {"smiles": "CCN"},
    ])
    out = xform(dict(mixed, source_collection=["x", "x"]))
    n0 = int((out["atoms"][0] > 0).sum())
    assert n0 == 3  # precomputed row untouched (not re-embedded to 9)
    np.testing.assert_allclose(out["coords"][0, :3], pre_coords, atol=0)
    assert (out["atoms"][1] > 0).sum() > 3  # synthesized row is real


def test_egnn_consumes_generated_coords():
    """E(3) invariance of the point encoder on DG-generated coords —
    rotating/translating a generated conformer must not change the
    pooled embedding."""
    import jax
    import jax.numpy as jnp

    from coati_tpu.models.egnn import EgnnConfig, egnn_forward, init_egnn

    cfg = EgnnConfig(hidden_nf=32, n_layers=2, message_cutoff=5.0,
                     instance_norm=True, torch_emb=False, residual=False,
                     dropout=0.0, precision="highest", remat=False)
    params = init_egnn(jax.random.PRNGKey(0), cfg)
    atoms, coords, _ = embed_conformer("CC(=O)Oc1ccccc1C(=O)O")
    atoms = atoms[None].astype(np.int64)
    coords = coords[None].astype(np.float32)
    q, _ = np.linalg.qr(np.random.default_rng(7).normal(size=(3, 3)))
    moved = coords @ q.T.astype(np.float32) + np.float32([1.5, -2.0, 0.7])
    out_a = np.asarray(egnn_forward(params, cfg, jnp.asarray(atoms),
                                    jnp.asarray(coords)))
    out_b = np.asarray(egnn_forward(params, cfg, jnp.asarray(atoms),
                                    jnp.asarray(moved)))
    np.testing.assert_allclose(out_a, out_b, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not HAS_RDKIT, reason="rdkit not importable")
def test_rdkit_etkdg_sanity_comparison():
    """Gated: DG bond lengths track rdkit-ETKDG bond lengths within
    10% on the shared molecule set."""
    from rdkit.Chem import AllChem

    for s in MOLS[:5]:
        m = Chem.AddHs(Chem.MolFromSmiles(s))
        AllChem.EmbedMolecule(m, randomSeed=0xF00D)
        conf = m.GetConformer()
        ref = np.asarray(conf.GetPositions())
        atoms, coords, _ = embed_conformer(s)
        assert len(atoms) == m.GetNumAtoms()
        for b in m.GetBonds():
            i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
            d_ref = np.linalg.norm(ref[i] - ref[j])
            d_ours = np.linalg.norm(coords[i] - coords[j])
            assert abs(d_ours - d_ref) / d_ref < 0.10, (s, i, j)
