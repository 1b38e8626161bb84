"""Canonical SMILES via the in-tree parser (no RDKit).

Canonical atom ranking = Weisfeiler-Lehman (Morgan-style) iterative
refinement over graph-invariant atom seeds, followed by a branch-and-
bound tie-break: every member of the first ambiguous cell is tried and
the lexicographically smallest resulting SMILES wins. Because the
candidate set depends only on the molecular graph (never on input atom
order), the result is invariant under re-writings of the same molecule
— the property RDKit's Chem.CanonSmiles provides and the reference
uses for dedup/uniqueness statistics and augmentation targets
(reference containers/rdkit_utils.py:82 canon_smiles,
:104 identical_canonsmi; used all over examples/*.ipynb cell 26-style
validity/uniqueness accounting).

Scope and limits (documented, not silent):
- Canonical under ATOM-ORDER permutation of the same written form.
  There is no aromaticity re-perception, so a kekulized writing and an
  aromatic writing of the same molecule canonicalize to different
  strings (RDKit would unify them). Everything this framework emits —
  decoder samples, augmentation permutations, SELFIES decodes — stays
  within one form, so uniqueness/dedup statistics are exact.
- Tetrahedral markers are re-oriented per traversal by the writer's
  parity fixup (selfies_lite.write_smiles), so stereo SMILES
  canonicalize consistently; agreement with RDKit's absolute @/@@
  convention is asserted by a gated test when rdkit is importable.
- The tie-break search is capped at `budget` leaf writings; molecules
  that exhaust it (pathologically symmetric graphs far beyond drug
  space) fall back to first-member tie-breaks, which may depend on
  input order. Druglike molecules resolve in a handful of leaves.
"""

from __future__ import annotations

from dataclasses import replace
from functools import lru_cache
from typing import List, Optional, Tuple

from coati_tpu.chem.selfies_lite import (
    Atom,
    Bond,
    EncoderError,
    Mol,
    _bridges,
    _SMILES_VALENCE,
    kekulize,
    parse_smiles,
    write_smiles,
)

__all__ = ["canonical_smiles", "canonical_ranks", "implicit_hydrogens"]


def implicit_hydrogens(mol: Mol) -> List[int]:
    """Per-atom total hydrogen count (explicit bracket H, or the
    OpenSMILES organic-subset ladder on the kekulized graph). The count
    is kekule-choice-independent, so it is a valid canonical invariant
    even though individual bond orders are not."""
    # kekulize mutates bond orders and atom aromatic flags — copy both
    # shallowly (much cheaper than deepcopy in the host hot path)
    km = Mol(
        atoms=[replace(a) for a in mol.atoms],
        bonds=[Bond(b.a, b.b, b.order, b.aromatic) for b in mol.bonds],
        roots=mol.roots,
    )
    kekulize(km)
    bond_sum = [0] * len(km.atoms)
    for b in km.bonds:
        bond_sum[b.a] += b.order
        bond_sum[b.b] += b.order
    out = []
    for a in km.atoms:
        if a.hcount is not None:
            out.append(a.hcount)
            continue
        ladder = _SMILES_VALENCE.get(a.element, (0,))
        v = next((x for x in ladder if x >= bond_sum[a.idx]), bond_sum[a.idx])
        out.append(v - bond_sum[a.idx])
    return out


def _dense_ranks(keys: list) -> List[int]:
    order = sorted(set(keys))
    lut = {k: i for i, k in enumerate(order)}
    return [lut[k] for k in keys]


def _labeled_adj(mol: Mol) -> List[List[Tuple[int, int]]]:
    """(edge label, neighbor) lists; aromatic bonds get label 5 so a
    kekule choice can never leak into the ranking."""
    adj: List[List[Tuple[int, int]]] = [[] for _ in mol.atoms]
    for b in mol.bonds:
        label = 5 if b.aromatic else b.order
        adj[b.a].append((label, b.b))
        adj[b.b].append((label, b.a))
    return adj


def _refine(ladj: List[List[Tuple[int, int]]], ranks: List[int]) -> List[int]:
    """WL refinement to a fixed point: each round appends the sorted
    multiset of (edge label, neighbor rank) to every atom's key."""
    n_classes = len(set(ranks))
    n = len(ranks)
    while True:
        keys = [
            (ranks[i], tuple(sorted((lb, ranks[j]) for lb, j in ladj[i])))
            for i in range(n)
        ]
        new = _dense_ranks(keys)
        new_classes = len(set(new))
        if new_classes == n_classes:
            return new
        ranks, n_classes = new, new_classes


def canonical_ranks(mol: Mol) -> List[int]:
    """Refined (possibly non-discrete) invariant ranks. Chirality tags
    are deliberately excluded: @/@@ are writing-order-dependent, so
    they are not graph invariants — stereo is resolved at write time by
    the parity fixup instead."""
    h = implicit_hydrogens(mol)
    bridges = _bridges(mol)
    in_ring = [False] * len(mol.atoms)
    for bi, b in enumerate(mol.bonds):
        if bi not in bridges:
            in_ring[b.a] = in_ring[b.b] = True
    ladj = _labeled_adj(mol)
    seeds = [
        (
            a.element,
            a.charge,
            a.isotope,
            bool(a.aromatic),
            len(ladj[a.idx]),
            h[a.idx],
            in_ring[a.idx],
        )
        for a in mol.atoms
    ]
    return _refine(ladj, _dense_ranks(seeds))


def _first_ambiguous_cell(ranks: List[int]) -> Optional[List[int]]:
    cells: dict = {}
    for i, r in enumerate(ranks):
        cells.setdefault(r, []).append(i)
    for r in sorted(cells):
        if len(cells[r]) > 1:
            return cells[r]
    return None


def _bump(ranks: List[int], chosen: int) -> List[int]:
    """Give `chosen` its own class just below its former cell."""
    keys: List[Tuple[int, int]] = [
        (r, 0 if i == chosen else 1) for i, r in enumerate(ranks)
    ]
    return _dense_ranks(keys)


def _search(
    mol: Mol,
    ladj: List[List[Tuple[int, int]]],
    ranks: List[int],
    budget: List[int],
) -> str:
    ranks = _refine(ladj, ranks)
    cell = _first_ambiguous_cell(ranks)
    if cell is None:
        return write_smiles(mol, order=ranks)
    if budget[0] <= 0:
        # budget exhausted: deterministic-but-not-order-invariant fallback
        return _search(mol, ladj, _bump(ranks, cell[0]), budget)
    best: Optional[str] = None
    for member in cell:
        budget[0] -= 1
        cand = _search(mol, ladj, _bump(ranks, member), budget)
        if best is None or cand < best:
            best = cand
        if budget[0] <= 0:
            break
    assert best is not None
    return best


@lru_cache(maxsize=200_000)
def _canonical_cached(smiles: str, use_chiral: bool, budget: int) -> str:
    mol = parse_smiles(smiles)
    if not use_chiral:
        for a in mol.atoms:
            a.chirality = ""
        for b in mol.bonds:
            b.stereo = ""
            b.stereo_at = -1
    ranks = canonical_ranks(mol)
    return _search(mol, _labeled_adj(mol), ranks, [budget])


def canonical_smiles(
    smiles: str, use_chiral: bool = True, budget: int = 512
) -> str:
    """Canonical SMILES of `smiles` under atom-order permutation.
    use_chiral=False strips tetrahedral and cis/trans markers first
    (reference identical_canonsmi's useChiral=0 semantics,
    rdkit_utils.py:104-108). Raises EncoderError on unparseable input.
    LRU-cached (the training xform canonicalizes the same corpus every
    epoch; steady-state cost is a dict hit)."""
    return _canonical_cached(smiles, use_chiral, budget)
