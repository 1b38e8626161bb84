"""Molecule-image helpers for notebook/report visualization.

Parity target: coati/math_tools/plots.py:4-26. RDKit-gated.
"""

from __future__ import annotations

import base64
from io import BytesIO

from coati_tpu.chem.rdkit_support import require_rdkit


def get_smiles_image(s: str, size=(300, 300)):
    require_rdkit("get_smiles_image")
    from rdkit import Chem
    from rdkit.Chem import Draw

    return Draw.MolToImage(Chem.MolFromSmiles(s), size=size)


def wrapped_get_smiles_image(x, size=(300, 300)):
    if not isinstance(x, str) or x is None:
        return get_smiles_image("C", size=size)
    try:
        return get_smiles_image(x, size=size)
    except Exception:  # noqa: BLE001
        return get_smiles_image("C", size=size)


def image_formatter2(im, size=(90, 90)) -> str:
    """PIL image -> base64 data URI (for altair tooltips)."""
    with BytesIO() as buffer:
        im.thumbnail(size)
        im.save(buffer, "png")
        data = base64.encodebytes(buffer.getvalue()).decode("utf-8")
    return f"data:image/png;base64,{data}"
