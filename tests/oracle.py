"""Load reference (torch) modules from /root/reference as numerical oracles.

The reference package is used read-only, imported by file path so that
rdkit-importing modules are never touched (rdkit is not installed here).
Only torch-only modules are loadable: tokenizers/trie*, smiles_vocab,
basic_transformer, smiles_xformer, e_gcl_sparse, e3gnn_clip, periodic_table,
fill_in_middle, and the simple_coati2 clones.

Tests compare coati_tpu outputs against these oracles on random weights;
no reference code is copied into the framework.
"""

from __future__ import annotations

import importlib.util
import sys

REF = "/root/reference/coati"

_PATHS = {
    "ref_trie": f"{REF}/models/encoding/tokenizers/trie.py",
    "ref_smiles_vocab": f"{REF}/models/encoding/tokenizers/smiles_vocab.py",
    "ref_basic_transformer": f"{REF}/models/encoding/basic_transformer.py",
    "ref_smiles_xformer": f"{REF}/models/encoding/smiles_xformer.py",
    "ref_e_gcl_sparse": f"{REF}/models/encoding/e_gcl_sparse.py",
    "ref_e3gnn_clip": f"{REF}/models/encoding/e3gnn_clip.py",
    "ref_periodic_table": f"{REF}/common/periodic_table.py",
    "ref_fill_in_middle": f"{REF}/models/encoding/fill_in_middle.py",
}

_cache: dict = {}

# Cross-imports each torch-only reference module actually needs,
# registered under the coati.* names it imports them by.
_DEPS = {
    "ref_smiles_xformer": {
        "coati.models.encoding.basic_transformer": "ref_basic_transformer"
    },
    "ref_e3gnn_clip": {
        "coati.common.periodic_table": "ref_periodic_table",
        "coati.models.encoding.e_gcl_sparse": "ref_e_gcl_sparse",
    },
}


def load(name: str):
    if name in _cache:
        return _cache[name]
    for fullname, key in _DEPS.get(name, {}).items():
        if fullname not in sys.modules:
            sys.modules[fullname] = load(key)
    spec = importlib.util.spec_from_file_location(name, _PATHS[name])
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def load_ref_clip_e2e():
    """Load the reference composite model module (clip_e2e.py) with stub
    shims for its rdkit-touching imports (rdkit is not installed here;
    only module-level names disable_logger/permute_smiles are needed to
    import, and composite-model tests never call them)."""
    import types

    if "ref_clip_e2e" in _cache:
        return _cache["ref_clip_e2e"]

    if "coati.containers.rdkit_utils" not in sys.modules:
        stub = types.ModuleType("coati.containers.rdkit_utils")
        stub.disable_logger = lambda: None
        stub.permute_smiles = lambda s: s
        sys.modules["coati.containers.rdkit_utils"] = stub
    shims = {
        "coati.models.encoding.e3gnn_clip": "ref_e3gnn_clip",
        "coati.models.encoding.fill_in_middle": "ref_fill_in_middle",
        "coati.models.encoding.smiles_xformer": "ref_smiles_xformer",
    }
    for fullname, key in shims.items():
        if fullname not in sys.modules:
            sys.modules[fullname] = load(key)
    if "coati.models.encoding.tokenizers.trie_tokenizer" not in sys.modules:
        ref_tokenizer()  # side effect: registers util shim + loads module
        spec = importlib.util.spec_from_file_location(
            "coati.models.encoding.tokenizers.trie_tokenizer",
            f"{REF}/models/encoding/tokenizers/trie_tokenizer.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["coati.models.encoding.tokenizers.trie_tokenizer"] = mod

    spec = importlib.util.spec_from_file_location(
        "ref_clip_e2e", f"{REF}/models/encoding/clip_e2e.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cache["ref_clip_e2e"] = mod
    return mod


def ensure_rdkit_module_stub():
    """Register a minimal top-level `rdkit` stub for reference modules
    that import rdkit at module scope (e.g.
    simple_coati2/transformer_only). CanonSmiles routes through OUR
    no-rdkit fallback (in-tree graph canonicalization) so oracle-parity
    tests exercise the same canonical forms the framework produces."""
    import types

    from coati_tpu.chem.rdkit_support import canonicalize_or_self

    if "rdkit" not in sys.modules:
        rdkit = types.ModuleType("rdkit")
        chem = types.ModuleType("rdkit.Chem")
        chem.CanonSmiles = canonicalize_or_self

        class _Log:
            def setLevel(self, *_):
                pass

        rdlogger = types.SimpleNamespace(
            DisableLog=lambda *_: None, logger=lambda: _Log(), CRITICAL=0
        )
        rdkit.Chem = chem
        rdkit.RDLogger = rdlogger
        sys.modules["rdkit"] = rdkit
        sys.modules["rdkit.Chem"] = chem
        sys.modules["rdkit.RDLogger"] = rdlogger
        return
    rdkit = sys.modules["rdkit"]
    if not hasattr(rdkit, "RDLogger"):
        class _Log:
            def setLevel(self, *_):
                pass

        rdkit.RDLogger = types.SimpleNamespace(
            DisableLog=lambda *_: None, logger=lambda: _Log(), CRITICAL=0
        )
        sys.modules["rdkit.RDLogger"] = rdkit.RDLogger


def load_path(fullname: str, path: str):
    """Load a reference module by file path under a registered module
    name (for modules whose siblings import them by that name)."""
    if fullname in sys.modules:
        return sys.modules[fullname]
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_simple_coati2_transformer_only():
    """The COATI2 inference module and its two sibling clones, with the
    rdkit stub (transformer_only imports Chem/RDLogger at module
    level)."""
    ensure_rdkit_module_stub()
    load_path(
        "coati.models.simple_coati2.basic_transformer",
        f"{REF}/models/simple_coati2/basic_transformer.py",
    )
    load_path(
        "coati.models.simple_coati2.smiles_xformer",
        f"{REF}/models/simple_coati2/smiles_xformer.py",
    )
    return load_path(
        "coati.models.simple_coati2.transformer_only",
        f"{REF}/models/simple_coati2/transformer_only.py",
    )


def load_ref_module(fullname: str):
    """Import a reference module through the real coati package (the
    reference's __init__.py files are all empty), with rdkit-touching
    imports stubbed. Use for modules with relative imports
    (e.g. clip_fp_e2e)."""
    import types

    if fullname in sys.modules:
        return sys.modules[fullname]
    if "coati.containers.rdkit_utils" not in sys.modules:
        stub = types.ModuleType("coati.containers.rdkit_utils")
        stub.disable_logger = lambda: None
        stub.permute_smiles = lambda s: s
        sys.modules["coati.containers.rdkit_utils"] = stub
    if "coati.common.s3" not in sys.modules:  # pulls boto3/pytz otherwise
        s3stub = types.ModuleType("coati.common.s3")
        s3stub.cache_read = open
        s3stub.download_from_s3 = lambda uri: uri
        s3stub.copy_bucket_dir_from_s3 = lambda *a, **k: None
        sys.modules["coati.common.s3"] = s3stub
    root = "/root/reference"
    if root not in sys.path:
        sys.path.insert(0, root)
    import importlib

    return importlib.import_module(fullname)


def ref_tokenizer(vocab_name: str = "mar_verysimple", n_seq: int = 256, side_tasks: bool = True):
    """Build the reference TrieTokenizer (needs a torch-free shim for
    coati.common.util.colored_background)."""
    import types

    if "coati.common.util" not in sys.modules:
        shim = types.ModuleType("coati.common.util")
        shim.colored_background = (
            lambda r, g, b, text: f"\033[48;2;{r};{g};{b}m{text}\033[0m"
        )
        sys.modules["coati.common.util"] = shim
    spec = importlib.util.spec_from_file_location(
        "ref_trie_tokenizer", f"{REF}/models/encoding/tokenizers/trie_tokenizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    if "coati.models.encoding.tokenizers.trie" not in sys.modules:
        sys.modules["coati.models.encoding.tokenizers.trie"] = load("ref_trie")
    spec.loader.exec_module(mod)
    vocab = load("ref_smiles_vocab").tokenizer_vocabs[vocab_name]
    return mod.TrieTokenizer(n_seq=n_seq, side_tasks=side_tasks, **vocab)
