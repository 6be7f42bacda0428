"""Load single files from the read-only reference checkout as numeric test oracles.

The reference at /root/reference is the behavioral spec; importing its torch modules
at test time (never vendoring them) gives exact parity targets for our JAX
implementations. Files with unavailable dependencies (ftfy, axial_attention,
pytorch_lightning) get lightweight stubs where the stub provably doesn't affect the
oracle's numerics for the inputs we test.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.is_dir()


def _install_stub(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod


def load_reference_module(relpath: str, module_name: str):
    """Import a single reference file by path, bypassing the src package tree."""
    if module_name in sys.modules:
        return sys.modules[module_name]
    path = REFERENCE_ROOT / relpath
    spec = importlib.util.spec_from_file_location(module_name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    return module


def load_reference_clip_model():
    """The vendored CLIP architecture (torch-only imports)."""
    return load_reference_module("src/models/components/clip/model.py", "_ref_clip_model")


def load_reference_tokenizer():
    """The vendored tokenizer; ftfy is stubbed with the identity, which is exact for
    ASCII inputs (ftfy only repairs mojibake/unicode oddities)."""
    _install_stub("ftfy", fix_text=lambda text: text)
    mod = load_reference_module(
        "src/models/components/clip/simple_tokenizer.py", "_ref_simple_tokenizer"
    )
    return mod


def load_reference_selector():
    return load_reference_module(
        "src/models/components/selector_model.py", "_ref_selector_model"
    )


def load_reference_loss():
    return load_reference_module("src/models/components/loss.py", "_ref_loss")
