"""Helpers to load the *reference* PyTorch implementation for golden tests.

The reference repo (read-only at /root/reference) depends on xformers and
diffusers, which are not installed; we inject minimal stand-ins
(`stubs.install()`) so the reference modules import and run on CPU torch.
The stubs re-implement only the public semantics the reference exercises
(xformers memory_efficient_attention == SDPA; diffusers Attention in its
deprecated-attn-block configuration).  Conv / norm / pad numerics still
come from real torch, so these tests validate our JAX numerics against
torch's kernels end-to-end.
"""

import importlib
import os
import sys

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def load_reference_module(name: str):
    """Import e.g. 'models.vae_models' from the reference repo.

    For 'lvdm.*' targets the `lvdm` and `lvdm.modules` package __init__
    files are bypassed with namespace shims: they eagerly import the
    Lightning/conditioner stack (lvdm/__init__.py:1-2,
    lvdm/modules/__init__.py:1), which needs pytorch_lightning /
    open_clip — not installed here and irrelevant to the leaf modules
    the golden tests exercise."""
    from tests.torch_ref import stubs
    stubs.install()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if name.startswith("lvdm."):
        import types
        for pkg, sub in [("lvdm", "lvdm"), ("lvdm.modules", "lvdm/modules")]:
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = [os.path.join(REFERENCE_ROOT, sub)]
                sys.modules[pkg] = m
    return importlib.import_module(name)
