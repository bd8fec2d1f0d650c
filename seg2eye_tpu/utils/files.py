"""Source snapshot for reproducibility (reference: util/files.py:54-73 —
copies all project .py files into checkpoints/<name>/src.zip at train start).
"""
from __future__ import annotations

import os
import zipfile


def project_root() -> str:
    """The framework checkout (parent of the seg2eye_tpu package) — the
    tree the snapshot should capture regardless of the CLI's cwd."""
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def copy_src(path_from: str, path_to: str) -> str:
    os.makedirs(path_to, exist_ok=True)
    out = os.path.join(path_to, "src.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(path_from):
            dirs[:] = [d for d in dirs
                       if d not in (".git", "__pycache__", "checkpoints",
                                    ".jax_cache", ".pytest_cache")]
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, path_from))
    return out
