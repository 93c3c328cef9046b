"""Checkpoint/restore of solver state (aux subsystem: the reference has
none — SURVEY.md section 5 "Checkpoint/resume: none" — its closest artifact
being VTU dumps; this adds a real save/restore so long CG runs and
benchmark sweeps survive preemption, which matters at pod scale).

Format: a single .npz per checkpoint holding named arrays + metadata.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path, arrays: dict, meta: dict | None = None):
    """arrays: name -> jax/np array. Device arrays are fetched to host."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = {k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
    host["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **host)
    return path


def load_state(path):
    """Returns (arrays: dict[str, np.ndarray], meta: dict)."""
    with np.load(Path(path)) as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode()) if "__meta__" in z.files else {}
    return arrays, meta
