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

__all__ = ["save_state", "load_state", "save_adaptive_state", "load_adaptive_state"]


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


def save_adaptive_state(path, space, x, meta: dict | None = None):
    """Checkpoint an AMR state: the adaptive mesh (origins/sizes/levels +
    domain box), the degree, and the solution vector — enough to resume a
    solve→estimate→mark→refine loop after preemption."""
    mesh = space.mesh
    m = dict(meta or {})
    m["degree"] = int(space.degree)
    m["dtype"] = str(space.dtype)
    m["lower"] = [float(v) for v in mesh.lower]
    m["upper"] = [float(v) for v in mesh.upper]
    return save_state(
        path,
        {
            "origins": mesh.origins,
            "sizes": mesh.sizes,
            "levels": mesh.levels,
            "x": x,
        },
        meta=m,
    )


def load_adaptive_state(path):
    """Returns ``(space, x, meta)`` rebuilt from a
    :func:`save_adaptive_state` checkpoint."""
    import jax.numpy as jnp

    from ..adaptive import AdaptiveMesh, AdaptiveSpace

    arrays, meta = load_state(path)
    mesh = AdaptiveMesh(
        arrays["origins"],
        arrays["sizes"],
        arrays["levels"],
        tuple(meta["lower"]),
        tuple(meta["upper"]),
    )
    space = AdaptiveSpace(mesh, meta["degree"], dtype=jnp.dtype(meta["dtype"]))
    return space, jnp.asarray(arrays["x"], dtype=space.dtype), meta
