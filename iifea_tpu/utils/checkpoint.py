"""Checkpoint / resume for time- and load-stepping loops.

The reference has none (SURVEY.md §5: state lives in memory only; outputs are
append-only CSVs). Here the unsteady drivers can persist their full state —
the background DOF vector(s), step index, and time — and resume exactly.

Format: a single .npz per checkpoint plus a rolling 'latest' symlink; arrays
are pulled to host once (np.asarray) and restored with device_put.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax


def save_checkpoint(directory: str, step: int, state: dict, meta: dict | None = None):
    """state: {name: array}; meta: small JSON-serializable scalars (t, Dt...)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:08d}.npz")
    arrays = {k: np.asarray(v) for k, v in state.items()}
    np.savez(path, **arrays)
    with open(path + ".meta.json", "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    latest = os.path.join(directory, "latest")
    tmp = latest + ".tmp"
    with open(tmp, "w") as f:
        f.write(os.path.basename(path))
    os.replace(tmp, latest)
    return path


def load_checkpoint(directory: str, step: int | None = None):
    """Returns (step, state dict of device arrays, meta dict) or None."""
    if step is None:
        latest = os.path.join(directory, "latest")
        if not os.path.exists(latest):
            return None
        name = open(latest).read().strip()
        path = os.path.join(directory, name)
    else:
        path = os.path.join(directory, f"ckpt_{step:08d}.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    state = {k: jax.device_put(data[k]) for k in data.files}
    meta = {}
    mp = path + ".meta.json"
    if os.path.exists(mp):
        meta = json.load(open(mp))
    return meta.get("step", step or 0), state, meta
