"""Checkpoint / resume.

The reference has no persistence at all — state lives only in RAM and a run
cannot resume (SURVEY.md section 5). Here the whole sim state is one small
pytree, so checkpointing is a single ``np.savez`` per snapshot: portable,
dependency-free, and bit-exact on restore (float32 arrays round-trip
losslessly). Needed for the long 10k-step configs (BASELINE config 5).

Files: ``{dir}/step_{step:09d}.npz`` holding pos/vel/mass/radius/step plus a
format version. ``latest_checkpoint`` finds the newest by step number.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

from nbodyax.state import SimState, make_state

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_FORMAT_VERSION = 1
_NAME_RE = re.compile(r"^step_(\d+)\.npz$")


def save_checkpoint(directory: str, state: SimState) -> str:
    os.makedirs(directory, exist_ok=True)
    step = int(np.asarray(state.step))
    path = os.path.join(directory, f"step_{step:09d}.npz")
    tmp = path + ".tmp.npz"  # .npz suffix so np.savez doesn't append one
    np.savez(tmp,
             version=np.int32(_FORMAT_VERSION),
             pos=np.asarray(state.pos),
             vel=np.asarray(state.vel),
             mass=np.asarray(state.mass),
             radius=np.asarray(state.radius),
             step=np.int32(step),
             sim_time=np.float32(np.asarray(state.sim_time)))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> SimState:
    with np.load(path) as z:
        version = int(z["version"])
        if version > _FORMAT_VERSION:
            raise ValueError(f"checkpoint {path} has newer format {version}")
        # sim_time absent in pre-adaptiveDt snapshots: resume at 0 (the
        # field is observability, not physics; fixed-dt time can be
        # reconstructed as step*dt if needed)
        t = float(z["sim_time"]) if "sim_time" in z.files else 0.0
        return make_state(z["pos"], z["vel"], z["mass"], z["radius"],
                          step=int(z["step"]), sim_time=t)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = _NAME_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best, best_step = name, int(m.group(1))
    return os.path.join(directory, best) if best else None
