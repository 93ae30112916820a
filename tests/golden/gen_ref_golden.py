"""Build and run the external C++ reference-semantics oracle; commit fixtures.

Run manually:  python tests/golden/gen_ref_golden.py

Compiles ref_oracle.cpp with g++ (no fast-math: IEEE f32), runs the fixture
configs, and writes tests/golden/ref_n64_*.npz. These fixtures are generated
OUTSIDE the framework (no JAX/numpy in the simulation path), so
tests/test_golden.py's comparison against them is an independent end-to-end
check of the physics semantics — not circular self-validation.
"""

import os
import subprocess

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ref_oracle.cpp")
BIN = os.path.join(HERE, "ref_oracle")

# (name, N, steps, fieldW, fieldH, minM, maxM, minR, maxR, growth, dt, seed)
CONFIGS = [
    # dense: merges + boundary flips within 20 steps (same scene as the
    # legacy golden_traj_n64.npz fixture)
    ("ref_n64_dense", 64, 20, 5000, 5000, "1e4", "1e17", "50", "200",
     "0.1", "0.2", 1024),
    # sparse: default-scene field, 100 steps of pure gravity (long horizon)
    ("ref_n64_sparse", 64, 100, 100000, 100000, "1e4", "1e17", "50", "200",
     "0.1", "0.2", 1024),
]


def build():
    subprocess.run(["g++", "-O2", "-std=c++17", "-o", BIN, SRC], check=True)


def run(name, n, steps, fw, fh, min_m, max_m, min_r, max_r, growth, dt, seed):
    raw_path = os.path.join(HERE, name + ".raw")
    subprocess.run([BIN, str(n), str(steps), str(fw), str(fh), min_m, max_m,
                    min_r, max_r, growth, dt, str(seed), raw_path], check=True)
    rec = np.fromfile(raw_path, np.float32).reshape(steps + 1, 6 * n)
    os.remove(raw_path)
    pos = rec[:, :2 * n].reshape(steps + 1, n, 2)
    vel = rec[:, 2 * n:4 * n].reshape(steps + 1, n, 2)
    mass = rec[:, 4 * n:5 * n]
    radius = rec[:, 5 * n:]
    out = os.path.join(HERE, name + ".npz")
    np.savez_compressed(out, pos=pos, vel=vel, mass=mass, radius=radius,
                        field=np.array([fw, fh], np.int64),
                        dt=np.float32(dt), seed=np.int64(seed),
                        growth=np.float32(growth))
    print(f"wrote {out}: {steps + 1} records, alive at end "
          f"{(mass[-1] > 0).sum()}/{n}")


if __name__ == "__main__":
    build()
    for c in CONFIGS:
        run(*c)
