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
    # BASELINE config 1 scale: N=1024 on the default-scene field, 200 steps —
    # long-horizon end-to-end parity at the N the BASELINE row certifies
    # (merges + near-encounters happen; see test_golden.py for the staged
    # tolerance rationale)
    ("ref_n1k", 1024, 200, 100000, 100000, "1e4", "1e17", "50", "200",
     "0.1", "0.2", 1024),
]


# frame fixtures: scenes rendered by the oracle's serial
# generateImage/saveImageToDisk implementation (nbody.cu:294-371 semantics).
# 512x512 on the 5000-field makes max r_px ~20 (disc diameter > the
# rasterizer's default 32-pixel patch after growth), so the oversized-disc
# dense pass is exercised too. The n1k frames pin rendering at BASELINE
# config-1 scale (default field: sub-pixel radii exercise the 1-pixel dot
# path, nbody.cu:323-347 bounding-box degenerate case).
FRAMES = [
    ("ref_frames_n64", CONFIGS[0], 512, 512, 5),
    ("ref_frames_n1k", CONFIGS[2], 512, 512, 50),
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


def run_frames(spec):
    import tempfile

    name, cfg, img_w, img_h, every = spec
    (_, n, steps, fw, fh, min_m, max_m, min_r, max_r, growth, dt, seed) = cfg
    with tempfile.TemporaryDirectory() as td:
        raw_path = os.path.join(td, "traj.raw")
        subprocess.run([BIN, str(n), str(steps), str(fw), str(fh), min_m,
                        max_m, min_r, max_r, growth, dt, str(seed), raw_path,
                        str(img_w), str(img_h), str(every), td], check=True)
        labels = list(range(0, steps, every))
        frames, raw_bytes = [], []
        for s in labels:
            data = open(os.path.join(td, f"iteration_{s}.ppm"), "rb").read()
            raw_bytes.append(data)
            header = b"P5\n%d %d\n255\n" % (img_w, img_h)
            assert data[:len(header)] == header, data[:32]
            frames.append(np.frombuffer(data[len(header):], np.uint8)
                          .reshape(img_h, img_w))
    out = os.path.join(HERE, name + ".npz")
    np.savez_compressed(
        out, frames=np.stack(frames), steps=np.array(labels, np.int64),
        img=np.array([img_w, img_h], np.int64),
        field=np.array([fw, fh], np.int64),
        file_bytes=np.stack([np.frombuffer(b, np.uint8) for b in raw_bytes]))
    print(f"wrote {out}: {len(frames)} frames {img_w}x{img_h}")


if __name__ == "__main__":
    # optional argv name filter, e.g. `python gen_ref_golden.py ref_n1k` —
    # regenerates only matching fixtures (the committed N=64 fixtures are
    # byte-pinned history; don't churn them when adding a new config)
    import sys

    only = set(sys.argv[1:])
    build()
    for c in CONFIGS:
        if not only or c[0] in only:
            run(*c)
    for spec in FRAMES:
        if not only or spec[0] in only:
            run_frames(spec)
