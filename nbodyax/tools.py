"""Post-processing utilities.

``python -m nbodyax.tools gif <frame_dir> [out.gif] [--fps 20] [--scale 1]``
assembles the ``iteration_*.ppm`` frames a run produced (the reference's
visual-regression artifact, nbody.cu:513-522) into an animated GIF.

``python -m nbodyax.tools dump <checkpoint> [--limit K] [--alive-only]``
prints per-body state rows from a checkpoint — the analog of the reference's
``printData()`` manual-inspection dump (nbody.cu:112-123), reading the
persisted state instead of in-RAM arrays (a checkpoint holds the full
pytree, io/checkpoint.py).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

_FRAME_RE = re.compile(r"^iteration_(\d+)\.ppm$")


def read_pgm(path: str) -> np.ndarray:
    """Read the binary P5 files our writer (and the reference) produce."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError(f"{path}: not a binary PGM (P5) file")
    # header: P5 <ws> width <ws> height <ws> maxval <single ws> raster
    parts = data.split(b"\n", 3)
    w, h = (int(v) for v in parts[1].split())
    raster = parts[3][:w * h]
    return np.frombuffer(raster, np.uint8).reshape(h, w)


def list_frames(directory: str):
    frames = []
    for name in os.listdir(directory):
        m = _FRAME_RE.match(name)
        if m:
            frames.append((int(m.group(1)), os.path.join(directory, name)))
    return [p for _, p in sorted(frames)]


def make_gif(frame_dir: str, out: str = "", fps: float = 20.0,
             scale: int = 1) -> str:
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise SystemExit("GIF assembly needs pillow") from e
    paths = list_frames(frame_dir)
    if not paths:
        raise SystemExit(f"no iteration_*.ppm frames in {frame_dir}")
    out = out or os.path.join(frame_dir, "animation.gif")
    images = []
    for p in paths:
        arr = read_pgm(p)
        if scale > 1:
            arr = arr[::scale, ::scale]
        images.append(Image.fromarray(arr, mode="L"))
    images[0].save(out, save_all=True, append_images=images[1:],
                   duration=max(1, int(1000 / fps)), loop=0)
    return out


def dump_checkpoint(path: str, limit: int = 0, alive_only: bool = False,
                    out=None) -> int:
    """Print per-body rows (printData analog, nbody.cu:112-123). Returns the
    number of bodies printed."""
    out = out or sys.stdout
    from nbodyax.io.checkpoint import load_checkpoint
    state = load_checkpoint(path)
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    mass = np.asarray(state.mass)
    radius = np.asarray(state.radius)
    alive = mass > 0
    print(f"Checkpoint {path}: step {int(np.asarray(state.step))}, "
          f"sim_time {float(np.asarray(state.sim_time)):.6g}, "
          f"{int(alive.sum())} alive / {mass.shape[0]} slots", file=out)
    printed = 0
    for i in range(mass.shape[0]):
        if alive_only and not alive[i]:
            continue
        if limit and printed >= limit:
            print(f"... ({mass.shape[0] - i} more slots)", file=out)
            break
        # same fields and precision as the reference's printData
        coords = ", ".join(f"{c:.4f}" for c in pos[i])
        vels = ", ".join(f"{c:.4f}" for c in vel[i])
        print(f"Body #{i}{'' if alive[i] else ' (dead)'}", file=out)
        print(f"Position: ({coords})", file=out)
        print(f"Velocity: ({vels})", file=out)
        print(f"Mass: {mass[i]:.4f}", file=out)
        print(f"Radius: {radius[i]:.4f}", file=out)
        print("--------------", file=out)
        printed += 1
    return printed


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nbodyax.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gif", help="assemble frames into an animated GIF")
    g.add_argument("frame_dir")
    g.add_argument("out", nargs="?", default="")
    g.add_argument("--fps", type=float, default=20.0)
    g.add_argument("--scale", type=int, default=1,
                   help="downsample factor (2 = half resolution)")
    d = sub.add_parser("dump", help="print per-body state from a checkpoint "
                                    "(the reference's printData analog)")
    d.add_argument("checkpoint")
    d.add_argument("--limit", type=int, default=0,
                   help="print at most K bodies (0 = all)")
    d.add_argument("--alive-only", action="store_true")
    args = ap.parse_args(argv)
    if args.cmd == "gif":
        out = make_gif(args.frame_dir, args.out, args.fps, args.scale)
        print(f"wrote {out} ({len(list_frames(args.frame_dir))} frames)")
    elif args.cmd == "dump":
        dump_checkpoint(args.checkpoint, args.limit, args.alive_only)
    return 0


if __name__ == "__main__":
    sys.exit(main())
