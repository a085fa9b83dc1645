#!/usr/bin/env python
"""Render a simulation rollout to PNG frames (offline VisPy-analog:
the reference's `vispy_visualization.py` timer loop becomes stepped
on-device framebuffer renders).

    python tools/record_frames.py --size 256 --ticks 600 --every 5 \
        --out /tmp/frames
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from trafficsimulation_tpu.config import Config
from trafficsimulation_tpu.sim import TrafficSim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--every", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/tsim_frames")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    cfg = Config(WIDTH=args.size, HEIGHT=args.size,
                 WALL_THICKNESS=max(8, args.size // 16),
                 MAX_FIELD_DESTS=min(256, args.size))
    sim = TrafficSim(cfg, seed=args.seed)

    try:
        from PIL import Image
    except ImportError:
        print("PIL unavailable; writing raw .npy frames")
        Image = None

    for i in range(args.ticks // args.every):
        sim.step(args.every)
        fb = np.asarray(sim.render())[::-1]   # north-up
        path = os.path.join(args.out, f"frame_{i:05d}")
        if Image is not None:
            Image.fromarray(fb).save(path + ".png")
        else:
            np.save(path + ".npy", fb)
    print(f"wrote {args.ticks // args.every} frames to {args.out}")
    print("encode: ffmpeg -framerate 20 -i frame_%05d.png out.mp4")


if __name__ == "__main__":
    main()
