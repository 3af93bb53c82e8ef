#!/usr/bin/env python3
"""Live/offline visualization of a replay.

Capability port of /root/reference/scripts/top_down_render.py (the
matplotlib prototype viewer): renders the polar scan, the argmax
semantic view, and the particle overlay for each step of a bag replay.

Usage: python scripts/live_view.py --bag bag.npz --map world.png \
          --classes classes.yaml [--out frames_dir]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True)
    ap.add_argument("--map", required=True, help="color raster map png")
    ap.add_argument("--classes", required=True, help="classes yaml")
    ap.add_argument("--scale", type=float, required=True, help="px/m")
    ap.add_argument("--out", default="", help="save frames instead of UI")
    ap.add_argument("--particles", type=int, default=4096)
    args = ap.parse_args()

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from top_down_renderer_tpu.config import (
        ClassConfig,
        MapConfig,
        RuntimeParams,
    )
    from top_down_renderer_tpu.io import Bag, replay
    from top_down_renderer_tpu.runtime.node import TopDownRenderNode

    cc = ClassConfig.from_yaml(args.classes)
    mc = MapConfig(raster_path=args.map, viz_path=args.map,
                   resolution=args.scale)
    node = TopDownRenderNode(
        cc, mc, RuntimeParams(particle_count=args.particles,
                              use_motion_prior=True),
    )
    from PIL import Image
    import numpy as np

    node.background_img = np.asarray(Image.open(args.map).convert("RGB"))

    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    frame = [0]

    def on_scan(img):
        axes[0].clear()
        axes[0].imshow(img)
        axes[0].set_title("polar scan (argmax)")

    def on_map(img):
        if img is None:
            return
        axes[1].clear()
        axes[1].imshow(img[::-1])
        axes[1].set_title(
            f"particles (n={node.filter.num_particles()})"
        )
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            fig.savefig(f"{args.out}/frame_{frame[0]:05d}.png")
        else:
            plt.pause(0.01)
        frame[0] += 1

    node.on("scan", on_scan)
    node.on("map_viz", on_map)

    bag = Bag.load(args.bag)
    replay(node, bag)
    print("done;", frame[0], "frames")


if __name__ == "__main__":
    main()
