#!/usr/bin/env python3
"""Synthesize a city-scale semantic drive as an npz Bag.

The reference validates against recorded drives (KITTI / ucity /
Morgantown rosbags, /root/reference/scripts/benchmark_loc.py:43-96);
those datasets aren't redistributable here, so this generator produces
an equivalent-difficulty workload: a Manhattan-style 6-class city
(terrain / road / building / vegetation / water / parking), a multi-km
drive along the road graph with 90-degree turns, LiDAR-like semantic
scans (range-limited, subsampled, position + label noise), odometry
priors with random-walk drift, and noisy GPS.

Usage: python benchmarks/city_bag.py [--out benchmarks/data]
Writes city.npz (Bag), city.png (viz/raster map), city_meta.json.
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLASS_NAMES = ["terrain", "road", "building", "vegetation", "water",
               "parking"]
CLASS_COLORS = [(120, 110, 90), (255, 0, 0), (0, 0, 255), (0, 160, 0),
                (0, 200, 255), (160, 0, 160)]


def rot2d(psi):
    c, s = np.cos(psi), np.sin(psi)
    return np.array([[c, -s], [s, c]], np.float64)


def make_city(h=1536, w=1536, seed=0):
    """Returns (class_maps (6,H,W) 0=present, street_ys, street_xs)."""
    rng = np.random.default_rng(seed)
    c = 6
    maps = np.ones((c, h, w), np.float32)

    # river first (roads bridge it)
    yy = np.arange(h)
    band_c = w * 0.72 + 60.0 * np.sin(yy / 180.0)
    for y in range(h):
        x0 = int(band_c[y])
        maps[4, y, max(0, x0 - 22) : min(w, x0 + 22)] = 0.0

    # irregular street grid
    ys = [24]
    while ys[-1] < h - 160:
        ys.append(ys[-1] + int(rng.integers(120, 260)))
    xs = [24]
    while xs[-1] < w - 160:
        xs.append(xs[-1] + int(rng.integers(120, 260)))
    ys = [y for y in ys if y < h - 24]
    xs = [x for x in xs if x < w - 24]
    road = np.zeros((h, w), bool)
    for y in ys:
        wd = int(rng.integers(5, 8))
        road[y - wd : y + wd, xs[0] : xs[-1] + 8] = True
    for x in xs:
        wd = int(rng.integers(5, 8))
        road[ys[0] : ys[-1] + 8, x - wd : x + wd] = True
    maps[1][road] = 0.0
    maps[4][road] = 1.0  # bridges

    # blocks: buildings (80%) / parking (20%); some park blocks
    for i in range(len(ys) - 1):
        for j in range(len(xs) - 1):
            y0, y1 = ys[i] + 12, ys[i + 1] - 12
            x0, x1 = xs[j] + 12, xs[j + 1] - 12
            if y1 - y0 < 30 or x1 - x0 < 30:
                continue
            if rng.random() < 0.12:  # park
                blob = rng.random((y1 - y0, x1 - x0)) < 0.6
                sub = maps[3, y0:y1, x0:x1]
                riv = maps[4, y0:y1, x0:x1] == 0
                sub[blob & ~riv] = 0.0
                continue
            for _ in range(int(rng.integers(2, 7))):
                bh = int(rng.integers(14, max(15, min(64, y1 - y0))))
                bw = int(rng.integers(14, max(15, min(64, x1 - x0))))
                by = int(rng.integers(y0, max(y0 + 1, y1 - bh)))
                bx = int(rng.integers(x0, max(x0 + 1, x1 - bw)))
                if np.any(maps[4, by : by + bh, bx : bx + bw] == 0):
                    continue
                target = 2 if rng.random() < 0.8 else 5
                maps[target, by : by + bh, bx : bx + bw] = 0.0
            if rng.random() < 0.5:  # street trees along the block edge
                for t in range(x0, x1 - 4, 28):
                    maps[3, y0 - 6 : y0 - 2, t : t + 4] = 0.0
    maps[0] = np.minimum(np.sum(1.0 - maps[1:], axis=0), 1.0)
    return maps, ys, xs


def make_drive(ys, xs, n_steps, step_px, seed=0):
    """Random walk on the street graph; returns (traj_px (T,2) x-y,
    psi (T,))."""
    rng = np.random.default_rng(seed)
    node = (len(ys) // 2, len(xs) // 4)
    prev = None
    waypts = [np.array([xs[node[1]], ys[node[0]]], np.float64)]
    need = n_steps * step_px
    total = 0.0
    while total < need + 400:
        ii, jj = node
        nbrs = [
            (ii + di, jj + dj)
            for di, dj in ((0, 1), (0, -1), (1, 0), (-1, 0))
            if 0 <= ii + di < len(ys) and 0 <= jj + dj < len(xs)
            and (ii + di, jj + dj) != prev
        ]
        nxt = nbrs[int(rng.integers(len(nbrs)))] if nbrs else prev
        prev, node = node, nxt
        wp = np.array([xs[node[1]], ys[node[0]]], np.float64)
        total += float(np.linalg.norm(wp - waypts[-1]))
        waypts.append(wp)
    pts = []
    for a, b in zip(waypts[:-1], waypts[1:]):
        d = float(np.linalg.norm(b - a))
        n = max(1, int(d / step_px))
        for t in range(n):
            pts.append(a + (b - a) * (t / n))
    traj = np.asarray(pts[:n_steps])
    d = np.diff(traj, axis=0)
    psi = np.arctan2(d[:, 1], d[:, 0])
    psi = np.append(psi, psi[-1])
    return traj, psi


def scan_at(maps, gt_px, psi, scale, max_range_m, n_pad, rng,
            noise_m=0.15, label_noise=0.02, per_class_cap=2048,
            realism=False):
    """LiDAR-like body-frame semantic points around gt (x,y,z,class).

    realism=True breaks the inverse crime of sampling map pixels
    directly (the sensor model would otherwise be perfectly matched to
    the map up to noise): building returns only at facades (a LiDAR
    sees walls, not roofs), occlusion ray-casting (points behind a
    building are dropped), partial vegetation transparency, heavier
    label confusion, and range-dependent dropout - the systematic
    scan-vs-aerial-map domain gaps of the reference's real workload."""
    c = maps.shape[0]
    r_px = int(max_range_m * scale) + 2
    x0 = max(0, int(gt_px[0]) - r_px)
    y0 = max(0, int(gt_px[1]) - r_px)
    sub = maps[:, y0 : y0 + 2 * r_px, x0 : x0 + 2 * r_px]
    r_inv = rot2d(-psi)
    pts = []
    building = None
    if realism:
        # facade mask: building cells adjacent to non-building
        b = sub[2] == 0
        interior = b.copy()
        interior[1:-1, 1:-1] = (
            b[1:-1, 1:-1] & b[:-2, 1:-1] & b[2:, 1:-1]
            & b[1:-1, :-2] & b[1:-1, 2:]
        )
        facade = b & ~interior
        building = b
    for cls in range(c):
        grid = sub[cls] == 0
        if realism and cls == 2:
            grid = facade
        ysn, xsn = np.nonzero(grid)
        if len(ysn) > per_class_cap:
            sel = rng.choice(len(ysn), per_class_cap, replace=False)
            ysn, xsn = ysn[sel], xsn[sel]
        d = (
            np.stack([xsn + x0, ysn + y0], -1).astype(np.float64)
            - gt_px[None]
        ) / scale
        r = np.linalg.norm(d, axis=1)
        keep = (r < max_range_m) & (r > 0.5)
        if realism:
            if cls == 3:  # vegetation: partially transparent canopy
                keep &= rng.random(len(r)) < 0.7
            # range-dependent dropout (beam divergence / sparsity)
            keep &= rng.random(len(r)) > 0.5 * (r / max_range_m) ** 2
        d, r = d[keep], r[keep]
        if realism and building is not None and len(d):
            # occlusion: sample the ray at ~1.5 px steps; drop the
            # point if any building cell lies strictly before it
            # (facades themselves survive: the test stops 2 px short)
            n_steps = 24
            tgrid = np.linspace(0.08, 1.0, n_steps)[None, :]
            px_end = (d * scale)  # offsets in px
            rx = gt_px[0] - x0 + px_end[:, 0:1] * tgrid
            ry = gt_px[1] - y0 + px_end[:, 1:2] * tgrid
            stop = np.maximum(
                (np.linalg.norm(px_end, axis=1) - 2.5)
                / np.maximum(np.linalg.norm(px_end, axis=1), 1e-6),
                0.0,
            )[:, None]
            before = tgrid < stop
            ih = np.clip(ry.astype(np.int64), 0, building.shape[0] - 1)
            iw = np.clip(rx.astype(np.int64), 0, building.shape[1] - 1)
            blocked = (building[ih, iw] & before).any(axis=1)
            d = d[~blocked]
        pb = (r_inv @ d.T).T
        pb = pb + rng.standard_normal(pb.shape) * noise_m
        lab = np.full((pb.shape[0], 1), cls, np.float64)
        pts.append(
            np.concatenate([pb, np.zeros_like(lab), lab], axis=1)
        )
    pts = np.concatenate(pts)
    ln = label_noise * (4.0 if realism else 1.0)
    flip = rng.random(len(pts)) < ln
    pts[flip, 3] = rng.integers(0, c, int(flip.sum()))
    if len(pts) > n_pad:
        pts = pts[rng.choice(len(pts), n_pad, replace=False)]
    out = np.zeros((n_pad, 4), np.float32)
    out[: len(pts)] = pts
    return out


def make_bag(maps, traj_px, psi, scale, dt=0.2, max_range_m=50.0,
             n_pad=8192, seed=0, odom_pos_noise=0.03,
             odom_yaw_noise=0.002, gps_noise_m=2.0,
             origin_latlon=(39.95, -75.16), realism=False):
    from top_down_renderer_tpu.io import Bag
    from top_down_renderer_tpu.io.replay import EARTH_R

    rng = np.random.default_rng(seed + 1)
    t = np.arange(len(traj_px)) * dt
    # odometry prior: integrate true deltas + random-walk noise
    world_m = traj_px / scale
    prior = np.zeros((len(t), 3))
    prior_psi = np.zeros(len(t))
    acc = np.zeros(2)
    acc_psi = 0.0
    for i in range(len(t)):
        if i:
            acc += (world_m[i] - world_m[i - 1]) + (
                rng.standard_normal(2) * odom_pos_noise
            )
            acc_psi += (psi[i] - psi[i - 1]) + (
                rng.standard_normal() * odom_yaw_noise
            )
        prior[i, :2] = acc
        prior_psi[i] = psi[0] + acc_psi
    quat = np.stack(
        [np.zeros(len(t)), np.zeros(len(t)),
         np.sin(prior_psi / 2), np.cos(prior_psi / 2)], axis=1
    )
    # GPS: true position in meters + noise -> lat/lon
    gps_m = world_m + rng.standard_normal(world_m.shape) * gps_noise_m
    lat0, lon0 = origin_latlon
    lat = lat0 + np.degrees(gps_m[:, 1] / EARTH_R)
    lon = lon0 + np.degrees(
        gps_m[:, 0] / (EARTH_R * math.cos(math.radians(lat0)))
    )
    scans = []
    offs = [0]
    for i in range(len(t)):
        scans.append(
            scan_at(maps, traj_px[i], psi[i], scale, max_range_m,
                    n_pad, rng, realism=realism)
        )
        offs.append(offs[-1] + n_pad)
    return Bag(
        scan_stamps=t,
        scan_points=np.concatenate(scans),
        scan_offsets=np.asarray(offs),
        prior_stamps=t,
        prior_pos=prior,
        prior_quat=quat,
        gps_stamps=t,
        gps_latlon=np.stack([lat, lon], axis=1),
    )


def save_world_png(maps, path):
    from PIL import Image

    h, w = maps.shape[1:]
    img = np.zeros((h, w, 3), np.uint8)
    img[...] = CLASS_COLORS[0]
    # draw in back-to-front priority; flipped to image coords
    for cls in (0, 3, 4, 5, 2, 1):
        img[maps[cls, ::-1] == 0] = CLASS_COLORS[cls]
    Image.fromarray(img).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data"))
    ap.add_argument("--hw", type=int, default=1536)
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--speed", type=float, default=8.0)  # m/s
    ap.add_argument("--dt", type=float, default=0.2)
    ap.add_argument("--scale", type=float, default=2.0)  # px/m
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--realism", action="store_true",
                    help="occlusion + facade-only buildings + dropout "
                    "(breaks the sample-the-map inverse crime); writes "
                    "city_hard.* instead of city.*")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    name = "city_hard" if args.realism else "city"
    maps, ys, xs = make_city(args.hw, args.hw, args.seed)
    step_px = args.speed * args.dt * args.scale
    traj, psi = make_drive(ys, xs, args.steps, step_px, args.seed)
    bag = make_bag(maps, traj, psi, args.scale, dt=args.dt,
                   seed=args.seed, realism=args.realism)
    bag.save(os.path.join(args.out, f"{name}.npz"))
    save_world_png(maps, os.path.join(args.out, f"{name}.png"))
    with open(os.path.join(args.out, f"{name}_meta.json"), "w") as f:
        json.dump(
            {
                "hw": args.hw, "steps": args.steps, "dt": args.dt,
                "speed_m_s": args.speed, "scale_px_m": args.scale,
                "seed": args.seed,
                "drive_len_m": float(
                    np.sum(np.linalg.norm(np.diff(traj, axis=0), axis=1))
                    / args.scale
                ),
                "classes": CLASS_NAMES,
                "colors": CLASS_COLORS,
                "realism": args.realism,
            }, f, indent=1,
        )
    print("bag:", os.path.join(args.out, f"{name}.npz"),
          "steps:", len(traj))


if __name__ == "__main__":
    main()
