#!/usr/bin/env python3
"""Synthesize an ORGANIC town drive as an npz Bag - the independent
second world generator (provenance distinct from city_bag.py).

Everything that could share assumptions with the filter or with
city_bag is deliberately different here:

  geometry   curvature-bounded drive curve grown FIRST, then an organic
             road web (arcs + branches) grown around it; buildings are
             rotated rectangles along road frontage; parks are value-
             noise blobs; a meandering river with bridges.  No grid, no
             axis-aligned anything.  Geometry randomness comes from
             stdlib random.Random (Mersenne Twister), not numpy.
  sensor     a ray-marching LiDAR: B azimuth beams stepped outward from
             the vehicle; buildings occlude (first hit ends the beam),
             vegetation is semi-transparent, ground classes return
             sparse samples along the beam with range-decaying density.
             Returns carry along-beam range noise + angular jitter -
             points live on beam rays, not on map-pixel centers, so the
             scan's spatial statistics are unrelated to the map raster
             the filter scores against.
  odometry   multiplicative speed-scale error + slowly-varying
             (Gauss-Markov) yaw-rate bias + white noise - not the
             random-walk model of city_bag.
  gps        Gauss-Markov (autocorrelated) position error with
             occasional outages - not iid noise.

Consumed by benchmarks/bench_loc.py via --bag town (same Bag npz / png
/ meta contract as city_bag; same 6-class palette = the map-format
convention, like the reference's shared semantic palette across its
KITTI/ucity/Morgantown bags, /root/reference/scripts/benchmark_loc.py:
141-146).

Usage: python benchmarks/town_bag.py [--out benchmarks/data]
Writes town.npz (Bag), town.png (raster map), town_meta.json.
"""

import argparse
import json
import math
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from city_bag import CLASS_COLORS, CLASS_NAMES  # shared palette only

TERRAIN, ROAD, BUILDING, VEG, WATER, PARKING = range(6)


def _stamp_disk(mask, x, y, r):
    h, w = mask.shape
    x0, x1 = max(0, int(x - r)), min(w, int(x + r + 1))
    y0, y1 = max(0, int(y - r)), min(h, int(y + r + 1))
    if x0 >= x1 or y0 >= y1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask[y0:y1, x0:x1] |= (xx - x) ** 2 + (yy - y) ** 2 <= r * r


def make_drive_curve(rng: random.Random, h, w, n_steps, step_px):
    """Curvature-bounded wander that steers back toward the interior:
    returns traj (T,2) float in map coords (x right, y up) and psi (T,)."""
    margin = 0.18 * min(h, w)
    x, y = w * 0.5, h * 0.5
    psi = rng.uniform(0, 2 * math.pi)
    kappa = 0.0  # current curvature (rad / step)
    pts, headings = [], []
    for _ in range(n_steps):
        pts.append((x, y))
        headings.append(psi)
        # Gauss-Markov curvature: smooth arcs, occasional direction flips
        kappa = 0.9 * kappa + rng.gauss(0.0, 0.012)
        if rng.random() < 0.02:
            kappa = rng.uniform(-0.05, 0.05)
        kappa = max(-0.06, min(0.06, kappa))
        # boundary avoidance: steer toward the map center when close
        cx, cy = w * 0.5 - x, h * 0.5 - y
        d_edge = min(x, y, w - x, h - y)
        if d_edge < margin:
            want = math.atan2(cy, cx)
            err = (want - psi + math.pi) % (2 * math.pi) - math.pi
            kappa += 0.004 * (1.0 - d_edge / margin) * (
                1 if err > 0 else -1
            ) * min(12.0, abs(err) * 8)
        psi += kappa
        x += step_px * math.cos(psi)
        y += step_px * math.sin(psi)
    return np.asarray(pts, np.float64), np.asarray(headings, np.float64)


def grow_road_web(rng: random.Random, h, w, drive, drive_psi):
    """Organic road network: the drive curve is a road; branches sprout
    from it at random stations and wander off with their own curvature.
    Returns the road mask plus the polylines (for frontage placement)."""
    road = np.zeros((h, w), bool)
    polylines = []

    def lay(poly_pts, width):
        for (x, y) in poly_pts:
            _stamp_disk(road, x, y, width)
        polylines.append(np.asarray(poly_pts, np.float64))

    lay([tuple(p) for p in drive[::2]], 6)
    n_branch = 28
    for _ in range(n_branch):
        i = rng.randrange(0, len(drive), 8)
        side = 1 if rng.random() < 0.5 else -1
        psi = drive_psi[i] + side * math.pi / 2 + rng.gauss(0, 0.3)
        x, y = drive[i]
        kappa = 0.0
        pts = []
        length = rng.randrange(120, 480)
        for _ in range(length):
            pts.append((x, y))
            kappa = 0.92 * kappa + rng.gauss(0.0, 0.01)
            kappa = max(-0.05, min(0.05, kappa))
            psi += kappa
            x += 2.0 * math.cos(psi)
            y += 2.0 * math.sin(psi)
            if not (8 < x < w - 8 and 8 < y < h - 8):
                break
        if len(pts) > 30:
            lay(pts, rng.choice([4, 5, 5, 6]))
    return road, polylines


def make_river(rng: random.Random, h, w):
    """One meandering river crossing the map; a random chord + sinusoid
    meander, stamped wide."""
    water = np.zeros((h, w), bool)
    ang = rng.uniform(0, math.pi)
    cx, cy = w * 0.5, h * 0.5
    ux, uy = math.cos(ang), math.sin(ang)
    px, py = -uy, ux
    amp = rng.uniform(40, 90)
    lam = rng.uniform(300, 600)
    phase = rng.uniform(0, 2 * math.pi)
    half = int(math.hypot(h, w) / 2)
    for t in range(-half, half, 2):
        m = amp * math.sin(t / lam * 2 * math.pi + phase)
        x = cx + ux * t + px * (m + rng.gauss(0, 1.5))
        y = cy + uy * t + py * (m + rng.gauss(0, 1.5))
        _stamp_disk(water, x, y, 16)
    return water


def _value_noise(rng: random.Random, h, w, cell=96):
    gh, gw = h // cell + 2, w // cell + 2
    g = np.array(
        [[rng.random() for _ in range(gw)] for _ in range(gh)]
    )
    yy = np.linspace(0, gh - 1.001, h)
    xx = np.linspace(0, gw - 1.001, w)
    yi, xi = yy.astype(int), xx.astype(int)
    fy, fx = (yy - yi)[:, None], (xx - xi)[None, :]
    v = (
        g[yi][:, xi] * (1 - fy) * (1 - fx)
        + g[yi + 1][:, xi] * fy * (1 - fx)
        + g[yi][:, xi + 1] * (1 - fy) * fx
        + g[yi + 1][:, xi + 1] * fy * fx
    )
    return v


def place_frontage(rng: random.Random, h, w, polylines, road, water):
    """Rotated building rectangles + parking pads along road frontage."""
    building = np.zeros((h, w), bool)
    parking = np.zeros((h, w), bool)
    for poly in polylines:
        if len(poly) < 20:
            continue
        step = 14
        for i in range(10, len(poly) - 10, step):
            if rng.random() < 0.35:
                continue
            a, b = poly[max(0, i - 4)], poly[min(len(poly) - 1, i + 4)]
            tx, ty = b - a
            n = math.hypot(tx, ty)
            if n < 1e-6:
                continue
            tx, ty = tx / n, ty / n
            for side in (-1, 1):
                if rng.random() < 0.4:
                    continue
                nx, ny = -ty * side, tx * side
                setback = rng.uniform(10, 18)
                depth = rng.uniform(10, 26)
                width = rng.uniform(10, 24)
                cx = poly[i][0] + nx * (setback + depth / 2)
                cy = poly[i][1] + ny * (setback + depth / 2)
                if not (4 < cx < w - 4 and 4 < cy < h - 4):
                    continue
                is_park = rng.random() < 0.18
                tgt = parking if is_park else building
                # rasterize the rotated rect by sampling its grid
                du = np.linspace(-width / 2, width / 2, int(width) + 1)
                dv = np.linspace(-depth / 2, depth / 2, int(depth) + 1)
                uu, vv = np.meshgrid(du, dv)
                xs = (cx + uu * tx + vv * nx).ravel()
                ys = (cy + uu * ty + vv * ny).ravel()
                ix = np.clip(xs.astype(int), 0, w - 1)
                iy = np.clip(ys.astype(int), 0, h - 1)
                ok = ~(road[iy, ix] | water[iy, ix])
                if ok.mean() < 0.85:
                    continue  # don't build on roads/river
                tgt[iy[ok], ix[ok]] = True
    return building, parking


def make_town(h=1536, w=1536, seed=0, n_steps=900, step_px=3.2):
    """Returns (class_maps (6,H,W) 0=present, traj_px (T,2), psi (T,))."""
    rng = random.Random(seed * 7919 + 13)
    traj, psi = make_drive_curve(rng, h, w, n_steps, step_px)
    road, polylines = grow_road_web(rng, h, w, traj, psi)
    water = make_river(rng, h, w)
    road_nb = road.copy()
    water &= ~road  # bridges
    building, parking = place_frontage(rng, h, w, polylines, road, water)
    veg = (_value_noise(rng, h, w, 120) > 0.68) & ~(
        road | water | building | parking
    )
    maps = np.ones((6, h, w), np.float32)
    maps[ROAD][road] = 0.0
    maps[WATER][water] = 0.0
    maps[BUILDING][building] = 0.0
    maps[VEG][veg] = 0.0
    maps[PARKING][parking] = 0.0
    # terrain = anything not claimed by an exclusive class
    claimed = road | water | building | parking | veg
    maps[TERRAIN][~claimed] = 0.0
    return maps, traj, psi


# ---------------------------------------------------------------------
# ray-marching LiDAR
# ---------------------------------------------------------------------


def raycast_scan(class_idx, gt_px, psi, scale, max_range_m, n_pad,
                 np_rng, n_beams=480, step_px=0.75):
    """(n_pad, 4) body-frame x,y,z,class.

    class_idx: (H, W) int8 argmax class per cell (BUILDING occludes,
    VEG semi-transparent, ground classes return sparsely).  Beams march
    outward in fixed px steps; each return is reconstructed from its
    BEAM RANGE (with noise) - not from the sample's pixel center."""
    h, w = class_idx.shape
    max_r_px = max_range_m * scale
    n_samp = int(max_r_px / step_px)
    ang = (
        np.arange(n_beams) * (2 * np.pi / n_beams)
        + np_rng.uniform(0, 2 * np.pi / n_beams)
    )
    dirs = np.stack([np.cos(ang), np.sin(ang)], axis=1)  # world frame
    rr = (np.arange(1, n_samp + 1) * step_px)  # (S,) px
    pos = (
        gt_px[None, None, :]
        + dirs[:, None, :] * rr[None, :, None]
    )  # (B, S, 2)
    ix = np.clip(pos[..., 0].astype(np.int64), 0, w - 1)
    iy = np.clip(pos[..., 1].astype(np.int64), 0, h - 1)
    cls = class_idx[iy, ix]  # (B, S)
    oob = (
        (pos[..., 0] < 0) | (pos[..., 0] >= w)
        | (pos[..., 1] < 0) | (pos[..., 1] >= h)
    )

    # occlusion: building cells block; vegetation blocks with p=0.25
    solid = (cls == BUILDING) & ~oob
    veg_block = (cls == VEG) & (np_rng.random(cls.shape) < 0.05) & ~oob
    blockers = solid | veg_block
    # first blocking sample per beam (n_samp if none)
    first = np.where(
        blockers.any(axis=1), blockers.argmax(axis=1), n_samp
    )  # (B,)
    sidx = np.arange(n_samp)[None, :]
    visible = sidx <= first[:, None]

    # return probability per class, decaying with range
    p = np.zeros(cls.shape)
    decay = 1.0 - 0.6 * (rr[None, :] / max_r_px) ** 2
    p[(cls == ROAD)] = 0.10
    p[(cls == TERRAIN)] = 0.05
    p[(cls == PARKING)] = 0.09
    p[(cls == WATER)] = 0.02  # water mostly absorbs
    p[(cls == VEG)] = 0.12
    p = p * decay
    # the blocking building sample itself always returns (facade hit)
    hit = (np_rng.random(cls.shape) < p) & visible & ~oob
    hit[np.arange(len(first))[first < n_samp],
        first[first < n_samp]] = True

    bi, si = np.nonzero(hit)
    r_px = rr[si] + np_rng.standard_normal(len(si)) * (0.10 * scale)
    a = ang[bi] + np_rng.standard_normal(len(si)) * 0.0015
    # body frame: rotate world offsets by -psi
    rel = a - psi
    x_b = (r_px / scale) * np.cos(rel)
    y_b = (r_px / scale) * np.sin(rel)
    c_hit = cls[bi, si].astype(np.float64)
    # label confusion at class boundaries (adjacent-sample disagreement)
    prev = cls[bi, np.maximum(si - 1, 0)]
    boundary = prev != cls[bi, si]
    flip = boundary & (np_rng.random(len(si)) < 0.25)
    c_hit[flip] = prev[flip]
    z = np.where(c_hit == BUILDING, np_rng.uniform(0.5, 4.0, len(si)),
                 0.0)
    pts = np.stack([x_b, y_b, z, c_hit], axis=1)
    if len(pts) > n_pad:
        pts = pts[np_rng.choice(len(pts), n_pad, replace=False)]
    out = np.zeros((n_pad, 4), np.float32)
    out[: len(pts)] = pts
    return out


def make_bag(maps, traj_px, psi, scale, dt=0.2, max_range_m=50.0,
             n_pad=8192, seed=0, origin_latlon=(47.61, -122.33)):
    from top_down_renderer_tpu.io import Bag
    from top_down_renderer_tpu.io.replay import EARTH_R

    np_rng = np.random.default_rng(seed * 104729 + 7)
    t = np.arange(len(traj_px)) * dt
    world_m = traj_px / scale

    # odometry: multiplicative speed-scale error + Gauss-Markov
    # yaw-rate bias + white noise
    speed_scale = 1.0 + np_rng.normal(0.0, 0.015)
    yaw_bias = 0.0
    prior = np.zeros((len(t), 3))
    prior_psi = np.zeros(len(t))
    acc = np.zeros(2)
    acc_psi = 0.0
    for i in range(len(t)):
        if i:
            d = (world_m[i] - world_m[i - 1]) * speed_scale
            acc += d + np_rng.normal(0.0, 0.02, 2)
            yaw_bias = 0.995 * yaw_bias + np_rng.normal(0.0, 1e-4)
            acc_psi += (
                (psi[i] - psi[i - 1]) + yaw_bias
                + np_rng.normal(0.0, 0.001)
            )
        prior[i, :2] = acc
        prior_psi[i] = psi[0] + acc_psi
    quat = np.stack(
        [np.zeros(len(t)), np.zeros(len(t)),
         np.sin(prior_psi / 2), np.cos(prior_psi / 2)], axis=1
    )

    # GPS: Gauss-Markov error + outages
    err = np.zeros(2)
    gps_m = np.empty_like(world_m)
    for i in range(len(t)):
        err = 0.95 * err + np_rng.normal(0.0, 0.6, 2)
        gps_m[i] = world_m[i] + err
    lat0, lon0 = origin_latlon
    lat = lat0 + np.degrees(gps_m[:, 1] / EARTH_R)
    lon = lon0 + np.degrees(
        gps_m[:, 0] / (EARTH_R * math.cos(math.radians(lat0)))
    )

    class_idx = np.argmin(
        maps + np.arange(6)[:, None, None] * 1e-4, axis=0
    ).astype(np.int8)
    # present-anywhere wins over terrain: argmin of 0-is-present maps
    # with a tiny class bias keeps priority road > building > ... stable
    scans, offs = [], [0]
    for i in range(len(t)):
        scans.append(
            raycast_scan(class_idx, traj_px[i], psi[i], scale,
                         max_range_m, n_pad, np_rng)
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
    for cls in (TERRAIN, VEG, WATER, PARKING, BUILDING, ROAD):
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
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    step_px = args.speed * args.dt * args.scale
    maps, traj, psi = make_town(
        args.hw, args.hw, args.seed, args.steps, step_px
    )
    bag = make_bag(maps, traj, psi, args.scale, dt=args.dt,
                   seed=args.seed)
    bag.save(os.path.join(args.out, "town.npz"))
    save_world_png(maps, os.path.join(args.out, "town.png"))
    with open(os.path.join(args.out, "town_meta.json"), "w") as f:
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
                "realism": "raycast",
                "generator": "town_bag.py (independent: organic "
                "geometry, ray-marching sensor, stdlib-random world)",
            }, f, indent=1,
        )
    print("bag:", os.path.join(args.out, "town.npz"),
          "steps:", len(traj))


if __name__ == "__main__":
    main()
