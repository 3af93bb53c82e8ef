#!/usr/bin/env python3
"""Convert a ROS1 .bag recording into the npz replay Bag.

No ROS installation needed: the v2.0 container and message
serialization are parsed directly (io/rosbag.py).  Default topics match
the reference node's remaps (/root/reference/launch/
top_down_render.launch:42-46).

  python scripts/bag_convert.py drive.bag drive.npz \\
      --scan-topic /os_node/segmented_point_cloud \\
      --prior-topic /os_node/rofl_odom --gps-topic /ublox/fix
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bag")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument(
        "--scan-topic", default="/os_node/segmented_point_cloud"
    )
    ap.add_argument("--prior-topic", default="/os_node/rofl_odom")
    ap.add_argument("--gps-topic", default=None)
    ap.add_argument(
        "--class-field",
        default="intensity",
        help="PointCloud2 field carrying the semantic class id "
        "(scan_renderer.cpp:72)",
    )
    ap.add_argument("--max-scans", type=int, default=None)
    args = ap.parse_args()

    from top_down_renderer_tpu.io.rosbag import convert_rosbag

    bag = convert_rosbag(
        args.bag,
        scan_topic=args.scan_topic,
        prior_topic=args.prior_topic,
        gps_topic=args.gps_topic,
        class_field=args.class_field,
        max_scans=args.max_scans,
    )
    bag.save(args.out)
    print(
        f"wrote {args.out}: {len(bag.scan_stamps)} scans, "
        f"{len(bag.prior_stamps)} priors, "
        f"{0 if bag.gps_stamps is None else len(bag.gps_stamps)} GPS "
        f"fixes, {len(bag.scan_points)} points"
    )


if __name__ == "__main__":
    main()
