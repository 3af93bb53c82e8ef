"""Optional ROS 1 transport shim.

Binds a TopDownRenderNode to the reference's topic surface
(/root/reference/src/top_down_render.cpp:11-27, 94):
  subscribe: pc (PointCloud2), motion_prior (PoseStamped),
             gt_pose (PoseStamped), aerial_map (GridMap, optional)
  publish:   pose_est (PoseWithCovarianceStamped), scale (Float32),
             map_viz / scan / geo_scan (Image), map TF

Import-gated: constructing RosShim without rospy raises ImportError; the
rest of the framework never imports this module.
"""

from __future__ import annotations

import numpy as np

from top_down_renderer_tpu.io.points import (
    POINT_XYZI_DTYPE,
    structured_to_xyzc,
    pad_points,
)
from top_down_renderer_tpu.runtime.node import (
    PoseStamped,
    TopDownRenderNode,
)


class RosShim:
    def __init__(
        self, node: TopDownRenderNode, max_points: int = 262144
    ):
        import rospy  # noqa: F401  (gate)
        from geometry_msgs.msg import (
            PoseStamped as RosPoseStamped,
            PoseWithCovarianceStamped,
        )
        from sensor_msgs.msg import Image, PointCloud2
        from std_msgs.msg import Float32

        self.rospy = rospy
        self.node = node
        self.max_points = max_points
        self._RosPoseStamped = RosPoseStamped
        self._PoseWithCovarianceStamped = PoseWithCovarianceStamped
        self._Image = Image
        self._Float32 = Float32

        self.pose_pub = rospy.Publisher(
            "pose_est", PoseWithCovarianceStamped, queue_size=1,
            latch=True,
        )
        self.scale_pub = rospy.Publisher("scale", Float32, queue_size=1)
        self.scan_pub = rospy.Publisher("scan", Image, queue_size=1)
        self.map_viz_pub = rospy.Publisher(
            "map_viz", Image, queue_size=1
        )

        node.on("pose_est", self._publish_pose)
        node.on("scale", self._publish_scale)
        node.on("scan", self._publish_image(self.scan_pub))
        node.on("map_viz", self._publish_image(self.map_viz_pub))

        rospy.Subscriber(
            "pc", PointCloud2, self._pc_cb, queue_size=10
        )
        rospy.Subscriber(
            "motion_prior", RosPoseStamped, self._prior_cb,
            queue_size=500,
        )
        rospy.Subscriber(
            "gt_pose", RosPoseStamped, self._gt_cb, queue_size=10
        )

    # -- inputs --------------------------------------------------------
    def _pc_cb(self, msg) -> None:
        cloud = np.frombuffer(
            msg.data, dtype=POINT_XYZI_DTYPE.newbyteorder("<")
        )
        pts = pad_points(structured_to_xyzc(cloud), self.max_points)
        self.node.pc_callback(msg.header.stamp.to_sec(), pts)

    def _to_pose(self, msg) -> PoseStamped:
        p, q = msg.pose.position, msg.pose.orientation
        return PoseStamped(
            stamp=msg.header.stamp.to_sec(),
            position=np.array([p.x, p.y, p.z]),
            orientation=np.array([q.x, q.y, q.z, q.w]),
        )

    def _prior_cb(self, msg) -> None:
        self.node.motion_prior_callback(self._to_pose(msg))

    def _gt_cb(self, msg) -> None:
        self.node.gt_pose_callback(self._to_pose(msg))

    # -- outputs -------------------------------------------------------
    def _publish_pose(self, pose) -> None:
        msg = self._PoseWithCovarianceStamped()
        msg.header.stamp = self.rospy.Time.from_sec(pose.stamp)
        msg.header.frame_id = pose.frame_id
        msg.pose.pose.position.x = float(pose.position[0])
        msg.pose.pose.position.y = float(pose.position[1])
        msg.pose.pose.position.z = float(pose.position[2])
        (
            msg.pose.pose.orientation.x,
            msg.pose.pose.orientation.y,
            msg.pose.pose.orientation.z,
            msg.pose.pose.orientation.w,
        ) = (float(v) for v in pose.orientation)
        msg.pose.covariance = [float(v) for v in pose.covariance.ravel()]
        self.pose_pub.publish(msg)

    def _publish_scale(self, scale: float) -> None:
        self.scale_pub.publish(self._Float32(data=float(scale)))

    def _publish_image(self, pub):
        def cb(img) -> None:
            if img is None:
                return
            msg = self._Image()
            msg.height, msg.width = img.shape[:2]
            msg.encoding = "rgb8"
            msg.step = img.shape[1] * 3
            msg.data = np.ascontiguousarray(img).tobytes()
            pub.publish(msg)

        return cb

    def spin(self) -> None:
        self.rospy.spin()
