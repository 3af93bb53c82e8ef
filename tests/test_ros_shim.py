"""Contract test for the ROS 1 transport shim (runtime/ros_shim.py)
against fake rospy / message modules - the message encode/decode logic
(PointCloud2 byte parsing, pose/covariance packing, image packing) is
CI-checked without a ROS install.

Parity surface: the reference node's topic I/O
(/root/reference/src/top_down_render.cpp:11-27, 94 and the publish
sites at :331-411).
"""

import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------
# fake rospy + message stacks
# ---------------------------------------------------------------------


class _Time:
    def __init__(self, sec: float):
        self._sec = float(sec)

    @staticmethod
    def from_sec(sec: float) -> "_Time":
        return _Time(sec)

    def to_sec(self) -> float:
        return self._sec


class _Header:
    def __init__(self):
        self.stamp = _Time(0.0)
        self.frame_id = ""


class _Vec3:
    def __init__(self):
        self.x = self.y = self.z = 0.0


class _Quat:
    def __init__(self):
        self.x = self.y = self.z = 0.0
        self.w = 1.0


class _Pose:
    def __init__(self):
        self.position = _Vec3()
        self.orientation = _Quat()


class _PoseStamped:
    def __init__(self):
        self.header = _Header()
        self.pose = _Pose()


class _PoseWithCov:
    def __init__(self):
        self.pose = _Pose()


class _PoseWithCovStamped:
    def __init__(self):
        self.header = _Header()
        self.pose = _PoseWithCov()


class _Image:
    def __init__(self):
        self.header = _Header()
        self.height = self.width = self.step = 0
        self.encoding = ""
        self.data = b""


class _PointCloud2:
    def __init__(self):
        self.header = _Header()
        self.data = b""


class _Float32:
    def __init__(self, data=0.0):
        self.data = data


class _Publisher:
    registry = {}

    def __init__(self, topic, msg_cls, queue_size=1, latch=False):
        self.topic = topic
        self.msg_cls = msg_cls
        self.published = []
        _Publisher.registry[topic] = self

    def publish(self, msg):
        self.published.append(msg)


class _Subscriber:
    registry = {}

    def __init__(self, topic, msg_cls, cb, queue_size=1):
        self.cb = cb
        _Subscriber.registry[topic] = self


@pytest.fixture()
def fake_ros(monkeypatch):
    _Publisher.registry = {}
    _Subscriber.registry = {}
    rospy = types.ModuleType("rospy")
    rospy.Publisher = _Publisher
    rospy.Subscriber = _Subscriber
    rospy.Time = _Time
    rospy.spin = lambda: None
    geo = types.ModuleType("geometry_msgs")
    geo_msg = types.ModuleType("geometry_msgs.msg")
    geo_msg.PoseStamped = _PoseStamped
    geo_msg.PoseWithCovarianceStamped = _PoseWithCovStamped
    geo.msg = geo_msg
    sens = types.ModuleType("sensor_msgs")
    sens_msg = types.ModuleType("sensor_msgs.msg")
    sens_msg.Image = _Image
    sens_msg.PointCloud2 = _PointCloud2
    sens.msg = sens_msg
    std = types.ModuleType("std_msgs")
    std_msg = types.ModuleType("std_msgs.msg")
    std_msg.Float32 = _Float32
    std.msg = std_msg
    for name, mod in [
        ("rospy", rospy),
        ("geometry_msgs", geo),
        ("geometry_msgs.msg", geo_msg),
        ("sensor_msgs", sens),
        ("sensor_msgs.msg", sens_msg),
        ("std_msgs", std),
        ("std_msgs.msg", std_msg),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return rospy


# ---------------------------------------------------------------------
# node fixture (small raster world)
# ---------------------------------------------------------------------


@pytest.fixture()
def node(tmp_path):
    from PIL import Image as PILImage

    from top_down_renderer_tpu.config import (
        ClassConfig,
        MapConfig,
        RuntimeParams,
    )
    from top_down_renderer_tpu.runtime.node import TopDownRenderNode

    color_lut = np.full((256, 3), 255, np.uint8)
    color_lut[0], color_lut[1] = (0, 100, 0), (255, 0, 0)
    cc = ClassConfig(
        color_lut=color_lut,
        class_to_flattened=[0, 1],
        flattened_to_class=[0, 1],
        exclusivity=[True, True],
        loc_weight=[0.5, 1.5],
    )
    maps = np.ones((2, 64, 64), np.float32)
    maps[1, 28:36, :] = 0.0
    img = np.zeros((64, 64, 3), np.uint8)
    img[...] = (0, 100, 0)
    img[maps[1, ::-1] == 0] = (255, 0, 0)
    p = tmp_path / "w.png"
    PILImage.fromarray(img).save(p)
    return TopDownRenderNode(
        cc,
        MapConfig(raster_path=str(p), resolution=1.0),
        RuntimeParams(particle_count=32, theta_bins=100, range_bins=25),
    )


def _make_shim(node):
    from top_down_renderer_tpu.runtime.ros_shim import RosShim

    return RosShim(node, max_points=256)


def test_shim_pc_decode_steps_filter(fake_ros, node):
    """A PointCloud2 whose data bytes follow the PointXYZI layout
    (32-byte stride, intensity at offset 16) must decode and step the
    filter."""
    from top_down_renderer_tpu.io.points import POINT_XYZI_DTYPE

    shim = _make_shim(node)
    cloud = np.zeros(64, POINT_XYZI_DTYPE)
    cloud["x"] = np.linspace(1, 8, 64)
    cloud["y"] = 0.0
    cloud["z"] = 0.5
    cloud["intensity"] = 1.0
    msg = _PointCloud2()
    msg.header.stamp = _Time(4.25)
    msg.data = cloud.tobytes()
    _Subscriber.registry["pc"].cb(msg)
    assert int(node.filter.state.step) == 1


def test_shim_prior_and_gt_pose_decode(fake_ros, node):
    """PoseStamped decode: position/quaternion land in the node's
    PoseStamped; the gt pose projects to the 2D matrix."""
    shim = _make_shim(node)
    msg = _PoseStamped()
    msg.header.stamp = _Time(2.5)
    msg.pose.position.x = 3.0
    msg.pose.position.y = -1.0
    msg.pose.position.z = 0.25
    # yaw = pi/2 about z
    msg.pose.orientation.z = np.sin(np.pi / 4)
    msg.pose.orientation.w = np.cos(np.pi / 4)
    _Subscriber.registry["gt_pose"].cb(msg)
    gt = node.gt_pose
    np.testing.assert_allclose(gt[:2, 2], [3.0, -1.0], atol=1e-12)
    np.testing.assert_allclose(
        gt[:2, :2], [[0.0, -1.0], [1.0, 0.0]], atol=1e-9
    )
    # motion prior: first call publishes the initial pose attempt and
    # seeds last_prior_pose
    _Subscriber.registry["motion_prior"].cb(msg)
    assert node.last_prior_pose is not None
    np.testing.assert_allclose(
        node.last_prior_pose[:3, 3], [3.0, -1.0, 0.25], atol=1e-12
    )


def test_shim_pose_publish_packing(fake_ros, node):
    """PoseWithCovariance -> PoseWithCovarianceStamped: position,
    quaternion, and the row-major 6x6 covariance (36 floats, the ROS
    contract) must round-trip."""
    from top_down_renderer_tpu.runtime.node import PoseWithCovariance

    shim = _make_shim(node)
    cov = np.arange(36, dtype=np.float64).reshape(6, 6)
    pose = PoseWithCovariance(
        stamp=7.5,
        frame_id="map",
        position=np.array([1.0, 2.0, 3.0]),
        orientation=np.array([0.0, 0.0, 0.6, 0.8]),
        covariance=cov,
    )
    node._publish("pose_est", pose)
    pub = _Publisher.registry["pose_est"]
    assert len(pub.published) == 1
    m = pub.published[0]
    assert m.header.stamp.to_sec() == 7.5
    assert m.header.frame_id == "map"
    pp = m.pose.pose.position
    assert (pp.x, pp.y, pp.z) == (1.0, 2.0, 3.0)
    q = m.pose.pose.orientation
    assert (q.x, q.y, q.z, q.w) == (0.0, 0.0, 0.6, 0.8)
    assert list(m.pose.covariance) == list(range(36))


def test_shim_scale_and_image_publish(fake_ros, node):
    shim = _make_shim(node)
    node._publish("scale", np.float32(1.5))
    sp = _Publisher.registry["scale"]
    assert len(sp.published) == 1 and sp.published[0].data == 1.5

    img = np.zeros((4, 6, 3), np.uint8)
    img[1, 2] = (9, 8, 7)
    node._publish("map_viz", img)
    ip = _Publisher.registry["map_viz"]
    assert len(ip.published) == 1
    m = ip.published[0]
    assert (m.height, m.width, m.step) == (4, 6, 18)
    assert m.encoding == "rgb8"
    back = np.frombuffer(m.data, np.uint8).reshape(4, 6, 3)
    np.testing.assert_array_equal(back, img)
    # None images (viz gated off) must not publish
    node._publish("map_viz", None)
    assert len(ip.published) == 1


def test_shim_import_gate():
    """Without rospy, RosShim must raise ImportError at construction
    (the rest of the framework never imports the module)."""
    assert "rospy" not in sys.modules
    from top_down_renderer_tpu.runtime.ros_shim import RosShim

    with pytest.raises(ImportError):
        RosShim(object())
