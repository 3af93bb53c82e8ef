"""Adversarial / at-scale tests for the pure-Python ROS1 bag reader.

The round-trip test (test_rosbag.py) only ever feeds the reader bags
written by its own well-behaved writer.  Real recordings are messier:
several connections per topic (reconnecting publishers), connection
records trailing the messages that reference them, lz4 chunks the image
cannot decompress, big-endian clouds, organized 64-beam x 1024 clouds
padded with NaN, and plain corruption.  The reader must decode what it
can and raise clean exceptions - never hang or segfault - on the rest.
Reference consumers: /root/reference/scripts/benchmark_loc.py:43-96
(KITTI / ucity / Morgantown bags).
"""

import struct

import numpy as np
import pytest

from top_down_renderer_tpu.io.rosbag import (
    RosbagReader,
    convert_rosbag,
    decode_pointcloud2,
)
from test_rosbag import (
    _connection,
    _header_msg,
    _message,
    _navsatfix,
    _odometry,
    _pointcloud2,
    _record,
    _string,
)

MAGIC = b"#ROSBAG V2.0\n"


def _bag_header() -> bytes:
    return _record(
        {
            "op": b"\x03",
            "index_pos": struct.pack("<Q", 0),
            "conn_count": struct.pack("<I", 1),
            "chunk_count": struct.pack("<I", 1),
        },
        b" " * 64,
    )


def _chunk(payload: bytes, compression: bytes = b"none",
           data: bytes = None) -> bytes:
    return _record(
        {
            "op": b"\x05",
            "compression": compression,
            "size": struct.pack("<I", len(payload)),
        },
        payload if data is None else data,
    )


def test_multiple_connections_per_topic(tmp_path):
    """A re-publishing node gets a fresh connection id for the same
    topic; every message on either id must be decoded."""
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((8, 4)).astype(np.float32)
    chunk = b""
    chunk += _connection(0, "/pc", "sensor_msgs/PointCloud2")
    chunk += _connection(5, "/pc", "sensor_msgs/PointCloud2")
    chunk += _connection(1, "/odom", "nav_msgs/Odometry")
    chunk += _message(0, 1.0, _pointcloud2(1.0, pts))
    chunk += _message(5, 2.0, _pointcloud2(2.0, pts))
    chunk += _message(1, 1.0, _odometry(
        1.0, np.zeros(3), np.array([0, 0, 0, 1.0])))
    p = tmp_path / "multi.bag"
    p.write_bytes(MAGIC + _bag_header() + _chunk(chunk))
    bag = convert_rosbag(str(p), "/pc", "/odom")
    assert len(bag.scan_stamps) == 2


def test_connection_after_message(tmp_path):
    """A message whose connection record only appears later must not
    crash the reader (it surfaces under a placeholder topic)."""
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((4, 4)).astype(np.float32)
    chunk = b""
    chunk += _message(7, 1.0, _pointcloud2(1.0, pts))  # orphan first
    chunk += _connection(7, "/pc", "sensor_msgs/PointCloud2")
    chunk += _message(7, 2.0, _pointcloud2(2.0, pts))
    p = tmp_path / "late.bag"
    p.write_bytes(MAGIC + _bag_header() + _chunk(chunk))
    msgs = list(RosbagReader(str(p)).messages())
    topics = [t for t, _, _, _ in msgs]
    assert topics[0] == "<conn 7>"  # orphan flagged, not crashed
    assert topics[1] == "/pc"


def test_lz4_chunk_gated(tmp_path):
    """lz4 chunks decode without the lz4 package (pure-Python frame
    fallback, test_rosbag.py round-trips them); GARBAGE lz4 data raises
    a clear ValueError - never a hang or an opaque crash."""
    chunk = _connection(0, "/pc", "sensor_msgs/PointCloud2")
    p = tmp_path / "lz4.bag"
    from test_rosbag import lz4_frame_store

    p.write_bytes(
        MAGIC + _bag_header()
        + _chunk(chunk, b"lz4", data=lz4_frame_store(chunk))
    )
    msgs = list(RosbagReader(str(p)).messages())
    assert msgs == []  # connection only, no messages

    p.write_bytes(
        MAGIC + _bag_header()
        + _chunk(chunk, b"lz4", data=b"\x04\x22garbage")
    )
    with pytest.raises(ValueError, match="LZ4"):
        list(RosbagReader(str(p)).messages())


def test_unknown_compression_rejected(tmp_path):
    p = tmp_path / "zstd.bag"
    chunk = _connection(0, "/pc", "sensor_msgs/PointCloud2")
    p.write_bytes(MAGIC + _bag_header() + _chunk(chunk, b"zstd"))
    with pytest.raises(ValueError, match="compression"):
        list(RosbagReader(str(p)).messages())


def test_bigendian_pointcloud_rejected():
    raw = (
        _header_msg(1.0)
        + struct.pack("<II", 1, 1)
        + struct.pack("<I", 1)
        + _string("x") + struct.pack("<IBI", 0, 7, 1)
        + struct.pack("<BII", 1, 4, 4)  # is_bigendian = 1
        + struct.pack("<I", 4) + b"\x00\x00\x80\x3f"
        + b"\x01"
    )
    with pytest.raises(ValueError, match="big-endian"):
        decode_pointcloud2(raw)


def test_organized_cloud_nan_padding():
    """64-beam x 1024 organized cloud with ~30% NaN-padded cells (the
    real Ouster shape, /root/reference/include/top_down_render/
    point_os1.h:6-33): only finite points survive."""
    rng = np.random.default_rng(2)
    h, w = 64, 1024
    pts = rng.standard_normal((h * w, 4)).astype(np.float32)
    nanmask = rng.random(h * w) < 0.3
    pts[nanmask, :3] = np.nan
    raw = (
        _header_msg(5.0)
        + struct.pack("<II", h, w)
        + struct.pack("<I", 4)
        + b"".join(
            _string(n) + struct.pack("<IBI", 4 * i, 7, 1)
            for i, n in enumerate(("x", "y", "z", "intensity"))
        )
        + struct.pack("<BII", 0, 16, 16 * w)
        + struct.pack("<I", 16 * h * w)
        + pts.astype("<f4").tobytes()
        + b"\x00"
    )
    stamp, out = decode_pointcloud2(raw)
    assert stamp == 5.0
    assert len(out) == int((~nanmask).sum())
    np.testing.assert_array_equal(out, pts[~nanmask])


def test_mutated_bags_never_hang(tmp_path):
    """Random byte flips and truncations over a valid bag must always
    terminate quickly with either a successful (partial) parse or a
    clean exception."""
    import time

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((16, 4)).astype(np.float32)
    chunk = b""
    chunk += _connection(0, "/pc", "sensor_msgs/PointCloud2")
    chunk += _connection(1, "/odom", "nav_msgs/Odometry")
    for i in range(4):
        chunk += _message(0, 1.0 + i, _pointcloud2(1.0 + i, pts))
        chunk += _message(
            1, 1.0 + i,
            _odometry(1.0 + i, np.zeros(3), np.array([0, 0, 0, 1.0])),
        )
    good = MAGIC + _bag_header() + _chunk(chunk)
    p = tmp_path / "fuzz.bag"
    t0 = time.perf_counter()
    for trial in range(200):
        buf = bytearray(good)
        kind = trial % 3
        if kind == 0:  # flip 1-8 random bytes (past the magic)
            for _ in range(int(rng.integers(1, 9))):
                j = int(rng.integers(len(MAGIC), len(buf)))
                buf[j] ^= int(rng.integers(1, 256))
        elif kind == 1:  # truncate
            buf = buf[: int(rng.integers(len(MAGIC), len(buf)))]
        else:  # flip + truncate
            j = int(rng.integers(len(MAGIC), len(buf)))
            buf[j] ^= 0xFF
            buf = buf[: int(rng.integers(j + 1, len(buf) + 1))]
        p.write_bytes(bytes(buf))
        try:
            for _ in RosbagReader(str(p)).messages():
                pass
        except (ValueError, KeyError, IndexError, struct.error,
                OSError, RuntimeError, EOFError):
            pass
    assert time.perf_counter() - t0 < 60.0


@pytest.mark.slow
def test_large_bag_roundtrip(tmp_path):
    """A few hundred MB of 64x1024 organized clouds (the 1 GB-class
    shape) must stream through convert_rosbag without blowup; the
    resulting Bag drives the replay harness structure directly."""
    rng = np.random.default_rng(4)
    h, w = 64, 1024
    n_scans = 220  # ~230 MB raw point payload
    fields = b"".join(
        _string(n) + struct.pack("<IBI", 4 * i, 7, 1)
        for i, n in enumerate(("x", "y", "z", "intensity"))
    )
    parts = [MAGIC, _bag_header()]
    chunk_parts = [
        _connection(0, "/os1/points", "sensor_msgs/PointCloud2"),
        _connection(1, "/odom", "nav_msgs/Odometry"),
        _connection(2, "/gps", "sensor_msgs/NavSatFix"),
    ]
    base = rng.standard_normal((h * w, 4)).astype(np.float32)
    base[rng.random(h * w) < 0.25, :3] = np.nan
    raw_pc_body = (
        struct.pack("<II", h, w)
        + struct.pack("<I", 4)
        + fields
        + struct.pack("<BII", 0, 16, 16 * w)
        + struct.pack("<I", 16 * h * w)
        + base.astype("<f4").tobytes()
        + b"\x00"
    )
    for i in range(n_scans):
        t = 10.0 + 0.1 * i
        chunk_parts.append(
            _message(0, t, _header_msg(t) + raw_pc_body)
        )
        chunk_parts.append(_message(1, t, _odometry(
            t, np.array([0.1 * i, 0, 0]), np.array([0, 0, 0, 1.0]))))
        chunk_parts.append(_message(2, t, _navsatfix(
            t, 39.95 + 1e-6 * i, -75.19)))
        # flush a chunk every 20 scans (multi-chunk file)
        if (i + 1) % 20 == 0:
            parts.append(_chunk(b"".join(chunk_parts)))
            chunk_parts = []
    if chunk_parts:
        parts.append(_chunk(b"".join(chunk_parts)))
    p = tmp_path / "big.bag"
    p.write_bytes(b"".join(parts))
    assert p.stat().st_size > 200 * 2**20

    bag = convert_rosbag(str(p), "/os1/points", "/odom", "/gps")
    assert len(bag.scan_stamps) == n_scans
    n_finite = int(np.isfinite(base[:, :3]).all(1).sum())
    assert bag.scan_offsets[-1] == n_scans * n_finite
    assert len(bag.prior_stamps) == n_scans
    assert len(bag.gps_stamps) == n_scans
    # plugs straight into the replay harness structure
    assert bag.scan(0).shape == (n_finite, 4)
    from top_down_renderer_tpu.io.replay import integrate_gps_distance

    assert integrate_gps_distance(bag, 10.0, 5.0) >= 0.0
