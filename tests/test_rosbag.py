"""Round-trip test for the pure-Python ROS1 bag reader.

A minimal v2.0 bag WRITER (below) serializes PointCloud2 / Odometry /
NavSatFix messages into bz2-, lz4- and none-compressed chunks per the
wire format spec; the reader must recover every message bit-exactly
through convert_rosbag.  The lz4 fixtures are valid LZ4 frames (real
xxh32 header checksum; uncompressed blocks from the writer plus
hand-crafted compressed blocks) so they also decode with the real lz4
package when present."""

import bz2
import struct

import numpy as np

from top_down_renderer_tpu.io.rosbag import (
    RosbagReader,
    convert_rosbag,
    decode_pointcloud2,
    decode_pointcloud2_organized,
    lz4_block_decompress,
    lz4_frame_decompress,
)


# ---------------------- minimal LZ4 frame writer ----------------------
def _xxh32(data: bytes, seed: int = 0) -> int:
    """Reference xxHash32 (for the LZ4 frame header checksum byte)."""
    P1, P2, P3, P4, P5 = (
        2654435761, 2246822519, 3266489917, 668265263, 374761393,
    )
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    i, n = 0, len(data)
    if n >= 16:
        v = [
            (seed + P1 + P2) & M, (seed + P2) & M, seed & M,
            (seed - P1) & M,
        ]
        while i + 16 <= n:
            for j in range(4):
                (lane,) = struct.unpack_from("<I", data, i)
                v[j] = (rotl((v[j] + lane * P2) & M, 13) * P1) & M
                i += 4
        h = (
            rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12)
            + rotl(v[3], 18)
        ) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (rotl((h + lane * P3) & M, 17) * P4) & M
        i += 4
    while i < n:
        h = (rotl((h + data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def lz4_frame_store(data: bytes) -> bytes:
    """Valid LZ4 frame with STORED (uncompressed-flag) blocks - legal
    per the frame spec and what roslz4 emits for incompressible data."""
    desc = bytes([0x60, 0x70])  # v01 + block-indep; 4 MB max block
    hc = (_xxh32(desc) >> 8) & 0xFF
    out = struct.pack("<I", 0x184D2204) + desc + bytes([hc])
    for i in range(0, len(data), 1 << 20):
        blk = data[i : i + (1 << 20)]
        out += struct.pack("<I", 0x80000000 | len(blk)) + blk
    out += struct.pack("<I", 0)  # end mark
    return out


# --------------------------- writer ----------------------------------
def _field(name: str, value: bytes) -> bytes:
    body = name.encode() + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(fields: dict, data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (
        struct.pack("<I", len(header))
        + header
        + struct.pack("<I", len(data))
        + data
    )


def _time(t: float) -> bytes:
    sec = int(t)
    return struct.pack("<II", sec, int(round((t - sec) * 1e9)))


def _string(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode()


def _header_msg(stamp: float, frame: str = "lidar") -> bytes:
    return struct.pack("<I", 0) + _time(stamp) + _string(frame)


def _pointcloud2(stamp: float, pts: np.ndarray) -> bytes:
    """Serialize (N, 4) x y z intensity as an unorganized f32 cloud."""
    n = len(pts)
    fields = b""
    for i, name in enumerate(("x", "y", "z", "intensity")):
        fields += _string(name) + struct.pack("<IBI", 4 * i, 7, 1)
    data = pts.astype("<f4").tobytes()
    return (
        _header_msg(stamp)
        + struct.pack("<II", 1, n)  # height, width
        + struct.pack("<I", 4)  # n fields
        + fields
        + struct.pack("<BII", 0, 16, 16 * n)  # bigendian, steps
        + struct.pack("<I", len(data))
        + data
        + b"\x01"  # is_dense
    )


def _odometry(stamp: float, pos, quat) -> bytes:
    return (
        _header_msg(stamp, "odom")
        + _string("base")
        + struct.pack("<7d", *pos, *quat)
        + struct.pack("<36d", *([0.0] * 36))
        + struct.pack("<6d", *([0.0] * 6))
        + struct.pack("<36d", *([0.0] * 36))
    )


def _navsatfix(stamp: float, lat: float, lon: float) -> bytes:
    return (
        _header_msg(stamp, "gps")
        + struct.pack("<bH", 0, 1)  # NavSatStatus
        + struct.pack("<3d", lat, lon, 100.0)
        + struct.pack("<9d", *([0.0] * 9))
        + b"\x00"  # covariance type
    )


def _connection(cid: int, topic: str, mtype: str) -> bytes:
    inner = (
        _field("topic", topic.encode())
        + _field("type", mtype.encode())
        + _field("md5sum", b"0" * 32)
        + _field("message_definition", b"")
    )
    return _record(
        {
            "op": b"\x07",
            "conn": struct.pack("<I", cid),
            "topic": topic.encode(),
        },
        inner,
    )


def _message(cid: int, stamp: float, raw: bytes) -> bytes:
    return _record(
        {"op": b"\x02", "conn": struct.pack("<I", cid),
         "time": _time(stamp)},
        raw,
    )


def write_test_bag(path: str, compression: str = "bz2"):
    rng = np.random.default_rng(0)
    scans, odoms, fixes = [], [], []
    for i in range(5):
        t = 100.0 + i * 0.1
        pts = rng.standard_normal((50, 4)).astype(np.float32)
        pts[:, 3] = rng.integers(0, 3, 50)
        # a NaN point: the reader must drop it
        pts[0, 0] = np.nan
        scans.append((t, pts))
        odoms.append((t, np.array([i, 0.5, 0.0]),
                      np.array([0.0, 0.0, 0.0, 1.0])))
        fixes.append((t, 39.95 + i * 1e-5, -75.19))

    chunk = b""
    chunk += _connection(0, "/pc", "sensor_msgs/PointCloud2")
    chunk += _connection(1, "/odom", "nav_msgs/Odometry")
    chunk += _connection(2, "/gps", "sensor_msgs/NavSatFix")
    for (t, pts), (to, pos, quat), (tg, lat, lon) in zip(
        scans, odoms, fixes
    ):
        chunk += _message(0, t, _pointcloud2(t, pts))
        chunk += _message(1, to, _odometry(to, pos, quat))
        chunk += _message(2, tg, _navsatfix(tg, lat, lon))

    if compression == "bz2":
        cdata = bz2.compress(chunk)
    elif compression == "lz4":
        cdata = lz4_frame_store(chunk)
    else:
        cdata = chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(
            _record(
                {
                    "op": b"\x03",
                    "index_pos": struct.pack("<Q", 0),
                    "conn_count": struct.pack("<I", 3),
                    "chunk_count": struct.pack("<I", 1),
                },
                b" " * 64,
            )
        )
        f.write(
            _record(
                {
                    "op": b"\x05",
                    "compression": compression.encode(),
                    "size": struct.pack("<I", len(chunk)),
                },
                cdata,
            )
        )
    return scans, odoms, fixes


# --------------------------- tests -----------------------------------
def test_roundtrip_bz2(tmp_path):
    path = str(tmp_path / "t.bag")
    scans, odoms, fixes = write_test_bag(path, "bz2")
    bag = convert_rosbag(path, "/pc", "/odom", "/gps")
    assert len(bag.scan_stamps) == 5
    np.testing.assert_allclose(
        bag.scan_stamps, [t for t, _ in scans], atol=1e-6
    )
    # first point of each scan was NaN'd -> dropped
    for i, (_t, pts) in enumerate(scans):
        got = bag.scan(i)
        assert got.shape == (49, 4)
        np.testing.assert_array_equal(got, pts[1:])
    np.testing.assert_allclose(
        bag.prior_pos, [p for _t, p, _q in odoms]
    )
    np.testing.assert_allclose(
        bag.gps_latlon,
        [(lat, lon) for _t, lat, lon in fixes],
    )


def test_roundtrip_lz4(tmp_path):
    """lz4-chunked bags decode WITHOUT the lz4 package (pure-Python
    frame+block fallback; Ouster-era bags are commonly lz4-chunked,
    /root/reference/scripts/benchmark_loc.py replays such bags)."""
    path = str(tmp_path / "t.bag")
    scans, odoms, _ = write_test_bag(path, "lz4")
    bag = convert_rosbag(path, "/pc", "/odom", "/gps")
    assert len(bag.scan_stamps) == 5
    for i, (_t, pts) in enumerate(scans):
        np.testing.assert_array_equal(bag.scan(i), pts[1:])
    np.testing.assert_allclose(
        bag.prior_pos, [p for _t, p, _q in odoms]
    )


def test_lz4_block_decompress_matches_spec():
    """Hand-crafted compressed blocks exercise the match-copy path:
    literals, a long overlapping match (offset < length = repeated
    pattern), and the literal-only tail the block format requires."""
    # 8 literals + 24-byte match at offset 8 + 12-literal tail
    block = (
        bytes([0x8F]) + b"ROADroad" + b"\x08\x00" + bytes([5])
        + bytes([0xC0]) + b"ENDOFBLK9999"
    )
    expect = b"ROADroad" * 4 + b"ENDOFBLK9999"
    assert lz4_block_decompress(block) == expect

    # offset-1 RLE match (95 bytes of 'A' from a 1-byte pattern)
    block2 = (
        bytes([0x1F]) + b"A" + b"\x01\x00" + bytes([76])
        + bytes([0xC0]) + b"BBBBBBBBBBBB"
    )
    expect2 = b"A" * 96 + b"B" * 12
    assert lz4_block_decompress(block2) == expect2

    # a frame wrapping one COMPRESSED block (no high bit)
    desc = bytes([0x60, 0x70])
    hc = (_xxh32(desc) >> 8) & 0xFF
    frame = (
        struct.pack("<I", 0x184D2204) + desc + bytes([hc])
        + struct.pack("<I", len(block)) + block
        + struct.pack("<I", 0)
    )
    assert lz4_frame_decompress(frame) == expect

    # skippable frame prefix is skipped
    skip = struct.pack("<II", 0x184D2A50, 3) + b"xyz"
    assert lz4_frame_decompress(skip + frame) == expect


def test_pointcloud2_organized_decode_and_geometric_render():
    """height > 1 clouds keep their (H, W) grid through decode and
    drive the Cartesian geometric renderer (scan_renderer.cpp:7-53)."""
    import jax.numpy as jnp

    from top_down_renderer_tpu.render.geometric import (
        render_geometric_cartesian,
    )

    h, w = 8, 16
    rng = np.random.default_rng(4)
    cloud = np.zeros((h, w, 4), np.float32)
    az = np.linspace(-np.pi / 4, np.pi / 4, w)
    for r_i in range(h):
        rad = 3.0 + r_i * 1.5
        cloud[r_i, :, 0] = rad * np.cos(az)
        cloud[r_i, :, 1] = rad * np.sin(az)
        cloud[r_i, :, 2] = 0.05 * r_i  # gentle ground slope
        cloud[r_i, :, 3] = rng.integers(0, 3)
    # a vertical obstacle column and NaN padding
    cloud[5:, 3, 2] = np.arange(3) * 4.0 + 0.2
    cloud[2, 7] = np.nan

    raw = (
        _header_msg(9.25)
        + struct.pack("<II", h, w)  # organized: height > 1
        + struct.pack("<I", 4)
        + b"".join(
            _string(nm) + struct.pack("<IBI", 4 * i, 7, 1)
            for i, nm in enumerate(("x", "y", "z", "intensity"))
        )
        + struct.pack("<BII", 0, 16, 16 * w)
        + struct.pack("<I", 16 * h * w)
        + cloud.astype("<f4").tobytes()
        + b"\x00"  # is_dense false
    )
    stamp, org = decode_pointcloud2_organized(raw)
    assert stamp == 9.25
    assert org.shape == (h, w, 4)
    # NaN padding became the renderer's invalid marker (0, 0, z)
    np.testing.assert_array_equal(org[2, 7], np.zeros(4))
    finite = np.isfinite(cloud).all(axis=-1)
    np.testing.assert_array_equal(org[finite], cloud[finite])

    img = np.asarray(
        render_geometric_cartesian(
            jnp.asarray(org[..., :3]), 1.0, 32, 32
        )
    )
    assert img.shape == (2, 32, 32)
    assert img.sum() > 0  # ground/obstacle bins were filled
    # the flat decoder drops the NaN point instead
    _, flat = decode_pointcloud2(raw)
    assert flat.shape == (h * w - 1, 4)


def test_roundtrip_uncompressed(tmp_path):
    path = str(tmp_path / "t.bag")
    write_test_bag(path, "none")
    bag = convert_rosbag(path, "/pc", "/odom", gps_topic=None)
    assert len(bag.scan_stamps) == 5
    assert bag.gps_stamps is None
    assert len(bag.prior_stamps) == 5


def test_reader_topic_listing(tmp_path):
    path = str(tmp_path / "t.bag")
    write_test_bag(path)
    r = RosbagReader(path)
    msgs = list(r.messages())
    assert len(msgs) == 15
    topics = {c.topic for c in r.connections.values()}
    assert topics == {"/pc", "/odom", "/gps"}
    types = {c.msg_type for c in r.connections.values()}
    assert "sensor_msgs/PointCloud2" in types


def test_pointcloud2_mixed_dtypes():
    """Fields at non-uniform offsets/dtypes (e.g. uint16 class ids in a
    'ring'-style layout) decode correctly."""
    n = 7
    point_step = 14  # f32 x, f32 y, f32 z, u16 label
    raw_pts = np.zeros((n, point_step), np.uint8)
    xyz = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    raw_pts[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    labels = (np.arange(n) % 5).astype(np.uint16)
    raw_pts[:, 12:14] = labels[:, None].view(np.uint8)
    fields = b""
    for name, off, code in (
        ("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("label", 12, 4)
    ):
        fields += (
            struct.pack("<I", len(name)) + name.encode()
            + struct.pack("<IBI", off, code, 1)
        )
    raw = (
        _header_msg(1.5)
        + struct.pack("<II", 1, n)
        + struct.pack("<I", 4)
        + fields
        + struct.pack("<BII", 0, point_step, point_step * n)
        + struct.pack("<I", n * point_step)
        + raw_pts.tobytes()
        + b"\x01"
    )
    stamp, pts = decode_pointcloud2(raw, class_field="label")
    assert stamp == 1.5
    np.testing.assert_allclose(pts[:, :3], xyz)
    np.testing.assert_array_equal(pts[:, 3], labels.astype(np.float32))
