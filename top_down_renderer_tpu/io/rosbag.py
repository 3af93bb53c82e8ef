"""Pure-Python ROS1 .bag (format 2.0) reader -> npz Bag converter.

The reference's entire validation story replays recorded rosbags
(KITTI / ucity / Morgantown, /root/reference/scripts/benchmark_loc.py:
141-146) against the live node.  This module reads those bags WITHOUT a
ROS installation: the v2.0 container (records, chunks, connections) and
the little-endian message serialization are parsed directly, and the
relevant message types (sensor_msgs/PointCloud2, nav_msgs/Odometry,
geometry_msgs/PoseStamped + variants, sensor_msgs/NavSatFix) are decoded
into the replay Bag (io/replay.py).

Container format (ros.org/wiki ROS Bags/Format/2.0):
  file  := "#ROSBAG V2.0\\n" record*
  record:= u32 header_len, header, u32 data_len, data
  header:= (u32 field_len, name '=' value)*
  op 0x03 bag header | 0x05 chunk (compression none/bz2/lz4) |
  0x07 connection (data = embedded header w/ topic/type/md5sum) |
  0x02 message data (conn id + time) | 0x04/0x06 index/chunk-info.
Chunk data decompresses to a stream of connection + message records.
"""

from __future__ import annotations

import bz2
import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

_MAGIC = b"#ROSBAG V2.0\n"

OP_MSG = 0x02
OP_BAG_HEADER = 0x03
OP_INDEX = 0x04
OP_CHUNK = 0x05
OP_CHUNK_INFO = 0x06
OP_CONNECTION = 0x07

# PointField datatype code -> numpy dtype (sensor_msgs/PointField)
_PF_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


def _parse_header(buf: bytes) -> Dict[str, bytes]:
    fields = {}
    i = 0
    n = len(buf)
    while i + 4 <= n:
        (flen,) = struct.unpack_from("<I", buf, i)
        i += 4
        field = buf[i : i + flen]
        i += flen
        eq = field.index(b"=")
        fields[field[:eq].decode()] = field[eq + 1 :]
    return fields


def _records(buf: bytes, pos: int = 0) -> Iterator[Tuple[Dict, bytes]]:
    n = len(buf)
    while pos + 4 <= n:
        (hlen,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        header = _parse_header(buf[pos : pos + hlen])
        pos += hlen
        (dlen,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        data = buf[pos : pos + dlen]
        pos += dlen
        yield header, data


def lz4_block_decompress(src: bytes) -> bytes:
    """Pure-Python LZ4 *block* decoder (the raw sequence format:
    token = literal-len nibble | match-len nibble, LE u16 match offset,
    0xFF length-extension bytes; lz4.org block format spec)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence is literals-only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt lz4 block: bad match offset")
        mlen = token & 15
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping match = repeated pattern of length `offset`
            pat = bytes(out[start:])
            out += (pat * (mlen // offset + 1))[:mlen]
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    """Pure-Python LZ4 *frame* decoder covering what roslz4 emits
    (ros_comm/utilities/roslz4/src/lz4s.c writes the LZ4 frame format:
    magic 0x184D2204, FLG/BD descriptor, blocks with a high-bit
    'uncompressed' flag, zero end mark).  Checksums are skipped, not
    verified (integrity is the transport's job here)."""
    i, n = 0, len(data)
    out = bytearray()
    while i < n:
        (magic,) = struct.unpack_from("<I", data, i)
        i += 4
        if magic == 0x184D2A50:  # skippable frame
            (sz,) = struct.unpack_from("<I", data, i)
            i += 4 + sz
            continue
        if magic != 0x184D2204:
            raise ValueError(
                f"not an LZ4 frame (magic {magic:#x})"
            )
        flg = data[i]
        bd_unused = data[i + 1]  # noqa: F841 - block-size table byte
        i += 2
        if (flg >> 6) != 0b01:
            raise ValueError("unsupported LZ4 frame version")
        b_checksum = bool(flg & 0x10)
        c_size = bool(flg & 0x08)
        c_checksum = bool(flg & 0x04)
        dict_id = bool(flg & 0x01)
        if c_size:
            i += 8
        if dict_id:
            i += 4
        i += 1  # header checksum byte (xxh32>>8), not verified
        while True:
            (bsize,) = struct.unpack_from("<I", data, i)
            i += 4
            if bsize == 0:  # end mark
                break
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            block = data[i : i + bsize]
            i += bsize
            out += block if uncompressed else lz4_block_decompress(
                block
            )
            if b_checksum:
                i += 4
        if c_checksum:
            i += 4
    return bytes(out)


def _decompress(compression: bytes, data: bytes, size: int) -> bytes:
    if compression in (b"none", b""):
        return data
    if compression == b"bz2":
        return bz2.decompress(data)
    if compression == b"lz4":
        try:
            import lz4.frame  # fast path when the package exists
        except ImportError:
            # Ouster-era bags are commonly lz4-chunked
            # (/root/reference/scripts/benchmark_loc.py replays such
            # bags); decode in pure Python rather than refusing
            return lz4_frame_decompress(data)
        return lz4.frame.decompress(data)
    raise ValueError(f"unknown chunk compression {compression!r}")


class Connection:
    __slots__ = ("cid", "topic", "msg_type", "md5sum")

    def __init__(self, cid: int, conn_header: Dict[str, bytes]):
        # the connection record's DATA holds the authoritative
        # topic/type/md5sum header block
        self.cid = cid
        self.topic = conn_header.get("topic", b"").decode()
        self.msg_type = conn_header.get("type", b"").decode()
        self.md5sum = conn_header.get("md5sum", b"").decode()


class RosbagReader:
    """Sequential reader over all message records in a v2.0 bag."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._buf = f.read()
        if not self._buf.startswith(_MAGIC):
            raise ValueError(
                f"{path}: not a ROS bag v2.0 (magic mismatch)"
            )
        self.connections: Dict[int, Connection] = {}

    def _add_connection(self, header: Dict, data: bytes) -> None:
        cid = struct.unpack("<I", header["conn"])[0]
        self.connections[cid] = Connection(cid, _parse_header(data))

    def messages(
        self, topics: Optional[List[str]] = None
    ) -> Iterator[Tuple[str, str, float, bytes]]:
        """Yields (topic, msg_type, stamp_seconds, raw_serialized_msg)
        in file order."""
        want = set(topics) if topics else None
        for header, data in _records(self._buf, len(_MAGIC)):
            op = header.get("op", b"\x00")[0]
            if op == OP_CONNECTION:
                self._add_connection(header, data)
            elif op == OP_CHUNK:
                raw = _decompress(
                    header.get("compression", b"none"),
                    data,
                    struct.unpack("<I", header["size"])[0],
                )
                for h2, d2 in _records(raw):
                    op2 = h2.get("op", b"\x00")[0]
                    if op2 == OP_CONNECTION:
                        self._add_connection(h2, d2)
                    elif op2 == OP_MSG:
                        yield self._emit(h2, d2, want)
            elif op == OP_MSG:  # unchunked (rare but legal)
                yield self._emit(header, data, want)

    def _emit(self, header, data, want):
        cid = struct.unpack("<I", header["conn"])[0]
        sec, nsec = struct.unpack("<II", header["time"])
        conn = self.connections.get(cid)
        topic = conn.topic if conn else f"<conn {cid}>"
        mtype = conn.msg_type if conn else ""
        return (topic, mtype, sec + nsec * 1e-9, data)


# ---------------------------------------------------------------------
# message deserializers (little-endian ROS1 serialization)
# ---------------------------------------------------------------------


class _Cursor:
    __slots__ = ("buf", "i")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.i)
        self.i += 4
        return v

    def u8(self) -> int:
        v = self.buf[self.i]
        self.i += 1
        return v

    def f64(self, n: int = 1):
        v = struct.unpack_from(f"<{n}d", self.buf, self.i)
        self.i += 8 * n
        return v if n > 1 else v[0]

    def string(self) -> str:
        n = self.u32()
        s = self.buf[self.i : self.i + n]
        self.i += n
        return s.decode(errors="replace")

    def skip(self, n: int) -> None:
        self.i += n

    def header(self) -> float:
        """std_msgs/Header -> stamp seconds."""
        self.u32()  # seq
        sec, nsec = struct.unpack_from("<II", self.buf, self.i)
        self.i += 8
        self.string()  # frame_id
        return sec + nsec * 1e-9


def _decode_pc2_raw(raw: bytes, class_field: str):
    """Shared PointCloud2 wire parse -> (stamp, height, width,
    (H*W, 4) float32 x y z class) with padding/NaN points intact."""
    c = _Cursor(raw)
    stamp = c.header()
    height, width = c.u32(), c.u32()
    n_fields = c.u32()
    fields = []
    for _ in range(n_fields):
        name = c.string()
        offset = c.u32()
        datatype = c.u8()
        count = c.u32()
        fields.append((name, offset, datatype, count))
    is_bigendian = c.u8()
    point_step = c.u32()
    c.u32()  # row_step
    n_bytes = c.u32()
    data = np.frombuffer(c.buf, np.uint8, n_bytes, c.i)
    c.skip(n_bytes)
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 not supported")

    n = (height * width) if point_step == 0 else n_bytes // point_step
    mat = data[: n * point_step].reshape(n, point_step)

    def col(name):
        for fname, off, dt, _cnt in fields:
            if fname == name:
                dtype = _PF_DTYPES[dt]
                w = np.dtype(dtype).itemsize
                return (
                    mat[:, off : off + w]
                    .copy()
                    .view(dtype)
                    .reshape(n)
                    .astype(np.float32)
                )
        return np.zeros(n, np.float32)

    pts = np.stack(
        [col("x"), col("y"), col("z"), col(class_field)], axis=-1
    )
    return stamp, height, width, pts


def decode_pointcloud2(
    raw: bytes, class_field: str = "intensity"
) -> Tuple[float, np.ndarray]:
    """sensor_msgs/PointCloud2 -> (stamp, (N, 4) x y z class).

    The reference stores the semantic class id in the intensity field
    (/root/reference/src/scan_renderer.cpp:72)."""
    stamp, _h, _w, pts = _decode_pc2_raw(raw, class_field)
    # drop non-finite points (organized clouds pad with NaN)
    pts = pts[np.isfinite(pts[:, :3]).all(axis=1)]
    return stamp, pts


def decode_pointcloud2_organized(
    raw: bytes, class_field: str = "intensity"
) -> Tuple[float, np.ndarray]:
    """sensor_msgs/PointCloud2 with height > 1 -> (stamp, (H, W, 4)
    x y z class), the organized grid PRESERVED for the Cartesian
    geometric renderer (render/geometric.py: column-wise slope walk
    over the organized cloud, scan_renderer.cpp:7-53).  NaN / infinite
    padding points are mapped to (0, 0, 0, 0) - the renderer's
    invalid-point convention (x == 0 and y == 0)."""
    stamp, h, w, pts = _decode_pc2_raw(raw, class_field)
    if h <= 1:
        raise ValueError(
            f"cloud is unorganized (height={h}); use decode_pointcloud2"
        )
    bad = ~np.isfinite(pts).all(axis=1)
    pts[bad] = 0.0
    return stamp, pts.reshape(h, w, 4)


def decode_pose(c: _Cursor) -> Tuple[np.ndarray, np.ndarray]:
    pos = np.array(c.f64(3), np.float64)
    quat = np.array(c.f64(4), np.float64)  # x y z w
    return pos, quat


def decode_odometry(raw: bytes) -> Tuple[float, np.ndarray, np.ndarray]:
    """nav_msgs/Odometry -> (stamp, position, quaternion)."""
    c = _Cursor(raw)
    stamp = c.header()
    c.string()  # child_frame_id
    pos, quat = decode_pose(c)
    return stamp, pos, quat


def decode_pose_stamped(raw: bytes):
    """geometry_msgs/PoseStamped -> (stamp, position, quaternion)."""
    c = _Cursor(raw)
    stamp = c.header()
    pos, quat = decode_pose(c)
    return stamp, pos, quat


def decode_pose_with_cov_stamped(raw: bytes):
    """geometry_msgs/PoseWithCovarianceStamped."""
    c = _Cursor(raw)
    stamp = c.header()
    pos, quat = decode_pose(c)
    return stamp, pos, quat


def decode_navsatfix(raw: bytes) -> Tuple[float, float, float]:
    """sensor_msgs/NavSatFix -> (stamp, lat_deg, lon_deg)."""
    c = _Cursor(raw)
    stamp = c.header()
    c.skip(1 + 2)  # NavSatStatus: int8 status, uint16 service
    lat = c.f64()
    lon = c.f64()
    return stamp, lat, lon


_PRIOR_DECODERS = {
    "nav_msgs/Odometry": decode_odometry,
    "geometry_msgs/PoseStamped": decode_pose_stamped,
    "geometry_msgs/PoseWithCovarianceStamped":
        decode_pose_with_cov_stamped,
}


def convert_rosbag(
    path: str,
    scan_topic: str,
    prior_topic: str,
    gps_topic: Optional[str] = None,
    class_field: str = "intensity",
    max_scans: Optional[int] = None,
):
    """Read a v2.0 rosbag and build the npz replay Bag
    (io/replay.py::Bag).  Topic set mirrors the reference node's
    subscriptions (/root/reference/src/top_down_render.cpp:11-27:
    'pc', 'motion_prior') plus the GPS topic its benchmark scripts
    consume (scripts/benchmark_loc.py:93-96)."""
    from top_down_renderer_tpu.io.replay import Bag

    reader = RosbagReader(path)
    scan_stamps: List[float] = []
    scan_chunks: List[np.ndarray] = []
    prior = {"t": [], "pos": [], "quat": []}
    gps = {"t": [], "latlon": []}
    topics = [scan_topic, prior_topic] + (
        [gps_topic] if gps_topic else []
    )
    for topic, mtype, _t, raw in reader.messages():
        if topic == scan_topic:
            if max_scans is not None and len(scan_stamps) >= max_scans:
                continue
            stamp, pts = decode_pointcloud2(raw, class_field)
            scan_stamps.append(stamp)
            scan_chunks.append(pts)
        elif topic == prior_topic:
            dec = _PRIOR_DECODERS.get(mtype, decode_odometry)
            stamp, pos, quat = dec(raw)
            prior["t"].append(stamp)
            prior["pos"].append(pos)
            prior["quat"].append(quat)
        elif gps_topic and topic == gps_topic:
            stamp, lat, lon = decode_navsatfix(raw)
            gps["t"].append(stamp)
            gps["latlon"].append((lat, lon))

    if not scan_stamps:
        raise ValueError(
            f"no PointCloud2 messages on topic {scan_topic!r}; "
            f"topics present: "
            f"{sorted(c.topic for c in reader.connections.values())}"
        )
    offsets = np.zeros(len(scan_chunks) + 1, np.int64)
    np.cumsum([len(p) for p in scan_chunks], out=offsets[1:])
    return Bag(
        scan_stamps=np.asarray(scan_stamps, np.float64),
        scan_points=(
            np.concatenate(scan_chunks)
            if scan_chunks
            else np.zeros((0, 4), np.float32)
        ),
        scan_offsets=offsets,
        prior_stamps=np.asarray(prior["t"], np.float64),
        prior_pos=np.asarray(prior["pos"], np.float64).reshape(-1, 3),
        prior_quat=np.asarray(prior["quat"], np.float64).reshape(-1, 4),
        gps_stamps=(
            np.asarray(gps["t"], np.float64) if gps["t"] else None
        ),
        gps_latlon=(
            np.asarray(gps["latlon"], np.float64) if gps["t"] else None
        ),
    )
