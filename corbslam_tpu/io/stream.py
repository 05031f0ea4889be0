"""Live image-stream ingest — the ROS live-node capability.

The reference's live front ends subscribe to camera topics and feed the
SLAM system as frames arrive (ref: corbslam_client/Examples/ROS/ORB_SLAM2/
src/ros_stereo.cc:98 message_filters ApproximateTime sync of left/right
image topics -> GrabStereo; ros_mono.cc, ros_rgbd.cc likewise). This module
is the transport-agnostic equivalent:

* `ImageStreamServer` — a publisher process pushes (topic, timestamp,
  image) frames over TCP with a length-prefixed binary framing (same style
  as collab/socket_transport.py — no ROS, no text encoding).
* `ImageStreamClient` — receives frames into per-topic queues.
* `ApproxSync` — pairs frames of two topics whose timestamps fall within a
  slop window, dropping stale unmatched frames: the message_filters
  ApproximateTime policy reduced to the two-stream case the examples use.

The run loop lives in apps/run_stream.py.
"""

from __future__ import annotations

import socket
import struct
import threading
from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np

_HDR = struct.Struct("<IBHdHHB")  # total_len, kind, topic_len, ts, h, w, dtype
KIND_FRAME = 1
KIND_EOS = 2

_DTYPES = {0: np.uint8, 1: np.float32}
_DTYPE_IDS = {np.dtype(np.uint8): 0, np.dtype(np.float32): 1}


def _pack_frame(topic: str, ts: float, img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img)
    did = _DTYPE_IDS[img.dtype]
    tb = topic.encode()
    body = (struct.pack("<BHdHHB", KIND_FRAME, len(tb), ts,
                        img.shape[0], img.shape[1], did)
            + tb + img.tobytes())
    return struct.pack("<I", len(body)) + body


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class ImageStreamServer:
    """Publisher side: accepts one subscriber, pushes frames.

    The ROS analog is the camera driver node publishing image topics; the
    40-second operator sleep the reference needs before replay
    (stereo_kitti.cc:68) disappears — the subscriber connects first, then
    frames flow."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._conn: Optional[socket.socket] = None

    def wait_subscriber(self, timeout: float = 60.0) -> None:
        self._srv.settimeout(timeout)
        self._conn, _ = self._srv.accept()
        self._conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def publish(self, topic: str, ts: float, img: np.ndarray) -> None:
        assert self._conn is not None, "no subscriber"
        self._conn.sendall(_pack_frame(topic, ts, img))

    def end(self) -> None:
        if self._conn is not None:
            body = struct.pack("<BHdHHB", KIND_EOS, 0, 0.0, 0, 0, 0)
            self._conn.sendall(struct.pack("<I", len(body)) + body)

    def close(self) -> None:
        for s in (self._conn, self._srv):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


class ImageStreamClient:
    """Subscriber side: background reader thread fills per-topic queues
    (the rospy subscriber callback queue, queue_size semantics of
    ros_stereo.cc:93-96)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 queue_size: int = 16, connect_timeout: float = 60.0):
        self._sock = socket.create_connection((host, port),
                                             timeout=connect_timeout)
        self._sock.settimeout(None)
        self._queues: Dict[str, deque] = {}
        self._qsize = queue_size
        self._lock = threading.Lock()
        self._eos = threading.Event()
        self._thread = threading.Thread(target=self._read_loop, daemon=True)
        self._thread.start()

    def _read_loop(self):
        while True:
            hdr = _recv_exact(self._sock, 4)
            if hdr is None:
                break
            (ln,) = struct.unpack("<I", hdr)
            body = _recv_exact(self._sock, ln)
            if body is None:
                break
            kind, tlen, ts, h, w, did = struct.unpack_from("<BHdHHB", body)
            if kind == KIND_EOS:
                break
            off = struct.calcsize("<BHdHHB")
            topic = body[off:off + tlen].decode()
            img = np.frombuffer(
                body[off + tlen:], _DTYPES[did]).reshape(h, w)
            with self._lock:
                q = self._queues.setdefault(topic, deque(maxlen=self._qsize))
                q.append((ts, img))
        self._eos.set()

    def pop_all(self, topic: str) -> List[Tuple[float, np.ndarray]]:
        with self._lock:
            q = self._queues.get(topic)
            if not q:
                return []
            out = list(q)
            q.clear()
            return out

    @property
    def ended(self) -> bool:
        return self._eos.is_set()

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class ApproxSync:
    """Two-topic approximate-time pairing (message_filters
    ApproximateTime, ros_stereo.cc:98): emit (ts, a, b) for the closest
    cross-topic timestamp pairs within `slop`; frames older than the last
    emitted pair are dropped."""

    def __init__(self, slop: float = 0.02):
        self.slop = slop
        self._a: deque = deque()
        self._b: deque = deque()
        self._last_ts = -np.inf

    def push_a(self, ts: float, img) -> None:
        if ts > self._last_ts:
            self._a.append((ts, img))

    def push_b(self, ts: float, img) -> None:
        if ts > self._last_ts:
            self._b.append((ts, img))

    def pop_pairs(self) -> List[Tuple[float, np.ndarray, np.ndarray]]:
        out = []
        while self._a and self._b:
            ta, ia = self._a[0]
            tb, ib = self._b[0]
            if abs(ta - tb) <= self.slop:
                out.append((min(ta, tb), ia, ib))
                self._a.popleft()
                self._b.popleft()
                self._last_ts = max(ta, tb)
            elif ta < tb:   # a too old to ever match
                self._a.popleft()
            else:
                self._b.popleft()
        return out
