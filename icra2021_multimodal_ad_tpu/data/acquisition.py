"""Robot data acquisition — capability parity with
data_collect_experiment/main_for_data_collect.py and hsr_data_setting/
{microphone_send,hand_camera_send}.py.

The reference couples sensor logic directly to rospy callbacks, making it
untestable without an HSR robot (SURVEY.md §4).  Here the per-sensor logic is
pure and transport-agnostic: controllers consume messages from any
`publish(topic, payload)`-shaped transport (the provided `LocalTransport`
in-process bus for tests/simulation, or a thin ROS bridge when rospy exists).
Episode recording writes the exact capture-tree layout the ETL consumes:

    <out>/<episode>/data/{depth,hand,LiDAR,hand_weight,Microphone}.csv
    <out>/<episode>/data/img/{hand,d}/<id>.png
    <out>/<episode>/data/sound/output.wav
    <out>/<episode>/data/drop_time.csv
"""

from __future__ import annotations

import math
import os
import time
import wave
from typing import Dict, List, Optional

import numpy as np

GRAVITY = 9.81
CONNECTION_TIMEOUT_S = 10.0  # realtime_tester.py:31


def compute_weight_grams(first_force_xyz, current_force_xyz) -> float:
    """Force delta -> grams: ||dF|| * 1000 / g, rounded to 0.1 g
    (main_for_data_collect.py force callback; realtime_tester.py:69-80)."""
    if len(first_force_xyz) != len(current_force_xyz):
        raise ValueError("Argument lists differ in length")
    sq = sum((b - a) ** 2 for a, b in zip(first_force_xyz, current_force_xyz))
    return round(math.sqrt(sq) * 1000.0 / GRAVITY, 1)


class LocalTransport:
    """In-process pub/sub standing in for ROS topics."""

    def __init__(self):
        self._subs: Dict[str, list] = {}

    def subscribe(self, topic: str, callback) -> None:
        self._subs.setdefault(topic, []).append(callback)

    def unsubscribe(self, topic: str, callback) -> None:
        """Detach one callback (episode teardown — a collector left attached
        would double-record the next episode)."""
        subs = self._subs.get(topic, [])
        if callback in subs:
            subs.remove(callback)

    def publish(self, topic: str, payload) -> None:
        for cb in list(self._subs.get(topic, [])):
            cb(payload)


class EpisodeRecorder:
    """Accumulates one episode of sensor rows + frames, then writes the
    capture tree (main_for_data_collect.py:243-336 layout)."""

    def __init__(self, out_dir: str, episode: str, start_time: Optional[float] = None):
        self.root = os.path.join(out_dir, episode, "data")
        self.start = start_time if start_time is not None else time.time()
        self.rows: Dict[str, List[dict]] = {
            "depth": [], "hand": [], "LiDAR": [], "hand_weight": [],
            "Microphone": [], "gripper_degree": [],
        }
        self.frames: Dict[str, List[np.ndarray]] = {"hand": [], "d": []}
        self.audio_chunks: List[bytes] = []
        self.drop_start: Optional[float] = None
        self.drop_end: Optional[float] = None
        self._ids = {"depth": 0, "hand": 0}
        self._first_force: Optional[tuple] = None

    # -- sensor feeds -------------------------------------------------------

    def on_force(self, fx: float, fy: float, fz: float, t: Optional[float] = None):
        if self._first_force is None:
            self._first_force = (fx, fy, fz)
        w = compute_weight_grams(self._first_force, (fx, fy, fz))
        self.rows["hand_weight"].append(
            {"datetime": self._t(t), "timegap": self._t(t), "weight": w}
        )

    def on_image(self, kind: str, frame: np.ndarray, t: Optional[float] = None):
        stream = "hand" if kind == "hand" else "depth"
        sub = "hand" if kind == "hand" else "d"
        self._ids[stream] += 1
        self.rows[stream].append(
            {"time": self._t(t), "id": self._ids[stream], "timegap": self._t(t)}
        )
        self.frames[sub].append(np.asarray(frame))

    def on_lidar(self, ranges, t: Optional[float] = None):
        data = "[" + ",".join(f"{float(v):.4f}" for v in ranges) + "]"
        self.rows["LiDAR"].append(
            {"data": data, "time": self._t(t), "timegap": self._t(t)}
        )

    def on_mic_chunk(self, chunk: bytes, t: Optional[float] = None):
        self.audio_chunks.append(chunk)
        self.rows["Microphone"].append(
            {"data": "[]", "time": self._t(t), "timegap": self._t(t)}
        )

    def on_gripper(self, radians, t: Optional[float] = None):
        """Gripper joint radians per message (the reference's
        GripperDegreeController, main_for_data_collect.py:214-241 ->
        gripper_degree.csv; diagnostic stream, not consumed by the ETL)."""
        self.rows["gripper_degree"].append(
            {"gripper_radian": list(map(float, radians)),
             "datetime": self._t(t), "timegap": self._t(t)}
        )

    def mark_drop(self, start_t: float, end_t: float):
        self.drop_start = self._t(start_t)
        self.drop_end = self._t(end_t)

    def _t(self, t: Optional[float]) -> float:
        return round((t if t is not None else time.time()) - self.start, 6)

    # -- persistence --------------------------------------------------------

    def save(self, sample_rate: int = 44100, channels: int = 2) -> str:
        import pandas as pd
        from PIL import Image

        os.makedirs(os.path.join(self.root, "sound"), exist_ok=True)
        for stream, rows in self.rows.items():
            if stream == "gripper_degree" and not rows:
                continue  # diagnostic stream: only written when captured
            pd.DataFrame(rows).to_csv(os.path.join(self.root, f"{stream}.csv"))
        for sub, frames in self.frames.items():
            d = os.path.join(self.root, "img", sub)
            os.makedirs(d, exist_ok=True)
            for i, frame in enumerate(frames, start=1):
                arr = np.asarray(frame)
                if arr.dtype == np.uint16:
                    # millimeter depth from the 16UC1/mono16 decode path:
                    # persist as a true 16-bit PNG (uint8 would wrap mod 256)
                    img = Image.fromarray(arr)
                else:
                    img = Image.fromarray(arr.astype(np.uint8))
                img.save(os.path.join(d, f"{i}.png"))
        if self.drop_start is not None:
            pd.DataFrame(
                [{"drop_end": self.drop_end, "drop_start": self.drop_start}]
            ).to_csv(os.path.join(self.root, "drop_time.csv"))
        if self.audio_chunks:
            with wave.open(
                os.path.join(self.root, "sound", "output.wav"), "wb"
            ) as f:
                f.setnchannels(channels)
                f.setsampwidth(2)
                f.setframerate(sample_rate)
                f.writeframes(b"".join(self.audio_chunks))
        return self.root


class DataCollector:
    """Wires a transport's sensor topics into an EpisodeRecorder
    (main_for_data_collect.py:260-336 subscriber set)."""

    TOPICS = {
        "force": "/hsrb/wrist_wrench/raw",
        "hand": "/camera/color/image_raw",
        "depth": "/hsrb/head_rgbd_sensor/depth_registered/image_rect_raw",
        "lidar": "/hsrb/base_scan",
        "mic": "/snu/microphone_send",
        "gripper": "/hsrb/robot_state/joint_states",
    }

    def __init__(self, transport, out_dir: str, episode: str,
                 start_time: Optional[float] = None):
        self.recorder = EpisodeRecorder(out_dir, episode, start_time)
        self._transport = transport
        self._subs = [
            (self.TOPICS["force"],
             lambda p: self.recorder.on_force(
                 *p[:3], t=p[3] if len(p) > 3 else None)),
            (self.TOPICS["hand"],
             lambda p: self.recorder.on_image("hand", *p)),
            (self.TOPICS["depth"],
             lambda p: self.recorder.on_image("depth", *p)),
            (self.TOPICS["lidar"], lambda p: self.recorder.on_lidar(*p)),
            (self.TOPICS["mic"], lambda p: self.recorder.on_mic_chunk(*p)),
            (self.TOPICS["gripper"], lambda p: self.recorder.on_gripper(*p)),
        ]
        for topic, cb in self._subs:
            transport.subscribe(topic, cb)

    def detach(self) -> None:
        """Stop recording: unsubscribe every callback from the transport
        (episode boundary — the next episode gets a fresh collector)."""
        if hasattr(self._transport, "unsubscribe"):
            for topic, cb in self._subs:
                self._transport.unsubscribe(topic, cb)


def make_ros_transport():  # pragma: no cover — requires a live ROS master
    """rospy bridge: subscribes the HSR sensor topics and republishes each
    message onto a LocalTransport in this package's payload shapes, so the
    same DataCollector/EpisodeRecorder runs unmodified on a robot host
    (main_for_data_collect.py:260-336 subscriber set;
    microphone_send.py / hand_camera_send.py publishers).

    Returns (transport, spin) where spin() blocks until shutdown.
    """
    import rospy
    from geometry_msgs.msg import WrenchStamped
    from sensor_msgs.msg import Image, LaserScan
    from std_msgs.msg import String

    if not rospy.core.is_initialized():
        rospy.init_node("icra_tpu_collector", anonymous=True)

    transport = LocalTransport()
    topics = DataCollector.TOPICS

    def _img_array(msg: "Image") -> np.ndarray:
        # minimal cv_bridge-free decode for the encodings the HSR
        # publishes; honors the per-row stride (msg.step — drivers pad rows
        # for alignment) and the declared byte order
        rows = np.frombuffer(msg.data, dtype=np.uint8).reshape(
            msg.height, msg.step
        )
        if msg.encoding in ("rgb8", "bgr8"):
            arr = rows[:, : msg.width * 3].reshape(msg.height, msg.width, 3)
            if msg.encoding == "bgr8":
                arr = arr[..., ::-1]
            return arr
        if msg.encoding in ("16UC1", "mono16"):
            dt = np.dtype(np.uint16).newbyteorder(
                ">" if msg.is_bigendian else "<"
            )
            return (
                rows[:, : msg.width * 2]
                .copy()
                .view(dt)
                .reshape(msg.height, msg.width)
                .astype(np.uint16)
            )
        if msg.encoding == "mono8":
            return rows[:, : msg.width].copy()
        raise ValueError(f"unsupported image encoding {msg.encoding!r}")

    def on_force(msg: "WrenchStamped"):
        f = msg.wrench.force
        transport.publish(
            topics["force"],
            (f.x, f.y, f.z, msg.header.stamp.to_sec()),
        )

    def on_hand(msg: "Image"):
        transport.publish(
            topics["hand"], (_img_array(msg), msg.header.stamp.to_sec())
        )

    def on_depth(msg: "Image"):
        transport.publish(
            topics["depth"], (_img_array(msg), msg.header.stamp.to_sec())
        )

    def on_lidar(msg: "LaserScan"):
        transport.publish(
            topics["lidar"],
            (np.asarray(msg.ranges, dtype=np.float32),
             msg.header.stamp.to_sec()),
        )

    def on_mic(msg: "String"):
        # microphone_send.py publishes raw int16 chunk bytes as a String
        data = msg.data
        if isinstance(data, str):
            data = data.encode("latin-1")
        transport.publish(topics["mic"], (data, rospy.get_time()))

    def on_joint_states(msg: "JointState"):
        from icra2021_multimodal_ad_tpu.data.hsr_motion import (
            gripper_radians_from_joint_state,
        )

        rad = gripper_radians_from_joint_state(msg.name, msg.position)
        if rad:  # only gripper-bearing messages (the reference's filter)
            transport.publish(
                topics["gripper"], (rad, msg.header.stamp.to_sec())
            )

    from sensor_msgs.msg import JointState

    rospy.Subscriber(topics["force"], WrenchStamped, on_force)
    rospy.Subscriber(topics["hand"], Image, on_hand)
    rospy.Subscriber(topics["depth"], Image, on_depth)
    rospy.Subscriber(topics["lidar"], LaserScan, on_lidar)
    rospy.Subscriber(topics["mic"], String, on_mic)
    rospy.Subscriber(topics["gripper"], JointState, on_joint_states)
    return transport, rospy.spin


def make_ros_publisher_transport(color_encoding: str = "bgr8"):  # pragma: no cover — requires ROS
    """OUTBOUND rospy bridge — the sensor-bridge publisher side
    (microphone_send.py:7-36 and hand_camera_send.py:11-26 publish String /
    Image onto the graph; make_ros_transport above is the inbound
    subscriber side).  publish(topic, payload) maps this package's payload
    shapes onto real ROS messages:

      mic:  (bytes, t)  -> std_msgs/String (latin-1, the inverse of
                           make_ros_transport's on_mic decode)
      hand/depth: (ndarray, t) -> sensor_msgs/Image (`color_encoding` for
                           (H, W, 3) uint8, 16UC1 for uint16, mono8
                           otherwise)

    `color_encoding` defaults to 'bgr8' because the in-repo producer is the
    cv2 camera adapter (OpenCV frames are BGR) — the subscriber side
    (_img_array above) honors the declared encoding and flips bgr8 back to
    RGB.  Pass 'rgb8' when publishing frames that are already RGB.
    """
    import rospy
    from sensor_msgs.msg import Image
    from std_msgs.msg import String

    if not rospy.core.is_initialized():
        rospy.init_node("icra_tpu_sensor_bridge", anonymous=True)

    topics = DataCollector.TOPICS
    pubs = {
        topics["mic"]: rospy.Publisher(topics["mic"], String, queue_size=10),
        topics["hand"]: rospy.Publisher(topics["hand"], Image, queue_size=5),
        topics["depth"]: rospy.Publisher(topics["depth"], Image,
                                         queue_size=5),
    }

    def _img_msg(arr: np.ndarray, t: float) -> "Image":
        arr = np.ascontiguousarray(arr)
        msg = Image()
        msg.header.stamp = rospy.Time.from_sec(t)
        msg.height, msg.width = arr.shape[0], arr.shape[1]
        if arr.ndim == 3 and arr.shape[2] == 3:
            msg.encoding = color_encoding
            arr = arr.astype(np.uint8)
            msg.step = msg.width * 3
        elif arr.dtype == np.uint16:
            msg.encoding = "16UC1"
            msg.step = msg.width * 2
        else:
            msg.encoding = "mono8"
            arr = arr.astype(np.uint8)
            msg.step = msg.width
        msg.is_bigendian = 0
        msg.data = arr.tobytes()
        return msg

    class _PublisherTransport:
        def publish(self, topic: str, payload) -> None:
            pub = pubs.get(topic)
            if pub is None:
                raise ValueError(f"no ROS publisher for topic {topic!r}")
            if topic == topics["mic"]:
                chunk, _t = payload
                if isinstance(chunk, (bytes, bytearray)):
                    chunk = bytes(chunk).decode("latin-1")
                pub.publish(String(data=chunk))
            else:
                frame, t = payload
                pub.publish(_img_msg(np.asarray(frame), float(t)))

    return _PublisherTransport()
