#!/usr/bin/env python
"""Standalone sensor bridge nodes — capability parity with
hsr_data_setting/microphone_send.py and hand_camera_send.py.

The reference runs two scripts on the robot host: a PyAudio microphone
publisher (1024-frame int16 chunks at 44.1 kHz stereo ->
/snu/microphone_send) and a USB hand-camera publisher with a reconnect
cascade across device ids (640x480 -> /snu/hand_camera_image_raw).  Here the
same publishers target any `publish(topic, payload)` transport (the
in-process LocalTransport for tests, the rospy bridge on a robot):

    python sensor_bridge.py --source camera --device_ids 0,1,2 --ticks 100
    python sensor_bridge.py --source mic --wav episode.wav   # replay
    python sensor_bridge.py --source mic                     # pyaudio live
"""

from __future__ import annotations

import argparse
import time
import wave
from typing import Optional

import numpy as np

from icra2021_multimodal_ad_tpu.data.acquisition import DataCollector, LocalTransport
from icra2021_multimodal_ad_tpu.data.orchestration import ReconnectingCamera

MIC_TOPIC = DataCollector.TOPICS["mic"]
CAMERA_TOPIC = DataCollector.TOPICS["hand"]
CHUNK_FRAMES = 1024          # microphone_send.py:14
SAMPLE_RATE = 44100          # microphone_send.py:16
CHANNELS = 2                 # microphone_send.py:15


class Cv2Camera:
    """cv2.VideoCapture adapter conforming to ReconnectingCamera's device
    protocol (read() -> frame | None; release())."""

    def __init__(self, device_id: int):
        import cv2

        self._cap = cv2.VideoCapture(device_id)
        if not self._cap.isOpened():
            raise IOError(f"camera {device_id} failed to open")

    def read(self):
        ok, frame = self._cap.read()
        return frame if ok else None

    def release(self):
        self._cap.release()


def make_camera(device_ids) -> ReconnectingCamera:
    """Reconnecting USB camera over candidate ids
    (hand_camera_send.py:28-44 cascade)."""
    return ReconnectingCamera(
        [(lambda d=d: Cv2Camera(d)) for d in device_ids]
    )


def run_camera(transport, device_ids, ticks: int, hz: float = 10.0,
               camera: Optional[ReconnectingCamera] = None,
               sleep=time.sleep) -> int:
    """Publish `ticks` frames at ~hz; returns frames published."""
    cam = camera if camera is not None else make_camera(device_ids)
    sent = 0
    for _ in range(ticks):
        frame = cam.read()  # raises CameraUnavailable when all ids dead
        transport.publish(CAMERA_TOPIC, (np.asarray(frame), time.time()))
        sent += 1
        sleep(1.0 / hz)
    return sent


def iter_wav_chunks(path: str, chunk_frames: int = CHUNK_FRAMES):
    """Replay a wav file as the mic byte-chunk stream (testable stand-in for
    the pyaudio capture loop)."""
    with wave.open(path, "rb") as f:
        width = f.getsampwidth()
        n_ch = f.getnchannels()
        while True:
            data = f.readframes(chunk_frames)
            if len(data) < chunk_frames * width * n_ch:
                break
            yield data


def wav_framerate(path: str) -> int:
    with wave.open(path, "rb") as f:
        return f.getframerate()


def run_mic(transport, ticks: Optional[int] = None,
            wav_path: Optional[str] = None, sleep=time.sleep) -> int:
    """Publish int16 chunks; live pyaudio when available, wav replay
    otherwise (microphone_send.py:14-36 loop).  Replay paces at the wav's
    OWN framerate (one chunk per CHUNK_FRAMES/framerate) so recorded
    timegaps match the audio duration; pass sleep=lambda s: None in tests."""
    sent = 0
    if wav_path is not None:
        chunk_period = CHUNK_FRAMES / wav_framerate(wav_path)
        for chunk in iter_wav_chunks(wav_path):
            transport.publish(MIC_TOPIC, (chunk, time.time()))
            sent += 1
            if ticks is not None and sent >= ticks:
                break
            sleep(chunk_period)
        return sent

    import pyaudio  # robot host only; import guarded deliberately

    pa = pyaudio.PyAudio()
    stream = pa.open(format=pyaudio.paInt16, channels=CHANNELS,
                     rate=SAMPLE_RATE, input=True,
                     frames_per_buffer=CHUNK_FRAMES)
    try:
        while ticks is None or sent < ticks:
            chunk = stream.read(CHUNK_FRAMES)
            transport.publish(MIC_TOPIC, (chunk, time.time()))
            sent += 1
    finally:
        stream.stop_stream()
        stream.close()
        pa.terminate()
    return sent


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", choices=["camera", "mic"], required=True)
    p.add_argument("--device_ids", type=str, default="0,1,2,3",
                   help="camera reconnect cascade candidates")
    p.add_argument("--wav", type=str, default=None,
                   help="replay this wav instead of live pyaudio capture")
    p.add_argument("--ticks", type=int, default=100)
    p.add_argument("--transport", choices=["local", "ros"], default="local")
    args = p.parse_args()

    if args.transport == "ros":
        # publisher side: map payloads onto real rospy Publishers (the
        # subscriber-side make_ros_transport would publish only into an
        # in-process bus and never reach the ROS graph)
        from icra2021_multimodal_ad_tpu.data.acquisition import (
            make_ros_publisher_transport,
        )

        transport = make_ros_publisher_transport()
    else:
        transport = LocalTransport()
        transport.subscribe(
            MIC_TOPIC, lambda p: print(f"mic chunk {len(p[0])}B @ {p[1]:.3f}")
        )
        transport.subscribe(
            CAMERA_TOPIC,
            lambda p: print(f"frame {p[0].shape} @ {p[1]:.3f}"),
        )

    if args.source == "camera":
        ids = [int(d) for d in args.device_ids.split(",")]
        sent = run_camera(transport, ids, args.ticks)
    else:
        sent = run_mic(transport, ticks=args.ticks, wav_path=args.wav)
    print(f"published {sent} messages")


if __name__ == "__main__":
    main()
