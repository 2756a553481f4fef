"""Episode orchestration + sensor fault handling.

Capability parity with the robot-side pieces the recorder alone didn't cover:

  * `PickPlaceScript` / `run_episode` — the scripted pick-place routine the
    reference drives on the HSR robot while recording
    (data_collect_experiment/main_for_data_collect.py:260-336): approach ->
    grasp -> lift -> carry (drop event) -> place, with every sensor
    publishing at its nominal rate on a deterministic simulated clock.
  * `run_collection` — N episodes through LocalTransport -> DataCollector ->
    EpisodeRecorder capture trees; `collect_and_build` chains the ETL and
    returns data_sum shards (one-command collection -> dataset).
  * `ConnectionWatchdog` — the sensor-connection timeout of
    test_file/realtime_tester.py:52-57,112-118,150-155,180-185 (the reference
    sys.exit(1)s when a topic is silent 10 s; here a SensorTimeout is raised
    for the caller to handle).
  * `ReconnectingCamera` — the camera auto-reconnect cascade across device
    ids of hsr_data_setting/hand_camera_send.py:28-44.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from icra2021_multimodal_ad_tpu.data.acquisition import (
    CONNECTION_TIMEOUT_S,
    DataCollector,
    GRAVITY,
    LocalTransport,
)

TOPICS = DataCollector.TOPICS


# ---------------------------------------------------------------------------
# Fault handling
# ---------------------------------------------------------------------------


class SensorTimeout(RuntimeError):
    """A sensor topic went silent past the connection timeout."""

    @classmethod
    def for_topics(cls, dead, timeout_s: float) -> "SensorTimeout":
        return cls(
            "sensor connection timeout (> %.1f s): %s — please check the "
            "sensor connection" % (timeout_s, ", ".join(sorted(dead)))
        )


class CameraUnavailable(RuntimeError):
    """No camera candidate produced a frame after a full reconnect cycle."""


class ConnectionWatchdog:
    """Tracks per-topic liveness; `check()` raises SensorTimeout naming every
    dead topic (realtime_tester.py:52-57 prints 'Please check ... connection'
    and sys.exit(1)s; raising lets library callers decide)."""

    def __init__(self, topics: Sequence[str],
                 timeout_s: float = CONNECTION_TIMEOUT_S,
                 clock: Callable[[], float] = time.monotonic):
        self.timeout_s = timeout_s
        self._clock = clock
        now = clock()
        self._last: Dict[str, float] = {t: now for t in topics}

    def beat(self, topic: str, t: Optional[float] = None) -> None:
        self._last[topic] = self._clock() if t is None else t

    def stale_topics(self, now: Optional[float] = None) -> List[str]:
        now = self._clock() if now is None else now
        return [t for t, last in self._last.items()
                if now - last > self.timeout_s]

    def check(self, now: Optional[float] = None) -> None:
        dead = self.stale_topics(now)
        if dead:
            raise SensorTimeout.for_topics(dead, self.timeout_s)


class ReconnectingCamera:
    """Cycles through candidate capture devices on read failure
    (hand_camera_send.py:28-44: on a failed read the reference releases the
    device and retries ids num+1, num+2, ... wrapping at 10).

    `candidates` are zero-arg factories returning an opened device with a
    `read() -> frame | None` method (a cv2.VideoCapture adapter in
    production; fakes in tests)."""

    def __init__(self, candidates: Sequence[Callable[[], object]],
                 max_cycles: int = 2):
        if not candidates:
            raise ValueError("need at least one camera candidate")
        self._candidates = list(candidates)
        self._max_cycles = max_cycles
        self._idx = 0
        self._dev = None
        self.reconnects = 0

    def _open(self) -> None:
        self._close()
        self._dev = self._candidates[self._idx]()

    def _close(self) -> None:
        if self._dev is not None and hasattr(self._dev, "release"):
            try:
                self._dev.release()
            except Exception:  # noqa: BLE001 — releasing a dead device
                pass
        self._dev = None

    def read(self):
        """Returns the next frame, reconnecting through the candidate list
        (wrapping) until one succeeds; raises CameraUnavailable after
        max_cycles full loops of failures."""
        attempts = len(self._candidates) * self._max_cycles
        for _ in range(attempts):
            try:
                if self._dev is None:
                    self._open()
                frame = self._dev.read()
                if frame is not None:
                    return frame
            except Exception:  # noqa: BLE001 — any device failure -> cycle
                pass
            self._idx = (self._idx + 1) % len(self._candidates)
            self._close()  # release the failed device before cycling on
            self.reconnects += 1
        raise CameraUnavailable(
            f"all {len(self._candidates)} camera candidates failed "
            f"({self._max_cycles} full cycles)"
        )

    def release(self) -> None:
        self._close()


# ---------------------------------------------------------------------------
# Scripted pick-place episode
# ---------------------------------------------------------------------------


@dataclass
class PickPlaceScript:
    """Phase timeline of one collect episode
    (main_for_data_collect.py:260-336: the robot approaches the table, grasps
    the object, lifts, carries — where slips/drops happen — and places).

    All times are seconds from episode start; the drop event (when enabled)
    occurs during the carry phase and is labeled [drop_start, drop_start+0.5]
    downstream (concatdata_maker.py:156-161 semantics)."""

    approach_s: float = 0.8
    grasp_s: float = 0.6
    lift_s: float = 0.6
    carry_s: float = 1.5
    place_s: float = 0.5
    object_grams: float = 210.0
    drop: bool = True
    drop_at: Optional[float] = None  # default: mid-carry

    @property
    def duration_s(self) -> float:
        return (self.approach_s + self.grasp_s + self.lift_s + self.carry_s
                + self.place_s)

    @property
    def carry_start(self) -> float:
        return self.approach_s + self.grasp_s + self.lift_s

    def drop_time(self) -> Optional[float]:
        if not self.drop:
            return None
        if self.drop_at is not None:
            return self.drop_at
        return round(self.carry_start + 0.5 * self.carry_s, 2)

    def weight_grams(self, t: float) -> float:
        """Gripper load profile over the phases."""
        grasp_end = self.approach_s + self.grasp_s
        d = self.drop_time()
        if t < self.approach_s:
            return 0.0
        if t < grasp_end:  # load ramps in during the grasp
            frac = (t - self.approach_s) / self.grasp_s
            return self.object_grams * min(1.0, frac)
        if d is not None and t >= d:
            return 40.0  # residual gripper flex after the drop
        if t >= self.carry_start + self.carry_s:  # placed
            return 0.0 if d is None else 40.0
        return self.object_grams


def run_episode(transport, script: PickPlaceScript, seed: int = 0,
                n_lidar: int = 50, sr: int = 44100,
                rates: Optional[dict] = None) -> Optional[float]:
    """Publish one scripted episode onto the transport's sensor topics with
    explicit simulated timestamps.  Returns the drop time (or None).

    Sensor rates mirror the robot stack: wrist force ~50 Hz, cameras and
    LiDAR ~10 Hz, mic 1024-frame stereo int16 chunks at sr/1024 Hz
    (microphone_send.py:14-24)."""
    from icra2021_multimodal_ad_tpu.data.synthetic import (
        drop_burst_audio,
        jittered_clock,
    )

    rng = np.random.default_rng(seed)
    rates = dict({"force": 50.0, "hand": 10.0, "depth": 10.0,
                  "lidar": 10.0}, **(rates or {}))
    duration = script.duration_s
    drop_t = script.drop_time()

    # wrist force: baseline first (the recorder's weight is ||dF|| from the
    # first message, acquisition.compute_weight_grams)
    base = np.array([1.2, -0.4, -33.0])
    for t in jittered_clock(rng, rates["force"], 0.02, duration):
        w = script.weight_grams(t) + rng.normal(0.0, 1.0)
        f = base + np.array([0.0, 0.0, -max(w, 0.0) * GRAVITY / 1000.0])
        transport.publish(TOPICS["force"], (f[0], f[1], f[2], t))

    for kind, topic, shape in (("hand", TOPICS["hand"], (24, 32, 3)),
                               ("depth", TOPICS["depth"], (24, 32))):
        for t in jittered_clock(rng, rates[kind], 0.05, duration):
            bright = 180 if (drop_t is not None and t >= drop_t) else 120
            frame = np.clip(rng.normal(bright, 25, shape), 0, 255)
            transport.publish(topic, (frame.astype(np.uint8), t))

    for t in jittered_clock(rng, rates["lidar"], 0.08, duration):
        transport.publish(TOPICS["lidar"],
                          (rng.uniform(0.2, 5.0, n_lidar), t))

    # mic: contiguous audio, burst at the drop, chunked like pyaudio
    n = int(duration * sr)
    stereo = drop_burst_audio(rng, duration, sr, drop_t)
    chunk = 1024
    for i in range(0, n - chunk + 1, chunk):
        t = i / sr
        transport.publish(TOPICS["mic"],
                          (stereo[i: i + chunk].tobytes(), t))
    return drop_t


def next_episode_index(ep_root: str) -> int:
    """First unused epNNNN index under `ep_root` — re-collecting into the
    same tree continues the numbering instead of overwriting prior episodes
    (which would also desynchronize the ETL's resume journal)."""
    import os
    import re

    if not os.path.isdir(ep_root):
        return 0
    taken = [int(m.group(1)) for m in
             (re.fullmatch(r"ep(\d+)", n) for n in os.listdir(ep_root)) if m]
    return max(taken) + 1 if taken else 0


def run_collection(out_dir: str, n_episodes: int = 3,
                   script: Optional[PickPlaceScript] = None,
                   seed: int = 0, n_lidar: int = 50,
                   verbose: bool = False) -> List[str]:
    """Drive N simulated pick-place episodes through LocalTransport ->
    DataCollector -> EpisodeRecorder, writing the exact capture tree the ETL
    consumes (episodes under `<out_dir>/data/<name>/data/`, the reference
    layout).  Returns the episode names.  Numbering (and the per-episode
    seed) continues from any episodes already present, so repeated
    collections into one tree accumulate distinct data."""
    import os

    script = script or PickPlaceScript()
    ep_root = os.path.join(out_dir, "data")
    start = next_episode_index(ep_root)
    names = []
    for i in range(n_episodes):
        ep = start + i
        name = f"ep{ep:04d}"
        transport = LocalTransport()
        collector = DataCollector(transport, ep_root, name, start_time=0.0)
        drop_t = run_episode(transport, script, seed=seed + ep,
                             n_lidar=n_lidar)
        if drop_t is not None:
            collector.recorder.mark_drop(drop_t, drop_t + 0.5)
        collector.recorder.save()
        names.append(name)
        if verbose:
            print(f"episode {name}: drop at {drop_t}")
    return names


def collect_and_build(out_dir: str, n_episodes: int = 3,
                      script: Optional[PickPlaceScript] = None,
                      seed: int = 0, n_lidar: int = 50,
                      episodes_per_shard: int = 120,
                      verbose: bool = False) -> List[str]:
    """One command from simulated robot to training shards: collect episodes,
    then run the time-sync ETL; returns the written data_sum shard paths."""
    import os

    from icra2021_multimodal_ad_tpu.data.etl import hsr_preprocess

    run_collection(out_dir, n_episodes, script=script, seed=seed,
                   n_lidar=n_lidar, verbose=verbose)
    return hsr_preprocess(
        os.path.join(out_dir, "data"), out_dir,
        episodes_per_shard=episodes_per_shard, n_lidar=n_lidar,
    )
