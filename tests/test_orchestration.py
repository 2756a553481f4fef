"""Episode orchestration + sensor fault handling.

Covers the robot-side capabilities beyond the bare recorder: the scripted
pick-place episode driver (main_for_data_collect.py:260-336), the one-command
collect -> ETL -> shards flow, the sensor-connection watchdog
(realtime_tester.py:52-57), and the camera reconnect cascade
(hand_camera_send.py:28-44).
"""

import os

import numpy as np
import pandas as pd
import pytest

from icra2021_multimodal_ad_tpu.data.orchestration import (
    CameraUnavailable,
    ConnectionWatchdog,
    PickPlaceScript,
    ReconnectingCamera,
    SensorTimeout,
    collect_and_build,
    run_collection,
)


# ---------------------------------------------------------------------------
# watchdog
# ---------------------------------------------------------------------------


def test_watchdog_raises_after_timeout_naming_topic():
    t = [0.0]
    wd = ConnectionWatchdog(["mic", "cam"], timeout_s=10.0, clock=lambda: t[0])
    wd.check()  # fresh
    t[0] = 9.0
    wd.beat("cam")
    wd.check(now=9.5)  # mic at 9.5s silence — still under 10
    with pytest.raises(SensorTimeout, match="mic"):
        wd.check(now=10.5)  # mic dead, cam alive
    assert wd.stale_topics(now=10.5) == ["mic"]


def test_streaming_detector_enforces_connection_timeout(monkeypatch):
    from icra2021_multimodal_ad_tpu.data import streaming as st

    clock = [0.0]
    monkeypatch.setattr(st.time, "monotonic", lambda: clock[0])
    source = st.SensorSource(batch_size=2)
    clock[0] = 0.5
    source.force_q.append(1.0)
    clock[0] = 9.9
    assert source.stale_topics(10.0) == []
    clock[0] = 10.3  # others silent since t=0, force refreshed at t=0.5
    assert "force" not in source.stale_topics(10.0)
    assert set(source.stale_topics(10.0)) == {"hand_camera", "depth",
                                              "microphone"}

    detector = st.StreamingDetector.__new__(st.StreamingDetector)  # no model
    detector.config = None
    detector.latencies_s = []
    with pytest.raises(SensorTimeout, match="depth"):
        st.StreamingDetector.run(detector, source, n_ticks=1,
                                 connection_timeout_s=10.0)


# ---------------------------------------------------------------------------
# camera reconnect cascade
# ---------------------------------------------------------------------------


class _FakeCam:
    def __init__(self, frames, fail_after=None):
        self.frames = list(frames)
        self.fail_after = fail_after
        self.reads = 0
        self.released = False

    def read(self):
        self.reads += 1
        if self.fail_after is not None and self.reads > self.fail_after:
            return None
        return self.frames[0] if self.frames else None

    def release(self):
        self.released = True


def test_camera_cascades_to_next_device_on_failure():
    dead = _FakeCam([], fail_after=0)
    live = _FakeCam(["frame"])
    cam = ReconnectingCamera([lambda: dead, lambda: live])
    assert cam.read() == "frame"
    assert cam.reconnects == 1  # device 0 failed once, cascaded to 1
    assert cam.read() == "frame"
    assert cam.reconnects == 1  # stays on the live device


def test_camera_recovers_after_transient_failure_and_wraps():
    flaky = _FakeCam(["a"], fail_after=1)
    cam = ReconnectingCamera([lambda: flaky, lambda: _FakeCam([], 0),
                              lambda: _FakeCam(["b"])])
    assert cam.read() == "a"  # first read OK
    assert cam.read() == "b"  # flaky dies -> candidate 1 dead -> candidate 2
    assert cam.reconnects == 2


def test_camera_unavailable_after_full_cycles():
    cam = ReconnectingCamera([lambda: _FakeCam([], 0)] * 2, max_cycles=2)
    with pytest.raises(CameraUnavailable):
        cam.read()
    assert cam.reconnects == 4


def test_camera_releases_failed_device_before_cycling():
    """hand_camera_send.py:28-44: the reference RELEASES the failed device
    before retrying the next id — dropping the handle without release would
    keep /dev/videoN busy when the cascade wraps back."""
    dead = _FakeCam([], fail_after=0)
    live = _FakeCam(["frame"])
    cam = ReconnectingCamera([lambda: dead, lambda: live])
    assert cam.read() == "frame"
    assert dead.released


# ---------------------------------------------------------------------------
# scripted episodes -> capture tree -> ETL -> shards
# ---------------------------------------------------------------------------


def test_robot_episode_motion_sequence():
    """run_robot_episode must issue the reference's pick-place command
    sequence (main_for_data_collect.py:273-336): initial -> open -> pick
    (apply_force) -> head down -> carry pose -> carry dwell -> place ->
    release -> retreat."""
    from icra2021_multimodal_ad_tpu.data.hsr_motion import (
        SimMotionBackend,
        run_robot_episode,
    )

    b = SimMotionBackend()
    assert run_robot_episode(b, carry_s=1.5) is True
    moves = [c[1] for c in b.calls if c[0] == "move"]
    assert moves == ["initial_position", "head_down_position",
                     "go_to_position", "place_position", "go_to_position"]
    assert ("apply_force", 1.0) in b.calls
    assert [c for c in b.calls if c[0] == "grasp"] == [
        ("grasp", 1.0), ("grasp", 1.0)]  # open before pick, release at place
    assert ("sleep", 1.5) in b.calls  # the carry window

    # confirm gate: aborting at pick stops before any grasp force
    b2 = SimMotionBackend()
    assert run_robot_episode(b2, confirm=lambda step: step != "pick") is False
    assert ("apply_force", 1.0) not in b2.calls


def test_gripper_degree_stream_recorded(tmp_path):
    """The gripper joint-state stream persists as gripper_degree.csv
    (main_for_data_collect.py:214-241), and the joint filter matches the
    reference's name set."""
    import pandas as pd

    from icra2021_multimodal_ad_tpu.data.acquisition import (
        DataCollector,
        LocalTransport,
    )
    from icra2021_multimodal_ad_tpu.data.hsr_motion import (
        gripper_radians_from_joint_state,
    )

    rad = gripper_radians_from_joint_state(
        ["arm_flex_joint", "hand_l_proximal_joint", "hand_r_distal_joint"],
        [0.5, 0.1, 0.2],
    )
    assert rad == [0.1, 0.2]

    transport = LocalTransport()
    col = DataCollector(transport, str(tmp_path), "ep0", start_time=0.0)
    transport.publish(DataCollector.TOPICS["gripper"], ([0.1, 0.2], 1.0))
    root = col.recorder.save()
    df = pd.read_csv(os.path.join(root, "gripper_degree.csv"))
    assert df["timegap"].tolist() == [1.0]
    # episodes without gripper capture don't write the diagnostic file
    col2 = DataCollector(transport, str(tmp_path), "ep1", start_time=0.0)
    transport.unsubscribe = getattr(transport, "unsubscribe")
    col.detach()
    root2 = col2.recorder.save()
    assert not os.path.exists(os.path.join(root2, "gripper_degree.csv"))


def test_pick_place_weight_profile():
    s = PickPlaceScript(object_grams=200.0)
    assert s.weight_grams(0.1) == 0.0                      # approach
    assert 0 < s.weight_grams(s.approach_s + 0.3) <= 200.0  # grasp ramp
    carry_t = s.carry_start + 0.1
    assert s.weight_grams(carry_t) == 200.0                # carrying
    assert s.weight_grams(s.drop_time() + 0.1) == 40.0     # dropped
    assert PickPlaceScript(drop=False).drop_time() is None


def test_run_collection_writes_etl_ready_tree(tmp_path):
    out = str(tmp_path / "collect")
    names = run_collection(out, n_episodes=2, seed=3, n_lidar=20)
    assert names == ["ep0000", "ep0001"]
    ep = os.path.join(out, "data", "ep0000", "data")
    for f in ("depth.csv", "hand.csv", "LiDAR.csv", "hand_weight.csv",
              "Microphone.csv", "drop_time.csv"):
        assert os.path.exists(os.path.join(ep, f)), f
    assert os.path.exists(os.path.join(ep, "sound", "output.wav"))
    assert os.path.exists(os.path.join(ep, "img", "hand", "1.png"))
    assert os.path.exists(os.path.join(ep, "img", "d", "1.png"))

    w = pd.read_csv(os.path.join(ep, "hand_weight.csv"))
    drop = pd.read_csv(os.path.join(ep, "drop_time.csv"))
    drop_start = drop["drop_start"].iloc[0]
    before = w[w["timegap"].between(drop_start - 0.5, drop_start - 0.1)]
    after = w[w["timegap"] > drop_start + 0.05]
    assert before["weight"].mean() > 150
    assert after["weight"].mean() < 80


def test_run_collection_continues_numbering(tmp_path):
    """Re-collecting into the same tree must append new episodes (distinct
    seeds), not overwrite ep0000.. and desynchronize the ETL journal."""
    from icra2021_multimodal_ad_tpu.data.orchestration import run_collection

    out = str(tmp_path)
    first = run_collection(out, n_episodes=2, n_lidar=10)
    second = run_collection(out, n_episodes=2, n_lidar=10)
    assert first == ["ep0000", "ep0001"]
    assert second == ["ep0002", "ep0003"]
    import os

    eps = sorted(os.listdir(os.path.join(out, "data")))
    assert eps == ["ep0000", "ep0001", "ep0002", "ep0003"]
    # distinct seeds -> distinct data
    w0 = open(os.path.join(out, "data", "ep0000", "data",
                           "hand_weight.csv")).read()
    w2 = open(os.path.join(out, "data", "ep0002", "data",
                           "hand_weight.csv")).read()
    assert w0 != w2


def test_collect_and_build_one_command(tmp_path):
    out = str(tmp_path / "robot")
    shards = collect_and_build(out, n_episodes=2, seed=1, n_lidar=12,
                               episodes_per_shard=2)
    assert len(shards) == 1 and os.path.exists(shards[0])
    df = pd.read_csv(shards[0])
    for col in ("mfcc00", "mfcc12", "cur_depth_id", "cur_hand_id",
                "cur_hand_weight", "LiDAR000", "label"):
        assert col in df.columns, col
    assert set(df["label"].unique()) == {0, 1}
    # the drop must be visible: labeled rows carry the dropped weight
    dropped = df[df["label"] == 1]["cur_hand_weight"]
    carried = df[df["label"] == 0]["cur_hand_weight"]
    assert dropped.mean() < carried.quantile(0.9)


# ---------------------------------------------------------------------------
# sensor bridge (microphone_send.py / hand_camera_send.py analogs)
# ---------------------------------------------------------------------------


def test_sensor_bridge_camera_publishes_with_cascade(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import sensor_bridge
    from icra2021_multimodal_ad_tpu.data.acquisition import LocalTransport

    class _Dead:
        def read(self):
            return None

        def release(self):
            pass

    class _Live:
        def read(self):
            return np.zeros((4, 4, 3), np.uint8)

        def release(self):
            pass

    cam = ReconnectingCamera([lambda: _Dead(), lambda: _Live()])
    transport = LocalTransport()
    got = []
    transport.subscribe(sensor_bridge.CAMERA_TOPIC, got.append)
    sent = sensor_bridge.run_camera(transport, None, ticks=3, camera=cam,
                                    sleep=lambda s: None)
    assert sent == 3 and len(got) == 3
    assert cam.reconnects == 1  # cascaded off the dead device once
    assert got[0][0].shape == (4, 4, 3)


def test_sensor_bridge_wav_replay_paces_at_file_rate(tmp_path):
    """Replay pacing must follow the wav's OWN framerate — a 16 kHz file
    paced at the 44.1 kHz constant would publish ~2.8x too fast, shrinking
    every recorded timegap."""
    import sys
    import wave

    sys.path.insert(0,
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import sensor_bridge
    from icra2021_multimodal_ad_tpu.data.acquisition import LocalTransport

    path = str(tmp_path / "b.wav")
    n = sensor_bridge.CHUNK_FRAMES * 3
    audio = np.zeros((n, 1), dtype=np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(audio.tobytes())

    sleeps = []
    sensor_bridge.run_mic(LocalTransport(), wav_path=path,
                          sleep=sleeps.append)
    assert sleeps and all(
        abs(s - sensor_bridge.CHUNK_FRAMES / 16000) < 1e-9 for s in sleeps)


def test_sensor_bridge_mic_wav_replay(tmp_path):
    import sys
    import wave

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import sensor_bridge
    from icra2021_multimodal_ad_tpu.data.acquisition import LocalTransport

    path = str(tmp_path / "a.wav")
    n = sensor_bridge.CHUNK_FRAMES * 5 + 100  # 5 full chunks + remainder
    audio = np.random.default_rng(0).integers(
        -3000, 3000, (n, 2)).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sensor_bridge.SAMPLE_RATE)
        f.writeframes(audio.tobytes())

    transport = LocalTransport()
    got = []
    transport.subscribe(sensor_bridge.MIC_TOPIC, got.append)
    sent = sensor_bridge.run_mic(transport, wav_path=path)
    assert sent == 5 == len(got)  # partial tail chunk dropped, as pyaudio would
    chunk_bytes = sensor_bridge.CHUNK_FRAMES * 2 * 2
    assert all(len(c[0]) == chunk_bytes for c in got)
    # chunks concatenate back to the original audio prefix
    cat = np.frombuffer(b"".join(c[0] for c in got), dtype=np.int16)
    np.testing.assert_array_equal(
        cat, audio[: 5 * sensor_bridge.CHUNK_FRAMES].ravel()
    )
