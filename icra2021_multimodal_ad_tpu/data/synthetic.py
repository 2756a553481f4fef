"""Synthetic sensor-data generators — the fake-robot backend.

The reference can only be exercised against a private robot dataset and a
live HSR robot (SURVEY.md §4: "no fake backend, no mock").  This module
provides both missing layers:

  * `generate_raw_episodes`: per-episode raw capture trees exactly shaped
    like the robot collector's output (data_collect_experiment/
    main_for_data_collect.py:260-336): depth.csv / hand.csv / LiDAR.csv /
    hand_weight.csv / Microphone.csv / drop_time.csv / sound/output.wav /
    img/{hand,d}/<id>.png — the ETL's input contract.
  * `generate_data_sum_shards`: already-aligned `data_sum{N}.csv` shards in
    the exact schema of the reference's ETL output (concatdata_maker.py
    emits: id, mfcc00-12, cur_depth_id, cur_hand_id, cur_hand_weight,
    data_dir, now_timegap, LiDAR000-962, label) plus the per-row PNGs the
    dataset loader dereferences.

Both inject a controllable anomaly signature on labeled rows (hand-weight
drop, audio burst, image brightness jump) so end-to-end AUROC is a
meaningful statistic rather than coin-flip noise.
"""

from __future__ import annotations

import os
import wave
from typing import List

import numpy as np
import pandas as pd

MFCC_COLS = [f"mfcc{i:02d}" for i in range(13)]


def _lidar_cols(n: int) -> List[str]:
    return [f"LiDAR{i:03d}" for i in range(n)]


def _write_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def jittered_clock(rng: np.random.Generator, hz: float, start: float,
                   duration_s: float) -> np.ndarray:
    """Jittered sensor timestamps: uniform intervals in [0.70/hz, 0.95/hz],
    so inter-sample gaps stay strictly under the 0.1 s ETL alignment window
    (every 10 Hz grid step is guaranteed a sample).  Shared by the raw-episode
    generator and the scripted pick-place driver so the two fake-robot
    backends emit the same clock distribution."""
    t = start + np.cumsum(
        rng.uniform(0.70 / hz, 0.95 / hz, int(duration_s * hz * 1.6))
    )
    return t[t < duration_s]


def drop_burst_audio(rng: np.random.Generator, duration_s: float, sr: int,
                     drop_t: float | None = None) -> np.ndarray:
    """Stereo int16 audio: N(0, 300) noise floor with a 0.1 s N(0, 8000)
    burst at the drop instant — the audible signature the MFCC path must
    detect.  Returns an (n, 2) int16 array.  A drop instant outside the
    clip is clamped into it (a negative/oversized index previously crashed
    on mismatched broadcast shapes or silently wrapped)."""
    n = int(duration_s * sr)
    audio = rng.normal(0, 300, n)
    if drop_t is not None:
        d0 = min(max(int(drop_t * sr), 0), max(n - sr // 10, 0))
        burst = min(sr // 10, n - d0)
        if burst > 0:
            audio[d0: d0 + burst] += rng.normal(0, 8000, burst)
    mono = np.clip(audio, -32768, 32767).astype(np.int16)
    return np.repeat(mono[:, None], 2, axis=1)


def generate_data_sum_shards(
    root: str,
    n_episodes: int = 8,
    steps_per_episode: int = 40,
    n_shards: int = 2,
    n_lidar: int = 963,
    image_hw=(24, 32),
    seed: int = 0,
    write_images: bool = True,
    anomaly_scale: float = 1.0,
    vary_severity: bool = False,
) -> List[str]:
    """Write data_sum{0..n_shards-1}.csv (+ per-row PNGs) under `root`.

    Each episode is a 10 Hz window sequence; the last 5 steps are labeled 1
    (drop) with an injected multimodal anomaly signature, mirroring the
    0.5 s drop window of the ETL (concatdata_maker.py:156-161).

    anomaly_scale scales every anomaly delta (audio burst, weight drop,
    brightness jump) relative to the unchanged sensor noise;
    vary_severity additionally draws a per-row severity ~ U(0.25, 1)
    multiplying the scale, so some drop rows are barely distinguishable
    from normal ones.  Together they turn the default (saturated,
    AUROC = 1.0 for any sane scorer) task into one whose expected AUROCs
    sit strictly inside (0.5, 1.0) — the bench's regression-sensitive
    probe (VERDICT r4 weak #2).  The DEFAULTS reproduce the historical
    generator bit-for-bit: no new rng draw happens unless vary_severity
    is set, so feature caches / golden fixtures keyed on the default
    stream are unaffected.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    h, w = image_hw

    rows = []
    for ep in range(n_episodes):
        data_dir = f"ep{ep:04d}"
        base_brightness = rng.uniform(80, 160)
        weight0 = rng.uniform(150, 250)
        for step in range(steps_per_episode):
            label = 1 if step >= steps_per_episode - 5 else 0
            anomaly = label == 1
            sev = 0.0
            if anomaly:
                sev = anomaly_scale * (rng.uniform(0.25, 1.0)
                                       if vary_severity else 1.0)
            mfcc = rng.normal(-30, 5, 13)
            mfcc[0] = rng.normal(-250, 20)
            if anomaly:
                mfcc += rng.normal(25, 5, 13) * sev  # audio burst
            weight = weight0 + rng.normal(0, 2)
            if anomaly:
                weight -= rng.uniform(100, 180) * sev  # object dropped
            row = {
                "id": step,
                **{c: v for c, v in zip(MFCC_COLS, mfcc)},
                "cur_depth_id": step,
                "cur_hand_id": step,
                "cur_hand_weight": weight,
                "data_dir": data_dir,
                "now_timegap": round(1.0 + 0.1 * step, 1),
                **{
                    c: v
                    for c, v in zip(
                        _lidar_cols(n_lidar), rng.uniform(0.2, 5.0, n_lidar)
                    )
                },
                "label": label,
            }
            rows.append(row)

            if write_images:
                bright = base_brightness + (60 * sev if anomaly else 0)
                hand = np.clip(
                    rng.normal(bright, 25, (h, w, 3)), 0, 255
                )
                depth = np.clip(
                    rng.normal(bright * 0.6 + (40 * sev if anomaly else 0),
                               20, (h, w)),
                    0, 255,
                )
                img_root = os.path.join(root, "data", data_dir, "data", "img")
                _write_png(os.path.join(img_root, "hand", f"{step}.png"), hand)
                _write_png(os.path.join(img_root, "d", f"{step}.png"), depth)

    df = pd.DataFrame(rows)
    paths = []
    shards = np.array_split(np.arange(len(df)), n_shards)
    for i, idx in enumerate(shards):
        path = os.path.join(root, f"data_sum{i}.csv")
        df.iloc[idx].to_csv(path, index=False)
        paths.append(path)
    return paths


def generate_raw_episodes(
    root: str,
    n_episodes: int = 2,
    duration_s: float = 4.0,
    sr: int = 44100,
    n_lidar: int = 963,
    seed: int = 0,
    image_hw=(24, 32),
) -> List[str]:
    """Write raw per-episode capture trees under `<root>/data/<episode>/data/`
    in the robot collector's layout, for driving the ETL end-to-end."""
    if duration_s < 2.0:
        raise ValueError(
            "generate_raw_episodes needs duration_s >= 2.0 (the drop "
            "window [duration-1, duration-0.5] must fit after the stream "
            "start bound)"
        )
    rng = np.random.default_rng(seed)
    episodes = []
    for ep in range(n_episodes):
        name = f"ep{ep:04d}"
        ep_dir = os.path.join(root, "data", name, "data")
        os.makedirs(os.path.join(ep_dir, "sound"), exist_ok=True)

        drop_start = round(duration_s - 1.0, 1)
        drop_end = round(drop_start + 0.5, 1)

        # jittered sensor clocks (see jittered_clock: intervals < the 0.1 s
        # alignment window so every grid step finds a sample)
        def clock(hz, start):
            return jittered_clock(rng, hz, start, duration_s)

        # depth / hand cameras ~ 10 Hz with frame ids; frames after the
        # drop brighten (the image-channel anomaly signature the module
        # docstring promises — without it, image-sensor AUROC on this data
        # would be coin-flip noise; same signature as orchestration's
        # pick-place driver)
        for sub, stream in (("d", "depth"), ("hand", "hand")):
            t = clock(10, 0.05)
            ids = np.arange(1, len(t) + 1)
            pd.DataFrame(
                {"time": t, "id": ids, "timegap": t}
            ).to_csv(os.path.join(ep_dir, f"{stream}.csv"))
            for i, ti in zip(ids, t):
                h, w = image_hw
                shape = (h, w, 3) if sub == "hand" else (h, w)
                bright = 180 if ti >= drop_start else 120
                _write_png(
                    os.path.join(ep_dir, "img", sub, f"{i}.png"),
                    np.clip(rng.normal(bright, 30, shape), 0, 255),
                )

        # LiDAR ~ 10 Hz, data as a stringified float list
        t = clock(10, 0.08)
        scans = [
            "[" + ",".join(f"{v:.3f}" for v in rng.uniform(0.2, 5.0, n_lidar)) + "]"
            for _ in t
        ]
        pd.DataFrame({"data": scans, "time": t, "timegap": t}).to_csv(
            os.path.join(ep_dir, "LiDAR.csv")
        )

        # wrist force -> weight ~ 50 Hz; drop signature after drop_start
        t = clock(50, 0.02)
        weight = np.where(
            t >= drop_start,
            rng.normal(40, 3, len(t)),
            rng.normal(210, 3, len(t)),
        )
        pd.DataFrame(
            {"datetime": t, "timegap": t, "weight": np.round(weight, 1)}
        ).to_csv(os.path.join(ep_dir, "hand_weight.csv"))

        # microphone chunk log (timegap only; audio lives in the wav)
        t = clock(43, 0.01)
        pd.DataFrame(
            {"data": ["[]"] * len(t), "time": t, "timegap": t}
        ).to_csv(os.path.join(ep_dir, "Microphone.csv"))

        pd.DataFrame(
            [{"drop_end": drop_end, "drop_start": drop_start}]
        ).to_csv(os.path.join(ep_dir, "drop_time.csv"))

        # stereo int16 wav with a burst at the drop
        stereo = drop_burst_audio(rng, duration_s, sr, drop_start)
        with wave.open(os.path.join(ep_dir, "sound", "output.wav"), "wb") as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(stereo.tobytes())

        episodes.append(name)
    return episodes
