"""Offline ETL: raw per-episode sensor captures -> aligned data_sum shards.

Capability parity with concatdata_maker.py:51-217 of the reference (the
newer of its two ETL variants): per episode, align depth / hand / LiDAR /
hand-weight streams onto a 10 Hz grid from `start_time = max(first
timegaps)` until `drop_start + 0.5`, label rows inside [drop_start,
drop_start + 0.5], extract 13-dim MFCC from the episode wav on the same
grid, emit the wide CSV, shard every `episodes_per_shard` (120), and
journal completed episodes to `last_folder.csv` for crash-resume.

Native redesign: the reference's per-stream linear scans with cursors
(concatdata_maker.py:64-105) become vectorized `searchsorted` lookups over
the whole grid at once; the MFCC pipeline is the device GEMM path in
ops/mfcc.py (the reference's librosa.load resample-to-22050 is reproduced
with polyphase decimation).
"""

from __future__ import annotations

import os
import wave
from typing import List, Optional

import numpy as np
import pandas as pd

from icra2021_multimodal_ad_tpu.data.synthetic import MFCC_COLS, _lidar_cols
from icra2021_multimodal_ad_tpu.ops.mfcc import mfcc_from_wave

DATA_FREQUENCY = 0.1  # 10 Hz grid (concatdata_maker.py:128)
DROP_DURATION = 0.5   # labeled window length (concatdata_maker.py:129)


def load_wav_mono_22050(path: str) -> np.ndarray:
    """Read a wav and downmix/resample to mono 22050 Hz, matching the
    contract of librosa.load's defaults used at concatdata_maker.py:18."""
    from scipy.signal import resample_poly

    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n_ch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    y = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    if n_ch > 1:
        y = y.reshape(-1, n_ch).mean(axis=1)
    if sr != 22050:
        g = np.gcd(sr, 22050)
        y = resample_poly(y, 22050 // g, sr // g).astype(np.float32)
    return y


def calc_time_bound(depth_t, lidar_t, weight_t) -> float:
    """start_time = max of stream starts, rounded to the grid
    (concatdata_maker.py:51-62)."""
    return round(max(depth_t[0], lidar_t[0], weight_t[0]), 1)


def align_stream(grid: np.ndarray, timegaps: np.ndarray,
                 frequency: float = DATA_FREQUENCY) -> np.ndarray:
    """For each grid time t, index of the first stream sample with
    t <= timegap <= t + frequency; -1 when none exists.  Vectorized
    equivalent of the reference's cursor scans (concatdata_maker.py:64-105)."""
    timegaps = np.asarray(timegaps, dtype=np.float64)
    idx = np.searchsorted(timegaps, grid, side="left")
    idx_c = np.clip(idx, 0, len(timegaps) - 1)
    ok = (idx < len(timegaps)) & (timegaps[idx_c] <= grid + frequency)
    return np.where(ok, idx_c, -1)


def process_episode(ep_dir: str, data_dir_item: str,
                    n_lidar: int = 963) -> pd.DataFrame:
    """Align one episode (concatdata_maker.py:112-174)."""
    df_depth = pd.read_csv(os.path.join(ep_dir, "depth.csv"))[1:]
    df_lidar = pd.read_csv(os.path.join(ep_dir, "LiDAR.csv"))[1:]
    df_hand = pd.read_csv(os.path.join(ep_dir, "hand.csv"))[1:]
    df_weight = pd.read_csv(os.path.join(ep_dir, "hand_weight.csv"))[1:]

    start = calc_time_bound(
        df_depth["timegap"].values, df_lidar["timegap"].values,
        df_weight["timegap"].values,
    )
    drop_path = os.path.join(ep_dir, "drop_time.csv")
    if os.path.exists(drop_path):
        df_drop = pd.read_csv(drop_path)
        drop_end, drop_start = df_drop.values[0][-2], df_drop.values[0][-1]
        end_t = drop_start + DROP_DURATION
    else:
        # normal (no-drop) episode — the anomaly detector's TRAINING data;
        # the reference only ever recorded drop episodes, so this extends
        # the grid to the last instant every aligned stream still covers,
        # with all labels 0
        drop_start = None
        end_t = min(
            df_depth["timegap"].values[-1], df_lidar["timegap"].values[-1],
            df_weight["timegap"].values[-1], df_hand["timegap"].values[-1],
        ) - DATA_FREQUENCY
    # grid: start, start+0.1, ... <= end bound (float-robust count)
    n_steps = int(np.floor((end_t - start) / DATA_FREQUENCY + 1e-9)) + 1
    if n_steps <= 0:
        raise ValueError(f"{data_dir_item}: streams too short for the grid")
    grid = np.round(start + DATA_FREQUENCY * np.arange(n_steps), 6)

    di = align_stream(grid, df_depth["timegap"].values)
    hi = align_stream(grid, df_hand["timegap"].values)
    li = align_stream(grid, df_lidar["timegap"].values)
    wi = align_stream(grid, df_weight["timegap"].values)
    for name, arr in (("depth", di), ("hand", hi), ("LiDAR", li), ("weight", wi)):
        if np.any(arr < 0):
            raise ValueError(
                f"{data_dir_item}: no {name} sample inside "
                f"[t, t+{DATA_FREQUENCY}] for some grid step"
            )

    lidar_rows = np.stack(
        [
            np.asarray(
                [float(v) for v in s[1:-1].split(",")], dtype=np.float32
            )[:n_lidar]
            for s in df_lidar["data"].values[li]
        ]
    )
    if drop_start is None:
        label = np.zeros(len(grid), dtype=int)
    else:
        label = ((grid >= drop_start)
                 & (grid <= drop_start + DROP_DURATION)).astype(int)

    # MFCC over the same 0.1 s grid (concatdata_maker.py:171-174): one frame
    # per grid step, taken from the episode wav.  Computed on the CPU
    # backend when one exists: the GEMMs are tiny (seconds of audio), but
    # the program jit-specializes on the wav LENGTH — every episode differs
    # by at least a sample, and one 20-120 s tunnel compile per episode
    # would dominate a reference-scale ETL run.  CPU compiles are <1 s, so
    # per-length specialization is harmless there; numerics are identical.
    y = load_wav_mono_22050(os.path.join(ep_dir, "sound", "output.wav"))
    try:
        import jax

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            mfcc = mfcc_from_wave(y, sr=22050)
    except RuntimeError:  # no cpu backend registered: use the default
        mfcc = mfcc_from_wave(y, sr=22050)
    mfcc = mfcc[: len(grid)]
    if len(mfcc) < len(grid):  # wav shorter than grid: pad with last frame
        pad = np.repeat(mfcc[-1:], len(grid) - len(mfcc), axis=0)
        mfcc = np.concatenate([mfcc, pad])

    out = {c: mfcc[:, k] for k, c in enumerate(MFCC_COLS)}
    out.update(
        {
            "now_timegap": grid,
            "cur_depth_id": df_depth["id"].values[di],
            "cur_hand_id": df_hand["id"].values[hi],
            "cur_hand_weight": df_weight["weight"].values[wi],
            "data_dir": data_dir_item,
        }
    )
    df = pd.DataFrame(out)
    for k, c in enumerate(_lidar_cols(n_lidar)):
        df[c] = lidar_rows[:, k]
    df["label"] = label
    return df


def hsr_preprocess(data_dir: str, out_dir: str,
                   episodes: Optional[List[str]] = None,
                   episodes_per_shard: int = 120,
                   n_lidar: int = 963,
                   resume: bool = True) -> List[str]:
    """Full ETL with sharding + crash-resume journal
    (concatdata_maker.py:108-217).  Returns the shard paths written.

    Crash-safety contract: each episode is APPENDED to its shard CSV first,
    then journaled to last_folder.csv.  A crash between the two leaves the
    episode in the shard but not in the journal; on resume the current shard
    is reconciled by dropping rows whose `data_dir` the journal never
    recorded, so no episode is ever duplicated.  Appends (rather than the
    reference's full rewrite per episode) keep I/O linear in the data."""
    os.makedirs(out_dir, exist_ok=True)
    journal_path = os.path.join(out_dir, "last_folder.csv")
    if episodes is None:
        episodes = sorted(os.listdir(data_dir))

    done: List[str] = []
    df_count = 0
    start_row = 0  # next row index within the current shard
    if resume and os.path.exists(journal_path):
        # dtype=str: numeric episode dir names ('0001') must round-trip
        # verbatim or the resume filter below matches nothing
        done = pd.read_csv(journal_path, dtype=str)["name"].tolist()
        done_set = set(done)
        episodes = [e for e in episodes if e not in done_set]
        df_count = len(done) // episodes_per_shard
        shard_path = os.path.join(out_dir, f"data_sum{df_count}.csv")
        if os.path.exists(shard_path):
            # data_dir as str: numeric episode names must match the journal
            origin = pd.read_csv(shard_path, index_col=0,
                                 dtype={"data_dir": str})
            # reconcile: drop rows of episodes the crash left unjournaled
            kept = origin["data_dir"].isin(done_set)
            if not kept.all():
                origin = origin[kept]
                origin.index = pd.RangeIndex(len(origin))
                origin.to_csv(shard_path, index_label="id")
            start_row = len(origin)
    elif os.path.exists(journal_path):
        os.remove(journal_path)  # fresh run: discard the stale journal

    written = []
    item_count = len(done) % episodes_per_shard
    shard_path = os.path.join(out_dir, f"data_sum{df_count}.csv")
    for name in episodes:
        ep = process_episode(os.path.join(data_dir, name, "data"), name,
                             n_lidar=n_lidar)
        ep.index = pd.RangeIndex(start_row, start_row + len(ep))
        first = start_row == 0
        ep.to_csv(shard_path, mode="w" if first else "a", header=first,
                  index_label="id")
        start_row += len(ep)
        if shard_path not in written:
            written.append(shard_path)

        item_count += 1
        if item_count >= episodes_per_shard:
            item_count = 0
            df_count += 1
            shard_path = os.path.join(out_dir, f"data_sum{df_count}.csv")
            start_row = 0

        # journal AFTER the shard write (see crash-safety contract above)
        new_journal = not os.path.exists(journal_path)
        pd.DataFrame({"name": [name]}).to_csv(
            journal_path, mode="w" if new_journal else "a",
            header=new_journal, index=False)
        done.append(name)

    return written


# ---------------------------------------------------------------------------
# Legacy ETL variant (datasets/data_preprocess.py:82-168)
# ---------------------------------------------------------------------------


def _legacy_mic_cols(n: int) -> List[str]:
    return [f"Mic{i:04d}" for i in range(n)]


def process_episode_legacy(ep_dir: str, data_dir_item: str,
                           n_lidar: int = 963) -> pd.DataFrame:
    """Align one episode in the OLDER schema
    (datasets/data_preprocess.py:82-168): an extra head-RGB stream
    (`rgb.csv` -> cur_rgb_id) and per-row microphone sample columns parsed
    from Microphone.csv's `data` lists (Mic0000..), instead of wav-derived
    MFCCs.  Differences from the live variant, kept for parity:

      * time bound: start = round(min over rgb/depth/LiDAR/weight/mic
        starts) + 1 s — the hand stream is excluded from the bound, exactly
        as in the reference (data_preprocess.py:22-37 passes five streams;
        the live variant uses max of starts instead).
      * grid still 10 Hz until drop_start + 0.5.

    The reference stores the mic COLUMN INDEX as the value of the first mic
    column ('Mic0000': mi_idx, data_preprocess.py:134-135 — a bug); this
    rebuild stores the sample value, i.e. the intended behavior
    (SURVEY.md §2 note on implementing intent, not bugs)."""
    df_rgb = pd.read_csv(os.path.join(ep_dir, "rgb.csv"))[1:]
    df_depth = pd.read_csv(os.path.join(ep_dir, "depth.csv"))[1:]
    df_lidar = pd.read_csv(os.path.join(ep_dir, "LiDAR.csv"))[1:]
    df_hand = pd.read_csv(os.path.join(ep_dir, "hand.csv"))[1:]
    df_weight = pd.read_csv(os.path.join(ep_dir, "hand_weight.csv"))[1:]
    df_mic = pd.read_csv(os.path.join(ep_dir, "Microphone.csv"))[1:]
    df_drop = pd.read_csv(os.path.join(ep_dir, "drop_time.csv"))
    drop_end, drop_start = df_drop.values[0][-2], df_drop.values[0][-1]

    start = round(min(
        df_rgb["timegap"].values[0], df_depth["timegap"].values[0],
        df_lidar["timegap"].values[0], df_weight["timegap"].values[0],
        df_mic["timegap"].values[0],
    ) + 1, 1)
    n_steps = int(np.floor((drop_start + DROP_DURATION - start)
                           / DATA_FREQUENCY + 1e-9)) + 1
    if n_steps <= 0:
        raise ValueError(f"{data_dir_item}: episode shorter than the legacy "
                         "start bound (min start + 1 s)")
    grid = np.round(start + DATA_FREQUENCY * np.arange(n_steps), 6)

    ri = align_stream(grid, df_rgb["timegap"].values)
    di = align_stream(grid, df_depth["timegap"].values)
    hi = align_stream(grid, df_hand["timegap"].values)
    li = align_stream(grid, df_lidar["timegap"].values)
    wi = align_stream(grid, df_weight["timegap"].values)
    mi = align_stream(grid, df_mic["timegap"].values)
    for name, arr in (("rgb", ri), ("depth", di), ("hand", hi),
                      ("LiDAR", li), ("weight", wi), ("mic", mi)):
        if np.any(arr < 0):
            raise ValueError(
                f"{data_dir_item}: no {name} sample inside "
                f"[t, t+{DATA_FREQUENCY}] for some grid step"
            )

    def parse_rows(series, idx, width=None):
        rows = [np.asarray([float(v) for v in s[1:-1].split(",")],
                           dtype=np.float32)
                for s in series.values[idx]]
        if width is not None:
            rows = [r[:width] for r in rows]
        return np.stack(rows)

    lidar_rows = parse_rows(df_lidar["data"], li, width=n_lidar)
    mic_rows = parse_rows(df_mic["data"], mi)

    label = ((grid >= drop_start)
             & (grid <= drop_start + DROP_DURATION)).astype(int)

    out = {
        "now_timegap": grid,
        "cur_rgb_id": df_rgb["id"].values[ri],
        "cur_depth_id": df_depth["id"].values[di],
        "cur_hand_id": df_hand["id"].values[hi],
        "cur_hand_weight": df_weight["weight"].values[wi],
        "data_dir": data_dir_item,
    }
    df = pd.DataFrame(out)
    for k, c in enumerate(_lidar_cols(n_lidar)):
        df[c] = lidar_rows[:, k]
    for k, c in enumerate(_legacy_mic_cols(mic_rows.shape[1])):
        df[c] = mic_rows[:, k]
    df["label"] = label
    return df


def hsr_preprocess_legacy(data_dir: str, out_path: str,
                          episodes: Optional[List[str]] = None,
                          n_lidar: int = 963) -> str:
    """Legacy full ETL (data_preprocess.py:82-168): every episode appended
    into ONE data_sum.csv at `out_path` (the legacy variant neither shards
    nor journals)."""
    if episodes is None:
        episodes = sorted(os.listdir(data_dir))
    frames = [
        process_episode_legacy(os.path.join(data_dir, name, "data"), name,
                               n_lidar=n_lidar)
        for name in episodes
    ]
    df = pd.concat(frames, ignore_index=True)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    df.to_csv(out_path, index_label="id")
    print("hsr dataset : data_sum.csv made")
    return out_path


# ---------------------------------------------------------------------------
# Earliest prototype variant (youngjae/preprocess/make_timesync_csv_file.py)
# ---------------------------------------------------------------------------


def make_timesync_frames(ep_dir: str, out_path: Optional[str] = None,
                         n_lidar: Optional[int] = None) -> pd.DataFrame:
    """Frame-driven time sync — the reference's earliest prototype
    (youngjae/preprocess/make_timesync_csv_file.py:13-62): instead of a
    fixed 10 Hz grid, every RGB frame defines its own window
    [timegap, next_timegap), and the first depth / LiDAR / weight sample
    inside each window is attached.  Emits (now_timegap, next_timegap,
    cur_rgb_id, cur_depth_id, LiDAR columns, cur_hand_weight); no labels —
    the prototype predates drop annotation.

    Windows with no sample in some stream are dropped (the prototype's
    linear scans returned None there and wrote NaN rows)."""
    df_rgb = pd.read_csv(os.path.join(ep_dir, "rgb.csv"))[1:]
    df_depth = pd.read_csv(os.path.join(ep_dir, "depth.csv"))[1:]
    df_lidar = pd.read_csv(os.path.join(ep_dir, "LiDAR.csv"))[1:]
    df_weight = pd.read_csv(os.path.join(ep_dir, "hand_weight.csv"))[1:]

    rgb_t = df_rgb["timegap"].values.astype(np.float64)
    rgb_id = df_rgb["id"].values
    now_t, next_t = rgb_t[:-1], rgb_t[1:]

    def first_in_window(timegaps):
        tg = np.asarray(timegaps, dtype=np.float64)
        idx = np.searchsorted(tg, now_t, side="left")
        idx_c = np.clip(idx, 0, len(tg) - 1)
        ok = (idx < len(tg)) & (tg[idx_c] <= next_t)
        return np.where(ok, idx_c, -1)

    di = first_in_window(df_depth["timegap"].values)
    li = first_in_window(df_lidar["timegap"].values)
    wi = first_in_window(df_weight["timegap"].values)
    keep = (di >= 0) & (li >= 0) & (wi >= 0)

    lidar_rows = np.stack([
        np.asarray([float(v) for v in s[1:-1].split(",")], dtype=np.float32)
        for s in df_lidar["data"].values[li[keep]]
    ])
    if n_lidar is not None:
        lidar_rows = lidar_rows[:, :n_lidar]

    out = pd.DataFrame({
        "now_timegap": now_t[keep],
        "next_timegap": next_t[keep],
        "cur_rgb_id": rgb_id[:-1][keep],
        "cur_depth_id": df_depth["id"].values[di[keep]],
        "cur_hand_weight": df_weight["weight"].values[wi[keep]],
    })
    for k, c in enumerate(_lidar_cols(lidar_rows.shape[1])):
        out[c] = lidar_rows[:, k]
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        out.to_csv(out_path, index_label="id")
    return out
