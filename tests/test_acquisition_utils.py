"""Acquisition layer: weight computation, episode recording round trip into
the ETL, sweep runner, reporter, VIB, loss registry."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.data.acquisition import (
    DataCollector,
    LocalTransport,
    compute_weight_grams,
)
from icra2021_multimodal_ad_tpu.utils.repeater import Repeater, convert, expand_grid
from icra2021_multimodal_ad_tpu.utils.reporter import Reporter


def test_compute_weight_grams():
    # ||dF|| * 1000 / 9.81, rounded to 0.1 (realtime_tester.py:69-80)
    assert compute_weight_grams([0, 0, 0], [0, 0, 9.81]) == pytest.approx(1000.0)
    assert compute_weight_grams([1, 2, 3], [1, 2, 3]) == 0.0
    with pytest.raises(ValueError):
        compute_weight_grams([0, 0], [0, 0, 1])


def test_episode_recording_feeds_etl(tmp_path):
    """Record a synthetic episode through the transport, then run the real
    ETL on the capture tree."""
    transport = LocalTransport()
    out = str(tmp_path)
    col = DataCollector(transport, out, "ep0000", start_time=0.0)
    rng = np.random.default_rng(0)

    t = 0.0
    drop_start = 2.0
    while t < 3.0:
        t = round(t + 0.05, 3)
        fz = 2.0 if t >= drop_start else 0.4  # force release at the drop
        transport.publish("/hsrb/wrist_wrench/raw", (0.0, 0.0, fz, t))
        if int(t * 100) % 10 == 0:  # 10 Hz frames
            transport.publish(
                "/camera/color/image_raw",
                (rng.uniform(0, 255, (24, 32, 3)), t),
            )
            transport.publish(
                "/hsrb/head_rgbd_sensor/depth_registered/image_rect_raw",
                (rng.uniform(0, 255, (24, 32)), t),
            )
            transport.publish("/hsrb/base_scan", (rng.uniform(0.2, 5, 30), t))
        transport.publish(
            "/snu/microphone_send",
            (rng.integers(-300, 300, 2048, dtype=np.int16).tobytes(), t),
        )
    col.recorder.mark_drop(drop_start, drop_start + 0.5)
    root = col.recorder.save()

    for f in ("depth.csv", "hand.csv", "LiDAR.csv", "hand_weight.csv",
              "Microphone.csv", "drop_time.csv"):
        assert os.path.exists(os.path.join(root, f))
    assert os.path.exists(os.path.join(root, "sound", "output.wav"))

    from icra2021_multimodal_ad_tpu.data.etl import process_episode

    df = process_episode(root, "ep0000", n_lidar=30)
    assert df["label"].sum() >= 4
    w = df["cur_hand_weight"].to_numpy()
    lab = df["label"].to_numpy()
    # release -> weight jump on labeled rows
    assert w[lab == 1].mean() > w[lab == 0].mean() + 50


def test_recorder_preserves_uint16_depth_frames(tmp_path):
    """Millimeter depth from the ROS 16UC1 decode path must survive save()
    as a true 16-bit PNG — a uint8 cast would wrap values mod 256."""
    from PIL import Image

    from icra2021_multimodal_ad_tpu.data.acquisition import EpisodeRecorder

    rec = EpisodeRecorder(str(tmp_path), "ep0", start_time=0.0)
    depth_mm = np.arange(500, 500 + 24 * 32, dtype=np.uint16).reshape(24, 32)
    rec.on_image("depth", depth_mm, t=0.1)
    rec.on_image("hand", np.full((24, 32, 3), 120, dtype=np.uint8), t=0.1)
    root = rec.save()

    back = np.asarray(Image.open(os.path.join(root, "img", "d", "1.png")))
    np.testing.assert_array_equal(back.astype(np.uint16), depth_mm)
    hand = np.asarray(Image.open(os.path.join(root, "img", "hand", "1.png")))
    assert hand.dtype == np.uint8 and hand.shape == (24, 32, 3)


def test_expand_grid_and_convert():
    grid = {"lr": [1e-3, 1e-4], "n_layers": [3, 5], "sensor": "All"}
    configs = expand_grid(grid, shuffle=False)
    assert len(configs) == 4
    assert configs[0]["sensor"] == "All"
    assert configs[0]["progress"] == 1
    assert convert("1,2,3") == [1, 2, 3]
    assert convert("7") == [7]
    assert convert(5) == [5]


def test_repeater_sequential():
    calls = []
    rep = Repeater({"a": [1, 2], "b": [10]}, lambda c: calls.append(c) or c["a"],
                   max_workers=1)
    out = rep.run()  # (config, result) pairs, parent-side aggregation
    assert sorted(r for _, r in out) == [1, 2]
    assert len(calls) == 2


def test_reporter_export(tmp_path):
    r = Reporter()
    r.add({"lr": 1e-3}, {"auroc": 0.9})
    r.add({"lr": 1e-4}, {"auroc": 0.8})
    path = str(tmp_path / "out.csv")
    r.export(path)
    lines = open(path).read().splitlines()
    assert lines[0] == "lr,auroc"
    assert len(lines) == 3

    # key EQUALITY enforced at add time — a same-size dict with different
    # keys would silently build ragged columns that crash export()
    with pytest.raises(AssertionError):
        r.add({"btl": 4}, {"auroc": 0.7})
    with pytest.raises(AssertionError):
        r.add({"lr": 1e-5}, {"f1": 0.7})


def test_checkpoint_digit_key_dicts_roundtrip(tmp_path):
    """Digit-string dict keys must not crash the load (only exact '0..N-1'
    key sets convert to lists); '.' in keys is rejected at save time."""
    import pytest

    from icra2021_multimodal_ad_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    path = str(tmp_path / "ck")
    save_checkpoint(path, {"w": np.ones(2)}, {},
                    extra={"per_epoch": {"5": 0.9, "10": 0.95}})
    _, _, meta = load_checkpoint(path)
    per = meta["extra"]["per_epoch"]
    assert isinstance(per, dict)
    assert float(per["5"]) == 0.9 and float(per["10"]) == 0.95

    with pytest.raises(ValueError, match="'.'"):
        save_checkpoint(str(tmp_path / "bad"), {"a.b": np.ones(1)}, {})


def test_checkpoint_refuses_unrelated_existing_directory(tmp_path):
    import pytest

    from icra2021_multimodal_ad_tpu.utils.checkpoint import save_checkpoint

    d = tmp_path / "notackpt"
    d.mkdir()
    (d / "something.txt").write_text("hi")
    with pytest.raises(ValueError, match="existing non-checkpoint"):
        save_checkpoint(str(d), {"w": np.ones(1)}, {})


def test_vib_modes():
    from icra2021_multimodal_ad_tpu.models.fc_module import (
        fc_module_init,
        fc_module_spec,
    )
    from icra2021_multimodal_ad_tpu.models.vib import vib_forward

    spec = fc_module_spec(6, 8, hidden_sizes=[7])
    params, state = fc_module_init(jax.random.PRNGKey(0), spec)
    x = jnp.ones((4, 6))

    out, _ = vib_forward(spec, params, state, x)  # identity mode
    assert out.shape == (4, 8)

    d, _ = vib_forward(spec, params, state, x, distribution="normal", k=3,
                       rng=jax.random.PRNGKey(1))
    assert d["z"].shape == (3, 4, 4)
    assert d["mu"].shape == (4, 4)

    # deterministic mode: z == mu broadcast
    d2, _ = vib_forward(spec, params, state, x, distribution="normal", k=2,
                        stochastic_inference=False)
    np.testing.assert_allclose(np.asarray(d2["z"][0]), np.asarray(d2["mu"]))

    with pytest.raises(ValueError):
        vib_forward(spec, params, state, x, distribution="normal", k=0)
    with pytest.raises(NotImplementedError):
        vib_forward(spec, params, state, x, distribution="laplace")


def test_loss_registry_matches_torch():
    import torch

    from icra2021_multimodal_ad_tpu.models.losses import loss_fn

    rng = np.random.default_rng(0)
    y_hat = rng.normal(size=(5, 4)).astype(np.float32)
    y = rng.normal(size=(5, 4)).astype(np.float32)
    for name, tfn in (
        ("mse", torch.nn.MSELoss(reduction="sum")),
        ("l1", torch.nn.L1Loss(reduction="sum")),
    ):
        ours = float(loss_fn(name, "sum")(jnp.asarray(y_hat), jnp.asarray(y)))
        ref = float(tfn(torch.from_numpy(y_hat), torch.from_numpy(y)))
        assert ours == pytest.approx(ref, rel=1e-5)

    logits = rng.normal(size=(6, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 6)
    ours = float(loss_fn("ce", "mean")(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(
        torch.nn.CrossEntropyLoss()(torch.from_numpy(logits),
                                    torch.from_numpy(labels))
    )
    assert ours == pytest.approx(ref, rel=1e-4)


def test_collector_detach_stops_recording():
    """Episode teardown: after detach() the recorder must not receive new
    messages (a collector left subscribed would double-record the next
    episode — review finding on the ROS collection loop)."""
    from icra2021_multimodal_ad_tpu.data.acquisition import (
        DataCollector,
        LocalTransport,
    )

    transport = LocalTransport()
    c = DataCollector(transport, "/tmp/unused", "ep0", start_time=0.0)
    transport.publish(DataCollector.TOPICS["force"], (1.0, 2.0, 3.0, 0.1))
    assert len(c.recorder.rows["hand_weight"]) == 1
    c.detach()
    transport.publish(DataCollector.TOPICS["force"], (1.0, 2.0, 3.5, 0.2))
    assert len(c.recorder.rows["hand_weight"]) == 1  # no longer recording
