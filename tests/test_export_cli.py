"""export.py CLI: StableHLO artifact packaging — manifest contents,
round-trip verification, guard wiring, and the nap-ops flag surface."""

import json
import sys

import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
from icra2021_multimodal_ad_tpu.ops.scoring import (
    concat_diffs,
    nap_fit,
    save_nap_stats,
)
from icra2021_multimodal_ad_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A small checkpoint + persisted NAP stats on disk (what the train
    CLI writes), shared by the export tests."""
    root = tmp_path_factory.mktemp("export")
    cfg = Config(sensor="force_torque", n_layers=2, btl_size=6, verbose=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(0)
    xfit = rng.normal(0, 1, (128, cfg.input_size)).astype(np.float32)
    stats = nap_fit(concat_diffs(get_diffs(xfit, model, params, state)))
    ckpt = save_checkpoint(str(root / "model"), params, state, config=cfg)
    save_nap_stats(str(root / "stats.npz"), stats)
    return root, ckpt, str(root / "stats.npz"), cfg


def _run(argv):
    import export as export_cli

    old = sys.argv
    sys.argv = ["export.py"] + argv
    try:
        export_cli.main()
    finally:
        sys.argv = old


def test_export_cli_writes_verified_artifacts_and_manifest(trained,
                                                           tmp_path):
    root, ckpt, stats_path, cfg = trained
    out = tmp_path / "art"
    _run(["--saved_name", ckpt, "--train_diffs", stats_path,
          "--sensor", "force_torque", "--out_dir", str(out),
          "--batch_size", "32", "--ops", "base,nap_windows,nap"])
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["input_size"] == cfg.input_size
    assert set(manifest["artifacts"]) == {"base", "nap_windows", "nap"}
    for op, entry in manifest["artifacts"].items():
        blob_path = out / entry["path"]
        assert blob_path.stat().st_size == entry["bytes"] > 0
        # every artifact (nap included, vs serving.score_nap) round-trips
        # through deserialization and agrees with the live bundle
        assert entry["verify_mean_rel_vs_live"] <= 1e-2
        assert entry["compute_dtype"] == "float32"

    # the artifact is loadable standalone and scores the right shape
    from icra2021_multimodal_ad_tpu.ops.serving import load_scorer

    scorer = load_scorer(str(out / manifest["artifacts"]["base"]["path"]))
    x = np.random.default_rng(1).normal(
        0, 1, (32, cfg.input_size)).astype(np.float32)
    s = np.asarray(scorer(x))
    assert s.shape == (32,) and np.isfinite(s).all()


def test_export_cli_guard_certifies_low_precision(trained, tmp_path):
    root, ckpt, stats_path, cfg = trained
    out = tmp_path / "art8"
    _run(["--saved_name", ckpt, "--train_diffs", stats_path,
          "--sensor", "force_torque", "--out_dir", str(out),
          "--batch_size", "32", "--ops", "nap_windows",
          "--nap_quant", "int8", "--guard_tol", "0.25"])
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["nap_quant"] == "int8"
    assert 0 <= manifest["guard_rel_err"] <= 0.25

    # a tolerance the int8 path cannot meet refuses to export anything
    out2 = tmp_path / "art8strict"
    with pytest.raises(ValueError, match="rel err"):
        _run(["--saved_name", ckpt, "--train_diffs", stats_path,
              "--sensor", "force_torque", "--out_dir", str(out2),
              "--batch_size", "32", "--ops", "nap_windows",
              "--nap_quant", "int8", "--guard_tol", "1e-12"])
    assert not (out2 / "manifest.json").exists()


def test_export_cli_sensor_ops_custom_resolution(tmp_path):
    """--sensor_h/--sensor_w bake full-resolution frame shapes into the
    *_sensor artifact (normalize_mods resizes on device), and the manifest
    records them under the distinct `sensor_input_shapes` key so window-op
    consumers reading input_shape[1] can never misparse a sensor entry."""
    cfg = Config(sensor="All", n_layers=2, btl_size=16, verbose=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    ckpt = save_checkpoint(str(tmp_path / "model"), params, state,
                           config=cfg)
    out = tmp_path / "sens"
    _run(["--saved_name", ckpt, "--sensor", "All", "--out_dir", str(out),
          "--batch_size", "4", "--ops", "base_sensor",
          "--sensor_h", "48", "--sensor_w", "40"])
    manifest = json.loads((out / "manifest.json").read_text())
    assert "sensor_input_shapes" in manifest["shape_schema"]
    entry = manifest["artifacts"]["base_sensor"]
    assert entry["sensor_input_shapes"] == [
        [4, 3, 48, 40], [4, 1, 48, 40], [4, 1], [4, 1, 13]]
    assert "input_shape" not in entry
    assert entry["verify_mean_rel_vs_live"] <= 1e-2


def test_export_cli_sensor_op_rejects_non_all_checkpoint(trained, tmp_path):
    """--ops base_sensor with --sensor All but a non-All checkpoint: the
    reconciled config (checkpoint wins) must fail with the argparse
    diagnostic, not a raw ValueError from export_sensor_scorer."""
    root, ckpt, stats_path, cfg = trained
    with pytest.raises(SystemExit):
        _run(["--saved_name", ckpt, "--sensor", "All",
              "--out_dir", str(tmp_path / "bad"), "--ops", "base_sensor"])
    assert not (tmp_path / "bad" / "manifest.json").exists()


def test_export_cli_flag_errors(trained, tmp_path):
    root, ckpt, stats_path, cfg = trained
    with pytest.raises(SystemExit):  # nap export without stats
        _run(["--saved_name", ckpt, "--sensor", "force_torque",
              "--out_dir", str(tmp_path / "x"), "--ops", "nap_windows"])
    with pytest.raises(SystemExit):  # guard on an exact-fp32 bundle
        _run(["--saved_name", ckpt, "--train_diffs", stats_path,
              "--sensor", "force_torque",
              "--out_dir", str(tmp_path / "y"), "--ops", "base",
              "--guard_tol", "0.1"])
    with pytest.raises(SystemExit):  # unknown op
        _run(["--saved_name", ckpt, "--train_diffs", stats_path,
              "--sensor", "force_torque",
              "--out_dir", str(tmp_path / "z"), "--ops", "sap"])
