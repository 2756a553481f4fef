"""End-to-end: synthetic data_sum shards -> loaders -> train -> BASE/SAP/NAP.

This is the minimum end-to-end slice of SURVEY.md §7 plus the full 'All'
multimodal path, exercised entirely through the public entry-point API.
The injected anomaly signature must be detected (AUROC well above chance).
"""

import os

import numpy as np
import pytest

from icra2021_multimodal_ad_tpu.config import Config, get_input_size
from icra2021_multimodal_ad_tpu.data.dataset import get_loaders
from icra2021_multimodal_ad_tpu.data.synthetic import generate_data_sum_shards
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.train import NoveltyDetecter
from icra2021_multimodal_ad_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hsr_synth"))
    generate_data_sum_shards(
        root, n_episodes=10, steps_per_episode=40, n_shards=2,
        n_lidar=963, seed=0,
    )
    return root


def _config(data_root, sensor, **kw):
    kw.setdefault("n_epochs", 25)  # enough for the AE to learn the manifold
    kw.setdefault("lr", 3e-3)
    cfg = Config(
        sensor=sensor,
        data_folder_name=data_root,
        slicing_size=400,
        batch_size=64,
        n_layers=3,
        btl_size=10,
        verbose=0,
        seed=0,
        **kw,
    )
    return cfg.replace(input_size=get_input_size(cfg))


def test_force_torque_minimal_slice(data_root, tmp_path):
    """SURVEY.md §7 minimum slice: force_torque (64-dim), CSV -> train ->
    diffs -> BASE/SAP/NAP."""
    cfg = _config(data_root, "force_torque")
    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)
    test_x, test_y = manager.get_transformed_data(test_l)
    assert train_x.shape[1] == 64

    det = NoveltyDetecter(cfg)
    result = det.train(model, params, state, train_x, valid_x)
    assert len(result.train_history) == cfg.n_epochs
    # training reduces loss
    assert result.train_history[-1] < result.train_history[0]

    base, sap, nap = det.test(
        model, result.params, result.state, train_x, valid_x, test_x, test_y,
        save_stats_path=str(tmp_path / "td.npz"),
    )
    # the weight-drop signature is near-deterministic -> near-perfect scores
    assert base.auroc > 0.9
    assert sap.auroc > 0.9
    assert nap.auroc > 0.9


def test_all_sensor_multimodal_path(data_root, tmp_path):
    cfg = _config(data_root, "All", n_epochs=10)
    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)
    test_x, test_y = manager.get_transformed_data(test_l)
    assert train_x.shape[1] == 1728

    det = NoveltyDetecter(cfg)
    result = det.train(model, params, state, train_x, valid_x)
    base, sap, nap = det.test(
        model, result.params, result.state, train_x, valid_x, test_x, test_y,
        save_stats_path=str(tmp_path / "td.npz"),
    )
    assert nap.auroc > 0.85
    assert np.isfinite([base.aupr, sap.aupr, nap.aupr]).all()


def test_data_parallel_training_on_mesh(data_root):
    """Same pipeline with the batch sharded over an 8-device CPU mesh."""
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    cfg = _config(data_root, "force_torque", n_epochs=4)
    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)

    mesh = get_mesh(8)
    det = NoveltyDetecter(cfg, mesh=mesh)
    result = det.train(model, params, state, train_x, valid_x)
    assert result.train_history[-1] < result.train_history[0]

    # the fused whole-run program and the per-epoch loop are the same op
    # sequence -> near-bitwise agreement, sharded or not
    model2, params2, state2 = get_model(cfg)
    result2 = NoveltyDetecter(cfg, mesh=mesh).train(
        model2, params2, state2, train_x, valid_x, fused=False
    )
    np.testing.assert_allclose(
        result.valid_history, result2.valid_history, rtol=1e-5
    )

    # single-device run from the same init: same math but a different
    # reduction topology (psum vs flat sum); Adam's eps-normalized updates
    # amplify those LSB differences, so the comparison is necessarily loose
    det1 = NoveltyDetecter(cfg, mesh=None)
    model1, params1, state1 = get_model(cfg)
    result1 = det1.train(model1, params1, state1, train_x, valid_x)
    np.testing.assert_allclose(
        result.valid_history, result1.valid_history, rtol=1e-1
    )


def test_sharded_eval_matches_single_device(data_root):
    """BASE/SAP/NAP reports from the mesh-sharded scoring path (sharded RaPP
    diffs + all-gather-before-SVD NAP fit, SURVEY.md §5) must be numerically
    identical (fp32 tol) to the single-device path on the same data.  Row
    counts here are NOT divisible by 8, so the padding path is exercised."""
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    cfg = _config(data_root, "force_torque", n_epochs=3)
    cfg = cfg.replace(batch_size=37)
    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)
    test_x, test_y = manager.get_transformed_data(test_l)
    assert train_x.shape[0] % 8 != 0  # padding must engage

    det1 = NoveltyDetecter(cfg)
    result = det1.train(model, params, state, train_x, valid_x)
    r1 = det1.test(model, result.params, result.state,
                   train_x, valid_x, test_x, test_y)

    det8 = NoveltyDetecter(cfg, mesh=get_mesh(8))
    r8 = det8.test(model, result.params, result.state,
                   train_x, valid_x, test_x, test_y)

    for single, sharded, tag in zip(r1, r8, ("base", "sap", "nap")):
        np.testing.assert_allclose(
            sharded.score, single.score, rtol=1e-5, atol=1e-6,
            err_msg=f"{tag} scores diverge between mesh and single device",
        )
        np.testing.assert_allclose(
            [sharded.auroc, sharded.aupr, sharded.f1],
            [single.auroc, single.aupr, single.f1],
            atol=1e-6, equal_nan=True, err_msg=tag,
        )


def test_novelty_ratio_rebalance_matches_reference_semantics():
    """get_balance (data_loaders.py:31-48): subsample the over-represented
    side toward the target anomaly ratio, seeded."""
    from icra2021_multimodal_ad_tpu.data.dataset import get_balance

    seen = list(range(100))        # normals
    unseen = list(range(100, 110))  # 10 anomalies -> current ratio ~0.09
    s, u = get_balance(seen, unseen, novelty_ratio=0.5, seed=0)
    assert u == unseen
    assert len(s) == int(10 / 0.5 - 10) == 10  # seen subsampled to parity
    assert set(s) <= set(seen)
    # seeded: same call -> same subsample
    s2, _ = get_balance(seen, unseen, novelty_ratio=0.5, seed=0)
    assert s == s2

    # over-represented anomalies: unseen side shrinks instead
    s3, u3 = get_balance(list(range(10)), list(range(10, 110)),
                         novelty_ratio=0.5, seed=0)
    assert s3 == list(range(10)) and len(u3) == 10

    # ratio 0 disables rebalancing (the CLI default)
    assert get_balance(seen, unseen, 0.0) == (seen, unseen)


def test_registry_file_name_with_extension_resolves(data_root):
    """The registry writes file_name='data_sum.csv' (data_config.json);
    the shard resolver must not build 'data_sum.csv0.csv'."""
    from icra2021_multimodal_ad_tpu.data.dataset import _shard_paths

    cfg = Config(sensor="force_torque", data_folder_name=data_root,
                 file_name="data_sum.csv")
    paths = _shard_paths(cfg)
    assert paths and all(p.endswith(".csv") for p in paths)
    assert not any(".csv0.csv" in p for p in paths)


def test_single_ratio_loaders_and_balance_guards(data_root):
    """ratios=[1.0] yields ONE loader over everything (FullTest.py:179
    semantics), and get_balance degenerate inputs don't empty the split."""
    import pytest

    from icra2021_multimodal_ad_tpu.data.dataset import (
        TabularDatasetManager,
        get_balance,
    )

    cfg = Config(sensor="force_torque", data_folder_name=data_root,
                 slicing_size=100, seed=0)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    mgr = TabularDatasetManager(cfg)
    loaders = mgr.get_loaders(batch_size=32, ratios=[1.0])
    assert len(loaders) == 1
    x, y = mgr.get_transformed_data(loaders[0])
    assert len(x) == mgr.total_size

    assert get_balance([], [1, 2], 0.5) == ([], [1, 2])
    assert get_balance([1, 2], [], 0.5) == ([1, 2], [])
    with pytest.raises(ValueError, match="novelty_ratio"):
        get_balance([1], [2], 1.0)


def test_unimodal_normal_inverts_labels():
    """--unimodal_normal flips the positive class (novelty_detection.py:
    31-34: the target class becomes the NORMAL side)."""
    from icra2021_multimodal_ad_tpu.config import Config
    from icra2021_multimodal_ad_tpu.train import binarize_labels

    y = np.array([0, 1, 1, 0])
    cfg = Config(target_class=1)
    np.testing.assert_array_equal(binarize_labels(cfg, y),
                                  [False, True, True, False])
    np.testing.assert_array_equal(
        binarize_labels(cfg.replace(unimodal_normal=True), y),
        [True, False, False, True])


def test_layer_window_slicing_changes_sap_inputs():
    """start/end_layer_index select a contiguous diff window
    (utils/metric.py:150-156 slicing semantics): SAP over layers [1:3)
    must equal SAP computed manually on just those diffs."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.ops.scoring import concat_diffs, get_d_loss

    rng = np.random.default_rng(0)
    diffs = tuple(jnp.asarray(rng.normal(size=(20, d)), jnp.float32)
                  for d in (8, 6, 4, 2))
    label = rng.integers(0, 2, 20).astype(bool)
    rep = get_d_loss(diffs, diffs, diffs, label,
                     start_layer_index=1, end_layer_index=3)
    cat = np.asarray(concat_diffs(diffs, 1, 3))
    assert cat.shape[1] == 6 + 4
    manual = (cat ** 2).mean(axis=1)
    np.testing.assert_allclose(np.asarray(rep.score), manual, rtol=1e-6)


def test_object_select_mode_filters_episodes(data_root):
    """objectsplit.csv per-object-type episode filter
    (utils/data_loaders.py:261-276: keep rows whose data_dir is listed in
    the object_type column, 'book only mode')."""
    import pandas as pd

    book_eps = ["ep0000", "ep0002", "ep0005"]
    bottle_eps = ["ep0001", "ep0003"]
    pd.DataFrame({"book": book_eps, "bottle": bottle_eps + [None]}).to_csv(
        os.path.join(data_root, "objectsplit.csv"), index=False
    )

    from icra2021_multimodal_ad_tpu.data.dataset import TabularDataset

    cfg = _config(data_root, "force_torque").replace(
        object_select_mode=True, object_type="book"
    )
    ds = TabularDataset(cfg)
    kept = set(ds.df["data_dir"].unique())
    assert kept == set(book_eps)
    assert len(ds) == ds.df.shape[0] > 0

    cfg2 = cfg.replace(object_type="bottle")
    ds2 = TabularDataset(cfg2)
    assert set(ds2.df["data_dir"].unique()) == set(bottle_eps)

    # full loader pipeline over the filtered view still trains/splits
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    x, y = manager.get_transformed_data(test_l)
    assert len(x) > 0 and set(np.unique(np.asarray(y))) <= {0.0, 1.0}


def test_checkpoint_roundtrip(data_root, tmp_path):
    cfg = _config(data_root, "force_torque")
    model, params, state = get_model(cfg)
    path = save_checkpoint(str(tmp_path / "m"), params, state, config=cfg)
    p2, s2, meta = load_checkpoint(path)
    assert meta["config"]["sensor"] == "force_torque"

    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the tree STRUCTURE must round-trip too: the last encoder layer has an
    # empty state dict (no BN) which must not be dropped
    empty = lambda x: isinstance(x, dict) and not x  # noqa: E731
    assert jax.tree.structure(state, is_leaf=empty) == \
        jax.tree.structure(s2, is_leaf=empty)
    assert len(s2["encoder"]) == len(state["encoder"])


def test_cli_main(data_root, tmp_path, monkeypatch):
    """Drive the novelty_detection.py entry point end-to-end."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import novelty_detection as nd

    monkeypatch.chdir(tmp_path)
    cfg = _config(data_root, "force_torque",
                  saved_name=str(tmp_path / "model"),
                  train_diffs=str(tmp_path / "diffs"),
                  saved_result="run0",
                  mesh_shape=1)
    (b, _), (s, _), (n, _) = nd.main(cfg)
    assert b > 0.8 and s > 0.8 and n > 0.8
    assert os.path.exists(tmp_path / "model.npz")
    assert os.path.exists(tmp_path / "hsr_objectdrop" / "result_csv" / "run0.csv")


def test_orbax_directory_checkpoint_roundtrip(data_root, tmp_path):
    """Directory paths route to Orbax (async-friendly storage for large
    runs); file paths keep the flat npz.  Same (params, state, config)
    contract either way."""
    import jax

    cfg = _config(data_root, "force_torque")
    model, params, state = get_model(cfg)

    ckpt_dir = str(tmp_path / "orbax_ck") + os.sep
    out = save_checkpoint(ckpt_dir, params, state, config=cfg)
    assert os.path.isdir(out)
    p2, s2, meta = load_checkpoint(out)
    assert meta["config"]["sensor"] == "force_torque"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure incl. the empty no-BN state dict survives
    empty = lambda x: isinstance(x, dict) and not x  # noqa: E731
    assert jax.tree.structure(state, is_leaf=empty) == \
        jax.tree.structure(s2, is_leaf=empty)


def test_sharded_eval_with_gram_fit(data_root):
    """nap_fit_method='gram' over a mesh: the Gram reduction happens on the
    sharded diffs (no gather) and the scores are finite and sane (on the
    fixture's degenerate spectrum gram vs svd scores legitimately differ in
    null directions, so this asserts behavior, not bit-parity)."""
    from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh

    cfg = _config(data_root, "force_torque", n_epochs=6).replace(
        nap_fit_method="gram")
    model, params, state = get_model(cfg)
    manager, train_l, valid_l, test_l = get_loaders(cfg)
    train_x, _ = manager.get_transformed_data(train_l)
    valid_x, _ = manager.get_transformed_data(valid_l)
    test_x, test_y = manager.get_transformed_data(test_l)

    det = NoveltyDetecter(cfg, mesh=get_mesh(8))
    result = det.train(model, params, state, train_x, valid_x)
    base, sap, nap = det.test(model, result.params, result.state,
                              train_x, valid_x, test_x, test_y)
    assert np.isfinite(nap.score).all()
    assert 0.0 <= nap.auroc <= 1.0
    # whitening stats carry the truncated-rank contract
    assert nap.score.shape == (len(test_x),)
