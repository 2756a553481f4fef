"""Differential tests against the ACTUAL reference implementation.

Round-1 parity evidence was re-implementation oracles (torch rebuilds of the
reference's modules inside tests/).  This suite executes the reference code
itself from /root/reference — model_builder.get_model, reconstruction_
aggregation.get_diffs, utils.metric.{get_recon_loss,get_d_loss,
get_d_norm_loss}, utils.normalize.{Standardizer,Rotater}, utils.
data_loaders.HSR_Net — transplants weights both ways via
utils/torch_compat, and asserts score parity by EXECUTION (VERDICT r1
item 1).  A shared misreading of the reference cannot pass these.

Import shims (the reference is py2.7-era research code):
  * `from collections import Iterable` (data_loaders.py:3) broke in
    py3.10+ — aliased from collections.abc before import.
  * librosa is not installed — stubbed with a module that raises if its
    functions are actually called (none of the code under test calls them;
    MFCC parity is covered against scipy in tests/test_fusion_pipeline.py).
  * HSR_Net.forward hard-codes `.cuda(gpu_id)` (data_loaders.py:181) —
    torch.Tensor.cuda is monkeypatched to identity for the CPU-only run.

The reference tree is treated as read-only public content: imported and
executed, never modified.
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# reference import harness
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules under their own top-level names
    (model_builder, reconstruction_aggregation, utils.*, modules, layers)
    with the compat shims above."""
    import collections
    import collections.abc

    import matplotlib

    matplotlib.use("Agg")
    if not hasattr(collections, "Iterable"):
        # py3.10 removed the collections alias the reference imports
        collections.Iterable = collections.abc.Iterable

    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")

        def _unavailable(*a, **k):  # pragma: no cover - guard
            raise RuntimeError(
                "librosa stub: the oracle suite never exercises the "
                "reference's MFCC path (librosa is not installed here)"
            )

        lib.load = _unavailable
        lib.feature = types.SimpleNamespace(
            melspectrogram=_unavailable, mfcc=_unavailable
        )
        lib.power_to_db = _unavailable
        disp = types.ModuleType("librosa.display")  # concatdata_maker.py:5
        lib.display = disp
        sys.modules["librosa"] = lib
        sys.modules["librosa.display"] = disp

    sys.path.insert(0, REF)
    try:
        import model_builder
        import modules as ref_modules
        import reconstruction_aggregation
        from utils import common_utils as ref_common
        from utils import data_loaders as ref_loaders
        from utils import metric as ref_metric
        from utils import normalize as ref_normalize

        yield SimpleNamespace(
            model_builder=model_builder,
            modules=ref_modules,
            recon_agg=reconstruction_aggregation,
            common=ref_common,
            loaders=ref_loaders,
            metric=ref_metric,
            normalize=ref_normalize,
        )
    finally:
        sys.path.remove(REF)


def _ref_get_diffs(ref, x, ref_model, batch_size):
    """reconstruction_aggregation.get_diffs under no_grad: the reference
    calls .numpy() on live-graph tensors (line 35), which modern torch
    refuses outside inference mode; no_grad is numerically identity."""
    with torch.no_grad():
        return ref.recon_agg.get_diffs(x, ref_model, batch_size=batch_size)


def _our_config(**kw):
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size

    cfg = Config(**kw)
    return cfg.replace(input_size=get_input_size(cfg))


def _ref_model_from_ours(ref, cfg, model, params, state):
    """Build the reference AutoEncoder via its OWN builder
    (model_builder.py:48-53, gpu_id=-1 -> CPU) and load our trained
    pytrees into it through the exported state-dict layout."""
    from icra2021_multimodal_ad_tpu.utils.torch_compat import (
        pytrees_to_state_dict,
    )

    ref_cfg = SimpleNamespace(
        input_size=cfg.input_size, btl_size=cfg.btl_size,
        n_layers=cfg.n_layers, gpu_id=-1,
    )
    ref_model = ref.model_builder.get_model(ref_cfg)
    sd = pytrees_to_state_dict(params, state, model)
    tensors = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        if k.endswith("num_batches_tracked"):
            tensors[k] = torch.as_tensor(arr, dtype=torch.long)
        else:
            tensors[k] = torch.as_tensor(arr, dtype=torch.float32)
    ref_model.load_state_dict(tensors, strict=True)
    ref_model.eval()
    return ref_model


# ---------------------------------------------------------------------------
# builder / model-shape parity
# ---------------------------------------------------------------------------


def test_hidden_layer_sizes_match_reference(ref):
    from icra2021_multimodal_ad_tpu.models.builder import (
        get_hidden_layer_sizes,
    )

    for args in [(1728, 100, 4), (100, 1728, 4), (64, 10, 2), (10, 64, 2),
                 (512, 16, 5), (7, 3, 1)]:
        assert get_hidden_layer_sizes(*args) == \
            ref.common.get_hidden_layer_sizes(*args), args


def test_reference_builder_accepts_our_state_dict(ref):
    """Key-exact round trip: the reference's own model (strict=True)
    accepts pytrees_to_state_dict output — layer indices, bn placement,
    and tensor shapes all line up with model_builder.py:6-53."""
    from icra2021_multimodal_ad_tpu.models.builder import get_model

    cfg = _our_config(sensor="force_torque", n_layers=3, btl_size=10)
    model, params, state = get_model(cfg)
    ref_model = _ref_model_from_ours(ref, cfg, model, params, state)
    # spot-check an actual weight made it across (not just the keys)
    w_ref = ref_model.encoder.net[0].layer.weight.detach().numpy()
    np.testing.assert_allclose(
        w_ref, np.asarray(params["encoder"][0]["w"]).T, rtol=0, atol=0
    )


# ---------------------------------------------------------------------------
# RaPP diff extraction (reconstruction_aggregation.py:6-37)
# ---------------------------------------------------------------------------


def test_get_diffs_parity_with_reference_execution(ref):
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs

    cfg = _our_config(sensor="force_torque", n_layers=3, btl_size=10, seed=3)
    model, params, state = get_model(cfg)
    ref_model = _ref_model_from_ours(ref, cfg, model, params, state)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (37, cfg.input_size)).astype(np.float32)

    ref_diffs = _ref_get_diffs(ref, x, ref_model, 16)
    our_diffs = get_diffs(x, model, params, state, batch_size=16)

    assert len(ref_diffs) == len(our_diffs) == cfg.n_layers + 1
    for i, (a, b) in enumerate(zip(ref_diffs, our_diffs)):
        a = np.asarray(a)
        b = np.asarray(b)
        assert a.shape == b.shape, f"layer {i}"
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b, a, atol=1e-4 * denom, rtol=0,
            err_msg=f"diff layer {i} diverges from reference execution",
        )


def test_get_diffs_parity_trained_model(ref):
    """Same assertion after actual training steps — catches BN running-
    stats / eval-mode divergences a fresh init can't see."""
    import jax

    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = _our_config(sensor="force_torque", n_layers=3, btl_size=8,
                      seed=5, n_epochs=3, batch_size=32, verbose=0)
    model, params, state = get_model(cfg)
    rng = np.random.default_rng(1)
    xtr = rng.normal(0, 1, (128, cfg.input_size)).astype(np.float32)
    xva = rng.normal(0, 1, (64, cfg.input_size)).astype(np.float32)
    det = NoveltyDetecter(cfg)
    # the trainer donates its buffers (CLAUDE.md invariant) — deep-copy
    res = det.train(
        model,
        jax.tree.map(lambda a: a.copy(), params),
        jax.tree.map(lambda a: a.copy(), state),
        jax.numpy.asarray(xtr), jax.numpy.asarray(xva),
    )
    params, state = res.params, res.state

    ref_model = _ref_model_from_ours(ref, cfg, model, params, state)
    x = rng.normal(0, 1, (33, cfg.input_size)).astype(np.float32)
    ref_diffs = _ref_get_diffs(ref, x, ref_model, 16)
    our_diffs = get_diffs(x, model, params, state, batch_size=16)
    for i, (a, b) in enumerate(zip(ref_diffs, our_diffs)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-4 * denom, rtol=0,
                                   err_msg=f"trained diff layer {i}")


# ---------------------------------------------------------------------------
# scoring (utils/metric.py:132-238) on IDENTICAL diffs
# ---------------------------------------------------------------------------


def _separable_diffs(rng, dims, n_train=96, n_valid=48, n_test=48):
    """Random per-layer diff lists where anomalous test rows have inflated
    magnitude (separable scores keep the reference's f1 math away from
    0/0)."""
    label = (rng.uniform(size=n_test) < 0.3)
    scale = np.where(label, 3.0, 1.0)[:, None]
    train = [rng.normal(0, 1, (n_train, d)).astype(np.float32) for d in dims]
    valid = [rng.normal(0, 1, (n_valid, d)).astype(np.float32) for d in dims]
    test = [(rng.normal(0, 1, (n_test, d)) * scale).astype(np.float32)
            for d in dims]
    return train, valid, test, label


def test_base_score_parity(ref):
    from icra2021_multimodal_ad_tpu.ops.scoring import get_recon_loss

    rng = np.random.default_rng(2)
    _, valid, test, label = _separable_diffs(rng, [24])
    r_score, r_roc, r_prc, r_f1, r_p, r_r = ref.metric.get_recon_loss(
        valid[0], test[0], label
    )
    ours = get_recon_loss(valid[0], test[0], label)
    np.testing.assert_allclose(ours.score, r_score, rtol=1e-5)
    assert ours.auroc == pytest.approx(r_roc, abs=1e-9)
    assert ours.aupr == pytest.approx(r_prc, abs=1e-9)
    assert ours.f1 == pytest.approx(r_f1, abs=1e-9)
    assert (ours.precision, ours.recall) == pytest.approx((r_p, r_r))


def test_sap_score_parity(ref):
    from icra2021_multimodal_ad_tpu.ops.scoring import get_d_loss

    rng = np.random.default_rng(3)
    train, valid, test, label = _separable_diffs(rng, [24, 12, 8])
    r_score, r_roc, r_prc, r_f1, r_p, r_r = ref.metric.get_d_loss(
        train, valid, test, label
    )
    ours = get_d_loss(train, valid, test, label)
    np.testing.assert_allclose(ours.score, r_score, rtol=1e-5)
    assert ours.auroc == pytest.approx(r_roc, abs=1e-9)
    assert ours.aupr == pytest.approx(r_prc, abs=1e-9)
    assert ours.f1 == pytest.approx(r_f1, abs=1e-9)


def test_nap_score_parity(ref, tmp_path):
    """The hard one: reference torch.svd whitening vs our sign-fixed
    jnp.linalg.svd whitening on identical diffs.  Scores are compared at
    1e-3 rel (SVD backend tolerance, SURVEY §7 hard part (a)); AUROC/AUPR
    must agree to float tolerance."""
    from icra2021_multimodal_ad_tpu.ops.scoring import get_d_norm_loss

    rng = np.random.default_rng(4)
    train, valid, test, label = _separable_diffs(rng, [24, 12, 8])
    ref_cfg = SimpleNamespace(train_diffs=str(tmp_path / "ref_diffs.pt"))
    r_score, r_roc, r_prc, r_f1, r_p, r_r = ref.metric.get_d_norm_loss(
        train, valid, test, label, ref_cfg
    )
    ours = get_d_norm_loss(train, valid, test, label,
                           save_stats_path=False)
    np.testing.assert_allclose(ours.score, r_score, rtol=1e-3)
    assert ours.auroc == pytest.approx(r_roc, abs=1e-6)
    assert ours.aupr == pytest.approx(r_prc, abs=1e-6)
    assert ours.f1 == pytest.approx(r_f1, abs=1e-6)


def test_layer_range_clamping_parity(ref, tmp_path):
    """start/end layer index clamping (metric.py:152-162) — drive the
    reference with out-of-range indices and match."""
    from icra2021_multimodal_ad_tpu.ops.scoring import get_d_loss

    rng = np.random.default_rng(5)
    train, valid, test, label = _separable_diffs(rng, [16, 8, 4])
    for start, end in [(1, None), (9, None), (2, 2), (0, 1)]:
        r_score = ref.metric.get_d_loss(
            train, valid, test, label,
            start_layer_index=start, end_layer_index=end,
        )[0]
        ours = get_d_loss(train, valid, test, label,
                          start_layer_index=start, end_layer_index=end)
        np.testing.assert_allclose(ours.score, r_score, rtol=1e-5,
                                   err_msg=f"range ({start},{end})")


# ---------------------------------------------------------------------------
# whitening transforms (utils/normalize.py)
# ---------------------------------------------------------------------------


def test_standardizer_parity(ref):
    from icra2021_multimodal_ad_tpu.ops.normalize import (
        standardizer_fit,
        standardizer_run,
    )

    rng = np.random.default_rng(6)
    x = rng.normal(2.0, 3.0, (200, 12)).astype(np.float32)
    y = rng.normal(1.0, 2.0, (50, 12)).astype(np.float32)
    r = ref.normalize.Standardizer()
    r.fit(x)
    ref_out = r.run(y)
    ours = standardizer_run(standardizer_fit(x), y)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-5)


def test_rotater_parity_up_to_column_sign(ref):
    """torch x.svd() and jnp.linalg.svd may disagree on singular-vector
    signs; align each projected column's sign before comparing (NAP itself
    is sign-invariant — scores enter quadratically)."""
    from icra2021_multimodal_ad_tpu.ops.normalize import (
        rotater_fit,
        rotater_run,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (200, 12)).astype(np.float32)
    y = rng.normal(0, 1, (50, 12)).astype(np.float32)
    r = ref.normalize.Rotater()
    r.fit(x)
    ref_out = r.run(y)
    ours = np.asarray(rotater_run(rotater_fit(x), y))
    signs = np.sign(np.sum(ref_out * ours, axis=0))
    np.testing.assert_allclose(ours * signs, ref_out, atol=2e-4)


def test_truncater_parity(ref):
    from icra2021_multimodal_ad_tpu.ops.normalize import (
        rotater_fit,
        truncater_run,
    )

    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, (150, 10)).astype(np.float32)
    y = rng.normal(0, 1, (40, 10)).astype(np.float32)
    r = ref.normalize.Truncater()
    r.fit(x)
    for k in (1, 3, 10):
        ref_out = r.run(y, trunc=k)
        ours = np.asarray(truncater_run(rotater_fit(x), y, trunc=k))
        # rank-k reconstruction is sign-invariant (v @ v^T)
        np.testing.assert_allclose(ours, ref_out, atol=3e-4,
                                   err_msg=f"trunc={k}")


# ---------------------------------------------------------------------------
# fusion frontend (utils/data_loaders.py:152-229) — reference HSR_Net
# executed on CPU with transplanted conv weights
# ---------------------------------------------------------------------------


def _fusion_params_from_hsr_net(net):
    from icra2021_multimodal_ad_tpu.ops.fusion import FusionParams

    def conv(mod):
        return {
            "w": np.asarray(mod.weight.detach().numpy()),
            "b": np.asarray(mod.bias.detach().numpy()),
        }

    return FusionParams(
        rgb1=conv(net.conv1r), rgb2=conv(net.conv2r), rgb3=conv(net.conv3r),
        dep1=conv(net.conv1d), dep2=conv(net.conv2d), dep3=conv(net.conv3d),
        lid1=conv(net.conv1l), lid2=conv(net.conv2l), lid3=conv(net.conv3l),
        lid4=conv(net.conv4l), lid5=conv(net.conv5l),
    )


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """HSR_Net.forward allocates `torch.Tensor().cuda(gpu_id)`
    (data_loaders.py:181) — identity it out for the CPU oracle run."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def test_hsr_net_fusion_parity(ref, cpu_cuda):
    from icra2021_multimodal_ad_tpu.ops.fusion import fuse

    B = 6
    cfg = SimpleNamespace(slicing_size=B, gpu_id=0)
    net = ref.loaders.HSR_Net(unimodal=False, config=cfg)
    net.eval()
    params = _fusion_params_from_hsr_net(net)

    rng = np.random.default_rng(9)
    r = rng.normal(0, 1, (B, 3, 32, 32)).astype(np.float32)
    d = rng.normal(0, 1, (B, 1, 32, 32)).astype(np.float32)
    t = rng.uniform(-1, 1, (B, 1)).astype(np.float32)
    m = rng.normal(0, 1, (B, 1, 13)).astype(np.float32)

    with torch.no_grad():
        ref_out = net(
            torch.from_numpy(r[:, None]),   # per-sample (1,3,32,32)
            torch.from_numpy(d[:, None]),
            None,
            torch.from_numpy(t[:, :, None, None, None]),  # t[i]=(1,1,1,1)
            torch.from_numpy(m[:, None]),   # per-sample (1,1,13)
        ).numpy()
    ref_flat = ref_out.reshape(B, -1)

    ours = np.asarray(fuse(params, sensor="All", r=r, d=d, t=t, m=m))
    assert ours.shape == ref_flat.shape == (B, 1728)
    denom = np.abs(ref_flat).max() + 1e-8
    np.testing.assert_allclose(ours, ref_flat, atol=1e-5 * denom, rtol=0)


def test_hsr_net_lidar_branch_parity(ref, cpu_cuda):
    """The dead-in-the-reference LiDAR branch (conv1l..conv5l with real l
    input), executed unimodal: reference view/repeat vs our reshape/
    broadcast."""
    from icra2021_multimodal_ad_tpu.ops.fusion import fuse

    B = 4
    cfg = SimpleNamespace(slicing_size=B, gpu_id=0)
    net = ref.loaders.HSR_Net(unimodal=True, config=cfg)
    net.eval()
    params = _fusion_params_from_hsr_net(net)

    rng = np.random.default_rng(10)
    l = rng.normal(0, 1, (B, 1, 963)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(None, None, torch.from_numpy(l[:, None]), None,
                      None).numpy()
    ours = np.asarray(fuse(params, sensor="LiDAR", l=l))
    ref_flat = ref_out.reshape(B, -1)
    assert ours.shape == ref_flat.shape == (B, 2048)
    denom = np.abs(ref_flat).max() + 1e-8
    np.testing.assert_allclose(ours, ref_flat, atol=1e-5 * denom, rtol=0)


# ---------------------------------------------------------------------------
# end-to-end: identical windows through reference torch pipeline vs ours
# ---------------------------------------------------------------------------


def test_full_score_pipeline_parity(ref, tmp_path):
    """Windows -> train -> get_diffs -> BASE/SAP/NAP through BOTH stacks
    with the same transplanted weights: the complete scoring contract,
    proven by executing the reference.

    NAP conditioning note (measured, not assumed): with an UNTRAINED model
    or fewer fit rows than concat-diff dims the train-diff covariance is
    rank-deficient, whitening divides by ~0 variances, and even the
    reference applied to two diff sets that agree to 1e-4 produces scores
    differing by >100x (AUROC 0.99 vs 0.81).  So this test trains the
    model and uses 512 fit rows > 148 concat dims; in that regime the
    measured cross-stack divergence is <=10% per row with bit-equal
    AUROC/AUPR.  Tight per-row NAP parity on identical inputs is asserted
    separately below (reference scorer fed OUR diffs)."""
    import jax

    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        get_d_loss,
        get_d_norm_loss,
        get_recon_loss,
    )
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    cfg = _our_config(sensor="force_torque", n_layers=3, btl_size=10,
                      seed=11, n_epochs=8, batch_size=64, verbose=0)
    model, params, state = get_model(cfg)

    rng = np.random.default_rng(12)
    xtr = rng.normal(0, 1, (512, cfg.input_size)).astype(np.float32)
    xva = rng.normal(0, 1, (128, cfg.input_size)).astype(np.float32)
    label = rng.uniform(size=64) < 0.3
    xte = (rng.normal(0, 1, (64, cfg.input_size))
           * np.where(label, 4.0, 1.0)[:, None]).astype(np.float32)

    res = NoveltyDetecter(cfg).train(
        model,
        jax.tree.map(lambda a: a.copy(), params),
        jax.tree.map(lambda a: a.copy(), state),
        jax.numpy.asarray(xtr), jax.numpy.asarray(xva),
    )
    params, state = res.params, res.state
    ref_model = _ref_model_from_ours(ref, cfg, model, params, state)

    ref_tr = _ref_get_diffs(ref, xtr, ref_model, 128)
    ref_va = _ref_get_diffs(ref, xva, ref_model, 128)
    ref_te = _ref_get_diffs(ref, xte, ref_model, 128)
    our_tr = get_diffs(xtr, model, params, state, batch_size=128)
    our_va = get_diffs(xva, model, params, state, batch_size=128)
    our_te = get_diffs(xte, model, params, state, batch_size=128)

    r_base = ref.metric.get_recon_loss(ref_va[0], ref_te[0], label)
    o_base = get_recon_loss(our_va[0], our_te[0], label)
    np.testing.assert_allclose(o_base.score, r_base[0], rtol=1e-4, atol=1e-6)
    assert o_base.auroc == pytest.approx(r_base[1], abs=1e-6)

    r_sap = ref.metric.get_d_loss(ref_tr, ref_va, ref_te, label)
    o_sap = get_d_loss(our_tr, our_va, our_te, label)
    np.testing.assert_allclose(o_sap.score, r_sap[0], rtol=1e-4, atol=1e-6)
    assert o_sap.auroc == pytest.approx(r_sap[1], abs=1e-6)

    # NAP end-to-end: metric-level contract + bounded score band
    ref_cfg = SimpleNamespace(train_diffs=str(tmp_path / "d.pt"))
    r_nap = ref.metric.get_d_norm_loss(ref_tr, ref_va, ref_te, label, ref_cfg)
    o_nap = get_d_norm_loss(our_tr, our_va, our_te, label,
                            save_stats_path=False)
    assert o_nap.auroc == pytest.approx(r_nap[1], abs=1e-6)
    assert o_nap.aupr == pytest.approx(r_nap[2], abs=1e-5)
    np.testing.assert_allclose(o_nap.score, r_nap[0], rtol=0.15)

    # NAP on IDENTICAL inputs: feed the reference scorer OUR diffs — this
    # isolates the scoring implementations from diff-extraction noise.
    # Even then, a trained AE's diff covariance has a tiny-eigenvalue tail
    # (the model has learned to null most directions) and fp32 torch.svd
    # vs fp32 jnp svd resolve that tail differently — measured <=12% per
    # row here, vs <=1e-3 on well-conditioned diffs
    # (test_nap_score_parity).  The deployment contract — identical
    # ranking, bit-equal AUROC — must hold exactly.
    ref_cfg2 = SimpleNamespace(train_diffs=str(tmp_path / "d2.pt"))
    r_nap2 = ref.metric.get_d_norm_loss(
        [np.asarray(d) for d in our_tr],
        [np.asarray(d) for d in our_va],
        [np.asarray(d) for d in our_te],
        label, ref_cfg2,
    )
    np.testing.assert_allclose(o_nap.score, r_nap2[0], rtol=0.15)
    assert o_nap.auroc == pytest.approx(r_nap2[1], abs=1e-9)


# ---------------------------------------------------------------------------
# the literal reference eval fixture (datasets/caltime_test.csv)
# ---------------------------------------------------------------------------

REF_FIXTURE = os.path.join(REF, "datasets", "caltime_test.csv")


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE),
                    reason="reference fixture not available")
def test_reference_caltime_fixture_schema_and_scoring(tmp_path):
    """Consume the GENUINE reference artifact (10 windows x 984 columns,
    the only real-robot data in the reference; consumed at
    test_file/FullTest.py:261-264): parse every column, build All-sensor
    and LiDAR features, score through the repo's golden model, and check
    shapes + finite scores (VERDICT r1 item 2).

    The checked-in `nap_score` column CANNOT be numerically reproduced by
    anyone: those scores came from the reference's trained `All_100.pt`
    weights and its unseeded random fusion projection, neither of which is
    in its repo.  What IS verifiable — and was unproven in round 1 — is
    schema compatibility: column order, the 963-wide LiDAR block, id/
    data_dir handling, and that the full scoring path runs on the real
    artifact."""
    import pandas as pd

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data.dataset import (
        LIDAR_COLS,
        MFCC_COLS,
    )
    from icra2021_multimodal_ad_tpu.data.fixture import fixture_to_features

    df = pd.read_csv(REF_FIXTURE)
    assert df.shape == (10, 984)
    # exact schema contract (caltime_test.csv header line 1)
    expected = (["id"] + MFCC_COLS
                + ["cur_depth_id", "cur_hand_id", "cur_hand_weight",
                   "data_dir", "now_timegap"]
                + LIDAR_COLS + ["label", "nap_score"])
    assert df.columns.tolist() == expected
    assert df["nap_score"].notna().all()
    assert set(df["label"].unique()) <= {0, 1}  # 5 normal + 5 slip windows

    for sensor in ("All", "LiDAR", "force_torque", "mic"):
        cfg = Config(sensor=sensor, data_folder_name=str(tmp_path))
        cfg = cfg.replace(input_size=get_input_size(cfg))
        x = np.asarray(fixture_to_features(df, cfg))
        assert x.shape == (10, cfg.input_size), sensor
        assert np.isfinite(x).all(), sensor


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE),
                    reason="reference fixture not available")
def test_full_test_cli_on_reference_fixture(tmp_path, monkeypatch):
    """Drive the actual full_test entry point (FullTest.py equivalent) on
    the genuine reference CSV with the repo's golden checkpoint: parses,
    fuses, extracts diffs, NAP-scores — end to end on the real artifact."""
    import full_test

    from icra2021_multimodal_ad_tpu.config import Config, get_input_size

    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    golden = os.path.join("datasets", "golden")
    cfg = Config(sensor="All",
                 saved_name=os.path.join(golden, "model"),
                 train_diffs=os.path.join(golden, "nap_stats.npz"),
                 data_folder_name=str(tmp_path))
    cfg = cfg.replace(input_size=get_input_size(cfg))
    scores, df = full_test.run_full_test(cfg, REF_FIXTURE)
    assert scores.shape == (10,)
    assert np.isfinite(scores).all()
    assert (scores > 0).all()


# ---------------------------------------------------------------------------
# training engine executed (models/auto_encoder.py:57-90) — ignite is not
# installed, but step/validate are staticmethods over a duck-typed engine
# ---------------------------------------------------------------------------


def test_reference_train_step_execution_parity(ref):
    """Drive the reference's OWN AutoEncoder.step (torch Adam 1e-3, MSE-sum
    loss, train-mode BN, novelty_detection.py:90) and our train_step from
    the SAME init on the SAME batch sequence: per-step losses,
    validate() losses, and the final weights must track."""
    import jax.numpy as jnp
    import optax

    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.train import eval_step, train_step
    from icra2021_multimodal_ad_tpu.utils.torch_compat import (
        pytrees_to_state_dict,
    )

    cfg = _our_config(sensor="force_torque", n_layers=3, btl_size=10, seed=21)
    model, params, state = get_model(cfg)
    ref_model = _ref_model_from_ours(ref, cfg, model, params, state)
    ref_model.train()
    engine = SimpleNamespace(
        model=ref_model,
        optimizer=torch.optim.Adam(ref_model.parameters(), lr=1e-3),
        config=SimpleNamespace(gpu_id=-1),
    )

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(22)
    ref_losses, our_losses = [], []
    for _ in range(6):
        xb = rng.normal(0, 1, (32, cfg.input_size)).astype(np.float32)
        (loss_ref,) = type(ref_model).step(
            engine, (torch.from_numpy(xb), None)
        )
        ref_losses.append(loss_ref)
        params, state, opt_state, loss = train_step(
            model, params, state, opt_state, jnp.asarray(xb), optimizer
        )
        our_losses.append(float(loss))
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)

    # validate (eval-mode BN running stats) on a held-out batch
    xv = rng.normal(0, 1, (24, cfg.input_size)).astype(np.float32)
    (ref_val,) = type(ref_model).validate(engine, (torch.from_numpy(xv), None))
    our_val = float(eval_step(model, params, state, jnp.asarray(xv)))
    assert our_val == pytest.approx(ref_val, rel=2e-3)

    # final weights: 6 Adam steps of drift must stay within float band
    sd_ref = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    sd_our = pytrees_to_state_dict(params, state, model)
    for k, v in sd_our.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            np.asarray(v), sd_ref[k], atol=5e-4, rtol=5e-3,
            err_msg=f"weight {k} diverged after 6 reference-executed steps",
        )


# ---------------------------------------------------------------------------
# VIB decorator executed (decorators/variational_info_bottleneck.py:19-42)
# ---------------------------------------------------------------------------


def test_reference_vib_decorator_execution_parity(ref):
    """The reference FCModule.forward IS the decorated function — execute
    it in normal mode and match: identity passthrough, mu/logvar split,
    and the deterministic no-grad z = mu expand(k) path."""
    from icra2021_multimodal_ad_tpu.models.fc_module import (
        fc_module_apply,
        fc_module_spec,
    )

    torch.manual_seed(0)
    mod = ref.modules.FCModule(input_size=12, output_size=8,
                               hidden_sizes=[10], use_batch_norm=True,
                               act="leakyrelu", last_act=None)
    mod.eval()

    spec = fc_module_spec(12, 8, [10], use_batch_norm=True,
                          act="leakyrelu", last_act=None)
    params, state = [], []
    for layer, lspec in zip(mod.net, spec.layers):
        p = {"w": np.asarray(layer.layer.weight.detach().numpy()).T,
             "b": np.asarray(layer.layer.bias.detach().numpy())}
        s = {}
        if lspec.bn:
            p["bn_scale"] = np.asarray(layer.bn.weight.detach().numpy())
            p["bn_bias"] = np.asarray(layer.bn.bias.detach().numpy())
            s["bn_mean"] = np.asarray(layer.bn.running_mean.numpy())
            s["bn_var"] = np.asarray(layer.bn.running_var.numpy())
        params.append(p)
        state.append(s)

    rng = np.random.default_rng(23)
    x = rng.normal(0, 1, (16, 12)).astype(np.float32)
    y_ours, _ = fc_module_apply(spec, params, state, x)
    y_ours = np.asarray(y_ours)

    with torch.no_grad():
        # identity mode (distribution None — the only mode the reference's
        # entry points ever invoke)
        y_ref = mod(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(y_ours, y_ref, atol=1e-5)

        # normal mode, deterministic inference: z = mu expanded k times
        out = mod(torch.from_numpy(x), distribution="normal", k=3,
                  stochastic_inference=False)
    mu_ref = out["mu"].numpy()
    logvar_ref = out["logvar"].numpy()
    z_ref = out["z"].numpy()
    np.testing.assert_allclose(y_ours[:, :4], mu_ref, atol=1e-5)
    np.testing.assert_allclose(y_ours[:, 4:], logvar_ref, atol=1e-5)
    assert z_ref.shape == (3, 16, 4)
    for i in range(3):
        np.testing.assert_allclose(z_ref[i], mu_ref, atol=0)

    # reparameterized (grad-enabled) draws have the right moments
    out_s = mod(torch.from_numpy(x), distribution="normal", k=64,
                stochastic_inference=True)
    z_s = out_s["z"].detach().numpy()
    assert z_s.shape == (64, 16, 4)
    sigma_ref = np.exp(0.5 * logvar_ref)
    np.testing.assert_allclose(z_s.mean(axis=0), mu_ref,
                               atol=4 * sigma_ref.max() / 8)


# ---------------------------------------------------------------------------
# time-sync ETL alignment executed (concatdata_maker.py:51-105,135-161)
# ---------------------------------------------------------------------------


def _write_episode(ep_dir, rng, duration_s=4.0, n_lidar=40,
                   camera_hz=25):
    """Minimal raw episode for the ETL oracle: camera streams at >= 20 Hz.

    Rate matters for EXACT parity: the reference's depth/hand cursors
    advance by the matched `id` value (concatdata_maker.py:73-74), which —
    for row-aligned ids — lands one row PAST the match, skipping a sample.
    At its robot's ~25-30 Hz camera rates the skipped sample never falls
    into the next 0.1 s window, so the shipped behavior equals
    first-in-window; at exactly 10 Hz it returns None and the loop crashes
    (the quirk our vectorized searchsorted deliberately does not copy)."""
    import wave

    import pandas as pd

    from icra2021_multimodal_ad_tpu.data.synthetic import (
        drop_burst_audio,
        jittered_clock,
    )

    os.makedirs(os.path.join(ep_dir, "sound"), exist_ok=True)
    drop_start = round(duration_s - 1.0, 1)

    for stream, hz, start in (("depth", camera_hz, 0.05),
                              ("hand", camera_hz, 0.055)):
        t = jittered_clock(rng, hz, start, duration_s)
        pd.DataFrame({"time": t, "id": np.arange(1, len(t) + 1),
                      "timegap": t}).to_csv(
            os.path.join(ep_dir, f"{stream}.csv"))
    t = jittered_clock(rng, 10, 0.08, duration_s)
    scans = ["[" + ",".join(f"{v:.3f}" for v in rng.uniform(0.2, 5.0, n_lidar))
             + "]" for _ in t]
    pd.DataFrame({"data": scans, "time": t, "timegap": t}).to_csv(
        os.path.join(ep_dir, "LiDAR.csv"))
    t = jittered_clock(rng, 50, 0.02, duration_s)
    pd.DataFrame({"datetime": t, "timegap": t,
                  "weight": np.round(rng.normal(210, 3, len(t)), 1)}).to_csv(
        os.path.join(ep_dir, "hand_weight.csv"))
    t = jittered_clock(rng, 43, 0.01, duration_s)
    pd.DataFrame({"data": ["[]"] * len(t), "time": t, "timegap": t}).to_csv(
        os.path.join(ep_dir, "Microphone.csv"))
    pd.DataFrame([{"drop_end": round(drop_start + 0.5, 1),
                   "drop_start": drop_start}]).to_csv(
        os.path.join(ep_dir, "drop_time.csv"))
    stereo = drop_burst_audio(rng, duration_s, 44100, drop_start)
    with wave.open(os.path.join(ep_dir, "sound", "output.wav"), "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(44100)
        f.writeframes(stereo.tobytes())


def test_reference_etl_alignment_execution_parity(ref, tmp_path):
    """Replicate the reference's per-episode alignment loop with ITS OWN
    calc_time_bound / find_depth_id / find_hand_id / find_LiDAR_data /
    find_hand_weight cursor scans, and assert our vectorized searchsorted
    ETL (data/etl.process_episode) selects the IDENTICAL samples, grid,
    and labels.  Camera streams run at 25 Hz (see _write_episode: the
    regime where the reference's cursor quirk is behavior-neutral and
    exact parity is well-defined)."""
    import importlib.util

    import pandas as pd

    # Load the REFERENCE's concatdata_maker by explicit file path under a
    # non-colliding module name: the repo root ships its own
    # concatdata_maker.py (the CLI), and once any earlier test has imported
    # that one (tests/test_etl.py does), a bare `import concatdata_maker`
    # here returns OURS from sys.modules — the fixture's sys.path insert
    # cannot override an already-cached name.
    spec = importlib.util.spec_from_file_location(
        "ref_concatdata_maker", os.path.join(REF, "concatdata_maker.py")
    )
    cm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cm)  # librosa stub from the `ref` fixture

    from icra2021_multimodal_ad_tpu.data import etl

    rng = np.random.default_rng(31)
    for ep in ("ep0000", "ep0001"):
        dir_name = str(tmp_path / ep / "data")
        _write_episode(dir_name, rng)
        # load exactly as the reference does (concatdata_maker.py:115-121)
        df_depth = pd.read_csv(dir_name + "/depth.csv")[1:]
        df_lidar = pd.read_csv(dir_name + "/LiDAR.csv")[1:]
        df_hand = pd.read_csv(dir_name + "/hand.csv")[1:]
        df_weight = pd.read_csv(dir_name + "/hand_weight.csv")[1:]
        df_mic = pd.read_csv(dir_name + "/Microphone.csv")[1:]
        _, drop_end, drop_start = pd.read_csv(
            dir_name + "/drop_time.csv"
        ).values[0]

        start = cm.calc_time_bound(df_depth, df_lidar, df_weight, df_mic)

        # the reference's while loop (concatdata_maker.py:132-161), cursors
        # and float accumulation included
        depth_id = hand_id = lidar_id = weight_id = 0
        now = start
        rows = []
        while now <= drop_start + 0.5:
            # int(...) on the cursors: the scans return float cursor values
            # in modern pandas (the .values block is float64); python2-era
            # numpy accepted float slices, today it raises
            cur_depth, depth_id = cm.find_depth_id(now, df_depth,
                                                   int(depth_id), 0.1)
            cur_hand, hand_id = cm.find_hand_id(now, df_hand, int(hand_id),
                                                0.1)
            cur_lidar, lidar_id = cm.find_LiDAR_data(now, df_lidar,
                                                     int(lidar_id), 0.1)
            cur_weight, weight_id = cm.find_hand_weight(now, df_weight,
                                                        int(weight_id), 0.1)
            label = int(drop_start <= now <= drop_start + 0.5)
            rows.append((now, cur_depth, cur_hand, cur_weight,
                         cur_lidar[:40], label))
            now += 0.1

        ours = etl.process_episode(dir_name, ep, n_lidar=40)
        # the reference's `now += 0.1` float accumulation can overshoot
        # drop_start+0.5 by ~1e-15 and drop the FINAL boundary grid step
        # (whether it does depends on start_time); our grid is computed
        # exactly and always includes it.  Compare the common prefix and
        # bound the boundary discrepancy to that one step.
        assert 0 <= len(ours) - len(rows) <= 1, (
            f"{ep}: grid length {len(ours)} vs reference loop {len(rows)}"
        )
        n = len(rows)
        ours = ours.iloc[:n]
        ref_arr = {
            "now": np.asarray([r[0] for r in rows]),
            "depth": np.asarray([r[1] for r in rows]),
            "hand": np.asarray([r[2] for r in rows]),
            "weight": np.asarray([r[3] for r in rows]),
            "label": np.asarray([r[5] for r in rows]),
        }
        np.testing.assert_allclose(ours["now_timegap"].to_numpy(),
                                   ref_arr["now"], atol=1e-6)
        np.testing.assert_array_equal(ours["cur_depth_id"].to_numpy(),
                                      ref_arr["depth"], err_msg=ep)
        np.testing.assert_array_equal(ours["cur_hand_id"].to_numpy(),
                                      ref_arr["hand"], err_msg=ep)
        np.testing.assert_allclose(ours["cur_hand_weight"].to_numpy(),
                                   ref_arr["weight"], atol=1e-6)
        np.testing.assert_array_equal(ours["label"].to_numpy(),
                                      ref_arr["label"], err_msg=ep)
        lidar_ref = np.asarray([r[4] for r in rows], dtype=np.float32)
        lidar_cols = [c for c in ours.columns if c.startswith("LiDAR")]
        np.testing.assert_allclose(ours[lidar_cols].to_numpy(), lidar_ref,
                                   atol=1e-5, err_msg=ep)


# ---------------------------------------------------------------------------
# dataset manager + build execution parity (C9/C10/C12): the reference's OWN
# TabularDataset/Manager/get_loaders run on synthetic shards, vs ours
# ---------------------------------------------------------------------------

_DS_SEED = 5


def _ref_dataset_env(ref, monkeypatch, root: str):
    """Patches that let /root/reference's dataset stack execute here:
    - pd.DataFrame.append (removed in pandas 2) -> pd.concat shim
    - sklearn.utils.shuffle (unseeded, data_loaders.py:287) -> OUR seeded
      permutation, so both pipelines see the same row order
    - .cuda() on tensors/modules -> identity (no CUDA on this host)
    - the hardcoded image root '/data_ssd/hsr_dropobject/data/'
      (data_loaders.py:341,349) -> <root>/data/
    - HSR_Net capture, so its unseeded random conv weights can be
      transplanted into OUR fusion params for an apples-to-apples build
    - cwd -> /root/reference so get_loaders finds datasets/data_config.json
      (data_loaders.py:53)
    """
    import pandas as pd
    import sklearn.utils
    from PIL import Image as PILImage

    monkeypatch.setattr(
        pd.DataFrame, "append",
        lambda self, other, ignore_index=False: pd.concat(
            [self, other], ignore_index=ignore_index),
        raising=False,
    )
    monkeypatch.setattr(
        sklearn.utils, "shuffle",
        lambda frame: frame.iloc[
            np.random.default_rng(_DS_SEED).permutation(len(frame))],
    )
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    captured = []

    def module_cuda(self, *a, **k):
        # identity .cuda() doubles as the HSR_Net capture point: the class
        # itself cannot be wrapped because its __init__ re-resolves the
        # module-level name via super(HSR_Net, self) (data_loaders.py:154)
        if isinstance(self, ref.loaders.HSR_Net):
            captured.append(self)
        return self

    monkeypatch.setattr(torch.nn.Module, "cuda", module_cuda)

    hard_prefix = "/data_ssd/hsr_dropobject/data/"

    def rewriting_open(path, *a, **k):
        assert str(path).startswith(hard_prefix), path
        return PILImage.open(
            os.path.join(root, "data", str(path)[len(hard_prefix):]))

    monkeypatch.setattr(ref.loaders, "Image",
                        SimpleNamespace(open=rewriting_open))

    monkeypatch.chdir(REF)
    return captured


def _ref_dataset_config(root: str, sensor: str, slicing: int, batch: int):
    return SimpleNamespace(
        sensor=sensor, file_name="data_sum",
        data_folder_name=root.rstrip("/") + "/",
        object_select_mode=False, object_type="book",
        slicing_size=slicing, gpu_id=0, data="hsr_objectdrop",
        target_class=1, unimodal_normal=False, novelty_ratio=0.0,
        verbose=0, batch_size=batch,
    )


def _synth_eight_shards(tmp_path, write_images: bool):
    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_data_sum_shards,
    )

    root = str(tmp_path / "dsref")
    generate_data_sum_shards(
        root, n_episodes=8, steps_per_episode=10, n_shards=8,
        seed=11, write_images=write_images,
    )
    return root


def _loader_index_parity(ref_loaders_list, our_loaders_list):
    """train: same membership (both shuffle at iteration); valid/test: the
    reference's SequentialIndicesSampler order must match exactly."""
    ref_tr, ref_va, ref_te = ref_loaders_list
    our_tr, our_va, our_te = our_loaders_list
    assert sorted(ref_tr.sampler.indices) == sorted(our_tr.indices.tolist())
    assert list(ref_va.sampler.indices) == list(our_va.indices)
    assert list(ref_te.sampler.indices) == list(our_te.indices)


def test_reference_dataset_build_force_torque_execution_parity(
        ref, monkeypatch, tmp_path):
    """The reference's WHOLE dataset layer — TabularDataset 8-shard read +
    shuffle + slice + per-column min-max + HSR_Net force broadcast,
    TabularDatasetManager splits, get_loaders label logic — executed on
    synthetic shards and matched against ours end to end."""
    from icra2021_multimodal_ad_tpu.data.dataset import get_loaders

    root = _synth_eight_shards(tmp_path, write_images=False)
    _ref_dataset_env(ref, monkeypatch, root)

    ref_cfg = _ref_dataset_config(root, "force_torque", slicing=64, batch=16)
    ref_mgr, ref_tr, ref_va, ref_te = ref.loaders.get_loaders(ref_cfg)

    cfg = _our_config(
        sensor="force_torque", data_folder_name=root + "/",
        slicing_size=64, batch_size=16, seed=_DS_SEED, verbose=0,
        feature_cache=0,
    )
    mgr, tr, va, te = get_loaders(cfg)

    ref_x = ref_mgr.total_x.cpu().numpy()
    ref_y = ref_mgr.total_y.cpu().numpy()
    ours_x = np.asarray(mgr.total_x)
    assert ours_x.shape == ref_x.shape == (64, 64)
    np.testing.assert_allclose(ours_x, ref_x, atol=1e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(mgr.total_y), ref_y)
    _loader_index_parity([ref_tr, ref_va, ref_te], [tr, va, te])


def test_reference_dataset_build_all_sensor_execution_parity(
        ref, monkeypatch, tmp_path):
    """All-sensor build: the reference's PIL image loop + norm_vec_np +
    F.interpolate + HSR_Net fusion executed for real (transplanted into our
    fusion params).  depth/force/mic feature blocks must match exactly; the
    rgb block differs ONLY by the documented layout deviation — the
    reference raw-views HWC-flattened pixels as CHW (data_loaders.py:
    370-374, scrambling channels) where we transpose properly
    (data/dataset.py module docstring) — which is proven by feeding the
    reference's scrambled rgb tensor through OUR conv path and matching
    its rgb block bit-for-tolerance."""
    from icra2021_multimodal_ad_tpu.data.dataset import (
        TabularDataset,
        TabularDatasetManager,
        _load_images,
    )
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.ops.fusion import fuse
    from icra2021_multimodal_ad_tpu.ops.image import resize_nearest

    root = _synth_eight_shards(tmp_path, write_images=True)
    captured = _ref_dataset_env(ref, monkeypatch, root)

    ref_cfg = _ref_dataset_config(root, "All", slicing=48, batch=16)
    ref_mgr, ref_tr, ref_va, ref_te = ref.loaders.get_loaders(ref_cfg)
    assert len(captured) == 1
    params = _fusion_params_from_hsr_net(captured[0])

    cfg = _our_config(
        sensor="All", data_folder_name=root + "/", slicing_size=48,
        batch_size=16, seed=_DS_SEED, verbose=0, feature_cache=0,
    )
    ds = TabularDataset(cfg, fusion_params=params)
    mgr = TabularDatasetManager(cfg, dataset=ds)

    ref_x = ref_mgr.total_x.detach().cpu().numpy()
    ours_x = np.asarray(mgr.total_x)
    assert ours_x.shape == ref_x.shape == (48, 1728)
    np.testing.assert_array_equal(np.asarray(mgr.total_y),
                                  ref_mgr.total_y.detach().cpu().numpy())

    # channel-major flatten: [rgb 16x64 | depth 8x64 | force 64 | mic 2x64]
    scale = np.abs(ref_x).max() + 1e-8
    np.testing.assert_allclose(ours_x[:, 1024:], ref_x[:, 1024:],
                               atol=1e-5 * scale, rtol=0)

    # rgb block: reproduce the reference's scrambled layout from the same
    # PNGs and push it through OUR conv path
    df = ds.df
    raw = _load_images(cfg.data_folder_name,
                       df["data_dir"].to_numpy(),
                       df["cur_hand_id"].to_numpy(), "hand")
    flat = raw.reshape(raw.shape[0], -1).astype(np.float64)
    lo, hi = flat.min(axis=0), flat.max(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        normed = np.nan_to_num((flat - lo) / (hi - lo))
    scrambled = normed.reshape(-1, 3, 24, 32).astype(np.float32)  # raw view
    r_ref_layout = resize_nearest(jnp.asarray(scrambled), 32, 32)
    ours_rgb = np.asarray(
        fuse(params, sensor="hand_camera", r=r_ref_layout))
    np.testing.assert_allclose(ours_rgb, ref_x[:, :1024],
                               atol=1e-5 * scale, rtol=0)
    # and the deviation is real: the properly-transposed build differs
    assert not np.allclose(ours_x[:, :1024], ref_x[:, :1024],
                           atol=1e-5 * scale)

    our_loaders = mgr.get_loaders(
        batch_size=cfg.batch_size,
        indexes_list=[list(s) for s in (
            mgr.get_indexes(labels=[0], ratios=[0.6, 0.2, 0.2])[0],
            mgr.get_indexes(labels=[0], ratios=[0.6, 0.2, 0.2])[1],
            mgr.get_indexes(labels=[0], ratios=[0.6, 0.2, 0.2])[2]
            + mgr.get_indexes(labels=[1])[0],
        )],
    )
    _loader_index_parity([ref_tr, ref_va, ref_te], our_loaders)


def test_reference_get_balance_count_parity(ref):
    """get_balance's subsample sizes are deterministic even though the
    reference draws with the unseeded global RNG — counts must match ours
    in both directions (too few novelties / too many)."""
    from icra2021_multimodal_ad_tpu.data.dataset import get_balance

    seen = list(range(100))
    unseen = list(range(100, 120))
    for ratio in (0.3, 0.5):
        ref_seen, ref_unseen = ref.loaders.get_balance(
            list(seen), list(unseen), ratio)
        our_seen, our_unseen = get_balance(list(seen), list(unseen), ratio,
                                           seed=_DS_SEED)
        assert len(ref_seen) == len(our_seen), ratio
        assert len(ref_unseen) == len(our_unseen), ratio
        assert set(our_seen) <= set(seen) and set(our_unseen) <= set(unseen)

    # the other direction: novelties over-represented
    ref_seen, ref_unseen = ref.loaders.get_balance(
        list(range(10)), list(range(10, 40)), 0.5)
    our_seen, our_unseen = get_balance(list(range(10)), list(range(10, 40)),
                                       0.5, seed=_DS_SEED)
    assert len(ref_seen) == len(our_seen)
    assert len(ref_unseen) == len(our_unseen)


# ---------------------------------------------------------------------------
# realtime streaming twin (C17): the reference's OWN HsrDataset /
# Multisensory_module executed on simulated ring-buffer snapshots
# ---------------------------------------------------------------------------


def test_reference_hsrdataset_realtime_execution_parity(ref, monkeypatch):
    """data_loaders.py:714-731 executed for real: per-tick window batches
    through the reference's norm_vec ([-1,1] global/fixed ranges) and the
    per-sample Multisensory_module loop, with its fresh random conv draw
    captured and transplanted into our fusion params.  depth/force/mic
    feature blocks must match our hsr_window_batch exactly; rgb matches
    once the reference's HWC-as-CHW raw view (view(-1,1,3,32,32) on
    (B,32,32,3) frames, same deviation as the offline build) is
    reproduced through our conv path.  librosa's MFCC step is bypassed by
    feeding precomputed 13-dim frames, exactly what HsrDataset receives
    from save_mfcc_from_wav."""
    import jax.numpy as jnp

    from icra2021_multimodal_ad_tpu.data.streaming import hsr_window_batch
    from icra2021_multimodal_ad_tpu.ops.fusion import fuse
    from icra2021_multimodal_ad_tpu.ops.image import norm_minmax_global

    B = 7
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    captured = []

    def module_cuda(self, *a, **k):
        if isinstance(self, ref.loaders.Multisensory_module):
            captured.append(self)
        return self

    monkeypatch.setattr(torch.nn.Module, "cuda", module_cuda)

    rng = np.random.default_rng(21)
    force_q = [float(v) for v in rng.uniform(0, 400, B)]
    hand_q = [rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
              for _ in range(B)]
    depth_q = [rng.uniform(0, 255, (32, 32)).astype(np.float32)
               for _ in range(B)]
    mic_frames = rng.normal(-300, 80, (B, 13)).astype(np.float32)

    ref_cfg = SimpleNamespace(batch_size=B, gpu_id=0)
    ref_out = ref.loaders.HsrDataset(
        ref_cfg, force_q, np.stack(hand_q), np.stack(depth_q), mic_frames
    ).detach().cpu().numpy()
    assert ref_out.shape == (B, 1728)
    assert len(captured) == 1
    params = _fusion_params_from_hsr_net(captured[0])

    cfg = _our_config(sensor="All", batch_size=B, verbose=0)
    ours = np.asarray(hsr_window_batch(cfg, params, force_q, hand_q,
                                       depth_q, mic_frames))
    assert ours.shape == (B, 1728)

    scale = np.abs(ref_out).max() + 1e-8
    # depth (8x64) / force (64) / mic (2x64) blocks: exact parity
    np.testing.assert_allclose(ours[:, 1024:], ref_out[:, 1024:],
                               atol=1e-5 * scale, rtol=0)
    # rgb block: reproduce the raw-view scramble, then our conv path
    scrambled = (np.stack(hand_q).reshape(B, -1) * (2.0 / 255.0) - 1.0)
    scrambled = scrambled.reshape(B, 3, 32, 32).astype(np.float32)
    ours_rgb = np.asarray(fuse(params, sensor="hand_camera",
                               r=jnp.asarray(scrambled)))
    np.testing.assert_allclose(ours_rgb, ref_out[:, :1024],
                               atol=1e-5 * scale, rtol=0)
    assert not np.allclose(ours[:, :1024], ref_out[:, :1024],
                           atol=1e-5 * scale)

    # the reference's global mic min-max is what we implement
    m = torch.tensor(mic_frames)
    ref_m = ref.loaders.norm_vec(m).numpy()
    our_m = np.asarray(norm_minmax_global(jnp.asarray(mic_frames)))
    np.testing.assert_allclose(our_m, ref_m, atol=1e-6, rtol=0)


# ---------------------------------------------------------------------------
# result reporter (utils/reporter.py) — last uncovered utils module
# ---------------------------------------------------------------------------


def test_reference_reporter_export_parity(ref, tmp_path):
    """Execute the reference's Reporter (utils/reporter.py:17-60) and ours
    on the same add() stream: exported CSVs must be byte-identical
    (column order = dict insertion order, str() value formatting)."""
    from utils import reporter as ref_reporter  # cached ref package

    from icra2021_multimodal_ad_tpu.utils.reporter import Reporter

    rows = [
        ({"btl_size": 10, "lr": 1e-3, "sensor": "All"},
         {"auroc": 0.93125, "aupr": 0.5, "f1": np.float64(0.25)}),
        ({"btl_size": 100, "lr": 3e-4, "sensor": "All"},
         {"auroc": 1.0, "aupr": 0.999999, "f1": np.float64(1.0)}),
    ]
    theirs, ours = ref_reporter.Reporter(), Reporter()
    for c, r in rows:
        theirs.add(dict(c), dict(r))
        ours.add(dict(c), dict(r))
    p_ref = str(tmp_path / "ref.csv")
    p_our = str(tmp_path / "ours.csv")
    theirs.export(p_ref)
    ours.export(p_our)
    assert open(p_ref).read() == open(p_our).read()

# ---------------------------------------------------------------------------
# randomized architecture sweep — execution parity across the config space
# ---------------------------------------------------------------------------


def test_randomized_architecture_sweep_execution_parity(ref, tmp_path):
    """Fuzz the architecture space through BOTH implementations: randomly
    drawn (n_layers, btl_size, input_size, batch tail) configs, weights
    transplanted into the reference's OWN model, identical windows, full
    get_diffs + BASE/SAP/NAP chain per draw.  The fixed-case oracles above
    pin one shape each; shape-dependent divergences (1-layer nets,
    expansion bottlenecks btl > input, odd interpolated widths, chunking
    tails) only surface under a sweep.

    Draws 0 and 1 are forced edges (single-layer net; expanding
    bottleneck); the rest are random but seeded.  NAP fit rows are kept
    >= 3x the concat-diff width so the whitening stays well-conditioned
    (torch.svd vs jnp.linalg.svd agree only away from degenerate spectra
    — see test_full_score_pipeline_parity's conditioning note); NAP
    scores are compared reference-scorer-on-OUR-diffs (identical fit
    inputs) with bit-equal AUROC."""
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs
    from icra2021_multimodal_ad_tpu.ops.scoring import (
        get_d_loss,
        get_d_norm_loss,
        get_recon_loss,
    )

    rng = np.random.default_rng(20240818)
    draws = [(1, 8, 48), (2, 96, 64)]  # forced edges: 1-layer; btl > input
    while len(draws) < 6:
        draws.append((int(rng.integers(1, 5)),      # n_layers
                      int(rng.integers(3, 49)),     # btl_size
                      int(rng.integers(24, 97))))   # input_size
    for di, (n_layers, btl, input_size) in enumerate(draws):
        cfg = _our_config(sensor="force_torque", n_layers=n_layers,
                          btl_size=btl, seed=100 + di)
        cfg = cfg.replace(input_size=input_size)
        model, params, state = get_model(cfg)
        ref_model = _ref_model_from_ours(ref, cfg, model, params, state)

        # concat width = input + every encoder tap width; read it off a
        # probe diff instead of re-deriving the interpolation here
        probe = get_diffs(np.zeros((2, input_size), np.float32), model,
                          params, state, batch_size=2)
        k_total = sum(np.asarray(d).shape[1] for d in probe)
        n_train = max(3 * k_total, 96)
        bs = int(rng.integers(13, 40))  # odd chunking with a tail
        xtr = rng.normal(0, 1, (n_train, input_size)).astype(np.float32)
        xva = rng.normal(0, 1, (64, input_size)).astype(np.float32)
        label = rng.uniform(size=48) < 0.35
        label[0], label[1] = True, False  # both classes always present
        xte = (rng.normal(0, 1, (48, input_size))
               * np.where(label, 3.0, 1.0)[:, None]).astype(np.float32)

        ref_tr = _ref_get_diffs(ref, xtr, ref_model, bs)
        ref_va = _ref_get_diffs(ref, xva, ref_model, bs)
        ref_te = _ref_get_diffs(ref, xte, ref_model, bs)
        our_tr = get_diffs(xtr, model, params, state, batch_size=bs)
        our_va = get_diffs(xva, model, params, state, batch_size=bs)
        our_te = get_diffs(xte, model, params, state, batch_size=bs)

        tag = f"draw {di}: L={n_layers} btl={btl} in={input_size} bs={bs}"
        assert len(ref_te) == len(our_te) == n_layers + 1, tag
        for i, (a, b) in enumerate(zip(ref_te, our_te)):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(
                b, a, atol=1e-4 * denom, rtol=0,
                err_msg=f"{tag} diff layer {i}")

        r_base = ref.metric.get_recon_loss(ref_va[0], ref_te[0], label)
        o_base = get_recon_loss(our_va[0], our_te[0], label)
        np.testing.assert_allclose(o_base.score, r_base[0], rtol=1e-4,
                                   atol=1e-6, err_msg=tag)
        assert o_base.auroc == pytest.approx(r_base[1], abs=1e-6), tag

        r_sap = ref.metric.get_d_loss(ref_tr, ref_va, ref_te, label)
        o_sap = get_d_loss(our_tr, our_va, our_te, label)
        np.testing.assert_allclose(o_sap.score, r_sap[0], rtol=1e-4,
                                   atol=1e-6, err_msg=tag)
        assert o_sap.auroc == pytest.approx(r_sap[1], abs=1e-6), tag

        # NAP on identical fit inputs (reference scorer fed OUR diffs)
        ref_cfg = SimpleNamespace(
            train_diffs=str(tmp_path / f"d{di}.pt"))
        r_nap = ref.metric.get_d_norm_loss(
            [np.asarray(d) for d in our_tr],
            [np.asarray(d) for d in our_va],
            [np.asarray(d) for d in our_te],
            label, ref_cfg,
        )
        o_nap = get_d_norm_loss(our_tr, our_va, our_te, label,
                                save_stats_path=False)
        # even on identical fit inputs, fp32 torch.svd vs jnp svd resolve
        # the covariance's small-singular-value tail differently and the
        # whitening amplifies that by 1/std — measured <=22% per row on
        # untrained draws (same mechanism as the <=12% trained case above,
        # test_full_score_pipeline_parity).  The deployment contract —
        # identical ranking, bit-equal AUROC — must hold exactly.
        np.testing.assert_allclose(o_nap.score, r_nap[0], rtol=0.3,
                                   err_msg=tag)
        assert o_nap.auroc == pytest.approx(r_nap[1], abs=1e-9), tag


# ---------------------------------------------------------------------------
# legacy ETL generations (C13 older variants): the reference's OWN
# datasets/data_preprocess.py and youngjae/preprocess/make_timesync_csv_file
# executed on synthetic capture trees, vs --variant legacy / frames
# ---------------------------------------------------------------------------


def _load_ref_module(filename, name, monkeypatch=None, home=None):
    """File-path import of a reference module under a non-colliding name
    (the same sys.modules-collision argument as the concatdata_maker
    loader above).  `home` redirects '~' BEFORE module-level pd.read_csv
    calls run (make_timesync_csv_file.py:4-7 reads at import time)."""
    import importlib.util

    if home is not None:
        monkeypatch.setenv("HOME", str(home))
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, filename))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _patch_df_append(monkeypatch):
    """pd.DataFrame.append (removed in pandas 2) -> pd.concat shim, for
    reference code that appends rows (data_preprocess.py:161)."""
    import pandas as pd

    monkeypatch.setattr(
        pd.DataFrame, "append",
        lambda self, other, ignore_index=False: pd.concat(
            [self, other], ignore_index=ignore_index),
        raising=False,
    )


def _write_episode_legacy(ep_dir, rng, duration_s=4.0, n_lidar=12,
                          n_mic=8, camera_hz=25):
    """Raw episode in the OLDER capture schema (data_preprocess.py:90-96):
    adds rgb.csv and a Microphone.csv whose `data` cells are float lists.

    time/datetime columns are ISO-ish STRINGS (as a robot logger writes
    them), which keeps each frame's .values object-dtype so the
    reference's id-valued cursors stay ints — with all-float frames,
    modern numpy rejects the float slice df.values[cursor:-1] and the
    reference code cannot execute at all (same quirk the current-variant
    oracle works around with int() casts)."""
    import pandas as pd

    from icra2021_multimodal_ad_tpu.data.synthetic import jittered_clock

    os.makedirs(ep_dir, exist_ok=True)
    drop_start = round(duration_s - 1.0, 1)

    def stamps(t):
        return [f"2021-01-01 00:00:{v:06.3f}" for v in t]

    for stream, hz, start in (("rgb", camera_hz, 0.045),
                              ("depth", camera_hz, 0.05),
                              ("hand", camera_hz, 0.055)):
        t = jittered_clock(rng, hz, start, duration_s)
        pd.DataFrame({"time": stamps(t), "id": np.arange(1, len(t) + 1),
                      "timegap": t}).to_csv(
            os.path.join(ep_dir, f"{stream}.csv"))
    t = jittered_clock(rng, 10, 0.08, duration_s)
    scans = ["[" + ",".join(f"{v:.3f}" for v in rng.uniform(0.2, 5.0, n_lidar))
             + "]" for _ in t]
    pd.DataFrame({"data": scans, "time": stamps(t), "timegap": t}).to_csv(
        os.path.join(ep_dir, "LiDAR.csv"))
    t = jittered_clock(rng, 50, 0.02, duration_s)
    pd.DataFrame({"datetime": stamps(t), "timegap": t,
                  "weight": np.round(rng.normal(210, 3, len(t)), 1)}).to_csv(
        os.path.join(ep_dir, "hand_weight.csv"))
    t = jittered_clock(rng, 43, 0.01, duration_s)
    chunks = ["[" + ",".join(f"{v:.1f}" for v in rng.normal(0, 300, n_mic))
              + "]" for _ in t]
    pd.DataFrame({"data": chunks, "time": stamps(t), "timegap": t}).to_csv(
        os.path.join(ep_dir, "Microphone.csv"))
    pd.DataFrame([{"drop_end": round(drop_start + 0.5, 1),
                   "drop_start": drop_start}]).to_csv(
        os.path.join(ep_dir, "drop_time.csv"))


def test_reference_legacy_etl_execution_parity(ref, monkeypatch, tmp_path):
    """Execute the reference's OLDER ETL generation —
    datasets/data_preprocess.hsr_preprocess (lines 82-168) VERBATIM, cursor
    scans, column assembly, labels, CSV write and all — on a synthetic
    capture tree, and assert `--variant legacy`
    (data/etl.hsr_preprocess_legacy) reproduces it: same grid, same
    selected samples, same LiDAR/Mic columns, same labels.

    Documented intended-fix deviation (SURVEY.md §2: implement intent, not
    bugs): the reference stores the COLUMN INDEX 0 as Mic0000's value
    (data_preprocess.py:135 writes `mi_idx`, not `mi_data`); ours stores
    the sample value.  The assertion pins BOTH behaviors."""
    import pandas as pd

    from icra2021_multimodal_ad_tpu.data.etl import hsr_preprocess_legacy

    dp = _load_ref_module("datasets/data_preprocess.py", "ref_data_preproc")
    _patch_df_append(monkeypatch)

    root = tmp_path / "cap"
    eps = ["ep0", "ep1"]
    rng = np.random.default_rng(40)
    for name in eps:
        _write_episode_legacy(str(root / "data" / name / "data"), rng)

    # the reference's full per-tree loop (listdir order is irrelevant: rows
    # carry data_dir and the comparison groups on it)
    dp.hsr_preprocess("/unused", "cap/", "data_sum", str(tmp_path))
    ref_df = pd.read_csv(tmp_path / "cap" / "data_sum.csv", index_col=0)

    out = str(tmp_path / "ours.csv")
    hsr_preprocess_legacy(str(root / "data"), out, episodes=eps, n_lidar=12)
    our_df = pd.read_csv(out, index_col=0)

    lidar_cols = [c for c in ref_df.columns if c.startswith("LiDAR")]
    mic_cols = [c for c in ref_df.columns if c.startswith("Mic")]
    assert lidar_cols == [f"LiDAR{i:03d}" for i in range(12)]
    assert mic_cols == [f"Mic{i:04d}" for i in range(8)]
    assert set(our_df.columns) >= set(ref_df.columns) - {"Unnamed: 0"}

    for name in eps:
        r = ref_df[ref_df["data_dir"] == name].reset_index(drop=True)
        o = our_df[our_df["data_dir"] == name].reset_index(drop=True)
        # the reference's `now += 0.1` float accumulation can overshoot the
        # drop_start+0.5 bound by ~1e-15 and drop the final grid row; our
        # exact grid always includes it (same bound as the current-variant
        # oracle above)
        assert 0 <= len(o) - len(r) <= 1, (name, len(o), len(r))
        n = len(r)
        o = o.iloc[:n]
        np.testing.assert_allclose(o["now_timegap"].to_numpy(),
                                   r["now_timegap"].to_numpy(), atol=1e-6)
        for col in ("cur_rgb_id", "cur_depth_id", "cur_hand_id", "label"):
            np.testing.assert_array_equal(
                o[col].to_numpy(float), r[col].to_numpy(float),
                err_msg=f"{name}:{col}")
        np.testing.assert_allclose(o["cur_hand_weight"].to_numpy(),
                                   r["cur_hand_weight"].to_numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(o[lidar_cols].to_numpy(),
                                   r[lidar_cols].to_numpy(), atol=1e-5,
                                   err_msg=name)
        # Mic0001.. carry the sample values in both
        np.testing.assert_allclose(o[mic_cols[1:]].to_numpy(),
                                   r[mic_cols[1:]].to_numpy(), atol=1e-5,
                                   err_msg=name)
        # the Mic0000 deviation: reference wrote the index (always 0),
        # ours writes the sample value — verify ours against the
        # reference's OWN find_mic_data selection
        assert (r["Mic0000"].to_numpy(float) == 0).all()
        assert not (o["Mic0000"].to_numpy(float) == 0).all()
    assert len(ref_df) > 40  # the tree produced a real grid, not a stub


def test_reference_timesync_prototype_execution_parity(ref, monkeypatch,
                                                       tmp_path):
    """Execute the reference's EARLIEST ETL prototype —
    youngjae/preprocess/make_timesync_csv_file.get_dataset (lines 13-62),
    whose module-level reads are redirected via $HOME — and assert
    `--variant frames` (data/etl.make_timesync_frames) reproduces its
    frame-driven alignment: per-RGB-frame windows, first depth/LiDAR/weight
    sample in each, same ids/values.

    Documented deviations (intent, not bugs): the prototype writes its
    dummy seed row and NaN rows for windows where some stream has no
    sample (its scans return None there); ours drops both."""
    import ast

    import pandas as pd

    from icra2021_multimodal_ad_tpu.data.etl import make_timesync_frames

    rng = np.random.default_rng(41)
    home = tmp_path / "home"
    ep = tmp_path / "ep" / "data"
    os.makedirs(home / "youngjae" / "data")
    os.makedirs(home / "data")
    os.makedirs(ep)

    from icra2021_multimodal_ad_tpu.data.synthetic import jittered_clock

    def stamps(t):
        return [f"2021-01-01 00:00:{v:06.3f}" for v in t]

    # 0-BASED ids: the prototype's `next_timegap = df_rgb.values[id][3]`
    # (line 52) positionally indexes the [1:]-sliced frame with the id
    # VALUE, which lands on the next row only when ids start at 0
    frames = {}
    for stream, hz, start in (("rgb", 25, 0.045), ("depth", 25, 0.05)):
        t = jittered_clock(rng, hz, start, 3.0)
        frames[stream] = pd.DataFrame(
            {"time": stamps(t), "id": np.arange(len(t)), "timegap": t})
    t = jittered_clock(rng, 10, 0.08, 3.0)
    scans = ["[" + ",".join(f"{v:.3f}" for v in rng.uniform(0.2, 5.0, 10))
             + "]" for _ in t]
    frames["LiDAR"] = pd.DataFrame(
        {"data": scans, "time": stamps(t), "timegap": t})
    t = jittered_clock(rng, 50, 0.02, 3.0)
    frames["hand_weight"] = pd.DataFrame(
        {"datetime": stamps(t), "timegap": t,
         "weight": np.round(rng.normal(210, 3, len(t)), 1)})

    # the prototype's hardcoded read locations (lines 4-7) and our episode
    # layout get the SAME frames
    frames["rgb"].to_csv(home / "youngjae" / "data" / "rgb.csv")
    frames["depth"].to_csv(home / "data" / "depth.csv")
    frames["LiDAR"].to_csv(home / "LiDAR.csv")
    frames["hand_weight"].to_csv(home / "youngjae" / "data" /
                                 "hand_weight.csv")
    for stream in frames:
        frames[stream].to_csv(ep / f"{stream}.csv")

    _patch_df_append(monkeypatch)
    monkeypatch.chdir(tmp_path)  # get_dataset writes ./data_sum.csv
    proto = _load_ref_module(
        "youngjae/preprocess/make_timesync_csv_file.py",
        "ref_timesync_proto", monkeypatch=monkeypatch, home=home)
    proto.get_dataset()
    ref_df = pd.read_csv(tmp_path / "data_sum.csv", index_col=0)

    ours = make_timesync_frames(str(ep))

    # drop the prototype's dummy seed row, then its NaN rows (windows where
    # some stream had no sample — ours drops those)
    r = ref_df.iloc[1:]
    complete = r[["cur_depth_id", "cur_hand_weight",
                  "cur_LiDAR_data"]].notna().all(axis=1)
    assert complete.sum() < len(r), "no NaN windows: the drop path is idle"
    r = r[complete].reset_index(drop=True)
    assert len(r) > 30
    # one more documented scan artifact: the prototype's cursor slices
    # exclude each stream's FINAL sample (values[cursor:-1], lines 15,22,31),
    # so tail windows whose only match is a last sample go NaN there while
    # ours keeps them — align on the window timestamp; every prototype-kept
    # window must exist in ours with identical values, and the extras are
    # bounded by the boundary windows of the three scanned streams
    assert 0 <= len(ours) - len(r) <= 3, (len(ours), len(r))
    ot = ours["now_timegap"].to_numpy()
    rt = r["now_timegap"].to_numpy(float)
    pos = np.searchsorted(ot, rt - 1e-9)
    np.testing.assert_allclose(ot[pos], rt, atol=1e-6)
    sel = ours.iloc[pos].reset_index(drop=True)

    np.testing.assert_allclose(sel["next_timegap"].to_numpy(),
                               r["next_timegap"].to_numpy(float), atol=1e-6)
    for col in ("cur_rgb_id", "cur_depth_id"):
        np.testing.assert_array_equal(sel[col].to_numpy(float),
                                      r[col].to_numpy(float), err_msg=col)
    np.testing.assert_allclose(sel["cur_hand_weight"].to_numpy(),
                               r["cur_hand_weight"].to_numpy(float),
                               atol=1e-6)
    # the prototype stores each scan as a LIST OF STRINGS in one cell
    # (line 24-25 splits without float()); ours parses float columns
    ref_lidar = np.asarray(
        [[float(v) for v in ast.literal_eval(cell)]
         for cell in r["cur_LiDAR_data"]], dtype=np.float32)
    lidar_cols = [c for c in ours.columns if c.startswith("LiDAR")]
    np.testing.assert_allclose(sel[lidar_cols].to_numpy(), ref_lidar,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# grid-search runner (C18): the reference Repeater's expansion executed
# ---------------------------------------------------------------------------


#: Driver for the reference Repeater.run, executed in a FRESH python
#: subprocess: the reference's multiprocessing.Pool forks its workers, and
#: fork under this multithreaded JAX test process is the documented
#: deadlock RuntimeWarning — a hang there would take the whole suite down.
#: A clean child process is single-threaded pure python, so the reference's
#: own fork-based Pool path still executes, safely (the same
#: subprocess-isolation pattern as test_distributed_multiprocess.py).
_REPEATER_DRIVER = r"""
import argparse, importlib.util, json, random, sys

ref_path, seed, grid = sys.argv[1], int(sys.argv[2]), json.loads(sys.argv[3])
spec = importlib.util.spec_from_file_location("ref_repeater", ref_path)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)


def probe(config):
    # picklable sweep body: returns the expanded config's fields so the
    # parent can inspect exactly what each worker received
    return dict(vars(config))


ns = argparse.Namespace()
for k, v in grid.items():
    setattr(ns, k, list(v))
ns.gpu_id = [0, 1]  # two "GPUs" -> Pool(2) + staggered sleep for both
repeater = mod.Repeater(ns, probe, interval=3)
random.seed(seed)
rows = repeater.run()  # Pool.map preserves input (execution) order
print(json.dumps({"rows": rows, "gpu_id_after": ns.gpu_id}))
"""


def test_reference_repeater_expansion_execution_parity(ref):
    """Execute the reference Repeater.run (utils/repeater.py:25-62) — the
    cartesian product over config fields, the global-random shuffle, the
    progress numbering, the gpu_id placeholder swap, the Pool map — and
    assert utils/repeater.expand_grid produces the same grid points in the
    same execution order with the same progress numbers.  convert's list
    parsing (repeater.py:64-71) is asserted against the reference's too.

    Order parity is well-defined because both shuffles are the Mersenne
    Twister Fisher-Yates: random.seed(S) + random.shuffle (reference,
    line 50, unseeded in production — seeded here) permutes identically to
    our seeded random.Random(S).shuffle."""
    import json
    import subprocess
    import sys

    from icra2021_multimodal_ad_tpu.utils.repeater import convert, expand_grid

    rep_mod = _load_ref_module("utils/repeater.py", "ref_repeater")

    # convert parity (pure function — safe to execute in-process)
    for x, to in (("1,2,3", int), ("0.1,0.2", float), ("7", int),
                  ("a,b", str), (5, int), (None, int)):
        assert convert(x, to=to) == rep_mod.convert(x, to=to), (x, to)

    grid = {
        "btl_size": [10, 20],
        "n_layers": [2, 3, 4],
        "lr": [0.001],
    }
    seed = 123

    # Repeater.run (and its fork-based Pool) executes in a fresh
    # subprocess — see _REPEATER_DRIVER
    proc = subprocess.run(
        [sys.executable, "-c", _REPEATER_DRIVER,
         os.path.join(REF, "utils/repeater.py"), str(seed),
         json.dumps(grid)],
        capture_output=True, text=True, timeout=180)
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    ref_rows = payload["rows"]

    ours = expand_grid(grid, shuffle=True, seed=seed)

    assert len(ref_rows) == len(ours) == 6
    for i, (r, o) in enumerate(zip(ref_rows, ours)):
        for k in grid:
            assert r[k] == o[k], (i, k)
        assert r["progress"] == o["progress"] == i + 1
        # reference post-expansion fixups: the full gpu_id list restored on
        # every point, sleep staggered for the first len(gpu_id) points
        assert r["gpu_id"] == [0, 1]
        assert r["sleep"] == (3 * i if i < 2 else 0)
    # the caller's namespace got its gpu_id back (repeater.py:60)
    assert payload["gpu_id_after"] == [0, 1]
