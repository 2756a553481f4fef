"""Single configuration module shared by every entry point.

The reference duplicates a ~30-flag argparse block across three entry points
(novelty_detection.py:131-174, test_file/FullTest.py:206-249,
test_file/realtime_tester.py:230-258).  Here there is exactly one `Config`
dataclass; every CLI builds it through `get_config()`.  Flag names are kept
for CLI parity.  New, TPU-specific knobs (seed, mesh shape, dtype) are added
at the bottom — the reference's fusion weights were *unseeded* random at data
load time (utils/data_loaders.py:400-424), which made absolute scores
irreproducible; we make the seed explicit instead.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any, Optional, Sequence


@dataclass
class Config:
    # -- training ---------------------------------------------------------
    n_epochs: int = 20
    batch_size: int = 7000
    slicing_size: int = 56000
    lr: float = 1e-3
    gpu_id: int = 0               # kept for CLI parity; ignored (device = TPU)
    verbose: int = 2

    # -- task -------------------------------------------------------------
    data: str = "hsr_objectdrop"
    unimodal_normal: bool = False
    target_class: Any = 1

    novelty_ratio: float = 0.0
    btl_size: int = 100
    n_layers: int = 5

    start_layer_index: int = 0
    end_layer_index: int = -1
    from_: str = "youngjae"       # reference flag is `--from`

    folder_name: str = "hsr_objectdrop/"
    models: str = "ae"
    save_mode: bool = False

    # -- data -------------------------------------------------------------
    data_folder_name: str = "data/hsr_dropobject/"
    file_name: str = "data_sum"
    sensor: str = "All"           # All hand_camera force_torque head_depth mic LiDAR
    saved_name: str = "datasets/All.ckpt"
    saved_data: str = "All"
    saved_result: str = "result/All"
    object_select_mode: bool = False
    object_type: str = "book"
    train_diffs: str = "datasets/All_train_diffs.npz"

    # -- variational information bottleneck (decorators/
    #    variational_info_bottleneck.py via modules/fc_module.py:59-61) -----
    distribution: Optional[str] = None  # None (identity) | "normal"
    k: int = 1                          # reparameterization sample count
    stochastic_inference: bool = False  # sample z at eval time (the
    # reference decorator defaults this to True but its entry points never
    # invoke normal mode; deterministic eval keeps RaPP/NAP scores stable)

    # -- filled in post-parse (reference mutates argparse namespace) -------
    input_size: Optional[int] = None

    # -- mid-training checkpoint/resume (beyond the reference: SURVEY.md §5
    #    notes it had no optimizer/epoch resume) ---------------------------
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 0   # save every N epochs (0 = off)
    resume: bool = False        # continue from checkpoint_path if present

    # -- plots (utils/metric.py:49-60,102-113 `show` flags, headless) ------
    roc_plot_path: Optional[str] = None  # save the NAP ROC curve here
    pr_plot_path: Optional[str] = None   # save the NAP PR curve here

    # -- TPU-native additions ----------------------------------------------
    nap_fit_method: str = "svd"   # "svd" (exact, reference semantics) |
    # "gram" (Gram+eigh: mesh-shardable without gathering the diffs, and
    # slightly faster single-chip; differs in numerically-null directions)
    seed: int = 0                 # PRNG seed for init, shuffle, fusion weights
    mesh_shape: Optional[int] = None  # devices on the 'data' mesh axis (None = all)
    param_dtype: str = "float32"
    compute_dtype: str = "float32"    # bfloat16 supported on the scoring path
    nap_quant: Optional[str] = None   # "int8": NAP whitening matmul on the
    # MXU int8 path (2x the bf16 peak; static per-feature scales from the
    # train-diff abs-max recorded in the stats file + dynamic per-row x
    # quant, per-column V quant, fp32 epilogue) — serving-only opt-in,
    # deploy behind ops/serving.nap_accuracy_guard(nap_quant="int8").
    train_dtype: str = "float32"  # "bfloat16": opt-in mixed-precision
    # training — fp32 master params/Adam/BN stats, bf16 matmul operands
    # with fp32 MXU accumulation, fp32 loss.  The eval/NAP-fit path stays
    # exact fp32 regardless (the SVD consumes fp32-HIGHEST diffs of the
    # fp32 master params).  See train.py NoveltyDetecter.train.
    feature_cache: int = 1        # 1: cache fused features on disk under
    # <data_folder_name>/.feature_cache, keyed by shard contents + seed +
    # sensor + slicing + object filter + fusion weights; repeated CLI runs
    # and model-only sweep grid points skip the whole decode+fuse build.
    # 0: always rebuild.  (int, not bool: store_true flags can't be
    # disabled from the CLI.)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


# Sensor name -> fused feature width.  Mirrors utils/data_loaders.py:16-29.
SENSOR_INPUT_SIZES = {
    "All": 1728,
    "hand_camera": 1024,
    "force_torque": 64,
    "head_depth": 512,
    "LiDAR": 2048,
    "mic": 128,
}


def get_input_size(config: Config) -> int:
    """Fused feature width per sensor selection (utils/data_loaders.py:16-29)."""
    if config.sensor not in SENSOR_INPUT_SIZES:
        raise ValueError(
            f"unknown --sensor {config.sensor!r}; choose one of "
            f"{sorted(SENSOR_INPUT_SIZES)}"
        )
    return SENSOR_INPUT_SIZES[config.sensor]


def _add_flags(p: argparse.ArgumentParser) -> None:
    """Every flag defaults to argparse.SUPPRESS: parse_args() then yields
    ONLY the flags actually typed (including prefix abbreviations like
    `--slicing`, which argparse resolves to slicing_size) — exact
    explicitness detection for the fixup below; untyped fields take the
    Config dataclass defaults."""
    defaults = Config()
    for f in dataclasses.fields(Config):
        name = "--" + ("from" if f.name == "from_" else f.name)
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            p.add_argument(name, action="store_true",
                           default=argparse.SUPPRESS)
        elif f.name == "target_class":
            p.add_argument(name, type=str, default=argparse.SUPPRESS)
        elif f.name in ("input_size", "mesh_shape"):
            p.add_argument(name, type=int, default=argparse.SUPPRESS)
        elif f.name == "distribution":
            # "none" is typable on the CLI and maps back to identity mode
            p.add_argument(name, type=str, default=argparse.SUPPRESS,
                           choices=["none", "normal"])
        elif default is None:
            p.add_argument(name, type=str, default=argparse.SUPPRESS)
        else:
            p.add_argument(name, type=type(default),
                           default=argparse.SUPPRESS)


def get_config(argv: Optional[Sequence[str]] = None, **overrides) -> Config:
    """Parse CLI flags into a Config.

    Replicates the post-parse fixups of novelty_detection.py:171-173: any
    `file_name` other than 'data_sum' downgrades `slicing_size` to 7000.
    (The reference used `is not`, a string-identity bug that fired on every
    run; we implement the intended `!=` comparison.)
    """
    p = argparse.ArgumentParser(description="TPU-native multimodal anomaly detection")
    _add_flags(p)
    ns = p.parse_args(argv)
    kw = vars(ns)  # ONLY flags actually typed (SUPPRESS defaults)
    if "from" in kw:
        kw["from_"] = kw.pop("from")
    if kw.get("distribution") in ("none", "None"):
        kw["distribution"] = None
    cli_explicit = set(kw)
    cfg = Config(**kw)
    if overrides:
        cfg = cfg.replace(**overrides)
    # fixup AFTER overrides so get_config(file_name=...) and the equivalent
    # CLI flag produce the same config — but an EXPLICIT slicing_size
    # (programmatic override OR a --slicing_size flag actually typed on the
    # command line, abbreviations included) wins over the downgrade: the
    # fixup exists to correct the default, not to clobber a deliberate
    # choice
    if (cfg.file_name != "data_sum" and "slicing_size" not in overrides
            and "slicing_size" not in cli_explicit):
        cfg = cfg.replace(slicing_size=7000)
    return cfg


#: fields that determine the model architecture / feature pipeline a
#: checkpoint was built with — eval CLIs adopt the checkpoint's values when
#: they differ from the flags (a mismatch would otherwise surface as an
#: opaque shape error, or worse, silently mismatched fusion features)
CHECKPOINT_MODEL_FIELDS = (
    "sensor", "input_size", "n_layers", "btl_size", "models",
    "distribution", "k", "seed",
)


def reconcile_model_config(cfg: Config, meta: Optional[dict],
                           verbose: bool = True) -> Config:
    """Overlay the model-shape fields recorded in a checkpoint's saved
    config (utils/checkpoint.save_checkpoint(config=...)) onto `cfg`.
    Checkpoints without a saved config are returned unchanged — the flags
    must then match the training run, as in the reference."""
    saved = (meta or {}).get("config") or {}
    updates = {f: saved[f] for f in CHECKPOINT_MODEL_FIELDS
               if f in saved and saved[f] != getattr(cfg, f)}
    if updates:
        if verbose:
            print("checkpoint config overrides flags:", updates)
        cfg = cfg.replace(**updates)
    return cfg


def load_data_registry(path: Optional[str] = None) -> dict:
    """Dataset registry; mirrors datasets/data_config.json consumed at
    utils/data_loaders.py:53-57."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "data", "data_config.json")
    with open(path, "r") as f:
        return json.load(f)
