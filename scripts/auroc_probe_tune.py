#!/usr/bin/env python
"""Tune the bench AUROC probe's anomaly_scale (VERDICT r4 weak #2).

The r4 probe saturated: every scorer — right or subtly wrong — measured
AUROC 1.0 on the default synthetic task, so BASELINE.md row 3's parity
signal could not catch a scoring regression.  This script sweeps
generate_data_sum_shards(anomaly_scale, vary_severity=True) under the
EXACT bench probe configuration (bench.py sec_auroc: 2000 rows, 40
epochs, batch 256, lr 3e-3, target_class=1, seed 0) and prints the
BASE/SAP/NAP AUROC triple per scale, so the pinned bench band is chosen
from measurement, not hope.

CPU-friendly (forces the CPU backend the way tests/conftest.py does);
the chosen scale is then validated on the real chip by a bench run.

    python scripts/auroc_probe_tune.py [--scales 0.08,0.12,0.2]
"""

import argparse
import os
import sys
import tempfile
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_scale(scale: float, seed: int = 0) -> dict:
    from icra2021_multimodal_ad_tpu.config import Config, get_input_size
    from icra2021_multimodal_ad_tpu.data.dataset import get_loaders
    from icra2021_multimodal_ad_tpu.data.synthetic import (
        generate_data_sum_shards,
    )
    from icra2021_multimodal_ad_tpu.models.builder import get_model
    from icra2021_multimodal_ad_tpu.train import NoveltyDetecter

    root = tempfile.mkdtemp(prefix=f"auroc_tune_{scale}_")
    n_rows = 2000
    generate_data_sum_shards(root, n_episodes=n_rows // 40,
                             steps_per_episode=40, n_shards=2,
                             n_lidar=963, seed=seed,
                             anomaly_scale=scale, vary_severity=True)
    cfg = Config(sensor="All", n_layers=5, btl_size=100, verbose=0,
                 seed=0, data_folder_name=root, slicing_size=n_rows,
                 feature_cache=0, n_epochs=40, batch_size=256, lr=3e-3,
                 target_class=1)
    cfg = cfg.replace(input_size=get_input_size(cfg))
    model, params, state = get_model(cfg)
    dm, trl, val, tel = get_loaders(cfg)
    train_x, _ = dm.get_transformed_data(trl)
    valid_x, _ = dm.get_transformed_data(val)
    test_x, test_y = dm.get_transformed_data(tel)
    det = NoveltyDetecter(cfg)
    r = det.train(model, jax.tree.map(jnp.copy, params),
                  jax.tree.map(jnp.copy, state), train_x, valid_x,
                  fused=True)
    rb, rs, rn = det.test(model, r.params, r.state, train_x, valid_x,
                          test_x, test_y)
    return {"scale": scale,
            "base": round(float(rb.auroc), 4),
            "sap": round(float(rs.auroc), 4),
            "nap": round(float(rn.auroc), 4),
            "n_test": int(np.asarray(test_y).size)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="0.05,0.08,0.12,0.18,0.3")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    for s in (float(x) for x in args.scales.split(",")):
        print(run_scale(s, seed=args.seed), flush=True)


if __name__ == "__main__":
    main()
