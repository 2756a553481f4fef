#!/usr/bin/env python
"""Train + evaluate entry point — CLI parity with the reference's
novelty_detection.py:177-225.

    python novelty_detection.py --sensor All --n_epochs 20 --batch_size 7000

Pipeline: build model -> load fused windows -> train (data-parallel over the
device mesh when >1 device) -> BASE/SAP/NAP evaluation -> result CSV.
"""

import os
import time

import jax

from icra2021_multimodal_ad_tpu.config import get_config, get_input_size
from icra2021_multimodal_ad_tpu.data.dataset import get_loaders
from icra2021_multimodal_ad_tpu.models.builder import get_model
from icra2021_multimodal_ad_tpu.parallel.mesh import get_mesh
from icra2021_multimodal_ad_tpu.train import NoveltyDetecter, report_dataframe
from icra2021_multimodal_ad_tpu.utils.checkpoint import save_checkpoint


def main(config):
    from icra2021_multimodal_ad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # amortize the tunnel's 20-120 s first compiles
    # multi-host pods coordinate here; single host is a silent no-op
    from icra2021_multimodal_ad_tpu.parallel.distributed import (
        initialize_multihost,
    )

    initialize_multihost()

    config = config.replace(input_size=get_input_size(config))
    model, params, state = get_model(config)

    n_dev = config.mesh_shape or len(jax.devices())
    mesh = get_mesh(n_dev) if n_dev > 1 else None
    detecter = NoveltyDetecter(config, mesh=mesh)

    if config.verbose >= 1:
        print(config)
    if config.verbose >= 2:
        print(model)

    dset_manager, train_loader, valid_loader, test_loader = get_loaders(config)
    train_x, _ = dset_manager.get_transformed_data(train_loader)
    valid_x, _ = dset_manager.get_transformed_data(valid_loader)
    test_x, test_y = dset_manager.get_transformed_data(test_loader)

    result = detecter.train(
        model, params, state, train_x, valid_x,
        checkpoint_path=config.checkpoint_path,
        checkpoint_every=config.checkpoint_every,
        resume=config.resume,
    )
    save_checkpoint(config.saved_name, result.params, result.state,
                    config=config)

    base, sap, nap = detecter.test(
        model, result.params, result.state,
        train_x, valid_x, test_x, test_y,
        save_stats_path=config.train_diffs,
    )

    if config.roc_plot_path or config.pr_plot_path:
        # NAP ROC/PR curve plots (utils/metric.py:49-60,102-113 `show`
        # options, rendered headlessly to files)
        from icra2021_multimodal_ad_tpu.train import binarize_labels
        from icra2021_multimodal_ad_tpu.utils.plotting import plot_pr, plot_roc

        label = binarize_labels(config, test_y)
        if config.roc_plot_path:
            print("roc plot:", plot_roc(nap.score, label,
                                        save_path=config.roc_plot_path))
        if config.pr_plot_path:
            print("pr plot:", plot_pr(nap.score, label,
                                      save_path=config.pr_plot_path))

    df = report_dataframe(base, sap, nap)
    out = os.path.join(config.data, "result_csv", config.saved_result + ".csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    df.to_csv(out)

    return (base.auroc, base.aupr), (sap.auroc, sap.aupr), (nap.auroc, nap.aupr)


if __name__ == "__main__":
    config = get_config()
    start = time.time()
    (base_auroc, base_aupr), (sap_auroc, sap_aupr), (nap_auroc, nap_aupr) = main(
        config
    )
    print((time.time() - start) / 60)  # minutes, as the reference prints
    print("BASE AUROC: %.4f AUPR: %.4f" % (base_auroc, base_aupr))
    print("RaPP SAP AUROC: %.4f AUPR: %.4f" % (sap_auroc, sap_aupr))
    print("RaPP NAP AUROC: %.4f AUPR: %.4f" % (nap_auroc, nap_aupr))
