"""Core numeric ops: whitening, metrics, RaPP scoring, MFCC, image, fusion."""

from icra2021_multimodal_ad_tpu.ops.normalize import (  # noqa: F401
    Standardizer,
    Rotater,
    Truncater,
    standardizer_fit,
    standardizer_run,
    rotater_fit,
    rotater_run,
    truncater_run,
)
from icra2021_multimodal_ad_tpu.ops.metrics import (  # noqa: F401
    roc_curve,
    precision_recall_curve,
    auc,
    get_auc_roc,
    get_auc_prc,
    get_f1_score,
    get_confusion_matrix,
    get_norm,
)
from icra2021_multimodal_ad_tpu.ops.scoring import (  # noqa: F401
    get_recon_loss,
    get_d_loss,
    get_d_norm_loss,
    nap_fit,
    nap_fit_sharded,
    nap_transform,
    load_nap_stats,
    save_nap_stats,
    ScoreReport,
)
from icra2021_multimodal_ad_tpu.ops.rapp import get_diffs  # noqa: F401
from icra2021_multimodal_ad_tpu.ops.serving import (  # noqa: F401
    make_serving,
    serving_ae_forward,
    serving_diffs_batch,
    bf16_accuracy_guard,
    nap_accuracy_guard,
    nap_int8_pack,
    NapInt8Pack,
    export_base_scorer,
    export_nap_scorer,
    export_nap_window_scorer,
    load_scorer,
)
