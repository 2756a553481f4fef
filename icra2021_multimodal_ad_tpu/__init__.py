"""icra2021_multimodal_ad_tpu — TPU-native multimodal anomaly-detection framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
Yoo-Youngjae/ICRA2021_multimodal_ad ("Multimodal Anomaly Detection based on
Deep Auto-Encoder for Object Slip Perception of Mobile Manipulation Robots",
ICRA 2021): four robot sensor streams (RGB hand camera, depth camera,
microphone MFCC, force-torque) fused into a 1728-dim window vector, a deep
fully-connected autoencoder trained on normal windows, and three
reconstruction-error anomaly scores (BASE / SAP / NAP — the RaPP
"Reconstruction along Projection Pathway" family).

Everything on the compute path is jittable JAX; parallelism is expressed with
`jax.sharding` over a device mesh (data-parallel over the window axis), and
the hot scoring path has a fused Pallas TPU kernel.

Reference parity map (file:line cites point into the upstream repo):
  models/      <- models/auto_encoder.py, modules/, layers/, model_builder.py
  ops/         <- utils/metric.py, utils/normalize.py,
                  reconstruction_aggregation.py, concatdata_maker.py (MFCC)
  data/        <- utils/data_loaders.py, concatdata_maker.py,
                  datasets/data_preprocess.py
  parallel/    <- (new: the reference is single-device)
  train.py     <- novelty_detection.py NoveltyDetecter
  utils/       <- utils/repeater.py, utils/reporter.py
"""

__version__ = "0.1.0"

from icra2021_multimodal_ad_tpu.config import Config, get_config  # noqa: F401
