"""Model builder — capability parity with model_builder.py:6-53 and
utils/common_utils.py:22-31.

Builds a symmetric FC autoencoder with linearly-interpolated hidden sizes:
for the canonical config (input 1728, bottleneck 100, n_layers 5) the encoder
is 1728 -> 1402 -> 1076 -> 751 -> 425 -> 100 and the decoder mirrors it.
Every layer is Linear -> LeakyReLU(0.2) -> BatchNorm1d except the final layer
of each module (Linear only).
"""

from __future__ import annotations

from typing import List

import jax

from icra2021_multimodal_ad_tpu.config import Config
from icra2021_multimodal_ad_tpu.models.autoencoder import AutoEncoder, ae_init
from icra2021_multimodal_ad_tpu.models.fc_module import fc_module_spec


def get_hidden_layer_sizes(start_size: int, end_size: int,
                           n_hidden_layers: int) -> List[int]:
    """Linear interpolation, truncated to int (common_utils.py:22-31).
    Handles both increasing and decreasing direction."""
    diff = (start_size - end_size) / (n_hidden_layers + 1)
    return [int(start_size - diff * (idx + 1)) for idx in range(n_hidden_layers)]


def build_autoencoder(config: Config) -> AutoEncoder:
    """model_builder.py:6-43 `ae_wrapper` equivalent.  `config.input_size`
    defaults to None on the dataclass; resolve it from the sensor table
    (get_input_size) instead of crashing on an unpacking TypeError when a
    caller skips the cfg.replace(input_size=...) step."""
    input_size = config.input_size
    if input_size is None:
        from icra2021_multimodal_ad_tpu.config import get_input_size

        input_size = get_input_size(config)
    if not isinstance(input_size, int):
        c, h, w = input_size
        input_size = c * h * w

    # VIB normal mode: the encoder's last layer is double-width so the
    # decorator's split(output.size(-1) // 2) yields btl_size-dim mu and
    # logvar (variational_info_bottleneck.py:33-35); the decoder consumes
    # the btl_size-dim z samples.  Identity mode (distribution None, the
    # reference's only exercised path) is unchanged.
    distribution = getattr(config, "distribution", None)
    enc_out = config.btl_size * (2 if distribution == "normal" else 1)

    encoder = fc_module_spec(
        input_size=input_size,
        output_size=enc_out,
        hidden_sizes=get_hidden_layer_sizes(
            input_size, config.btl_size, n_hidden_layers=config.n_layers - 1
        ),
        use_batch_norm=True,
        act="leakyrelu",
        last_act=None,
    )
    decoder = fc_module_spec(
        input_size=config.btl_size,
        output_size=input_size,
        hidden_sizes=get_hidden_layer_sizes(
            config.btl_size, input_size, n_hidden_layers=config.n_layers - 1
        ),
        use_batch_norm=True,
        act="leakyrelu",
        last_act=None,
    )
    return AutoEncoder(
        encoder=encoder, decoder=decoder,
        recon_loss="mse", loss_reduction="sum",
        distribution=distribution,
        k=getattr(config, "k", 1),
        stochastic_inference=getattr(config, "stochastic_inference", False),
    )


def get_model(config: Config, key: jax.Array | None = None):
    """model_builder.py:48-53 equivalent; returns (model, params, state).

    Device placement is implicit: arrays land on the default (TPU) device.
    The reference's `.cuda(gpu_id)` has no analog — sharding is chosen by the
    caller via jax.sharding when training multi-chip.
    """
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    model = build_autoencoder(config)
    dtype = None
    if getattr(config, "param_dtype", "float32") == "bfloat16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16  # BN running stats stay fp32 (fc_layer_init)
    params, state = (ae_init(key, model, dtype) if dtype is not None
                     else ae_init(key, model))
    return model, params, state
