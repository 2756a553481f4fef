"""Model stack: FC layers/modules, autoencoder, builder, VIB, losses."""

from icra2021_multimodal_ad_tpu.models.layers import (  # noqa: F401
    FCLayerSpec,
    fc_layer_init,
    fc_layer_apply,
    activation,
    ACTIVATIONS,
)
from icra2021_multimodal_ad_tpu.models.fc_module import (  # noqa: F401
    FCModuleSpec,
    fc_module_spec,
    fc_module_init,
    fc_module_apply,
    fc_module_apply_taps,
)
from icra2021_multimodal_ad_tpu.models.losses import loss_fn  # noqa: F401
from icra2021_multimodal_ad_tpu.models.autoencoder import (  # noqa: F401
    AutoEncoder,
    ae_init,
    ae_forward,
    ae_encode,
    ae_decode,
    ae_loss,
)
from icra2021_multimodal_ad_tpu.models.builder import (  # noqa: F401
    get_hidden_layer_sizes,
    build_autoencoder,
    get_model,
)
from icra2021_multimodal_ad_tpu.models.vib import reparameterize_normal, vib_forward  # noqa: F401
