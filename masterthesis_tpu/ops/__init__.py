from masterthesis_tpu.ops.norms import (  # noqa: F401
    AdaptiveInstanceNorm,
    InstanceNorm,
    LayerNorm,
    adain,
    instance_norm,
    layer_norm,
)
from masterthesis_tpu.ops.initializers import (  # noqa: F401
    get_conv_init,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
