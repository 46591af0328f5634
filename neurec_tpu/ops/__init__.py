from neurec_tpu.ops.losses import (  # noqa: F401
    pairwise_loss,
    pointwise_loss,
    l2_loss,
    log_loss,
)
from neurec_tpu.ops.initializers import get_initializer  # noqa: F401
