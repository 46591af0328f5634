from neurec_tpu.models.general.mf import MF  # noqa: F401
from neurec_tpu.models.general.mlp import MLP  # noqa: F401
from neurec_tpu.models.general.neumf import NeuMF  # noqa: F401
from neurec_tpu.models.general.pop import Pop  # noqa: F401
from neurec_tpu.models.general.multivae import MultiVAE  # noqa: F401
from neurec_tpu.models.general.multidae import MultiDAE  # noqa: F401
from neurec_tpu.models.general.dae import DAE  # noqa: F401
from neurec_tpu.models.general.cdae import CDAE  # noqa: F401
