from neurec_tpu.models.social.sbpr import SBPR  # noqa: F401
from neurec_tpu.models.social.diffnet import DiffNet  # noqa: F401
