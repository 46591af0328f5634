from neurec_tpu.models.sequential.fpmc import FPMC  # noqa: F401
from neurec_tpu.models.sequential.fpmcplus import FPMCplus  # noqa: F401
from neurec_tpu.models.sequential.hrm import HRM  # noqa: F401
from neurec_tpu.models.sequential.npe import NPE  # noqa: F401
from neurec_tpu.models.sequential.transrec import TransRec  # noqa: F401
from neurec_tpu.models.sequential.sasrec import SASRec  # noqa: F401
from neurec_tpu.models.sequential.gru4rec import GRU4Rec  # noqa: F401
