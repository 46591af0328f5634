from neurec_tpu.data.dataset import Dataset  # noqa: F401
from neurec_tpu.data.padded import PaddedUserItems, build_padded_positives  # noqa: F401
