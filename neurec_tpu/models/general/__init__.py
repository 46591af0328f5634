from neurec_tpu.models.general.mf import MF  # noqa: F401
