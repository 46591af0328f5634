from neurec_tpu.models.base import (  # noqa: F401
    Recommender,
    get_model,
    register,
    registered_models,
)
