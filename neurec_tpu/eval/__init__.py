from neurec_tpu.eval.evaluator import (  # noqa: F401
    Evaluator,
    GroupedEvaluator,
    UniEvaluator,
)
