from semivl_tpu.evaluation.metrics import intersection_and_union
from semivl_tpu.evaluation.predict import Evaluator

__all__ = ["intersection_and_union", "Evaluator"]
