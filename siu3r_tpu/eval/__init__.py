from siu3r_tpu.eval.evaluator import Evaluator  # noqa: F401
