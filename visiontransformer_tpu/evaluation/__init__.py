from visiontransformer_tpu.evaluation.evaluate import evaluate_model, run_sweep
from visiontransformer_tpu.evaluation.compare import aggregate_metrics

__all__ = ["evaluate_model", "run_sweep", "aggregate_metrics"]
