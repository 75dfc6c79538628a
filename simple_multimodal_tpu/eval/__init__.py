from .evaluator import ModelEvaluator
from .metrics import calculate_metrics
