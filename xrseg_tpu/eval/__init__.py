from xrseg_tpu.eval import dataset_eval, metrics  # noqa: F401
from xrseg_tpu.eval.dataset_eval import evaluate_dataset  # noqa: F401
from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate  # noqa: F401
