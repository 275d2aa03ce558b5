from xrseg_tpu.eval import dataset_eval, metrics, mot  # noqa: F401
from xrseg_tpu.eval.dataset_eval import (evaluate_dataset,  # noqa: F401
                                         evaluate_task_dataset)
from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate  # noqa: F401
from xrseg_tpu.eval.mot import evaluate_mot, track_sequence  # noqa: F401
