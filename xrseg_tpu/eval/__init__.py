from xrseg_tpu.eval import metrics  # noqa: F401
from xrseg_tpu.eval.metrics import Detection, GroundTruth, evaluate  # noqa: F401
