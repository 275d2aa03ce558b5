from xrseg_tpu.models import layers, yolo11  # noqa: F401
from xrseg_tpu.models.yolo11 import init_params, forward, make_anchors  # noqa: F401
