from xrseg_tpu.models import layers, yolo11  # noqa: F401
from xrseg_tpu.models.yolo11 import (  # noqa: F401
    forward, init_params, make_anchors, model_info)
