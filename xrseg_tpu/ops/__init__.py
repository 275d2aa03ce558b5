from xrseg_tpu.ops import nms, masks, postprocess, preprocess, yuv  # noqa: F401
