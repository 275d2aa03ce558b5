from xrseg_tpu.ops import nms, masks, postprocess, preprocess, wbf, yuv  # noqa: F401
