from xrseg_tpu.perception import camera, tracking  # noqa: F401
