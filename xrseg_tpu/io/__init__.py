from xrseg_tpu.io import weights  # noqa: F401
