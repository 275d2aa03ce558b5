from xrseg_tpu.viz import boxer, labels, masker, pointcloud  # noqa: F401
