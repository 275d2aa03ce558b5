from xrseg_tpu.train import data, losses, train_step  # noqa: F401
