from xrseg_tpu.train import losses, train_step  # noqa: F401
