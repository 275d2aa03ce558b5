from xrseg_tpu.train import data, losses, train_step, trainer  # noqa: F401
