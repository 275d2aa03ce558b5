from xrseg_tpu.runtime import frame_source, tracing  # noqa: F401
from xrseg_tpu.runtime.executor import ExecState, Executor, FrameResult  # noqa: F401
