from xrseg_tpu.runtime import frame_source, tracing  # noqa: F401
from xrseg_tpu.runtime.executor import ExecState, Executor, FrameResult  # noqa: F401
from xrseg_tpu.runtime.xr_loop import (ControllerState, XRLoop,  # noqa: F401
                                       aim_controller_at_frame_point)
from xrseg_tpu.runtime.permissions import (CameraPermissions,  # noqa: F401
                                           ManagedFrameSource,
                                           ManagedSourceState,
                                           PermissionProvider)
