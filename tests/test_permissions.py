"""Permission + availability gating vs the reference's state machines
(PassthroughCameraPermissions.cs:24-93, WebCamTextureManager.cs:40-134)."""
import numpy as np

from xrseg_tpu.runtime.frame_source import FrameSource
from xrseg_tpu.runtime.permissions import (CAMERA_PERMISSIONS,
                                           CameraPermissions,
                                           ManagedFrameSource,
                                           ManagedSourceState,
                                           ScriptedProvider)


class FlakySource(FrameSource):
    """Camera that appears after N failed open() calls (the reference's
    camera-not-found retry loop, WebCamTextureManager.cs:101-133)."""

    def __init__(self, appear_after: int):
        self.appear_after = appear_after
        self.calls = 0

    def open(self) -> bool:
        self.calls += 1
        return self.calls > self.appear_after

    def frames(self):
        from xrseg_tpu.runtime.frame_source import FrameData
        yield FrameData(rgb=np.zeros((4, 4, 3), np.uint8))


def test_grant_flow():
    prov = ScriptedProvider(responses=[{p: True for p in CAMERA_PERMISSIONS}])
    perms = CameraPermissions(prov)
    perms.ask()
    assert perms.has_camera_permission is True
    # ask-once: a second ask never re-prompts (:39-43)
    perms.ask()
    assert prov.request_count == 1


def test_already_granted_skips_dialog():
    prov = ScriptedProvider(initial=CAMERA_PERMISSIONS)
    perms = CameraPermissions(prov)
    perms.ask()
    assert perms.has_camera_permission is True
    assert prov.request_count == 0           # :44-48: no dialog needed


def test_partial_grant_is_not_granted():
    """Only when BOTH permissions land does the flag flip (:72-76)."""
    prov = ScriptedProvider(responses=[{"camera": True,
                                        "headset_camera": False}])
    perms = CameraPermissions(prov)
    perms.ask()
    assert perms.has_camera_permission is False


def test_denial_resets_ask_once_and_retries():
    """Denied -> s_askedOnce reset (:83-88) -> the NEXT ask re-prompts,
    and a later grant succeeds."""
    prov = ScriptedProvider(responses=[
        {p: False for p in CAMERA_PERMISSIONS},      # user denies
        {p: True for p in CAMERA_PERMISSIONS},       # user relents
    ])
    perms = CameraPermissions(prov)
    perms.ask()
    assert perms.has_camera_permission is False
    perms.ask()                                       # re-ask allowed
    assert prov.request_count == 2
    assert perms.has_camera_permission is True


def test_unsupported_device_disables():
    """Unsupported device: manager disables outright (:40-47)."""
    src = ManagedFrameSource(FlakySource(0), is_supported=False)
    src.enable()
    assert src.state == ManagedSourceState.DISABLED
    src.update()
    assert src.state == ManagedSourceState.DISABLED


def test_waits_for_permission_then_initializes():
    """Enable without grant waits (:49-56); Update promotes once the
    grant lands (:73-82)."""
    prov = ScriptedProvider(responses=[
        {p: False for p in CAMERA_PERMISSIONS},
        {p: True for p in CAMERA_PERMISSIONS},
    ])
    perms = CameraPermissions(prov)
    src = ManagedFrameSource(FlakySource(0), permissions=perms)
    src.enable()
    assert src.state == ManagedSourceState.WAITING_PERMISSION
    src.update()                 # denial retry: re-asks, grant lands
    src.update()
    assert src.state == ManagedSourceState.READY
    assert next(iter(src.frames())) is not None


def test_camera_not_found_retry_bounded():
    src = ManagedFrameSource(FlakySource(appear_after=3),
                             max_open_attempts=10)
    src.enable()
    assert src.state == ManagedSourceState.READY
    assert src.open_attempts == 4            # 3 failures + 1 success

    gone = ManagedFrameSource(FlakySource(appear_after=99),
                              max_open_attempts=5)
    gone.enable()
    assert gone.state == ManagedSourceState.FAILED
    assert gone.open_attempts == 5
    try:
        gone.frames()
        assert False, "frames() must refuse when not ready"
    except RuntimeError:
        pass


def test_deploy_check_surfaces_camera_gates():
    from xrseg_tpu.runtime.deploy_check import check_environment
    gone = ManagedFrameSource(FlakySource(appear_after=99),
                              max_open_attempts=2)
    gone.enable()
    res = check_environment(frame_source=gone)
    by_name = {n: (p, d) for n, p, d in res.checks}
    assert by_name["camera_supported"][0]
    assert by_name["camera_permission"][0]    # GrantAllProvider default
    assert not by_name["camera_available"][0]
    assert not res.ok

    ok_src = ManagedFrameSource(FlakySource(0))
    ok_src.enable()
    res2 = check_environment(frame_source=ok_src)
    assert all(p for n, p, d in res2.checks
               if n.startswith("camera"))
