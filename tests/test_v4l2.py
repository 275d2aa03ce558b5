"""V4L2 camera source tests: format negotiation, conversion, retry.

The capture logic is tested against a FakeRawCamera (this environment has
no /dev/video*), exactly how the reference tests its camera layer without
a headset (SURVEY §4); the ioctl layer (V4L2RawCamera) is exercised only
for its pure pieces (fourcc packing, ABI sizes)."""
import io

import numpy as np
import pytest

from xrseg_tpu.runtime import v4l2 as V


# ---------------------------------------------------------------------------
# YUYV conversion vs a scalar reference
# ---------------------------------------------------------------------------

def _yuyv_to_rgb_scalar(buf, w, h):
    out = np.zeros((h, w, 3), np.uint8)
    a = np.frombuffer(buf, np.uint8).reshape(h, w // 2, 4)
    for r in range(h):
        for c in range(w // 2):
            y0, u, y1, v = (float(x) for x in a[r, c])
            for k, y in ((0, y0), (1, y1)):
                rr = y + 1.402 * (v - 128)
                gg = y - 0.344136 * (u - 128) - 0.714136 * (v - 128)
                bb = y + 1.772 * (u - 128)
                out[r, 2 * c + k] = np.clip([rr, gg, bb], 0, 255)
    return out


def test_yuyv_to_rgb_matches_scalar():
    rng = np.random.default_rng(0)
    w, h = 8, 4
    buf = rng.integers(0, 256, w * h * 2, dtype=np.uint8).tobytes()
    np.testing.assert_array_equal(V.yuyv_to_rgb(buf, w, h),
                                  _yuyv_to_rgb_scalar(buf, w, h))


def test_yuyv_gray_roundtrip():
    # Y=200, U=V=128 is achromatic: RGB = (200,200,200)
    w, h = 4, 2
    buf = bytes([200, 128, 200, 128] * (w * h // 2))
    rgb = V.yuyv_to_rgb(buf, w, h)
    np.testing.assert_array_equal(rgb, np.full((h, w, 3), 200, np.uint8))


# ---------------------------------------------------------------------------
# Fake camera
# ---------------------------------------------------------------------------

class FakeRawCamera(V.RawCamera):
    def __init__(self, formats, frames, fail_opens: int = 0):
        self._formats = formats
        self._frames = list(frames)
        self._fail_opens = fail_opens
        self.opened = False
        self.started = False
        self.set_fmt = None
        self._i = 0

    def open(self):
        if self._fail_opens > 0:
            self._fail_opens -= 1
            return False
        self.opened = True
        return True

    def formats(self):
        return self._formats

    def set_format(self, w, h, fourcc):
        self.set_fmt = (w, h, fourcc)
        return (w, h)

    def start(self):
        self.started = True

    def grab(self):
        f = self._frames[self._i % len(self._frames)]
        self._i += 1
        return f

    def stop(self):
        self.opened = False
        self.started = False


def _yuyv_frame(w, h, y=100, u=128, v=128):
    return bytes([y, u, y, v] * (w * h // 2))


def test_source_negotiates_yuyv_and_serves_frames():
    cam = FakeRawCamera(
        [V.CameraFormat(V.V4L2_PIX_FMT_MJPG, ((320, 240),)),
         V.CameraFormat(V.V4L2_PIX_FMT_YUYV, ((640, 480), (320, 240)))],
        [_yuyv_frame(640, 480, y=64)])
    src = V.V4L2CameraSource(camera=cam, max_frames=3)
    assert src.open()
    # YUYV preferred over MJPEG; largest size picked when none requested
    assert cam.set_fmt == (640, 480, V.V4L2_PIX_FMT_YUYV)
    frames = list(src.frames())
    assert len(frames) == 3
    assert frames[0].rgb.shape == (480, 640, 3)
    np.testing.assert_array_equal(frames[0].rgb,
                                  np.full((480, 640, 3), 64, np.uint8))
    assert (320, 240) in src.supported_output_sizes()
    src.close()
    assert not cam.started


def test_source_honors_requested_resolution():
    cam = FakeRawCamera(
        [V.CameraFormat(V.V4L2_PIX_FMT_YUYV, ((640, 480), (320, 240)))],
        [_yuyv_frame(320, 240)])
    src = V.V4L2CameraSource(camera=cam, max_frames=1)
    assert src.request_resolution((320, 240))
    assert src.open()
    assert cam.set_fmt[:2] == (320, 240)
    assert next(iter(src.frames())).rgb.shape == (240, 320, 3)


def test_source_mjpeg_fallback():
    from PIL import Image
    img = np.full((16, 16, 3), 200, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    cam = FakeRawCamera(
        [V.CameraFormat(V.V4L2_PIX_FMT_MJPG, ((16, 16),))],
        [buf.getvalue()])
    src = V.V4L2CameraSource(camera=cam, max_frames=1)
    assert src.open()
    f = next(iter(src.frames()))
    assert f.rgb.shape == (16, 16, 3)
    assert abs(int(f.rgb.mean()) - 200) < 6    # JPEG-lossy tolerance


def test_source_open_retry_bounded():
    """Camera-not-found retry (WebCamTextureManager.cs:101-133): succeeds
    when the device appears within the retry budget, fails when not."""
    cam = FakeRawCamera(
        [V.CameraFormat(V.V4L2_PIX_FMT_YUYV, ((32, 32),))],
        [_yuyv_frame(32, 32)], fail_opens=2)
    src = V.V4L2CameraSource(camera=cam, open_retries=3,
                             retry_interval_s=0.01)
    assert src.open()

    cam2 = FakeRawCamera([], [], fail_opens=10)
    src2 = V.V4L2CameraSource(camera=cam2, open_retries=3,
                              retry_interval_s=0.01)
    assert not src2.open()
    assert not src2.is_ready


def test_source_no_supported_format_fails():
    cam = FakeRawCamera([V.CameraFormat(V._fourcc("H264"), ((640, 480),))],
                        [])
    src = V.V4L2CameraSource(camera=cam)
    assert not src.open()


def test_real_device_absent_is_clean():
    src = V.V4L2CameraSource(device="/dev/video99", open_retries=1,
                             retry_interval_s=0.0)
    assert not src.open()


def test_fourcc_roundtrip():
    assert V._fourcc("YUYV") == 0x56595559
    assert V.V4L2_PIX_FMT_MJPG == 0x47504A4D
