"""VideoFrameSource (runtime/video.py): Y4M + MJPEG-AVI parsing.

Fixtures are built in-test (stdlib struct + PIL JPEG encode); color
checks use the CANONICAL BT.601 limited-range values (white Y=235,
black Y=16, red Y=81/Cb=90/Cr=240) rather than the module's own
conversion, so the YUV->RGB math is pinned independently.
"""
import os
import struct

import numpy as np
import pytest

from xrseg_tpu.runtime.video import VideoFrameSource, yuv_to_rgb


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------

def write_y4m(path, frames, w, h, cfmt="420jpeg", fps="25:1"):
    """frames: list of (y, u, v) uint8 planes."""
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C{cfmt}\n"
                .encode("ascii"))
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes() + u.tobytes() + v.tobytes())


def _chunk(fourcc, data):
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type, payload):
    return _chunk(b"LIST", list_type + payload)


def write_mjpeg_avi(path, rgb_frames, fps=25):
    import io
    from PIL import Image
    w, h = rgb_frames[0].shape[1], rgb_frames[0].shape[0]
    avih = struct.pack("<10I", int(1e6 / fps), 0, 0, 0, len(rgb_frames),
                       0, 1, 0, w, h)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih))
    movi_payload = b""
    for fr in rgb_frames:
        buf = io.BytesIO()
        Image.fromarray(fr).save(buf, "JPEG", quality=95)
        movi_payload += _chunk(b"00dc", buf.getvalue())
    body = b"AVI " + hdrl + _list(b"movi", movi_payload)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


# canonical BT.601 limited-range plane values -> expected RGB
WHITE = (235, 128, 128, (255, 255, 255))
BLACK = (16, 128, 128, (0, 0, 0))
RED = (81, 90, 240, (255, 0, 0))


def planes_420(w, h, yuv):
    y_v, u_v, v_v, _ = yuv
    return (np.full((h, w), y_v, np.uint8),
            np.full((h // 2, w // 2), u_v, np.uint8),
            np.full((h // 2, w // 2), v_v, np.uint8))


# ---------------------------------------------------------------------------
# Y4M
# ---------------------------------------------------------------------------

def test_y4m_canonical_colors_and_fps(tmp_path):
    w, h = 8, 4
    p = str(tmp_path / "clip.y4m")
    write_y4m(p, [planes_420(w, h, c) for c in (WHITE, BLACK, RED)],
              w, h)
    src = VideoFrameSource(p)
    src.open()
    assert src.fps == 25.0
    got = list(src.frames())
    assert len(got) == 3
    for fd, (_, _, _, rgb) in zip(got, (WHITE, BLACK, RED)):
        assert fd.rgb.shape == (h, w, 3)
        assert fd.yuv is not None
        np.testing.assert_allclose(fd.rgb[2, 3].astype(int), rgb, atol=3)
    assert got[1].timestamp == pytest.approx(1 / 25.0)
    src.close()


def test_y4m_444(tmp_path):
    w, h = 4, 2
    y = np.full((h, w), RED[0], np.uint8)
    u = np.full((h, w), RED[1], np.uint8)
    v = np.full((h, w), RED[2], np.uint8)
    p = str(tmp_path / "c444.y4m")
    write_y4m(p, [(y, u, v)], w, h, cfmt="444")
    src = VideoFrameSource(p)
    frames = list(src.frames())             # frames() self-opens
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0].rgb[0, 0].astype(int),
                               RED[3], atol=3)


def test_y4m_loop(tmp_path):
    w, h = 8, 4
    p = str(tmp_path / "loop.y4m")
    write_y4m(p, [planes_420(w, h, WHITE)], w, h)
    src = VideoFrameSource(p, loop=True)
    it = src.frames()
    for _ in range(5):                      # 1-frame clip, 5 reads
        assert next(it).rgb.shape == (h, w, 3)
    src.close()


def test_y4m_truncated_tail_stops(tmp_path):
    w, h = 8, 4
    p = str(tmp_path / "trunc.y4m")
    write_y4m(p, [planes_420(w, h, WHITE)] * 2, w, h)
    data = open(p, "rb").read()
    open(p, "wb").write(data[:-10])         # cut into frame 2
    assert len(list(VideoFrameSource(p).frames())) == 1


def test_y4m_bad_colorspace_rejected(tmp_path):
    p = str(tmp_path / "mono.y4m")
    open(p, "wb").write(b"YUV4MPEG2 W4 H2 F25:1 Cmono\n")
    with pytest.raises(ValueError, match="colorspace"):
        VideoFrameSource(p).open()


# ---------------------------------------------------------------------------
# MJPEG AVI
# ---------------------------------------------------------------------------

def test_avi_mjpeg_frames(tmp_path):
    colors = [(200, 30, 40), (20, 180, 60), (10, 40, 220)]
    frames = [np.full((16, 24, 3), c, np.uint8) for c in colors]
    p = str(tmp_path / "clip.avi")
    write_mjpeg_avi(p, frames, fps=20)
    src = VideoFrameSource(p)
    src.open()
    assert src.fps == pytest.approx(20.0, rel=1e-3)
    got = list(src.frames())
    assert len(got) == 3
    for fd, want in zip(got, frames):
        assert fd.rgb.shape == (16, 24, 3)
        np.testing.assert_allclose(fd.rgb[8, 12].astype(int),
                                   want[8, 12].astype(int), atol=8)


def test_avi_loop(tmp_path):
    p = str(tmp_path / "loop.avi")
    write_mjpeg_avi(p, [np.full((8, 8, 3), 90, np.uint8)])
    it = VideoFrameSource(p, loop=True).frames()
    for _ in range(4):
        assert next(it).rgb.shape == (8, 8, 3)


def test_mjpeg_writer_round_trips(tmp_path):
    """MJPEGWriter output reads back through VideoFrameSource: frame
    count, fps, geometry, and colors survive."""
    from xrseg_tpu.runtime.video import MJPEGWriter
    colors = [(220, 40, 40), (40, 200, 60), (30, 60, 230), (128, 128, 0)]
    p = str(tmp_path / "w.avi")
    wtr = MJPEGWriter(p, fps=12.5, quality=95)
    for c in colors:
        wtr.add(np.full((20, 34, 3), c, np.uint8))
    wtr.close()

    src = VideoFrameSource(p)
    src.open()
    assert src.fps == pytest.approx(12.5, rel=1e-3)
    got = list(src.frames())
    assert len(got) == 4
    for fd, want in zip(got, colors):
        assert fd.rgb.shape == (20, 34, 3)
        np.testing.assert_allclose(fd.rgb[10, 17].astype(int), want,
                                   atol=8)
    src.close()


def test_avi_skips_non_video_chunks(tmp_path):
    """Unknown chunks (audio '01wb', index 'idx1') inside movi are
    skipped, video chunks still decode."""
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), 77, np.uint8)).save(
        buf, "JPEG", quality=95)
    jpg = buf.getvalue()
    avih = struct.pack("<10I", 40000, 0, 0, 0, 1, 0, 1, 0, 8, 8)
    movi = (_chunk(b"01wb", b"\x00" * 10)     # audio chunk: skipped
            + _chunk(b"00dc", jpg))
    body = (b"AVI " + _list(b"hdrl", _chunk(b"avih", avih))
            + _list(b"movi", movi))
    p = str(tmp_path / "mixed.avi")
    open(p, "wb").write(b"RIFF" + struct.pack("<I", len(body)) + body)
    got = list(VideoFrameSource(p).frames())
    assert len(got) == 1
    np.testing.assert_allclose(got[0].rgb[4, 4].astype(int),
                               (77, 77, 77), atol=6)


def test_avi_not_riff_rejected(tmp_path):
    p = str(tmp_path / "junk.avi")
    open(p, "wb").write(b"not an avi at all")
    with pytest.raises(ValueError, match="RIFF"):
        VideoFrameSource(p).open()


def test_unsupported_container_rejected(tmp_path):
    p = str(tmp_path / "clip.mp4")
    open(p, "wb").write(b"\x00" * 16)
    with pytest.raises(ValueError, match="unsupported video container"):
        VideoFrameSource(p).open()


def test_video_to_tracker_composition(tmp_path):
    """VideoFrameSource -> Executor(multi_tracking) end to end: the
    tools/track_video.py composition at test geometry — fixture weights
    guarantee detections; track ids must persist across frames."""
    from xrseg_tpu.config import ExecutorConfig, ModelConfig
    from xrseg_tpu.runtime.executor import Executor
    from xrseg_tpu.testing import detection_params
    import jax

    w = h = 64
    rng = np.random.default_rng(0)
    y = (rng.uniform(60, 200, (h, w))).astype(np.uint8)
    frames = [(y, np.full((h // 2, w // 2), 128, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8))] * 4
    p = str(tmp_path / "t.y4m")
    write_y4m(p, frames, w, h)

    cfg = ExecutorConfig(model=ModelConfig(scale="n", input_size=(64, 64)),
                         multi_tracking=True)
    params = detection_params(jax.random.key(0), cfg.model)
    src = VideoFrameSource(p)
    src.open()
    ex = Executor(cfg, params=params, frame_hw=(h, w))
    ids_per_frame = []
    for fd in src.frames():
        r = ex.run_sync(fd)
        assert r.count > 0
        ids_per_frame.append({t.track_id for t in (r.tracks or [])})
    src.close()
    assert len(ids_per_frame) == 4
    confirmed = [s for s in ids_per_frame if s]
    assert confirmed, "tracker never confirmed a track"
    # identical frames: once confirmed, ids persist to the last frame
    assert confirmed[-1] & confirmed[0]


def test_yuv_to_rgb_roundtrip_gray():
    """mid-gray: Y=126 -> (128,128,128) within rounding."""
    y = np.full((2, 2), 126, np.uint8)
    c = np.full((2, 2), 128, np.uint8)
    rgb = yuv_to_rgb(y, c, c)
    np.testing.assert_allclose(rgb[0, 0].astype(int), (128, 128, 128),
                               atol=1)
