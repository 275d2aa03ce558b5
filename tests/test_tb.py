"""Dependency-free TensorBoard writer: TFRecord/CRC32c/proto round trip."""
import struct

import numpy as np

from xrseg_tpu.train import tb


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32c (Castagnoli)
    assert tb.crc32c(b"") == 0x0
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(bytes(32)) == 0x8A9136AA


def test_event_file_round_trip(tmp_path):
    w = tb.TBWriter(str(tmp_path))
    w.add_scalars({"train/loss": 1.5, "train/grad_norm": 0.25}, step=1)
    w.add_scalar("epoch/val_box_mAP", 0.875, step=0)
    w.add_scalars({"train/loss": np.float32(0.75)}, step=2)
    w.close()

    events = list(tb.read_events(w.path))   # verifies both CRCs per record
    assert events[0]["scalars"] == {}       # file_version header event
    assert events[1]["step"] == 1
    assert abs(events[1]["scalars"]["train/loss"] - 1.5) < 1e-6
    assert abs(events[1]["scalars"]["train/grad_norm"] - 0.25) < 1e-6
    assert abs(events[2]["scalars"]["epoch/val_box_mAP"] - 0.875) < 1e-6
    assert abs(events[3]["scalars"]["train/loss"] - 0.75) < 1e-6
    assert all(e["wall_time"] > 1e9 for e in events)


def test_corruption_detected(tmp_path):
    w = tb.TBWriter(str(tmp_path))
    w.add_scalar("x", 1.0, step=1)
    w.close()
    raw = bytearray(open(w.path, "rb").read())
    raw[-6] ^= 0xFF                          # flip a payload byte
    bad = tmp_path / "bad.tfevents"
    bad.write_bytes(bytes(raw))
    import pytest
    with pytest.raises(ValueError, match="crc"):
        list(tb.read_events(str(bad)))
