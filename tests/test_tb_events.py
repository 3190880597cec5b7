"""Pure-python TensorBoard event writer: framing CRCs, proto encoding, and
a load test against the real tensorboard reader (in-image via torch's dep).
Parity surface: reference train/train_mead_vqvae.py:100-102 SummaryWriter.
"""

import glob
import os
import struct

import numpy as np
import pytest

from fdm_tpu.utils.tb_events import (
    EventFileWriter,
    crc32c,
    encode_event,
    frame_record,
    read_records,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_record_roundtrip_and_crc_detection(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, step=1)
    w.add_scalar("loss", 0.25, step=2)
    w.close()
    payloads = list(read_records(w.path))
    assert len(payloads) == 3  # file_version + 2 scalars

    # corrupting one payload byte must be caught by the CRC
    blob = bytearray(open(w.path, "rb").read())
    blob[-6] ^= 0xFF
    bad = tmp_path / "bad.tfevents"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="crc"):
        list(read_records(str(bad)))


def test_tensorboard_loads_our_event_file(tmp_path):
    tb_loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, step=10)
    w.add_scalar("train/loss", 0.75, step=20)
    w.add_scalar("lr", 1e-4, step=10)
    w.close()

    loader = tb_loader.LegacyEventFileLoader(w.path)
    events = list(loader.Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            scalars.setdefault(v.tag, []).append((ev.step, v.simple_value))
    assert scalars["train/loss"] == [(10, 1.5), (20, 0.75)]
    np.testing.assert_allclose(scalars["lr"][0][1], 1e-4, rtol=1e-6)


def test_metric_logger_writes_jsonl_and_tb(tmp_path):
    from fdm_tpu.utils.logging import MetricLogger

    lg = MetricLogger(str(tmp_path), run_name="r1")
    lg.log_step(1, {"loss": 2.0, "note": "skipme"})
    lg.log_epoch(1, {"val": 1.0})
    lg.close()
    assert os.path.exists(tmp_path / "r1.jsonl")
    files = glob.glob(str(tmp_path / "r1" / "events.out.tfevents.*"))
    assert len(files) == 1
    tags = set()
    for payload in list(read_records(files[0]))[1:]:
        # cheap proto sniff: tags appear as length-delimited utf-8
        tags.add(payload)
    assert len(tags) == 2  # step/loss + epoch/val (string field skipped)
