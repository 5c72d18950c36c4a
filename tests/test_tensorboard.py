"""TensorBoard event-writer round-trip + TFRecord framing checks."""
import glob
import os
import struct

import numpy as np

from robustpointclouds_tpu.core.tensorboard import (
    TensorBoardWriter,
    _crc32c,
    _masked_crc,
    read_scalar_events,
)


class TestCRC:
    def test_crc32c_known_vectors(self):
        # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
        assert _crc32c(b"\x00" * 32) == 0x8A9136AA
        # "123456789" -> 0xe3069283
        assert _crc32c(b"123456789") == 0xE3069283


class TestWriter:
    def test_roundtrip(self, tmp_path):
        tb = TensorBoardWriter(str(tmp_path))
        tb.add_scalar("train/loss", 1.5, step=0)
        tb.add_scalar("train/loss", 0.75, step=1)
        tb.add_scalar("val/mAP", 42.0, step=1)
        tb.close()
        files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
        assert len(files) == 1
        events = read_scalar_events(files[0])
        assert ("train/loss", 1.5, 0) in [(t, v, s) for t, v, s in events]
        tags = [t for t, _, _ in events]
        assert tags.count("train/loss") == 2 and "val/mAP" in tags

    def test_record_framing_crcs(self, tmp_path):
        tb = TensorBoardWriter(str(tmp_path))
        tb.add_scalar("x", 1.0, step=3)
        tb.close()
        data = open(tb.path, "rb").read()
        pos = 0
        n_records = 0
        while pos < len(data):
            header = data[pos : pos + 8]
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
            assert hcrc == _masked_crc(header)
            payload = data[pos + 12 : pos + 12 + length]
            (pcrc,) = struct.unpack("<I", data[pos + 12 + length : pos + 16 + length])
            assert pcrc == _masked_crc(payload)
            pos += 16 + length
            n_records += 1
        assert n_records == 2  # file_version + 1 scalar

    def test_metrics_logger_writes_tb(self, tmp_path):
        from robustpointclouds_tpu.cli.common import MetricsLogger

        ml = MetricsLogger(str(tmp_path))
        ml.log_step({"loss": 2.0, "perturbation_l2_norm": 0.05,
                     "l2_percentage": 1.2})
        files = glob.glob(os.path.join(str(tmp_path), "tf_logs", "events.*"))
        assert files
        events = read_scalar_events(files[0])
        assert any(t == "train/loss" and abs(v - 2.0) < 1e-6 for t, v, _ in events)
        # the reference-schema CSV now carries the l2 percentage (VERDICT #9)
        path = ml.save_l2_norms()
        rows = open(path).read().splitlines()
        assert rows[0].startswith("L2 Norm")
        assert rows[1].split(",")[1] == "1.2"
