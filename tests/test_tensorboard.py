"""TensorBoard event-writer tests: CRC32C golden values, TFRecord framing,
and a cross-check that stock TensorBoard's own reader parses our files
(reference writes TB logs beside CSV, `volpick/model/train.py:122-130`)."""

import struct

import numpy as np
import pytest

from volpick_tpu.utils.tensorboard import (
    TensorBoardLogger,
    crc32c,
    encode_scalar_event,
    frame_record,
    masked_crc32c,
)


class TestCRC32C:
    def test_golden_values(self):
        # canonical CRC-32C check value
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0
        # 32 zero bytes (RFC 3720 test vector)
        assert crc32c(bytes(32)) == 0x8A9136AA
        # 32 x 0xFF (RFC 3720 test vector)
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_mask_roundtrip_shape(self):
        m = masked_crc32c(b"abc")
        assert 0 <= m <= 0xFFFFFFFF


class TestFraming:
    def test_record_layout(self):
        payload = b"hello-event"
        rec = frame_record(payload)
        (length,) = struct.unpack("<Q", rec[:8])
        assert length == len(payload)
        (len_crc,) = struct.unpack("<I", rec[8:12])
        assert len_crc == masked_crc32c(rec[:8])
        assert rec[12 : 12 + length] == payload
        (data_crc,) = struct.unpack("<I", rec[12 + length :])
        assert data_crc == masked_crc32c(payload)

    def test_scalar_event_protobuf_bytes(self):
        # decode by hand: field 1 fixed64, field 2 varint, field 5 message
        ev = encode_scalar_event(12.5, 7, "loss", 0.25)
        assert ev[0] == (1 << 3) | 1  # wall_time key
        assert struct.unpack("<d", ev[1:9])[0] == 12.5
        assert ev[9] == (2 << 3) | 0 and ev[10] == 7  # step
        assert ev[11] == (5 << 3) | 2  # summary


class TestAgainstStockTensorBoard:
    def test_tensorboard_reader_parses_our_file(self, tmp_path):
        """Files we write must load with tensorboard's own event loader."""
        pytest.importorskip("tensorboard")
        from tensorboard.backend.event_processing.event_file_loader import (
            RawEventFileLoader,
        )
        from tensorboard.compat.proto.event_pb2 import Event

        with TensorBoardLogger(tmp_path) as tb:
            tb.add_scalar("train_loss", 0.5, step=1, wall_time=100.0)
            tb.add_scalar("train_loss", 0.25, step=2, wall_time=101.0)
            tb.add_scalar("val_loss", 0.75, step=2, wall_time=101.5)
            path = tb.path

        events = []
        for raw in RawEventFileLoader(str(path)).Load():
            ev = Event()
            ev.ParseFromString(raw)
            events.append(ev)
        assert events[0].file_version == "brain.Event:2"
        scalars = [
            (e.step, v.tag, v.simple_value)
            for e in events[1:]
            for v in e.summary.value
        ]
        assert scalars == [
            (1, "train_loss", 0.5),
            (2, "train_loss", 0.25),
            (2, "val_loss", 0.75),
        ]
        assert events[1].wall_time == 100.0

    def test_log_scalars_skips_non_numeric(self, tmp_path):
        pytest.importorskip("tensorboard")
        from tensorboard.backend.event_processing.event_file_loader import (
            RawEventFileLoader,
        )
        from tensorboard.compat.proto.event_pb2 import Event

        with TensorBoardLogger(tmp_path) as tb:
            tb.log_scalars(
                {"epoch": 3, "step": 30, "train_loss": 1.5, "name": "x", "lr": 1e-3,
                 "nanv": float("nan")},
                step=30,
            )
            path = tb.path
        tags = set()
        for raw in RawEventFileLoader(str(path)).Load():
            ev = Event()
            ev.ParseFromString(raw)
            for v in ev.summary.value:
                tags.add(v.tag)
        assert tags == {"train_loss", "lr", "nanv"}

    def test_trainer_writes_tb_directory(self, tmp_path):
        """Smoke: Trainer.fit(tensorboard=True) produces a parseable file."""
        pytest.importorskip("tensorboard")
        from tensorboard.backend.event_processing.event_file_loader import (
            RawEventFileLoader,
        )
        from tensorboard.compat.proto.event_pb2 import Event

        from volpick_tpu.models.phasenet import PhaseNet
        from volpick_tpu.pipeline.augmentations import AugmentConfig
        from volpick_tpu.pipeline.generator import TrainGenerator
        from volpick_tpu.train.trainer import Trainer
        from volpick_tpu.data.dataset import load_dataset
        from volpick_tpu.data.synthetic import make_synthetic_dataset

        path = make_synthetic_dataset(tmp_path / "ds", n_events=16, n_noise=4, n_samples=700)
        ds = load_dataset(path)
        model = PhaseNet()
        gen = TrainGenerator(
            ds, AugmentConfig(window=601, pre_window=1200, samples_before=600, stack=False),
            batch_size=8,
        )
        tr = Trainer(model, lr=1e-3)
        tr.fit(gen, max_epochs=1, save_dir=str(tmp_path / "w"), experiment="tbtest")
        tb_dir = tmp_path / "w" / "tbtest" / "tensorboard"
        files = list(tb_dir.glob("events.out.tfevents.*"))
        assert len(files) == 1
        tags = set()
        for raw in RawEventFileLoader(str(files[0])).Load():
            ev = Event()
            ev.ParseFromString(raw)
            for v in ev.summary.value:
                tags.add(v.tag)
        assert {"train_loss", "lr"} <= tags
