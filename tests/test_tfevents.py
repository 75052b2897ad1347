"""TensorBoard event-file writer: wire-format correctness and logger sink."""

import os

from kdip_tpu import tfevents


def test_crc32c_check_value():
    # standard CRC-32C (Castagnoli) check value
    assert tfevents.crc32c(b"123456789") == 0xE3069283
    assert tfevents.crc32c(b"") == 0


def test_event_file_roundtrip(tmp_path):
    w = tfevents.EventFileWriter(str(tmp_path))
    w.add_scalars(5, [("loss", 1.25), ("lr", 1e-4)])
    w.add_scalar(6, "loss", 0.5)
    w.close()

    events = tfevents.read_events(w.path)
    # first record is the file_version header
    assert len(events) == 3
    _, step1, scalars1 = events[1]
    assert step1 == 5
    assert abs(scalars1["loss"] - 1.25) < 1e-6
    assert abs(scalars1["lr"] - 1e-4) < 1e-9
    _, step2, scalars2 = events[2]
    assert step2 == 6 and abs(scalars2["loss"] - 0.5) < 1e-6


def test_logger_tensorboard_sink(tmp_path):
    from kdip_tpu import logger

    fmt = logger.make_output_format("tensorboard", str(tmp_path))
    fmt.writekvs({"loss": 2.0, "step": 7, "name": "not-a-scalar"})
    fmt.close()
    tb_dir = os.path.join(str(tmp_path), "tb")
    files = os.listdir(tb_dir)
    assert len(files) == 1
    events = tfevents.read_events(os.path.join(tb_dir, files[0]))
    _, step, scalars = events[1]
    assert step == 7
    assert abs(scalars["loss"] - 2.0) < 1e-6
    assert "name" not in scalars
