"""tfevents writer read-back via TensorBoard's own loader."""

import pytest

from visiontransformer_tpu.utils.tbevents import EventFileWriter

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader")


def test_tensorboard_reads_our_events(tmp_path):
    writer = EventFileWriter(str(tmp_path))
    writer.add_scalar("train_loss", 0.5, step=1, wall_time=123.0)
    writer.add_scalar("train_loss", 0.25, step=2, wall_time=124.0)
    writer.add_scalar("valid_iou", 0.8, step=2, wall_time=124.5)
    writer.close()

    loader = tb_loader.EventFileLoader(writer.path)
    events = list(loader.Load())
    # file_version + 3 scalars
    assert events[0].file_version == "brain.Event:2"

    def scalar_of(v):
        # TensorBoard's data-compat layer migrates legacy simple_value
        # summaries into rank-0 tensors.
        return (v.tensor.float_val[0] if v.tensor.float_val
                else v.simple_value)

    scalars = [(e.step, v.tag, scalar_of(v))
               for e in events[1:] for v in e.summary.value]
    expected = [(1, "train_loss", 0.5), (2, "train_loss", 0.25),
                (2, "valid_iou", 0.8)]
    for (s, t, v), (es, et, ev) in zip(scalars, expected):
        assert (s, t) == (es, et)
        assert v == pytest.approx(ev, abs=1e-6)  # fp32 storage
