"""TensorBoard scalar hook (utils/tb.py): gated backend, scalars-only
writes, silent no-op when disabled."""

import glob
import os

from datr_tpu.utils.tb import ScalarWriter


def test_writer_writes_event_file(tmp_path):
    w = ScalarWriter(str(tmp_path / "tb"))
    assert w.active  # torch.utils.tensorboard is baked into this image
    w.write(0, {"loss": 1.5, "ap50": 0.25, "note": "not-a-number"})
    w.write(1, {"loss": 1.25})
    w.close()
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events, "no event file written"
    assert os.path.getsize(events[0]) > 0


def test_writer_disabled_noop(tmp_path):
    w = ScalarWriter(str(tmp_path / "tb"), enabled=False)
    assert not w.active
    w.write(0, {"loss": 1.0})  # must not raise or create files
    w.close()
    assert not (tmp_path / "tb").exists()
