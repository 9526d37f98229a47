"""TrainLogger: TB event files actually written (scalars/audio/figure),
stdout cadence, and the quiet (non-coordinator) gate — the reference's
rank-0 logging behavior (I_ea/hifi_gan/train.py:209-246)."""
import numpy as np

from speech_inpainting_tpu.utils.logging import TrainLogger


def test_logger_writes_tb_events_and_stdout(tmp_path, capsys):
    lg = TrainLogger(str(tmp_path), stdout_interval=2, summary_interval=1)
    lg.step(0, {"loss": 1.0})
    lg.step(1, {"loss": 0.5})          # off the stdout interval
    lg.scalar("validation/mel_error", 0.25, 1)
    lg.audio("gt/y", np.zeros(160, np.float32), 1, 16000)
    lg.mel_figure("gt/mel", np.zeros((80, 10), np.float32), 1)
    lg.close()
    out = capsys.readouterr().out
    assert "Steps: 0, loss: 1.000" in out and "s/b:" in out
    assert "Steps: 1" not in out
    events = list(tmp_path.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_logger_quiet_and_no_dir(tmp_path, capsys):
    lg = TrainLogger(str(tmp_path / "q"), quiet=True)
    lg.step(0, {"loss": 1.0})
    lg.close()
    assert capsys.readouterr().out == ""
    assert not (tmp_path / "q").exists()       # no writer in quiet mode

    lg = TrainLogger(None)                     # stdout-only degrade
    lg.step(0, {"loss": 2.0})
    lg.close()
    assert "loss: 2.000" in capsys.readouterr().out
