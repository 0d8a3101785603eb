"""Session control surface: UI events -> receiver; ephemeris cache age
gating (the reference's GUI command path and 2 h warm-start rule)."""

import json
import time

import numpy as np

from gps_sdr_tpu.config import ReceiverConfig
from gps_sdr_tpu.models.simulator import SatSignal, random_bits, synth_stream
from gps_sdr_tpu.runtime.session import Session
from gps_sdr_tpu.utils import io
from tests.conftest import cached_synth


class FakeUI:
    """Reporter emitting a STOP event after the second epoch."""

    def __init__(self):
        self.n = 0

    def update(self, frames, summary, ev):
        self.n += 1

    def get_events(self):
        return ["STOP"] if self.n == 2 else []


def test_ui_stop_event_halts_receiver():
    cfg = ReceiverConfig()
    sat = SatSignal(prn=9, doppler=1500.0, code_delay=100.0,
                    nav_bits=random_bits(64, seed=1))
    blocks = cached_synth("recovery_skip_v1", lambda: synth_stream(
        cfg, [sat], n_blocks=3 * cfg.no_sec + 1, noise_std=0.4))
    ui = FakeUI()
    s = Session(cfg, reporter=ui)
    s.run_source(iter(blocks))
    # 3 chunks available, but STOP after epoch 2 ends the run
    assert ui.n == 2
    assert s.receiver._stop


class EventOnceUI:
    def __init__(self, event):
        self.event = event
        self.n = 0

    def update(self, frames, summary, ev):
        self.n += 1

    def get_events(self):
        return [self.event] if self.n == 1 else []


def test_ui_clear_and_height_events():
    cfg = ReceiverConfig()
    sat = SatSignal(prn=9, doppler=1500.0, code_delay=100.0,
                    nav_bits=random_bits(64, seed=1))
    blocks = cached_synth("recovery_skip_v1", lambda: synth_stream(
        cfg, [sat], n_blocks=3 * cfg.no_sec + 1, noise_std=0.4))
    s = Session(cfg, reporter=EventOnceUI("HEIGHT"))
    s.run_source(iter(blocks))
    assert s.evaluator.cfg.conf_height  # toggled from default False

    s2 = Session(cfg, reporter=EventOnceUI("CLEAR"))
    s2.evaluator.positions = [[0, 1, 2, 3]]
    s2.evaluator.stat = (np.zeros(3), np.zeros(3), 1, 0)
    s2.run_source(iter(blocks))
    # cleared after the first epoch; no fixes follow (no ephemerides)
    assert s2.evaluator.positions == []
    assert s2.evaluator.stat is None


def test_ephemeris_cache_age_gating(tmp_path):
    path = tmp_path / "eph.json"
    io.save_ephemerides(str(path), {7: {"IODC": 5, "sqrtA": 5153.6}})
    fresh = io.load_ephemerides(str(path))
    assert 7 in fresh and fresh[7]["sqrtA"] == 5153.6
    # backdate the stamp beyond the 2 h validity (gpseval.py:97-99)
    doc = json.loads(path.read_text())
    doc["POSIX-Time"] = int(time.time()) - 3 * 3600
    path.write_text(json.dumps(doc))
    assert io.load_ephemerides(str(path)) == {}
