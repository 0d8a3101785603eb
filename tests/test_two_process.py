"""Two-process deployment: the evaluator half as a real subprocess fed
over UDP (the reference's SEND_OVER_UDP topology, gpssdr.py +
gpsglob.py:79-88), receiver side driven by the transport sender."""

import json
import subprocess
import sys
import time

import numpy as np
import pytest

from gps_sdr_tpu.config import DEFAULT as CFG
from gps_sdr_tpu.runtime.evaluator import EpochInput
from gps_sdr_tpu.runtime.transport import EpochSender
from tests.test_cli_ui import epoch_records  # fixture  # noqa: F401


def test_eval_subprocess_over_udp(tmp_path, epoch_records):  # noqa: F811
    scn, records = epoch_records
    out = tmp_path / "udp_run"
    proc = subprocess.Popen(
        [sys.executable, "-m", "gps_sdr_tpu", "eval", "--ui", "none",
         "--out", str(out), "--max-sec", "20"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        time.sleep(8.0)    # let it import jax + bind (slow/loaded host)
        tx = EpochSender()
        for rec in records:
            tx.send(EpochInput(*rec))
            time.sleep(0.05)                  # don't overrun the socket
        tx.close()
        # idle timeout in run_eval_process ends the loop
        code = proc.wait(timeout=120)
        assert code == 0, proc.stdout.read()
    finally:
        if proc.poll() is None:
            proc.kill()
    pos = json.loads((tmp_path / "udp_run_gpsPos.json").read_text())
    assert len(pos) > 100
    mean = np.mean(np.asarray(pos)[:, 1:], axis=0)
    assert np.linalg.norm(mean - scn.rec_ecef) < 5.0
