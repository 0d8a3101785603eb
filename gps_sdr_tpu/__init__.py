"""gps_sdr_tpu — a TPU-native GPS L1 C/A software receiver.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
annappo/GPS-SDR-Receiver reference (a pure-Python multiprocessing
receiver): IQ ingest, batched FFT acquisition over the PRN x Doppler x
code-phase grid, scan-based per-channel DLL/PLL tracking, 50 bps nav
message decode (subframes -> ephemerides), pseudorange assembly and an
iterated weighted Gauss-Newton position fix.

Architecture (vs. reference layers, see SURVEY.md):
  L0 config            -> gps_sdr_tpu.config        (frozen dataclass)
  L1 sample source     -> gps_sdr_tpu.runtime.sources + csrc ingest
  L2 dispatcher        -> gps_sdr_tpu.runtime.receiver (host shell)
  L3 acquisition       -> gps_sdr_tpu.ops.acquisition  (batched jit)
  L4 channel tracking  -> gps_sdr_tpu.ops.tracking     (vmap+scan)
  L5 nav decode        -> gps_sdr_tpu.models.navmsg    (host bit ops)
  L6 orbit/ephemeris   -> gps_sdr_tpu.models.{ephemeris,orbits,pseudorange}
  L7 positioning       -> gps_sdr_tpu.ops.pvt
  L8 UI/export         -> gps_sdr_tpu.ui, gps_sdr_tpu.utils.io
  L9 launcher          -> gps_sdr_tpu.runtime.session
Multi-device scaling  -> gps_sdr_tpu.parallel (mesh, channel sharding,
                         overlap-save time sharding)
"""

__version__ = "0.1.0"

from gps_sdr_tpu.config import ReceiverConfig  # noqa: F401


def __getattr__(name):  # lazy: keep `import gps_sdr_tpu` JAX-free
    import importlib

    top = {
        "Session": ("gps_sdr_tpu.runtime.session", "Session"),
        "Receiver": ("gps_sdr_tpu.runtime.receiver", "Receiver"),
        "Evaluator": ("gps_sdr_tpu.runtime.evaluator", "Evaluator"),
        "EpochInput": ("gps_sdr_tpu.runtime.evaluator", "EpochInput"),
        "acquire": ("gps_sdr_tpu.ops.acquisition", "acquire"),
        "acquire_all": ("gps_sdr_tpu.ops.acquisition", "acquire_all"),
        "track_chunk": ("gps_sdr_tpu.ops.tracking", "track_chunk"),
        "track_chunk_batched": ("gps_sdr_tpu.ops.tracking",
                                "track_chunk_batched"),
        "track_streams": ("gps_sdr_tpu.ops.tracking", "track_streams"),
        "make_mesh": ("gps_sdr_tpu.parallel.mesh", "make_mesh"),
        "track_sharded": ("gps_sdr_tpu.parallel.tracking",
                          "track_sharded"),
        "acquire_sharded": ("gps_sdr_tpu.parallel.acquisition",
                            "acquire_sharded"),
    }
    if name in top:
        mod, attr = top[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'gps_sdr_tpu' has no attribute {name!r}")
