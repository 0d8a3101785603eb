"""Microbench: device cost of pack_outs_compact vs pack_outs, and the
raw download cost of each buffer size.  Times are amortized over many
iterations inside one device dispatch window to dodge tunnel noise."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gps_sdr_tpu.utils.profiling import enable_compile_cache  # noqa: E402
enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gps_sdr_tpu.config import ReceiverConfig  # noqa: E402
from gps_sdr_tpu.models.simulator import SatSignal, random_bits  # noqa: E402
from gps_sdr_tpu.models.sim_jax import JaxSynth  # noqa: E402
from gps_sdr_tpu.ops import cacode  # noqa: E402
from gps_sdr_tpu.ops.tracking import (init_channel_states,  # noqa: E402
                                      pack_outs, pack_outs_compact,
                                      reset_channel, to_f32_pairs,
                                      track_chunk_batched)


def sync(x):
    return float(np.asarray(jnp.sum(x[..., :1].astype(jnp.float32))))


def main():
    cfg = ReceiverConfig(max_sat=12, blocks_per_step=32,
                         use_pallas_kernels=None, use_pallas_cheap=None)
    rng = np.random.default_rng(0)
    prns = rng.choice(np.arange(2, 33), 12, replace=False)
    sats = [SatSignal(prn=int(p), doppler=float(rng.uniform(-4500, 4500)),
                      code_delay=float(rng.uniform(0, 2048)),
                      nav_bits=random_bits(2048, seed=i))
            for i, p in enumerate(prns)]
    synth = JaxSynth(cfg, sats, noise_std=0.7, seed=1)
    tab, ftab = cacode.ca_table(cfg), cacode.ca_fft_table(cfg)
    codes = jnp.asarray(np.stack([tab[s.prn] for s in sats]))
    ffts = jnp.asarray(to_f32_pairs(np.stack([ftab[s.prn] for s in sats])))
    t = cfg.no_sec
    blocks = synth.chunk_planar(0, t)
    states = init_channel_states(cfg, 12)
    for i, s in enumerate(sats):
        states = reset_channel(states, i, s.prn, s.doppler,
                               int(s.code_delay) % 2048, cfg)
    states, outs = track_chunk_batched(cfg, states, blocks,
                                       jnp.float32(1), codes, ffts)
    jax.block_until_ready(outs.code_phase)
    cap = 66

    for name, fn in [("pack_outs", lambda: pack_outs(outs)),
                     ("pack_compact", lambda: pack_outs_compact(outs, cap))]:
        b = fn()
        jax.block_until_ready(b)
        reps = 50
        t0 = time.perf_counter()
        bufs = [fn() for _ in range(reps)]
        jax.block_until_ready(bufs)
        w = (time.perf_counter() - t0) / reps
        print(f"{name}: shape {b.shape} ({b.size * 4 / 1024:.1f} KB), "
              f"{w * 1e3:.2f} ms/call (amortized, {reps} reps)")
        # download timing: min of 5
        dls = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(b)
            dls.append(time.perf_counter() - t0)
        print(f"  download: min {min(dls)*1e3:.1f} ms, "
              f"med {sorted(dls)[2]*1e3:.1f} ms")

    # batched stacked download: 8 and 16 compact buffers
    for n in (8, 16):
        st = jnp.stack([pack_outs_compact(outs, cap) for _ in range(n)])
        jax.block_until_ready(st)
        dls = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(st)
            dls.append(time.perf_counter() - t0)
        print(f"stacked x{n}: {st.size * 4 / 1024:.1f} KB, download min "
              f"{min(dls)*1e3:.1f} ms, med {sorted(dls)[2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
