"""Time-shard scaling sweep: accuracy + work cost of the stitch modes.

Runs the same 4-channel stream over a (time, ch) mesh at 1/2/4/8 time
shards in both stitch modes and reports, per shard count:

  * the per-device work factor (scans of the local stream needed):
    exact re-scan stitching costs n_shards scans (zero speedup at
    exactness); the boundary-state handoff costs 1 + W/L scans
    (near-linear speedup for warmup W << local length L)
  * measured accuracy vs the sequential oracle (code-phase agreement,
    final carrier-freq delta, lock agreement)
  * wall time on THIS host (virtual CPU mesh on one burstable core:
    wall does NOT scale here — devices share the core; the work factor
    is the hardware-independent scaling model, validated by the
    accuracy numbers)

Writes SCALING_r02.json at the repo root.

Usage: python examples/scaling_sweep.py [--blocks 64] [--warmup 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--channels", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from gps_sdr_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from gps_sdr_tpu.config import ReceiverConfig
    from gps_sdr_tpu.models.simulator import (SatSignal, random_bits,
                                              synth_stream_chunk)
    from gps_sdr_tpu.ops import cacode
    from gps_sdr_tpu.ops.tracking import (init_channel_states,
                                          reset_channel, track_chunk)
    from gps_sdr_tpu.parallel import make_mesh, pad_channels, track_sharded

    cfg = ReceiverConfig()
    rng = np.random.default_rng(0)
    prns = [5, 12, 21, 29][:args.channels]
    sats = [SatSignal(prn=p, doppler=float(rng.uniform(-4000, 4000)),
                      code_delay=float(rng.uniform(0, 2048)),
                      nav_bits=random_bits(256, seed=p))
            for p in prns]
    t = args.blocks
    print(f"synthesizing {t} blocks ({t * cfg.block_sec:.1f} s)...")
    blocks = synth_stream_chunk(cfg, sats, first_block=0, n_blocks=t,
                                noise_std=0.5, seed=7)
    blocks = jnp.asarray(blocks)

    def fresh():
        st = init_channel_states(cfg, len(sats))
        for i, s in enumerate(sats):
            st = reset_channel(st, i, s.prn, s.doppler,
                               int(s.code_delay), cfg)
        return st

    tab, ftab = cacode.ca_table(cfg), cacode.ca_fft_table(cfg)
    codes = np.stack([tab[s.prn] for s in sats])
    ffts = np.stack([ftab[s.prn] for s in sats])

    ref_states, ref_outs = track_chunk(cfg, fresh(), blocks, jnp.int32(1),
                                       jnp.asarray(codes),
                                       jnp.asarray(ffts))
    jax.block_until_ready(ref_outs.code_phase)
    ref_cp = np.asarray(ref_outs.code_phase)
    ref_freq = np.asarray(ref_states.freq)
    ref_lock = np.asarray(ref_outs.locked)

    rows = []
    for n_sh in (1, 2, 4, 8):
        L = t // n_sh
        for mode, kw, work in (
                ("exact_rescan", dict(n_stitch=n_sh), float(n_sh)),
                ("state_handoff", dict(warmup_blocks=args.warmup),
                 1.0 + (min(args.warmup, L) / L if n_sh > 1 else 0.0))):
            mesh = make_mesh(8, time_shards=n_sh)
            c_size = mesh.shape["ch"]

            def run():
                st0, cod, ff = pad_channels(fresh(), codes, ffts, c_size)
                st, outs = track_sharded(cfg, mesh, st0, blocks,
                                         jnp.int32(1), cod, ff, **kw)
                st = jax.tree.map(lambda x: x[:len(sats)], st)
                outs = jax.tree.map(lambda x: x[:, :len(sats)], outs)
                return st, outs
            st, outs = run()
            jax.block_until_ready(outs.code_phase)     # compile
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                st, outs = run()
                jax.block_until_ready(outs.code_phase)
                walls.append(time.perf_counter() - t0)
            cp = np.asarray(outs.code_phase)
            both = (ref_cp >= 0) & (cp >= 0)
            agree = float((np.abs(ref_cp - cp)[both] < 0.5).mean())
            lock_agree = float(
                (np.asarray(outs.locked) == ref_lock).mean())
            dfreq = float(np.max(np.abs(np.asarray(st.freq) - ref_freq)))
            rows.append({
                "time_shards": n_sh, "mode": mode,
                "work_scans_per_device": round(work, 3),
                "model_speedup": round(n_sh / work, 2),
                "wall_s_1core_host": round(min(walls), 3),
                "code_phase_agreement": round(agree, 4),
                "lock_agreement": round(lock_agree, 4),
                "max_final_freq_err_hz": round(dfreq, 3),
            })
            print(rows[-1])

    doc = {
        "blocks": t, "channels": len(sats), "warmup_blocks": args.warmup,
        "note": ("wall times are from ONE burstable CPU core hosting all "
                 "8 virtual devices and do not reflect hardware scaling; "
                 "model_speedup = n_shards / work_scans_per_device is the "
                 "hardware-independent scaling, valid while the stitch "
                 "ppermute (a few KB/channel over ICI) stays negligible "
                 "next to the per-shard scan"),
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r02.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
