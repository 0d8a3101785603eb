"""Steady-state phase breakdown of the on-device full receiver loop.

Answers "where does the second go" for run_device streaming: device
synthesis, tracking dispatch, compact pack, batched download, host
consume (nav decode) and evaluation are timed separately over a warm
window (compiles and the tunnel warmup are excluded by a discard
prefix).  Use this to attack the full_loop_rtf bottleneck; wall times
through the tunnel are +-60 ms noisy, so phases are summed over many
chunks.

Usage: python examples/probe_device_loop.py [--sec 40] [--warm 8]
       [--batch 8] [--presynth]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sec", type=float, default=40.0)
    ap.add_argument("--sats", type=int, default=6)
    ap.add_argument("--warm", type=int, default=8,
                    help="chunks discarded before timing")
    ap.add_argument("--batch", type=int, default=8,
                    help="cfg.chunks_per_download")
    ap.add_argument("--presynth", action="store_true",
                    help="synthesize the whole capture into a device "
                         "buffer first (receiver-only measurement)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gps_sdr_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax  # noqa: F811
    import jax.numpy as jnp

    from gps_sdr_tpu.config import ReceiverConfig
    from gps_sdr_tpu.models.scenario import make_scenario
    from gps_sdr_tpu.models.scenario_jax import DeviceScenarioSynth
    from gps_sdr_tpu.ops.tracking import pack_outs_compact
    from gps_sdr_tpu.runtime.receiver import Receiver, _DeviceChunk
    from gps_sdr_tpu.runtime.receiver import _stack_bufs
    from gps_sdr_tpu.ops.tracking import unpack_outs_compact
    from gps_sdr_tpu.runtime.evaluator import Evaluator

    cfg = ReceiverConfig(chunks_per_download=args.batch)
    n_blocks = int(round(args.sec / cfg.block_sec))
    t = cfg.no_sec
    n_chunks = n_blocks // t
    scn = make_scenario(cfg, n_sats=args.sats, seed=3,
                        duration_sec=args.sec + 12.0)
    dev = DeviceScenarioSynth(scn, noise_std=0.5)

    if args.presynth:
        whole = []
        for ci in range(n_chunks):
            whole.append(dev.chunk_planar(ci * t, t))
        buf = jnp.concatenate(whole)
        buf.block_until_ready()

        import functools

        @functools.partial(jax.jit, static_argnums=2)
        def _slice(b, first, n):
            return jax.lax.dynamic_slice_in_dim(b, first, n)

        def provider(first, n):
            return _slice(buf, jnp.int32(first), n)
    else:
        provider = dev.chunk_planar

    rec = Receiver(cfg)
    ev = Evaluator(cfg)
    cap = rec._edge_cap(t)

    tm = {"synth": 0.0, "dispatch": 0.0, "pack": 0.0, "download": 0.0,
          "consume": 0.0, "eval": 0.0}
    measured_chunks = 0
    pending = []
    warm_end = None
    t_all0 = None

    def drain(timed):
        nonlocal measured_chunks
        if not pending:
            return
        t0 = time.perf_counter()
        bufs = _stack_bufs(*[p[1] for p in pending]) \
            if len(pending) > 1 else pending[0][1][None]
        host = np.asarray(bufs)
        t1 = time.perf_counter()
        for (chunk, _, stream0), row in zip(pending, host):
            outs, _ = unpack_outs_compact(row, len(chunk), cfg.max_sat,
                                          cfg.n_cyc + 1, cap)
            t2 = time.perf_counter()
            epoch, _ = rec._consume_chunk(chunk, outs, stream0, 0)
            t3 = time.perf_counter()
            ev.process(epoch)
            t4 = time.perf_counter()
            if timed:
                tm["consume"] += t3 - t2
                tm["eval"] += t4 - t3
                measured_chunks += 1
        if timed:
            tm["download"] += t1 - t0
        pending.clear()

    for ci in range(n_chunks):
        timed = ci >= args.warm
        if timed and t_all0 is None:
            t_all0 = time.perf_counter()
        t0 = time.perf_counter()
        blocks_dev = provider(ci * t, t)
        t1 = time.perf_counter()
        if rec.sweep_all:
            drain(timed)
            from gps_sdr_tpu.runtime.receiver import _download_block
            rec._serve_sweep_all(_download_block(blocks_dev, 0))
        chunk = _DeviceChunk(blocks_dev)
        rec.status.stream_no = ci * t
        t2 = time.perf_counter()
        outs_dev, stream0 = rec._dispatch_chunk(chunk)
        t3 = time.perf_counter()
        packed = pack_outs_compact(outs_dev, cap)
        t4 = time.perf_counter()
        pending.append((chunk, packed, stream0))
        if timed:
            tm["synth"] += t1 - t0
            tm["dispatch"] += t3 - t2
            tm["pack"] += t4 - t3
        if len(pending) >= args.batch:
            drain(timed)
    drain(True)
    wall = time.perf_counter() - t_all0 if t_all0 else float("nan")

    sig = measured_chunks * t * cfg.block_sec
    print(f"\nchunks measured: {measured_chunks} "
          f"({sig:.1f} s signal), wall {wall:.2f} s "
          f"-> {sig / wall:.1f}x realtime")
    tot = sum(tm.values())
    for k, v in tm.items():
        print(f"  {k:9s} {v:7.3f} s  ({v / sig * 1e3:6.1f} ms/s-signal)")
    print(f"  {'sum':9s} {tot:7.3f} s  (wall includes async overlap)")
    print(f"fixes: {len(ev.positions)}")


if __name__ == "__main__":
    main()
