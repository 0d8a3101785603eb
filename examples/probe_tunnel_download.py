"""Diagnose the intermittent INVALID_ARGUMENT on large tunnel
downloads (VERDICT r1 weak #7): sweep device->host transfer sizes,
with and without HBM pressure, with blocking and async copies, and
report exactly which (size, condition) fails and with what error.

Run on the real chip: python examples/probe_tunnel_download.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gps_sdr_tpu.utils.profiling import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnums=1)
def make(key, n):
    return jax.random.uniform(key, (n,), jnp.float32)


def try_download(n_mb: float, tag: str) -> str:
    n = int(n_mb * (1 << 20) / 4)
    try:
        x = make(jax.random.key(0), n)
        x.block_until_ready()
        t0 = time.perf_counter()
        h = np.asarray(x)
        dt = time.perf_counter() - t0
        rate = n_mb / max(dt, 1e-9)
        del h
        x.delete()
        return f"ok   {dt * 1e3:8.1f} ms  {rate:7.1f} MB/s"
    except Exception as e:
        return f"FAIL {type(e).__name__}: {str(e)[:200]}"


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    sizes = [1, 4, 16, 64, 256, 1024]
    print("-- plain downloads, increasing size --", flush=True)
    for mb in sizes:
        print(f"{mb:6d} MB: {try_download(mb, 'plain')}", flush=True)

    print("-- repeat under HBM pressure (8 GiB resident) --", flush=True)
    hold = []
    try:
        for i in range(8):
            hold.append(make(jax.random.key(i + 1), (1 << 30) // 4))
        for h in hold:
            h.block_until_ready()
    except Exception as e:
        print(f"  (allocation stopped early: {type(e).__name__})",
              flush=True)
    for mb in sizes:
        print(f"{mb:6d} MB: {try_download(mb, 'pressure')}", flush=True)
    for h in hold:
        h.delete()

    print("-- rapid-fire small-then-large alternation x6 --", flush=True)
    fails = 0
    for i in range(6):
        r1 = try_download(1, "alt")
        r2 = try_download(256, "alt")
        if "FAIL" in r1 + r2:
            fails += 1
            print(f"  iter {i}: {r1} | {r2}", flush=True)
    print(f"alternation failures: {fails}/6", flush=True)

    print("-- async copy then download x3 --", flush=True)
    for i in range(3):
        x = make(jax.random.key(100 + i), (256 << 20) // 4)
        x.block_until_ready()
        try:
            x.copy_to_host_async()
            h = np.asarray(x)
            print(f"  iter {i}: ok ({h[0]:.3f})", flush=True)
        except Exception as e:
            print(f"  iter {i}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        x.delete()


if __name__ == "__main__":
    main()
