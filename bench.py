#!/usr/bin/env python
"""Benchmark: ESA suffix-sort throughput on the reference at1MB dataset.

Prints ONE JSON line:
  {"metric": "esa_suffixes_per_sec", "value": N, "unit": "suffixes/s",
   "vs_baseline": R}

vs_baseline is the ratio against a single-host CPU run of the same
data-parallel engine (XLA CPU backend), cached in .bench_cache.json after
first measurement. The reference repo publishes no numbers (see
BASELINE.md), so the CPU run of the identical workload is the recorded
baseline hook.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

AT1MB = "/root/reference/testdata/at1MB"
CACHE = Path(__file__).parent / ".bench_cache.json"


def _build_rate(keys_padded: np.ndarray, n1: int, device) -> float:
    """suffixes/s for the SA build of keys (padded to pow2) on device."""
    import jax

    from genometools_tpu.index.suffix import _build_sa_impl

    npad = keys_padded.size
    with jax.default_device(device):
        k = jax.device_put(jax.numpy.asarray(keys_padded), device)
        # force a host round trip first: on the remote (axon tunnel)
        # backend, block_until_ready is unreliable until the first
        # transfer handshake has happened
        np.asarray(k[:8])
        # warmup / compile
        sa, _, _ = _build_sa_impl(k, npad, False)
        np.asarray(sa[:8])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sa, _, _ = _build_sa_impl(k, npad, False)
            sa.block_until_ready()
            np.asarray(sa[:8])  # sync via tiny fetch
            times.append(time.perf_counter() - t0)
    return n1 / min(times)


def _arm_watchdog(seconds: int = 420):
    """The remote TPU tunnel sometimes blocks for many minutes acquiring
    the chip (jax.devices() is uninterruptible). If that happens, emit
    the last known result (or a CPU-measured fallback marker) so the
    caller always receives its JSON line."""
    import os
    import threading

    def fire():
        cache = {}
        if CACHE.exists():
            try:
                cache = json.loads(CACHE.read_text())
            except json.JSONDecodeError:
                pass
        last = cache.get("last_result")
        if last is None:
            last = {"metric": "esa_suffixes_per_sec", "value": 0,
                    "unit": "suffixes/s", "vs_baseline": None,
                    "note": "device unavailable (claim timeout)"}
        else:
            last = dict(last)
            last["note"] = "cached result; device claim timed out"
        print(json.dumps(last), flush=True)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _arm_watchdog()
    import jax

    from genometools_tpu.core.encseq import Encseq
    from genometools_tpu.index.suffix import _next_pow2

    e = Encseq.from_files([AT1MB])
    keys = e.suffix_keys()
    n1 = keys.size
    npad = _next_pow2(n1)
    maxkey = int(keys.max())
    pad = maxkey + 1 + np.arange(npad - n1, dtype=np.int32)
    keys_p = np.concatenate([keys, pad]).astype(np.int32)

    dev = jax.devices()[0]
    rate = _build_rate(keys_p, n1, dev)
    print(f"# device={dev.platform} n1={n1} rate={rate:,.0f} suffixes/s",
          file=sys.stderr)

    cache = {}
    if CACHE.exists():
        try:
            cache = json.loads(CACHE.read_text())
        except json.JSONDecodeError:
            cache = {}
    base_key = f"cpu_rate_at1MB_{n1}"
    if dev.platform == "cpu":
        cpu_rate = rate
    elif base_key in cache:
        cpu_rate = cache[base_key]
    else:
        try:
            cpu = jax.devices("cpu")[0]
            cpu_rate = _build_rate(keys_p, n1, cpu)
            cache[base_key] = cpu_rate
            CACHE.write_text(json.dumps(cache))
        except Exception as exc:  # no cpu backend reachable
            print(f"# cpu baseline unavailable: {exc}", file=sys.stderr)
            cpu_rate = None
    print(f"# cpu baseline={cpu_rate and f'{cpu_rate:,.0f}'}", file=sys.stderr)

    vs = (rate / cpu_rate) if cpu_rate else None
    watchdog.cancel()
    result = {
        "metric": "esa_suffixes_per_sec",
        "value": round(rate),
        "unit": "suffixes/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }
    cache["last_result"] = result
    try:
        CACHE.write_text(json.dumps(cache))
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
