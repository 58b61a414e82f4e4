"""Warm-run profile of the bench seed_extend workload (in-process, TPU).

Run:  nohup python scripts/prof_seedext.py > prof_seedext.log 2>&1 &
"""
import contextlib
import cProfile
import os
import pstats
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)
os.chdir(os.path.join(_REPO, ".bench_work"))

t0 = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

x = jnp.zeros(8)
float(x.sum())  # first d2h fetch: the handshake lottery
print(f"# handshake {time.time() - t0:.1f}s backend={jax.default_backend()}",
      flush=True)

from genometools_tpu.cli import main as gt_main  # noqa: E402

t0 = time.time()
pr = cProfile.Profile()
pr.enable()
with open(os.devnull, "w") as devnull, \
        contextlib.redirect_stdout(devnull):
    rc = gt_main(["seed_extend", "-ii", "idx", "-l", "14",
                  "-minidentity", "90", "-extendgreedy"])
pr.disable()
print(f"# TOTAL {time.time() - t0:.1f}s rc={rc}", flush=True)
st = pstats.Stats(pr)
st.sort_stats("cumulative")
st.print_stats(45)
