#!/usr/bin/env python
"""One-shot TPU perf campaign: stage attribution at the judged config,
then the full bench matrix.  Run whenever the TPU tunnel is up:

    python tools/perf_campaign.py            # profile (D=640) + bench
    python tools/perf_campaign.py --skip-bench

Writes /tmp/perf_campaign_<ts>.log with everything."""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, timeout=3600):
    print(f"\n=== {' '.join(cmd)} ===", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=HERE, env=e, timeout=timeout)
    print(f"=== rc={r.returncode} in {time.time() - t0:.0f}s ===",
          flush=True)
    return r.returncode


def main():
    # fail fast if the tunnel is down
    import jax
    dev = jax.devices()[0]
    print("device:", dev)
    if "TPU" not in str(dev).upper() and jax.default_backend() != "tpu":
        print("NOT a TPU — aborting campaign")
        sys.exit(2)

    py = sys.executable
    # 1. honest stage attribution at full routability (judged config)
    run([py, "tools/profile_stages.py", "16", "100"],
        env={"PROF_D": "640"})
    # 2. and at D=64 for comparison (where does D-scaling hurt?)
    run([py, "tools/profile_stages.py", "16", "100"],
        env={"PROF_D": "64"})
    if "--skip-bench" not in sys.argv:
        run([py, "bench.py"], timeout=2700)


if __name__ == "__main__":
    main()
