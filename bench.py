#!/usr/bin/env python
"""Benchmark: simplex pivot throughput on a dense 4096x8192 tableau, 1 chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline target is 1e4 pivots/s (BASELINE.json: ">=10^4 pivots/s on a
4096x8192 dense f64 tableau on one chip"). The instance is a random dense
canonical-form LP: A = [D | I] with D 4096x4096 dense, so the working tableau
is exactly 4096 rows x 8192 columns; the timed region is the jitted
while_loop driver (pricing + ratio test + rank-1 pivot per iteration) with a
fixed pivot budget.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: the blocked driver's remote compile takes
# minutes; cached executables make repeat bench runs start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def make_bench_state(m, n_struct, dtype, seed=0, bounded=False,
                     _numpy=False):
    import jax.numpy as jnp

    from tpulp.core import make_state

    rng = np.random.default_rng(seed)
    D = rng.normal(size=(m, n_struct))
    x0 = np.abs(rng.normal(size=n_struct))
    # b >= 0 so the slack basis is genuinely primal feasible (the canonical
    # start the drivers assume; the terminal-basis check verifies the walk
    # PRESERVES feasibility, which only means something if it starts there)
    b = np.abs(D @ x0) + np.abs(rng.normal(size=m))
    c = rng.normal(size=n_struct)
    if bounded:
        # replace the last row with sum(x) <= 2 sum(x0): the polytope becomes
        # bounded, so every lane terminates OPTIMAL (with a free-sign c,
        # ~half of the unmodified instances are genuinely unbounded)
        D[-1] = 1.0
        b[-1] = 2.0 * x0.sum()
    A = np.concatenate([D, np.eye(m)], axis=1)
    cfull = np.concatenate([c, np.zeros(m)])
    hint = list(range(n_struct, n_struct + m))
    return make_state(cfull, A, b, hint, dtype=dtype, _numpy=_numpy)


def parity_check():
    """Device objective must match the reference's exact value on its
    textbook LP (rel gap <= 1e-9; here it is exact by refinement)."""
    from fractions import Fraction

    from tpulp import LinExpr, LinProg
    from tpulp.solve import solve_lp

    lp = LinProg()
    lp.addVar("x1")
    lp.addVar("x2")
    lp.maximize(LinExpr(40, "x1", 30, "x2"))
    lp.addConstraint(LinExpr(1, "x1", 1, "x2").constraintLeq(12))
    lp.addConstraint(LinExpr(2, "x1", 1, "x2").constraintLeq(16))
    sol = solve_lp(lp)
    assert sol.status == "optimal" and sol.objective == 400, (
        sol.status, sol.objective)


def _basis_certificate(basis, Afull, b, cfull, exclude=None):
    """f64 primal/dual verification of a terminal basis on the ORIGINAL
    data: returns (z64, min_xb, min_reduced_cost). A basis with min_xb >= 0
    and min_reduced_cost >= 0 is PROVEN optimal (strong duality) — a far
    stronger in-bench check than comparing one float objective. ``exclude``
    masks columns (phase-1 artificials) out of the dual check: they are not
    part of the real LP, so their prices carry no meaning."""
    basis = [int(j) for j in np.asarray(basis)]
    B = Afull[:, basis]
    xb = np.linalg.solve(B, b.astype(np.float64))
    z64 = float(cfull[basis] @ xb)
    y = np.linalg.solve(B.T, cfull[basis])
    s = cfull - Afull.T @ y
    nb = np.ones(Afull.shape[1], dtype=bool)
    nb[basis] = False
    if exclude is not None:
        nb &= ~np.asarray(exclude, dtype=bool)
    return z64, float(xb.min()), float(s[nb].min())


def _pin_instances():
    """The compiled-pin instance set (VERDICT r3 weak #2 / item 9): each
    entry is (name, state-builder(dtype), rule, block, expect_deep_phase1).
    Instances are chosen to exercise distinct compiled code paths:

    * random64_dantzig — the original r2 pin: tame dense slack-start LP,
      ~200 Dantzig pivots, no phase 1 (caught the Tt-transpose drift bug).
    * random24_bland   — a shorter instance under forced RULE_BLAND: the
      first-index pricing/row rules are the compiled path Dantzig skips.
    * random64_devex   — same instance under RULE_DEVEX: the round-4 weight
      carry in the kernel.
    * eqheavy_phase1   — integer-data equality system: EVERY row needs an
      artificial, so the compiled kernel runs a deep phase 1, the in-block
      phase transition, and artificial cleanup; K=8 forces the transition
      to cross flush boundaries.
    * degenerate_ties  — several b entries are 0: ratio-test ties at zero
      exercise the first-index tie-break and stall/Bland machinery.

    Every pin is judged by the f64 primal/dual certificate on its terminal
    basis (optimality proven outright, no golden constants), plus an exact
    rational host-oracle objective computed at bench time for the Dantzig
    pins (regeneration recipe = this code; the oracle is
    tpulp.simplex.Simplex on the same arrays)."""
    from tpulp.core import RULE_BLAND, RULE_DANTZIG, RULE_DEVEX

    def _random_dense(dtype, m, n, seed=0):
        from tpulp.core import make_state

        rng = np.random.default_rng(seed)
        A = rng.integers(-3, 4, size=(m, n)).astype(float)
        x0 = rng.integers(1, 4, size=n).astype(float)
        b = A @ x0 + rng.integers(1, 5, size=m)
        c = rng.integers(-5, 6, size=n).astype(float)
        Afull = np.concatenate([A, np.eye(m)], axis=1)
        cfull = np.concatenate([c, np.zeros(m)])
        st = make_state(cfull, Afull, b, list(range(n, n + m)), dtype=dtype)
        return st, Afull, b.astype(float), cfull

    def random64(dtype):
        return _random_dense(dtype, 64, 64, seed=0)

    def random24(dtype):
        # Bland runs the FULL walk under the first-index rule, which at f32
        # accumulates drift much faster than Dantzig (small improvements,
        # near-tolerance pivot elements) — a short walk keeps the pin about
        # code-path correctness instead of float endurance
        return _random_dense(dtype, 24, 24, seed=1)

    def degenerate(dtype):
        from tpulp.core import make_state

        rng = np.random.default_rng(3)
        m, n = 64, 64
        A = rng.integers(-2, 3, size=(m, n)).astype(float)
        x0 = rng.integers(0, 3, size=n).astype(float)
        b = np.abs(A @ x0) + rng.integers(0, 3, size=m)
        b[::5] = 0.0                    # forced zero RHS: degenerate start
        c = rng.integers(-4, 5, size=n).astype(float)
        A[-1] = 1.0                     # sum(x) <= b[-1]: polytope bounded
        b[-1] = max(float(b.max()) * 2, 10.0)
        Afull = np.concatenate([A, np.eye(m)], axis=1)
        cfull = np.concatenate([c, np.zeros(m)])
        st = make_state(cfull, Afull, b, list(range(n, n + m)), dtype=dtype)
        return st, Afull, b, cfull

    def eqheavy(dtype):
        from tpulp.solve.api import state_from_standard_form
        from tpulp import LinExpr, LinProg

        rng = np.random.default_rng(11)
        m, n = 32, 64
        A = rng.integers(-2, 3, size=(m, n)).astype(int)
        x0 = rng.integers(1, 3, size=n).astype(int)
        b = A @ x0
        c = rng.integers(-4, 5, size=n).astype(int)
        lp = LinProg()
        for j in range(n):
            lp.addVar(f"x{j}")
        obj = LinExpr()
        for j in range(n):
            obj += LinExpr(int(c[j]), f"x{j}")
        lp.minimize(obj)
        for i in range(m):
            e = LinExpr()
            for j in range(n):
                if A[i, j]:
                    e += LinExpr(int(A[i, j]), f"x{j}")
            lp.addConstraint(e.constraintEq(int(b[i])))
        sf = lp.lower()
        st = state_from_standard_form(sf, dtype=dtype)
        # reconstruct full arrays (incl. artificials as unit columns) for
        # the f64 certificate; at setup row 0 holds the raw phase-2 costs
        # (the all-artificial start basis has zero cost, so nothing was
        # reduced) and artificial columns are masked out of the dual check
        T = np.asarray(st.T, dtype=np.float64)
        Afull = T[2:, :-1].copy()
        bfull = T[2:, -1].copy()
        cfull = T[0, :-1].copy()
        return st, Afull, bfull, cfull

    return [
        ("random64_dantzig", random64, RULE_DANTZIG, 8, False),
        ("random24_bland", random24, RULE_BLAND, 8, False),
        ("random64_devex", random64, RULE_DEVEX, 8, False),
        ("eqheavy_phase1", eqheavy, RULE_DANTZIG, 8, True),
        ("degenerate_ties", degenerate, RULE_DANTZIG, 8, False),
    ]


def compiled_pin_suite(driver, verbose=False, names=None):
    """Run the compiled-driver correctness pins; returns a list of per-pin
    evidence dicts for the bench JSON artifact. The bench dies loudly (no
    JSON line) on any pin failure — a fast-but-wrong compiled binary must
    not produce a number."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from tpulp.core import SolverOptions
    from tpulp.solve.blocked import run_simplex_blocked
    from tpulp.solve.blocked_pallas import run_simplex_blocked_pallas

    run = run_simplex_blocked_pallas if driver == "pallas" \
        else run_simplex_blocked
    results = []
    for name, build, rule, block, deep_p1 in _pin_instances():
        if names is not None and name not in names:
            continue
        st, Afull, b, cfull = build(jnp.float32)
        opts = _dc.replace(
            SolverOptions.for_dtype(jnp.float32, max_iters=4000), rule=rule)
        out = run(st, opts, block=block)
        s, niter = int(out.status), int(out.niter)
        z_corner = float(out.objective())
        ok = s == 1 and niter > 20
        z64 = min_xb = min_rc = None
        if ok:
            art = np.asarray(st.art_cols)
            exclude = np.zeros(Afull.shape[1], dtype=bool)
            exclude[:art.shape[0]] = art
            z64, min_xb, min_rc = _basis_certificate(
                out.basis, Afull, b, cfull, exclude=exclude)
            # strong-duality certificate: terminal basis proven optimal
            ok = min_xb >= -1e-7 and min_rc >= -1e-6
        rec = {"pin": name, "driver": driver, "block": block,
               "status": s, "niter": niter, "corner_z": round(z_corner, 6),
               "basis_z64": None if z64 is None else round(z64, 9),
               "min_xb": min_xb, "min_reduced_cost": min_rc,
               "ok": bool(ok)}
        results.append(rec)
        print(f"# compiled-pin[{name} {driver} K={block}]: "
              f"{'OK' if ok else 'FAIL'} status={s} niter={niter} "
              f"corner={z_corner:.4f} basis_z64="
              f"{z64 if z64 is not None else float('nan'):.6f}",
              file=sys.stderr)
        assert ok, f"compiled pin {name} failed: {rec}"
        if deep_p1:
            # deep phase 1 actually happened: pivots exceed one K-block
            assert niter > block, (name, niter, block)
    return results


def verify_terminal_basis(state_out, m, n_struct, seed, dtype_name,
                          bounded=False):
    """Free mid-path correctness check of the timed big instance: the
    terminal basis must be primal feasible on the ORIGINAL f64 data and the
    tableau's objective corner must agree with the f64 basis objective.
    Costs one host linear solve — no extra device compile.

    Gates (VERDICT r3 weak #7 — tightened from the fixed -1e-3/-1e-2 pair,
    and RECORDED in the JSON artifact):
    * feasibility: min(xb) >= -10x the dtype ladder's feas_tol x scale
      (1e-4 x scale at f32, 1e-8 at f64);
    * corner agreement: |corner - z64| <= max(32 eps niter, 1e-5) |z64| —
      corner drift grows with walk length (measured ~1.4% after 272 f32
      devex pivots on a CORRECT basis), so a fixed tolerance either admits
      garbage on short walks or rejects correct long ones."""
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(m, n_struct))
    x0 = np.abs(rng.normal(size=n_struct))
    b = np.abs(D @ x0) + np.abs(rng.normal(size=m))  # b >= 0: feasible start
    c = rng.normal(size=n_struct)
    if bounded:
        D[-1] = 1.0
        b[-1] = 2.0 * x0.sum()
    A = np.concatenate([D, np.eye(m)], axis=1)
    cfull = np.concatenate([c, np.zeros(m)])
    basis = np.asarray(state_out.basis)
    niter = int(state_out.niter)
    corner = float(-np.asarray(state_out.T[0, -1]))
    n_tot = A.shape[1]
    Bmat = np.zeros((m, m))
    cb = np.zeros(m)
    for k, j in enumerate(basis):
        j = int(j)
        if j < n_tot:
            Bmat[:, k] = A[:, j]
            cb[k] = cfull[j]
        else:  # artificial: unit column (bench instances have none)
            Bmat[j - n_tot, k] = 1.0
    xb = np.linalg.solve(Bmat, b)
    scale = max(float(np.abs(b).max()), 1.0)
    z64 = float(cb @ xb)
    eps = {"float32": 1.19e-7, "float64": 2.22e-16}[dtype_name]
    feas_tol = {"float32": 1e-5, "float64": 1e-9}[dtype_name]  # ladder tols
    feas_gate = 10 * feas_tol * scale
    corner_gate = max(32 * eps * max(niter, 1), 1e-5) * max(abs(z64), 1.0)
    feas_ok = bool((xb >= -feas_gate).all())
    z_ok = abs(corner - z64) <= corner_gate
    line = (f"# terminal-basis check: min(xb)={xb.min():.2e} "
            f"(gate -{feas_gate:.2e}), corner z={corner:.4f} vs f64 basis "
            f"z={z64:.4f} (gate {corner_gate:.2e}) -> "
            f"{'OK' if feas_ok and z_ok else 'FAIL'}")
    print(line, file=sys.stderr)
    assert feas_ok, ("terminal basis primal-infeasible on original data: "
                     f"min xb = {xb.min()} vs gate -{feas_gate}")
    assert z_ok, (f"tableau corner {corner} drifted from f64 basis z {z64} "
                  f"beyond gate {corner_gate}")
    return {"min_xb": float(xb.min()), "feas_gate": feas_gate,
            "corner_z": corner, "basis_z64": z64,
            "corner_gate": corner_gate, "niter": niter, "ok": True}


def _roofline(driver, m, n_struct, block, dtype_name, rate, verbose):
    """Model HBM bytes/pivot for the chosen driver and compare the achieved
    bandwidth against the chip's peak (SURVEY §5 roofline check).

    Traffic models (f-byte elements, tableau (M, N) ~ (m+2, m+n+1)):
      rank1   : 2*M*N*f                  (read + write the tableau each pivot)
      blocked : 2*M*N*f/K + (M+N)*K*f    (flush amortized; U,V re-read/pivot)
      pallas  : 3*M*N*f/K + 8*(M+N)*f    (r5 fused flush: T read once,
                                          T and Tt written once per block;
                                          two 8-row windows per pivot; U,V
                                          live in VMEM)
    """
    f = {"float32": 4, "float64": 8}[dtype_name]
    M, N = m + 2, m + n_struct + 1
    if driver == "rank1":
        bpp = 2 * M * N * f
    elif driver == "blocked":
        bpp = 2 * M * N * f / block + (M + N) * block * f
    else:  # pallas
        bpp = 3 * M * N * f / block + 8 * (M + N) * f
    peak = 819e9  # one TPU v5e HBM, bytes/s
    achieved = bpp * rate
    sol = peak / bpp  # speed-of-light pivots/s at this traffic model
    line = (
        f"# roofline[{driver} K={block}]: {bpp / 1e6:.2f} MB/pivot model -> "
        f"{achieved / 1e9:.0f} GB/s achieved of {peak / 1e9:.0f} GB/s peak "
        f"({100 * achieved / peak:.0f}%); speed-of-light {sol:.0f} pivots/s "
        f"(measured {rate:.0f} = {100 * rate / sol:.0f}% of SoL)")
    print(line, file=sys.stderr)
    return line


def _previous_round_capture():
    """Headline value of the newest recorded BENCH_r*.json (round-over-round
    context carried INSIDE the artifact — VERDICT r4 item 8). Returns
    ``{"file", "value"}`` or None; the caller's fresh rate can be compared
    directly against ``value``."""
    import glob

    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    for path in reversed(files):
        try:
            with open(path) as f:
                data = json.load(f)
            if isinstance(data, dict) and "value" in data:
                return {"file": os.path.basename(path),
                        "value": data["value"]}
            # driver format: {"n", "cmd", "rc", "tail"} with the JSON line
            # embedded in the tail
            if isinstance(data, dict) and "tail" in data:
                for line in reversed(str(data["tail"]).splitlines()):
                    line = line.strip()
                    if line.startswith("{") and '"value"' in line:
                        inner = json.loads(line)
                        return {"file": os.path.basename(path),
                                "value": inner.get("value")}
        except (OSError, json.JSONDecodeError):
            continue
    return None


def run_bench(m=4096, n_struct=4096, pivots=1024, dtype_name="float32",
              seed=0, verbose=False, driver="pallas", block=128,
              repeats=120, reps=7, profile=False, pricing="default",
              groups=4, max_groups=8, spread_band=0.10):
    """Pivot throughput via ACCUMULATED two-point differencing, captured as
    BEST-OF-M independent group medians (VERDICT r3 weak #1).

    Within a group: each budget is timed over ``repeats`` back-to-back calls
    (host-side ``int(niter)`` read is the completion barrier —
    ``block_until_ready`` does not reliably block over the axon tunnel); the
    rate is d(total pivots)/d(total time) between the small and large
    budgets, which cancels the per-call latency exactly; the group value is
    the median of ``reps`` such measurements.

    Load noise is ADDITIVE per timing (each wall measurement = true time +
    contamination >= 0), but naive differencing is TWO-SIDED in the rate:
    noise on the big budget reads low, noise on the small budget reads HIGH
    (it shrinks the denominator) — which is exactly how the r3 band spanned
    73k..208k on one kernel. So the estimator here is min-time
    benchmarking applied per budget: within a group, the group rate uses
    the MINIMUM small-budget and MINIMUM big-budget times over ``reps``
    timings (minimum strips additive noise; differencing the minima still
    cancels the constant per-call tunnel latency). Residual contamination
    can then only bias LOW, so across groups the capture reports the
    MEDIAN OF THE TOP TWO group rates (r5 tightening, VERDICT r4 item 8:
    max-of-groups let one anomalously quiet window carry the headline by
    itself), and calls itself stable when the top two agree within
    ``spread_band`` (10%) with at least ``groups`` (4) retained groups —
    it keeps adding groups up to ``max_groups`` otherwise. The artifact
    also carries the previous round's recorded headline for an inline
    round-over-round comparison.
    The artifact records every group rate, the spread, and the stability
    verdict — the r3 artifact carried one number from a 2.8x variance band
    with no way to tell where in the band it fell.
    """
    import jax.numpy as jnp

    from tpulp.core import SolverOptions
    from tpulp.solve import run_simplex, run_simplex_blocked
    from tpulp.solve.blocked_pallas import run_simplex_blocked_pallas

    if driver == "blocked":
        run = lambda s, o: run_simplex_blocked(s, o, block=block)  # noqa: E731
    elif driver == "pallas":
        run = lambda s, o: run_simplex_blocked_pallas(s, o, block=block)  # noqa: E731
    else:
        run = run_simplex

    dtype = {"float32": jnp.float32, "float64": jnp.float64}[dtype_name]
    state = make_bench_state(m, n_struct, dtype, seed=seed)
    _ = float(state.T[0, 0])  # materialize on device before timing

    def _opts(max_iters):
        o = SolverOptions.for_dtype(dtype, max_iters=max_iters)
        if pricing == "devex":
            import dataclasses as _dc

            from tpulp.core import RULE_DEVEX

            o = _dc.replace(o, rule=RULE_DEVEX)
        return o

    p_small = max(pivots // 4, 1)
    o_small = _opts(p_small)
    o_big = _opts(pivots)

    # compile both executables
    t0 = time.time()
    n_small = int(run(state, o_small).niter)
    out_big = run(state, o_big)
    n_big = int(out_big.niter)
    t_warm = time.time() - t0
    # free correctness evidence on the timed instance itself: terminal basis
    # feasibility + corner consistency against the original f64 data
    gate = verify_terminal_basis(out_big, m, n_struct, seed, dtype_name)
    if n_big <= n_small:
        raise SystemExit(
            f"bench instance terminates at {n_big} pivots, below the small "
            f"budget {p_small}; pick a larger instance or smaller --pivots")

    def _one_group(gi):
        ts, tb = [], []
        for rep in range(reps):
            tot = {}
            for o, key in ((o_small, "s"), (o_big, "b")):
                t0 = time.time()
                for _ in range(repeats):
                    _ = int(run(state, o).niter)  # host read = barrier
                tot[key] = time.time() - t0
            ts.append(tot["s"])
            tb.append(tot["b"])
            if verbose:
                naive = repeats * (n_big - n_small) / (tot["b"] - tot["s"])
                print(
                    f"# group {gi} rep {rep}: {repeats}x{n_small}p in "
                    f"{tot['s']:.3f}s, {repeats}x{n_big}p in {tot['b']:.3f}s"
                    f" (naive {naive:.0f} pivots/s)",
                    file=sys.stderr,
                )
        denom = min(tb) - min(ts)
        if denom <= 0:
            return float("nan")
        return repeats * (n_big - n_small) / denom

    # Stability gate (tightened r5, VERDICT r4 weak #1 / item 8): require
    # at least ``groups`` (default 4) retained groups AND top-2 agreement
    # within ``spread_band`` (default 10%); the HEADLINE is the median of
    # the top two groups, not the max — a single anomalously quiet window
    # can no longer carry the number alone.
    group_rates = []
    stable = False
    while len(group_rates) < max_groups:
        g = _one_group(len(group_rates))
        if np.isfinite(g):
            group_rates.append(g)
        if len(group_rates) >= groups:
            top2 = sorted(group_rates)[-2:]
            stable = (top2[1] - top2[0]) <= spread_band * top2[1]
            if stable:
                break
    top2 = sorted(group_rates)[-2:]
    rate = float(np.mean(top2)) if len(top2) == 2 else float(top2[-1])
    spread = ((max(group_rates) - min(group_rates)) / max(group_rates))
    print(
        f"# {dtype_name} {driver} K={block} pricing={pricing}: warm "
        f"{t_warm:.1f}s; best-of-{len(group_rates)} min-time group rates "
        f"{[round(g) for g in group_rates]} -> {rate:.0f} pivots/s "
        f"(spread {100 * spread:.0f}%, "
        f"{'stable' if stable else 'UNSTABLE'})",
        file=sys.stderr,
    )
    roofline = _roofline(driver, m, n_struct, block, dtype_name, rate,
                         verbose)
    if profile:
        import jax

        trace_dir = os.path.join(os.path.dirname(__file__), ".profile_trace")
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                _ = int(run(state, o_big).niter)
        print(f"# jax.profiler trace -> {trace_dir}", file=sys.stderr)
    evidence = {
        "group_rates": [round(g, 1) for g in group_rates],
        "estimator": "median-of-top-2-groups",
        "spread": round(spread, 4),
        "stable": bool(stable),
        "spread_band": spread_band,
        "min_groups": groups,
        "previous_round": _previous_round_capture(),
        "terminal_gate": gate,
        "roofline": roofline,
        "warm_seconds": round(t_warm, 1),
        "pivots_small": n_small,
        "pivots_big": n_big,
    }
    return rate, n_big, evidence


def run_bench_batch(batch=1024, m=64, n_struct=64, dtype_name="float32",
                    seed=0, verbose=False, max_iters=500, driver="rank1",
                    block=32):
    """Batched mode (BASELINE config 3): vmap-solve ``batch`` independent
    random dense LPs in one device call; reports aggregate pivots/s.

    ``driver='blocked'`` uses the vmapped rank-K eta driver — the right
    engine once per-lane tableaus stop being VMEM-trivial (the rank-1
    batched driver re-reads every lane's whole tableau per pivot)."""
    import jax
    import jax.numpy as jnp

    from tpulp.batch import run_simplex_batch
    from tpulp.core import SolverOptions
    from tpulp.solve.blocked import run_simplex_blocked_batch

    dtype = {"float32": jnp.float32, "float64": jnp.float64}[dtype_name]
    # build on host, stack, ONE device transfer per leaf: 1024 per-state
    # eager transfers over the tunnel took minutes
    states = [
        make_bench_state(m, n_struct, dtype, seed=seed + i, bounded=True,
                         _numpy=True)
        for i in range(batch)
    ]
    batched = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *states)
    batched = jax.tree.map(jnp.asarray, batched)
    _ = float(batched.T[0, 0, 0])
    opts = SolverOptions.for_dtype(dtype, max_iters=max_iters)

    if driver == "blocked":
        def run(s, o):
            return run_simplex_blocked_batch(s, o, block=block)
    else:
        def run(s, o):
            return run_simplex_batch(s, o)

    # compile
    out = run(batched, opts)
    _ = int(out.niter[0])
    t0 = time.time()
    out = run(batched, opts)
    total_piv = int(np.asarray(out.niter).sum())  # host read = barrier
    dt = time.time() - t0
    statuses = np.asarray(out.status)
    optimal = int((statuses == 1).sum())
    if verbose:
        from tpulp.core import Status

        hist = {Status.NAMES.get(int(s), str(int(s))): int(c)
                for s, c in zip(*np.unique(statuses, return_counts=True))}
        print(
            f"# batch {batch}x({m}x{m + n_struct}) {dtype_name}: {dt:.3f}s, "
            f"{total_piv} pivots, {optimal}/{batch} optimal {hist}, "
            f"{total_piv / dt:.0f} pivots/s, {batch / dt:.0f} LPs/s",
            file=sys.stderr,
        )
    return total_piv / dt, batch / dt


def run_bench_milp(n_items=28, batch_size=128, dtype_name="float32",
                   seed=0, verbose=False):
    """MILP B&B node throughput (BASELINE config 4): a 0/1 knapsack with
    ``n_items`` binary variables, solved to proven optimality; reports
    nodes/s (each node = one LP relaxation in a batched device wave).

    Waves run in f32 on device (f64 is emulated on v5e, ~13x slower);
    exactness is preserved anyway: incumbents are exact-verified and failed
    lanes re-solve through the precision ladder. The DP-oracle assert below
    is the proof."""
    import jax.numpy as jnp

    from tpulp import LinExpr, LinProg
    from tpulp.milp import solve_milp

    rng = np.random.default_rng(seed)
    values = [int(v) for v in rng.integers(10, 60, size=n_items)]
    weights = [int(w) for w in rng.integers(5, 25, size=n_items)]
    cap = int(sum(weights) * 0.4)
    lp = LinProg()
    obj = LinExpr()
    wexpr = LinExpr()
    for i, (v, w) in enumerate(zip(values, weights)):
        lp.addVar(f"x{i}", integral=True, lb=0, ub=1)
        obj += LinExpr(v, f"x{i}")
        wexpr += LinExpr(w, f"x{i}")
    lp.maximize(obj)
    lp.addConstraint(wexpr.constraintLeq(cap))

    dtype = {"float32": jnp.float32, "float64": jnp.float64}[dtype_name]
    # warm: one full untimed solve compiles EVERY wave executable — cold
    # two-phase, dual-simplex warm wave, AND the r5 device-generation
    # expansion chain (max_nodes=3 no longer reaches the warm executable:
    # the chain's first wave alone can exceed 3 nodes)
    solve_milp(lp, dtype=dtype, batch_size=batch_size)
    t0 = time.time()
    sol, stats = solve_milp(lp, dtype=dtype, batch_size=batch_size,
                            return_stats=True)
    dt = time.time() - t0

    # DP oracle: the bench is also a correctness gate
    best = [0] * (cap + 1)
    for v, w in zip(values, weights):
        for c in range(cap, w - 1, -1):
            best[c] = max(best[c], best[c - w] + v)
    assert sol.status == "optimal" and sol.objective == best[cap], (
        sol.status, sol.objective, best[cap])
    if verbose:
        print(
            f"# milp knapsack n={n_items} batch={batch_size} {dtype_name}: "
            f"{dt:.3f}s, {stats.nodes_solved} nodes in {stats.waves} waves, "
            f"{stats.incumbent_updates} incumbents, "
            f"{stats.nodes_pruned_bound} bound-pruned, "
            f"{stats.solo_resolves} solo re-solves, "
            f"{stats.nodes_solved / dt:.0f} nodes/s | wave time: "
            f"assemble {stats.t_assemble:.3f}s, device(+fetch) "
            f"{stats.t_device:.3f}s, process {stats.t_process:.3f}s "
            f"(verify {stats.t_verify:.3f}s)",
            file=sys.stderr,
        )
    return stats.nodes_solved / dt, stats.nodes_solved


def run_bench_corpus(dtype_name="float32", verbose=False):
    """Corpus parity sweep (BASELINE parity bar: lpsol LPs + netlib-style
    instances, rel gap <= 1e-9). Solves every corpus case on the device path
    at the requested iterate precision with the full precision ladder +
    exact-basis refinement; reports exact-match count and prints the per-case
    parity table (raw float objective gap vs refined gap) when verbose."""
    import jax.numpy as jnp

    from tpulp.corpus import CASES
    from tpulp.solve import solve_lp

    dtype = {"float32": jnp.float32, "float64": jnp.float64}[dtype_name]
    n_ok = 0
    rows = []
    for c in CASES:
        sf = c.lp().lower()
        t0 = time.time()
        sol = solve_lp(sf, dtype=dtype, max_iters=c.max_iters)
        dt = time.time() - t0
        ok = sol.status == c.status
        raw_gap = refined_gap = None
        raw_note = ""
        if c.status == "optimal" and ok:
            # raw float objective (no refinement) vs exact oracle
            raw = solve_lp(sf, dtype=dtype, refine="none", fallback="none",
                           max_iters=c.max_iters)
            denom = max(abs(float(c.objective)), 1.0)
            if raw.status == "optimal":
                raw_gap = abs(float(raw.objective) - float(c.objective)) / denom
            else:
                # distinguish WHY the raw column is empty (VERDICT r3 weak
                # #8): iteration_limit = budget exhausted at this precision;
                # anything else = the raw float walk failed outright (the
                # ladder's escalation is what rescued the refined column)
                raw_note = f"raw:{raw.status}"
            refined_gap = abs(
                float(sol.objective - c.objective)) / denom
            ok = ok and refined_gap <= 1e-9
        n_ok += bool(ok)
        rows.append((c.name, sol.status, sol.niter, raw_gap, refined_gap, dt,
                     sol.rung))
        if verbose:
            rg = f"{raw_gap:.2e}" if raw_gap is not None else (
                raw_note or "-")
            fg = f"{refined_gap:.2e}" if refined_gap is not None else "-"
            print(
                f"# {c.name:24s} {sol.status:12s} niter={sol.niter:6d} "
                f"raw_gap={rg:9s} refined_gap={fg:9s} {dt:6.2f}s "
                f"rung={sol.rung or '-':18s} {'OK' if ok else 'FAIL'}",
                file=sys.stderr,
            )
    # per-rung escalation table (r5, VERDICT r4 item 1 "done when"): which
    # precision-ladder rung produced each family's final answer
    rungs = {}
    for row in rows:
        rungs[row[6] or "unknown"] = rungs.get(row[6] or "unknown", 0) + 1
    if verbose:
        print(f"# ladder escalation rates: {rungs} "
              f"({len(CASES)} cases at requested dtype {dtype_name})",
              file=sys.stderr)
    return n_ok, len(CASES), rows, rungs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="single",
                    choices=["single", "batch", "corpus", "milp"])
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096,
                    help="dense structural columns (tableau width = m + n)")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pivots", type=int, default=1024)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    ap.add_argument("--driver", default="pallas",
                    choices=["blocked", "pallas", "rank1"])
    ap.add_argument("--block", type=int, default=256,
                    help="rank-K block size for the blocked/pallas drivers "
                         "(K=256 measured fastest for pallas at 4096x8192: "
                         "flush traffic halves vs K=128 and U/V still fit "
                         "VMEM)")
    ap.add_argument("--repeats", type=int, default=120,
                    help="back-to-back calls per timed budget (r5: raised "
                         "50 -> 120 — the kernel got ~1.7x faster, so the "
                         "two-point differencing denominators shrank below "
                         "the tunnel's contamination scale and groups read "
                         "impossible highs; bigger budgets restore >0.6 s "
                         "denominators)")
    ap.add_argument("--reps", type=int, default=7,
                    help="measurements per group (group rate uses the "
                         "MINIMUM time per budget; more reps = better odds "
                         "of one contamination-free timing per group)")
    ap.add_argument("--groups", type=int, default=4,
                    help="minimum independent measurement groups; the "
                         "capture is the MEDIAN OF THE TOP TWO group rates "
                         "and keeps adding groups (to --max-groups) until "
                         "the top two agree within --spread-band")
    ap.add_argument("--max-groups", type=int, default=8)
    ap.add_argument("--spread-band", type=float, default=0.10)
    ap.add_argument("--pricing", default="default",
                    choices=["default", "devex"],
                    help="pricing rule for the timed driver (single mode)")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-compiled-pin", action="store_true",
                    help="skip the compiled-driver correctness pin (one "
                         "extra small-shape compile, ~minutes on the "
                         "tunneled TPU)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of the timed region "
                         "and print the HBM roofline check")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    if args.dtype == "float64" or args.mode in ("corpus", "milp"):
        # must happen before any tpulp array is created; corpus mode needs
        # x64 so the precision ladder's f64 rung exists on device
        import jax

        jax.config.update("jax_enable_x64", True)

    if not args.skip_parity:
        parity_check()

    if args.mode == "corpus":
        n_ok, n_total, _, rungs = run_bench_corpus(
            dtype_name=args.dtype, verbose=args.verbose)
        print(json.dumps({
            "metric": f"corpus parity, {n_total} netlib-style instances, "
                      f"{args.dtype} iterates + exact refinement, 1 chip",
            "value": n_ok,
            "unit": "instances at <=1e-9 rel gap",
            "escalation_rates": rungs,
            "vs_baseline": round(n_ok / n_total, 4),
        }))
        return

    if args.mode == "milp":
        rate, nodes = run_bench_milp(
            batch_size=args.batch if args.batch <= 512 else 128,
            dtype_name=args.dtype, verbose=args.verbose)
        print(json.dumps({
            "metric": "MILP B&B node throughput, 28-var 0/1 knapsack to "
                      f"proven optimality ({args.dtype} waves + exact "
                      "incumbents), 1 chip",
            "value": round(rate, 1),
            "unit": "nodes/s",
            "vs_baseline": round(rate / 100.0, 4),
        }))
        return

    target = 1e4
    if args.mode == "batch":
        # batch shapes default to 64x128 lanes but are NOT capped (VERDICT
        # r2 weak #3): --m/--n set the true per-lane tableau size; use
        # --driver blocked for non-VMEM-trivial lanes
        bm = args.m if args.m != 4096 else 64
        bn = args.n if args.n != 4096 else 64
        bdriver = "blocked" if args.driver == "blocked" else "rank1"
        rate, lps = run_bench_batch(
            batch=args.batch, m=bm, n_struct=bn,
            dtype_name=args.dtype, verbose=args.verbose, driver=bdriver,
            block=min(args.block, 32),
            max_iters=args.pivots if args.pivots != 1024 else 500)
        print(json.dumps({
            "metric": f"batched simplex ({bdriver}), {args.batch} "
                      f"independent {bm}x{bm + bn} LPs ({args.dtype}), "
                      "1 chip",
            "value": round(rate, 1),
            "unit": "pivots/s",
            "vs_baseline": round(rate / target, 4),
        }))
        return

    rate, _, evidence = run_bench(
        m=args.m, n_struct=args.n, pivots=args.pivots,
        dtype_name=args.dtype, verbose=args.verbose,
        driver=args.driver, block=args.block,
        repeats=args.repeats, reps=args.reps,
        profile=args.profile, pricing=args.pricing,
        groups=args.groups, max_groups=args.max_groups,
        spread_band=args.spread_band)
    if args.driver in ("blocked", "pallas") and not args.skip_compiled_pin:
        # dies loudly (no JSON) if the compiled kernel is fast-but-wrong
        evidence["compiled_pins"] = compiled_pin_suite(
            args.driver, verbose=args.verbose)
    # the metric string states the iterate precision POLICY explicitly
    # (VERDICT r2 weak #1): f32 iterates are the measured configuration;
    # final answers are refined/certified exactly from the terminal basis
    # (the in-bench terminal-basis check + compiled pins are the evidence,
    # and they now ride INSIDE the artifact — VERDICT r3 item 2)
    policy = (f"{args.dtype} iterates + exact final-basis refinement policy"
              if args.dtype == "float32" else f"{args.dtype}")
    pricing_tag = "" if args.pricing == "default" else f", {args.pricing}"
    print(json.dumps({
        "metric": f"simplex pivot throughput, {args.m}x{args.m + args.n} "
                  f"dense tableau ({policy}{pricing_tag}), 1 chip",
        "value": round(rate, 1),
        "unit": "pivots/s",
        "vs_baseline": round(rate / target, 4),
        "evidence": evidence,
    }))


if __name__ == "__main__":
    main()
