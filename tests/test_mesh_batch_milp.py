"""One-call multi-chip batch + MILP (round 5, VERDICT r4 item 3).

SCALING.md §3.3's conclusion — the BATCH axis is the scalable cross-host
dimension (independent LP lanes, zero per-pivot cross-lane traffic) — made
reachable from the user API: ``solve_lp_batch(mesh=...)`` and
``solve_milp(mesh=...)`` shard the wave states batch-outermost (plus
per-lane column sharding when the mesh has a cols axis) over the
8-virtual-device fake cluster, with exact objective parity against the
single-device paths. The reference's B&B seed that generates these
independent LPs: /root/reference/lpsol/linprog.py:311-381.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tpulp.batch import solve_lp_batch
from tpulp.corpus import _equality_heavy
from tpulp.milp import solve_milp
from tpulp.model.expr import LinExpr
from tpulp.model.prog import LinProg


def _mesh_2d():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("batch", "cols"))


def _mesh_1d():
    return Mesh(np.array(jax.devices()[:8]), ("batch",))


def _set_cover(n_items=16, n_sets=28, seed=1, p=0.2):
    rng = np.random.default_rng(seed)
    lp = LinProg(f"setcover_{seed}")
    xs = [lp.addVar(f"s{j}", integral=True, lb=0, ub=1).x
          for j in range(n_sets)]
    cost = rng.integers(2, 20, size=n_sets)
    obj = LinExpr()
    for j in range(n_sets):
        obj += LinExpr(int(cost[j]), xs[j])
    lp.minimize(obj)
    cover = rng.random((n_sets, n_items)) < p
    for i in range(n_items):
        if not cover[:, i].any():
            cover[int(rng.integers(0, n_sets)), i] = True
        e = LinExpr()
        for j in range(n_sets):
            if cover[j, i]:
                e += LinExpr(1, xs[j])
        lp.addConstraint(e.constraintGeq(1))
    return lp


class TestMeshBatch:
    @pytest.mark.parametrize("mesh_fn", [_mesh_2d, _mesh_1d],
                             ids=["2d", "1d-batch-only"])
    def test_batch_mesh_objective_parity(self, mesh_fn):
        lps = [_equality_heavy(24, 48, seed=s, name=f"eq{s}")()
               for s in range(5)]
        ref = solve_lp_batch([lp for lp in lps])
        sols = solve_lp_batch(
            [_equality_heavy(24, 48, seed=s, name=f"eq{s}")()
             for s in range(5)], mesh=mesh_fn())
        for r, s in zip(ref, sols):
            assert s.status == r.status == "optimal"
            assert s.objective == r.objective

    def test_batch_mesh_statuses(self):
        # infeasible / unbounded lanes keep correct per-lane statuses
        lp_inf = LinProg("inf")
        lp_inf.addVar("x")
        lp_inf.minimize(LinExpr(1, "x"))
        lp_inf.addConstraint(LinExpr(1, "x").constraintLeq(1))
        lp_inf.addConstraint(LinExpr(1, "x").constraintGeq(3))
        lp_unb = LinProg("unb")
        lp_unb.addVar("x")
        lp_unb.maximize(LinExpr(1, "x"))
        lp_unb.addConstraint(LinExpr(1, "x").constraintGeq(1))
        lp_opt = _equality_heavy(24, 48, seed=2, name="eq_ok")()
        sols = solve_lp_batch([lp_inf, lp_unb, lp_opt], mesh=_mesh_2d())
        assert [s.status for s in sols] == [
            "infeasible", "unbounded", "optimal"]

    def test_batch_mesh_rejects_unsupported(self):
        lp = _equality_heavy(24, 48, seed=0, name="eq0")()
        with pytest.raises(ValueError, match="bounded"):
            solve_lp_batch([lp], mesh=_mesh_2d(), simple_bounds=True)
        with pytest.raises(ValueError, match="rank1"):
            solve_lp_batch([lp], mesh=_mesh_2d(), driver="blocked")


class TestMeshMilp:
    def test_set_cover_parity_1_vs_8_devices(self):
        """The VERDICT item's acceptance test: a set-cover MILP solves
        IDENTICALLY on 1 device and on the 8-virtual-device mesh."""
        # chainless on BOTH sides: exact node-count parity needs the same
        # scheduler (mesh waves chain by default since late r5)
        ref, st0 = solve_milp(_set_cover(seed=1), batch_size=16,
                              device_generations=0, return_stats=True)
        sol, st = solve_milp(_set_cover(seed=1), batch_size=16,
                             device_generations=0, mesh=_mesh_2d(),
                             return_stats=True)
        assert sol.status == ref.status == "optimal"
        assert sol.objective == ref.objective
        assert sol.x == ref.x
        # the run exercised real waves (warm starts included), not just a
        # root solve
        assert st.nodes_solved == st0.nodes_solved >= 3
        # and the CHAINED mesh scheduler lands the same optimum too
        csol, cst = solve_milp(_set_cover(seed=1), batch_size=16,
                               mesh=_mesh_2d(), return_stats=True)
        assert csol.status == "optimal"
        assert csol.objective == ref.objective
        assert cst.gen_waves > 0  # mesh waves actually chained

    def test_batch_only_mesh(self):
        ref = solve_milp(_set_cover(seed=2), batch_size=16)
        sol = solve_milp(_set_cover(seed=2), batch_size=16, mesh=_mesh_1d())
        assert sol.status == ref.status
        assert sol.objective == ref.objective

    def test_mesh_milp_validations(self):
        with pytest.raises(ValueError, match="multiple"):
            solve_milp(_set_cover(seed=1), batch_size=3, mesh=_mesh_2d())
        with pytest.raises(ValueError, match="rows"):
            solve_milp(_set_cover(seed=1), batch_size=16, mesh=_mesh_2d(),
                       node_encoding="spans")
