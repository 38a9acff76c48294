"""Genuine netlib instances end-to-end (VERDICT r3 item 1).

``data/netlib/afiro.mps`` is the canonical smallest netlib LP, reconstructed
offline and accepted only because its exact-rational solve reproduces the
PUBLISHED netlib optimum (-4.6475314286E+02) to full precision — see
data/netlib/README.md for the provenance/checksum methodology. These tests
run the full production path on it: read -> presolve -> lower -> device
solve -> refinement ladder, plus pricing variants and file round-trips.
"""

import os
from fractions import Fraction as F

import pytest

from tpulp.io.mps import read_mps, read_mps_string, write_mps_string
from tpulp.solve import solve_lp

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "netlib")

# published netlib optimum for AFIRO: -4.6475314286E+02; the exact rational
# value our solver derives for it is -406659/875 = -464.75314285714285...
AFIRO_OPT = F(-406659, 875)


def _afiro():
    return read_mps(os.path.join(DATA, "afiro.mps"))


def test_afiro_matches_published_statistics():
    lp = _afiro()
    assert len(lp.allVarNames()) == 32
    assert len(lp.constraints) == 27
    # 83 constraint-matrix nonzeros + 5 objective coefficients (published
    # archive statistics for AFIRO)
    nnz = sum(len(c.simplify().left.terms()) for c in lp.constraints)
    assert nnz == 83
    assert len(lp.objective.expr.terms()) == 5


def test_afiro_published_optimum_float_agrees():
    # the archive publishes -4.6475314286E+02 (11 significant digits)
    assert abs(float(AFIRO_OPT) - (-4.6475314286e02)) < 5e-9


def test_afiro_exact_rational_solve():
    sol = _afiro().solve(refine="exact")
    assert sol.status == "optimal"
    assert sol.objective == AFIRO_OPT


@pytest.mark.parametrize("dtype_name", ["float32", "float64"])
def test_afiro_device_ladder_exact(dtype_name):
    import jax.numpy as jnp

    sol = solve_lp(_afiro(), dtype=getattr(jnp, dtype_name), refine="exact")
    assert sol.status == "optimal"
    assert sol.objective == AFIRO_OPT


def test_afiro_presolve_composes():
    from tpulp.model.presolve import presolve

    lp = _afiro()
    res = presolve(lp)
    assert res.status is None
    assert res.removed_rows >= 1  # redundant equality structure shrinks
    sol = lp.solve(presolve=True)
    assert sol.status == "optimal"
    assert sol.objective == AFIRO_OPT


def test_afiro_devex_pricing_exact():
    sol = solve_lp(_afiro(), pricing="devex", refine="exact")
    assert sol.status == "optimal"
    assert sol.objective == AFIRO_OPT


def test_afiro_write_read_round_trip():
    lp = _afiro()
    lp2 = read_mps_string(write_mps_string(lp))
    assert sorted(lp2.mps_names.values()) == sorted(lp.mps_names.values())
    sol = solve_lp(lp2, refine="exact")
    assert sol.objective == AFIRO_OPT


def test_afiro_in_bench_corpus():
    from tpulp.corpus import get_case

    case = get_case("netlib_afiro")
    assert case.objective == AFIRO_OPT
    assert "netlib" in case.oracle


def test_afiro_duals_through_presolve_kkt():
    """Sensitivity composes with presolve on the real netlib instance:
    mapped duals satisfy exact KKT + strong duality on the ORIGINAL rows."""
    from tests.test_duals import _kkt_verify

    lp = _afiro()
    sol = lp.solve(presolve=True, duals=True)
    assert sol.status == "optimal"
    assert sol.objective == AFIRO_OPT
    assert sol.duals is not None
    _kkt_verify(lp, sol)
