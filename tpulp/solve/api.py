"""High-level LP solving API over the device driver.

``solve_lp`` is the user entry point the reference never had (its Simplex
required hand-built canonical tableaus): LinProg/StandardForm in, Solution
out, with status reporting and final-basis refinement for exact-parity
objectives.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..core.state import SimplexState, SolverOptions, Status, make_state
from ..model.lower import StandardForm, lower_to_standard_form
from ..model.prog import MAX, LinProg
from .driver import extract_solution, run_simplex
from .refine import refine_basis_solution

__all__ = ["Solution", "solve_lp", "solve_standard_form", "state_from_standard_form"]


@dataclasses.dataclass
class Solution:
    """Result of an LP/MILP solve.

    ``objective``/``x`` are in the ORIGINAL problem's sense and variables
    (exact Fractions when refinement ran exactly, floats otherwise);
    ``objective_min`` is the internal minimization value including the
    lowering constant.
    """

    status: str
    objective: Optional[Union[float, Fraction]] = None
    x: Optional[Dict[str, Any]] = None
    niter: int = 0
    objective_min: Optional[Union[float, Fraction]] = None
    col_values: Optional[Dict[int, Any]] = None
    basis: Optional[list] = None

    @property
    def is_optimal(self) -> bool:
        return self.status == "optimal"


def state_from_standard_form(
    sf: StandardForm,
    dtype=jnp.float64,
    n_extra_art: int = 0,
) -> SimplexState:
    """Initial device state for a lowered problem."""
    c, A, b = sf.to_dense(np.float64)
    return make_state(c, A, b, sf.basis_hint, dtype=dtype,
                      n_extra_art=n_extra_art)


def solve_standard_form(
    sf: StandardForm,
    options: Optional[SolverOptions] = None,
    dtype=jnp.float64,
    refine: str = "auto",
) -> Solution:
    """Solve a lowered StandardForm on the device path."""
    if options is None:
        options = SolverOptions.for_dtype(dtype)
    if sf.trivially_infeasible:
        return Solution(status="infeasible")
    state = state_from_standard_form(sf, dtype=dtype)
    out = run_simplex(state, options)
    status_code = int(out.status)
    status = Status.NAMES.get(status_code, f"status_{status_code}")
    niter = int(out.niter)
    if status != "optimal":
        return Solution(status=status, niter=niter)

    basis = [int(j) for j in np.asarray(out.basis)]
    if refine == "none":
        x_dev, z_dev = extract_solution(out)
        x_np = np.asarray(x_dev)
        col_values = {j: float(x_np[j]) for j in range(sf.n) if x_np[j] != 0}
        z_min = float(z_dev) + float(sf.obj_const)
    else:
        col_values, z_min = refine_basis_solution(sf, basis, mode=refine)

    # feasibility sanity on the refined basis values (a broken float basis
    # surfaces here rather than as a silently wrong answer)
    for v in col_values.values():
        if v < -1e-6:
            return Solution(status="numerical_error", niter=niter)

    def colval(j):
        return col_values.get(j, Fraction(0) if refine != "none" else 0.0)

    x = {}
    for name, (terms, const) in sf.recover.items():
        val = const
        for col, coeff in terms:
            val = val + coeff * colval(col)
        x[name] = val
    obj = -z_min if sf.sense == MAX else z_min
    return Solution(
        status="optimal",
        objective=obj,
        x=x,
        niter=niter,
        objective_min=z_min,
        col_values=dict(col_values),
        basis=basis,
    )


def solve_lp(
    prog: Union[LinProg, StandardForm],
    options: Optional[SolverOptions] = None,
    dtype=jnp.float64,
    refine: str = "auto",
    **opt_overrides,
) -> Solution:
    """Solve an LP (ignoring any integrality) on the TPU device path.

    ``opt_overrides`` are SolverOptions field overrides, e.g.
    ``solve_lp(lp, max_iters=500, rule=RULE_BLAND)``."""
    if options is None:
        options = SolverOptions.for_dtype(dtype)
    if opt_overrides:
        options = dataclasses.replace(options, **opt_overrides)
    sf = prog if isinstance(prog, StandardForm) else lower_to_standard_form(prog)
    return solve_standard_form(sf, options=options, dtype=dtype, refine=refine)
