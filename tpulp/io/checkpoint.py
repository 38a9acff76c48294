"""Checkpoint / resume for device solver state.

The reference's JSON tableau serialization is a full checkpoint whose basis
is reconstructible on load (tableau.py:312-360 + isCanonical; SURVEY.md §5
"checkpoint/resume"). The device analogue saves the complete ``SimplexState``
pytree (plus the MILP frontier, for B&B restarts) as an .npz archive:
load-then-``run_simplex`` is the warm-start path, exactly mirroring the
reference's load-then-``Simplex(tab)``.
"""

from __future__ import annotations

import json
from fractions import Fraction
from typing import Any, Dict, List, Tuple

import numpy as np

from ..core.state import SimplexState

__all__ = [
    "save_state",
    "load_state",
    "save_bnb_frontier",
    "load_bnb_frontier",
    "simplex_state_to_tableau",
]

_FIELDS = SimplexState._fields


def save_state(path: str, state: SimplexState) -> None:
    """Write a SimplexState to ``path`` (.npz)."""
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    np.savez(path, **arrays)


def load_state(path: str, dtype=None) -> SimplexState:
    """Read a SimplexState; optionally cast the tableau dtype."""
    import jax.numpy as jnp

    data = np.load(path)
    kwargs = {name: jnp.asarray(data[name]) for name in _FIELDS}
    if dtype is not None:
        kwargs["T"] = kwargs["T"].astype(dtype)
        kwargs["last_z"] = kwargs["last_z"].astype(dtype)
    return SimplexState(**kwargs)


def _frac_str(f: Fraction) -> str:
    return str(f)


def save_bnb_frontier(path: str, frontier: List[Tuple], incumbent_z,
                      meta: Dict[str, Any] | None = None) -> None:
    """Persist a B&B frontier:
    [(bound, tiebreak, {var: (lb, ub)}, parent_basis|None), ...].

    All rationals are stored as exact 'p/q' strings. The optional parent
    basis (batched-space column indices) re-enables dual-simplex warm starts
    after a resume (round 4): ``solve_milp`` reconstructs the parent frame
    from (basis, node b) and re-optimizes with the dual simplex, so even
    the resumed FIRST wave runs warm. Legacy 3-tuples (no basis) are
    accepted and solve cold."""
    nodes = []
    for entry in frontier:
        if len(entry) == 3:
            bound, tb, bounds = entry
            pbasis = None
        else:
            bound, tb, bounds, pbasis = entry
        nodes.append({
            "bound": _frac_str(bound),
            "tiebreak": tb,
            "bounds": {
                name: [_frac_str(lo), _frac_str(hi)]
                for name, (lo, hi) in bounds.items()
            },
            "basis": None if pbasis is None
            else [int(j) for j in pbasis],
        })
    payload = {
        "incumbent_z": None if incumbent_z is None else _frac_str(incumbent_z),
        "meta": meta or {},
        "nodes": nodes,
    }
    with open(path, "w") as fh:
        json.dump(payload, fh)


def load_bnb_frontier(path: str):
    """(frontier, incumbent_z, meta) from a saved B&B checkpoint; frontier
    entries are (bound, tiebreak, bounds, parent_basis|None)."""
    with open(path) as fh:
        payload = json.load(fh)
    inc = payload["incumbent_z"]
    incumbent_z = None if inc is None else Fraction(inc)
    frontier = [
        (
            Fraction(node["bound"]),
            node["tiebreak"],
            {
                name: (Fraction(lo), Fraction(hi))
                for name, (lo, hi) in node["bounds"].items()
            },
            None if node.get("basis") is None
            else np.asarray(node["basis"], dtype=np.int32),
        )
        for node in payload["nodes"]
    ]
    return frontier, incumbent_z, payload.get("meta", {})


def simplex_state_to_tableau(state: SimplexState):
    """Down-convert a device state to the host exact ``Tableau`` (float
    entries become exact binary rationals via Fraction(float)).

    Bridges the device path back into the reference-compatible JSON schema
    (and the teaching/pretty-print surface)."""
    from ..tableau import Tableau

    T = np.asarray(state.T, dtype=np.float64)
    m = T.shape[0] - 2
    n = T.shape[1] - 1
    tab = Tableau(m, n)
    tab.setZ(Fraction(float(-T[0, -1])))
    tab.setC([Fraction(float(v)) for v in T[0, :-1]])
    tab.setB([Fraction(float(v)) for v in T[2:, -1]])
    tab.setA([[Fraction(float(v)) for v in row[:-1]] for row in T[2:]])
    names = []
    art = np.asarray(state.art_cols)
    for jcol in range(n):
        names.append(f"$a{jcol}" if art[jcol] else f"x{jcol}")
    tab.setVarNames(names)
    marks = [False] * n
    for jcol in np.asarray(state.basis):
        marks[int(jcol)] = True
    tab.setVarMarks(marks)
    return tab
