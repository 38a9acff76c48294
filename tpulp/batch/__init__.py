"""Batched solving: thousands of independent LPs per chip via vmap."""

from .vmap_driver import (
    make_batched_states,
    run_simplex_batch,
    solve_lp_batch,
    stack_states,
    unstack_state,
)

__all__ = [
    "make_batched_states",
    "run_simplex_batch",
    "solve_lp_batch",
    "stack_states",
    "unstack_state",
]
