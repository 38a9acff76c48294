"""TPU kernels: the Pallas persistent-VMEM blocked pivot loop.

The jnp rank-1 path lives in ``tpulp.solve.driver.pivot_update`` (XLA fuses
it into one HBM read+write); this package holds the explicit Pallas kernel
that runs a whole rank-K eta block on-chip (``blocked_inner_block``), the
production hot path mandated by BASELINE.json."""

from .pallas_block import blocked_inner_block

__all__ = ["blocked_inner_block"]
