"""TPU kernels: Pallas fused pivot/pricing, plus the jnp reference path.

The jnp implementations live in ``tpulp.solve.driver`` (``pivot_update``,
``choose_pivot``) — XLA fuses them well; the Pallas versions here fuse the
pricing reduction into the same HBM pass and serve as the explicit-kernel
path mandated by BASELINE.json."""

from .pallas_pivot import fused_pivot_update, pallas_pivot_update

__all__ = ["fused_pivot_update", "pallas_pivot_update"]
