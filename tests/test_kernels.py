"""Pallas kernels vs the jnp reference path (interpret/compiled on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpulp.solve.driver import pivot_update


def _random_T(seed, m=14, n=31):
    rng = np.random.default_rng(seed)
    T = rng.normal(size=(m + 2, n + 1))
    # make a safe pivot element
    T[5, 3] = 2.5
    return jnp.asarray(T, dtype=jnp.float64)


class TestPallasPivot:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_jnp_pivot(self, seed):
        from tpulp.kernels import pallas_pivot_update

        T = _random_T(seed)
        r_glob, j = 5, 3
        ref = pivot_update(T, jnp.int32(r_glob), jnp.int32(j))
        got, cmins, cargs = pallas_pivot_update(T, r_glob, j, tile_n=T.shape[1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)

    def test_next_pricing_candidate(self):
        from tpulp.kernels import fused_pivot_update

        T = _random_T(7)
        ref = pivot_update(T, jnp.int32(5), jnp.int32(3))
        Tn, j_next, cmin = fused_pivot_update(T, 5, 3, tile_n=T.shape[1])
        obj = np.asarray(ref)[0, :]
        assert int(j_next) == int(np.argmin(obj))
        assert abs(float(cmin) - obj.min()) < 1e-12

    def test_tiled_grid(self):
        from tpulp.kernels import pallas_pivot_update

        T = _random_T(3, m=14, n=63)  # width 64 -> 2 tiles of 32
        ref = pivot_update(T, jnp.int32(5), jnp.int32(3))
        got, cmins, cargs = pallas_pivot_update(T, 5, 3, tile_n=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)
        # global argmin from tile candidates matches
        obj = np.asarray(ref)[0, :]
        k = int(np.argmin(np.asarray(cmins)))
        assert int(np.asarray(cargs)[k]) == int(np.argmin(obj))
