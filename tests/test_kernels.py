"""Pallas kernel tests (interpreter mode on CPU; same code path as TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustpointclouds_tpu.kernels import masked_stats


def _ref(x, mask):
    m = mask.astype(np.float32)
    cnt = max(m.sum(), 1.0)
    mean = (x * m[:, None]).sum(0) / cnt
    var = (((x - mean) ** 2) * m[:, None]).sum(0) / cnt
    return mean, var, m.sum()


class TestMaskedStats:
    @pytest.mark.parametrize("n,c", [(100, 8), (1024, 64), (3000, 16)])
    def test_matches_reference(self, n, c):
        rng = np.random.RandomState(0)
        x = rng.randn(n, c).astype(np.float32) * 3 + 1
        mask = rng.rand(n) > 0.3
        mean, var, cnt = masked_stats(jnp.asarray(x), jnp.asarray(mask))
        rm, rv, rc = _ref(x, mask)
        np.testing.assert_allclose(np.asarray(mean), rm, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), rv, rtol=1e-3, atol=1e-4)
        assert float(cnt) == rc

    def test_all_masked(self):
        x = jnp.ones((64, 4))
        mean, var, cnt = masked_stats(x, jnp.zeros(64, bool))
        assert float(cnt) == 0.0
        np.testing.assert_allclose(np.asarray(mean), 0.0)

    def test_gradients_match_autodiff(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(200, 8).astype(np.float32))
        mask = jnp.asarray(rng.rand(200) > 0.4)

        def via_kernel(x_):
            mean, var, _ = masked_stats(x_, mask)
            return jnp.sum(mean * 2.0) + jnp.sum(var * 0.5)

        def via_jnp(x_):
            m = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x_ * m, 0) / cnt
            var = jnp.sum(((x_ - mean[None]) ** 2) * m, 0) / cnt
            return jnp.sum(mean * 2.0) + jnp.sum(var * 0.5)

        g_k = jax.grad(via_kernel)(x)
        g_r = jax.grad(via_jnp)(x)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), rtol=1e-4, atol=1e-6)

    def test_under_jit_and_nonaligned_rows(self):
        # row count not a multiple of the tile: padding path
        x = jnp.asarray(np.random.RandomState(2).randn(1500, 32).astype(np.float32))
        mask = jnp.ones(1500, bool)
        f = jax.jit(lambda a: masked_stats(a, mask)[0])
        out = f(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x).mean(0), rtol=1e-4, atol=1e-5)
