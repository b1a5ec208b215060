"""Exact-selection median mask (avtubes.ops.median_select) vs the sort oracle.

The postprocess binarizes at the value at sorted index k (reference
`train_hardway.py:176-181`); the bisection implementations must reproduce
`jnp.sort(x)[k]` bit-exactly, ties included.
"""

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from avtubes.evaluation.postprocess import heatmap_to_mask, heatmap_to_mask_batch
from avtubes.ops.median_select import (
    kth_value_bits_xla,
    median_mask,
    median_mask_pallas,
)


def _cases(rng):
    n = 224 * 224
    yield rng.random((4, n), dtype=np.float32)                 # generic
    x = rng.random((2, n), dtype=np.float32)
    x[:, : n // 2] = 0.25                                      # heavy ties at k
    yield x
    yield np.zeros((1, n), dtype=np.float32)                   # all equal
    q = np.round(rng.random((3, n)) * 8) / 8                   # few distinct values
    yield q.astype(np.float32)


def test_bisect_matches_sort_exactly():
    rng = np.random.default_rng(0)
    for x in _cases(rng):
        k = x.shape[1] // 2
        want = np.sort(x, axis=1)[:, k]
        got = np.asarray(kth_value_bits_xla(jnp.asarray(x), k))
        np.testing.assert_array_equal(got, want)


def test_median_mask_bisect_vs_sort():
    rng = np.random.default_rng(1)
    pred = rng.random((4, 224, 224), dtype=np.float32)
    m_sort = np.asarray(median_mask(jnp.asarray(pred), 224 * 224 // 2, impl="sort"))
    m_bis = np.asarray(median_mask(jnp.asarray(pred), 224 * 224 // 2, impl="bisect"))
    np.testing.assert_array_equal(m_sort, m_bis)


def test_median_mask_pallas_interpret_vs_sort():
    rng = np.random.default_rng(2)
    for b in (1, 8):  # both row-blocking branches
        pred = rng.random((b, 224, 224), dtype=np.float32)
        m_sort = np.asarray(median_mask(jnp.asarray(pred), 224 * 224 // 2,
                                        impl="sort"))
        with pltpu.force_tpu_interpret_mode():
            m_pal = np.asarray(median_mask_pallas(jnp.asarray(pred),
                                                  224 * 224 // 2))
        np.testing.assert_array_equal(m_sort, m_pal)


def test_batch_postprocess_still_matches_host():
    rng = np.random.default_rng(3)
    heat = rng.standard_normal((4, 14, 14)).astype(np.float32)
    batch = np.asarray(heatmap_to_mask_batch(jnp.asarray(heat)))
    for i in range(4):
        single = heatmap_to_mask(heat[i])
        np.testing.assert_array_equal(batch[i], single)


def test_bisect_exact_above_one():
    """The bisection bound covers ALL finite non-negative f32 — values
    beyond 1.0 (un-normalized maps) must return the exact k-th value, not a
    silent clamp at 1.0."""
    x = np.linspace(0.0, 2.0, 100, dtype=np.float32)[None]
    for k in (0, 50, 80, 99):
        got = float(kth_value_bits_xla(jnp.asarray(x), k)[0])
        assert got == float(np.sort(x[0])[k]), (k, got)
    big = np.asarray([[3e38, 1e30, 7.5, 0.0]], np.float32)
    assert float(kth_value_bits_xla(jnp.asarray(big), 3)[0]) == np.float32(3e38)
