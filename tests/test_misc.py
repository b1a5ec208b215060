"""Numeric helpers (`avtubes/utils/misc.py` vs reference `utils.py:194-201`)."""

import numpy as np

from avtubes.utils.misc import gkern, rescale_loss


def test_gkern_matches_scipy_gaussian_outer():
    """The reference builds its kernel as the outer product of
    scipy.signal.windows.gaussian; ours must agree."""
    from scipy.signal.windows import gaussian

    for n, std in [(21, None), (14, 5.0), (7, 1.5)]:
        ours = gkern(n, std)
        ref1d = gaussian(n, std if std is not None else n / 6.0)
        np.testing.assert_allclose(ours, np.outer(ref1d, ref1d), atol=1e-12)
        assert ours.shape == (n, n)
        assert ours.max() == ours[n // 2, n // 2]  # centered peak


def test_rescale_loss_linear_map():
    assert rescale_loss(5.0, 0.0, 10.0) == 0.5
    assert rescale_loss(0.0, 0.0, 10.0, -1.0, 1.0) == -1.0
    np.testing.assert_allclose(
        rescale_loss(np.array([2.5, 7.5]), 0.0, 10.0), [0.25, 0.75])
