"""Space-to-depth stem: exact equivalence with the plain 7x7/s2 stem."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.models import AVENet
from avtubes.models.avenet import variables_to_s2d
from avtubes.models.resnet2d import space_to_depth, stem_kernel_to_s2d


def test_kernel_transform_equivalence():
    rng = np.random.RandomState(0)
    for (h, w, c) in [(32, 32, 3), (33, 31, 1)]:
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        k = jnp.asarray(rng.randn(7, 7, c, 8), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            space_to_depth(x, 2), stem_kernel_to_s2d(k), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)


def test_avenet_s2d_matches_plain():
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    audio = jnp.asarray(rng.randn(2, 63, 65, 1), jnp.float32)  # odd extents

    plain = AVENet()
    variables = plain.init(jax.random.PRNGKey(0), image, audio, train=False)
    ref = plain.apply(variables, image, audio, train=False)

    s2d_model = AVENet(s2d_stem=True)
    s2d_vars = variables_to_s2d(variables)
    out = s2d_model.apply(s2d_vars, image, audio, train=False)

    np.testing.assert_allclose(np.asarray(out.heatmap), np.asarray(ref.heatmap),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref.logits),
                               rtol=1e-4, atol=1e-3)
