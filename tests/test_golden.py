"""Golden regression tests: fixed-seed forwards pinned to recorded values.

Cheaper complement to the torch-parity tests — catches silent numerics
changes (init, layer order, normalization) without needing torch or the
reference checkout. Recorded on CPU float32, jax 0.9.0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.data.index import load_split
from avtubes.models import AVENet, HardwayConfig, hardway_head


def test_hardway_head_golden():
    """Head output on a deterministic synthetic input."""
    b, h, w, c = 3, 4, 4, 8
    img = jnp.sin(jnp.arange(b * h * w * c, dtype=jnp.float32)).reshape(b, h, w, c)
    aud = jnp.cos(jnp.arange(b * c, dtype=jnp.float32)).reshape(b, c)
    out = hardway_head(img, aud, HardwayConfig())
    np.testing.assert_allclose(
        float(out.heatmap.sum()), 2.5392630, rtol=1e-4)
    np.testing.assert_allclose(
        float(out.logits[:, 0].sum()), 37.437363, rtol=1e-4)


def test_avenet_init_golden():
    """Parameter statistics of the seeded init are stable."""
    model = AVENet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
                           train=False)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    n_params = sum(int(np.prod(x.shape)) for x in leaves)
    assert n_params == 22_346_752  # two ResNet18 backbones, no heads
    stem = variables["params"]["imgnet"]["stem_vision"]["kernel"]
    assert stem.shape == (7, 7, 3, 64)


def test_load_split_sharding(tmp_path):
    (tmp_path / "flickr_train5k.csv").write_text(
        "".join(f"{i},0\n" for i in range(10)))
    all_ids = load_split(tmp_path, "flickr", "train", 5)
    s0 = load_split(tmp_path, "flickr", "train", 5, shard=(0, 4))
    s1 = load_split(tmp_path, "flickr", "train", 5, shard=(1, 4))
    assert s0 == ["0", "4", "8"] and s1 == ["1", "5", "9"]
    combined = sorted(sum((load_split(tmp_path, "flickr", "train", 5, shard=(i, 4))
                           for i in range(4)), []), key=int)
    assert combined == all_ids
