"""bf16 inference consistency: the SHIPPED serving/bench configuration.

bench.py and core/export.py default to AVENet(dtype=bfloat16, s2d_stem=True)
while every torch-parity test runs f32 plain-stem.  This pins the missing
link: on the same f32 parameters, at the real 224x224 / 257x431 geometry,
the bf16+s2d pipeline's eval masks must agree with the f32 reference path
to well under the noise that moves cIoU.

Thresholds come from measurement (random-init, 4 samples): mask IoU
>= 0.985 and heatmap Pearson r >= 0.9997; asserted with margin.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_bf16_s2d_masks_match_f32(monkeypatch):
    import jax
    import jax.numpy as jnp

    from avtubes.evaluation import heatmap_to_mask_batch
    from avtubes.models import AVENet
    from avtubes.models.avenet import variables_to_s2d

    rng = np.random.RandomState(0)
    b = 4
    img = rng.randn(b, 224, 224, 3).astype(np.float32)
    aud = (rng.randn(b, 257, 431, 1) * 0.5).astype(np.float32)

    f32 = AVENet()
    variables = f32.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                         jnp.zeros((1, 64, 64, 1)), train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    out32 = f32.apply(variables, img, aud, train=False)

    bf = AVENet(dtype=jnp.bfloat16, s2d_stem=True)
    out_bf = bf.apply(variables_to_s2d(variables), img, aud, train=False)

    # the head runs its reductions in f32 regardless of compute dtype
    assert out_bf.heatmap.dtype == jnp.float32

    m32 = np.asarray(heatmap_to_mask_batch(out32.heatmap))
    mbf = np.asarray(heatmap_to_mask_batch(out_bf.heatmap))
    inter = (m32 * mbf).sum(axis=(1, 2))
    union = ((m32 + mbf) > 0).sum(axis=(1, 2))
    iou = inter / union
    assert iou.min() >= 0.95, f"bf16 mask drifted from f32: IoU {iou}"

    for i in range(b):
        r = np.corrcoef(np.asarray(out32.heatmap[i]).ravel(),
                        np.asarray(out_bf.heatmap[i]).ravel())[0, 1]
        assert r >= 0.999, f"sample {i}: heatmap correlation {r}"

    # logits feed the contrastive target ranking; compare the live entries
    # only — the (1 - 100*I) diagonal mask scales its entries to ~-800,
    # where bf16's relative noise is ~0.5 absolute but CE never sees it
    l32, lbf = np.asarray(out32.logits), np.asarray(out_bf.logits)
    live = l32 > -100
    np.testing.assert_allclose(lbf[live], l32[live], atol=0.15)
    jax.clear_caches()
