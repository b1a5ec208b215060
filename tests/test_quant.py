"""Int8 inference quantization (QuantConv / AVENet(quant_int8=True)).

Beyond-reference serving feature: dynamic per-tensor activation + per-channel
weight int8 convs (the v5e MXU's double-rate int8 path).  These tests pin
(a) checkpoint interchangeability — the quant model applies the PLAIN
model's variables unchanged; (b) output agreement within quantization noise;
(c) the inference-only guard; (d) the export path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avtubes.models import AVENet

B, IMG = 2, 64


@pytest.fixture(scope="module")
def shared():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
    aud = jnp.asarray(rng.normal(size=(B, IMG, IMG, 1)).astype(np.float32))
    plain = AVENet()
    variables = jax.jit(lambda r: plain.init(r, img, aud, train=False))(
        jax.random.PRNGKey(0))
    return plain, variables, img, aud


def test_quant_matches_plain_within_noise(shared):
    plain, variables, img, aud = shared
    out_p = plain.apply(variables, img, aud, train=False)
    out_q = AVENet(quant_int8=True).apply(variables, img, aud, train=False)
    hp = np.asarray(out_p.heatmap, np.float64)
    hq = np.asarray(out_q.heatmap, np.float64)
    # heatmaps are cosine similarities in [-1, 1]; int8 dynamic quantization
    # through 18 conv layers stays a small perturbation (measured ~3e-3 max
    # at this geometry/seed)
    assert np.abs(hp - hq).max() < 0.02
    assert np.corrcoef(hp.ravel(), hq.ravel())[0, 1] > 0.98
    lp = np.asarray(out_p.logits, np.float64)
    lq = np.asarray(out_q.logits, np.float64)
    assert np.corrcoef(lp.ravel(), lq.ravel())[0, 1] > 0.98


def test_quant_composes_with_s2d(shared):
    from avtubes.models.avenet import variables_to_s2d

    plain, variables, img, aud = shared
    out_p = plain.apply(variables, img, aud, train=False)
    out_q = AVENet(quant_int8=True, s2d_stem=True).apply(
        variables_to_s2d(variables), img, aud, train=False)
    hp = np.asarray(out_p.heatmap, np.float64)
    hq = np.asarray(out_q.heatmap, np.float64)
    assert np.abs(hp - hq).max() < 0.02


def test_quant_per_sample_scale_batch_independence(shared):
    """A sample's quantized output must not depend on its co-batched
    neighbors: the serving path coalesces unrelated requests and zero-pads
    batches, so activation scales are per-sample, not per-tensor."""
    _, variables, img, aud = shared
    qmodel = AVENet(quant_int8=True)
    solo = qmodel.apply(variables, img[:1], aud[:1], train=False)
    # co-batch with a 50x-amplitude neighbor (would wreck a shared scale)
    loud = qmodel.apply(variables,
                        jnp.concatenate([img[:1], img[1:] * 50.0]),
                        jnp.concatenate([aud[:1], aud[1:] * 50.0]),
                        train=False)
    # tolerance covers batch-1 vs batch-2 program fusion differences only;
    # a shared (per-tensor) scale would be off by ~1e-1 here
    np.testing.assert_allclose(np.asarray(loud.heatmap[:1]),
                               np.asarray(solo.heatmap), atol=5e-5)


def test_quant_train_raises(shared):
    _, variables, img, aud = shared
    with pytest.raises(ValueError, match="inference-only"):
        AVENet(quant_int8=True).apply(variables, img, aud, train=True,
                                      mutable=["batch_stats"])


def test_quant_export_roundtrip(shared, tmp_path):
    """export_model --quant int8 path: the artifact applies QuantConv math."""
    from avtubes.core.config import OptimConfig
    from avtubes.core.export import export_localizer, load_localizer
    from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
    from avtubes.data.transforms import normalize_imagenet
    from avtubes.train.state import create_train_state

    plain, variables, img, aud = shared
    spec_cfg = SpectrogramConfig(samplerate=2000, seconds=1)
    qmodel = AVENet(quant_int8=True)
    state = create_train_state(
        plain, jax.random.PRNGKey(0),
        (jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        OptimConfig())
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          apply_fn=qmodel.apply)
    blob = export_localizer(state, spec_cfg, image_size=IMG, platforms=("cpu",))
    fn = load_localizer(blob)

    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 255, (2, IMG, IMG, 3), np.uint8))
    waves = jnp.asarray(rng.random((2, spec_cfg.num_samples), np.float32))
    masks, heat = fn(frames, waves)
    spec = log_spectrogram(waves, spec_cfg)[..., None]
    live = qmodel.apply(variables, normalize_imagenet(frames), spec,
                        train=False)
    # exported vs live quant: the dynamic scales are f32 reductions whose
    # fusion differs between the two compiles; a 1-ulp scale shift flips
    # round() at .5 boundaries, so agreement is quantization-noise-level,
    # not bitwise
    np.testing.assert_allclose(np.asarray(heat, np.float64),
                               np.asarray(live.heatmap, np.float64),
                               atol=5e-3)
    assert set(np.unique(np.asarray(masks))) <= {0.0, 1.0}
