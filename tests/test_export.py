"""AOT export/serving roundtrip: serialized artifact must reproduce the
live pipeline bit-for-bit and accept multiple batch sizes (symbolic dim)."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.core.config import ExperimentConfig
from avtubes.core.export import export_localizer, load_localizer
from avtubes.data.spectrogram import SpectrogramConfig, log_spectrogram
from avtubes.data.transforms import normalize_imagenet
from avtubes.evaluation.postprocess import heatmap_to_mask_batch
from avtubes.models import AVENet
from avtubes.train.state import create_train_state

IMG = 64


def _tiny_state():
    cfg = ExperimentConfig()
    spec_cfg = SpectrogramConfig(samplerate=8000, seconds=1)
    model = AVENet(hardway=cfg.hardway)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        cfg.optim, 4)
    return state, spec_cfg


def test_export_roundtrip_matches_live():
    state, spec_cfg = _tiny_state()
    blob = export_localizer(state, spec_cfg, image_size=IMG,
                            platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    fn = load_localizer(blob)

    rng = np.random.default_rng(0)
    for b in (2, 3):  # symbolic batch: two different sizes, no re-export
        frames = jnp.asarray(rng.integers(0, 255, (b, IMG, IMG, 3), np.uint8))
        waves = jnp.asarray(rng.random((b, spec_cfg.num_samples), np.float32))
        masks, heat = fn(frames, waves)

        spec = log_spectrogram(waves, spec_cfg)[..., None]
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            normalize_imagenet(frames), spec, train=False)
        np.testing.assert_allclose(np.asarray(heat), np.asarray(out.heatmap),
                                   rtol=1e-6, atol=1e-6)
        # masks binarize at the exact median; different fusion in the
        # exported program can flip a few resize ulps right at the
        # threshold (same tolerance as the TPU-vs-host parity note)
        want = np.asarray(heatmap_to_mask_batch(out.heatmap))
        flips = np.abs(np.asarray(masks) - want).sum(axis=(1, 2))
        assert flips.max() <= 16, f"per-map pixel flips {flips}"


def test_export_s2d_conversion_bit_identical():
    """Exporting after variables_to_s2d (the export_model --s2d path) must
    produce the same heatmaps as the plain-stem export: the s2d stem is an
    exact transform, so serving artifacts are interchangeable."""

    from avtubes.models.avenet import variables_to_s2d

    state, spec_cfg = _tiny_state()
    blob_plain = export_localizer(state, spec_cfg, image_size=IMG,
                                  platforms=("cpu",))

    conv = variables_to_s2d({"params": state.params,
                             "batch_stats": state.batch_stats})
    s2d_model = AVENet(s2d_stem=True)
    s2d_state = create_train_state(
        s2d_model, jax.random.PRNGKey(0),
        (jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        ExperimentConfig().optim, 4)
    s2d_state = s2d_state.replace(params=conv["params"],
                                  batch_stats=conv["batch_stats"])
    blob_s2d = export_localizer(s2d_state, spec_cfg, image_size=IMG,
                                platforms=("cpu",))

    f1, f2 = load_localizer(blob_plain), load_localizer(blob_s2d)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 255, (2, IMG, IMG, 3), np.uint8))
    waves = jnp.asarray(rng.random((2, spec_cfg.num_samples), np.float32))
    _, h1 = f1(frames, waves)
    _, h2 = f2(frames, waves)
    np.testing.assert_allclose(np.asarray(h1, np.float32),
                               np.asarray(h2, np.float32), atol=1e-5)


def test_validate_artifact_reports_deltas():
    """validate_artifact: an EXACT export validates with ~zero cIoU/AUC
    delta and near-1 mask agreement; an int8 export reports a real (small)
    heatmap perturbation; an artifact from DIFFERENT weights is flagged by
    a large disagreement — the report actually discriminates."""
    from avtubes.core.export import validate_artifact

    state, spec_cfg = _tiny_state()
    blob = export_localizer(state, spec_cfg, image_size=IMG,
                            platforms=("cpu",))
    report = validate_artifact(state, blob, spec_cfg, image_size=IMG, n=6)
    assert report["n"] == 6
    assert report["ciou_delta"] == 0.0 and report["auc_delta"] <= 0.01
    assert report["mask_pairwise_iou_mean"] > 0.98
    assert report["heatmap_max_abs_diff"] < 1e-4

    # int8 export validated against the f32 state: small but nonzero noise
    q_state = state.replace(
        apply_fn=AVENet(quant_int8=True,
                        hardway=ExperimentConfig().hardway).apply)
    blob_q = export_localizer(q_state, spec_cfg, image_size=IMG,
                              platforms=("cpu",))
    report_q = validate_artifact(state, blob_q, spec_cfg, image_size=IMG, n=6)
    assert report_q["heatmap_max_abs_diff"] < 0.05
    assert report_q["heatmap_corr"] > 0.95
    assert report_q["ciou_delta"] <= 0.35  # tiny-n quantized headline

    # wrong weights: the report must show gross disagreement
    other = create_train_state(
        AVENet(hardway=ExperimentConfig().hardway), jax.random.PRNGKey(9),
        (jnp.zeros((2, IMG, IMG, 3)), jnp.zeros((2, *spec_cfg.shape, 1))),
        ExperimentConfig().optim, 4)
    blob_other = export_localizer(other, spec_cfg, image_size=IMG,
                                  platforms=("cpu",))
    report_bad = validate_artifact(state, blob_other, spec_cfg,
                                   image_size=IMG, n=6)
    assert report_bad["heatmap_corr"] < 0.9
    assert report_bad["mask_pairwise_iou_mean"] < report["mask_pairwise_iou_mean"]


def test_validate_artifact_fixed_batch_chunking():
    """A fixed-batch artifact is validated in padded chunks; the report is
    identical in spirit to the polymorphic one (exact export -> ~0 delta)."""
    from avtubes.core.export import validate_artifact

    state, spec_cfg = _tiny_state()
    blob = export_localizer(state, spec_cfg, image_size=IMG, batch=4,
                            platforms=("cpu",))
    report = validate_artifact(state, blob, spec_cfg, image_size=IMG, n=6)
    assert report["n"] == 6
    assert report["ciou_delta"] == 0.0
    assert report["heatmap_max_abs_diff"] < 1e-4


def test_export_audio_transport_artifacts():
    """Transport exports change only the audio INPUT contract: 'int16'
    reproduces the f32-waveform artifact bit-identically for waveforms on
    the 16-bit grid; a spec-payload export skips the device STFT and
    validates within its quantization cost (validate_artifact encodes the
    eval waveforms into the artifact's own transport)."""
    from avtubes.core.export import load_artifact, validate_artifact
    from avtubes.data.spectrogram import prepare_audio_payload

    state, spec_cfg = _tiny_state()
    fn_ref = load_localizer(export_localizer(state, spec_cfg, image_size=IMG,
                                             platforms=("cpu",)))
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, IMG, IMG, 3), np.uint8)
    waves = (rng.integers(-32768, 32768, (2, spec_cfg.num_samples))
             .astype(np.float32) / 32768.0)
    _, heat_ref = fn_ref(frames, waves)

    blob16 = export_localizer(state, spec_cfg, image_size=IMG,
                              platforms=("cpu",), audio_transport="int16")
    fn16, meta16 = load_artifact(blob16)
    assert meta16["audio_transport"] == "int16"
    payload = prepare_audio_payload(waves, "int16", spec_cfg)
    assert payload.dtype == np.int16
    _, heat16 = fn16(frames, payload)
    np.testing.assert_allclose(np.asarray(heat16), np.asarray(heat_ref),
                               rtol=1e-6, atol=1e-6)

    blob8 = export_localizer(state, spec_cfg, image_size=IMG,
                             platforms=("cpu",), audio_transport="spec_int8")
    _, meta8 = load_artifact(blob8)
    assert meta8["audio_transport"] == "spec_int8"
    assert tuple(meta8["audio_shape"]) == spec_cfg.shape
    report = validate_artifact(state, blob8, spec_cfg, image_size=IMG, n=4)
    assert report["mask_pairwise_iou_mean"] > 0.9
    assert report["heatmap_corr"] > 0.99
