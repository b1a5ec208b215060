"""Experimental model zoo: shape smoke tests (mirrors the reference's
__main__ shape-check blocks in audio_convnet/image_convnet)."""

import jax
import jax.numpy as jnp
import numpy as np

from avtubes.models.zoo import (
    AudioConvNet,
    AudioResNetVLAD,
    ImageConvNet,
    SyncNetAudio,
    SyncNetVisual,
    TransformerAttention,
)
from avtubes.utils.debug import StepTimer, shape_report


def _init_apply(model, *inputs, **kw):
    vars_ = model.init(jax.random.PRNGKey(0), *inputs, **kw)
    return model.apply(vars_, *inputs, **kw)


def test_audio_convnet_shapes():
    out = _init_apply(AudioConvNet(), jnp.zeros((2, 64, 48, 1)), train=False)
    assert out.shape == (2, 4, 3, 512)


def test_image_convnet_shapes():
    out = _init_apply(ImageConvNet(), jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 4, 4, 512)


def test_audio_resnet_vlad():
    model = AudioResNetVLAD(num_clusters=8)
    out = _init_apply(model, jnp.zeros((2, 64, 48, 1)), train=False)
    assert out.shape == (2, 8 * 512)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    maxpool = _init_apply(AudioResNetVLAD(pool="max"), jnp.zeros((2, 64, 48, 1)),
                          train=False)
    assert maxpool.shape == (2, 512)


def test_syncnet_towers():
    rng = np.random.RandomState(0)
    a = _init_apply(SyncNetAudio(), jnp.asarray(rng.randn(2, 64, 48, 1), jnp.float32),
                    train=False)
    v = _init_apply(SyncNetVisual(), jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32),
                    train=False)
    assert a.shape == (2, 1024) and v.shape == (2, 1024)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)


def test_transformer_attention():
    model = TransformerAttention(latent=32)
    aud = jnp.zeros((2, 32))
    vid = jnp.zeros((2, 3, 4, 4, 32))
    out = _init_apply(model, aud, vid)
    assert out.shape == (2, 3, 4, 4)


def test_shape_report():
    rep = shape_report(AudioConvNet(), jnp.zeros((1, 32, 32, 1)))
    assert "TOTAL" in rep and "MB" in rep


def test_step_timer():
    t = StepTimer()
    t.tick()
    t.tick(jnp.zeros(4))
    assert len(t.history) == 2 and t.mean() > 0
