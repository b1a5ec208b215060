"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The key semantic check (SURVEY §4): with the batch sharded over the data
axis under jit, the hard-way logits (whose A0 matmul contrasts against the
WHOLE batch — the global negative pool) must equal the single-device run
bit-for-bit up to reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from conftest import cpu_mesh

from avtubes.models import hardway_head


def test_global_negative_pool_matches_single_device():
    rng = np.random.RandomState(0)
    b, h, w, c = 8, 14, 14, 64
    img = rng.randn(b, h, w, c).astype(np.float32)
    aud = rng.randn(b, c).astype(np.float32)

    single = hardway_head(jnp.asarray(img), jnp.asarray(aud))

    mesh = cpu_mesh((8,), ("data",))
    shard = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, shard)
    aud_s = jax.device_put(aud, shard)
    fn = jax.jit(lambda i, a: hardway_head(i, a))
    sharded = fn(img_s, aud_s)

    np.testing.assert_allclose(np.asarray(sharded.logits), np.asarray(single.logits),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sharded.heatmap), np.asarray(single.heatmap),
                               rtol=1e-5, atol=1e-6)


def test_loss_and_grads_match_across_mesh_sizes():
    """Hard-way loss + raw gradients on a 1-device vs 8-device mesh agree.

    (Raw gradients, not post-Adam params: Adam's grad/(sqrt(v)+eps) amplifies
    reduction-order float noise unboundedly for near-zero gradients.)
    """
    from avtubes.core.config import OptimConfig
    from avtubes.core.mesh import replicate, shard_batch
    from avtubes.losses import hardway_loss
    from avtubes.models import AVENet
    from avtubes.train import create_train_state

    rng = np.random.RandomState(1)
    frames = rng.randn(8, 32, 32, 3).astype(np.float32)
    spec = rng.randn(8, 32, 32, 1).astype(np.float32)

    model = AVENet()
    base_state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 32, 32, 1))),
        OptimConfig(learning_rate=1e-3),
    )

    @jax.jit
    def loss_and_grads(state, f, s):
        def loss_fn(params):
            out, _ = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                f, s, train=True, mutable=["batch_stats"],
            )
            return hardway_loss(out.logits)

        return jax.value_and_grad(loss_fn)(state.params)

    def one(n_dev):
        mesh = cpu_mesh((n_dev,), ("data",))
        state = replicate(mesh, base_state)
        f, s = shard_batch(mesh, (frames, spec))
        loss, grads = loss_and_grads(state, f, s)
        return float(loss), jax.tree_util.tree_leaves(grads)

    loss1, g1 = one(1)
    loss8, g8 = one(8)
    assert np.isclose(loss1, loss8, rtol=1e-5)
    for a, b in zip(g1, g8):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4 * scale)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_sharded_step_emits_expected_collectives():
    """The compiled HLO of the sharded train step contains the collectives
    the design promises (DESIGN.md "Parallelism"): an all-reduce for the
    gradient psum and an all-gather for the cross-shard negative-pool
    matmul — and no accidental DCN-style all-to-alls."""
    from avtubes.core.config import OptimConfig
    from avtubes.core.mesh import replicate, shard_batch
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.steps import hardway_1frame_train_step

    mesh = cpu_mesh((8,), ("data",))
    model = AVENet()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 32, 32, 1))),
        OptimConfig(learning_rate=1e-3))
    state = replicate(mesh, state)
    rng = np.random.RandomState(2)
    batch = shard_batch(mesh, {
        "frame": rng.randn(8, 32, 32, 3).astype(np.float32),
        "spec": rng.randn(8, 32, 32, 1).astype(np.float32)})

    compiled = hardway_1frame_train_step.lower(
        state, batch["frame"], batch["spec"]).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "gradient psum missing from compiled HLO"
    assert "all-gather" in hlo, "negative-pool all-gather missing"
    assert "all-to-all" not in hlo, "unexpected all-to-all in a pure-DP step"


def test_sharded_eval_matches_single_device():
    """evaluate_hardway/evaluate_perframe with a mesh (batch sharded over
    'data', state replicated) produce the same metrics as the plain
    single-device run — multi-chip eval is a layout change, not a math
    change."""
    from avtubes.core.config import DataConfig, OptimConfig
    from avtubes.core.mesh import replicate
    from avtubes.data.pipeline import BatchLoader, SyntheticSource
    from avtubes.data.spectrogram import SpectrogramConfig
    from avtubes.models import AVENet
    from avtubes.train import create_train_state
    from avtubes.train.evaluate import evaluate_hardway, evaluate_perframe
    from avtubes.train.hardway import _synthetic_gt_lookup

    cfg = DataConfig(image_size=64, synthetic=True, frame_density=8, sampling_rate=2)
    spec_cfg = SpectrogramConfig()
    state = create_train_state(
        AVENet(), jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, *spec_cfg.shape, 1))),
        OptimConfig())
    gt = _synthetic_gt_lookup()
    mesh = cpu_mesh((8,), ("data",))
    state_r = replicate(mesh, state)

    def loader():
        return BatchLoader(SyntheticSource(cfg, n=5, clip=False, seed=3), 4,
                           num_workers=1, shuffle=False, drop_last=False)

    # hard-way test block: batches of 4,1 -> sharded run pads to 8 (mesh
    # multiple) instead of 4; metrics must be identical either way
    m1 = evaluate_hardway(state, loader(), cfg, spec_cfg, gt)
    m8 = evaluate_hardway(state_r, loader(), cfg, spec_cfg, gt, mesh=mesh)
    assert m1["hardway_n"] == m8["hardway_n"] == 5
    assert m1["hardway_ciou"] == m8["hardway_ciou"]
    assert abs(m1["hardway_auc"] - m8["hardway_auc"]) < 1e-9

    # per-frame block (2d path): frame batch sharded over the mesh
    src = SyntheticSource(cfg, n=2, clip=True, seed=4)
    p1 = evaluate_perframe(state, src, cfg, spec_cfg, gt)
    p8 = evaluate_perframe(state_r, src, cfg, spec_cfg, gt, mesh=mesh)
    for k in ("test_ciou", "test_auc", "test_mtc"):
        assert abs(p1[k] - p8[k]) < 1e-6, (k, p1[k], p8[k])
