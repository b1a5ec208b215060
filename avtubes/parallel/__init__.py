"""Parallelism: negative-pool scoping for the hard-way contrastive head.

Under jit with a batch-sharded mesh, the hard-way head's cross-batch
similarity matmul contrasts against the GLOBAL batch by construction (XLA
gathers the audio features across devices) — the mathematically clean
default.

The reference's nn.DataParallel implicitly used PER-REPLICA negative pools
(each GPU only saw its shard, SURVEY §2.10), which changes the contrastive
task.  `hardway_head_device_pool` reproduces that semantics explicitly with
shard_map: each device runs the head on its local shard only, so the
negative pool is the per-device sub-batch.  Exposed as the
`negative_pool='device'` config knob for parity experiments.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avtubes.core.mesh import DATA_AXIS
from avtubes.models.hardway import (
    HardwayConfig,
    HardwayOutput,
    global_pool_mask,
    hardway_head,
)

__all__ = [
    "global_pool_mask",
    "hardway_head_device_pool",
    "hardway_head_global_pool",
    "hardway_head_gathered_pool",
]


def hardway_head_device_pool(img_feats, aud_feats, cfg: HardwayConfig,
                             mesh: Mesh) -> HardwayOutput:
    """Hard-way head with per-device negative pools (DataParallel semantics).

    img_feats (B, H, W, C) and aud_feats (B, C) must be batch-sharded over
    the mesh's data axis; every device computes logits of shape
    (B/n, B/n + 2) against only its local sub-batch.
    """
    local = jax.shard_map(
        functools.partial(hardway_head, cfg=cfg),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=HardwayOutput(
            heatmap=P(DATA_AXIS),
            logits=P(DATA_AXIS),
            weighted_map=P(DATA_AXIS),
            pos=P(DATA_AXIS),
            neg=P(DATA_AXIS),
        ),
    )
    return local(img_feats, aud_feats)


def hardway_head_gathered_pool(img_feats, aud_feats, cfg: HardwayConfig,
                               mesh: Mesh) -> HardwayOutput:
    """Global negative pool with an EXPLICIT all-gather (shard_map variant).

    Each device all-gathers the audio features over the data axis and runs
    the head against the full (K = global B) key set, masking its own-pair
    columns at offset shard_index * local_B via `global_pool_mask`.
    Numerically identical to the plain-jit global pool — this variant exists
    to make the collective and the offset math explicit (and testable) for
    topologies where XLA's gather placement needs pinning.
    """

    def local(img, aud):
        keys = jax.lax.all_gather(aud, DATA_AXIS).reshape(-1, aud.shape[-1])
        offset = jax.lax.axis_index(DATA_AXIS) * aud.shape[0]
        return hardway_head(img, aud, cfg, aud_all=keys, pool_offset=offset)

    shard = P(DATA_AXIS)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(shard, shard),
        out_specs=HardwayOutput(heatmap=shard, logits=shard, weighted_map=shard,
                                pos=shard, neg=shard),
    )(img_feats, aud_feats)


def hardway_head_global_pool(img_feats, aud_feats, cfg: HardwayConfig,
                             mesh: Mesh) -> HardwayOutput:
    """Global negative pool (the default): plain jit over sharded inputs —
    XLA inserts the all-gather implied by the cross-batch matmul."""
    shard = NamedSharding(mesh, P(DATA_AXIS))
    img_feats = jax.device_put(img_feats, shard)
    aud_feats = jax.device_put(aud_feats, shard)
    return jax.jit(functools.partial(hardway_head, cfg=cfg))(img_feats, aud_feats)
