"""The "hard-way" cross-modal similarity head, fused for the MXU.

Reference semantics (`/root/reference/model.py:112-154`, also the 3D path's
`HardWayAttention`, `model.py:38-60`):

  Given L2-normalized image features (B, H, W, C) and audio features (B, C):

    A    = <img[b], aud[b]>        per pixel          -> (B, H, W) heatmap
    A0   = <img[b], aud[k]>        all pairs          -> (B, K, H, W)
    Pos  = sigmoid((A - eps) / tau)
    Neg  = 1 - sigmoid((A - eps2) / tau)   (tri-map) or 1 - Pos
    PosA = sigmoid((A0 - eps) / tau)
    sim1 = pooled(Pos * A)   / pooled(Pos)             -> (B, 1)
    sim  = pooled(PosA * A0) / pooled(PosA) * mask     -> (B, K),
           mask = 1 - 100*I (pushes own-pair column out of the negatives)
    sim2 = pooled(Neg * A)   / pooled(Neg)             -> (B, 1)
    logits = concat(sim1, sim, sim2) / temperature     -> (B, K + 2)

  plus the Pos-weighted feature map used by the consistency losses:
    weighted = mean_c(img * Pos/||Pos||_2(spatial))    -> (B, H, W)

TPU-first: the whole pairwise tensor A0 comes from ONE batched matmul
(B*HW, C) @ (C, K) — the canonical MXU shape — and A is its diagonal
(computed as a cheap row-wise einsum so nothing re-reads HBM).  The head
runs in float32 regardless of backbone compute dtype: sigmoid((A-0.65)/0.03)
is numerically touchy in bf16.

The negative pool is the full key set `aud_all` passed in — under jit with a
batch-sharded mesh that is the GLOBAL batch by construction (XLA inserts the
all-gather), which is an explicit design upgrade over the reference's
DataParallel per-replica pools; `avtubes.parallel` exposes the per-device
variant for parity experiments.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HardwayConfig:
    epsilon: float = 0.65      # positive threshold
    epsilon2: float = 0.4      # negative threshold (tri-map)
    tau: float = 0.03          # tri-map sharpness
    temperature: float = 0.07  # logit temperature
    trimap: bool = True        # Neg from epsilon2 (vs 1 - Pos)
    use_neg: bool = True       # append sim2 column
    mask_penalty: float = 100.0
    pool_block: int = 0        # >0: restrict the negative pool to contiguous
    #                            blocks of this size (DataParallel per-replica
    #                            pool semantics under a contiguously sharded
    #                            global batch; 0 = global pool)


class HardwayOutput(NamedTuple):
    heatmap: jnp.ndarray       # (B, H, W) raw cosine similarity map A
    logits: jnp.ndarray        # (B, K+2) contrastive logits (target class 0)
    weighted_map: jnp.ndarray  # (B, H, W) Pos-weighted mean feature map
    pos: jnp.ndarray           # (B, H, W) soft positive mask
    neg: jnp.ndarray           # (B, H, W) soft negative mask


def l2_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def global_pool_mask(b: int, k: int, offset, penalty: float = 100.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """(B, K) negative-pool mask for an explicitly gathered key set.

    Row i's own-pair column sits at `offset + i` within the K keys (offset =
    shard_index * B under an all-gathered pool); that column gets the same
    `1 - penalty` exclusion the reference applies to the diagonal
    (`/root/reference/model.py:142-144`).  `offset` may be a traced scalar
    (jax.lax.axis_index inside shard_map).
    """
    own = jnp.arange(k)[None, :] == (jnp.asarray(offset) + jnp.arange(b))[:, None]
    return jnp.where(own, 1.0 - penalty, 1.0).astype(dtype)


def hardway_head(
    img_feats: jnp.ndarray,
    aud_feats: jnp.ndarray,
    cfg: HardwayConfig = HardwayConfig(),
    aud_all: jnp.ndarray | None = None,
    pool_offset=0,
) -> HardwayOutput:
    """Compute the hard-way similarity heatmap + contrastive logits.

    img_feats:   (B, H, W, C) image/video-frame features (not yet normalized)
    aud_feats:   (B, C) audio features (not yet normalized)
    aud_all:     (K, C) negative pool; defaults to aud_feats. When the batch
                 is device-sharded, pass the all-gathered pool here for a
                 global negative set.
    pool_offset: index of this shard's first own-pair column within aud_all
                 (shard_index * B); only meaningful with aud_all. May be a
                 traced scalar.
    """
    b, h, w, c = img_feats.shape
    img = l2_normalize(img_feats.astype(jnp.float32), axis=-1)
    aud = l2_normalize(aud_feats.astype(jnp.float32), axis=-1)
    keys = aud if aud_all is None else l2_normalize(aud_all.astype(jnp.float32), axis=-1)
    k = keys.shape[0]

    img_flat = img.reshape(b, h * w, c)
    # the one big MXU matmul: every pixel of every image against every audio
    a0 = jax.lax.dot_general(
        img_flat, keys,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (B, HW, K)
    a = jnp.einsum("bqc,bc->bq", img_flat, aud)    # (B, HW) own-pair diagonal

    pos = jax.nn.sigmoid((a - cfg.epsilon) / cfg.tau)
    if cfg.trimap:
        neg = 1.0 - jax.nn.sigmoid((a - cfg.epsilon2) / cfg.tau)
    else:
        neg = 1.0 - pos
    pos_all = jax.nn.sigmoid((a0 - cfg.epsilon) / cfg.tau)

    sim1 = (pos * a).sum(-1, keepdims=True) / pos.sum(-1, keepdims=True)    # (B, 1)
    sim = (pos_all * a0).sum(1) / pos_all.sum(1)                            # (B, K)
    if k == b:
        # own-pair diagonal: the reference's multiplicative (1 - 100) trick
        # (`model.py:142-144`) — safe because own-pair sims train positive
        mask = 1.0 - cfg.mask_penalty * jnp.eye(b, dtype=sim.dtype)
        sim = sim * mask
        if cfg.pool_block and cfg.pool_block < b:
            # per-block negative pool: columns outside the sample's block
            # simply don't exist on a DataParallel replica, so they are
            # pinned to a large negative sim (softmax weight ~0).  NOT the
            # multiplicative diagonal trick: cross-pair sims train negative,
            # and (neg)*(1-100) would flip them into dominant positives.
            blk = jnp.arange(b) // cfg.pool_block
            same_block = blk[:, None] == blk[None, :]
            sim = jnp.where(same_block, sim, -cfg.mask_penalty)
    else:
        # explicitly gathered pool: row i's own column sits at pool_offset + i
        sim = sim * global_pool_mask(b, k, pool_offset, cfg.mask_penalty,
                                     sim.dtype)
    sim2 = (neg * a).sum(-1, keepdims=True) / neg.sum(-1, keepdims=True)    # (B, 1)

    cols = (sim1, sim, sim2) if cfg.use_neg else (sim1, sim)
    logits = jnp.concatenate(cols, axis=1) / cfg.temperature

    # Pos-weighted feature map (consistency-loss input, `model.py:148-152`)
    pos_map = pos.reshape(b, h, w)
    pos_norm = jnp.maximum(jnp.linalg.norm(pos_map.reshape(b, -1), axis=-1), 1e-12)
    norm_pos = pos_map / pos_norm[:, None, None]
    weighted = (img * norm_pos[..., None]).mean(axis=-1)                    # (B, H, W)

    return HardwayOutput(
        heatmap=a.reshape(b, h, w),
        logits=logits,
        weighted_map=weighted,
        pos=pos_map,
        neg=neg.reshape(b, h, w),
    )
