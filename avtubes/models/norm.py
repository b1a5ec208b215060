"""Torch-parity BatchNorm.

flax.linen.BatchNorm updates its running variance with the BIASED batch
variance; torch.nn.BatchNorm2d updates it with the UNBIASED one
(``var * n/(n-1)`` over the n reduced elements) while still normalizing
with the biased value.  Eval-mode forwards therefore drift between the two
stacks after any amount of our own training — a real (if small: 1/n
relative) parity gap against the reference trainer
(`/root/reference/train_hardway.py`, torch BatchNorm2d defaults), and the
long-horizon training-parity test is sensitive to it at test-sized
batches.

``TorchBatchNorm`` is a drop-in replacement with torch's exact update
semantics and flax's variable layout (``batch_stats/{mean,var}``,
``params/{scale,bias}``) so checkpoints and the torch import/export
converters are unchanged.  Numerics mirror flax elsewhere: statistics are
computed in float32 (E[x^2]-E[x]^2 fast variance), normalization runs in
``dtype`` (bf16 training keeps the same fused-epilogue cost profile).

Under jit with a data-sharded batch the reductions see the GLOBAL batch
(XLA inserts the cross-device collectives), so ``n`` — taken from the
traced global shape — is the correct unbiased-correction count.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis with torch update semantics.

    Train mode: normalize with biased batch statistics, advance the running
    stats one EMA step — ``r <- momentum*r + (1-momentum)*stat`` with the
    mean's ``stat`` biased and the variance's unbiased (torch
    ``BatchNorm2d`` exactly; flax momentum convention, i.e. momentum=0.9
    here == torch momentum=0.1).
    Eval mode: normalize with the running statistics.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        reduction_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        scale = self.param("scale", self.scale_init, (features,), jnp.float32)
        bias = self.param("bias", self.bias_init, (features,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, reduction_axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), reduction_axes) - jnp.square(mean),
                0.0)
            if not self.is_initializing():
                n = int(np.prod([x.shape[a] for a in reduction_axes]))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * var * (n / max(n - 1, 1)))

        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        mul = jax.lax.rsqrt(var.astype(dtype) + jnp.asarray(self.epsilon, dtype))
        y = (x.astype(dtype) - mean.astype(dtype)) * mul
        return y * scale.astype(dtype) + bias.astype(dtype)
