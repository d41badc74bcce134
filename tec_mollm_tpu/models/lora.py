"""First-party LoRA: low-rank adapter fused into a dense projection.

Behavioral contract (reference /root/reference/src/model/modules.py:177-187, which
uses peft LoraConfig(r=32, lora_alpha=64, target_modules=['c_attn'], lora_dropout=0.1,
bias='none')):

    y = x @ W + b + (alpha / r) * lora_B( lora_A( dropout(x) ) )

with lora_A ~ kaiming-uniform init, lora_B = 0 (so the adapter starts as identity),
no adapter biases. The base W/b stay frozen (handled by the trainable-parameter mask
in training/optimizer.py, mirroring the reference's `lora_`/`ln_`/`wpe` unfreeze
policy, modules.py:195-203).

TPU note: at r=32 the adapter matmuls are thin; XLA fuses x@A and (xA)@B alongside
the main x@W on the MXU, so LoRA costs ~r/768 extra FLOPs rather than a kernel launch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a (fan_in, r) kernel — peft's lora_A init.

    bound = sqrt(6 / ((1 + a^2) * fan_in)) = 1 / sqrt(fan_in).
    """
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound


class LoRADense(nn.Module):
    """Dense layer with an additive low-rank adapter.

    Parameters live under {kernel, bias, lora_A, lora_B} so the trainable mask can
    select the `lora_` leaves by name, exactly like the reference's name-based
    unfreeze (modules.py:201-203).
    """

    features: int
    rank: int = 0
    alpha: float = 0.0
    lora_dropout: float = 0.0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(stddev=0.02)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features))
        y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)

        if self.rank > 0:
            lora_a = self.param("lora_A", _kaiming_uniform_a5, (in_features, self.rank))
            lora_b = self.param("lora_B", nn.initializers.zeros, (self.rank, self.features))
            scaling = self.alpha / self.rank
            h = x
            if self.lora_dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=self.lora_dropout, deterministic=False)(h)
            y = y + (h @ lora_a.astype(self.dtype)) @ lora_b.astype(self.dtype) * scaling
        return y
