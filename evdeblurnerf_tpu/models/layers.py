"""Linear layers with PyTorch-compatible initialization.

Training-dynamics parity with the reference requires matching its parameter
initialization, so this module provides a Dense variant whose default init
replicates ``torch.nn.Linear``: weight and bias both ~ U(-k, k) with
k = 1/sqrt(fan_in). Reference modules override weights with Xavier variants
(ref: utils/misc.py:95-102, networks/dpnerf/blurmodel.py:38-45); matching
initializers are provided here.

Kernels are stored in flax convention [in_features, out_features].
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init: U(-1/sqrt(fan_in), +)."""
    fan_in = shape[0]
    k = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -k, k)


def xavier_normal_init(gain: float = 1.0):
    """torch.nn.init.xavier_normal_: N(0, gain*sqrt(2/(fan_in+fan_out)))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    return init


def xavier_uniform_init(gain: float = 1.0):
    """torch.nn.init.xavier_uniform_: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)
    return init


class TorchLinear(nn.Module):
    """Dense layer matching torch.nn.Linear's default initialization.

    ``bias_mode``: "torch" (U(-1/sqrt(fan_in), +), the torch default),
    "zeros" (for reference modules that call init.constant_(bias, 0)),
    or "none" (no bias).
    """

    features: int
    kernel_init: Optional[Callable] = None
    bias_mode: str = "torch"

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_kernel_init
        kernel = self.param("kernel", kinit, (in_features, self.features))
        y = x @ kernel
        if self.bias_mode == "torch":
            k = 1.0 / np.sqrt(in_features)

            def binit(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -k, k)

            y = y + self.param("bias", binit, (self.features,))
        elif self.bias_mode == "zeros":
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        elif self.bias_mode != "none":
            raise ValueError(f"unknown bias_mode {self.bias_mode!r}")
        return y


def dsk_linear_init(out_features: int):
    """Init used by the DSK/PBE blur MLP (ref: utils/misc.py:95-102):
    xavier_normal with gain 0.1 when out_features in {2, 3}, else gain 1;
    bias zero (handled via bias_mode='zeros')."""
    gain = 0.1 if out_features in (2, 3) else 1.0
    return xavier_normal_init(gain)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "exp": jnp.exp,
    "none": lambda x: x,
    "tanh": jnp.tanh,
    # (ref: networks/renderer.py:104-106)
    "sigmoid1": lambda x: 1.002 / (jnp.exp(-x) + 1) - 0.001,
    "softplus": lambda x: jax.nn.softplus(x - 1),
}
