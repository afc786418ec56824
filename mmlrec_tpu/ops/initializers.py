"""Parameter initializers matching the reference's PyTorch init choices.

The reference mixes two init schemes:
* DNN / embedding weights re-initialised to ``normal(0, init_std)`` with
  ``init_std=1e-4`` (reference model/utils.py:140-142, 485-486).
* Plain ``nn.Linear`` layers (gate/tower final layers etc.) keep PyTorch's
  default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  for the kernel, and U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for the bias.

Flax kernels are [in, out]; fan_in is shape[-2].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normal_init(std: float = 1e-4):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_linear_kernel_init():
    """U(+-1/sqrt(fan_in)); fan_in = kernel shape[-2]."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2]
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init():
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_normal_init():
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        std = np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def uniform_range_init(low: float, high: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, low, high)

    return init


def eye_init():
    def init(key, shape, dtype=jnp.float32):
        assert len(shape) >= 2 and shape[-1] == shape[-2]
        eye = jnp.eye(shape[-1], dtype=dtype)
        return jnp.broadcast_to(eye, shape)

    return init
