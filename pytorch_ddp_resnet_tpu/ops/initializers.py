"""Parameter initializers with torch-equivalent distributions.

The reference relies on two init regimes (SURVEY.md §2.1 rows 4-5):

- top-level convs get ``kaiming_normal_`` (reference: resnet.py:160-163),
  i.e. N(0, 2/fan_in) with fan_in = K*K*C_in;
- every other conv/linear keeps torch's default
  ``kaiming_uniform_(a=sqrt(5))``, which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)); torch biases are
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) as well.

We reproduce the *distributions* (not the bit streams — the PRNGs differ) so
training dynamics match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kaiming_normal(rng, shape, fan_in: int, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ (a=0, fan_in, leaky_relu): std=sqrt(2/fan_in)."""
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(rng, shape, dtype)


def torch_default_uniform(rng, shape, fan_in: int, dtype=jnp.float32):
    """torch's default Conv2d/Linear weight & bias init:
    kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = fan_in ** -0.5
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def zeros(rng, shape, dtype=jnp.float32):
    del rng
    return jnp.zeros(shape, dtype)


def ones(rng, shape, dtype=jnp.float32):
    del rng
    return jnp.ones(shape, dtype)
