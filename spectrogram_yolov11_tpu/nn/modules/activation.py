"""Activation modules with learnable parameters.

TPU-native counterpart of /root/reference/ultralytics/nn/modules/activation.py
(AGLU, the Unified activation of arxiv 2308.10601). The reference exposes AGLU
as an nn.Module so it can be placed in a graph or assigned as
``Conv.default_act``; no stock or fork config uses it, so here it is offered
as a registered graph module (channel-preserving, usable from any model yaml).
Using a *learnable* activation as the graph-wide default-act override is not
supported — the yaml ``activation:`` key accepts the stateless registry
(``nn/modules/conv.py ACTS``) and warns otherwise, matching every config the
reference actually ships.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class AGLU(nn.Module):
    """Unified activation: exp((1/lam) * softplus_{beta=-1}(kappa*x - ln lam)).

    lambd/kappa are learnable scalars, init U(0,1) like the torch original
    (``nn.init.uniform_`` over ``torch.empty(1)``). Softplus with beta=-1 is
    -softplus(-y); computed in float32 for stability under bf16 activations
    (the exp of a reciprocal-scaled log term overflows fast in half types).
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        lambd = self.param("lambd", nn.initializers.uniform(scale=1.0), (1,), jnp.float32)
        kappa = self.param("kappa", nn.initializers.uniform(scale=1.0), (1,), jnp.float32)
        in_dt = x.dtype
        xf = x.astype(jnp.float32)
        lam = jnp.clip(lambd, 0.0001, None)
        y = kappa * xf - jnp.log(lam)
        out = jnp.exp((1.0 / lam) * (-jax.nn.softplus(-y)))
        return out.astype(self.dtype or in_dt)
