"""PatchGAN discriminator for VAE adversarial training, flax/NHWC.

Parity: taming's NLayerDiscriminator as used by the reference VAE training
loss (sgm/modules/autoencoding/losses/__init__.py:6,120-130 — the
AutoencodingEngine two-optimizer path, autoencoder.py:182-267). 4×4 convs,
stride-2 pyramid, BatchNorm + LeakyReLU(0.2), final 1-channel logit map.
Init matches taming's weights_init (normal std 0.02).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_conv_init = nn.initializers.normal(0.02)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        pad = ((1, 1), (1, 1))
        x = nn.Conv(self.ndf, (4, 4), strides=2, padding=pad,
                    kernel_init=_conv_init, name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers + 1):
            nf = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * nf, (4, 4), strides=stride, padding=pad,
                        use_bias=False, kernel_init=_conv_init, name=f"conv{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=1, padding=pad,
                       kernel_init=_conv_init, name="conv_out")(x)
