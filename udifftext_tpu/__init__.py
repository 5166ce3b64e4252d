"""udifftext_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of UDiffText.

Character-aware latent-diffusion scene-text synthesis/editing: a Stable
Diffusion 2.0 inpainting UNet whose textual cross-attention is conditioned on
a character-level LabelEncoder, trained with a local attention-map loss and an
optional OCR loss through a frozen PARSeq recognizer.

Reference behavior: ZYM-PKU/UDiffText (see /root/repo/SURVEY.md). This package
is a ground-up JAX design: pure-functional flax models, diffusion math as
closed-form jnp functions, samplers as `lax.scan` loops, data-parallel
training via `jax.sharding`, and Pallas TPU kernels on the hot paths.
"""

__version__ = "0.1.0"
