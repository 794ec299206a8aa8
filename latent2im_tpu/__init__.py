"""latent2im_tpu — a TPU-native JAX framework for controllable GAN image editing.

Rebuilds the capabilities of KelestZ/Latent2im ("Enjoy Your Editing", ICLR 2021)
from scratch for TPU: trainable attribute "walk" modules over frozen StyleGAN2
W/W+ and PGGAN z spaces, supervised by a frozen ResNet-50 attribute regressor,
a VGG content loss, and a discriminator realism loss.

Layout
------
ops/      TPU kernels: upfirdn2d (resample+FIR), fused bias+LeakyReLU (XLA + Pallas)
models/   generator/discriminator/regressor/feature towers as pure param-pytree fns
walks/    trainable latent-walk modules (linear W+, MLP W+, NN-W, z-space variants)
tasks/    per-transform alpha sampling semantics (face/scene/xray/...)
engine/   the editing engine: synthesis, regression, losses, jitted train step
parallel/ device mesh + sharding for multi-chip data-parallel training
config/   CLI flags + yaml config round-trip (opt.yml compatible surface)
io/       checkpointing (orbax/npz) + PyTorch weight converters
utils/    image grids, html galleries, logging
cli/      entry points: train, train_multi_attr, vis_w, eval, bp, train_regressor
"""

__version__ = "0.1.0"
