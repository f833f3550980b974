"""ctseg_tpu — TPU-native head-and-neck CT segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MrinalJain17/CT-image-segmentation (reference mounted at /root/reference):
9-organ segmentation of MICCAI 2015 PDDCA head-and-neck CT scans.

Design stance (vs. the reference's PyTorch/Lightning/MONAI/Albumentations
stack): functional models and train steps, explicit PRNG key threading,
on-device preprocessing/augmentation (the whole dataset lives in HBM),
`jax.sharding.Mesh` + pjit data parallelism over ICI, Pallas kernels for
the memory-bound hot ops, and NaN-free masked metric reductions.

Layout:
  utils/      domain model (Volume/Patient/PatientCollection), NRRD IO, viz
  data/       download/split/convert CLIs, packed dataset, input pipeline
  transforms/ HU windowing + on-device augmentation pipelines (degrees 0-4)
  ops/        squash/one-hot, resize, EDT, Pallas kernels
  models/     MONAI-UNet-equivalent flax model (2D & 3D), layers
  losses/     CE / weighted CE / Focal / Dice / GeneralizedDice / Boundary
              + missing-annotation masking (AnatomyNet)
  metrics/    masked Dice (reference NaN semantics), HD95
  training/   train loop, plateau LR schedule, checkpointing, mixup, CLIs
  parallel/   mesh construction and sharding policies
  inference/  sliding-window whole-volume inference w/ Gaussian blending
  interpret/  GradCAM
"""

__version__ = "0.1.0"
