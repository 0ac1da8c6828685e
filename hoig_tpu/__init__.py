"""hoig_tpu — TPU-native hand-object interaction image generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the HOGAN
reference ("Hand-Object Interaction Image Generation", NeurIPS 2022;
reference implementation: play-with-HOI-generation/HOIG).

Layer map (TPU-first, single codebase for both dataset variants):

  options/    argparse-compatible flag surface (reference options/*.py)
  data/       input pipelines: HO3Dv3, DexYCB, InterHand, synthetic
              (reference data/)
  geometry/   mesh/OBJ IO, MANO LBS, projection, surface renderer, batched
              conditioning front-end, UV utilities (reference utils/nmr.py
              + utils/mesh.py + models/trainer.py:HandRecoveryFlow)
  ops/        TPU compute primitives: XLA + Pallas rasterizers,
              grid_sample, block extractor / fused attention math,
              morphology, texture sampling (reference thirdparty/* CUDA)
  models/     flax networks: generator family, discriminators, SPADE,
              fused ExtractorAttn, VGG (reference models/networks/)
  train/      fused GAN train step, losses, LR schedule, checkpoints,
              reference Trainer-API facade (models/trainer.py + train*.py)
  parallel/   device-mesh data parallelism (reference train_ddp.py DDP)
  metrics/    FID / LPIPS / SSIM evaluation (reference metrics/)
  runtime/    native C++ data-pipeline kernels (torch DataLoader workers)
  utils/      image conversion, colorize, observability, profiling

See COMPONENTS.md for the line-by-line SURVEY §2 inventory mapping.
"""

__version__ = "0.1.0"
