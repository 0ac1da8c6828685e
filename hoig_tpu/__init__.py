"""hoig_tpu — TPU-native hand-object interaction image generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the HOGAN
reference ("Hand-Object Interaction Image Generation", NeurIPS 2022;
reference implementation: play-with-HOI-generation/HOIG).

Layer map (TPU-first, single codebase for both dataset variants):

  options/    argparse-compatible flag surface (reference options/*.py)
  data/       input pipelines: HO3Dv3, DexYCB, synthetic (reference data/)
  geometry/   mesh/OBJ, MANO LBS, projection, batched conditioning front-end
              (reference utils/nmr.py + models/trainer.py:HandRecoveryFlow)
  ops/        TPU compute primitives: rasterizer, grid_sample, block
              extractor, morphology (reference thirdparty/* CUDA kernels)
  models/     flax networks: generator family, discriminator, SPADE,
              ExtractorAttn, VGG (reference models/networks/)
  train/      GAN trainer, losses, LR schedule, checkpoints, train loop
              (reference models/trainer.py + train*.py)
  parallel/   device-mesh data parallelism via shard_map/psum
              (reference train_ddp.py NCCL DDP)
  metrics/    FID / LPIPS / SSIM evaluation (reference metrics/)
  utils/      image conversion, colorize, observability
"""

__version__ = "0.1.0"
