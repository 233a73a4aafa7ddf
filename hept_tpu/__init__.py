"""hept_tpu — a TPU-native JAX framework for LSH-bucketed point-cloud transformers.

Re-implements the capabilities of Graph-COM/HEPT (ICML'24, arXiv 2402.12535)
from scratch for TPU: E2LSH OR&AND bucketing, block-local RBF attention as
fused Pallas kernels, batched imbalanced point clouds via vmapped dense
layouts, data-parallel training over a `jax.sharding.Mesh`, and the full
training/eval harness (tracking + pileup tasks, baseline attentions, GNNs).

Layering (bottom-up):
  core/     pure-function LSH + bucketing primitives (static shapes, jittable)
  ops/      compute kernels: Pallas bucket attention, segment ops, tiled kNN
  models/   flax modules: HEPT transformer, baseline attentions, GNNs
  data/     host-side pipelines: synthetic generators, reference-format loaders
  train/    losses, metrics, optimizers, trainers, configs, checkpointing
  parallel/ mesh construction + data-parallel / bucket-sharded train steps
"""

__version__ = "0.1.0"
