"""values_tpu — a TPU-native framework for systematic validation of uncertainty
estimation in semantic segmentation.

Rebuilds the capabilities of IML-DKFZ/values ("ValUES") as an idiomatic
JAX/XLA/Pallas stack:

- C0 backbones: 3D U-Net, HRNet-W48 (2D) — pure flax modules, NDHWC/NHWC.
- C1 prediction models: single softmax, MC-dropout, deep ensembles, TTA,
  aleatoric logit sampling, stochastic segmentation networks (SSN). The N
  stochastic forward passes are vmapped and shardable along a device-mesh
  `sample` axis instead of Python loops.
- C2 uncertainty measures: predictive entropy, expected entropy, mutual
  information, 1-MSR — fused on-device reductions over the sample axis.
- C3 aggregations: image-level sum/mean, patch-level max box-filter,
  threshold-mean — on-device single-pass kernels.
- Downstream test beds: OoD detection (AUROC), failure detection
  (AURC/E-AURC), calibration (Platt + ACE), ambiguity modeling (NCC, GED),
  active-learning split generation and improvement analysis.

External contracts (config YAML schema, checkpoint self-description,
`test_results/` output tree, JSON metric schemas, naming schemes) mirror the
reference so existing ValUES workflows carry over; the internals are new.
"""

__version__ = "0.1.0"
