"""ecoflap_tpu — a TPU-native, JAX-first rebuild of the ECoFLaP coarse-to-fine
pruning pipeline (reference: ylsung/ECoFLaP).

One framework, not four forks: a single ``pruning`` core parameterized by model
adapters (stack walkers + loss fns + calibration iterators), functional weight
pytrees instead of in-place ``nn.Module`` surgery, and XLA/Pallas kernels for
the hot numeric paths (Wanda metric+mask, SparseGPT OBS sweep, MeZO
perturb-forward-diff ensembles).

Layer map (mirrors SURVEY.md §1):
  core/      L0 registry & config
  parallel/  L1 device-mesh runtime (jax.sharding over ICI, not NCCL)
  data/      L2 calibration + eval data pipelines
  models/    L3 functional model zoo (CLIP, EVA-ViT, FlanT5, BLIP-2, LLaMA)
  tasks/     L4 evaluation tasks (VQA, captioning, classification, MMLU, ppl)
  runners/   L5 runner (eval loops, checkpointing, masked fine-tuning)
  pruning/   L6 compression core (the heart)
  cli/       L7 entry scripts mirroring the reference script-level API
  ops/       XLA/Pallas kernels backing the above
"""

__version__ = "0.1.0"

from ecoflap_tpu.core.registry import registry  # noqa: F401
