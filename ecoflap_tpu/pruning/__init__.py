from ecoflap_tpu.pruning.loader import load_pruner  # noqa: F401
