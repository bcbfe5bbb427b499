"""ML models: ADME/toxicity GNN+MLP property predictors (JAX/flax)."""
from .adme import AdmeModel, AdmeModelConfig, featurize_mol  # noqa: F401
