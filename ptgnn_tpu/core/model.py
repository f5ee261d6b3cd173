"""Placeholder - filled in by the model-lifecycle milestone."""
class AbstractNeuralModel:  # pragma: no cover - replaced shortly
    pass
