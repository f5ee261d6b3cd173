"""Placeholder - filled in by the trainer milestone."""
class ModelTrainer:  # pragma: no cover - replaced shortly
    pass
