from .selective_adam import SelectiveAdam, selective_adam

__all__ = ["SelectiveAdam", "selective_adam"]
